"""Property-based differentials vs DuckDB (n >= 1 — the all-empty-
blocks to_pandas() column-loss gotcha is covered by dedicated empty-
input unit tests) for the ranking/selection
operators added this session: global_rank, latest_by_key,
percentile_filter, user_histories.  Bounded examples (each runs a Ray
pipeline); the fixed-seed unit tests remain the broad net."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _ds(df: pd.DataFrame, blocks: int = 3):
    import ray.data as rd

    t = pa.Table.from_pandas(df, preserve_index=False)
    n = t.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([t.slice(i, step) for i in range(0, n, step)]
                         if n else t)


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_global_rank_matches_duckdb(ray_session, data):
    from verify_ray.pipelines.select import global_rank

    n = data.draw(st.integers(min_value=1, max_value=30))
    scores = data.draw(st.lists(
        st.one_of(st.integers(min_value=-3, max_value=3), st.none()),
        min_size=n, max_size=n))
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "s": pd.array(scores, dtype="Int64")})
    out_ds = global_rank(_ds(df), "s", "id", values=["id", "s"],
                         num_buckets=4)
    # all-null scores -> empty result; empty-blocks to_pandas loses cols
    out = (out_ds.to_pandas().sort_values("id").reset_index(drop=True)
           if out_ds.count()
           else pd.DataFrame({"id": [], "s": [], "rank": []}))
    ref = duckdb.sql(
        "SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY s, id) AS BIGINT)"
        " AS rank FROM df WHERE s IS NOT NULL ORDER BY id").df()
    assert out["id"].tolist() == ref["id"].tolist()
    assert out["rank"].tolist() == ref["rank"].tolist()


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_latest_by_key_matches_duckdb(ray_session, data):
    from verify_ray.pipelines.select import latest_by_key

    n = data.draw(st.integers(min_value=1, max_value=30))
    keys = data.draw(st.lists(
        st.one_of(st.integers(min_value=0, max_value=4), st.none()),
        min_size=n, max_size=n))
    vers = data.draw(st.lists(st.integers(min_value=0, max_value=3),
                              min_size=n, max_size=n))
    df = pd.DataFrame({"k": pd.array(keys, dtype="Int64"),
                       "v": np.asarray(vers, dtype=np.int64),
                       "i": np.arange(n, dtype=np.int64)})
    out_ds = latest_by_key(_ds(df), ["k"], "v", "i",
                           values=["k", "v", "i"], num_buckets=4)
    # all-null keys -> empty result; empty-blocks to_pandas loses cols
    out = (out_ds.to_pandas().sort_values("k").reset_index(drop=True)
           if out_ds.count()
           else pd.DataFrame({"k": [], "v": [], "i": []}))
    ref = duckdb.sql(
        "SELECT k, v, i FROM df WHERE k IS NOT NULL QUALIFY "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC, i DESC)=1 "
        "ORDER BY k").df()
    assert out["k"].tolist() == ref["k"].tolist()
    assert out["i"].tolist() == ref["i"].tolist()


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_percentile_filter_matches_duckdb(ray_session, data):
    from verify_ray.pipelines.select import percentile_filter

    n = data.draw(st.integers(min_value=1, max_value=40))
    groups = data.draw(st.lists(st.sampled_from(["a", "b"]),
                                min_size=n, max_size=n))
    scores = data.draw(st.lists(st.integers(min_value=0, max_value=5),
                                min_size=n, max_size=n))
    p = data.draw(st.sampled_from([0, 250, 500, 1000]))
    df = pd.DataFrame({"g": groups,
                       "s": np.asarray(scores, dtype=np.int64),
                       "i": np.arange(n, dtype=np.int64)})
    out_ds = percentile_filter(_ds(df), "g", "s", p)
    # p=0 keeps nothing; all-empty-blocks to_pandas loses columns
    out = (out_ds.to_pandas() if out_ds.count()
           else pd.DataFrame({"i": []}))
    ref = duckdb.sql(f"""
        SELECT i FROM (
          SELECT i, RANK() OVER (PARTITION BY g ORDER BY s) - 1
                   AS n_less,
                 COUNT(*) OVER (PARTITION BY g) AS n_group
          FROM df)
        WHERE n_less * 1000 < {p} * n_group""").df()
    assert sorted(out["i"]) == sorted(ref["i"])


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_user_histories_matches_duckdb(ray_session, data):
    from verify_ray.pipelines.sessions import user_histories

    n = data.draw(st.integers(min_value=1, max_value=25))
    users = data.draw(st.lists(st.integers(min_value=0, max_value=3),
                               min_size=n, max_size=n))
    ts = data.draw(st.lists(st.integers(min_value=0, max_value=5),
                            min_size=n, max_size=n))
    evs = data.draw(st.lists(st.sampled_from(["x", "y", "z"]),
                             min_size=n, max_size=n))
    df = pd.DataFrame({
        "user_id": np.asarray(users, dtype=np.int64),
        "ts": pd.to_datetime(np.asarray(ts, dtype=np.int64), unit="us"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": evs})
    out = (user_histories(_ds(df)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ref = duckdb.sql(
        "SELECT user_id, "
        "string_agg(event_type, ',' ORDER BY ts, event_id) AS history "
        "FROM df GROUP BY user_id ORDER BY user_id").df()
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["history"].tolist() == ref["history"].tolist()
