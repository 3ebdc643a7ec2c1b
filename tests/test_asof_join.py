"""asof_join vs pandas merge_asof (randomized differential) plus
tie-break / tolerance / forward / string-key / null-key semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _run(left, right, **kw):
    from verify_ray.pipelines.joins import asof_join

    out = asof_join(_ds(left), _ds(right), **kw).to_pandas()
    return out.sort_values(list(left.columns)).reset_index(drop=True)


def _rand_frames(seed, n_left=400, n_right=300, n_keys=7):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rng.randint(0, n_keys, n_left).astype(np.int64),
        "ts": rng.randint(0, 1000, n_left).astype(np.int64),
        "lid": np.arange(n_left, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, n_keys, n_right).astype(np.int64),
        "ts": rng.randint(0, 1000, n_right).astype(np.int64),
        "val": rng.randint(0, 10_000, n_right).astype(np.int64),
    }).drop_duplicates(["k", "ts"])  # unique (key, ts): no tie ambiguity
    return left, right


@pytest.mark.parametrize("direction,tolerance", [
    ("backward", None), ("forward", None),
    ("backward", 50), ("forward", 50),
    ("nearest", None), ("nearest", 50),
])
def test_differential_vs_merge_asof(ray_session, direction, tolerance):
    left, right = _rand_frames(seed=hash(direction) % 100 + (tolerance or 0))
    got = _run(left, right, key="k", ts="ts", right_values=["val"],
               direction=direction, tolerance=tolerance, num_buckets=8)
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="k", direction=direction, tolerance=tolerance)
    exp = exp.sort_values(list(left.columns)).reset_index(drop=True)
    cols = ["k", "ts", "lid", "val"]
    pd.testing.assert_frame_equal(
        got[cols].astype({"val": "float64"}),
        exp[cols].astype({"val": "float64"}), check_dtype=False)


def test_tiebreak_picks_max(ray_session):
    left = pd.DataFrame({"k": [1, 1], "ts": [10, 5], "lid": [0, 1]})
    right = pd.DataFrame({"k": [1, 1, 1], "ts": [10, 10, 3],
                          "oid": [7, 9, 2], "val": [70, 90, 20]})
    out = _run(left, right, key="k", ts="ts",
               right_values=["oid", "val"], tiebreak="oid")
    # ts=10 matches the (ts=10, max oid=9) row inclusively; ts=5 -> ts=3
    assert out.loc[out.lid == 0, "oid"].item() == 9
    assert out.loc[out.lid == 0, "val"].item() == 90
    assert out.loc[out.lid == 1, "oid"].item() == 2


def test_string_keys_and_timestamps(ray_session):
    left = pd.DataFrame({
        "k": ["a", "a", "b", "c"],
        "ts": pd.to_datetime(["2024-01-02", "2024-01-01",
                              "2024-01-03", "2024-01-01"]),
        "lid": [0, 1, 2, 3]})
    right = pd.DataFrame({
        "k": ["a", "b"],
        "ts": pd.to_datetime(["2024-01-01 12:00:00", "2024-01-01 00:00:00"]),
        "val": [1, 2]})
    out = _run(left, right, key="k", ts="ts", right_values=["val"])
    assert out.loc[out.lid == 0, "val"].item() == 1
    assert pd.isna(out.loc[out.lid == 1, "val"].item())  # before any right
    assert out.loc[out.lid == 2, "val"].item() == 2
    assert pd.isna(out.loc[out.lid == 3, "val"].item())  # key has no rows


def test_null_keys_never_match(ray_session):
    left = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                         "ts": [10, 10], "lid": [0, 1]})
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                          "ts": [5, 5], "val": [50, 99]})
    out = _run(left, right, key="k", ts="ts", right_values=["val"])
    assert len(out) == 2  # null-key left row still emitted (left join)
    assert out.loc[out.lid == 0, "val"].item() == 50
    assert pd.isna(out.loc[out.lid == 1, "val"].item())


def _range_ref(points, intervals):
    rows = []
    for _, p in points.iterrows():
        for _, iv in intervals.iterrows():
            if (p.k == iv.k and not pd.isna(iv.e)
                    and iv.s <= p.ts <= iv.e):
                rows.append((p.pid, iv.iid))
    return sorted(rows)


@pytest.mark.parametrize("max_span", [None, 30])
def test_range_join_differential(ray_session, max_span):
    from verify_ray.pipelines.joins import range_join

    rng = np.random.RandomState(7)
    n_p, n_i = 300, 200
    points = pd.DataFrame({
        "k": rng.randint(0, 6, n_p).astype(np.int64),
        "ts": rng.randint(0, 500, n_p).astype(np.int64),
        "pid": np.arange(n_p, dtype=np.int64)})
    s = rng.randint(0, 500, n_i).astype(np.int64)
    intervals = pd.DataFrame({
        "k": rng.randint(0, 6, n_i).astype(np.int64),
        "s": s, "e": s + rng.randint(0, 31, n_i),
        "iid": np.arange(n_i, dtype=np.int64)})
    intervals.loc[5, "e"] = None  # null end: never matches
    out = range_join(
        _ds(points), _ds(intervals), key="k", point_ts="ts",
        interval_start="s", interval_end="e",
        point_values=["pid"], interval_values=["iid"],
        max_span=max_span, num_buckets=8).to_pandas()
    got = sorted(zip(out.pid.astype(np.int64), out.iid.astype(np.int64)))
    assert got == _range_ref(points, intervals)


def test_range_join_driver_oracle(ray_session):
    duckdb = __import__("duckdb")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["range_join_events"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = con.execute(e.oracle_sql()["range_join_events"]).df()
    pd.testing.assert_frame_equal(
        mine.astype("int64"), orc.astype("int64"))


def test_driver_query_matches_duckdb_asof(ray_session):
    duckdb = __import__("duckdb")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["asof_events_orders"](sf).reset_index(drop=True)
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = con.execute(e.oracle_sql()["asof_events_orders"]).df()
    pd.testing.assert_frame_equal(
        mine.astype({"event_id": "int64", "user_id": "int64"}),
        orc.astype({"event_id": "int64", "user_id": "int64"}),
        check_dtype=False)
