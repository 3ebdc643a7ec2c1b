"""Unit tests for global_rank, user_histories, per-group-k grouped_head
/ resample_to_mix (round-3 sixth continuation session)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, blocks: int = 4):
    import ray.data as rd

    n = tbl.num_rows
    if n == 0 or blocks <= 1:
        return rd.from_arrow(tbl)
    step = max(1, n // blocks)
    parts = [tbl.slice(i, step) for i in range(0, n, step)]
    return rd.from_arrow(parts)


# ---------------------------------------------------------------------------
# global_rank


def test_global_rank_matches_argsort(ray_session):
    from verify_ray.pipelines.select import global_rank

    rng = np.random.default_rng(7)
    n = 500
    ids = rng.permutation(n).astype(np.int64)
    scores = rng.integers(0, 40, n).astype(np.int64)  # heavy ties
    t = pa.table({"id": pa.array(ids), "s": pa.array(scores)})
    out = (global_rank(_ds(t, 6), "s", "id", values=["id", "s"],
                       num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))

    order = np.lexsort((ids, scores))
    ref_rank = np.empty(n, dtype=np.int64)
    ref_rank[order] = np.arange(1, n + 1)
    ref = (pd.DataFrame({"id": ids, "s": scores, "rank": ref_rank})
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, ref)


def test_global_rank_drops_nulls(ray_session):
    from verify_ray.pipelines.select import global_rank

    t = pa.table({
        "id": pa.array([1, 2, None, 4], type=pa.int64()),
        "s": pa.array([10, None, 3, 10], type=pa.int64())})
    out = (global_rank(_ds(t, 1), "s", "id", values=["id", "s"],
                       num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # only rows (1,10) and (4,10) survive; tie broken by id
    assert out["id"].tolist() == [1, 4]
    assert out["rank"].tolist() == [1, 2]


def test_global_rank_empty(ray_session):
    from verify_ray.pipelines.select import global_rank

    t = pa.table({"id": pa.array([], type=pa.int64()),
                  "s": pa.array([], type=pa.int64())})
    out = global_rank(_ds(t, 1), "s", "id", values=["id", "s"])
    assert out.count() == 0
    assert "rank" in out.schema().names


# ---------------------------------------------------------------------------
# user_histories


def _events_table():
    # user 1: ts tie at 100 broken by event_id (5 before 9)
    return pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, None, 3],
                            type=pa.int64()),
        "ts": pa.array([100, 100, 50, 200, 150, 10, None],
                       type=pa.timestamp("us")),
        "event_id": pa.array([9, 5, 1, 2, 3, 4, 6], type=pa.int64()),
        "event_type": pa.array(["c", "b", "a", "x", "y", "z", "w"],
                               type=pa.string())})


def test_user_histories_order_and_ties(ray_session):
    from verify_ray.pipelines.sessions import user_histories

    out = (user_histories(_ds(_events_table(), 3))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == [1, 2]  # null user / null ts drop
    assert out.loc[0, "history"] == "a,b,c"  # ts asc, tie by event_id
    assert out.loc[1, "history"] == "y,x"
    assert out.loc[0, "n_events"] == 3
    assert out.loc[0, "first_us"] == 50 and out.loc[0, "last_us"] == 100


def test_user_histories_custom_sep(ray_session):
    from verify_ray.pipelines.sessions import user_histories

    out = (user_histories(_ds(_events_table(), 1), sep="->")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out.loc[0, "history"] == "a->b->c"


# ---------------------------------------------------------------------------
# per-group k dict in grouped_head / resample_to_mix


def test_grouped_head_dict_k(ray_session):
    from verify_ray.pipelines.select import grouped_head

    t = pa.table({
        "id": pa.array(list(range(12)), type=pa.int64()),
        "g": pa.array(["a"] * 6 + ["b"] * 4 + ["c"] * 2)})
    out = (grouped_head(_ds(t, 3), ["g"], {"a": 2, "b": 3}, "id",
                        values=["id", "g"], num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # a: first 2 ids (0,1); b: first 3 (6,7,8); c absent -> dropped
    assert out["id"].tolist() == [0, 1, 6, 7, 8]


def test_resample_to_mix_exact_counts(ray_session):
    from verify_ray.pipelines.sample import resample_to_mix

    ids = np.arange(200, dtype=np.int64)
    grp = np.where(ids < 120, "big", np.where(ids < 190, "mid", "tiny"))
    t = pa.table({"doc_id": pa.array(ids),
                  "lang": pa.array(grp, type=pa.string())})
    # weights 1:1:1, total 90 -> target 30 each; tiny has only 10 rows
    out = (resample_to_mix(_ds(t, 4), {"big": 1, "mid": 1, "tiny": 1},
                           90, group_col="lang", num_buckets=4)
           .to_pandas())
    vc = out["lang"].value_counts().to_dict()
    assert vc == {"big": 30, "mid": 30, "tiny": 10}


def test_resample_to_mix_nested_in_total(ray_session):
    from verify_ray.pipelines.sample import resample_to_mix

    ids = np.arange(100, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "lang": pa.array(np.where(ids % 2 == 0, "x", "y"),
                                   type=pa.string())})
    lo = (resample_to_mix(_ds(t, 2), {"x": 1, "y": 1}, 20,
                          group_col="lang").to_pandas())
    hi = (resample_to_mix(_ds(t, 2), {"x": 1, "y": 1}, 60,
                          group_col="lang").to_pandas())
    assert set(lo["doc_id"]) <= set(hi["doc_id"])


def test_resample_to_mix_validates(ray_session):
    from verify_ray.pipelines.sample import resample_to_mix

    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "lang": pa.array(["x"])})
    with pytest.raises(ValueError):
        resample_to_mix(_ds(t, 1), {"x": -1}, 10, group_col="lang")
    with pytest.raises(ValueError):
        resample_to_mix(_ds(t, 1), {}, 10, group_col="lang")
