"""Regression tests for the sixth-continuation review findings."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, blocks: int = 3):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)]
                         if n else tbl)


def test_resample_to_mix_int_group_keys(ray_session):
    # finding 1: int weight keys on an int64 group column used to
    # match nothing and silently return an empty dataset
    from verify_ray.pipelines.sample import resample_to_mix

    ids = np.arange(60, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "dom": pa.array((ids % 2).astype(np.int64))})
    out = (resample_to_mix(_ds(t, 2), {0: 1, 1: 1}, 20,
                           group_col="dom", key_col="doc_id")
           .to_pandas())
    assert len(out) == 20
    assert out["dom"].value_counts().to_dict() == {0: 10, 1: 10}


def test_knn_join_tie_break_by_id(ray_session):
    # finding 2: duplicate embeddings tie at the per-batch top-k
    # boundary; the survivor must be the SMALLEST vec_id
    from verify_ray.pipelines.similarity import knn_join

    base_vec = np.array([1.0, 0.0, 0.0, 0.0])
    # 12 identical base vectors (ids shuffled within the block) plus
    # one orthogonal distractor; k=5 must keep ids 0..4
    ids = np.array([7, 3, 11, 0, 9, 5, 1, 8, 2, 10, 4, 6],
                   dtype=np.int64)
    vecs = np.tile(base_vec, (12, 1))
    base = pa.table({
        "vec_id": pa.array(
            np.concatenate([ids, np.array([99], dtype=np.int64)])),
        "embedding": pa.array(
            [v.tolist() for v in vecs] + [[0.0, 1.0, 0.0, 0.0]],
            type=pa.list_(pa.float64()))})
    q = pa.table({
        "vec_id": pa.array([1000], type=pa.int64()),
        "embedding": pa.array([base_vec.tolist()],
                              type=pa.list_(pa.float64()))})
    out = (knn_join(_ds(q, 1), _ds(base, 1), k=5, num_buckets=2)
           .to_pandas())
    assert sorted(out["vec_id"].tolist()) == [0, 1, 2, 3, 4]


def test_rollup_counts_empty_emits_grand_total(ray_session):
    # finding 3: SQL ROLLUP over a fully-filtered input still emits
    # the grand-total row (NULL, NULL, 0)
    from verify_ray.pipelines.analytics import rollup_counts

    t = pa.table({"a": pa.array([None, None], type=pa.string()),
                  "b": pa.array(["x", "y"])})
    out = rollup_counts(_ds(t, 1), ["a", "b"])
    assert len(out) == 1
    assert out.loc[0, "a"] is None and out.loc[0, "b"] is None
    assert out.loc[0, "n"] == 0


def test_global_rank_rejects_missing_id_in_values(ray_session):
    from verify_ray.pipelines.select import global_rank

    t = pa.table({"id": pa.array([1], type=pa.int64()),
                  "s": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError, match="id_col"):
        global_rank(_ds(t, 1), "s", "id", values=["s"])


def test_sort_by_range_rejects_missing_id_in_values(ray_session):
    from verify_ray.pipelines.shuffle import sort_by_range

    t = pa.table({"id": pa.array([1], type=pa.int64()),
                  "v": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError, match="id_col"):
        sort_by_range(_ds(t, 1), "v", "id", n_shards=2, values=["v"])


def test_user_histories_string_user_keys(ray_session):
    # finding 9: non-integer user columns used to crash on the int64
    # cast (and the output column ignored user_col)
    from verify_ray.pipelines.sessions import user_histories

    t = pa.table({
        "sess": pa.array(["s-b", "s-a", "s-b"], type=pa.string()),
        "ts": pa.array([30, 10, 20], type=pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "event_type": pa.array(["y", "x", "z"])})
    out = (user_histories(_ds(t, 1), user_col="sess")
           .to_pandas().sort_values("sess").reset_index(drop=True))
    assert out["sess"].tolist() == ["s-a", "s-b"]
    assert out["history"].tolist() == ["x", "z,y"]
