"""sort_by_range: exact range-partitioned distributed sort."""

import numpy as np
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 4):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)]
                         if n else tbl)


def test_sort_by_range_total_order(ray_session):
    from verify_ray.pipelines.shuffle import sort_by_range

    rng = np.random.default_rng(13)
    n = 600
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 80, n).astype(np.int64)
    t = pa.table({"id": pa.array(ids), "v": pa.array(vals)})
    out = (sort_by_range(_ds(t, 5), "v", "id", n_shards=8)
           .to_pandas())

    # concatenating shards in (shard_id, pos) order IS the total order
    got = (out.sort_values(["shard_id", "pos"])
           .reset_index(drop=True))
    order = np.lexsort((ids, vals))
    assert got["id"].tolist() == ids[order].tolist()
    assert got["v"].tolist() == vals[order].tolist()

    # range property: shard i's max <= shard i+1's min
    bounds = (out.groupby("shard_id")["v"].agg(["min", "max"])
              .sort_index())
    for a, b in zip(bounds["max"].iloc[:-1], bounds["min"].iloc[1:]):
        assert a <= b
    # pos is 1-based and dense within each shard
    for _, g in out.groupby("shard_id"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))


def test_sort_by_range_all_ties_one_shard(ray_session):
    from verify_ray.pipelines.shuffle import sort_by_range

    t = pa.table({"id": pa.array(np.arange(50, dtype=np.int64)),
                  "v": pa.array(np.full(50, 7, dtype=np.int64))})
    out = sort_by_range(_ds(t, 3), "v", "id", n_shards=4).to_pandas()
    # one value class cannot split: every row lands in one shard
    assert out["shard_id"].nunique() == 1
    assert len(out) == 50


def test_sort_by_range_single_shard_and_nulls(ray_session):
    from verify_ray.pipelines.shuffle import sort_by_range

    t = pa.table({
        "id": pa.array([3, 1, None, 2], type=pa.int64()),
        "v": pa.array([5, None, 4, 5], type=pa.int64())})
    out = sort_by_range(_ds(t, 1), "v", "id", n_shards=1).to_pandas()
    assert out["id"].tolist() == [2, 3]  # nulls dropped; (v,id) order
    assert out["pos"].tolist() == [1, 2]
