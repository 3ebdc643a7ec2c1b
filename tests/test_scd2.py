"""scd2_intervals: validity-interval chains — LEAD parity, tie order
by id, open current end, null-row drops, cross-key isolation."""

import pandas as pd
import pyarrow as pa


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def test_scd2_chains(ray_session):
    from verify_ray.pipelines.sessions import scd2_intervals

    ts = lambda v: pa.array(v, pa.timestamp("us"))  # noqa: E731
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, None, 1], pa.int64()),
        "ts": ts([100, 300, 200, 50, None, 10, 200]),
        "v": pa.array(["a", "c", "b", "x", "y", "z", "b2"]),
        "id": pa.array([10, 30, 20, 1, 2, 3, 21], pa.int64())})
    out = (scd2_intervals(_ds(t), "k", "ts", ["v"], "id", num_buckets=4)
           .to_pandas().sort_values(["k", "valid_from", "v"])
           .reset_index(drop=True))
    # null key/ts rows dropped; key 1 chain ordered (100,200@20,200@21,
    # 300) — tie at ts=200 ordered by id, each valid_to = next ts
    k1 = out[out.k == 1]
    assert k1.v.tolist() == ["a", "b", "b2", "c"]
    assert [x.value // 1000 for x in k1.valid_from] == [100, 200,
                                                        200, 300]
    vt = [None if pd.isna(x) else x.value // 1000 for x in k1.valid_to]
    assert vt == [200, 200, 300, None]
    assert k1.is_current.tolist() == [False, False, False, True]
    # key 2: single surviving row -> current with open end
    k2 = out[out.k == 2]
    assert k2.v.tolist() == ["x"] and k2.is_current.tolist() == [True]
    assert len(out) == 5
