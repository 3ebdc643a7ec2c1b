"""shuffle.zorder_key + zonemap.pruned_read_2d: Morton clustering and
two-dimensional file pruning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_morton16_bit_interleave():
    from verify_ray.pipelines.shuffle import morton16

    x = np.array([0b1010, 0, 0xFFFF], dtype=np.int64)
    y = np.array([0b0101, 0xFFFF, 0], dtype=np.int64)
    z = morton16(x, y)
    # bit i of x -> 2i, bit i of y -> 2i+1
    # x=1010/y=0101 (LSB first: x -> even, y -> odd positions):
    # bits 0..7 = x0 y0 x1 y1 x2 y2 x3 y3 = 0 1 1 0 0 1 1 0
    assert z[0] == 0b01100110
    assert z[1] == int("10" * 16, 2)
    assert z[2] == int("01" * 16, 2)


def test_morton16_preserves_quadrants():
    from verify_ray.pipelines.shuffle import morton16

    # all points in the low-low quadrant sort before any point in the
    # high-high quadrant
    rng = np.random.default_rng(2)
    lo = morton16(rng.integers(0, 2 ** 15, 50),
                  rng.integers(0, 2 ** 15, 50))
    hi = morton16(rng.integers(2 ** 15, 2 ** 16, 50),
                  rng.integers(2 ** 15, 2 ** 16, 50))
    assert lo.max() < hi.min()


def _write_layout(tmp_path, ray_session):
    import ray.data as rd

    from verify_ray.pipelines.shuffle import sort_by_range, zorder_key

    rng = np.random.default_rng(8)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 1000, n),
        "y": rng.integers(0, 1000, n)})
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).materialize()
    keyed, meta = zorder_key(ds, "x", "y")
    assert meta == {"lo_x": df.x.min(), "hi_x": df.x.max(),
                    "lo_y": df.y.min(), "hi_y": df.y.max()}
    out = sort_by_range(keyed.materialize(), "zkey", "id",
                        n_shards=8, values=["id", "x", "y"])
    import pyarrow.parquet as pq

    root = str(tmp_path / "z")
    t = out.to_pandas()
    import os

    os.makedirs(root)
    for sid, g in t.groupby("shard_id"):
        pq.write_table(
            pa.Table.from_pandas(g[["id", "x", "y"]],
                                 preserve_index=False),
            f"{root}/shard-{sid}.parquet")
    return root, df


def test_zorder_2d_prune_correct_and_effective(ray_session, tmp_path):
    from verify_ray.sources.zonemap import pruned_read_2d

    root, df = _write_layout(tmp_path, ray_session)
    ds, stats = pruned_read_2d(root, ("x", 0, 120), ("y", 0, 120))
    ref = df[(df.x <= 120) & (df.y <= 120)].sort_values("id")
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out, ref.reset_index(drop=True), check_dtype=False)
    # a corner query over a z-ordered layout must skip most files —
    # with an id- or x-sorted layout the y constraint prunes nothing
    assert stats["files_read"] < stats["files_total"]


def test_pruned_read_2d_empty_range(ray_session, tmp_path):
    from verify_ray.sources.zonemap import pruned_read_2d

    root, _ = _write_layout(tmp_path, ray_session)
    ds, stats = pruned_read_2d(root, ("x", 5000, 6000),
                               ("y", 0, 10), columns=["id"])
    assert ds.count() == 0
    assert stats["files_read"] == 0
