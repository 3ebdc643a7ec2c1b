"""latest_by_key (CDC compaction) and pivot_counts (wide matrix)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 3):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)]
                         if n else tbl)


def test_latest_by_key_picks_newest(ray_session):
    from verify_ray.pipelines.select import latest_by_key

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b", None],
                      type=pa.string()),
        "v": pa.array([1, 3, 2, 5, 5, 9], type=pa.int64()),
        "i": pa.array([10, 11, 12, 20, 21, 30], type=pa.int64()),
        "payload": pa.array(["x1", "x2", "x3", "y1", "y2", "z"])})
    out = (latest_by_key(_ds(t, 3), ["k"], "v", "i",
                         values=["k", "i", "payload"], num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # a: max v=3 -> i=11; b: tie v=5 -> larger i=21; null key dropped
    assert out["k"].tolist() == ["a", "b"]
    assert out["i"].tolist() == [11, 21]
    assert out["payload"].tolist() == ["x2", "y2"]


def test_latest_by_key_matches_pandas(ray_session):
    from verify_ray.pipelines.select import latest_by_key

    rng = np.random.default_rng(11)
    n = 400
    t = pa.table({
        "k": pa.array((rng.integers(0, 30, n)).astype(str)),
        "v": pa.array(rng.integers(0, 20, n).astype(np.int64)),
        "i": pa.array(rng.permutation(n).astype(np.int64))})
    out = (latest_by_key(_ds(t, 5), ["k"], "v", "i",
                         values=["k", "v", "i"], num_buckets=8)
           .to_pandas().sort_values("k").reset_index(drop=True))
    df = t.to_pandas()
    ref = (df.sort_values(["k", "v", "i"],
                          ascending=[True, False, False])
           .groupby("k", as_index=False).head(1)
           .sort_values("k").reset_index(drop=True)[["k", "v", "i"]])
    pd.testing.assert_frame_equal(out, ref)


def test_pivot_counts(ray_session):
    from verify_ray.pipelines.analytics import pivot_counts

    t = pa.table({
        "r": pa.array(["x", "x", "y", "y", "y", None, "x"]),
        "c": pa.array(["a", "b", "a", "a", None, "a", "zz"])})
    out = pivot_counts(_ds(t, 3), "r", "c", ["a", "b"])
    # null rows/cats and unknown category "zz" ignored
    ref = pd.DataFrame({"r": ["x", "y"], "n_a": [1, 2], "n_b": [1, 0]})
    pd.testing.assert_frame_equal(out, ref.astype({"n_a": "int64",
                                                   "n_b": "int64"}))


def test_rollup_counts_levels(ray_session):
    from verify_ray.pipelines.analytics import rollup_counts

    t = pa.table({
        "a": pa.array(["x", "x", "y", None, "x"]),
        "b": pa.array(["p", "q", "p", "p", "p"])})
    out = rollup_counts(_ds(t, 2), ["a", "b"])
    # null-a row dropped; finest: (x,p)=2,(x,q)=1,(y,p)=1;
    # subtotals: (x,None)=3,(y,None)=1; grand: (None,None)=4
    rows = {(r.a, r.b): r.n for r in out.itertuples()}
    assert rows[("x", "p")] == 2 and rows[("x", "q")] == 1
    assert rows[("x", None)] == 3 and rows[("y", None)] == 1
    assert rows[(None, None)] == 4
    assert len(out) == 6


def test_pivot_counts_empty(ray_session):
    from verify_ray.pipelines.analytics import pivot_counts

    t = pa.table({"r": pa.array([], type=pa.string()),
                  "c": pa.array([], type=pa.string())})
    out = pivot_counts(_ds(t, 1), "r", "c", ["a"])
    assert list(out.columns) == ["r", "n_a"]
    assert len(out) == 0
