"""Unit tests for the generic sort-free hash exchange stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_sum_per_key():
    # defined as a closure so cloudpickle ships it by VALUE (a test-
    # module global would need the workers to import the test module)
    def sum_per_key(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum")])
        return g.rename_columns(["k", "v"])

    return sum_per_key


def test_grouped_exchange_matches_groupby(ray_session):
    import ray.data as rd

    from verify_ray.stages.exchange import grouped_exchange

    rng = np.random.RandomState(11)
    df = pd.DataFrame({"k": rng.randint(0, 50, size=5000),
                       "v": rng.randint(0, 10, size=5000)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).map_batches(
        lambda t: t.append_column(
            "bucket", t.column("k").cast(pa.int64())),
        batch_format="pyarrow")
    out = grouped_exchange(ds, "bucket", 7, _make_sum_per_key()).to_pandas()
    expect = df.groupby("k", as_index=False)["v"].sum()
    merged = out.sort_values("k").reset_index(drop=True)
    expect = expect.sort_values("k").reset_index(drop=True)
    assert list(merged.k) == list(expect.k)
    assert list(merged.v) == list(expect.v)


def test_grouped_exchange_bucket_isolation(ray_session):
    """Each group_fn invocation sees only rows of its own hash bucket."""
    import ray.data as rd

    from verify_ray.stages.exchange import grouped_exchange

    t = pa.table({"bucket": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "x": pa.array([10, 20, 30, 40])})

    def check(tab: pa.Table) -> pa.Table:
        import numpy as _np

        b = _np.unique(tab.column("bucket").to_numpy(zero_copy_only=False) % 4)
        assert len(b) == 1
        return tab

    out = grouped_exchange(rd.from_arrow(t), "bucket", 4, check,
                           drop_bucket=False)
    assert out.num_rows == 4


def test_grouped_exchange_empty_ds(ray_session):
    import ray.data as rd

    from verify_ray.stages.exchange import grouped_exchange

    ds = rd.from_arrow(pa.table({"bucket": pa.array([], type=pa.int64())}))
    assert grouped_exchange(ds, "bucket", 4, lambda t: t) is None


def test_grouped_exchange_ds_stable_schema(ray_session):
    import ray.data as rd

    from verify_ray.stages.exchange import grouped_exchange_ds

    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    t = pa.table({"bucket": pa.array([5], type=pa.int64()),
                  "k": pa.array([5], type=pa.int64()),
                  "v": pa.array([1], type=pa.int64())})
    out = grouped_exchange_ds(rd.from_arrow(t), "bucket", 8,
                              _make_sum_per_key(), schema)
    assert out.schema().names == ["k", "v"]
    assert out.count() == 1


# ---- VERDICT r4 item 6: hot-bucket guard ------------------------------------

def test_max_bucket_rows_guard_trips_on_hot_key(ray_session):
    """A single pathological key concentrating the exchange must raise
    HotBucketError (with guidance), not silently run one giant merge."""
    import ray
    import ray.data as rd

    from verify_ray.stages.exchange import HotBucketError, grouped_exchange

    # 5,000 rows, ALL on one bucket value — no num_buckets fixes this
    t = pa.table({"bucket": pa.array(np.zeros(5000, dtype=np.int64)),
                  "val": pa.array(np.arange(5000))})
    ds = rd.from_arrow(t).repartition(4).materialize()
    with pytest.raises(ray.exceptions.RayTaskError) as ei:
        grouped_exchange(ds, "bucket", 16, lambda tab: tab,
                         drop_bucket=False, max_bucket_rows=1000)
    assert isinstance(ei.value.cause, HotBucketError)
    assert "salt the hot key" in str(ei.value.cause)


def test_max_bucket_rows_guard_passes_under_limit(ray_session):
    import ray.data as rd

    from verify_ray.stages.exchange import grouped_exchange

    rng = np.random.RandomState(7)
    t = pa.table({"bucket": pa.array(rng.randint(0, 64, 5000).astype(np.int64)),
                  "val": pa.array(np.arange(5000))})
    ds = rd.from_arrow(t).repartition(4).materialize()
    out = grouped_exchange(ds, "bucket", 16, lambda tab: tab,
                           drop_bucket=False, max_bucket_rows=1000)
    assert out.num_rows == 5000


def test_max_bucket_rows_guard_trips_on_tree_path(ray_session):
    import ray
    import ray.data as rd

    from verify_ray.stages.exchange import HotBucketError, grouped_exchange

    t = pa.table({"bucket": pa.array(np.zeros(5000, dtype=np.int64)),
                  "val": pa.array(np.arange(5000))})
    ds = rd.from_arrow(t).repartition(4).materialize()
    with pytest.raises(ray.exceptions.RayTaskError) as ei:
        grouped_exchange(ds, "bucket", 64, lambda tab: tab,
                         drop_bucket=False, two_level=True,
                         max_bucket_rows=1000)
    assert isinstance(ei.value.cause, HotBucketError)


# ---- VERDICT r2 item 6: two-level (tree) exchange --------------------------

def _make_sum_group_fn():
    # built inside each test so it pickles as a closure (test modules
    # are not importable from Ray workers)
    def _sum_group_fn(t):
        import pandas as pd
        import pyarrow as pa

        b = t.column("bucket").to_numpy(zero_copy_only=False)
        v = t.column("val").to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"bucket": b, "val": v})
             .groupby("bucket", as_index=False)["val"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    return _sum_group_fn


def test_tree_exchange_matches_flat(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from verify_ray.stages.exchange import grouped_exchange

    rng = np.random.RandomState(3)
    n = 20_000
    t = pa.table({"bucket": pa.array(rng.randint(0, 1 << 60, n).astype(np.uint64)),
                  "val": pa.array(rng.randint(0, 100, n))})
    ds = rd.from_arrow(t).repartition(8).materialize()
    fn = _make_sum_group_fn()
    flat = grouped_exchange(ds, "bucket", 64, fn,
                            drop_bucket=False, two_level=False)
    tree = grouped_exchange(ds, "bucket", 64, fn,
                            drop_bucket=False, two_level=True)
    f = flat.to_pandas().sort_values("bucket").reset_index(drop=True)
    tr = tree.to_pandas().sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(f, tr)


def test_tree_exchange_1024_buckets_256_blocks_no_driver_concat(ray_session):
    """B=1,024 buckets over 256 map blocks through grouped_exchange_ds:
    results stay in the object store (a Dataset, no driver concat) and
    the per-bucket sums reproduce a direct pandas groupby.  Flat refs
    would be 256×1024 ≈ 262k; the tree needs ~256×32 + 32×32 + 1024."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from verify_ray.stages.exchange import grouped_exchange_ds

    rng = np.random.RandomState(11)
    n = 100_000
    bk = rng.randint(0, 1 << 60, n).astype(np.uint64)
    vals = rng.randint(0, 100, n)
    t = pa.table({"bucket": pa.array(bk), "val": pa.array(vals)})
    ds = rd.from_arrow(t).repartition(256).materialize()
    schema = pa.schema([("bucket", pa.uint64()), ("val", pa.int64())])
    out_ds = grouped_exchange_ds(ds, "bucket", 1024, _make_sum_group_fn(),
                                 empty_schema=schema, drop_bucket=False,
                                 two_level=True)
    got = (out_ds.to_pandas().astype({"bucket": "uint64", "val": "int64"})
           .sort_values("bucket").reset_index(drop=True))
    exp = (pd.DataFrame({"bucket": bk, "val": vals})
           .groupby("bucket", as_index=False)["val"].sum()
           .astype({"bucket": "uint64", "val": "int64"})
           .sort_values("bucket").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
