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
