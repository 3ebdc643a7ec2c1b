"""grouping_sets_counts (requested sets only, null markers, empty
grand-total) and melt (wide->long, type promotion, null values)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def test_grouping_sets_vs_pandas(ray_session):
    from verify_ray.pipelines.analytics import grouping_sets_counts

    rng = np.random.default_rng(2)
    n = 300
    a = rng.choice(["x", "y", "z"], n)
    b = rng.choice(["p", "q"], n).astype(object)
    b[::50] = None  # data-null rows drop entirely
    t = pa.table({"a": pa.array(a), "b": pa.array(b, pa.string()),
                  "v": pa.array(np.ones(n, np.int64))})
    out = grouping_sets_counts(_ds(t), ["a", "b"],
                               [["a", "b"], ["b"], []])
    df = pd.DataFrame({"a": a, "b": b}).dropna()
    fine = df.groupby(["a", "b"]).size()
    # (a,b) set
    for (av, bv), c in fine.items():
        row = out[(out.a == av) & (out.b == bv)]
        assert row.n.item() == c
    # (b) set: a is NULL
    for bv, c in df.groupby("b").size().items():
        row = out[out.a.isna() & (out.b == bv)]
        assert row.n.item() == c
    # () grand total
    assert out[out.a.isna() & out.b.isna()].n.item() == len(df)
    # ROLLUP-style (a)-only set NOT requested -> absent
    assert not len(out[out.a.notna() & out.b.isna()])
    assert len(out) == len(fine) + df.b.nunique() + 1


def test_grouping_sets_validation_and_empty(ray_session):
    import pytest

    from verify_ray.pipelines.analytics import grouping_sets_counts

    t = pa.table({"a": pa.array([], pa.string()),
                  "b": pa.array([], pa.string())})
    out = grouping_sets_counts(_ds(t, 1), ["a", "b"], [["a"], []])
    # SQL: the () set still emits a 0 grand-total row; (a) emits none
    assert len(out) == 1 and out.n.item() == 0
    with pytest.raises(ValueError):
        grouping_sets_counts(_ds(t, 1), ["a"], [["nope"]])


def test_melt_long_form(ray_session):
    from verify_ray.pipelines.analytics import melt

    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "p": pa.array([10, None], pa.int64()),
                  "q": pa.array([7, 8], pa.int32())})  # promotes int64
    out = (melt(_ds(t, 1), ["id"], ["p", "q"]).to_pandas()
           .sort_values(["id", "variable"]).reset_index(drop=True))
    assert list(out.columns) == ["id", "variable", "value"]
    assert out.variable.tolist() == ["p", "q", "p", "q"]
    vals = [None if pd.isna(v) else int(v) for v in out.value]
    assert vals == [10, 7, None, 8]
