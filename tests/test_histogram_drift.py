"""analytics.grouped_histogram / histogram_drift vs numpy references
and the driver's DuckDB oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.pipelines.analytics import grouped_histogram, histogram_drift


def _ds(groups, values, blocks=1):
    import ray.data as rd

    t = pa.table({"g": pa.array(groups, type=pa.string()),
                  "v": pa.array(values, type=pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def _brute_hist(groups, values, lo, hi, n_bins):
    out = {}
    for g, v in zip(groups, values):
        if g is None or v is None:
            continue
        b = min(max(v - lo, 0) * n_bins // (hi - lo), n_bins - 1)
        out[(g, b)] = out.get((g, b), 0) + 1
    return out


@pytest.mark.parametrize("blocks", [1, 5])
def test_grouped_histogram_matches_brute(ray_session, blocks):
    rng = np.random.default_rng(3)
    groups = [f"g{i % 3}" for i in range(300)]
    values = rng.integers(-20, 120, 300).tolist()
    got = grouped_histogram(_ds(groups, values, blocks), "g", "v",
                            lo=0, hi=100, n_bins=10)
    want = _brute_hist(groups, values, 0, 100, 10)
    assert {(r.group, r.bucket): r.cnt
            for r in got.itertuples(index=False)} == want


def test_clamping_and_nulls(ray_session):
    groups = ["a", "a", "a", None, "a"]
    values = [-5, 0, 99, 5, None]
    got = grouped_histogram(_ds(groups, values), "g", "v", 0, 100, 10)
    # -5 clamps to bucket 0; null group and null value dropped
    m = {(r.group, r.bucket): r.cnt for r in got.itertuples(index=False)}
    assert m == {("a", 0): 2, ("a", 9): 1}
    hi_val = grouped_histogram(_ds(["a"], [1000]), "g", "v", 0, 100, 10)
    assert hi_val.bucket.tolist() == [9]  # above-range clamps to last


def test_histogram_drift_outer_union(ray_session):
    cur = _ds(["a", "a", "b"], [5, 5, 50])
    ref = _ds(["a", "c"], [5, 10])
    out = histogram_drift(cur, ref, "g", "v", 0, 100, 10)
    m = {(r.group, r.bucket): (r.n_cur, r.n_ref, r.diff)
         for r in out.itertuples(index=False)}
    assert m[("a", 0)] == (2, 1, 1)
    assert m[("b", 5)] == (1, 0, 1)
    assert m[("c", 1)] == (0, 1, 1)
    # sorted by (group, bucket)
    assert out[["group", "bucket"]].values.tolist() == sorted(
        out[["group", "bucket"]].values.tolist())


def test_driver_drift_histogram_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["drift_histogram"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["drift_histogram"]).df()
    assert len(mine) > 0
    ints = {c: "int64" for c in ["bucket", "n_cur", "n_ref", "diff"]}
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)
