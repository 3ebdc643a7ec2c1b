"""diff.dataset_diff vs a scalar reference and the driver oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.pipelines.diff import dataset_diff


def _ds(rows, blocks=1):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([r[0] for r in rows], type=pa.string()),
                  "text": pa.array([r[1] for r in rows], type=pa.string())})
    return rd.from_arrow(t).repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 4])
def test_diff_statuses(ray_session, blocks):
    ref = [("a", "one"), ("b", "two"), ("c", "three"), ("d", "four")]
    cur = [("a", "one"), ("b", "two CHANGED"), ("d", "four"), ("e", "five")]
    out = dataset_diff(_ds(cur, blocks), _ds(ref, blocks))
    got = set(map(tuple, out.itertuples(index=False)))
    assert got == {("b", "changed"), ("c", "removed"), ("e", "added")}


def test_diff_identical_epochs_empty(ray_session):
    rows = [(f"d{i}", f"text {i}") for i in range(50)]
    out = dataset_diff(_ds(rows, 2), _ds(rows, 3))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "status"]


def test_diff_randomized_vs_brute(ray_session):
    rng = np.random.default_rng(5)
    ref = {f"d{i}": f"text {rng.integers(0, 4)}" for i in range(80)}
    cur = {}
    for k, v in ref.items():
        r = rng.random()
        if r < 0.2:
            continue  # removed
        cur[k] = v + " mod" if r < 0.4 else v
    for i in range(10):
        cur[f"new{i}"] = "fresh"
    want = set()
    for k in set(ref) | set(cur):
        if k not in ref:
            want.add((k, "added"))
        elif k not in cur:
            want.add((k, "removed"))
        elif cur[k] != ref[k]:
            want.add((k, "changed"))
    out = dataset_diff(_ds(sorted(cur.items()), 3),
                       _ds(sorted(ref.items()), 2))
    assert set(map(tuple, out.itertuples(index=False))) == want


def test_driver_validate_delta_oracle(ray_session):
    """Scoped revalidation: diff names the delta, only the delta is
    validated, violations match the SQL arms applied to the delta."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["validate_delta"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["validate_delta"]).df()
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    # and the delta is a strict subset of a full validation's scope
    full = e.queries()["validate_documents"](sf)
    assert len(mine) <= len(full)


def test_driver_dataset_diff_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["dataset_diff"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["dataset_diff"]).df()
    assert {"added", "removed", "changed"} <= set(mine.status)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
