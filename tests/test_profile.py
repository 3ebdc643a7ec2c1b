"""Profiling + spec-inference tests."""

import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet")


def test_profile_matches_duckdb(docs_ds):
    import duckdb

    from verify_ray.pipelines.profile import profile

    prof = profile(docs_ds).set_index("column")
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    n, nmin, nmax, nd = con.execute(
        "SELECT COUNT(*), MIN(n_chars), MAX(n_chars), "
        "COUNT(DISTINCT lang) FROM documents").fetchone()
    assert prof.loc["n_chars", "n"] == n
    assert prof.loc["n_chars", "min"] == float(nmin)
    assert prof.loc["n_chars", "max"] == float(nmax)
    assert prof.loc["lang", "n_distinct"] == nd
    assert prof.loc["text", "nulls"] == 0


def test_infer_spec_roundtrip(docs_ds):
    """Inferred spec compiles and passes on the data it was inferred
    from (derive-from-data is self-consistent, like derived schemas
    validating default values — reference tests/schemars.rs:28-35)."""
    from verify_ray.engine import validate
    from verify_ray.pipelines.profile import infer_spec

    spec = infer_spec(docs_ds, key="doc_id")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["lang"].enum == ["de", "en", "es", "fr", "zh"]
    assert by_name["n_chars"].minimum is not None
    assert by_name["doc_id"].non_null
    rep = validate("/root/testdata/sf0.001/documents.parquet", spec.compile())
    assert rep.ok, rep.violations.to_pylist()[:5]


def test_profile_hll_approx(docs_ds):
    from verify_ray.pipelines.profile import profile

    prof = profile(docs_ds).set_index("column")
    for col in ("lang", "doc_id", "text"):
        exact, approx = prof.loc[col, "n_distinct"], prof.loc[col, "n_distinct_approx"]
        assert approx is not None
        assert abs(approx - exact) / max(exact, 1) < 0.05, (col, exact, approx)
