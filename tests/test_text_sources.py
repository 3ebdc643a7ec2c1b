"""CSV / JSONL sources feed the same validation pipeline (W6 ext)."""

import json

import pytest

from verify_ray.engine import validate
from verify_ray.spec import ConstraintSpec

SPEC = {
    "key": "doc_id",
    "columns": {
        "doc_id": {"dtype": "string", "non_null": True},
        "n": {"dtype": "int64", "minimum": 0, "maximum": 100},
        "lang": {"dtype": "string", "enum": ["en", "de"]},
    },
}


def _check(rep):
    got = sorted(zip(rep.violations["doc_id"].to_pylist(),
                     rep.violations["rule_id"].to_pylist()))
    assert got == [("b", "more_than_expected"), ("c", "invalid_enum_value")]


def test_csv_source_validates(ray_session, tmp_path):
    from verify_ray.sources.text import read_csv_with_lineage

    p = tmp_path / "in.csv"
    p.write_text("doc_id,n,lang\na,5,en\nb,200,de\nc,7,zz\n")
    spec = ConstraintSpec.from_dict(SPEC)
    ds = read_csv_with_lineage([str(p)], spec).drop_columns(["path"])
    _check(validate(ds, spec))


def test_jsonl_source_validates(ray_session, tmp_path):
    from verify_ray.sources.text import read_jsonl_with_lineage

    p = tmp_path / "in.jsonl"
    rows = [{"doc_id": "a", "n": 5, "lang": "en"},
            {"doc_id": "b", "n": 200, "lang": "de"},
            {"doc_id": "c", "n": 7, "lang": "zz"}]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    spec = ConstraintSpec.from_dict(SPEC)
    ds = read_jsonl_with_lineage([str(p)], spec).drop_columns(["path"])
    _check(validate(ds, spec))


def test_csv_coercion_keeps_dtype_check_quiet(ray_session, tmp_path):
    """CSV type inference may widen int columns; coercion toward the
    spec keeps K2 about real mismatches."""
    from verify_ray.sources.text import read_csv_with_lineage

    p = tmp_path / "in.csv"
    p.write_text("doc_id,n,lang\na,1,en\n")
    spec = ConstraintSpec.from_dict(SPEC)
    ds = read_csv_with_lineage([str(p)], spec).drop_columns(["path"])
    rep = validate(ds, spec)
    assert "invalid_type" not in rep.violations["rule_id"].to_pylist()
    assert rep.ok
