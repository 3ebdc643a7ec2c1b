"""M1 nested struct-column validation with dotted spans — the
reference's signature recursion (schema.rs:900-912 via the serde map
traversal serde.rs:836-840,992-996; dotted spans span.rs:101-103).

The golden test mirrors /root/reference/verify/examples/schemars_json.rs
(:40-75): nested enum violation, nested array element, unknown property,
missing required property — re-expressed on an Arrow struct column.
"""

import pyarrow as pa

from verify_ray.spec import ColumnSpec, ConstraintSpec


def _plan(spec_dict):
    return ConstraintSpec.from_dict(spec_dict).compile()


def _rows(plan, t):
    v = plan.validate_batch(t)
    return sorted(zip(v["doc_id"].to_pylist(), v["rule_id"].to_pylist(),
                      v["span"].to_pylist()))


GOLDEN_SPEC = {
    # examples/schemars_json.rs:7-48 translated: SomeStruct {
    #   some_inner: { inner_values: [string; <=2], inner_value: enum {1,3} },
    #   some_int: int32 (required) }
    "key": "id",
    "allow_unknown_columns": False,
    "columns": {
        "id": {"dtype": "string"},
        "some_inner": {
            "fields": {
                "inner_values": {"element_dtype": "string", "max_items": 2},
                "inner_value": {"dtype": "int64", "enum": [1, 3]},
            },
        },
        "some_int": {"dtype": "int32", "required": True},
    },
}


def golden_table(extra_cols=True):
    inner = pa.array(
        [{"inner_values": ["value", "2"], "inner_value": 2}],
        type=pa.struct([
            ("inner_values", pa.list_(pa.string())),
            ("inner_value", pa.int64()),
        ]))
    cols = {"id": pa.array(["row0"]), "some_inner": inner}
    if extra_cols:
        cols["unexpected_property"] = pa.array([2], type=pa.int64())
    return pa.table(cols)


def test_golden_example_nested_spans():
    """The four golden errors (examples/schemars_json.rs:72-75), Arrow
    edition.  (Arrow lists are homogeneous so the mixed-type element
    error becomes an enum violation on the nested scalar — the SPAN
    mechanics, which is what the example demonstrates, are identical.)"""
    plan = _plan(GOLDEN_SPEC)
    t = golden_table()

    # row-level kernels: nested enum violation with dotted span
    assert _rows(plan, t) == [
        ("row0", "invalid_enum_value", "some_inner.inner_value")]

    # schema-level: unknown top-level property + missing required some_int
    sv = sorted((rid, span) for rid, span, _ in plan.schema_violations(t.schema))
    assert sv == [("required_property", ""),
                  ("unknown_property", "unexpected_property")]
    msgs = {rid: m for rid, _, m in plan.schema_violations(t.schema)}
    assert msgs["required_property"] == 'the required property "some_int" is missing'


def test_nested_list_element_span():
    """Dotted element span through a struct: some_inner.inner_values.1
    — the exact span of the reference golden line 73."""
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "some_inner": {
                "fields": {
                    "inner_values": {"element_enum": ["value", "other"]},
                },
            },
        },
    }
    inner = pa.array(
        [{"inner_values": ["value", "2"]}, {"inner_values": ["other"]}],
        type=pa.struct([("inner_values", pa.list_(pa.string()))]))
    t = pa.table({"id": pa.array(["a", "b"]), "some_inner": inner})
    assert _rows(_plan(spec), t) == [
        ("a", "invalid_enum_value", "some_inner.inner_values.1")]


def test_deep_nesting_three_levels():
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "a": {"fields": {
                "b": {"fields": {
                    "c": {"dtype": "int64", "minimum": 10},
                }},
            }},
        },
    }
    typ = pa.struct([("b", pa.struct([("c", pa.int64())]))])
    t = pa.table({
        "id": pa.array(["x", "y"]),
        "a": pa.array([{"b": {"c": 5}}, {"b": {"c": 50}}], type=typ),
    })
    assert _rows(_plan(spec), t) == [("x", "less_than_expected", "a.b.c")]


def test_null_parent_struct_gates_children():
    """A null parent struct never trips child rules — the reference does
    not descend into absent maps (serde.rs:992-996); whether the parent
    itself may be null is the parent's non_null's business."""
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"non_null": True,
                     "fields": {"v": {"dtype": "int64", "non_null": True,
                                      "minimum": 0}}},
        },
    }
    typ = pa.struct([("v", pa.int64())])
    t = pa.table({
        "id": pa.array(["a", "b", "c"]),
        "meta": pa.array([None, {"v": None}, {"v": -1}], type=typ),
    })
    assert _rows(_plan(spec), t) == [
        ("a", "non_null", "meta"),       # parent null -> parent's rule only
        ("b", "non_null", "meta.v"),     # child null inside valid parent
        ("c", "less_than_expected", "meta.v"),
    ]


def test_nested_required_field_missing_schema_level():
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"fields": {"must_exist": {"dtype": "int64"}}},
        },
    }
    plan = _plan(spec)
    typ = pa.struct([("other", pa.int64())])
    sch = pa.schema([("id", pa.string()), ("meta", typ)])
    sv = plan.schema_violations(sch)
    assert [(r, s) for r, s, _ in sv] == [("required_property", "meta")]
    assert 'must_exist' in sv[0][2]


def test_nested_dtype_mismatch_schema_level():
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"fields": {"v": {"dtype": "int64"}}},
        },
    }
    sch = pa.schema([("id", pa.string()),
                     ("meta", pa.struct([("v", pa.string())]))])
    sv = _plan(spec).schema_violations(sch)
    assert [(r, s) for r, s, _ in sv] == [("invalid_type", "meta.v")]


def test_struct_not_a_struct_schema_level():
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"fields": {"v": {"dtype": "int64"}}},
        },
    }
    sch = pa.schema([("id", pa.string()), ("meta", pa.int64())])
    sv = _plan(spec).schema_violations(sch)
    assert ("invalid_type", "meta") in [(r, s) for r, s, _ in sv]


def test_strict_struct_unknown_fields():
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"allow_unknown_fields": False,
                     "fields": {"v": {"dtype": "int64"}}},
        },
    }
    sch = pa.schema([
        ("id", pa.string()),
        ("meta", pa.struct([("v", pa.int64()), ("rogue", pa.string())]))])
    sv = _plan(spec).schema_violations(sch)
    assert [(r, s) for r, s, _ in sv] == [("unknown_property", "meta.rogue")]


def test_missing_parent_reports_once():
    """Parent absent entirely: one required_property for the parent, no
    cascade for its children (mirrors single-level reporting in the
    reference — an absent map is one error)."""
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"required": True, "fields": {"v": {"dtype": "int64"}}},
        },
    }
    sch = pa.schema([("id", pa.string())])
    sv = _plan(spec).schema_violations(sch)
    assert [(r, s) for r, s, _ in sv] == [("required_property", "")]


def test_nested_combinator_cross_field():
    """Combinator predicates can reference nested paths (column key)."""
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"fields": {
                "kind": {"dtype": "string"},
                "value": {"dtype": "float64", "checks": [{
                    "if": {"column": "meta.kind", "enum": ["big"]},
                    "then": {"minimum": 100},
                }]},
            }},
        },
    }
    typ = pa.struct([("kind", pa.string()), ("value", pa.float64())])
    t = pa.table({
        "id": pa.array(["a", "b", "c"]),
        "meta": pa.array([{"kind": "big", "value": 5.0},
                          {"kind": "small", "value": 5.0},
                          {"kind": "big", "value": 500.0}], type=typ),
    })
    assert _rows(_plan(spec), t) == [("a", "less_than_expected", "meta.value")]


def test_nested_unique_items_span_pair():
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"fields": {"tags": {"unique_items": True}}},
        },
    }
    typ = pa.struct([("tags", pa.list_(pa.string()))])
    t = pa.table({
        "id": pa.array(["a"]),
        "meta": pa.array([{"tags": ["x", "y", "x"]}], type=typ),
    })
    v = _plan(spec).validate_batch(t)
    assert v["span"].to_pylist() == ["meta.tags.2"]
    assert v["first_span"].to_pylist() == ["meta.tags.0"]


def test_spec_validation_recurses_into_fields():
    import pytest

    from verify_ray.errors import SpecError

    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "meta": {"fields": {"v": {"dtype": "nope",
                                      "pattern": "(["}}},
        },
    }
    with pytest.raises(SpecError) as ei:
        _plan(spec)
    text = str(ei.value)
    assert "meta.v" in text and "unknown dtype" in text and "pattern" in text


def test_end_to_end_nested_parquet(ray_session, tmp_path):
    """File-source validate() over a struct-bearing parquet."""
    import pyarrow.parquet as pq

    from verify_ray.engine import validate

    typ = pa.struct([("lang", pa.string()), ("score", pa.float64())])
    t = pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"]),
        "meta": pa.array([{"lang": "en", "score": 0.5},
                          {"lang": "xx", "score": 1.5},
                          None], type=typ),
    })
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    spec = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {
            "doc_id": {"dtype": "string"},
            "meta": {"fields": {
                "lang": {"dtype": "string", "enum": ["en", "de"]},
                "score": {"dtype": "float64", "maximum": 1.0},
            }},
        },
    })
    rep = validate(str(tmp_path), spec)
    got = sorted(zip(rep.violations["doc_id"].to_pylist(),
                     rep.violations["rule_id"].to_pylist(),
                     rep.violations["span"].to_pylist()))
    assert got == [("d2", "invalid_enum_value", "meta.lang"),
                   ("d2", "more_than_expected", "meta.score")]


def test_nested_key_column():
    """The violation key may itself live inside a struct."""
    spec = {
        "key": "meta.id",
        "columns": {
            "meta": {"fields": {"id": {"dtype": "string"}}},
            "n": {"dtype": "int64", "minimum": 0},
        },
    }
    typ = pa.struct([("id", pa.string())])
    t = pa.table({
        "meta": pa.array([{"id": "k1"}, {"id": "k2"}], type=typ),
        "n": pa.array([1, -5], type=pa.int64()),
    })
    v = _plan(spec).validate_batch(t)
    assert v["doc_id"].to_pylist() == ["k2"]
