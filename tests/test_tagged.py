"""M8 true tagged-union dispatch (reference schema.rs:614-660): a whole
per-variant column rule-set keyed on a discriminant column; unknown or
null tags pass everything (tagged_allow permissiveness, schema.rs:658)."""

import pyarrow as pa
import pytest

from verify_ray.errors import SpecError
from verify_ray.spec import ConstraintSpec


SPEC = {
    "key": "id",
    "columns": {
        "id": {"dtype": "string"},
        "kind": {"dtype": "string"},
        "value": {"dtype": "float64"},
        "tags": {"required": False},
    },
    "tagged": [{
        "tag": "kind",
        "variants": {
            "purchase": {"columns": {
                "value": {"minimum": 5},
                "tags": {"min_items": 1},
            }},
            "refund": {"columns": {
                "value": {"maximum": 0},
            }},
        },
    }],
}


def _plan():
    return ConstraintSpec.from_dict(SPEC).compile()


def _rows(t):
    v = _plan().validate_batch(t)
    return sorted(zip(v["doc_id"].to_pylist(), v["rule_id"].to_pylist(),
                      v["span"].to_pylist()))


def make_table(kinds, values, tags=None):
    n = len(kinds)
    d = {"id": pa.array([f"r{i}" for i in range(n)]),
         "kind": pa.array(kinds, type=pa.string()),
         "value": pa.array(values, type=pa.float64())}
    if tags is not None:
        d["tags"] = pa.array(tags, type=pa.list_(pa.string()))
    return pa.table(d)


def test_variant_rules_fire_only_under_their_tag():
    t = make_table(["purchase", "refund", "purchase", "refund"],
                   [1.0, 1.0, 10.0, -2.0])
    assert _rows(t) == [
        ("r0", "less_than_expected", "value"),   # purchase value < 5
        ("r1", "more_than_expected", "value"),   # refund value > 0
    ]


def test_unknown_tag_passes_everything():
    # value 1.0 violates BOTH variants' bounds, but the tag matches
    # neither -> tagged_allow (schema.rs:658): no violations
    t = make_table(["browse", "unknown", None], [1.0, -99.0, 1.0])
    assert _rows(t) == []


def test_variant_element_rules_gated():
    t = make_table(["purchase", "browse"], [10.0, 10.0],
                   tags=[[], []])
    # empty tags list violates min_items only for the purchase row
    assert _rows(t) == [("r0", "not_enough_items", "tags")]


def test_tag_validation_errors():
    bad = {
        "key": "id",
        "columns": {"id": {"dtype": "string"}},
        "tagged": [{"tag": "missing_col",
                    "variants": {"v": {"columns": {"x": {"bogus_key": 1}}}}}],
    }
    with pytest.raises(SpecError) as ei:
        ConstraintSpec.from_dict(bad).compile()
    text = str(ei.value)
    assert "missing_col" in text and "bogus_key" in text


def test_tagged_projection_includes_variant_columns():
    plan = _plan()
    assert {"kind", "value", "tags"} <= set(plan.referenced_columns)


def test_tagged_with_combinator_checks():
    spec = {
        "key": "id",
        "columns": {
            "id": {"dtype": "string"},
            "kind": {"dtype": "string"},
            "value": {"dtype": "float64"},
        },
        "tagged": [{
            "tag": "kind",
            "variants": {
                "a": {"columns": {"value": {"checks": [
                    {"any_of": [{"maximum": 0}, {"minimum": 100}]}]}}},
            },
        }],
    }
    plan = ConstraintSpec.from_dict(spec).compile()
    t = make_table(["a", "a", "b"], [50.0, 200.0, 50.0])
    v = plan.validate_batch(t)
    assert sorted(zip(v["doc_id"].to_pylist(), v["rule_id"].to_pylist())) == [
        ("r0", "none_valid")]
