"""M2/M4/M5/M6 PER-ROW map-column validation (VERDICT r2 item 5):
runtime analogue of the reference's object traversal for
``pa.map_(string, T)`` columns (schema.rs:834-989)."""

import numpy as np
import pyarrow as pa
import pytest

from verify_ray import ConstraintSpec

MAP_T = pa.map_(pa.string(), pa.int64())


def _plan(map_section):
    return ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {
            "doc_id": {"dtype": "string"},
            "attrs": {"map": map_section},
        },
    }).compile()


def _viol(plan, rows):
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
        "attrs": pa.array(rows, type=MAP_T),
    })
    return [(r["doc_id"], r["rule_id"], r["span"])
            for r in plan.validate_batch(t).to_pylist()]


def test_key_schema_pattern_span_is_dotted_key():
    plan = _plan({"key_schema": {"pattern": "^[a-z_]+$"}})
    v = _viol(plan, [[("ok_key", 1)], [("BadKey", 2), ("fine", 3)], None])
    assert v == [("d1", "no_pattern_match", "attrs.BadKey")]


def test_min_max_properties_per_row():
    plan = _plan({"min_properties": 1, "max_properties": 2})
    v = _viol(plan, [[], [("a", 1)], [("a", 1), ("b", 2), ("c", 3)], None])
    assert ("d0", "not_enough_properties", "attrs") in v
    assert ("d2", "too_many_properties", "attrs") in v
    assert len(v) == 2  # null map row trips nothing


def test_required_keys_per_row():
    plan = _plan({"required_keys": ["lang"]})
    v = _viol(plan, [[("lang", 1)], [("other", 2)], None])
    assert v == [("d1", "required_property", "attrs")]


def test_value_dispatch_exact_then_pattern_then_additional():
    plan = _plan({
        "values": {"score": {"minimum": 0, "maximum": 10}},
        "pattern_values": {"^aux_": {"maximum": 1}},
        "additional": False,
    })
    rows = [
        [("score", 5), ("aux_x", 0)],        # all fine
        [("score", 99)],                      # exact-key schema violated
        [("aux_y", 7)],                       # pattern schema violated
        [("mystery", 1)],                     # unmatched -> unknown
        # exact match wins over pattern: "score" never hits ^aux_ rules
    ]
    v = _viol(plan, rows)
    assert ("d1", "more_than_expected", "attrs.score") in v
    assert ("d2", "more_than_expected", "attrs.aux_y") in v
    assert ("d3", "unknown_property", "attrs.mystery") in v
    assert len(v) == 3


def test_additional_schema_applies_to_unmatched_only():
    plan = _plan({
        "values": {"big": {"minimum": 100}},
        "additional": {"maximum": 10},
    })
    v = _viol(plan, [[("big", 500), ("x", 3)], [("big", 1), ("x", 50)]])
    assert ("d1", "less_than_expected", "attrs.big") in v
    assert ("d1", "more_than_expected", "attrs.x") in v
    assert len(v) == 2


def test_map_schema_checks():
    plan = _plan({"min_properties": 1})
    # not a map at all
    sv = plan.schema_violations(pa.schema([("doc_id", pa.string()),
                                           ("attrs", pa.int64())]))
    assert ("invalid_type", "attrs") in [(r, s) for r, s, _m in sv]
    # non-string keys -> KeyNotString analogue (errors.rs:157)
    sv = plan.schema_violations(pa.schema([
        ("doc_id", pa.string()),
        ("attrs", pa.map_(pa.int64(), pa.int64()))]))
    assert any(r == "unsupported_value" and "map key must be a string" in m
               for r, _s, m in sv)
    # correct shape -> clean
    sv = plan.schema_violations(pa.schema([("doc_id", pa.string()),
                                           ("attrs", MAP_T)]))
    assert sv == []


def test_map_spec_problems_accumulate():
    from verify_ray.spec import SpecError

    with pytest.raises(SpecError) as ei:
        ConstraintSpec.from_dict({
            "key": "doc_id",
            "columns": {
                "doc_id": {"dtype": "string"},
                "attrs": {"map": {
                    "min_properties": -1,
                    "pattern_values": {"[invalid": {"minimum": 0}},
                    "bogus_key": 1,
                }},
            },
        }).compile()
    msg = str(ei.value)
    assert "min_properties" in msg
    assert "invalid regex" in msg
    assert "bogus_key" in msg


def test_map_rules_on_sliced_batch():
    """Offsets of a sliced MapArray index the full child array — the
    window correction must keep entries aligned with their rows."""
    plan = _plan({"values": {"v": {"minimum": 0}}})
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(4)]),
        "attrs": pa.array([[("v", 1)], [("v", -5)], [("v", 2)], [("v", -9)]],
                          type=MAP_T),
    })
    sliced = t.slice(1, 2)  # rows d1, d2
    v = [(r["doc_id"], r["span"]) for r in plan.validate_batch(sliced).to_pylist()]
    assert v == [("d1", "attrs.v")]
