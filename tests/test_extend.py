"""Extension-surface tests: custom rules (D6), span hooks (D5),
spec-from-dataclass (D2), tuple-items (S2)."""

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pytest

from verify_ray.errors import SpecError
from verify_ray.extend import (dotted_span, jsonpath_span, register_rule,
                               spec_from_dataclass)
from verify_ray.spec import ColumnSpec, ConstraintSpec


def violations(plan, table):
    t = plan.validate_batch(table)
    return sorted(zip(t["doc_id"].to_pylist(), t["rule_id"].to_pylist(),
                      t["span"].to_pylist()))


# ---- D6 custom rules -----------------------------------------------------

def test_custom_rule_roundtrip():
    def even_only(column, params):
        def mask(t: pa.Table) -> np.ndarray:
            v = t[column].to_numpy(zero_copy_only=False)
            return (v % 2) != 0

        return mask

    register_rule("even_only", even_only)
    spec = ConstraintSpec.from_dict({
        "key": "id",
        "columns": {"id": {"dtype": "string"},
                    "x": {"custom": [{"rule": "even_only",
                                      "message": "must be even"}]}},
    })
    plan = spec.compile()
    t = pa.table({"id": pa.array(["a", "b"]), "x": pa.array([2, 3])})
    assert violations(plan, t) == [("b", "even_only", "x")]
    assert plan.validate_batch(t)["message"].to_pylist()[0] == "must be even"


def test_unknown_custom_rule_rejected():
    spec = ConstraintSpec.from_dict({
        "key": "id",
        "columns": {"id": {"dtype": "string"},
                    "x": {"custom": [{"rule": "no_such_rule_xyz"}]}},
    })
    with pytest.raises(SpecError, match="no_such_rule_xyz"):
        spec.compile()


# ---- D2 spec from dataclass ----------------------------------------------

def test_spec_from_dataclass():
    @dataclass
    class Sequence:
        doc_id: str = field(metadata={"verify": {"pattern": r"^d\d+$",
                                                 "unique": True}})
        tokens: list[int] = field(default_factory=list,
                                  metadata={"verify": {"element_min": 0}})
        n_tok: int = field(default=0, metadata={"verify": {"minimum": 1}})

    spec = spec_from_dataclass(Sequence)
    assert spec.key == "doc_id"
    plan = spec.compile()
    assert plan.unique_columns == ["doc_id"]
    by_name = {c.name: c for c in spec.columns}
    assert by_name["tokens"].dtype == "list<int64>"
    assert by_name["n_tok"].dtype == "int64"
    t = pa.table({"doc_id": pa.array(["d1", "x"]),
                  "tokens": pa.array([[1], [-1]], type=pa.list_(pa.int64())),
                  "n_tok": pa.array([1, 0], type=pa.int64())})
    v = violations(plan, t)
    assert ("x", "no_pattern_match", "doc_id") in v
    assert ("x", "less_than_expected", "n_tok") in v
    assert ("x", "element_out_of_bounds", "tokens.0") in v


def test_spec_from_non_dataclass_rejected():
    with pytest.raises(SpecError):
        spec_from_dataclass(int)


# ---- D5 span hooks -------------------------------------------------------

def test_span_format_hook():
    spec = ConstraintSpec.from_dict({
        "key": "id",
        "columns": {"id": {"dtype": "string"},
                    "xs": {"element_min": 0}},
    })
    plan = spec.compile(span_format=jsonpath_span)
    t = pa.table({"id": pa.array(["a"]),
                  "xs": pa.array([[-1]], type=pa.list_(pa.int32()))})
    out = plan.validate_batch(t)
    assert out["span"].to_pylist() == ["$.xs[0]"]
    assert dotted_span("xs", 3) == "xs.3"


# ---- S2 items_tuple ------------------------------------------------------

def test_items_tuple_positional():
    spec = ConstraintSpec.from_dict({
        "key": "id",
        "columns": {"id": {"dtype": "string"},
                    "xs": {"items_tuple": [{"minimum": 10}, {"maximum": 5}]}},
    })
    plan = spec.compile()
    t = pa.table({"id": pa.array(["a", "b", "c"]),
                  "xs": pa.array([[10, 5], [9, 6], [10]],
                                 type=pa.list_(pa.int32()))})
    v = violations(plan, t)
    assert v == [("b", "less_than_expected", "xs.0"),
                 ("b", "more_than_expected", "xs.1")]


def test_additional_items_false_is_never():
    # overflow elements under additional_items:false -> Never
    # (SchemaRef::Bool false, reference macros.rs:6-24)
    spec = ConstraintSpec.from_dict({
        "key": "id",
        "columns": {"id": {"dtype": "string"},
                    "xs": {"items_tuple": [{"minimum": 0}],
                           "additional_items": False}},
    })
    plan = spec.compile()
    t = pa.table({"id": pa.array(["a", "b"]),
                  "xs": pa.array([[1], [1, 2, 3]], type=pa.list_(pa.int32()))})
    v = violations(plan, t)
    assert v == [("b", "never", "xs.1"), ("b", "never", "xs.2")]


def test_additional_items_schema():
    spec = ConstraintSpec.from_dict({
        "key": "id",
        "columns": {"id": {"dtype": "string"},
                    "xs": {"items_tuple": [{"minimum": 0}],
                           "additional_items": {"maximum": 100}}},
    })
    plan = spec.compile()
    t = pa.table({"id": pa.array(["a"]),
                  "xs": pa.array([[1, 50, 200]], type=pa.list_(pa.int32()))})
    assert violations(plan, t) == [("a", "more_than_expected", "xs.2")]
