"""Per-kernel unit tests on hand-built Arrow batches (SURVEY §5) —
K1-K13, S1-S6, C1-C5 semantics vs the reference behavior."""

import numpy as np
import pyarrow as pa
import pytest

from verify_ray.kernels import compile_pred, flatten_with_parents
from verify_ray.spec import ColumnSpec, ConstraintSpec


def plan_for(**col_kwargs):
    name = col_kwargs.pop("name", "x")
    key = col_kwargs.pop("key_col", None)
    cols = [ColumnSpec(name="id", dtype="string"), ColumnSpec(name=name, **col_kwargs)]
    if key:
        cols.append(key)
    return ConstraintSpec(key="id", columns=cols).compile()


def violations(plan, table):
    t = plan.validate_batch(table)
    return sorted(zip(t["doc_id"].to_pylist(), t["rule_id"].to_pylist(),
                      t["span"].to_pylist()))


def tbl(x, id_=None, xtype=None, **extra):
    n = len(x)
    d = {"id": pa.array(id_ or [f"r{i}" for i in range(n)], type=pa.string()),
         "x": pa.array(x, type=xtype)}
    d.update(extra)
    return pa.table(d)


# ---- K5-K8 numeric bounds (macros.rs:261-315) ----------------------------

def test_minimum_maximum():
    plan = plan_for(minimum=1, maximum=10)
    v = violations(plan, tbl([0, 1, 10, 11, None], xtype=pa.int32()))
    assert v == [("r0", "less_than_expected", "x"), ("r3", "more_than_expected", "x")]


def test_exclusive_bounds():
    plan = plan_for(exclusive_minimum=1, exclusive_maximum=10)
    v = violations(plan, tbl([1, 2, 9, 10], xtype=pa.int32()))
    assert v == [("r0", "less_than_expected", "x"), ("r3", "more_than_expected", "x")]


def test_multiple_of_f64_fmod():
    # reference: `$value as f64 % m != 0` (macros.rs:250-259)
    plan = plan_for(multiple_of=2.5)
    v = violations(plan, tbl([5.0, 2.5, 3.0, None], xtype=pa.float64()))
    assert v == [("r2", "not_multiple_of", "x")]


# ---- K3 enum (macros.rs:116-241) -----------------------------------------

def test_enum_str():
    plan = plan_for(enum=["a", "b"])
    v = violations(plan, tbl(["a", "c", None], xtype=pa.string()))
    assert v == [("r1", "invalid_enum_value", "x")]


def test_enum_int_casts():
    plan = plan_for(enum=[1, 2])
    v = violations(plan, tbl([1, 2, 3], xtype=pa.int64()))
    assert v == [("r2", "invalid_enum_value", "x")]


def test_enum_float_epsilon():
    # |v - e| < f64::EPSILON (macros.rs:189): 0.1+0.2 is 5.6e-17 from 0.3,
    # inside EPSILON → accepted; 0.3+1e-9 is outside → rejected
    plan = plan_for(enum=[0.3, 1.0])
    v = violations(plan, tbl([0.3, 1.0, 0.1 + 0.2, 0.3 + 1e-9], xtype=pa.float64()))
    assert v == [("r3", "invalid_enum_value", "x")]


# ---- K9-K11 strings (macros.rs:335-376) ----------------------------------

def test_pattern_unanchored_search():
    # Rust Regex::is_match is a substring search
    plan = plan_for(pattern="b+c")
    v = violations(plan, tbl(["abcd", "bc", "ab", None], xtype=pa.string()))
    assert v == [("r2", "no_pattern_match", "x")]


def test_length_bounds_unicode_chars():
    # char counts, not bytes (Rust chars().count())
    plan = plan_for(min_length=2, max_length=3)
    v = violations(plan, tbl(["a", "héé", "abcd", "ok"], xtype=pa.string()))
    assert v == [("r0", "too_short", "x"), ("r2", "too_long", "x")]


def test_length_enforced_without_pattern():
    # deviation from the reference's nesting quirk (macros.rs:335-376):
    # length bounds apply even with no pattern set
    plan = plan_for(max_length=2)
    v = violations(plan, tbl(["abc"], xtype=pa.string()))
    assert v == [("r0", "too_long", "x")]


# ---- K12 non_null --------------------------------------------------------

def test_non_null():
    plan = plan_for(non_null=True)
    v = violations(plan, tbl(["a", None], xtype=pa.string()))
    assert v == [("r1", "non_null", "x")]


# ---- S1/S5/S6 list ops ---------------------------------------------------

def list_tbl(lists, **kw):
    return tbl(lists, xtype=pa.list_(pa.int32()), **kw)


def test_element_bounds_with_spans():
    plan = plan_for(element_min=0, element_max=9)
    t = list_tbl([[1, 2], [0, -1, 10], None, []])
    v = violations(plan, t)
    assert v == [("r1", "element_out_of_bounds", "x.1"),
                 ("r1", "element_out_of_bounds", "x.2")]


def test_item_count_bounds():
    plan = plan_for(min_items=1, max_items=3)
    v = violations(plan, list_tbl([[], [1], [1, 2, 3, 4], None]))
    # null list is not a seq traversal → neither bound fires (K12 governs)
    assert v == [("r0", "not_enough_items", "x"), ("r2", "too_many_items", "x")]


def test_unique_items_within_row():
    plan = plan_for(unique_items=True)
    v = violations(plan, list_tbl([[1, 2, 3], [1, 2, 1, 1], []]))
    # two extra occurrences of 1 in row 1, at their original elem indices
    assert v == [("r1", "not_unique", "x.2"), ("r1", "not_unique", "x.3")]


def test_contains():
    plan = plan_for(contains={"minimum": 100})
    v = violations(plan, list_tbl([[1, 200], [1, 2], None]))
    assert v == [("r1", "must_contain", "x")]


def test_len_equals_column():
    plan = plan_for(
        len_equals="n", key_col=ColumnSpec(name="n", dtype="int32"))
    t = pa.table({
        "id": pa.array(["a", "b", "c"]),
        "x": pa.array([[1, 2], [1], None], type=pa.list_(pa.int32())),
        "n": pa.array([2, 5, 1], type=pa.int32()),
    })
    v = violations(plan, t)
    assert v == [("b", "len_equals_column", "x")]


# ---- C1-C5 combinators (schema.rs:180-343) -------------------------------

def test_all_of_children_keep_rule_ids():
    plan = plan_for(checks=[{"all_of": [{"minimum": 0}, {"maximum": 10}]}])
    v = violations(plan, tbl([-1, 5, 11], xtype=pa.int32()))
    assert v == [("r0", "less_than_expected", "x"), ("r2", "more_than_expected", "x")]


def test_any_of_none_valid():
    plan = plan_for(checks=[{"any_of": [{"maximum": 0}, {"minimum": 10}]}])
    v = violations(plan, tbl([-1, 5, 11], xtype=pa.int32()))
    assert v == [("r1", "none_valid", "x")]


def test_one_of_exactly_one():
    plan = plan_for(checks=[{"one_of": [{"minimum": 0}, {"minimum": 10}]}])
    v = violations(plan, tbl([-1, 5, 11], xtype=pa.int32()))
    # -1 matches neither → none_valid; 11 matches both → more_than_one_valid
    assert v == [("r0", "none_valid", "x"), ("r2", "more_than_one_valid", "x")]


def test_not():
    plan = plan_for(checks=[{"not": {"enum": [3]}}])
    v = violations(plan, tbl([1, 3], xtype=pa.int32()))
    assert v == [("r1", "valid_not", "x")]


def test_if_then_else_cross_column():
    # per-source cap: if src == 'code' then x <= 5 else x <= 10
    cols = [
        ColumnSpec(name="id", dtype="string"),
        ColumnSpec(name="src", dtype="string"),
        ColumnSpec(name="x", dtype="int32", checks=[{
            "if": {"column": "src", "enum": ["code"]},
            "then": {"maximum": 5},
            "else": {"maximum": 10},
        }]),
    ]
    plan = ConstraintSpec(key="id", columns=cols).compile()
    t = pa.table({
        "id": pa.array(["a", "b", "c", "d"]),
        "src": pa.array(["code", "code", "web", "web"]),
        "x": pa.array([5, 6, 10, 11], type=pa.int32()),
    })
    v = violations(plan, t)
    # child rule ids survive the gating (reference propagates branch errors)
    assert v == [("b", "more_than_expected", "x"), ("d", "more_than_expected", "x")]


# ---- schema-level checks (M3/M5, K2) -------------------------------------

def test_schema_violations_required_and_dtype():
    plan = plan_for(dtype="int32")
    sv = plan.schema_violations(pa.schema([("id", pa.string()), ("x", pa.string())]))
    assert ("invalid_type", "x") in [(r, s) for r, s, _ in sv]
    sv2 = plan.schema_violations(pa.schema([("id", pa.string())]))
    assert [(r, s) for r, s, _ in sv2] == [("required_property", "")]
    # empty span mirrors `() the required property ... is missing`
    assert 'the required property "x" is missing' in sv2[0][2]


def test_unknown_column_rejected_when_strict():
    cols = [ColumnSpec(name="id", dtype="string")]
    plan = ConstraintSpec(key="id", columns=cols, allow_unknown_columns=False).compile()
    sv = plan.schema_violations(pa.schema([("id", pa.string()), ("zzz", pa.int32())]))
    assert [(r, s) for r, s, _ in sv] == [("unknown_property", "zzz")]


def test_accumulation_multiple_rules_one_row():
    # Errors + AddAssign semantics (errors.rs:411-415): one value, N rows
    plan = plan_for(minimum=0, enum=[1, 2], multiple_of=2)
    v = violations(plan, tbl([-3], xtype=pa.int32()))
    assert [r for _, r, _ in v] == ["invalid_enum_value", "less_than_expected",
                                   "not_multiple_of"]


def test_flatten_with_parents_alignment():
    col = pa.chunked_array([pa.array([[1], [2, 3]], type=pa.list_(pa.int32())),
                            pa.array([None, [4, 5, 6]], type=pa.list_(pa.int32()))])
    values, parents, elem = flatten_with_parents(col)
    assert values.to_pylist() == [1, 2, 3, 4, 5, 6]
    assert parents.tolist() == [0, 1, 1, 3, 3, 3]
    assert elem.tolist() == [0, 0, 1, 0, 1, 2]


def test_never_column():
    # K1 bool schema `false` (not_bool_schema, macros.rs:6-24)
    plan = plan_for(never=True)
    v = violations(plan, tbl([1, None], xtype=pa.int32()))
    assert v == [("r0", "never", "x"), ("r1", "never", "x")]


def test_column_name_pattern():
    # M4 property_names (schema.rs:874-883)
    plan = ConstraintSpec(key="id",
                          columns=[ColumnSpec(name="id", dtype="string")],
                          column_name_pattern=r"^[a-z_]+$").compile()
    sv = plan.schema_violations(pa.schema([("id", pa.string()),
                                           ("BadName", pa.int32())]))
    assert [(r, s) for r, s, _ in sv] == [("no_pattern_match", "BadName")]


def test_element_enum_on_string_lists():
    # regression: element_enum must not route through the numeric cast
    plan = plan_for(element_enum=["a", "b"])
    t = tbl([["a", "x"], ["b"], None], xtype=pa.list_(pa.string()))
    v = violations(plan, t)
    assert v == [("r0", "invalid_enum_value", "x.1")]


def test_element_enum_on_int_lists():
    plan = plan_for(element_enum=[1, 2])
    v = violations(plan, list_tbl([[1, 9], [2]]))
    assert v == [("r0", "invalid_enum_value", "x.1")]


def test_wrong_dtype_reports_not_crashes():
    """A kernel that cannot run on the actual dtype yields one
    unsupported_value row per column (UnsupportedValue parity,
    errors.rs:149-152) — never an exception mid-run."""
    plan = ConstraintSpec.from_dict({
        "key": "id",
        "columns": {"id": {"dtype": "string"},
                    "x": {"dtype": "string", "pattern": "^a"},
                    "y": {"dtype": "list<int32>", "element_min": 0}},
    }).compile()
    t = pa.table({"id": pa.array(["r0"]), "x": pa.array([5]),
                  "y": pa.array([3])})
    v = plan.validate_batch(t)
    got = {(r, s) for _, r, s in zip(v["doc_id"].to_pylist(),
                                     v["rule_id"].to_pylist(),
                                     v["span"].to_pylist())}
    assert got == {("unsupported_value", "x"), ("unsupported_value", "y")}
