"""Property-based row-level oracle (SURVEY §5): a deliberately naive
pure-Python per-row validator mirroring the reference semantics, compared
against the vectorized engine on randomized tables.

The oracle walks one row at a time like the reference's serde visitor
(/root/reference/verify/src/serde.rs:241-267) and accumulates every
violation; the engine must produce the identical (row, rule_id, span)
multiset for every generated table.
"""

import math
import re
import sys

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from verify_ray.spec import ColumnSpec, ConstraintSpec

F64_EPS = sys.float_info.epsilon


def oracle_row(row: dict, cols: list[ColumnSpec]) -> list[tuple[str, str]]:
    """Naive per-row validation -> [(rule_id, span)]; mirrors the
    reference kernels' semantics one value at a time."""
    out = []
    for c in cols:
        v = row.get(c.name)
        if v is None:
            if c.non_null:
                out.append(("non_null", c.name))
            continue
        if isinstance(v, list):
            if c.min_items is not None and len(v) < c.min_items:
                out.append(("not_enough_items", c.name))
            if c.max_items is not None and len(v) > c.max_items:
                out.append(("too_many_items", c.name))
            if c.len_equals is not None:
                other = row.get(c.len_equals)
                if other is not None and len(v) != other:
                    out.append(("len_equals_column", c.name))
            for i, e in enumerate(v):
                if e is None:
                    continue
                if c.element_min is not None and e < c.element_min:
                    out.append(("element_out_of_bounds", f"{c.name}.{i}"))
                if c.element_max is not None and e > c.element_max:
                    out.append(("element_out_of_bounds", f"{c.name}.{i}"))
            if c.unique_items:
                seen = {}
                for i, e in enumerate(v):
                    if e in seen:
                        out.append(("not_unique", f"{c.name}.{i}"))
                    else:
                        seen[e] = i
            if c.contains is not None:
                lo = c.contains.get("minimum")
                if not any(e is not None and e >= lo for e in v):
                    out.append(("must_contain", c.name))
            continue
        if isinstance(v, str):
            if c.pattern is not None and not re.search(c.pattern, v):
                out.append(("no_pattern_match", c.name))
            if c.max_length is not None and len(v) > c.max_length:
                out.append(("too_long", c.name))
            if c.min_length is not None and len(v) < c.min_length:
                out.append(("too_short", c.name))
            if c.enum is not None and v not in c.enum:
                out.append(("invalid_enum_value", c.name))
            continue
        # numeric — f64 comparisons like the reference casts
        f = float(v)
        if c.enum is not None:
            if isinstance(v, float):
                ok = any(abs(f - float(e)) < F64_EPS for e in c.enum)
            else:
                ok = any(v == e for e in c.enum
                         if not isinstance(e, float) or float(e).is_integer())
            if not ok:
                out.append(("invalid_enum_value", c.name))
        if c.multiple_of is not None and math.fmod(f, c.multiple_of) != 0.0:
            out.append(("not_multiple_of", c.name))
        if c.minimum is not None and f < c.minimum:
            out.append(("less_than_expected", c.name))
        if c.exclusive_minimum is not None and f <= c.exclusive_minimum:
            out.append(("less_than_expected", c.name))
        if c.maximum is not None and f > c.maximum:
            out.append(("more_than_expected", c.name))
        if c.exclusive_maximum is not None and f >= c.exclusive_maximum:
            out.append(("more_than_expected", c.name))
    return out


SPEC = ConstraintSpec(
    key="id",
    columns=[
        ColumnSpec(name="id", dtype="string"),
        ColumnSpec(name="s", dtype="string", non_null=True, pattern="^a+b$",
                   min_length=2, max_length=4, enum=["ab", "aab", "zz", "aaaab"]),
        ColumnSpec(name="n", dtype="int64", minimum=-5, exclusive_maximum=10,
                   multiple_of=2, enum=[-4, -2, 0, 2, 4, 6, 8, 11]),
        ColumnSpec(name="f", dtype="float64", exclusive_minimum=0.0,
                   maximum=1.0),
        ColumnSpec(name="xs", dtype="list<int64>", min_items=1, max_items=4,
                   element_min=0, element_max=9, unique_items=True,
                   contains={"minimum": 5}, len_equals="n"),
    ],
)
PLAN = SPEC.compile()


row_strategy = st.fixed_dictionaries({
    "s": st.one_of(st.none(), st.sampled_from(
        ["ab", "aab", "aaab", "aaaab", "zz", "b", "a", "xaby", ""])),
    "n": st.one_of(st.none(), st.integers(min_value=-8, max_value=13)),
    "f": st.one_of(st.none(),
                   st.floats(min_value=-0.5, max_value=1.5,
                             allow_nan=False, width=64)),
    "xs": st.one_of(st.none(), st.lists(
        st.integers(min_value=-2, max_value=11), max_size=6)),
})


@settings(max_examples=200, deadline=None)
@given(st.lists(row_strategy, min_size=1, max_size=25))
def test_engine_matches_row_oracle(rows):
    for i, r in enumerate(rows):
        r["id"] = f"r{i:04d}"
    table = pa.table({
        "id": pa.array([r["id"] for r in rows], type=pa.string()),
        "s": pa.array([r["s"] for r in rows], type=pa.string()),
        "n": pa.array([r["n"] for r in rows], type=pa.int64()),
        "f": pa.array([r["f"] for r in rows], type=pa.float64()),
        "xs": pa.array([r["xs"] for r in rows], type=pa.list_(pa.int64())),
    })
    got = PLAN.validate_batch(table)
    got_set = sorted(zip(got["doc_id"].to_pylist(), got["rule_id"].to_pylist(),
                         got["span"].to_pylist()))
    exp = []
    for r in rows:
        for rid, span in oracle_row(r, SPEC.columns):
            exp.append((r["id"], rid, span))
    assert got_set == sorted(exp)


# ---------------------------------------------------------------------------
# combinator property test: anyOf/oneOf/not/if-then-else vs a naive
# per-row evaluator (validate_subschemas semantics, schema.rs:180-343)

COMBO_SPEC = ConstraintSpec(
    key="id",
    columns=[
        ColumnSpec(name="id", dtype="string"),
        ColumnSpec(name="src", dtype="string"),
        ColumnSpec(
            name="v", dtype="int64",
            checks=[
                {"any_of": [{"maximum": 0}, {"minimum": 10}]},
                {"one_of": [{"minimum": 0}, {"minimum": 5}]},
                {"not": {"enum": [7]}},
                {"if": {"column": "src", "enum": ["a"]},
                 "then": {"maximum": 3},
                 "else": {"maximum": 8}},
            ],
        ),
    ],
)
COMBO_PLAN = COMBO_SPEC.compile()


def leaf_ok(v, node):
    """Naive leaf evaluation; null is valid (engine convention)."""
    if v is None:
        return True
    if "enum" in node:
        return v in node["enum"]
    if "minimum" in node:
        return v >= node["minimum"]
    if "maximum" in node:
        return v <= node["maximum"]
    raise AssertionError(node)


def combo_oracle_row(row):
    out = []
    v, src = row["v"], row["src"]
    if v is None:
        return out  # K12 policy: nulls never trip combinators
    # any_of
    if not (leaf_ok(v, {"maximum": 0}) or leaf_ok(v, {"minimum": 10})):
        out.append("none_valid")
    # one_of
    n = int(leaf_ok(v, {"minimum": 0})) + int(leaf_ok(v, {"minimum": 5}))
    if n == 0:
        out.append("none_valid")
    elif n > 1:
        out.append("more_than_one_valid")
    # not
    if v is not None and v == 7:
        out.append("valid_not")
    # if/then/else with cross-column condition: null src -> condition
    # "src in [a]" is False (null counts valid for enum... engine treats
    # null as satisfying the leaf -> condition True!)
    cond = (src is None) or (src == "a")
    branch = {"maximum": 3} if cond else {"maximum": 8}
    if not leaf_ok(v, branch):
        out.append("more_than_expected")
    return sorted(out)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.fixed_dictionaries({
    "src": st.one_of(st.none(), st.sampled_from(["a", "b"])),
    "v": st.one_of(st.none(), st.integers(min_value=-3, max_value=12)),
}), min_size=1, max_size=20))
def test_combinators_match_row_oracle(rows):
    for i, r in enumerate(rows):
        r["id"] = f"r{i:04d}"
    table = pa.table({
        "id": pa.array([r["id"] for r in rows], type=pa.string()),
        "src": pa.array([r["src"] for r in rows], type=pa.string()),
        "v": pa.array([r["v"] for r in rows], type=pa.int64()),
    })
    got = COMBO_PLAN.validate_batch(table)
    got_map = {}
    for d, rid in zip(got["doc_id"].to_pylist(), got["rule_id"].to_pylist()):
        got_map.setdefault(d, []).append(rid)
    for r in rows:
        exp = combo_oracle_row(r)
        assert sorted(got_map.get(r["id"], [])) == exp, (r, exp,
                                                        got_map.get(r["id"]))


# ---------------------------------------------------------------------------
# S2 items_tuple / additional_items property test

TUPLE_SPEC = ConstraintSpec(
    key="id",
    columns=[
        ColumnSpec(name="id", dtype="string"),
        ColumnSpec(name="xs", dtype="list<int64>",
                   items_tuple=[{"minimum": 10}, {"maximum": 5}],
                   additional_items={"minimum": 0}),
        ColumnSpec(name="ys", dtype="list<int64>",
                   items_tuple=[{"minimum": 0}], additional_items=False),
    ],
)
TUPLE_PLAN = TUPLE_SPEC.compile()


def tuple_oracle_row(row):
    out = []
    xs, ys = row["xs"], row["ys"]
    if xs is not None:
        for i, e in enumerate(xs):
            if e is None:
                continue
            if i == 0 and e < 10:
                out.append(("less_than_expected", f"xs.{i}"))
            elif i == 1 and e > 5:
                out.append(("more_than_expected", f"xs.{i}"))
            elif i >= 2 and e < 0:
                out.append(("less_than_expected", f"xs.{i}"))
    if ys is not None:
        for i, e in enumerate(ys):
            if i == 0 and e is not None and e < 0:
                out.append(("less_than_expected", f"ys.{i}"))
            elif i >= 1:
                out.append(("never", f"ys.{i}"))
    return sorted(out)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.fixed_dictionaries({
    "xs": st.one_of(st.none(), st.lists(
        st.integers(min_value=-3, max_value=12), max_size=5)),
    "ys": st.one_of(st.none(), st.lists(
        st.integers(min_value=-2, max_value=3), max_size=4)),
}), min_size=1, max_size=15))
def test_items_tuple_matches_row_oracle(rows):
    for i, r in enumerate(rows):
        r["id"] = f"r{i:04d}"
    table = pa.table({
        "id": pa.array([r["id"] for r in rows], type=pa.string()),
        "xs": pa.array([r["xs"] for r in rows], type=pa.list_(pa.int64())),
        "ys": pa.array([r["ys"] for r in rows], type=pa.list_(pa.int64())),
    })
    got = TUPLE_PLAN.validate_batch(table)
    got_set = sorted(zip(got["doc_id"].to_pylist(), got["rule_id"].to_pylist(),
                         got["span"].to_pylist()))
    exp = sorted((r["id"], rid, span)
                 for r in rows for rid, span in tuple_oracle_row(r))
    assert got_set == exp
