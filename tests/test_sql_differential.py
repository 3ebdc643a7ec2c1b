"""Randomized spec → SQL differential test.

Hypothesis generates random ConstraintSpecs over the real ``documents``
table; each spec is mechanically compiled BOTH ways — into the engine's
kernel plan AND into an equivalent DuckDB UNION-ALL oracle — and the
two violation sets must match exactly.  This generalizes the fixed
driver oracles to the whole scalar-rule space (bounds, exclusive
bounds, multiple_of, enum, lengths, patterns, non-null).

Runs pure validate_batch (no Ray) so hundreds of cases are cheap.
"""

import duckdb
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from verify_ray.spec import ConstraintSpec

TABLE_PATH = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def env():
    t = pq.read_table(TABLE_PATH)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{TABLE_PATH}')")
    return {"table": t, "con": con}


# -- rule pools (values chosen to straddle the real data ranges) -----------

INT_RULES = {
    "minimum": [0, 60, 100, 300, 600],
    "maximum": [50, 100, 400, 1000],
    "exclusive_minimum": [48, 99, 553],
    "exclusive_maximum": [49, 200, 554],
    "multiple_of": [2, 3, 7],
}
STR_RULES = {
    "enum": [["en", "de"], ["en", "fr", "es", "zh"], ["nope"]],
    "min_length": [1, 2, 3],
    "max_length": [1, 2, 5],
    "pattern": ["^e", "n", "^[a-z]{2}$", "z"],
}


def sql_for_rule(col: str, kind: str, val) -> tuple[str, str]:
    """(rule_id, WHERE-clause selecting violating rows) — the mechanical
    spec→SQL compiler mirroring each kernel's semantics."""
    if kind == "minimum":
        return "less_than_expected", f"{col} < {val}"
    if kind == "maximum":
        return "more_than_expected", f"{col} > {val}"
    if kind == "exclusive_minimum":
        return "less_than_expected", f"{col} <= {val}"
    if kind == "exclusive_maximum":
        return "more_than_expected", f"{col} >= {val}"
    if kind == "multiple_of":
        return "not_multiple_of", f"fmod({col}, {val}) != 0"
    if kind == "enum":
        vals = ", ".join(f"'{v}'" for v in val)
        return "invalid_enum_value", f"{col} IS NOT NULL AND {col} NOT IN ({vals})"
    if kind == "min_length":
        return "too_short", f"length({col}) < {val}"
    if kind == "max_length":
        return "too_long", f"length({col}) > {val}"
    if kind == "pattern":
        return "no_pattern_match", (f"{col} IS NOT NULL AND "
                                    f"NOT regexp_matches({col}, '{val}')")
    raise AssertionError(kind)


int_col_strategy = st.fixed_dictionaries(
    {}, optional={k: st.sampled_from(v) for k, v in INT_RULES.items()})
str_col_strategy = st.fixed_dictionaries(
    {}, optional={k: st.sampled_from(v) for k, v in STR_RULES.items()})

# combinator leaves: (spec-leaf, SQL VALID condition template)
_COMBO_LEAVES = [
    ({"minimum": 100}, "{c} >= 100"),
    ({"maximum": 200}, "{c} <= 200"),
    ({"minimum": 400}, "{c} >= 400"),
    ({"maximum": 60}, "{c} <= 60"),
]
combo_strategy = st.one_of(
    st.none(),
    st.tuples(st.sampled_from(["any_of", "one_of", "not", "if"]),
              st.sets(st.sampled_from(range(4)), min_size=2, max_size=3)),
)


def combo_sql(col: str, kind: str, leaves) -> list[str]:
    """SQL SELECTs for the violating rows of an any_of/one_of combinator
    (non-null gated, matching the engine's K12 policy)."""
    valids = [_COMBO_LEAVES[i][1].format(c=col) for i in sorted(leaves)]
    base = (f"SELECT CAST(doc_id AS VARCHAR) AS doc_id, '{{rid}}' AS rule_id, "
            f"'{col}' AS span FROM documents WHERE {col} IS NOT NULL AND ")
    if kind == "any_of":
        cond = " AND ".join(f"NOT ({v})" for v in valids)
        return [base.format(rid="none_valid") + f"({cond})"]
    if kind == "not":
        # engine compiles not{all_of-like leaf} per leaf? no: `not` takes
        # ONE subtree — we wrap the leaves in all_of, so the not matches
        # when ALL leaves hold
        cond = " AND ".join(f"({v})" for v in valids)
        return [base.format(rid="valid_not") + f"({cond})"]
    if kind == "if":
        # if leaves[0] then leaves[1]: the gated child keeps its natural
        # rule id (reference propagates branch errors)
        idx = sorted(leaves)
        cond_v, then_v = valids[0], valids[1]
        then_rid = ("less_than_expected"
                    if "minimum" in _COMBO_LEAVES[idx[1]][0]
                    else "more_than_expected")
        return [base.format(rid=then_rid) + f"({cond_v}) AND NOT ({then_v})"]
    matched = " + ".join(f"(CASE WHEN {v} THEN 1 ELSE 0 END)" for v in valids)
    return [base.format(rid="none_valid") + f"({matched}) = 0",
            base.format(rid="more_than_one_valid") + f"({matched}) > 1"]


@settings(max_examples=300, deadline=None)
@given(n_chars=int_col_strategy, lang=str_col_strategy,
       source=str_col_strategy, combo=combo_strategy)
def test_random_spec_matches_sql(env, n_chars, lang, source, combo):
    cols = {"doc_id": {"dtype": "int64"}}
    parts = []
    if combo is not None:
        kind, leaves = combo
        idx = sorted(leaves)
        nodes = [_COMBO_LEAVES[i][0] for i in idx]
        if kind == "not":
            check = {"not": {"all_of": nodes}}
        elif kind == "if":
            check = {"if": nodes[0], "then": nodes[1]}
        else:
            check = {kind: nodes}
        cols["n_chars"] = {"checks": [check]}
        parts.extend(combo_sql("n_chars", kind, leaves))
        n_chars = {}  # combinator owns the column this round
    for col, rules in (("n_chars", n_chars), ("lang", lang),
                       ("source", source)):
        if col in cols and col != "doc_id" and cols[col]:
            continue  # combinator slot already set
        cdict = dict(rules)
        # drop contradictory bound pairs the compiler rejects
        for lo, hi in (("minimum", "maximum"),
                       ("min_length", "max_length")):
            if lo in cdict and hi in cdict and cdict[lo] > cdict[hi]:
                del cdict[hi]
        cols[col] = cdict
        for kind, val in cdict.items():
            rid, where = sql_for_rule(col, kind, val)
            parts.append(
                f"SELECT CAST(doc_id AS VARCHAR) AS doc_id, '{rid}' AS rule_id,"
                f" '{col}' AS span FROM documents WHERE {where}")
    plan = ConstraintSpec.from_dict({"key": "doc_id", "columns": cols}).compile()
    got = plan.validate_batch(env["table"])
    got_set = sorted(zip(got["doc_id"].to_pylist(), got["rule_id"].to_pylist(),
                         got["span"].to_pylist()))
    if parts:
        exp = sorted(map(tuple, env["con"].execute(
            " UNION ALL ".join(parts)).fetchall()))
    else:
        exp = []
    assert got_set == exp


# ---------------------------------------------------------------------------
# list-op differential: per-element bounds + item counts over the real
# embeddings table (engine spans `embedding.<i>` vs DuckDB
# unnest + generate_subscripts)

ELEM_RULES = {
    "element_min": [-0.42, -0.35, -0.3],
    "element_max": [0.3, 0.35, 0.42],
}
ITEM_RULES = {"min_items": [60, 64, 65], "max_items": [63, 64, 70]}


@pytest.fixture(scope="module")
def emb_env():
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/embeddings.parquet')")
    return {"table": t, "con": con}


@settings(max_examples=60, deadline=None)
@given(rules=st.fixed_dictionaries({}, optional={
    **{k: st.sampled_from(v) for k, v in ELEM_RULES.items()},
    **{k: st.sampled_from(v) for k, v in ITEM_RULES.items()},
}))
def test_list_ops_match_sql(emb_env, rules):
    rules = dict(rules)
    if ("min_items" in rules and "max_items" in rules
            and rules["min_items"] > rules["max_items"]):
        del rules["max_items"]  # the compiler rejects inverted bounds
    plan = ConstraintSpec.from_dict({
        "key": "vec_id",
        "columns": {"vec_id": {"dtype": "int64"},
                    "embedding": dict(rules)},
    }).compile()
    got = plan.validate_batch(emb_env["table"])
    got_set = sorted(zip(got["doc_id"].to_pylist(), got["rule_id"].to_pylist(),
                         got["span"].to_pylist()))
    parts = []
    for kind, val in rules.items():
        if kind == "element_min":
            parts.append(f"""
              SELECT CAST(vec_id AS VARCHAR) AS doc_id,
                     'element_out_of_bounds' AS rule_id,
                     'embedding.' || CAST(i - 1 AS VARCHAR) AS span
              FROM (SELECT vec_id, unnest(embedding) AS e,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings) WHERE e < {val}""")
        elif kind == "element_max":
            parts.append(f"""
              SELECT CAST(vec_id AS VARCHAR), 'element_out_of_bounds',
                     'embedding.' || CAST(i - 1 AS VARCHAR)
              FROM (SELECT vec_id, unnest(embedding) AS e,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings) WHERE e > {val}""")
        elif kind == "min_items":
            parts.append(f"""
              SELECT CAST(vec_id AS VARCHAR), 'not_enough_items', 'embedding'
              FROM embeddings WHERE len(embedding) < {val}""")
        elif kind == "max_items":
            parts.append(f"""
              SELECT CAST(vec_id AS VARCHAR), 'too_many_items', 'embedding'
              FROM embeddings WHERE len(embedding) > {val}""")
    exp = (sorted(map(tuple, emb_env["con"].execute(
        " UNION ALL ".join(parts)).fetchall())) if parts else [])
    assert got_set == exp


# ---------------------------------------------------------------------------
# nested-struct differential (M1): the same random scalar rule space,
# applied through a struct column packed from the flat documents columns
# — engine spans `meta.<field>` vs flat-column SQL


@pytest.fixture(scope="module")
def nested_env(env):
    import pyarrow as pa
    import pyarrow.compute as pc

    t = env["table"]
    meta = pc.make_struct(
        t.column("lang").combine_chunks(),
        t.column("n_chars").combine_chunks(),
        field_names=["lang", "n_chars"])
    packed = pa.table({"doc_id": t.column("doc_id"), "meta": meta})
    return {"table": packed, "con": env["con"]}


@settings(max_examples=100, deadline=None)
@given(lang=str_col_strategy, n_chars=int_col_strategy)
def test_nested_struct_matches_sql(nested_env, lang, n_chars):
    fields = {}
    parts = []
    for col, rules in (("lang", lang), ("n_chars", n_chars)):
        cdict = dict(rules)
        for lo, hi in (("minimum", "maximum"), ("min_length", "max_length")):
            if lo in cdict and hi in cdict and cdict[lo] > cdict[hi]:
                del cdict[hi]
        if cdict:
            fields[col] = cdict
        for kind, val in cdict.items():
            rid, where = sql_for_rule(col, kind, val)
            parts.append(
                f"SELECT CAST(doc_id AS VARCHAR) AS doc_id, '{rid}' AS rule_id,"
                f" 'meta.{col}' AS span FROM documents WHERE {where}")
    plan = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {"doc_id": {"dtype": "int64"},
                    "meta": {"fields": fields} if fields else {}},
    }).compile()
    got = plan.validate_batch(nested_env["table"])
    got_set = sorted(zip(got["doc_id"].to_pylist(), got["rule_id"].to_pylist(),
                         got["span"].to_pylist()))
    exp = (sorted(map(tuple, nested_env["con"].execute(
        " UNION ALL ".join(parts)).fetchall())) if parts else [])
    assert got_set == exp


# ---------------------------------------------------------------------------
# tagged-dispatch differential (M8): random per-variant rule sets on
# events.value keyed by event_type — engine gates vs SQL CASE filters

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
VALUE_RULES = {"minimum": [0.0, 5.0, 100.0], "maximum": [1.0, 50.0, 400.0]}


@pytest.fixture(scope="module")
def events_env():
    t = pq.read_table(EVENTS_PATH)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{EVENTS_PATH}')")
    return {"table": t, "con": con}


@settings(max_examples=100, deadline=None)
@given(variants=st.dictionaries(
    st.sampled_from(EVENT_TYPES),
    st.fixed_dictionaries(
        {}, optional={k: st.sampled_from(v) for k, v in VALUE_RULES.items()}),
    min_size=1, max_size=3))
def test_tagged_dispatch_matches_sql(events_env, variants):
    parts = []
    vspecs = {}
    for tag, rules in variants.items():
        cdict = dict(rules)
        if ("minimum" in cdict and "maximum" in cdict
                and cdict["minimum"] > cdict["maximum"]):
            del cdict["maximum"]
        if not cdict:
            continue
        vspecs[tag] = {"columns": {"value": cdict}}
        for kind, val in cdict.items():
            rid, where = sql_for_rule("value", kind, val)
            parts.append(
                f"SELECT CAST(event_id AS VARCHAR) AS doc_id, '{rid}' AS "
                f"rule_id, 'value' AS span FROM events "
                f"WHERE event_type = '{tag}' AND ({where})")
    spec = {
        "key": "event_id",
        "columns": {"event_id": {"dtype": "int64"},
                    "event_type": {"dtype": "string"},
                    "value": {"dtype": "float64"}},
    }
    if vspecs:
        spec["tagged"] = [{"tag": "event_type", "variants": vspecs}]
    plan = ConstraintSpec.from_dict(spec).compile()
    got = plan.validate_batch(events_env["table"])
    got_set = sorted(zip(got["doc_id"].to_pylist(), got["rule_id"].to_pylist(),
                         got["span"].to_pylist()))
    exp = (sorted(map(tuple, events_env["con"].execute(
        " UNION ALL ".join(parts)).fetchall())) if parts else [])
    assert got_set == exp


# ---------------------------------------------------------------------------
# map-column differential (M2/M4 per-row): random value schemas over a
# map<string,string> built from documents — engine per-entry dispatch
# vs SQL on the base columns


@pytest.fixture(scope="module")
def map_env(env):
    import pyarrow as pa

    t = env["table"]
    rows = [[("lang", lg), ("src", s)]
            for lg, s in zip(t.column("lang").to_pylist(),
                             t.column("source").to_pylist())]
    packed = pa.table({
        "doc_id": t.column("doc_id"),
        "attrs": pa.array(rows, type=pa.map_(pa.string(), pa.string())),
    })
    return {"table": packed, "con": env["con"]}


@settings(max_examples=60, deadline=None)
@given(lang=str_col_strategy, src=str_col_strategy)
def test_map_values_match_sql(map_env, lang, src):
    values = {}
    parts = []
    for key, col, rules in (("lang", "lang", lang), ("src", "source", src)):
        cdict = dict(rules)
        if ("min_length" in cdict and "max_length" in cdict
                and cdict["min_length"] > cdict["max_length"]):
            del cdict["max_length"]
        if cdict:
            values[key] = cdict
        for kind, val in cdict.items():
            rid, where = sql_for_rule(col, kind, val)
            parts.append(
                f"SELECT CAST(doc_id AS VARCHAR) AS doc_id, '{rid}' AS rule_id,"
                f" 'attrs.{key}' AS span FROM documents WHERE {where}")
    plan = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {"doc_id": {"dtype": "int64"},
                    "attrs": {"map": {"values": values}} if values else {}},
    }).compile()
    got = plan.validate_batch(map_env["table"])
    got_set = sorted(zip(got["doc_id"].to_pylist(), got["rule_id"].to_pylist(),
                         got["span"].to_pylist()))
    exp = (sorted(map(tuple, map_env["con"].execute(
        " UNION ALL ".join(parts)).fetchall())) if parts else [])
    assert got_set == exp
