"""Validation pipelines over the testdata tables, designed so every
violation the engine emits is reproducible by an ANSI-SQL oracle
(UNION ALL of per-rule SELECTs) — the driver's correctness gate runs
both sides and hash-compares.

Thresholds are deliberately inside the data ranges so each rule
produces non-trivial row sets (the raw testdata is clean).
"""

from __future__ import annotations

import pandas as pd

from ..engine import validate
from ..spec import ConstraintSpec

DOCUMENTS_SPEC = {
    "table": "documents",
    "key": "doc_id",
    "columns": {
        "doc_id": {"dtype": "int64", "non_null": True, "unique": True},
        "text": {"dtype": "string", "non_null": True},
        "lang": {"dtype": "string", "non_null": True,
                 "enum": ["en", "de", "fr", "es"]},  # flags zh
        "source": {"dtype": "string", "non_null": True,
                   "pattern": "^src[0-9]$"},          # flags src10..src19
        "n_chars": {"dtype": "int64", "minimum": 100, "maximum": 500},
    },
}

ORDERS_SPEC = {
    "table": "orders",
    "key": "o_orderkey",
    "columns": {
        "o_orderkey": {"dtype": "int64", "non_null": True, "unique": True},
        "o_custkey": {"dtype": "int64", "non_null": True, "ref": "customer"},
        "o_orderstatus": {"dtype": "string", "enum": ["O", "F"]},  # flags P
        "o_totalprice": {"dtype": "float64", "exclusive_minimum": 0,
                         "maximum": 300000},
        "o_orderpriority": {"dtype": "string", "min_length": 5, "max_length": 15},
    },
}

LINEITEM_SPEC = {
    "table": "lineitem",
    "key": "l_orderkey",
    "columns": {
        "l_orderkey": {"dtype": "int64", "non_null": True},
        "l_linenumber": {"dtype": "int32", "minimum": 1, "maximum": 4},
        "l_quantity": {"dtype": "float64", "minimum": 1, "maximum": 45,
                       "multiple_of": 1},
        "l_discount": {"dtype": "float64", "minimum": 0, "maximum": 0.08},
        "l_tax": {"dtype": "float64", "minimum": 0, "maximum": 0.06},
    },
}

# conditional (if/then/else combinator) over events: purchases must have
# value >= 5, everything else >= 0 — C4 if/then/else with a cross-column
# condition (reference schema.rs:294-314)
EVENTS_SPEC = {
    "table": "events",
    "key": "event_id",
    "columns": {
        "event_id": {"dtype": "int64", "non_null": True, "unique": True},
        "event_type": {"dtype": "string", "non_null": True,
                       "enum": ["click", "view", "purchase", "signup", "error"]},
        "value": {
            "dtype": "float64",
            "checks": [{
                "if": {"column": "event_type", "enum": ["purchase"]},
                "then": {"minimum": 5},
                "else": {"minimum": 0},
            }],
        },
    },
}


# combinator coverage (C2 anyOf / C3 oneOf) over part:
#   p_size must be small OR large (anyOf) — mid-range flags none_valid;
#   p_retailprice oneOf two overlapping minimums — >=1500 matches both
#   (more_than_one_valid), <900 matches neither (none_valid exclusive)
PART_SPEC = {
    "table": "part",
    "key": "p_partkey",
    "columns": {
        "p_partkey": {"dtype": "int64", "non_null": True, "unique": True},
        "p_size": {"dtype": "int32",
                   "checks": [{"any_of": [{"maximum": 10}, {"minimum": 40}]}]},
        "p_retailprice": {"dtype": "float64",
                          "checks": [{"one_of": [{"minimum": 900},
                                                 {"minimum": 1500}]}]},
    },
}


def validate_part(sf_dir: str) -> pd.DataFrame:
    spec = ConstraintSpec.from_dict(PART_SPEC)
    rep = validate(f"{sf_dir}/part.parquet", spec)
    return _viol_result(rep)


PART_ORACLE = """
WITH v AS (
  SELECT CAST(p_partkey AS VARCHAR) AS doc_id, 'none_valid' AS rule_id,
         'p_size' AS span
    FROM part WHERE p_size > 10 AND p_size < 40
  UNION ALL
  SELECT CAST(p_partkey AS VARCHAR), 'none_valid', 'p_retailprice'
    FROM part WHERE p_retailprice < 900
  UNION ALL
  SELECT CAST(p_partkey AS VARCHAR), 'more_than_one_valid', 'p_retailprice'
    FROM part WHERE p_retailprice >= 1500
  UNION ALL
  SELECT CAST(p_partkey AS VARCHAR), 'not_unique', 'p_partkey'
    FROM (SELECT p_partkey FROM part GROUP BY p_partkey HAVING COUNT(*) > 1)
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""


# supplier: referential check against the nation manifest (W2) plus
# bounds/pattern — covers the last otherwise-unused testdata table
SUPPLIER_SPEC = {
    "table": "supplier",
    "key": "s_suppkey",
    "columns": {
        "s_suppkey": {"dtype": "int64", "non_null": True, "unique": True},
        "s_name": {"dtype": "string", "non_null": True,
                   "pattern": "^Supplier#"},
        "s_nationkey": {"dtype": "int32", "ref": "nation"},
        "s_acctbal": {"dtype": "float64", "minimum": 0, "maximum": 9000},
    },
}


def validate_supplier(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    spec = ConstraintSpec.from_dict(SUPPLIER_SPEC)
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    rep = validate(f"{sf_dir}/supplier.parquet", spec,
                   manifests={"nation": nat})
    return _viol_result(rep)


SUPPLIER_ORACLE = """
WITH v AS (
  SELECT CAST(s_suppkey AS VARCHAR) AS doc_id, 'ref_missing' AS rule_id,
         's_nationkey' AS span
    FROM supplier
   WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
  UNION ALL
  SELECT CAST(s_suppkey AS VARCHAR), 'no_pattern_match', 's_name'
    FROM supplier WHERE s_name IS NOT NULL
     AND NOT regexp_matches(s_name, '^Supplier#')
  UNION ALL
  SELECT CAST(s_suppkey AS VARCHAR), 'less_than_expected', 's_acctbal'
    FROM supplier WHERE s_acctbal < 0
  UNION ALL
  SELECT CAST(s_suppkey AS VARCHAR), 'more_than_expected', 's_acctbal'
    FROM supplier WHERE s_acctbal > 9000
  UNION ALL
  SELECT CAST(s_suppkey AS VARCHAR), 'not_unique', 's_suppkey'
    FROM (SELECT s_suppkey FROM supplier GROUP BY s_suppkey
          HAVING COUNT(*) > 1)
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""


# M8 true tagged-union dispatch (schema.rs:614-660): per-variant column
# rule-sets keyed on event_type; rows with tags matching no variant
# (view/error here) pass everything — tagged_allow (schema.rs:658).
TAGGED_SPEC = {
    "table": "events",
    "key": "event_id",
    "columns": {
        "event_id": {"dtype": "int64", "non_null": True},
        "event_type": {"dtype": "string"},
        "value": {"dtype": "float64"},
        "user_id": {"dtype": "int64"},
    },
    "tagged": [{
        "tag": "event_type",
        "variants": {
            "purchase": {"columns": {
                "value": {"minimum": 5, "maximum": 400},
                "user_id": {"non_null": True, "minimum": 1},
            }},
            "signup": {"columns": {
                "value": {"maximum": 1},
            }},
            "click": {"columns": {
                "value": {"minimum": 0},
            }},
        },
    }],
}


def validate_tagged(sf_dir: str) -> pd.DataFrame:
    spec = ConstraintSpec.from_dict(TAGGED_SPEC)
    rep = validate(f"{sf_dir}/events.parquet", spec)
    return _viol_result(rep)


TAGGED_ORACLE = """
WITH v AS (
  SELECT CAST(event_id AS VARCHAR) AS doc_id, 'less_than_expected' AS rule_id,
         'value' AS span
    FROM events WHERE event_type = 'purchase' AND value < 5
  UNION ALL
  SELECT CAST(event_id AS VARCHAR), 'more_than_expected', 'value'
    FROM events WHERE event_type = 'purchase' AND value > 400
  UNION ALL
  SELECT CAST(event_id AS VARCHAR), 'non_null', 'user_id'
    FROM events WHERE event_type = 'purchase' AND user_id IS NULL
  UNION ALL
  SELECT CAST(event_id AS VARCHAR), 'less_than_expected', 'user_id'
    FROM events WHERE event_type = 'purchase' AND user_id < 1
  UNION ALL
  SELECT CAST(event_id AS VARCHAR), 'more_than_expected', 'value'
    FROM events WHERE event_type = 'signup' AND value > 1
  UNION ALL
  SELECT CAST(event_id AS VARCHAR), 'less_than_expected', 'value'
    FROM events WHERE event_type = 'click' AND value < 0
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""


# M1 nested struct validation (schema.rs:900-912): documents columns
# packed into a struct column on the Ray side (pc.make_struct is
# zero-copy — the children ARE the original arrays), then validated
# through the recursive `fields` spec with dotted spans.  The oracle
# re-states the same conditions on the flat columns.
NESTED_SPEC = {
    "table": "documents_nested",
    "key": "doc_id",
    "columns": {
        "doc_id": {"dtype": "int64", "non_null": True},
        "meta": {
            "non_null": True,
            "fields": {
                "lang": {"dtype": "string",
                         "enum": ["en", "de", "fr", "es"]},     # flags zh
                "n_chars": {"dtype": "int64", "minimum": 100, "maximum": 500},
                "source": {"dtype": "string", "pattern": "^src[0-9]$"},
            },
        },
    },
}


def validate_nested(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    def pack(t: pa.Table) -> pa.Table:
        meta = pc.make_struct(
            t.column("lang").combine_chunks(),
            t.column("n_chars").combine_chunks(),
            t.column("source").combine_chunks(),
            field_names=["lang", "n_chars", "source"])
        return pa.table({"doc_id": t.column("doc_id"), "meta": meta})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars", "source"])
    nested = ds.map_batches(pack, batch_format="pyarrow")
    rep = validate(nested, ConstraintSpec.from_dict(NESTED_SPEC))
    return _viol_result(rep)


NESTED_ORACLE = """
WITH v AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'invalid_enum_value' AS rule_id,
         'meta.lang' AS span
    FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr','es')
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'less_than_expected', 'meta.n_chars'
    FROM documents WHERE n_chars < 100
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'more_than_expected', 'meta.n_chars'
    FROM documents WHERE n_chars > 500
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'no_pattern_match', 'meta.source'
    FROM documents WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]$')
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""


MAP_SPEC = {
    "key": "doc_id",
    "columns": {
        "doc_id": {"dtype": "string"},
        "attrs": {"map": {
            "key_schema": {"pattern": "^[a-z_]+$"},
            "required_keys": ["src"],
            "max_properties": 2,
            "values": {
                "lang": {"enum": ["en", "de", "fr", "es"]},
                "src": {"pattern": "^src[0-9]$"},
            },
            "additional": False,
        }},
    },
}


def validate_map_column(sf_dir: str) -> pd.DataFrame:
    """Per-row map validation (schema.rs:834-989 runtime analogue): a
    map<string,string> column derived deterministically from documents
    — ("lang", lang) always; ("src", source) iff n_chars >= 100;
    ("Xtra", "y") iff n_chars > 480 — exercises key_schema,
    required_keys, max_properties, exact-key value dispatch and
    additional:False, each reproduced in SQL via map_from_entries /
    map_keys."""
    import pyarrow as pa
    import ray.data as rd

    def pack(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_pylist()
        srcs = t.column("source").to_pylist()
        ncs = t.column("n_chars").to_pylist()
        rows = []
        for lg, s, nc in zip(langs, srcs, ncs):
            entries = [("lang", lg)]
            if nc is not None and nc >= 100:
                entries.append(("src", s))
            if nc is not None and nc > 480:
                entries.append(("Xtra", "y"))
            rows.append(entries)
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.string()),
            "attrs": pa.array(rows, type=pa.map_(pa.string(), pa.string())),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    mapped = ds.map_batches(pack, batch_format="pyarrow")
    rep = validate(mapped, ConstraintSpec.from_dict(MAP_SPEC))
    return _viol_result(rep)


MAP_ORACLE = """
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         map_from_entries(list_concat(list_concat(
           [{'k': 'lang', 'v': lang}],
           CASE WHEN n_chars >= 100 THEN [{'k': 'src', 'v': source}]
                ELSE [] END),
           CASE WHEN n_chars > 480 THEN [{'k': 'Xtra', 'v': 'y'}]
                ELSE [] END)) AS attrs
  FROM documents
), ks AS (
  SELECT doc_id, unnest(map_keys(attrs)) AS k FROM m
), v AS (
  SELECT doc_id, 'no_pattern_match' AS rule_id, 'attrs.' || k AS span
    FROM ks WHERE NOT regexp_matches(k, '^[a-z_]+$')
  UNION ALL
  SELECT doc_id, 'unknown_property', 'attrs.' || k
    FROM ks WHERE k NOT IN ('lang', 'src')
  UNION ALL
  SELECT doc_id, 'required_property', 'attrs'
    FROM m WHERE NOT list_contains(map_keys(attrs), 'src')
  UNION ALL
  SELECT doc_id, 'too_many_properties', 'attrs'
    FROM m WHERE len(map_keys(attrs)) > 2
  UNION ALL
  SELECT doc_id, 'invalid_enum_value', 'attrs.lang'
    FROM m WHERE attrs['lang'][1] IS NOT NULL
            AND attrs['lang'][1] NOT IN ('en', 'de', 'fr', 'es')
  UNION ALL
  SELECT doc_id, 'no_pattern_match', 'attrs.src'
    FROM m WHERE attrs['src'][1] IS NOT NULL
            AND NOT regexp_matches(attrs['src'][1], '^src[0-9]$')
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""


def _viol_result(report) -> pd.DataFrame:
    t = report.violations.select(["doc_id", "rule_id", "span"])
    return (t.to_pandas()
            .sort_values(["doc_id", "rule_id", "span"])
            .reset_index(drop=True))


def validate_documents(sf_dir: str) -> pd.DataFrame:
    spec = ConstraintSpec.from_dict(DOCUMENTS_SPEC)
    rep = validate(f"{sf_dir}/documents.parquet", spec)
    return _viol_result(rep)


def validate_orders(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    spec = ConstraintSpec.from_dict(ORDERS_SPEC)
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    rep = validate(f"{sf_dir}/orders.parquet", spec,
                   manifests={"customer": cust})
    return _viol_result(rep)


def validate_lineitem(sf_dir: str) -> pd.DataFrame:
    spec = ConstraintSpec.from_dict(LINEITEM_SPEC)
    rep = validate(f"{sf_dir}/lineitem.parquet", spec)
    return _viol_result(rep)


# cross-column comparison rules (value <op> another column — the engine's
# column-rhs generalization of the reference's constant bounds,
# macros.rs:261-315): quantity must exceed the line number, and the
# discount must not exceed the tax rate.  Both produce non-trivial
# violation sets on the TPC-H-ish testdata.
CROSS_COLUMN_SPEC = {
    "table": "lineitem",
    "key": "l_orderkey",
    "columns": {
        "l_orderkey": {"dtype": "int64", "non_null": True},
        "l_linenumber": {"dtype": "int32"},
        "l_quantity": {"dtype": "float64",
                       "compare": [{"column": "l_linenumber", "op": "gt"}]},
        "l_discount": {"dtype": "float64",
                       "compare": [{"column": "l_tax", "op": "le"}]},
        "l_tax": {"dtype": "float64"},
    },
}


def validate_cross_column(sf_dir: str) -> pd.DataFrame:
    spec = ConstraintSpec.from_dict(CROSS_COLUMN_SPEC)
    rep = validate(f"{sf_dir}/lineitem.parquet", spec)
    return _viol_result(rep)


def validate_events(sf_dir: str) -> pd.DataFrame:
    spec = ConstraintSpec.from_dict(EVENTS_SPEC)
    rep = validate(f"{sf_dir}/events.parquet", spec)
    return _viol_result(rep)


# ---------------------------------------------------------------------------
# matching DuckDB oracles (doc_id CAST to VARCHAR to match the engine's
# string key column)

DOCUMENTS_ORACLE = """
WITH v AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'invalid_enum_value' AS rule_id,
         'lang' AS span
    FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr','es')
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'no_pattern_match', 'source'
    FROM documents WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]$')
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'less_than_expected', 'n_chars'
    FROM documents WHERE n_chars < 100
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'more_than_expected', 'n_chars'
    FROM documents WHERE n_chars > 500
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'not_unique', 'doc_id'
    FROM (SELECT doc_id FROM documents GROUP BY doc_id HAVING COUNT(*) > 1)
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""

ORDERS_ORACLE = """
WITH v AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS doc_id, 'ref_missing' AS rule_id,
         'o_custkey' AS span
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
  UNION ALL
  SELECT CAST(o_orderkey AS VARCHAR), 'invalid_enum_value', 'o_orderstatus'
    FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F')
  UNION ALL
  SELECT CAST(o_orderkey AS VARCHAR), 'less_than_expected', 'o_totalprice'
    FROM orders WHERE o_totalprice <= 0
  UNION ALL
  SELECT CAST(o_orderkey AS VARCHAR), 'more_than_expected', 'o_totalprice'
    FROM orders WHERE o_totalprice > 300000
  UNION ALL
  SELECT CAST(o_orderkey AS VARCHAR), 'too_short', 'o_orderpriority'
    FROM orders WHERE length(o_orderpriority) < 5
  UNION ALL
  SELECT CAST(o_orderkey AS VARCHAR), 'too_long', 'o_orderpriority'
    FROM orders WHERE length(o_orderpriority) > 15
  UNION ALL
  SELECT CAST(o_orderkey AS VARCHAR), 'not_unique', 'o_orderkey'
    FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""

LINEITEM_ORACLE = """
WITH v AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS doc_id, 'less_than_expected' AS rule_id,
         'l_linenumber' AS span FROM lineitem WHERE l_linenumber < 1
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'more_than_expected', 'l_linenumber'
    FROM lineitem WHERE l_linenumber > 4
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'less_than_expected', 'l_quantity'
    FROM lineitem WHERE l_quantity < 1
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'more_than_expected', 'l_quantity'
    FROM lineitem WHERE l_quantity > 45
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'not_multiple_of', 'l_quantity'
    FROM lineitem WHERE fmod(l_quantity, 1.0) != 0
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'less_than_expected', 'l_discount'
    FROM lineitem WHERE l_discount < 0
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'more_than_expected', 'l_discount'
    FROM lineitem WHERE l_discount > 0.08
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'less_than_expected', 'l_tax'
    FROM lineitem WHERE l_tax < 0
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'more_than_expected', 'l_tax'
    FROM lineitem WHERE l_tax > 0.06
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""

CROSS_COLUMN_ORACLE = """
WITH v AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS doc_id, 'column_comparison' AS rule_id,
         'l_quantity' AS span
    FROM lineitem
   WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
     AND NOT (l_quantity > l_linenumber)
  UNION ALL
  SELECT CAST(l_orderkey AS VARCHAR), 'column_comparison', 'l_discount'
    FROM lineitem
   WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
     AND NOT (l_discount <= l_tax)
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""

EVENTS_ORACLE = """
WITH v AS (
  SELECT CAST(event_id AS VARCHAR) AS doc_id, 'invalid_enum_value' AS rule_id,
         'event_type' AS span
    FROM events WHERE event_type IS NOT NULL
     AND event_type NOT IN ('click','view','purchase','signup','error')
  UNION ALL
  SELECT CAST(event_id AS VARCHAR), 'less_than_expected', 'value'
    FROM events
   WHERE (event_type = 'purchase' AND value < 5)
      OR (event_type != 'purchase' AND value < 0)
  UNION ALL
  SELECT CAST(event_id AS VARCHAR), 'not_unique', 'event_id'
    FROM (SELECT event_id FROM events GROUP BY event_id HAVING COUNT(*) > 1)
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""


def _register_demo_rules() -> None:
    """Install the D6 demo rules (idempotent).  Builders follow the
    extension contract (extend.register_rule): builder(column, params)
    -> fn(pa.Table) -> bool violation mask; nulls never trip
    (repo-wide nullability policy — that is non_null's business)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..extend import register_rule

    def min_words_builder(column: str, params: dict):
        thr = int(params["threshold"])

        def fn(t: pa.Table) -> np.ndarray:
            col = t[column]
            toks = pc.split_pattern_regex(
                pc.utf8_trim_whitespace(col), r"\s+")
            n = pc.fill_null(pc.list_value_length(toks),
                             thr).to_numpy(zero_copy_only=False)
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            return valid & (n < thr)

        return fn

    def char_word_ratio_builder(column: str, params: dict):
        text_col = params["text_col"]
        max_ratio = int(params["max_ratio"])

        def fn(t: pa.Table) -> np.ndarray:
            v = pc.fill_null(pc.cast(t[column], pa.int64()),
                             0).to_numpy(zero_copy_only=False)
            valid = (pc.is_valid(t[column]).to_numpy(
                zero_copy_only=False)
                & pc.is_valid(t[text_col]).to_numpy(
                    zero_copy_only=False))
            toks = pc.split_pattern_regex(
                pc.utf8_trim_whitespace(t[text_col]), r"\s+")
            nw = pc.fill_null(pc.list_value_length(toks),
                              1).to_numpy(zero_copy_only=False)
            return valid & (v > max_ratio * nw)

        return fn

    register_rule("min_words", min_words_builder)
    register_rule("char_word_ratio", char_word_ratio_builder)


CUSTOM_RULES_SPEC = {
    "table": "documents",
    "key": "doc_id",
    "columns": {
        "doc_id": {"dtype": "int64", "non_null": True},
        "text": {"dtype": "string",
                 "custom": [{"rule": "min_words", "threshold": 55,
                             "message": "too few words"}]},
        "n_chars": {"dtype": "int64",
                    "custom": [{"rule": "char_word_ratio",
                                "text_col": "text", "max_ratio": 6,
                                "message": "chars/word too high"}]},
    },
}


def validate_custom_rules(sf_dir: str) -> pd.DataFrame:
    """D6 extension surface under the driver contract: two REGISTERED
    custom rules (one single-column, one cross-column) compiled into a
    spec and run through the standard engine; the oracle restates both
    predicates."""
    _register_demo_rules()
    spec = ConstraintSpec.from_dict(CUSTOM_RULES_SPEC)
    rep = validate(f"{sf_dir}/documents.parquet", spec)
    return _viol_result(rep)


CUSTOM_RULES_ORACLE = r"""
WITH w AS (
  SELECT doc_id, n_chars,
         len(regexp_split_to_array(trim(text), '\s+')) AS nw
  FROM documents WHERE text IS NOT NULL
), v AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'min_words' AS rule_id,
         'text' AS span
  FROM w WHERE nw < 55
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'char_word_ratio', 'n_chars'
  FROM w WHERE n_chars IS NOT NULL AND n_chars > 6 * nw
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""


# embeddings-table spec (S1 element bounds over list<float32>, K3 int
# enum, W1 uniqueness): thresholds sit inside the data range so the
# element arm produces non-trivial spans `embedding.<i>`
# (span.rs:101-103 dotted-keys convention).
EMBEDDINGS_SPEC = {
    "table": "embeddings",
    "key": "vec_id",
    "columns": {
        "vec_id": {"dtype": "int64", "non_null": True, "unique": True},
        "embedding": {"dtype": "list<float32>", "non_null": True,
                      "min_items": 64, "max_items": 64,
                      "element_min": -0.45, "element_max": 0.42},
        "label": {"dtype": "int32", "non_null": True,
                  "enum": [0, 1, 2, 3, 4, 5, 6, 7]},  # flags 8, 9
    },
}


def validate_embeddings(sf_dir: str) -> pd.DataFrame:
    spec = ConstraintSpec.from_dict(EMBEDDINGS_SPEC)
    rep = validate(f"{sf_dir}/embeddings.parquet", spec)
    return _viol_result(rep)


EMBEDDINGS_ORACLE = """
WITH v AS (
  SELECT CAST(vec_id AS VARCHAR) AS doc_id,
         'invalid_enum_value' AS rule_id, 'label' AS span
    FROM embeddings
    WHERE label IS NOT NULL AND label NOT IN (0,1,2,3,4,5,6,7)
  UNION ALL
  SELECT CAST(vec_id AS VARCHAR), 'element_out_of_bounds',
         'embedding.' || CAST(i - 1 AS VARCHAR)
    FROM (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings WHERE embedding IS NOT NULL)
    WHERE x < -0.45 OR x > 0.42
  UNION ALL
  SELECT CAST(vec_id AS VARCHAR), 'not_unique', 'vec_id'
    FROM (SELECT vec_id FROM embeddings
          GROUP BY vec_id HAVING COUNT(*) > 1)
)
SELECT * FROM v ORDER BY doc_id, rule_id, span
"""
