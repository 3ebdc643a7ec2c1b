"""ConstraintSpec: the declarative schema + constraint language, and its
compiler.

This is the engine's analogue of the reference's schemars ``RootSchema``
(/root/reference/verify/src/impls/schemars/schema.rs:7-10): a declarative
description of what every column of a table must satisfy, compiled ONCE
into a plan of vectorized Arrow-kernel rules before any data is read.

``ConstraintSpec.compile()`` plays the role of the reference's schema
self-validation entry point ``RootSchema::verify``
(/root/reference/verify/src/impls/schemars/verify.rs:9-171): it resolves
``$ref``s against local definitions (missing → ``missing definition``,
external URL → ``external reference``, mirroring verify.rs:51-72),
compiles every regex (mirroring verify.rs:124-164) and sanity-checks
bounds, raising ``SpecError`` with ALL problems listed before any Ray
work starts.

Specs load from YAML/JSON/dicts.  Column constraints mirror the JSON
Schema draft-07 subset the reference implements (instance types, enum,
number bounds, string pattern/length, array items/unique/contains/
min-max, required, additionalProperties, allOf/anyOf/oneOf/not/
if-then-else, $ref) plus the table-scope generalisations the north star
needs: global uniqueness, referential checks and distribution drift
(SURVEY.md §2.6).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Optional

import pyarrow as pa

from .errors import SpecError

# ---------------------------------------------------------------------------
# dtype names <-> Arrow types

_DTYPES: dict[str, pa.DataType] = {
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "null": pa.null(),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[ns]": pa.timestamp("ns"),
    "date32": pa.date32(),
}

_LIST_RE = re.compile(r"^(?:list|large_list)<\s*([a-z0-9\[\]_]+)\s*>$")


def parse_dtype(name: str) -> pa.DataType:
    """Parse a dtype string (``int32``, ``list<int32>``...) to an Arrow type."""
    name = name.strip()
    m = _LIST_RE.match(name)
    if m:
        inner = m.group(1)
        if inner not in _DTYPES:
            raise KeyError(name)
        if name.startswith("large_list"):
            return pa.large_list(_DTYPES[inner])
        return pa.list_(_DTYPES[inner])
    return _DTYPES[name]


def dtype_compatible(actual: pa.DataType, expected: pa.DataType) -> bool:
    """Loose equality: list/large_list and string/large_string unify (both
    appear depending on the writer); everything else must match exactly."""
    if actual.equals(expected):
        return True
    if pa.types.is_list(actual) or pa.types.is_large_list(actual):
        if pa.types.is_list(expected) or pa.types.is_large_list(expected):
            return dtype_compatible(actual.value_type, expected.value_type)
        return False
    if pa.types.is_string(actual) or pa.types.is_large_string(actual):
        return pa.types.is_string(expected) or pa.types.is_large_string(expected)
    return False


# ---------------------------------------------------------------------------
# predicate language (combinator leaves)
#
# A predicate dict describes a per-row condition over one column; used as
# the leaves of allOf/anyOf/oneOf/not/if-then-else combinator trees
# (reference validate_subschemas, schema.rs:180-343).  A leaf may name a
# *different* column than the one the combinator is attached to, enabling
# cross-column conditional rules (per-source n_tok caps etc.).

_PRED_LEAF_KEYS = frozenset(
    {
        "column",
        "enum",
        "minimum",
        "maximum",
        "exclusive_minimum",
        "exclusive_maximum",
        "multiple_of",
        "pattern",
        "min_length",
        "max_length",
        "non_null",
        "is_null",
        "min_items",
        "max_items",
        # schema metadata (reference Metadata title/description,
        # errors.rs:11-21): no kernel; interpolated into not/contains
        # Display messages (errors.rs:289-315)
        "title",
        "description",
    }
)
_PRED_NODE_KEYS = frozenset({"all_of", "any_of", "one_of", "not", "if", "then", "else"})


@dataclass
class DriftSpec:
    """Distribution-drift check config (SURVEY.md §2.6 W3).

    Compares per-``group_by`` distributions of ``column`` (mergeable
    histogram-sketch quantiles) and token frequencies of ``token_column``
    (count-min + exact heavy-hitter candidates) against a reference-epoch
    stats table.
    """

    group_by: str = "source"
    column: str = "n_tok"
    token_column: Optional[str] = "tokens"
    reference_stats: Optional[str] = None  # path to reference_stats parquet
    quantiles: tuple = (0.05, 0.25, 0.5, 0.75, 0.95)
    max_rel_err: float = 0.25  # tolerated relative error per quantile
    min_abs_err: float = 8.0   # breaches below this absolute diff never flag
                               # (suppresses small-group sampling noise)
    topk: int = 20
    topk_l1_max: float = 0.25  # max L1 distance over reference top-k freqs
    min_rows: int = 100  # groups smaller than this are not drift-checked
    # optional KS-style check: max |measured_cdf(v_q) - q| over the
    # reference quantile grid (None = disabled).  Catches shape changes
    # the per-quantile relative-error check can miss (e.g. mass moving
    # between quantile anchors).
    ks_max: Optional[float] = None
    # quantile sketch family: "histogram" (log-spaced fixed bins —
    # exact merge, needs non-negative values under ~2^21) or "tdigest"
    # (adaptive centroids — unbounded/signed ranges, tail-accurate,
    # merge associative up to the rank-error bound).
    quantile_sketch: str = "histogram"


@dataclass
class ColumnSpec:
    """Constraints for one column.  Field names follow JSON Schema draft-07
    keywords (snake_case) as implemented by the reference kernels
    (/root/reference/verify-macros/../macros.rs, schema.rs §2 of SURVEY.md)."""

    name: str
    dtype: Optional[str] = None            # K2 check_type (macros.rs:26-114)
    required: bool = True                  # M5 required (schema.rs:992-998)
    non_null: bool = False                 # K12 null/required value
    # K1 boolean schema `false` (not_bool_schema, macros.rs:6-24): no
    # value is ever valid in this column — every non-null row violates
    never: bool = False
    enum: Optional[list] = None            # K3 check_enum (macros.rs:116-241)
    minimum: Optional[float] = None        # K5 (macros.rs:261-273)
    maximum: Optional[float] = None        # K7 (macros.rs:289-301)
    exclusive_minimum: Optional[float] = None  # K6 (macros.rs:275-287)
    exclusive_maximum: Optional[float] = None  # K8 (macros.rs:303-315)
    multiple_of: Optional[float] = None    # K4 (macros.rs:250-259)
    pattern: Optional[str] = None          # K9 (macros.rs:335-354)
    # K10/K11 — enforced unconditionally (reference nests them inside the
    # pattern branch, macros.rs:335-376; documented deviation, SURVEY §7)
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    # list columns
    min_items: Optional[int] = None        # S5 (schema.rs:787-795)
    max_items: Optional[int] = None        # S6 (schema.rs:797-805)
    unique_items: bool = False             # S3 within-row (schema.rs:738-755)
    element_dtype: Optional[str] = None    # S1 items dtype
    element_min: Optional[float] = None    # S1 items bounds
    element_max: Optional[float] = None
    element_exclusive_min: Optional[float] = None
    element_exclusive_max: Optional[float] = None
    element_enum: Optional[list] = None
    contains: Optional[dict] = None        # S4 (schema.rs:698-706) — leaf pred on elements
    # S2 tuple-wise items (schema.rs:718-734): element i validated against
    # items_tuple[i]; overflow elements against additional_items (a leaf
    # dict, or False = "never valid", mirroring SchemaRef::Bool false)
    items_tuple: Optional[list] = None
    additional_items: Optional[object] = None
    len_equals: Optional[str] = None       # cross-field: len(list) == other column
    # cross-field VALUE comparison against another column (generalizes
    # the reference's constant bounds K5-K8, macros.rs:261-315, to a
    # column-valued rhs): list of {column: name, op: lt|le|gt|ge|eq|ne}.
    # NULL policy: a row where either side is null (or NaN) never trips.
    compare: Optional[list] = None
    # table-scope wide ops (SURVEY §2.6)
    unique: bool = False                   # W1 global uniqueness (shuffle)
    ref: Optional[str] = None              # W2 referential: manifest table name
    # W2+ per-group bound from manifest data (FIXTURES T2 max_n_tok):
    # {manifest: name, key: key_column, bound_column: col, op: le|lt|ge|gt}
    ref_bound: Optional[dict] = None
    # combinator tree(s) attached to this column (C1-C5)
    checks: list = field(default_factory=list)
    # D6 custom registered rules: [{rule: name, ...params}]
    custom: list = field(default_factory=list)
    # M1 recursive properties on struct columns (schema.rs:900-912 via
    # the serde map traversal serde.rs:836-840,992-996): sub-field name
    # -> nested column-spec dict (arbitrary depth).  Compiles into rules
    # over dotted paths (``some_inner.inner_value``), spans rendered in
    # the reference's dotted-keys convention (span.rs:101-103).
    fields: Optional[dict] = None
    # M2/M4/M5/M6 PER-ROW map validation for pa.map_(string, T) columns
    # (reference validates arbitrary maps at runtime: property_names
    # over real keys schema.rs:874-883, per-value property counts
    # schema.rs:971-989, string-key enforcement schema.rs:834-852,
    # properties/pattern_properties/additional dispatch per value
    # schema.rs:898-956).  Keys:
    #   key_schema: leaf pred dict applied to every KEY (property_names)
    #   min_properties / max_properties: per-row entry-count bounds
    #   required_keys: [k, ...] each row must contain these keys
    #   values: {key: leaf pred dict}  exact-key value schemas
    #   pattern_values: {regex: leaf pred dict}  first-match dispatch
    #   additional: False (unknown_property) | leaf pred dict
    # Violation spans are ``col.<key>`` (dotted-keys, span.rs:101-103).
    map: Optional[dict] = None
    # M3 additional_properties for THIS struct's sub-fields: False flags
    # undeclared struct fields as unknown_property (schema.rs:941-956)
    allow_unknown_fields: bool = True


def expand_struct_children(c: ColumnSpec,
                           problems: Optional[list] = None) -> list[ColumnSpec]:
    """One level of M1 struct recursion: each entry of ``c.fields``
    becomes a child ColumnSpec named ``parent.child`` (the dotted-path
    convention, reference span.rs:101-103).  Children may themselves
    carry ``fields`` — callers recurse.  Unknown constraint keys are
    reported into ``problems`` (or raised when problems is None)."""
    out: list[ColumnSpec] = []
    if not c.fields:
        return out
    known = set(ColumnSpec.__dataclass_fields__)
    local: list[str] = []
    for fname, fdict in c.fields.items():
        if not isinstance(fdict, dict):
            local.append(f"columns.{c.name}.fields.{fname}: must be a mapping")
            continue
        fdict = dict(fdict)
        fdict.pop("name", None)
        unknown = [k for k in fdict if k not in known]
        if unknown:
            local.append(
                f"columns.{c.name}.fields.{fname}: unknown constraint keys {unknown}")
        out.append(ColumnSpec(
            name=f"{c.name}.{fname}",
            **{k: v for k, v in fdict.items() if k in known}))
    if local:
        if problems is None:
            raise SpecError(local)
        problems.extend(local)
    return out


def expand_all_columns(columns: list[ColumnSpec],
                       problems: Optional[list] = None) -> list[ColumnSpec]:
    """Flatten the struct-field tree depth-first: the returned list has
    every declared path (parents keep their ``fields`` for the
    schema-shape checks; children get dotted names)."""
    out: list[ColumnSpec] = []
    stack = list(reversed(columns))
    while stack:
        c = stack.pop()
        out.append(c)
        for child in reversed(expand_struct_children(c, problems)):
            stack.append(child)
    return out


@dataclass
class ConstraintSpec:
    """A full table spec: the engine's ``RootSchema``."""

    key: str                               # id column used in violation rows
    columns: list[ColumnSpec]
    table: str = "sequences"
    # M3 additional_properties analogue: unknown columns are violations
    allow_unknown_columns: bool = True
    # M6 min/max_properties analogue (column counts, checked at read)
    min_columns: Optional[int] = None
    max_columns: Optional[int] = None
    # M4 property_names analogue (schema.rs:874-883): every column NAME
    # must match this regex (checked once against the fixed schema)
    column_name_pattern: Optional[str] = None
    # M2 pattern_properties analogue: regex -> constraint dict, resolved
    # against actual column names at compile/read time (schema is fixed,
    # so resolved once — mirrors schema.rs:914-939 without per-row work)
    pattern_columns: dict = field(default_factory=dict)
    definitions: dict = field(default_factory=dict)   # C6 $ref targets
    drift: Optional[DriftSpec] = None
    # M8 external-tag dispatch (schema.rs:614-660): entries of
    # ``{tag: <column>, variants: {<tag_value>: {columns: {...}}}}`` —
    # a variant's whole column rule-set applies only to rows whose
    # discriminant equals the tag; unknown/null tags pass everything
    # (tagged_allow, schema.rs:658)
    tagged: list = field(default_factory=list)
    version: str = "1"

    # -- loading ------------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict) -> "ConstraintSpec":
        if not isinstance(d, dict):
            raise SpecError([f"spec must be a mapping, got {type(d).__name__}"])
        if "key" not in d:
            raise SpecError(['spec is missing the required "key" field'])
        d = dict(d)
        definitions = d.get("definitions", {}) or {}
        cols_in = d.get("columns", {})
        problems: list[str] = []
        columns: list[ColumnSpec] = []
        items = cols_in.items() if isinstance(cols_in, dict) else [(c["name"], c) for c in cols_in]
        for name, cdict in items:
            cdict = _resolve_refs(cdict, definitions, problems, path=f"columns.{name}")
            if not isinstance(cdict, dict):
                continue
            cdict = dict(cdict)
            cdict.pop("name", None)
            known = {f for f in ColumnSpec.__dataclass_fields__}
            unknown = [k for k in cdict if k not in known]
            if unknown:
                problems.append(f"columns.{name}: unknown constraint keys {unknown}")
            columns.append(ColumnSpec(name=name, **{k: v for k, v in cdict.items() if k in known}))
        tagged = _resolve_refs(d.get("tagged", []) or [], definitions,
                               problems, path="tagged")
        if problems:
            raise SpecError(problems)
        drift = d.get("drift")
        if isinstance(drift, dict):
            drift = DriftSpec(**drift)
        return cls(
            key=d["key"],
            columns=columns,
            table=d.get("table", "sequences"),
            allow_unknown_columns=d.get("allow_unknown_columns", True),
            min_columns=d.get("min_columns"),
            max_columns=d.get("max_columns"),
            column_name_pattern=d.get("column_name_pattern"),
            pattern_columns=d.get("pattern_columns", {}) or {},
            definitions=definitions,
            drift=drift,
            tagged=tagged,
            version=str(d.get("version", "1")),
        )

    @classmethod
    def from_yaml(cls, path_or_text: str) -> "ConstraintSpec":
        import os

        import yaml

        text = path_or_text
        if os.path.exists(path_or_text):
            with open(path_or_text) as f:
                text = f.read()
        elif path_or_text.endswith((".yaml", ".yml", ".json")) and "\n" not in path_or_text:
            raise FileNotFoundError(f"spec file not found: {path_or_text}")
        return cls.from_dict(yaml.safe_load(text))

    def to_dict(self) -> dict:
        from dataclasses import asdict

        return asdict(self)

    def spec_hash(self) -> str:
        """Stable hash for checkpoint invalidation (SURVEY §4)."""
        import hashlib

        d = self.to_dict()
        d["columns"] = sorted(d["columns"], key=lambda c: c["name"])
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    # -- compilation --------------------------------------------------------

    def compile(self, span_format=None) -> "CompiledPlan":
        """Validate the spec and build the kernel plan.

        Mirrors RootSchema::verify (reference verify.rs:9-171): ALL
        problems are accumulated and raised together; nothing touches
        data until the spec is clean.

        ``span_format(column, elem_idx=None) -> str`` customizes span
        rendering (D5 Spans hook, reference serde.rs:63-95); default is
        the dotted-keys convention.
        """
        from . import kernels  # local import: kernels imports nothing from here at module top

        problems: list[str] = []
        # M1: expand struct ``fields`` into dotted-path child columns so
        # every nested path is validated exactly like a top-level column
        expanded = expand_all_columns(self.columns, problems)
        names = [c.name for c in expanded]
        dupes = {n for n in names if names.count(n) > 1}
        for n in sorted(dupes):
            problems.append(f"columns.{n}: declared more than once")
        if self.key not in names:
            problems.append(f'key column "{self.key}" is not declared in columns')

        for c in expanded:
            p = f"columns.{c.name}"
            if c.dtype is not None:
                try:
                    parse_dtype(c.dtype)
                except KeyError:
                    problems.append(f'{p}.dtype: unknown dtype "{c.dtype}"')
            if c.element_dtype is not None:
                try:
                    parse_dtype(c.element_dtype)
                except KeyError:
                    problems.append(f'{p}.element_dtype: unknown dtype "{c.element_dtype}"')
            if c.pattern is not None:
                # analogue of verify.rs:151-164 (InvalidSchema::InvalidPattern)
                try:
                    re.compile(c.pattern)
                except re.error as e:
                    problems.append(f'{p}.pattern: invalid regex pattern "{c.pattern}": {e}')
            for lo, hi, what in [
                (c.minimum, c.maximum, "minimum/maximum"),
                (c.min_length, c.max_length, "min_length/max_length"),
                (c.min_items, c.max_items, "min_items/max_items"),
                (c.element_min, c.element_max, "element_min/element_max"),
            ]:
                if lo is not None and hi is not None and lo > hi:
                    problems.append(f"{p}.{what}: lower bound {lo} > upper bound {hi}")
            if c.multiple_of is not None and float(c.multiple_of) == 0.0:
                # reference skips m == 0 (macros.rs:251); we reject it in
                # the spec instead — a zero modulus is always a mistake
                problems.append(f"{p}.multiple_of: must be non-zero")
            for neg, nm in [(c.min_length, "min_length"), (c.max_length, "max_length"),
                            (c.min_items, "min_items"), (c.max_items, "max_items")]:
                if neg is not None and neg < 0:
                    problems.append(f"{p}.{nm}: must be >= 0")
            if c.len_equals is not None and c.len_equals not in names:
                problems.append(f'{p}.len_equals: column "{c.len_equals}" is not declared')
            if c.compare is not None:
                if not isinstance(c.compare, list):
                    problems.append(f"{p}.compare: must be a list of "
                                    "{{column, op}} mappings")
                else:
                    for i, cmp in enumerate(c.compare):
                        cp = f"{p}.compare[{i}]"
                        if not isinstance(cmp, dict):
                            problems.append(f"{cp}: must be a mapping")
                            continue
                        other = cmp.get("column")
                        op = cmp.get("op")
                        if not other:
                            problems.append(f"{cp}: missing 'column'")
                        elif other not in names:
                            problems.append(
                                f'{cp}: column "{other}" is not declared')
                        if op not in ("lt", "le", "gt", "ge", "eq", "ne"):
                            problems.append(
                                f"{cp}: op must be one of lt/le/gt/ge/eq/ne, "
                                f"got {op!r}")
                        extra = set(cmp) - {"column", "op"}
                        if extra:
                            problems.append(
                                f"{cp}: unknown keys {sorted(extra)}")
            if c.contains is not None:
                _validate_pred(c.contains, f"{p}.contains", problems, leaf_only=True)
            for i, chk in enumerate(c.checks):
                _validate_pred(chk, f"{p}.checks[{i}]", problems)
            if c.items_tuple is not None:
                for i, node in enumerate(c.items_tuple):
                    _validate_pred(node, f"{p}.items_tuple[{i}]", problems,
                                   leaf_only=True)
            if c.additional_items is not None and c.additional_items is not False:
                if c.items_tuple is None:
                    problems.append(f"{p}.additional_items: requires items_tuple")
                else:
                    _validate_pred(c.additional_items, f"{p}.additional_items",
                                   problems, leaf_only=True)
            if c.map is not None:
                mp = f"{p}.map"
                if not isinstance(c.map, dict):
                    problems.append(f"{mp}: must be a mapping")
                else:
                    known_map = {"key_schema", "min_properties",
                                 "max_properties", "required_keys",
                                 "values", "pattern_values", "additional"}
                    unknown = [k for k in c.map if k not in known_map]
                    if unknown:
                        problems.append(f"{mp}: unknown keys {unknown}")
                    if c.map.get("key_schema") is not None:
                        _validate_pred(c.map["key_schema"],
                                       f"{mp}.key_schema", problems,
                                       leaf_only=True)
                    for bkey in ("min_properties", "max_properties"):
                        v = c.map.get(bkey)
                        if v is not None and (not isinstance(v, int) or v < 0):
                            problems.append(
                                f"{mp}.{bkey}: must be a non-negative integer")
                    mn, mx = (c.map.get("min_properties"),
                              c.map.get("max_properties"))
                    if mn is not None and mx is not None and mn > mx:
                        problems.append(
                            f"{mp}: min_properties {mn} > max_properties {mx}")
                    rk = c.map.get("required_keys")
                    if rk is not None and (not isinstance(rk, list) or any(
                            not isinstance(k, str) for k in rk)):
                        problems.append(
                            f"{mp}.required_keys: must be a list of strings")
                    for sect in ("values", "pattern_values"):
                        sub = c.map.get(sect)
                        if sub is None:
                            continue
                        if not isinstance(sub, dict):
                            problems.append(f"{mp}.{sect}: must be a mapping")
                            continue
                        for k, node in sub.items():
                            if sect == "pattern_values":
                                try:
                                    re.compile(k)
                                except re.error as e:
                                    problems.append(
                                        f'{mp}.pattern_values: invalid regex '
                                        f'pattern "{k}": {e}')
                            _validate_pred(node, f"{mp}.{sect}.{k}",
                                           problems, leaf_only=True)
                    add = c.map.get("additional")
                    if add is not None and add is not False:
                        _validate_pred(add, f"{mp}.additional", problems,
                                       leaf_only=True)
            if c.ref_bound is not None:
                rb = c.ref_bound
                missing = {"manifest", "key", "bound_column"} - set(rb)
                if missing:
                    problems.append(f"{p}.ref_bound: missing keys {sorted(missing)}")
                if rb.get("key") is not None and rb["key"] not in names:
                    problems.append(
                        f'{p}.ref_bound.key: column "{rb["key"]}" is not declared')
                if rb.get("op", "le") not in ("le", "lt", "ge", "gt"):
                    problems.append(f'{p}.ref_bound.op: must be le|lt|ge|gt')
            for i, entry in enumerate(c.custom):
                from .extend import get_rule, registered_rules

                if not isinstance(entry, dict) or "rule" not in entry:
                    problems.append(f"{p}.custom[{i}]: must be a mapping with a "
                                    f'"rule" key')
                elif get_rule(entry["rule"]) is None:
                    problems.append(
                        f'{p}.custom[{i}]: unknown rule "{entry["rule"]}" '
                        f"(registered: {registered_rules()})")
        for pat in self.pattern_columns:
            try:
                re.compile(pat)
            except re.error as e:
                problems.append(f'pattern_columns: invalid regex pattern "{pat}": {e}')
        if self.column_name_pattern is not None:
            try:
                re.compile(self.column_name_pattern)
            except re.error as e:
                problems.append(
                    f'column_name_pattern: invalid regex pattern '
                    f'"{self.column_name_pattern}": {e}')
        if self.drift is not None:
            if self.drift.group_by not in names:
                problems.append(f'drift.group_by: column "{self.drift.group_by}" is not declared')
            if self.drift.column not in names:
                problems.append(f'drift.column: column "{self.drift.column}" is not declared')
            if self.drift.quantile_sketch not in ("histogram", "tdigest"):
                problems.append(
                    f'drift.quantile_sketch: must be "histogram" or '
                    f'"tdigest", got "{self.drift.quantile_sketch}"')
        # M8 tagged dispatch: structural + per-variant-column validation
        known_keys = set(ColumnSpec.__dataclass_fields__)
        for i, entry in enumerate(self.tagged or []):
            p = f"tagged[{i}]"
            if not isinstance(entry, dict) or "tag" not in entry:
                problems.append(f"{p}: must be a mapping with a 'tag' key")
                continue
            if entry["tag"] not in names:
                problems.append(f'{p}.tag: column "{entry["tag"]}" is not declared')
            variants = entry.get("variants")
            if not isinstance(variants, dict) or not variants:
                problems.append(f"{p}.variants: must be a non-empty mapping")
                continue
            for val, vspec in variants.items():
                vp = f"{p}.variants.{val}"
                if not isinstance(vspec, dict) or not isinstance(
                        vspec.get("columns"), dict):
                    problems.append(
                        f"{vp}: must be a mapping with a 'columns' mapping")
                    continue
                for cname, cdict in vspec["columns"].items():
                    cp = f"{vp}.columns.{cname}"
                    if not isinstance(cdict, dict):
                        problems.append(f"{cp}: must be a mapping")
                        continue
                    unknown = [k for k in cdict
                               if k not in known_keys and k != "name"]
                    if unknown:
                        problems.append(
                            f"{cp}: unknown constraint keys {unknown}")
                    # variants gate ROW-LEVEL rules only; schema-level /
                    # table-scope constraints cannot vary by tag —
                    # rejecting them here prevents silent no-ops
                    schema_level = [k for k in ("dtype", "unique", "ref",
                                                "ref_bound", "required",
                                                "element_dtype",
                                                "allow_unknown_fields")
                                    if k in cdict]
                    if schema_level:
                        problems.append(
                            f"{cp}: {schema_level} are schema-level/"
                            f"table-scope constraints and cannot be "
                            f"per-variant (variants gate row-level "
                            f"rules only)")
                    if cdict.get("pattern") is not None:
                        try:
                            re.compile(cdict["pattern"])
                        except re.error as e:
                            problems.append(
                                f'{cp}.pattern: invalid regex pattern '
                                f'"{cdict["pattern"]}": {e}')
                    for j, chk in enumerate(cdict.get("checks") or []):
                        _validate_pred(chk, f"{cp}.checks[{j}]", problems)
        if problems:
            raise SpecError(problems)
        return kernels.compile_plan(self, span_format=span_format)


def _resolve_refs(node: Any, definitions: dict, problems: list[str], path: str) -> Any:
    """Inline ``$ref`` nodes against local ``definitions`` — C6 analogue of
    schema.rs:124-150 + local_definition schema.rs:1017-1023.  Missing
    definition / external URL mirror InvalidSchema::MissingDefinition and
    ::ExternalReference (verify.rs:51-72)."""
    if isinstance(node, dict):
        if "$ref" in node:
            ref = node["$ref"]
            if not isinstance(ref, str) or not ref.startswith("#/definitions/"):
                problems.append(
                    f'{path}: the schema contains unresolved external reference: "{ref}"'
                )
                return {}
            name = ref[len("#/definitions/"):]
            if name not in definitions:
                problems.append(f'{path}: missing local definition "{name}"')
                return {}
            base = _resolve_refs(definitions[name], definitions, problems, path)
            merged = dict(base) if isinstance(base, dict) else {}
            extra = {k: v for k, v in node.items() if k != "$ref"}
            merged.update(_resolve_refs(extra, definitions, problems, path))
            return merged
        return {k: _resolve_refs(v, definitions, problems, f"{path}.{k}") for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_refs(v, definitions, problems, f"{path}[{i}]") for i, v in enumerate(node)]
    return node


def _validate_pred(node: Any, path: str, problems: list[str], leaf_only: bool = False) -> None:
    """Recursively validate a combinator/predicate tree."""
    if not isinstance(node, dict):
        problems.append(f"{path}: predicate must be a mapping, got {type(node).__name__}")
        return
    node_keys = set(node) & _PRED_NODE_KEYS
    leaf_keys = set(node) & _PRED_LEAF_KEYS
    bad = set(node) - _PRED_NODE_KEYS - _PRED_LEAF_KEYS
    if bad:
        problems.append(f"{path}: unknown predicate keys {sorted(bad)}")
    if node_keys and leaf_only:
        problems.append(f"{path}: combinators not allowed here")
        return
    if node_keys and leaf_keys:
        problems.append(f"{path}: cannot mix combinator and leaf keys {sorted(node_keys | leaf_keys)}")
    if "pattern" in node:
        try:
            re.compile(node["pattern"])
        except re.error as e:
            problems.append(f'{path}.pattern: invalid regex pattern "{node["pattern"]}": {e}')
    for k in ("all_of", "any_of", "one_of"):
        if k in node:
            if not isinstance(node[k], list) or not node[k]:
                problems.append(f"{path}.{k}: must be a non-empty list")
            else:
                for i, sub in enumerate(node[k]):
                    _validate_pred(sub, f"{path}.{k}[{i}]", problems)
    if "not" in node:
        _validate_pred(node["not"], f"{path}.not", problems)
    if "if" in node:
        _validate_pred(node["if"], f"{path}.if", problems)
        if "then" not in node and "else" not in node:
            problems.append(f"{path}: 'if' without 'then' or 'else'")
        for k in ("then", "else"):
            if k in node:
                _validate_pred(node[k], f"{path}.{k}", problems)
    elif "then" in node or "else" in node:
        problems.append(f"{path}: 'then'/'else' without 'if'")
