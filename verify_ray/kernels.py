"""Vectorized constraint kernels + the compiled validation plan.

Each reference constraint check (a per-value predicate driven by the
serde visitor — /root/reference/verify/src/impls/schemars/macros.rs and
schema.rs) becomes a *per-batch vectorized kernel*: a function
``pa.Table -> numpy bool mask`` (True = violation) built once at spec
compile time, evaluated with ``pyarrow.compute`` / numpy over whole
columns.  No kernel iterates Python rows; per-violation Python work
happens only on the (rare) violating rows.

Semantics parity notes (SURVEY.md §7):
  * numeric bounds compare as f64, like the reference casts
    (macros.rs:244-322);
  * float enum membership uses ``abs(v - e) < f64 EPSILON``
    (macros.rs:189);
  * ``multiple_of`` is f64 ``%`` (fmod) != 0 (macros.rs:250-259);
  * string lengths are unicode-char counts (Rust ``chars().count()``),
    via ``pc.utf8_length``;
  * ``pattern`` is an unanchored search, like Rust ``Regex::is_match``
    (macros.rs:340), via ``pc.match_substring_regex``;
  * NULL values never trip scalar kernels — nullability is governed
    solely by ``non_null`` / ``required`` (K12, schema.rs:541-570);
  * violations accumulate — one row can emit many violation rows
    (``Errors`` + ``AddAssign``, errors.rs:411-415).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import errors as E
from .errors import R

F64_EPSILON = sys.float_info.epsilon  # core::f64::EPSILON

MaskFn = Callable[[pa.Table], np.ndarray]


# ---------------------------------------------------------------------------
# small helpers


def _np_bool(arr) -> np.ndarray:
    """Arrow boolean (Chunked)Array -> numpy bool, nulls -> False."""
    if isinstance(arr, np.ndarray):
        return arr
    arr = pc.fill_null(arr, False)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(bool, copy=False)


def as_array(col) -> pa.Array:
    """(Chunked)Array -> contiguous Array (the ubiquitous combine-chunks
    dance, in one place)."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _col(t: pa.Table, name: str):
    """Column accessor, path-aware: ``a.b.c`` descends struct fields via
    ``pc.struct_field`` (vectorized; null parents yield null children) —
    the columnar analogue of the reference's recursive map traversal
    (serde.rs:836-840,992-996).  A literal column named ``a.b`` wins
    over path interpretation."""
    if name in t.column_names:
        return t.column(name)
    parts = name.split(".")
    arr = as_array(t.column(parts[0]))
    for p in parts[1:]:
        arr = pc.struct_field(arr, p)
    return arr


def _schema_type_at(schema: pa.Schema, name: str):
    """Resolve a dotted path against a Schema; None if absent."""
    if name in schema.names:
        return schema.field(name).type
    parts = name.split(".")
    if parts[0] not in schema.names:
        return None
    typ = schema.field(parts[0]).type
    for p in parts[1:]:
        if not pa.types.is_struct(typ):
            return None
        idx = typ.get_field_index(p)
        if idx < 0:
            return None
        typ = typ.field(idx).type
    return typ


def _has_col(t: pa.Table, name: str) -> bool:
    """Presence check, path-aware (see _col)."""
    if name in t.column_names:
        return True
    if "." not in name:
        return False
    return _schema_type_at(t.schema, name) is not None


def _f64(col) -> np.ndarray:
    """Column -> float64 numpy with NaN for nulls (bounds compare as f64,
    mirroring the reference's ``$value as f64`` casts, macros.rs:244-322)."""
    a = pc.cast(col, pa.float64())
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return a.to_numpy(zero_copy_only=False)


def _zeros(t: pa.Table) -> np.ndarray:
    return np.zeros(t.num_rows, dtype=bool)


def _list_lengths(col) -> np.ndarray:
    """Per-row list lengths; null lists -> -1 (distinguishable from 0)."""
    ln = pc.list_value_length(col)
    ln = pc.fill_null(pc.cast(ln, pa.int64()), -1)
    if isinstance(ln, pa.ChunkedArray):
        ln = ln.combine_chunks()
    return ln.to_numpy(zero_copy_only=False)


def flatten_with_parents(col):
    """List column -> (values, parent_row_idx, elem_idx_within_list).

    Vectorized S1 machinery (reference validates elements one at a time,
    schema.rs:708-717; we flatten the whole batch's list column once).
    Null lists contribute zero elements.
    """
    values, parents, starts = _flatten3(col)
    elem_idx = np.arange(len(parents), dtype=np.int64) - starts[parents]
    return values, parents, elem_idx


def _flatten3(col):
    """(values, parents, starts): the shared flatten; element indices are
    derived lazily only for violating positions (they're rare)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = pc.list_flatten(col)
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    lengths = np.maximum(_list_lengths(col), 0)
    starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    return values, parents, starts


def _flat_cached(t: pa.Table, name: str, cache: dict):
    """Per-validate_batch memo: flatten each list column at most once no
    matter how many element rules touch it."""
    hit = cache.get(name)
    if hit is None:
        hit = _flatten3(_col(t, name))
        cache[name] = hit
    return hit


def _flat_numeric(t: pa.Table, name: str, cache: dict):
    """(numeric ndarray, parents, starts, nan_mask|None) with a zero-copy
    fast path for null-free integer/float values."""
    key = name + "\x00num"
    hit = cache.get(key)
    if hit is None:
        values, parents, starts = _flat_cached(t, name, cache)
        if values.null_count == 0 and (
                pa.types.is_integer(values.type) or pa.types.is_floating(values.type)):
            v = values.to_numpy(zero_copy_only=True)
            nan = None if pa.types.is_integer(values.type) else np.isnan(v)
        else:
            v = pc.cast(values, pa.float64()).to_numpy(zero_copy_only=False)
            nan = np.isnan(v)
        hit = (v, parents, starts, nan)
        cache[key] = hit
    return hit


# ---------------------------------------------------------------------------
# rule containers


@dataclass
class RowRule:
    """A row-level rule: mask True => emit one violation row with
    span = ``span`` (usually the column name)."""

    rule_id: str
    column: str
    span: str
    message: str
    mask_fn: MaskFn
    # optional per-violation message builder: (table, violating_row_idx)
    # -> list[str]; used where the reference Display interpolates a
    # per-value quantity (e.g. MoreThanOneValid's matched count,
    # errors.rs:284-288)
    message_fn: Optional[Callable[[pa.Table, np.ndarray], list]] = None
    # optional per-violation detail JSON builder (same signature):
    # anyOf/oneOf child-error payloads (NoneValid{schemas, errors},
    # errors.rs:106-110) — evaluated only on violating rows
    detail_fn: Optional[Callable[[pa.Table, np.ndarray], list]] = None


@dataclass
class ElementRule:
    """A list-element-level rule: ``fn(table, flat_cache)`` returns
    (row_idx, elem_idx) of violating elements => violation rows with span
    ``column.<elem_idx>`` (dotted keys convention, reference
    span.rs:101-103 / serde.rs:166-174).  ``flat_cache`` memoizes the
    flattened list column across all element rules of one batch."""

    rule_id: str
    column: str
    message: str
    fn: Callable[[pa.Table, dict], tuple[np.ndarray, np.ndarray]]


@dataclass
class MapRule:
    """A map-ENTRY-level rule for ``pa.map_(string, T)`` columns:
    ``fn(table, cache)`` returns (row_idx, key_strings) of violating
    entries => violation rows with span ``column.<key>`` (dotted-keys
    convention, span.rs:101-103; runtime analogue of the reference's
    per-entry map traversal schema.rs:834-956).  ``cache`` memoizes the
    flattened map column across all map rules of one batch."""

    rule_id: str
    column: str
    message: str
    fn: Callable[[pa.Table, dict], tuple[np.ndarray, list]]


@dataclass
class SchemaRule:
    """A table-schema-level check run once per distinct input schema:
    missing required columns (RequiredProperty, schema.rs:992-998), dtype
    mismatches (InvalidType), unknown columns (additionalProperties:false
    -> UnknownProperty, schema.rs:941-956), column-count bounds
    (schema.rs:971-989).  Emits whole-table violations with doc_id ''."""

    fn: Callable[[pa.Schema], list[tuple[str, str, str]]]  # -> (rule_id, span, message)


# ---------------------------------------------------------------------------
# leaf predicate -> "valid" mask (used by combinators) and natural rules


def _leaf_valid_fn(node: dict, default_column: str) -> MaskFn:
    """Compile a leaf predicate dict into a VALID mask fn (True = passes).

    Nulls count as valid for every leaf except ``non_null`` — combinator
    truth tables then match the row-rule null semantics.
    """
    colname = node.get("column", default_column)
    checks: list[MaskFn] = []

    nullable_ok_rules = _leaf_violation_masks(node, colname)
    for _rid, _msg, mask_fn in nullable_ok_rules:
        checks.append(mask_fn)

    def valid(t: pa.Table) -> np.ndarray:
        out = np.ones(t.num_rows, dtype=bool)
        for m in checks:
            out &= ~m(t)
        return out

    # `is_null` is condition-only (no violation analogue): value IS null
    if node.get("is_null"):
        base = valid

        def valid_isnull(t: pa.Table) -> np.ndarray:
            if not _has_col(t, colname):
                return np.zeros(t.num_rows, dtype=bool)
            return base(t) & _np_bool(pc.is_null(_col(t, colname)))

        return valid_isnull
    return valid


def _leaf_violation_masks(node: dict, colname: str) -> list[tuple[str, str, MaskFn]]:
    """Expand a leaf predicate dict into its natural kernel rules:
    list of (rule_id, message, violation_mask_fn).  This single expansion
    serves both top-level column constraints and combinator branches, so
    rule ids/messages match the reference everywhere."""
    out: list[tuple[str, str, MaskFn]] = []

    def guard(fn):
        def wrapped(t: pa.Table) -> np.ndarray:
            if not _has_col(t, colname):
                return _zeros(t)
            m = fn(_col(t, colname), t)
            if "." in colname and colname not in t.column_names:
                # nested field: a null parent struct means its children
                # are not traversed (the reference never descends into an
                # absent map, serde.rs:992-996) — gate every child rule,
                # including non_null, on parent validity
                parent = colname.rsplit(".", 1)[0]
                m = m & _np_bool(pc.is_valid(_col(t, parent)))
            return m

        return wrapped

    # K12 non_null (null/required value, schema.rs:541-570, 992-998)
    if node.get("non_null"):
        out.append(
            (R.NON_NULL, f'null value in non-null column "{colname}"',
             guard(lambda c, t: _np_bool(pc.is_null(c)))))

    # K3 check_enum (macros.rs:116-241)
    if node.get("enum") is not None:
        enum_vals = list(node["enum"])
        msg = E.msg_invalid_enum(enum_vals)

        def enum_mask(c, t, enum_vals=enum_vals):
            if pa.types.is_floating(c.type):
                # float arm: |v - e| < EPSILON (macros.rs:189)
                v = _f64(c)
                ok = np.zeros(len(v), dtype=bool)
                for e in enum_vals:
                    try:
                        ef = float(e)
                    except (TypeError, ValueError):
                        continue
                    ok |= np.abs(v - ef) < F64_EPSILON
                return ~ok & ~np.isnan(v)
            try:
                vs = pa.array(enum_vals).cast(c.type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                vs = pa.array([v for v in enum_vals if v is not None])
                c = pc.cast(c, vs.type) if len(vs) else c
            valid = pc.is_in(c, value_set=vs)
            return ~_np_bool(valid) & ~_np_bool(pc.is_null(c))

        out.append((R.INVALID_ENUM_VALUE, msg, guard(enum_mask)))

    # K4 multiple_of (macros.rs:250-259): f64 fmod, m != 0 enforced at compile
    if node.get("multiple_of") is not None:
        m = float(node["multiple_of"])

        def mult_mask(c, t, m=m):
            v = _f64(c)
            with np.errstate(invalid="ignore"):
                bad = np.fmod(v, m) != 0.0
            return bad & ~np.isnan(v)

        out.append((R.NOT_MULTIPLE_OF, E.msg_not_multiple_of(m), guard(mult_mask)))

    # K5-K8 numeric bounds (macros.rs:261-315); NaN-safe: comparisons with
    # NaN are False so null/NaN rows never trip
    for key, rid, exclusive, op in [
        ("minimum", R.LESS_THAN_EXPECTED, False, np.less),
        ("exclusive_minimum", R.LESS_THAN_EXPECTED, True, np.less_equal),
        ("maximum", R.MORE_THAN_EXPECTED, False, np.greater),
        ("exclusive_maximum", R.MORE_THAN_EXPECTED, True, np.greater_equal),
    ]:
        if node.get(key) is not None:
            bound = float(node[key])
            msg = (E.msg_less_than_expected(bound, exclusive)
                   if rid == R.LESS_THAN_EXPECTED
                   else E.msg_more_than_expected(bound, exclusive))

            def bound_mask(c, t, bound=bound, op=op):
                with np.errstate(invalid="ignore"):
                    return op(_f64(c), bound)

            out.append((rid, msg, guard(bound_mask)))

    # K9 pattern (macros.rs:335-354): unanchored search
    if node.get("pattern") is not None:
        pat = node["pattern"]

        def pat_mask(c, t, pat=pat):
            ok = pc.match_substring_regex(c, pat)
            return ~_np_bool(ok) & ~_np_bool(pc.is_null(c))

        out.append((R.NO_PATTERN_MATCH, E.msg_no_pattern_match(pat), guard(pat_mask)))

    # K10/K11 string length — unconditional (deviation from the reference's
    # pattern-nesting quirk, macros.rs:335-376; SURVEY §7)
    if node.get("max_length") is not None:
        mx = int(node["max_length"])
        out.append(
            (R.TOO_LONG, E.msg_too_long(mx),
             guard(lambda c, t, mx=mx: _np_bool(pc.greater(pc.utf8_length(c), mx)))))
    if node.get("min_length") is not None:
        mn = int(node["min_length"])
        out.append(
            (R.TOO_SHORT, E.msg_too_short(mn),
             guard(lambda c, t, mn=mn: _np_bool(pc.less(pc.utf8_length(c), mn)))))

    # S5/S6 item-count bounds (schema.rs:787-805)
    if node.get("min_items") is not None:
        mn = int(node["min_items"])
        out.append(
            (R.NOT_ENOUGH_ITEMS, E.msg_not_enough_items(mn),
             guard(lambda c, t, mn=mn: (lambda ln: (ln >= 0) & (ln < mn))(_list_lengths(c)))))
    if node.get("max_items") is not None:
        mx = int(node["max_items"])
        out.append(
            (R.TOO_MANY_ITEMS, E.msg_too_many_items(mx),
             guard(lambda c, t, mx=mx: _list_lengths(c) > mx)))

    return out


# ---------------------------------------------------------------------------
# combinator compilation (C1-C5, validate_subschemas schema.rs:180-343)


def _branch_detail_fn(branches: list, column: str):
    """Child-error payload builder for anyOf/oneOf NoneValid
    (errors.rs:106-110 parity): per violating row, a JSON object naming
    each branch (its ``title`` or index) with the child rules it fails.
    Branch rules are compiled once; masks are evaluated lazily and only
    when violations actually exist in a batch."""
    import json as _json

    compiled: list = []  # lazy: avoid recursion work for clean specs

    def detail(t: pa.Table, idx: np.ndarray) -> list:
        if not compiled:
            compiled.append([
                ((s.get("title") if isinstance(s, dict) else None)
                 or f"branch {j}",
                 compile_pred(s, column))
                for j, s in enumerate(branches)])
        per_branch = []
        for name, rules_j in compiled[0]:
            errs = []
            for r in rules_j:
                try:
                    m = r.mask_fn(t)[idx]
                except Exception:
                    continue
                errs.append((r.rule_id, r.message, m))
            per_branch.append((name, errs))
        out = []
        for i in range(len(idx)):
            bs = []
            for name, errs in per_branch:
                es = [{"rule_id": rid,
                       "message": msg if isinstance(msg, str) else str(msg)}
                      for rid, msg, m in errs if bool(m[i])]
                bs.append({"schema": name, "errors": es})
            out.append(_json.dumps({"branches": bs}))
        return out

    return detail


def compile_pred(node: dict, column: str, gate: Optional[MaskFn] = None) -> list[RowRule]:
    """Compile a combinator/predicate tree into RowRules.

    * leaf as root  -> its natural kernel rules (ids match the reference);
    * ``all_of``    -> children compiled as roots (errors concatenated,
                       schema.rs:188-197);
    * ``any_of``    -> single ``none_valid`` rule (schema.rs:199-237);
    * ``one_of``    -> ``none_valid`` (0 matched) + ``more_than_one_valid``
                       (>1 matched) (schema.rs:239-292);
    * ``not``       -> ``valid_not`` (schema.rs:316-333);
    * ``if/then/else`` -> then/else subtrees compiled as roots, gated by
                       the condition mask (schema.rs:294-314) — child rule
                       ids survive, like the reference's propagated errors.

    ``gate`` restricts all produced rules to rows where gate(t) is True.
    """

    def gated(mask_fn: MaskFn) -> MaskFn:
        if gate is None:
            return mask_fn
        return lambda t, f=mask_fn: f(t) & gate(t)

    def nonnull_gated(mask_fn: MaskFn) -> MaskFn:
        """NULL values never trip combinators (K12 policy: nullability is
        solely non_null's business) — without this, `not X` and
        overlapping `one_of` branches would fire on every null row,
        since nulls count as valid for every leaf."""
        def wrapped(t: pa.Table, f=mask_fn) -> np.ndarray:
            m = f(t)
            if _has_col(t, column):
                m = m & _np_bool(pc.is_valid(_col(t, column)))
            return m

        return gated(wrapped)

    node_keys = set(node) & {"all_of", "any_of", "one_of", "not", "if"}
    rules: list[RowRule] = []
    if not node_keys:  # leaf as root
        colname = node.get("column", column)
        for rid, msg, mask_fn in _leaf_violation_masks(node, colname):
            rules.append(RowRule(rid, colname, colname, msg, gated(mask_fn)))
        return rules

    if "all_of" in node:
        for sub in node["all_of"]:
            rules.extend(compile_pred(sub, column, gate))
    if "any_of" in node:
        subs = [_pred_valid(s, column) for s in node["any_of"]]

        def any_mask(t: pa.Table, subs=subs) -> np.ndarray:
            bad = np.ones(t.num_rows, dtype=bool)
            for v in subs:
                bad &= ~v(t)
            return bad

        rules.append(RowRule(R.NONE_VALID, column, column,
                             E.msg_none_valid(False), nonnull_gated(any_mask),
                             detail_fn=_branch_detail_fn(node["any_of"],
                                                         column)))
    if "one_of" in node:
        subs = [_pred_valid(s, column) for s in node["one_of"]]

        def n_matched(t: pa.Table, subs=subs) -> np.ndarray:
            n = np.zeros(t.num_rows, dtype=np.int32)
            for v in subs:
                n += v(t).astype(np.int32)
            return n

        rules.append(RowRule(R.NONE_VALID, column, column, E.msg_none_valid(True),
                             nonnull_gated(lambda t, f=n_matched: f(t) == 0),
                             detail_fn=_branch_detail_fn(node["one_of"],
                                                         column)))

        def mtov_messages(t: pa.Table, idx: np.ndarray,
                          f=n_matched) -> list:
            # per-row actual matched count, mirroring the reference
            # Display (`{} schemas matched`, errors.rs:284-288)
            n = f(t)[idx]
            return [E.msg_more_than_one_valid(int(k)) for k in n]

        def mtov_detail(t: pa.Table, idx: np.ndarray, subs=subs,
                        branches=node["one_of"]) -> list:
            # MoreThanOneValid{matched} (errors.rs:113): which branches
            # matched, by title (or index when untitled)
            import json as _json

            names = [(s.get("title") if isinstance(s, dict) else None)
                     or f"branch {j}" for j, s in enumerate(branches)]
            vm = [v(t)[idx] for v in subs]
            return [_json.dumps({"matched": [names[j] for j in range(len(vm))
                                             if bool(vm[j][i])]})
                    for i in range(len(idx))]

        rules.append(RowRule(R.MORE_THAN_ONE_VALID, column, column,
                             E.msg_more_than_one_valid(2),
                             nonnull_gated(lambda t, f=n_matched: f(t) > 1),
                             message_fn=mtov_messages,
                             detail_fn=mtov_detail))
    if "not" in node:
        sub = _pred_valid(node["not"], column)
        title = (node["not"].get("title")
                 if isinstance(node["not"], dict) else None)
        rules.append(RowRule(R.VALID_NOT, column, column,
                             E.msg_valid_not(title),
                             nonnull_gated(lambda t, v=sub: v(t))))
    if "if" in node:
        cond = _pred_valid(node["if"], column)
        if "then" in node:
            then_gate: MaskFn = cond if gate is None else (
                lambda t, c=cond, g=gate: c(t) & g(t))
            rules.extend(compile_pred(node["then"], column, then_gate))
        if "else" in node:
            else_gate: MaskFn = (lambda t, c=cond: ~c(t)) if gate is None else (
                lambda t, c=cond, g=gate: ~c(t) & g(t))
            rules.extend(compile_pred(node["else"], column, else_gate))
    return rules


def _pred_valid(node: dict, column: str) -> MaskFn:
    """Compile a predicate tree into a VALID mask fn (True = satisfied)."""
    node_keys = set(node) & {"all_of", "any_of", "one_of", "not", "if"}
    if not node_keys:
        return _leaf_valid_fn(node, column)
    parts: list[MaskFn] = []
    if "all_of" in node:
        subs = [_pred_valid(s, column) for s in node["all_of"]]

        def all_valid(t, subs=subs):
            out = np.ones(t.num_rows, dtype=bool)
            for v in subs:
                out &= v(t)
            return out

        parts.append(all_valid)
    if "any_of" in node:
        subs = [_pred_valid(s, column) for s in node["any_of"]]

        def any_valid(t, subs=subs):
            out = np.zeros(t.num_rows, dtype=bool)
            for v in subs:
                out |= v(t)
            return out

        parts.append(any_valid)
    if "one_of" in node:
        subs = [_pred_valid(s, column) for s in node["one_of"]]

        def one_valid(t, subs=subs):
            n = np.zeros(t.num_rows, dtype=np.int32)
            for v in subs:
                n += v(t).astype(np.int32)
            return n == 1

        parts.append(one_valid)
    if "not" in node:
        sub = _pred_valid(node["not"], column)
        parts.append(lambda t, v=sub: ~v(t))
    if "if" in node:
        cond = _pred_valid(node["if"], column)
        then_v = _pred_valid(node["then"], column) if "then" in node else None
        else_v = _pred_valid(node["else"], column) if "else" in node else None

        def ite_valid(t, cond=cond, then_v=then_v, else_v=else_v):
            c = cond(t)
            tv = then_v(t) if then_v else np.ones(t.num_rows, dtype=bool)
            ev = else_v(t) if else_v else np.ones(t.num_rows, dtype=bool)
            return np.where(c, tv, ev)

        parts.append(ite_valid)

    def combined(t):
        out = np.ones(t.num_rows, dtype=bool)
        for p in parts:
            out &= p(t)
        return out

    return combined


# ---------------------------------------------------------------------------
# element rules (S1, S3, S4)


def _element_rules(c) -> list[ElementRule]:
    """Build element-level rules for one list-typed ColumnSpec."""
    from .spec import ColumnSpec, parse_dtype  # noqa: F401 (type only)

    rules: list[ElementRule] = []
    name = c.name

    # S1 element bounds / enum over the flattened values (schema.rs:708-717)
    elem_checks: list[tuple[str, str, Callable]] = []
    for attr, rid_, excl, op in [
        ("element_min", R.ELEMENT_OUT_OF_BOUNDS, False, np.less),
        ("element_exclusive_min", R.ELEMENT_OUT_OF_BOUNDS, True, np.less_equal),
        ("element_max", R.ELEMENT_OUT_OF_BOUNDS, False, np.greater),
        ("element_exclusive_max", R.ELEMENT_OUT_OF_BOUNDS, True, np.greater_equal),
    ]:
        bval = getattr(c, attr)
        if bval is None:
            continue
        b = float(bval)
        msg = (E.msg_less_than_expected(b, excl) if op in (np.less, np.less_equal)
               else E.msg_more_than_expected(b, excl))
        elem_checks.append((rid_, msg, lambda v, b=b, op=op: op(v, b)))
    # element_enum works on the RAW values (strings or numbers) via
    # pc.is_in — never through the numeric-cast fast path, which would
    # blow up on list<string> columns
    if c.element_enum is not None:
        enum_vals = list(c.element_enum)
        msg = E.msg_invalid_enum(enum_vals)

        def enum_elem_fn(t: pa.Table, cache: dict, name=name,
                         enum_vals=enum_vals):
            if not _has_col(t, name):
                return np.empty(0, np.int64), np.empty(0, np.int64)
            values, parents, starts = _flat_cached(t, name, cache)
            if len(parents) == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            try:
                vs = pa.array(enum_vals).cast(values.type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                vs = pa.array([v for v in enum_vals if v is not None])
            ok = pc.is_in(values, value_set=vs)
            bad = ~_np_bool(ok) & _np_bool(pc.is_valid(values))
            sel = np.flatnonzero(bad)
            if len(sel) == 0:
                return sel, sel
            par = parents[sel]
            return par, sel - starts[par]

        rules.append(ElementRule(R.INVALID_ENUM_VALUE, name, msg, enum_elem_fn))

    for rid, msg, badfn in elem_checks:
        def elem_fn(t: pa.Table, cache: dict, name=name, badfn=badfn):
            if not _has_col(t, name):
                return np.empty(0, np.int64), np.empty(0, np.int64)
            v, parents, starts, nan = _flat_numeric(t, name, cache)
            # bounds compare against the value's native dtype where
            # possible (zero-copy int fast path); null/NaN elements never
            # trip bounds (K12 governs nulls)
            with np.errstate(invalid="ignore"):
                bad = badfn(v)
            if nan is not None:
                bad &= ~nan
            sel = np.flatnonzero(bad)
            if len(sel) == 0:
                return sel, sel
            par = parents[sel]
            return par, sel - starts[par]

        rules.append(ElementRule(rid, name, msg, elem_fn))

    # S3 unique_items, within-row (schema.rs:738-755).  Vectorized:
    # sort values within each list (lexsort by (parent, value)) and flag
    # adjacent equal pairs within the same parent.  We report the
    # *duplicate* element's index, mirroring NotUnique{first, duplicate}.
    if c.unique_items:
        def uniq_fn(t: pa.Table, cache: dict, name=name):
            empty = (np.empty(0, np.int64),) * 3
            if not _has_col(t, name):
                return empty
            values, parents, starts = _flat_cached(t, name, cache)
            if len(parents) == 0:
                return empty
            # NULL policy: null elements never participate in uniqueness
            # (nullability is non_null's business) — and an object array
            # with None would break lexsort's comparisons
            if values.null_count:
                valid = pc.is_valid(values).to_numpy(zero_copy_only=False)
                keep = np.flatnonzero(valid)
                if len(keep) == 0:
                    return empty
                v = values.take(pa.array(keep)).to_numpy(zero_copy_only=False)
                flat_ids, par_ids = keep, parents[keep]
            else:
                v = values.to_numpy(zero_copy_only=False)
                flat_ids = np.arange(len(parents), dtype=np.int64)
                par_ids = parents
            order = np.lexsort((v, par_ids))
            sv, sp = v[order], par_ids[order]
            dup = np.zeros(len(sv), dtype=bool)
            dup[1:] = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
            sel = np.flatnonzero(dup)
            if len(sel) == 0:
                return empty
            # report each duplicated (row) once per extra occurrence, at
            # the duplicate's original element index; also carry the
            # FIRST occurrence's element index — the NotUnique{first,
            # duplicate} span pair (errors.rs:119-122, schema.rs:738-755)
            run_id = np.cumsum(~dup) - 1          # equal-value run per parent
            run_first = np.flatnonzero(~dup)       # sorted idx of run heads
            flat = flat_ids[order[sel]]
            first_flat = flat_ids[order[run_first[run_id[sel]]]]
            par = parents[flat]
            return par, flat - starts[par], first_flat - starts[par]

        rules.append(ElementRule(R.NOT_UNIQUE, name, E.msg_not_unique(), uniq_fn))

    # S2 tuple-wise items + additional_items (schema.rs:718-734):
    # element i validated against items_tuple[i]; overflow elements
    # against additional_items (False = Never, SchemaRef::Bool false)
    if c.items_tuple is not None:
        n_pos = len(c.items_tuple)

        def position_values(t: pa.Table, cache: dict, i: int, name=name):
            """(value_table, row_indices) for element position i."""
            values, parents, starts = _flat_cached(t, name, cache)
            lengths = np.maximum(_list_lengths(_col(t, name)), 0)
            rows = np.flatnonzero(lengths > i)
            flat = starts[rows] + i
            vt = pa.table({name: values.take(pa.array(flat))})
            return vt, rows

        for i, node in enumerate(c.items_tuple):
            for rid, msg, mask_fn in _leaf_violation_masks(dict(node), name):
                def pos_fn(t: pa.Table, cache: dict, i=i, mask_fn=mask_fn):
                    if not _has_col(t, name):
                        return np.empty(0, np.int64), np.empty(0, np.int64)
                    vt, rows = position_values(t, cache, i)
                    bad = mask_fn(vt)
                    sel = np.flatnonzero(bad)
                    return rows[sel], np.full(len(sel), i, dtype=np.int64)

                rules.append(ElementRule(rid, name, msg, pos_fn))

        if c.additional_items is False:
            def overflow_never(t: pa.Table, cache: dict, name=name, n_pos=n_pos):
                if not _has_col(t, name):
                    return np.empty(0, np.int64), np.empty(0, np.int64)
                _, parents, starts = _flat_cached(t, name, cache)
                flat = np.arange(len(parents), dtype=np.int64)
                elem = flat - starts[parents]
                sel = np.flatnonzero(elem >= n_pos)
                return parents[sel], elem[sel]

            rules.append(ElementRule(R.NEVER, name, E.msg_never(), overflow_never))
        elif isinstance(c.additional_items, dict):
            for rid, msg, mask_fn in _leaf_violation_masks(
                    dict(c.additional_items), name):
                def overflow_fn(t: pa.Table, cache: dict, name=name,
                                n_pos=n_pos, mask_fn=mask_fn):
                    if not _has_col(t, name):
                        return np.empty(0, np.int64), np.empty(0, np.int64)
                    values, parents, starts = _flat_cached(t, name, cache)
                    flat = np.arange(len(parents), dtype=np.int64)
                    elem = flat - starts[parents]
                    over = np.flatnonzero(elem >= n_pos)
                    vt = pa.table({name: values.take(pa.array(over))})
                    bad = mask_fn(vt)
                    sel = over[np.flatnonzero(bad)]
                    return parents[sel], elem[sel]

                rules.append(ElementRule(rid, name, msg, overflow_fn))

    return rules


def _contains_rule(c) -> Optional[RowRule]:
    """S4 contains (schema.rs:698-706 + 773-784): at least one element
    matches the leaf predicate, else ``must_contain`` at the row level."""
    if c.contains is None:
        return None
    node = dict(c.contains)
    name = c.name

    def mask(t: pa.Table, node=node, name=name) -> np.ndarray:
        if not _has_col(t, name):
            return _zeros(t)
        col = _col(t, name)
        values, parents, _ = flatten_with_parents(col)
        # evaluate the leaf predicate on a one-column table of the values
        vt = pa.table({name: values})
        ok = _leaf_valid_fn(node, name)(vt)
        sat = np.zeros(t.num_rows, dtype=bool)
        np.logical_or.at(sat, parents[ok], True)
        lengths = _list_lengths(col)
        # null lists don't fail `contains` (no seq traversal happened)
        return ~sat & (lengths >= 0)

    return RowRule(R.MUST_CONTAIN, name, name,
                   E.msg_must_contain(node.get("title")), mask)


# ---------------------------------------------------------------------------
# compiled plan


@dataclass
class RefCheck:
    column: str
    manifest: str  # logical manifest name; values supplied at run time
    # per-group bound variant (None = membership check):
    key: Optional[str] = None
    bound_column: Optional[str] = None
    op: str = "le"


@dataclass
class CompiledPlan:
    """The output of ConstraintSpec.compile(): everything the per-batch
    validator and the wide stages need, pre-resolved."""

    spec: object  # ConstraintSpec (avoid circular type import)
    key: str
    row_rules: list[RowRule]
    element_rules: list[ElementRule]
    expected_dtypes: dict[str, pa.DataType]
    required_columns: list[str]
    nonnull_required_columns: list[str]
    unique_columns: list[str]
    ref_checks: list[RefCheck]
    drift: Optional[object]
    allow_unknown_columns: bool
    min_columns: Optional[int]
    max_columns: Optional[int]
    pattern_columns: dict = field(default_factory=dict)
    # every column any rule touches — the read-time projection (prune at
    # the read: only these columns leave storage)
    referenced_columns: list[str] = field(default_factory=list)
    # D5 span-format hook: (column, elem_idx=None) -> str; None = dotted
    span_format: Optional[Callable] = None
    # M4 property_names analogue: regex every column name must match
    column_name_pattern: Optional[str] = None
    # M1/M3 struct columns: dotted path -> {"strict": bool,
    # "declared": [field names]} for the nested schema-shape checks
    struct_specs: dict = field(default_factory=dict)
    # per-row map-column validation (schema.rs:834-989 runtime analogue)
    map_rules: list = field(default_factory=list)
    map_columns: list = field(default_factory=list)

    # -- schema-level validation (once per distinct schema) ----------------

    def schema_violations(self, schema: pa.Schema) -> list[tuple[str, str, str]]:
        """Run M3/M5/M6/K2 schema-shape checks.  Returns (rule_id, span,
        message) tuples; emitted as whole-table violations (doc_id='')."""
        from .spec import dtype_compatible, parse_dtype

        out: list[tuple[str, str, str]] = []
        names = set(schema.names)
        for col in self.required_columns:
            if "." in col and col not in names:
                # nested required field (M5 within a struct,
                # schema.rs:992-998): flagged only when the PARENT struct
                # exists — a missing parent reports once, at its own level
                parent, child = col.rsplit(".", 1)
                ptyp = _schema_type_at(schema, parent)
                if (ptyp is not None and pa.types.is_struct(ptyp)
                        and ptyp.get_field_index(child) < 0):
                    out.append((R.REQUIRED_PROPERTY, parent,
                                E.msg_required_property(child)))
            elif col not in names:
                # RequiredProperty with empty span — matches the golden
                # `() the required property "some_int" is missing`
                # (examples/schemars_json.rs:75)
                out.append((R.REQUIRED_PROPERTY, "", E.msg_required_property(col)))
        for col, want in self.expected_dtypes.items():
            got = _schema_type_at(schema, col)
            if got is not None and not dtype_compatible(got, want):
                out.append((R.INVALID_TYPE, col,
                            E.msg_invalid_type(str(want), str(got))))
        # M1 struct shape + M3 additional_properties inside structs
        for path, info in self.struct_specs.items():
            got = _schema_type_at(schema, path)
            if got is None:
                continue
            if not pa.types.is_struct(got):
                out.append((R.INVALID_TYPE, path,
                            E.msg_invalid_type("struct", str(got))))
                continue
            if info.get("strict"):
                declared = set(info.get("declared", ()))
                for f in got:
                    if f.name not in declared:
                        out.append((R.UNKNOWN_PROPERTY, f"{path}.{f.name}",
                                    E.msg_unknown_property()))
        # map columns: must BE maps with string keys (the KeyNotString
        # arm, schema.rs:834-852 / errors.rs:157 — Arrow key types are
        # schema-fixed, so this is a per-read check, not per-row)
        for col in self.map_columns:
            got = _schema_type_at(schema, col)
            if got is None:
                continue
            if not pa.types.is_map(got):
                out.append((R.INVALID_TYPE, col,
                            E.msg_invalid_type("map", str(got))))
            elif not pa.types.is_string(got.key_type):
                out.append((R.UNSUPPORTED_VALUE, col,
                            "map key must be a string"))
        declared = set(self.expected_dtypes) | set(self.required_columns) | {
            c.name for c in self.spec.columns}
        # M2 pattern_columns: a column matching a pattern is "known"
        import re as _re

        pat_res = [(_re.compile(p), sub) for p, sub in self.pattern_columns.items()]
        if not self.allow_unknown_columns:
            for n in schema.names:
                if n not in declared and not any(p.search(n) for p, _ in pat_res):
                    out.append((R.UNKNOWN_PROPERTY, n, E.msg_unknown_property()))
        if self.column_name_pattern is not None:
            # M4 property_names (schema.rs:874-883): every column NAME
            # must match; the schema is fixed so this is a per-read check
            cre = _re.compile(self.column_name_pattern)
            for n in schema.names:
                if not cre.search(n):
                    out.append((R.NO_PATTERN_MATCH, n,
                                f'the column name must match the pattern '
                                f'"{self.column_name_pattern}"'))
        if self.min_columns is not None and len(schema.names) < self.min_columns:
            out.append((R.NOT_ENOUGH_PROPERTIES, "",
                        f"the object must have at least {self.min_columns} properties"))
        if self.max_columns is not None and len(schema.names) > self.max_columns:
            out.append((R.TOO_MANY_PROPERTIES, "",
                        f"the object cannot have more than {self.max_columns} properties"))
        return out

    def pattern_column_rules(self, schema: pa.Schema) -> list[RowRule]:
        """M2 pattern_properties analogue (schema.rs:914-939): expand each
        pattern_columns entry against the ACTUAL column names once (the
        schema is fixed, so this resolves at read time, never per row).
        First matching pattern wins per column, like the reference's
        first-match dispatch (schema.rs:926)."""
        import re as _re

        out: list[RowRule] = []
        declared = {c.name for c in self.spec.columns}
        pats = [(_re.compile(p), sub) for p, sub in self.pattern_columns.items()]
        for name in schema.names:
            if name in declared:
                continue
            for pat, sub in pats:
                if pat.search(name):
                    for rid, msg, mask_fn in _leaf_violation_masks(dict(sub), name):
                        out.append(RowRule(rid, name, name, msg, mask_fn))
                    break
        return out

    # -- per-batch validation ----------------------------------------------

    def validate_batch(self, t: pa.Table) -> pa.Table:
        """Run all row + element rules over one Arrow batch; return
        violation rows (VIOLATION_SCHEMA minus partition_id)."""
        key_col = _col(t, self.key) if _has_col(t, self.key) else None
        if key_col is not None and not pa.types.is_string(key_col.type):
            key_col = pc.cast(key_col, pa.string())
        if isinstance(key_col, pa.ChunkedArray):
            key_col = key_col.combine_chunks()

        doc_ids: list[pa.Array] = []
        rule_ids: list[str] = []
        messages: list[object] = []   # constant str or per-violation list
        counts: list[int] = []
        # per-emit span spec: a constant string (row-level) or a list of
        # per-violation strings (element-level)
        span_specs: list[object] = []
        first_specs: list[object] = []  # None (null) or per-violation list
        detail_specs: list[object] = []  # None (null) or per-violation list

        def emit(ids: pa.Array, rid: str, span_spec, msg, firsts=None,
                 details=None):
            doc_ids.append(ids)
            rule_ids.append(rid)
            span_specs.append(span_spec)
            messages.append(msg)
            first_specs.append(firsts)
            detail_specs.append(details)
            counts.append(len(ids))

        # TypeError guards against object-dtype comparisons numpy can't
        # do (e.g. mixed-type list elements) — degrade to data, never
        # abort the run (the documented NULL/robustness policy)
        KERNEL_ERRORS = (pa.ArrowNotImplementedError, pa.ArrowInvalid,
                         pa.ArrowTypeError, TypeError)
        kernel_errors: list[tuple[str, str]] = []
        for rule in self.row_rules:
            try:
                mask = rule.mask_fn(t)
            except KERNEL_ERRORS as e:
                # a kernel cannot run on this column's actual dtype —
                # report it as data (UnsupportedValue, reference
                # errors.rs:149-152), never abort the run.  The
                # schema-level check reports the dtype mismatch itself.
                kernel_errors.append((rule.column, f"{rule.rule_id}: {e}"))
                continue
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            ids = (key_col.take(pa.array(idx)) if key_col is not None
                   else pa.array([""] * len(idx)))
            msg = (rule.message_fn(t, idx) if rule.message_fn is not None
                   else rule.message)
            det = (rule.detail_fn(t, idx) if rule.detail_fn is not None
                   else None)
            emit(ids, rule.rule_id,
                 self.span_format(rule.column) if self.span_format else rule.span,
                 msg, details=det)

        flat_cache: dict = {}
        for rule in self.element_rules:
            try:
                res = rule.fn(t, flat_cache)
            except KERNEL_ERRORS as e:
                kernel_errors.append((rule.column, f"{rule.rule_id}: {e}"))
                continue
            rows, elems = res[0], res[1]
            firsts = res[2] if len(res) > 2 else None
            if len(rows) == 0:
                continue
            ids = (key_col.take(pa.array(rows)) if key_col is not None
                   else pa.array([""] * len(rows)))
            if self.span_format:
                espans = [self.span_format(rule.column, int(e)) for e in elems]
                fspans = ([self.span_format(rule.column, int(e)) for e in firsts]
                          if firsts is not None else None)
            else:
                espans = [f"{rule.column}.{int(e)}" for e in elems]
                fspans = ([f"{rule.column}.{int(e)}" for e in firsts]
                          if firsts is not None else None)
            emit(ids, rule.rule_id, espans, rule.message, firsts=fspans)

        map_cache: dict = {}
        for rule in self.map_rules:
            try:
                rows, keys = rule.fn(t, map_cache)
            except KERNEL_ERRORS as e:
                kernel_errors.append((rule.column, f"{rule.rule_id}: {e}"))
                continue
            if len(rows) == 0:
                continue
            ids = (key_col.take(pa.array(rows)) if key_col is not None
                   else pa.array([""] * len(rows)))
            # string map keys ride the span_format hook like element
            # indices do (span ``col.<key>``); None -> row-level span
            if self.span_format:
                spans = [self.span_format(rule.column)
                         if k is None else self.span_format(rule.column, k)
                         for k in keys]
            else:
                spans = [rule.column if k is None else f"{rule.column}.{k}"
                         for k in keys]
            emit(ids, rule.rule_id, spans, rule.message)

        # dedup kernel-error reports per column; one row each, doc_id ''
        for col_name, detail in dict(kernel_errors).items():
            emit(pa.array([""], type=pa.string()), R.UNSUPPORTED_VALUE, col_name,
                 f"unsupported value: kernel cannot run on column "
                 f'"{col_name}" ({detail})')

        if not counts:
            return _empty_violations()

        rid_arr = _repeat_strings(rule_ids, counts)

        def spec_arrays(specs: list[object], nullable=False) -> pa.Array:
            parts: list[pa.Array] = []
            for spec_, n in zip(specs, counts):
                if isinstance(spec_, list):
                    parts.append(pa.array(spec_, type=pa.string()))
                elif spec_ is None and nullable:
                    parts.append(pa.nulls(n, pa.string()))
                else:
                    parts.append(pa.array([spec_] * n, type=pa.string()))
            return pa.concat_arrays(parts) if len(parts) > 1 else parts[0]

        return pa.table(
            {
                "doc_id": pa.concat_arrays([as_array(a) for a in doc_ids]).cast(pa.string()),
                "rule_id": rid_arr,
                "span": spec_arrays(span_specs),
                "first_span": spec_arrays(first_specs, nullable=True),
                "message": spec_arrays(messages),
                "detail": spec_arrays(detail_specs, nullable=True),
            }
        )


def _repeat_strings(vals: list[str], counts: list[int]) -> pa.Array:
    out = np.empty(sum(counts), dtype=object)
    pos = 0
    for v, n in zip(vals, counts):
        out[pos:pos + n] = v
        pos += n
    return pa.array(out, type=pa.string())


def _empty_violations() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "rule_id": pa.array([], type=pa.string()),
            "span": pa.array([], type=pa.string()),
            "first_span": pa.array([], type=pa.string()),
            "message": pa.array([], type=pa.string()),
            "detail": pa.array([], type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# plan compiler (called from ConstraintSpec.compile())


def _map_parts(t: pa.Table, col: str, cache: dict):
    """Flattened view of a map column: (keys, items, counts, valid,
    parents), window-corrected for sliced arrays and memoized per
    batch.  ``parents[i]`` is the row index of flat entry i."""
    ck = ("__map__", col)
    if ck not in cache:
        arr = as_array(_col(t, col))
        off = arr.offsets.to_numpy().astype(np.int64)
        lo, hi = (int(off[0]), int(off[-1])) if len(off) else (0, 0)
        keys = arr.keys.slice(lo, hi - lo)
        items = arr.items.slice(lo, hi - lo)
        counts = np.diff(off - lo) if len(off) else np.empty(0, np.int64)
        valid = _np_bool(pc.is_valid(arr))
        parents = np.repeat(np.arange(len(arr)), counts)
        cache[ck] = (keys, items, counts, valid, parents)
    return cache[ck]


def _map_dispatch(t: pa.Table, col: str, cache: dict, exact_keys: tuple,
                  patterns: tuple) -> dict:
    """Per-entry value-schema dispatch selectors, first-match semantics
    mirroring the reference (properties, then the first matching
    pattern_properties regex, then additional_properties —
    schema.rs:898-956).  Memoized per batch."""
    ck = ("__mapdisp__", col, exact_keys, patterns)
    if ck not in cache:
        keys, _items, _counts, _valid, _parents = _map_parts(t, col, cache)
        ks = pc.cast(keys, pa.string())
        matched = np.zeros(len(ks), dtype=bool)
        sel: dict = {}
        for k in exact_keys:
            mk = _np_bool(pc.equal(ks, k)) & ~matched
            sel[("exact", k)] = mk
            matched |= mk
        for pat in patterns:
            mk = _np_bool(pc.match_substring_regex(ks, pat)) & ~matched
            sel[("pattern", pat)] = mk
            matched |= mk
        sel["unmatched"] = ~matched
        cache[ck] = sel
    return cache[ck]


def _build_map_rules(c) -> list[MapRule]:
    """PER-ROW runtime validation of a ``pa.map_(string, T)`` column —
    the map analogue of the reference's object traversal: key schema
    (property_names, schema.rs:874-883), per-row property-count bounds
    (schema.rs:971-989), per-row required keys (schema.rs:992-998), and
    value-schema dispatch (properties / pattern_properties /
    additional_properties, schema.rs:898-956).  Entry violations carry
    span ``col.<key>``; row-level ones (counts, required) span ``col``.
    """
    m = dict(c.map)
    col = c.name
    rules: list[MapRule] = []
    EMPTY = (np.empty(0, dtype=np.int64), [])

    def guard(fn):
        def wrapped(t: pa.Table, cache: dict):
            if not _has_col(t, col):
                return EMPTY
            typ = _schema_type_at(t.schema, col)
            if typ is None or not pa.types.is_map(typ):
                return EMPTY  # schema_violations reports the dtype
            return fn(t, cache)

        return wrapped

    def key_strings(keys, idx: np.ndarray) -> list:
        return pc.cast(keys.take(pa.array(idx)), pa.string()).to_pylist()

    # property_names analogue: leaf schema over every KEY
    if m.get("key_schema") is not None:
        for rid, msg, mask_fn in _leaf_violation_masks(
                dict(m["key_schema"]), "__k"):
            def key_fn(t, cache, mask_fn=mask_fn):
                keys, _i, _c, _v, parents = _map_parts(t, col, cache)
                bad = mask_fn(pa.table({"__k": keys}))
                idx = np.flatnonzero(bad)
                return parents[idx], key_strings(keys, idx)

            rules.append(MapRule(rid, col, msg, guard(key_fn)))

    # per-row property-count bounds (row-level span: the map cell)
    for bkey, rid, cmp_, msg in [
        ("min_properties", R.NOT_ENOUGH_PROPERTIES, np.less, None),
        ("max_properties", R.TOO_MANY_PROPERTIES, np.greater, None),
    ]:
        if m.get(bkey) is None:
            continue
        bound = int(m[bkey])
        msg = (f"the object must have at least {bound} properties"
               if bkey == "min_properties"
               else f"the object cannot have more than {bound} properties")

        def cnt_fn(t, cache, bound=bound, cmp_=cmp_):
            _k, _i, counts, valid, _p = _map_parts(t, col, cache)
            rows = np.flatnonzero(valid & cmp_(counts, bound))
            return rows, [None] * len(rows)

        rules.append(MapRule(rid, col, msg, guard(cnt_fn)))

    # per-row required keys
    for rk in m.get("required_keys") or []:
        def req_fn(t, cache, rk=rk):
            keys, _i, _c, valid, parents = _map_parts(t, col, cache)
            ks = pc.cast(keys, pa.string())
            has = np.zeros(t.num_rows, dtype=bool)
            hit = parents[np.flatnonzero(_np_bool(pc.equal(ks, rk)))]
            has[hit] = True
            rows = np.flatnonzero(valid & ~has)
            return rows, [None] * len(rows)

        rules.append(MapRule(R.REQUIRED_PROPERTY, col,
                             E.msg_required_property(rk), guard(req_fn)))

    # value-schema dispatch
    exact = tuple((m.get("values") or {}).keys())
    pats = tuple((m.get("pattern_values") or {}).keys())
    have_dispatch = exact or pats or m.get("additional") is not None

    def value_rules(node: dict, sel_key):
        for rid, msg, mask_fn in _leaf_violation_masks(dict(node), "__v"):
            def val_fn(t, cache, mask_fn=mask_fn, sel_key=sel_key):
                keys, items, _c, _v, parents = _map_parts(t, col, cache)
                sel = _map_dispatch(t, col, cache, exact, pats)[sel_key]
                bad = mask_fn(pa.table({"__v": items})) & sel
                idx = np.flatnonzero(bad)
                return parents[idx], key_strings(keys, idx)

            rules.append(MapRule(rid, col, msg, guard(val_fn)))

    for k, node in (m.get("values") or {}).items():
        value_rules(node, ("exact", k))
    for p, node in (m.get("pattern_values") or {}).items():
        value_rules(node, ("pattern", p))
    add = m.get("additional")
    if add is False:
        def unk_fn(t, cache):
            keys, _i, _c, _v, parents = _map_parts(t, col, cache)
            sel = _map_dispatch(t, col, cache, exact, pats)["unmatched"]
            idx = np.flatnonzero(sel)
            return parents[idx], key_strings(keys, idx)

        rules.append(MapRule(R.UNKNOWN_PROPERTY, col,
                             E.msg_unknown_property(), guard(unk_fn)))
    elif isinstance(add, dict):
        value_rules(add, "unmatched")

    return rules


def _build_column_rules(c) -> tuple[list[RowRule], list[ElementRule]]:
    """All ROW-LEVEL rules one ColumnSpec generates (K1/K3-K13, S1-S6,
    C1-C5, D6 custom).  Shared by the main column loop and the M8
    tagged-dispatch variant compiler (which gates the result on the
    discriminant)."""
    row_rules: list[RowRule] = []
    element_rules: list[ElementRule] = []

    # K1 `false` schema (not_bool_schema, macros.rs:6-24): nothing is
    # ever valid here — every row of the column violates
    if getattr(c, "never", False):
        row_rules.append(RowRule(
            R.NEVER, c.name, c.name, E.msg_never(),
            lambda t, name=c.name: np.ones(t.num_rows, dtype=bool)))

    # scalar + list-length constraints via the shared leaf expansion
    leaf = {
        k: getattr(c, k)
        for k in ("non_null", "enum", "minimum", "maximum", "exclusive_minimum",
                  "exclusive_maximum", "multiple_of", "pattern", "min_length",
                  "max_length", "min_items", "max_items")
        if getattr(c, k) is not None and getattr(c, k) is not False
    }
    for rid, msg, mask_fn in _leaf_violation_masks(leaf, c.name):
        row_rules.append(RowRule(rid, c.name, c.name, msg, mask_fn))

    # cross-field: len(list) == other column (the n_tok consistency
    # check; generalizes S5/S6 from constants to a column)
    if c.len_equals is not None:
        other = c.len_equals

        def len_eq_mask(t: pa.Table, name=c.name, other=other) -> np.ndarray:
            if not _has_col(t, name) or not _has_col(t, other):
                return _zeros(t)
            ln = _list_lengths(_col(t, name))
            ov = _f64(_col(t, other))
            with np.errstate(invalid="ignore"):
                return (ln >= 0) & ~np.isnan(ov) & (ln != ov)

        row_rules.append(
            RowRule(R.LEN_EQUALS_COLUMN, c.name, c.name,
                    f'the array length must equal column "{other}"', len_eq_mask))

    # cross-field value comparison against another column (generalizes
    # K5-K8 constant bounds, macros.rs:261-315, to a column rhs).
    # NULL/NaN on either side never trips — bounds-kernel parity.
    if getattr(c, "compare", None):
        cmp_ops = {"lt": (pc.less, "<"), "le": (pc.less_equal, "<="),
                   "gt": (pc.greater, ">"), "ge": (pc.greater_equal, ">="),
                   "eq": (pc.equal, "=="), "ne": (pc.not_equal, "!=")}
        for cmp in c.compare:
            other_col, op = cmp["column"], cmp["op"]
            fn, sym = cmp_ops[op]

            def cmp_mask(t: pa.Table, name=c.name, other=other_col,
                         fn=fn) -> np.ndarray:
                if not _has_col(t, name) or not _has_col(t, other):
                    return _zeros(t)
                a, b = _col(t, name), _col(t, other)
                try:
                    ok = fn(a, b)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                        pa.ArrowTypeError):
                    # incomparable dtypes: the schema check's business,
                    # not a per-row violation
                    return _zeros(t)
                bad = (~_np_bool(ok) & _np_bool(pc.is_valid(a))
                       & _np_bool(pc.is_valid(b)))
                for side in (a, b):
                    if pa.types.is_floating(side.type):
                        with np.errstate(invalid="ignore"):
                            bad &= ~np.isnan(_f64(side))
                return bad

            row_rules.append(
                RowRule(R.COLUMN_COMPARISON, c.name, c.name,
                        E.msg_column_comparison(sym, other_col), cmp_mask))

    cr = _contains_rule(c)
    if cr is not None:
        row_rules.append(cr)
    element_rules.extend(_element_rules(c))

    for chk in c.checks:
        row_rules.extend(compile_pred(chk, c.name))

    # D6 custom registered rules
    if getattr(c, "custom", None):
        from .extend import build_custom_rules

        row_rules.extend(build_custom_rules(c))

    return row_rules, element_rules


def _tag_gate(tag_column: str, value) -> MaskFn:
    """Row mask: discriminant column == this variant's tag.  Null or
    unknown tags match NO variant — everything under them is accepted,
    the reference's tagged_allow permissiveness (schema.rs:658;
    short-circuits at schema.rs:685-687 etc.)."""
    def gate(t: pa.Table) -> np.ndarray:
        if not _has_col(t, tag_column):
            return _zeros(t)
        return _np_bool(pc.equal(_col(t, tag_column), value))

    return gate


def compile_tagged(tagged: list) -> tuple[list[RowRule], list[ElementRule]]:
    """M8 external-tag dispatch (schema.rs:614-660): each entry is
    ``{tag: column, variants: {tag_value: {columns: {...}}}}``.  A
    variant's column rule-set applies only to rows whose discriminant
    equals the variant's tag; rows with unknown/null tags pass every
    variant untouched."""
    from .spec import ColumnSpec, expand_all_columns

    row_rules: list[RowRule] = []
    element_rules: list[ElementRule] = []
    known = set(ColumnSpec.__dataclass_fields__)
    for entry in tagged or []:
        tag_col = entry["tag"]
        for value, vspec in entry.get("variants", {}).items():
            gate = _tag_gate(tag_col, value)
            vcols = []
            for name, cdict in (vspec.get("columns") or {}).items():
                cdict = {k: v for k, v in dict(cdict).items() if k in known}
                cdict.pop("name", None)
                vcols.append(ColumnSpec(name=name, **cdict))
            for c in expand_all_columns(vcols):
                rr, er = _build_column_rules(c)
                for r in rr:
                    row_rules.append(RowRule(
                        r.rule_id, r.column, r.span, r.message,
                        (lambda t, f=r.mask_fn, g=gate: f(t) & g(t)),
                        message_fn=r.message_fn))
                for e in er:
                    def gated_elem(t: pa.Table, cache: dict, f=e.fn, g=gate):
                        res = f(t, cache)
                        rows = res[0]
                        if len(rows) == 0:
                            return res
                        keep = g(t)[rows]
                        return tuple(a[keep] for a in res)

                    element_rules.append(ElementRule(
                        e.rule_id, e.column, e.message, gated_elem))
    return row_rules, element_rules


def compile_plan(spec, span_format=None) -> CompiledPlan:
    from .spec import expand_all_columns, parse_dtype

    row_rules: list[RowRule] = []
    element_rules: list[ElementRule] = []
    expected: dict[str, pa.DataType] = {}
    required: list[str] = []
    nonnull_required: list[str] = []
    unique_cols: list[str] = []
    ref_checks: list[RefCheck] = []
    struct_specs: dict[str, dict] = {}
    map_rules: list[MapRule] = []
    map_columns: list[str] = []

    # M1 struct recursion (schema.rs:900-912): expand ``fields`` trees
    # into dotted-path child columns; every kernel below then works on
    # nested paths exactly as on flat columns (via the path-aware _col)
    cols = expand_all_columns(spec.columns)
    for c in cols:
        if c.fields:
            struct_specs[c.name] = {
                "strict": not getattr(c, "allow_unknown_fields", True),
                "declared": list(c.fields.keys()),
            }

    for c in cols:
        if c.dtype is not None:
            expected[c.name] = parse_dtype(c.dtype)
        if c.element_dtype is not None and c.dtype is None:
            expected[c.name] = pa.list_(parse_dtype(c.element_dtype))
        if c.required:
            required.append(c.name)
        if c.non_null:
            nonnull_required.append(c.name)

        rr, er = _build_column_rules(c)
        row_rules.extend(rr)
        element_rules.extend(er)
        if getattr(c, "map", None):
            map_rules.extend(_build_map_rules(c))
            map_columns.append(c.name)

        if c.unique:
            unique_cols.append(c.name)
        if c.ref is not None:
            ref_checks.append(RefCheck(column=c.name, manifest=c.ref))
        if getattr(c, "ref_bound", None):
            rb = c.ref_bound
            ref_checks.append(RefCheck(
                column=c.name, manifest=rb["manifest"], key=rb["key"],
                bound_column=rb["bound_column"], op=rb.get("op", "le")))

    # M8 tagged-union dispatch (schema.rs:614-660)
    tagged = getattr(spec, "tagged", None)
    if tagged:
        rr, er = compile_tagged(tagged)
        row_rules.extend(rr)
        element_rules.extend(er)

    # the read-time projection: every column any rule touches; nested
    # paths project their ROOT column (Parquet readers prune at the
    # top-level column granularity)
    referenced: set[str] = {spec.key}
    for c in cols:
        referenced.add(c.name)
        if c.len_equals:
            referenced.add(c.len_equals)
        for cmp in (getattr(c, "compare", None) or []):
            referenced.add(cmp["column"])
        for chk in c.checks:
            _collect_pred_columns(chk, c.name, referenced)
    for entry in tagged or []:
        referenced.add(entry["tag"])
        for vspec in entry.get("variants", {}).values():
            for name, cdict in (vspec.get("columns") or {}).items():
                referenced.add(name)
                for chk in (cdict.get("checks") or []):
                    _collect_pred_columns(chk, name, referenced)
    referenced = {n.split(".")[0] for n in referenced}
    if spec.drift is not None:
        referenced.add(spec.drift.group_by)
        referenced.add(spec.drift.column)
        if spec.drift.token_column:
            referenced.add(spec.drift.token_column)
    for rc in ref_checks:
        if rc.key:
            referenced.add(rc.key)

    # pattern_columns: constraints applied to every column matching the
    # regex at compile time against *declared* columns; undeclared matches
    # are resolved at read time in schema_violations (names are fixed).
    return CompiledPlan(
        spec=spec,
        key=spec.key,
        row_rules=row_rules,
        element_rules=element_rules,
        expected_dtypes=expected,
        required_columns=required,
        nonnull_required_columns=nonnull_required,
        unique_columns=unique_cols,
        ref_checks=ref_checks,
        drift=spec.drift,
        allow_unknown_columns=spec.allow_unknown_columns,
        min_columns=spec.min_columns,
        max_columns=spec.max_columns,
        pattern_columns=dict(spec.pattern_columns),
        referenced_columns=sorted(referenced),
        span_format=span_format,
        column_name_pattern=getattr(spec, "column_name_pattern", None),
        struct_specs=struct_specs,
        map_rules=map_rules,
        map_columns=map_columns,
    )


def _collect_pred_columns(node, default_column: str, out: set[str]) -> None:
    from .spec import _PRED_LEAF_KEYS  # single source of truth

    if not isinstance(node, dict):
        return
    if set(node) & _PRED_LEAF_KEYS:
        out.add(node.get("column", default_column))
    for k in ("all_of", "any_of", "one_of"):
        for sub in node.get(k, []) or []:
            _collect_pred_columns(sub, default_column, out)
    for k in ("not", "if", "then", "else"):
        if k in node:
            _collect_pred_columns(node[k], default_column, out)
