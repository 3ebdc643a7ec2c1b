"""W2 — referential checks against a broadcast manifest.

Scale-up of the reference's enum-membership + ``$ref`` dictionary
lookup (/root/reference/verify/src/impls/schemars/macros.rs:212-240,
schema.rs:124-150): every value of a column must exist in a small
manifest table (anti-join semantics: non-matches are violations).

The manifest is the SMALL side, so there is no shuffle and no second
pass over the data: the check compiles into an extra vectorized
RowRule (``pc.is_in`` per batch) that runs inside the single narrow
validation pass.  Large manifests are broadcast via ``ray.put`` once
and fetched from the local object store inside each task; small ones
ride the task closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..errors import R
from ..kernels import as_array, RowRule, _np_bool

# manifests up to this many keys are embedded in the task closure;
# larger ones go through ray.put broadcast
EMBED_MAX_KEYS = 100_000


def manifest_key_array(manifest, key_column: str | None = None) -> pa.Array:
    """Normalize a manifest (pa.Table / pandas / list / set) into the
    Arrow array of its keys."""
    if isinstance(manifest, pa.Table):
        col = manifest.column(key_column or manifest.column_names[0])
        return as_array(col)
    if hasattr(manifest, "to_numpy") and hasattr(manifest, "columns"):  # pandas
        return pa.array(manifest[key_column or manifest.columns[0]])
    return pa.array(sorted(manifest))


def make_ref_rule(column: str, manifest, manifest_name: str,
                  broadcast: bool = True) -> RowRule:
    """Build the referential RowRule for one column.

    ``manifest`` may be a pa.Table / pandas DF / iterable of keys, or an
    already-created ``ray.ObjectRef`` to a key array.
    """
    import ray

    keys_or_ref = manifest
    if not isinstance(manifest, ray.ObjectRef):
        keys = manifest_key_array(manifest)
        if broadcast and len(keys) > EMBED_MAX_KEYS and ray.is_initialized():
            keys_or_ref = ray.put(keys)
        else:
            keys_or_ref = keys

    def mask(t: pa.Table) -> np.ndarray:
        if column not in t.column_names:
            return np.zeros(t.num_rows, dtype=bool)
        keys = keys_or_ref
        if isinstance(keys, ray.ObjectRef):
            keys = ray.get(keys)  # local object-store hit after first fetch
        col = t.column(column)
        col = as_array(col)
        if not col.type.equals(keys.type):
            try:
                col = pc.cast(col, keys.type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                # the column cannot be compared to the manifest keys at
                # all — no value can match, so every non-null value is
                # missing (silent pass would hide a schema mismatch)
                return _np_bool(pc.is_valid(col))
        missing = pc.and_(pc.invert(pc.is_in(col, value_set=keys)), pc.is_valid(col))
        return _np_bool(missing)

    return RowRule(
        rule_id=R.REF_MISSING,
        column=column,
        span=column,
        message=f'value not found in manifest "{manifest_name}"',
        mask_fn=mask,
    )


def rule_for_ref_check(rc, manifests: dict) -> RowRule:
    """Dispatch a compiled RefCheck to its rule: membership (ref) or
    per-group bound (ref_bound)."""
    if rc.manifest not in (manifests or {}):
        raise ValueError(
            f'spec references manifest "{rc.manifest}" for column '
            f'"{rc.column}" but no manifest was supplied')
    m = manifests[rc.manifest]
    if rc.key is None:
        return make_ref_rule(rc.column, m, rc.manifest)
    return make_ref_bound_rule(rc.column, rc.key, m, rc.bound_column,
                               rc.manifest, op=rc.op)


def make_ref_bound_rule(value_column: str, key_column: str, manifest,
                        bound_column: str, manifest_name: str,
                        op: str = "le") -> RowRule:
    """Per-group bound from manifest data (FIXTURES T2 ``max_n_tok``):
    ``row[value_column] <op> manifest[row[key_column]][bound_column]``.

    A join-driven generalisation of the scalar bound kernels: the bound
    varies per key.  The (key → bound) map is broadcast once; per batch
    a vectorized searchsorted resolves each row's bound, then one numpy
    comparison.  Rows whose key is absent from the manifest PASS
    (ref_missing covers those — tagged_allow parity)."""
    import ray

    if isinstance(manifest, pa.Table):
        keys_arr = manifest.column(key_column).to_pylist()
        bounds_arr = manifest.column(bound_column).to_pylist()
    else:  # pandas
        keys_arr = list(manifest[key_column])
        bounds_arr = list(manifest[bound_column])
    # numeric manifest keys match numerically (an int64 manifest must
    # match a float64 data column: 5 == 5.0); everything else matches as
    # strings
    numeric_keys = all(isinstance(k, (int, float)) and not isinstance(k, bool)
                       for k in keys_arr) and len(keys_arr) > 0
    if numeric_keys:
        karr = np.asarray(keys_arr, dtype=np.float64)
    else:
        karr = np.asarray(keys_arr, dtype=object).astype(str)
    order = np.argsort(karr)
    skeys = karr[order]
    sbounds = np.asarray(bounds_arr, dtype=np.float64)[order]
    payload = (skeys, sbounds, numeric_keys)
    ref = ray.put(payload) if ray.is_initialized() and len(skeys) > 10_000 else payload

    cmp = {"le": np.greater, "lt": np.greater_equal,
           "ge": np.less, "gt": np.less_equal}[op]
    word = {"le": "at most", "lt": "less than",
            "ge": "at least", "gt": "more than"}[op]

    def mask(t: pa.Table) -> np.ndarray:
        if value_column not in t.column_names or key_column not in t.column_names:
            return np.zeros(t.num_rows, dtype=bool)
        data = ref
        if isinstance(data, ray.ObjectRef):
            data = ray.get(data)
        k, b, numeric = data
        if len(k) == 0:
            return np.zeros(t.num_rows, dtype=bool)
        keys = as_array(t.column(key_column))
        if numeric:
            try:
                kv = pc.cast(keys, pa.float64()).to_numpy(zero_copy_only=False)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                return np.zeros(t.num_rows, dtype=bool)
        else:
            kv = keys.to_numpy(zero_copy_only=False).astype(str)
        pos = np.clip(np.searchsorted(k, kv), 0, len(k) - 1)
        with np.errstate(invalid="ignore"):
            matched = k[pos] == kv
        bounds = np.where(matched, b[pos], np.nan)
        vals = pc.cast(t.column(value_column), pa.float64())
        v = (as_array(vals)).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            return cmp(v, bounds) & matched & ~np.isnan(v)

    return RowRule(
        rule_id=R.MORE_THAN_EXPECTED if op in ("le", "lt") else R.LESS_THAN_EXPECTED,
        column=value_column,
        span=value_column,
        message=(f'the value is expected to be {word} the per-"{key_column}" '
                 f'bound "{bound_column}" from manifest "{manifest_name}"'),
        mask_fn=mask,
    )
