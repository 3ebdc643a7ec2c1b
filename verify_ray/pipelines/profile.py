"""Data profiling: per-column statistics and spec inference.

``profile()`` computes per-column stats (count / nulls / min / max /
approx-distinct) in one pass of per-batch partials — the data-side
complement of the validation engine.  ``infer_spec()`` turns a profile
into a ConstraintSpec, the data-driven analogue of the reference's
``schema_for!(Self)`` derive (verify-macros/src/lib.rs:352-389): where
the reference derives the schema from the TYPE, a table engine derives
it from observed data (dtype, observed bounds, low-cardinality enums,
null-ness) for a human to tighten.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import as_array
from ..spec import ColumnSpec, ConstraintSpec

# cap for exact distinct tracking per column per batch; above it the
# column is reported as high-cardinality (distinct = -1 in the profile)
DISTINCT_CAP = 10_000


def _profile_batch(batch: pa.Table) -> pa.Table:
    rows = []
    for name in batch.column_names:
        col = batch.column(name)
        col = as_array(col)
        n = len(col)
        nulls = col.null_count
        vmin = vmax = None
        distinct_vals = None
        t = col.type
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            mm = pc.min_max(col)
            vmin = (None if mm["min"].as_py() is None
                    else float(mm["min"].as_py()))
            vmax = (None if mm["max"].as_py() is None
                    else float(mm["max"].as_py()))
        hll_blob = None
        if (pa.types.is_string(t) or pa.types.is_large_string(t)
                or pa.types.is_integer(t)):
            u = pc.unique(col.drop_null())
            if len(u) <= DISTINCT_CAP:
                distinct_vals = u
            # HLL runs regardless: the scale path when exact overflows
            from ..state.sketches import HyperLogLog

            hll = HyperLogLog()
            hll.add(u.to_numpy(zero_copy_only=False))
            hll_blob = hll.registers.tobytes()
        rows.append({
            "column": name,
            "dtype": str(t),
            "n": n,
            "nulls": nulls,
            "min": vmin,
            "max": vmax,
            "distinct_sample": (
                None if distinct_vals is None
                else pa.ListArray.from_arrays([0, len(distinct_vals)],
                                              distinct_vals.cast(pa.string()))
                      .to_pylist()[0]),
            "hll": hll_blob,
        })
    return pa.Table.from_pylist(rows)


def profile(ds, _collect_distinct: dict | None = None) -> pd.DataFrame:
    """(column, dtype, n, nulls, min, max, n_distinct) per column.

    One map_batches pass emits a tiny partial per (column, batch); the
    merge is driver-side over n_batches × n_columns rows.  n_distinct is
    exact up to DISTINCT_CAP per column, else -1 (use a sketch for
    high-cardinality columns at scale).

    ``_collect_distinct``: pass a dict to ALSO receive each
    non-overflowing column's distinct value set (as strings) — lets
    infer_spec derive enums without a second dataset scan.
    """
    partials = ds.map_batches(_profile_batch, batch_format="pyarrow").to_pandas()
    out = []
    for name, g in partials.groupby("column", sort=True):
        distinct = -1
        if g["distinct_sample"].notna().all():
            uniq = set()
            overflow = False
            for s in g["distinct_sample"]:
                uniq.update(s)
                if len(uniq) > DISTINCT_CAP:
                    overflow = True
                    break
            distinct = -1 if overflow else len(uniq)
            if not overflow and _collect_distinct is not None:
                _collect_distinct[name] = uniq
        approx = None
        blobs = [b for b in g["hll"] if b is not None]
        if blobs:
            from ..state.sketches import HyperLogLog

            hll = HyperLogLog()
            for b in blobs:
                other = HyperLogLog()
                other.registers = np.frombuffer(b, dtype=np.uint8).copy()
                hll.merge(other)
            approx = int(round(hll.estimate()))
        out.append({
            "column": name,
            "dtype": g["dtype"].iloc[0],
            "n": int(g["n"].sum()),
            "nulls": int(g["nulls"].sum()),
            "min": None if g["min"].isna().all() else float(g["min"].min()),
            "max": None if g["max"].isna().all() else float(g["max"].max()),
            "n_distinct": distinct,
            "n_distinct_approx": approx,
        })
    return pd.DataFrame(out).sort_values("column").reset_index(drop=True)


def infer_spec(ds, key: str, enum_max: int = 16,
               table: str = "inferred") -> ConstraintSpec:
    """Build a ConstraintSpec from observed data (derive-from-data).

    dtype from the schema; ``non_null`` where no nulls were observed;
    numeric bounds from observed min/max; ``enum`` for low-cardinality
    string columns (≤ enum_max distinct values).  Intentionally
    conservative — a starting point a human tightens, exactly like a
    derived schema.
    """
    distinct_sets: dict = {}
    prof = profile(ds, _collect_distinct=distinct_sets)
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    cols = []
    for _, r in prof.iterrows():
        t = types[r["column"]]
        c = ColumnSpec(name=r["column"])
        from ..spec import parse_dtype

        c.dtype = str(t) if not pa.types.is_list(t) else f"list<{t.value_type}>"
        try:
            parse_dtype(c.dtype)  # keep only dtype names our spec knows
        except KeyError:
            c.dtype = None
        if r["nulls"] == 0:
            c.non_null = True
        if r["min"] is not None and (pa.types.is_integer(t)
                                     or pa.types.is_floating(t)):
            c.minimum = r["min"]
            c.maximum = r["max"]
        if (0 <= r["n_distinct"] <= enum_max
                and (pa.types.is_string(t) or pa.types.is_large_string(t))):
            # enum values come from the profile pass's own distinct
            # collection — no re-scan of the dataset per enum column
            c.enum = sorted(distinct_sets.get(r["column"], ()))
        cols.append(c)
    return ConstraintSpec(key=key, columns=cols, table=table)


def saturation_audit(ds, cols: list[str]) -> pd.DataFrame:
    """SATURATION / CLIPPING census — "is this column's mass piling
    up against its observed bounds?" (sensor clipping, value caps,
    quantizer saturation and truncated exports all present as
    abnormally many rows AT the min or max): per numeric column, the
    exact global ``min_v / max_v`` plus ``n_at_min / n_at_max`` row
    counts, all integers.  Nulls are excluded per column
    (nullability is ``non_null``'s business).

    Scale shape: one streaming pass; each batch emits per-column
    (batch_min, batch_max, count_at_each, n) partials — columns-
    sized — and the driver merge recomputes the global bounds and
    sums counts only from batches whose local bound EQUALS the
    global one (exact because a batch's count-at-min is reusable iff
    its min is the global min).  Returns one row per column:
    ``(col, n, min_v, max_v, n_at_min, n_at_max, at_min_pm)``.
    """
    def partial(b: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            v = pc.cast(as_array(b[c]), pa.int64()).to_numpy(
                zero_copy_only=False, writable=False)
            valid = pc.is_valid(b[c]).to_numpy(zero_copy_only=False)
            v = v[valid]
            if not len(v):
                continue
            mn, mx = int(v.min()), int(v.max())
            rows.append((c, len(v), mn, mx,
                         int((v == mn).sum()), int((v == mx).sum())))
        if not rows:
            return pa.table({
                "col": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "mn": pa.array([], type=pa.int64()),
                "mx": pa.array([], type=pa.int64()),
                "cmn": pa.array([], type=pa.int64()),
                "cmx": pa.array([], type=pa.int64())})
        return pa.table({
            "col": pa.array([r[0] for r in rows], type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "mn": pa.array([r[2] for r in rows], type=pa.int64()),
            "mx": pa.array([r[3] for r in rows], type=pa.int64()),
            "cmn": pa.array([r[4] for r in rows], type=pa.int64()),
            "cmx": pa.array([r[5] for r in rows], type=pa.int64())})

    parts = (ds.select_columns(cols)
             .map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    out_cols = ["col", "n", "min_v", "max_v", "n_at_min", "n_at_max",
                "at_min_pm"]
    if not len(parts):
        return pd.DataFrame({c: pd.Series(
            dtype="string" if c == "col" else "int64")
            for c in out_cols})
    rows = []
    for c, sub in parts.groupby("col", sort=True):
        n = int(sub.n.sum())
        gmn, gmx = int(sub.mn.min()), int(sub.mx.max())
        n_mn = int(sub.cmn[sub.mn == gmn].sum())
        n_mx = int(sub.cmx[sub.mx == gmx].sum())
        rows.append((c, n, gmn, gmx, n_mn, n_mx,
                     1000 * n_mn // n if n else 0))
    return pd.DataFrame(rows, columns=out_cols)
