"""Data repair: per-group null imputation — the ETL cleanup step
between validation (which FINDS the holes) and training (which cannot
eat them).  Fill strategy is computed per group from the column's
non-null values and applied in a streaming second pass.

Strategies (deterministic, SQL-restatable — the repo's integer-oracle
policy):

- ``median`` — lower median over non-null values: the smallest value
  whose cumulative count reaches ``ceil(n/2)`` (exactly restatable
  from the cumulative histogram, never an average of two).
- ``mode``   — most frequent non-null value, ties to the smallest.

Distributed shape: one stats pass reduces to per-(group, value)
counts through the cardinality-guarded ``_merge_partials`` (map-side
combine; driver data bounded by groups × distinct values — the
``value_counts`` contract); fills broadcast once via ``ray.put`` and
the second pass is a pure ``map_batches`` fill (searchsorted lookup,
no shuffle).  Groups with NO non-null value keep their nulls (there
is nothing to assert); null GROUP keys keep their nulls too.

``ds`` must be materialized-or-rescannable (consumed twice: stats
pass + fill pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def group_fill_values(ds, col: str, by: str,
                      strategy: str = "median") -> pd.DataFrame:
    """Per-group fill value (see module docstring).  Returns a
    DataFrame (by, fill) with ``by`` in its string form."""
    from .analytics import _merge_partials

    if strategy not in ("median", "mode"):
        raise ValueError(f"unknown strategy {strategy!r}")

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], pa.string()),
                          "v": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if b.num_rows == 0 or col not in b.column_names:
            return empty
        b = b.filter(pc.and_(pc.is_valid(b[by]),
                             pc.is_valid(b[col])))
        if b.num_rows == 0:
            return empty
        g = pc.cast(b[by], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        v = pc.cast(b[col], pa.int64()).to_numpy(zero_copy_only=False)
        key = np.rec.fromarrays([g, v], names=["g", "v"])
        u, c = np.unique(key, return_counts=True)
        return pa.table({"g": pa.array(u["g"], pa.string()),
                         "v": pa.array(u["v"]),
                         "c": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial,
                           batch_format="pyarrow").materialize()
    counts = _merge_partials(parts, ["g", "v"], {"c": "sum"})
    if not len(counts):
        return pd.DataFrame({by: pd.Series(dtype=object),
                             "fill": pd.Series(dtype="int64")})
    counts = counts.astype({"v": "int64", "c": "int64"})
    rows = []
    for g, grp in counts.groupby("g"):
        grp = grp.sort_values("v")
        if strategy == "median":
            cum = grp.c.cumsum()
            need = (grp.c.sum() + 1) // 2
            fill = int(grp.v.iloc[int((cum >= need).values.argmax())])
        else:  # mode: max count, tie -> smallest value
            best = grp.sort_values(["c", "v"],
                                   ascending=[False, True]).iloc[0]
            fill = int(best.v)
        rows.append((g, fill))
    return pd.DataFrame(rows, columns=[by, "fill"])


def impute_nulls(ds, col: str, by: str, strategy: str = "median"):
    """Fill NULLs of integer column ``col`` with the per-``by``-group
    ``strategy`` value (see module docstring); all other rows pass
    through untouched.  Returns a streaming Dataset with the same
    schema."""
    import ray

    fills = group_fill_values(ds, col, by, strategy)
    gsort = fills[by].to_numpy(dtype=object)
    vsort = fills["fill"].to_numpy(dtype=np.int64)
    order = np.argsort(gsort)
    gsort, vsort = gsort[order], vsort[order]
    ref = ray.put((gsort, vsort))
    col_type = dict(zip(ds.schema().names, ds.schema().types))[col]

    def fill(b: pa.Table) -> pa.Table:
        gs, vs = ray.get(ref)
        isnull = pc.is_null(b[col]).to_numpy(zero_copy_only=False)
        gvalid = pc.is_valid(b[by]).to_numpy(zero_copy_only=False)
        need = isnull & gvalid
        if not need.any() or not len(gs):
            return b
        g = pc.cast(b[by], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        pos = np.searchsorted(gs, g[need])
        pos[pos == len(gs)] = 0
        hit = gs[pos] == g[need]
        # int64 view with nulls as 0 placeholders, then patch fills
        vals = pc.fill_null(pc.cast(b[col], pa.int64()),
                            0).to_numpy(zero_copy_only=False).copy()
        need_idx = np.flatnonzero(need)
        vals[need_idx[hit]] = vsort[pos[hit]]
        # rows that STAY null: original nulls whose group has no fill
        # value, and nulls under a null group key
        still_null = np.zeros(len(g), bool)
        still_null[need_idx[~hit]] = True
        still_null |= isnull & ~gvalid
        newcol = pc.if_else(pa.array(still_null),
                            pa.nulls(len(g), pa.int64()),
                            pa.array(vals.astype(np.int64)))
        return b.set_column(b.column_names.index(col), col,
                            pc.cast(newcol, col_type))

    return ds.map_batches(fill, batch_format="pyarrow")
