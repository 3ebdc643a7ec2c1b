"""Golden-record survivorship: collapse each duplicate cluster to ONE
canonical record by field-wise rules — the record-linkage endgame
(after ``joins.fuzzy_join`` / ``dedup.connected_components`` assign
cluster ids, MDM-style survivorship picks which value of each field
survives; Talburt 2011, "Entity Resolution and Information Quality").

Rules (per output field):

- ``latest`` — the value carried by the cluster's winning row under
  ``(order_col DESC, id_col DESC)`` (SQL ``ROW_NUMBER() = 1``); the
  winning row's value survives even when NULL (it is the freshest
  assertion).
- ``mode``  — most frequent NON-NULL value; ties break to the
  smallest value (deterministic cross-engine rule); all-null → null.
- ``min`` / ``max`` — extremes over non-null values.

Distributed shape: ONE cluster-keyed hash exchange; each bucket task
resolves every rule for its clusters with sorted-run numpy kernels
(lexsort + run-length + reduceat — no per-cluster Python loop, the
house numpy-on-Arrow idiom).  Output is cluster-count-sized and stays
a Dataset.  Null cluster ids drop (they belong to no entity).

Partitioning assumption (SURVEY §2.6): one cluster's rows fit a merge
task — duplicate clusters are small by construction; a pathological
mega-cluster needs upstream capping (``dedup.canonical_filter``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le


def _runs(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(start indices, lengths) of equal-value runs in a sorted
    array."""
    first = np.ones(len(sorted_keys), dtype=bool)
    first[1:] = sorted_keys[1:] != sorted_keys[:-1]
    start = np.flatnonzero(first)
    return start, np.diff(np.append(start, len(sorted_keys)))


def golden_records(ds, cluster_col: str, rules: dict[str, str],
                   order_col: str | None = None,
                   id_col: str | None = None,
                   num_buckets: int = 64):
    """One golden record per cluster (see module docstring).  Returns
    a Dataset with ``cluster_col`` plus one ``{col}_{rule}`` column
    per entry in ``rules``."""
    from ..stages.exchange import grouped_exchange_ds

    if any(r == "latest" for r in rules.values()) and not order_col:
        raise ValueError("rule 'latest' requires order_col")
    for col, rule in rules.items():
        if rule not in ("latest", "mode", "min", "max"):
            raise ValueError(f"unknown rule {rule!r} for {col!r}")

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    need = sorted({cluster_col, *rules}
                  | ({order_col} if order_col else set())
                  | ({id_col} if id_col else set()))
    out_schema = pa.schema(
        [(cluster_col, types[cluster_col])]
        + [(f"{c}_{r}", types[c]) for c, r in rules.items()])

    def tag(b: pa.Table) -> pa.Table:
        b = b.select(need).filter(pc.is_valid(b[cluster_col]))
        key = pc.cast(b[cluster_col], pa.string())
        bk = md5_u64le(key) % np.uint64(num_buckets)
        return b.append_column("__b",
                               pa.array(bk.astype(np.int64)))

    def resolve(t: pa.Table) -> pa.Table:
        cl = pc.cast(t[cluster_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        n = len(cl)
        order = np.argsort(cl, kind="stable")
        cls = cl[order]
        start, cnt = _runs(cls)
        ug = start  # one representative index (into `order`) per cluster
        cols = {cluster_col: t[cluster_col].take(
            pa.array(order[ug]))}
        # winning row per cluster for 'latest': sort by
        # (cluster, order_col, id_col) and take each run's LAST row
        if order_col is not None:
            ov = pc.cast(t[order_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            iv = (pc.cast(t[id_col], pa.int64()).to_numpy(
                zero_copy_only=False) if id_col
                else np.zeros(n, np.int64))
            lx = np.lexsort((iv, ov, cl))
            lstart, lcnt = _runs(cl[lx])
            win = lx[lstart + lcnt - 1]  # aligned with ug clusters
        for col, rule in rules.items():
            if rule == "latest":
                cols[f"{col}_{rule}"] = t[col].take(pa.array(win))
                continue
            v = t[col]
            valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
            vs = pc.cast(v, pa.string()).to_numpy(
                zero_copy_only=False).astype(object)
            sel = np.flatnonzero(valid)
            res_idx = np.full(len(ug), -1, dtype=np.int64)
            if len(sel):
                cl_v, val_v = cl[sel], vs[sel]
                if rule in ("min", "max"):
                    # min: sort (cluster, value) asc, take run firsts;
                    # max: take run lasts.  String order on the cast
                    # form only breaks ties for numeric types via the
                    # numeric path below.
                    if pa.types.is_integer(v.type):
                        num = pc.cast(v, pa.int64()).to_numpy(
                            zero_copy_only=False)[sel]
                        o2 = np.lexsort((num, cl_v))
                    else:
                        o2 = np.lexsort((val_v, cl_v))
                    s2, c2 = _runs(cl_v[o2])
                    pick = o2[s2] if rule == "min" else o2[s2 + c2 - 1]
                    hit_cl = cl_v[o2][s2]
                else:  # mode
                    o2 = np.lexsort((val_v, cl_v))
                    cs, vv = cl_v[o2], val_v[o2]
                    pairs = cs + "\x1f" + vv
                    ps, pcnt = _runs(pairs)
                    run_cl, run_val = cs[ps], vv[ps]
                    o3 = np.lexsort((run_val, -pcnt, run_cl))
                    ms, _ = _runs(run_cl[o3])
                    pick = o2[ps[o3[ms]]]
                    hit_cl = run_cl[o3][ms]
                pos = np.searchsorted(cls[start], hit_cl)
                res_idx[pos] = sel[pick]
            got = res_idx >= 0
            filled = np.where(got, res_idx, 0)
            arr = t[col].take(pa.array(filled))
            if not got.all():
                arr = pc.if_else(pa.array(got), arr,
                                 pa.nulls(len(ug), types[col]))
            cols[f"{col}_{rule}"] = arr
        return pa.table(cols).cast(out_schema)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, resolve,
                               empty_schema=out_schema)
