"""Per-group user-defined transforms at exchange cost — the public
UDF surface mirroring the reference's seq/map sub-protocol extension
point (verify: custom rules over sequences/maps) for whole-GROUP
computations that don't decompose into mergeable partials (medians,
MADs, order statistics of derived values, per-group model fits).

``ray.data.Dataset.groupby().map_groups`` is the stock answer but
pays the sort-based groupby's fixed cost (CLAUDE.md); this runs on
the repo's sort-free hash exchange: whole groups co-locate in one
bucket task, a single lexsort splits the bucket into group slices,
and the UDF runs once per group slice.

Partitioning assumption (SURVEY §2.6): one group's rows must fit a
merge task — use mergeable partials (``grouped_stats`` /
``stats_state``) when they exist; this surface is for the semantics
that genuinely need the whole group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le
from ..kernels import as_array
from ..stages.exchange import grouped_exchange_ds

_SEP = "\x1f"


def grouped_apply(ds, group_cols: list[str], fn, out_schema: pa.Schema,
                  num_buckets: int = 64):
    """Run ``fn(key: tuple, group: pa.Table) -> pa.Table | None`` once
    per distinct ``group_cols`` tuple, with the group's FULL row set
    (original column types, exchange plumbing stripped).  ``key`` is
    the tuple of the group's (string-cast) key values.  Returned
    tables must match ``out_schema``; ``None`` drops the group.
    Rows with a null in any group column are dropped (SQL GROUP BY
    refuses the sentinel ambiguity — grouped-operator policy).

    Results stay in the object store as a Dataset.
    """
    value_cols = [c for c in ds.schema().names]

    def tag(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b[group_cols[0]])
        for g in group_cols[1:]:
            mask = pc.and_(mask, pc.is_valid(b[g]))
        b = b.filter(mask)
        key = pc.cast(as_array(b[group_cols[0]]), pa.string())
        for g in group_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(as_array(b[g]), pa.string()), _SEP)
        cols = {"__b": pa.array(md5_u64le(key), type=pa.uint64()),
                "__g": key}
        for c in value_cols:
            cols[c] = b[c]
        return pa.table(cols)

    def run_groups(t: pa.Table) -> pa.Table:
        gkey = t.column("__g").to_numpy(zero_copy_only=False)
        order = np.argsort(gkey, kind="stable")
        gs = gkey[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(new)
        bounds = np.append(starts, len(gs))
        body = t.select(value_cols).take(pa.array(order))
        outs = []
        for i, s in enumerate(starts):
            e = bounds[i + 1]
            key = tuple(gs[s].split(_SEP))
            res = fn(key, body.slice(s, e - s))
            if res is not None and res.num_rows:
                outs.append(res.cast(out_schema))
        if not outs:
            return None
        return pa.concat_tables(outs)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, run_groups,
                               empty_schema=out_schema)


def grouped_mad(ds, group_col: str, value_col: str,
                num_buckets: int = 64):
    """Per-group MEDIAN and MAD (median absolute deviation) with exact
    integer order statistics — the robust outlier-scale statistic
    (quality-score spread per language) that does NOT decompose into
    mergeable partials, hence a ``grouped_apply`` member.  Median
    follows DuckDB ``quantile_disc`` (value at 0-based sorted index
    ``max(0, ceil(n/2) − 1)``), MAD is the same statistic of
    ``|x − median|`` — both are data values, so everything stays
    int64 and the oracle hash-matches.  Null values drop (SQL
    aggregate parity).  Output: ``group_col, n, median, mad``.
    """
    gtype = dict(zip(ds.schema().names, ds.schema().types))[group_col]
    out_schema = pa.schema([(group_col, gtype), ("n", pa.int64()),
                            ("median", pa.int64()), ("mad", pa.int64())])

    def _disc_median(sorted_vals: np.ndarray) -> int:
        n = len(sorted_vals)
        return int(sorted_vals[max(0, -(-n // 2) - 1)])  # ceil(n/2)-1

    def mad_fn(key: tuple, g: pa.Table) -> pa.Table:
        v = pc.cast(as_array(g[value_col]), pa.int64())
        v = v.drop_null().to_numpy(zero_copy_only=False)
        if not len(v):
            return None
        v = np.sort(v)
        med = _disc_median(v)
        dev = np.sort(np.abs(v - med))
        gval = as_array(g[group_col]).slice(0, 1)
        return pa.table({group_col: gval,
                         "n": pa.array([len(v)], type=pa.int64()),
                         "median": pa.array([med], type=pa.int64()),
                         "mad": pa.array([_disc_median(dev)],
                                         type=pa.int64())})

    return grouped_apply(ds.select_columns([group_col, value_col]),
                         [group_col], mad_fn, out_schema, num_buckets)
