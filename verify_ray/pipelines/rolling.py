"""Per-row sliding-window aggregates over event time — for every row,
count/sum over the same key's rows in ``[ts - span, ts]`` (the SQL
``RANGE BETWEEN <span> PRECEDING AND CURRENT ROW`` frame, peers of an
equal timestamp included) — rate counters, rolling exposure, velocity
features.

Complements the fixed-grid windows in ``analytics``
(tumbling/hopping): those bucket rows into shared windows; this
evaluates one window PER ROW, which no groupby can express.

Distributed shape: one hash exchange on the key (all of a key's rows
meet in one bucket), then per bucket ONE lexsort by (key, ts) and two
:func:`joins.rank_into` merged-rank passes give every row's window
bounds [lo, hi); counts are ``hi - lo`` and sums come off a padded
prefix-sum — O(n log n) per bucket, no per-row or per-key Python.

Sum columns must be integers: float sums are order-dependent at the
last ULP, which breaks cross-engine oracle equality (CLAUDE.md
integer-oracle policy).  Null keys form their own group, matching SQL
window ``PARTITION BY`` semantics (NULLs are one partition — unlike
join keys, which never match).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .joins import _key_arrays, _ts_i64, rank_into


def rolling_window_agg(ds, key: str, ts: str, span_us: int,
                       sum_cols: list[str] | None = None,
                       distinct_cols: list[str] | None = None,
                       max_card: int = 64,
                       num_buckets: int = 64):
    """Input columns + ``w_count`` (+ ``w_sum_<col>`` per sum_col,
    ``w_distinct_<col>`` per distinct_col), each computed over the
    row's trailing ``span_us`` window within its key.

    ``distinct_cols`` = per-row ``COUNT(DISTINCT col) OVER`` the same
    RANGE frame (NULL elements skipped, SQL semantics) — behavioral
    variety features ("distinct event types this user touched in the
    last hour").  Computed with one prefix-sum pass PER CATEGORY
    VALUE, so the column must be SMALL-CARDINALITY (event types,
    langs, status codes); a merge task seeing more than ``max_card``
    distinct values raises rather than silently paying O(card × n).
    """
    from ..stages.exchange import grouped_exchange_ds

    sum_cols = list(sum_cols or [])
    distinct_cols = list(distinct_cols or [])
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    in_cols = list(schema.names)
    for c in sum_cols:
        if not pa.types.is_integer(types[c]):
            raise ValueError(f"sum column {c} must be integer "
                             "(float sums break oracle equality)")

    def tag(b: pa.Table) -> pa.Table:
        _, bk = _key_arrays(b[key])
        cols = {"__b": pa.array(bk, type=pa.uint64()),
                "__ts": _ts_i64(b[ts])}
        for c in in_cols:
            cols[c] = b[c]
        return pa.table(cols)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    out_schema = pa.schema(
        [(c, types[c]) for c in in_cols]
        + [("w_count", pa.int64())]
        + [(f"w_sum_{c}", pa.int64()) for c in sum_cols]
        + [(f"w_distinct_{c}", pa.int64()) for c in distinct_cols])

    def merge(t: pa.Table) -> pa.Table:
        n = t.num_rows
        karr = t.column(key)
        null_k = pc.is_null(karr).to_numpy(zero_copy_only=False)
        if null_k.any():
            fill = 0 if pa.types.is_integer(karr.type) else ""
            kv = pc.fill_null(pc.cast(
                karr, pa.int64() if pa.types.is_integer(karr.type)
                else pa.string()), fill).to_numpy(zero_copy_only=False)
        else:
            kv = karr.to_numpy(zero_copy_only=False)
        _, codes = np.unique(kv, return_inverse=True)
        if null_k.any():  # SQL: NULLs are one window partition
            codes = np.where(null_k, codes.max() + 1, codes)
        tsv = pc.fill_null(t.column("__ts"), np.int64(0)).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((tsv, codes))
        sc, st = codes[order], tsv[order]
        hi = rank_into(sc, st, sc, st, queries_first=False)
        lo = rank_into(sc, st, sc, st - span_us, queries_first=True)
        cols = {c: t.column(c) for c in in_cols}
        cnt = np.empty(n, dtype=np.int64)
        cnt[order] = hi - lo
        cols["w_count"] = pa.array(cnt)
        for c in sum_cols:
            v = pc.fill_null(t.column(c), np.int64(0)).to_numpy(
                zero_copy_only=False).astype(np.int64)
            ps = np.concatenate([[0], np.cumsum(v[order])])
            s = np.empty(n, dtype=np.int64)
            s[order] = ps[hi] - ps[lo]
            cols[f"w_sum_{c}"] = pa.array(s)
        for c in distinct_cols:
            darr = t.column(c)
            dnull = pc.is_null(darr).to_numpy(zero_copy_only=False)
            dstr = pc.fill_null(pc.cast(darr, pa.string()), "") \
                .to_numpy(zero_copy_only=False)
            valid_sorted = ~dnull[order]
            vals_sorted = dstr[order]
            # categories over VALID values only — the null fill ("")
            # must neither count toward max_card nor collide with a
            # genuine empty-string category
            cats, cinv_valid = np.unique(vals_sorted[valid_sorted],
                                         return_inverse=True)
            if len(cats) > max_card:
                raise ValueError(
                    f"rolling distinct column {c!r} has {len(cats)} "
                    f"distinct values in one task (max_card="
                    f"{max_card}) — use a sketch or raise max_card")
            cinv = np.full(n, -1, dtype=np.int64)  # -1 = null sentinel
            cinv[valid_sorted] = cinv_valid
            dist_sorted = np.zeros(n, dtype=np.int64)
            for ci in range(len(cats)):
                ind = (cinv == ci).astype(np.int64)
                ps = np.concatenate([[0], np.cumsum(ind)])
                dist_sorted += (ps[hi] - ps[lo] > 0)
            d = np.empty(n, dtype=np.int64)
            d[order] = dist_sorted
            cols[f"w_distinct_{c}"] = pa.array(d)
        return pa.table(cols).cast(out_schema)

    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def keyed_scan(ds, key: str, ts: str, id_col: str, value_col: str,
               num_buckets: int = 64):
    """Ordered per-key sequential scan — for every row, the gap to the
    key's PREVIOUS event (SQL ``ts - LAG(ts) OVER (PARTITION BY key
    ORDER BY ts, id)``; null for the key's first row) and the running
    total of ``value_col`` up to and including the row (``SUM(value)
    OVER`` the same window).  The feature-engineering staple behind
    inter-arrival-time features, cumulative exposure, and per-entity
    counters.

    Complements ``rolling_window_agg`` (bounded trailing RANGE frame):
    this is the UNBOUNDED-preceding / adjacent-row class, resolved per
    key with one lexsort + one cumsum — the reset-at-key-boundary
    running sum is the global cumsum minus each key's starting offset
    (no per-key loop).

    ``value_col`` must be integer (the repo's integer-oracle policy:
    float running sums are order-dependent at the last ULP); a NULL
    value contributes 0 to the running sum but the row KEEPS its place
    in the order (SQL's SUM skips nulls — the one divergence is an
    all-null prefix, where SQL yields NULL and this yields 0,
    documented rather than emulated).  The (ts, id) order must be
    unique per key — ``id_col`` a unique id — so SQL's default RANGE
    frame equals the ROWS frame and the oracle needs no frame clause.
    Rows with a null key, ts, or id drop.  Integer OR string keys
    (string keys bucket by md5 like ``rolling_window_agg``).

    Shuffle carries (key, ts µs, id, value) only; one hash exchange,
    results stay in the object store.
    """
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    ktype = dict(zip(schema.names, schema.types))[key]
    int_key = (pa.types.is_integer(ktype)
               or pa.types.is_timestamp(ktype))
    out_schema = pa.schema([
        ("id", pa.int64()),
        ("key", pa.int64() if int_key else pa.string()),
        ("gap_us", pa.int64()), ("run_sum", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b[key])
        for c in (ts, id_col):
            mask = pc.and_(mask, pc.is_valid(b[c]))
        t = b.filter(mask)
        karr, bk = _key_arrays(t[key])
        return pa.table({
            "__b": pa.array((bk % np.uint64(num_buckets))
                            .astype(np.int64)),
            "k": karr,
            "t": _ts_i64(t[ts]),
            "i": pc.cast(t[id_col], pa.int64()),
            "v": pc.fill_null(pc.cast(t[value_col], pa.int64()), 0)})

    def scan(tb: pa.Table) -> pa.Table:
        k = tb.column("k").to_numpy(zero_copy_only=False)
        t = tb.column("t").to_numpy(zero_copy_only=False)
        i = tb.column("i").to_numpy(zero_copy_only=False)
        v = tb.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        ks, ts_, is_, vs = k[order], t[order], i[order], v[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        # gap to previous row of the same key; first row of a key: null
        gap = np.empty(len(ts_), dtype=np.int64)
        gap[1:] = ts_[1:] - ts_[:-1]
        gap[0] = 0
        gap_valid = ~new
        # running sum resets at key boundaries: global cumsum minus
        # the key's starting offset (boundary-repeat, no per-key loop)
        cum = np.cumsum(vs)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(ks)))
        base = np.repeat(cum[starts] - vs[starts], counts)
        run = cum - base
        gap_arr = pc.if_else(pa.array(gap_valid),
                             pa.array(gap, type=pa.int64()),
                             pa.scalar(None, pa.int64()))
        return pa.table({
            "id": pa.array(is_),
            "key": pa.array(ks, type=out_schema.field("key").type),
            "gap_us": gap_arr,
            "run_sum": pa.array(run)})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, scan,
                               empty_schema=out_schema)
