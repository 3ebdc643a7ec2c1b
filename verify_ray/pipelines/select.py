"""Order-statistic selection without a global sort — the two corpus
operations a quality-filtered training mix needs that naively demand
``ds.sort``:

- ``top_k_by_score``: the exact top-k rows by (score desc, id asc).
  A global sort of 100 TB to keep the best 1% is an all-to-all
  shuffle of everything; instead: (1) a histogram pass reduces the
  corpus to driver-side (score → count) pairs — scores are INTEGERS
  by repo policy, so cardinality is bounded and tiny next to the
  data; (2) the threshold score is read off the descending cumulative
  count; (3) only the one tie score's ids (tie-group-sized) come to
  the driver to resolve the boundary deterministically; (4) one
  streaming filter emits exactly k rows.  Three passes over a NARROW
  (id, score) dataset, zero shuffles.

- ``exact_quantiles``: exact order statistics from the same value
  histogram — quantile q = the smallest value whose cumulative count
  reaches rank ``(q‰ · n + 999) // 1000`` (integer arithmetic on both
  engines; float division would make ceil() flip on last-ULP ties).

Scale assumption (SURVEY §2.6): distinct score/value cardinality must
fit the driver — true for integer heuristic scores (thousands of
distinct values) — and the boundary tie group must fit the driver;
at a pathological tie (every row scores 42) pre-salt the score with a
deterministic id hash instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def value_counts(ds, col: str) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side exact (sorted values, counts) of an integer column:
    per-batch ``np.unique`` partials, combined once on the driver."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u), "c": pa.array(c.astype(np.int64))})

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    allp = pa.concat_tables(parts)
    v = allp.column("v").to_numpy(zero_copy_only=False)
    c = allp.column("c").to_numpy(zero_copy_only=False)
    u, inv = np.unique(v, return_inverse=True)
    tot = np.zeros(len(u), dtype=np.int64)
    np.add.at(tot, inv, c)
    return u, tot


def top_k_by_score(scored_ds, k: int, score_col: str = "score",
                   id_col: str = "doc_id", tie_budget: int = 1_000_000):
    """Exactly ``min(k, n)`` rows of ``scored_ds`` — the top k by
    (score desc, id asc) — as a Dataset, no global sort.

    ``scored_ds`` must be materialized-or-rescannable (it is consumed
    up to three times: histogram, boundary ties, final filter).

    Boundary ties: when fewer than ``tie_budget`` rows share the
    threshold score, their ids come to the driver in one pass; a
    larger tie class (a coarse integer score can put a large fraction
    of the corpus at one value — VERDICT r3 #4) resolves in the hash
    exchange instead: each block pre-caps to its ``need`` smallest
    ids, bucket tasks cap again, and the driver only ever holds
    O(buckets × need) = O(k) ids — the same order as the broadcast
    keep-set it must hold anyway."""
    import ray

    vals, counts = value_counts(scored_ds, score_col)
    if not len(vals):
        return scored_ds
    desc_cum = np.cumsum(counts[::-1])[::-1]  # rows with score >= vals[i]
    qual = np.flatnonzero(desc_cum >= k)
    if not len(qual):  # fewer than k rows total
        return scored_ds
    thr = int(vals[qual[-1]])
    n_above = int(desc_cum[qual[-1]]) - int(counts[qual[-1]])
    need = k - n_above

    keep_ref = None
    if need < int(counts[qual[-1]]):  # boundary tie needs resolving
        if int(counts[qual[-1]]) > tie_budget:
            keep = _tie_smallest_ids_exchange(scored_ds, score_col,
                                              id_col, thr, need)
            keep_ref = ray.put(keep)
        else:
            def ties(b: pa.Table) -> pa.Table:
                s = b.column(score_col).to_numpy(zero_copy_only=False)
                return b.select([id_col]).filter(pa.array(s == thr))

            tie_ids = (scored_ds.map_batches(ties, batch_format="pyarrow")
                       .to_pandas()[id_col].to_numpy())
            keep_ref = ray.put(np.sort(tie_ids)[:need])

    def final(b: pa.Table) -> pa.Table:
        s = b.column(score_col).to_numpy(zero_copy_only=False)
        mask = s > thr
        if keep_ref is not None:
            keep = ray.get(keep_ref)
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            at = s == thr
            if at.any() and len(keep):
                pos = np.searchsorted(keep, ids)
                pos[pos == len(keep)] = 0
                mask = mask | (at & (keep[pos] == ids))
        else:
            mask = mask | (s == thr)
        return b.filter(pa.array(mask))

    return scored_ds.map_batches(final, batch_format="pyarrow")


def _tie_smallest_ids_exchange(scored_ds, score_col: str, id_col: str,
                               thr: int, need: int,
                               num_buckets: int | None = None
                               ) -> np.ndarray:
    """The ``need`` smallest ids among rows with ``score == thr``,
    resolved without materializing the tie class on the driver: every
    block caps its tie rows to its own ``need`` smallest ids (map-side
    cap — a tie-bomb block ships at most ``need`` ids), an id-hash
    exchange caps each bucket to ``need`` again, and the driver merges
    ``buckets × need`` ids (the global smallest ``need`` is a subset
    of the per-bucket smallest ``need``)."""
    import ray
    import pandas as pd

    from ..stages.exchange import grouped_exchange

    B = num_buckets or max(8, int(ray.cluster_resources().get("CPU", 8)))

    def ties_capped(b: pa.Table) -> pa.Table:
        s = b.column(score_col).to_numpy(zero_copy_only=False)
        ids = (b.select([id_col]).filter(pa.array(s == thr))
               .column(id_col).to_numpy(zero_copy_only=False))
        ids = np.sort(ids)[:need]
        hv = pd.util.hash_array(ids) % np.uint64(B)
        return pa.table({"__b": pa.array(hv.astype(np.int64)),
                         id_col: pa.array(ids)})

    def bucket_cap(t: pa.Table) -> pa.Table:
        ids = np.sort(t.column(id_col).to_numpy(zero_copy_only=False))
        return pa.table({id_col: pa.array(ids[:need])})

    res = grouped_exchange(
        scored_ds.map_batches(ties_capped, batch_format="pyarrow"),
        "__b", B, bucket_cap)
    if res is None or res.num_rows == 0:
        return np.array([], dtype=object)
    ids = res.column(id_col).to_numpy(zero_copy_only=False)
    return np.sort(ids)[:need]


def _group_cum_hists(ds, group_col: str, score_col: str):
    """Broadcast handle to ``{group: (sorted scores, strictly-below
    counts, group total)}`` — the shared per-group cumulative histogram
    behind ``grouped_percentile_rank`` and ``percentile_filter``.
    Built from (group, score, count) partials (one lexsort pair-unique
    per batch); driver data is bounded by groups × distinct integer
    scores.  Null group/score rows are excluded."""
    import pyarrow.compute as pc
    import ray

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[score_col])))
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "v": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        g = pc.cast(b[group_col], pa.string()).to_numpy(zero_copy_only=False)
        v = pc.cast(b[score_col], pa.int64()).to_numpy(zero_copy_only=False)
        gu, ginv = np.unique(g.astype(object), return_inverse=True)
        # distinct (group, score) counts via one lexsort (pair-unique)
        order = np.lexsort((v, ginv))
        gs, vs = ginv[order], v[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])
        idx = np.flatnonzero(new)
        cnt = np.diff(np.append(idx, len(gs)))
        return pa.table({"g": pa.array(gu[gs[idx]], type=pa.string()),
                         "v": pa.array(vs[idx]),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    hist: dict = {}
    if len(parts):
        agg = parts.groupby(["g", "v"], as_index=False)["c"].sum()
        for gname, sub in agg.groupby("g"):
            sub = sub.sort_values("v")
            v = sub.v.to_numpy(np.int64)
            c = sub.c.to_numpy(np.int64)
            below = np.concatenate([[0], np.cumsum(c)[:-1]])
            hist[gname] = (v, below, int(c.sum()))
    return ray.put(hist)


def grouped_percentile_rank(ds, group_col: str, score_col: str,
                            id_col: str = "doc_id"):
    """Per-row EXACT within-group percentile position over an integer
    score — the primitive behind per-source quality thresholds ("keep
    the best 30% of each source", the CCNet perplexity-bucket move):
    emits ``(id, group, score, n_less, n_group)`` where ``n_less`` =
    rows in the group with a strictly smaller score (SQL ``RANK() - 1``)
    and ``n_group`` = group size; ``n_less / (n_group - 1)`` is
    percent_rank, kept as integers per repo float policy.  Rows with a
    null group or score are dropped (SQL window/WHERE parity).

    Scale shape: pass 1 reduces the corpus to (group, score, count)
    partials — bounded by groups × distinct integer scores, the same
    driver-cardinality assumption as ``value_counts`` above; the merged
    per-group cumulative histogram is broadcast once via ``ray.put``;
    pass 2 is one streaming ``searchsorted`` per batch.  Zero shuffles.

    ``ds`` must be materialized-or-rescannable (consumed twice — see
    ``percentile_filter``).
    """
    import ray

    hist_ref = _group_cum_hists(ds, group_col, score_col)

    def rank(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = ray.get(hist_ref)
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[score_col])))
        g = pc.cast(b[group_col], pa.string()).to_numpy(zero_copy_only=False)
        v = pc.cast(b[score_col], pa.int64()).to_numpy(zero_copy_only=False)
        n_less = np.zeros(len(v), dtype=np.int64)
        n_group = np.zeros(len(v), dtype=np.int64)
        for gname in np.unique(g.astype(object)):
            vals, below, total = h[gname]
            sel = g == gname
            n_less[sel] = below[np.searchsorted(vals, v[sel])]
            n_group[sel] = total
        return pa.table({
            "doc_id": pc.cast(b[id_col], pa.string()),
            "group": pa.array(g, type=pa.string()),
            "score": pa.array(v),
            "n_less": pa.array(n_less),
            "n_group": pa.array(n_group),
        })

    return ds.map_batches(rank, batch_format="pyarrow")


def percentile_filter(ds, group_col: str, score_col: str,
                      keep_permille: int):
    """Keep each group's BOTTOM ``keep_permille``‰ by score — the
    CCNet per-source threshold move ("keep the 300‰ of every source
    with the lowest perplexity") as a streaming FILTER that passes the
    original rows through.  Strict-rank rule, all-integer:

        keep row ⇔ n_less · 1000 < keep_permille · n_group

    (``n_less`` = strictly-smaller scores in the group, SQL
    ``RANK()-1``), so boundary ties share a fate — the survivor set
    can never depend on engine iteration order.  For "best = highest
    score", negate the score upstream.  Null group/score rows drop.

    Scale shape: the same broadcast per-group cumulative histogram as
    ``grouped_percentile_rank`` (driver data bounded by groups ×
    distinct integer scores), then one streaming searchsorted filter
    pass.  Zero shuffles.

    ``ds`` must be materialized-or-rescannable (it is consumed twice:
    histogram pass + streaming filter pass) — an expensive lazy
    upstream chain re-executes; ``.materialize()`` it first.
    """
    import pyarrow.compute as pc
    import ray

    hist_ref = _group_cum_hists(ds, group_col, score_col)

    def filt(b: pa.Table) -> pa.Table:
        h = ray.get(hist_ref)
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[score_col])))
        if b.num_rows == 0:
            return b
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False)
        v = pc.cast(b[score_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = np.zeros(len(v), dtype=bool)
        for gname in np.unique(g.astype(object)):
            vals, below, total = h[gname]
            sel = g == gname
            n_less = below[np.searchsorted(vals, v[sel])]
            keep[sel] = n_less * 1000 < keep_permille * total
        return b.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def grouped_head(ds, group_cols: list[str], k: int | dict, order_col: str,
                 values: list[str], num_buckets: int = 64):
    """Per-group row cap — keep the FIRST ``k`` rows of every group
    under ``order_col`` ascending (SQL ``ROW_NUMBER() OVER (PARTITION
    BY group ORDER BY order) <= k``).  The web-corpus "domain cap": no
    single domain/source may contribute more than k documents to the
    training mix (the C4/Dolma per-host quota move).

    Distributed shape: one sort-free hash exchange on the combined
    group key; each merge task holds whole groups, ranks them with a
    single ``np.lexsort`` + boundary ``repeat`` pass (no per-group
    loop), and filters to rank < k.  Results stay in the object store.

    Determinism contract: ``order_col`` must be unique within a group
    (an id, a hash) — ties would make the survivor set engine-
    dependent.  Rows with a null group or order column are dropped
    (SQL window/WHERE parity, same policy as grouped_percentile_rank).

    Partitioning assumption (SURVEY §2.6): one group's rows must fit a
    merge task.  That is guaranteed here by a map-side PRE-CAP: each
    input block keeps at most k rows per group before the shuffle
    (the block-local first-k is always a superset of each block's
    contribution to the global first-k), so a merge task holds at most
    ``k × blocks`` rows per group and the shuffle ships at most
    ``k × groups`` rows per block — a hot group cannot flood a bucket.

    ``k`` may be a dict mapping group keys to PER-GROUP caps (the
    mixture-resampling form).  Dict keys are ALWAYS the STRING form
    of the group value — a single int64 group column keys as "7", not
    7; multi-column groups as the "\\x1f"-joined strings (the tag
    stage string-casts every group column).  Groups absent
    from the dict are dropped (cap 0); the map-side pre-cap then uses
    ``max(k.values())`` as its bound, and Python touches only each
    task's UNIQUE group keys for the cap lookup.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in values])

    k_map = None
    if isinstance(k, dict):
        k_map = k
        k_cap = max(k_map.values(), default=0)
    else:
        k_cap = k

    def _first_k(gkey: np.ndarray, oval: np.ndarray,
                 per_group: bool = False) -> np.ndarray:
        """Sorted row indices of each group's first k under order asc
        — one lexsort + boundary-repeat rank pass, no per-group loop.
        The map-side pre-cap always uses the scalar bound ``k_cap``
        (a superset of any per-group cap); the merge pass applies the
        per-group dict when ``per_group``."""
        gu, gc = np.unique(gkey, return_inverse=True)
        order = np.lexsort((oval, gc))
        gs = gc[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        start = np.flatnonzero(new)
        counts = np.diff(np.append(start, len(gs)))
        rank = np.arange(len(gs)) - np.repeat(start, counts)
        if per_group and k_map is not None:
            kvec = np.fromiter((k_map.get(g, 0) for g in gu),
                               dtype=np.int64, count=len(gu))
            return np.sort(order[rank < kvec[gs]])
        return np.sort(order[rank < k_cap])

    def tag(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b[order_col])
        for g in group_cols:
            mask = pc.and_(mask, pc.is_valid(b[g]))
        b = b.filter(mask)
        key = pc.cast(as_array(b[group_cols[0]]), pa.string())
        for g in group_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(as_array(b[g]), pa.string()), "\x1f")
        o = as_array(b[order_col])
        if pa.types.is_timestamp(o.type):
            o = pc.cast(o, pa.timestamp("us"))
        if pa.types.is_integer(o.type) or pa.types.is_timestamp(o.type):
            o = pc.cast(o, pa.int64())
        elif pa.types.is_string(o.type) or pa.types.is_large_string(
                o.type):
            pass  # lexicographic order is the contract for strings
        else:
            # a float (or other) order column cast to string would rank
            # lexicographically ("10.0" < "2.0") and silently keep the
            # wrong rows — refuse instead (repo policy: integer scores)
            raise ValueError(
                f"grouped_head order_col {order_col!r} has unsupported "
                f"type {o.type}; use int, timestamp, or string")
        cols = {"__b": pa.array(md5_u64le(key), type=pa.uint64()),
                "__g": key, "__o": o}
        for c in values:
            cols[c] = b[c]
        t = pa.table(cols)
        if t.num_rows == 0:
            return t
        # map-side pre-cap: the block's first-k per group bounds what
        # leaves this block at k rows per group
        keep = _first_k(key.to_numpy(zero_copy_only=False),
                        o.to_numpy(zero_copy_only=False))
        return t.take(pa.array(keep)) if len(keep) < t.num_rows else t

    def head(t: pa.Table) -> pa.Table:
        keep = _first_k(t.column("__g").to_numpy(zero_copy_only=False),
                        t.column("__o").to_numpy(zero_copy_only=False),
                        per_group=True)
        return t.select(values).take(pa.array(keep))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, head,
                               empty_schema=out_schema)


def grouped_topk(ds, group_cols: list[str], k: int, score_col: str,
                 id_col: str, values: list[str], num_buckets: int = 64):
    """Per-group ORDERED top-k — keep each group's best ``k`` rows by
    (score desc, id asc): SQL ``ROW_NUMBER() OVER (PARTITION BY group
    ORDER BY score DESC, id) <= k``.  The "best N documents per
    language/source" selection move; complements ``grouped_head``
    (first-k under one unique order column — arrival order) and
    ``top_k_by_score`` (global top-k): this one ranks within groups
    under the engine's standard tie rule, so duplicate scores are
    deterministic.

    Distributed shape (same as ``grouped_head``): a map-side PRE-CAP
    keeps at most k rows per group per block (the block-local top-k is
    a superset of the block's contribution to the global top-k), one
    sort-free hash exchange on the combined group key co-locates whole
    groups, and each merge task ranks with a single ``np.lexsort`` +
    boundary-repeat pass.  Shuffle ships ≤ k×groups rows per block; a
    merge task holds ≤ k×blocks rows per group.  Results stay in the
    object store.

    ``score_col`` must be integer (repo float policy); ``id_col``
    unique (the tie-breaker).  Null group/score/id rows drop (SQL
    window/WHERE parity).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in values])

    def _top_k(gkey: np.ndarray, score: np.ndarray,
               ids: np.ndarray) -> np.ndarray:
        gu, gc = np.unique(gkey, return_inverse=True)
        order = np.lexsort((ids, -score, gc))
        gs = gc[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        start = np.flatnonzero(new)
        counts = np.diff(np.append(start, len(gs)))
        rank = np.arange(len(gs)) - np.repeat(start, counts)
        return np.sort(order[rank < k])

    def tag(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(b[score_col]), pc.is_valid(b[id_col]))
        for g in group_cols:
            mask = pc.and_(mask, pc.is_valid(b[g]))
        b = b.filter(mask)
        key = pc.cast(as_array(b[group_cols[0]]), pa.string())
        for g in group_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(as_array(b[g]), pa.string()), "\x1f")
        s = as_array(b[score_col])
        if not pa.types.is_integer(s.type):
            raise ValueError(
                f"grouped_topk score_col {score_col!r} must be integer "
                f"(repo float policy), got {s.type}")
        cols = {"__b": pa.array(md5_u64le(key), type=pa.uint64()),
                "__g": key,
                "__s": pc.cast(s, pa.int64()),
                "__i": as_array(b[id_col])}
        for c in values:
            cols[c] = b[c]
        t = pa.table(cols)
        if t.num_rows == 0:
            return t
        keep = _top_k(key.to_numpy(zero_copy_only=False),
                      cols["__s"].to_numpy(zero_copy_only=False),
                      cols["__i"].to_numpy(zero_copy_only=False))
        return t.take(pa.array(keep)) if len(keep) < t.num_rows else t

    def top(t: pa.Table) -> pa.Table:
        keep = _top_k(t.column("__g").to_numpy(zero_copy_only=False),
                      t.column("__s").to_numpy(zero_copy_only=False),
                      t.column("__i").to_numpy(zero_copy_only=False))
        return t.select(values).take(pa.array(keep))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, top,
                               empty_schema=out_schema)


def exact_quantiles(ds, col: str, qs_permille: list[int]
                    ) -> pa.Table:
    """Exact quantiles of an integer column: ``(q, value)`` rows where
    value = the smallest v with cum_count(≤ v) ≥ (q·n + 999) // 1000."""
    vals, counts = value_counts(ds, col)
    out_q, out_v = [], []
    if len(vals):
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for q in qs_permille:
            rank = (q * n + 999) // 1000
            i = int(np.searchsorted(cum, rank))
            out_q.append(q)
            out_v.append(int(vals[min(i, len(vals) - 1)]))
    return pa.table({"q": pa.array(out_q, type=pa.int64()),
                     "value": pa.array(out_v, type=pa.int64())})


def grouped_sample_k(ds, group_cols: list[str], k: int | dict,
                     key_col: str = "doc_id",
                     values: list[str] | None = None,
                     num_buckets: int = 64):
    """Deterministic per-group k-sample — "k random docs per source"
    with the repo's content-addressed stability guarantees: rows are
    ranked within their group by the md5 priority of their key
    (``md5_number_upper(key)``, ties by key) and the first k survive.
    Because the priority is a pure function of the key, the sample is
    stable across runs/engines/parallelism and NESTED in k (k=5 ⊆
    k=10), and it reuses ``grouped_head``'s exchange + map-side
    pre-cap unchanged — the priority column is just a different order
    key.  SQL parity: ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    md5_number_upper(CAST(key AS VARCHAR))) <= k``.

    Contract: ``key_col`` values must be unique and non-null — null
    keys are dropped (they have no md5 priority; SQL parity filters
    them), and an md5 collision between two keys (~n²/2⁶⁴) would
    tie-break arbitrarily rather than "by key".
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le

    vals = values if values is not None else [key_col] + group_cols

    def add_priority(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key_col]))  # null keys: no priority
        keys = pc.cast(b[key_col], pa.string())
        pri = md5_u64le(keys)
        # order-preserving u64 -> i64 remap (xor the sign bit, then
        # reinterpret) so grouped_head's int64 order column ranks
        # exactly like DuckDB's UBIGINT md5_number_upper order
        as_i64 = (pri ^ np.uint64(1 << 63)).view(np.int64)
        return b.append_column("__pri", pa.array(as_i64))

    tagged = ds.map_batches(add_priority, batch_format="pyarrow")
    return grouped_head(tagged, group_cols, k, order_col="__pri",
                        values=vals, num_buckets=num_buckets)


def latest_by_key(ds, key_cols: list[str], version_col: str,
                  id_col: str, values: list[str],
                  num_buckets: int = 64, post_fn=None,
                  post_schema: pa.Schema | None = None):
    """Latest-record compaction — keep each key's newest row, the
    upsert/CDC-ingest primitive (SQL ``QUALIFY ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY version DESC, id DESC) = 1``): a
    changelog of (key, version, payload) rows compacts to one current
    row per key.  Ties on ``version`` break by the LARGEST ``id``
    (both int64/timestamp), so replays are deterministic.

    Same exchange + map-side pre-cap shape as ``grouped_head`` (each
    input block ships at most ONE row per key, so a hot key cannot
    flood a bucket), but ranked descending on (version, id) — two
    order columns, which grouped_head's single packed order key cannot
    express without overflow.  Null key/version/id rows drop (SQL
    window parity).

    ``post_fn`` (winners table → table, with ``post_schema`` giving
    empty buckets its output type) runs INSIDE each exchange task —
    post-compaction filters/projections (merge_upsert's tombstone
    drop) keep a stable schema this way, where a map_batches after the
    exchange would not (Ray passes empty blocks through uncalled).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in values])

    def _latest(gkey: np.ndarray, ver: np.ndarray,
                ids: np.ndarray) -> np.ndarray:
        """Row indices of each key's (version, id)-max row — one
        lexsort descending via negation, boundary pass, no loop."""
        _, gc = np.unique(gkey, return_inverse=True)
        order = np.lexsort((-ids, -ver, gc))
        gs = gc[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        return np.sort(order[np.flatnonzero(new)])

    def _i64(col) -> pa.Array:
        a = as_array(col)
        if pa.types.is_timestamp(a.type):
            a = pc.cast(a, pa.timestamp("us"))
        return pc.cast(a, pa.int64())

    def tag(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(b[version_col]),
                       pc.is_valid(b[id_col]))
        for g in key_cols:
            mask = pc.and_(mask, pc.is_valid(b[g]))
        b = b.filter(mask)
        key = pc.cast(as_array(b[key_cols[0]]), pa.string())
        for g in key_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(as_array(b[g]), pa.string()), "\x1f")
        cols = {"__b": pa.array(md5_u64le(key), type=pa.uint64()),
                "__g": key, "__v": _i64(b[version_col]),
                "__i": _i64(b[id_col])}
        for c in values:
            cols[c] = b[c]
        t = pa.table(cols)
        if t.num_rows == 0:
            return t
        keep = _latest(key.to_numpy(zero_copy_only=False),
                       t.column("__v").to_numpy(zero_copy_only=False),
                       t.column("__i").to_numpy(zero_copy_only=False))
        return t.take(pa.array(keep)) if len(keep) < t.num_rows else t

    def compact(t: pa.Table) -> pa.Table:
        keep = _latest(t.column("__g").to_numpy(zero_copy_only=False),
                       t.column("__v").to_numpy(zero_copy_only=False),
                       t.column("__i").to_numpy(zero_copy_only=False))
        out = t.select(values).take(pa.array(keep))
        return post_fn(out) if post_fn is not None else out

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, compact,
                               empty_schema=post_schema or out_schema)


def global_rank(ds, score_col: str, id_col: str,
                values: list[str] | None = None,
                num_buckets: int = 64):
    """Exact global ``ROW_NUMBER() OVER (ORDER BY score, id)`` WITHOUT
    a global sort — the "rank the whole corpus" primitive behind
    curriculum ordering (easy-docs-first training), score-ordered
    sharding, and reproducible corpus ordering.  Emits ``values...`` +
    an int64 ``rank`` column (1-based, dense over the surviving rows).

    Two narrow passes instead of an all-to-all sort of everything:

    1. a value-counting pass reduces the corpus to driver-side
       (score → count) pairs (``value_counts`` above); the exclusive
       prefix sum gives every score value its global BASE offset —
       the number of rows with a strictly smaller score;
    2. rows ship only the projected columns through a score-keyed hash
       exchange, so all rows sharing a score value meet in one merge
       task; one ``np.lexsort`` + boundary-repeat pass ranks each
       score class internally by id, and
       ``rank = base[score] + within_rank + 1``.

    Scale assumptions (SURVEY §2.6): distinct-score cardinality fits
    the driver (integer scores by repo policy), and one score class's
    rows fit a merge task — at a pathological tie (half the corpus
    scores 42) pre-salt the score with a deterministic id hash, which
    keeps ranks exact within the salted order.

    Rows with a null score or id are dropped (the SQL oracle filters
    the same rows; SQL's ROW_NUMBER would rank NULLs last — scope
    documented rather than emulated).

    ``ds`` must be materialized-or-rescannable (consumed twice:
    value-count pass + exchange pass) — ``.materialize()`` an
    expensive lazy upstream first.
    """
    import pyarrow.compute as pc
    import ray

    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds

    vals_list = values if values is not None else [id_col, score_col]
    if id_col not in vals_list:
        raise ValueError(
            f"values must include id_col {id_col!r} (the merge tasks "
            f"rank by it)")
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in vals_list]
                           + [("rank", pa.int64())])

    svals, counts = value_counts(
        ds.map_batches(
            lambda b: b.filter(pc.and_(pc.is_valid(b[score_col]),
                                       pc.is_valid(b[id_col]))),
            batch_format="pyarrow"),
        score_col)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]]) \
        if len(svals) else np.empty(0, np.int64)
    base_ref = ray.put((svals, base))

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[score_col]),
                             pc.is_valid(b[id_col])))
        s = pc.cast(as_array(b[score_col]), pa.int64())
        cols = {"__s": s}
        for c in vals_list:
            cols[c] = b[c]
        return pa.table(cols)

    def rank_bucket(t: pa.Table) -> pa.Table:
        sv, bs = ray.get(base_ref)
        s = t.column("__s").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, s))
        ss = s[order]
        new = np.ones(len(ss), dtype=bool)
        new[1:] = ss[1:] != ss[:-1]
        start = np.flatnonzero(new)
        cnt = np.diff(np.append(start, len(ss)))
        within = np.arange(len(ss)) - np.repeat(start, cnt)
        rank = bs[np.searchsorted(sv, ss)] + within + 1
        out = t.select(vals_list).take(pa.array(order))
        return out.append_column("rank", pa.array(rank, type=pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__s", num_buckets, rank_bucket,
                               empty_schema=out_schema,
                               drop_bucket=False)


def grouped_ntile(ds, group_cols: list[str], n_tiles: int,
                  order_col: str, id_col: str, values: list[str],
                  num_buckets: int = 64):
    """Per-group NTILE bucketing — assign every row its equal-height
    tile 1..n within its group under (order asc, id asc): SQL
    ``NTILE(n) OVER (PARTITION BY group ORDER BY order_col, id)``.
    The quantile-bucket labeling move (quality quartiles per language,
    size deciles per source) when the downstream needs a per-ROW
    bucket id, not just the cut points.

    Tile sizes follow the SQL rule exactly: with m rows and n tiles,
    the first ``m % n`` tiles hold ``m // n + 1`` rows, the rest
    ``m // n`` — so tile assignment is a pure function of the row's
    rank and m, and the DuckDB oracle matches row for row.

    Distributed shape: one sort-free hash exchange on the combined
    group key; each merge task ranks whole groups with a single
    ``np.lexsort`` + boundary-repeat pass and computes tiles
    arithmetically (no per-group loop).  Unlike ``grouped_topk`` there
    is NO map-side pre-cap — every row is output, so the partitioning
    assumption (SURVEY §2.6) is that one group's rows fit a merge
    task; size ``num_buckets`` with the data and salt upstream if one
    group dominates the corpus.

    ``order_col`` must be integer (repo float policy); ``id_col``
    unique (the tie-breaker).  Null group/order/id rows drop (SQL
    window parity).  Output: ``values...`` + ``tile`` (int64).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in values]
                           + [("tile", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(b[order_col]), pc.is_valid(b[id_col]))
        for g in group_cols:
            mask = pc.and_(mask, pc.is_valid(b[g]))
        b = b.filter(mask)
        key = pc.cast(as_array(b[group_cols[0]]), pa.string())
        for g in group_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(as_array(b[g]), pa.string()), "\x1f")
        o = as_array(b[order_col])
        if not pa.types.is_integer(o.type):
            raise ValueError(
                f"grouped_ntile order_col {order_col!r} must be integer "
                f"(repo float policy), got {o.type}")
        cols = {"__b": pa.array(md5_u64le(key), type=pa.uint64()),
                "__g": key,
                "__o": pc.cast(o, pa.int64()),
                "__i": as_array(b[id_col])}
        for c in values:
            cols[c] = b[c]
        return pa.table(cols)

    def tile_fn(t: pa.Table) -> pa.Table:
        gkey = t.column("__g").to_numpy(zero_copy_only=False)
        oval = t.column("__o").to_numpy(zero_copy_only=False)
        ids = t.column("__i").to_numpy(zero_copy_only=False)
        _, gc = np.unique(gkey, return_inverse=True)
        order = np.lexsort((ids, oval, gc))
        gs = gc[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        start = np.flatnonzero(new)
        counts = np.diff(np.append(start, len(gs)))
        rank = np.arange(len(gs)) - np.repeat(start, counts)
        m = np.repeat(counts, counts)
        q, r = m // n_tiles, m % n_tiles
        big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
        tile = np.where(rank < big,
                        rank // (q + 1) + 1,
                        r + (rank - big) // np.maximum(q, 1) + 1)
        out = t.select(values).take(pa.array(order))
        return out.append_column("tile", pa.array(tile.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, tile_fn,
                               empty_schema=out_schema)


def global_ntile(ds, score_col: str, id_col: str, n_tiles: int,
                 values: list[str], num_buckets: int = 64):
    """Corpus-wide NTILE — every row's equal-height tile 1..n under
    (score asc, id asc), with NO global sort and no single-task group:
    SQL ``NTILE(n) OVER (ORDER BY score, id)``.  Composes
    ``global_rank`` (value-count base offsets + score-keyed exchange)
    with a streaming arithmetic tile map — the SQL tile-size rule
    (first ``m % n`` tiles hold ``m // n + 1`` rows) makes the tile a
    pure function of (rank, m), so unlike a constant-group
    ``grouped_ntile`` nothing ever concentrates in one task.

    Same null scope as ``global_rank``: rows with a null score or id
    drop.  Output: ``values...`` + ``tile`` (int64).
    """
    ranked = global_rank(ds, score_col, id_col,
                         values=values, num_buckets=num_buckets)
    ranked = ranked.materialize()  # counted, then streamed
    m = ranked.count()
    big = m % n_tiles            # tiles 1..big hold sz+1 rows
    sz = m // n_tiles
    cut = big * (sz + 1)         # 0-based rank where small tiles start

    def tile(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "rank" not in b.column_names:
            return b
        r0 = pc.subtract(pc.cast(b["rank"], pa.int64()), 1).to_numpy(
            zero_copy_only=False)
        if sz == 0:
            t = r0 + 1  # n > m: one row per tile
        else:
            t = np.where(r0 < cut,
                         r0 // (sz + 1) + 1,
                         big + (r0 - cut) // sz + 1)
        out = b.drop_columns(["rank"])
        return out.append_column("tile", pa.array(t.astype(np.int64)))

    return ranked.map_batches(tile, batch_format="pyarrow")


def pareto_frontier(ds, max_col: str, min_col: str,
                    values: list[str] | None = None):
    """Distributed Pareto frontier (SQL "skyline"): the rows no other
    row strictly dominates, maximizing ``max_col`` and minimizing
    ``min_col`` (multi-objective selection: longest docs with the
    earliest ids, cheapest suppliers at each quality tier, best
    quality per token budget).  A row survives iff NO other row has
    ``max >= its max AND min <= its min`` with at least one strict —
    ties on BOTH axes all survive (neither dominates).

    Classic two-phase shape, zero shuffles: (1) each block computes
    its LOCAL frontier with one vectorized staircase pass (sort by
    (max desc, min asc); a row survives iff it holds its equal-max
    group's min AND beats the running strict-prefix min) — any global
    frontier row is a local frontier row, so this prunes losslessly;
    (2) the block frontiers (staircase-sized, tiny next to the data)
    union on the driver and one final identical pass yields the exact
    global frontier.  Null ``max``/``min`` rows drop (SQL comparisons
    with NULL are never true, which would make null rows vacuously
    undominated — useless in practice and excluded here; restate
    ``IS NOT NULL`` in oracles).

    Both columns must be integer/timestamp (exact compares — repo
    float policy).  Returns a pandas DataFrame of ``values`` (default
    [max_col, min_col]) sorted by (max desc, min asc).  Scale
    assumption (SURVEY §2.6): the CONCATENATED block frontiers fit the
    driver — frontier size is the staircase's, typically O(distinct
    max values) << n; an adversarial fully-anticorrelated dataset
    (everything on the frontier) degrades to output size, the query's
    property.
    """
    import pyarrow.compute as pc

    from ..kernels import as_array

    values = values or [max_col, min_col]

    def local(b: pa.Table) -> pa.Table:
        return _pareto_local(b, max_col, min_col,
                             list(dict.fromkeys(values
                                                + [max_col, min_col])))

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return cand[[c for c in values if c in cand.columns]]
    m = _pareto_mask(cand[max_col].to_numpy().astype(np.int64),
                     cand[min_col].to_numpy().astype(np.int64))
    out = cand[m].sort_values([max_col, min_col],
                              ascending=[False, True])
    return out[values].reset_index(drop=True)


def _pareto_mask(x: np.ndarray, y: np.ndarray,
                 g: np.ndarray | None = None) -> np.ndarray:
    """Boolean frontier mask over (maximize x, minimize y), computed
    independently per group code ``g`` when given (the staircase
    resets at each group) — one lexsort + a segmented shifted
    cumulative min (pandas groupby.cummin, C speed)."""
    import pandas as pd

    I64MAX = np.iinfo(np.int64).max
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    if g is None:
        g = np.zeros(n, dtype=np.int64)
    order = np.lexsort((y, -x, g))
    gs, xs, ys = g[order], x[order], y[order]
    new = np.ones(n, dtype=bool)          # new (g, x) class
    new[1:] = (xs[1:] != xs[:-1]) | (gs[1:] != gs[:-1])
    gid = np.cumsum(new) - 1
    gmin = ys[new]                        # per-class min y (y asc)
    seg_first = np.ones(n, dtype=bool)    # class starts a new g?
    seg_first[1:] = gs[1:] != gs[:-1]
    seg_first = seg_first[new]
    seg_id = np.cumsum(seg_first) - 1
    cmin = (pd.Series(gmin).groupby(seg_id).cummin()
            .to_numpy(np.int64))
    prev = np.empty(len(gmin), dtype=np.int64)
    prev[0] = I64MAX
    if len(gmin) > 1:
        prev[1:] = cmin[:-1]
    prev[seg_first] = I64MAX              # staircase resets per group
    keep_sorted = (gmin[gid] < prev[gid]) & (ys == gmin[gid])
    mask = np.zeros(n, dtype=bool)
    mask[order[keep_sorted]] = True
    return mask


def _pareto_i64(col) -> np.ndarray:
    import pyarrow.compute as pc

    from ..kernels import as_array

    a = as_array(col)
    if pa.types.is_timestamp(a.type):
        a = pc.cast(a, pa.timestamp("us"))
    return pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)


def _pareto_local(b: pa.Table, max_col: str, min_col: str,
                  carry: list[str],
                  group_cols: list[str] | None = None) -> pa.Table:
    import pyarrow.compute as pc

    from ..kernels import as_array

    mask = pc.and_(pc.is_valid(b[max_col]), pc.is_valid(b[min_col]))
    for c in group_cols or ():
        mask = pc.and_(mask, pc.is_valid(b[c]))
    b = b.filter(mask)
    if not b.num_rows:
        return b.select(carry)
    g = None
    if group_cols:
        key = pc.cast(as_array(b[group_cols[0]]), pa.string())
        for c in group_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(as_array(b[c]), pa.string()), "\x1f")
        _, g = np.unique(key.to_numpy(zero_copy_only=False),
                         return_inverse=True)
    m = _pareto_mask(_pareto_i64(b[max_col]), _pareto_i64(b[min_col]),
                     g)
    return b.filter(pa.array(m)).select(carry)


def grouped_pareto(ds, group_cols: list[str], max_col: str,
                   min_col: str, values: list[str] | None = None):
    """Per-group Pareto frontier (grouped skyline): within each
    ``group_cols`` class, the rows no other row of the SAME class
    strictly dominates (maximize ``max_col``, minimize ``min_col``) —
    per-domain multi-objective selection (each language's
    best-quality-per-length documents).  Same lossless two-phase
    shape as :func:`pareto_frontier`, with the staircase segmented by
    group in both the per-block prune and the driver merge; null
    group/objective rows drop (grouped-operator policy).  Returns a
    pandas DataFrame of ``values`` (default groups + objectives)
    sorted by (groups..., max desc, min asc); driver holds the
    concatenated block frontiers (Σ per-group staircases)."""
    values = values or list(
        dict.fromkeys(group_cols + [max_col, min_col]))
    carry = list(dict.fromkeys(values + group_cols
                               + [max_col, min_col]))

    def local(b: pa.Table) -> pa.Table:
        return _pareto_local(b, max_col, min_col, carry, group_cols)

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return cand[[c for c in values if c in cand.columns]]
    key = cand[group_cols[0]].astype(str)
    for c in group_cols[1:]:
        key = key + "\x1f" + cand[c].astype(str)
    _, g = np.unique(key.to_numpy(), return_inverse=True)
    m = _pareto_mask(cand[max_col].to_numpy().astype(np.int64),
                     cand[min_col].to_numpy().astype(np.int64), g)
    out = cand[m].sort_values(
        group_cols + [max_col, min_col],
        ascending=[True] * len(group_cols) + [False, True])
    return out[values].reset_index(drop=True)


def equidepth_bins(ds, col: str, n_bins: int) -> pd.DataFrame:
    """Equi-depth (equal-frequency) histogram of an integer column —
    the optimizer/drift-monitoring binning where every bin holds
    ~1/``n_bins`` of the rows regardless of value skew.  Returns one
    row per non-empty bin: ``bin, lo, hi, n_rows, sum_v`` (all
    int64).

    Deterministic ties-share-a-fate rule (no engine-order dependence):
    cut *i* (i = 1..B−1) is the smallest value whose cumulative count
    satisfies ``cum·B ≥ i·total``; a row's bin is the number of cuts
    strictly below its value.  Duplicate cuts (one value spanning
    several depth boundaries) legitimately skip bin indices, and a
    heavily-tied value never splits across bins — exactly restatable
    in SQL from the cumulative histogram.

    Scale shape: ONE streaming pass — everything derives from the
    ``value_counts`` histogram (per-batch ``np.unique`` partials;
    driver data bounded by DISTINCT values, the same contract as
    ``exact_quantiles``/``global_rank``), then vectorized
    searchsorted + reduceat over the distinct-value arrays.  Rows are
    never shuffled.  Nulls must be dropped upstream (histogram
    contract).
    """
    import pandas as pd

    vals, counts = value_counts(ds, col)
    if not len(vals):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ("bin", "lo", "hi", "n_rows",
                                       "sum_v")})
    cum = np.cumsum(counts)
    total = int(cum[-1])
    i = np.arange(1, n_bins, dtype=np.int64)
    cuts = vals[np.searchsorted(cum * n_bins, i * total, side="left")]
    bin_of = np.searchsorted(cuts, vals, side="left")
    # distinct values are sorted, so bins are contiguous runs
    ub, start = np.unique(bin_of, return_index=True)
    end = np.append(start[1:], len(vals))
    n_rows = np.add.reduceat(counts, start)
    sum_v = np.add.reduceat(vals * counts, start)
    return pd.DataFrame({
        "bin": ub.astype("int64"),
        "lo": vals[start].astype("int64"),
        "hi": vals[end - 1].astype("int64"),
        "n_rows": n_rows.astype("int64"),
        "sum_v": sum_v.astype("int64")})


def budget_select(ds, group_col: str, score_col: str, cost_col: str,
                  id_col: str, budget: int, values: list[str],
                  num_buckets: int = 64):
    """Greedy budget-constrained curation: within each group, walk
    rows in (score DESC, id ASC) order and keep each row whose
    INCLUSIVE running cost stays ≤ ``budget`` — the quality-greedy
    token-budget mix builder ("best docs per source until N tokens"),
    the deterministic counterpart of ``sample.sample_token_budget``'s
    hash-random draw.  SQL: ``SUM(cost) OVER (PARTITION BY group
    ORDER BY score DESC, id) <= budget`` — note a too-expensive row
    is SKIPPED but the walk does NOT stop (rows after it may still
    fit? no — the window sum is cumulative over ALL better rows, so
    once the cum exceeds budget every later row is out too; the rule
    is the window-sum filter, stated exactly).  Rows with null
    group/score/cost/id drop.  Integer scores/costs (repo policy).

    Distributed shape: ONE group-keyed exchange; per bucket: one
    lexsort over (group, −score, id), per-group cumulative sums via
    offset subtraction, one mask — no per-group loop.  Output is
    selection-sized.  Partitioning assumption (SURVEY §2.6): one
    group's rows fit a merge task.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in values])
    need = sorted({group_col, score_col, cost_col, id_col, *values})

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.is_valid(b[group_col])
        for c in (score_col, cost_col, id_col):
            keep = pc.and_(keep, pc.is_valid(b[c]))
        b = b.select(need).filter(keep)
        h = md5_u64le(pc.cast(b[group_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def pick(t: pa.Table) -> pa.Table | None:
        g = pc.cast(t[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        s = pc.cast(t[score_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        c = pc.cast(t[cost_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        i = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        o = np.lexsort((i, -s, g))
        gs, cs = g[o], c[o]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        start = np.flatnonzero(first)
        cnt = np.diff(np.append(start, len(gs)))
        csum = np.cumsum(cs)
        offs = np.repeat(
            np.concatenate([[0], csum[start[1:] - 1]]), cnt)
        keep = (csum - offs) <= budget
        if not keep.any():
            return None
        idx = pa.array(np.sort(o[keep]))
        return pa.table({cname: t[cname].take(idx)
                         for cname in values}).cast(out_schema)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, pick,
                               empty_schema=out_schema)


def rank_vs_reference(ds, ref_ds, col: str, id_col: str):
    """Score every row against a REFERENCE distribution: ``n_ref_le``
    = how many reference values are ≤ the row's value — the exact
    integer numerator of a percentile-vs-reference-epoch score (the
    per-row form of a drift check: divide by the reference count for
    the empirical CDF; joined with ``W3``'s epoch stats this answers
    "where would this doc have fallen last epoch?").  Returns a
    streaming Dataset ``(id_col, col, n_ref_le)``; null value/id rows
    drop.

    Distributed shape: the reference reduces to its distinct-value
    cumulative histogram (``value_counts`` — driver data bounded by
    DISTINCT integer values), broadcast once via ``ray.put``; scoring
    is a pure ``map_batches`` searchsorted — the reference is NEVER
    joined or shuffled against the scored rows.
    """
    import pyarrow.compute as pc
    import ray

    vals, counts = value_counts(ref_ds, col)
    cum = np.cumsum(counts)
    ref = ray.put((vals, cum))
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema([(id_col, id_type), (col, pa.int64()),
                            ("n_ref_le", pa.int64())])

    def score(b: pa.Table) -> pa.Table:
        vs, cs = ray.get(ref)
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[col])))
        if b.num_rows == 0:
            return out_schema.empty_table()
        v = pc.cast(b[col], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vs, v, side="right")
        n_le = np.where(pos > 0, cs[np.maximum(pos - 1, 0)], 0)
        return pa.table({id_col: b[id_col],
                         col: pa.array(v),
                         "n_ref_le": pa.array(n_le.astype(np.int64))
                         }).cast(out_schema)

    return ds.map_batches(score, batch_format="pyarrow")


def exact_quantiles_continuous(ds, col: str, qs_permille: list[int],
                               n_pivots: int = 512,
                               final_budget: int = 262_144,
                               max_passes: int = 8) -> pa.Table:
    """EXACT ``quantile_disc`` members of a CONTINUOUS float column —
    the scale path `exact_quantiles` cannot take: value-counting
    explodes when every double is distinct, and t-digest is
    approximate.  Here each quantile is pinned by iterative pivot
    bisection: every pass streams the dataset once, counting values
    at ``n_pivots`` candidate cuts per open quantile (one
    ``np.searchsorted`` per batch), narrowing each quantile's
    ``(lo, hi]`` bracket ~n_pivots-fold, until the bracket holds ≤
    ``final_budget`` rows; a final pass collects just those rows'
    distinct values and selects the exact rank member.  2–3 passes
    pin a quantile among 10¹² distinct doubles.

    Quantile definition matches DuckDB ``quantile_disc`` (the value at
    1-based sorted rank ``ceil(q·n)``, nulls excluded) — exactly
    `analytics.grouped_exact_quantiles`'s contract, so results are
    bit-identical to the SQL oracle (the returned double IS a member
    of the column).  Returns a ``pa.Table (q, value)``.

    Scale shape: per pass, each batch emits ONE pivot-histogram row
    (n_pivots+1 int64 cells per quantile); the driver folds
    #blocks-many histograms.  No shuffle, no sort, nothing
    data-sized leaves the workers.
    """
    import pyarrow.compute as pc

    def stats_part(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
        if len(v) == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "lo": pa.array([], type=pa.float64()),
                             "hi": pa.array([], type=pa.float64())})
        return pa.table({"n": pa.array([len(v)], type=pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    base = ds.select_columns([col]).map_batches(
        lambda b: b.filter(pc.is_valid(b[col])),
        batch_format="pyarrow")
    st = base.map_batches(stats_part,
                          batch_format="pyarrow").to_pandas()
    if not len(st) or st.n.sum() == 0:
        return pa.table({"q": pa.array([], type=pa.int64()),
                         "value": pa.array([], type=pa.float64())})
    n = int(st.n.sum())
    gmin, gmax = float(st.lo.min()), float(st.hi.max())

    # per-quantile state: 1-based target rank, open bracket (lo, hi]
    # with invariant count(<= lo) = rank_lo < r <= count(<= hi), and
    # lo = -inf initially (count <= -inf is 0)
    state = {}
    for q in qs_permille:
        r = max(1, -(-q * n // 1000))  # ceil(q*n/1000)
        state[q] = {"r": int(r), "lo": -np.inf, "hi": gmax,
                    "rank_lo": 0, "in_range": n, "done": None}

    for _ in range(max_passes):
        open_qs = [q for q, s in state.items()
                   if s["done"] is None and s["in_range"] > final_budget]
        if not open_qs:
            break
        pivots = []
        for q in open_qs:
            s = state[q]
            plo = s["lo"] if np.isfinite(s["lo"]) else gmin
            grid = np.linspace(plo, s["hi"], n_pivots + 2)[1:-1]
            pivots.append(grid)
            pivots.append(np.array([s["hi"]]))
            if np.isfinite(s["lo"]):
                # keep the current lo as a pivot so another
                # quantile's grid can never loosen this bracket
                pivots.append(np.array([s["lo"]]))
        P = np.unique(np.concatenate(pivots))
        if len(P) == 0:
            break

        def hist_part(b: pa.Table, P=P) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False)
            # bin i = (P[i-1], P[i]]; bin len(P) = (P[-1], inf)
            idx = np.searchsorted(P, v, side="left")
            c = np.bincount(idx, minlength=len(P) + 1)
            return pa.table({"bin": pa.array(
                np.arange(len(P) + 1, dtype=np.int64)),
                "c": pa.array(c.astype(np.int64))})

        hp = base.map_batches(hist_part,
                              batch_format="pyarrow").to_pandas()
        counts = np.zeros(len(P) + 1, np.int64)
        np.add.at(counts, hp.bin.to_numpy(np.int64),
                  hp.c.to_numpy(np.int64))
        cum = np.cumsum(counts)  # cum[i] = count(<= P[i]) for i<len(P)
        progressed = False
        for q in open_qs:
            s = state[q]
            r = s["r"]
            # smallest pivot with count(<=pivot) >= r -> new hi
            i = int(np.searchsorted(cum[:len(P)], r))
            if i >= len(P):
                continue  # r beyond all pivots: hi stays (it holds r)
            new_hi, new_hi_cnt = float(P[i]), int(cum[i])
            new_lo = float(P[i - 1]) if i > 0 else s["lo"]
            new_rank_lo = int(cum[i - 1]) if i > 0 else s["rank_lo"]
            if new_hi_cnt - new_rank_lo < s["in_range"]:
                progressed = True
            s["hi"], s["lo"] = new_hi, new_lo
            s["rank_lo"], s["in_range"] = (new_rank_lo,
                                           new_hi_cnt - new_rank_lo)
            if np.nextafter(s["lo"], np.inf) >= s["hi"]:
                s["done"] = s["hi"]  # mass point: no float between
        if not progressed:
            break

    # final pass: collect distinct values inside every open bracket
    open_qs = [q for q, s in state.items() if s["done"] is None]
    if open_qs:
        los = np.array([state[q]["lo"] for q in open_qs])
        his = np.array([state[q]["hi"] for q in open_qs])

        def collect(b: pa.Table, los=los, his=his) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False)
            m = np.zeros(len(v), bool)
            for lo, hi in zip(los, his):
                m |= (v > lo) & (v <= hi)
            u, c = np.unique(v[m], return_counts=True)
            return pa.table({"v": pa.array(u.astype(np.float64)),
                             "c": pa.array(c.astype(np.int64))})

        vals = base.map_batches(collect,
                                batch_format="pyarrow").to_pandas()
        vals = (vals.groupby("v", as_index=False)["c"].sum()
                .sort_values("v"))
        va = vals.v.to_numpy(np.float64)
        ca = vals.c.to_numpy(np.int64)
        for q in open_qs:
            s = state[q]
            m = (va > s["lo"]) & (va <= s["hi"])
            vv, cc = va[m], np.cumsum(ca[m]) + s["rank_lo"]
            s["done"] = float(vv[np.searchsorted(cc, s["r"])])

    qs_sorted = list(qs_permille)
    return pa.table({
        "q": pa.array(qs_sorted, type=pa.int64()),
        "value": pa.array([state[q]["done"] for q in qs_sorted],
                          type=pa.float64())})


def grouped_quantiles_continuous(ds, group_col: str, col: str,
                                 qs_permille: list[int],
                                 n_pivots: int = 128,
                                 final_budget: int = 65_536,
                                 max_passes: int = 8):
    """Per-GROUP exact ``quantile_disc`` members of a continuous
    float column — `grouped_exact_quantiles`' scale path for columns
    where per-group value counting explodes (every double distinct),
    using `exact_quantiles_continuous`'s pivot bisection per (group,
    quantile): each pass streams the dataset once and each batch
    emits one pivot histogram PER GROUP (an enum-sized Python loop
    over groups — the documented enum contract; the per-value work
    stays vectorized searchsorted/bincount).  Null groups and null
    values drop (restated in the SQL).

    Returns a pandas DataFrame ``(group_col, n, q<..>...)`` like
    `analytics.grouped_exact_quantiles` (values float64, exact
    members of the column).
    """
    import pandas as pd
    import pyarrow.compute as pc

    base = ds.select_columns([group_col, col]).map_batches(
        lambda b: b.filter(pc.and_(pc.is_valid(b[group_col]),
                                   pc.is_valid(b[col]))),
        batch_format="pyarrow")

    def stats_part(b: pa.Table) -> pa.Table:
        g = b.group_by([group_col]).aggregate(
            [(col, "count"), (col, "min"), (col, "max")])
        return g.rename_columns([group_col, "n", "lo", "hi"])

    st = base.map_batches(stats_part,
                          batch_format="pyarrow").to_pandas()
    cols_empty = {group_col: pd.Series(dtype=object),
                  "n": pd.Series(dtype="int64"),
                  **{f"q{q // 10}": pd.Series(dtype="float64")
                     for q in qs_permille}}
    if not len(st):
        return pd.DataFrame(cols_empty)
    st = st.groupby(group_col, as_index=False).agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    groups = list(st[group_col])
    meta = {r[0]: (int(r[1]), float(r[2]), float(r[3]))
            for r in st.itertuples(index=False)}

    state = {}
    for g in groups:
        n, gmin, gmax = meta[g]
        for q in qs_permille:
            r = max(1, -(-q * n // 1000))
            state[(g, q)] = {"r": int(r), "lo": -np.inf, "hi": gmax,
                             "rank_lo": 0, "in_range": n,
                             "gmin": gmin, "done": None}

    for _ in range(max_passes):
        open_keys = [ky for ky, s in state.items()
                     if s["done"] is None
                     and s["in_range"] > final_budget]
        if not open_keys:
            break
        piv = {}
        for (g, q) in open_keys:
            s = state[(g, q)]
            plo = s["lo"] if np.isfinite(s["lo"]) else s["gmin"]
            grid = [np.linspace(plo, s["hi"], n_pivots + 2)[1:-1],
                    np.array([s["hi"]])]
            if np.isfinite(s["lo"]):
                grid.append(np.array([s["lo"]]))
            piv.setdefault(g, []).extend(grid)
        P = {g: np.unique(np.concatenate(v)) for g, v in piv.items()}

        def hist_part(b: pa.Table, P=P) -> pa.Table:
            gv = np.asarray(b.column(group_col).to_pylist(),
                            dtype=object)
            v = b.column(col).to_numpy(zero_copy_only=False)
            gs, bins, cs = [], [], []
            for g, pg in P.items():
                vm = v[gv == g]
                if not len(vm):
                    continue
                c = np.bincount(np.searchsorted(pg, vm, side="left"),
                                minlength=len(pg) + 1)
                gs.extend([g] * (len(pg) + 1))
                bins.append(np.arange(len(pg) + 1, dtype=np.int64))
                cs.append(c.astype(np.int64))
            if not bins:
                return pa.table({
                    "g": pa.array([], type=pa.string()),
                    "bin": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64())})
            return pa.table({"g": pa.array(gs, type=pa.string()),
                             "bin": pa.array(np.concatenate(bins)),
                             "c": pa.array(np.concatenate(cs))})

        hp = base.map_batches(hist_part,
                              batch_format="pyarrow").to_pandas()
        folded = (hp.groupby(["g", "bin"], as_index=False)["c"].sum()
                  if len(hp) else hp)
        progressed = False
        for (g, q) in open_keys:
            s = state[(g, q)]
            pg = P[g]
            cg = np.zeros(len(pg) + 1, np.int64)
            sub = folded[folded.g == g] if len(folded) else folded
            if len(sub):
                cg[sub.bin.to_numpy(np.int64)] = sub.c.to_numpy(
                    np.int64)
            cum = np.cumsum(cg)
            r = s["r"]
            i = int(np.searchsorted(cum[:len(pg)], r))
            if i >= len(pg):
                continue
            new_hi, new_hi_cnt = float(pg[i]), int(cum[i])
            new_lo = float(pg[i - 1]) if i > 0 else s["lo"]
            new_rank_lo = int(cum[i - 1]) if i > 0 else s["rank_lo"]
            if new_hi_cnt - new_rank_lo < s["in_range"]:
                progressed = True
            s["hi"], s["lo"] = new_hi, new_lo
            s["rank_lo"] = new_rank_lo
            s["in_range"] = new_hi_cnt - new_rank_lo
            if np.nextafter(s["lo"], np.inf) >= s["hi"]:
                s["done"] = s["hi"]
        if not progressed:
            break

    open_keys = [ky for ky, s in state.items() if s["done"] is None]
    if open_keys:
        ranges = {}
        for (g, q) in open_keys:
            s = state[(g, q)]
            ranges.setdefault(g, []).append((s["lo"], s["hi"]))

        def collect(b: pa.Table, ranges=ranges) -> pa.Table:
            gv = np.asarray(b.column(group_col).to_pylist(),
                            dtype=object)
            v = b.column(col).to_numpy(zero_copy_only=False)
            gs, vs, cs = [], [], []
            for g, rr in ranges.items():
                vm = v[gv == g]
                if not len(vm):
                    continue
                m = np.zeros(len(vm), bool)
                for lo, hi in rr:
                    m |= (vm > lo) & (vm <= hi)
                u, c = np.unique(vm[m], return_counts=True)
                gs.extend([g] * len(u))
                vs.append(u.astype(np.float64))
                cs.append(c.astype(np.int64))
            if not vs:
                return pa.table({
                    "g": pa.array([], type=pa.string()),
                    "v": pa.array([], type=pa.float64()),
                    "c": pa.array([], type=pa.int64())})
            return pa.table({"g": pa.array(gs, type=pa.string()),
                             "v": pa.array(np.concatenate(vs)),
                             "c": pa.array(np.concatenate(cs))})

        vals = base.map_batches(collect,
                                batch_format="pyarrow").to_pandas()
        vals = (vals.groupby(["g", "v"], as_index=False)["c"].sum()
                .sort_values(["g", "v"]))
        for (g, q) in open_keys:
            s = state[(g, q)]
            sub = vals[vals.g == g]
            va = sub.v.to_numpy(np.float64)
            ca = sub.c.to_numpy(np.int64)
            m = (va > s["lo"]) & (va <= s["hi"])
            vv = va[m]
            cc = np.cumsum(ca[m]) + s["rank_lo"]
            s["done"] = float(vv[np.searchsorted(cc, s["r"])])

    rows = []
    for g in groups:
        row = {group_col: g, "n": meta[g][0]}
        for q in qs_permille:
            row[f"q{q // 10}"] = state[(g, q)]["done"]
        rows.append(row)
    out = pd.DataFrame(rows).sort_values(group_col)
    out["n"] = out.n.astype("int64")
    return out.reset_index(drop=True)
