"""Distributed as-of join — attach to each left row the temporally
nearest right row of the same key (backward: latest ``right_ts <=
left_ts``; forward: earliest ``right_ts >= left_ts``).  The classic
point-in-time enrichment (events -> latest prior order / quote /
feature snapshot) that Ray Data's equality ``Dataset.join`` cannot
express.

Distributed shape: both sides are projected to a shared tagged schema
(left payload + right payload, null-filled across sides) and routed
through ONE sort-free hash exchange keyed on the join key — each
bucket holds every left and right row of its keys, so the merge is
local.  Per bucket, one ``np.lexsort`` over (key-code, ts, tiebreak)
interleaves both sides with right rows ordered before the left rows
they may match; a single ``np.maximum.accumulate`` over right-row
positions then yields each left row's candidate in O(n) — no per-key
or per-row Python loop.  Results stay in the object store
(``grouped_exchange_ds``); the output is left-row-sized.

Semantics (match pandas ``merge_asof(allow_exact_matches=True)``):
inclusive on ts equality; right rows tied on (key, ts) resolve to the
greatest ``tiebreak`` value (callers that need cross-engine
determinism must pass ``tiebreak`` or pre-dedupe the right side);
``tolerance`` (µs) drops matches farther than the window, like
``merge_asof(tolerance=...)``.

Partitioning assumption (SURVEY §2.6): one key's rows must fit a
merge task.  ``num_buckets`` spreads distinct keys, not rows of one
key — salt a pathological hot key upstream if a single key's history
outgrows a worker.

At 100 TB: shuffle payload is (key, ts, tiebreak, projected payload)
— pass ``right_values`` as the minimal column set; the exchange
carries no full right rows beyond it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le
from ..kernels import as_array

_I64MAX = np.iinfo(np.int64).max


def rank_into(dcode: np.ndarray, dval: np.ndarray,
              qcode: np.ndarray, qval: np.ndarray,
              queries_first: bool) -> np.ndarray:
    """For each query (qcode, qval): how many data rows (dcode, dval)
    sort strictly before it (``queries_first=True`` → strict ``<``) or
    at-or-before it (``False`` → ``<=``), under (code, value) order.
    One merged lexsort — no per-query slicing.  Data must already be
    sorted by (code, value); queries need not be."""
    m, n = len(dcode), len(qcode)
    allc = np.concatenate([dcode, qcode])
    allv = np.concatenate([dval, qval])
    flag = np.concatenate([
        np.full(m, 1 if queries_first else 0, np.int8),
        np.full(n, 0 if queries_first else 1, np.int8)])
    mo = np.lexsort((flag, allv, allc))
    qrank = np.flatnonzero(mo >= m)
    out = np.empty(n, dtype=np.int64)
    out[mo[qrank] - m] = qrank - np.arange(n)
    return out


def _ts_i64(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Normalize any timestamp unit (or integer) to int64 microseconds
    (the hopping-window ts-unit lesson: never trust the native unit).
    Nulls survive — the merge gates them out of matching."""
    col = as_array(col)
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def _key_arrays(col) -> tuple[pa.Array, np.ndarray]:
    """(normalized key array for equality, uint64 bucket source).
    Null keys bucket to hash(0/"") — harmless, the merge drops them
    from matching (SQL semantics: NULL equals nothing)."""
    arr = as_array(col)
    if pa.types.is_integer(arr.type):
        arr = pc.cast(arr, pa.int64())
        bk = pc.fill_null(arr, 0).to_numpy(
            zero_copy_only=False).astype(np.uint64)
    else:
        arr = pc.cast(arr, pa.string())
        bk = md5_u64le(pc.fill_null(arr, ""))
    return arr, bk


def hash_join(left_ds, right_ds, key: str | list[str],
              left_values: list[str], right_values: list[str],
              right_key: str | list[str] | None = None,
              how: str = "inner", num_buckets: int = 64):
    """Distributed big-big hash equi-join — the generic shuffle join
    for when NEITHER side fits a broadcast (the broadcast pattern in
    ``analytics.revenue_by_*`` stays the right tool for small
    dimensions).  ``how`` = ``inner`` | ``left`` | ``right`` | ``full``
    | ``semi`` | ``anti``; many-to-many keys enumerate the full cross
    product per key, like SQL.  ``semi``/``anti`` are EXISTS / NOT
    EXISTS (left columns only, each left row at most once; the right
    side ships DISTINCT KEYS only — map-side deduped).  ``key`` /
    ``right_key`` may be lists for composite joins (matched on the
    ``\\x1f``-joined string form).

    Distributed shape: both sides projected to a shared tagged schema
    and routed through ONE sort-free hash exchange on the key — each
    merge task holds every left and right row of its keys and matches
    locally: right rows sort once by key code, each left row's
    candidate slice [lo, hi) comes from two ``np.searchsorted`` calls,
    pairs enumerate with the repeat/arange pattern (no per-key loop).
    Built on ``stages/exchange`` rather than ``ray.data.Dataset.join``
    because the exchange composes under iteration (CLAUDE.md: Ray
    Data's join breaks when its input derives from a prior join) and
    carries only the projected payload columns.

    SQL semantics: NULL keys match nothing; outer modes surface
    unmatched rows (including null-key rows of the preserved side)
    once, with the other side's columns null.

    Partitioning assumption (SURVEY §2.6): one key's rows must fit a
    merge task; salt pathological hot keys upstream.  At 100 TB pass
    the minimal ``left_values``/``right_values`` — the exchange ships
    exactly those columns plus the key.
    """
    from ..stages.exchange import grouped_exchange_ds

    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(
            f"how must be inner|left|right|full|semi|anti: {how}")
    if how in ("semi", "anti") and right_values:
        raise ValueError("semi/anti joins emit left columns only — "
                         "pass right_values=[]")
    lkeys = [key] if isinstance(key, str) else list(key)
    rkeys = (lkeys if right_key is None else
             [right_key] if isinstance(right_key, str) else list(right_key))
    if len(rkeys) != len(lkeys):
        raise ValueError(f"key arity mismatch: {lkeys} vs {rkeys}")
    l_schema, r_schema = left_ds.schema(), right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    clash = set(left_values) & set(right_values)
    if clash:
        raise ValueError(f"left/right output columns collide: {clash}")
    # composite keys join on the \x1f-joined string form (null in ANY
    # component -> null key -> matches nothing, SQL semantics); a
    # single key keeps its native int64/string equality
    key_type = (pa.int64()
                if len(lkeys) == 1 and pa.types.is_integer(l_types[lkeys[0]])
                else pa.string())

    def _key_of(b: pa.Table, keys: list[str]):
        if len(keys) == 1:
            # bucket by the SHARED key_type, not the side's native
            # type: an int left key joined to a digit-string right key
            # must hash identically on both sides (raw value for int64,
            # md5 for string) or matching keys land in different
            # buckets and the join silently returns nothing
            return _key_arrays(pc.cast(as_array(b[keys[0]]), key_type))
        arr = pc.cast(as_array(b[keys[0]]), pa.string())
        for kk in keys[1:]:
            arr = pc.binary_join_element_wise(
                arr, pc.cast(as_array(b[kk]), pa.string()), "\x1f")
        return arr, md5_u64le(pc.fill_null(arr, ""))

    def _tag(b: pa.Table, is_left: bool) -> pa.Table:
        k_arr, bk = _key_of(b, lkeys if is_left else rkeys)
        if not is_left and how in ("semi", "anti"):
            # membership only needs each right key ONCE per block —
            # map-side dedup bounds the shuffle at distinct keys; null
            # right keys never match, drop them outright (also avoids
            # the fill-null sentinel colliding with a real 0/"" key)
            keyed = pc.cast(k_arr, key_type)
            sel = np.flatnonzero(
                pc.is_valid(keyed).to_numpy(zero_copy_only=False))
            kv = keyed.take(pa.array(sel)).to_numpy(zero_copy_only=False)
            _, idx = np.unique(kv, return_index=True)
            pick = np.sort(sel[idx])
            k_arr = keyed.take(pa.array(pick))
            bk = bk[pick]
            b = b.take(pa.array(pick))
        n = b.num_rows
        cols = {"__b": pa.array(bk, type=pa.uint64()),
                "__k": pc.cast(k_arr, key_type),
                "__side": pa.array(np.full(n, np.int8(1 if is_left
                                                      else 0)))}
        for c in left_values:
            cols[c] = b[c] if is_left else pa.nulls(n, l_types[c])
        for c in right_values:
            cols[c] = pa.nulls(n, r_types[c]) if is_left else b[c]
        return pa.table(cols)

    tagged = (left_ds.map_batches(lambda b: _tag(b, True),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(lambda b: _tag(b, False),
                                          batch_format="pyarrow")))
    out_schema = pa.schema(
        [(c, l_types[c]) for c in left_values]
        + [(c, r_types[c]) for c in right_values])

    merge = _equi_merge(how, left_values, right_values, l_types,
                        r_types, out_schema)

    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def _equi_merge(how: str, left_values: list[str], right_values: list[str],
                l_types: dict, r_types: dict, out_schema: pa.Schema):
    """Local equi-join kernel over a tagged table (columns ``__side``
    1=left/0=right, ``__k`` join key, plus the projected value columns
    null-filled on the other side) — the merge step shared by
    ``hash_join`` (one row set per exchange bucket) and
    ``bucketed_join`` (one row set per aligned storage bucket)."""

    def merge(t: pa.Table) -> pa.Table:
        side = t.column("__side").to_numpy(zero_copy_only=False)
        k_col = t.column("__k")
        valid = pc.is_valid(k_col).to_numpy(zero_copy_only=False)
        # fill nulls BEFORE to_numpy: None in an object array breaks
        # np.unique's sort, and int64-with-null converts to float64
        # (precision loss past 2^53).  Sentinel collisions are harmless
        # — invalid rows never enter lsel/rsel.
        fill = 0 if pa.types.is_integer(k_col.type) else ""
        kv = pc.fill_null(k_col, fill).to_numpy(zero_copy_only=False)
        _, codes = np.unique(kv, return_inverse=True)
        lsel = np.flatnonzero((side == 1) & valid)
        rsel = np.flatnonzero((side == 0) & valid)
        parts = []
        counts = np.zeros(len(lsel), np.int64)
        rorig = rsel  # sorted-right order once matching runs
        rmatched = np.zeros(len(rsel), bool)  # aligned with rorig
        if len(lsel) and len(rsel):
            rcode = codes[rsel]
            ro = np.argsort(rcode, kind="stable")
            rcode, rorig = rcode[ro], rsel[ro]
            lcode = codes[lsel]
            lo = np.searchsorted(rcode, lcode, side="left")
            hi = np.searchsorted(rcode, lcode, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total and how not in ("semi", "anti"):
                first = np.concatenate([[0], np.cumsum(counts)[:-1]])
                rep = np.repeat(np.arange(len(lsel)), counts)
                cand = (np.arange(total) - np.repeat(first, counts)
                        + np.repeat(lo, counts))
                lidx = pa.array(lsel[rep])
                ridx = pa.array(rorig[cand])
                rmatched[cand] = True
                cols = {c: t.column(c).take(lidx) for c in left_values}
                for c in right_values:
                    cols[c] = t.column(c).take(ridx)
                parts.append(pa.table(cols).cast(out_schema))
        if how in ("semi", "anti"):
            if how == "semi":  # EXISTS: lefts with a match, once each
                sel = lsel[counts > 0] if len(lsel) else lsel
            else:  # NOT EXISTS: no match — null-key lefts qualify too
                sel = np.concatenate(
                    [lsel[counts == 0] if len(lsel) else lsel,
                     np.flatnonzero((side == 1) & ~valid)])
            if not len(sel):
                return None
            lidx = pa.array(np.sort(sel))
            return pa.table(
                {c: t.column(c).take(lidx) for c in left_values}
            ).cast(out_schema)
        if how in ("left", "full"):
            # unmatched valid-key lefts + null-key lefts, null right side
            unmatched = np.concatenate(
                [lsel[counts == 0] if len(lsel) else lsel,
                 np.flatnonzero((side == 1) & ~valid)])
            if len(unmatched):
                lidx = pa.array(np.sort(unmatched))
                cols = {c: t.column(c).take(lidx) for c in left_values}
                for c in right_values:
                    cols[c] = pa.nulls(len(unmatched), r_types[c])
                parts.append(pa.table(cols).cast(out_schema))
        if how in ("right", "full"):
            # unmatched valid-key rights + null-key rights, null left side
            unmatched = np.concatenate(
                [rorig[~rmatched],
                 np.flatnonzero((side == 0) & ~valid)])
            if len(unmatched):
                ridx = pa.array(np.sort(unmatched))
                cols = {c: pa.nulls(len(unmatched), l_types[c])
                        for c in left_values}
                for c in right_values:
                    cols[c] = t.column(c).take(ridx)
                parts.append(pa.table(cols).cast(out_schema))
        if not parts:
            return None
        return pa.concat_tables(parts)

    return merge


def range_join(point_ds, interval_ds, key: str, point_ts: str,
               interval_start: str, interval_end: str,
               point_values: list[str], interval_values: list[str],
               right_key: str | None = None, max_span: int | None = None,
               num_buckets: int = 64):
    """Distributed interval (range) join: every (point, interval) pair
    with equal keys and ``start <= ts <= end`` — inner-join pairs of
    ``point_values`` + ``interval_values`` columns.

    Same exchange shape as :func:`asof_join` (one hash exchange on the
    key; both sides tagged into a shared schema).  Per bucket the
    matching is fully vectorized: intervals sort once by (key, start);
    each point's candidate slice [lo, hi) falls out of ONE merged
    lexsort of interval starts and point timestamps (hi = intervals
    with (key, start) <= (key, ts), computed as merged-rank minus
    point-rank — no per-point slicing), candidates are enumerated with
    the repeat/arange pattern and filtered on ``end >= ts``.

    Enumerated candidates = intervals starting at-or-before the point
    (long-expired ones included) — pass ``max_span`` (µs; the max
    interval length) to tighten ``lo`` to ``start >= ts - max_span``
    so candidate volume ≈ true pair volume.  Pairs are output-sized;
    like any range join, a hot key with overlapping everything is
    quadratic — that is the query's property, not the operator's.
    """
    from ..stages.exchange import grouped_exchange_ds

    p_schema, i_schema = point_ds.schema(), interval_ds.schema()
    p_types = dict(zip(p_schema.names, p_schema.types))
    i_types = dict(zip(i_schema.names, i_schema.types))
    clash = set(point_values) & set(interval_values)
    if clash:
        raise ValueError(f"point/interval output columns collide: {clash}")
    rkey = right_key or key
    key_type = (pa.int64() if pa.types.is_integer(p_types[key])
                else pa.string())

    def _tag(b: pa.Table, is_point: bool) -> pa.Table:
        n = b.num_rows
        k_arr, bk = _key_arrays(b[key if is_point else rkey])
        s = _ts_i64(b[point_ts if is_point else interval_start])
        e = (pa.nulls(n, pa.int64()) if is_point
             else _ts_i64(b[interval_end]))
        cols = {"__b": pa.array(bk, type=pa.uint64()),
                "__k": pc.cast(k_arr, key_type), "__s": s, "__e": e,
                "__side": pa.array(np.full(n, np.int8(1 if is_point
                                                      else 0)))}
        for c in point_values:
            cols[c] = b[c] if is_point else pa.nulls(n, p_types[c])
        for c in interval_values:
            cols[c] = pa.nulls(n, i_types[c]) if is_point else b[c]
        return pa.table(cols)

    tagged = (point_ds.map_batches(lambda b: _tag(b, True),
                                   batch_format="pyarrow")
              .union(interval_ds.map_batches(lambda b: _tag(b, False),
                                             batch_format="pyarrow")))
    out_schema = pa.schema(
        [(c, p_types[c]) for c in point_values]
        + [(c, i_types[c]) for c in interval_values])

    def merge(t: pa.Table) -> pa.Table:
        side_np = t.column("__side").to_numpy(zero_copy_only=False)
        good = pc.and_(pc.is_valid(t.column("__k")),
                       pc.is_valid(t.column("__s"))).to_numpy(
                           zero_copy_only=False)
        # null-end INTERVALS can't match (SQL: NULL compares false)
        good &= (side_np == 1) | pc.is_valid(
            t.column("__e")).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(good))
        if not t.num_rows:
            return None
        side = t.column("__side").to_numpy(zero_copy_only=False)
        kv = t.column("__k").to_numpy(zero_copy_only=False)
        _, codes = np.unique(kv, return_inverse=True)
        sv = t.column("__s").to_numpy(zero_copy_only=False)
        isel = np.flatnonzero(side == 0)
        psel = np.flatnonzero(side == 1)
        if not len(isel) or not len(psel):
            return None
        ev = pc.fill_null(t.column("__e"), np.int64(0)).to_numpy(
            zero_copy_only=False)
        icode, istart = codes[isel], sv[isel]
        oi = np.lexsort((istart, icode))
        icode, istart = icode[oi], istart[oi]
        iend = ev[isel][oi].astype(np.int64)
        iorig = isel[oi]
        pcode, pts = codes[psel], sv[psel]
        m, np_ = len(isel), len(psel)

        hi = rank_into(icode, istart, pcode, pts, queries_first=False)
        if max_span is not None:
            lo = rank_into(icode, istart, pcode, pts - max_span,
                           queries_first=True)
        else:
            lo = np.searchsorted(icode, pcode, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return None
        first = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rep = np.repeat(np.arange(np_), counts)
        cand = np.arange(total) - np.repeat(first, counts) \
            + np.repeat(lo, counts)
        keep = iend[cand] >= pts[rep]
        cand, rep = cand[keep], rep[keep]
        pidx = pa.array(psel[rep])
        iidx = pa.array(iorig[cand])
        cols = {c: t.column(c).take(pidx) for c in point_values}
        for c in interval_values:
            cols[c] = t.column(c).take(iidx)
        return pa.table(cols).cast(out_schema)

    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def asof_join(left_ds, right_ds, key: str, ts: str,
              right_values: list[str], right_key: str | None = None,
              right_ts: str | None = None, tiebreak: str | None = None,
              direction: str = "backward", tolerance: int | None = None,
              num_buckets: int = 64):
    """Dataset of every left row's columns + ``right_values`` from its
    as-of match (nulls when no right row qualifies).  ``direction``:
    ``backward`` (latest right at-or-before), ``forward`` (earliest
    at-or-after), or ``nearest`` (min |Δt|; equidistant prefers
    backward — pandas merge_asof parity); ties at the chosen timestamp
    break by the LARGEST ``tiebreak``."""
    import ray.data as rd

    from ..stages.exchange import grouped_exchange_ds

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}")
    rkey = right_key or key
    rts = right_ts or ts
    sign = -1 if direction == "forward" else 1

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    left_cols = list(l_schema.names)
    clash = set(left_cols) & set(right_values)
    if clash:
        raise ValueError(f"right_values collide with left columns: {clash}")

    key_type = (pa.int64() if pa.types.is_integer(l_types[key])
                else pa.string())

    def _tag(b: pa.Table, is_left: bool) -> pa.Table:
        n = b.num_rows
        k_arr, bk = _key_arrays(b[key if is_left else rkey])
        tsv = pc.multiply_checked(
            _ts_i64(b[ts if is_left else rts]), np.int64(sign))
        if is_left:
            tb = np.full(n, _I64MAX, dtype=np.int64)
        elif tiebreak is not None:
            tb = pc.cast(as_array(b[tiebreak]),
                         pa.int64()).to_numpy(zero_copy_only=False)
        else:
            tb = np.zeros(n, dtype=np.int64)
        cols = {"__b": pa.array(bk, type=pa.uint64()),
                "__k": pc.cast(k_arr, key_type),
                "__ts": tsv, "__tb": pa.array(tb),
                "__side": pa.array(
                    np.full(n, np.int8(1 if is_left else 0)))}
        for c in left_cols:
            cols[c] = b[c] if is_left else pa.nulls(n, l_types[c])
        for c in right_values:
            cols[c] = pa.nulls(n, r_types[c]) if is_left else b[c]
        return pa.table(cols)

    tagged = (left_ds.map_batches(lambda b: _tag(b, True),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(lambda b: _tag(b, False),
                                          batch_format="pyarrow")))

    out_schema = pa.schema(
        [(c, l_types[c]) for c in left_cols]
        + [(c, r_types[c]) for c in right_values])

    def merge(t: pa.Table) -> pa.Table:
        # null key / null ts rows never match: drop right ones, emit
        # left ones with null right columns (appended at the end)
        bad = pc.or_(pc.is_null(t.column("__k")),
                     pc.is_null(t.column("__ts"))).to_numpy(
                         zero_copy_only=False)
        bad_left = t.filter(pa.array(
            bad & (t.column("__side").to_numpy(zero_copy_only=False) == 1)))
        if bad.any():
            t = t.filter(pa.array(~bad))
        parts = []
        if t.num_rows:
            side = t.column("__side").to_numpy(zero_copy_only=False)
            kv = t.column("__k").to_numpy(zero_copy_only=False)
            _, codes = np.unique(kv, return_inverse=True)
            tsv = t.column("__ts").to_numpy(zero_copy_only=False)
            tb = t.column("__tb").to_numpy(zero_copy_only=False)
            # right rows sort before left rows at equal (key, ts)
            # because left __tb is INT64MAX; right (key, ts) ties end
            # on max __tb
            order = np.lexsort((tb, tsv, codes))
            s_codes = codes[order]
            is_right = side[order] == 0
            runmax = np.maximum.accumulate(
                np.where(is_right, np.arange(len(order)), -1))
            lpos = np.flatnonzero(~is_right)
            cand = np.maximum(runmax[lpos], 0)
            ok = runmax[lpos] >= 0
            ok &= s_codes[cand] == s_codes[lpos]
            sts = tsv[order]
            if tolerance is not None:
                ok &= (sts[lpos] - sts[cand]) <= tolerance
            if direction == "nearest":
                # forward candidate: the next right strictly after the
                # left (equal-ts rights sort BEFORE lefts and belong to
                # the backward arm); within an equal-(key, ts) forward
                # run, advance to the run END = max tiebreak, the same
                # rule the backward arm gets from the sort order
                N = len(order)
                nxt = np.where(is_right, np.arange(N), N)
                nxt = np.minimum.accumulate(nxt[::-1])[::-1]
                fc = np.minimum(nxt[lpos], N - 1)
                okf = (nxt[lpos] < N) & (s_codes[fc] == s_codes[lpos])
                same = ((s_codes[1:] == s_codes[:-1])
                        & (sts[1:] == sts[:-1])
                        & is_right[1:] & is_right[:-1])
                ends = np.flatnonzero(np.concatenate([~same, [True]]))
                gid = np.concatenate([[0], np.cumsum(~same)])
                fc = ends[gid[fc]]
                fdelta = sts[fc] - sts[lpos]
                if tolerance is not None:
                    okf &= fdelta <= tolerance
                bdelta = sts[lpos] - sts[cand]
                # equidistant -> backward (pandas merge_asof parity)
                use_b = ok & (~okf | (bdelta <= fdelta))
                cand = np.where(use_b, cand, fc)
                ok = use_b | okf
            ridx = pa.array(order[cand], mask=~ok)
            lidx = pa.array(order[lpos])
            cols = {c: t.column(c).take(lidx) for c in left_cols}
            for c in right_values:
                cols[c] = t.column(c).take(ridx)
            parts.append(pa.table(cols).cast(out_schema))
        if bad_left.num_rows:
            cols = {c: bad_left.column(c) for c in left_cols}
            for c in right_values:
                cols[c] = pa.nulls(bad_left.num_rows, r_types[c])
            parts.append(pa.table(cols).cast(out_schema))
        if not parts:
            return None
        return pa.concat_tables(parts)

    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def broadcast_join(ds, small: pa.Table, key: str, values: list[str],
                   right_key: str | None = None, how: str = "left"):
    """Generic broadcast equi-join — the zero-shuffle path for
    attaching a DIMENSION table (one that fits a worker's heap) to a
    big fact stream: the small side is normalized to (sorted keys,
    payload) and ``ray.put`` ONCE; every batch does one
    ``np.searchsorted`` lookup.  This generalizes the hand-built
    broadcast joins in ``analytics.revenue_by_*``; use ``hash_join``
    when both sides are big or keys are many-to-many.

    Contract: ``right_key`` must be UNIQUE in ``small`` (dimension-
    table semantics; raises otherwise), so the output is exactly
    left-row-sized for ``how="left"`` and a subset for ``"inner"``.
    Null keys match nothing (SQL).
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    rkey = right_key or key
    k_col = small.column(rkey)
    is_int = pa.types.is_integer(k_col.type)
    keys_np = (pc.cast(as_array(k_col), pa.int64() if is_int
                       else pa.string())
               .to_numpy(zero_copy_only=False))
    if pc.any(pc.is_null(k_col)).as_py():
        raise ValueError("small-side join keys contain nulls")
    if len(np.unique(keys_np)) != len(keys_np):
        raise ValueError(f"small-side key {rkey!r} is not unique — "
                         "dimension-table contract; use hash_join")
    order = np.argsort(keys_np)
    payload = small.select(values).take(pa.array(order))
    side_ref = ray.put((keys_np[order], payload))
    v_types = {c: payload.schema.field(c).type for c in values}

    def attach(b: pa.Table) -> pa.Table:
        skeys, pay = ray.get(side_ref)
        k = as_array(b[key])
        k = pc.cast(k, pa.int64() if is_int else pa.string())
        from ..functions.lookup import sorted_lookup

        valid = pc.is_valid(k).to_numpy(zero_copy_only=False)
        kv = pc.fill_null(k, 0 if is_int else "").to_numpy(
            zero_copy_only=False)
        in_dim, pos = sorted_lookup(skeys, kv)
        hit = valid & in_dim
        if how == "inner":
            sel = np.flatnonzero(hit)
            out = b.take(pa.array(sel))
            for c in values:
                out = out.append_column(
                    c, pay.column(c).take(pa.array(pos[sel])))
            return out
        out = b
        idx = np.where(hit, pos, 0)
        for c in values:
            col = pay.column(c).take(pa.array(idx)).combine_chunks()
            col = pc.if_else(pa.array(hit), col,
                             pa.scalar(None, type=v_types[c]))
            out = out.append_column(c, col)
        return out

    return ds.map_batches(attach, batch_format="pyarrow")


def fuzzy_join(left_ds, right_ds, left_id: str, right_id: str,
               key: str = "title", tau_permille: int = 700,
               block_len: int = 8, num_buckets: int = 32):
    """Record linkage / entity resolution: approximate string join —
    emit (lid, rid, inter, uni) for cross-side pairs whose KEYS have
    character-3-gram Jaccard ``inter/uni >= tau_permille/1000``
    (integer comparison ``inter*1000 >= tau*uni`` — no float
    thresholds).  The dedup-across-catalogs / crawl-entity-merge
    operation an equi-join cannot express.

    Two-stage exchange shape (no all-pairs scan):

    1. MULTI-PASS BLOCKING: each key emits two block values — its
       first and last ``block_len`` characters — and candidates are
       cross-side pairs sharing EITHER block (a single point mutation
       can corrupt one block but not both; the classic multi-blocker
       recall trick).  Blocks co-locate through a hash exchange;
       per-bucket pair enumeration uses the searchsorted
       repeat/arange pattern.
    2. PAIR EXCHANGE: candidates route by pair hash for global
       dedup (the same pair can surface via both blockers), then
       verify IN-TASK: distinct 3-gram codepoint codes per unique
       key (memoized; c0·2^42+c1·2^21+c2 — bijective with the
       oracle's substr grams), ``np.intersect1d`` per pair.

    Recall contract: a true pair is found iff it shares a full
    prefix- or suffix-block — edits touching BOTH ends escape
    blocking (documented; add mid-key blocks for higher recall).
    Null ids/keys drop.  Keys shorter than 3 characters have no
    grams and never match.

    Scale assumption (SURVEY §2.6): one block value's rows fit a
    merge task — a degenerate corpus where thousands of records share
    one prefix makes that block quadratic; raise ``block_len`` or
    pre-salt.  Shuffle carries (block/pair hash, id, key) only.
    """
    import pandas as pd

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([
        ("lid", pa.int64()), ("rid", pa.int64()),
        ("inter", pa.int64()), ("uni", pa.int64())])

    def tag_side(side: str, id_col: str):
        def tag(b: pa.Table) -> pa.Table:
            b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                                 pc.is_valid(b[key])))
            ids = pc.cast(b[id_col], pa.int64())
            k = pc.cast(b[key], pa.string())
            pre = pc.utf8_slice_codeunits(k, 0, block_len)
            rev = pc.utf8_reverse(k)
            suf = pc.utf8_reverse(
                pc.utf8_slice_codeunits(rev, 0, block_len))
            parts = []
            for tag_ch, blk in (("P", pre), ("S", suf)):
                bv = pc.binary_join_element_wise(
                    pa.array([tag_ch] * b.num_rows, type=pa.string()),
                    blk, "\x1f")
                parts.append(pa.table({
                    "__b": pa.array(md5_u64le(bv), type=pa.uint64()),
                    "bv": bv,
                    "side": pa.array([side] * b.num_rows,
                                     type=pa.string()),
                    "id": ids, "k": k}))
            return pa.concat_tables(parts)
        return tag

    def pairs_in_block(t: pa.Table) -> pa.Table:
        bv = t.column("bv").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        ks = t.column("k").to_numpy(zero_copy_only=False)
        is_l = side == "L"
        lmask, rmask = is_l, ~is_l
        lb, rb = bv[lmask], bv[rmask]
        lo_ = np.argsort(lb, kind="stable")
        lbs = lb[lo_]
        lids, lks = ids[lmask][lo_], ks[lmask][lo_]
        lo = np.searchsorted(lbs, rb, side="left")
        hi = np.searchsorted(lbs, rb, side="right")
        cnt = hi - lo
        ridx = np.repeat(np.arange(len(rb)), cnt)
        lidx = (np.repeat(lo, cnt)
                + (np.arange(cnt.sum()) - np.repeat(
                    np.cumsum(cnt) - cnt, cnt)))
        rids, rks = ids[rmask][ridx], ks[rmask][ridx]
        pair_key = pc.binary_join_element_wise(
            pc.cast(pa.array(lids[lidx]), pa.string()),
            pc.cast(pa.array(rids), pa.string()), "\x1f")
        return pa.table({
            "__p": pa.array(md5_u64le(pair_key), type=pa.uint64()),
            "lid": pa.array(lids[lidx]), "rid": pa.array(rids),
            "lk": pa.array(lks[lidx], type=pa.string()),
            "rk": pa.array(rks, type=pa.string())})

    def _grams(s: str) -> np.ndarray:
        if len(s) < 3:
            return np.empty(0, np.int64)
        c = np.array([ord(ch) for ch in s], dtype=np.int64)
        codes = (c[:-2] << 42) + (c[1:-1] << 21) + c[2:]
        return np.unique(codes)

    def verify(t: pa.Table) -> pa.Table:
        df = t.select(["lid", "rid", "lk", "rk"]).to_pandas()
        df = df.drop_duplicates(["lid", "rid"])
        if not len(df):
            return out_schema.empty_table()
        memo: dict = {}
        for s in pd.unique(pd.concat([df["lk"], df["rk"]])):
            memo[s] = _grams(s)
        inter = np.empty(len(df), dtype=np.int64)
        uni = np.empty(len(df), dtype=np.int64)
        for j, (a, b) in enumerate(zip(df["lk"], df["rk"])):
            ga, gb = memo[a], memo[b]
            i = len(np.intersect1d(ga, gb, assume_unique=True))
            inter[j] = i
            uni[j] = len(ga) + len(gb) - i
        keep = (uni > 0) & (inter * 1000 >= tau_permille * uni)
        return pa.table({
            "lid": pa.array(df["lid"].to_numpy(np.int64)[keep]),
            "rid": pa.array(df["rid"].to_numpy(np.int64)[keep]),
            "inter": pa.array(inter[keep]),
            "uni": pa.array(uni[keep])})

    import ray.data  # noqa: F401  (union requires initialized context)

    tagged = (left_ds.map_batches(tag_side("L", left_id),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(tag_side("R", right_id),
                                          batch_format="pyarrow")))
    cand_schema = pa.schema([
        ("__p", pa.uint64()), ("lid", pa.int64()),
        ("rid", pa.int64()), ("lk", pa.string()),
        ("rk", pa.string())])
    cands = grouped_exchange_ds(tagged, "__b", num_buckets,
                                pairs_in_block,
                                empty_schema=cand_schema)
    return grouped_exchange_ds(cands, "__p", num_buckets, verify,
                               empty_schema=out_schema)


def salted_join(left_ds, right_ds, key: str | list[str],
                left_values: list[str], right_values: list[str],
                right_key: str | list[str] | None = None,
                how: str = "inner", num_buckets: int = 64,
                n_salts: int = 8, hot_threshold: int | None = None,
                hot_keys: set | None = None):
    """Skew-aware hash join — ``hash_join`` semantics, but HOT keys
    (keys whose left-side multiplicity would flood one exchange
    bucket) are salted across ``n_salts`` sub-buckets: each hot left
    row gets one of S salts, the right side's hot-key rows are
    REPLICATED once per salt, and the join runs on the salted key —
    so a key holding 10% of the corpus spreads over S merge tasks
    instead of serializing one.  The result set is IDENTICAL to the
    unsalted join (every left row still meets every matching right
    row exactly once — in exactly one salt class).

    Hot keys come from ``hot_keys`` (an explicit set of key strings,
    multi-column keys in their ``"\\x1f"``-joined string form) or are
    DETECTED exactly at sketch cost via ``analytics.heavy_hitters``
    over the left side with ``hot_threshold`` (Count-Min nominate +
    exact verify — no key-cardinality state anywhere).  Detection
    consumes ``left_ds`` an extra time: pass a
    materialized-or-rescannable left.

    ``how`` is limited to ``inner | left | semi | anti`` — right/full
    outer would surface each unmatched hot right row once PER SALT
    (the replication is observable); use ``hash_join`` there and salt
    upstream.  Replication cost: |hot right rows| × n_salts shipped —
    hot keys are few by definition, size ``n_salts`` ≈ hot-key
    multiplicity / healthy-bucket size.
    """
    import ray

    from .analytics import heavy_hitters

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner|left|semi|anti, got {how!r} "
            f"(right/full would emit unmatched hot rights once per salt)")
    lkeys = [key] if isinstance(key, str) else list(key)
    rkeys = (lkeys if right_key is None else
             [right_key] if isinstance(right_key, str) else list(right_key))
    if hot_keys is None:
        if hot_threshold is None:
            raise ValueError("pass hot_threshold (left-count bound) or "
                             "an explicit hot_keys set")
        hh = heavy_hitters(left_ds.select_columns(lkeys), lkeys,
                           min_count=hot_threshold)
        hot_keys = set(
            "\x1f".join(str(hh[c].iloc[i]) for c in lkeys)
            for i in range(len(hh)))
    hot_ref = ray.put(np.sort(np.array(sorted(hot_keys), dtype=object)))

    def _keystr(b: pa.Table, keys: list[str]):
        arr = pc.cast(as_array(b[keys[0]]), pa.string())
        for kk in keys[1:]:
            arr = pc.binary_join_element_wise(
                arr, pc.cast(as_array(b[kk]), pa.string()), "\x1f")
        return arr  # null in ANY component -> null (matches nothing)

    def _salt_left(b: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        ks = _keystr(b, lkeys)
        kv = pc.fill_null(ks, "\x00").to_numpy(zero_copy_only=False)
        is_hot = np.isin(kv, hot) if len(hot) else np.zeros(len(kv), bool)
        salt = np.where(is_hot, np.arange(len(kv)) % n_salts, 0)
        sk = pc.binary_join_element_wise(
            ks, pa.array(salt.astype("U"), type=pa.string()), "\x1e")
        cols = {"__sk": sk}
        for c in left_values:
            cols[c] = b[c]
        return pa.table(cols)

    def _salt_right(b: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        ks = _keystr(b, rkeys)
        kv = pc.fill_null(ks, "\x00").to_numpy(zero_copy_only=False)
        is_hot = np.isin(kv, hot) if len(hot) else np.zeros(len(kv), bool)
        cold_idx = np.flatnonzero(~is_hot)
        hot_idx = np.flatnonzero(is_hot)
        idx = np.concatenate([cold_idx, np.repeat(hot_idx, n_salts)])
        salt = np.concatenate([
            np.zeros(len(cold_idx), dtype=np.int64),
            np.tile(np.arange(n_salts), len(hot_idx))])
        take = pa.array(idx)
        sk = pc.binary_join_element_wise(
            ks.take(take),
            pa.array(salt.astype("U"), type=pa.string()), "\x1e")
        cols = {"__sk": sk}
        for c in right_values:
            cols[c] = b[c].take(take) if b.num_rows else b[c]
        return pa.table(cols)

    left_salted = left_ds.map_batches(_salt_left, batch_format="pyarrow")
    right_proj = right_ds.select_columns(
        list(dict.fromkeys(rkeys + right_values)))
    right_salted = right_proj.map_batches(_salt_right,
                                          batch_format="pyarrow")
    return hash_join(left_salted, right_salted, "__sk",
                     left_values,
                     [] if how in ("semi", "anti") else right_values,
                     how=how, num_buckets=num_buckets)


def band_join(left_ds, right_ds, key: str, left_ts: str, right_ts: str,
              delta_us: int, left_values: list[str],
              right_values: list[str], right_key: str | None = None,
              num_buckets: int = 64):
    """Event-time BAND join: every (left, right) pair with equal keys
    and ``|left_ts − right_ts| <= delta_us`` — the stream-stream
    correlation join (click↔purchase within 30 min, impression↔
    conversion attribution windows).  Completes the temporal-join
    family: ``asof_join`` (nearest one), ``range_join`` (point in
    interval), band (symmetric window, many-to-many).

    Implementation is a reduction to :func:`range_join`: each right
    event widens to the interval ``[rt − delta, rt + delta]`` (one
    vectorized map — no extra shuffle), and ``max_span = 2·delta``
    keeps enumerated candidates ≈ true pairs.  Null keys/timestamps
    match nothing (SQL comparison semantics).  Pairs are output-sized;
    a hot key × wide band is quadratic — the query's property.
    """
    r_schema = right_ds.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    rkey = right_key or key
    keep = list(dict.fromkeys([rkey] + right_values))

    def widen(b: pa.Table) -> pa.Table:
        t = _ts_i64(b[right_ts]).to_numpy(zero_copy_only=False)
        valid = pc.is_valid(b[right_ts]).to_numpy(zero_copy_only=False)
        start = np.where(valid, t - delta_us, 0)
        end = np.where(valid, t + delta_us, 0)
        cols = {c: b[c] for c in keep}
        cols["__bstart"] = pa.array(start.astype(np.int64))
        cols["__bend"] = pa.array(end.astype(np.int64))
        vm = pa.array(valid)
        return pa.table(cols).filter(vm)

    widened = right_ds.select_columns(
        list(dict.fromkeys(keep + [right_ts]))
    ).map_batches(widen, batch_format="pyarrow")
    return range_join(left_ds, widened, key, left_ts,
                      "__bstart", "__bend", left_values, right_values,
                      right_key=rkey, max_span=2 * delta_us,
                      num_buckets=num_buckets)


def interval_join(left_ds, right_ds, key: str, left_start: str,
                  left_end: str, right_start: str, right_end: str,
                  left_values: list[str], right_values: list[str],
                  right_key: str | None = None,
                  max_right_span: int | None = None,
                  num_buckets: int = 64):
    """Distributed interval OVERLAP join: every (left, right) pair with
    equal keys whose closed intervals intersect —
    ``l_start <= r_end AND r_start <= l_end`` (SQL's canonical overlap
    predicate).  Completes the temporal-join family next to
    ``asof_join`` (nearest one), ``range_join`` (point in interval)
    and ``band_join`` (symmetric point window): this is the
    interval×interval case (session↔session co-presence, downtime↔
    deploy windows, ad-slot↔visit overlap).

    Same ONE-hash-exchange shape as :func:`range_join`; per bucket the
    right intervals sort once by (key, start) and each left interval's
    candidate slice is ``r_start <= l_end`` (hi from one merged
    lexsort via ``rank_into``), then candidates filter on
    ``r_end >= l_start``.  Pass ``max_right_span`` (the max right
    interval length, same units) to tighten ``lo`` to
    ``r_start >= l_start − max_right_span`` so enumerated candidates
    ≈ true pairs.  Null keys or bounds match nothing (SQL).  Output is
    pair-sized; a hot key where everything overlaps everything is
    quadratic — the query's property, not the operator's.
    """
    from ..stages.exchange import grouped_exchange_ds

    l_schema, r_schema = left_ds.schema(), right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    clash = set(left_values) & set(right_values)
    if clash:
        raise ValueError(f"left/right output columns collide: {clash}")
    rkey = right_key or key
    key_type = (pa.int64() if pa.types.is_integer(l_types[key])
                else pa.string())

    def _tag(b: pa.Table, is_left: bool) -> pa.Table:
        n = b.num_rows
        k_arr, bk = _key_arrays(b[key if is_left else rkey])
        s = _ts_i64(b[left_start if is_left else right_start])
        e = _ts_i64(b[left_end if is_left else right_end])
        cols = {"__b": pa.array(bk, type=pa.uint64()),
                "__k": pc.cast(k_arr, key_type), "__s": s, "__e": e,
                "__side": pa.array(np.full(n, np.int8(1 if is_left
                                                      else 0)))}
        for c in left_values:
            cols[c] = b[c] if is_left else pa.nulls(n, l_types[c])
        for c in right_values:
            cols[c] = pa.nulls(n, r_types[c]) if is_left else b[c]
        return pa.table(cols)

    tagged = (left_ds.map_batches(lambda b: _tag(b, True),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(lambda b: _tag(b, False),
                                          batch_format="pyarrow")))
    out_schema = pa.schema(
        [(c, l_types[c]) for c in left_values]
        + [(c, r_types[c]) for c in right_values])

    def merge(t: pa.Table) -> pa.Table:
        good = pc.and_(pc.and_(pc.is_valid(t.column("__k")),
                               pc.is_valid(t.column("__s"))),
                       pc.is_valid(t.column("__e"))).to_numpy(
                           zero_copy_only=False)
        t = t.filter(pa.array(good))
        if not t.num_rows:
            return None
        side = t.column("__side").to_numpy(zero_copy_only=False)
        kv = t.column("__k").to_numpy(zero_copy_only=False)
        _, codes = np.unique(kv, return_inverse=True)
        sv = t.column("__s").to_numpy(zero_copy_only=False)
        ev = t.column("__e").to_numpy(zero_copy_only=False)
        rsel = np.flatnonzero(side == 0)
        lsel = np.flatnonzero(side == 1)
        if not len(rsel) or not len(lsel):
            return None
        rcode, rstart = codes[rsel], sv[rsel]
        oi = np.lexsort((rstart, rcode))
        rcode, rstart = rcode[oi], rstart[oi]
        rend = ev[rsel][oi]
        rorig = rsel[oi]
        lcode, lstart, lend = codes[lsel], sv[lsel], ev[lsel]
        nl = len(lsel)

        # candidates: right intervals with r_start <= l_end
        hi = rank_into(rcode, rstart, lcode, lend, queries_first=False)
        if max_right_span is not None:
            lo = rank_into(rcode, rstart, lcode,
                           lstart - max_right_span, queries_first=True)
        else:
            lo = np.searchsorted(rcode, lcode, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return None
        first = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rep = np.repeat(np.arange(nl), counts)
        cand = np.arange(total) - np.repeat(first, counts) \
            + np.repeat(lo, counts)
        keep = rend[cand] >= lstart[rep]
        cand, rep = cand[keep], rep[keep]
        lidx = pa.array(lsel[rep])
        ridx = pa.array(rorig[cand])
        cols = {c: t.column(c).take(lidx) for c in left_values}
        for c in right_values:
            cols[c] = t.column(c).take(ridx)
        return pa.table(cols).cast(out_schema)

    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def merge_upsert(base_ds, delta_ds, key_cols: list[str],
                 values: list[str], op_col: str = "op",
                 delta_version_col: str | None = None,
                 num_buckets: int = 64):
    """CDC changelog MERGE (SQL ``MERGE INTO`` / Delta-Lake upsert):
    apply a changelog of upserts and deletes to a base snapshot and
    return the new current table.

    ``delta_ds`` must carry ``op_col`` with ``'u'`` (upsert: the row's
    ``values`` replace the base row, or insert if the key is new) or
    ``'d'`` (delete tombstone).  A delta row always beats the base row
    of its key; multiple delta rows per key are ordered by
    ``delta_version_col`` (int64/timestamp; required only when the
    changelog can hold several rows per key — ties break by the
    LARGEST version, ``latest_by_key``'s replay-deterministic rule).
    Base keys are assumed unique (a snapshot).

    Implementation is a composition, not a new exchange: both inputs
    tag a source epoch (base=0, delta=1) into a shared schema, one
    :func:`~verify_ray.pipelines.select.latest_by_key` pass keeps each
    key's winner, and tombstone winners filter out.  Cost = ONE hash
    exchange shipping only ``values`` — the same shape a 100 TB
    compaction needs (nothing driver-resident, deletes never
    materialize).
    """
    from .select import latest_by_key

    b_schema = base_ds.schema()
    b_types = dict(zip(b_schema.names, b_schema.types))

    def tag(is_delta: bool):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {c: b[c] for c in key_cols}
            for c in values:
                cols[c] = b[c]
            cols["__op"] = (pc.cast(as_array(b[op_col]), pa.string())
                            if is_delta
                            else pa.array(np.full(n, "u"), pa.string()))
            cols["__src"] = pa.array(
                np.full(n, np.int64(1 if is_delta else 0)))
            if is_delta and delta_version_col is not None:
                cols["__ver"] = _ts_i64(b[delta_version_col])
            else:
                cols["__ver"] = pa.array(np.zeros(n, np.int64))
            return pa.table(cols)
        return f

    tagged = (base_ds.map_batches(tag(False), batch_format="pyarrow")
              .union(delta_ds.map_batches(tag(True),
                                          batch_format="pyarrow")))
    out_cols = key_cols + values
    out_schema = pa.schema([(c, b_types[c]) for c in out_cols])

    def drop_tombstones(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["__op"], "d"))
        return b.select(out_cols).cast(out_schema)

    # tombstone drop rides INSIDE the exchange task (post_fn): a
    # map_batches after it would lose the schema on empty buckets
    # (Ray passes empty blocks through uncalled)
    return latest_by_key(tagged, key_cols, version_col="__src",
                         id_col="__ver",
                         values=key_cols + values + ["__op"],
                         num_buckets=num_buckets,
                         post_fn=drop_tombstones,
                         post_schema=out_schema)


def bloom_semi_join(left_ds, right_ds, key: str | list[str],
                    left_values: list[str],
                    right_key: str | list[str] | None = None,
                    how: str = "semi", bits_per_key: int = 16,
                    num_buckets: int = 64):
    """Bloom-prefiltered semi/anti join — EXACT results at a fraction
    of the exchange cost when few left rows match.

    Two phases: (1) the right side's DISTINCT key hashes are collected
    (map-side distinct per block, union on the driver — right is the
    SMALL side by contract, same as any broadcast build) and folded
    into a Bloom filter of ``bits_per_key`` bits/key (md5 double
    hashing, k=4 — ``contamination.bloom_bits_from_hashes``), which is
    ``ray.put`` ONCE; (2) every left block drops non-members with two
    vectorized bit probes — no false negatives, so survivors are a
    superset of true matches — and only the survivors (~match volume +
    fp rate) enter the exact :func:`hash_join` ``semi`` exchange that
    removes Bloom false positives.  ``how='anti'`` keeps exactness the
    same way: candidates = Bloom hits are resolved exactly, and rows
    the filter already cleared (definite non-members) bypass the
    exchange entirely and union back in.

    The scale point vs plain ``hash_join(semi)``: the exchange ships
    the SURVIVORS, not all of left — at a 1% hit rate that is a 100×
    smaller shuffle for 2 bytes/key of broadcast state (vs 8+ for an
    exact hash set).

    Consumption contract (same as ``top_k_by_score``): ``right_ds`` is
    consumed twice (distinct-hash pass + the exact exchange) and, for
    ``how='anti'``, ``left_ds`` twice (hits + misses) — pass
    materialized or cheaply-rescannable datasets, or an expensive lazy
    upstream chain re-executes.
    """
    from .contamination import bloom_bits_from_hashes, bloom_m_bits

    if how not in ("semi", "anti"):
        raise ValueError(f"how must be semi|anti: {how}")
    import ray

    keys = [key] if isinstance(key, str) else list(key)
    rkeys = ([right_key] if isinstance(right_key, str)
             else list(right_key) if right_key is not None else keys)

    def _valid_mask(b: pa.Table, cols: list[str]):
        mask = pc.is_valid(b[cols[0]])
        for c in cols[1:]:
            mask = pc.and_(mask, pc.is_valid(b[c]))
        return mask

    def _key_hash(b: pa.Table, cols: list[str]) -> np.ndarray:
        """md5_u64le of the \\x1f-joined string key (rows pre-filtered
        to valid keys)."""
        s = pc.cast(as_array(b[cols[0]]), pa.string())
        for c in cols[1:]:
            s = pc.binary_join_element_wise(
                s, pc.cast(as_array(b[c]), pa.string()), "\x1f")
        return md5_u64le(s)

    def right_distinct(b: pa.Table) -> pa.Table:
        b = b.filter(_valid_mask(b, rkeys))
        return pa.table({"h": pa.array(np.unique(_key_hash(b, rkeys)),
                                       pa.uint64())})

    parts = right_ds.map_batches(right_distinct,
                                 batch_format="pyarrow").to_pandas()
    rhash = np.unique(parts["h"].to_numpy().astype(np.uint64))
    m_bits = bloom_m_bits(max(len(rhash), 1), bits_per_key)
    bits_ref = ray.put(bloom_bits_from_hashes(rhash, m_bits))

    proj_cols = list(dict.fromkeys(keys + left_values))

    def probe(b: pa.Table):
        """(bloom hits, definite non-members) — hits carry possible
        false positives; null-key rows route by ``how`` (semi: match
        nothing → dropped; anti: unmatched → misses, hash_join
        parity)."""
        bits = ray.get(bits_ref)
        valid = _valid_mask(b, keys)
        b = b.select(proj_cols)
        nulls = b.filter(pc.invert(valid))
        b = b.filter(valid)
        h = _key_hash(b, keys)
        # same Kirsch-Mitzenmacher positions as bloom_bits_from_hashes
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        h2 = (h >> np.uint64(32)).astype(np.int64)
        hit = np.ones(len(h), dtype=bool)
        for j in range(4):
            hit &= bits[(h1 + j * h2) % m_bits]
        misses = b.filter(pa.array(~hit))
        if how == "anti" and nulls.num_rows:
            misses = pa.concat_tables([misses, nulls])
        return b.filter(pa.array(hit)), misses

    def probe_hits(b: pa.Table) -> pa.Table:
        return probe(b)[0]

    def probe_misses(b: pa.Table) -> pa.Table:
        return probe(b)[1]

    candidates = left_ds.map_batches(probe_hits, batch_format="pyarrow")
    resolved = hash_join(candidates, right_ds, keys,
                         left_values=left_values, right_values=[],
                         right_key=rkeys, how=how,
                         num_buckets=num_buckets)
    if how == "semi":
        return resolved
    # anti: Bloom misses (and null-key lefts — unmatched by SQL NOT
    # EXISTS, hash_join parity) are definitely unmatched; they skip
    # the exchange and union with the exactly-resolved candidates.
    misses = left_ds.map_batches(probe_misses, batch_format="pyarrow")

    def proj(b: pa.Table) -> pa.Table:
        return b.select(left_values)

    return resolved.map_batches(proj, batch_format="pyarrow").union(
        misses.map_batches(proj, batch_format="pyarrow"))


def write_bucketed(ds, key: str, num_buckets: int, out_dir: str):
    """Hash-bucketed parquet layout — write once, join many times.

    Rows route to ``bucket=<i>/part-0.parquet`` by the SAME
    join-compatible key hash ``hash_join`` uses (raw value for int64
    keys, md5_u64le of the string form otherwise — ``_key_arrays``),
    so two layouts written with equal ``num_buckets`` and key kinds
    are join-ALIGNED: ``bucketed_join`` reads bucket pairs directly
    and needs no exchange at join time — the storage-partitioned-join
    pattern for dimension/fact tables joined every epoch.  Null-key
    rows flow with the fill sentinel's bucket so outer modes still
    surface them.  A ``_meta.json`` (num_buckets, key kind) and a
    0-row ``_schema.parquet`` make the layout self-describing; empty
    buckets write no file.  Returns a manifest DataFrame
    (bucket, rows, path).
    """
    import json
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from ..stages.exchange import grouped_exchange

    schema = ds.schema()
    ktype = dict(zip(schema.names, schema.types))[key]
    kind = "int" if pa.types.is_integer(ktype) else "str"
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.schema(
        [(n, t) for n, t in zip(schema.names, schema.types)]
    ).empty_table(), f"{out_dir}/_schema.parquet")
    with open(f"{out_dir}/_meta.json", "w") as f:
        json.dump({"num_buckets": num_buckets, "key": key,
                   "key_kind": kind}, f)

    def tag(b: pa.Table) -> pa.Table:
        _, bk = _key_arrays(b[key])
        return b.append_column(
            "__b", pa.array(bk, type=pa.uint64()))

    def write_bucket(t: pa.Table) -> pa.Table:
        bid = int(t.column("__b")[0].as_py() % num_buckets)
        body = t.drop_columns(["__b"])
        d = f"{out_dir}/bucket={bid:05d}"
        os.makedirs(d, exist_ok=True)
        path = f"{d}/part-0.parquet"
        pq.write_table(body, path)
        return pa.table({"bucket": pa.array([bid], type=pa.int64()),
                         "rows": pa.array([body.num_rows],
                                          type=pa.int64()),
                         "path": pa.array([path], type=pa.string())})

    res = grouped_exchange(ds.map_batches(tag, batch_format="pyarrow"),
                           "__b", num_buckets, write_bucket,
                           drop_bucket=False)
    if res is None:
        return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                             "rows": pd.Series(dtype="int64"),
                             "path": pd.Series(dtype="string")})
    return (res.to_pandas().sort_values("bucket")
            .reset_index(drop=True))


def bucketed_join(dir_left: str, dir_right: str, key: str,
                  left_values: list[str], right_values: list[str],
                  right_key: str | None = None, how: str = "inner"):
    """Equi-join two ``write_bucketed`` layouts WITHOUT an exchange:
    bucket ``i`` of the left joins bucket ``i`` of the right in one
    Ray task (aligned storage partitioning — both layouts must have
    been written with the same ``num_buckets`` and key kind, which is
    validated from their ``_meta.json``).  Same semantics as
    ``hash_join`` (shared ``_equi_merge`` kernel): inner | left |
    right | full | semi | anti, SQL null-key behavior.

    Raw ``ray.remote`` per bucket pair is justified here (SURVEY
    §2.6): the Dataset API cannot express two-source aligned bucket
    reads; each task reads exactly two files and streams its result
    ref into the returned Dataset.
    """
    import json
    import os

    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    with open(f"{dir_left}/_meta.json") as f:
        lmeta = json.load(f)
    with open(f"{dir_right}/_meta.json") as f:
        rmeta = json.load(f)
    if lmeta["num_buckets"] != rmeta["num_buckets"]:
        raise ValueError(
            f"bucket counts differ: {lmeta['num_buckets']} vs "
            f"{rmeta['num_buckets']} — rewrite one layout")
    if lmeta["key_kind"] != rmeta["key_kind"]:
        raise ValueError(
            f"key kinds differ ({lmeta['key_kind']} vs "
            f"{rmeta['key_kind']}): int and string keys hash "
            "differently — cast one side before writing")
    if how in ("semi", "anti") and right_values:
        raise ValueError("semi/anti joins emit left columns only — "
                         "pass right_values=[]")
    B = int(lmeta["num_buckets"])
    lkey = key
    rkey = right_key or key
    l_schema = pq.read_schema(f"{dir_left}/_schema.parquet")
    r_schema = pq.read_schema(f"{dir_right}/_schema.parquet")
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    clash = set(left_values) & set(right_values)
    if clash:
        raise ValueError(f"left/right output columns collide: {clash}")
    key_type = (pa.int64() if lmeta["key_kind"] == "int" else pa.string())
    out_schema = pa.schema(
        [(c, l_types[c]) for c in left_values]
        + [(c, r_types[c]) for c in right_values])
    merge = _equi_merge(how, left_values, right_values, l_types,
                        r_types, out_schema)

    def _tagged(t: pa.Table, is_left: bool) -> pa.Table:
        n = t.num_rows
        cols = {"__k": pc.cast(as_array(t[lkey if is_left else rkey]),
                               key_type),
                "__side": pa.array(
                    np.full(n, np.int8(1 if is_left else 0)))}
        for c in left_values:
            cols[c] = t[c] if is_left else pa.nulls(n, l_types[c])
        for c in right_values:
            cols[c] = pa.nulls(n, r_types[c]) if is_left else t[c]
        return pa.table(cols)

    @ray.remote
    def join_bucket(lp, rp):
        lt = pq.read_table(lp) if lp else l_schema.empty_table()
        rt = pq.read_table(rp) if rp else r_schema.empty_table()
        tagged = pa.concat_tables(
            [_tagged(lt, True), _tagged(rt, False)])
        if tagged.num_rows == 0:
            return out_schema.empty_table()
        out = merge(tagged)
        return out if out is not None else out_schema.empty_table()

    refs = []
    for i in range(B):
        lp = f"{dir_left}/bucket={i:05d}/part-0.parquet"
        rp = f"{dir_right}/bucket={i:05d}/part-0.parquet"
        lp = lp if os.path.exists(lp) else None
        rp = rp if os.path.exists(rp) else None
        if lp is None and rp is None:
            continue
        refs.append(join_bucket.remote(lp, rp))
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    return rd.from_arrow_refs(refs)


def join_delta(left_old, left_delta, right_old, right_delta,
               key: str, left_values: list[str],
               right_values: list[str],
               right_key: str | None = None, num_buckets: int = 64):
    """Incremental inner-join maintenance (IVM) under INSERT-ONLY
    deltas: emit EXACTLY the join rows that are new after applying
    ``left_delta`` / ``right_delta`` to the old sides::

        Δ(L ⋈ R) = ΔL ⋈ R_old  ∪  L_old ⋈ ΔR  ∪  ΔL ⋈ ΔR

    i.e. every matching pair EXCEPT old×old — the classic delta rule
    (Blakeley et al. 1986, "Efficiently Updating Materialized Views").
    The pipeline refreshing a joined training view per ingest epoch
    recomputes only this delta and appends, instead of re-joining the
    world and diffing.

    Distributed shape: all four inputs are tagged (side, is_delta) and
    routed through ONE key exchange; each merge task enumerates its
    keys' pairs with the same searchsorted + repeat/arange kernel as
    ``hash_join`` and drops old×old pairs with one vectorized mask —
    the cost profile of a single L_new ⋈ R_new join that emits only
    delta rows, strictly cheaper than recompute-plus-diff (two full
    joins + an anti).  With the old sides persisted via
    ``write_bucketed`` the old shuffles disappear entirely: route the
    deltas with the same key/bucket-count and merge per aligned bucket
    (``bucketed_join``'s layout contract).

    Deletes/updates are out of scope by design (insert-only epochs —
    the append-only ingest contract); for upserts compose with
    ``merge_upsert`` upstream.  NULL keys match nothing (SQL).  Delta
    inputs must share the old sides' schemas.

    Partitioning assumption (SURVEY §2.6): one key's rows (old + delta,
    both sides) fit a merge task; salt hot keys upstream.
    """
    from ..stages.exchange import grouped_exchange_ds

    lkey = key
    rkey = key if right_key is None else right_key
    l_schema, r_schema = left_old.schema(), right_old.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    clash = set(left_values) & set(right_values)
    if clash:
        raise ValueError(f"left/right output columns collide: {clash}")
    key_type = (pa.int64() if pa.types.is_integer(l_types[lkey])
                else pa.string())

    def _tag(b: pa.Table, is_left: bool, is_delta: bool) -> pa.Table:
        kc = b[lkey if is_left else rkey]
        k_arr, bk = _key_arrays(pc.cast(as_array(kc), key_type))
        n = b.num_rows
        cols = {"__b": pa.array(bk, type=pa.uint64()),
                "__k": pc.cast(k_arr, key_type),
                "__side": pa.array(np.full(n, np.int8(1 if is_left
                                                      else 0))),
                "__d": pa.array(np.full(n, np.int8(1 if is_delta
                                                   else 0)))}
        for c in left_values:
            cols[c] = b[c] if is_left else pa.nulls(n, l_types[c])
        for c in right_values:
            cols[c] = pa.nulls(n, r_types[c]) if is_left else b[c]
        return pa.table(cols)

    def part(is_left: bool, is_delta: bool):
        return lambda b: _tag(b, is_left, is_delta)

    tagged = (left_old.map_batches(part(True, False),
                                   batch_format="pyarrow")
              .union(left_delta.map_batches(part(True, True),
                                            batch_format="pyarrow"))
              .union(right_old.map_batches(part(False, False),
                                           batch_format="pyarrow"))
              .union(right_delta.map_batches(part(False, True),
                                             batch_format="pyarrow")))
    out_schema = pa.schema(
        [(c, l_types[c]) for c in left_values]
        + [(c, r_types[c]) for c in right_values])

    def merge(t: pa.Table) -> pa.Table | None:
        side = t.column("__side").to_numpy(zero_copy_only=False)
        delta = t.column("__d").to_numpy(zero_copy_only=False)
        k_col = t.column("__k")
        valid = pc.is_valid(k_col).to_numpy(zero_copy_only=False)
        fill = 0 if pa.types.is_integer(k_col.type) else ""
        kv = pc.fill_null(k_col, fill).to_numpy(zero_copy_only=False)
        _, codes = np.unique(kv, return_inverse=True)
        lsel = np.flatnonzero((side == 1) & valid)
        rsel = np.flatnonzero((side == 0) & valid)
        if not len(lsel) or not len(rsel):
            return None
        rcode = codes[rsel]
        ro = np.argsort(rcode, kind="stable")
        rcode, rorig = rcode[ro], rsel[ro]
        lcode = codes[lsel]
        lo = np.searchsorted(rcode, lcode, side="left")
        hi = np.searchsorted(rcode, lcode, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if not total:
            return None
        first = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rep = np.repeat(np.arange(len(lsel)), counts)
        cand = (np.arange(total) - np.repeat(first, counts)
                + np.repeat(lo, counts))
        li, ri = lsel[rep], rorig[cand]
        keep = (delta[li] | delta[ri]).astype(bool)  # drop old×old
        if not keep.any():
            return None
        lidx, ridx = pa.array(li[keep]), pa.array(ri[keep])
        cols = {c: t.column(c).take(lidx) for c in left_values}
        for c in right_values:
            cols[c] = t.column(c).take(ridx)
        return pa.table(cols).cast(out_schema)

    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def snm_pairs(ds, id_col: str, key_col: str, window: int = 5,
              max_dist: int = 2, n_shards: int = 16,
              sample_mod: int = 16, trunc: int = 32):
    """Sorted-Neighborhood record linkage (Hernández & Stolfo 1995):
    sort the corpus by a blocking key, compare each row only with its
    ``window`` successors in the GLOBAL (key, id) order, keep pairs
    with byte-Levenshtein ≤ ``max_dist`` — the O(n·w) linkage method
    for near-duplicates that SORT near each other, complementing
    ``fuzzy_join``'s prefix/suffix blocking.  Returns a DataFrame
    (id_a, id_b, dist), id_a the order-earlier member; output is
    match-sized (SQL oracle: ROW_NUMBER self-join on rank distance).

    Distributed shape — no global sort, nothing row-sized on the
    driver:

    - range splitters from a DETERMINISTIC hash sample of distinct
      keys (md5 % ``sample_mod`` == 0 → quantile cut points), so
      shard routing is reproducible across runs and engines;
    - ONE shard exchange: each task sorts its shard once and
      enumerates in-shard window pairs with the repeat/arange
      kernel + the shared vectorized Levenshtein DP
      (``text._levenshtein_block``);
    - every cross-shard window pair has both members within
      ``window`` rows of a shard edge, so each task also emits its
      first/last ``window`` rows (with absolute in-shard positions)
      plus its row count; the driver reconstructs exact GLOBAL
      positions from the count prefix sums and resolves cross-shard
      pairs over that (≤ 2·w·shards)-row frame with the same kernel
      — correct even across empty or sub-window shards.

    Null key/id rows drop; keys compare truncated to ``trunc``
    codepoints on both engines.
    """
    import pandas as pd
    import ray

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from .text import _levenshtein_block

    # pass 1: deterministic sample -> range splitters
    def sample_partial(b: pa.Table) -> pa.Table:
        col = b[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.cast(col, pa.string()).drop_null()
        if not len(col):
            return pa.table({"k": pa.array([], pa.string())})
        u = pc.unique(col)
        pick = md5_u64le(u) % np.uint64(sample_mod) == 0
        return pa.table({"k": u.filter(pa.array(pick))})

    parts = [t for t in ray.get(
        ds.map_batches(sample_partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    sample = (np.unique(np.concatenate(
        [t.column("k").to_numpy(zero_copy_only=False).astype(object)
         for t in parts])) if parts else np.empty(0, object))
    if len(sample) and n_shards > 1:
        idx = np.unique((np.arange(1, n_shards) * len(sample))
                        // n_shards)
        splitters = np.unique(sample[idx[idx < len(sample)]])
    else:
        splitters = np.empty(0, object)

    # pass 2: shard exchange
    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[key_col])))
        k = pc.cast(b[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        shard = np.searchsorted(splitters, k, side="right")
        return pa.table({
            "__b": pa.array(shard.astype(np.int64)),
            "i": pc.cast(b[id_col], pa.int64()),
            "k": pa.array(k, pa.string())})

    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                        ("dist", pa.int64()), ("kind", pa.int8()),
                        ("k", pa.string()), ("shard", pa.int64()),
                        ("p", pa.int64())])

    def windowed(t: pa.Table) -> pa.Table:
        shard_id = int(t.column("__b")[0].as_py())
        ids = t.column("i").to_numpy(zero_copy_only=False)
        ks = t.column("k").to_numpy(
            zero_copy_only=False).astype(object)
        o = np.lexsort((ids, ks))
        ids, ks = ids[o], ks[o]
        n = len(ids)
        rows = []
        for d in range(1, min(window, n - 1) + 1):
            a = np.arange(n - d)
            b_ = a + d
            dist = _levenshtein_block(list(ks[a]), list(ks[b_]),
                                      trunc)
            hit = dist <= max_dist
            if hit.any():
                m = int(hit.sum())
                rows.append(pa.table({
                    "id_a": pa.array(ids[a[hit]]),
                    "id_b": pa.array(ids[b_[hit]]),
                    "dist": pa.array(dist[hit]),
                    "kind": pa.array(np.zeros(m, np.int8)),
                    "k": pa.array([""] * m, pa.string()),
                    "shard": pa.array(np.full(m, -1, np.int64)),
                    "p": pa.array(np.full(m, -1, np.int64))}))
        sel = np.unique(np.concatenate(
            [np.arange(min(window, n)),
             np.arange(max(n - window, 0), n)]))
        m = len(sel)
        rows.append(pa.table({
            "id_a": pa.array(ids[sel]),
            "id_b": pa.array(np.full(m, -1, np.int64)),
            "dist": pa.array(np.full(m, -1, np.int64)),
            "kind": pa.array(np.ones(m, np.int8)),
            "k": pa.array(list(ks[sel]), pa.string()),
            "shard": pa.array(np.full(m, shard_id, np.int64)),
            "p": pa.array(sel.astype(np.int64))}))
        rows.append(pa.table({
            "id_a": pa.array([np.int64(-1)]),
            "id_b": pa.array([np.int64(-1)]),
            "dist": pa.array([np.int64(n)]),
            "kind": pa.array([np.int8(2)]),
            "k": pa.array([""], pa.string()),
            "shard": pa.array([np.int64(shard_id)]),
            "p": pa.array([np.int64(-1)])}))
        return pa.concat_tables([r.cast(schema) for r in rows])

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", n_shards + 1, windowed,
                           drop_bucket=False)
    cols = ["id_a", "id_b", "dist"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    df = res.to_pandas()
    pairs = df[df.kind == 0][cols].copy()
    # driver: exact global positions for the boundary frame
    counts = (df[df.kind == 2].set_index("shard")["dist"]
              .to_dict())
    offsets, acc = {}, 0
    for s in sorted(counts):
        offsets[s] = acc
        acc += counts[s]
    bnd = df[df.kind == 1].copy()
    if len(bnd):
        bnd["gpos"] = (bnd["shard"].map(offsets).astype("int64")
                       + bnd["p"].astype("int64"))
        bnd = bnd.sort_values("gpos").reset_index(drop=True)
        ga = bnd["gpos"].to_numpy()
        ia = bnd["id_a"].to_numpy()
        sa = bnd["shard"].to_numpy()
        ka = bnd["k"].to_numpy(dtype=object)
        al, bl = [], []
        for d in range(1, window + 1):
            if d >= len(ga):
                break
            a = np.arange(len(ga) - d)
            b_ = a + d
            ok = (ga[b_] - ga[a] <= window) & (sa[a] != sa[b_])
            al.append(a[ok])
            bl.append(b_[ok])
        if al and sum(len(x) for x in al):
            ai = np.concatenate(al)
            bi = np.concatenate(bl)
            dist = _levenshtein_block(list(ka[ai]), list(ka[bi]),
                                      trunc)
            hit = dist <= max_dist
            if hit.any():
                pairs = pd.concat([pairs, pd.DataFrame({
                    "id_a": ia[ai[hit]], "id_b": ia[bi[hit]],
                    "dist": dist[hit]})], ignore_index=True)
    return (pairs.sort_values(cols).reset_index(drop=True)
            .astype({c: "int64" for c in cols}))


def window_attribution(conv_ds, touch_ds, key: str = "user_id",
                       ts: str = "ts", conv_id: str = "buy_id",
                       touch_id: str = "click_id",
                       window_us: int = 7 * 86_400_000_000,
                       num_buckets: int = 32):
    """LINEAR multi-touch attribution assignment — the generalization
    of last-touch (``asof_join`` backward) to EVERY touch in the
    lookback window: each conversion row is paired with ALL of its
    key's touches with ``conv_ts − window ≤ touch_ts ≤ conv_ts``, and
    carries ``n_touch`` (that conversion's touch count) so each pair's
    linear credit is the exact rational 1/n_touch — no float policy.
    Conversions with zero in-window touches emit nothing.  Null
    key/ts/id rows drop.  Returns a Dataset
    ``(buy_id, user_id, click_id, n_touch)``.

    Scale shape: ONE key-hashed exchange co-locates each key's
    conversions and touches; per bucket, touches sort once by
    (key, ts) and every conversion's window is two ``searchsorted``
    calls + repeat/arange enumeration (no per-key loop).  Per-task
    bound: one key's rows and its window pair fan-out (SURVEY §2.6 —
    salt pathological keys upstream).
    """
    from ..stages.exchange import grouped_exchange_ds
    from .graph import _pair_struct

    out_schema = pa.schema([
        (conv_id, pa.int64()), (key, pa.int64()),
        (touch_id, pa.int64()), ("n_touch", pa.int64())])

    def tag(which_id, side):
        def f(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts])),
                        pc.is_valid(b[which_id]))
            b = b.filter(m)
            k, bk = _key_arrays(b[key])
            return pa.table({
                "__b": pa.array((bk % np.uint64(num_buckets))
                                .astype(np.int64)),
                "k": k,
                "t": _ts_i64(b[ts]),
                "i": pc.cast(b[which_id], pa.int64()),
                "s": pa.array(np.full(b.num_rows, side, dtype=np.int8))})
        return f

    def resolve(t: pa.Table) -> pa.Table:
        empty = out_schema.empty_table()
        k = t.column("k").to_numpy(zero_copy_only=False)
        tv = t.column("t").to_numpy(zero_copy_only=False)
        iv = t.column("i").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        tsel = np.flatnonzero(s == 0)
        csel = np.flatnonzero(s == 1)
        if not len(tsel) or not len(csel):
            return empty
        tstruct = _pair_struct(k[tsel], tv[tsel])
        order = np.argsort(tstruct, kind="stable")
        tstruct, tids = tstruct[order], iv[tsel][order]
        lo = np.searchsorted(tstruct,
                             _pair_struct(k[csel], tv[csel] - window_us),
                             side="left")
        hi = np.searchsorted(tstruct, _pair_struct(k[csel], tv[csel]),
                             side="right")
        n = hi - lo
        total = int(n.sum())
        if total == 0:
            return empty
        rep = np.repeat(np.arange(len(csel)), n)
        csum = np.concatenate(([0], np.cumsum(n)))
        pos = np.arange(total) - np.repeat(csum[:-1], n) + np.repeat(lo, n)
        return pa.table({
            conv_id: pa.array(iv[csel][rep]),
            key: pa.array(k[csel][rep]),
            touch_id: pa.array(tids[pos]),
            "n_touch": pa.array(n[rep])}).cast(out_schema)

    tagged = (conv_ds.map_batches(tag(conv_id, 1), batch_format="pyarrow")
              .union(touch_ds.map_batches(tag(touch_id, 0),
                                          batch_format="pyarrow")))
    return grouped_exchange_ds(tagged, "__b", num_buckets, resolve,
                               empty_schema=out_schema)
