"""Deterministic corpus shuffle → training shard layout.

The last step of a training-data pipeline is a GLOBAL pseudo-random
shuffle of the corpus written as N shards (so data loaders stream
shards sequentially yet see a well-mixed order).  ``Dataset.
random_shuffle`` gives a nondeterministic all-to-all; this operator
instead derives the entire layout from key bytes:

    shard(k) = md5_number_upper(k) % n_shards
    pos(k)   = rank of (md5_number_upper(k), k) within the shard

— reproducible across runs/engines/parallelism (re-running a failed
job yields byte-identical shards, so shard files are independently
resumable), and md5 makes the order uncorrelated with any input
attribute, which is exactly what "shuffled" means operationally.

Scale shape: one streaming pass attaches ``(shard, h)``; the sort-free
hash exchange co-locates each shard in one merge task, which does a
single ``np.lexsort`` over that shard only — there is NO global sort,
and shard size = corpus / n_shards is the per-task memory bound (size
``n_shards`` so a shard fits a worker: at 100 TB with 4 GB shards,
n_shards ≈ 25,000 — the two-level tree exchange keeps the ref fan-out
O(M×√B), stages/exchange.py).  Results stay in the object store
(``grouped_exchange_ds``), one block per shard, ready for
``write_parquet`` as one file per shard.

SQL parity: ``ROW_NUMBER() OVER (PARTITION BY shard ORDER BY
md5_number_upper(k), k) - 1`` (exact — h is compared as UBIGINT on
both sides; ties broken by the key string, codepoint order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le


def shard_layout(ds, n_shards: int, key_col: str = "doc_id"):
    """Dataset with ``shard`` (int64) and ``pos`` (int64, 0-based rank
    within the shard) columns appended; rows with null keys are
    dropped (they have no deterministic place).  One exchange, no
    global sort; each output block is one complete shard."""
    from ..stages.exchange import grouped_exchange_ds

    def add_keys(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string())
        sub = b.filter(pc.is_valid(keys))
        if sub.num_rows == 0:
            return (sub.append_column("shard", pa.array([], pa.int64()))
                    .append_column("_h", pa.array([], pa.uint64())))
        h = md5_u64le(pc.cast(sub[key_col], pa.string()))
        return (sub.append_column(
                    "shard", pa.array((h % n_shards).astype(np.int64)))
                .append_column("_h", pa.array(h, type=pa.uint64())))

    keyed = ds.map_batches(add_keys, batch_format="pyarrow")

    def per_shard(t: pa.Table) -> pa.Table:
        h = t.column("_h").to_numpy(zero_copy_only=False).astype(np.uint64)
        k = np.asarray(
            pc.cast(t[key_col], pa.string()).to_numpy(zero_copy_only=False),
            dtype=object)
        order = np.lexsort((k, h))
        t = t.take(pa.array(order)).drop_columns(["_h"])
        return t.append_column(
            "pos", pa.array(np.arange(t.num_rows, dtype=np.int64)))

    schema = add_keys(
        ds.schema().base_schema.empty_table()).drop_columns(["_h"]).schema
    schema = schema.append(pa.field("pos", pa.int64()))
    return grouped_exchange_ds(keyed, "shard", n_shards, per_shard,
                               empty_schema=schema, drop_bucket=False)


def epoch_readers(ds, n_consumers: int, equal: bool = False,
                  locality_hints=None):
    """Split a (typically ``shard_layout``-ordered) Dataset into
    ``n_consumers`` disjoint streaming iterators — the Ray-native
    training-ingest fan-out: each trainer worker consumes ONE reader
    with backpressure, no worker sees another's rows, and together
    they cover the dataset exactly once per epoch.

    Thin, deliberate wrapper over ``Dataset.streaming_split`` so the
    ingest contract is pinned here: ``equal=False`` preserves every
    row (the correctness default — the last reader may get fewer);
    ``equal=True`` equalizes per-consumer row counts by DROPPING the
    remainder, which data-parallel trainers need for synchronized
    step counts — choose it explicitly.  Pass ``locality_hints``
    (actor handles) so each split prefers blocks co-located with its
    consumer at multi-node scale.

    CONSUMPTION CONTRACT: the readers barrier on each other — every
    reader must be consumed CONCURRENTLY (one per trainer worker /
    thread).  Draining them sequentially in one thread deadlocks.
    """
    return ds.streaming_split(n_consumers, equal=equal,
                              locality_hints=locality_hints)


def sort_by_range(ds, value_col: str, id_col: str, n_shards: int,
                  values: list[str] | None = None):
    """Exact distributed sort by (value, id) via RANGE partitioning —
    the classic external-sort shape, with no all-to-all ``ds.sort``:
    shard i holds the value range [s_i, s_{i+1}) and is internally
    sorted, so concatenating shards 0..n-1 in order IS the total
    order (sorted-output writer / merge-join preparation).  Emits
    ``values...`` + ``shard_id`` (int64) + ``pos`` (int64, 1-based
    rank within the shard); one output block per shard, ready for
    ``sinks.write_sharded`` one-file-per-shard.

    Splitters are EXACT order statistics, not samples: a value-count
    pass reduces the corpus to driver-side (value → count) pairs
    (integer values by repo policy) and splitter i = the smallest
    value whose cumulative count reaches ``ceil(i·n / n_shards)`` —
    so shards are balanced up to value-tie granularity, and the rule
    is restated verbatim in the SQL oracle (no sampling
    nondeterminism).  Rows route by ``searchsorted(splitters, v,
    side='right')`` (= count of splitters ≤ v), each shard sorts its
    own rows with one lexsort.  All rows sharing one value land in
    one shard — a value held by >1/n_shards of the corpus skews that
    shard; pre-salt such scores upstream if shard balance matters
    more than value contiguity.

    Null value/id rows are dropped (no place in the order; SQL
    parity filters the same rows).

    ``ds`` must be materialized-or-rescannable (consumed twice:
    value-count pass + exchange pass) — ``.materialize()`` an
    expensive lazy upstream first.
    """
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds
    from .select import value_counts

    vals_list = values if values is not None else [id_col, value_col]
    if id_col not in vals_list:
        raise ValueError(
            f"values must include id_col {id_col!r} (the shard tasks "
            f"sort by it)")
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in vals_list]
                           + [("shard_id", pa.int64()),
                              ("pos", pa.int64())])

    def drop_nulls(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(pc.is_valid(b[value_col]),
                                pc.is_valid(b[id_col])))

    sv, counts = value_counts(
        ds.map_batches(drop_nulls, batch_format="pyarrow"), value_col)
    splitters = np.empty(0, dtype=np.int64)
    if len(sv) and n_shards > 1:
        cum = np.cumsum(counts)
        n = int(cum[-1])
        ranks = np.array([(i * n + n_shards - 1) // n_shards
                          for i in range(1, n_shards)])
        idx = np.minimum(np.searchsorted(cum, ranks), len(sv) - 1)
        splitters = sv[idx]

    def tag(b: pa.Table) -> pa.Table:
        b = drop_nulls(b)
        v = pc.cast(as_array(b[value_col]), pa.int64())
        shard = np.searchsorted(
            splitters, v.to_numpy(zero_copy_only=False), side="right")
        cols = {"__shard": pa.array(shard.astype(np.int64)), "__v": v}
        for c in vals_list:
            cols[c] = b[c]
        return pa.table(cols)

    def sort_shard(t: pa.Table) -> pa.Table:
        v = t.column("__v").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v))
        shard = t.column("__shard").to_numpy(zero_copy_only=False)
        out = t.select(vals_list).take(pa.array(order))
        return (out.append_column(
                    "shard_id", pa.array(shard[order]))
                .append_column(
                    "pos", pa.array(np.arange(1, t.num_rows + 1,
                                              dtype=np.int64))))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__shard", max(n_shards, 1),
                               sort_shard, empty_schema=out_schema,
                               drop_bucket=False)


def late_arrivals(ds, order_col: str, ts_col: str, watermark_us: int,
                  n_shards: int = 64):
    """Watermark late-event detection via a DISTRIBUTED ORDERED PREFIX
    SCAN — the streaming-ingestion audit: with rows ordered by
    ``order_col`` (the ingestion sequence, e.g. event_id), the running
    watermark at a row is max(ts) over all PRIOR rows, and a row is
    late when ts + watermark_us < watermark.  Returns a resident
    Dataset of (order_col, late_by_us) for the late rows
    (late_by_us = watermark − ts, > watermark_us).

    Scale shape — the classic two-phase parallel prefix scan, never a
    global sort: rows range-shard by order position
    (shard = (o − min)·S // span; dense sequence ids assumed for
    BALANCE only — skew never affects correctness); per-shard ts-max
    partials reduce to S driver-side rows; the driver computes the
    EXCLUSIVE prefix max across shard order (an S-sized scan) and each
    shard task combines that carry-in with its within-shard exclusive
    running max.  Rows cross the wire exactly once (one exchange);
    per-task memory is one shard.  The S-sized carry vector rides in
    the merge-task closure — size ``n_shards`` to worker count, not
    data.  ``ts_col`` compares as int64 (timestamps cast to epoch-µs);
    null order/ts rows are dropped (no place in the order).

    SQL parity: ``MAX(ts) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` then ``ts < wm − watermark_us``.
    """
    from ..stages.exchange import grouped_exchange_ds

    LOW = np.iinfo(np.int64).min
    out_schema = pa.schema([(order_col, pa.int64()),
                            ("late_by_us", pa.int64())])

    def clean(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[order_col]),
                             pc.is_valid(b[ts_col])))
        return pa.table({
            order_col: pc.cast(b[order_col], pa.int64()),
            "__ts": pc.cast(b[ts_col], pa.int64()),
        })

    cleaned = ds.map_batches(clean, batch_format="pyarrow")

    # pass 0: order-key bounds (one tiny row per block reaches the driver)
    bounds = cleaned.map_batches(
        lambda b: pa.table(
            {"mn": pa.array([pc.min(b[order_col]).as_py()], pa.int64()),
             "mx": pa.array([pc.max(b[order_col]).as_py()], pa.int64())})
        if b.num_rows else pa.table({"mn": pa.array([], pa.int64()),
                                     "mx": pa.array([], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    if "mn" not in bounds.columns:
        # all-empty blocks pass through with the pre-map schema
        bounds = bounds.iloc[0:0].assign(mn=None, mx=None)
    bounds = bounds.dropna()
    if len(bounds) == 0:
        import ray.data as rd
        return rd.from_arrow(out_schema.empty_table())
    mn, mx = int(bounds["mn"].min()), int(bounds["mx"].max())
    S = max(1, min(n_shards, mx - mn + 1))
    span = mx - mn + 1

    def tag(b: pa.Table) -> pa.Table:
        o = b[order_col].to_numpy(zero_copy_only=False)
        shard = ((o - mn) * S) // span
        return b.append_column("__shard",
                               pa.array(shard.astype(np.int64)))

    tagged = cleaned.map_batches(tag, batch_format="pyarrow").materialize()

    # pass 1: per-(block, shard) ts-max partials -> S-sized driver merge
    def shard_max(b: pa.Table) -> pa.Table:
        agg = b.group_by(["__shard"], use_threads=False).aggregate(
            [("__ts", "max")])
        return agg.select(["__shard", "__ts_max"])

    parts = tagged.map_batches(shard_max,
                               batch_format="pyarrow").to_pandas()
    smax = np.full(S, LOW, dtype=np.int64)
    if len(parts):
        g = parts.groupby("__shard")["__ts_max"].max()
        smax[g.index.to_numpy(dtype=np.int64)] = g.to_numpy(np.int64)
    carry = np.full(S, LOW, dtype=np.int64)
    if S > 1:
        carry[1:] = np.maximum.accumulate(smax[:-1])

    # pass 2: per-shard exclusive running max + carry-in -> late rows
    def flag_shard(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False)
        ts = t.column("__ts").to_numpy(zero_copy_only=False)
        sid = int(t.column("__shard")[0].as_py())
        order = np.argsort(o, kind="stable")
        o, ts = o[order], ts[order]
        excl = np.empty(len(ts), dtype=np.int64)
        excl[0] = LOW
        if len(ts) > 1:
            np.maximum.accumulate(ts[:-1], out=excl[1:])
        wm = np.maximum(excl, carry[sid])
        late = (wm > LOW) & (ts + watermark_us < wm)
        return pa.table({order_col: pa.array(o[late]),
                         "late_by_us": pa.array(wm[late] - ts[late])})

    return grouped_exchange_ds(tagged, "__shard", S, flag_shard,
                               empty_schema=out_schema,
                               drop_bucket=False)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of ``v`` into the even bit
    positions (classic Morton magic-number spread)."""
    v = v.astype(np.int64) & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def morton16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit quantized coordinates into a 32-bit
    Z-order (Morton) key — bit i of x at position 2i, of y at 2i+1."""
    return _part1by1(x) | (_part1by1(y) << 1)


def _col_range(ds, col: str) -> tuple[int, int]:
    """Global (min, max) of an integer column — per-batch partials,
    one tiny driver merge."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        v = pc.cast(b[col], pa.int64()).drop_null()
        if not len(v):
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": [pc.min(v).as_py()],
                         "hi": [pc.max(v).as_py()]})

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        raise ValueError(f"column {col!r} has no non-null values")
    t = pa.concat_tables(parts)
    return (pc.min(t["lo"]).as_py(), pc.max(t["hi"]).as_py())


def zorder_key(ds, col_x: str, col_y: str, out_col: str = "zkey"):
    """Append a Z-order (Morton) clustering key over TWO integer
    columns — the multi-dimensional layout trick (Morton 1966; the
    Delta/Iceberg ``ZORDER BY``): sorting by the interleaved key
    keeps rows close in BOTH dimensions, so per-file min/max
    statistics prune 2-D range queries that a single-column sort can
    only prune in one dimension.

    Each column is quantized to 16 bits against its global [min, max]
    (``q = (v − lo) · 65535 // span`` — two tiny range passes), then
    bit-interleaved.  Returns ``(ds_with_key, meta)`` where meta
    records the quantization ranges (layout metadata).  Null in
    either column drops the row (no position in the order).  Compose
    with ``sort_by_range(out_col, ...)`` + ``sinks.write_sharded``
    for the layout, and prune reads with TWO ``zonemap`` manifests
    (one per original column) — the z-sort is what makes both
    manifests selective at once.

    ``ds`` must be materialized-or-rescannable (consumed three times:
    two range passes + the keyed pass).
    """
    lo_x, hi_x = _col_range(ds, col_x)
    lo_y, hi_y = _col_range(ds, col_y)
    span_x = max(hi_x - lo_x, 1)
    span_y = max(hi_y - lo_y, 1)

    def add_key(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[col_x]),
                             pc.is_valid(b[col_y])))
        x = pc.cast(b[col_x], pa.int64()).to_numpy(
            zero_copy_only=False)
        y = pc.cast(b[col_y], pa.int64()).to_numpy(
            zero_copy_only=False)
        qx = (x - lo_x) * 65535 // span_x
        qy = (y - lo_y) * 65535 // span_y
        return b.append_column(out_col,
                               pa.array(morton16(qx, qy)))

    meta = {"lo_x": lo_x, "hi_x": hi_x, "lo_y": lo_y, "hi_y": hi_y}
    return ds.map_batches(add_key, batch_format="pyarrow"), meta


def audit_sorted_layout(ds, value_col: str,
                        shard_col: str = "shard_id",
                        pos_col: str = "pos",
                        num_buckets: int = 32) -> pd.DataFrame:
    """Layout-order audit: verify that a (shard, pos)-addressed
    layout (the ``sort_by_range`` / ``write_sharded`` contract —
    concatenating shards in order IS the total order) is actually
    globally non-decreasing in ``value_col``, and report every
    violation row ``(shard_id, pos, value, prev_value)`` where the
    value dips below its global predecessor.  The sorted-output
    validation a consumer (merge join, binary search, range reader)
    runs before trusting a layout.

    Distributed shape: ONE shard-keyed exchange checks each shard
    INTERNALLY (lexsort by pos + shifted compare — violation rows
    only leave the task) and emits each shard's (first, last) value;
    the cross-shard BOUNDARY check runs on the driver over the
    shard-count-sized boundary frame.  Null value/pos rows are
    layout corruption and are reported with ``prev_value`` null.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        sid = pc.cast(b[shard_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "__b": pa.array(sid % num_buckets),
            "s": pa.array(sid),
            "p": pc.cast(b[pos_col], pa.int64()),
            "v": pc.cast(b[value_col], pa.int64())})

    def check(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        p = t.column("p").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        o = np.lexsort((p, s))
        ss, ps, vs = s[o], p[o], v[o]
        same = ss[1:] == ss[:-1]
        bad = same & (vs[1:] < vs[:-1])
        idx = np.flatnonzero(bad) + 1
        # per-shard endpoints for the driver boundary check
        first = np.ones(len(ss), dtype=bool)
        first[1:] = ss[1:] != ss[:-1]
        fs = np.flatnonzero(first)
        ls = np.append(fs[1:], len(ss)) - 1
        endp = pa.table({
            "s": pa.array(ss[fs]), "p": pa.array(ps[fs]),
            "v": pa.array(vs[fs]), "pv": pa.array(vs[ls]),
            "kind": pa.array(np.ones(len(fs), np.int8))})
        viol = pa.table({
            "s": pa.array(ss[idx]), "p": pa.array(ps[idx]),
            "v": pa.array(vs[idx]), "pv": pa.array(vs[idx - 1]),
            "kind": pa.array(np.zeros(len(idx), np.int8))})
        return pa.concat_tables([viol, endp])

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, check)
    cols = ["shard_id", "pos", "value", "prev_value"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    df = res.to_pandas()
    viol = df[df.kind == 0][["s", "p", "v", "pv"]]
    ends = df[df.kind == 1].sort_values("s")
    # boundary: shard i's first value vs shard i-1's last value
    if len(ends) > 1:
        prev_last = ends.pv.shift(1)
        bad = ends.v < prev_last
        bviol = pd.DataFrame({
            "s": ends.s[bad], "p": ends.p[bad],
            "v": ends.v[bad], "pv": prev_last[bad].astype("int64")})
        viol = pd.concat([viol, bviol], ignore_index=True)
    viol.columns = cols
    return (viol.sort_values(["shard_id", "pos"])
            .reset_index(drop=True).astype(
        {c: "int64" for c in cols}))


def rendezvous_assign(ds, key_col: str, nodes: list[str]):
    """Rendezvous (highest-random-weight) hashing: assign every key
    to the node maximizing ``md5(key || '@' || node)`` (Thaler &
    Ravishankar 1998) — the consistent-assignment rule whose defining
    property is MINIMAL MOVEMENT: removing a node remaps ONLY that
    node's keys (pytest-pinned), unlike mod-N hashing which reshuffles
    almost everything.  The owner-selection primitive for stateful
    actor routing / cache affinity.  Returns a streaming Dataset
    ``(key, node)``; ties (astronomically unlikely u64 md5 equality)
    break to the lexicographically smallest node, stated in the SQL
    restatement.  Null keys drop; pure map, no shuffle.
    """
    from ..functions.hashing import md5_u64le

    if not nodes:
        raise ValueError("nodes must be non-empty")
    nodes_sorted = sorted(nodes)

    def assign(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key_col]))
        keys = pc.cast(b[key_col], pa.string())
        n = len(keys)
        best = np.zeros(n, dtype=np.uint64)
        owner = np.zeros(n, dtype=np.int64)
        for ni, node in enumerate(nodes_sorted):
            salted = pc.binary_join_element_wise(
                keys, pa.array(["@" + node] * n, pa.string()), "")
            h = md5_u64le(salted)
            better = h > best  # strict: ties keep the earlier node
            best = np.where(better, h, best)
            owner = np.where(better, ni, owner)
        return pa.table({
            "key": keys,
            "node": pa.array(
                np.array(nodes_sorted, dtype=object)[owner],
                pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow")
