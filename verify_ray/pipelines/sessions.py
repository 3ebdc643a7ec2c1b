"""Sessionization: gap-based session windows over the events log.

Ray Data has no event-time window/watermark machinery, so sessions are
computed with the batch-engine pattern: hash-partition events into
user-keyed BUCKETS (bucket count sized from the data), and inside each
bucket sort once by (user, ts) and derive every user's session
boundaries in one vectorized diff/cumsum/reduceat pass.  There is NO
per-user group dispatch — at 10^9 users a ``groupby(user).map_groups``
would pay Ray's sort-groupby plus a pandas call per user; here the
per-task unit is a whole bucket (~``rows_per_bucket`` events), and the
bucket count grows with the data.

The shuffle moves (user_id, ts, value) triples only, never whole rows.
The partitioning assumption: all events of one user land in one bucket
(hash co-location); order inside the bucket is established locally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize_ds(events_ds, gap_minutes: float = 30.0,
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  rows_per_bucket: int = 2_000_000):
    """Dataset-returning sessionize (VERDICT r4 #1): one row per session
    ``(user_id, session_start, n_events, sum_value, duration_sec)``,
    UNSORTED, resident in the object store — session tables are
    corpus-scale for event data, so nothing here lands on the driver.
    :func:`sessionize` is this plus a driver-side sort, for small
    results and the SQL-oracle ordering contract."""
    import pyarrow.compute as pc

    gap_us = np.timedelta64(int(gap_minutes * 60 * 1_000_000), "us")

    n_rows = events_ds.count()
    import ray

    min_parallel = max(8, int(ray.cluster_resources().get("CPU", 8)))
    num_buckets = max(min_parallel,
                      int(np.ceil(n_rows / max(rows_per_bucket, 1))))

    schema = events_ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(user_col, types[user_col]),
                            ("session_start", pa.timestamp("us")),
                            ("n_events", pa.int64()),
                            ("sum_value", pa.float64()),
                            ("duration_sec", pa.float64())])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t.column(user_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(uid)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def bucket_sessions(t: pa.Table) -> pa.Table:
        # ONE lexsort + one vectorized boundary pass for ALL users in
        # the bucket (numpy-on-Arrow — no pandas round-trip): new
        # session at each user change or gap breach; session aggregates
        # via reduceat over the boundary index
        uid = t.column(user_col).to_numpy(zero_copy_only=False)
        # unit-normalize to µs so every bucket emits the same schema
        ts = pc.cast(t.column(ts_col),
                     pa.timestamp("us")).to_numpy(zero_copy_only=False)
        val = np.nan_to_num(t.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64))
        order = np.lexsort((ts, uid))
        uid, ts, val = uid[order], ts[order], val[order]
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap_breach = np.concatenate([[False], (ts[1:] - ts[:-1]) > gap_us])
        new_session = new_user | gap_breach
        starts = np.flatnonzero(new_session)
        ends = np.concatenate([starts[1:], [len(ts)]]) - 1
        return pa.table({
            user_col: pa.array(uid[starts]),
            "session_start": pa.array(ts[starts]),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            "sum_value": pa.array(np.round(
                np.add.reduceat(val, starts), 6) if len(starts) else
                np.empty(0, np.float64)),
            "duration_sec": pa.array(
                (ts[ends] - ts[starts]).astype("timedelta64[us]")
                .astype(np.int64) / 1e6),
        }).cast(out_schema)

    from ..stages.exchange import grouped_exchange_ds

    bucketed = (events_ds.select_columns([user_col, ts_col, value_col])
                .map_batches(add_bucket, batch_format="pyarrow"))
    return grouped_exchange_ds(bucketed, "bucket", num_buckets,
                               bucket_sessions, empty_schema=out_schema)


def sessionize(events_ds, gap_minutes: float = 30.0,
               user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value",
               rows_per_bucket: int = 2_000_000) -> pd.DataFrame:
    """One row per session: (user_id, session_start, n_events, sum_value,
    duration_sec), sorted (user, session_start) — the driver-frame form
    for output-sized results; use :func:`sessionize_ds` when the session
    table itself is big."""
    res_ds = sessionize_ds(events_ds, gap_minutes=gap_minutes,
                           user_col=user_col, ts_col=ts_col,
                           value_col=value_col,
                           rows_per_bucket=rows_per_bucket)
    res = res_ds.to_pandas()
    if not len(res):
        # Ray's to_pandas() on an all-empty Dataset drops columns
        res = pd.DataFrame(columns=[user_col, "session_start", "n_events",
                                    "sum_value", "duration_sec"])
    return (res.sort_values([user_col, "session_start"])
            .reset_index(drop=True))


SESSIONS_ORACLE_TEMPLATE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {gap_minutes} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       date_part('epoch', MAX(ts) - MIN(ts)) AS duration_sec
FROM sessions GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def funnel_counts(events_ds, steps: list[str], within_us: int,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  rows_per_bucket: int = 2_000_000) -> pd.DataFrame:
    """K-step conversion funnel — how many users progress through
    ``steps`` where each step must occur within ``within_us`` of the
    PREVIOUS step's matched event:

        t0(u) = MIN(ts | type = steps[0])
        ti(u) = MIN(ts | type = steps[i],
                    t_{i-1}(u) <= ts <= t_{i-1}(u) + within_us)

    Returns (step_idx, step, n_users) rows in step order (a user counts
    for step i iff ti(u) exists).

    Distributed shape: only events whose type IS a funnel step ship,
    as (user int64, ts int64, step int8) triples, through the same
    user-keyed bucket exchange as ``sessionize``.  Inside a bucket each
    step level resolves for ALL users at once: step-i events sort once
    by (user, ts) and every surviving user's threshold finds its first
    at-or-after event via ``joins.rank_into`` (one merged lexsort) —
    no per-user dispatch, no per-step shuffle.  Integer user ids only
    (the rank primitive compares codes numerically).
    """
    import ray

    from ..stages.exchange import grouped_exchange
    from .joins import _ts_i64, rank_into

    n_rows = events_ds.count()
    min_parallel = max(8, int(ray.cluster_resources().get("CPU", 8)))
    num_buckets = max(min_parallel,
                      int(np.ceil(n_rows / max(rows_per_bucket, 1))))

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(b[type_col],
                        value_set=pa.array(steps, type=pa.string()))
        mask = pc.and_(mask, pc.is_valid(b[user_col]))
        mask = pc.and_(mask, pc.is_valid(b[ts_col]))
        t = b.filter(mask)
        uid = pc.cast(t[user_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        si = (pc.index_in(t[type_col],
                          value_set=pa.array(steps, type=pa.string()))
              .to_numpy(zero_copy_only=False).astype(np.int8))
        h = pd.util.hash_array(uid)
        return pa.table({
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64)),
            "u": pa.array(uid),
            "t": _ts_i64(t[ts_col]),
            "s": pa.array(si)})

    def bucket_counts(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        sidx = t.column("s").to_numpy(zero_copy_only=False)
        counts = np.zeros(len(steps), dtype=np.int64)
        m0 = sidx == 0
        if m0.any():
            u0, t0v = u[m0], ts[m0]
            o = np.lexsort((t0v, u0))
            u0, t0v = u0[o], t0v[o]
            first = np.ones(len(u0), dtype=bool)
            first[1:] = u0[1:] != u0[:-1]
            cur_u, cur_t = u0[first], t0v[first]
            counts[0] = len(cur_u)
            for i in range(1, len(steps)):
                if not len(cur_u):
                    break
                mi = sidx == i
                ui, ti_ = u[mi], ts[mi]
                oi = np.lexsort((ti_, ui))
                ui, ti_ = ui[oi], ti_[oi]
                if not len(ui):
                    break
                idx = rank_into(ui, ti_, cur_u, cur_t,
                                queries_first=True)
                ok = idx < len(ui)
                at = np.minimum(idx, len(ui) - 1)
                good = ok & (ui[at] == cur_u) & \
                    (ti_[at] <= cur_t + within_us)
                cur_u, cur_t = cur_u[good], ti_[at][good]
                counts[i] = len(cur_u)
        return pa.table({"si": pa.array(np.arange(len(steps),
                                                  dtype=np.int64)),
                         "n": pa.array(counts)})

    tagged = (events_ds.select_columns([user_col, ts_col, type_col])
              .map_batches(tag, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "bucket", num_buckets, bucket_counts)
    if res is None:
        totals = np.zeros(len(steps), dtype=np.int64)
    else:
        df = res.to_pandas().groupby("si")["n"].sum()
        totals = df.reindex(range(len(steps)), fill_value=0).to_numpy()
    return pd.DataFrame({
        "step_idx": np.arange(len(steps), dtype=np.int64),
        "step": steps,
        "n_users": totals.astype(np.int64)})


def user_histories(events_ds, user_col: str = "user_id",
                   ts_col: str = "ts", type_col: str = "event_type",
                   id_col: str = "event_id", sep: str = ",",
                   rows_per_bucket: int = 2_000_000):
    """Ordered per-user event-sequence construction — the training-data
    layout for sequential recommenders / user-behavior LMs (SASRec-
    style): one row per user with the user's full event-type sequence
    in (ts, event_id) order joined by ``sep``, plus integer invariants
    (n_events, first/last event time in epoch µs).

    SQL parity: ``string_agg(event_type, sep ORDER BY ts, event_id)``
    per user.  Rows with a null user, ts, event id, or type are dropped
    (string_agg skips NULL elements but COUNT(*) would not — filtering
    keeps every output column consistent between engines).

    Distributed shape: the same user-keyed bucket exchange as
    ``sessionize`` — the shuffle carries (user, ts µs, event_id, type)
    only; inside a bucket ONE ``np.lexsort`` orders all users' events,
    boundary offsets turn the sorted type column into a ListArray with
    zero copies, and ``pc.binary_join`` emits every user's history in
    one vectorized kernel.  No per-user dispatch; results stay in the
    object store (``grouped_exchange_ds``).  Scale assumption (SURVEY
    §2.6): one user's events fit a merge task — enforce upstream with
    a per-user event cap (``select.grouped_head``) for adversarial
    users.
    """
    import pyarrow.compute as pc
    import ray

    from ..stages.exchange import grouped_exchange_ds
    from .joins import _ts_i64

    n_rows = events_ds.count()
    min_parallel = max(8, int(ray.cluster_resources().get("CPU", 8)))
    num_buckets = max(min_parallel,
                      int(np.ceil(n_rows / max(rows_per_bucket, 1))))

    schema = events_ds.schema()
    utype = dict(zip(schema.names, schema.types))[user_col]
    int_user = (pa.types.is_integer(utype)
                or pa.types.is_timestamp(utype))

    out_schema = pa.schema([
        (user_col, pa.int64() if int_user else pa.string()),
        ("n_events", pa.int64()),
        ("first_us", pa.int64()), ("last_us", pa.int64()),
        ("history", pa.string())])

    def tag(b: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64le

        mask = pc.is_valid(b[user_col])
        for c in (ts_col, id_col, type_col):
            mask = pc.and_(mask, pc.is_valid(b[c]))
        t = b.filter(mask)
        if int_user:
            ua = pc.cast(t[user_col], pa.int64())
            h = pd.util.hash_array(
                ua.to_numpy(zero_copy_only=False))
        else:
            # non-integer user keys bucket by md5 of the string form
            # (sessionize's integer hash_array would raise on objects)
            ua = pc.cast(t[user_col], pa.string())
            h = md5_u64le(ua) if t.num_rows else \
                np.empty(0, np.uint64)
        return pa.table({
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64)),
            "u": ua,
            "t": _ts_i64(t[ts_col]),
            "i": pc.cast(t[id_col], pa.int64()),
            "e": pc.cast(t[type_col], pa.string())})

    def bucket_histories(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        eid = t.column("i").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, tss = u[order], ts[order]
        new = np.ones(len(us), dtype=bool)
        new[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(new)
        offsets = np.append(starts, len(us)).astype(np.int64)
        ev = t.column("e").combine_chunks().take(pa.array(order))
        lists = pa.LargeListArray.from_arrays(pa.array(offsets), ev)
        hist = pc.binary_join(lists, sep)
        ends = offsets[1:] - 1
        return pa.table({
            user_col: pa.array(us[starts],
                               type=out_schema.field(user_col).type),
            "n_events": pa.array(np.diff(offsets)),
            "first_us": pa.array(tss[starts]),
            "last_us": pa.array(tss[ends]),
            "history": hist})

    tagged = (events_ds
              .select_columns([user_col, ts_col, id_col, type_col])
              .map_batches(tag, batch_format="pyarrow"))
    return grouped_exchange_ds(tagged, "bucket", num_buckets,
                               bucket_histories,
                               empty_schema=out_schema)


def resample_ffill(events_ds, key_col: str, ts_col: str, val_col: str,
                   step_us: int, num_buckets: int = 32):
    """Per-key time-grid resampling with FORWARD FILL — the gap-fill /
    downsampling primitive (metrics rollups, state-as-of-time): for
    each key, emit one row per ``step_us`` grid point from
    floor(min_ts/step)·step to floor(max_ts/step)·step, carrying the
    value of the latest event with ts ≤ grid point.  Grid points
    before a key's first event drop (SQL ASOF-inner semantics);
    duplicate (key, ts) events resolve to MAX(val) first — both rules
    restated in the oracle.  Returns a resident Dataset
    (key, grid_us, val), all int64 — keys and values must be
    integer-typed (the graph-family contract).

    Scale shape: one key-hash exchange; inside a bucket everything is
    one lexsort + structured-array ``searchsorted`` (grid rows look up
    their predecessor event in the (key, ts)-sorted table in one
    vectorized call — no per-key loop).  Output size is
    Σ_keys (span/step + 1): pick ``step_us`` so the grid is
    output-sized, it is never clipped silently.  ts compares as int64
    epoch-µs; null key/ts/val rows drop.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([(key_col, pa.int64()),
                            ("grid_us", pa.int64()),
                            ("val", pa.int64())])
    step = int(step_us)

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                     pc.is_valid(b[ts_col])),
                             pc.is_valid(b[val_col])))
        k = pc.cast(b[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "__b": pa.array((pd.util.hash_array(k)
                             % np.uint64(num_buckets)).astype(np.int64)),
            key_col: b[key_col],
            "__ts": pc.cast(b[ts_col], pa.int64()),
            "__v": pc.cast(b[val_col], pa.int64())})

    def fill_bucket(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        ts = t.column("__ts").to_numpy(zero_copy_only=False)
        v = t.column("__v").to_numpy(zero_copy_only=False)
        # sort by (key, ts, val); last row of each (key, ts) run is the
        # MAX(val) representative
        order = np.lexsort((v, ts, k))
        k, ts, v = k[order], ts[order], v[order]
        last = np.ones(len(k), dtype=bool)
        last[:-1] = (k[:-1] != k[1:]) | (ts[:-1] != ts[1:])
        k, ts, v = k[last], ts[last], v[last]

        keys, start = np.unique(k, return_index=True)
        cnt = np.diff(np.append(start, len(k)))
        g0 = (ts[start] // step) * step
        g1 = (ts[start + cnt - 1] // step) * step
        npts = (g1 - g0) // step + 1
        total = int(npts.sum())
        gk = np.repeat(keys, npts)
        csum = np.concatenate(([0], np.cumsum(npts)))
        gi = np.arange(total) - np.repeat(csum[:-1], npts)
        g = np.repeat(g0, npts) + gi * step

        ev = np.empty(len(k), dtype=[("a", np.int64), ("b", np.int64)])
        ev["a"], ev["b"] = k, ts
        q = np.empty(total, dtype=[("a", np.int64), ("b", np.int64)])
        q["a"], q["b"] = gk, g
        idx = np.searchsorted(ev, q, side="right") - 1
        ok = (idx >= 0) & (ev["a"][np.maximum(idx, 0)] == gk)
        return pa.table({key_col: pa.array(gk[ok]),
                         "grid_us": pa.array(g[ok]),
                         "val": pa.array(v[idx[ok]])})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, fill_bucket,
                               empty_schema=out_schema)


def merge_intervals(ds, key_col: str, start_col: str, end_col: str,
                    num_buckets: int = 32):
    """Per-key union of overlapping-or-TOUCHING [start, end] intervals
    — the coverage audit (what time ranges does each entity's data
    actually cover, and in how many contiguous stretches?).  Emits one
    row per merged island: (key, start_us, end_us, n_merged).

    Same bucket-sweep shape as ``sessionize``: ONE hash exchange keyed
    on the key co-locates each key's intervals, then each bucket task
    runs one lexsort by (key, start, end) and detects island
    boundaries where a row's start exceeds the running max end of its
    key so far (grouped cummax via the pandas C kernel — a column op,
    not a table round-trip).  Islands reduce with ``np.ufunc.reduceat``.

    Touching merges: start == running end joins the island (half-open
    callers should pre-decrement end).  Timestamps normalize to int64
    microseconds (joins._ts_i64); rows with a null key/start/end drop;
    integer or string keys.  Results stay in the object store
    (output-sized Dataset).
    """
    from ..stages.exchange import grouped_exchange_ds
    from .joins import _key_arrays, _ts_i64

    schema = ds.schema()
    ktype = dict(zip(schema.names, schema.types))[key_col]
    int_key = (pa.types.is_integer(ktype) or pa.types.is_timestamp(ktype))
    out_schema = pa.schema([
        ("key", pa.int64() if int_key else pa.string()),
        ("start_us", pa.int64()), ("end_us", pa.int64()),
        ("n_merged", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if key_col not in b.column_names:
            return pa.table({"__b": pa.array([], type=pa.int64()),
                             "k": pa.array([], out_schema.field("key").type),
                             "s": pa.array([], type=pa.int64()),
                             "e": pa.array([], type=pa.int64())})
        mask = pc.is_valid(b[key_col])
        for c in (start_col, end_col):
            mask = pc.and_(mask, pc.is_valid(b[c]))
        t = b.filter(mask)
        karr, bk = _key_arrays(t[key_col])
        return pa.table({
            "__b": pa.array((bk % np.uint64(num_buckets)).astype(np.int64)),
            "k": karr, "s": _ts_i64(t[start_col]), "e": _ts_i64(t[end_col])})

    def sweep(tb: pa.Table) -> pa.Table:
        k = tb.column("k").to_numpy(zero_copy_only=False)
        s = tb.column("s").to_numpy(zero_copy_only=False)
        e = tb.column("e").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, s, k))
        ks, ss, es = k[order], s[order], e[order]
        newkey = np.ones(len(ks), dtype=bool)
        newkey[1:] = ks[1:] != ks[:-1]
        seg = np.cumsum(newkey) - 1
        run_end = pd.Series(es).groupby(seg).cummax().to_numpy()
        boundary = newkey.copy()
        boundary[1:] |= ss[1:] > run_end[:-1]
        starts = np.flatnonzero(boundary)
        island_start = ss[starts]
        island_end = np.maximum.reduceat(es, starts)
        # reduceat max equals the island's running-max end (islands are
        # contiguous index ranges after the sort)
        counts = np.diff(np.concatenate((starts, [len(ks)])))
        return pa.table({
            "key": pa.array(ks[starts]),
            "start_us": pa.array(island_start),
            "end_us": pa.array(island_end),
            "n_merged": pa.array(counts.astype(np.int64))})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, sweep,
                               empty_schema=out_schema)


def scd2_intervals(ds, key_col: str, ts_col: str, value_cols: list[str],
                   id_col: str, num_buckets: int = 64):
    """Slowly-changing-dimension TYPE-2 history build: a changelog of
    (key, ts, payload) versions becomes validity intervals — each
    version row gains ``valid_from = ts`` and ``valid_to`` = the key's
    NEXT version's ts (null = still current), SQL
    ``LEAD(ts) OVER (PARTITION BY key ORDER BY ts, id)`` parity.
    The warehouse primitive between ``select.latest_by_key`` (current
    state only) and ``merge_intervals`` (coalescing): point-in-time
    joins read the row where ``valid_from <= t < valid_to``.

    ONE hash exchange on the key; per bucket a single lexsort + shift
    computes every key's interval chain vectorized.  Version ties on
    (key, ts) order by ``id_col`` (replay-deterministic).  Null
    key/ts/id rows drop (window parity).  Returns a Dataset of
    ``key, *value_cols, valid_from, valid_to, is_current``.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema(
        [(key_col, types[key_col])]
        + [(c, types[c]) for c in value_cols]
        + [("valid_from", pa.timestamp("us")),
           ("valid_to", pa.timestamp("us")),
           ("is_current", pa.bool_())])

    def tag(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[ts_col])),
                       pc.is_valid(b[id_col]))
        b = b.filter(mask)
        key = pc.cast(as_array(b[key_col]), pa.string())
        cols = {"__b": pa.array(md5_u64le(key), type=pa.uint64()),
                "__ts": pc.cast(pc.cast(as_array(b[ts_col]),
                                        pa.timestamp("us")),
                                pa.int64()),
                "__i": pc.cast(as_array(b[id_col]), pa.int64()),
                key_col: b[key_col]}
        for c in value_cols:
            cols[c] = b[c]
        return pa.table(cols)

    def chain(t: pa.Table) -> pa.Table:
        k = pc.cast(as_array(t[key_col]),
                    pa.string()).to_numpy(zero_copy_only=False)
        ts = t.column("__ts").to_numpy(zero_copy_only=False)
        ids = t.column("__i").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, k))
        ks, tss = k[order], ts[order]
        n = len(order)
        vt = np.empty(n, dtype=np.int64)
        cur = np.empty(n, dtype=bool)
        if n:
            same_next = np.zeros(n, dtype=bool)
            same_next[:-1] = ks[1:] == ks[:-1]
            vt[:-1] = tss[1:]
            vt[-1] = 0
            cur = ~same_next
        idx = pa.array(order)
        cols = {key_col: t.column(key_col).take(idx)}
        for c in value_cols:
            cols[c] = t.column(c).take(idx)
        cols["valid_from"] = pa.array(tss).cast(pa.timestamp("us"))
        # mask=True -> null: current rows have an open interval end
        cols["valid_to"] = pa.array(vt, mask=cur).cast(
            pa.timestamp("us"))
        cols["is_current"] = pa.array(cur)
        return pa.table(cols).cast(out_schema)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, chain,
                               empty_schema=out_schema)


def transition_counts(events_ds, key_col: str = "user_id",
                      ts_col: str = "ts", state_col: str = "event_type",
                      id_col: str = "event_id",
                      num_buckets: int = 32) -> pd.DataFrame:
    """First-order Markov transition counts over per-key event
    sequences: how often state A is IMMEDIATELY followed by state B
    within one key's timeline (order: ``ts`` asc, ``id_col`` asc as
    the deterministic tiebreak) — the behavioral-model / anomaly
    baseline (SQL: ``LEAD() OVER (PARTITION BY key ORDER BY ts,
    id)``).  Rows with null key/ts/state drop; transitions never
    cross keys.  Returns (prev_state, next_state, n) sorted.

    Distributed shape: ONE key-keyed exchange; each bucket task
    lexsorts its keys' rows once and reads consecutive pairs with a
    shifted compare (no per-key loop), then collapses to per-bucket
    (prev, next) partial counts — the driver merge is
    state-alphabet², not event-sized.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[ts_col])),
                       pc.is_valid(b[state_col]))
        b = b.select([key_col, ts_col, state_col, id_col]).filter(keep)
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = pc.cast(t[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        st = pc.cast(t[state_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        o = np.lexsort((iv, ts, k))
        ks, ss = k[o], st[o]
        same = ks[1:] == ks[:-1]
        prev, nxt = ss[:-1][same], ss[1:][same]
        if not len(prev):
            return pa.table({"prev_state": pa.array([], pa.string()),
                             "next_state": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pairs_ = prev + "\x1f" + nxt
        u, c = np.unique(pairs_, return_counts=True)
        sp = np.array([x.split("\x1f", 1) for x in u], dtype=object)
        return pa.table({
            "prev_state": pa.array(sp[:, 0], pa.string()),
            "next_state": pa.array(sp[:, 1], pa.string()),
            "n": pa.array(c.astype(np.int64))})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, pairs)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"prev_state": pd.Series(dtype=object),
                             "next_state": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    df = (res.to_pandas().groupby(["prev_state", "next_state"],
                                  as_index=False)["n"].sum())
    return (df.sort_values(["prev_state", "next_state"])
            .reset_index(drop=True).astype({"n": "int64"}))


def activity_streaks(events_ds, key_col: str = "user_id",
                     ts_col: str = "ts",
                     num_buckets: int = 32):
    """Per-key longest consecutive-day activity streak + total active
    days — the gaps-and-islands engagement metric (SQL: ``day -
    DENSE_RANK() OVER (PARTITION BY key ORDER BY day)`` island
    grouping).  Day = UTC epoch-day of ``ts``.  Returns a Dataset
    ``(key, max_streak, n_days)``; null key/ts rows drop.

    Distributed shape: each batch collapses to DISTINCT (key, day)
    pairs map-side; ONE key-keyed exchange; per bucket: lexsort,
    cross-batch re-dedup, and one vectorized run split on
    ``diff(day) == 1`` — run lengths via reduceat, no per-key loop.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([(key_col, pa.int64()),
                            ("max_streak", pa.int64()),
                            ("n_days", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[key_col]),
                             pc.is_valid(b[ts_col])))
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        tsc = b[ts_col]
        if pa.types.is_timestamp(tsc.type):
            tsc = pc.cast(tsc, pa.timestamp("us"))  # unit-normalize
        day = (pc.cast(tsc, pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        kd = np.unique(np.rec.fromarrays([k, day],
                                         names=["k", "d"]))
        h = pd.util.hash_array(kd["k"])
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "k": pa.array(kd["k"]), "d": pa.array(kd["d"])})

    def streaks(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        kd = np.unique(np.rec.fromarrays([k, d], names=["k", "d"]))
        ks, ds_ = kd["k"], kd["d"]
        # island boundary: key change OR day gap > 1
        new = np.ones(len(ks), dtype=bool)
        new[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] - ds_[:-1] != 1)
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_key = ks[new]
        uk, inv = np.unique(run_key, return_inverse=True)
        mx = np.zeros(len(uk), dtype=np.int64)
        np.maximum.at(mx, inv, run_len)
        tot = np.zeros(len(uk), dtype=np.int64)
        np.add.at(tot, inv, run_len)
        return pa.table({key_col: pa.array(uk),
                         "max_streak": pa.array(mx),
                         "n_days": pa.array(tot)}).cast(out_schema)

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, streaks,
                               empty_schema=out_schema)


def peak_concurrency(events_ds, key_col: str, ts_col: str,
                     duration_us: int,
                     num_buckets: int = 32) -> pd.DataFrame:
    """Per-key PEAK number of simultaneously-open presence intervals
    ``[ts, ts + duration_us)`` — the capacity-planning statistic
    (max concurrent sessions/streams) via the classic +1/−1 sweep.
    Half-open semantics: an interval ending exactly when another
    starts does NOT overlap it (the −1 sorts before the +1 at equal
    time).  Null key/ts rows drop.  Returns (key, peak) sorted.

    Distributed shape: ONE key-keyed exchange; each bucket task
    builds its keys' +1/−1 point list, lexsorts once by (key, t,
    delta asc), and reads the running-sum maximum per key with
    cumsum + reduceat — no per-key loop.  Peak per key is exact
    because all of a key's points land in one task (SURVEY §2.6:
    one key's events fit a merge task).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[key_col]),
                             pc.is_valid(b[ts_col])))
        k = pc.cast(b[key_col], pa.string())
        tsc = b[ts_col]
        if pa.types.is_timestamp(tsc.type):
            tsc = pc.cast(tsc, pa.timestamp("us"))
        t = pc.cast(tsc, pa.int64()).to_numpy(zero_copy_only=False)
        ks = k.to_numpy(zero_copy_only=False).astype(object)
        h = (md5_u64le(k) % np.uint64(num_buckets)).astype(np.int64)
        n = len(t)
        return pa.table({
            "__b": pa.array(np.concatenate([h, h])),
            "k": pa.array(np.concatenate([ks, ks]), pa.string()),
            "t": pa.array(np.concatenate([t, t + duration_us])),
            "d": pa.array(np.concatenate(
                [np.ones(n, np.int64), -np.ones(n, np.int64)]))})

    def sweep(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(object)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        # (key, time, delta asc): -1 before +1 at equal instants
        o = np.lexsort((d, ts, k))
        ks, ds_ = k[o], d[o]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        start = np.flatnonzero(first)
        cnt = np.diff(np.append(start, len(ks)))
        # per-key running sum = global cumsum minus the cumsum just
        # before each key's first point (offset subtraction)
        csum = np.cumsum(ds_)
        offs = np.repeat(
            np.concatenate([[0], csum[start[1:] - 1]]), cnt)
        run = csum - offs
        peak = np.zeros(len(start), dtype=np.int64)
        np.maximum.at(peak,
                      np.repeat(np.arange(len(start)), cnt), run)
        return pa.table({"k": pa.array(ks[start], pa.string()),
                         "peak": pa.array(peak)})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, sweep)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({key_col: pd.Series(dtype=object),
                             "peak": pd.Series(dtype="int64")})
    df = res.to_pandas().rename(columns={"k": key_col})
    return (df.sort_values(key_col).reset_index(drop=True)
            .astype({"peak": "int64"}))


def resample_interpolate(events_ds, key_col: str, ts_col: str,
                         val_col: str, step_us: int,
                         num_buckets: int = 32):
    """Per-key time-grid resampling with INTEGER LINEAR
    INTERPOLATION — the companion to ``resample_ffill`` for metrics
    that change continuously (gauge readings, balances): for each key,
    one row per ``step_us`` grid point within [min_ts, max_ts], value
    interpolated between the bracketing events::

        val(g) = v0 + (v1 − v0)·(g − t0) / (t1 − t0)   (integer div)

    Division TRUNCATES toward zero (DuckDB ``//`` semantics — NOT
    numpy floor; the engine adjusts so both agree on negative
    slopes).  An exact event hit carries its value; duplicate
    (key, ts) events resolve to MAX(val) first.  Returns a resident
    Dataset (key, grid_us, val), all int64.

    Scale shape: identical to ``resample_ffill`` — one key exchange,
    per-bucket lexsort, vectorized grid generation (repeat/arange)
    and ONE structured-array searchsorted for all grid points; output
    is grid-sized by construction.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([(key_col, pa.int64()),
                            ("grid_us", pa.int64()),
                            ("val", pa.int64())])
    step = int(step_us)

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                     pc.is_valid(b[ts_col])),
                             pc.is_valid(b[val_col])))
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        tsc = b[ts_col]
        if pa.types.is_timestamp(tsc.type):
            tsc = pc.cast(tsc, pa.timestamp("us"))
        return pa.table({
            "__b": pa.array((pd.util.hash_array(k)
                             % np.uint64(num_buckets))
                            .astype(np.int64)),
            key_col: pa.array(k),
            "__ts": pc.cast(tsc, pa.int64()),
            "__v": pc.cast(b[val_col], pa.int64())})

    def interp_bucket(t: pa.Table) -> pa.Table | None:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = t.column("__ts").to_numpy(zero_copy_only=False)
        v = t.column("__v").to_numpy(zero_copy_only=False)
        # dedup (key, ts) -> MAX(val): sort by (k, ts, v), keep lasts
        o = np.lexsort((v, ts, k))
        k, ts, v = k[o], ts[o], v[o]
        last = np.ones(len(k), dtype=bool)
        last[:-1] = (k[1:] != k[:-1]) | (ts[1:] != ts[:-1])
        k, ts, v = k[last], ts[last], v[last]
        first = np.ones(len(k), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        start = np.flatnonzero(first)
        end = np.append(start[1:], len(k)) - 1
        lo = -(-ts[start] // step) * step   # ceil to grid
        hi = (ts[end] // step) * step       # floor to grid
        npts = np.maximum((hi - lo) // step + 1, 0)
        total = int(npts.sum())
        if total == 0:
            return None
        gkey = np.repeat(k[start], npts)
        base = np.repeat(lo, npts)
        csum = np.concatenate([[0], np.cumsum(npts)[:-1]])
        g = base + (np.arange(total)
                    - np.repeat(csum, npts)) * step
        # bracket lookup: one searchsorted over the (k, ts) order
        rec = np.rec.fromarrays([k, ts], names=["k", "t"])
        q = np.rec.fromarrays([gkey, g], names=["k", "t"])
        i = np.searchsorted(rec, q, side="right") - 1
        exact = ts[i] == g
        j = np.where(exact, i, np.minimum(i + 1, len(ts) - 1))
        num = (v[j] - v[i]) * (g - ts[i])
        den = np.where(exact, 1, ts[j] - ts[i])
        quo = num // den
        # numpy floors; DuckDB truncates toward zero — adjust
        adj = (num % den != 0) & ((num < 0) != (den < 0))
        quo = quo + adj.astype(np.int64)
        val = np.where(exact, v[i], v[i] + quo)
        return pa.table({key_col: pa.array(gkey),
                         "grid_us": pa.array(g),
                         "val": pa.array(val.astype(np.int64))
                         }).cast(out_schema)

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets,
                               interp_bucket,
                               empty_schema=out_schema)


def interval_overlap_audit(ds, key_col: str, start_col: str,
                           end_col: str,
                           num_buckets: int = 32) -> pd.DataFrame:
    """Validity-interval invariant audit: per key, flag every
    interval whose start precedes the PREVIOUS interval's end under
    (start, end) order — the SCD2/history-table correctness check
    ("no two versions of one entity valid at once"; intervals are
    half-open, so touching ``end == next start`` is legal).  Also
    flags degenerate rows with ``end < start``.  Returns
    (key, start, end, prev_end, kind) — kind 'overlap' | 'negative'
    — violation-sized.

    Distributed shape: ONE key exchange; per bucket one lexsort +
    shifted compare — only violations leave the task.  Null
    key/start/end rows DROP (the repo null policy — nullability is
    ``non_null``'s business).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[start_col])),
                       pc.is_valid(b[end_col]))
        b = b.select([key_col, start_col, end_col]).filter(keep)
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        def as_i64(col):
            c = b[col]
            if pa.types.is_timestamp(c.type):
                c = pc.cast(c, pa.timestamp("us"))
            return pc.cast(c, pa.int64())
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "k": pc.cast(b[key_col], pa.string()),
            "s": as_i64(start_col), "e": as_i64(end_col)})

    def audit(t: pa.Table) -> pa.Table | None:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(object)
        s = t.column("s").to_numpy(zero_copy_only=False)
        e = t.column("e").to_numpy(zero_copy_only=False)
        o = np.lexsort((e, s, k))
        ks, ss, es = k[o], s[o], e[o]
        same = ks[1:] == ks[:-1]
        overlap = same & (ss[1:] < es[:-1])
        neg = es < ss
        idx_o = np.flatnonzero(overlap) + 1
        idx_n = np.flatnonzero(neg)
        if not len(idx_o) and not len(idx_n):
            return None
        rows = []
        if len(idx_o):
            rows.append(pa.table({
                "k": pa.array(ks[idx_o], pa.string()),
                "s": pa.array(ss[idx_o]),
                "e": pa.array(es[idx_o]),
                "prev_end": pa.array(es[idx_o - 1]),
                "kind": pa.array(["overlap"] * len(idx_o))}))
        if len(idx_n):
            rows.append(pa.table({
                "k": pa.array(ks[idx_n], pa.string()),
                "s": pa.array(ss[idx_n]),
                "e": pa.array(es[idx_n]),
                "prev_end": pa.array(
                    np.full(len(idx_n), -1, np.int64)),
                "kind": pa.array(["negative"] * len(idx_n))}))
        return pa.concat_tables(rows)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, audit)
    cols = ["key", "start", "end", "prev_end", "kind"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({
            "key": pd.Series(dtype=object),
            "start": pd.Series(dtype="int64"),
            "end": pd.Series(dtype="int64"),
            "prev_end": pd.Series(dtype="int64"),
            "kind": pd.Series(dtype=object)})
    df = res.to_pandas().rename(columns={
        "k": "key", "s": "start", "e": "end"})
    return (df[cols].sort_values(cols[:4]).reset_index(drop=True))


def collapse_repeats(events_ds, within_us: int,
                     key_col: str = "user_id", ts_col: str = "ts",
                     state_col: str = "event_type",
                     id_col: str = "event_id",
                     num_buckets: int = 32) -> pd.DataFrame:
    """Consecutive-duplicate event collapse — the at-source debounce
    for instrumentation stutter (double-clicks, retry storms): an event
    DROPS iff the immediately preceding event of the SAME key (by
    ``ts`` asc, ``id_col`` asc tiebreak) has the SAME state and arrived
    within ``within_us``.  LAG-based, not chain-based: each event
    compares to its physical predecessor, so a long burst keeps one
    event per ``within_us`` gap breach (the SQL-restatable rule —
    a chain rule would need recursion).  Null key/ts/state rows pass
    through untouched (nulls never trip an operator; repo policy).

    Returns the SURVIVING event ids as a sorted driver frame
    (id-projection — callers re-join survivors to payloads, the
    ``dedup.exact_dedup`` convention).

    Distributed shape: ONE key-keyed exchange of (key, ts, id, state)
    quads; per bucket one lexsort + shifted compare — no per-key
    dispatch, output is survivor-sized.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, state_col, id_col])
        valid = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                pc.is_valid(b[ts_col])),
                        pc.is_valid(b[state_col]))
        kept = b.filter(valid)
        h = md5_u64le(pc.cast(kept[key_col], pa.string()))
        out = kept.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))
        # null-field rows survive by fiat: route them to bucket 0 as
        # pre-decided survivors (flag -1) so they skip the compare
        nul = b.filter(pc.invert(valid))
        if nul.num_rows:
            out = pa.concat_tables([
                out,
                nul.append_column("__b", pa.array(
                    np.zeros(nul.num_rows, dtype=np.int64)))])
        return out

    def survivors(t: pa.Table) -> pa.Table:
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        valid = (pc.and_(pc.and_(pc.is_valid(t[key_col]),
                                 pc.is_valid(t[ts_col])),
                         pc.is_valid(t[state_col]))
                 .to_numpy(zero_copy_only=False))
        keep_ids = [iv[~valid]]
        tt = t.filter(pa.array(valid))
        if tt.num_rows:
            k = pc.cast(tt[key_col], pa.string()).to_numpy(
                zero_copy_only=False).astype(object)
            ts = pc.cast(pc.cast(tt[ts_col], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            st = pc.cast(tt[state_col], pa.string()).to_numpy(
                zero_copy_only=False).astype(object)
            ivv = pc.cast(tt[id_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            o = np.lexsort((ivv, ts, k))
            ks, tss, sts, ivs = k[o], ts[o], st[o], ivv[o]
            drop = np.zeros(len(ks), dtype=bool)
            drop[1:] = ((ks[1:] == ks[:-1]) & (sts[1:] == sts[:-1])
                        & (tss[1:] - tss[:-1] <= within_us))
            keep_ids.append(ivs[~drop])
        out = np.concatenate(keep_ids)
        return pa.table({"event_id": pa.array(out, type=pa.int64())})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, survivors)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64")})
    return (res.to_pandas().sort_values("event_id")
            .reset_index(drop=True))


def time_weighted_value(events_ds, key_col: str = "user_id",
                        ts_col: str = "ts", value_col: str = "value",
                        id_col: str = "event_id",
                        max_gap_us: int = 3_600_000_000,
                        num_buckets: int = 32) -> pd.DataFrame:
    """Per-key TIME-WEIGHTED value integral — each event's value holds
    until the key's next event (step interpolation), gaps capped at
    ``max_gap_us`` (sparse streams must not let one dormant week
    dominate the integral); the key's LAST event contributes nothing.
    The exact-integer contract (repo float policy): per segment,
    ``v_milli = floor(value * 1000)`` (floor, never round — np.round
    is banker's, SQL ROUND is half-away) and ``dt_ms = least(next_ts -
    ts, max_gap_us) // 1000`` (non-negative, so numpy and SQL ``//``
    agree); returns ``(key, twa_num = Σ v_milli·dt_ms, twa_den =
    Σ dt_ms)`` — the caller divides (num/den = milli-value-weighted
    mean).  Null key/ts/value rows drop.  int64 headroom: |value| ≤
    10⁶ → |term| ≤ 3.6·10¹⁵, ≥2,500 capped segments per key before
    overflow could matter (raise buckets / lower cap beyond that).

    Distributed shape: ONE key-keyed exchange of (key, ts, id, value);
    per bucket one lexsort + shifted diff + reduceat — key-cardinality-
    sized output.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, value_col, id_col])
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                     pc.is_valid(b[ts_col])),
                             pc.is_valid(b[value_col])))
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def integrate(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        o = np.lexsort((iv, ts, k))
        ks, tss, vs = k[o], ts[o], v[o]
        same = ks[1:] == ks[:-1]
        dt = np.minimum(tss[1:] - tss[:-1], max_gap_us) // 1000
        vm = np.floor(vs[:-1] * 1000.0).astype(np.int64)
        terms = np.where(same, vm * dt, 0)
        dts = np.where(same, dt, 0)
        # segment i belongs to the key of row i (the holder)
        uk, inv = np.unique(ks[:-1] if len(ks) else ks,
                            return_inverse=True)
        num = np.zeros(len(uk), dtype=np.int64)
        den = np.zeros(len(uk), dtype=np.int64)
        np.add.at(num, inv, terms)
        np.add.at(den, inv, dts)
        # keys whose ONLY row is the bucket's last row still appear
        # (zero num/den) iff they own at least one sorted row pair?
        # No: a single-event key has no pair — emit it with 0/0 so the
        # output is key-complete (SQL GROUP BY emits it too)
        lone = np.setdiff1d(np.unique(ks), uk, assume_unique=True)
        if len(lone):
            uk = np.concatenate([uk, lone])
            num = np.concatenate([num, np.zeros(len(lone), np.int64)])
            den = np.concatenate([den, np.zeros(len(lone), np.int64)])
        return pa.table({key_col: pa.array(uk, type=pa.int64()),
                         "twa_num": pa.array(num),
                         "twa_den": pa.array(den)})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, integrate)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({key_col: pd.Series(dtype="int64"),
                             "twa_num": pd.Series(dtype="int64"),
                             "twa_den": pd.Series(dtype="int64")})
    return (res.to_pandas().sort_values(key_col)
            .reset_index(drop=True))


def interarrival_quantiles(events_ds, qs: tuple = (0.5, 0.9),
                           key_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           id_col: str = "event_id",
                           num_buckets: int = 32) -> pd.DataFrame:
    """EXACT inter-arrival-time quantiles per event type — the
    cadence/SLA profile: per (key, type) timeline (order ``ts`` asc,
    ``id`` asc), consecutive gaps in SECONDS (``gap_us //
    1_000_000``, non-negative so numpy and SQL ``//`` agree), then
    per-type discrete quantiles over the gap multiset (DuckDB
    ``quantile_disc`` definition — ``analytics.grouped_exact_
    quantiles``).  Null key/ts/type rows drop.  Returns
    ``(event_type, n, q50, q90, ...)`` sorted by type.

    Scale shape: ONE key-keyed exchange emits (type, gap_s) rows that
    STAY resident (``grouped_exchange_ds``); second-resolution
    discretization bounds the quantile histogram's distinct values, so
    the exact-quantile partials stay types × distinct-gaps.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange_ds

    gap_schema = pa.schema([(type_col, pa.string()),
                            ("gap_s", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, type_col, id_col])
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                     pc.is_valid(b[ts_col])),
                             pc.is_valid(b[type_col])))
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def gaps(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        st = pc.cast(t[type_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        o = np.lexsort((iv, ts, st, k))
        ks, sts, tss = k[o], st[o], ts[o]
        same = (ks[1:] == ks[:-1]) & (sts[1:] == sts[:-1])
        gap = (tss[1:] - tss[:-1]) // 1_000_000
        return pa.table({
            type_col: pa.array(sts[1:][same], type=pa.string()),
            "gap_s": pa.array(gap[same])}).cast(gap_schema)

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    gaps_ds = grouped_exchange_ds(tagged, "__b", num_buckets, gaps,
                                  empty_schema=gap_schema)
    from .analytics import grouped_exact_quantiles

    out = grouped_exact_quantiles(gaps_ds, type_col, "gap_s", qs=qs)
    return out.sort_values(type_col).reset_index(drop=True)


def session_duration_by_entry(events_ds, gap_minutes: float = 30.0,
                              key_col: str = "user_id",
                              ts_col: str = "ts",
                              type_col: str = "event_type",
                              id_col: str = "event_id",
                              qs: tuple = (0.5, 0.9),
                              num_buckets: int = 32) -> pd.DataFrame:
    """Dwell-time profile BY SESSION ENTRY POINT — "how long do
    sessions that START with a search vs a click last?" (the
    landing-page engagement audit): per user timeline (order ``ts``
    asc, ``id`` asc), a new session opens at each gap >
    ``gap_minutes``; each session is credited to its FIRST event's
    type, and per entry type the session-duration multiset (seconds,
    ``(last_ts − first_ts) // 1_000_000``) reduces to exact discrete
    quantiles.  Null key/ts/type/id rows drop.  Returns
    ``(event_type, n, q50, q90, ...)`` sorted by type.

    Scale shape: ONE user-keyed exchange emits (entry_type, dur_s)
    session rows that STAY resident (``grouped_exchange_ds``), then
    ``grouped_exact_quantiles`` reduces them as
    (type, value, count) partials — second-resolution discretization
    bounds the histogram like :func:`interarrival_quantiles`.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange_ds

    gap_us = int(gap_minutes * 60 * 1_000_000)
    out_schema = pa.schema([(type_col, pa.string()),
                            ("dur_s", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, type_col, id_col])
        m = None
        for c in (key_col, ts_col, type_col, id_col):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def fold(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        st = pc.cast(t[type_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        o = np.lexsort((iv, ts, k))
        k, st, ts = k[o], st[o], ts[o]
        new = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            new[1:] = (k[1:] != k[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(k)))
        last = starts + n - 1
        return pa.table({
            type_col: pa.array(st[starts], type=pa.string()),
            "dur_s": pa.array((ts[last] - ts[starts])
                              // 1_000_000)}).cast(out_schema)

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    sess = grouped_exchange_ds(tagged, "__b", num_buckets, fold,
                               empty_schema=out_schema)
    from .analytics import grouped_exact_quantiles

    out = grouped_exact_quantiles(sess, type_col, "dur_s", qs=qs)
    return out.sort_values(type_col).reset_index(drop=True)


def order_violations(events_ds, key_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     num_buckets: int = 32) -> pd.DataFrame:
    """Ingestion-order audit: per key, how many ADJACENT steps of the
    id-ordered timeline go BACKWARD in event time (``ts[i+1] < ts[i]``
    along ``id_col`` asc) — the monotonicity check that catches
    producer clock skew and out-of-order ingestion before watermarked
    operators (``events_late_arrivals``' complement: that one audits
    arrival lateness, this one audits sequence inversions).  Null
    key/ts/id rows drop.  Returns ``(key, n_steps, n_inversions)``
    sorted by key; keys with a single event emit (0, 0).

    Distributed shape: ONE key-keyed exchange of (key, id, ts)
    triples; per bucket one lexsort + shifted compare — key-
    cardinality-sized output.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, id_col])
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                     pc.is_valid(b[ts_col])),
                             pc.is_valid(b[id_col])))
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def audit(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        o = np.lexsort((iv, k))
        ks, tss = k[o], ts[o]
        same = ks[1:] == ks[:-1]
        inv_ = same & (tss[1:] < tss[:-1])
        uk = np.unique(ks)
        steps = np.zeros(len(uk), dtype=np.int64)
        invs = np.zeros(len(uk), dtype=np.int64)
        if len(ks) > 1:
            idx = np.searchsorted(uk, ks[:-1][same])
            np.add.at(steps, idx, 1)
            np.add.at(invs, np.searchsorted(uk, ks[:-1][inv_]),
                      np.ones(int(inv_.sum()), dtype=np.int64))
        return pa.table({key_col: pa.array(uk, type=pa.int64()),
                         "n_steps": pa.array(steps),
                         "n_inversions": pa.array(invs)})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, audit)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({key_col: pd.Series(dtype="int64"),
                             "n_steps": pd.Series(dtype="int64"),
                             "n_inversions": pd.Series(dtype="int64")})
    return (res.to_pandas().sort_values(key_col)
            .reset_index(drop=True))


def path_ngrams(events_ds, n: int = 3, topk: int = 10,
                key_col: str = "user_id", ts_col: str = "ts",
                type_col: str = "event_type", id_col: str = "event_id",
                num_buckets: int = 32) -> pd.DataFrame:
    """Top-k length-``n`` event-type PATHS (consecutive runs of one
    key's timeline, order ``ts`` asc / ``id`` asc) — the higher-order
    extension of :func:`transition_counts` (n=2) for funnel/journey
    mining.  Paths never cross keys; ties rank (count DESC, path ASC);
    path rendered ``t1>t2>...`` (types contain no ``>`` in this
    schema; the separator is part of the contract).  Null key/ts/type
    rows drop.  Returns ``(path, n)``.

    Distributed shape: ONE key-keyed exchange; per bucket one lexsort
    + (n−1) shifted compares build the window mask, then per-bucket
    (path, count) partials — driver merge bounded by alphabetⁿ.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, type_col, id_col])
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                     pc.is_valid(b[ts_col])),
                             pc.is_valid(b[type_col])))
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def paths(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        st = pc.cast(t[type_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        o = np.lexsort((iv, ts, k))
        ks, sts = k[o], st[o]
        m = len(ks) - n + 1
        if m <= 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ok = np.ones(m, dtype=bool)
        path = sts[:m].copy()
        for j in range(1, n):
            ok &= ks[j:m + j] == ks[:m]
            path = path + ">" + sts[j:m + j]
        u, c = np.unique(path[ok], return_counts=True)
        return pa.table({"path": pa.array(u, type=pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, paths)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"path": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    df = (res.to_pandas().groupby("path", as_index=False)["n"].sum()
          .sort_values(["n", "path"], ascending=[False, True],
                       kind="stable")
          .head(topk).reset_index(drop=True))
    return df.astype({"n": "int64"})


def dau_wau(events_ds, key_col: str = "user_id", ts_col: str = "ts",
            window_days: int = 7, num_buckets: int = 32) -> pd.DataFrame:
    """DAU/WAU engagement stickiness: for every ACTIVE day, the count
    of distinct keys active that day and the count active in the
    trailing ``window_days`` window — the DAU/WAU ratio is the
    standard retention pulse.  Null key/ts rows drop; day = UTC
    epoch-day.  Returns ``(day, dau, wau)`` sorted by day (only days
    with activity, SQL parity with a distinct-days CTE).

    Distributed shape: batches collapse to distinct (key, day) pairs;
    ONE key-keyed exchange (a key's whole day-set co-locates, so the
    window expansion dedups locally and bucket partials sum exactly);
    each bucket emits per-day (dau, wau) partials — driver merge is
    buckets × days rows.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[key_col]),
                             pc.is_valid(b[ts_col])))
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // 86_400_000_000
        kd = np.unique(np.rec.fromarrays([k, day], names=["k", "d"]))
        h = pd.util.hash_array(kd["k"])
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "k": pa.array(kd["k"]), "d": pa.array(kd["d"])})

    def counts(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        kd = np.unique(np.rec.fromarrays([k, d], names=["k", "d"]))
        ks, ds_ = kd["k"], kd["d"]
        ud, dau = np.unique(ds_, return_counts=True)
        # window expansion: (k, d) contributes to targets d..d+W-1;
        # distinct (k, target) via unique over the expanded recarray
        off = np.arange(window_days, dtype=np.int64)
        tk = np.repeat(ks, window_days)
        tt = (ds_[:, None] + off[None, :]).ravel()
        kt = np.unique(np.rec.fromarrays([tk, tt], names=["k", "t"]))
        ut, wau = np.unique(kt["t"], return_counts=True)
        days = np.union1d(ud, ut)
        dau_full = np.zeros(len(days), dtype=np.int64)
        dau_full[np.searchsorted(days, ud)] = dau
        wau_full = np.zeros(len(days), dtype=np.int64)
        wau_full[np.searchsorted(days, ut)] = wau
        return pa.table({"day": pa.array(days),
                         "dau": pa.array(dau_full),
                         "wau": pa.array(wau_full)})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, counts)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ("day", "dau", "wau")})
    df = (res.to_pandas().groupby("day", as_index=False)
          .agg(dau=("dau", "sum"), wau=("wau", "sum")))
    # expansion creates phantom trailing days with zero direct
    # activity — the output contract is ACTIVE days only
    df = df[df.dau > 0]
    return (df.astype({"day": "int64", "dau": "int64", "wau": "int64"})
            .sort_values("day").reset_index(drop=True))


def conversion_gaps(events_ds, from_type: str, to_type: str,
                    key_col: str = "user_id", ts_col: str = "ts",
                    type_col: str = "event_type",
                    num_buckets: int = 32) -> pd.DataFrame:
    """Time-to-convert per key: first ``from_type`` event, then the
    first ``to_type`` event AT OR AFTER it; gap in whole seconds
    (``(t1 − t0) // 1_000_000``, non-negative so numpy and SQL ``//``
    agree).  Keys without both events emit nothing.  The funnel-depth
    companion: :func:`funnel_counts` says HOW MANY convert, this says
    HOW FAST.  Null key/ts/type rows drop.  Returns ``(key, gap_s)``
    sorted by key — converting-key-sized output.

    Distributed shape: batches pre-reduce to per-key candidate
    extrema (min from-ts, and min to-ts as a CONSERVATIVE candidate
    set: every to-event ≥ the batch's from-min survives); ONE
    key-keyed exchange resolves exactly.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, type_col])
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                     pc.is_valid(b[ts_col])),
                             pc.is_valid(b[type_col])))
        b = b.filter(pc.is_in(b[type_col],
                              value_set=pa.array([from_type, to_type])))
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def resolve(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        st = pc.cast(t[type_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        uk = np.unique(k)
        big = np.iinfo(np.int64).max
        t0 = np.full(len(uk), big, dtype=np.int64)
        m_from = st == from_type
        np.minimum.at(t0, np.searchsorted(uk, k[m_from]), ts[m_from])
        # first to-event >= t0, fully vectorized: mask each to-event
        # against its key's t0, then a min-reduce per key (min over
        # the mask == first, since nothing here needs sort order)
        m_to = st == to_type
        kt, tt = k[m_to], ts[m_to]
        pos_key = np.searchsorted(uk, kt)
        ok_to = tt >= t0[pos_key]
        t1 = np.full(len(uk), big, dtype=np.int64)
        np.minimum.at(t1, pos_key[ok_to], tt[ok_to])
        ok = (t0 != big) & (t1 != big)
        return pa.table({
            key_col: pa.array(uk[ok]),
            "gap_s": pa.array((t1[ok] - t0[ok]) // 1_000_000)})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({key_col: pd.Series(dtype="int64"),
                             "gap_s": pd.Series(dtype="int64")})
    return (res.to_pandas().astype({key_col: "int64", "gap_s": "int64"})
            .sort_values(key_col).reset_index(drop=True))


def transition_diversity(events_ds, user_col: str = "user_id",
                         ts_col: str = "ts", type_col: str = "event_type",
                         id_col: str = "event_id",
                         num_buckets: int = 32) -> pd.DataFrame:
    """Per-user TRANSITION-DIVERSITY surface of the event-type Markov
    chain — the behavioral-entropy audit that separates scripted/bot
    streams (few distinct transitions, huge repeat mass) from organic
    ones, with zero float policy: order each user's events by
    ``(ts, event_id)``, take consecutive event-type pairs, and emit
    ``n_transitions`` (pairs), ``n_distinct`` (distinct pairs) and
    ``sum_c2`` = Σ c·(c−1) over per-pair counts (the collision count —
    the exact integer surface of Rényi-2 / Simpson diversity; repeat
    probability = sum_c2 / (n·(n−1))).  Rows with a null
    user/ts/type/id drop first; order is over the remaining rows.

    Scale shape: ONE user-keyed exchange; the per-bucket resolve is
    fully vectorized (lexsort + adjacent-pair encoding + two unique
    passes — no per-user loop).  Output is users-sized.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_valid(b[user_col])
        for c in (ts_col, type_col, id_col):
            m = pc.and_(m, pc.is_valid(b[c]))
        b = b.filter(m)
        u = pc.cast(b[user_col], pa.int64())
        h = md5_u64le(pc.cast(u, pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "u": u,
            "t": pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                         pa.int64()),
            "i": pc.cast(b[id_col], pa.int64()),
            "e": pc.cast(b[type_col], pa.string())})

    def resolve(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        ei = t.column("i").to_numpy(zero_copy_only=False)
        et = t.column("e").to_numpy(zero_copy_only=False).astype(object)
        order = np.lexsort((ei, ts, u))
        u, et = u[order], et[order]
        _, code = np.unique(et, return_inverse=True)
        code = code.astype(np.int64)
        same = u[1:] == u[:-1]  # consecutive rows of the SAME user
        tu = u[:-1][same]
        trans = code[:-1][same] * np.int64(len(np.unique(code)) + 1) \
            + code[1:][same]
        # per-(user, transition) counts, then per-user aggregates
        s = np.empty(len(tu), dtype=[("u", np.int64), ("tr", np.int64)])
        s["u"], s["tr"] = tu, trans
        pairs, c = np.unique(s, return_counts=True)
        uu, inv = np.unique(pairs["u"], return_inverse=True)
        n_trans = np.zeros(len(uu), dtype=np.int64)
        np.add.at(n_trans, inv, c)
        n_distinct = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        sum_c2 = np.zeros(len(uu), dtype=np.int64)
        np.add.at(sum_c2, inv, c * (c - 1))
        return pa.table({"user_id": pa.array(uu),
                         "n_transitions": pa.array(n_trans),
                         "n_distinct": pa.array(n_distinct),
                         "sum_c2": pa.array(sum_c2)})

    tagged = (events_ds.select_columns([user_col, ts_col, type_col,
                                        id_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ("user_id", "n_transitions", "n_distinct", "sum_c2")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    return (res.to_pandas().sort_values("user_id")
            .reset_index(drop=True))


def user_growth_accounting(events_ds, user_col: str = "user_id",
                           ts_col: str = "ts",
                           num_buckets: int = 32) -> pd.DataFrame:
    """USER GROWTH accounting — the new-vs-returning decomposition
    behind every growth dashboard: per active day, ``n_new`` (users
    whose FIRST-EVER event lands that day), ``n_active`` (distinct
    users that day) and ``cum_users`` (running total of acquired
    users; returning = n_active − n_new).  Null user/ts rows drop.
    Returns ``(day, n_new, n_active, cum_users)`` by day (epoch-day
    int64).

    Scale shape: ONE user-keyed exchange holds each user's complete
    day set, so first-seen days and per-day distinct counts are both
    exact from bucket-local work; only (day, count) partials reach
    the driver (days × buckets), where the cumulative sum is a
    days-sized vector op.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.is_valid(b[ts_col])))
        u = pc.cast(b[user_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        d = ts // 86_400_000_000
        s = np.empty(len(u), dtype=[("u", np.int64), ("d", np.int64)])
        s["u"], s["d"] = u, d
        pairs = np.unique(s)  # map-side (user, day) dedup
        h = md5_u64le(pc.cast(pa.array(pairs["u"]), pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "u": pa.array(pairs["u"]), "d": pa.array(pairs["d"])})

    def resolve(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        s = np.empty(len(u), dtype=[("u", np.int64), ("d", np.int64)])
        s["u"], s["d"] = u, d
        pairs = np.unique(s)  # re-dedup across map batches
        u, d = pairs["u"], pairs["d"]
        uu, inv = np.unique(u, return_inverse=True)
        first = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, inv, d)
        nd, n_new = np.unique(first, return_counts=True)
        ad, n_act = np.unique(d, return_counts=True)
        days = np.union1d(nd, ad)
        nn = np.zeros(len(days), dtype=np.int64)
        nn[np.searchsorted(days, nd)] = n_new
        na = np.zeros(len(days), dtype=np.int64)
        na[np.searchsorted(days, ad)] = n_act
        return pa.table({"day": pa.array(days),
                         "n_new": pa.array(nn),
                         "n_active": pa.array(na)})

    tagged = (events_ds.select_columns([user_col, ts_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ("day", "n_new", "n_active", "cum_users")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    out = (res.to_pandas().groupby("day", as_index=False)
           [["n_new", "n_active"]].sum().sort_values("day"))
    out["cum_users"] = out.n_new.cumsum()
    return out.reset_index(drop=True).astype("int64")


def journey_signatures(events_ds, key_col: str = "user_id",
                       ts_col: str = "ts", state_col: str = "event_type",
                       id_col: str = "event_id", topk: int = 20,
                       num_buckets: int = 32,
                       max_bucket_rows: int | None = None
                       ) -> pd.DataFrame:
    """Top-k user-journey SIGNATURES: each key's full ordered
    ``state_col`` path (order: ts asc, then ``id_col`` as the
    deterministic tiebreak) fingerprints to ``md5(join(states,
    ','))`` — the behavioral-dedup / funnel-mining primitive (how
    many users share EXACTLY this click-path; SQL:
    ``md5(string_agg(type, ',' ORDER BY ts, id))``).  Rows with a
    null key/ts/state drop.  Returns ``(sig, n_users, n_events,
    example_user)`` — the top ``topk`` by (n_users DESC, sig ASC);
    ``n_events`` is the shared path's length, ``example_user`` the
    smallest key carrying it.

    Scale shape: exchange 1 co-locates each key's rows (one lexsort
    per bucket, paths joined per key — never cross-bucket), emitting
    ONE (sig, n_events, key) row per key that stays in the object
    store; exchange 2 co-locates signatures and each bucket emits its
    LOCAL top-k, so the driver ranks num_buckets×k candidate rows
    (global top-k ⊆ union of per-bucket top-k — a signature lives in
    exactly one bucket).  Path strings exist only inside exchange-1
    merge tasks; the wire carries 32-byte digests after that.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_hex, md5_u64le
    from ..stages.exchange import grouped_exchange, grouped_exchange_ds

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[ts_col])),
                       pc.is_valid(b[state_col]))
        b = b.select([key_col, ts_col, state_col, id_col]).filter(keep)
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    per_user_schema = pa.schema([
        ("sig", pa.string()), ("n_events", pa.int64()),
        ("user", pa.int64())])

    def paths(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        st = pc.cast(t[state_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        o = np.lexsort((iv, ts, k))
        ks, ss = k[o], st[o]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        users = ks[starts]
        joined = [",".join(ss[s:e]) for s, e in zip(starts, ends)]
        sig = md5_hex(pa.array(joined, type=pa.string()))
        return pa.table({"sig": sig,
                         "n_events": pa.array(
                             (ends - starts).astype(np.int64)),
                         "user": pa.array(users.astype(np.int64))})

    def sig_tag(b: pa.Table) -> pa.Table:
        h = md5_u64le(b["sig"])
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def local_topk(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby("sig", as_index=False)
              .agg(n_users=("user", "size"),
                   n_events=("n_events", "first"),
                   example_user=("user", "min")))
        df = df.sort_values(["n_users", "sig"],
                            ascending=[False, True]).head(topk)
        return pa.Table.from_pandas(df[["sig", "n_users", "n_events",
                                        "example_user"]],
                                    preserve_index=False)

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    per_user = grouped_exchange_ds(tagged, "__b", num_buckets, paths,
                                   empty_schema=per_user_schema,
                                   max_bucket_rows=max_bucket_rows)
    cands = grouped_exchange(
        per_user.map_batches(sig_tag, batch_format="pyarrow"),
        "__b", num_buckets, local_topk)
    cols = ["sig", "n_users", "n_events", "example_user"]
    if cands is None or cands.num_rows == 0:
        return pd.DataFrame(columns=cols).astype(
            {"n_users": "int64", "n_events": "int64",
             "example_user": "int64"})
    df = (cands.to_pandas()
          .sort_values(["n_users", "sig"], ascending=[False, True])
          .head(topk).reset_index(drop=True))
    return df[cols].astype({"n_users": "int64", "n_events": "int64",
                            "example_user": "int64"})


def subsequence_support(events_ds, pattern: list[str],
                        key_col: str = "user_id", ts_col: str = "ts",
                        state_col: str = "event_type",
                        num_buckets: int = 32,
                        max_bucket_rows: int | None = None
                        ) -> pd.DataFrame:
    """Ordered-SUBSEQUENCE support: how many keys contain the pattern
    ``[s₀, s₁, …]`` as a strictly-time-increasing subsequence of
    their event stream — sequential-pattern mining's support count
    (unlike :func:`funnel_counts` there is NO window bound; unlike
    transitions the steps need not be adjacent).  Chaining is greedy
    and strict: step i+1 must occur at a ``ts`` STRICTLY after the
    EARLIEST completion of step i (equal timestamps do not chain —
    order within a timestamp tie is ambiguous), and greedy-earliest
    chaining is optimal for subsequence existence.  Null
    key/ts/state rows drop.  Returns one row ``(n_users, n_match)``
    — ``n_users`` counts keys with ≥ 1 event of ANY pattern state
    (the candidate base; keys whose events never touch the pattern
    cannot match and are not shipped through the exchange).

    Scale shape: ONE key-hashed exchange; each bucket resolves its
    keys with |pattern| vectorized passes (per-step filter + per-key
    min-after, pandas groupby — no per-event Python), emitting a
    2-int partial; the driver sums ``num_buckets`` rows.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    if not pattern:
        raise ValueError("pattern must name at least one state")

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[ts_col])),
                       pc.is_valid(b[state_col]))
        b = b.select([key_col, ts_col, state_col]).filter(keep)
        # events not in the pattern can never advance the chain
        b = b.filter(pc.is_in(b[state_col],
                              value_set=pa.array(pattern)))
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def resolve(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": pc.cast(t[key_col], pa.int64()).to_numpy(
                zero_copy_only=False),
            "ts": pc.cast(t[ts_col], pa.int64()).to_numpy(
                zero_copy_only=False),
            "s": pc.cast(t[state_col], pa.string()).to_numpy(
                zero_copy_only=False)})
        users = pd.unique(df.k)
        # prev[k] = earliest completion ts of the chain so far
        prev = pd.Series(-np.inf, index=users)
        for step in pattern:
            cand = df[df.s == step]
            cand = cand[cand.ts > cand.k.map(prev).to_numpy()]
            nxt = cand.groupby("k")["ts"].min()
            prev = pd.Series(np.inf, index=users)
            prev.update(nxt)
        n_match = int((prev != np.inf).sum())
        return pa.table({"n_users": pa.array([len(users)], pa.int64()),
                         "n_match": pa.array([n_match], pa.int64())})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve,
                           max_bucket_rows=max_bucket_rows)
    if res is None or res.num_rows == 0:
        return pd.DataFrame([{"n_users": 0, "n_match": 0}]).astype(
            "int64")
    df = res.to_pandas()
    return pd.DataFrame([{"n_users": int(df.n_users.sum()),
                          "n_match": int(df.n_match.sum())}]).astype(
        "int64")


def type_set_counts(events_ds, key_col: str = "user_id",
                    state_col: str = "event_type",
                    num_buckets: int = 32) -> pd.DataFrame:
    """Behavioral TYPE-SET powerset counts: how many keys exhibit
    exactly this SET of states (order-free companion to
    :func:`journey_signatures` — segments users by which behaviors
    they ever showed, e.g. "purchased but never errored").  Set
    identity is the sorted distinct states joined by ','.  Null
    key/state rows drop.  Returns ``(type_set, n_users)`` sorted by
    type_set.

    Scale shape: per-batch (key, state) dedup, ONE key-hashed
    exchange (a key's states co-locate → exact per-key set), per-
    bucket set-count partials; the driver merges ≤ 2^|alphabet| rows
    per bucket (the state alphabet is small by contract).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b[key_col]),
                       pc.is_valid(b[state_col]))
        b = b.select([key_col, state_col]).filter(keep)
        b = b.group_by([key_col, state_col]).aggregate([])
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def resolve(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": pc.cast(t[key_col], pa.int64()).to_numpy(
                zero_copy_only=False),
            "s": pc.cast(t[state_col], pa.string()).to_numpy(
                zero_copy_only=False)})
        df = df.drop_duplicates()
        sets = (df.sort_values("s").groupby("k")["s"]
                .agg(",".join))
        cnt = sets.value_counts()
        return pa.table({"type_set": pa.array(cnt.index.to_numpy(object),
                                              pa.string()),
                         "n_users": pa.array(cnt.to_numpy(np.int64))})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"type_set": pd.Series(dtype=object),
                             "n_users": pd.Series(dtype="int64")})
    df = (res.to_pandas().groupby("type_set", as_index=False)
          ["n_users"].sum())
    return (df.sort_values("type_set").reset_index(drop=True)
            .astype({"n_users": "int64"}))


def session_size_hist(events_ds, gap_minutes: float = 30.0,
                      user_col: str = "user_id", ts_col: str = "ts",
                      value_col: str = "value") -> pd.DataFrame:
    """SESSION-SIZE histogram — the engagement-shape audit built ON
    TOP of the object-store-resident :func:`sessionize_ds` (the
    VERDICT-r4 Dataset variant): how many sessions contain exactly k
    events.  Returns ``(session_size, n_sessions)`` sorted.

    Scale shape: session rows never land on the driver — per-block
    partial (size → count) histograms reduce to distinct-size-bounded
    frames (sizes are small integers by the nature of sessions).
    """
    ses = sessionize_ds(events_ds, gap_minutes=gap_minutes,
                        user_col=user_col, ts_col=ts_col,
                        value_col=value_col)

    def partial(b: pa.Table) -> pa.Table:
        n = b.column("n_events").to_numpy(zero_copy_only=False)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"session_size": pa.array(u.astype(np.int64)),
                         "n_sessions": pa.array(c.astype(np.int64))})

    parts = ses.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"session_size": pd.Series(dtype="int64"),
                             "n_sessions": pd.Series(dtype="int64")})
    out = (parts.groupby("session_size", as_index=False)
           ["n_sessions"].sum())
    return (out.sort_values("session_size").reset_index(drop=True)
            .astype("int64"))


def type_cooccurrence_daily(events_ds, num_buckets: int = 32
                            ) -> pd.DataFrame:
    """Event-type affinity matrix — for every unordered type pair
    ``(type_a < type_b)``, the number of (user, day) baskets whose
    timeline contains BOTH types (the market-basket co-occurrence
    surface behind "users who search also click" product questions;
    the within-day sibling of ``transition_counts``, which only sees
    ADJACENT steps).  SQL parity::

        WITH b AS (SELECT DISTINCT user_id, day, event_type ...)
        SELECT a.event_type, c.event_type, COUNT(*)
        FROM b a JOIN b c ON (a.user_id, a.day) = (c.user_id, c.day)
                        AND a.event_type < c.event_type GROUP BY 1, 2

    Scale shape: batches collapse to distinct (user, day, type)
    triples map-side, ONE (user, day)-hashed exchange dedups triples
    across batches and enumerates pairs per basket with the
    repeat/arange cross-product pattern (baskets are bounded by the
    type alphabet, so per-basket work is O(|alphabet|²)); each merge
    task emits an alphabet²-sized pair histogram and the driver merges
    those.  Null user/ts/type rows drop (restated in the SQL).
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["user_id"]),
                    pc.and_(pc.is_valid(b["ts"]),
                            pc.is_valid(b["event_type"])))
        b = b.filter(m)
        day = (pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                       pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        t = pa.table({"u": pc.cast(b["user_id"], pa.int64()),
                      "d": pa.array(day),
                      "ty": pc.cast(b["event_type"], pa.string())})
        t = t.group_by(["u", "d", "ty"]).aggregate([])
        u = t.column("u").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        h = (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + d.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9))
        return pa.table({"__b": pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)),
            "u": t.column("u"), "d": t.column("d"),
            "ty": t.column("ty")})

    def resolve(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("ty").to_pylist(), dtype=object)
        uty, tyc = np.unique(ty, return_inverse=True)
        order = np.lexsort((tyc, d, u))
        u, d, tyc = u[order], d[order], tyc[order]
        # dedupe triples surviving from different source batches
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])
                     | (tyc[1:] != tyc[:-1])] if len(u) else \
            np.empty(0, bool)
        u, d, tyc = u[keep], d[keep], tyc[keep]
        st = (np.flatnonzero(np.r_[True, (u[1:] != u[:-1])
                                   | (d[1:] != d[:-1])])
              if len(u) else np.empty(0, np.int64))
        n = np.diff(np.append(st, len(u)))
        # cross product within baskets (repeat/arange), keep a < b;
        # basket size is bounded by the type alphabet
        grp_of_row = np.repeat(np.arange(len(st)), n)
        rep = n[grp_of_row]
        left = np.repeat(np.arange(len(u)), rep)
        csum = np.concatenate([[0], np.cumsum(rep)[:-1]]) \
            if len(rep) else np.empty(0, np.int64)
        right = (np.arange(int(rep.sum())) - np.repeat(csum, rep)
                 + np.repeat(st[grp_of_row], rep))
        keep2 = tyc[left] < tyc[right]
        a, b2 = tyc[left][keep2], tyc[right][keep2]
        pair = a * len(uty) + b2
        up, cnt = np.unique(pair, return_counts=True)
        return pa.table({
            "type_a": pa.array(uty[up // len(uty)]),
            "type_b": pa.array(uty[up % len(uty)]),
            "n_user_days": pa.array(cnt.astype(np.int64))})

    tagged = events_ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"type_a": pd.Series(dtype=object),
                             "type_b": pd.Series(dtype=object),
                             "n_user_days": pd.Series(dtype="int64")})
    df = (res.to_pandas()
          .groupby(["type_a", "type_b"], as_index=False)
          ["n_user_days"].sum())
    df["n_user_days"] = df.n_user_days.astype("int64")
    return (df.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def user_lifetime_histogram(events_ds, num_buckets: int = 32
                            ) -> pd.DataFrame:
    """Lifetime-shape census: each user reduces to
    ``(span_d = last_day − first_day, active_days = #distinct days)``
    and the population histograms over those pairs — the
    retention-shape surface behind "are users long-lived but sparse,
    or short bursts?" (the per-user sibling of ``dau_wau``'s calendar
    counts and ``activity_streaks``' consecutive-run census).  SQL
    parity::

        WITH ud AS (SELECT DISTINCT user_id, day ...),
        per AS (SELECT user_id, MAX(d)-MIN(d), COUNT(*) ...)
        SELECT span_d, active_days, COUNT(*) GROUP BY 1, 2

    Scale shape: batches collapse to distinct (user, day) pairs
    map-side; ONE user-hashed exchange dedups pairs across batches and
    reduces each user to its (span, active) cell; merge tasks emit
    cell histograms and the driver merges ~calendar²-bounded cells.
    Null user/ts rows drop (restated in the SQL).
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        b = b.filter(m)
        day = (pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                       pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        t = pa.table({"u": pc.cast(b["user_id"], pa.int64()),
                      "d": pa.array(day)})
        t = t.group_by(["u", "d"]).aggregate([])
        u = t.column("u").to_numpy(zero_copy_only=False)
        return pa.table({"__b": pa.array(
            (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             % np.uint64(num_buckets)).astype(np.int64)),
            "u": t.column("u"), "d": t.column("d")})

    def resolve(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = (np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
                if len(u) else np.empty(0, bool))
        u, d = u[keep], d[keep]
        st = (np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
              if len(u) else np.empty(0, np.int64))
        n = np.diff(np.append(st, len(u)))
        span = d[st + n - 1] - d[st]  # days sorted within user
        cell = span * 100_000 + n  # active_days < 100k per user
        uc, cnt = np.unique(cell, return_counts=True)
        return pa.table({
            "span_d": pa.array((uc // 100_000).astype(np.int64)),
            "active_days": pa.array((uc % 100_000).astype(np.int64)),
            "n_users": pa.array(cnt.astype(np.int64))})

    tagged = events_ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"span_d": pd.Series(dtype="int64"),
                             "active_days": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    df = (res.to_pandas()
          .groupby(["span_d", "active_days"], as_index=False)
          ["n_users"].sum())
    return (df.sort_values(["span_d", "active_days"])
            .reset_index(drop=True).astype("int64"))


def milestone_day_histogram(events_ds, threshold_cents: int,
                            num_buckets: int = 32) -> pd.DataFrame:
    """Milestone-attainment curve: for every user whose cumulative
    event value (exact cents, ordered by ``(ts, event_id)``) reaches
    ``threshold_cents``, the DAY of first crossing — histogrammed as
    ``(day, n_users)`` (the "time to $X lifetime value" growth
    surface).  The ``(ts, event_id)`` total order makes the crossing
    row deterministic even under same-timestamp ties (restated in the
    SQL window's ORDER BY).

    Scale shape: ONE user-hashed exchange ships narrow
    ``(u, ts, event_id, cents)`` rows; each merge task sorts its
    users' timelines once (one lexsort), cumulative-sums per user
    segment, and finds the first crossing with one searchsorted per
    segment boundary — emitting a calendar-bounded day histogram.
    Null user/ts/value/event_id rows drop (restated in the SQL).
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = None
        for c in ("user_id", "ts", "value", "event_id"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        u = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(100.0 * b["value"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({"__b": pa.array(
            (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             % np.uint64(num_buckets)).astype(np.int64)),
            "u": pa.array(u), "t": pa.array(ts),
            "e": pc.cast(b["event_id"], pa.int64()),
            "c": pa.array(cents)})

    def resolve(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        e = t.column("e").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, ts, u))
        u, ts, c = u[order], ts[order], c[order]
        st = (np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
              if len(u) else np.empty(0, np.int64))
        cum = np.cumsum(c)
        base = np.zeros(len(u), np.int64)
        if len(st):
            seg_base = np.concatenate([[0], cum[st[1:] - 1]])
            base = np.repeat(seg_base, np.diff(np.append(st, len(u))))
        cs = cum - base  # per-user running total
        crossed = cs >= threshold_cents
        # first crossing per user segment: the first True index
        idx = np.flatnonzero(crossed)
        if len(idx) == 0:
            return pa.table({"day": pa.array([], type=pa.int64()),
                             "n_users": pa.array([],
                                                 type=pa.int64())})
        seg_of = np.searchsorted(st, idx, side="right") - 1
        keep = np.r_[True, seg_of[1:] != seg_of[:-1]]
        days = ts[idx[keep]] // 86_400_000_000
        ud, cnt = np.unique(days, return_counts=True)
        return pa.table({"day": pa.array(ud.astype(np.int64)),
                         "n_users": pa.array(cnt.astype(np.int64))})

    tagged = events_ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"day": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    df = (res.to_pandas().groupby("day", as_index=False)
          ["n_users"].sum())
    return (df.sort_values("day").reset_index(drop=True)
            .astype("int64"))


def max_burst_histogram(events_ds, window_us: int = 600_000_000,
                        num_buckets: int = 32) -> pd.DataFrame:
    """Bot/abuse burst census: each user's MAXIMUM event count inside
    any ``[t, t + window]`` window anchored at one of their events,
    histogrammed over users — the rate-limit sizing surface ("what
    burst ceiling would flag <0.1% of humans?").

    Scale shape: ONE user-hashed exchange ships (u, ts) rows; each
    merge task sorts once by (u, ts) and counts every anchor's window
    with two vectorized ``np.searchsorted`` calls over a
    rank-offsetted timestamp array (each user's timeline shifted by
    ``user_rank × (span + window + 1)`` so windows can never leak
    into a neighbor's segment — no per-user Python loop), then takes
    per-segment maxima with one ``reduceat``.  Null user/ts rows drop
    (restated in the SQL).  Overflow guard: #users-per-bucket ×
    (span + window) must stay below 2⁶³ — raises if not.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        b = b.filter(m)
        u = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"__b": pa.array(
            (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             % np.uint64(num_buckets)).astype(np.int64)),
            "u": pa.array(u), "t": pa.array(ts)})

    def resolve(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.table({"max_burst": pa.array([],
                                                   type=pa.int64()),
                             "n_users": pa.array([],
                                                 type=pa.int64())})
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        st = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        rank = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        span = int(ts.max() - ts.min())
        stride = span + window_us + 1
        if len(st) and stride > (2**62) // max(1, len(st)):
            raise ValueError(
                "max_burst_histogram: rank*stride would overflow "
                "int64 — shrink num_buckets or the time span")
        tmod = (ts - ts.min()) + rank * stride
        hi = np.searchsorted(tmod, tmod + window_us, side="right")
        lo = np.searchsorted(tmod, tmod, side="left")
        w = hi - lo
        mx = np.maximum.reduceat(w, st)
        um, cnt = np.unique(mx, return_counts=True)
        return pa.table({
            "max_burst": pa.array(um.astype(np.int64)),
            "n_users": pa.array(cnt.astype(np.int64))})

    tagged = events_ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"max_burst": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    df = (res.to_pandas().groupby("max_burst", as_index=False)
          ["n_users"].sum())
    return (df.sort_values("max_burst").reset_index(drop=True)
            .astype("int64"))


def session_handoff_matrix(events_ds, gap_us: int = 1_800_000_000,
                           num_buckets: int = 32) -> pd.DataFrame:
    """Cross-SESSION journey matrix: for every pair of CONSECUTIVE
    sessions of one user (30-min-gap sessionization, the
    `events_sessionize` convention with an explicit ``(ts, event_id)``
    tiebreak), count (last type of session i → first type of session
    i+1) — "how do visits end, and how does the next visit start?",
    the between-visits sibling of `transition_counts` (within-visit
    adjacency).

    Scale shape: ONE user-hashed exchange ships narrow
    ``(u, ts, event_id, type)`` rows; each merge task sorts its users'
    timelines once, marks session boundaries with a shifted gap
    compare, reads per-session first/last types at the boundary
    indexes, pairs consecutive sessions per user (all vectorized),
    and emits an alphabet²-sized matrix partial.  Null
    user/ts/type/event_id rows drop (restated in the SQL).
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = None
        for c in ("user_id", "ts", "event_type", "event_id"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        u = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"__b": pa.array(
            (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             % np.uint64(num_buckets)).astype(np.int64)),
            "u": pa.array(u),
            "t": pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                         pa.int64()),
            "e": pc.cast(b["event_id"], pa.int64()),
            "ty": pc.cast(b["event_type"], pa.string())})

    def resolve(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        e = t.column("e").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("ty").to_pylist(), dtype=object)
        empty = pa.table({
            "from_type": pa.array([], type=pa.string()),
            "to_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64())})
        if len(u) == 0:
            return empty
        order = np.lexsort((e, ts, u))
        u, ts, ty = u[order], ts[order], ty[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap_break = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        sess_start = new_user | gap_break
        sst = np.flatnonzero(sess_start)          # session starts
        send = np.r_[sst[1:] - 1, len(u) - 1]     # session ends
        first_ty, last_ty = ty[sst], ty[send]
        sess_user = u[sst]
        # consecutive sessions of the SAME user
        same = sess_user[1:] == sess_user[:-1]
        frm, to = last_ty[:-1][same], first_ty[1:][same]
        if not len(frm):
            return empty
        ut, fc = np.unique(np.concatenate([frm, to]),
                           return_inverse=True)
        f, g = fc[:len(frm)], fc[len(frm):]
        cell = f * len(ut) + g
        uc, cnt = np.unique(cell, return_counts=True)
        return pa.table({
            "from_type": pa.array(ut[uc // len(ut)]),
            "to_type": pa.array(ut[uc % len(ut)]),
            "n": pa.array(cnt.astype(np.int64))})

    tagged = events_ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"from_type": pd.Series(dtype=object),
                             "to_type": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    df = (res.to_pandas()
          .groupby(["from_type", "to_type"], as_index=False)
          ["n"].sum())
    df["n"] = df.n.astype("int64")
    return (df.sort_values(["from_type", "to_type"])
            .reset_index(drop=True))


def session_bounce_by_entry(events_ds, gap_minutes: float = 30.0,
                            key_col: str = "user_id",
                            ts_col: str = "ts",
                            type_col: str = "event_type",
                            id_col: str = "event_id",
                            num_buckets: int = 32) -> pd.DataFrame:
    """BOUNCE-RATE profile by session entry point — "which landing
    event types produce one-and-done sessions?" (the engagement-
    quality twin of :func:`session_duration_by_entry`): per user
    timeline (order ``ts`` asc, ``id`` asc), a new session opens at
    each gap > ``gap_minutes``; each session is credited to its FIRST
    event's type, a bounce is a size-1 session.  Null
    key/ts/type/id rows drop.

    Scale shape: ONE user-keyed exchange; each bucket task folds its
    users' timelines and emits per-ENTRY-TYPE (n_sessions, n_bounce)
    partials — types-sized, never session-sized — summed on the
    driver.  Returns ``(event_type, n_sessions, n_bounce,
    bounce_pm)`` sorted by type (``bounce_pm = floor(1000 *
    n_bounce / n_sessions)``).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    gap_us = int(gap_minutes * 60 * 1_000_000)

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, type_col, id_col])
        m = None
        for c in (key_col, ts_col, type_col, id_col):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def fold(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        st = pc.cast(t[type_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        o = np.lexsort((iv, ts, k))
        k, st, ts = k[o], st[o], ts[o]
        new = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            new[1:] = (k[1:] != k[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(k)))
        et = st[starts]
        ue, inv = np.unique(et.astype(str), return_inverse=True)
        n_sess = np.bincount(inv, minlength=len(ue))
        n_bounce = np.bincount(inv, weights=(n == 1),
                               minlength=len(ue)).astype(np.int64)
        return pa.table({
            type_col: pa.array(ue, type=pa.string()),
            "n_sessions": pa.array(n_sess.astype(np.int64)),
            "n_bounce": pa.array(n_bounce)})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    out = grouped_exchange(tagged, "__b", num_buckets, fold)
    cols = [type_col, "n_sessions", "n_bounce", "bounce_pm"]
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(
            dtype="string" if c == type_col else "int64")
            for c in cols})
    df = (out.to_pandas().groupby(type_col, as_index=False)
          [["n_sessions", "n_bounce"]].sum())
    df["bounce_pm"] = (1000 * df.n_bounce // df.n_sessions)
    return (df.sort_values(type_col).reset_index(drop=True)
            .astype({"n_sessions": "int64", "n_bounce": "int64",
                     "bounce_pm": "int64"}))
