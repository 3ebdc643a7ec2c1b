"""Deterministic content-addressed sampling (training-data mixtures).

``hash_sample`` keeps a row iff ``bucket(key) % granularity`` falls
under the rate — the standard reproducible down-sampling trick: the
decision depends only on the KEY, so it is stable across runs, engines,
resumes and parallelism levels (unlike ``Dataset.random_sample``), and
any two samples at rates r1 < r2 are NESTED (the r1 sample is a subset
of the r2 sample), which is what mixture re-weighting experiments need.

``stratified_hash_sample`` applies a per-group rate (e.g. down-weight
one source of a corpus) with the same determinism.

Hash contract: ``bucket = md5_number_upper(key) % granularity`` — the
first 8 bytes of md5 read LITTLE-endian, i.e. exactly DuckDB's
``md5_number_upper``.  This deliberately differs from
``tokenize.word_token_id`` (big-endian): the little-endian form has a
C-speed vectorized kernel on BOTH sides (DuckDB in the oracle, an
embedded per-worker DuckDB connection here), whereas big-endian would
force a per-row Python md5 loop on the 100-TB sampling hot path
(~6x slower, VERDICT r2 item 4).  Each hash keeps exact SQL parity;
the sampling decision remains a pure function of the key bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

GRANULARITY = 10_000


def _hash_buckets(keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """md5-derived bucket in [0, GRANULARITY) per key (null -> -1).

    Vectorized C path: one ``md5_number_upper(k) % g`` scan through an
    embedded single-threaded DuckDB connection (cached per worker).
    Falls back to a pure-Python md5 loop with identical semantics if
    duckdb is unavailable.
    """
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    try:
        import duckdb  # noqa: F401
    except ImportError:
        out = np.empty(len(keys), dtype=np.int64)
        for i, k in enumerate(keys.to_pylist()):
            out[i] = (-1 if k is None else
                      int.from_bytes(hashlib.md5(str(k).encode()).digest()[:8],
                                     "little") % GRANULARITY)
        return out
    from ..functions.hashing import _duck_query

    kt = pa.table({"t": keys})
    r = _duck_query(
        f"SELECT CAST(COALESCE(md5_number_upper(t) % {GRANULARITY}, -1)"
        " AS BIGINT) AS b FROM kt", kt)
    return r.column("b").to_numpy(zero_copy_only=False)


def hash_sample(ds, rate: float, key_col: str = "doc_id"):
    """Dataset filtered to the deterministic ``rate`` fraction keyed on
    ``key_col`` (null keys never sampled)."""
    threshold = int(round(rate * GRANULARITY))

    def filt(b: pa.Table) -> pa.Table:
        bk = _hash_buckets(pc.cast(b[key_col], pa.string()))
        return b.filter(pa.array((bk >= 0) & (bk < threshold)))

    return ds.map_batches(filt, batch_format="pyarrow")


def weighted_sample(ds, weight_col: str, max_weight: int,
                    key_col: str = "doc_id"):
    """Deterministic WEIGHTED Bernoulli sampling — each row survives
    with probability ``min(1, weight/max_weight)`` (importance /
    length-proportional sampling: long documents kept, short ones
    thinned), keyed on ``key_col`` so reruns and the SQL oracle pick
    the IDENTICAL set.

    Integer-exact keep rule (no float thresholds anywhere):
    ``bucket(key) · max_weight < weight · GRANULARITY`` with
    ``bucket = md5_number_upper(key) % GRANULARITY`` — the same hash
    contract as :func:`hash_sample`, so a weighted sample NESTS inside
    a uniform sample of a higher rate the way stratified samples do.
    Weights above ``max_weight`` keep with probability 1; null or
    non-positive weights and null keys never sample.  Pure streaming
    map — no shuffle, no driver state.
    """
    if max_weight <= 0:
        raise ValueError(f"max_weight must be positive: {max_weight}")

    def filt(b: pa.Table) -> pa.Table:
        bk = _hash_buckets(pc.cast(b[key_col], pa.string()))
        w = pc.fill_null(pc.cast(b[weight_col], pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(
            (bk >= 0) & (bk * max_weight < w * GRANULARITY)))

    return ds.map_batches(filt, batch_format="pyarrow")


def stratified_hash_sample(ds, rates: dict, group_col: str = "source",
                           key_col: str = "doc_id",
                           default_rate: float = 1.0):
    """Per-group deterministic sampling: ``rates[group]`` fraction of
    each group survives (groups absent from ``rates`` keep
    ``default_rate``)."""
    thresholds = {g: int(round(r * GRANULARITY)) for g, r in rates.items()}
    default_thr = int(round(default_rate * GRANULARITY))

    def filt(b: pa.Table) -> pa.Table:
        import pandas as pd

        bk = _hash_buckets(pc.cast(b[key_col], pa.string()))
        # per-group threshold via factorize: Python touches only the
        # batch's UNIQUE groups, not every row (100-TB sampling path)
        codes, uniques = pd.factorize(
            pd.Series(b[group_col].to_numpy(zero_copy_only=False)),
            use_na_sentinel=False)
        thr_u = np.fromiter(
            (thresholds.get(u, default_thr) for u in uniques),
            dtype=np.int64, count=len(uniques))
        thr = thr_u[codes]
        return b.filter(pa.array((bk >= 0) & (bk < thr)))

    return ds.map_batches(filt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-budget mixture selection


_COARSE_SHIFT = 50  # 2^14 = 16,384 ordered h-ranges


def token_budget_sample(ds, budgets: dict, weight_col: str = "n_tok",
                        group_col: str = "source", key_col: str = "doc_id",
                        coarse_shift: int = _COARSE_SHIFT):
    """Deterministic per-group BUDGETED selection — the mixture
    re-weighting step of a training-data pipeline ("take 30 B tokens of
    web, 5 B of code, ..."): within each group, keep documents in md5
    priority order (``h = md5_number_upper(key)``, ties by key) until
    the group's cumulative ``weight_col`` reaches its budget; a doc is
    kept iff the cumulative weight BEFORE it is < budget.  Selection
    depends only on key bytes — stable across runs, engines,
    parallelism, and (like ``hash_sample``) NESTED: raising a budget
    only ever adds documents.  Groups absent from ``budgets`` are
    dropped; null keys are never selected.

    Scale shape — NO global sort.  The priority order is resolved at
    coarse h-range granularity first (``h >> 50``: 16,384 ordered
    ranges), which needs only per-(group, range) weight sums:

    1. one streaming pass builds those partials (map-side combine; the
       reduced frame is ≤ groups × 16,384 rows, driver-sized);
    2. the driver finds each group's BOUNDARY range b* (where the
       running total crosses the budget) and the exact weight offset
       before it;
    3. kept output = rows with ``h-range < b*`` (pure streaming
       filter) ∪ the boundary range's rows — expected |group|/16,384
       of the data — resolved exactly (sort by (h, key) + cumsum from
       the offset).  At larger corpora, widen the shift so the
       boundary slice stays driver-sized, or route it through
       ``stages.exchange`` per group.

    SQL-oracle parity: the kept set equals the window-function form
    ``SUM(w) OVER (PARTITION BY g ORDER BY md5_number_upper(k), k
    ROWS UNBOUNDED PRECEDING EXCLUDING CURRENT ROW) < budget``.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.hashing import md5_u64le

    def _prep(b: pa.Table):
        """(valid-rows table, h, coarse-range) for budgeted groups."""
        keys = pc.cast(b[key_col], pa.string())
        gmask = pa.array(pd.Series(b[group_col].to_pylist())
                         .isin(set(budgets)).to_numpy())
        valid = pc.and_(pc.is_valid(keys), gmask)
        sub = b.filter(valid)
        if sub.num_rows == 0:
            return sub, np.empty(0, np.uint64), np.empty(0, np.int64)
        h = md5_u64le(pc.cast(sub[key_col], pa.string()))
        return sub, h, (h >> np.uint64(coarse_shift)).astype(np.int64)

    def partials(b: pa.Table) -> pa.Table:
        sub, h, cb = _prep(b)
        if sub.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "cb": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        df = pd.DataFrame({
            "g": sub[group_col].to_pylist(), "cb": cb,
            "w": sub[weight_col].to_numpy(zero_copy_only=False)})
        agg = df.groupby(["g", "cb"], as_index=False)["w"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    part = (ds.map_batches(partials, batch_format="pyarrow").to_pandas()
            .groupby(["g", "cb"], as_index=False)["w"].sum())

    # per group: boundary range + exact offset before it
    bstar: dict = {}    # group -> boundary coarse range (None = keep all)
    offset: dict = {}   # group -> weight before the boundary range
    for g, gdf in part.groupby("g"):
        gdf = gdf.sort_values("cb")
        cum = gdf["w"].cumsum()
        budget = budgets[g]
        if budget <= 0:
            bstar[g], offset[g] = -1, 0   # nothing kept
        elif cum.iloc[-1] <= budget:
            bstar[g], offset[g] = None, 0  # whole group kept
        else:
            i = int(np.searchsorted(cum.to_numpy(), budget, side="left"))
            # cum[i] >= budget: range i is the boundary
            bstar[g] = int(gdf["cb"].iloc[i])
            offset[g] = int(cum.iloc[i - 1]) if i else 0
    for g in budgets:
        if g not in bstar:           # group absent from the data
            bstar[g], offset[g] = -1, 0

    FULL = np.iinfo(np.int64).max
    thr_map = {g: (FULL if b is None else b) for g, b in bstar.items()}

    def _thr(sub: pa.Table) -> np.ndarray:
        return (pd.Series(sub[group_col].to_pylist()).map(thr_map)
                .to_numpy(dtype=np.int64))

    def keep_full(b: pa.Table) -> pa.Table:
        sub, h, cb = _prep(b)
        if sub.num_rows == 0:
            return sub
        return sub.filter(pa.array(cb < _thr(sub)))

    def boundary_rows(b: pa.Table) -> pa.Table:
        sub, h, cb = _prep(b)
        if sub.num_rows == 0:
            return sub.append_column("_h", pa.array([], type=pa.uint64()))
        m = cb == _thr(sub)   # FULL sentinel never equals a real range
        return (sub.filter(pa.array(m))
                .append_column("_h", pa.array(h[m], type=pa.uint64())))

    kept_ds = ds.map_batches(keep_full, batch_format="pyarrow")

    # boundary slice: expected |data| / 2^(64-shift) rows — resolved
    # exactly on the driver (Arrow-native so the union keeps the exact
    # input schema)
    import ray

    bts = [t for t in ray.get(
        ds.map_batches(boundary_rows, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    if bts:
        bnd = pa.concat_tables(bts, promote_options="default")
        df = pd.DataFrame({
            "g": bnd[group_col].to_pylist(),
            "k": pc.cast(bnd[key_col], pa.string()).to_pylist(),
            "h": bnd["_h"].to_numpy(zero_copy_only=False),
            "w": bnd[weight_col].to_numpy(zero_copy_only=False),
        })
        keep_idx = []
        for g, gdf in df.groupby("g"):
            gdf = gdf.sort_values(["h", "k"])
            before = offset[g] + gdf["w"].cumsum() - gdf["w"]
            keep_idx.extend(gdf.index[before < budgets[g]].tolist())
        if keep_idx:
            mask = np.zeros(len(df), dtype=bool)
            mask[np.asarray(keep_idx)] = True
            sel = bnd.filter(pa.array(mask)).drop_columns(["_h"])
            kept_ds = kept_ds.union(rd.from_arrow(sel))
    return kept_ds


def split_assign(ds, fractions: dict, key_col: str = "doc_id",
                 out_col: str = "split"):
    """Deterministic named train/val/test split: each row gets the
    label whose cumulative md5-bucket range its key falls into
    (``fractions`` iteration order defines contiguous ranges:
    train [0, f1·G), val [f1·G, (f1+f2)·G), ...).  Same bucket
    function as ``hash_sample`` — so a 10% ``hash_sample`` is a
    subset of an 80% train split, assignments are stable across runs
    / engines / parallelism, and adding a later epoch of data never
    reshuffles existing rows between splits (the property file-level
    random splits lack).  Null keys get a null label.

    Fractions must cover [0, 1]; with G=10,000 granularity a fraction
    resolves to ``int(round(f·G))`` buckets, exactly as the SQL oracle
    states it.
    """
    names = list(fractions)
    cum = np.cumsum([int(round(f * GRANULARITY))
                     for f in fractions.values()])
    if cum[-1] != GRANULARITY:
        raise ValueError(
            f"fractions must sum to 1 (got bucket total {cum[-1]})")

    def add(b: pa.Table) -> pa.Table:
        bk = _hash_buckets(pc.cast(b[key_col], pa.string()))
        idx = np.clip(np.searchsorted(cum, bk, side="right"),
                      0, len(names) - 1)
        lab = np.empty(len(bk), dtype=object)
        for i, nm in enumerate(names):
            lab[idx == i] = nm
        lab[bk < 0] = None
        return b.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def resample_to_mix(ds, weights: dict, total: int,
                    group_col: str = "lang", key_col: str = "doc_id",
                    values: list[str] | None = None,
                    num_buckets: int = 64):
    """Deterministic mixture resampling — down-sample each group to an
    EXACT document count derived from target mixture weights (the
    domain-reweighting move behind The Pile / DoReMi-style mixes:
    "make the training mix 3 parts fr, 2 parts de, 1 part each
    en/zh/es").  Per group::

        k_g = min(count_g, weights[g] * total // sum(weights))

    Groups absent from ``weights`` are dropped.  When a group is
    SMALLER than its target, all of it survives and the realized mix
    deviates — by design (no upsampling; detect the shortfall by
    comparing output group counts to targets).

    Within a group the k_g survivors are the md5-priority sample
    (``select.grouped_sample_k``), so the output is stable across
    runs/engines/parallelism and nested: raising ``total`` only ADDS
    documents to every group's selection.

    Distributed shape: one value-counting pass reduces the corpus to
    driver-side (group → count) pairs; the per-group caps then ride
    the ``grouped_head`` exchange (map-side pre-cap at max k_g — the
    shuffle ships at most ``k_max`` rows per group per block).  SQL
    parity: ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    md5_number_upper(CAST(key AS VARCHAR)), key) <= k_g`` with k_g
    restated by the same integer arithmetic.
    """
    from .select import grouped_sample_k

    if total < 0:
        raise ValueError("total must be >= 0")
    w_sum = sum(weights.values())
    if w_sum <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative with a positive sum")
    # group values are matched by their STRING form throughout the
    # grouped machinery (grouped_head keys per-group caps that way), so
    # normalize weight keys — {1: 3} on an int64 group column would
    # otherwise silently match nothing and return an empty dataset
    weights = {str(g): w for g, w in weights.items()}
    # the input is consumed twice (count pass + sample pass); pin it so
    # a lazy upstream (a filter chain, a join) does not re-execute —
    # the mix input is normally a filtered fraction of the corpus, so
    # object-store residency is the cheaper side of the trade
    ds = ds.materialize()

    def count_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[key_col])))
        codes, uniq = pd.factorize(
            pd.Series(pc.cast(b[group_col], pa.string())
                      .to_numpy(zero_copy_only=False)))
        cnt = np.bincount(codes[codes >= 0], minlength=len(uniq))
        return pa.table({"g": pa.array(uniq, type=pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = (ds.map_batches(count_partial, batch_format="pyarrow")
             .to_pandas())
    counts = (parts.groupby("g")["c"].sum().to_dict() if len(parts)
              else {})
    k_by_group = {
        g: min(int(counts.get(g, 0)), w * total // w_sum)
        for g, w in weights.items() if g in counts}

    vals = values if values is not None else [key_col, group_col]
    return grouped_sample_k(ds, [group_col], k_by_group,
                            key_col=key_col, values=vals,
                            num_buckets=num_buckets)


def apportioned_sample(ds, group_col: str, id_col: str, total: int,
                       partial_budget: int | None = None):
    """EXACT-size proportional stratified sample: allocate exactly
    ``total`` rows across groups by the LARGEST-REMAINDER method
    (Hare quota — the apportionment rule): ``base_g = ⌊total·n_g/T⌋``
    seats per group, remaining seats to the largest remainders
    (``(total·n_g) mod T`` desc, group asc) — then take each group's
    ``seats_g`` rows with the smallest ``md5_number_upper(id)``
    (the repo's deterministic-sampling contract).  Unlike
    ``stratified_sample`` (per-group rate ⇒ size drifts) or
    ``grouped_sample_k`` (fixed k ⇒ ignores proportions), the output
    size is exactly ``total`` and proportions are as close as
    integer seats allow.

    Distributed shape: one cardinality-guarded grouped count (driver
    merge is group-sized), the seat arithmetic on that tiny frame,
    then ``select.grouped_head`` with a per-group cap dict — map-side
    pre-cap bounds the shuffle at seats × blocks.  Returns a Dataset
    of (id, group).

    Groups with more seats than rows keep all rows (total then falls
    short — the caller's apportionment basis was stale; counts here
    are computed fresh so it cannot happen in one pass).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from .analytics import GROUP_PARTIAL_BUDGET, grouped_stats
    from .select import grouped_head

    budget = (GROUP_PARTIAL_BUDGET if partial_budget is None
              else partial_budget)
    counts = grouped_stats(
        ds, [group_col], {id_col: ["count"]},
        partial_budget=budget)
    counts = counts.rename(columns={f"{id_col}_count": "n"})
    counts["n"] = counts["n"].astype("int64")
    T = int(counts.n.sum())
    if T == 0 or total <= 0:
        import ray.data as rd
        schema = ds.schema()
        types = dict(zip(schema.names, schema.types))
        return rd.from_arrow(pa.schema(
            [(id_col, types[id_col]),
             (group_col, types[group_col])]).empty_table())
    counts["base"] = (total * counts.n) // T
    counts["rem"] = (total * counts.n) % T
    left = total - int(counts.base.sum())
    order = counts.sort_values(
        ["rem", group_col], ascending=[False, True]).reset_index()
    extra = set(order.loc[:left - 1, "index"]) if left > 0 else set()
    seats = {
        str(r[group_col]): int(r.base) + (1 if i in extra else 0)
        for i, r in counts.iterrows()}

    def add_hash(b: pa.Table) -> pa.Table:
        hv = md5_u64le(pc.cast(b[id_col], pa.string()))
        # order-preserving uint64 -> int64 (flip the sign bit and
        # reinterpret): grouped_head's order column is int64, and the
        # biased value sorts identically to the SQL side's raw
        # UBIGINT hv
        hv_i64 = (hv ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table({id_col: b[id_col],
                         group_col: b[group_col],
                         "__hv": pa.array(hv_i64)})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return grouped_head(hashed, [group_col], seats, "__hv",
                        values=[id_col, group_col])


def negative_samples(ds, id_col: str, n_ids: int, k: int = 4):
    """Deterministic negative sampling for contrastive training: for
    every row, ``k`` pseudo-random OTHER ids from the dense id space
    ``[0, n_ids)`` — ``neg_j = md5(id || '#' || j) mod n_ids``, with a
    self-collision bumped to ``(neg+1) mod n_ids`` (the md5 contract:
    reproducible across runs, engines, and parallelism — re-training
    sees the same negatives).  Returns a streaming Dataset
    ``(id, j, neg_id)``; pure flat map, no shuffle, output k× input.
    Ids must be dense integers (the standard contrastive setup after
    ``shard_layout``'s reindex); null ids drop.
    """
    from ..functions.hashing import md5_u64le

    def expand(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[id_col]))
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(ids)
        out_ids = np.repeat(ids, k)
        js = np.tile(np.arange(k, dtype=np.int64), n)
        keys = pc.binary_join_element_wise(
            pc.cast(pa.array(out_ids), pa.string()),
            pc.cast(pa.array(js), pa.string()), "#")
        h = md5_u64le(keys)
        neg = (h % np.uint64(n_ids)).astype(np.int64)
        neg = np.where(neg == out_ids, (neg + 1) % n_ids, neg)
        return pa.table({id_col: pa.array(out_ids),
                         "j": pa.array(js),
                         "neg_id": pa.array(neg)})

    return ds.map_batches(expand, batch_format="pyarrow")


def bootstrap_stats(ds, value_col: str, id_col: str = "doc_id",
                    n_replicates: int = 20) -> "pd.DataFrame":
    """Deterministic BOOTSTRAP replicates of corpus aggregates — the
    uncertainty estimate behind any corpus statistic (is the mean doc
    length of source A really above B, or within resampling noise?):
    for replicate ``r``, each row gets weight ``w = #{lanes l∈0..7:
    ((md5_u64(id || '#' || r) >> 8l) & 255) % 8 == 0}`` — eight
    independent byte-lanes of ONE md5 draw, so w ~ Binomial(8, 1/8)
    (mean 1, the classical multiplier bootstrap) with exact
    ``md5_number_upper`` SQL parity and one hash per (row, replicate).
    Returns one row per replicate: ``(replicate, n_rows, sum_v)`` —
    exact integers; the caller derives means/CIs.  Null id/value rows
    drop.

    Scale shape: pure streaming map — each batch reduces to
    ``n_replicates`` partial rows; the driver merge is
    replicate-sized.  Hash cost is R md5 kernels per batch
    (vectorized via the per-worker DuckDB connection).
    """
    import pandas as pd

    from ..functions.hashing import md5_u64le

    shifts = np.uint64(8) * np.arange(8, dtype=np.uint64)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[value_col])))
        if b.num_rows == 0:
            return pa.table({"replicate": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64()),
                             "sum_v": pa.array([], pa.int64())})
        ids = pc.cast(b[id_col], pa.string())
        v = pc.cast(b[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        reps, ns, sums = [], [], []
        for r in range(n_replicates):
            keyed = pc.binary_join_element_wise(
                ids, pa.scalar(f"#{r}"), "")
            hv = md5_u64le(keyed)
            lanes = (hv[:, None] >> shifts[None, :]) & np.uint64(255)
            w = (lanes % np.uint64(8) == 0).sum(axis=1).astype(np.int64)
            reps.append(r)
            ns.append(int(w.sum()))
            sums.append(int((w * v).sum()))
        return pa.table({
            "replicate": pa.array(np.asarray(reps, dtype=np.int64)),
            "n_rows": pa.array(np.asarray(ns, dtype=np.int64)),
            "sum_v": pa.array(np.asarray(sums, dtype=np.int64))})

    parts = (ds.select_columns([id_col, value_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if not len(parts):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ("replicate", "n_rows", "sum_v")})
    out = (parts.groupby("replicate", as_index=False)
           .agg(n_rows=("n_rows", "sum"), sum_v=("sum_v", "sum")))
    return (out.astype({"replicate": "int64", "n_rows": "int64",
                        "sum_v": "int64"})
            .sort_values("replicate").reset_index(drop=True))


def temporal_leakage_audit(events_ds, train_frac: float = 0.8,
                           key_col: str = "event_id",
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           num_buckets: int = 32):
    """TEMPORAL-LEAKAGE audit of a hash split over event data — the
    check that catches the classic eval bug where a row-hash split
    puts a user's FUTURE in train and their PAST in test: rows are
    assigned train/test by the engine's md5-bucket contract on
    ``key_col`` (``b < round(train_frac·G)`` ⇒ train, the
    ``split_assign`` rule), then per user we count test events whose
    ``ts`` ≤ the user's LATEST train event (those test rows are
    answerable from training-time information).  Null key/user/ts
    rows drop.  Returns ``(user_id, n_train, n_test, n_leaky)`` per
    user — a high Σn_leaky/Σn_test says "use a time-based split".

    Scale shape: split assignment is embarrassingly parallel; ONE
    user-keyed exchange co-locates each user's rows; the per-bucket
    resolve is fully vectorized (unique + maximum.at + bincount —
    no per-user loop).  Output is users-sized.
    """
    import pandas as pd

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    cut = int(round(train_frac * GRANULARITY))

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                            pc.is_valid(b[user_col])),
                    pc.is_valid(b[ts_col]))
        b = b.filter(m)
        bk = _hash_buckets(pc.cast(b[key_col], pa.string()))
        u = pc.cast(b[user_col], pa.int64())
        h = md5_u64le(pc.cast(u, pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "u": u,
            "t": pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                         pa.int64()),
            "tr": pa.array(bk < cut)})

    def resolve(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        tr = t.column("tr").to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        n_train = np.bincount(inv[tr], minlength=len(uu)).astype(np.int64)
        n_test = np.bincount(inv[~tr], minlength=len(uu)).astype(np.int64)
        mx = np.full(len(uu), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv[tr], ts[tr])
        leaky_rows = (~tr) & (ts <= mx[inv])
        n_leaky = np.bincount(inv[leaky_rows],
                              minlength=len(uu)).astype(np.int64)
        return pa.table({"user_id": pa.array(uu),
                         "n_train": pa.array(n_train),
                         "n_test": pa.array(n_test),
                         "n_leaky": pa.array(n_leaky)})

    tagged = (events_ds.select_columns([key_col, user_col, ts_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ("user_id", "n_train", "n_test", "n_leaky")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    return (res.to_pandas().sort_values("user_id")
            .reset_index(drop=True))


def token_waterfill(ds, budget_permille: int = 500,
                    group_col: str = "source",
                    text_col: str = "text"):
    """WATERFILLING token-budget allocator — "given a global token
    budget, how much of each source do we take so no source dominates?"
    (the mixture-balancing step before corpus assembly; the classic
    max-min fair allocation): per-group whitespace-token totals
    ``t_g``, global budget ``B = (permille·total)//1000``, and the
    integer water level ``C`` = the unique cap with
    ``Σ min(t_g, C) ≤ B < Σ min(t_g, C+1)``: order groups by
    ``(t asc, group asc)``; at the smallest rank ``i`` where
    ``pfx_{i−1} + (n−i+1)·t_i > B``, ``C = (B − pfx_{i−1}) //
    (n−i+1)``; when no rank triggers (budget covers everything) every
    group allocates its full count.  Null text/group rows drop.
    Returns ``(group, tokens, alloc, capped)`` sorted by group —
    all-integer, SQL-restatable.

    Scale shape: token totals stream as per-batch (group, count)
    partials (``pc.split_pattern_regex`` + list lengths — the
    ``tokenize.Tokenizer`` whitespace contract, without materializing
    token ids); the waterfill itself runs on the groups-sized driver
    frame.
    """
    import pandas as pd

    def counts(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[group_col])))
        if b.num_rows == 0:
            return pa.table({
                group_col: pa.array([], type=pa.string()),
                "t": pa.array([], type=pa.int64())})
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\s+")
        n = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        ug, inv = np.unique(g, return_inverse=True)
        tot = np.zeros(len(ug), dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({group_col: pa.array(ug, type=pa.string()),
                         "t": pa.array(tot)})

    parts = (ds.select_columns([group_col, text_col])
             .map_batches(counts, batch_format="pyarrow").to_pandas())
    cols = (group_col, "tokens", "alloc", "capped")
    if parts.empty:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "tokens": pd.Series(dtype="int64"),
                             "alloc": pd.Series(dtype="int64"),
                             "capped": pd.Series(dtype="int64")})
    s = (parts.groupby(group_col, as_index=False).t.sum()
         .sort_values(["t", group_col], kind="stable")
         .reset_index(drop=True))
    t = s.t.to_numpy(np.int64)
    n = len(t)
    total = int(t.sum())
    budget = budget_permille * total // 1000
    pfx = np.cumsum(t)
    below = pfx - t                       # pfx_{i-1}, 0-based
    k = n - np.arange(n)                  # n - i + 1 for 1-based i
    trig = np.flatnonzero(below + k * t > budget)
    if len(trig):
        i0 = int(trig[0])
        cap = (budget - int(below[i0])) // int(k[i0])
        alloc = np.minimum(t, cap)
        capped = (t > cap).astype(np.int64)
    else:
        alloc = t.copy()
        capped = np.zeros(n, dtype=np.int64)
    out = pd.DataFrame({group_col: s[group_col], "tokens": t,
                        "alloc": alloc, "capped": capped})
    return (out.sort_values(group_col).reset_index(drop=True)
            .astype({"tokens": "int64", "alloc": "int64",
                     "capped": "int64"}))
