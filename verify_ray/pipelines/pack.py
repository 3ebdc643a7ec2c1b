"""Sequence packing: concatenate tokenized documents into fixed-length
training examples (the standard LLM pretraining data layout).

Semantics (deterministic, order-defined): within each group
(``source``), documents are ordered by ``doc_id``, their token streams
concatenated, and the stream split into consecutive ``seq_len``-token
examples; the final partial example is kept (callers can filter
``n_tokens < seq_len`` for drop-remainder).  Because the layout is a
pure function of (group, doc order, seq_len), the exact example
boundaries and per-example token checksums are reproducible in SQL —
the driver oracle checks them.

Scale shape: rows are hash-exchanged by group (only (group, doc_id,
tokens) move), and each merge task lays out its groups' streams in one
vectorized pass (sort → flatten → integer divide).  Partitioning
assumption: one group's token stream fits a merge task.  For groups
beyond that, ``pack_sequences_streaming`` below implements the
two-phase variant — metadata-only offset exchange, doc-keyed attach,
example-keyed reduce — with NO single-task group materialization
(equivalence-tested against this one-pass layout).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(seqs_ds, seq_len: int = 512, group_col: str = "source",
                   id_col: str = "doc_id", token_col: str = "tokens",
                   num_buckets: int | None = None) -> pd.DataFrame:
    """(group, example_id, n_tokens, token_sum) per packed example."""
    import ray

    from ..stages.exchange import grouped_exchange

    if num_buckets is None:
        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(g.astype(object))
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def pack_group(t: pa.Table) -> pa.Table:
        # one vectorized layout pass for ALL groups in the bucket
        idx = pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"), (id_col, "ascending")])
        t = t.take(idx)
        groups = t.column(group_col).to_numpy(zero_copy_only=False)
        toks = t.column(token_col)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        # null token lists contribute zero tokens (flatten skips them)
        lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # per-row flat-stream starts; within-group position = flat pos
        # minus the flat start of the group's FIRST row (cumsum-based,
        # so rows/groups with zero tokens never shift the indexing)
        row_starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        row_group_change = np.concatenate(
            [[True], groups[1:] != groups[:-1]])
        grp_id_per_row = np.cumsum(row_group_change) - 1
        grp_first_start = row_starts[np.flatnonzero(row_group_change)]
        tok_row = np.repeat(np.arange(len(groups)), lengths)
        pos = np.arange(len(flat), dtype=np.int64)
        within = pos - grp_first_start[grp_id_per_row[tok_row]]
        tok_grp = grp_id_per_row[tok_row]
        ex = within // seq_len
        if len(flat) == 0:
            return pa.table({
                group_col: pa.array([], type=t.schema.field(group_col).type),
                "example_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "token_sum": pa.array([], type=pa.int64()),
            })
        # examples are contiguous runs of (grp, ex): reduceat aggregates
        change = np.concatenate([[True], (tok_grp[1:] != tok_grp[:-1])
                                 | (ex[1:] != ex[:-1])])
        starts = np.flatnonzero(change)
        n_tok = np.diff(np.append(starts, len(flat)))
        sums = np.add.reduceat(flat.astype(np.int64), starts)
        grp_names = groups[row_group_change]
        return pa.table({
            group_col: pa.array(grp_names[tok_grp[starts]]),
            "example_id": pa.array(ex[starts]),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "token_sum": pa.array(sums),
        })

    bucketed = (seqs_ds.select_columns([group_col, id_col, token_col])
                .map_batches(add_bucket, batch_format="pyarrow"))
    out = grouped_exchange(bucketed, "bucket", num_buckets, pack_group)
    if out is None:
        return pd.DataFrame({group_col: [], "example_id": [],
                             "n_tokens": [], "token_sum": []})
    return (out.to_pandas()
            .sort_values([group_col, "example_id"]).reset_index(drop=True))


def pack_sequences_streaming(seqs_ds, seq_len: int = 512,
                             group_col: str = "source",
                             id_col: str = "doc_id",
                             token_col: str = "tokens",
                             num_buckets: int | None = None) -> pd.DataFrame:
    """The two-phase layout the module docstring promises for groups
    too large for one merge task: NO task ever materializes a group's
    full token stream, so the memory bound is bucket-of-docs, not
    group.  Output is identical to ``pack_sequences`` (equivalence-
    tested).

    1. **Offsets** (metadata only): ``(group, doc_id, n_tok)`` rows —
       24 bytes/doc, not tokens — are group-co-located through the
       hash exchange; each task sorts its groups by ``doc_id`` and
       emits every doc's global token offset (exclusive prefix sum).
    2. **Attach + contribute**: offsets and token rows meet in a
       doc-keyed exchange (uniform hash, so buckets stay balanced even
       when one group dominates); each task computes, per doc,
       which examples [offset//L .. (offset+n-1)//L] it overlaps and
       their (count, sum) contributions in one vectorized pass.
    3. **Example reduce**: contributions are summed per (group,
       example) through a final exchange — an example receives pieces
       from at most a few docs, so this shuffle is output-sized.
    """
    import ray

    from ..stages.exchange import grouped_exchange

    if num_buckets is None:
        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    narrow = seqs_ds.select_columns([group_col, id_col, token_col])

    # ---- phase 1: per-doc global offsets (metadata-only exchange)
    def meta(t: pa.Table) -> pa.Table:
        toks = t.column(token_col)
        n = pc.fill_null(pc.list_value_length(toks), 0)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(g.astype(object))
        return pa.table({
            "g": pc.cast(t[group_col], pa.string()),
            "id": pc.cast(t[id_col], pa.string()),
            "n": pc.cast(n, pa.int64()),
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64)),
        })

    def offsets_task(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("g", "ascending"),
                                            ("id", "ascending")])
        t = t.take(idx)
        g = t.column("g").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        newg = np.concatenate([[True], g[1:] != g[:-1]])
        cum = np.cumsum(n) - n  # exclusive prefix
        # restart the prefix at each group's first row
        base = np.maximum.accumulate(np.where(newg, cum, -1))
        off = cum - base
        return pa.table({"id": t["id"], "off": pa.array(off)})

    from ..stages.exchange import grouped_exchange_ds

    off_schema = pa.schema([("id", pa.string()), ("off", pa.int64())])
    offs_ds = grouped_exchange_ds(
        narrow.map_batches(meta, batch_format="pyarrow"),
        "bucket", num_buckets, offsets_task, empty_schema=off_schema)

    # ---- phase 2: offsets and token rows MEET in a doc-keyed
    # exchange (both sides hash the id as an object-dtype string —
    # CLAUDE.md dtype-hash rule); no doc-count-sized broadcast
    tok_type = pa.list_(pa.int32())

    def _docbucket(ids_np) -> pa.Array:
        h = pd.util.hash_array(ids_np.astype(object))
        return pa.array((h % np.uint64(num_buckets)).astype(np.int64))

    def tag_offs(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        return pa.table({
            "id": t["id"],
            "g": pa.nulls(t.num_rows, type=pa.string()),
            "tokens": pa.nulls(t.num_rows, type=tok_type),
            "off": t["off"],
            "tag": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "bucket": _docbucket(ids),
        })

    def tag_seqs(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string())
        toks = t.column(token_col)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return pa.table({
            "id": ids,
            "g": pc.cast(t[group_col], pa.string()),
            "tokens": pc.cast(toks, tok_type),
            "off": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
            "tag": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "bucket": _docbucket(ids.to_numpy(zero_copy_only=False)),
        })

    tagged = (offs_ds.map_batches(tag_offs, batch_format="pyarrow")
              .union(narrow.map_batches(tag_seqs, batch_format="pyarrow")))

    def contribute(t: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], type=pa.string()),
                          "ex": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64()),
                          "s": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "tag" not in t.column_names:
            return empty
        tags = t.column("tag").to_numpy(zero_copy_only=False)
        ot = t.filter(pa.array(tags == 0))
        st_ = t.filter(pa.array(tags == 1))
        if st_.num_rows == 0:
            return empty
        off_ids = ot.column("id").to_numpy(zero_copy_only=False)
        ordo = np.argsort(off_ids.astype(object))
        ids_sorted = off_ids[ordo]
        off_sorted = ot.column("off").to_numpy(
            zero_copy_only=False)[ordo]
        ids = st_.column("id").to_numpy(zero_copy_only=False)
        toks = st_.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if not len(flat):
            return empty
        pos = np.searchsorted(ids_sorted, ids.astype(object))
        doc_off = off_sorted[pos]
        row_starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        tok_row = np.repeat(np.arange(st_.num_rows), lengths)
        within = np.arange(len(flat), dtype=np.int64) - row_starts[tok_row]
        gpos = np.repeat(doc_off, lengths) + within
        ex = gpos // seq_len
        gcol = st_.column("g").to_numpy(zero_copy_only=False)
        gu, ginv = np.unique(gcol.astype(object), return_inverse=True)
        tg = ginv[tok_row]
        o = np.lexsort((ex, tg))
        tg, ex, fl = tg[o], ex[o], flat[o]
        new = np.concatenate([[True], (tg[1:] != tg[:-1])
                              | (ex[1:] != ex[:-1])])
        st2 = np.flatnonzero(new)
        return pa.table({
            "g": pa.array(gu[tg[st2]], type=pa.string()),
            "ex": pa.array(ex[st2]),
            "cnt": pa.array(np.diff(np.append(st2, len(fl)))
                            .astype(np.int64)),
            "s": pa.array(np.add.reduceat(fl, st2)),
        })

    part_schema = pa.schema([("g", pa.string()), ("ex", pa.int64()),
                             ("cnt", pa.int64()), ("s", pa.int64())])
    parts = grouped_exchange_ds(tagged, "bucket", num_buckets, contribute,
                                empty_schema=part_schema)

    # ---- phase 3: example-keyed reduce (output-sized shuffle)
    def key_part(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False)
        e = t.column("ex").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = pd.util.hash_array(g.astype(object)) + e
        return t.append_column("bucket", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)))

    def reduce_task(t: pa.Table) -> pa.Table:
        df = t.select(["g", "ex", "cnt", "s"]).to_pandas()
        out = df.groupby(["g", "ex"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    out = grouped_exchange(parts.map_batches(key_part,
                                             batch_format="pyarrow"),
                           "bucket", num_buckets, reduce_task)
    if out is None or not out.num_rows:
        return pd.DataFrame({group_col: [], "example_id": [],
                             "n_tokens": [], "token_sum": []})
    df = out.to_pandas().rename(columns={
        "g": group_col, "ex": "example_id", "cnt": "n_tokens",
        "s": "token_sum"})
    return (df.sort_values([group_col, "example_id"])
            .reset_index(drop=True))


def padding_waste(docs_ds, batch_size: int = 16, max_len: int = 512,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_buckets: int = 32) -> pd.DataFrame:
    """PADDING-WASTE audit for pad-to-longest batching — the
    throughput question behind length-sorted bucketing: how many pad
    tokens does a training batch of ``batch_size`` sequences burn
    under (a) ``sorted`` batching (docs ordered by length — the
    length-bucketing upper bound) vs (b) ``arrival`` batching
    (id-blocked: batch = doc_id // batch_size — the no-reorder
    baseline)?  Doc length = whitespace token count capped at
    ``max_len`` (truncation contract); a batch of m docs pads every
    doc to its longest member, so ``padded_tokens = Σ_batches m·max``
    and ``waste = padded_tokens − total_tokens``.  Null text/id rows
    drop.  Returns two rows ``(strategy, n_docs, n_batches,
    total_tokens, padded_tokens, waste)``.

    Scale shape: the sorted strategy needs only the LENGTH HISTOGRAM
    (sorted batch composition is a function of the length multiset) —
    per-batch (len, cnt) partials, ≤ max_len rows each, merged on the
    driver; per-batch stats are then derived per length-RUN, never
    materializing a per-batch array.  The arrival strategy is a
    block-keyed exchange ((id // batch_size) % B) whose merge emits
    ONE scalar row per bucket.
    """
    from ..stages.exchange import grouped_exchange

    def lens_of(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[id_col])))
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lens = np.minimum(lens, max_len)
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return ids, lens

    def hist_partial(b: pa.Table) -> pa.Table:
        _, lens = lens_of(b)
        ul, cnt = np.unique(lens, return_counts=True)
        return pa.table({"l": pa.array(ul),
                         "cnt": pa.array(cnt.astype(np.int64))})

    def blk_partial(b: pa.Table) -> pa.Table:
        ids, lens = lens_of(b)
        blk = ids // batch_size
        ub, inv = np.unique(blk, return_inverse=True)
        m = np.bincount(inv).astype(np.int64)
        sm = np.zeros(len(ub), dtype=np.int64)
        np.add.at(sm, inv, lens)
        mx = np.zeros(len(ub), dtype=np.int64)
        np.maximum.at(mx, inv, lens)
        return pa.table({
            "__b": pa.array((ub % num_buckets).astype(np.int64)),
            "blk": pa.array(ub), "m": pa.array(m),
            "mx": pa.array(mx), "sm": pa.array(sm)})

    def blk_resolve(t: pa.Table) -> pa.Table:
        blk = t.column("blk").to_numpy(zero_copy_only=False)
        m = t.column("m").to_numpy(zero_copy_only=False)
        mx = t.column("mx").to_numpy(zero_copy_only=False)
        sm = t.column("sm").to_numpy(zero_copy_only=False)
        ub, inv = np.unique(blk, return_inverse=True)
        M = np.zeros(len(ub), dtype=np.int64)
        np.add.at(M, inv, m)
        S = np.zeros(len(ub), dtype=np.int64)
        np.add.at(S, inv, sm)
        X = np.zeros(len(ub), dtype=np.int64)
        np.maximum.at(X, inv, mx)
        return pa.table({
            "n_batches": pa.array([len(ub)], pa.int64()),
            "n_docs": pa.array([int(M.sum())], pa.int64()),
            "total": pa.array([int(S.sum())], pa.int64()),
            "padded": pa.array([int((M * X).sum())], pa.int64())})

    proj = docs_ds.select_columns([id_col, text_col])
    hist = (proj.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas().groupby("l", as_index=False)["cnt"].sum()
            .sort_values("l"))
    blk_tagged = proj.map_batches(blk_partial, batch_format="pyarrow")
    blk = grouped_exchange(blk_tagged, "__b", num_buckets, blk_resolve)

    cols = ("strategy", "n_docs", "n_batches", "total_tokens",
            "padded_tokens", "waste")
    if not len(hist):
        return pd.DataFrame({c: pd.Series(dtype="int64" if c != "strategy"
                                          else object) for c in cols})

    # sorted strategy from the length histogram, per length-run: a
    # batch's max is the length at its LAST sorted position, so batch
    # k (positions [kb, kb+b)) takes the run covering position
    # min((k+1)b, N) - 1
    L = hist.l.to_numpy(np.int64)
    C = hist.cnt.to_numpy(np.int64)
    N = int(C.sum())
    b = batch_size
    K = (N + b - 1) // b
    cum = np.cumsum(C)
    # full batches end at sorted positions b-1, 2b-1, ...; the count
    # of those ends falling inside run r ([s_r, e_r)) is a closed form
    # (ends below x = x // b), so this stays O(distinct lengths)
    F = N // b
    s = np.r_[0, cum[:-1]]
    n_full = (np.minimum(cum, F * b) // b
              - np.minimum(s, F * b) // b)
    padded_sorted = int((b * L * n_full).sum())
    if N % b:  # trailing partial batch ends at position N-1
        padded_sorted += (N % b) * int(L[np.searchsorted(cum, N)])
    total = int((L * C).sum())

    rows = [("sorted", N, K, total, padded_sorted,
             padded_sorted - total)]
    ab = blk.to_pandas().sum()
    rows.append(("arrival", int(ab.n_docs), int(ab.n_batches),
                 int(ab.total), int(ab.padded),
                 int(ab.padded) - int(ab.total)))
    out = pd.DataFrame(rows, columns=cols)
    return out.astype({c: "int64" for c in cols[1:]})
