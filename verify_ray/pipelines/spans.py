"""Duplicate token-span detection — exact-substring dedup at
token-window granularity (Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better": remove every substring that
occurs more than once in the corpus).  The suffix-array construction
of the paper is replaced by the standard scalable approximation: slide
a width-``k`` window over every token sequence, find window contents
occurring ``min_count``+ times corpus-wide (within- OR cross-document
— a doc repeating itself duplicates, matching the paper), and report
per-document MAXIMAL duplicated spans (overlapping/adjacent duplicated
windows merged).  Reference parity note: the reference engine
(tamasfe/verify) has no cross-row operators at all — this is part of
the W-tier the north rule adds on top of its per-row semantics.

Scale shape (100 TB):

1. **Count pass**: per-batch window-hash partials ``(u64 hash,
   count)`` — multiplicity preserved — reduced per hash through the
   sort-free hash exchange (``stages.exchange``); only hashes with
   total count ≥ ``min_count`` survive.  Shuffle payload is 16 bytes
   per *distinct* window per batch, never token payloads.
2. **Broadcast-back**: the survivor set (duplicated-window hashes) is
   output-sized — near-dup mass is a small corpus fraction at k≥8 —
   and is broadcast once via ``ray.put``.  Partitioning assumption
   (SURVEY §2.6): the survivor set fits a worker heap; for a
   pathologically self-similar corpus raise ``min_count``/``k`` or
   replace the broadcast with a second membership exchange (the
   ``contamination.common_ngram_stats`` pattern scaled up).
3. **Mark pass**: one streaming pass recomputes window hashes, marks
   hits by sorted ``searchsorted`` membership, and merges runs of
   duplicated windows into maximal ``[span_start, span_end)`` spans —
   one vectorized diff/cumsum per batch, no Python row loop.

Window identity is the md5-u64le hash (DuckDB ``md5_number_upper``
parity, ``functions.hashing.md5_u64le``) of the window's token ids
rendered as space-joined decimal strings — so the SQL oracle
reproduces membership exactly by grouping on
``array_to_string(list_slice(ids, i, i+k-1), ' ')``.  A 64-bit
collision over ~1e6 distinct windows has probability ~1e-7 and the
corpus is fixed, so oracle equality is stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le
from ..kernels import as_array


def window_hashes(batch: pa.Table, k: int, token_col: str = "tokens"):
    """All width-``k`` token windows of a batch, with multiplicity.

    Returns ``(row_idx, start, h)`` np arrays — one entry per window,
    ordered by (row, start); ``start`` is the 0-based offset of the
    window inside its row's token array.  Rows shorter than ``k``
    contribute nothing.  Vectorized: the hash is md5 over the batch's
    UNIQUE window strings only (np.unique + inverse).
    """
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, np.uint64))
    toks = as_array(batch[token_col])
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    m = len(parents)
    if m < k:
        return empty
    flat = as_array(pc.list_flatten(toks))
    ok = parents[: m - k + 1] == parents[k - 1:]
    idx = np.nonzero(ok)[0]
    if not len(idx):
        return empty
    flat_str = pc.cast(flat, pa.string())
    parts = [flat_str.take(pa.array(idx + j)) for j in range(k)]
    grams = pc.binary_join_element_wise(*parts, " ")
    garr = grams.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(garr, return_inverse=True)
    h = md5_u64le(pa.array(uniq, type=pa.string()))[inv]
    rows = parents[idx]
    # start = offset within the row = idx - first flat index of the row
    row_first = np.zeros(batch.num_rows + 1, dtype=np.int64)
    lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    np.cumsum(lengths, out=row_first[1:])
    starts = idx - row_first[rows]
    return rows, starts, h


def duplicated_window_set(seqs_ds, k: int = 8, min_count: int = 2,
                          token_col: str = "tokens",
                          num_buckets: int = 64) -> np.ndarray:
    """SORTED uint64 hashes of token windows occurring ≥ ``min_count``
    times corpus-wide (multiplicity counted — a window repeated inside
    one document counts each occurrence, per Lee et al. semantics)."""
    from ..stages.exchange import grouped_exchange

    def partials(b: pa.Table) -> pa.Table:
        _, _, h = window_hashes(b, k, token_col)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.uint64()),
                         "c": pa.array(c.astype(np.int64))})

    part_ds = seqs_ds.map_batches(partials, batch_format="pyarrow")

    def reduce_bucket(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = t.column("c").to_numpy(zero_copy_only=False)
        u, inv = np.unique(h, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, inv, c)
        keep = tot >= min_count
        return pa.table({"h": pa.array(u[keep], type=pa.uint64())})

    out = grouped_exchange(part_ds, "h", num_buckets, reduce_bucket,
                           drop_bucket=False)
    if out is None or not out.num_rows:
        return np.empty(0, dtype=np.uint64)
    return np.sort(out.column("h").to_numpy(
        zero_copy_only=False).astype(np.uint64))


def _merge_spans(rows: np.ndarray, starts: np.ndarray, k: int):
    """Merge hit windows (sorted by (row, start)) into maximal spans.

    Windows ``a`` and ``b`` (same row, a ≤ b) belong to one span iff
    ``b - a <= k`` — i.e. their covered regions overlap or touch.
    Returns ``(span_row, span_start, span_end, n_windows)``.
    """
    if not len(rows):
        e = np.empty(0, np.int64)
        return e, e.copy(), e.copy(), e.copy()
    brk = np.ones(len(rows), dtype=bool)
    brk[1:] = (rows[1:] != rows[:-1]) | (starts[1:] - starts[:-1] > k)
    bounds = np.flatnonzero(brk)
    last = np.append(bounds[1:] - 1, len(rows) - 1)
    return (rows[bounds], starts[bounds], starts[last] + k,
            np.diff(np.append(bounds, len(rows))).astype(np.int64))


def remove_duplicate_spans(seqs_ds, k: int = 8, min_count: int = 2,
                           token_col: str = "tokens",
                           id_col: str = "doc_id",
                           num_buckets: int = 64):
    """The removal half of Lee et al. exact-substring dedup: drop every
    token position covered by a duplicated width-``k`` window and emit
    the cleaned sequences.  Returns a Dataset with columns
    ``(doc_id, tokens, n_tok, n_removed, token_sum)`` where ``tokens``
    is the cleaned array, ``n_removed`` counts excised positions, and
    ``token_sum`` is the cleaned array's checksum (the SQL-comparable
    integer invariant).  Same two-pass shape as
    ``duplicate_token_spans`` — the mark pass just converts hit
    windows to a position mask instead of merged span rows.
    """
    import ray

    dup_ref = ray.put(duplicated_window_set(
        seqs_ds, k, min_count, token_col, num_buckets))

    def clean(b: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        rows, starts, h = window_hashes(b, k, token_col)
        toks = as_array(b[token_col])
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_first = np.zeros(b.num_rows + 1, dtype=np.int64)
        np.cumsum(lengths, out=row_first[1:])
        covered = np.zeros(len(flat) + 1, dtype=np.int64)
        if len(h) and len(dup):
            pos = np.searchsorted(dup, h)
            pos[pos == len(dup)] = 0
            hit = dup[pos] == h
            # mark covered [start, start+k) per hit window via a
            # difference array (vectorized interval stabbing)
            g0 = row_first[rows[hit]] + starts[hit]
            np.add.at(covered, g0, 1)
            np.add.at(covered, g0 + k, -1)
        keep = np.cumsum(covered[:-1]) == 0
        kept = flat[keep]
        # rebuild list offsets from per-row kept counts
        kept_per_row = np.zeros(b.num_rows, dtype=np.int64)
        if len(flat):
            owner = np.repeat(np.arange(b.num_rows), lengths)
            np.add.at(kept_per_row, owner[keep], 1)
        offsets = np.concatenate([[0], np.cumsum(kept_per_row)])
        token_sum = np.zeros(b.num_rows, dtype=np.int64)
        if len(kept):
            np.add.at(token_sum, np.repeat(np.arange(b.num_rows),
                                           kept_per_row), kept)
        return pa.table({
            "doc_id": pc.cast(b[id_col], pa.string()),
            "tokens": pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int64()),
                pa.array(kept.astype(np.int32), type=pa.int32())),
            "n_tok": pa.array(kept_per_row),
            "n_removed": pa.array(lengths - kept_per_row),
            "token_sum": pa.array(token_sum),
        })

    return seqs_ds.map_batches(clean, batch_format="pyarrow")


def duplicate_token_spans(seqs_ds, k: int = 8, min_count: int = 2,
                          token_col: str = "tokens",
                          id_col: str = "doc_id",
                          num_buckets: int = 64):
    """Dataset of ``(doc_id, span_start, span_end, n_windows)`` — one
    row per maximal duplicated token span (0-based, end-exclusive);
    ``n_windows`` counts the duplicated width-``k`` windows merged
    into the span.  Documents with no duplicated window emit nothing.
    """
    import ray

    dup_ref = ray.put(duplicated_window_set(
        seqs_ds, k, min_count, token_col, num_buckets))

    def mark(b: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        rows, starts, h = window_hashes(b, k, token_col)
        if len(h) and len(dup):
            pos = np.searchsorted(dup, h)
            pos[pos == len(dup)] = 0
            hit = dup[pos] == h
            rows, starts = rows[hit], starts[hit]
        else:
            rows = np.empty(0, np.int64)
            starts = np.empty(0, np.int64)
        srow, s0, s1, nw = _merge_spans(rows, starts, k)
        ids = pc.cast(b[id_col], pa.string())
        return pa.table({
            "doc_id": as_array(ids).take(pa.array(srow, type=pa.int64())),
            "span_start": pa.array(s0),
            "span_end": pa.array(s1),
            "n_windows": pa.array(nw),
        })

    return seqs_ds.map_batches(mark, batch_format="pyarrow")


def prefix_dup_groups(seqs_ds, k: int = 16, token_col: str = "tokens",
                      id_col: str = "doc_id", tail: bool = False,
                      num_buckets: int = 32):
    """Exact duplicate-PREFIX (``tail=True``: suffix) detection over
    token sequences — the boilerplate-header/footer scan (crawled docs
    sharing their first ``k`` tokens are template clones even when the
    bodies diverge, the failure mode exact whole-doc dedup misses).

    Scale shape: each batch renders ONE edge window per qualifying row
    (>= ``k`` tokens) as the space-joined decimal token string — the
    same window identity as ``window_hashes``, so the DuckDB oracle
    reproduces groups with ``array_to_string(list_slice(ids, ...))``
    — and ships (id, window string, u64 bucket) through one
    prefix-keyed hash exchange; token arrays never shuffle.  Each
    bucket groups identical strings and keeps groups with >= 2 docs,
    emitting (doc_id, group_min, group_size) where ``group_min`` is
    the group's smallest doc id (string order — ids travel as
    strings).  Results stay in the object store.
    """
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([("doc_id", pa.string()),
                            ("group_min", pa.string()),
                            ("group_size", pa.int64())])

    def edge(b: pa.Table) -> pa.Table:
        empty = pa.table({"i": pa.array([], type=pa.string()),
                          "p": pa.array([], type=pa.string()),
                          "bucket": pa.array([], type=pa.uint64())})
        if token_col not in b.column_names:
            return empty
        toks = as_array(b[token_col])
        lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = np.flatnonzero(lengths >= k)
        if not len(rows):
            return empty
        row_first = np.zeros(b.num_rows + 1, dtype=np.int64)
        np.cumsum(lengths, out=row_first[1:])
        start = row_first[rows]
        if tail:
            start = start + lengths[rows] - k
        flat_str = pc.cast(as_array(pc.list_flatten(toks)), pa.string())
        parts = [flat_str.take(pa.array(start + j)) for j in range(k)]
        p = parts[0] if k == 1 else pc.binary_join_element_wise(*parts, " ")
        return pa.table({
            "i": pc.cast(as_array(b[id_col]).take(pa.array(rows)),
                         pa.string()),
            "p": p,
            "bucket": pa.array(md5_u64le(p), type=pa.uint64())})

    def groups(t: pa.Table) -> pa.Table:
        p = t.column("p").to_numpy(zero_copy_only=False).astype(str)
        i = t.column("i").to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((i, p))
        ps, is_ = p[order], i[order]
        first = np.ones(len(ps), dtype=bool)
        first[1:] = ps[1:] != ps[:-1]
        gid = np.cumsum(first) - 1
        sizes = np.bincount(gid)
        gmin = is_[np.flatnonzero(first)]  # smallest id: (p, i) sorted
        keep = sizes[gid] >= 2
        return pa.table({
            "doc_id": pa.array(is_[keep], type=pa.string()),
            "group_min": pa.array(gmin[gid[keep]], type=pa.string()),
            "group_size": pa.array(sizes[gid[keep]].astype(np.int64))})

    edged = seqs_ds.map_batches(edge, batch_format="pyarrow")
    return grouped_exchange_ds(edged, "bucket", num_buckets, groups,
                               empty_schema=out_schema)


def token_run_stats(seqs_ds, token_col: str = "tokens",
                    id_col: str = "doc_id"):
    """Per-document constant-token RUN statistics — the degenerate-
    repetition detector (a sequence like ``... 7 7 7 7 7 ...`` is a
    decode-loop or boilerplate artifact that per-doc dedup never
    sees).  Emits (doc_id, n_tok, n_runs, max_run): the number of
    maximal equal-value runs and the longest run's length.

    Pure streaming map — no shuffle, no state: each batch computes run
    boundaries over the flattened token buffer (row-major, so runs
    never span rows) with one diff + two reduceat passes.  Zero-length
    token arrays yield n_runs = 0, max_run = 0; null token arrays are
    treated as empty.
    """

    def stats(b: pa.Table) -> pa.Table:
        if token_col not in b.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.string()),
                             "n_tok": pa.array([], type=pa.int64()),
                             "n_runs": pa.array([], type=pa.int64()),
                             "max_run": pa.array([], type=pa.int64())})
        toks = as_array(b[token_col])
        n = b.num_rows
        lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = pc.cast(as_array(b[id_col]), pa.string())
        n_runs = np.zeros(n, dtype=np.int64)
        max_run = np.zeros(n, dtype=np.int64)
        flat = pc.cast(as_array(pc.list_flatten(toks)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        if len(flat):
            parents = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False).astype(np.int64)
            boundary = np.ones(len(flat), dtype=bool)
            boundary[1:] = ((flat[1:] != flat[:-1])
                            | (parents[1:] != parents[:-1]))
            bidx = np.flatnonzero(boundary)
            run_len = np.diff(np.append(bidx, len(flat)))
            run_row = parents[bidx]
            # runs are row-major: reduceat per row over the run arrays
            row_first_run = np.ones(len(run_row), dtype=bool)
            row_first_run[1:] = run_row[1:] != run_row[:-1]
            rstart = np.flatnonzero(row_first_run)
            rows_present = run_row[rstart]
            n_runs[rows_present] = np.diff(
                np.append(rstart, len(run_row)))
            max_run[rows_present] = np.maximum.reduceat(run_len, rstart)
        return pa.table({"doc_id": ids,
                         "n_tok": pa.array(lengths),
                         "n_runs": pa.array(n_runs),
                         "max_run": pa.array(max_run)})

    return seqs_ds.map_batches(stats, batch_format="pyarrow")
