"""Per-document top-k TF-IDF terms — keyword extraction / salient-term
profiling over a corpus (the classic relevance weighting; Sparck
Jones 1972).

Distributed shape (two corpus passes, document rows never shuffled):

1. **DF pass**: per-batch DISTINCT (doc, word) partials — a doc lives
   in exactly one batch, so per-batch distinct-doc counts sum to the
   global document frequency — reduced per word hash through the
   sort-free hash exchange; the corpus doc count N rides along as a
   tagged row.  The df table (vocabulary-sized; Zipf-bounded) is
   broadcast once via ``ray.put``.
2. **Score pass**: per batch, per-doc term frequencies (numpy
   unique/lexsort — no Python row loop), vectorized ``searchsorted``
   df lookup, score, and a per-doc top-k selection in one lexsort.

Integer score contract (CLAUDE.md integer-oracle policy — float
``tf * ln(N/df)`` ranking is last-ULP fragile across engines):

    score = tf * ((1_000_000 * N) // df)

monotone in tf and 1/df exactly like tf-idf, deterministic in int64
(overflow-safe: tf ≤ doc length, (1e6·N)//df ≤ 1e6·N), and expressible
verbatim in SQL; ranking ties break by the term string.  Words are
``\\s+`` splits of trimmed text; df identity is the 64-bit md5 word
hash on the exchange (collision odds ~1e-7 — lm.py contract) while tf,
tie-breaking, and output use the actual strings.

At 100 TB: the df broadcast is vocabulary-sized — prune with
``min_df`` (df < min_df terms are excluded from ranking; hapaxes are
typically junk) or route scoring through a word-keyed exchange instead
of a broadcast if the vocabulary outgrows worker memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le
from ..kernels import as_array

_SCALE = 1_000_000


def _doc_words(batch: pa.Table, text_col: str):
    """(row_idx, word_string_array, word_hash) with multiplicity."""
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[text_col]), r"\s+"))
    words = as_array(pc.list_flatten(toks))
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    warr = words.to_numpy(zero_copy_only=False)
    if not len(warr):
        return parents, warr, np.empty(0, np.uint64)
    wu, winv = np.unique(warr, return_inverse=True)
    wh = md5_u64le(pa.array(wu, type=pa.string()))[winv]
    return parents, warr, wh


def document_frequencies(ds, text_col: str = "text",
                         min_df: int = 1, num_buckets: int = 64):
    """Global (word-hash → doc frequency) as sorted arrays plus the
    corpus doc count N: ``(wh, df, N)``.  One corpus pass."""
    from ..stages.exchange import grouped_exchange

    def partials(b: pa.Table) -> pa.Table:
        row, _, wh = _doc_words(b, text_col)
        if len(wh):
            # distinct (doc, word) within the batch
            order = np.lexsort((wh, row))
            r, h = row[order], wh[order]
            keep = np.ones(len(r), dtype=bool)
            keep[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
            u, c = np.unique(h[keep], return_counts=True)
        else:
            u, c = np.empty(0, np.uint64), np.empty(0, np.int64)
        return pa.table({
            "h": pa.array(np.concatenate([u, [np.uint64(0)]]),
                          type=pa.uint64()),
            "c": pa.array(np.concatenate(
                [c.astype(np.int64), [b.num_rows]])),
            "kind": pa.array(np.concatenate(
                [np.ones(len(u), np.int8), [np.int8(0)]])),
        })

    part_ds = ds.map_batches(partials, batch_format="pyarrow")

    def reduce_bucket(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = t.column("c").to_numpy(zero_copy_only=False)
        k = t.column("kind").to_numpy(zero_copy_only=False)
        if not len(h):
            return t
        order = np.lexsort((h, k))
        h, c, k = h[order], c[order], k[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = (h[1:] != h[:-1]) | (k[1:] != k[:-1])
        gidx = np.cumsum(new) - 1
        tot = np.zeros(int(gidx[-1]) + 1, dtype=np.int64)
        np.add.at(tot, gidx, c)
        uh, uk = h[new], k[new]
        keep = (uk == 0) | (tot >= min_df)
        return pa.table({"h": pa.array(uh[keep], type=pa.uint64()),
                         "c": pa.array(tot[keep]),
                         "kind": pa.array(uk[keep])})

    out = grouped_exchange(part_ds, "h", num_buckets, reduce_bucket,
                           drop_bucket=False)
    if out is None or not out.num_rows:
        return np.empty(0, np.uint64), np.empty(0, np.int64), 0
    h = out.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
    c = out.column("c").to_numpy(zero_copy_only=False)
    k = out.column("kind").to_numpy(zero_copy_only=False)
    n_docs = int(c[k == 0].sum())
    sel = k == 1
    order = np.argsort(h[sel])
    return h[sel][order], c[sel][order].astype(np.int64), n_docs


def tfidf_topk(ds, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id", min_df: int = 1):
    """Dataset of ``(doc_id, term, tf, score, rank)`` — each document's
    top-k terms by the integer-scaled tf-idf score, rank 1-based,
    ties by term string."""
    import ray

    wh, df, n_docs = document_frequencies(ds, text_col, min_df)
    iidf = (_SCALE * np.int64(n_docs)) // np.maximum(df, 1)
    model_ref = ray.put((wh, iidf))

    def score(b: pa.Table) -> pa.Table:
        whs, iidfs = ray.get(model_ref)
        row, warr, h = _doc_words(b, text_col)
        ids = as_array(b[id_col])
        empty = pa.table({
            id_col: ids.slice(0, 0),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())})
        if not len(h):
            return empty
        # per-doc tf over (row, word): collapse duplicates
        order = np.lexsort((warr, row))
        r, w, hh = row[order], warr[order], h[order]
        new = np.ones(len(r), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (w[1:] != w[:-1])
        gidx = np.cumsum(new) - 1
        tf = np.bincount(gidx)
        r, w, hh = r[new], w[new], hh[new]
        # df lookup (terms pruned from the model rank nowhere)
        if len(whs):
            pos = np.searchsorted(whs, hh)
            pos[pos == len(whs)] = 0
            hit = whs[pos] == hh
        else:
            pos = np.zeros(len(hh), dtype=np.int64)
            hit = np.zeros(len(hh), dtype=bool)
        vals = iidfs[pos] if len(whs) else np.zeros(len(hh), np.int64)
        sc = np.where(hit, tf * vals, -1)
        keep = sc >= 0
        r, w, tf, sc = r[keep], w[keep], tf[keep], sc[keep]
        if not len(r):
            return empty
        # top-k per doc: one lexsort (doc asc, score desc, term asc)
        order = np.lexsort((w, -sc, r))
        r, w, tf, sc = r[order], w[order], tf[order], sc[order]
        first = np.ones(len(r), dtype=bool)
        first[1:] = r[1:] != r[:-1]
        start = np.maximum.accumulate(np.where(first, np.arange(len(r)), 0))
        rank = np.arange(len(r)) - start + 1
        top = rank <= k
        return pa.table({
            id_col: ids.take(pa.array(r[top])),
            "term": pa.array(w[top], type=pa.string()),
            "tf": pa.array(tf[top].astype(np.int64)),
            "score": pa.array(sc[top].astype(np.int64)),
            "rank": pa.array(rank[top].astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")
