"""Bigram language-model perplexity scoring — the model-based quality
filter of a training-data pipeline (CCNet-style: score each document
with an n-gram LM and filter/bucket on perplexity; see Wenzek et al.
2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data").  A 5-gram KenLM is the classic tool; the distributed
mechanics are identical at n=2 and a bigram model keeps the oracle
SQL-expressible, so that is what ships here.

Two corpus passes, no shuffle of documents:

1. **Count pass** (over the model corpus): per-batch partial counts of
   unigram and bigram occurrences, reduced per gram hash through the
   sort-free hash exchange (``stages.exchange``), bigrams pruned at
   ``min_count`` (Zipf makes the surviving model vocabulary-sized —
   this is the knob that bounds the broadcast at 100 TB).  Shuffle
   payload is ``(u64 gram hash, int64 count)``, never strings.
2. **Score pass** (over the scoring corpus, default the same): the
   model — four sorted numpy arrays — is broadcast once via
   ``ray.put``; each batch does vectorized ``searchsorted`` lookups
   and one ``np.add.at`` reduction per doc.  Add-alpha smoothing:
   ``p(w|v) = (c2(v,w) + a) / (c1(v) + a*V)``, ``V`` = distinct
   unigrams + 1 (OOV bucket).

Gram identity is ``md5_number_upper`` of the word (unigrams) or the
space-joined pair (bigrams) — the same 64-bit md5 contract as
``contamination.py``, so the SQL oracle reproduces counts by string
GROUP BY exactly (collision odds ~1e-7 over ~1e6 grams, corpus fixed).
Tokens are whitespace (``\\s+``) splits of trimmed text; note an empty
text yields the single token ``''`` on both sides (DuckDB
``regexp_split_to_array`` parity).

Oracle contract: the integer features ``(n_tok, n_big, sum_big_cnt,
sum_ctx_cnt, n_oov_big)`` are compared exactly in SQL (they cover the
count/prune/broadcast/lookup mechanics); the float ``logprob``/``ppl``
columns are checked in pytest against a scalar reference (SQL float
summation order is unspecified — CLAUDE.md integer-oracle policy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le
from ..kernels import as_array


def _doc_bigrams(batch: pa.Table, text_col: str):
    """Tokenize a batch and return, WITH multiplicity:

    ``(word_row, word_hash, big_row, big_hash, ctx_hash, n_tok)`` —
    per-occurrence word hashes, per-occurrence bigram hashes with their
    context (first word) hash, and tokens-per-row.  md5 is computed
    over each batch's UNIQUE strings only (np.unique + inverse).
    """
    n_rows = batch.num_rows
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[text_col]), r"\s+"))
    words = as_array(pc.list_flatten(toks))
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_tok = np.zeros(n_rows, dtype=np.int64)
    np.add.at(n_tok, parents, 1)
    m = len(parents)
    warr = words.to_numpy(zero_copy_only=False)
    wu, winv = np.unique(warr, return_inverse=True)
    wh = md5_u64le(pa.array(wu, type=pa.string()))[winv]
    if m < 2:
        e = np.empty(0, np.int64), np.empty(0, np.uint64)
        return parents, wh, e[0], e[1], e[1].copy(), n_tok
    ok = parents[:-1] == parents[1:]
    idx = np.nonzero(ok)[0]
    if not len(idx):
        e = np.empty(0, np.int64), np.empty(0, np.uint64)
        return parents, wh, e[0], e[1], e[1].copy(), n_tok
    grams = pc.binary_join_element_wise(
        words.take(pa.array(idx)), words.take(pa.array(idx + 1)), " ")
    garr = grams.to_numpy(zero_copy_only=False)
    gu, ginv = np.unique(garr, return_inverse=True)
    gh = md5_u64le(pa.array(gu, type=pa.string()))[ginv]
    return parents, wh, parents[idx], gh, wh[idx], n_tok


def train_bigram_lm(model_ds, text_col: str = "text", min_count: int = 2,
                    num_buckets: int = 64) -> dict:
    """Count unigrams + bigrams over ``model_ds`` in ONE corpus pass.

    Returns the model as driver-side sorted arrays:
    ``{"uh", "uc", "bh", "bc", "V"}`` — unigram hash/count (unpruned:
    contexts must stay complete for the denominator), bigram hash/count
    (pruned at ``min_count``), vocabulary size V = len(uh) + 1.
    At 100 TB the pruned model is vocabulary-sized (Zipf); raise
    ``min_count`` to shrink the broadcast further.
    """
    import ray

    from ..stages.exchange import grouped_exchange

    def partials(b: pa.Table) -> pa.Table:
        _, wh, _, gh, _, _ = _doc_bigrams(b, text_col)
        uw, cw = np.unique(wh, return_counts=True)
        ub, cb = np.unique(gh, return_counts=True)
        return pa.table({
            "h": pa.array(np.concatenate([uw, ub]), type=pa.uint64()),
            "c": pa.array(np.concatenate([cw, cb]).astype(np.int64)),
            "kind": pa.array(np.concatenate([
                np.zeros(len(uw), np.int8), np.ones(len(ub), np.int8)])),
        })

    part_ds = model_ds.map_batches(partials, batch_format="pyarrow")

    def reduce_bucket(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = t.column("c").to_numpy(zero_copy_only=False)
        k = t.column("kind").to_numpy(zero_copy_only=False)
        if not len(h):
            return t
        # group by (kind, hash)
        order = np.lexsort((h, k))
        h, c, k = h[order], c[order], k[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = (h[1:] != h[:-1]) | (k[1:] != k[:-1])
        gidx = np.cumsum(new) - 1
        tot = np.zeros(int(gidx[-1]) + 1 if len(gidx) else 0, dtype=np.int64)
        np.add.at(tot, gidx, c)
        uh, uk = h[new], k[new]
        keep = (uk == 0) | (tot >= min_count)
        return pa.table({"h": pa.array(uh[keep], type=pa.uint64()),
                         "c": pa.array(tot[keep]),
                         "kind": pa.array(uk[keep])})

    out = grouped_exchange(part_ds, "h", num_buckets, reduce_bucket,
                           drop_bucket=False)
    if out is None or not out.num_rows:
        z = np.empty(0, dtype=np.uint64)
        return {"uh": z, "uc": np.empty(0, np.int64),
                "bh": z.copy(), "bc": np.empty(0, np.int64), "V": 1}
    h = out.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
    c = out.column("c").to_numpy(zero_copy_only=False)
    k = out.column("kind").to_numpy(zero_copy_only=False)
    model = {}
    for kind, (hk, ck) in {0: ("uh", "uc"), 1: ("bh", "bc")}.items():
        sel = k == kind
        order = np.argsort(h[sel])
        model[hk] = h[sel][order]
        model[ck] = c[sel][order].astype(np.int64)
    model["V"] = len(model["uh"]) + 1
    return model


def _lookup(sorted_h: np.ndarray, counts: np.ndarray,
            q: np.ndarray) -> np.ndarray:
    """counts[h == q] per query (0 where absent); vectorized."""
    out = np.zeros(len(q), dtype=np.int64)
    if len(sorted_h) and len(q):
        pos = np.searchsorted(sorted_h, q)
        pos[pos == len(sorted_h)] = 0
        hit = sorted_h[pos] == q
        out[hit] = counts[pos[hit]]
    return out


def score_perplexity(score_ds, model: dict, alpha: float = 0.1,
                     text_col: str = "text", id_col: str = "doc_id"):
    """Score every document against a trained bigram model.

    Returns a Dataset of ``(doc_id, n_tok, n_big, sum_big_cnt,
    sum_ctx_cnt, n_oov_big, logprob, ppl)``; docs with < 2 tokens get
    zero counts and null logprob/ppl.
    """
    import ray

    model_ref = ray.put(model)

    def score(b: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        _, _, brow, bh, ctxh, n_tok = _doc_bigrams(b, text_col)
        n = b.num_rows
        n_big = np.zeros(n, np.int64)
        sum_big = np.zeros(n, np.int64)
        sum_ctx = np.zeros(n, np.int64)
        n_oov = np.zeros(n, np.int64)
        logp = np.zeros(n, np.float64)
        if len(bh):
            cb = _lookup(m["bh"], m["bc"], bh)
            cc = _lookup(m["uh"], m["uc"], ctxh)
            np.add.at(n_big, brow, 1)
            np.add.at(sum_big, brow, cb)
            np.add.at(sum_ctx, brow, cc)
            np.add.at(n_oov, brow, (cb == 0).astype(np.int64))
            lp = np.log((cb + alpha) / (cc + alpha * m["V"]))
            np.add.at(logp, brow, lp)
        has = n_big > 0
        logprob = np.where(has, logp, np.nan)
        ppl = np.where(has, np.exp(-logp / np.maximum(n_big, 1)), np.nan)
        return pa.table({
            id_col: b[id_col],
            "n_tok": pa.array(n_tok),
            "n_big": pa.array(n_big),
            "sum_big_cnt": pa.array(sum_big),
            "sum_ctx_cnt": pa.array(sum_ctx),
            "n_oov_big": pa.array(n_oov),
            "logprob": pa.array(logprob, mask=~has),
            "ppl": pa.array(ppl, mask=~has),
        })

    return score_ds.map_batches(score, batch_format="pyarrow")


def bigram_perplexity(ds, model_ds=None, text_col: str = "text",
                      id_col: str = "doc_id", min_count: int = 2,
                      alpha: float = 0.1):
    """Train on ``model_ds`` (default: ``ds`` itself — self-scoring, as
    when ranking a corpus against its own statistics) and score ``ds``.
    The count exchange fully executes before scoring starts, so the two
    passes are sequential consumers (no materialize needed for
    parquet-backed inputs)."""
    model = train_bigram_lm(model_ds if model_ds is not None else ds,
                            text_col=text_col, min_count=min_count)
    return score_perplexity(ds, model, alpha=alpha,
                            text_col=text_col, id_col=id_col)
