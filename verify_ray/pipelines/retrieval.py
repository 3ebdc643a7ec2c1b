"""BM25 keyword retrieval over the document corpus (Robertson &
Sparck Jones probabilistic relevance; the Okapi BM25 ranking function,
Robertson et al. TREC-3).  The query side of a training-data pipeline:
"find the documents most relevant to these terms" for curriculum
selection, targeted decontamination, or corpus QA.

Two streaming passes, zero shuffle (the classic broadcast-query
retrieval shape):

1. **Stats pass**: per-batch partials of corpus size ``D``, total
   token count ``A`` and per-term document frequency ``df`` (a doc
   lives in exactly one batch, so per-batch distinct-doc counts sum
   exactly).  Partials are |terms|+2 integers per batch — the driver
   reduction is output-sized.
2. **Score pass**: the (tiny) term table is shipped in the task
   closure; each batch computes per-(row, term) ``tf`` with one
   sorted ``searchsorted`` pass over the flattened words, scores
   matched rows, and emits its local top-``k``; the driver merges
   ``batches × k`` candidate rows (the ann_topk pattern,
   similarity.py).

Integer-exact scoring (the repo's float-rounding policy — CLAUDE.md):
with ``L = (10*dl*D) // A`` (the doc/average length ratio quantized
to tenths) and SCALE = 1000,

    tf_norm = (220_000 * tf) // (100*tf + 30 + 9*L)
      -- == SCALE * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
         at k1=1.2, b=0.75, with dl/avgdl -> L/10
    idf_int = (1000 * (2*(D-df) + 1)) // (2*df + 1)
      -- RSJ idf ((D-df+0.5)/(df+0.5)) kept as a RATIONAL x1000
         instead of its log — a documented BM25 variant: strictly
         positive and monotone decreasing in df (like Lucene's
         log(1+...) clamped idf), so single-term rankings are
         identical to Lucene-style BM25; multi-term sums weight
         rare terms more strongly than the log form
    score   = sum over matched terms of idf_int * tf_norm

Every step is int64 (magnitudes bounded: idf_int <= 2000*D+1000,
tf_norm <= 2200, L <= 10*dl*D/A), so the DuckDB oracle reproduces the
exact ranking with ``//`` arithmetic; the conventional log-idf float
score is asserted against a scalar reference in pytest instead.
Tokenization is whitespace (``\\s+``) splitting of trimmed text —
DuckDB ``regexp_split_to_array`` parity, empty text => [''].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import as_array

SCALE = 1000


def _batch_words(batch: pa.Table, text_col: str):
    """(parents, words_np, dl) for a batch — whitespace tokens."""
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[text_col]), r"\s+"))
    words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    dl = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return parents, words, dl


def _tf_matrix(parents, words, terms_sorted, n_rows):
    """Dense (n_rows x n_terms) int64 term-frequency matrix."""
    tf = np.zeros((n_rows, len(terms_sorted)), dtype=np.int64)
    if len(words) and len(terms_sorted):
        pos = np.searchsorted(terms_sorted, words)
        pos[pos == len(terms_sorted)] = 0
        hit = terms_sorted[pos] == words
        np.add.at(tf, (parents[hit], pos[hit]), 1)
    return tf


def corpus_term_stats(docs_ds, terms: list[str], text_col: str = "text"):
    """(D, A, df) — corpus doc count, total token count, and per-term
    document frequency aligned with sorted(terms)."""
    terms_sorted = np.array(sorted(terms), dtype=object)

    def partials(b: pa.Table) -> pa.Table:
        parents, words, dl = _batch_words(b, text_col)
        tf = _tf_matrix(parents, words, terms_sorted, b.num_rows)
        return pa.table({
            "D": pa.array([b.num_rows], type=pa.int64()),
            "A": pa.array([int(dl.sum())], type=pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).astype(np.int64)],
                           type=pa.list_(pa.int64())),
        })

    parts = docs_ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    D = int(parts.D.sum())
    A = int(parts.A.sum())
    df = np.sum(np.stack(parts.df.to_numpy()), axis=0).astype(np.int64) \
        if len(parts) else np.zeros(len(terms_sorted), dtype=np.int64)
    return D, A, dict(zip(terms_sorted.tolist(), df.tolist()))


def bm25_topk(docs_ds, terms: list[str], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id",
              stats: tuple | None = None) -> pd.DataFrame:
    """Top-``k`` documents by the integer BM25 score, ordered by
    ``(score DESC, doc_id ASC)``.  Returns ``(doc_id, n_match, dl,
    score)``; only documents matching ≥1 term are candidates.
    ``stats`` lets callers reuse a precomputed ``corpus_term_stats``
    (e.g. scoring a stream against a fixed reference corpus)."""
    terms_sorted = np.array(sorted(set(terms)), dtype=object)
    if stats is None:
        stats = corpus_term_stats(docs_ds, terms_sorted.tolist(), text_col)
    D, A, df_map = stats
    df = np.array([df_map[t] for t in terms_sorted.tolist()], dtype=np.int64)
    idf = (SCALE * (2 * (D - df) + 1)) // (2 * df + 1)

    def score_batch(b: pa.Table) -> pa.Table:
        parents, words, dl = _batch_words(b, text_col)
        tf = _tf_matrix(parents, words, terms_sorted, b.num_rows)
        n_match = (tf > 0).sum(axis=1).astype(np.int64)
        L = (10 * dl * D) // max(A, 1)
        denom = 100 * tf + 30 + 9 * L[:, None]
        tf_norm = (220 * SCALE * tf) // denom
        tf_norm[tf == 0] = 0
        score = (tf_norm * idf[None, :]).sum(axis=1)
        keep = n_match > 0
        idxs = np.flatnonzero(keep)
        # batch-local top-k on (score desc, doc_id asc)
        ids = pc.cast(b[id_col], pa.string()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids[idxs].astype(object), -score[idxs]))[:k]
        sel = idxs[order]
        return pa.table({
            "doc_id": pa.array(ids[sel], type=pa.string()),
            "n_match": pa.array(n_match[sel]),
            "dl": pa.array(dl[sel]),
            "score": pa.array(score[sel]),
        })

    cand = docs_ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                             "n_match": pd.Series([], dtype="int64"),
                             "dl": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    cand = cand.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


def bm25_float_score(tf: int, df: int, dl: int, D: int, A: int,
                     k1: float = 1.2, b: float = 0.75) -> float:
    """Lucene-style BM25 for one (term, doc) — log(1+x) idf, always
    positive (raw RSJ log-idf goes negative at df > D/2 and would
    invert rankings) — the pytest reference for the integer variant's
    fidelity tests."""
    import math

    if tf == 0:
        return 0.0
    avgdl = A / D
    idf = math.log(1.0 + (D - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def _word_doc_pairs_fn(text_col: str, id_col: str):
    """map_batches fn factory: block-local DISTINCT (word, doc) pairs
    tagged with the word's md5 bucket hash — the map side shared by
    every word-keyed index exchange (build_postings,
    postings_gamma_bits).  Within-doc word repetition never leaves the
    block (one lexsort collapses it); each unique word is hashed ONCE
    and the hash repeated per its pair count."""
    from ..functions.hashing import md5_u64le
    from .tokenize import _split_words

    def pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[id_col])))
        if b.num_rows == 0:
            return pa.table({"__b": pa.array([], type=pa.uint64()),
                             "w": pa.array([], type=pa.string()),
                             "d": pa.array([], type=pa.int64())})
        words, parents, _ = _split_words(b, text_col)
        docs = pc.cast(as_array(b[id_col]), pa.int64()).to_numpy(
            zero_copy_only=False)[parents]
        # block-local distinct (word, doc) via one lexsort
        order = np.lexsort((docs, words))
        ws, ds_ = words[order], docs[order]
        keep = np.ones(len(ws), dtype=bool)
        keep[1:] = (ws[1:] != ws[:-1]) | (ds_[1:] != ds_[:-1])
        ws, ds_ = ws[keep], ds_[keep]
        # hash each UNIQUE word once and repeat by its pair count —
        # ws is word-sorted, so word boundaries are one diff away
        # (md5_u64le's documented calling convention)
        wnew = np.ones(len(ws), dtype=bool)
        wnew[1:] = ws[1:] != ws[:-1]
        wstarts = np.flatnonzero(wnew)
        wcounts = np.diff(np.append(wstarts, len(ws)))
        h_uniq = md5_u64le(pa.array(ws[wstarts], type=pa.string())) \
            if len(wstarts) else np.empty(0, np.uint64)
        return pa.table({
            "__b": pa.array(np.repeat(h_uniq, wcounts),
                            type=pa.uint64()),
            "w": pa.array(ws, type=pa.string()),
            "d": pa.array(ds_)})

    return pairs


def build_postings(ds, text_col: str = "text", id_col: str = "doc_id",
                   min_df: int = 2, num_buckets: int = 32):
    """Inverted-index materialization: one row per term with its
    document frequency and FULL ordered posting list — the artifact a
    search/retrieval service serves, and the exact-count complement to
    ``bm25_topk``'s broadcast-query scoring.  Emits (word, df,
    postings, doc_sum) where ``postings`` is the comma-joined doc ids
    in ascending order (SQL ``string_agg(... ORDER BY doc_id)``
    parity) and ``doc_sum`` is an integer invariant of the list.

    Scale shape: each block collapses to DISTINCT (word, doc) pairs
    map-side (one lexsort — within-doc word repetition never leaves
    the block); pairs route through a word-keyed hash exchange, and
    each merge task builds its words' posting lists with one lexsort +
    zero-copy ListArray offsets + ``binary_join`` (the
    ``user_histories`` pattern).  ``min_df`` prunes the hapax tail
    INSIDE the merge tasks, so the output Dataset is the index, not
    the corpus.  Scale assumption (SURVEY §2.6): one term's posting
    list fits a merge task — at web scale a stop-word's list is
    corpus-sized, so feed stop-filtered text or cap df upstream
    (`contamination.common_ngram_stats` finds the offenders).

    Whitespace tokenization contract (``tokenize._split_words``):
    ``regexp_split_to_array(trim(text), '\\s+')``.
    """
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([
        ("word", pa.string()), ("df", pa.int64()),
        ("postings", pa.string()), ("doc_sum", pa.int64())])

    pairs = _word_doc_pairs_fn(text_col, id_col)

    def merge(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, w))
        ws, ds_ = w[order], d[order]
        # cross-block duplicates: same (word, doc) from >1 block
        keep = np.ones(len(ws), dtype=bool)
        keep[1:] = (ws[1:] != ws[:-1]) | (ds_[1:] != ds_[:-1])
        ws, ds_ = ws[keep], ds_[keep]
        new = np.ones(len(ws), dtype=bool)
        new[1:] = ws[1:] != ws[:-1]
        starts = np.flatnonzero(new)
        offsets = np.append(starts, len(ws)).astype(np.int64)
        df = np.diff(offsets)
        doc_strs = pc.cast(pa.array(ds_), pa.string())
        lists = pa.LargeListArray.from_arrays(pa.array(offsets),
                                              doc_strs)
        postings = pc.binary_join(lists, ",")
        doc_sum = np.add.reduceat(ds_, starts) if len(starts) \
            else np.empty(0, np.int64)
        sel = df >= min_df
        return pa.table({
            "word": pa.array(ws[starts], type=pa.string()),
            "df": pa.array(df),
            "postings": postings,
            "doc_sum": pa.array(doc_sum)}).filter(pa.array(sel))

    tagged = ds.map_batches(pairs, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def postings_gamma_bits(ds, text_col: str = "text",
                        id_col: str = "doc_id", min_df: int = 2,
                        num_buckets: int = 32) -> pd.DataFrame:
    """Index-size planning audit: per term, the Elias-gamma bit cost
    of delta-encoding its sorted posting list (Witten/Moffat/Bell,
    *Managing Gigabytes* — gamma(g) costs ``2*floor(log2 g) + 1`` bits;
    the first posting is encoded as the gap ``doc_id + 1`` so id 0
    stays codable).  Returns (word, df, gamma_bits, max_gap) for terms
    with ``df >= min_df`` — the table a storage planner reads to size a
    compressed inverted index and to spot terms whose dense postings
    compress far below 64 bits/entry.

    Scale shape: identical to :func:`build_postings` (shared map side,
    word-keyed hash exchange); the merge emits FOUR integers per term
    instead of the posting list itself, so the result is
    vocabulary-sized however large the corpus.  Bit lengths come from
    ``np.frexp`` (exact for gaps < 2^53, no float-log rounding —
    DuckDB ``length(bin(gap))`` parity).
    """
    from ..stages.exchange import grouped_exchange

    pairs = _word_doc_pairs_fn(text_col, id_col)

    def merge(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, w))
        ws, ds_ = w[order], d[order]
        keep = np.ones(len(ws), dtype=bool)
        keep[1:] = (ws[1:] != ws[:-1]) | (ds_[1:] != ds_[:-1])
        ws, ds_ = ws[keep], ds_[keep]
        new = np.ones(len(ws), dtype=bool)
        new[1:] = ws[1:] != ws[:-1]
        starts = np.flatnonzero(new)
        df = np.diff(np.append(starts, len(ws)))
        gaps = ds_.copy()
        gaps[1:] -= ds_[:-1]
        gaps[starts] = ds_[starts] + 1  # first posting: gap from -1
        # bit length of each gap: frexp exponent (g = m * 2^e with
        # 0.5 <= m < 1 => e == floor(log2 g) + 1 == length(bin(g)))
        _, e = np.frexp(gaps.astype(np.float64))
        gamma = 2 * e.astype(np.int64) - 1
        bits = np.add.reduceat(gamma, starts) if len(starts) \
            else np.empty(0, np.int64)
        gmax = np.maximum.reduceat(gaps, starts) if len(starts) \
            else np.empty(0, np.int64)
        sel = df >= min_df
        return pa.table({
            "word": pa.array(ws[starts], type=pa.string()),
            "df": pa.array(df),
            "gamma_bits": pa.array(bits),
            "max_gap": pa.array(gmax)}).filter(pa.array(sel))

    tagged = ds.map_batches(pairs, batch_format="pyarrow")
    out = grouped_exchange(tagged, "__b", num_buckets, merge)
    if out is None:
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype="int64"),
                             "gamma_bits": pd.Series([], dtype="int64"),
                             "max_gap": pd.Series([], dtype="int64")})
    return (out.to_pandas().sort_values("word")
            .reset_index(drop=True))


def phrase_occurrences(ds, phrase: list[str], text_col: str = "text",
                       id_col: str = "doc_id"):
    """Exact phrase search: per document, how many times the word
    sequence ``phrase`` occurs contiguously (the positional-postings
    query — "merge sort" must match adjacent positions, not a bag of
    words).  Returns a Dataset of ``(doc_id, n_occ)`` with zero-hit
    docs omitted.  Overlapping occurrences all count ("a a a" has two
    "a a"), matching the SQL position self-join restatement
    (``b.pos = a.pos + 1`` chained per phrase term).

    Distributed shape: a pure streaming map — no index and NO shuffle;
    positions exist implicitly as flattened-word offsets
    (``_split_words``), and the phrase test is one vectorized shifted
    AND across the batch's flattened word array (L-term phrase = L
    shifted comparisons, never a per-doc loop).  This is the
    scale-right form when the corpus is scanned anyway; serving many
    ad-hoc phrases against a static corpus wants ``build_postings``
    with positions instead.  Tokenization contract:
    ``regexp_split_to_array(trim(text), '\\s+')``.
    """
    from .tokenize import _split_words

    L = len(phrase)
    if L == 0:
        raise ValueError("phrase must have at least one term")

    def f(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            (id_col, b.schema.field(id_col).type
             if id_col in b.column_names else pa.int64()),
            ("n_occ", pa.int64())])
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[id_col])))
        if b.num_rows == 0:
            return out_schema.empty_table()
        words, parents, _ = _split_words(b, text_col)
        n = len(words)
        if n < L:
            return out_schema.empty_table()
        m = n - L + 1
        hit = words[:m] == phrase[0]
        for j in range(1, L):
            hit &= words[j:m + j] == phrase[j]
        # all L positions must belong to the same document
        hit &= parents[:m] == parents[L - 1:]
        par = parents[:m][hit]
        if not len(par):
            return out_schema.empty_table()
        u, c = np.unique(par, return_counts=True)
        return pa.table({
            id_col: b[id_col].take(pa.array(u)),
            "n_occ": pa.array(c.astype(np.int64))}).cast(out_schema)

    return ds.map_batches(f, batch_format="pyarrow")


def distinct_words_topk(docs_ds, k: int = 50, text_col: str = "text",
                        id_col: str = "doc_id") -> pd.DataFrame:
    """Top-``k`` documents by DISTINCT word count (lexical-richness
    ranking), ordered by ``(n_distinct DESC, doc_id ASC)`` with the
    string form of the id as the tie key (the BM25 ranking's tie
    contract).  Returns ``(doc_id, n_distinct)``.

    Scale shape: per-batch top-k then a k×blocks driver re-cut —
    global top-k is monotone under concatenation, so the re-cut is
    exact."""
    def score_batch(b: pa.Table) -> pa.Table:
        parents, words, _ = _batch_words(b, text_col)
        uniq = np.unique(
            np.stack([parents, np.unique(words, return_inverse=True)[1]],
                     axis=1), axis=0)
        nd = np.bincount(uniq[:, 0], minlength=b.num_rows).astype(np.int64)
        ids = pc.cast(b[id_col], pa.string()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids.astype(object), -nd))[:k]
        return pa.table({"doc_id": pa.array(ids[order], type=pa.string()),
                         "n_distinct": pa.array(nd[order])})

    cand = docs_ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                             "n_distinct": pd.Series([], dtype="int64")})
    return (cand.sort_values(["n_distinct", "doc_id"],
                             ascending=[False, True]).head(k)
            .reset_index(drop=True))


def hybrid_rrf_candidates(docs_ds, terms: list[str], k: int = 50,
                          rrf_k: int = 60, text_col: str = "text",
                          id_col: str = "doc_id") -> pd.DataFrame:
    """HYBRID retrieval fusion — reciprocal-rank-fuse the integer BM25
    relevance ranking with the distinct-word lexical-richness ranking
    (the two-system RRF pattern used to mix lexical and quality /
    dense signals when building retrieval training data).  The RRF
    score 1/(K+r_a) + 1/(K+r_b) is kept as an EXACT rational
    ``(rrf_num, rrf_den)`` — no float policy; consumers order by the
    fraction via cross-multiplication.  Ranks are 1-based positions in
    each system's top-``k`` (0 = absent); a doc absent from one system
    contributes only its present term.  Output: one row per candidate
    in either top-``k``, ``(doc_id, rank_bm25, rank_distinct, rrf_num,
    rrf_den)`` sorted by the string form of the id.

    Scale shape: both rankings are distributed top-k scans
    (:func:`bm25_topk`, :func:`distinct_words_topk`); the fusion
    itself touches ≤ 2k rows on the driver (output-sized).
    """
    a = bm25_topk(docs_ds, terms, k=k, text_col=text_col, id_col=id_col)
    b = distinct_words_topk(docs_ds, k=k, text_col=text_col, id_col=id_col)
    a = a.assign(rank_bm25=np.arange(1, len(a) + 1))[["doc_id", "rank_bm25"]]
    b = b.assign(rank_distinct=np.arange(1, len(b) + 1))[
        ["doc_id", "rank_distinct"]]
    f = a.merge(b, on="doc_id", how="outer").fillna(0).astype(
        {"rank_bm25": "int64", "rank_distinct": "int64"})
    na = rrf_k + f.rank_bm25.to_numpy()
    nb = rrf_k + f.rank_distinct.to_numpy()
    both = (f.rank_bm25.to_numpy() > 0) & (f.rank_distinct.to_numpy() > 0)
    num = np.where(both, na + nb, 1).astype(np.int64)
    den = np.where(both, na * nb,
                   np.where(f.rank_bm25.to_numpy() > 0, na, nb)
                   ).astype(np.int64)
    f["rrf_num"], f["rrf_den"] = num, den
    return f.sort_values("doc_id").reset_index(drop=True)


def term_position_stats(docs_ds, terms: list[str],
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pd.DataFrame:
    """Positional statistics for a broadcast term list — the
    burstiness / lead-position features (terms appearing early in a
    doc carry more topical weight; BM25 can't see position): per term,
    ``df`` (docs containing it), ``tf`` (total occurrences),
    ``sum_pos`` (sum of 1-based token positions over all occurrences)
    and ``sum_first`` (sum over docs of the FIRST occurrence
    position) — exact integers; mean position / mean lead derive
    downstream.  Terms absent from the corpus emit nothing.
    Whitespace word contract; null text/id rows drop.

    Scale shape: the term list broadcasts in the task closure; each
    batch reduces to a terms-sized partial and the driver merge is
    terms-sized — zero shuffle.
    """
    terms_sorted = np.array(sorted(set(terms)), dtype=object)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "tf": pa.array([], pa.int64()),
                          "sum_pos": pa.array([], pa.int64()),
                          "sum_first": pa.array([], pa.int64())})
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[id_col])))
        if b.num_rows == 0:
            return empty
        parents, words, _ = _batch_words(b, text_col)
        if not len(words):
            return empty
        starts = np.zeros(b.num_rows, dtype=np.int64)
        up, first_idx = np.unique(parents, return_index=True)
        starts[up] = first_idx
        pos = np.arange(len(words), dtype=np.int64) - starts[parents] + 1
        tpos = np.searchsorted(terms_sorted, words)
        tpos[tpos == len(terms_sorted)] = 0
        hit = terms_sorted[tpos] == words if len(terms_sorted) else \
            np.zeros(len(words), dtype=bool)
        if not hit.any():
            return empty
        ti, par, p = tpos[hit], parents[hit], pos[hit]
        # per-(term, doc) reduction
        s = np.empty(len(ti), dtype=[("t", np.int64), ("d", np.int64)])
        s["t"], s["d"] = ti, par
        upairs, inv = np.unique(s, return_inverse=True)
        tf_td = np.bincount(inv).astype(np.int64)
        sp_td = np.zeros(len(upairs), dtype=np.int64)
        np.add.at(sp_td, inv, p)
        fp_td = np.full(len(upairs), np.iinfo(np.int64).max,
                        dtype=np.int64)
        np.minimum.at(fp_td, inv, p)
        # per-term rollup
        ut, inv2 = np.unique(upairs["t"], return_inverse=True)
        df = np.bincount(inv2).astype(np.int64)
        tf = np.zeros(len(ut), dtype=np.int64)
        np.add.at(tf, inv2, tf_td)
        sp = np.zeros(len(ut), dtype=np.int64)
        np.add.at(sp, inv2, sp_td)
        fp = np.zeros(len(ut), dtype=np.int64)
        np.add.at(fp, inv2, fp_td)
        return pa.table({
            "term": pa.array(terms_sorted[ut], type=pa.string()),
            "df": pa.array(df), "tf": pa.array(tf),
            "sum_pos": pa.array(sp), "sum_first": pa.array(fp)})

    parts = (docs_ds.select_columns([id_col, text_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    cols = ("df", "tf", "sum_pos", "sum_first")
    if not len(parts):
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             **{c: pd.Series(dtype="int64")
                                for c in cols}})
    out = (parts.groupby("term", as_index=False)[list(cols)].sum())
    return (out.sort_values("term").reset_index(drop=True)
            .astype({c: "int64" for c in cols}))
