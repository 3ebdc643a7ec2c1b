"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID, document fingerprinting (training-data
pipeline components; SURVEY-mandated beyond-reference operators).

All stages are vectorized ``map_batches`` transforms; the per-word work
runs over the UNIQUE words of each batch (``np.unique`` + inverse
mapping), never per occurrence.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import as_array

STOPWORDS = frozenset(
    "the a an and of to in is it for on with as at by from or be this that".split()
)


def token_count_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tok): whitespace token count, vectorized via Arrow
    split + list_value_length."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(batch[text_col]), r"\s+")
    n = pc.list_value_length(toks)
    return pa.table({id_col: batch[id_col], "n_tok": pc.cast(n, pa.int64())})


def quality_score_batch(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Quality heuristics per document: token count, mean word length,
    stopword ratio, distinct-word ratio, and a combined score."""
    text = batch[text_col]
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    toks = as_array(toks)
    n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    words = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    wl = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.float64)

    n_rows = batch.num_rows
    sum_wl = np.zeros(n_rows)
    np.add.at(sum_wl, parents, wl)
    mean_wl = sum_wl / np.maximum(n_tok, 1)

    warr = words.to_numpy(zero_copy_only=False)
    uniq, inverse = np.unique(warr, return_inverse=True)
    is_stop_u = np.isin(uniq, list(STOPWORDS))
    stops = np.zeros(n_rows)
    np.add.at(stops, parents, is_stop_u[inverse].astype(np.float64))
    stop_ratio = stops / np.maximum(n_tok, 1)

    # distinct ratio: distinct words per doc / n_tok, via unique of
    # (parent, word_code) pairs
    pairs = parents.astype(np.int64) * len(uniq) + inverse
    distinct_pairs = np.unique(pairs)
    dcounts = np.zeros(n_rows)
    np.add.at(dcounts, (distinct_pairs // len(uniq)).astype(np.int64), 1.0)
    distinct_ratio = dcounts / np.maximum(n_tok, 1)

    score = (
        np.clip(n_tok / 64.0, 0, 1) * 0.3
        + np.clip((mean_wl - 1.0) / 6.0, 0, 1) * 0.2
        + (1.0 - np.clip(stop_ratio * 2.0, 0, 1)) * 0.2
        + distinct_ratio * 0.3
    )
    # integer feature columns are exact (no float rounding policy in
    # play) — the SQL-oracle-checked surface; the ratios/score derive
    # from them deterministically
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tok": pa.array(n_tok),
            "sum_word_len": pa.array(sum_wl.astype(np.int64)),
            "n_stop": pa.array(stops.astype(np.int64)),
            "n_distinct": pa.array(dcounts.astype(np.int64)),
            "mean_word_len": pa.array(np.round(mean_wl, 6)),
            "stop_ratio": pa.array(np.round(stop_ratio, 6)),
            "distinct_ratio": pa.array(np.round(distinct_ratio, 6)),
            "quality": pa.array(np.round(score, 6)),
        }
    )


# character-trigram profiles per language (deterministic heuristic;
# tiny — this is a stand-in for a real langid model, loaded once per
# actor in LangIdModel.__init__)
_LANG_HINTS = {
    "en": ["the", "ing", "ion", " th", "and", " of", " to"],
    "de": ["der", "sch", "ung", "ein", "ich", " un", "die"],
    "fr": ["les", "ent", " de", "que", "ion", " le", "des"],
    "es": [" de", "los", "ión", "que", " la", "ent", "ado"],
    "zh": ["的", "了", "是", "在", "我", "不", "有"],
}


class LangIdModel:
    """Actor-pool language-ID stage: profile table built once per actor
    (the stateful-stage pattern: setup in __init__, work in __call__)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.langs = sorted(_LANG_HINTS)
        self.hints = {lang: list(h) for lang, h in _LANG_HINTS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        scores = np.zeros((batch.num_rows, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for hint in self.hints[lang]:
                c = pc.count_substring(text, hint)
                scores[:, j] += (as_array(c)).to_numpy(zero_copy_only=False)
        best = np.argmax(scores, axis=1)
        conf = scores[np.arange(len(best)), best]
        pred = np.array(self.langs, dtype=object)[best]
        pred[conf == 0] = "und"
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "lang_pred": pa.array(pred, type=pa.string()),
                "lang_hits": pa.array(conf),
            }
        )


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(doc_id, fingerprint): md5 hex of the document text (content
    address for exact dedup / caching), plus a 64-bit rolling hash."""
    from ..functions.hashing import md5_hex

    texts = batch[text_col].to_pylist()
    rolls = _rolling64_batch(texts)
    return pa.table(
        {
            id_col: batch[id_col],
            "fingerprint": md5_hex(batch[text_col]),
            "rolling_hash": pa.array(rolls, type=pa.uint64()),
        }
    )


_ROLL_BASE = np.uint64(1315423911)


def _rolling64_batch(texts: list) -> list:
    """Polynomial 64-bit hash of each text, vectorized: ONE numpy
    Horner pass over the concatenated bytes of the whole batch using
    precomputed base powers (h = sum b_i * base^(n-1-i) mod 2^64) —
    no per-byte Python loop."""
    enc = [t.encode("utf-8") if t is not None else None for t in texts]
    lengths = [len(b) for b in enc if b is not None]
    if not lengths:
        return [None] * len(texts)
    max_len = max(lengths)
    # powers[i] = base^i (wrapping uint64)
    powers = np.empty(max_len, dtype=np.uint64)
    if max_len:
        powers[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            for i in range(1, max_len):
                powers[i] = powers[i - 1] * _ROLL_BASE
    out: list = []
    flat = np.frombuffer(b"".join(b for b in enc if b is not None),
                         dtype=np.uint8).astype(np.uint64)
    pos = 0
    with np.errstate(over="ignore"):
        for b in enc:
            if b is None:
                out.append(None)
                continue
            n = len(b)
            seg = flat[pos:pos + n]
            pos += n
            # h = Σ seg[i] * base^(n-1-i): one vectorized dot (mod 2^64)
            h = np.uint64(0) if n == 0 else np.sum(
                seg * powers[n - 1::-1], dtype=np.uint64)
            out.append(int(h))
    return out


def _rolling64(s: str, base: int = 1315423911) -> int:
    """Scalar reference implementation (tests compare the vectorized
    batch path against this)."""
    h = 0
    for b in s.encode("utf-8"):
        h = (h * base + b) & 0xFFFFFFFFFFFFFFFF
    return h


def token_counts(ds, text_col="text", id_col="doc_id"):
    return ds.map_batches(
        lambda b: token_count_batch(b, text_col, id_col), batch_format="pyarrow")


def quality_scores(ds, text_col="text", id_col="doc_id"):
    return ds.map_batches(
        lambda b: quality_score_batch(b, text_col, id_col), batch_format="pyarrow")


def lang_id(ds, text_col="text", id_col="doc_id", concurrency=4):
    return ds.map_batches(
        LangIdModel, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)


def fingerprints(ds, text_col="text", id_col="doc_id"):
    return ds.map_batches(
        lambda b: fingerprint_batch(b, text_col, id_col), batch_format="pyarrow")


def normalize_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Canonical text normalization (training-data preprocessing):
    lowercase, strip non-alphanumerics to spaces, collapse whitespace,
    trim.  Pure RE2 kernels (pyarrow.compute), so the exact transform
    is reproducible in DuckDB's RE2 regexp_replace — oracle-checkable.
    """
    t = pc.utf8_lower(batch[text_col])
    t = pc.replace_substring_regex(t, r"[^a-z0-9\s]+", " ")
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return pa.table({id_col: batch[id_col], "text_norm": t})


def normalize_texts(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: normalize_batch(b, text_col, id_col),
        batch_format="pyarrow")


def repetition_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", repetition filters): whitespace-token
    count, count of the most frequent word, total occurrences of
    words that repeat (the duplicate-word-fraction numerator), and the
    count of the most frequent adjacent-word bigram.

    Integer feature columns only (the float fractions derive from them
    deterministically downstream) — the SQL-oracle-checked surface,
    per the repo's float-rounding policy.  Fully vectorized: per-doc
    counting via np.unique over (doc, word-code) keys; no per-row
    Python.  Assumes non-null text (the documents corpus contract;
    same as quality_score_batch).
    """
    text = batch[text_col]
    toks = as_array(pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+"))
    n_rows = batch.num_rows
    n_words = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    words = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    warr = words.to_numpy(zero_copy_only=False)
    uniq, codes = np.unique(warr, return_inverse=True)
    U = np.int64(max(len(uniq), 1))

    # per-(doc, word) occurrence counts
    pair = parents * U + codes
    upair, pcounts = np.unique(pair, return_counts=True)
    pdoc = (upair // U).astype(np.int64)
    top_word = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(top_word, pdoc, pcounts)
    dup_words = np.zeros(n_rows, dtype=np.int64)
    np.add.at(dup_words, pdoc, np.where(pcounts >= 2, pcounts, 0))

    # adjacent bigrams within a doc.  Key arithmetic assumes
    # n_rows * U^2 < 2^63: U is bounded by the batch's word
    # occurrences (batch_size x words/doc, ~10^6), so U^2 * 4096
    # stays ~10^16 — well inside int64.
    top_bigram = np.zeros(n_rows, dtype=np.int64)
    if len(parents) > 1:
        adj = parents[:-1] == parents[1:]
        bparent = parents[:-1][adj]
        bkey = (bparent * (U * U)
                + codes[:-1][adj].astype(np.int64) * U + codes[1:][adj])
        ub, bcounts = np.unique(bkey, return_counts=True)
        np.maximum.at(top_bigram, (ub // (U * U)).astype(np.int64), bcounts)

    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(n_words),
        "top_word_cnt": pa.array(top_word),
        "dup_word_cnt": pa.array(dup_words),
        "top_bigram_cnt": pa.array(top_bigram),
    })


def repetition_signals(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: repetition_batch(b, text_col, id_col),
        batch_format="pyarrow")


# label -> RE2 pattern.  Both pyarrow.compute and DuckDB use RE2, so
# the redaction transform is reproducible verbatim in the SQL oracle.
DEFAULT_PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("longnum", r"\b\d{13,19}\b"),
]


def redact_batch(batch: pa.Table, patterns=None, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """PII-style regex redaction: each (label, pattern) is applied IN
    ORDER — count non-overlapping matches, then replace them all with
    ``[LABEL]`` — so later patterns see earlier redactions (an email's
    digits can't double-match a number pattern).  Emits one
    ``n_<label>`` int column per pattern plus the final
    ``text_redacted``.  Pure RE2 kernels; the oracle chains DuckDB
    ``regexp_extract_all`` / ``regexp_replace(..., 'g')`` identically.
    """
    if patterns is None:
        patterns = DEFAULT_PII_PATTERNS
    t = batch[text_col]
    cols: dict = {id_col: batch[id_col]}
    for label, pat in patterns:
        cols[f"n_{label}"] = pc.cast(
            as_array(pc.count_substring_regex(t, pat)), pa.int64())
        t = pc.replace_substring_regex(t, pat, f"[{label.upper()}]")
    cols["text_redacted"] = t
    return pa.table(cols)


def redact(ds, patterns=None, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: redact_batch(b, patterns, text_col, id_col),
        batch_format="pyarrow")


def segment_dedup(ds, words_per_seg: int = 13, text_col: str = "text",
                  id_col: str = "doc_id", num_buckets: int = 64):
    """Corpus-wide SEGMENT-level exact dedup (the CCNet/RefinedWeb
    "line-level dedup" move, over fixed word windows since the corpus
    has no newlines): split every document into consecutive
    ``words_per_seg``-word segments, keep only the globally FIRST
    occurrence of each distinct segment (winner = smallest
    (doc_id, seg_idx)), drop every repeat — boilerplate that exact
    whole-doc dedup can't see.  Returns the KEPT segments as a Dataset
    of ``(id_col, seg_idx)``.

    Segment identity is ``md5_u64le`` of the space-joined segment (the
    repo gram-hash contract — DuckDB ``md5_number_upper`` restates it
    exactly, so the oracle partitions by the same 64-bit key).

    Scale shape: segment construction is fully vectorized (Arrow
    split/flatten, ``ListArray.from_arrays`` over segment-boundary
    offsets, one ``binary_join`` — no per-row Python); segments route
    through ONE hash exchange keyed on the segment hash (each distinct
    segment meets in exactly one bucket); each bucket picks winners
    with one lexsort pass.  The shuffle carries (u64 hash, id,
    seg_idx) — never segment text; winners stay in the object store.

    Null/short rows: null id or text drops the row (SQL parity); an
    empty text yields ONE empty-string segment (matching DuckDB
    ``string_split_regex`` on '').
    """
    from ..functions.hashing import md5_u64le
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds

    W = int(words_per_seg)
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema([(id_col, id_type), ("seg_idx", pa.int64())])

    def segments(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[text_col])))
        if b.num_rows == 0:
            return pa.table({"__h": pa.array([], type=pa.uint64()),
                             id_col: pa.array([], type=id_type),
                             "seg_idx": pa.array([], type=pa.int64())})
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\s+"))
        words = as_array(pc.list_flatten(toks))
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = len(parents)
        doc_start = np.zeros(m, dtype=np.int64)
        new_doc = np.ones(m, dtype=bool)
        new_doc[1:] = parents[1:] != parents[:-1]
        starts_of_docs = np.flatnonzero(new_doc)
        doc_len = np.diff(np.append(starts_of_docs, m))
        doc_start = np.repeat(starts_of_docs, doc_len)
        pos = np.arange(m) - doc_start           # word ordinal in doc
        seg_starts = np.flatnonzero(pos % W == 0)
        offsets = np.append(seg_starts, m).astype(np.int32)
        seg_list = pa.ListArray.from_arrays(pa.array(offsets), words)
        seg_str = pc.binary_join(seg_list, " ")
        h = md5_u64le(seg_str)
        ids = as_array(b[id_col]).take(pa.array(parents[seg_starts]))
        return pa.table({
            "__h": pa.array(h, type=pa.uint64()),
            id_col: ids,
            "seg_idx": pa.array(pos[seg_starts] // W)})

    def winners(t: pa.Table) -> pa.Table:
        h = t.column("__h").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        si = t.column("seg_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((si, ids, h))
        hs = h[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        sel = pa.array(np.sort(order[first]))
        return t.select([id_col, "seg_idx"]).take(sel).cast(out_schema)

    segs = ds.map_batches(segments, batch_format="pyarrow")
    return grouped_exchange_ds(segs, "__h", num_buckets, winners,
                               empty_schema=out_schema,
                               drop_bucket=False)


def segment_counts(ds, words_per_seg: int = 13, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Per-document segment totals for ``segment_dedup`` outputs: one
    streaming pass, rows ``(id_col, n_seg)`` where ``n_seg =
    ceil(n_words / words_per_seg)`` (an empty text counts one empty
    segment — same contract as segment_dedup)."""
    from ..kernels import as_array

    W = int(words_per_seg)

    def per_batch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[text_col])))
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\s+")
        nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        n_seg = (nw + W - 1) // W
        return pa.table({id_col: as_array(b[id_col]),
                         "n_seg": pa.array(n_seg.astype(np.int64))})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def _levenshtein_block(a_list: list[str], b_list: list[str],
                       trunc: int) -> np.ndarray:
    """Vectorized Levenshtein over a BATCH of string pairs: one DP
    matrix of shape (n_pairs, width+1) advanced column-by-column, so
    the work is O(width²) numpy kernels over all pairs at once — no
    per-pair Python loop.  Distance is over UTF-8 BYTES — exactly
    DuckDB's ``levenshtein`` semantics (byte-level; 'a'→'é' costs 2),
    identical to codepoint distance on ASCII.  ``trunc`` bounds the
    CODEPOINT count per string (applied by the caller's slice); the
    byte width adapts to the data."""
    n = len(a_list)
    a_bytes = [s[:trunc].encode("utf-8") for s in a_list]
    b_bytes = [s[:trunc].encode("utf-8") for s in b_list]
    la = np.fromiter((len(x) for x in a_bytes), np.int64, count=n)
    lb = np.fromiter((len(x) for x in b_bytes), np.int64, count=n)
    W = int(max(la.max(initial=0), lb.max(initial=0), 1))
    A = np.zeros((n, W), dtype=np.uint8)
    B = np.zeros((n, W), dtype=np.uint8)
    for i, x in enumerate(a_bytes):         # fill only: O(total bytes)
        A[i, :len(x)] = np.frombuffer(x, dtype=np.uint8)
    for i, x in enumerate(b_bytes):
        B[i, :len(x)] = np.frombuffer(x, dtype=np.uint8)
    L = int(max(la.max(initial=0), 1))
    dp = np.broadcast_to(np.arange(W + 1, dtype=np.int64),
                         (n, W + 1)).copy()
    out = np.empty(n, dtype=np.int64)
    done = la == 0
    out[done] = lb[done]
    for i in range(1, L + 1):
        cur = np.empty_like(dp)
        cur[:, 0] = i
        for j in range(1, W + 1):
            sub = dp[:, j - 1] + (A[:, i - 1] != B[:, j - 1])
            cur[:, j] = np.minimum(np.minimum(dp[:, j] + 1,
                                              cur[:, j - 1] + 1), sub)
        dp = cur
        hit = la == i
        if hit.any():
            out[hit] = dp[hit, lb[hit]]
    return out


def edit_distance_pairs(ds, id_col: str = "doc_id",
                        text_col: str = "text", max_dist: int = 3,
                        prefix_len: int = 4, trunc: int = 24,
                        num_buckets: int = 32):
    """Near-duplicate pairs by LEVENSHTEIN edit distance with exact
    prefix blocking — the character-level member of the near-dup
    family (MinHash/SimHash/Jaccard are token-level; OCR noise, typo
    variants and boilerplate-prefix clones are edit-distance-shaped).
    Returns a resident Dataset (id_a, id_b, dist) with id_a < id_b and
    dist ≤ ``max_dist``, computed over the first ``trunc`` codepoints
    at UTF-8 BYTE granularity (DuckDB ``levenshtein`` parity; equal to
    codepoint distance on ASCII).

    RECALL CONTRACT (like ``joins.fuzzy_join``): only pairs sharing
    their first ``prefix_len`` codepoints exactly are candidates — a
    pair differing inside the prefix is unseen, by design (blocking is
    what removes the all-pairs product).  Null ids/texts drop.

    Scale shape: one prefix-keyed exchange; each bucket enumerates
    within-prefix pairs (repeat/arange) and runs the batched DP above —
    per-task cost is C(block, 2)·trunc², so the per-task bound is the
    hottest prefix block (SURVEY §2.6: lengthen ``prefix_len`` if a
    boilerplate prefix explodes a block).
    """
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("dist", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[text_col])))
        t24 = pc.utf8_slice_codeunits(b[text_col], 0, trunc)
        pfx = pc.utf8_slice_codeunits(b[text_col], 0, prefix_len)
        h = pd.util.hash_array(
            pfx.to_numpy(zero_copy_only=False).astype(object))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "id": pc.cast(b[id_col], pa.int64()),
            "pfx": pfx, "t": t24})

    def pairs_of(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        pfx = t.column("pfx").to_numpy(zero_copy_only=False).astype(object)
        txt = t.column("t").to_numpy(zero_copy_only=False).astype(object)
        order = np.lexsort((ids, pfx))
        ids, pfx, txt = ids[order], pfx[order], txt[order]
        _, start = np.unique(pfx, return_index=True)
        cnt = np.diff(np.append(start, len(pfx)))
        cnt_row = np.repeat(cnt, cnt)
        pos = np.arange(len(pfx)) - np.repeat(start, cnt)
        n_after = cnt_row - 1 - pos
        total = int(n_after.sum())
        if total == 0:
            return out_schema.empty_table()
        first = np.repeat(np.arange(len(pfx)), n_after)
        csum = np.concatenate(([0], np.cumsum(n_after)))
        k = np.arange(total) - np.repeat(csum[:-1], n_after)
        second = first + 1 + k
        dist = _levenshtein_block(list(txt[first]), list(txt[second]),
                                  trunc)
        keep = dist <= max_dist
        ia, ib = ids[first[keep]], ids[second[keep]]
        return pa.table({"id_a": pa.array(np.minimum(ia, ib)),
                         "id_b": pa.array(np.maximum(ia, ib)),
                         "dist": pa.array(dist[keep])})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, pairs_of,
                               empty_schema=out_schema)


def term_count_batch(batch: pa.Table, terms: list[str],
                     text_col: str = "text", id_col: str = "doc_id"
                     ) -> pa.Table:
    """Per-batch whole-word term extraction to LONG format: one row
    per (doc, term) with the occurrence count, rows with zero
    occurrences omitted.  Fully vectorized — one RE2
    ``count_substring_regex`` kernel call per term over the whole
    batch column (k terms = k kernel calls, never a per-row Python
    loop).  Whole-word semantics via RE2 ``\\b``: terms must start
    and end with word characters (``\\b`` next to punctuation never
    matches — RE2 has no lookaround to widen it)."""
    import re as _re

    out_schema = pa.schema([(id_col, batch.schema.field(id_col).type),
                            ("term", pa.string()),
                            ("n", pa.int64())])
    parts = []
    for term in terms:
        pat = rf"\b{_re.escape(term)}\b"
        cnt = pc.cast(pc.count_substring_regex(batch[text_col],
                                               pattern=pat),
                      pa.int64())
        mask = pc.greater(cnt, 0)
        ids = pc.array_filter(as_array(batch[id_col]), mask)
        ns = pc.array_filter(as_array(cnt), mask)
        if len(ids):
            parts.append(pa.table({
                id_col: ids,
                "term": pa.array([term] * len(ids)),
                "n": ns}).cast(out_schema))
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts)


def term_counts(ds, terms: list[str], text_col: str = "text",
                id_col: str = "doc_id"):
    """Streaming long-format term-occurrence extraction — the
    dictionary-spotting ETL shape (extract every occurrence count of
    a fixed vocabulary: topics, brand names, blocklist hits) that
    feeds boolean retrieval and topic mixing.  Pure ``map_batches``,
    no shuffle; output is (doc, term)-sized, never corpus² — at
    100 TB this runs at scan bandwidth with the term list captured in
    the task closure (manifest-sized)."""
    return ds.map_batches(
        lambda b: term_count_batch(b, terms, text_col, id_col),
        batch_format="pyarrow")


def word_collocations(ds, k: int = 30, text_col: str = "text",
                      id_col: str = "doc_id",
                      num_buckets: int = 32) -> pd.DataFrame:
    """Top-``k`` adjacent-word collocations with exact PMI
    components — the collocation-mining primitive (Church & Hanks
    1990): for each bigram (a, b) occurring contiguously inside a
    document, report ``n_pair`` plus the corpus unigram counts
    ``n_left``/``n_right`` and the totals ``n_bigrams``/``n_words``.
    PMI = log(n_pair·n_words² / (n_left·n_right·n_bigrams)) is the
    caller's float step — the components stay integers (the repo's
    integer-oracle policy).  Ranking: count DESC, then (a, b) ASC.
    Bigrams never cross documents; tokenization is the whitespace
    contract (``regexp_split_to_array(trim(text), '\\s+')``).

    Distributed shape: per-batch shifted-compare pair extraction +
    batch-local combine (``np.unique``), ONE pair-keyed exchange for
    global pair counts with per-bucket top-k pre-capping (only k rows
    per bucket reach the driver — ``token_pair_topk``'s contract);
    unigram counts come from a SECOND targeted pass that counts only
    the ≤2k winner words (so ``ds`` must be
    materialized-or-rescannable), never the whole vocabulary.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from .tokenize import _split_words

    def pair_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"__b": pa.array([], pa.int64()),
                          "a": pa.array([], pa.string()),
                          "bw": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[id_col])))
        if b.num_rows == 0:
            return empty
        words, parents, _ = _split_words(b, text_col)
        if len(words) < 2:
            return empty
        same = parents[1:] == parents[:-1]
        left, right = words[:-1][same], words[1:][same]
        if not len(left):
            return empty
        pairs = left.astype(object) + "\x1f" + right.astype(object)
        u, c = np.unique(pairs, return_counts=True)
        sp = np.array([x.split("\x1f", 1) for x in u], dtype=object)
        ua = pa.array(sp[:, 0], pa.string())
        h = md5_u64le(pa.array(u, pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "a": ua, "bw": pa.array(sp[:, 1], pa.string()),
            "c": pa.array(c.astype(np.int64))})

    def pair_merge(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(object)
        bw = t.column("bw").to_numpy(
            zero_copy_only=False).astype(object)
        c = t.column("c").to_numpy(zero_copy_only=False)
        key = a + "\x1f" + bw
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, c)
        # per-bucket pre-cap: (count desc, pair asc), keep k
        order = np.lexsort((u, -s))[:k]
        sp = np.array([x.split("\x1f", 1) for x in u[order]],
                      dtype=object)
        total = pa.table({"a": pa.array(["\x00total"] ,pa.string()),
                          "bw": pa.array([""], pa.string()),
                          "c": pa.array([int(c.sum())], pa.int64())})
        top = pa.table({"a": pa.array(sp[:, 0], pa.string())
                        if len(order) else pa.array([], pa.string()),
                        "bw": pa.array(sp[:, 1], pa.string())
                        if len(order) else pa.array([], pa.string()),
                        "c": pa.array(s[order].astype(np.int64))})
        return pa.concat_tables([top, total])

    tagged = ds.map_batches(pair_partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, pair_merge)
    cols = ["a", "b", "n_pair", "n_left", "n_right", "n_bigrams",
            "n_words"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(
            dtype=object if c in ("a", "b") else "int64")
            for c in cols})
    df = res.to_pandas()
    totals = df[df.a == "\x00total"]
    n_bigrams = int(totals.c.sum())
    df = df[df.a != "\x00total"]
    df = (df.sort_values(["c", "a", "bw"],
                         ascending=[False, True, True]).head(k)
          .rename(columns={"bw": "b", "c": "n_pair"}))
    # unigram counts: a SECOND targeted pass over ds — per-batch
    # partials count only the ≤2k winner words (np.isin over batch
    # uniques) plus the total word count; driver merge is
    # winner-sized.  ds must be materialized-or-rescannable.
    import ray

    wanted = np.unique(np.concatenate(
        [df["a"].to_numpy(dtype=object),
         df["b"].to_numpy(dtype=object)])) if len(df) else \
        np.empty(0, dtype=object)

    def uni_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"w": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        b = b.filter(pc.is_valid(b[text_col]))
        if b.num_rows == 0:
            return empty
        words, _, _ = _split_words(b, text_col)
        u, c = np.unique(words.astype(object), return_counts=True)
        hit = np.isin(u, wanted)
        tw = pa.table({"w": pa.array(["\x00nw"], pa.string()),
                       "c": pa.array([int(c.sum())], pa.int64())})
        return pa.concat_tables([pa.table({
            "w": pa.array(u[hit], pa.string()),
            "c": pa.array(c[hit].astype(np.int64))}), tw])

    uparts = [t for t in ray.get(
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    wc: dict = {}
    for t in uparts:
        for w, c in zip(t.column("w").to_pylist(),
                        t.column("c").to_pylist()):
            wc[w] = wc.get(w, 0) + c
    n_words = int(wc.pop("\x00nw", 0))
    df["n_left"] = df["a"].map(wc).astype("int64")
    df["n_right"] = df["b"].map(wc).astype("int64")
    df["n_bigrams"] = np.int64(n_bigrams)
    df["n_words"] = np.int64(n_words)
    return df[cols].reset_index(drop=True).astype(
        {"n_pair": "int64"})


def stopword_discovery(ds, min_df_permille: int = 500,
                       text_col: str = "text", id_col: str = "doc_id",
                       num_buckets: int = 64) -> pd.DataFrame:
    """Corpus-driven stopword discovery: every word whose DOCUMENT
    frequency clears ``min_df_permille`` — keep word iff ``1000·df ≥
    min_df_permille·n_docs`` (exact integers; df counts each doc once
    regardless of repetition).  The precursor to stopword lists, DF
    pruning, and prefix-filter viability checks
    (``dedup.jaccard_prefix_join``'s element-rarity contract is exactly
    "few words clear this bar").  Whitespace word contract shared with
    ``tokenize._split_words``.  Null text/id docs drop from both df and
    n_docs.  Returns (word, df) sorted by (df DESC, word ASC).

    Distributed shape: each batch collapses to DISTINCT (word, doc)
    pairs then to (word, partial_df) map-side — corpus word repetition
    never leaves the block; ONE word-keyed exchange sums partials and
    filters, so only the (small) stopword set reaches the driver.
    ``n_docs`` comes from a projected streaming count in the same
    session.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from .tokenize import _split_words

    def valid(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(pc.is_valid(b[text_col]),
                                pc.is_valid(b[id_col])))

    n_docs = (ds.select_columns([id_col, text_col])
              .map_batches(valid, batch_format="pyarrow").count())
    if n_docs == 0:
        return pd.DataFrame({"word": pd.Series(dtype=object),
                             "df": pd.Series(dtype="int64")})

    def partial_df(b: pa.Table) -> pa.Table:
        b = valid(b)
        if b.num_rows == 0:
            return pa.table({"__b": pa.array([], pa.int64()),
                             "word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, parents, _ = _split_words(b, text_col)
        uw, codes = np.unique(words, return_inverse=True)
        # distinct (doc, word) pairs -> per-word partial df
        pair = parents.astype(np.int64) * len(uw) + codes
        upair = np.unique(pair)
        wdf = np.bincount((upair % len(uw)).astype(np.int64),
                          minlength=len(uw)).astype(np.int64)
        h = md5_u64le(pa.array(uw, type=pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "word": pa.array(uw, type=pa.string()),
            "n": pa.array(wdf)})

    def sum_filter(t: pa.Table) -> pa.Table:
        w = t.column("word").to_numpy(zero_copy_only=False).astype(object)
        n = t.column("n").to_numpy(zero_copy_only=False)
        uw, inv = np.unique(w, return_inverse=True)
        df_ = np.zeros(len(uw), dtype=np.int64)
        np.add.at(df_, inv, n)
        keep = 1000 * df_ >= min_df_permille * n_docs
        return pa.table({"word": pa.array(uw[keep], type=pa.string()),
                         "df": pa.array(df_[keep])})

    tagged = (ds.select_columns([id_col, text_col])
              .map_batches(partial_df, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, sum_filter)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"word": pd.Series(dtype=object),
                             "df": pd.Series(dtype="int64")})
    out = res.to_pandas()
    return (out.sort_values(["df", "word"], ascending=[False, True])
            .reset_index(drop=True))


def oov_rate(ds, vocab_size: int = 20, text_col: str = "text",
             group_col: str = "source") -> pd.DataFrame:
    """Out-of-vocabulary rate per group — the tokenizer-fit audit
    before training (a source whose OOV share spikes is drifting away
    from the vocab the tokenizer was fit on): vocabulary = the global
    top-``vocab_size`` words by (count DESC, word ASC)
    (:func:`tokenize.build_vocab`'s exact ranking), then per group the
    total word occurrences, the occurrences outside the vocabulary,
    and ``oov_permille = 1000·n_oov // n_tokens`` (exact integers).
    Null text/group rows drop.  Returns ``(group, n_tokens, n_oov,
    oov_permille)`` sorted by group.

    Scale shape: vocab build is one streaming pass (driver data
    bounded by corpus vocabulary — ``build_vocab``'s contract); the
    vocab broadcasts once via ``ray.put``; pass 2 reduces each batch
    to per-group (total, oov) partials via one ``np.unique`` + sorted
    membership probe over the batch's UNIQUE words — enum-group-sized
    driver merge, zero shuffles.
    """
    import ray

    from .tokenize import _split_words, build_vocab

    vocab = build_vocab(ds, vocab_size, text_col=text_col)
    vwords = np.sort(vocab.column("word").to_numpy(
        zero_copy_only=False).astype(object))
    vref = ray.put(vwords)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[group_col])))
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_oov": pa.array([], pa.int64())})
        vw = ray.get(vref)
        words, parents, _ = _split_words(b, text_col)
        uw, codes = np.unique(words, return_inverse=True)
        pos = np.searchsorted(vw, uw)
        pos_c = np.minimum(pos, max(len(vw) - 1, 0))
        in_vocab = (vw[pos_c] == uw) if len(vw) else np.zeros(len(uw), bool)
        oov = ~in_vocab[codes]
        g = (pc.cast(b[group_col], pa.string())
             .to_numpy(zero_copy_only=False).astype(object))[parents]
        ug, inv = np.unique(g, return_inverse=True)
        tot = np.bincount(inv, minlength=len(ug)).astype(np.int64)
        noov = np.zeros(len(ug), dtype=np.int64)
        np.add.at(noov, inv, oov.astype(np.int64))
        return pa.table({"g": pa.array(ug, type=pa.string()),
                         "n_tokens": pa.array(tot),
                         "n_oov": pa.array(noov)})

    parts = (ds.select_columns([text_col, group_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if not len(parts):
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "n_tokens": pd.Series(dtype="int64"),
                             "n_oov": pd.Series(dtype="int64"),
                             "oov_permille": pd.Series(dtype="int64")})
    agg = parts.groupby("g", as_index=False).agg(
        n_tokens=("n_tokens", "sum"), n_oov=("n_oov", "sum"))
    agg["oov_permille"] = 1000 * agg.n_oov // agg.n_tokens
    return (agg.rename(columns={"g": group_col})
            .astype({"n_tokens": "int64", "n_oov": "int64",
                     "oov_permille": "int64"})
            .sort_values(group_col).reset_index(drop=True))


def vocab_growth(ds, thresholds: list[int], text_col: str = "text",
                 id_col: str = "doc_id",
                 num_buckets: int = 64) -> pd.DataFrame:
    """Vocabulary GROWTH curve (Heaps'-law audit): for each doc-count
    threshold ``t``, how many distinct words appear among the docs
    with ``id < t`` — is the corpus still finding new vocabulary, or
    saturated (dedup/diversity signal at curation time)?  Word = the
    whitespace contract; null text/id docs drop.  Returns
    ``(n_docs, vocab_size)``, one row per threshold.

    Scale shape: each batch emits per-word MIN first-doc-id partials
    over its distinct (word, doc) pairs; ONE word-keyed exchange
    resolves the global min per word, and each bucket collapses to a
    thresholds-length count vector — the driver sees
    buckets × thresholds integers, never words.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from .tokenize import _split_words

    thr = np.asarray(sorted(thresholds), dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[id_col])))
        if b.num_rows == 0:
            return pa.table({"__b": pa.array([], pa.int64()),
                             "word": pa.array([], pa.string()),
                             "first": pa.array([], pa.int64())})
        words, parents, _ = _split_words(b, text_col)
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)[parents]
        uw, codes = np.unique(words, return_inverse=True)
        first = np.full(len(uw), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, codes, ids)
        h = md5_u64le(pa.array(uw, type=pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "word": pa.array(uw, type=pa.string()),
            "first": pa.array(first)})

    def counts(t: pa.Table) -> pa.Table:
        w = t.column("word").to_numpy(zero_copy_only=False).astype(object)
        f = t.column("first").to_numpy(zero_copy_only=False)
        uw, inv = np.unique(w, return_inverse=True)
        gmin = np.full(len(uw), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(gmin, inv, f)
        # words whose first doc id < t, per threshold
        vs = (gmin[:, None] < thr[None, :]).sum(axis=0).astype(np.int64)
        return pa.table({"n_docs": pa.array(thr),
                         "vocab_size": pa.array(vs)})

    tagged = (ds.select_columns([id_col, text_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, counts)
    if res is None or res.num_rows == 0:
        # wordless corpus still reports every threshold (SQL parity)
        return pd.DataFrame({"n_docs": thr,
                             "vocab_size": np.zeros(len(thr), np.int64)})
    return (res.to_pandas().groupby("n_docs", as_index=False)
            ["vocab_size"].sum()
            .astype({"n_docs": "int64", "vocab_size": "int64"})
            .sort_values("n_docs").reset_index(drop=True))


def sentence_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document sentence segmentation stats — the long-document
    structure audit before chunking: ``n_sentences`` = segment count
    under the ``[.!?]+`` splitter (RAW split, trailing empties count —
    the exact ``regexp_split_to_array`` contract) and
    ``max_sent_words`` = the largest whitespace word count over the
    trimmed segments.  Null text rows drop.  Returns a Dataset
    ``(doc_id, n_sentences, max_sent_words)`` — corpus-sized, stays
    resident.

    Pure streaming map: two vectorized Arrow regex splits (sentence,
    then word inside the flattened segments) + one maximum.at — no
    per-row Python.
    """
    from ..kernels import as_array

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("n_sentences", pa.int64()),
                            ("max_sent_words", pa.int64())])

    def stats(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[text_col]))
        if b.num_rows == 0:
            return out_schema.empty_table()
        segs = as_array(pc.split_pattern_regex(b[text_col], r"[.!?]+"))
        n_sent = pc.list_value_length(segs).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(segs)
        parents = pc.list_parent_indices(segs).to_numpy(
            zero_copy_only=False)
        words = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(flat), r"\s+"))
        wc = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        mx = np.zeros(b.num_rows, dtype=np.int64)
        np.maximum.at(mx, parents, wc)
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "n_sentences": pa.array(n_sent),
            "max_sent_words": pa.array(mx)}).cast(out_schema)

    return ds.map_batches(stats, batch_format="pyarrow")


def ngram_novelty(ds, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id",
                  num_buckets: int = 64) -> pd.DataFrame:
    """Per-document n-gram NOVELTY — the redundancy-pressure score
    behind curation order (a doc whose grams all first appeared in
    earlier docs adds nothing; high-novelty docs carry the corpus):
    for each doc, ``n_grams`` = its DISTINCT word-``n``-grams and
    ``n_novel`` = those whose smallest containing doc_id is THIS doc
    (first appearance in id order; a gram tied across docs credits
    the smallest id).  Whitespace word contract; docs with < n words
    have zero grams and emit nothing; null text/id rows drop.
    Returns ``(doc_id, n_grams, n_novel)`` sorted by id.

    Scale shape: batches emit distinct (gram, doc) pairs; ONE
    gram-keyed exchange resolves each gram's min doc and collapses to
    per-doc (n_grams, n_novel) partials — the driver merge is
    doc-cardinality (output-sized).
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from .tokenize import _split_words

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[id_col])))
        empty = pa.table({"__b": pa.array([], pa.int64()),
                          "g": pa.array([], pa.string()),
                          "d": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        words, parents, _ = _split_words(b, text_col)
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(words) < n:
            return empty
        m = len(words) - n + 1
        same = np.ones(m, dtype=bool)
        gram = words[:m].astype(object)
        for j in range(1, n):
            same &= parents[j:m + j] == parents[:m]
            gram = gram + " " + words[j:m + j]
        d = ids[parents[:m][same]]
        pairs = (pd.DataFrame({"g": gram[same], "d": d})
                 .drop_duplicates(ignore_index=True))
        if not len(pairs):
            return empty
        h = md5_u64le(pa.array(pairs.g.to_numpy(), type=pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "g": pa.array(pairs.g.to_numpy(), type=pa.string()),
            "d": pa.array(pairs.d.to_numpy(np.int64))})

    def resolve(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False).astype(object)
        d = t.column("d").to_numpy(zero_copy_only=False)
        pairs = (pd.DataFrame({"g": g, "d": d})
                 .drop_duplicates())  # re-dedup across batches
        g, d = pairs.g.to_numpy(), pairs.d.to_numpy(np.int64)
        ug, inv = np.unique(g, return_inverse=True)
        mind = np.full(len(ug), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mind, inv, d)
        nd, novel = np.unique(mind, return_counts=True)
        ud, cnt = np.unique(d, return_counts=True)
        docs = np.union1d(ud, nd)
        ngr = np.zeros(len(docs), dtype=np.int64)
        ngr[np.searchsorted(docs, ud)] = cnt
        nov = np.zeros(len(docs), dtype=np.int64)
        nov[np.searchsorted(docs, nd)] = novel
        return pa.table({"doc_id": pa.array(docs),
                         "n_grams": pa.array(ngr),
                         "n_novel": pa.array(nov)})

    tagged = (ds.select_columns([id_col, text_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ("doc_id", "n_grams", "n_novel")})
    out = (res.to_pandas().groupby("doc_id", as_index=False)
           .agg(n_grams=("n_grams", "sum"), n_novel=("n_novel", "sum")))
    return (out.astype({c: "int64" for c in out.columns})
            .sort_values("doc_id").reset_index(drop=True))


def token_epoch_drift(docs_ds, k: int = 100, text_col: str = "text",
                      id_col: str = "doc_id",
                      num_buckets: int = 64) -> pd.DataFrame:
    """TOKEN-DISTRIBUTION drift between two corpus epochs — the
    vocabulary-shift audit run before mixing a new crawl into a
    training set: epochs are the ``doc_id`` parity halves (the
    engine's epoch-pair convention, cf. ``histogram_drift``), and the
    output is every token in EITHER epoch's top-``k`` (by count DESC,
    token ASC — deterministic cutoff) with its exact count in both
    epochs, sorted by token.  Whitespace word contract; null text/id
    rows drop.  Columns: ``(token, cnt_even, cnt_odd)``.

    Scale shape: per-batch (token, c_even, c_odd) count partials; ONE
    token-keyed exchange sums them and emits each bucket's top-``k``
    per epoch (global top-k ⊆ union of per-bucket top-k because
    buckets partition tokens); the driver re-cut touches ≤
    2·k·buckets rows.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from .tokenize import _split_words

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[id_col])))
        empty = pa.table({"__b": pa.array([], pa.int64()),
                          "w": pa.array([], pa.string()),
                          "c0": pa.array([], pa.int64()),
                          "c1": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        words, parents, _ = _split_words(b, text_col)
        if not len(words):
            return empty
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ep = (ids[parents] % 2).astype(np.int64)
        uw, code = np.unique(words, return_inverse=True)
        c0 = np.bincount(code[ep == 0], minlength=len(uw)).astype(np.int64)
        c1 = np.bincount(code[ep == 1], minlength=len(uw)).astype(np.int64)
        h = md5_u64le(pa.array(uw, type=pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "w": pa.array(uw, type=pa.string()),
            "c0": pa.array(c0), "c1": pa.array(c1)})

    def resolve(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False).astype(object)
        c0 = t.column("c0").to_numpy(zero_copy_only=False)
        c1 = t.column("c1").to_numpy(zero_copy_only=False)
        uw, inv = np.unique(w, return_inverse=True)
        s0 = np.zeros(len(uw), dtype=np.int64)
        np.add.at(s0, inv, c0)
        s1 = np.zeros(len(uw), dtype=np.int64)
        np.add.at(s1, inv, c1)
        keep = np.zeros(len(uw), dtype=bool)
        for s in (s0, s1):  # bucket-local top-k per epoch
            order = np.lexsort((uw, -s))[:k]
            keep[order] = True
        return pa.table({"w": pa.array(uw[keep], type=pa.string()),
                         "c0": pa.array(s0[keep]),
                         "c1": pa.array(s1[keep])})

    tagged = (docs_ds.select_columns([id_col, text_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ("token", "cnt_even", "cnt_odd")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"token": pd.Series(dtype=object),
                             "cnt_even": pd.Series(dtype="int64"),
                             "cnt_odd": pd.Series(dtype="int64")})
    cand = res.to_pandas().rename(
        columns={"w": "token", "c0": "cnt_even", "c1": "cnt_odd"})
    keep = set()
    for c in ("cnt_even", "cnt_odd"):  # global deterministic re-cut
        top = cand.sort_values([c, "token"],
                               ascending=[False, True]).head(k)
        keep.update(top.token)
    out = cand[cand.token.isin(keep)]
    return (out.sort_values("token").reset_index(drop=True)
            .astype({"cnt_even": "int64", "cnt_odd": "int64"}))


def source_bigram_coverage(docs_ds, text_col: str = "text",
                           id_col: str = "doc_id",
                           source_col: str = "source",
                           num_buckets: int = 64) -> pd.DataFrame:
    """Inter-source BIGRAM coverage — the language-model-free fluency
    / redundancy question asked before mixing corpora ("how much of
    source B's text is phrasing source A already contains?"): for
    every ordered source pair (a ≠ b), ``n_covered`` = number of B's
    bigram TOKENS whose bigram TYPE occurs anywhere in A, plus
    ``n_bigrams_b`` = B's total bigram tokens (coverage ratio derives
    exactly).  Bigrams are adjacent whitespace words within a doc;
    null text/source/id rows drop; pairs with zero coverage are
    omitted.  Returns ``(source_a, source_b, n_bigrams_b, n_covered)``.

    Scale shape: batches emit (bigram, source, count) partials; ONE
    gram-keyed exchange holds each bigram's full source row, where
    coverage reduces to a presence-matrix × count-matrix product
    (sources² per bucket) — the driver sees only sources²-sized
    partials.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from .tokenize import _split_words

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b[text_col]),
                            pc.is_valid(b[source_col])),
                    pc.is_valid(b[id_col]))
        b = b.filter(m)
        empty = pa.table({"__b": pa.array([], pa.int64()),
                          "g": pa.array([], pa.string()),
                          "s": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        words, parents, _ = _split_words(b, text_col)
        if len(words) < 2:
            return empty
        src = pc.cast(b[source_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        same = parents[1:] == parents[:-1]
        gram = (words[:-1].astype(object) + " " + words[1:])[same]
        gsrc = src[parents[:-1][same]]
        df = (pd.DataFrame({"g": gram, "s": gsrc})
              .groupby(["g", "s"], as_index=False).size())
        h = md5_u64le(pa.array(df.g.to_numpy(), type=pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "g": pa.array(df.g.to_numpy(), type=pa.string()),
            "s": pa.array(df.s.to_numpy(), type=pa.string()),
            "cnt": pa.array(df["size"].to_numpy(np.int64))})

    def resolve(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False).astype(object)
        s = t.column("s").to_numpy(zero_copy_only=False).astype(object)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        ug, gi = np.unique(g, return_inverse=True)
        us, si = np.unique(s, return_inverse=True)
        M = np.zeros((len(ug), len(us)), dtype=np.int64)
        np.add.at(M, (gi, si), c)
        P = (M > 0).astype(np.int64)
        cov = P.T @ M  # cov[a, b] = B-tokens whose type A contains
        np.fill_diagonal(cov, 0)
        nb = M.sum(axis=0)
        ai, bi = np.nonzero(cov)
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(ai), np.int64),
                                   np.ones(len(us), np.int64)]),
            "a": pa.array(np.r_[us[ai], np.full(len(us), "",
                                                dtype=object)],
                          type=pa.string()),
            "b": pa.array(np.r_[us[bi], us], type=pa.string()),
            "v": pa.array(np.r_[cov[ai, bi], nb])})

    tagged = (docs_ds.select_columns([id_col, source_col, text_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ("source_a", "source_b", "n_bigrams_b", "n_covered")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({
            "source_a": pd.Series(dtype=object),
            "source_b": pd.Series(dtype=object),
            "n_bigrams_b": pd.Series(dtype="int64"),
            "n_covered": pd.Series(dtype="int64")})
    df = res.to_pandas()
    cov = (df[df.kind == 0].groupby(["a", "b"], as_index=False)
           ["v"].sum().rename(columns={"a": "source_a",
                                       "b": "source_b",
                                       "v": "n_covered"}))
    nb = (df[df.kind == 1].groupby("b", as_index=False)["v"].sum()
          .rename(columns={"b": "source_b", "v": "n_bigrams_b"}))
    out = cov.merge(nb, on="source_b")[list(cols)]
    return (out.sort_values(["source_a", "source_b"])
            .reset_index(drop=True)
            .astype({"n_bigrams_b": "int64", "n_covered": "int64"}))


def charclass_profile(ds, group_col: str = "source",
                      text_col: str = "text") -> pd.DataFrame:
    """Per-group CHARACTER-CLASS composition — the encoding/noise
    audit (a source suddenly full of digits or ALL-CAPS is scraped
    boilerplate or OCR junk): exact sums per group of total chars,
    ASCII digits ``[0-9]``, ASCII uppercase ``[A-Z]`` and spaces,
    plus the doc count.  Explicit ASCII classes only — locale-free,
    so the RE2 kernel and any SQL restatement agree byte-for-byte.
    Null text counts 0 chars; null group is its own group dropped
    here (SQL WHERE parity).  Returns ``(group, n_docs, n_chars,
    n_digit, n_upper, n_space)`` sorted by group.

    Scale shape: one streaming pass; the four class counts are
    vectorized ``pc.count_substring_regex`` kernels inside
    ``map_batches`` (no Python over rows), partials merge through the
    cardinality-guarded grouped_stats path (group-alphabet-sized).
    """
    import pyarrow.compute as pc

    from .analytics import grouped_stats

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_valid(b[group_col])
        b = b.select([group_col, text_col]).filter(m)
        txt = pc.fill_null(b[text_col], "")
        return pa.table({
            "grp": pc.cast(b[group_col], pa.string()),
            "__one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
            "n_digit": pc.cast(
                pc.count_substring_regex(txt, "[0-9]"), pa.int64()),
            "n_upper": pc.cast(
                pc.count_substring_regex(txt, "[A-Z]"), pa.int64()),
            "n_space": pc.cast(
                pc.count_substring_regex(txt, " "), pa.int64())})

    out = grouped_stats(
        ds.map_batches(partial, batch_format="pyarrow"), ["grp"],
        {"__one": ["sum"], "n_chars": ["sum"], "n_digit": ["sum"],
         "n_upper": ["sum"], "n_space": ["sum"]})
    out = out.rename(columns={
        "__one_sum": "n_docs", "n_chars_sum": "n_chars",
        "n_digit_sum": "n_digit", "n_upper_sum": "n_upper",
        "n_space_sum": "n_space"})
    cols = ["grp", "n_docs", "n_chars", "n_digit", "n_upper",
            "n_space"]
    return (out[cols].sort_values("grp").reset_index(drop=True)
            .astype({c: "int64" for c in cols[1:]}))


def hapax_by_source(ds, group_col: str = "source",
                    text_col: str = "text",
                    num_buckets: int = 64) -> pd.DataFrame:
    """Vocabulary-richness audit per source: distinct word TYPES the
    source uses and how many of them are corpus-global HAPAX
    LEGOMENA (exactly one occurrence anywhere — a hapax's source is
    unique by definition).  A scraped/duplicated source shows a low
    hapax share; a diverse source a high one.  Type identity is
    ``md5_number_upper(word)`` (the engine-wide 64-bit token
    contract — SQL oracles restate it exactly, and only 8-byte
    hashes ever shuffle).  Null group/text rows drop.  Returns
    ``(grp, n_types, n_hapax)`` sorted by grp.

    Scale shape: per-batch (hash, source) partial counts (map-side
    combine), ONE token-keyed exchange (a token's rows co-locate, so
    global counts and the hapax test are bucket-exact), per-bucket
    source-level partials — the driver merges source-alphabet-sized
    rows only.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[group_col]), pc.is_valid(b[text_col]))
        b = b.select([group_col, text_col]).filter(m)
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\s+"))
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(toks)
        h = md5_u64le(flat)
        src = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)[par]
        key = pd.DataFrame({"h": h, "s": src})
        agg = key.groupby(["h", "s"], as_index=False).size()
        hv = agg.h.to_numpy(np.uint64)
        return pa.table({
            "__b": pa.array((hv % np.uint64(num_buckets))
                            .astype(np.int64)),
            "h": pa.array(hv, pa.uint64()),
            "s": pa.array(agg.s.to_numpy(object), pa.string()),
            "c": pa.array(agg["size"].to_numpy(np.int64))})

    def resolve(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby(["h", "s"], as_index=False)
              ["c"].sum())
        gc = df.groupby("h")["c"].transform("sum")
        df["hapax"] = (gc == 1).astype(np.int64)
        out = (df.groupby("s", as_index=False)
               .agg(n_types=("h", "size"), n_hapax=("hapax", "sum")))
        return pa.Table.from_pandas(out, preserve_index=False)

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ["grp", "n_types", "n_hapax"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"grp": pd.Series(dtype=object),
                             "n_types": pd.Series(dtype="int64"),
                             "n_hapax": pd.Series(dtype="int64")})
    df = (res.to_pandas().groupby("s", as_index=False)
          [["n_types", "n_hapax"]].sum()
          .rename(columns={"s": "grp"}))
    return (df.sort_values("grp").reset_index(drop=True)
            .astype({"n_types": "int64", "n_hapax": "int64"}))


def wordlen_hist(ds, group_col: str = "lang",
                 text_col: str = "text") -> pd.DataFrame:
    """Per-group WORD-LENGTH histogram — the morphology fingerprint
    (languages and OCR noise have distinctive length profiles; a
    sudden mass at length 1 or 40+ is tokenization damage).  Words
    are the engine-wide whitespace-split contract.  Null group/text
    rows drop.  Returns ``(grp, wordlen, n)`` sorted.

    Scale shape: one streaming pass — per-batch (group, len) partial
    counts from vectorized flatten + utf8_length, merged through the
    cardinality-guarded grouped_stats path (alphabet × max-len rows).
    """
    import pyarrow.compute as pc

    from ..kernels import as_array
    from .analytics import grouped_stats

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[group_col]), pc.is_valid(b[text_col]))
        b = b.select([group_col, text_col]).filter(m)
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\s+"))
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        ln = pc.cast(pc.utf8_length(pc.list_flatten(toks)),
                     pa.int64()).to_numpy(zero_copy_only=False)
        grp = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)[par]
        df = (pd.DataFrame({"grp": grp, "wordlen": ln})
              .groupby(["grp", "wordlen"], as_index=False).size())
        return pa.table({
            "grp": pa.array(df.grp.to_numpy(object), pa.string()),
            "wordlen": pa.array(df.wordlen.to_numpy(np.int64)),
            "__one": pa.array(df["size"].to_numpy(np.int64))})

    out = grouped_stats(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["grp", "wordlen"], {"__one": ["sum"]}).rename(
            columns={"__one_sum": "n"})
    return (out.sort_values(["grp", "wordlen"]).reset_index(drop=True)
            .astype({"wordlen": "int64", "n": "int64"}))


def source_token_l1(ds, text_col: str = "text",
                    group_col: str = "source",
                    num_buckets: int = 32) -> pd.DataFrame:
    """Pairwise source-vocabulary L1 distance — for every source pair
    ``(s1 < s2)``, ``Σ_w |count_s1(w) − count_s2(w)|`` over the FULL
    word vocabulary (tokens a source lacks count 0): the exact
    total-variation-style "how differently do two sources speak"
    surface behind mixture weighting and domain balancing (the
    count-level sibling of ``source_token_jaccard``, which only sees
    presence sets).  Words are whitespace splits of ``trim(text)``
    (the `stopword_discovery` convention — an empty/whitespace text
    contributes one empty-string token on both engines).

    Scale shape: batches collapse to (word, source, n) partials
    map-side; ONE word-hashed exchange merges counts per word and
    folds each word's dense sources-vector into a sources²/2 pair
    partial (the GLOBAL source list is collected first — enum-sized —
    and broadcast into the merge closure, so a source absent from a
    bucket still contributes its zeros); the driver merges pair
    matrices.  Null text/source rows drop (restated in the SQL).
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def src_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[group_col]))
        return pa.table({"s": pc.cast(b[group_col], pa.string())})

    srcs = (ds.select_columns([group_col])
            .map_batches(src_part, batch_format="pyarrow")
            .to_pandas())
    sources = sorted(srcs.s.unique()) if len(srcs) else []
    k = len(sources)
    if k < 2:
        return pd.DataFrame({"s1": pd.Series(dtype=object),
                             "s2": pd.Series(dtype=object),
                             "l1": pd.Series(dtype="int64")})
    sidx = {s: i for i, s in enumerate(sources)}

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[text_col]),
                    pc.is_valid(b[group_col]))
        b = b.filter(m)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\s+")
        toks = as_array(toks)
        L = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        words = np.asarray(pc.list_flatten(toks).to_pylist(),
                           dtype=object)
        sv = np.asarray(b.column(group_col).to_pylist(),
                        dtype=object)
        si = np.array([sidx[s] for s in sv], dtype=np.int64)
        srep = np.repeat(si, L)
        uw, winv = np.unique(words, return_inverse=True)
        cell = winv * k + srep
        uc, cnt = np.unique(cell, return_counts=True)
        w_out = uw[uc // k]
        h = md5_u64le(pa.array(w_out, type=pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "w": pa.array(w_out, type=pa.string()),
            "si": pa.array((uc % k).astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64))})

    iu, ju = np.triu_indices(k, k=1)

    def resolve(t: pa.Table) -> pa.Table:
        w = np.asarray(t.column("w").to_pylist(), dtype=object)
        si = t.column("si").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        uw, winv = np.unique(w, return_inverse=True)
        mat = np.zeros((len(uw), k), dtype=np.int64)
        np.add.at(mat, (winv, si), n)
        l1 = np.abs(mat[:, iu] - mat[:, ju]).sum(axis=0)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "l1": pa.array(l1.astype(np.int64))})

    tagged = (ds.select_columns([text_col, group_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"s1": pd.Series(dtype=object),
                             "s2": pd.Series(dtype=object),
                             "l1": pd.Series(dtype="int64")})
    df = (res.to_pandas().groupby(["i", "j"], as_index=False)
          ["l1"].sum())
    out = pd.DataFrame({
        "s1": [sources[i] for i in df.i],
        "s2": [sources[j] for j in df.j],
        "l1": df.l1.astype("int64")})
    return (out.sort_values(["s1", "s2"]).reset_index(drop=True))


def token_rarity_histogram(ds, vocab_size: int = 1000,
                           band: int = 100) -> pd.DataFrame:
    """Per-document RARITY score census: each document reduces to the
    MEDIAN frequency-rank of its tokens (rank by global count DESC,
    word ASC — `tokenize.build_vocab`'s 1..K ids — with every
    out-of-vocab word pinned to rank K+1), then documents histogram
    per source by ``median_rank // band`` — the "is this source full
    of rare words?" tokenizer-fit surface.  Median is
    ``quantile_disc(0.5)`` (value at 1-based rank ``ceil(m/2)`` of the
    doc's sorted token ranks, duplicates counted).

    Scale shape: ONE vocab pass (block-local (word, count) partials,
    driver merge bounded by vocabulary); the top-K word→rank map
    broadcasts to a second streaming pass where each batch computes
    every document's median with one lexsort over (doc, rank) — the
    per-doc reduction never leaves the block, and only a
    sources × bands histogram reaches the driver.  Rows with null
    doc_id/text/source drop from BOTH passes (restated in the SQL).
    """
    import pyarrow.compute as pc

    from .tokenize import _split_words, build_vocab

    def keep(b: pa.Table) -> pa.Table:
        m = None
        for c in ("doc_id", "text", "source"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        return b.filter(m)

    base = ds.select_columns(["doc_id", "text", "source"]).map_batches(
        keep, batch_format="pyarrow")
    vocab = build_vocab(base, vocab_size)
    vw = np.asarray(vocab.column("word").to_pylist(), dtype=object)
    vid = vocab.column("id").to_numpy(zero_copy_only=False)
    order = np.argsort(vw)
    vw, vid = vw[order], vid[order]
    oov_rank = vocab_size + 1

    def part(b: pa.Table) -> pa.Table:
        words, parents, lens = _split_words(b, "text")
        if not len(words):
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "rarity_band": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64())})
        i = np.searchsorted(vw, words)
        ok = i < len(vw)
        i = np.minimum(i, max(0, len(vw) - 1))
        ok &= vw[i] == words
        ranks = np.where(ok, vid[i], oov_rank).astype(np.int64)
        o = np.lexsort((ranks, parents))
        pr, rr = parents[o], ranks[o]
        st = np.flatnonzero(np.r_[True, pr[1:] != pr[:-1]])
        m = np.diff(np.append(st, len(pr)))
        med = rr[st + (-(-m // 2) - 1)]  # ceil(m/2), 1-based -> idx
        doc_rows = pr[st]
        src = np.asarray(b.column("source").to_pylist(),
                         dtype=object)[doc_rows]
        bands = med // band
        us, sinv = np.unique(src, return_inverse=True)
        cell = sinv * 1_000_000 + bands
        uc, cnt = np.unique(cell, return_counts=True)
        return pa.table({
            "source": pa.array(us[uc // 1_000_000]),
            "rarity_band": pa.array((uc % 1_000_000)
                                    .astype(np.int64)),
            "n_docs": pa.array(cnt.astype(np.int64))})

    parts = base.map_batches(part, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"source": pd.Series(dtype=object),
                             "rarity_band": pd.Series(dtype="int64"),
                             "n_docs": pd.Series(dtype="int64")})
    out = (parts.groupby(["source", "rarity_band"], as_index=False)
           ["n_docs"].sum())
    return (out.sort_values(["source", "rarity_band"])
            .reset_index(drop=True)
            .astype({"rarity_band": "int64", "n_docs": "int64"}))


def source_token_simpson(seqs_ds, group_col: str = "source",
                         token_col: str = "tokens",
                         num_buckets: int = 32):
    """Per-slice VOCABULARY-CONCENTRATION census — "is a source's
    token mass spread across its vocabulary or collapsed onto a few
    tokens?" (the repetition/diversity audit behind mixture design):
    per slice, exact integers ``n_tokens = Σc``, ``n_distinct``,
    ``simpson_num = Σ c·(c−1)`` over per-token counts ``c``, plus
    ``rep_pm = floor(1000·simpson_num / (n_tokens·(n_tokens−1)))``
    (the Simpson collision index in permille — the probability two
    random token draws collide).

    Scale shape: batches pre-aggregate (token, slice) counts
    map-side, ONE token-keyed exchange finalizes each token's
    per-slice count exactly once, and each bucket emits per-slice
    (Σc, Σ1, Σc(c−1)) partials — slices-sized, never vocabulary-
    sized.  The permille division runs in Python ints on the driver
    (n² exceeds int64 at web scale).  Null-slice rows drop.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        empty = pa.table({"t": pa.array([], type=pa.int64()),
                          "g": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64()),
                          "bucket": pa.array([], type=pa.uint64())})
        if token_col not in b.column_names:
            return empty
        b = b.filter(pc.is_valid(b[group_col]))
        toks = b[token_col]
        toks = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        flat = pc.cast(pc.list_flatten(toks), pa.int64()).to_numpy(
            zero_copy_only=False)
        if not len(flat):
            return empty
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(str)[parents]
        order = np.lexsort((g, flat))
        ts, gs = flat[order], g[order]
        first = np.ones(len(ts), dtype=bool)
        first[1:] = (ts[1:] != ts[:-1]) | (gs[1:] != gs[:-1])
        start = np.flatnonzero(first)
        cnt = np.diff(np.append(start, len(ts))).astype(np.int64)
        ts, gs = ts[start], gs[start]
        import pandas as _pd
        h = _pd.util.hash_array(ts)
        return pa.table({
            "t": pa.array(ts), "g": pa.array(gs, type=pa.string()),
            "c": pa.array(cnt),
            "bucket": pa.array(h % np.uint64(num_buckets),
                               type=pa.uint64())})

    def bucket_fold(t: pa.Table) -> pa.Table:
        tk = t.column("t").to_numpy(zero_copy_only=False)
        g = t.column("g").to_numpy(zero_copy_only=False).astype(str)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((g, tk))
        tk, g, c = tk[order], g[order], c[order]
        first = np.ones(len(tk), dtype=bool)
        first[1:] = (tk[1:] != tk[:-1]) | (g[1:] != g[:-1])
        st = np.flatnonzero(first)
        cs = np.add.reduceat(c, st) if len(st) else \
            np.empty(0, np.int64)
        gs = g[st]
        su = np.unique(gs)
        idx = np.searchsorted(su, gs)
        n_tok = np.zeros(len(su), np.int64)
        np.add.at(n_tok, idx, cs)
        n_dis = np.bincount(idx, minlength=len(su)).astype(np.int64)
        simp = np.zeros(len(su), np.int64)
        np.add.at(simp, idx, cs * (cs - 1))
        return pa.table({"g": pa.array(su.astype(object),
                                       type=pa.string()),
                         "n_tokens": pa.array(n_tok),
                         "n_distinct": pa.array(n_dis),
                         "simpson_num": pa.array(simp)})

    out = grouped_exchange(seqs_ds.map_batches(tag,
                                               batch_format="pyarrow"),
                           "bucket", num_buckets, bucket_fold)
    cols = [group_col, "n_tokens", "n_distinct", "simpson_num",
            "rep_pm"]
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(
            dtype="string" if c == group_col else "int64")
            for c in cols})
    df = (out.to_pandas().groupby("g", as_index=False)
          [["n_tokens", "n_distinct", "simpson_num"]].sum())
    df["rep_pm"] = [
        1000 * int(s) // (int(n) * (int(n) - 1)) if n > 1 else 0
        for s, n in zip(df.simpson_num, df.n_tokens)]
    df = df.rename(columns={"g": group_col})
    return (df.sort_values(group_col).reset_index(drop=True)
            .astype({"n_tokens": "int64", "n_distinct": "int64",
                     "simpson_num": "int64", "rep_pm": "int64"}))
