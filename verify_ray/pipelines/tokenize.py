"""documents → sequences: deterministic hash tokenization.

Produces exactly the BASELINE input_hint table shape
(doc_id:string, tokens:list<int32>, n_tok:int32, source:string) from
the ``documents`` testdata table, so the flagship validation pipeline
has a real Ray-native upstream.

Stateful actor-pool stage: the word→token-id cache lives in actor
state (built once, reused across batches); per batch only the UNIQUE
new words are hashed (np.unique + inverse), so the Python-level hash
loop touches a handful of strings per batch regardless of batch size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import as_array

VOCAB = 50_000


def word_token_id(word: str, vocab: int = VOCAB) -> int:
    """Deterministic token id: first 8 bytes of md5, mod vocab."""
    return int.from_bytes(hashlib.md5(word.encode("utf-8")).digest()[:8],
                          "big") % vocab


class Tokenizer:
    """Callable class for ``map_batches(Tokenizer, concurrency=N)``."""

    def __init__(self, vocab: int = VOCAB, text_col: str = "text",
                 id_col: str = "doc_id", source_col: str = "source"):
        self.vocab = vocab
        self.text_col, self.id_col, self.source_col = text_col, id_col, source_col
        self.cache: dict[str, int] = {}

    def _ids_for(self, words: np.ndarray) -> np.ndarray:
        uniq, inverse = np.unique(words, return_inverse=True)
        ids = np.empty(len(uniq), dtype=np.int32)
        cache = self.cache
        for i, w in enumerate(uniq.tolist()):
            t = cache.get(w)
            if t is None:
                t = word_token_id(w, self.vocab)
                cache[w] = t
            ids[i] = t
        return ids[inverse]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[self.text_col]), r"\s+")
        toks = as_array(toks)
        words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        token_ids = self._ids_for(words) if len(words) else np.empty(0, np.int32)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                          pa.array(token_ids, type=pa.int32()))
        return pa.table(
            {
                "doc_id": pc.cast(batch[self.id_col], pa.string()),
                "tokens": tokens,
                "n_tok": pa.array(lengths.astype(np.int32), type=pa.int32()),
                "source": pc.cast(batch[self.source_col], pa.string()),
            }
        )


def tokenize_documents(ds, vocab: int = VOCAB, concurrency=4, batch_size: int = 4096):
    """documents Dataset -> sequences Dataset (input_hint shape)."""
    return ds.map_batches(
        Tokenizer,
        fn_constructor_kwargs={"vocab": vocab},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def token_pair_topk(seqs_ds, k: int = 50, min_count: int = 1,
                    token_col: str = "tokens", num_buckets: int = 64):
    """Top-``k`` adjacent token pairs by corpus frequency — the merge-
    candidate scan at the heart of BPE vocabulary induction (Sennrich
    et al. 2016, "Neural Machine Translation of Rare Words with
    Subword Units": each merge step promotes the most frequent
    adjacent symbol pair).  One distributed scan = one BPE iteration's
    counting phase; callers re-run after applying a merge.

    Returns a pandas DataFrame ``(tok_a, tok_b, cnt)`` ordered by
    ``(cnt DESC, tok_a, tok_b)`` — a deterministic total order, so the
    k-cutoff is reproducible (SQL ``LIMIT k`` parity).

    Scale shape: per-batch partial counts (``np.unique`` over packed
    ``(a<<32)|b`` keys — map-side combine), reduced per key through
    the sort-free hash exchange; each merge task emits only its
    bucket-local top-``k`` (global top-k ⊆ union of per-bucket top-k,
    because every key aggregates in exactly one bucket), so the driver
    sees ≤ ``num_buckets × k`` rows.  Shuffle payload is
    ``(u64 key, int64 count)`` — vocabulary²-bounded, token-payload
    free.
    """
    from ..stages.exchange import grouped_exchange

    def partials(b: pa.Table) -> pa.Table:
        toks = as_array(b[token_col])
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pa.table({"h": pa.array([], type=pa.uint64()),
                          "c": pa.array([], type=pa.int64())})
        if len(parents) < 2:
            return empty
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ok = parents[:-1] == parents[1:]
        if not ok.any():
            return empty
        key = ((flat[:-1][ok] << 32) | flat[1:][ok]).astype(np.uint64)
        u, c = np.unique(key, return_counts=True)
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
        u, tot = u[keep], tot[keep]
        # bucket-local top-k by (cnt desc, key asc); key asc == (a, b)
        # asc because the pack is order-preserving for non-negative ids
        order = np.lexsort((u, -tot))[:k]
        return pa.table({"h": pa.array(u[order], type=pa.uint64()),
                         "c": pa.array(tot[order])})

    out = grouped_exchange(part_ds, "h", num_buckets, reduce_bucket,
                           drop_bucket=False)
    import pandas as pd

    if out is None or not out.num_rows:
        return pd.DataFrame({"tok_a": pd.Series([], dtype="int64"),
                             "tok_b": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    h = out.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
    c = out.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((h, -c))[:k]
    h, c = h[order], c[order]
    return pd.DataFrame({"tok_a": (h >> 32).astype(np.int64),
                         "tok_b": (h & 0xFFFFFFFF).astype(np.int64),
                         "cnt": c})


# ---------------------------------------------------------------------------
# learned vocabulary: global top-N words -> rank ids, OOV-aware encode


def _split_words(batch: pa.Table, text_col: str):
    """(flattened words ndarray, per-row parent indices, row lengths)
    under the repo's whitespace contract (SQL parity:
    ``regexp_split_to_array(trim(text), '\\s+')``)."""
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[text_col]), r"\s+"))
    words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return words, parents, lens


def build_vocab(ds, size: int, text_col: str = "text") -> pa.Table:
    """Frequency vocabulary: the global top-``size`` words ranked by
    (count DESC, word ASC) get ids 1..size; id 0 is reserved for OOV.
    Returns a (word, id, count) table.

    Scale shape: each block collapses to its own (word, count)
    partials map-side (``np.unique`` — corpus word REPETITION never
    leaves the block); the driver merge is bounded by the corpus
    VOCABULARY size, the standard assumption for word-level vocab
    builds (tens of millions of distinct words fit a driver; for
    unbounded keys use ``token_pair_topk``'s bucket-local-top-k
    exchange instead).
    """
    def partial(b: pa.Table) -> pa.Table:
        words, _, _ = _split_words(b, text_col)
        u, c = np.unique(words, return_counts=True)
        return pa.table({"word": pa.array(u, type=pa.string()),
                         "count": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("word", as_index=False)["count"].sum()
    w = agg.word.to_numpy(object)
    c = agg["count"].to_numpy(np.int64)
    order = np.lexsort((w, -c))[:size]  # count DESC, word ASC
    return pa.table({
        "word": pa.array(w[order], type=pa.string()),
        "id": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        "count": pa.array(c[order])})


def encode_with_vocab(ds, vocab: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Re-encode documents against a learned vocabulary: per document
    emit ``n_tok``, ``n_oov`` (words outside the vocab → id 0) and an
    order-sensitive integer ``checksum`` = Σ position·id (1-based) —
    the integer invariant that proves the full positional encoding
    without shipping list columns (same contract as pack_sequences).

    The vocab broadcasts once via ``ray.put``; the per-batch lookup is
    one ``np.searchsorted`` against the sorted word array (no Python
    loop, no per-batch re-ship).
    """
    import ray

    wsort = np.argsort(vocab.column("word").to_numpy(zero_copy_only=False))
    words_sorted = vocab.column("word").to_numpy(zero_copy_only=False)[wsort]
    ids_sorted = vocab.column("id").to_numpy(zero_copy_only=False)[wsort]
    vocab_ref = ray.put((words_sorted, ids_sorted))

    def encode(b: pa.Table) -> pa.Table:
        # null text rows are dropped (SQL WHERE text IS NOT NULL
        # parity) — a null's list length is NaN, and NaN -> int64
        # would poison the cumsum start offsets of every LATER row
        b = b.filter(pc.is_valid(b[text_col]))
        vw, vi = ray.get(vocab_ref)
        words, parents, lens = _split_words(b, text_col)
        from ..functions.lookup import sorted_lookup

        ids = np.zeros(len(words), dtype=np.int64)
        if len(words):
            hit, pos = sorted_lookup(vw, words)
            ids[hit] = vi[pos[hit]]
        # 1-based position within each row: global arange minus the
        # row's start offset
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        posn = np.arange(len(words), dtype=np.int64) - starts[parents] + 1
        checksum = np.zeros(b.num_rows, dtype=np.int64)
        np.add.at(checksum, parents, posn * ids)
        n_oov = np.zeros(b.num_rows, dtype=np.int64)
        np.add.at(n_oov, parents, (ids == 0).astype(np.int64))
        return pa.table({
            id_col: b[id_col],
            "n_tok": pa.array(lens),
            "n_oov": pa.array(n_oov),
            "checksum": pa.array(checksum)})

    return ds.map_batches(encode, batch_format="pyarrow")
