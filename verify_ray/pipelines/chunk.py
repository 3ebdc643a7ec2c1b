"""Sliding-window document chunking — split each document's word
sequence into overlapping fixed-size windows (context-window prep for
training / embedding: window=512, stride=384 style).

Chunk c of a doc with n words covers words [c·stride, c·stride+window)
clipped to n; chunks exist for every start < n, so a doc yields
ceil(n / stride) chunks and even an empty text yields its one
(single empty word) chunk — the same contract as SQL
``generate_series(1, len(ws), stride)``.

Fully streaming: one ``map_batches`` pass, no shuffle, output rows
carry (doc_id, chunk_id, n_words, chunk_text).  The entire batch is
chunked with numpy index arithmetic + one Arrow ``take`` and
``binary_join`` — no per-row Python.  At 100 TB this is the ideal
operator shape: embarrassingly parallel, output ~window/stride × the
input bytes, so size ``batch_size`` down if stride ≪ window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import as_array


def chunk_batch(b: pa.Table, window: int, stride: int,
                text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(b[text_col]), r"\s+"))
    words = as_array(pc.list_flatten(toks))
    nw = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    off = np.concatenate([[0], np.cumsum(nw)])
    n_chunks = (nw + stride - 1) // stride  # ≥ 1: split("") == [""]
    doc_rep = np.repeat(np.arange(len(nw)), n_chunks)
    chunk_first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    cidx = np.arange(len(doc_rep)) - np.repeat(chunk_first, n_chunks)
    starts = off[doc_rep] + cidx * stride
    lens = np.minimum(window, off[doc_rep] + nw[doc_rep] - starts)
    flat_first = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = (np.arange(int(lens.sum()))
           - np.repeat(flat_first, lens) + np.repeat(starts, lens))
    taken = words.take(pa.array(idx))
    offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]),
                       type=pa.int32())
    chunk_text = pc.binary_join(
        pa.ListArray.from_arrays(offsets, taken), " ")
    return pa.table({
        id_col: as_array(b[id_col]).take(pa.array(doc_rep)),
        "chunk_id": pa.array(cidx),
        "n_words": pa.array(lens),
        "chunk_text": chunk_text,
    })


def chunk_documents(ds, window: int = 32, stride: int = 24,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (doc_id, chunk_id, n_words, chunk_text) sliding
    windows; ``stride < window`` gives ``window - stride`` words of
    overlap between consecutive chunks."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    return ds.map_batches(
        lambda b: chunk_batch(b, window, stride, text_col, id_col),
        batch_format="pyarrow")


def cdc_chunk_batch(b: pa.Table, w: int, mod: int,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Content-defined chunking of one batch — see
    ``content_defined_chunks``."""
    from ..functions.hashing import md5_u64le

    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(b[text_col]), r"\s+"))
    words = as_array(pc.list_flatten(toks))
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    m = len(parents)
    # per-word id hash (the checksum unit; md5_number_upper % 50000)
    warr = words.to_numpy(zero_copy_only=False)
    if m:
        wu, winv = np.unique(warr, return_inverse=True)
        wid = (md5_u64le(pa.array(wu, type=pa.string())) %
               np.uint64(50_000)).astype(np.int64)[winv]
    else:
        wid = np.empty(0, np.int64)
    # boundary AFTER word e (global flat index) iff the w-gram ending
    # at e stays within the row and hashes to 0 mod `mod`
    brk = np.zeros(m + 1, dtype=np.int64)
    if m >= w:
        ok = parents[: m - w + 1] == parents[w - 1:]
        idx = np.nonzero(ok)[0]
        if len(idx):
            parts = [words.take(pa.array(idx + j)) for j in range(w)]
            grams = pc.binary_join_element_wise(*parts, " ")
            garr = grams.to_numpy(zero_copy_only=False)
            gu, ginv = np.unique(garr, return_inverse=True)
            gh = md5_u64le(pa.array(gu, type=pa.string()))[ginv]
            ends = idx + w - 1
            brk[ends + 1] = (gh % np.uint64(mod) == 0).astype(np.int64)
    # chunk id per word = boundaries strictly before it, reset per row
    cum = np.cumsum(brk[:-1])
    row_first = np.zeros(b.num_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=row_first[1:])
    chunk = cum - cum[row_first[parents]] if m else np.empty(0, np.int64)
    # aggregate (row, chunk) runs — contiguous by construction
    if m:
        change = np.ones(m, dtype=bool)
        change[1:] = (parents[1:] != parents[:-1]) | \
            (chunk[1:] != chunk[:-1])
        st = np.flatnonzero(change)
        n_words = np.diff(np.append(st, m))
        csum = np.add.reduceat(wid, st)
        ids = pc.cast(b[id_col], pa.string())
        return pa.table({
            "doc_id": as_array(ids).take(pa.array(parents[st])),
            "chunk_id": pa.array(chunk[st]),
            "n_words": pa.array(n_words.astype(np.int64)),
            "checksum": pa.array(csum),
        })
    return pa.table({"doc_id": pa.array([], type=pa.string()),
                     "chunk_id": pa.array([], type=pa.int64()),
                     "n_words": pa.array([], type=pa.int64()),
                     "checksum": pa.array([], type=pa.int64())})


def content_defined_chunks(ds, w: int = 4, mod: int = 16,
                           text_col: str = "text",
                           id_col: str = "doc_id"):
    """Content-defined chunking (the gear/Rabin CDC idea at word
    granularity): place a chunk boundary after word ``e`` whenever the
    hash of the ``w``-gram ending at ``e`` is ≡ 0 (mod ``mod``) —
    boundaries move WITH content, so an insertion early in a document
    only re-chunks its neighborhood (the property storage dedup and
    incremental-ingest pipelines rely on; expected chunk length ≈
    ``mod`` words).  Returns ``(doc_id, chunk_id, n_words, checksum)``
    per chunk, ``checksum`` = sum of per-word ``md5_u64le(word) %
    50000`` ids.  The gram hash is md5-u64le (DuckDB
    ``md5_number_upper`` parity), so boundaries — and therefore the
    whole layout — are SQL-reproducible, unlike a wrapping-multiply
    rolling hash.  One streaming pass, no shuffle.
    """
    return ds.map_batches(
        lambda b: cdc_chunk_batch(b, w, mod, text_col, id_col),
        batch_format="pyarrow")
