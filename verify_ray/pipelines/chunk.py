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
