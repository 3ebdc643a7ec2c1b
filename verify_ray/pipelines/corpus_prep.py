"""End-to-end training-corpus preparation — the composition a real
LLM-data pipeline runs as one streaming job, built entirely from this
repo's operators:

    raw docs
      → quality filter   (distinct-word floor; streaming batch filter)
      → exact dedup      (min-id winner per content hash;
                          dedup.exact_dedup — broadcast or join regime)
      → decontaminate    (drop docs sharing any word-8-gram with a
                          benchmark set; contamination.benchmark_gram_set
                          broadcast + one membership pass)
      → chunk            (fixed word windows; chunk.chunk_batch)

Every stage is a streaming ``map_batches`` pass over Arrow batches —
the only shuffle in the whole pipeline is exact-dedup's (id, md5)
group-by, and the only broadcasts are the winner-id set and the
benchmark gram set (both small sides by construction).  At 100 TB the
stage order matters: quality filtering first cuts the dedup shuffle's
input; dedup before decontamination avoids re-checking duplicate
bytes; chunking last only touches survivors.

The whole composition is SQL-expressible, so the driver checks the
complete pipeline against ONE DuckDB oracle (filter → window-dedup →
list_intersect decontamination → generate_series chunking).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import as_array
from .chunk import chunk_batch
from .contamination import _doc_gram_hashes, benchmark_gram_set
from .dedup import exact_dedup


def _distinct_word_filter(ds, min_distinct: int, text_col: str):
    """Keep rows whose distinct-whitespace-word count >= min_distinct
    (quality_score_batch's n_distinct feature, inlined as a filter so
    the full feature table is never built)."""

    def filt(b: pa.Table) -> pa.Table:
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), r"\s+"))
        # distinct words per row: flatten + unique codes per parent
        words = as_array(pc.list_flatten(toks))
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        warr = words.to_numpy(zero_copy_only=False)
        nd = np.zeros(b.num_rows, dtype=np.int64)
        if len(warr):
            _, inv = np.unique(warr, return_inverse=True)
            pairs = np.unique(parents * (inv.max() + 1) + inv)
            np.add.at(nd, pairs // (inv.max() + 1), 1)
        return b.filter(pa.array(nd >= min_distinct))

    return ds.map_batches(filt, batch_format="pyarrow")


def corpus_prep(docs_ds, bench_ds, min_distinct: int = 40,
                ngram: int = 8, window: int = 64, stride: int = 64,
                text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (doc_id, chunk_id, n_words, chunk_text) — the
    chunked, clean training corpus."""
    import ray

    filtered = _distinct_word_filter(docs_ds, min_distinct, text_col)
    deduped = exact_dedup(filtered, content_col=text_col, id_col=id_col)
    bench_ref = ray.put(benchmark_gram_set(bench_ds, ngram, text_col))

    def decont_and_chunk(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        gdoc, gh, _ = _doc_gram_hashes(b, ngram, text_col)
        hitrow = np.zeros(b.num_rows, dtype=bool)
        if len(gh) and len(bench):
            pos = np.searchsorted(bench, gh)
            pos[pos == len(bench)] = 0
            np.add.at(hitrow, gdoc[bench[pos] == gh], True)
        clean = b.filter(pa.array(~hitrow))
        return chunk_batch(clean, window, stride, text_col, id_col)

    return deduped.map_batches(decont_and_chunk, batch_format="pyarrow")
