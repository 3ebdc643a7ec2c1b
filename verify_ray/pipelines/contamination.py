"""Benchmark decontamination and inter-document boilerplate n-gram
frequency — the two cross-document n-gram operators a training-data
pipeline runs besides near-dup dedup:

- ``decontaminate``: flag training documents sharing any word n-gram
  (n=8 by convention, e.g. GPT-3 appendix C / PaLM decontamination)
  with a held-out benchmark set.  The benchmark gram set is SMALL by
  definition (eval suites are tiny next to the corpus), so it is
  broadcast once via ``ray.put`` and each batch does one sorted-array
  ``np.searchsorted`` membership pass — no shuffle at all; the 100 TB
  side streams.

- ``common_ngram_stats``: per-gram document frequency (how many
  distinct docs contain each 3-gram), used for boilerplate detection
  (RefinedWeb / C4-style "repeated spans across the corpus").  Doc
  frequency is computed with map-side distinct partials (a doc lives
  in exactly one batch, so per-batch distinct counts sum to the global
  doc frequency) through the sort-free hash exchange, then the
  ≥min_docs survivor set — output-sized, boilerplate grams are rare by
  construction at a high threshold — is broadcast back for the per-doc
  counting pass.  Shuffle payload is (u64 gram hash, int32 count),
  never gram strings.

Gram identity is the first-8-bytes-little-endian md5 of the
space-joined gram string (``functions.hashing.md5_u64le`` — DuckDB
``md5_number_upper`` parity), so SQL oracles reproduce membership
exactly; a 64-bit collision over ~10^6 distinct grams has probability
~10^-7 and the corpus is fixed, so oracle equality is stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le
from ..kernels import as_array


def _doc_gram_hashes(batch: pa.Table, n: int, text_col: str):
    """Per-row DISTINCT word-n-gram hashes.

    Returns ``(row_idx, gram_hash)`` — both np arrays, one entry per
    distinct (row, gram) pair — plus ``n_grams`` (distinct-gram count
    per row).  Vectorized: Arrow split/flatten, element-wise join for
    gram strings, md5 over the batch's UNIQUE grams only.
    Docs shorter than n words contribute no grams (SQL mirrors with an
    empty list comprehension).
    """
    n_rows = batch.num_rows
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[text_col]), r"\s+"))
    words = as_array(pc.list_flatten(toks))
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    m = len(parents)
    empty = (np.empty(0, np.int64), np.empty(0, np.uint64),
             np.zeros(n_rows, np.int64))
    if m < n:
        return empty
    ok = parents[: m - n + 1] == parents[n - 1:]
    idx = np.nonzero(ok)[0]
    if not len(idx):
        return empty
    parts = [words.take(pa.array(idx + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    gdoc = parents[idx]
    garr = grams.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(garr, return_inverse=True)
    gh = md5_u64le(pa.array(uniq, type=pa.string()))[inv]
    # distinct (row, hash) pairs
    order = np.lexsort((gh, gdoc))
    gdoc, gh = gdoc[order], gh[order]
    keep = np.ones(len(gdoc), dtype=bool)
    keep[1:] = (gdoc[1:] != gdoc[:-1]) | (gh[1:] != gh[:-1])
    gdoc, gh = gdoc[keep], gh[keep]
    n_grams = np.zeros(n_rows, dtype=np.int64)
    np.add.at(n_grams, gdoc, 1)
    return gdoc, gh, n_grams


def benchmark_gram_set(bench_ds, n: int = 8, text_col: str = "text") -> np.ndarray:
    """Distinct gram hashes of the benchmark set as a SORTED uint64
    array (driver-side — the benchmark is small by definition)."""
    import ray

    def per_batch(b: pa.Table) -> pa.Table:
        _, gh, _ = _doc_gram_hashes(b, n, text_col)
        return pa.table({"h": pa.array(np.unique(gh), type=pa.uint64())})

    parts = ray.get(bench_ds.map_batches(
        per_batch, batch_format="pyarrow").to_arrow_refs())
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    allh = pa.concat_tables(parts).column("h").to_numpy(zero_copy_only=False)
    return np.unique(allh.astype(np.uint64))


def decontaminate(docs_ds, bench_ds, n: int = 8, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Flag documents sharing ≥1 distinct word-n-gram with the
    benchmark set.  Returns a Dataset of
    ``(doc_id, n_grams, n_overlap)`` for flagged docs only
    (``n_overlap`` = count of the doc's distinct grams present in the
    benchmark).  The benchmark grams are broadcast once; the corpus
    side is a single streaming membership pass.
    """
    import ray

    bench_ref = ray.put(benchmark_gram_set(bench_ds, n, text_col))

    def flag(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        gdoc, gh, n_grams = _doc_gram_hashes(b, n, text_col)
        n_overlap = np.zeros(b.num_rows, dtype=np.int64)
        if len(gh) and len(bench):
            pos = np.searchsorted(bench, gh)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == gh
            np.add.at(n_overlap, gdoc[hit], 1)
        mask = n_overlap > 0
        return pa.table({
            id_col: as_array(b[id_col]).filter(pa.array(mask)),
            "n_grams": pa.array(n_grams[mask]),
            "n_overlap": pa.array(n_overlap[mask]),
        })

    return docs_ds.map_batches(flag, batch_format="pyarrow")


def bloom_bits_from_hashes(hashes: np.ndarray, m_bits: int,
                           k: int = 4) -> np.ndarray:
    """Bloom bit array (bool[m_bits]) for a set of uint64 gram hashes.
    Positions by Kirsch-Mitzenmacher double hashing over the md5 u64:
    ``pos_j = (h mod 2^32 + j · (h div 2^32)) mod m_bits`` — pure
    integer, < 2^35, so the SQL oracle reproduces every bit."""
    h1 = (hashes & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = (hashes >> np.uint64(32)).astype(np.int64)
    bits = np.zeros(m_bits, dtype=bool)
    for j in range(k):
        bits[(h1 + j * h2) % m_bits] = True
    return bits


def bloom_m_bits(n_items: int, bits_per_item: int = 16) -> int:
    """Deterministic filter sizing (restated in the oracle)."""
    return max(1024, bits_per_item * n_items)


def bloom_decontaminate(docs_ds, bench_ds, n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        bits_per_item: int = 16, k: int = 4):
    """``decontaminate`` with a BLOOM-FILTER membership broadcast —
    the 100 TB form when even the benchmark gram set strains a
    broadcast: the exact set costs 8 B/gram; the filter costs
    ``bits_per_item/8`` B/gram (2 B at the default, ~0.24% false-
    positive rate at k=4) and, unlike the exact array's binary search,
    probes in O(k).  False positives only FLAG extra docs (decontam
    errs on the safe side); they are deterministic (md5 double
    hashing), so the SQL oracle reproduces the exact flagged set,
    false positives included.

    Same output contract as ``decontaminate``: a Dataset of
    ``(doc_id, n_grams, n_overlap)`` for flagged docs, where
    ``n_overlap`` counts the doc's distinct grams whose k positions
    are all set.
    """
    import ray

    bench = benchmark_gram_set(bench_ds, n, text_col)
    m_bits = bloom_m_bits(len(bench), bits_per_item)
    bits_ref = ray.put(bloom_bits_from_hashes(bench, m_bits, k))

    def flag(b: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        gdoc, gh, n_grams = _doc_gram_hashes(b, n, text_col)
        n_overlap = np.zeros(b.num_rows, dtype=np.int64)
        if len(gh):
            h1 = (gh & np.uint64(0xFFFFFFFF)).astype(np.int64)
            h2 = (gh >> np.uint64(32)).astype(np.int64)
            ok = np.ones(len(gh), dtype=bool)
            for j in range(k):
                ok &= bits[(h1 + j * h2) % m_bits]
            np.add.at(n_overlap, gdoc[ok], 1)
        mask = n_overlap > 0
        return pa.table({
            id_col: as_array(b[id_col]).filter(pa.array(mask)),
            "n_grams": pa.array(n_grams[mask]),
            "n_overlap": pa.array(n_overlap[mask]),
        })

    return docs_ds.map_batches(flag, batch_format="pyarrow")


def boilerplate_gram_set(docs_ds, n: int = 3, min_docs: int = 20,
                         text_col: str = "text",
                         num_buckets: int = 64) -> np.ndarray:
    """SORTED uint64 hashes of grams appearing in ≥ min_docs distinct
    documents.  Map-side distinct partials (per-batch distinct-doc
    counts per gram) summed per gram through the hash exchange; only
    the survivor set — output-sized at a boilerplate-grade threshold —
    returns to the driver."""
    from ..stages.exchange import grouped_exchange

    def partials(b: pa.Table) -> pa.Table:
        _, gh, _ = _doc_gram_hashes(b, n, text_col)
        u, c = np.unique(gh, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.uint64()),
                         "c": pa.array(c.astype(np.int64))})

    part_ds = docs_ds.map_batches(partials, batch_format="pyarrow")

    def reduce_bucket(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = t.column("c").to_numpy(zero_copy_only=False)
        u, inv = np.unique(h, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, inv, c)
        keep = tot >= min_docs
        return pa.table({"h": pa.array(u[keep], type=pa.uint64())})

    out = grouped_exchange(part_ds, "h", num_buckets, reduce_bucket,
                           drop_bucket=False)
    if out is None or not out.num_rows:
        return np.empty(0, dtype=np.uint64)
    return np.sort(out.column("h").to_numpy(
        zero_copy_only=False).astype(np.uint64))


def common_ngram_stats(docs_ds, n: int = 3, min_docs: int = 20,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Per-document boilerplate exposure: ``(doc_id, n_grams,
    n_boiler)`` over ALL docs, where ``n_boiler`` counts the doc's
    distinct n-grams whose corpus document-frequency ≥ min_docs.

    Two passes over the corpus: the df exchange fully executes before
    the membership pass starts (sequential consumers — no concurrent
    actor-pool starvation, so no materialize needed; parquet-backed
    inputs re-scan with column pruning)."""
    import ray

    boiler_ref = ray.put(boilerplate_gram_set(
        docs_ds, n, min_docs, text_col))

    def stats(b: pa.Table) -> pa.Table:
        boiler = ray.get(boiler_ref)
        gdoc, gh, n_grams = _doc_gram_hashes(b, n, text_col)
        n_boiler = np.zeros(b.num_rows, dtype=np.int64)
        if len(gh) and len(boiler):
            pos = np.searchsorted(boiler, gh)
            pos[pos == len(boiler)] = 0
            hit = boiler[pos] == gh
            np.add.at(n_boiler, gdoc[hit], 1)
        return pa.table({
            id_col: b[id_col],
            "n_grams": pa.array(n_grams),
            "n_boiler": pa.array(n_boiler),
        })

    return docs_ds.map_batches(stats, batch_format="pyarrow")


def source_overlap(docs_ds, n: int = 3, text_col: str = "text",
                   group_col: str = "source", num_buckets: int = 64):
    """Cross-source leakage matrix: for every pair of sources, the
    number of DISTINCT word-n-grams present in both — the corpus-QA
    view that catches one source republishing another (mirror sites,
    syndication, benchmark text leaking into a crawl slice).

    Scale shape: per-batch distinct ``(source, gram-hash)`` pairs go
    through the gram-keyed hash exchange (payload: u64 + dictionary-
    encoded source, never gram strings); each merge task dedups its
    grams' (gram, source) rows and expands per-gram source pairs with
    the cached-triu pattern (``dedup._bucket_pair_indices``), emitting
    partial per-pair counts.  Driver data is source-pair-sized
    (|sources|² rows at most).  Gram identity is the md5-u64le hash —
    same collision-odds contract as the other gram operators here.
    """
    import pandas as pd

    from .dedup import _bucket_pair_indices
    from ..stages.exchange import grouped_exchange

    def partials(b: pa.Table) -> pa.Table:
        gdoc, gh, _ = _doc_gram_hashes(b, n, text_col)
        src = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False)
        s_per = src[gdoc].astype(object)
        if not len(gh):
            return pa.table({"h": pa.array([], type=pa.uint64()),
                             "src": pa.array([], type=pa.string())})
        order = np.lexsort((s_per, gh))
        hs, ss = gh[order], s_per[order]
        keep = np.ones(len(hs), dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
        return pa.table({"h": pa.array(hs[keep], type=pa.uint64()),
                         "src": pa.array(ss[keep], type=pa.string())})

    part_ds = docs_ds.map_batches(partials, batch_format="pyarrow")

    def per_gram(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        src = t.column("src").to_numpy(zero_copy_only=False).astype(object)
        if not len(h):
            return pa.table({"src_a": pa.array([], type=pa.string()),
                             "src_b": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        order = np.lexsort((src, h))
        h, src = h[order], src[order]
        keep = np.ones(len(h), dtype=bool)
        keep[1:] = (h[1:] != h[:-1]) | (src[1:] != src[:-1])
        h, src = h[keep], src[keep]
        ia, ib = _bucket_pair_indices(h)
        if not len(ia):
            return pa.table({"src_a": pa.array([], type=pa.string()),
                             "src_b": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        df = pd.DataFrame({"src_a": src[ia], "src_b": src[ib]})
        agg = df.groupby(["src_a", "src_b"], as_index=False).size()
        return pa.table({"src_a": pa.array(agg.src_a, type=pa.string()),
                         "src_b": pa.array(agg.src_b, type=pa.string()),
                         "c": pa.array(agg["size"].to_numpy(np.int64))})

    out = grouped_exchange(part_ds, "h", num_buckets, per_gram,
                           drop_bucket=False)
    if out is None or not out.num_rows:
        return pd.DataFrame({"src_a": pd.Series([], dtype=object),
                             "src_b": pd.Series([], dtype=object),
                             "n_shared": pd.Series([], dtype="int64")})
    df = (out.to_pandas().groupby(["src_a", "src_b"], as_index=False)["c"]
          .sum().rename(columns={"c": "n_shared"}))
    return (df.sort_values(["src_a", "src_b"]).reset_index(drop=True)
            .astype({"n_shared": "int64"}))


def source_jaccard(seqs_ds, group_col: str = "source",
                   token_col: str = "tokens",
                   num_buckets: int = 32):
    """Exact pairwise token-SET Jaccard between corpus slices
    (sources, shards, epochs) — the vocabulary-overlap audit behind
    mixture design and leak triage, as integers: one row per slice
    pair with ``n_common = |A ∩ B|`` and ``n_union = |A ∪ B|``
    (callers divide; no float leaves the engine).

    Scale shape: each batch flattens to DISTINCT (token, slice) pairs
    map-side, ONE token-keyed hash exchange co-locates each token's
    slice set (global dedup happens in the bucket, so per-slice
    distinct-token counts sum exactly from bucket partials), and each
    bucket enumerates canonical slice pairs per token with the
    repeat/arange pattern — the driver sees slice-pair partials only
    (slices² rows), never tokens.  Slice pairs sharing no token are
    omitted.  Rows with a null slice drop; null tokens cannot occur
    (list flatten).
    """
    import pandas as pd

    from ..stages.exchange import grouped_exchange

    SEP = "\x1f"

    def tag(b: pa.Table) -> pa.Table:
        empty = pa.table({"t": pa.array([], type=pa.int64()),
                          "g": pa.array([], type=pa.string()),
                          "bucket": pa.array([], type=pa.uint64())})
        if token_col not in b.column_names:
            return empty
        b = b.filter(pc.is_valid(b[group_col]))
        toks = as_array(b[token_col])
        flat = pc.cast(as_array(pc.list_flatten(toks)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        if not len(flat):
            return empty
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(str)[parents]
        order = np.lexsort((g, flat))
        ts, gs = flat[order], g[order]
        keep = np.ones(len(ts), dtype=bool)
        keep[1:] = (ts[1:] != ts[:-1]) | (gs[1:] != gs[:-1])
        ts, gs = ts[keep], gs[keep]
        import pandas as _pd
        h = _pd.util.hash_array(ts)
        return pa.table({
            "t": pa.array(ts), "g": pa.array(gs, type=pa.string()),
            "bucket": pa.array(h % np.uint64(num_buckets),
                               type=pa.uint64())})

    def bucket_pairs(t: pa.Table) -> pa.Table:
        tk = t.column("t").to_numpy(zero_copy_only=False)
        g = t.column("g").to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((g, tk))
        ts, gs = tk[order], g[order]
        keep = np.ones(len(ts), dtype=bool)
        keep[1:] = (ts[1:] != ts[:-1]) | (gs[1:] != gs[:-1])
        ts, gs = ts[keep], gs[keep]
        # per-slice distinct-token counts (exact: token-keyed routing
        # means each (token, slice) deduped exactly once, here)
        su, sc = np.unique(gs, return_counts=True)
        # canonical slice pairs per token (gs sorted within each ts)
        first = np.ones(len(ts), dtype=bool)
        first[1:] = ts[1:] != ts[:-1]
        start = np.flatnonzero(first)
        cnt = np.diff(np.append(start, len(ts)))
        cnt_row = np.repeat(cnt, cnt)
        pos = np.arange(len(ts)) - np.repeat(start, cnt)
        n_after = cnt_row - 1 - pos
        total = int(n_after.sum())
        if total:
            a_idx = np.repeat(np.arange(len(ts)), n_after)
            csum = np.concatenate(([0], np.cumsum(n_after)))
            b_idx = a_idx + 1 + (np.arange(total) - csum[a_idx])
            pair_key = np.char.add(np.char.add(gs[a_idx], SEP), gs[b_idx])
            pu, pn = np.unique(pair_key, return_counts=True)
        else:
            pu = np.empty(0, dtype=str)
            pn = np.empty(0, dtype=np.int64)
        return pa.table({
            "kind": pa.array(["s"] * len(su) + ["p"] * len(pu)),
            "key": pa.array(np.concatenate((su, pu)).astype(object),
                            type=pa.string()),
            "cnt": pa.array(np.concatenate((sc, pn)).astype(np.int64))})

    out = grouped_exchange(seqs_ds.map_batches(tag, batch_format="pyarrow"),
                           "bucket", num_buckets, bucket_pairs)
    cols = ["source_a", "source_b", "n_common", "n_union"]
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64" if c.startswith("n")
                                          else "string") for c in cols})
    df = (out.to_pandas().groupby(["kind", "key"], as_index=False)["cnt"]
          .sum())
    sizes = dict(zip(df[df.kind == "s"].key, df[df.kind == "s"].cnt))
    pairs = df[df.kind == "p"]
    ab = pairs.key.str.split(SEP, expand=True)
    res = pd.DataFrame({
        "source_a": ab[0], "source_b": ab[1],
        "n_common": pairs.cnt.to_numpy(np.int64)})
    res["n_union"] = (res.source_a.map(sizes).to_numpy(np.int64)
                      + res.source_b.map(sizes).to_numpy(np.int64)
                      - res.n_common)
    return (res.sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


def source_weighted_jaccard(seqs_ds, group_col: str = "source",
                            token_col: str = "tokens",
                            num_buckets: int = 32):
    """Exact pairwise WEIGHTED (multiset) token Jaccard between
    corpus slices: per pair ``sum_min = Σ_w min(c_a, c_b)`` and
    ``sum_max = Σ_w max(c_a, c_b)`` over token counts — the
    frequency-aware twin of :func:`source_jaccard` (set overlap can
    look high while the token MASS barely overlaps, and vice versa).
    Uses the identity ``Σ max = T_a + T_b - Σ min`` so only common
    tokens are ever enumerated.

    Scale shape: each batch pre-aggregates (token, slice) COUNTS
    map-side, ONE token-keyed hash exchange co-locates all partials
    for a token (so bucket-finalized counts are exact), each bucket
    emits per-slice token totals plus per-pair Σmin partials via the
    repeat/arange pair enumeration — the driver sees slice totals +
    pair partials only (slices² rows), never tokens.  Null-slice rows
    drop; all canonical pairs of observed slices are returned (pairs
    sharing no token get ``sum_min = 0``).

    Returns ``source_a, source_b, sum_min, sum_max, wjac_pm``
    (``floor(1000 * sum_min / sum_max)``; 0 when ``sum_max == 0``).
    """
    import pandas as pd

    from ..stages.exchange import grouped_exchange

    SEP = "\x1f"

    def tag(b: pa.Table) -> pa.Table:
        empty = pa.table({"t": pa.array([], type=pa.int64()),
                          "g": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64()),
                          "bucket": pa.array([], type=pa.uint64())})
        if token_col not in b.column_names:
            return empty
        b = b.filter(pc.is_valid(b[group_col]))
        toks = as_array(b[token_col])
        flat = pc.cast(as_array(pc.list_flatten(toks)),
                       pa.int64()).to_numpy(zero_copy_only=False)
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

    def bucket_pairs(t: pa.Table) -> pa.Table:
        tk = t.column("t").to_numpy(zero_copy_only=False)
        g = t.column("g").to_numpy(zero_copy_only=False).astype(str)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((g, tk))
        tk, g, c = tk[order], g[order], c[order]
        # finalize (token, slice) counts: sum adjacent partials
        first = np.ones(len(tk), dtype=bool)
        first[1:] = (tk[1:] != tk[:-1]) | (g[1:] != g[:-1])
        st = np.flatnonzero(first)
        cs = np.add.reduceat(c, st) if len(st) else np.empty(0, np.int64)
        ts, gs = tk[st], g[st]
        # per-slice token-mass totals (exact within this bucket)
        su = np.unique(gs)
        sc = np.zeros(len(su), np.int64)
        np.add.at(sc, np.searchsorted(su, gs), cs)
        # canonical slice pairs per token, contributing min(c_a, c_b)
        tfirst = np.ones(len(ts), dtype=bool)
        tfirst[1:] = ts[1:] != ts[:-1]
        tstart = np.flatnonzero(tfirst)
        tcnt = np.diff(np.append(tstart, len(ts)))
        cnt_row = np.repeat(tcnt, tcnt)
        pos = np.arange(len(ts)) - np.repeat(tstart, tcnt)
        n_after = cnt_row - 1 - pos
        total = int(n_after.sum())
        if total:
            a_idx = np.repeat(np.arange(len(ts)), n_after)
            csum = np.concatenate(([0], np.cumsum(n_after)))
            b_idx = a_idx + 1 + (np.arange(total) - csum[a_idx])
            pair_key = np.char.add(np.char.add(gs[a_idx], SEP),
                                   gs[b_idx])
            m = np.minimum(cs[a_idx], cs[b_idx]).astype(np.int64)
            pu, inv = np.unique(pair_key, return_inverse=True)
            pm = np.zeros(len(pu), np.int64)
            np.add.at(pm, inv, m)
        else:
            pu = np.empty(0, dtype=str)
            pm = np.empty(0, dtype=np.int64)
        return pa.table({
            "kind": pa.array(["s"] * len(su) + ["p"] * len(pu)),
            "key": pa.array(np.concatenate((su, pu)).astype(object),
                            type=pa.string()),
            "cnt": pa.array(np.concatenate((sc, pm)).astype(np.int64))})

    out = grouped_exchange(seqs_ds.map_batches(tag, batch_format="pyarrow"),
                           "bucket", num_buckets, bucket_pairs)
    cols = ["source_a", "source_b", "sum_min", "sum_max", "wjac_pm"]
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(
            dtype="int64" if c != "source_a" and c != "source_b"
            else "string") for c in cols})
    df = (out.to_pandas().groupby(["kind", "key"], as_index=False)["cnt"]
          .sum())
    totals = dict(zip(df[df.kind == "s"].key, df[df.kind == "s"].cnt))
    pairs = df[df.kind == "p"]
    mins = {}
    if len(pairs):
        ab = pairs.key.str.split(SEP, expand=True)
        mins = dict(zip(zip(ab[0], ab[1]),
                        pairs.cnt.to_numpy(np.int64)))
    srcs = sorted(totals)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            smin = int(mins.get((a, b), 0))
            smax = int(totals[a]) + int(totals[b]) - smin
            rows.append((a, b, smin, smax,
                         1000 * smin // smax if smax else 0))
    return pd.DataFrame(rows, columns=cols)
