"""Bloom-index pruned reads: skip whole parquet FILES that provably
contain none of the looked-up keys — the point-lookup sibling of the
zone map (``sources/zonemap.py``).

Zone maps prune by VALUE RANGE, so they only help when the layout is
(roughly) sorted by the lookup column.  A Bloom index prunes POINT
lookups on a column the layout is NOT organized by — the
Delta/Hudi-style file-skipping index: per file, a small bit array
built from the column's distinct values; a lookup reads only the
files whose filter says "maybe present".  False positives cost an
extra file read, never a wrong row: the exact ``IN`` predicate is
still pushed into every surviving file's scan, so results are
identical to an unpruned filtered read (the oracle states exactly
that; prune counts are pinned engine-side in tests).

Cost model at 100 TB: the BUILD reads each file's key column once
(column-pruned scan, one Ray task per file, no shuffle) and keeps
``bits_per_key/8`` bytes per row — e.g. 2 B/key at the default — so
the index for a 10⁹-row shard set is driver/manifest-sized and is
amortized over every subsequent lookup.  Hashing follows the repo's
md5 contract (``md5_u64le`` + Kirsch-Mitzenmacher double hashing,
``contamination.bloom_bits_from_hashes``), so filters built by
different engines agree bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


def _list_parquet(root: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(dirpath, f))
    return out


def _key_hashes(col) -> np.ndarray:
    """Distinct md5 u64 hashes of a key column (string form — the
    repo-wide cross-engine hash contract)."""
    from ..functions.hashing import md5_u64le

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.string()).drop_null()
    if not len(col):
        return np.empty(0, np.uint64)
    return np.unique(md5_u64le(pc.unique(col)))


def build_bloom_index(root: str, key_col: str,
                      bits_per_key: int = 16, k: int = 4
                      ) -> list[dict]:
    """Per-file Bloom filters over ``key_col`` for every parquet file
    under ``root``: one Ray task per file, each reading ONLY the key
    column.  Returns ``[{path, rows, m_bits, k, bits}]`` with ``bits``
    a packed uint8 array (``np.packbits`` layout)."""
    import ray

    from ..pipelines.contamination import (bloom_bits_from_hashes,
                                           bloom_m_bits)

    @ray.remote
    def file_filter(path: str) -> dict:
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=[key_col])
        h = _key_hashes(t.column(key_col))
        m_bits = bloom_m_bits(len(h), bits_per_key)
        bits = bloom_bits_from_hashes(h, m_bits, k)
        return {"path": path, "rows": t.num_rows, "m_bits": m_bits,
                "k": k, "bits": np.packbits(bits)}

    paths = _list_parquet(root)
    if not paths:
        raise ValueError(f"no parquet files under {root!r}")
    return ray.get([file_filter.remote(p) for p in paths])


def _maybe_contains(entry: dict, key_hashes: np.ndarray) -> bool:
    """True iff ANY key's k bloom positions are all set in the file's
    filter."""
    bits = np.unpackbits(entry["bits"])[: entry["m_bits"]]
    h1 = (key_hashes & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = (key_hashes >> np.uint64(32)).astype(np.int64)
    hit = np.ones(len(key_hashes), dtype=bool)
    for j in range(entry["k"]):
        hit &= bits[(h1 + j * h2) % entry["m_bits"]].astype(bool)
    return bool(hit.any())


def bloom_pruned_read(root: str, key_col: str, keys: list,
                      columns: list[str] | None = None,
                      index: list[dict] | None = None):
    """Point lookup ``key_col IN keys`` with FILE-level Bloom pruning
    + exact row-level pushdown in the surviving files.  Returns
    ``(ds, stats)`` with ``files_total`` / ``files_read`` /
    ``rows_skipped_bound`` — the evidence the prune happened.  Pass a
    prebuilt ``index`` to amortize across lookups."""
    import ray.data as rd

    idx = index if index is not None else build_bloom_index(root, key_col)
    kh = _key_hashes(pa.array([str(x) for x in keys]))
    keep, skipped = [], 0
    for e in idx:
        if _maybe_contains(e, kh):
            keep.append(e["path"])
        else:
            skipped += e["rows"]
    stats = {"files_total": len(idx), "files_read": len(keep),
             "rows_skipped_bound": skipped}
    if not keep:
        import pyarrow.parquet as pq

        schema = pq.read_schema(idx[0]["path"])
        if columns:
            schema = pa.schema([(c, schema.field(c).type)
                                for c in columns])
        return rd.from_arrow(schema.empty_table()), stats
    expr = pads.field(key_col).isin(keys)
    return rd.read_parquet(keep, columns=columns, filter=expr), stats
