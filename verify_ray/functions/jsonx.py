"""Vectorized JSON field extraction from string columns.

Event logs and training metadata routinely carry a JSON payload column
(the testdata's ``events.props``); turning selected fields into typed
columns is the first ingest step before any validation or analytics
can touch them.  A per-row ``json.loads`` loop is the classic 100-TB
hot-path mistake, so extraction runs at C speed through the same
embedded per-worker DuckDB connection as the md5 kernels
(``hashing._duck_query``) — which also makes SQL-oracle parity hold BY
CONSTRUCTION: the engine executes literally the oracle's expression
``CAST(json_extract(TRY_CAST(t AS JSON), path) AS BIGINT)`` /
``json_extract_string``.

Semantics (DuckDB JSON rules, kept deliberately):
- malformed JSON and NULL input yield NULL (TRY_CAST absorbs parse
  errors instead of failing the batch);
- a missing path yields NULL;
- int extraction CASTs the JSON value, so ``{"k": "9"}`` yields 9
  (JSON-typed CAST, not strict typing) and non-numeric values yield
  NULL.

The pure-Python fallback (no duckdb) mirrors those rules for simple
``$.a.b`` paths.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import _duck_query


def _as_string_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    return col


def _py_extract(col: pa.Array, path: str):
    """Fallback: resolve a simple ``$.a.b`` path per row."""
    keys = [k for k in path.lstrip("$").split(".") if k]
    out = []
    for t in col.to_pylist():
        v = None
        if t is not None:
            try:
                v = json.loads(t)
                for k in keys:
                    v = v.get(k) if isinstance(v, dict) else None
            except (ValueError, AttributeError):
                v = None
        out.append(v)
    return out


def _sql_path(path: str) -> str:
    return "'" + path.replace("'", "''") + "'"


def json_extract_int64(col, path: str) -> pa.Array:
    """Int64 value at ``path`` per row (null on malformed/missing/
    non-numeric)."""
    col = _as_string_array(col)
    try:
        import duckdb  # noqa: F401
    except ImportError:
        import math

        def cast(v):
            # DuckDB CAST-to-BIGINT rules: bool -> 0/1; float rounds
            # HALF AWAY FROM ZERO (1.5 -> 2); numeric strings parse;
            # anything else -> NULL
            if isinstance(v, bool):
                return int(v)
            if isinstance(v, int):
                return v
            if isinstance(v, float):
                return int(math.floor(v + 0.5)) if v >= 0 \
                    else int(math.ceil(v - 0.5))
            if isinstance(v, str) and re.fullmatch(r"-?\d+", v):
                return int(v)
            return None

        return pa.array([cast(v) for v in _py_extract(col, path)],
                        type=pa.int64())
    kt = pa.table({"t": col})
    return (_duck_query(
        f"SELECT TRY_CAST(json_extract(TRY_CAST(t AS JSON), "
        f"{_sql_path(path)}) AS BIGINT) AS v FROM kt", kt)
        .column("v").combine_chunks())


def json_extract_string(col, path: str) -> pa.Array:
    """String value at ``path`` per row (null on malformed/missing;
    non-string scalars are rendered as their JSON text, DuckDB
    ``json_extract_string`` semantics)."""
    col = _as_string_array(col)
    try:
        import duckdb  # noqa: F401
    except ImportError:
        vals = []
        for v in _py_extract(col, path):
            if v is None:
                vals.append(None)
            elif isinstance(v, str):
                vals.append(v)
            elif isinstance(v, bool):
                vals.append("true" if v else "false")
            elif isinstance(v, (dict, list)):
                vals.append(json.dumps(v, separators=(",", ":")))
            else:
                vals.append(json.dumps(v))
        return pa.array(vals, type=pa.string())
    kt = pa.table({"t": col})
    return (_duck_query(
        f"SELECT json_extract_string(TRY_CAST(t AS JSON), "
        f"{_sql_path(path)}) AS v FROM kt", kt)
        .column("v").combine_chunks())


def parse_json_fields(ds, col: str,
                      int_fields: dict[str, str] | None = None,
                      str_fields: dict[str, str] | None = None):
    """Dataset with one typed column appended per requested field
    (``{out_col: json_path}``) — a streaming map_batches stage, zero
    shuffle; the JSON source column stays untouched."""
    int_fields = int_fields or {}
    str_fields = str_fields or {}

    def extract(b: pa.Table) -> pa.Table:
        src = b[col]
        for out_col, path in int_fields.items():
            b = b.append_column(out_col, json_extract_int64(src, path))
        for out_col, path in str_fields.items():
            b = b.append_column(out_col, json_extract_string(src, path))
        return b

    return ds.map_batches(extract, batch_format="pyarrow")
