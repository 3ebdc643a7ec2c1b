"""Parquet source with partition lineage.

The reference has no sources (values come from memory,
/root/reference/verify/examples/schemars_json.rs) — this is the W6
scale-up (SURVEY §2.6): inputs are Parquet files; the *file* is the
partition/lineage unit.  ``partition_id`` derives from stable sorted
file order, never from execution order, so verdicts and checkpoints are
lineage-addressable (SURVEY §4).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq


def list_input_files(path_or_paths) -> list[str]:
    """Expand dir / glob / list into a STABLE sorted file list."""
    if isinstance(path_or_paths, str):
        paths = [path_or_paths]
    else:
        paths = list(path_or_paths)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
        elif any(ch in p for ch in "*?["):
            files.extend(glob.glob(p))
        else:
            files.append(p)
    return sorted(set(files))


def partition_map(files: list[str]) -> dict[str, int]:
    """path -> partition_id (position in the stable sorted order)."""
    return {f: i for i, f in enumerate(files)}


def scan_inputs(files: list[str]) -> tuple[dict[int, int], dict[int, "pq.lib.Schema"]]:
    """One footer-metadata pass over the inputs: (partition_id -> n_rows,
    partition_id -> schema).  No data pages are read; schemas are usually
    identical so the dict is tiny after dedup by the caller."""
    counts: dict[int, int] = {}
    schemas: dict[int, object] = {}
    for i, f in enumerate(files):
        pf = pq.ParquetFile(f)
        counts[i] = pf.metadata.num_rows
        schemas[i] = pf.schema_arrow
    return counts, schemas


def partition_row_counts(files: list[str]) -> dict[int, int]:
    """partition_id -> row count, from Parquet footer metadata only —
    no data pages are read (cheap even for very many files; at real
    scale this loop can itself be a Ray task fan-out)."""
    return {i: pq.read_metadata(f).num_rows for i, f in enumerate(files)}


def union_schema(schemas) -> "pq.lib.Schema":
    """Union of field names across (possibly heterogeneous) per-file
    schemas; first occurrence wins the type.  Projection / pattern-column
    resolution must use this, not schemas[0], or columns present only in
    later files would silently skip their checks."""
    import pyarrow as pa

    fields = {}
    for s in (schemas.values() if isinstance(schemas, dict) else schemas):
        for f in s:
            fields.setdefault(f.name, f)
    return pa.schema(list(fields.values()))


def read_with_lineage(files: list[str], columns: list[str] | None = None,
                      concurrency: int | None = None):
    """ray.data.read_parquet with a ``path`` column for lineage.

    Column pruning: pass ``columns`` so only needed columns leave
    storage (prune-at-the-read rule).
    """
    import ray.data as rd

    return rd.read_parquet(
        files,
        columns=columns,
        include_paths=True,
        concurrency=concurrency,
    )
