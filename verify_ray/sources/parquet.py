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


def schema_fingerprint(schema) -> int:
    return hash(tuple(zip(schema.names, map(str, schema.types))))


def read_projected(files: list[str], schemas_by_pid: dict, columns: list[str],
                   include_paths: bool = True):
    """read_parquet with a projection over possibly HETEROGENEOUS files.

    Ray's reader rejects a ``columns`` list containing names absent from
    a file, so files are grouped by schema fingerprint, each group reads
    only the applicable subset of ``columns``, and the datasets union.
    The per-batch validator tolerates missing columns, so mixed-schema
    blocks flow through one pipeline.
    """
    import ray.data as rd

    by_fp: dict[int, list[int]] = {}
    for pid, sch in schemas_by_pid.items():
        by_fp.setdefault(schema_fingerprint(sch), []).append(pid)
    if len(by_fp) == 1:
        cols = [c for c in columns
                if c in next(iter(schemas_by_pid.values())).names]
        return rd.read_parquet(files, columns=cols or None,
                               include_paths=include_paths)
    parts = []
    for pids in by_fp.values():
        gfiles = [files[p] for p in sorted(pids)]
        names = set(schemas_by_pid[pids[0]].names)
        gcols = [c for c in columns if c in names]
        parts.append(rd.read_parquet(gfiles, columns=gcols or None,
                                     include_paths=include_paths))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


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


def read_evolved(path_or_paths, target: dict, renames: dict | None = None,
                 defaults: dict | None = None):
    """Schema-EVOLUTION reader: one logical schema over a directory
    whose files were written at different schema epochs (renamed
    columns, later-added columns) — the long-lived-corpus reality a
    100 TB lake always reaches.

    ``target`` maps logical column name → pyarrow dtype.  Per file:
    a logical column resolves to its physical name (itself, or any
    alias in ``renames`` = {old_physical: logical}); present columns
    cast to the target dtype, absent ones fill with
    ``defaults[col]`` (or null).  Planning touches FOOTERS only; files
    group by schema fingerprint and each group becomes ONE projected
    ``read_parquet`` (column-pruned to the group's physical names) +
    a vectorized rename/cast/fill map — so a 3-epoch lake costs 3
    scans-of-its-own-files, never a row of Python.

    Returns a ``ray.data.Dataset`` with exactly ``target``'s columns
    and dtypes, epochs unioned.
    """
    import pyarrow as pa
    import ray.data as rd

    renames = renames or {}
    defaults = defaults or {}
    files = list_input_files(path_or_paths)
    if not files:
        raise ValueError(f"no parquet files under {path_or_paths!r}")

    out_schema = pa.schema(list(target.items()))

    # group files by physical-schema fingerprint (footer-only)
    groups: dict[tuple, list[str]] = {}
    for f in files:
        phys = tuple(pq.read_schema(f).names)
        groups.setdefault(phys, []).append(f)

    parts = []
    for phys, fs in sorted(groups.items()):
        phys_set = set(phys)
        mapping = {}          # logical -> physical (present columns)
        for col in target:
            if col in phys_set:
                mapping[col] = col
            else:
                alias = [o for o, new in renames.items()
                         if new == col and o in phys_set]
                if alias:
                    mapping[col] = alias[0]

        def project(mapping=mapping):
            def f(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                n = b.num_rows
                cols = {}
                for col, dt in target.items():
                    if col in mapping:
                        cols[col] = pc.cast(b[mapping[col]], dt)
                    elif col in defaults:
                        cols[col] = pa.array([defaults[col]] * n, dt)
                    else:
                        cols[col] = pa.nulls(n, dt)
                return pa.table(cols).cast(out_schema)
            return f

        parts.append(rd.read_parquet(
            fs, columns=sorted(set(mapping.values()))
        ).map_batches(project(), batch_format="pyarrow"))

    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
