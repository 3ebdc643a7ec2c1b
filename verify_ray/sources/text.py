"""CSV / JSON-lines sources (W6 extension).

The reference has no sources at all (values arrive in memory,
/root/reference/verify/examples/schemars_json.rs) — Parquet is the
engine's primary format (typed, prunable; sources/parquet.py).  These
readers let the same validation pipeline ingest delimited and JSONL
drops: Ray Data's native readers plus (a) the ``path`` lineage column
the engine's partition accounting expects and (b) optional dtype
coercion toward a spec (CSV/JSON types are inferred, so an int64
column can arrive as double — coercing where lossless keeps the K2
dtype check about REAL mismatches, not inference artifacts).

Scale note: both readers stream (one task per file / block) and
project nothing — CSV and JSON cannot prune columns at the read the
way Parquet does, which is exactly why Parquet is the recommended
format; these exist for ingest/edge pipelines.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _coerce_fn(expected: dict):
    def coerce(t: pa.Table) -> pa.Table:
        for name, want in expected.items():
            if name not in t.column_names:
                continue
            got = t.schema.field(name).type
            if got.equals(want):
                continue
            try:
                cast = pc.cast(t.column(name), want)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    pa.ArrowTypeError):
                continue  # leave as-is; the K2 dtype check will flag it
            t = t.set_column(t.column_names.index(name),
                             pa.field(name, want), cast)
        return t

    return coerce


def read_csv_with_lineage(files, spec_or_plan=None):
    """ray.data.read_csv + ``path`` lineage column; optional lossless
    dtype coercion toward a spec's declared column types."""
    import ray.data as rd

    ds = rd.read_csv(files, include_paths=True)
    return _maybe_coerce(ds, spec_or_plan)


def read_jsonl_with_lineage(files, spec_or_plan=None):
    """ray.data.read_json (JSON-lines) + ``path`` lineage column."""
    import ray.data as rd

    ds = rd.read_json(files, include_paths=True)
    return _maybe_coerce(ds, spec_or_plan)


def _maybe_coerce(ds, spec_or_plan):
    if spec_or_plan is None:
        return ds
    from ..engine import _as_plan

    plan = _as_plan(spec_or_plan)
    if not plan.expected_dtypes:
        return ds
    return ds.map_batches(_coerce_fn(dict(plan.expected_dtypes)),
                          batch_format="pyarrow")
