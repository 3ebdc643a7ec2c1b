"""ORC / Feather (Arrow IPC) sources (W6 extension).

The reference has no sources at all (values arrive in memory,
/root/reference/verify/examples/schemars_json.rs) — Parquet is the
engine's primary format (sources/parquet.py); these readers let the
same validation pipelines ingest the other two columnar interchange
formats that ship with pyarrow, with (a) the ``path`` lineage column
the engine's partition accounting expects, (b) COLUMN PROJECTION at
the read (both formats store columns separately, so unlike CSV/JSONL
the projection prunes real I/O), and (c) the same optional
dtype-coercion hook as the text sources.

Scale shape: Ray Data 2.49 has no native ORC/Feather reader, so the
fan-out is explicit — the stable SORTED file list becomes one block
per file (``from_items(..., override_num_blocks=len(files))``) and a
``map_batches`` task opens and decodes its file(s) with pyarrow.
One task per file is exactly parquet's per-file lineage unit; at real
scale the files themselves are the partition grain, and the streaming
executor pipelines decode with downstream stages.
"""

from __future__ import annotations

import pyarrow as pa


def _lineage_reader(read_fn, columns):
    def read(b: pa.Table) -> pa.Table:
        out = []
        for path in b.column("item").to_pylist():
            t = read_fn(path, columns)
            out.append(t.append_column(
                "path", pa.array([path] * t.num_rows,
                                 type=pa.string())))
        if not out:
            return pa.table({"path": pa.array([], type=pa.string())})
        return pa.concat_tables(out, promote_options="default")

    return read


def _read_orc_file(path: str, columns):
    from pyarrow import orc

    return orc.ORCFile(path).read(columns=columns)


def _read_feather_file(path: str, columns):
    import pyarrow.feather as feather

    return feather.read_table(path, columns=columns)


def _fan_out(files, read_fn, columns, spec_or_plan):
    import ray.data as rd

    from .text import _maybe_coerce

    files = sorted(files)
    if not files:
        raise ValueError("no input files")
    ds = rd.from_items(files, override_num_blocks=len(files))
    ds = ds.map_batches(_lineage_reader(read_fn, columns),
                        batch_format="pyarrow")
    return _maybe_coerce(ds, spec_or_plan)


def read_orc_with_lineage(files, columns=None, spec_or_plan=None):
    """ORC files → Dataset with a ``path`` lineage column.  ``columns``
    projects at the read (ORC stripes store columns separately)."""
    return _fan_out(files, _read_orc_file, columns, spec_or_plan)


def read_feather_with_lineage(files, columns=None, spec_or_plan=None):
    """Feather / Arrow-IPC files → Dataset with a ``path`` lineage
    column; ``columns`` projects at the read."""
    return _fan_out(files, _read_feather_file, columns, spec_or_plan)
