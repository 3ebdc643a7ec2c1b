"""Zone-map pruned reads: skip whole parquet FILES whose footer
min/max statistics cannot overlap the query range, before any data
byte leaves storage.

``read_parquet(columns=..., filter=...)`` already prunes ROW GROUPS
inside every file it opens (sources/parquet.py), but at 100 TB a
point/range lookup over a range-partitioned layout (e.g. the output
of ``pipelines.shuffle.sort_by_range`` + ``sinks.write_sharded``)
should not even LIST most shards into the read task graph: the zone
map — one (path, min, max, rows) row per file, read from parquet
footers only — selects the overlapping files driver-side, and only
those become read tasks.  This is the classic sorted-layout secondary
benefit: range predicates touch O(selectivity) files instead of all.

The exact row-level predicate is still pushed into the surviving
files' scan, so results are identical to an unpruned filtered read —
the zone map only removes files that provably contain no match.
"""

from __future__ import annotations

import os

import pyarrow.dataset as pads


def build_zone_map(root: str, key_col: str) -> list[dict]:
    """Per-file (path, min, max, rows) from parquet footers under
    ``root`` (recursive) — metadata-only, no data pages read.  Files
    lacking statistics for ``key_col`` get ``min=None`` and are never
    pruned (correctness over pruning).  Cost: one footer read per
    file; at many thousands of files, shard this over Ray tasks —
    here the manifest is driver-built (file count = shard count by
    layout construction)."""
    import pyarrow.parquet as pq

    entries = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, f)
            md = pq.ParquetFile(path).metadata
            names = {md.schema.column(i).name: i
                     for i in range(len(md.schema))}
            lo = hi = None
            ok = key_col in names
            if ok:
                ci = names[key_col]
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            entries.append({"path": path,
                            "min": lo if ok else None,
                            "max": hi if ok else None,
                            "rows": md.num_rows})
    return entries


def pruned_read(root: str, key_col: str, lo, hi,
                columns: list[str] | None = None,
                zone_map: list[dict] | None = None):
    """Range read ``lo <= key_col <= hi`` over a parquet layout with
    FILE-level zone-map pruning + row-level predicate pushdown in the
    surviving files.  Returns ``(ds, stats)`` where stats records
    ``files_total`` / ``files_read`` / ``rows_skipped_bound`` — the
    evidence the prune actually happened (asserted in tests).

    A file survives iff its [min, max] intersects [lo, hi] or it has
    no statistics (never prune blind).  Pass a prebuilt ``zone_map``
    to amortize the manifest across many lookups."""
    import ray.data as rd

    zm = zone_map if zone_map is not None else build_zone_map(root, key_col)
    keep, skipped_rows = [], 0
    for e in zm:
        if e["min"] is None or (e["max"] >= lo and e["min"] <= hi):
            keep.append(e["path"])
        else:
            skipped_rows += e["rows"]
    stats = {"files_total": len(zm), "files_read": len(keep),
             "rows_skipped_bound": skipped_rows}
    expr = (pads.field(key_col) >= lo) & (pads.field(key_col) <= hi)
    if not keep:
        # typed empty dataset with the requested projection
        import pyarrow.parquet as pq

        schema = pq.read_schema(zm[0]["path"]) if zm else None
        if schema is None:
            raise ValueError(f"no parquet files under {root!r}")
        if columns:
            schema = pads.dataset(zm[0]["path"]).schema
            import pyarrow as pa

            schema = pa.schema([(c, schema.field(c).type)
                                for c in columns])
        return rd.from_arrow(schema.empty_table()), stats
    ds = rd.read_parquet(keep, columns=columns, filter=expr)
    return ds, stats


def pruned_read_2d(root: str, x_pred: tuple, y_pred: tuple,
                   columns: list[str] | None = None,
                   zone_maps: tuple[list, list] | None = None):
    """2-D range read ``lo_x <= x <= hi_x AND lo_y <= y <= hi_y``
    with file pruning from TWO zone maps (one per column) — the read
    side of a Z-ordered layout (``shuffle.zorder_key``): only files
    whose [min,max] intersects BOTH ranges are opened; both row-level
    predicates push into the survivors.  ``x_pred`` / ``y_pred`` are
    ``(col, lo, hi)``.  Returns ``(ds, stats)`` like ``pruned_read``.
    """
    import ray.data as rd

    (cx, lox, hix), (cy, loy, hiy) = x_pred, y_pred
    zmx, zmy = (zone_maps if zone_maps is not None
                else (build_zone_map(root, cx),
                      build_zone_map(root, cy)))
    ok_x = {e["path"] for e in zmx
            if e["min"] is None or (e["max"] >= lox and e["min"] <= hix)}
    keep, skipped = [], 0
    for e in zmy:
        good_y = (e["min"] is None
                  or (e["max"] >= loy and e["min"] <= hiy))
        if good_y and e["path"] in ok_x:
            keep.append(e["path"])
        else:
            skipped += e["rows"]
    stats = {"files_total": len(zmy), "files_read": len(keep),
             "rows_skipped_bound": skipped}
    expr = ((pads.field(cx) >= lox) & (pads.field(cx) <= hix)
            & (pads.field(cy) >= loy) & (pads.field(cy) <= hiy))
    if not keep:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pq.read_schema(zmy[0]["path"])
        if columns:
            schema = pa.schema([(c, schema.field(c).type)
                                for c in columns])
        return rd.from_arrow(schema.empty_table()), stats
    return rd.read_parquet(keep, columns=columns, filter=expr), stats
