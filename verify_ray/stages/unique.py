"""W1 — global key uniqueness via a pre-aggregated shuffle.

Scale-up of the reference's within-array ``unique_items`` hash-dedup
(/root/reference/verify/src/impls/schemars/schema.rs:738-755,
``NotUnique`` errors.rs:119-122) from one array to a 10^12-row table.

Shuffle discipline (SURVEY §4): the raw rows are NEVER shuffled.  Each
batch first collapses to ``(key, cnt)`` partials via
``pyarrow.compute.value_counts`` — the shuffle then moves at most one
row per distinct key per batch, so a heavily duplicated (hot) key costs
one small row per batch instead of all its occurrences; this is the
skew handling: pre-aggregation IS the salt (batch identity is the
salt).  The small partials stream through
``groupby(key).aggregate(Sum)`` and only keys with total count > 1
surface as ``not_unique`` violations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import as_array

from ..errors import R, msg_not_unique


def _extract_key(t: pa.Table, column: str):
    """Key array for ``column``, path-aware: ``meta.x`` descends struct
    fields (the W1 key may be a nested field — M1/W1 composition)."""
    from ..kernels import _col

    return as_array(_col(t, column))


def _partial_counts(column: str):
    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(_extract_key(batch, column))
        values = vc.field("values")
        counts = vc.field("counts")
        # drop null keys — nullability is the non_null rule's business
        mask = pc.is_valid(values)
        return pa.table({column: values.filter(mask),
                         "cnt": pc.cast(counts.filter(mask), pa.int64())})

    return partial


def _bucket_of(keys_arr: pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic vectorized key->bucket (pandas siphash, C speed)."""
    import pandas as pd

    h = pd.util.hash_array(keys_arr.to_numpy(zero_copy_only=False))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def launch_duplicate_keys(file_groups: list[list[str]], column: str,
                          num_buckets: int, cnt_column: str | None = None,
                          where: tuple | None = None,
                          path_pids: dict[str, int] | None = None,
                          first_pid_column: str | None = None) -> list:
    """LAUNCH the duplicate-key hash exchange (non-blocking): returns
    per-bucket ObjectRefs for ``collect_duplicate_keys``.  Use
    ``find_duplicate_keys`` for the synchronous form.

    (key, cnt) of keys with global count > 1, via an explicit
    MapReduce-style hash exchange with raw Ray tasks.

    This is the one stage where we drop below the Dataset API: Ray
    Data's sort-based ``groupby().aggregate()`` costs seconds of fixed
    overhead per run and sorts ALL keys, while duplicate detection only
    needs hash co-location.  Shape:

      map task (per ≤files_per_task files): read ONLY the key column
        (+ optional pre-aggregated cnt), per-task value-count partials,
        split into ``num_buckets`` hash buckets → num_buckets returns;
      merge task (per bucket): concat its pieces, one C++ hash
        aggregate (pa.TableGroupBy), keep count > 1.

    Partitioning assumptions (documented per SURVEY §2.6): bucket =
    siphash(key) % B; B must be sized so total_keys/B fits a worker
    (B grows with the cluster); skew is absorbed by the per-task
    value-count pre-aggregation — a hot key contributes ≤1 row per map
    task regardless of its multiplicity.
    """
    import ray

    B = num_buckets

    @ray.remote(num_returns=B)
    def map_task(paths: list[str]):
        import pyarrow.parquet as _pq

        def read_for_key(p: str, extra: list[str]) -> pa.Table:
            """Read only the key's ROOT column (+ available extras):
            the key may be a nested path (``meta.x``), and files from
            older engine versions may lack optional columns — project
            by what the footer actually has, never crash on absence."""
            names = set(_pq.ParquetFile(p).schema_arrow.names)
            wanted = []
            for c in [column] + extra:
                root = c if c in names else c.split(".")[0]
                if root in names and root not in wanted:
                    wanted.append(root)
            return _pq.read_table(p, columns=wanted or None)

        per_file = path_pids is not None and not cnt_column
        if cnt_column:
            extra = [cnt_column] + ([first_pid_column] if first_pid_column else [])
            if where is not None:
                extra.append(where[0])
            t = pa.concat_tables([read_for_key(p, extra) for p in paths],
                                 promote_options="default")
            if where is not None:
                t = t.filter(pc.equal(t.column(where[0]), where[1]))
                t = t.drop_columns([where[0]])
            aggs = [(cnt_column, "sum")]
            if first_pid_column and first_pid_column in t.column_names:
                aggs.append((first_pid_column, "min"))
            g = t.group_by(column).aggregate(aggs)
            keys, cnts = g.column(column), g.column(f"{cnt_column}_sum")
            firsts = (g.column(f"{first_pid_column}_min")
                      if len(aggs) > 1 else None)
            if firsts is not None:
                mask = pc.is_valid(keys)
                keys = keys.filter(mask)
                cnts, firsts = cnts.filter(mask), firsts.filter(mask)
        elif per_file:
            # track the FIRST-seen input partition per key (min pid) for
            # the NotUnique{first, duplicate} span pair
            # (errors.rs:119-122): per-file value_counts tagged with the
            # file's pid.  The per-file partials ship straight to the
            # buckets (a key appears at most files-per-task times per
            # map task) — re-aggregating here would hash every key a
            # second time for almost no row reduction
            pieces = []
            for p in paths:
                ft = read_for_key(p, [])
                fvc = pc.value_counts(_extract_key(ft, column))
                fk = fvc.field("values")
                fc = pc.cast(fvc.field("counts"), pa.int64())
                m = pc.is_valid(fk)
                fk, fc = fk.filter(m), fc.filter(m)
                # unknown lineage -> null pid (NOT -1: Arrow's min
                # aggregate skips nulls, so a real pid still wins, and
                # an all-unknown key yields a null first_span instead of
                # the bogus 'partition=-1')
                pid = path_pids.get(p)
                pieces.append(pa.table({
                    column: fk, "cnt": fc,
                    "first_pid": pa.array([pid] * len(fk), type=pa.int32()),
                }))
            agg = pa.concat_tables(pieces).combine_chunks()
            keys = agg.column(column)
            cnts, firsts = agg.column("cnt"), agg.column("first_pid")
        else:
            t = pa.concat_tables([read_for_key(p, []) for p in paths],
                                 promote_options="default")
            vc = pc.value_counts(_extract_key(t, column))
            keys, cnts = vc.field("values"), pc.cast(vc.field("counts"), pa.int64())
            firsts = None
        if firsts is None:
            mask = pc.is_valid(keys)
            keys, cnts = keys.filter(mask), cnts.filter(mask)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        part = (pa.table({column: keys, "cnt": cnts, "first_pid": firsts})
                if firsts is not None else pa.table({column: keys, "cnt": cnts}))
        bk = _bucket_of(keys, B)
        out = []
        for b in range(B):
            sel = np.flatnonzero(bk == b)
            out.append(part.take(pa.array(sel)) if len(sel) else part.slice(0, 0))
        return tuple(out) if B > 1 else out[0]

    @ray.remote
    def merge_task(*pieces):
        t = pa.concat_tables(pieces)
        if t.num_rows == 0:
            return t
        aggs = [("cnt", "sum")]
        if "first_pid" in t.column_names:
            aggs.append(("first_pid", "min"))
        g = t.group_by(column).aggregate(aggs)
        dup = g.filter(pc.greater(g.column("cnt_sum"), 1))
        out = {column: dup.column(column), "cnt": dup.column("cnt_sum")}
        if "first_pid" in t.column_names:
            out["first_pid"] = dup.column("first_pid_min")
        return pa.table(out)

    refs = [map_task.remote(grp) for grp in file_groups]
    if B == 1:
        refs = [[r] for r in refs]
    merged = [merge_task.remote(*[refs[m][b] for m in range(len(refs))])
              for b in range(B)]
    return merged


def find_duplicate_keys(file_groups: list[list[str]], column: str,
                        num_buckets: int, **kw) -> pa.Table:
    """Synchronous launch + collect (see launch_duplicate_keys)."""
    return collect_duplicate_keys(
        launch_duplicate_keys(file_groups, column, num_buckets, **kw), column)


def collect_duplicate_keys(merged, column: str) -> pa.Table:
    """Block on a ``find_duplicate_keys`` launch and concat the per-
    bucket results.  Split from the launch so callers can overlap the
    exchange with other independent pipeline stages (engine.validate
    runs it concurrently with the narrow kernel pass)."""
    import ray

    tables = [t for t in ray.get(merged) if t.num_rows]
    if not tables:
        return pa.table({column: pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    return pa.concat_tables(tables)


def dup_table_to_violations(dups: pa.Table, column: str) -> pa.Table:
    keys = pc.cast(dups.column(column), pa.string())
    n = dups.num_rows
    msg = msg_not_unique()
    # first_span carries the first-seen input partition when the
    # exchange tracked it — the W1 half of NotUnique{first, duplicate}
    if "first_pid" in dups.column_names:
        first = pa.array(
            [f"partition={p}" if p is not None else None
             for p in dups.column("first_pid").to_pylist()],
            type=pa.string())
    else:
        first = pa.nulls(n, pa.string())
    return pa.table(
        {
            "doc_id": keys,
            "rule_id": pa.array([R.NOT_UNIQUE] * n, type=pa.string()),
            "span": pa.array([column] * n, type=pa.string()),
            "first_span": first,
            "message": pa.array(
                [f"{msg} ({c} occurrences)"
                 for c in dups.column("cnt").to_pylist()], type=pa.string()),
            "partition_id": pa.array(np.full(n, -1, dtype=np.int32)),
        }
    )


def launch_unique_violations_from_files(files: list[str], column: str,
                                        num_buckets: int | None = None,
                                        files_per_task: int | None = None,
                                        path_pids: dict[str, int] | None = None
                                        ) -> list:
    """Non-blocking launch of the file-set uniqueness exchange; finish
    with ``collect_duplicate_keys`` + ``dup_table_to_violations``."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_buckets is None:
        num_buckets = max(4, min(64, cpus))
    if files_per_task is None:
        # ~2 map tasks per CPU so the scan saturates the cluster
        files_per_task = max(1, len(files) // (2 * cpus))
    groups = [files[i:i + files_per_task]
              for i in range(0, len(files), files_per_task)]
    return launch_duplicate_keys(groups, column, num_buckets,
                                 path_pids=path_pids)


def unique_violations_from_files(files: list[str], column: str,
                                 num_buckets: int | None = None,
                                 files_per_task: int | None = None,
                                 path_pids: dict[str, int] | None = None
                                 ) -> pa.Table:
    """not_unique violations for a parquet file set (fast exchange)."""
    merged = launch_unique_violations_from_files(
        files, column, num_buckets, files_per_task, path_pids)
    return dup_table_to_violations(
        collect_duplicate_keys(merged, column), column)


def unique_violations(ds, column: str, batch_size: int = 65536):
    """Dataset of not_unique violation rows (one per duplicated key).
    ``column`` may be a nested path (``meta.x``) — the projection keeps
    its root column."""
    from ray.data.aggregate import Sum

    root = column.split(".")[0] if column not in ds.schema().names else column
    partials = ds.select_columns([root]).map_batches(
        _partial_counts(column), batch_format="pyarrow", batch_size=batch_size
    )
    totals = partials.groupby(column).aggregate(Sum("cnt", alias_name="cnt"))

    def to_violations(t: pa.Table) -> pa.Table:
        dup = t.filter(pc.greater(t.column("cnt"), 1))
        keys = pc.cast(dup.column(column), pa.string())
        n = dup.num_rows
        cnts = dup.column("cnt").to_pylist()
        msg = msg_not_unique()
        return pa.table(
            {
                "doc_id": keys,
                "rule_id": pa.array([R.NOT_UNIQUE] * n, type=pa.string()),
                "span": pa.array([column] * n, type=pa.string()),
                # no lineage in the Dataset-groupby path -> no first span
                "first_span": pa.nulls(n, pa.string()),
                "message": pa.array(
                    [f"{msg} ({c} occurrences)" for c in cnts], type=pa.string()
                ),
                "partition_id": pa.array(np.full(n, -1, dtype=np.int32)),
            }
        )

    return totals.map_batches(to_violations, batch_format="pyarrow")
