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

from ..errors import R, msg_not_unique


def _partial_counts(column: str):
    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        vc = pc.value_counts(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        values = vc.field("values")
        counts = vc.field("counts")
        # drop null keys — nullability is the non_null rule's business
        mask = pc.is_valid(values)
        return pa.table({column: values.filter(mask),
                         "cnt": pc.cast(counts.filter(mask), pa.int64())})

    return partial


def unique_violations(ds, column: str, batch_size: int = 65536):
    """Dataset of not_unique violation rows (one per duplicated key)."""
    from ray.data.aggregate import Sum

    partials = ds.select_columns([column]).map_batches(
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
                "message": pa.array(
                    [f"{msg} ({c} occurrences)" for c in cnts], type=pa.string()
                ),
                "partition_id": pa.array(np.full(n, -1, dtype=np.int32)),
            }
        )

    return totals.map_batches(to_violations, batch_format="pyarrow")
