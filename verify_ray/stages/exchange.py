"""Generic sort-free hash exchange over a Dataset's Arrow blocks.

Ray Data's ``groupby(key).map_groups`` is sort-based: it pays a full
sort of every block plus seconds of fixed orchestration overhead per
run, while most grouped operators (LSH bucket resolution, per-user
sessionization, duplicate detection) only need hash CO-LOCATION, not
order.  This module provides the MapReduce-style alternative used
throughout the engine (first built for W1 in stages/unique.py):

    map task (per input block):  split rows by ``bucket % B``
    merge task (per bucket):     concat its pieces, run ``group_fn``

Partitioning assumptions (document per SURVEY §2.6): the caller's
``bucket`` column must already co-locate whatever must meet (all band
rows of one LSH bucket, all events of one user); ``num_buckets`` must
be sized so one bucket's rows fit a worker (grow it with the data —
see ``dedup._coarse_count``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def grouped_exchange(ds, bucket_col: str, num_buckets: int, group_fn,
                     drop_bucket: bool = True) -> pa.Table:
    """Apply ``group_fn(pa.Table) -> pa.Table`` to each hash bucket's
    rows; returns the concatenated results (driver-side — results are
    expected to be output-sized; stream-write inside group_fn for huge
    outputs).

    ``bucket_col`` must be an integer column; rows are routed by
    ``bucket % num_buckets``.
    """
    import ray

    B = int(num_buckets)

    @ray.remote(num_returns=B)
    def split_task(t: pa.Table):
        b = t.column(bucket_col).to_numpy(zero_copy_only=False)
        bk = (b.astype(np.uint64) % np.uint64(B)).astype(np.int64)
        out = []
        for i in range(B):
            sel = np.flatnonzero(bk == i)
            out.append(t.take(pa.array(sel)) if len(sel) else t.slice(0, 0))
        return tuple(out) if B > 1 else out[0]

    @ray.remote
    def merge_task(*pieces):
        t = pa.concat_tables(pieces, promote_options="default")
        if drop_bucket and bucket_col in t.column_names:
            t = t.drop_columns([bucket_col])
        if t.num_rows == 0:
            return None
        return group_fn(t)

    refs = [split_task.remote(block) for block in ds.to_arrow_refs()]
    if B == 1:
        refs = [[r] for r in refs]
    merged = [merge_task.remote(*[refs[m][b] for m in range(len(refs))])
              for b in range(B)]
    tables = [t for t in ray.get(merged) if t is not None and t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")
