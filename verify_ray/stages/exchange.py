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

import os

import numpy as np
import pyarrow as pa


# above this many map-block × bucket object refs, the flat exchange's
# O(M×B) ref fan-out starts to stress GCS/driver bookkeeping — switch
# to the two-level tree (O(M×√B + B) refs) automatically
TREE_REF_THRESHOLD = 65_536


def _split_by(t: pa.Table, bk: np.ndarray, n: int):
    out = []
    for i in range(n):
        sel = np.flatnonzero(bk == i)
        out.append(t.take(pa.array(sel)) if len(sel) else t.slice(0, 0))
    return out


class HotBucketError(ValueError):
    """One hash bucket exceeded ``max_bucket_rows`` — a pathological hot
    key (one user with 10^9 events, a degenerate LSH band) landed every
    row in a single merge task.  Remedies, in order: raise
    ``num_buckets`` (helps only if the bucket held MULTIPLE keys); salt
    the hot key across sub-buckets if the group_fn can merge partials
    (see ``joins.salted_join``); or pre-aggregate per input block before
    the exchange so only partials shuffle (see ``stages/unique.py``)."""


def _exchange_refs(ds, bucket_col: str, num_buckets: int, group_fn,
                   drop_bucket: bool, empty_result,
                   two_level: bool | None = None,
                   max_bucket_rows: int | None = None) -> list:
    """Shared machinery: returns one merged-result ObjectRef per bucket
    (results stay in the object store).

    ``two_level=None`` auto-selects: when map-blocks × buckets exceeds
    TREE_REF_THRESHOLD the exchange runs as a TREE — map tasks split by
    ``bucket % B1`` (coarse), B1 repartition tasks split their coarse
    class by ``(bucket % B) // B1`` (fine), and the B leaf merges each
    take ONE piece — so object-ref count scales O(M×B1 + B1×B2 + B)
    instead of O(M×B) (VERDICT r2 item 6; B1 ≈ √B).  Row routing is
    identical to the flat path: leaf b holds exactly the rows with
    ``bucket % B == b``.
    """
    import ray

    B = int(num_buckets)
    blocks = ds.to_arrow_refs()
    if not blocks:
        return []  # dataset produced zero blocks — nothing to exchange

    M = len(blocks)
    if two_level is None:
        two_level = M * B > TREE_REF_THRESHOLD
    if B < 4:
        two_level = False

    log_buckets = bool(os.environ.get("VERIFY_RAY_EXCHANGE_LOG"))

    def run_group(t: pa.Table):
        if drop_bucket and bucket_col in t.column_names:
            t = t.drop_columns([bucket_col])
        if t.num_rows == 0:
            return empty_result
        if log_buckets:
            print(f"[exchange] bucket rows={t.num_rows} "
                  f"key={bucket_col} B={B}", flush=True)
        if max_bucket_rows is not None and t.num_rows > max_bucket_rows:
            raise HotBucketError(
                f"hash bucket holds {t.num_rows} rows "
                f"(max_bucket_rows={max_bucket_rows}, key={bucket_col!r}, "
                f"num_buckets={B}): a hot key is concentrating the "
                "exchange in one merge task. Raise num_buckets (only if "
                "the bucket mixes multiple keys), salt the hot key "
                "(joins.salted_join), or pre-aggregate per block before "
                "the exchange (stages/unique.py).")
        out = group_fn(t)
        return out if out is not None else empty_result

    if not two_level:
        @ray.remote(num_returns=B)
        def split_task(t: pa.Table):
            if t.num_rows == 0 or bucket_col not in t.column_names:
                # Ray Data passes empty blocks through map_batches
                # without calling the fn, so an upstream empty block can
                # arrive with a pre-map schema — route nothing
                empty = pa.table({})
                return tuple([empty] * B) if B > 1 else empty
            b = t.column(bucket_col).to_numpy(zero_copy_only=False)
            bk = (b.astype(np.uint64) % np.uint64(B)).astype(np.int64)
            out = _split_by(t, bk, B)
            return tuple(out) if B > 1 else out[0]

        @ray.remote
        def merge_task(*pieces):
            return run_group(pa.concat_tables(pieces,
                                              promote_options="default"))

        refs = [split_task.remote(block) for block in blocks]
        if B == 1:
            refs = [[r] for r in refs]
        return [merge_task.remote(*[refs[m][b] for m in range(M)])
                for b in range(B)]

    B1 = int(np.ceil(np.sqrt(B)))
    B2 = int(np.ceil(B / B1))

    @ray.remote(num_returns=B1)
    def split_coarse(t: pa.Table):
        if t.num_rows == 0 or bucket_col not in t.column_names:
            empty = pa.table({})
            return tuple([empty] * B1)
        b = t.column(bucket_col).to_numpy(zero_copy_only=False)
        bk = (b.astype(np.uint64) % np.uint64(B1)).astype(np.int64)
        return tuple(_split_by(t, bk, B1))

    @ray.remote(num_returns=B2)
    def split_fine(*pieces):
        t = pa.concat_tables(pieces, promote_options="default")
        if t.num_rows == 0 or bucket_col not in t.column_names:
            empty = pa.table({})
            return tuple([empty] * B2) if B2 > 1 else empty
        b = t.column(bucket_col).to_numpy(zero_copy_only=False)
        fb = ((b.astype(np.uint64) % np.uint64(B)) // np.uint64(B1)).astype(np.int64)
        out = _split_by(t, fb, B2)
        return tuple(out) if B2 > 1 else out[0]

    @ray.remote
    def merge_leaf(piece):
        if piece.num_rows == 0 or bucket_col not in piece.column_names:
            return empty_result
        return run_group(piece)

    coarse = [split_coarse.remote(block) for block in blocks]  # M × B1
    if B1 == 1:
        coarse = [[r] for r in coarse]
    fine = [split_fine.remote(*[coarse[m][c] for m in range(M)])
            for c in range(B1)]  # B1 × B2
    if B2 == 1:
        fine = [[r] for r in fine]
    return [merge_leaf.remote(fine[b % B1][b // B1]) for b in range(B)]


def grouped_exchange(ds, bucket_col: str, num_buckets: int, group_fn,
                     drop_bucket: bool = True,
                     two_level: bool | None = None,
                     max_bucket_rows: int | None = None) -> pa.Table:
    """Apply ``group_fn(pa.Table) -> pa.Table`` to each hash bucket's
    rows; returns the concatenated results (driver-side — results are
    expected to be output-sized; use grouped_exchange_ds to keep huge
    results distributed).

    ``bucket_col`` must be an integer column; rows are routed by
    ``bucket % num_buckets``.  ``max_bucket_rows`` (optional) raises
    :class:`HotBucketError` with remediation guidance when any single
    bucket exceeds it — the skew tripwire for callers whose group_fn is
    super-linear in bucket size; set ``VERIFY_RAY_EXCHANGE_LOG=1`` to
    print every bucket's row count (worker logs).
    """
    import ray

    merged = _exchange_refs(ds, bucket_col, num_buckets, group_fn,
                            drop_bucket, empty_result=None,
                            two_level=two_level,
                            max_bucket_rows=max_bucket_rows)
    tables = [t for t in ray.get(merged) if t is not None and t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")


def grouped_exchange_ds(ds, bucket_col: str, num_buckets: int, group_fn,
                        empty_schema: pa.Schema, drop_bucket: bool = True,
                        two_level: bool | None = None,
                        max_bucket_rows: int | None = None):
    """Like grouped_exchange, but the per-bucket results STAY in the
    object store and come back as a new ``ray.data.Dataset``
    (``from_arrow_refs``) — nothing lands on the driver.  The required
    ``empty_schema`` gives empty buckets a typed empty table so the
    resulting Dataset has a stable schema.  ``max_bucket_rows`` /
    ``VERIFY_RAY_EXCHANGE_LOG``: see :func:`grouped_exchange`."""
    import ray.data as rd

    merged = _exchange_refs(ds, bucket_col, num_buckets, group_fn,
                            drop_bucket,
                            empty_result=empty_schema.empty_table(),
                            two_level=two_level,
                            max_bucket_rows=max_bucket_rows)
    if not merged:
        return rd.from_arrow(empty_schema.empty_table())
    return rd.from_arrow_refs(merged)
