"""Order-statistic selection without a global sort — the two corpus
operations a quality-filtered training mix needs that naively demand
``ds.sort``:

- ``top_k_by_score``: the exact top-k rows by (score desc, id asc).
  A global sort of 100 TB to keep the best 1% is an all-to-all
  shuffle of everything; instead: (1) a histogram pass reduces the
  corpus to driver-side (score → count) pairs — scores are INTEGERS
  by repo policy, so cardinality is bounded and tiny next to the
  data; (2) the threshold score is read off the descending cumulative
  count; (3) only the one tie score's ids (tie-group-sized) come to
  the driver to resolve the boundary deterministically; (4) one
  streaming filter emits exactly k rows.  Three passes over a NARROW
  (id, score) dataset, zero shuffles.

- ``exact_quantiles``: exact order statistics from the same value
  histogram — quantile q = the smallest value whose cumulative count
  reaches rank ``(q‰ · n + 999) // 1000`` (integer arithmetic on both
  engines; float division would make ceil() flip on last-ULP ties).

Scale assumption (SURVEY §2.6): distinct score/value cardinality must
fit the driver — true for integer heuristic scores (thousands of
distinct values) — and the boundary tie group must fit the driver;
at a pathological tie (every row scores 42) pre-salt the score with a
deterministic id hash instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def value_counts(ds, col: str) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side exact (sorted values, counts) of an integer column:
    per-batch ``np.unique`` partials, combined once on the driver."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u), "c": pa.array(c.astype(np.int64))})

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    allp = pa.concat_tables(parts)
    v = allp.column("v").to_numpy(zero_copy_only=False)
    c = allp.column("c").to_numpy(zero_copy_only=False)
    u, inv = np.unique(v, return_inverse=True)
    tot = np.zeros(len(u), dtype=np.int64)
    np.add.at(tot, inv, c)
    return u, tot


def top_k_by_score(scored_ds, k: int, score_col: str = "score",
                   id_col: str = "doc_id"):
    """Exactly ``min(k, n)`` rows of ``scored_ds`` — the top k by
    (score desc, id asc) — as a Dataset, no global sort.

    ``scored_ds`` must be materialized-or-rescannable (it is consumed
    up to three times: histogram, boundary ties, final filter)."""
    import ray

    vals, counts = value_counts(scored_ds, score_col)
    if not len(vals):
        return scored_ds
    desc_cum = np.cumsum(counts[::-1])[::-1]  # rows with score >= vals[i]
    qual = np.flatnonzero(desc_cum >= k)
    if not len(qual):  # fewer than k rows total
        return scored_ds
    thr = int(vals[qual[-1]])
    n_above = int(desc_cum[qual[-1]]) - int(counts[qual[-1]])
    need = k - n_above

    keep_ref = None
    if need < int(counts[qual[-1]]):  # boundary tie needs resolving
        def ties(b: pa.Table) -> pa.Table:
            s = b.column(score_col).to_numpy(zero_copy_only=False)
            return b.select([id_col]).filter(pa.array(s == thr))

        tie_ids = (scored_ds.map_batches(ties, batch_format="pyarrow")
                   .to_pandas()[id_col].to_numpy())
        keep_ref = ray.put(np.sort(tie_ids)[:need])

    def final(b: pa.Table) -> pa.Table:
        s = b.column(score_col).to_numpy(zero_copy_only=False)
        mask = s > thr
        if keep_ref is not None:
            keep = ray.get(keep_ref)
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            at = s == thr
            if at.any() and len(keep):
                pos = np.searchsorted(keep, ids)
                pos[pos == len(keep)] = 0
                mask = mask | (at & (keep[pos] == ids))
        else:
            mask = mask | (s == thr)
        return b.filter(pa.array(mask))

    return scored_ds.map_batches(final, batch_format="pyarrow")


def exact_quantiles(ds, col: str, qs_permille: list[int]
                    ) -> pa.Table:
    """Exact quantiles of an integer column: ``(q, value)`` rows where
    value = the smallest v with cum_count(≤ v) ≥ (q·n + 999) // 1000."""
    vals, counts = value_counts(ds, col)
    out_q, out_v = [], []
    if len(vals):
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for q in qs_permille:
            rank = (q * n + 999) // 1000
            i = int(np.searchsorted(cum, rank))
            out_q.append(q)
            out_v.append(int(vals[min(i, len(vals) - 1)]))
    return pa.table({"q": pa.array(out_q, type=pa.int64()),
                     "value": pa.array(out_v, type=pa.int64())})
