"""Deterministic content-addressed sampling (training-data mixtures).

``hash_sample`` keeps a row iff ``md5(key) % granularity`` falls under
the rate — the standard reproducible down-sampling trick: the decision
depends only on the KEY, so it is stable across runs, engines, resumes
and parallelism levels (unlike ``Dataset.random_sample``), and any two
samples at rates r1 < r2 are NESTED (the r1 sample is a subset of the
r2 sample), which is what mixture re-weighting experiments need.

``stratified_hash_sample`` applies a per-group rate (e.g. down-weight
one source of a corpus) with the same determinism.

The md5 bucket is reproducible in SQL
(``CAST(concat('0x', substr(md5(k),1,16)) AS UBIGINT) % g``), so the
driver oracle checks the exact surviving row set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

GRANULARITY = 10_000


def _hash_buckets(keys: list) -> np.ndarray:
    """md5-derived bucket in [0, GRANULARITY) per key (None -> -1).

    Delegates to tokenize.word_token_id — the SINGLE authoritative
    md5-first-8-bytes-big-endian hash that every SQL oracle mirrors."""
    from .tokenize import word_token_id

    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        out[i] = -1 if k is None else word_token_id(str(k), GRANULARITY)
    return out


def hash_sample(ds, rate: float, key_col: str = "doc_id"):
    """Dataset filtered to the deterministic ``rate`` fraction keyed on
    ``key_col`` (null keys never sampled)."""
    threshold = int(round(rate * GRANULARITY))

    def filt(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string()).to_pylist()
        bk = _hash_buckets(keys)
        return b.filter(pa.array((bk >= 0) & (bk < threshold)))

    return ds.map_batches(filt, batch_format="pyarrow")


def stratified_hash_sample(ds, rates: dict, group_col: str = "source",
                           key_col: str = "doc_id",
                           default_rate: float = 1.0):
    """Per-group deterministic sampling: ``rates[group]`` fraction of
    each group survives (groups absent from ``rates`` keep
    ``default_rate``)."""
    thresholds = {g: int(round(r * GRANULARITY)) for g, r in rates.items()}
    default_thr = int(round(default_rate * GRANULARITY))

    def filt(b: pa.Table) -> pa.Table:
        keys = pc.cast(b[key_col], pa.string()).to_pylist()
        bk = _hash_buckets(keys)
        groups = b[group_col].to_pylist()
        thr = np.fromiter((thresholds.get(g, default_thr) for g in groups),
                          dtype=np.int64, count=len(groups))
        return b.filter(pa.array((bk >= 0) & (bk < thr)))

    return ds.map_batches(filt, batch_format="pyarrow")
