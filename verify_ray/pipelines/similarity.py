"""Similarity search over an embedding column (``list<float>``).

* ``ann_topk`` — brute-force cosine top-k baseline: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits only its local top-k per query; the driver merges the tiny
  per-batch candidate sets.  Exact (it's a full scan), and the scan is
  embarrassingly parallel — the scale cost is one pass over the data
  per query batch, not per query.
* ``lsh_ann_topk`` — the scale path: random-hyperplane LSH buckets
  (deterministic seed); only buckets matching a query's signature are
  scanned.  Approximate; recall grows with the number of tables.
* ``embedding_near_dup_*`` — near-duplicate pairs by cosine >= tau:
  exact (broadcast, O(n^2/blocks)) and LSH-bucketed variants.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import as_array


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col]
    col = as_array(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, batch.num_rows)
    return flat.reshape(batch.num_rows, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(nrm, 1e-12)


def ann_topk(ds, queries: np.ndarray, k: int = 10, emb_col: str = "embedding",
             id_col: str = "vec_id", query_ids=None):
    """Exact cosine top-k for each query row.  Returns a pandas DataFrame
    (query_id, vec_id, sim) sorted by (query_id, -sim, vec_id).

    One broadcast of the normalized query matrix; each batch emits at
    most k rows per query, so the driver-side merge handles
    O(n_batches * |Q| * k) tiny rows regardless of dataset size.
    """
    import pandas as pd
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        emb = _normalize(_emb_matrix(batch, emb_col))
        sims = emb @ qm.T  # (rows, nq)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            part = np.argpartition(-sims[:, j], kk - 1)[:kk]
            out_q.extend([j] * kk)
            out_id.extend(ids[part].tolist())
            out_s.extend(sims[part, j].tolist())
        return pa.table({"qi": pa.array(out_q, type=pa.int32()),
                         "vec_id": pa.array(out_id),
                         "sim": pa.array(out_s, type=pa.float64())})

    cand = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow").to_pandas()
    return _merge_local_topk(cand, qids, k)


def _merge_local_topk(cand, qids, k):
    """Driver-side merge of per-batch top-k candidates (shared by the
    exact and LSH ANN variants)."""
    import pandas as pd

    out = []
    for j, qid in enumerate(qids):
        g = cand[cand.qi == j].sort_values(["sim", "vec_id"],
                                           ascending=[False, True]).head(k)
        out.append(pd.DataFrame({"query_id": qid, "vec_id": g.vec_id.to_numpy(),
                                 "sim": np.round(g.sim.to_numpy(), 6)}))
    if not out:
        return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
    return (pd.concat(out, ignore_index=True)
            .sort_values(["query_id", "sim", "vec_id"],
                         ascending=[True, False, True])
            .reset_index(drop=True))


def _hyperplanes(dim: int, bits: int, table: int, seed: int = 0xA11CE) -> np.ndarray:
    rng = np.random.RandomState(seed + 7919 * table)
    return rng.standard_normal((bits, dim))


def _signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    out = np.zeros(len(m), dtype=np.uint64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 has no
    bitwise_count): view as bytes, unpack bits, sum per word."""
    b = np.unpackbits(x.view(np.uint8).reshape(x.shape + (8,)), axis=-1)
    return b.sum(axis=-1).astype(np.int64)


def lsh_ann_topk(ds, queries: np.ndarray, k: int = 10, emb_col: str = "embedding",
                 id_col: str = "vec_id", query_ids=None, bits: int = 8,
                 tables: int = 4, probe_hamming: int = 0):
    """Approximate top-k: scan only batches' rows whose LSH signature (in
    any of ``tables`` hyperplane tables) is within ``probe_hamming``
    bits of the query's.  Same output shape as ann_topk.

    ``probe_hamming`` is multi-probe LSH: probing nearby buckets raises
    recall without extra tables (each +1 of radius multiplies the probed
    volume by ~bits).  ``probe_hamming >= bits`` makes every row a
    candidate — the scan degrades to exact brute force BY CONSTRUCTION,
    which is the oracleable configuration (the same trick as IVF's
    full-probe): it exercises the real signature + Hamming machinery
    while having a SQL-predictable exact answer.
    """
    import pandas as pd
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    dim = q.shape[1]
    planes = [_hyperplanes(dim, bits, t) for t in range(tables)]
    q_sigs = np.stack([_signatures(q, p) for p in planes])  # (tables, nq)
    q_ref = ray.put((q, q_sigs, planes))

    def local(batch: pa.Table) -> pa.Table:
        qm, qs, pl = ray.get(q_ref)
        emb = _normalize(_emb_matrix(batch, emb_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = np.stack([_signatures(emb, p) for p in pl])  # (tables, rows)
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            if probe_hamming > 0:
                dist = _popcount64(np.bitwise_xor(sigs, qs[:, j][:, None]))
                cand_mask = (dist <= probe_hamming).any(axis=0)
            else:
                cand_mask = (sigs == qs[:, j][:, None]).any(axis=0)
            if not cand_mask.any():
                continue
            sims = emb[cand_mask] @ qm[j]
            cids = ids[cand_mask]
            kk = min(k, len(cids))
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([j] * kk)
            out_id.extend(cids[part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table({"qi": pa.array(out_q, type=pa.int32()),
                         "vec_id": pa.array(out_id),
                         "sim": pa.array(out_s, type=pa.float64())})

    cand = ds.select_columns([id_col, emb_col]).map_batches(
        local, batch_format="pyarrow").to_pandas()
    return _merge_local_topk(cand, qids, k)


def embedding_near_dup_exact(ds, tau: float = 0.95, emb_col: str = "embedding",
                             id_col: str = "vec_id"):
    """All pairs (a < b) with cosine >= tau — exact.

    The matrix is materialized once via ``ray.put`` (the 'small side');
    each batch compares its rows against the full broadcast matrix and
    keeps only pairs where the batch row's id is the smaller one.  Use
    the LSH variant when n x dim no longer fits one object."""
    import pandas as pd
    import ray

    rows = ds.select_columns([id_col, emb_col]).to_pandas()
    ids = rows[id_col].to_numpy()
    m = _normalize(np.stack(rows[emb_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, m))

    import ray.data as rd

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        emb = _normalize(_emb_matrix(batch, emb_col))
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = emb @ all_m.T
        ai, bj = np.nonzero(sims >= tau)
        keep = bids[ai] < all_ids[bj]
        return pa.table({
            "doc_a": pa.array(bids[ai[keep]]),
            "doc_b": pa.array(all_ids[bj[keep]]),
            "sim": pa.array(np.round(sims[ai[keep], bj[keep]], 6),
                            type=pa.float64()),
        })

    res = ds.select_columns([id_col, emb_col]).map_batches(
        pairs, batch_format="pyarrow").to_pandas()
    return res.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def embedding_near_dup_lsh(ds, tau: float = 0.95, emb_col: str = "embedding",
                           id_col: str = "vec_id", bits: int | None = None,
                           tables: int = 6, rows_per_group: int = 200_000,
                           target_bucket: int = 32):
    """Near-dup pairs via hyperplane-LSH buckets — the scale path for
    the exact variant.  Same candidate-then-verify shape as
    ``dedup.minhash_lsh_pairs``:

    * the exchange carries ONLY ``(bucket: u64, vec_id)`` rows — one
      per row per table, never the vector itself (a ``dim × 8B``
      payload per band row would multiply shuffle bytes by ``tables``);
    * coarse-group count sized from the data; candidate pairs are the
      multi-member fine buckets;
    * candidates verified exactly in a second streaming pass that
      fetches only the candidate ids' vectors (broadcast id filter).

    Recall tuning: P(pair found) = 1-(1-p^bits)^tables with
    p = 1 - angle/pi.  Lower ``bits`` / higher ``tables`` raises recall
    AND bucket sizes.  ``bits=None`` auto-sizes to
    ``log2(n / target_bucket)`` (clamped to [4, 16]) so expected bucket
    occupancy — and therefore per-bucket candidate-pair volume — stays
    CONSTANT as the dataset grows; without this the all-pairs expansion
    inside a bucket is O((n / 2^bits)^2) and explodes quadratically.
    """
    import pandas as pd
    import ray

    from .dedup import _coarse_count, _pairs_in_fine_buckets
    from ..stages.exchange import grouped_exchange

    planes_cache: list = []

    def get_planes(dim: int):
        if not planes_cache:
            planes_cache.append(
                [_hyperplanes(dim, bits, t) for t in range(tables)])
        return planes_cache[0]

    def to_rows(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, emb_col))
        planes = get_planes(emb.shape[1])
        ids = batch[id_col]
        parts = []
        for t, p in enumerate(planes):
            sig = _signatures(emb, p) | (np.uint64(t) << np.uint64(56))
            parts.append(pa.table({
                "bucket": pa.array(sig, type=pa.uint64()),
                "doc_id": ids,
            }))
        return pa.concat_tables(parts)

    n_rows = ds.count()
    if bits is None:
        bits = int(np.clip(np.ceil(np.log2(max(n_rows, 1) / target_bucket)),
                           4, 16))
    num_coarse = _coarse_count(n_rows * tables, rows_per_group)
    rows = ds.select_columns([id_col, emb_col]).map_batches(
        to_rows, batch_format="pyarrow")

    def coarse_fn(t: pa.Table) -> pa.Table:
        out = _pairs_in_fine_buckets(t.to_pandas())
        if out is None:
            out = pd.DataFrame({"doc_a": [], "doc_b": []})
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = grouped_exchange(rows, "bucket", num_coarse, coarse_fn,
                            drop_bucket=False)
    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "sim": pd.Series(dtype="float64")})
    if cand is None or cand.num_rows == 0:
        return empty
    cand = cand.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"])

    # verify pass: vectors only for candidate ids, gathered into ONE
    # matrix indexed by searchsorted position (no per-pair Python work).
    # Candidate volume is bounded per bucket (~target_bucket^2/2 pairs)
    # so it grows LINEARLY with n; if even that outgrows the driver,
    # run this verification itself through grouped_exchange keyed on
    # hash(doc_a).
    wanted = np.unique(np.concatenate([cand["doc_a"].to_numpy(),
                                       cand["doc_b"].to_numpy()]))
    wanted_ref = ray.put(wanted)

    def fetch(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(np.isin(ids, w))
        return batch.take(pa.array(sel)) if len(sel) else batch.slice(0, 0)

    V = None
    fetched = ds.select_columns([id_col, emb_col]).map_batches(
        fetch, batch_format="pyarrow")
    for bt in fetched.iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        m = _normalize(_emb_matrix(bt, emb_col))
        if V is None:
            V = np.zeros((len(wanted), m.shape[1]))
        pos = np.searchsorted(wanted, bt[id_col].to_numpy(zero_copy_only=False))
        V[pos] = m
    if V is None:
        return empty

    ai = np.searchsorted(wanted, cand["doc_a"].to_numpy())
    bi = np.searchsorted(wanted, cand["doc_b"].to_numpy())
    sims = np.einsum("ij,ij->i", V[ai], V[bi])
    keep = sims >= tau
    out = pd.DataFrame({"doc_a": cand["doc_a"].to_numpy()[keep],
                        "doc_b": cand["doc_b"].to_numpy()[keep],
                        "sim": np.round(sims[keep], 6)})
    if out.empty:
        return empty
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed scan


def ivf_train_centroids(ds, n_centroids: int = 64, emb_col: str = "embedding",
                        sample_rows: int = 20_000, iters: int = 12,
                        seed: int = 0x5EED) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (the
    quantizer is model-sized: n_centroids x dim floats; the SAMPLE is
    bounded, never the dataset).  Returns normalized centroids."""
    sample = ds.select_columns([emb_col]).limit(sample_rows)
    parts = [
        _normalize(_emb_matrix(b, emb_col))
        for b in sample.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if not parts:
        return np.zeros((0, 1))
    m = np.concatenate(parts, axis=0)
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(m))
    cent = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = m[mask].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_ann_topk(ds, queries: np.ndarray, k: int = 10, nprobe: int = 8,
                 centroids: np.ndarray | None = None, n_centroids: int = 64,
                 emb_col: str = "embedding", id_col: str = "vec_id",
                 query_ids=None):
    """IVF ANN top-k: rows are assigned to their nearest centroid
    (vectorized argmax per batch); each query scores ONLY rows whose
    centroid is among its ``nprobe`` nearest centroids.  The quantizer
    is broadcast once; per-batch work is one assignment matmul + one
    masked scoring matmul; the driver merges per-batch local top-k
    (O(batches x |Q| x k), independent of dataset size).

    ``nprobe = n_centroids`` degrades to the exact scan; recall rises
    monotonically with nprobe (see test_similarity recall assertions).
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    if centroids is None:
        centroids = ivf_train_centroids(ds, n_centroids, emb_col)
    if len(centroids) == 0:
        import pandas as pd

        return _merge_local_topk(
            pd.DataFrame({"qi": [], "vec_id": [], "sim": []}), qids, k)
    nprobe = min(nprobe, len(centroids))
    # per-query probe set: the nprobe nearest centroids
    qc = q @ centroids.T
    probes = np.argsort(-qc, axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((q, centroids, probes))

    def local(batch: pa.Table) -> pa.Table:
        qm, cent, prb = ray.get(ref)
        emb = _normalize(_emb_matrix(batch, emb_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(emb @ cent.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            cand_mask = np.isin(assign, prb[j])
            if not cand_mask.any():
                continue
            sims = emb[cand_mask] @ qm[j]
            cids = ids[cand_mask]
            kk = min(k, len(cids))
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([j] * kk)
            out_id.extend(cids[part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table({"qi": pa.array(out_q, type=pa.int32()),
                         "vec_id": pa.array(out_id),
                         "sim": pa.array(out_s, type=pa.float64())})

    cand = ds.select_columns([id_col, emb_col]).map_batches(
        local, batch_format="pyarrow").to_pandas()
    return _merge_local_topk(cand, qids, k)
