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
            part = _topk_by_sim_id(sims[:, j], ids, kk)
            out_q.extend([j] * kk)
            out_id.extend(ids[part].tolist())
            out_s.extend(sims[part, j].tolist())
        return pa.table({"qi": pa.array(out_q, type=pa.int32()),
                         "vec_id": pa.array(out_id),
                         "sim": pa.array(out_s, type=pa.float64())})

    cand = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow").to_pandas()
    return _merge_local_topk(cand, qids, k)


def _topk_by_sim_id(sims: np.ndarray, ids: np.ndarray,
                    kk: int) -> np.ndarray:
    """Indices of the local top-kk by (sim DESC, id ASC).  A bare
    ``argpartition`` prunes exact sim ties (duplicate embeddings)
    arbitrarily, possibly dropping the tied id the deterministic
    global merge would keep.  Cost stays near-linear: partition finds
    the kk-th sim, then only the rows AT or above that threshold
    (kk + boundary ties) pay the tie-resolving lexsort."""
    if kk >= len(sims):
        return np.lexsort((ids, -sims))
    thr = -np.partition(-sims, kk - 1)[kk - 1]
    cand = np.flatnonzero(sims >= thr)
    return cand[np.lexsort((ids[cand], -sims[cand]))[:kk]]


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
            part = _topk_by_sim_id(sims, cids, kk)
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


def plan_lsh_bands(n_rows: int, tau: float, target_bucket: int = 64,
                   recall_target: float = 0.995, w_min: int = 4,
                   w_max: int = 16, max_bands: int = 16):
    """Tau-aware banded-LSH feasibility plan (VERDICT r2 item 1).

    One signature per vector, split into ``bands`` chunks of ``w``
    hyperplane bits; a pair is a candidate iff it agrees exactly on
    some band, so recall at cosine tau is ``1 - (1 - p^w)^bands`` with
    ``p = 1 - arccos(tau)/pi`` the per-bit collision probability
    (standard MinHash-style banding analysis, applied to hyperplane
    bits).

    ``w`` is first sized from the data (``log2(n / target_bucket)``,
    constant expected bucket occupancy as n grows), then walked DOWN
    until a band count ``<= max_bands`` reaches ``recall_target`` —
    wider bands mean fewer false candidates, so the widest feasible w
    wins.  Returns ``(w, bands, predicted_recall)`` or ``None`` when
    even ``w_min`` needs more than ``max_bands`` bands (tau too low:
    p^w_min is so small that reaching the recall target needs a
    near-all-pairs candidate volume — the caller must use the exact
    scan instead).
    """
    import math

    p = 1.0 - float(np.arccos(np.clip(tau, -1.0, 1.0))) / np.pi
    if p <= 0:
        return None
    w_data = int(np.clip(np.ceil(np.log2(max(n_rows, 2) / target_bucket)),
                         w_min, w_max))
    for w in range(w_data, w_min - 1, -1):
        pw = p ** w
        if pw >= 1.0:
            return w, 1, 1.0
        bands = math.ceil(math.log1p(-recall_target) / math.log1p(-pw))
        if bands <= max_bands:
            recall = 1.0 - (1.0 - pw) ** bands
            return w, bands, recall
    return None


def blocked_exact_pairs(ds, tau: float, emb_col: str = "embedding",
                        id_col: str = "vec_id",
                        single_task_rows: int = 20_000,
                        n_rows: int | None = None):
    """Distributed all-pairs cosine >= tau via block-pair tasks.

    The narrow (id, embedding) projection is materialized ONCE; each
    Ray task normalizes two blocks and runs one f64 matmul, returning
    only the matching pairs (output-sized).  O(n^2 / blocks^2) flops
    per task with zero per-row Python — this is the correct degenerate
    route when LSH cannot prune (see plan_lsh_bands), and the scale
    path for the broadcast-limited ``embedding_near_dup_exact``.

    Inputs up to ``single_task_rows`` skip the block-pair task grid:
    ONE task concatenates the blocks and runs the (row-chunked) matmul
    — at small n the grid's per-task overhead costs more than the
    whole computation.
    """
    import pandas as pd
    import ray

    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "sim": pd.Series(dtype="float64")})
    # to_arrow_refs executes the narrow projection once and pins the
    # blocks in the object store — no driver copy, no extra pass
    refs = ds.select_columns([id_col, emb_col]).to_arrow_refs()
    if not refs:
        return empty

    @ray.remote
    def all_pairs_one_task(*tables):
        ts = [t for t in tables if t.num_rows]
        if not ts:
            return None
        t = pa.concat_tables(ts)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        M = _normalize(_emb_matrix(t, emb_col))
        oa, ob, os_ = [], [], []
        for lo in range(0, len(ids), 2048):  # bound sims memory
            hi = min(lo + 2048, len(ids))
            S = M[lo:hi] @ M.T
            r, c = np.nonzero(S >= tau)
            keep = (lo + r) < c  # strict upper triangle, one orientation
            oa.append(ids[lo + r[keep]])
            ob.append(ids[c[keep]])
            os_.append(S[r[keep], c[keep]])
        a = np.concatenate(oa)
        if len(a) == 0:
            return None
        return pa.table({"doc_a": pa.array(a),
                         "doc_b": pa.array(np.concatenate(ob)),
                         "sim": pa.array(np.round(np.concatenate(os_), 6),
                                         type=pa.float64())})

    if n_rows is None:
        @ray.remote
        def _nrows(t):
            return t.num_rows

        n_rows = sum(ray.get([_nrows.remote(r) for r in refs]))
    if n_rows <= single_task_rows:
        res = ray.get(all_pairs_one_task.remote(*refs))
        if res is None or res.num_rows == 0:
            return empty
        out = res.to_pandas()
        swap = out["doc_a"] > out["doc_b"]
        out.loc[swap, ["doc_a", "doc_b"]] = out.loc[swap,
                                                    ["doc_b", "doc_a"]].values
        return (out.drop_duplicates(subset=["doc_a", "doc_b"])
                .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    @ray.remote
    def prep(t: pa.Table):
        if t.num_rows == 0:
            return None
        return (t[id_col].to_numpy(zero_copy_only=False),
                _normalize(_emb_matrix(t, emb_col)))

    preps = [prep.remote(r) for r in refs]

    @ray.remote
    def cross(pi, pj, same: bool):
        if pi is None or pj is None:
            return None
        (ia, Ma), (ib, Mb) = pi, pj
        S = Ma @ Mb.T
        if same:
            S[np.tril_indices(len(ia))] = -2.0  # self + one orientation
        r, c = np.nonzero(S >= tau)
        if len(r) == 0:
            return None
        a, b, s = ia[r], ib[c], S[r, c]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        keep = a2 != b2  # same id in two blocks: not a pair
        return pa.table({"doc_a": pa.array(a2[keep]),
                         "doc_b": pa.array(b2[keep]),
                         "sim": pa.array(np.round(s[keep], 6),
                                         type=pa.float64())})

    tasks = [cross.remote(preps[i], preps[j], i == j)
             for i in range(len(preps)) for j in range(i, len(preps))]
    parts = [t for t in ray.get(tasks) if t is not None and t.num_rows]
    if not parts:
        return empty
    out = (pa.concat_tables(parts).to_pandas()
           .drop_duplicates(subset=["doc_a", "doc_b"]))
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def embedding_near_dup_lsh(ds, tau: float = 0.95, emb_col: str = "embedding",
                           id_col: str = "vec_id",
                           rows_per_group: int = 200_000,
                           target_bucket: int = 64,
                           recall_target: float = 0.995,
                           max_bands: int = 16):
    """Near-dup pairs via banded hyperplane signatures — the scale path
    for the exact variant, redesigned per VERDICT r2 item 1 (the old
    independent-tables form emitted near-all-pairs 32x over and was
    25x slower than the exact scan at bench parameters):

    * ONE signature per vector (``bands × w`` bits, tau-aware sizing —
      see ``plan_lsh_bands``); a pair is a candidate iff some band
      matches exactly, and (w, bands) are solved from the banding
      recall formula so recall >= recall_target at cosine tau by
      design, not by blindly stacking tables;
    * each vector emits ``bands`` rows of ``(band-bucket: u64, id,
      normalized f32 vector)`` — carrying the vector costs the same
      shuffle bytes as the old 32 id-only tables (dim×4B ≈ 32×8B at
      dim 64) and buys IN-EXCHANGE exact verification: each merge task
      verifies its buckets with one einsum, so no candidate frame, no
      signature dict and no second fetch pass ever reach the driver;
      only verified (output-sized) pairs do;
    * when no feasible plan exists (tau so low that bucket collisions
      approach all-pairs — e.g. the oracle's tau=0.4, where true pairs
      sit ~6e-4 above the threshold), the candidate set would be the
      full pair set anyway: route to ``blocked_exact_pairs`` and log
      the degeneration instead of simulating LSH at 25x the cost.
    """
    import logging

    import pandas as pd

    from .dedup import _bucket_pair_indices, _coarse_count
    from ..stages.exchange import grouped_exchange

    log = logging.getLogger("verify_ray.similarity")
    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "sim": pd.Series(dtype="float64")})

    n_rows = ds.count()
    if n_rows < 2:
        return empty
    plan = plan_lsh_bands(n_rows, tau, target_bucket, recall_target,
                          max_bands=max_bands)
    if plan is None:
        log.warning(
            "embedding_near_dup_lsh: no feasible band plan at tau=%.3f "
            "(per-bit collision p=%.3f): candidate volume would approach "
            "all pairs — routing to blocked_exact_pairs", tau,
            1.0 - float(np.arccos(tau)) / np.pi)
        return blocked_exact_pairs(ds, tau, emb_col, id_col, n_rows=n_rows)
    w, bands, recall = plan
    bits = w * bands
    log.info(
        "embedding_near_dup_lsh: w=%d bands=%d (bits=%d) predicted "
        "recall=%.4f expected candidate fraction/pair=%.2e",
        w, bands, bits, recall, bands * 0.5 ** w)

    plane_cache: list = []

    def planes_for(dim: int) -> np.ndarray:
        if not plane_cache:
            plane_cache.append(_hyperplanes(dim, bits, 0))
        return plane_cache[0]

    def to_rows(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, emb_col)).astype(np.float32)
        dim = emb.shape[1]
        sig_bits = (emb @ planes_for(dim).T.astype(np.float32)) > 0
        ids = batch[id_col]
        parts = []
        for band in range(bands):
            chunk = sig_bits[:, band * w:(band + 1) * w]
            val = np.zeros(len(emb), dtype=np.uint64)
            for b in range(w):
                val |= chunk[:, b].astype(np.uint64) << np.uint64(b)
            bucket = val | (np.uint64(band) << np.uint64(48))
            parts.append(pa.table({
                "bucket": pa.array(bucket, type=pa.uint64()),
                "doc_id": ids,
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.ravel(), type=pa.float32()), dim),
            }))
        return pa.concat_tables(parts)

    rows = ds.select_columns([id_col, emb_col]).map_batches(
        to_rows, batch_format="pyarrow")
    num_coarse = _coarse_count(n_rows * bands, rows_per_group)

    def verify_group(t: pa.Table) -> pa.Table:
        # dedup (bucket, doc_id), bucket-sort, expand within-bucket
        # pairs, verify ALL of them with one einsum — nothing leaves
        # this task except pairs that actually pass tau
        df_key = pd.DataFrame({
            "bucket": t.column("bucket").to_numpy(zero_copy_only=False),
            "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False)})
        keep_idx = (~df_key.duplicated()).to_numpy().nonzero()[0]
        t = t.take(pa.array(keep_idx))
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        vec = as_array(t.column("vec"))
        dim = vec.type.list_size
        V = vec.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
        order = np.lexsort((ids, b))
        b, ids, V = b[order], ids[order], V[order]
        ia, ib = _bucket_pair_indices(b)
        if len(ia) == 0:
            return None
        sims = np.einsum("ij,ij->i", V[ia].astype(np.float64),
                         V[ib].astype(np.float64))
        keep = sims >= tau
        if not keep.any():
            return None
        out = pd.DataFrame({"doc_a": ids[ia[keep]], "doc_b": ids[ib[keep]],
                            "sim": np.round(sims[keep], 6)})
        out = out.drop_duplicates(subset=["doc_a", "doc_b"])
        return pa.Table.from_pandas(out, preserve_index=False)

    res = grouped_exchange(rows, "bucket", num_coarse, verify_group,
                           drop_bucket=False)
    if res is None or res.num_rows == 0:
        return empty
    out = res.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"])
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


def semantic_dedup_pairs(ds, tau: float = 0.9, n_clusters: int = 64,
                         emb_col: str = "embedding", id_col: str = "vec_id",
                         centroids: np.ndarray | None = None,
                         rows_per_group: int = 200_000):
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embedding space, then find
    cosine-similar pairs WITHIN each cluster only.

    Scale shape: the quantizer is trained on a bounded sample and
    broadcast (``ivf_train_centroids`` — model-sized); each batch does
    one assignment matmul and emits ``(cluster, id, normalized f32
    vector)`` rows; the cluster-keyed hash exchange brings each
    cluster together and verifies with one blocked matmul per task.
    Total pairwise work drops from O(n²) to O(Σ|cluster|²) ≈ O(n²/k) —
    the SemDeDup trade: cross-cluster pairs are missed BY DESIGN
    (recall is cluster-bounded; precision is exact because every
    emitted pair is verified by true cosine).  ``n_clusters=1``
    degrades to the exact all-pairs scan — the oracleable
    configuration, same trick as IVF's full-probe oracle.

    Returns (doc_a, doc_b, sim) with doc_a < doc_b, sim rounded to 6.
    """
    import pandas as pd
    import ray

    from ..stages.exchange import grouped_exchange
    from .dedup import _coarse_count

    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "sim": pd.Series(dtype="float64")})
    n_rows = ds.count()
    if n_rows < 2:
        return empty
    if centroids is None:
        centroids = ivf_train_centroids(ds, n_clusters, emb_col)
    if len(centroids) == 0:
        return empty
    cent_ref = ray.put(centroids)

    def assign_rows(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        emb = _normalize(_emb_matrix(batch, emb_col)).astype(np.float32)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cl = np.argmax(emb @ cent.T.astype(np.float32), axis=1)
        return pa.table({
            "bucket": pa.array(cl.astype(np.uint64), type=pa.uint64()),
            "vid": pa.array(ids),
            "vec": pa.array(list(emb), type=pa.list_(pa.float32())),
        })

    rows = ds.select_columns([id_col, emb_col]).map_batches(
        assign_rows, batch_format="pyarrow")

    def cluster_pairs(t: pa.Table) -> pa.Table | None:
        # one task may hold several clusters (bucket % B routing);
        # verify within each actual cluster id separately
        cl = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column("vid").to_numpy(zero_copy_only=False)
        vec = np.asarray(t.column("vec").to_pylist(), dtype=np.float32)
        order = np.argsort(cl, kind="stable")
        cl, ids, vec = cl[order], ids[order], vec[order]
        starts = np.flatnonzero(
            np.concatenate([[True], cl[1:] != cl[:-1]]))
        ends = np.append(starts[1:], len(cl))
        parts = []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            S = vec[s:e] @ vec[s:e].T
            S[np.tril_indices(m)] = -2.0
            r, c = np.nonzero(S >= tau)
            if not len(r):
                continue
            a, b = ids[s + r], ids[s + c]
            swap = a > b
            parts.append(pa.table({
                "doc_a": pa.array(np.where(swap, b, a)),
                "doc_b": pa.array(np.where(swap, a, b)),
                "sim": pa.array(np.round(S[r, c].astype(np.float64), 6)),
            }))
        if not parts:
            return None
        return pa.concat_tables(parts)

    B = _coarse_count(n_rows, rows_per_group)
    res = grouped_exchange(rows, "bucket", min(B, max(len(centroids), 1)),
                           cluster_pairs, drop_bucket=False)
    if res is None or res.num_rows == 0:
        return empty
    return (res.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


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
            part = _topk_by_sim_id(sims, cids, kk)
            out_q.extend([j] * kk)
            out_id.extend(cids[part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table({"qi": pa.array(out_q, type=pa.int32()),
                         "vec_id": pa.array(out_id),
                         "sim": pa.array(out_s, type=pa.float64())})

    cand = ds.select_columns([id_col, emb_col]).map_batches(
        local, batch_format="pyarrow").to_pandas()
    return _merge_local_topk(cand, qids, k)


def knn_join(query_ds, base_ds, k: int = 10,
             emb_col: str = "embedding", id_col: str = "vec_id",
             query_emb_col: str | None = None,
             query_id_col: str | None = None,
             num_buckets: int = 32, concurrency: int = 4):
    """Dataset-to-dataset exact cosine k-nearest-neighbor join: for
    EVERY row of ``query_ds``, the top-k most-similar rows of
    ``base_ds``.  Unlike ``ann_topk`` (broadcast query MATRIX,
    driver-side merge — right for a handful of probe queries), both
    sides here are Datasets and nothing query-count-sized touches the
    driver — the retrieval-index build / cross-corpus linking shape
    ("for every doc in corpus A, its nearest neighbors in corpus B").

    Shape (block-nested-loop join, one pass over the base):

    1. query blocks are normalized into (matrix, ids) chunks that STAY
       in the object store; each scoring ACTOR fetches them once in
       ``__init__`` (shared object-store buffers, not per-batch
       re-ships);
    2. one streaming pass over ``base_ds``: each base batch computes
       one matmul per query chunk and emits at most k candidate rows
       per query (one stable argsort over ALL queries at once on the
       id-pre-sorted batch — no per-query Python loop, ties kept by
       smallest id);
    3. candidates (query_id, vec_id, sim) route through a query-keyed
       hash exchange; each merge task resolves its queries' global
       top-k with one lexsort + boundary-rank pass.

    Candidate volume is O(base_blocks × |Q| × k) narrow rows — the
    exchange, not the driver, absorbs it.  Scale assumption (SURVEY
    §2.6): the normalized query matrix fits the cluster object store
    (|Q| × dim × 8 bytes; 10⁸ queries at dim 256 ≈ 200 GB — shard the
    query side and run per-shard joins beyond that).

    Ties: (sim DESC, vec_id ASC), the ann_topk oracle convention.
    Returns a Dataset (query_id, vec_id, sim).
    """
    import pandas as pd
    import ray

    from ..stages.exchange import grouped_exchange_ds

    query_emb_col = query_emb_col or emb_col
    query_id_col = query_id_col or id_col

    @ray.remote
    def prep_chunk(t: pa.Table):
        if t.num_rows == 0:
            return None
        m = _normalize(_emb_matrix(t, query_emb_col))
        ids = t.column(query_id_col).to_numpy(zero_copy_only=False)
        return m, np.asarray(ids, dtype=np.int64)

    chunk_refs = [
        prep_chunk.remote(r) for r in
        query_ds.select_columns([query_id_col, query_emb_col])
        .to_arrow_refs()]
    # DEADLOCK GUARD: the prep tasks must COMPLETE before the scoring
    # actor pool spins up — actors reserve CPUs while blocking in
    # __init__ on ray.get(chunk_refs), and if the pool holds every
    # CPU the prep tasks can never schedule (observed as a real
    # 4-actor/4-CPU hang in the test fixture; race-dependent, since
    # prep tasks submitted to an idle cluster usually win)
    ray.wait(chunk_refs, num_returns=len(chunk_refs))
    # leave at least one CPU for the task stages up- and downstream of
    # the actor pool (the exchange's split/merge, the read itself)
    avail = int(ray.cluster_resources().get("CPU", 8))
    concurrency = max(1, min(concurrency, avail - 1))

    out_schema = pa.schema([("query_id", pa.int64()),
                            ("vec_id", pa.int64()),
                            ("sim", pa.float64())])

    class _Score:
        def __init__(self):
            self.chunks = [c for c in ray.get(chunk_refs)
                           if c is not None]

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or not self.chunks:
                return out_schema.empty_table()
            emb = _normalize(_emb_matrix(batch, emb_col))
            ids = np.asarray(
                batch.column(id_col).to_numpy(zero_copy_only=False),
                dtype=np.int64)
            # pre-sort the batch by id so a STABLE sort on -sim yields
            # the documented (sim DESC, vec_id ASC) order — a bare
            # argpartition prunes exact sim ties (duplicate
            # embeddings) arbitrarily, and the dropped tie could be
            # the id the oracle's ROW_NUMBER keeps
            id_order = np.argsort(ids, kind="stable")
            emb, ids = emb[id_order], ids[id_order]
            out = []
            kk = min(k, len(ids))
            for qm, qids in self.chunks:
                sims = emb @ qm.T  # (rows, nq)
                part = np.argsort(-sims, axis=0, kind="stable")[:kk]
                qcol = np.repeat(qids[None, :], part.shape[0], axis=0)
                out.append(pa.table({
                    "query_id": pa.array(qcol.ravel(order="F")),
                    "vec_id": pa.array(ids[part].ravel(order="F")),
                    "sim": pa.array(
                        np.take_along_axis(sims, part, axis=0)
                        .ravel(order="F"))}))
            return pa.concat_tables(out)

    cand = (base_ds.select_columns([id_col, emb_col])
            .map_batches(_Score, batch_format="pyarrow",
                         concurrency=concurrency))

    def add_bucket(t: pa.Table) -> pa.Table:
        q = t.column("query_id").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(q, dtype=np.int64))
        return t.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def merge_topk(t: pa.Table) -> pa.Table:
        q = t.column("query_id").to_numpy(zero_copy_only=False)
        s = t.column("sim").to_numpy(zero_copy_only=False)
        v = t.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s, q))
        qs = q[order]
        new = np.ones(len(qs), dtype=bool)
        new[1:] = qs[1:] != qs[:-1]
        start = np.flatnonzero(new)
        cnt = np.diff(np.append(start, len(qs)))
        rank = np.arange(len(qs)) - np.repeat(start, cnt)
        keep = np.sort(order[rank < k])
        out = t.take(pa.array(keep))
        return pa.table({
            "query_id": out.column("query_id"),
            "vec_id": out.column("vec_id"),
            "sim": pa.array(np.round(
                out.column("sim").to_numpy(zero_copy_only=False), 6))})

    bucketed = cand.map_batches(add_bucket, batch_format="pyarrow")
    return grouped_exchange_ds(bucketed, "__b", num_buckets,
                               merge_topk, empty_schema=out_schema)


def embedding_quality_audit(ds, emb_col: str = "embedding",
                            id_col: str = "vec_id",
                            expected_dim: int | None = None
                            ) -> "pd.DataFrame":
    """Embedding-table VALIDATION audit — the pre-index gate every
    vector pipeline needs (one NaN poisons a matmul; a zero vector
    breaks cosine; a short vector crashes the stacker): per-vector
    checks collapsed to ONE summary row of exact integers:
    ``n_vecs`` (non-null id+embedding), ``n_null`` (null id or
    embedding), ``n_wrong_dim`` (length ≠ ``expected_dim``; 0 checks
    skipped when None), ``n_nonfinite`` (vectors containing any
    NaN/±Inf), ``n_zero_norm`` (all elements exactly 0.0).

    Pure streaming pass: flatten + parent-index reductions per batch
    (no per-row Python); driver merge is one row per block.
    """
    import pandas as pd
    import pyarrow.compute as pc

    cols = ["n_vecs", "n_null", "n_wrong_dim", "n_nonfinite",
            "n_zero_norm"]

    def partial(b: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(b[id_col]),
                        pc.is_valid(b[emb_col]))
        n_null = b.num_rows - pc.sum(pc.cast(valid, pa.int8())).as_py()
        t = b.filter(valid)
        emb = t[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        lens = pc.list_value_length(emb).to_numpy(
            zero_copy_only=False).astype(np.int64)
        wrong = (int((lens != expected_dim).sum())
                 if expected_dim is not None else 0)
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(emb).to_numpy(
            zero_copy_only=False)
        bad = ~np.isfinite(flat)
        nonfin = np.zeros(t.num_rows, dtype=bool)
        np.logical_or.at(nonfin, parents, bad)
        # zero-norm: max |x| == 0 over finite-only vectors; a vector
        # of ONLY NaNs is nonfinite, not zero
        absmax = np.zeros(t.num_rows, dtype=np.float64)
        np.maximum.at(absmax, parents,
                      np.abs(np.nan_to_num(flat, nan=1.0,
                                           posinf=1.0, neginf=1.0)))
        zero = (absmax == 0.0) & (lens > 0) & ~nonfin
        return pa.table({
            "n_vecs": pa.array([int(t.num_rows)], pa.int64()),
            "n_null": pa.array([int(n_null)], pa.int64()),
            "n_wrong_dim": pa.array([wrong], pa.int64()),
            "n_nonfinite": pa.array([int(nonfin.sum())], pa.int64()),
            "n_zero_norm": pa.array([int(zero.sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({c: pd.Series([0], dtype="int64")
                             for c in cols})
    return pd.DataFrame([{c: int(parts[c].sum()) for c in cols}])


def quantized_dot_pairs_hist(ds, id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             mod: int = 16, bin_width: int = 250_000,
                             num_buckets: int = 16) -> "pd.DataFrame":
    """Embedding-geometry QA on a deterministic PAIRED SAMPLE, fully
    integer-exact: vectors whose id-md5 is ``0 (mod mod)`` are ranked
    by (md5, id) and paired consecutively (rank 0-1, 2-3, ...); each
    pair's embeddings are quantized per-dimension to
    ``floor(1000 * x)`` int64 and dotted; the dots are binned at
    ``bin_width``.  Returns (bin, n_pairs, sum_dot, min_dot, max_dot)
    — a drift fingerprint of the embedding space (random pairs of a
    healthy isotropic space center near 0; a collapsed space piles
    into high-dot bins) that, unlike cosine floats, hash-matches a
    DuckDB oracle exactly (float32→float64 cast and 1000*x floor are
    bit-identical IEEE ops on both sides).

    Scale shape: pass 1 ships only SAMPLED (id, md5) rows to the
    driver — the audit is designed to run on a 1/``mod`` slice, and
    ``mod`` grows with the corpus so the sampled id vector stays
    audit-sized (documented cap, same contract as ann audits).  The
    pair map broadcasts once (``ray.put``); pass 2 routes ONLY
    sampled embeddings through a pair-keyed exchange where each merge
    dots its pairs with one reshape + einsum — full vectors never
    visit the driver.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def sample_ids(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[emb_col])))
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        h = md5_u64le(pc.cast(pa.array(ids), pa.string()))
        sel = (h % np.uint64(mod)) == 0
        return pa.table({"id": pa.array(ids[sel]),
                         "h": pa.array(h[sel])})

    idh = (ds.select_columns([id_col, emb_col])
           .map_batches(sample_ids, batch_format="pyarrow")
           .to_pandas())
    order = np.lexsort((idh.id.to_numpy(),
                        idh.h.to_numpy(np.uint64)))
    ids_ranked = idh.id.to_numpy(np.int64)[order]
    n_pairs = len(ids_ranked) // 2
    ids_ranked = ids_ranked[:2 * n_pairs]
    pair = np.repeat(np.arange(n_pairs, dtype=np.int64), 2)
    cols = ("bin", "n_pairs", "sum_dot", "min_dot", "max_dot")
    if n_pairs == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    lk_order = np.argsort(ids_ranked, kind="stable")
    lk_ids = ids_ranked[lk_order]
    lk_pair = pair[lk_order]
    ref = ray.put((lk_ids, lk_pair))

    def route(b: pa.Table) -> pa.Table:
        k, p = ray.get(ref)
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[emb_col])))
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, ids), 0, max(len(k) - 1, 0))
        hit = k[pos] == ids if len(k) else np.zeros(len(ids), bool)
        m = _emb_matrix(b, emb_col)[hit]
        q = np.floor(1000.0 * m).astype(np.int64)
        pr = p[pos[hit]]
        dim = q.shape[1] if q.size else 0
        offsets = np.arange(len(q) + 1, dtype=np.int64) * dim
        qlist = pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(q.ravel()))
        return pa.table({
            "__b": pa.array(pr % num_buckets),
            "pair": pa.array(pr),
            "id": pa.array(ids[hit]),
            "q": qlist})

    def dot_merge(t: pa.Table) -> pa.Table:
        pr = t.column("pair").to_numpy(zero_copy_only=False)
        idv = t.column("id").to_numpy(zero_copy_only=False)
        flat = as_array(t.column("q")).flatten().to_numpy(
            zero_copy_only=False)
        n = len(pr)
        if n == 0:
            e = np.empty(0, np.int64)
            return pa.table({"pair": pa.array(e), "dot": pa.array(e)})
        dim = len(flat) // n
        q = flat.reshape(n, dim)
        order = np.lexsort((idv, pr))
        pr, q = pr[order], q[order]
        # every pair has exactly two member rows in this bucket
        a, b_ = q[0::2], q[1::2]
        dots = np.einsum("ij,ij->i", a, b_)
        return pa.table({"pair": pa.array(pr[0::2]),
                         "dot": pa.array(dots)})

    tagged = (ds.select_columns([id_col, emb_col])
              .map_batches(route, batch_format="pyarrow"))
    out = grouped_exchange(tagged, "__b", num_buckets, dot_merge)
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    dots = out.column("dot").to_numpy(zero_copy_only=False)
    bins = np.floor(dots / float(bin_width)).astype(np.int64)
    df = (pd.DataFrame({"bin": bins, "dot": dots})
          .groupby("bin", as_index=False)
          .agg(n_pairs=("dot", "size"), sum_dot=("dot", "sum"),
               min_dot=("dot", "min"), max_dot=("dot", "max")))
    return (df.sort_values("bin").reset_index(drop=True)
            .astype("int64"))


def _label_dim_sums(ds, emb_col: str, label_col: str):
    """Per-(label, dim) integer coordinate sums over quantized
    embeddings ``q = floor(1000·x)`` plus the label's vector count —
    the shared pass-1 of :func:`centroid_confusion` and
    :func:`label_influence`.  Streams k×dim partials per batch; the
    driver merge is k·dim-sized, never corpus-sized.  Returns a pandas
    frame ``(label, dim, s, n)``."""
    import pandas as pd
    import pyarrow.compute as pc

    def sums(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[emb_col]),
                             pc.is_valid(b[label_col])))
        if b.num_rows == 0:
            e = np.empty(0, np.int64)
            return pa.table({"label": pa.array(e), "dim": pa.array(e),
                             "s": pa.array(e), "n": pa.array(e)})
        q = np.floor(1000.0 * _emb_matrix(b, emb_col)).astype(np.int64)
        lab = pc.cast(b[label_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ul, inv = np.unique(lab, return_inverse=True)
        acc = np.zeros((len(ul), q.shape[1]), dtype=np.int64)
        np.add.at(acc, inv, q)
        cnt = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        k, d = acc.shape
        return pa.table({
            "label": pa.array(np.repeat(ul, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "s": pa.array(acc.ravel()),
            "n": pa.array(np.repeat(cnt, d))})

    parts = (ds.select_columns([emb_col, label_col])
             .map_batches(sums, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return parts
    return (parts.groupby(["label", "dim"], as_index=False)
            .agg(s=("s", "sum"), n=("n", "sum")))


def label_influence(ds, emb_col: str = "embedding",
                    label_col: str = "label") -> pd.DataFrame:
    """LABEL-CENTROID displacement audit — "which label's examples
    pull hardest away from the corpus center?" (the class-imbalance /
    collapsed-cluster screen a curator runs before contrastive
    training): per label, the cross-multiplied integer L1 distance
    between the label centroid and the GLOBAL centroid,
    ``l1_x = Σ_d |s_{l,d}·N − S_d·n_l|`` over quantized coordinates
    (``s``/``S`` per-label / global coordinate sums of
    ``floor(1000·x)``, ``n_l``/``N`` per-label / global counts) — an
    exact integer, zero float drift, SQL-restatable.  Null rows drop.
    Returns ``(label, n, l1_x)`` sorted by label.

    Scale shape: one streaming pass of k×dim partials
    (`_label_dim_sums`); the surface is computed on a k·dim-sized
    driver frame.  Bound: |s·N| ≤ 1000·n_l·N — int64-safe through
    ~10^6 × 10^6 rows·labels.
    """
    import pandas as pd

    agg = _label_dim_sums(ds, emb_col, label_col)
    cols = ("label", "n", "l1_x")
    if agg.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    g = (agg.groupby("dim", as_index=False)
         .agg(gs=("s", "sum"), gn=("n", "sum")))
    j = agg.merge(g, on="dim")
    j["term"] = (j.s * j.gn - j.gs * j.n).abs()
    out = (j.groupby("label", as_index=False)
           .agg(n=("n", "max"), l1_x=("term", "sum")))
    return (out.sort_values("label").reset_index(drop=True)
            .astype("int64"))


def centroid_confusion(ds, emb_col: str = "embedding",
                       label_col: str = "label") -> pd.DataFrame:
    """LABEL-NOISE audit by nearest-centroid assignment — "which
    labels' examples actually sit closer to another label's center?"
    (the confusion matrix a training-data curator reads before
    trusting weak labels): each label's INTEGER centroid is
    ``floor(1000·Σx_d / n)`` per dim over quantized coordinates
    ``floor(1000·x)``; every vector is assigned to the centroid with
    the maximal integer dot product (tie → smallest label), and the
    (label, assigned) pairs reduce to counts.  All arithmetic is
    int64-exact, so the surface restates in SQL bit-for-bit.  Null
    embedding/label rows drop.  Returns ``(label, assigned, n)``
    sorted by (label, assigned) — at most k² rows for k labels.

    Scale shape: pass 1 streams per-batch (label, dim) integer sums —
    k×dim partials per batch, merged on the driver (k·dim-sized, not
    corpus-sized); the k×dim centroid matrix broadcasts via
    ``ray.put``; pass 2 is one matmul per batch emitting k² count
    partials.  Bound: |dot| ≤ 1000·1000·dim < 2^36 — no overflow.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    agg = _label_dim_sums(ds, emb_col, label_col)
    cols = ("label", "assigned", "n")
    if agg.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    labels = np.sort(agg.label.unique())
    dmax = int(agg.dim.max()) + 1
    cent = np.zeros((len(labels), dmax), dtype=np.int64)
    pos = {int(l): i for i, l in enumerate(labels)}
    cent[[pos[int(l)] for l in agg.label],
         agg.dim.to_numpy()] = (1000 * agg.s.to_numpy()) \
        // agg.n.to_numpy()
    ref = ray.put((labels.astype(np.int64), cent))

    def assign(b: pa.Table) -> pa.Table:
        labs, c = ray.get(ref)
        b = b.filter(pc.and_(pc.is_valid(b[emb_col]),
                             pc.is_valid(b[label_col])))
        if b.num_rows == 0:
            e = np.empty(0, np.int64)
            return pa.table({"label": pa.array(e),
                             "assigned": pa.array(e),
                             "n": pa.array(e)})
        q = np.floor(1000.0 * _emb_matrix(b, emb_col)).astype(np.int64)
        lab = pc.cast(b[label_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        scores = q @ c.T  # int64-exact
        best = labs[np.argmax(scores, axis=1)]  # first max = min label
        key = lab * (labs.max() + 1) + best
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"label": pa.array(uk // (labs.max() + 1)),
                         "assigned": pa.array(uk % (labs.max() + 1)),
                         "n": pa.array(cnt.astype(np.int64))})

    out = (ds.select_columns([emb_col, label_col])
           .map_batches(assign, batch_format="pyarrow").to_pandas())
    out = (out.groupby(["label", "assigned"], as_index=False)
           .agg(n=("n", "sum")))
    return (out.sort_values(["label", "assigned"])
            .reset_index(drop=True).astype("int64"))


def scatter_ratio(ds, emb_col: str = "embedding",
                  label_col: str = "label") -> pd.DataFrame:
    """FISHER-STYLE cluster-separability surface — "are the labels
    actually separated in embedding space, or is the labeling noise?"
    (the go/no-go check before trusting labels for contrastive or
    classifier training): per label, the WITHIN scatter
    ``Σ_v Σ_d (q_vd − m_{l,d})²`` of quantized coordinates
    ``q = floor(1000·x)`` around the label's SAME-UNIT integer
    centroid ``m = floor(Σq/n)``, and the BETWEEN term
    ``n_l · Σ_d (m_{l,d} − g_d)²`` against the global integer
    centroid ``g`` — both int64-exact (|q−m| ≤ ~2000, squared ≤
    4·10⁶, × dims × rows stays far under 2⁶³), so a high
    between/within ratio is a bit-for-bit SQL-checkable separability
    verdict.  Null rows drop.  Returns
    ``(label, n, within_x, between_x)`` sorted by label.

    Scale shape: pass 1 is the shared `_label_dim_sums` partials
    pass; pass 2 broadcasts the k×dim centroid matrix and streams
    per-batch within-scatter partials (k rows per batch).
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    agg = _label_dim_sums(ds, emb_col, label_col)
    cols = ("label", "n", "within_x", "between_x")
    if agg.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    labels = np.sort(agg.label.unique())
    dmax = int(agg.dim.max()) + 1
    cent = np.zeros((len(labels), dmax), dtype=np.int64)
    pos = {int(l): i for i, l in enumerate(labels)}
    cent[[pos[int(l)] for l in agg.label],
         agg.dim.to_numpy()] = agg.s.to_numpy() // agg.n.to_numpy()
    # global integer centroid over ALL vectors (same q units)
    g = (agg.groupby("dim").agg(gs=("s", "sum"), gn=("n", "sum"))
         .sort_index())
    gcent = g.gs.to_numpy(np.int64) // g.gn.to_numpy(np.int64)
    n_l = (agg.groupby("label").n.max()
           .reindex(labels).to_numpy(np.int64))
    between = n_l * ((cent - gcent[None, :]) ** 2).sum(axis=1)
    ref = ray.put((labels.astype(np.int64), cent))

    def within(b: pa.Table) -> pa.Table:
        labs, c = ray.get(ref)
        b = b.filter(pc.and_(pc.is_valid(b[emb_col]),
                             pc.is_valid(b[label_col])))
        if b.num_rows == 0:
            e = np.empty(0, np.int64)
            return pa.table({"label": pa.array(e),
                             "w": pa.array(e)})
        q = np.floor(1000.0 * _emb_matrix(b, emb_col)).astype(np.int64)
        lab = pc.cast(b[label_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        idx = np.searchsorted(labs, lab)
        diff = q - c[idx]
        w = (diff * diff).sum(axis=1)
        ul, inv = np.unique(lab, return_inverse=True)
        acc = np.zeros(len(ul), dtype=np.int64)
        np.add.at(acc, inv, w)
        return pa.table({"label": pa.array(ul), "w": pa.array(acc)})

    parts = (ds.select_columns([emb_col, label_col])
             .map_batches(within, batch_format="pyarrow").to_pandas())
    wsum = (parts.groupby("label").w.sum()
            .reindex(labels).fillna(0).to_numpy(np.int64))
    return pd.DataFrame({
        "label": labels.astype(np.int64), "n": n_l,
        "within_x": wsum, "between_x": between}).astype("int64")


def centroid_distances(ds, emb_col: str = "embedding",
                       label_col: str = "label") -> pd.DataFrame:
    """PAIRWISE label-centroid geometry — which label pairs sit close
    enough to confuse a classifier (the companion matrix to
    :func:`scatter_ratio`'s within/between verdict and
    :func:`centroid_confusion`'s realized confusion): for every label
    pair a < b, the exact integer squared L2 distance between the
    SAME-UNIT integer centroids ``m = floor(Σq/n)`` over quantized
    coordinates ``q = floor(1000·x)``.  Null rows drop.  Returns
    ``(label_a, label_b, n_a, n_b, l2sq_x)`` sorted by (a, b) —
    C(k, 2) rows for k labels.

    Scale shape: one `_label_dim_sums` streaming pass; the pairwise
    matrix is k²·dim driver work on a k×dim frame.
    """
    import pandas as pd

    agg = _label_dim_sums(ds, emb_col, label_col)
    cols = ("label_a", "label_b", "n_a", "n_b", "l2sq_x")
    if agg.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    labels = np.sort(agg.label.unique())
    dmax = int(agg.dim.max()) + 1
    cent = np.zeros((len(labels), dmax), dtype=np.int64)
    pos = {int(l): i for i, l in enumerate(labels)}
    cent[[pos[int(l)] for l in agg.label],
         agg.dim.to_numpy()] = agg.s.to_numpy() // agg.n.to_numpy()
    n_l = (agg.groupby("label").n.max()
           .reindex(labels).to_numpy(np.int64))
    ia, ib = np.triu_indices(len(labels), k=1)
    diff = cent[ia] - cent[ib]
    d2 = (diff * diff).sum(axis=1)
    return pd.DataFrame({
        "label_a": labels[ia].astype(np.int64),
        "label_b": labels[ib].astype(np.int64),
        "n_a": n_l[ia], "n_b": n_l[ib],
        "l2sq_x": d2}).astype("int64")


def gram_matrix_quantized(ds, emb_col: str = "embedding",
                          id_col: str = "vec_id",
                          quant: int = 1000) -> "pd.DataFrame":
    """Exact integer Gram matrix of the quantized embedding corpus —
    the covariance/PCA precursor computed distributed: for every dim
    pair ``i <= j`` (1-based), ``sum over vectors of q_i * q_j`` with
    ``q = floor(quant * x)`` int64 per component.  SQL parity: double
    unnest + self-join on the vector id (the repo's
    ``floor(1000.0*x)`` quantization convention,
    `embeddings_quantized_dot_hist`).

    Scale shape: each batch computes ONE ``Qᵀ @ Q`` matmul (float64 on
    int-valued operands — exact below 2⁵³, far above any real batch's
    partial) and emits a dim²-sized partial; the driver merges
    #blocks × dim² tiny tables.  Zero shuffle.  Rows with a null id or
    null embedding drop (restated in the SQL).
    """
    import pandas as pd
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                             pc.is_valid(b[emb_col])))
        if b.num_rows == 0:
            return pa.table({"i": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        q = np.floor(quant * _emb_matrix(b, emb_col))
        g = (q.T @ q)  # int-valued float64, exact
        dim = g.shape[0]
        iu, ju = np.triu_indices(dim)
        return pa.table({
            "i": pa.array((iu + 1).astype(np.int64)),
            "j": pa.array((ju + 1).astype(np.int64)),
            "s": pa.array(np.rint(g[iu, ju]).astype(np.int64))})

    parts = (ds.select_columns([id_col, emb_col])
             .map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    if not len(parts):
        return pd.DataFrame({"i": pd.Series(dtype="int64"),
                             "j": pd.Series(dtype="int64"),
                             "s": pd.Series(dtype="int64")})
    out = parts.groupby(["i", "j"], as_index=False)["s"].sum()
    return (out.sort_values(["i", "j"]).reset_index(drop=True)
            .astype("int64"))


def knn_label_agreement(ds, emb_col: str = "embedding",
                        id_col: str = "vec_id",
                        label_col: str = "label",
                        quant: int = 1000,
                        concurrency: int = 4) -> "pd.DataFrame":
    """Label-noise audit via 1-nearest-neighbor agreement: for every
    labeled vector, find its single most-similar OTHER vector by EXACT
    integer quantized dot (``q = floor(quant*x)``, ties dot DESC then
    vec_id ASC) and report, per label, how often the neighbor carries
    the same label — low agreement marks label noise or class overlap
    (the kNN sibling of ``centroid_label_confusion``, which only sees
    class centroids).

    Shape (block-nested-loop, `knn_join`'s object-store pattern with
    integer scores): quantized corpus chunks stay in the object store,
    each scoring actor fetches them ONCE in ``__init__``
    (ray.wait-before-pool deadlock guard, pool ≤ CPUs−1); one
    streaming pass over the corpus computes one matmul per chunk and
    folds the running (dot, id)-lexicographic best across chunks, so
    each batch leaves only a labels²-bounded partial.  The matmul runs
    in float64 on int-valued operands — exact below 2⁵³ (|dot| ≤
    dim·quant² ≈ 2³⁶ at dim 64).  Rows with null id/embedding/label
    are excluded from BOTH sides (restated in the SQL).
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    @ray.remote
    def prep_chunk(t: pa.Table):
        t = t.filter(pc.and_(pc.is_valid(t[id_col]),
                             pc.and_(pc.is_valid(t[emb_col]),
                                     pc.is_valid(t[label_col]))))
        if t.num_rows == 0:
            return None
        ids = np.asarray(t.column(id_col).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ids, kind="stable")  # argmax tie => min id
        q = np.floor(quant * _emb_matrix(t, emb_col))[order]
        labels = np.asarray(t.column(label_col).to_numpy(
            zero_copy_only=False), dtype=np.int64)[order]
        return q, ids[order], labels

    chunk_refs = [prep_chunk.remote(r) for r in
                  ds.select_columns([id_col, emb_col, label_col])
                  .to_arrow_refs()]
    ray.wait(chunk_refs, num_returns=len(chunk_refs))
    avail = int(ray.cluster_resources().get("CPU", 8))
    concurrency = max(1, min(concurrency, avail - 1))
    NEG = np.iinfo(np.int64).min

    class _Agree:
        def __init__(self):
            self.chunks = [c for c in ray.get(chunk_refs)
                           if c is not None]

        def __call__(self, b: pa.Table) -> pa.Table:
            b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                                 pc.and_(pc.is_valid(b[emb_col]),
                                         pc.is_valid(b[label_col]))))
            empty = pa.table({
                "label": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "n_agree": pa.array([], type=pa.int64())})
            if b.num_rows == 0:
                return empty
            qb = np.floor(quant * _emb_matrix(b, emb_col))
            rid = np.asarray(b.column(id_col).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            rlab = np.asarray(b.column(label_col).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            best = np.full(len(rid), NEG, np.int64)
            best_id = np.full(len(rid), np.iinfo(np.int64).max,
                              np.int64)
            best_lab = np.zeros(len(rid), np.int64)
            for m, ids, labels in self.chunks:
                d = np.rint(qb @ m.T).astype(np.int64)
                d[rid[:, None] == ids[None, :]] = NEG  # exclude self
                c = np.argmax(d, axis=1)  # first max = min id (sorted)
                rows = np.arange(len(rid))
                dot, cid, clab = d[rows, c], ids[c], labels[c]
                upd = (dot > best) | ((dot == best)
                                      & (cid < best_id))
                upd &= dot != NEG
                best[upd], best_id[upd] = dot[upd], cid[upd]
                best_lab[upd] = clab[upd]
            has_nn = best != NEG
            la, lb = rlab[has_nn], best_lab[has_nn]
            ul, inv = np.unique(la, return_inverse=True)
            n = np.bincount(inv, minlength=len(ul))
            agree = np.bincount(inv, weights=(la == lb),
                                minlength=len(ul))
            return pa.table({
                "label": pa.array(ul),
                "n": pa.array(n.astype(np.int64)),
                "n_agree": pa.array(agree.astype(np.int64))})

    parts = (ds.select_columns([id_col, emb_col, label_col])
             .map_batches(_Agree, batch_format="pyarrow",
                          concurrency=concurrency)
             .to_pandas())
    if not len(parts):
        return pd.DataFrame({"label": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "n_agree": pd.Series(dtype="int64"),
                             "agree_pm": pd.Series(dtype="int64")})
    out = parts.groupby("label", as_index=False).sum()
    out["agree_pm"] = (1000 * out.n_agree.to_numpy(np.int64)
                       // out.n.to_numpy(np.int64))
    return (out.sort_values("label").reset_index(drop=True)
            .astype("int64"))


def centroid_margin_stats(ds, emb_col: str = "embedding",
                          label_col: str = "label") -> pd.DataFrame:
    """CLASSIFICATION-MARGIN audit over label centroids — "how far is
    each label's mass from the nearest competing centroid?" (the
    magnitude companion to :func:`centroid_confusion`, which only
    counts flips): per vector, ``margin = dot(q, m_own) - max_{l'≠l}
    dot(q, m_l')`` with the same integer contract (``q =
    floor(1000·x)``, ``m = floor(1000·Σq/n)``), reduced per label to
    ``n, n_nonpos`` (margin ≤ 0: the vector is NOT strictly closest
    to its own centroid), ``sum_margin, min_margin`` — all
    int64-exact (|dot| ≤ 10⁶·dim), so the surface restates in SQL
    bit-for-bit.  Requires ≥ 2 labels; null rows drop.

    Scale shape: pass 1 streams (label, dim) integer-sum partials
    (k·dim per batch); the k×dim centroid matrix broadcasts via
    ``ray.put``; pass 2 is one matmul per batch emitting k-row margin
    partials.  Nothing corpus-sized leaves the workers.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    agg = _label_dim_sums(ds, emb_col, label_col)
    cols = ("label", "n", "n_nonpos", "sum_margin", "min_margin")
    if agg.empty or agg.label.nunique() < 2:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    labels = np.sort(agg.label.unique())
    dmax = int(agg.dim.max()) + 1
    cent = np.zeros((len(labels), dmax), dtype=np.int64)
    pos = {int(l): i for i, l in enumerate(labels)}
    cent[[pos[int(l)] for l in agg.label],
         agg.dim.to_numpy()] = (1000 * agg.s.to_numpy()) \
        // agg.n.to_numpy()
    ref = ray.put((labels.astype(np.int64), cent))

    def margins(b: pa.Table) -> pa.Table:
        labs, c = ray.get(ref)
        b = b.filter(pc.and_(pc.is_valid(b[emb_col]),
                             pc.is_valid(b[label_col])))
        e = np.empty(0, np.int64)
        if b.num_rows == 0:
            return pa.table({"label": pa.array(e), "n": pa.array(e),
                             "n_nonpos": pa.array(e),
                             "sum_margin": pa.array(e),
                             "min_margin": pa.array(e)})
        q = np.floor(1000.0 * _emb_matrix(b, emb_col)).astype(np.int64)
        lab = pc.cast(b[label_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        li = np.searchsorted(labs, lab)
        scores = q @ c.T                      # int64-exact
        own = np.take_along_axis(scores, li[:, None], axis=1)[:, 0]
        masked = scores.copy()
        masked[np.arange(len(li)), li] = np.iinfo(np.int64).min
        margin = own - masked.max(axis=1)
        ul, inv = np.unique(lab, return_inverse=True)
        n = np.bincount(inv, minlength=len(ul))
        nn = np.bincount(inv, weights=(margin <= 0),
                         minlength=len(ul)).astype(np.int64)
        sm = np.zeros(len(ul), np.int64)
        np.add.at(sm, inv, margin)
        mn = np.full(len(ul), np.iinfo(np.int64).max)
        np.minimum.at(mn, inv, margin)
        return pa.table({"label": pa.array(ul),
                         "n": pa.array(n.astype(np.int64)),
                         "n_nonpos": pa.array(nn),
                         "sum_margin": pa.array(sm),
                         "min_margin": pa.array(mn)})

    out = (ds.select_columns([emb_col, label_col])
           .map_batches(margins, batch_format="pyarrow").to_pandas())
    out = (out.groupby("label", as_index=False)
           .agg(n=("n", "sum"), n_nonpos=("n_nonpos", "sum"),
                sum_margin=("sum_margin", "sum"),
                min_margin=("min_margin", "min")))
    return (out.sort_values("label").reset_index(drop=True)
            .astype("int64"))


def norm_log_hist(ds, emb_col: str = "embedding") -> pd.DataFrame:
    """Embedding NORM census — the dead/exploded-vector audit run
    before trusting cosine math downstream: per vector, the exact
    integer squared norm ``s2 = Σ q_d²`` of quantized coordinates
    ``q = floor(1000·x)`` (unit vectors land near 10⁶), log2-binned
    at ``bin = floor(log2(s2 // 10⁶ + 1))`` so bin 0 holds healthy
    unit-ish vectors and higher bins the exploded tail.  Null
    embeddings drop.

    Scale shape: pure streaming map — each batch emits per-bin count
    partials (histogram-sized), no shuffle.  The bit length uses
    exact float64 exponent extraction (``np.frexp``).
    Returns ``(bin, n_vecs)`` sorted by bin.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[emb_col]))
        if b.num_rows == 0:
            e = np.empty(0, np.int64)
            return pa.table({"bin": pa.array(e), "n_vecs": pa.array(e)})
        q = np.floor(1000.0 * _emb_matrix(b, emb_col)).astype(np.int64)
        s2 = (q * q).sum(axis=1)
        k = s2 // 1_000_000 + 1
        bins = (np.frexp(k.astype(np.float64))[1] - 1).astype(np.int64)
        ub, cnt = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(ub.astype(np.int64)),
                         "n_vecs": pa.array(cnt.astype(np.int64))})

    out = (ds.select_columns([emb_col])
           .map_batches(part, batch_format="pyarrow").to_pandas())
    if not len(out):
        return pd.DataFrame({"bin": pd.Series(dtype="int64"),
                             "n_vecs": pd.Series(dtype="int64")})
    out = out.groupby("bin", as_index=False)["n_vecs"].sum()
    return (out.sort_values("bin").reset_index(drop=True)
            .astype("int64"))


def nn_indegree_histogram(ds, emb_col: str = "embedding",
                          id_col: str = "vec_id",
                          quant: int = 1000,
                          concurrency: int = 4) -> "pd.DataFrame":
    """HUBNESS audit over the exact 1-NN graph: for every vector find
    its single most-similar OTHER vector by EXACT integer quantized
    dot (``q = floor(quant*x)``, ties dot DESC then id ASC — the
    :func:`knn_label_agreement` contract) and histogram the resulting
    in-degrees, INCLUDING the degree-0 row (anti-hubs).  A heavy tail
    of high in-degree "hub" vectors marks degenerate embeddings that
    poison kNN-based dedup/curation (Radovanovic et al., JMLR 2010).

    Scale shape: quantized corpus chunks stay in the object store and
    each scoring actor fetches them once in ``__init__``
    (ray.wait-before-pool deadlock guard, pool <= CPUs-1); one
    streaming pass folds each row's running (dot, id) best across
    chunks and emits per-batch (nn_id, count) partials — only
    id-keyed counts leave the workers, never pairs.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    @ray.remote
    def prep_chunk(t: pa.Table):
        t = t.filter(pc.and_(pc.is_valid(t[id_col]),
                             pc.is_valid(t[emb_col])))
        if t.num_rows == 0:
            return None
        ids = np.asarray(t.column(id_col).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ids, kind="stable")  # argmax tie => min id
        q = np.floor(quant * _emb_matrix(t, emb_col))[order]
        return q, ids[order]

    chunk_refs = [prep_chunk.remote(r) for r in
                  ds.select_columns([id_col, emb_col])
                  .to_arrow_refs()]
    ray.wait(chunk_refs, num_returns=len(chunk_refs))
    avail = int(ray.cluster_resources().get("CPU", 8))
    concurrency = max(1, min(concurrency, avail - 1))
    NEG = np.iinfo(np.int64).min

    class _Best:
        def __init__(self):
            self.chunks = [c for c in ray.get(chunk_refs)
                           if c is not None]

        def __call__(self, b: pa.Table) -> pa.Table:
            b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                                 pc.is_valid(b[emb_col])))
            empty = pa.table({
                "nn_id": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
                "n_rows": pa.array([], type=pa.int64())})
            if b.num_rows == 0:
                return empty
            qb = np.floor(quant * _emb_matrix(b, emb_col))
            rid = np.asarray(b.column(id_col).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            best = np.full(len(rid), NEG, np.int64)
            best_id = np.full(len(rid), np.iinfo(np.int64).max,
                              np.int64)
            for m, ids in self.chunks:
                d = np.rint(qb @ m.T).astype(np.int64)
                d[rid[:, None] == ids[None, :]] = NEG  # exclude self
                c = np.argmax(d, axis=1)  # first max = min id (sorted)
                rows = np.arange(len(rid))
                dot, cid = d[rows, c], ids[c]
                upd = (dot > best) | ((dot == best) & (cid < best_id))
                upd &= dot != NEG
                best[upd], best_id[upd] = dot[upd], cid[upd]
            has_nn = best != NEG
            un, cnt = np.unique(best_id[has_nn], return_counts=True)
            n_rows = np.zeros(len(un), np.int64)
            if len(n_rows):
                n_rows[0] = len(rid)
            elif len(rid):  # batch had rows but no neighbors anywhere
                return pa.table({
                    "nn_id": pa.array([np.iinfo(np.int64).max]),
                    "c": pa.array([0], type=pa.int64()),
                    "n_rows": pa.array([len(rid)], type=pa.int64())})
            return pa.table({"nn_id": pa.array(un),
                             "c": pa.array(cnt.astype(np.int64)),
                             "n_rows": pa.array(n_rows)})

    parts = (ds.select_columns([id_col, emb_col])
             .map_batches(_Best, batch_format="pyarrow",
                          concurrency=concurrency)
             .to_pandas())
    cols = ("indegree", "n_vecs")
    if not len(parts) or parts.n_rows.sum() == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    n_total = int(parts.n_rows.sum())
    deg = (parts[parts.c > 0].groupby("nn_id")["c"].sum()
           .to_numpy(np.int64))
    ud, dc = np.unique(deg, return_counts=True)
    n_zero = n_total - len(deg)
    if n_zero > 0:
        ud = np.concatenate([[0], ud])
        dc = np.concatenate([[n_zero], dc])
    return pd.DataFrame({"indegree": ud.astype(np.int64),
                         "n_vecs": dc.astype(np.int64)})


def knn_confusion(ds, emb_col: str = "embedding",
                  id_col: str = "vec_id",
                  label_col: str = "label",
                  quant: int = 1000,
                  concurrency: int = 4) -> "pd.DataFrame":
    """Full 1-NN label CONFUSION MATRIX (label, nn_label, n) — the
    matrix companion to :func:`knn_label_agreement`, which only
    reports the diagonal rate: which class pairs bleed into each
    other under the exact quantized-dot 1-NN rule (ties dot DESC,
    id ASC; self excluded; null rows drop from both sides).

    Same scale shape as the agreement op: quantized corpus chunks in
    the object store, fetched once per actor in ``__init__``
    (ray.wait-before-pool guard, pool <= CPUs-1); each batch folds a
    running best across chunks and emits labels^2-bounded partials.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    @ray.remote
    def prep_chunk(t: pa.Table):
        t = t.filter(pc.and_(pc.is_valid(t[id_col]),
                             pc.and_(pc.is_valid(t[emb_col]),
                                     pc.is_valid(t[label_col]))))
        if t.num_rows == 0:
            return None
        ids = np.asarray(t.column(id_col).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ids, kind="stable")  # argmax tie => min id
        q = np.floor(quant * _emb_matrix(t, emb_col))[order]
        labels = np.asarray(t.column(label_col).to_numpy(
            zero_copy_only=False), dtype=np.int64)[order]
        return q, ids[order], labels

    chunk_refs = [prep_chunk.remote(r) for r in
                  ds.select_columns([id_col, emb_col, label_col])
                  .to_arrow_refs()]
    ray.wait(chunk_refs, num_returns=len(chunk_refs))
    avail = int(ray.cluster_resources().get("CPU", 8))
    concurrency = max(1, min(concurrency, avail - 1))
    NEG = np.iinfo(np.int64).min

    class _Conf:
        def __init__(self):
            self.chunks = [c for c in ray.get(chunk_refs)
                           if c is not None]

        def __call__(self, b: pa.Table) -> pa.Table:
            b = b.filter(pc.and_(pc.is_valid(b[id_col]),
                                 pc.and_(pc.is_valid(b[emb_col]),
                                         pc.is_valid(b[label_col]))))
            empty = pa.table({
                "label": pa.array([], type=pa.int64()),
                "nn_label": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64())})
            if b.num_rows == 0:
                return empty
            qb = np.floor(quant * _emb_matrix(b, emb_col))
            rid = np.asarray(b.column(id_col).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            rlab = np.asarray(b.column(label_col).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            best = np.full(len(rid), NEG, np.int64)
            best_id = np.full(len(rid), np.iinfo(np.int64).max,
                              np.int64)
            best_lab = np.zeros(len(rid), np.int64)
            for m, ids, labels in self.chunks:
                d = np.rint(qb @ m.T).astype(np.int64)
                d[rid[:, None] == ids[None, :]] = NEG
                c = np.argmax(d, axis=1)
                rows = np.arange(len(rid))
                dot, cid, clab = d[rows, c], ids[c], labels[c]
                upd = (dot > best) | ((dot == best) & (cid < best_id))
                upd &= dot != NEG
                best[upd], best_id[upd] = dot[upd], cid[upd]
                best_lab[upd] = clab[upd]
            has_nn = best != NEG
            la, lb = rlab[has_nn], best_lab[has_nn]
            # labels fit small ints: dense 2-D cell encoding
            width = int(max(la.max(), lb.max())) + 1 if len(la) else 1
            cell = la * width + lb
            uc, cnt = np.unique(cell, return_counts=True)
            return pa.table({
                "label": pa.array((uc // width).astype(np.int64)),
                "nn_label": pa.array((uc % width).astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64))})

    parts = (ds.select_columns([id_col, emb_col, label_col])
             .map_batches(_Conf, batch_format="pyarrow",
                          concurrency=concurrency)
             .to_pandas())
    cols = ("label", "nn_label", "n")
    if not len(parts):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    out = (parts.groupby(["label", "nn_label"], as_index=False)
           ["n"].sum())
    return (out.sort_values(["label", "nn_label"])
            .reset_index(drop=True).astype("int64"))


def kmeans_assign_ds(ds, k: int = 8, id_col: str = "vec_id",
                     emb_col: str = "embedding",
                     label_col: str = "label",
                     dim_slice: tuple[int, int] | None = None):
    """Integer-exact distributed k-means (Lloyd 1982), the iterative
    refinement pattern the IVF quantizer (ivf_train_centroids)
    approximates in one shot: per-dim ``floor(1000*x)`` int64
    quantization (the repo-wide quantized-embedding contract), init =
    the k smallest ids' vectors, then assign -> mean update (floor of
    the exact rational; an EMPTY cluster keeps its centroid) ->
    assign.  Every distance, argmin tie rule (smallest cluster index)
    and the floored update are restatable in SQL, so the full two-
    assignment trajectory is oracle-pinned.

    Distributed shape: centroids (k x d ints, a few KB) broadcast in
    the batch closure; per-batch partials are (k x d) component sums
    + counts — rows never shuffle, the driver folds k*d cells per
    batch and rebroadcasts.  Returns a Dataset (id, label, cluster,
    dist2) that stays in the object store; callers aggregate.
    Assignment distances use the |q|^2 - 2qC' + |c|^2 expansion —
    one int64 matmul per batch, no (n,k,d) intermediate.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def _quantize(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b[id_col]),
                       pc.is_valid(b[emb_col]))
        b = b.filter(keep)
        emb = b[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False)
        n = b.num_rows
        d = len(flat) // max(n, 1)
        q = np.floor(1000.0 * flat.astype(np.float64)
                     ).astype(np.int64)
        if dim_slice is not None:
            # product-quantization subspace: cluster only dims
            # [lo, hi) — the PQ codebook path (Jegou et al. 2011)
            lo, hi = dim_slice
            q = q.reshape(n, d)[:, lo:hi].ravel()
            d = hi - lo
        return pa.table({
            "id": pc.cast(b[id_col], pa.int64()),
            "label": pc.cast(b[label_col], pa.int64()),
            "q": pa.FixedSizeListArray.from_arrays(pa.array(q), d),
        })

    def _qmat(t: pa.Table) -> np.ndarray:
        qcol = t.column("q")
        if isinstance(qcol, pa.ChunkedArray):
            qcol = qcol.combine_chunks()
        flat = pc.list_flatten(qcol).to_numpy(zero_copy_only=False)
        return flat.reshape(t.num_rows, -1).astype(np.int64)

    qds = ds.map_batches(_quantize, batch_format="pyarrow"
                         ).materialize()

    def topk(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy(zero_copy_only=False)
        idx = np.argsort(ids, kind="stable")[:k]
        return b.take(pa.array(idx))

    sdf = (qds.map_batches(topk, batch_format="pyarrow")
           .to_pandas().sort_values("id").head(k))
    c = np.stack(sdf.q.to_numpy()).astype(np.int64)  # k x d

    def assign(Q, C):
        d2 = ((Q * Q).sum(1)[:, None]
              - 2 * Q @ C.T + (C * C).sum(1)[None, :])
        j = np.argmin(d2, axis=1)  # ties -> smallest cluster index
        return j, d2[np.arange(len(j)), j]

    def partials(b: pa.Table, C=c) -> pa.Table:
        Q = _qmat(b)
        j, _ = assign(Q, C)
        k_, d_ = C.shape
        s = np.zeros((k_, d_), np.int64)
        np.add.at(s, j, Q)
        n = np.bincount(j, minlength=k_).astype(np.int64)
        jj = np.repeat(np.arange(k_, dtype=np.int64), d_)
        dim = np.tile(np.arange(d_, dtype=np.int64), k_)
        return pa.table({
            "j": pa.array(jj), "dim": pa.array(dim),
            "s": pa.array(s.ravel()),
            "n": pa.array(np.repeat(n, d_))})

    pdf = (qds.map_batches(partials, batch_format="pyarrow")
           .to_pandas().groupby(["j", "dim"], as_index=False)
           [["s", "n"]].sum())
    k_, d_ = c.shape
    s = np.zeros((k_, d_), np.int64)
    n = np.zeros(k_, np.int64)
    s[pdf.j.to_numpy(), pdf.dim.to_numpy()] = pdf.s.to_numpy()
    n_per = pdf[pdf.dim == 0].set_index("j").n
    n[n_per.index.to_numpy()] = n_per.to_numpy()
    c1 = c.copy()
    nz = n > 0
    c1[nz] = np.floor_divide(s[nz], n[nz][:, None])

    def final(b: pa.Table, C=c1) -> pa.Table:
        Q = _qmat(b)
        j, d2 = assign(Q, C)
        return pa.table({
            "id": b["id"], "label": b["label"],
            "cluster": pa.array(j.astype(np.int64)),
            "dist2": pa.array(d2.astype(np.int64))})

    return qds.map_batches(final, batch_format="pyarrow")
