"""knn_join: dataset-to-dataset exact cosine top-k (in-exchange merge)."""

import numpy as np
import pyarrow as pa


def _emb_table(vecs: np.ndarray, ids=None) -> pa.Table:
    n = len(vecs)
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float64()))})


def _ds(tbl: pa.Table, blocks: int = 3):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks)
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)])


def _brute_topk(qvecs, qids, bvecs, bids, k):
    qn = qvecs / np.maximum(np.linalg.norm(qvecs, axis=1, keepdims=True),
                            1e-12)
    bn = bvecs / np.maximum(np.linalg.norm(bvecs, axis=1, keepdims=True),
                            1e-12)
    sims = qn @ bn.T
    ref = set()
    for j, qid in enumerate(qids):
        order = np.lexsort((bids, -sims[j]))
        for b in bids[order][:k]:
            ref.add((int(qid), int(b)))
    return ref


def test_knn_join_matches_bruteforce(ray_session):
    from verify_ray.pipelines.similarity import knn_join

    rng = np.random.default_rng(3)
    base = rng.standard_normal((120, 16))
    qs = rng.standard_normal((17, 16))
    qids = np.arange(1000, 1017, dtype=np.int64)
    out = (knn_join(_ds(_emb_table(qs, qids), 4),
                    _ds(_emb_table(base), 5), k=7, num_buckets=8)
           .to_pandas())
    got = set(zip(out.query_id.astype(int), out.vec_id.astype(int)))
    ref = _brute_topk(qs, qids, base, np.arange(120, dtype=np.int64), 7)
    assert got == ref
    assert (out.groupby("query_id").size() == 7).all()


def test_knn_join_k_exceeds_base(ray_session):
    from verify_ray.pipelines.similarity import knn_join

    rng = np.random.default_rng(4)
    base = rng.standard_normal((5, 8))
    qs = rng.standard_normal((3, 8))
    out = (knn_join(_ds(_emb_table(qs, np.array([7, 8, 9], dtype=np.int64)), 1),
                    _ds(_emb_table(base), 2), k=10, num_buckets=4)
           .to_pandas())
    # every query gets ALL 5 base rows
    assert (out.groupby("query_id").size() == 5).all()


def test_knn_join_empty_query_side(ray_session):
    from verify_ray.pipelines.similarity import knn_join

    rng = np.random.default_rng(5)
    base = rng.standard_normal((10, 8))
    empty = _emb_table(np.empty((0, 8)), np.array([], dtype=np.int64))
    out = knn_join(_ds(empty, 1), _ds(_emb_table(base), 2), k=3,
                   num_buckets=4)
    assert out.count() == 0
    assert out.schema().names == ["query_id", "vec_id", "sim"]
