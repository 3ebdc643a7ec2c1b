"""SemDeDup (semantic_dedup_pairs) properties: n_clusters=1 equals the
exact all-pairs scan; precision is exact for any cluster count (every
emitted pair truly has cosine >= tau); recall is cluster-bounded and
the planted near-identical pairs survive clustering."""

import numpy as np
import pyarrow as pa
import pytest

from verify_ray.pipelines.similarity import semantic_dedup_pairs


def _vectors(n=200, dim=16, n_dups=12, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    dup = base[:n_dups] + rng.normal(scale=1e-3, size=(n_dups, dim))
    ids = list(range(n)) + [i + 1_000_000 for i in range(n_dups)]
    m = np.concatenate([base, dup])
    return pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in m],
                              type=pa.list_(pa.float32())),
    }), m, np.asarray(ids)


def _exact_pairs(m, ids, tau):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    S = mn @ mn.T
    r, c = np.nonzero(np.triu(S >= tau, 1))
    a, b = ids[r], ids[c]
    swap = a > b
    return set(zip(np.where(swap, b, a), np.where(swap, a, b)))


def test_single_cluster_equals_exact(ray_session):
    import ray.data as rd

    t, m, ids = _vectors()
    exact = _exact_pairs(m, ids, 0.95)
    assert len(exact) >= 12
    out = semantic_dedup_pairs(rd.from_arrow(t), tau=0.95, n_clusters=1)
    got = set(zip(out.doc_a, out.doc_b))
    assert got == exact


@pytest.mark.parametrize("k", [4, 16])
def test_precision_exact_any_cluster_count(ray_session, k):
    import ray.data as rd

    t, m, ids = _vectors()
    exact = _exact_pairs(m, ids, 0.95)
    out = semantic_dedup_pairs(rd.from_arrow(t), tau=0.95, n_clusters=k)
    got = set(zip(out.doc_a, out.doc_b))
    assert got <= exact                      # no false positives, ever
    # near-identical pairs co-cluster: full recall on the planted set
    planted = {p for p in exact if p[1] >= 1_000_000 and p[0] < 1_000_000
               and p[1] - 1_000_000 == p[0]}
    assert planted <= got


def test_recall_monotone_in_cluster_count(ray_session):
    import ray.data as rd

    t, m, ids = _vectors()
    n1 = len(semantic_dedup_pairs(rd.from_arrow(t), tau=0.95, n_clusters=1))
    n16 = len(semantic_dedup_pairs(rd.from_arrow(t), tau=0.95, n_clusters=16))
    assert n16 <= n1


def test_tiny_input(ray_session):
    import ray.data as rd

    t = pa.table({"vec_id": pa.array([0], type=pa.int64()),
                  "embedding": pa.array([[1.0, 0.0]],
                                        type=pa.list_(pa.float32()))})
    out = semantic_dedup_pairs(rd.from_arrow(t), tau=0.9)
    assert len(out) == 0
