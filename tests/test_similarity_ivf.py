"""IVF ANN: full-probe exactness + recall monotonicity in nprobe."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_env(ray_session):
    import ray.data as rd

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    qmat = np.stack(emb.column("embedding").to_pylist()[:5]).astype(np.float64)
    qids = emb.column("vec_id").to_pylist()[:5]
    return {"ds": rd.read_parquet(f"{SF}/embeddings.parquet"),
            "q": qmat, "qids": qids}


def test_ivf_full_probe_equals_exact(emb_env):
    from verify_ray.pipelines import similarity

    exact = similarity.ann_topk(emb_env["ds"], emb_env["q"], k=10,
                                query_ids=emb_env["qids"])
    ivf = similarity.ivf_ann_topk(emb_env["ds"], emb_env["q"], k=10,
                                  nprobe=32, n_centroids=32,
                                  query_ids=emb_env["qids"])
    assert (set(zip(exact.query_id, exact.vec_id))
            == set(zip(ivf.query_id, ivf.vec_id)))


def test_ivf_recall_monotone_in_nprobe(emb_env):
    from verify_ray.pipelines import similarity

    exact = similarity.ann_topk(emb_env["ds"], emb_env["q"], k=10,
                                query_ids=emb_env["qids"])
    eset = set(zip(exact.query_id, exact.vec_id))
    cents = similarity.ivf_train_centroids(emb_env["ds"], n_centroids=32)
    recalls = []
    for nprobe in (2, 8, 32):
        ivf = similarity.ivf_ann_topk(emb_env["ds"], emb_env["q"], k=10,
                                      nprobe=nprobe, centroids=cents,
                                      query_ids=emb_env["qids"])
        iset = set(zip(ivf.query_id, ivf.vec_id))
        recalls.append(len(eset & iset) / len(eset))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0
    assert recalls[0] < 1.0  # sub-probe really prunes


def test_lsh_full_hamming_probe_equals_exact(emb_env):
    """probe_hamming >= bits makes every row a candidate -> the LSH scan
    must reproduce the exact top-k (the oracleable configuration)."""
    from verify_ray.pipelines import similarity

    exact = similarity.ann_topk(emb_env["ds"], emb_env["q"], k=10,
                                query_ids=emb_env["qids"])
    lsh = similarity.lsh_ann_topk(emb_env["ds"], emb_env["q"], k=10,
                                  bits=8, tables=1, probe_hamming=8,
                                  query_ids=emb_env["qids"])
    assert (set(zip(exact.query_id, exact.vec_id))
            == set(zip(lsh.query_id, lsh.vec_id)))


def test_lsh_recall_monotone_in_probe_hamming(emb_env):
    from verify_ray.pipelines import similarity

    exact = similarity.ann_topk(emb_env["ds"], emb_env["q"], k=10,
                                query_ids=emb_env["qids"])
    eset = set(zip(exact.query_id, exact.vec_id))
    recalls = []
    for ph in (0, 2, 8):
        lsh = similarity.lsh_ann_topk(emb_env["ds"], emb_env["q"], k=10,
                                      bits=8, tables=2, probe_hamming=ph,
                                      query_ids=emb_env["qids"])
        lset = set(zip(lsh.query_id, lsh.vec_id))
        recalls.append(len(eset & lset) / len(eset))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0
    assert recalls[0] < 1.0  # bucket-only probing really prunes
