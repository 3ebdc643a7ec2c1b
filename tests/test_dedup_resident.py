"""Equivalence tests for the fully dataset-resident MinHash-LSH path
(minhash_lsh_pairs_resident) against the default driver-candidate path
— same pairs, same signature-estimated Jaccard, for int and string doc
ids."""

import numpy as np
import pyarrow as pa
import pytest

from verify_ray.pipelines.dedup import (minhash_lsh_pairs,
                                        minhash_lsh_pairs_resident)


def _corpus(ids):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(len(ids) - 6)]
    # three planted near-dup pairs (identical + short tail mutation)
    texts += [texts[0], texts[1] + " tail", texts[2] + " x y"]
    texts += [texts[3]]  # exact dup of a background doc
    texts = texts[:len(ids)]
    while len(texts) < len(ids):
        texts.append(" ".join(rng.choice(vocab, size=40)))
    return pa.table({"doc_id": pa.array(ids), "text": texts})


@pytest.mark.parametrize("ids", [
    list(range(40)),
    [f"doc-{i:04d}" for i in range(40)],
])
def test_resident_matches_default(ray_session, ids):
    import ray.data as rd

    t = _corpus(ids)
    a = minhash_lsh_pairs(rd.from_arrow(t), threshold=0.6)
    b = minhash_lsh_pairs_resident(rd.from_arrow(t), threshold=0.6)
    assert len(a) > 0, "corpus must contain planted near-dups"
    sa = set(zip(a.doc_a, a.doc_b))
    sb = set(zip(b.doc_a, b.doc_b))
    assert sa == sb
    m = a.merge(b, on=["doc_a", "doc_b"], suffixes=("_d", "_r"))
    assert np.allclose(m.jaccard_est_d, m.jaccard_est_r)


def test_resident_empty_input(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    out = minhash_lsh_pairs_resident(rd.from_arrow(t))
    assert len(out) == 0
    assert list(out.columns) == ["doc_a", "doc_b", "jaccard_est"]


def test_resident_no_candidates(ray_session):
    import ray.data as rd

    # fully distinct docs -> no band collisions -> empty result
    t = pa.table({
        "doc_id": [0, 1],
        "text": ["completely different words entirely here",
                 "nothing shared with anything above at all"],
    })
    out = minhash_lsh_pairs_resident(rd.from_arrow(t), threshold=0.9)
    assert len(out) == 0
