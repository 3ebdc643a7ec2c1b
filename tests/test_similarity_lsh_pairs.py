"""Banded-LSH near-dup pairs: plan feasibility, recall guarantee at
high tau, degenerate-tau routing to the blocked exact scan."""

import numpy as np
import pyarrow as pa
import pytest


def _planted(n=600, dim=32, n_pairs=25, sim_level=0.97, seed=7):
    """Random unit vectors + planted near-dup pairs at ~sim_level."""
    rng = np.random.RandomState(seed)
    m = rng.standard_normal((n, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for i in range(n_pairs):
        a, b = 2 * i, 2 * i + 1
        noise = rng.standard_normal(dim)
        noise /= np.linalg.norm(noise)
        v = sim_level * m[a] + np.sqrt(1 - sim_level ** 2) * noise
        m[b] = v / np.linalg.norm(v)
    return m


@pytest.fixture(scope="module")
def planted_ds(ray_session):
    import ray.data as rd

    m = _planted()
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.astype(np.float32).ravel(), type=pa.float32()),
            m.shape[1]),
    })
    return rd.from_arrow(t).materialize()


def test_plan_bands_feasibility():
    from verify_ray.pipelines.similarity import plan_lsh_bands

    # high tau: feasible with few bands; bands shrink as tau rises
    w1, b1, r1 = plan_lsh_bands(100_000, 0.90)
    w2, b2, r2 = plan_lsh_bands(100_000, 0.98)
    assert b2 <= b1 and r1 >= 0.995 and r2 >= 0.995
    # the oracle's tau=0.4 is provably degenerate -> no plan
    assert plan_lsh_bands(2_000, 0.4) is None
    assert plan_lsh_bands(500, 0.4) is None
    # w grows with n (constant bucket occupancy)
    wbig, _, _ = plan_lsh_bands(100_000_000, 0.95)
    wsmall, _, _ = plan_lsh_bands(1_000, 0.95)
    assert wbig > wsmall


def test_banded_lsh_matches_exact_at_high_tau(planted_ds):
    from verify_ray.pipelines import similarity

    exact = similarity.embedding_near_dup_exact(planted_ds, tau=0.9)
    lsh = similarity.embedding_near_dup_lsh(planted_ds, tau=0.9)
    eset = set(zip(exact.doc_a, exact.doc_b))
    lset = set(zip(lsh.doc_a, lsh.doc_b))
    assert eset, "planted pairs must exist"
    # precision is exact by construction (in-exchange verify);
    # recall_target=0.995 on 25 planted pairs -> expect full recall on
    # the deterministic seed
    assert lset == eset


def test_degenerate_tau_routes_to_blocked_exact(planted_ds, caplog):
    import logging

    from verify_ray.pipelines import similarity

    with caplog.at_level(logging.WARNING, logger="verify_ray.similarity"):
        lsh = similarity.embedding_near_dup_lsh(planted_ds, tau=0.4)
    assert any("blocked_exact_pairs" in r.message for r in caplog.records)
    exact = similarity.embedding_near_dup_exact(planted_ds, tau=0.4)
    assert (set(zip(lsh.doc_a, lsh.doc_b))
            == set(zip(exact.doc_a, exact.doc_b)))


def test_blocked_exact_multi_block(ray_session):
    """blocked_exact_pairs must agree with the broadcast exact scan when
    the data spans several blocks (cross-block pair orientation)."""
    import ray.data as rd

    from verify_ray.pipelines import similarity

    m = _planted(n=400, n_pairs=15, seed=11)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.astype(np.float32).ravel(), type=pa.float32()),
            m.shape[1]),
    })
    ds = rd.from_arrow(t).repartition(5).materialize()
    blocked = similarity.blocked_exact_pairs(ds, tau=0.9)
    exact = similarity.embedding_near_dup_exact(ds, tau=0.9)
    assert (set(zip(blocked.doc_a, blocked.doc_b))
            == set(zip(exact.doc_a, exact.doc_b)))
    assert len(blocked)  # pairs actually found across blocks
