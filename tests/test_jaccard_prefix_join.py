"""jaccard_prefix_join: exact all-pairs word-set similarity join —
brute-force differential over random corpora at several thresholds
(prefix filtering must lose NOTHING), plus edge docs."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table, blocks: int = 3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def _shingles(t, n):
    ws = t.split()
    if len(ws) >= n:
        return {tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)}
    return {tuple(ws)}  # one truncated shingle (engine parity)


def _brute(texts, tau_pct, n=1):
    sets = {i: _shingles(t, n) for i, t in enumerate(texts)
            if t is not None}
    out = {}
    ks = sorted(sets)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            a, b = sets[ks[i]], sets[ks[j]]
            c = len(a & b)
            u = len(a | b)
            if u and 100 * c >= tau_pct * u:
                out[(ks[i], ks[j])] = (c, u)
    return out


def _mk_corpus(rng, n_docs=60, vocab=40, min_w=0, max_w=12):
    words = [f"w{i}" for i in range(vocab)]
    texts = []
    for _ in range(n_docs):
        k = rng.integers(min_w, max_w + 1)
        texts.append(" ".join(rng.choice(words, size=k)))
    # plant exact and near dups so high thresholds fire
    texts[1] = texts[0]
    texts[3] = texts[2] + " w0" if texts[2] else "w0"
    texts[5] = None
    return texts


@pytest.mark.parametrize("tau_pct", [30, 60, 80, 100])
def test_prefix_join_matches_brute_force(ray_session, tau_pct):
    from verify_ray.pipelines.dedup import jaccard_prefix_join

    rng = np.random.default_rng(tau_pct)
    texts = _mk_corpus(rng)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = jaccard_prefix_join(_ds(t), tau_pct, num_coarse=8)
    want = _brute(texts, tau_pct)
    got_pairs = {(a, b): (c, u) for a, b, c, u in zip(
        got.doc_a, got.doc_b, got.n_common, got.n_union)}
    assert got_pairs == want
    assert len(want) > 0  # planted dups guarantee a non-empty answer


@pytest.mark.parametrize("tau_pct", [50, 85])
def test_prefix_join_trigram_shingles(ray_session, tau_pct):
    from verify_ray.pipelines.dedup import jaccard_prefix_join

    rng = np.random.default_rng(99 + tau_pct)
    texts = _mk_corpus(rng, n_docs=50, vocab=12, min_w=3, max_w=15)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = jaccard_prefix_join(_ds(t), tau_pct, n=3, num_coarse=8)
    want = _brute(texts, tau_pct, n=3)
    got_pairs = {(a, b): (c, u) for a, b, c, u in zip(
        got.doc_a, got.doc_b, got.n_common, got.n_union)}
    assert got_pairs == want and len(want) > 0


def test_prefix_join_edges(ray_session):
    from verify_ray.pipelines.dedup import jaccard_prefix_join

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["", "", "a", "a b", "x"],
                                   pa.string())})
    got = jaccard_prefix_join(_ds(t, 2), 50, num_coarse=4)
    # empty docs carry the EMPTY SHINGLE (the verify kernel's short-doc
    # semantics) so the two of them pair at J=1; "a" vs "a b": J=1/2
    assert list(zip(got.doc_a, got.doc_b)) == [(0, 1), (2, 3)]
    assert got.n_common.tolist() == [1, 1]
    assert got.n_union.tolist() == [1, 2]
