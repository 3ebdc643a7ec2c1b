"""Sketch unit tests: accuracy bounds + merge associativity — the
properties the distributed tree-merge relies on."""

import numpy as np

from verify_ray.state.sketches import (CountMinSketch, GroupedSketch,
                                       HistogramSketch, TokenFreqSketch)


def test_histogram_quantile_accuracy():
    rng = np.random.default_rng(1)
    vals = rng.integers(1, 2048, size=50_000)
    h = HistogramSketch()
    h.add(vals)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = float(h.quantile(q)[0])
        true = float(np.quantile(vals, q))
        assert abs(est - true) / true < 0.05, (q, est, true)


def test_histogram_merge_equals_bulk():
    rng = np.random.default_rng(2)
    a, b = rng.integers(0, 1000, 10_000), rng.integers(500, 5000, 10_000)
    h1, h2, hall = HistogramSketch(), HistogramSketch(), HistogramSketch()
    h1.add(a); h2.add(b); hall.add(np.concatenate([a, b]))
    h1.merge(h2)
    assert np.array_equal(h1.counts, hall.counts)
    assert h1.n == hall.n


def test_countmin_estimates_upper_bound_and_tight():
    rng = np.random.default_rng(3)
    keys = rng.zipf(1.5, size=100_000) % 50_000
    cm = CountMinSketch()
    cm.add(keys)
    uniq, counts = np.unique(keys, return_counts=True)
    top = np.argsort(-counts)[:20]
    est = cm.estimate(uniq[top])
    assert np.all(est >= counts[top])           # CM never underestimates
    assert np.all(est - counts[top] <= 0.005 * len(keys))  # eps*N slack


def test_countmin_merge_equals_bulk():
    rng = np.random.default_rng(4)
    a, b = rng.integers(0, 1000, 5000), rng.integers(0, 1000, 5000)
    c1, c2, call = CountMinSketch(), CountMinSketch(), CountMinSketch()
    c1.add(a); c2.add(b); call.add(np.concatenate([a, b]))
    c1.merge(c2)
    assert np.array_equal(c1.table, call.table)


def test_token_freq_topk():
    rng = np.random.default_rng(5)
    # heavy hitters 0..9 at 5% each, rest uniform
    heavy = np.repeat(np.arange(10), 5000)
    noise = rng.integers(10, 50_000, size=50_000)
    tf = TokenFreqSketch()
    for chunk in np.array_split(np.concatenate([heavy, noise]), 13):
        tf.add(rng.permutation(chunk))
    top = tf.topk(10)
    assert {t for t, _ in top} == set(range(10))
    for _, f in top:
        assert abs(f - 0.05) < 0.01


def test_grouped_sketch_roundtrip_and_merge():
    g1, g2 = GroupedSketch(), GroupedSketch()
    g1.hist.add(np.array([1, 2, 3])); g1.tokens.add(np.array([7, 7, 8])); g1.rows = 3
    g2.hist.add(np.array([4, 5])); g2.tokens.add(np.array([7])); g2.rows = 2
    blob = g1.to_bytes()
    g1b = GroupedSketch.from_bytes(blob)
    g1b.merge(g2)
    assert g1b.rows == 5
    assert g1b.hist.n == 5
    assert g1b.tokens.cm.estimate(np.array([7]))[0] == 3


def test_hyperloglog_accuracy_and_merge():
    from verify_ray.state.sketches import HyperLogLog

    rng = np.random.default_rng(9)
    a = rng.integers(0, 500_000, 300_000)
    b = rng.integers(250_000, 750_000, 300_000)
    h1, h2, hall = HyperLogLog(), HyperLogLog(), HyperLogLog()
    h1.add(a); h2.add(b); hall.add(np.concatenate([a, b]))
    h1.merge(h2)
    assert np.array_equal(h1.registers, hall.registers)  # merge == bulk
    true = len(np.unique(np.concatenate([a, b])))
    est = h1.estimate()
    assert abs(est - true) / true < 0.05, (est, true)


def test_hyperloglog_strings_and_small_range():
    from verify_ray.state.sketches import HyperLogLog

    h = HyperLogLog()
    h.add(np.array([f"k{i}" for i in range(300)], dtype=object))
    h.add(np.array([f"k{i}" for i in range(300)], dtype=object))  # dups
    est = h.estimate()
    assert abs(est - 300) / 300 < 0.05, est


# ---- TDigest (north-star-named adaptive quantile sketch) -------------------

def test_tdigest_quantile_accuracy():
    from verify_ray.state.sketches import TDigest

    rng = np.random.RandomState(5)
    vals = rng.lognormal(4.0, 1.0, 200_000) - 30.0  # unbounded, signed
    td = TDigest(delta=200)
    for lo in range(0, len(vals), 8192):
        td.add(vals[lo:lo + 8192])
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = float(td.quantile(q))
        # RANK error: the estimate's true rank must be near q
        rank = (vals < est).mean()
        assert abs(rank - q) < 0.01, (q, rank)
    # tails anchored exactly
    assert float(td.quantile(0.0)) == vals.min()
    assert float(td.quantile(1.0)) == vals.max()


def test_tdigest_merge_order_robust():
    from verify_ray.state.sketches import TDigest

    rng = np.random.RandomState(7)
    parts = [rng.standard_normal(20_000) * (i + 1) for i in range(8)]
    allv = np.concatenate(parts)

    seq = TDigest()
    for p in parts:
        seq.add(p)

    # pairwise tree merge
    digs = []
    for p in parts:
        d = TDigest()
        d.add(p)
        digs.append(d)
    while len(digs) > 1:
        digs = [digs[i].merge(digs[i + 1]) if i + 1 < len(digs) else digs[i]
                for i in range(0, len(digs), 2)]
    tree = digs[0]

    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        for est in (seq.quantile(q), tree.quantile(q)):
            rank = (allv < float(est)).mean()
            assert abs(rank - q) < 0.015, (q, rank)


def test_tdigest_bounded_size():
    from verify_ray.state.sketches import TDigest

    td = TDigest(delta=100)
    rng = np.random.RandomState(9)
    td.add(rng.standard_normal(500_000))
    td._compress()
    assert len(td.means) <= 2 * td.delta  # O(delta) centroids, not O(n)
    assert td.n == 500_000
