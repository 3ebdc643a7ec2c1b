"""Round-4 size-based auto-routing (VERDICT r3 #2): the scale-safe
dedup paths become the default above a driver budget, with equivalence
at both regimes under one API."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _near_dup_table(n_clusters: int = 6, copies: int = 3) -> pa.Table:
    rng = np.random.default_rng(7)
    ids, texts = [], []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    for c in range(n_clusters):
        base = " ".join(rng.choice(words, 30))
        for j in range(copies):
            ids.append(f"d{c:03d}_{j}")
            texts.append(base if j == 0 else base + f" tail{j}")
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})


def test_minhash_auto_routes_to_resident_above_budget(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.dedup import minhash_lsh_pairs

    t = _near_dup_table()
    ds = rd.from_arrow(t)
    small = minhash_lsh_pairs(ds, threshold=0.6)  # driver path
    # budget 0 forces every candidate over the budget -> resident path
    big = minhash_lsh_pairs(rd.from_arrow(t), threshold=0.6,
                            driver_budget_pairs=0)
    key = ["doc_a", "doc_b"]
    a = small.sort_values(key).reset_index(drop=True)
    b = big.sort_values(key).reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a[key], b[key])
    np.testing.assert_allclose(a["jaccard_est"], b["jaccard_est"])


def test_connected_components_auto_routes_distributed(ray_session):
    from verify_ray.pipelines.dedup import connected_components

    pairs = pd.DataFrame({
        "doc_a": np.array([1, 2, 10, 11, 20], dtype=np.int64),
        "doc_b": np.array([2, 3, 11, 12, 21], dtype=np.int64)})
    uf = (connected_components(pairs)
          .sort_values("doc_id").reset_index(drop=True))
    lp = (connected_components(pairs, pair_budget=2)  # force distributed
          .sort_values("doc_id").reset_index(drop=True))
    assert uf["doc_id"].tolist() == lp["doc_id"].tolist()
    assert uf["group_id"].tolist() == lp["group_id"].tolist()


def test_connected_components_non_integer_over_budget_raises():
    from verify_ray.pipelines.dedup import connected_components

    pairs = pd.DataFrame({"doc_a": ["a", "b", "c"],
                          "doc_b": ["b", "c", "d"]})
    with pytest.raises(ValueError, match="driver budget"):
        connected_components(pairs, pair_budget=1)
    # under budget, string ids still work on the driver path
    out = connected_components(pairs)
    assert set(out["group_id"]) == {"a"}


def test_grouped_stats_exchange_equals_driver_merge(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import grouped_stats

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, 400, n).astype(np.int64)),
        "v": pa.array(rng.integers(-50, 50, n).astype(np.int64))})
    ds = rd.from_arrow([t.slice(i, 1000) for i in range(0, n, 1000)])
    driver = grouped_stats(ds, ["k"], {"v": ["count", "min", "max", "mean"]})
    exch = grouped_stats(
        rd.from_arrow([t.slice(i, 1000) for i in range(0, n, 1000)]),
        ["k"], {"v": ["count", "min", "max", "mean"]}, partial_budget=0)
    pd.testing.assert_frame_equal(
        driver.reset_index(drop=True),
        exch[driver.columns].reset_index(drop=True), check_dtype=False)


def test_windowed_events_exchange_equals_driver_merge(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import windowed_events

    rng = np.random.default_rng(5)
    n = 2000
    t = pa.table({
        "event_type": pa.array(rng.choice(["a", "b"], n)),
        "ts": pa.array((rng.integers(0, 5, n) * 86_400_000_000
                        + rng.integers(0, 1000, n))
                       .astype("datetime64[us]")),
        "value": pa.array(rng.integers(0, 10, n).astype(np.float64))})
    ds = rd.from_arrow([t.slice(i, 500) for i in range(0, n, 500)])
    driver = windowed_events(ds, "day")
    exch = windowed_events(
        rd.from_arrow([t.slice(i, 500) for i in range(0, n, 500)]),
        "day", partial_budget=0)
    pd.testing.assert_frame_equal(
        driver.reset_index(drop=True),
        exch[driver.columns].reset_index(drop=True), check_dtype=False)


def test_top_k_tie_bomb_exchange(ray_session):
    # >=10^6 rows at ONE score (VERDICT r3 #4): the tie class must
    # resolve in the exchange, never landing whole on the driver
    import ray.data as rd

    from verify_ray.pipelines.select import top_k_by_score

    n = 1_000_000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array(np.full(n, 42, dtype=np.int64))})
    ds = rd.from_arrow([t.slice(i, 125_000) for i in range(0, n, 125_000)]
                       ).materialize()
    out = (top_k_by_score(ds, k=100, tie_budget=1000)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # ties break by smallest id: exactly ids 0..99
    assert out["doc_id"].tolist() == list(range(100))


def test_top_k_tie_exchange_equals_driver_path(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.select import top_k_by_score

    rng = np.random.default_rng(11)
    n = 20_000
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "score": pa.array(rng.integers(0, 5, n).astype(np.int64))})

    def _ds():
        return rd.from_arrow([t.slice(i, 4000) for i in range(0, n, 4000)]
                             ).materialize()

    a = (top_k_by_score(_ds(), k=777)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (top_k_by_score(_ds(), k=777, tie_budget=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(a) == len(b) == 777
    pd.testing.assert_frame_equal(a, b)


def test_minhash_pairs_ds_streaming_sink_equals_frame(ray_session, tmp_path):
    # VERDICT r3 #6: pair output written via the streaming sink with no
    # driver concat must hash-equal the DataFrame path's pairs
    import pyarrow.parquet as pq
    import ray.data as rd

    from verify_ray.pipelines.dedup import (minhash_lsh_pairs,
                                            minhash_lsh_pairs_ds)
    from verify_ray.sinks import write_sharded

    t = _near_dup_table(n_clusters=8, copies=3)
    frame = minhash_lsh_pairs(rd.from_arrow(t), threshold=0.6)
    out_dir = str(tmp_path / "pairs_out")
    rep = write_sharded(
        {"pairs": lambda: minhash_lsh_pairs_ds(rd.from_arrow(t),
                                               threshold=0.6)},
        out_dir, fingerprint="r4-test")
    assert rep["written"] == ["pairs"]
    files = []
    import os

    for root, _, fs in os.walk(out_dir):
        files += [os.path.join(root, f) for f in fs
                  if f.endswith(".parquet")]
    assert files
    got = (pa.concat_tables([pq.read_table(f) for f in files])
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    key = ["doc_a", "doc_b"]
    pd.testing.assert_frame_equal(frame[key], got[key])
    np.testing.assert_allclose(frame["jaccard_est"], got["jaccard_est"])
    assert rep["rows"]["pairs"] == len(frame)
