"""Round-4 new operators: grouped_topk, HyperLogLog approx distinct,
Bloom-filter decontamination."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 4):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)]
                         if n else tbl)


def test_grouped_topk_matches_window_sql(ray_session):
    from verify_ray.pipelines.select import grouped_topk

    rng = np.random.default_rng(23)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c", None], n)),
        "s": pa.array(rng.integers(0, 40, n).astype(np.int64)),  # many ties
        "i": pa.array(rng.permutation(n).astype(np.int64))})
    out = (grouped_topk(_ds(t, 6), ["g"], 7, "s", "i", ["g", "s", "i"],
                        num_buckets=4)
           .to_pandas().sort_values(["g", "s", "i"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT g, s, i FROM (
          SELECT g, s, i, ROW_NUMBER() OVER (PARTITION BY g
              ORDER BY s DESC, i) AS rn
          FROM pdf WHERE g IS NOT NULL) t
        WHERE rn <= 7 ORDER BY g, s DESC, i""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_grouped_topk_hot_group_precap(ray_session):
    # one group holds 90% of rows across many blocks: the pre-cap must
    # bound the shuffle and the answer must stay exact
    from verify_ray.pipelines.select import grouped_topk

    rng = np.random.default_rng(8)
    n = 20_000
    g = np.where(rng.random(n) < 0.9, "hot", "cold")
    t = pa.table({
        "g": pa.array(g),
        "s": pa.array(rng.integers(0, 10, n).astype(np.int64)),
        "i": pa.array(np.arange(n, dtype=np.int64))})
    out = (grouped_topk(_ds(t, 16), ["g"], 3, "s", "i", ["g", "s", "i"],
                        num_buckets=8)
           .to_pandas().sort_values(["g", "s", "i"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT g, s, i FROM (
          SELECT g, s, i, ROW_NUMBER() OVER (PARTITION BY g
              ORDER BY s DESC, i) AS rn FROM pdf) t
        WHERE rn <= 3 ORDER BY g, s DESC, i""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_grouped_topk_rejects_float_score(ray_session):
    import pytest

    from verify_ray.pipelines.select import grouped_topk

    t = pa.table({"g": pa.array(["a"]), "s": pa.array([1.5]),
                  "i": pa.array([1], type=pa.int64())})
    with pytest.raises(Exception, match="integer"):
        grouped_topk(_ds(t, 1), ["g"], 2, "s", "i",
                     ["g", "s", "i"]).to_pandas()


def test_approx_count_distinct_accuracy(ray_session):
    # p=12 -> ~1.6% expected relative error; assert within 5%
    from verify_ray.pipelines.analytics import approx_count_distinct

    rng = np.random.default_rng(31)
    n = 200_000
    t = pa.table({
        "g": pa.array(rng.choice(["x", "y"], n)),
        "v": pa.array(rng.integers(0, 30_000, n).astype(np.int64))})
    out = approx_count_distinct(_ds(t, 8), "g", "v", p=12)
    pdf = t.to_pandas()
    exact = pdf.groupby("g")["v"].nunique()
    for row in out.itertuples():
        e = exact[row.g]
        assert abs(row.est - e) / e < 0.05, (row.g, row.est, e)


def test_approx_count_distinct_merge_invariance(ray_session):
    # register state must not depend on block layout (mergeability)
    from verify_ray.pipelines.analytics import approx_count_distinct

    rng = np.random.default_rng(12)
    n = 10_000
    t = pa.table({
        "g": pa.array(rng.choice(["a"], n)),
        "v": pa.array(rng.integers(0, 2_000, n).astype(np.int64))})
    a = approx_count_distinct(_ds(t, 1), "g", "v")
    b = approx_count_distinct(_ds(t, 13), "g", "v")
    pd.testing.assert_frame_equal(a, b)


def test_bloom_decontaminate_superset_of_exact(ray_session):
    # Bloom false positives only ADD flags: every exact-flagged doc
    # must be bloom-flagged with n_overlap >= the exact overlap
    import ray.data as rd

    from verify_ray.pipelines.contamination import (bloom_decontaminate,
                                                    decontaminate)

    rng = np.random.default_rng(19)
    words = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(words, 40)) for _ in range(60)]
    bench = pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array(texts[:10])})
    # targets: 10 contaminated copies + 50 clean
    tgt_texts = [texts[i] + " tail" for i in range(10)] + texts[10:]
    target = pa.table({
        "doc_id": pa.array(np.arange(100, 100 + len(tgt_texts),
                                     dtype=np.int64)),
        "text": pa.array(tgt_texts)})
    exact = (decontaminate(rd.from_arrow(target), rd.from_arrow(bench),
                           n=8).to_pandas().set_index("doc_id"))
    bloom = (bloom_decontaminate(rd.from_arrow(target),
                                 rd.from_arrow(bench), n=8)
             .to_pandas().set_index("doc_id"))
    assert set(exact.index) <= set(bloom.index)
    for did in exact.index:
        assert bloom.loc[did, "n_overlap"] >= exact.loc[did, "n_overlap"]
    # the 10 contaminated docs are all found
    assert set(range(100, 110)) <= set(exact.index)


def test_bloom_bits_deterministic_and_sparse():
    from verify_ray.pipelines.contamination import (bloom_bits_from_hashes,
                                                    bloom_m_bits)

    rng = np.random.default_rng(2)
    h = rng.integers(0, 2**63, 5000).astype(np.uint64)
    m = bloom_m_bits(len(h))
    a = bloom_bits_from_hashes(h, m)
    b = bloom_bits_from_hashes(h, m)
    np.testing.assert_array_equal(a, b)
    # k=4 hashes x 5000 items into 80k bits: fill ratio ~ 22%
    assert 0.1 < a.mean() < 0.35


def test_connected_components_ds_equals_frame(ray_session):
    from verify_ray.pipelines.dedup import (connected_components_distributed,
                                            connected_components_ds)

    pairs = pd.DataFrame({
        "doc_a": np.array([1, 2, 10, 11, 20, 21], dtype=np.int64),
        "doc_b": np.array([2, 3, 11, 12, 21, 22], dtype=np.int64)})
    frame = connected_components_distributed(pairs)
    ds_out = (connected_components_ds(pairs).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(frame, ds_out)
