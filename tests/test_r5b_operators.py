"""Round-5 batch B operators: n-gram novelty — unit semantics +
the driver oracle at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def _oracle_check(name, tables=("events", "documents", "lineitem")):
    import __ray_entry__ as e

    mine = e.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    orc = con.execute(e.oracle_sql()[name]).df()
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    for c in mine.columns:
        a, b = mine[c].to_numpy(), orc[c].to_numpy()
        if a.dtype == object or b.dtype == object:
            assert list(map(str, a)) == list(map(str, b)), c
        else:
            assert np.array_equal(a, b), c
    return mine


# ---- ngram_novelty ----------------------------------------------------------

def test_ngram_novelty_first_doc_credits(ray_session):
    from verify_ray.pipelines.text import ngram_novelty

    t = pa.table({
        "doc_id": pa.array([3, 1, 2, 4], type=pa.int64()),
        "text": ["a b c d",        # grams: "a b c", "b c d" (doc 3)
                 "a b c",          # gram "a b c" first appears in doc 1
                 "x y",            # < 3 words -> no grams, no row
                 "b c d e"]})      # "b c d" credited to doc 3, "c d e" new
    out = ngram_novelty(_ds(t), n=3)
    assert list(out.doc_id) == [1, 3, 4]
    # doc 1: 1 gram, novel (min doc_id for "a b c" is 1)
    # doc 3: 2 grams, "b c d" novel here (3 < 4), "a b c" not (1 < 3)
    # doc 4: 2 grams, only "c d e" novel
    assert list(out.n_grams) == [1, 2, 2]
    assert list(out.n_novel) == [1, 1, 1]


def test_ngram_novelty_within_doc_distinct(ray_session):
    from verify_ray.pipelines.text import ngram_novelty

    t = pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "text": ["a b a b a b"]})  # grams: "a b a","b a b","a b a","b a b"
    out = ngram_novelty(_ds(t, blocks=1), n=3)
    assert list(out.n_grams) == [2]       # distinct within the doc
    assert list(out.n_novel) == [2]


def test_ngram_novelty_nulls_and_empty(ray_session):
    from verify_ray.pipelines.text import ngram_novelty

    t = pa.table({
        "doc_id": pa.array([1, None, 2], type=pa.int64()),
        "text": [None, "a b c", "  "]})
    out = ngram_novelty(_ds(t), n=3)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_grams", "n_novel"]


def test_ngram_novelty_oracle(ray_session):
    _oracle_check("docs_ngram_novelty", tables=("documents",))


# ---- spearman_surface -------------------------------------------------------

def test_avg_rank_x2_tie_semantics():
    from verify_ray.pipelines.analytics import _avg_rank_x2

    # values [10, 20, 20, 30]: avg ranks 1, 2.5, 2.5, 4 -> x2
    r2 = _avg_rank_x2(np.array([10.0, 20.0, 20.0, 30.0]))
    assert list(r2) == [2, 5, 5, 8]
    # reversed input, same multiset -> permuted same ranks
    r2 = _avg_rank_x2(np.array([30.0, 20.0, 10.0, 20.0]))
    assert list(r2) == [8, 5, 2, 5]


def test_spearman_perfect_and_reversed(ray_session):
    from verify_ray.pipelines.analytics import spearman_surface

    t = pa.table({
        "g": ["a"] * 4 + ["b"] * 4,
        "x": pa.array([1.0, 2, 3, 4] * 2),
        "y": pa.array([10.0, 20, 30, 40, 40, 30, 20, 10])})
    out = spearman_surface(_ds(t), "g", "x", "y", num_buckets=4)
    assert list(out.grp) == ["a", "b"]
    # perfect monotone: sum d2 = 0; reversed: 4*sum((2k-(2n+2-2k))/..)
    assert list(out.n) == [4, 4]
    assert out.sum_d2_x4[0] == 0
    # reversed ranks: d2x4 = sum over k of (2k - 2(5-k))^2 = 4*(2k-5)^2*... 
    # ranks x: 1,2,3,4 y:4,3,2,1 -> d=2(rx-ry)= -6,-2,2,6 -> sum=80
    assert out.sum_d2_x4[1] == 80


def test_spearman_nulls_drop(ray_session):
    from verify_ray.pipelines.analytics import spearman_surface

    t = pa.table({
        "g": ["a", "a", None, "a"],
        "x": pa.array([1.0, None, 3.0, 4.0]),
        "y": pa.array([1.0, 2.0, 3.0, None])})
    out = spearman_surface(_ds(t), "g", "x", "y", num_buckets=2)
    assert list(out.n) == [1]  # only the (a, 1, 1) row survives


def test_spearman_oracle(ray_session):
    _oracle_check("lineitem_spearman", tables=("lineitem",))


# ---- kendall_trend ----------------------------------------------------------

def test_kendall_counts_and_ts_tie_exclusion(ray_session):
    from verify_ray.pipelines.analytics import kendall_trend

    us = 1_000_000
    t = pa.table({
        "user_id": pa.array([1] * 4 + [2], type=pa.int64()),
        "ts": pa.array([0, 1 * us, 1 * us, 2 * us, 0],
                       type=pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, 2.0, 5.0])})
    out = kendall_trend(_ds(t), num_buckets=2)
    assert list(out.user_id) == [1, 2]
    # user 1 pairs with strictly increasing ts:
    #  (0,1us)x2: 1<2 C, 1<3 C; (0,2us): 1<2 C;
    #  (1us,2us)x2: 2=2 T, 3>2 D.  Same-ts pair (2,3) excluded.
    assert list(out.n) == [4, 1]
    assert list(out.concordant) == [3, 0]
    assert list(out.discordant) == [1, 0]
    assert list(out.tie_value) == [1, 0]


def test_kendall_chunking_matches_reference(ray_session):
    from verify_ray.pipelines.analytics import kendall_trend

    rng = np.random.default_rng(7)
    n = 1500  # > chunk size 512 -> exercises the chunked path
    ts = rng.choice(n * 3, size=n, replace=False).astype("int64")
    v = rng.integers(0, 20, size=n).astype("float64")
    t = pa.table({
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "value": pa.array(v)})
    out = kendall_trend(_ds(t, blocks=3), num_buckets=2)
    order = np.argsort(ts, kind="stable")
    vs = v[order]
    dv = vs[None, :] - vs[:, None]
    upper = np.triu(np.ones((n, n), dtype=bool), k=1)
    assert out.concordant[0] == int((upper & (dv > 0)).sum())
    assert out.discordant[0] == int((upper & (dv < 0)).sum())
    assert out.tie_value[0] == int((upper & (dv == 0)).sum())


def test_kendall_group_cap_raises(ray_session):
    from verify_ray.pipelines.analytics import kendall_trend

    t = pa.table({
        "user_id": pa.array([1] * 10, type=pa.int64()),
        "ts": pa.array(np.arange(10), type=pa.timestamp("us")),
        "value": pa.array(np.arange(10, dtype="float64"))})
    with pytest.raises(Exception, match="max_group_rows"):
        kendall_trend(_ds(t), num_buckets=2, max_group_rows=5)


def test_kendall_oracle(ray_session):
    _oracle_check("events_kendall_trend", tables=("events",))


# ---- hybrid_rrf_candidates --------------------------------------------------

def test_rrf_fusion_arithmetic(ray_session):
    from verify_ray.pipelines.retrieval import hybrid_rrf_candidates

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["apple apple apple",          # matches term, 1 distinct
                 "banana pear plum kiwi",      # no match, 4 distinct
                 "apple pear cherry"]})        # match, 3 distinct
    out = hybrid_rrf_candidates(_ds(t, blocks=1), terms=["apple"], k=2)
    out = out.set_index("doc_id")
    # BM25 candidates: docs 1, 3 (both contain 'apple').
    # distinct ranking: doc 2 (4), doc 3 (3) in top-2.
    assert out.loc["2", "rank_bm25"] == 0
    assert out.loc["2", "rrf_num"] == 1
    assert out.loc["2", "rrf_den"] == 60 + out.loc["2", "rank_distinct"]
    r3a, r3b = out.loc["3", "rank_bm25"], out.loc["3", "rank_distinct"]
    assert r3a > 0 and r3b > 0
    assert out.loc["3", "rrf_num"] == 120 + r3a + r3b
    assert out.loc["3", "rrf_den"] == (60 + r3a) * (60 + r3b)


def test_rrf_oracle(ray_session):
    _oracle_check("docs_hybrid_rrf", tables=("documents",))


# ---- padding_waste ----------------------------------------------------------

def test_padding_waste_hand_case(ray_session):
    from verify_ray.pipelines.pack import padding_waste

    # ids 0..4 lengths [5, 1, 4, 2, 8]; batch_size 2, cap 6
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": ["a b c d e", "a", "a b c d", "a b",
                 "a b c d e f g h"]})
    out = padding_waste(_ds(t), batch_size=2, max_len=6)
    out = out.set_index("strategy")
    # capped lengths: [5, 1, 4, 2, 6]; total = 18
    # sorted [1,2,4,5,6]: batches (1,2),(4,5),(6) -> padded 4+10+6=20
    assert out.loc["sorted", "total_tokens"] == 18
    assert out.loc["sorted", "padded_tokens"] == 20
    assert out.loc["sorted", "waste"] == 2
    assert out.loc["sorted", "n_batches"] == 3
    # arrival blocks id//2: (5,1),(4,2),(6) -> padded 10+8+6=24
    assert out.loc["arrival", "padded_tokens"] == 24
    assert out.loc["arrival", "waste"] == 6


def test_padding_waste_sorted_run_formula_matches_bruteforce(ray_session):
    from verify_ray.pipelines.pack import padding_waste

    rng = np.random.default_rng(11)
    lens = rng.integers(1, 40, size=203)
    texts = [" ".join(["w"] * int(n)) for n in lens]
    t = pa.table({"doc_id": pa.array(np.arange(203), type=pa.int64()),
                  "text": texts})
    out = padding_waste(_ds(t, blocks=4), batch_size=7, max_len=512)
    srt = np.sort(lens)
    padded = sum(int(srt[i:i + 7].max()) * len(srt[i:i + 7])
                 for i in range(0, len(srt), 7))
    row = out.set_index("strategy").loc["sorted"]
    assert row.padded_tokens == padded
    assert row.n_batches == -(-203 // 7)
    assert row.total_tokens == int(lens.sum())


def test_padding_waste_oracle(ray_session):
    _oracle_check("docs_padding_waste", tables=("documents",))


# ---- window_attribution -----------------------------------------------------

def test_window_attribution_semantics(ray_session):
    from verify_ray.pipelines.joins import window_attribution

    us = 1_000_000
    buys = pa.table({
        "buy_id": pa.array([100, 101], type=pa.int64()),
        "user_id": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([10 * us, 100 * us], type=pa.timestamp("us"))})
    clicks = pa.table({
        "click_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        # 5: in window of buy 100 (and not 101); 10: AT buy 100's ts
        # (inclusive); 95: in window of 101 only; user-2 click never
        "ts": pa.array([5 * us, 10 * us, 95 * us, 7 * us],
                       type=pa.timestamp("us"))})
    out = (window_attribution(_ds(buys), _ds(clicks),
                              window_us=20 * us, num_buckets=4)
           .to_pandas().sort_values(["buy_id", "click_id"])
           .reset_index(drop=True))
    assert list(out.buy_id) == [100, 100, 101]
    assert list(out.click_id) == [1, 2, 3]
    assert list(out.n_touch) == [2, 2, 1]


def test_window_attribution_oracle(ray_session):
    _oracle_check("events_linear_attribution", tables=("events",))


# ---- degree_assortativity_surface -------------------------------------------

def test_assortativity_star_graph(ray_session):
    from verify_ray.pipelines.graph import degree_assortativity_surface

    # star: center 0 with leaves 1..4 (plus a duplicate + reversed
    # + self-loop edge to exercise canonicalization/dedup)
    t = pa.table({
        "x": pa.array([0, 0, 0, 0, 1, 2, 2], type=pa.int64()),
        "y": pa.array([1, 2, 3, 4, 0, 0, 2], type=pa.int64())})
    out = degree_assortativity_surface(_ds(t), num_buckets=4)
    # distinct edges: (0,1),(0,2),(0,3),(0,4); deg(0)=4, leaves 1
    assert out.m[0] == 4
    assert out.sum_prod[0] == 4 * (4 * 1)
    assert out.sum_deg[0] == 4 * 5
    assert out.sum_sq[0] == 4 * (16 + 1)


def test_assortativity_oracle(ray_session):
    _oracle_check("copurchase_assortativity", tables=("lineitem",))


# ---- temporal_leakage_audit -------------------------------------------------

def test_temporal_leakage_hand_case(ray_session):
    from verify_ray.pipelines.sample import temporal_leakage_audit

    us = 1_000_000
    # train_frac=1.0 -> everything train, zero test/leaky;
    # train_frac=0.0 -> everything test, no train -> zero leaky
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([0, us, 0, us], type=pa.timestamp("us"))})
    all_train = temporal_leakage_audit(_ds(t), train_frac=1.0)
    assert list(all_train.n_test) == [0, 0]
    assert list(all_train.n_leaky) == [0, 0]
    all_test = temporal_leakage_audit(_ds(t), train_frac=0.0)
    assert list(all_test.n_train) == [0, 0]
    assert list(all_test.n_leaky) == [0, 0]
    assert list(all_test.n_test) == [2, 2]


def test_temporal_leakage_counts_past_test_events(ray_session):
    from verify_ray.pipelines.sample import temporal_leakage_audit
    from verify_ray.pipelines.sample import GRANULARITY, _hash_buckets

    us = 1_000_000
    ids = np.arange(100, dtype=np.int64)
    ts = np.arange(100, dtype=np.int64) * us
    t = pa.table({
        "event_id": pa.array(ids),
        "user_id": pa.array(np.zeros(100, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us"))})
    out = temporal_leakage_audit(_ds(t, blocks=3), train_frac=0.8)
    bk = _hash_buckets(pa.array([str(i) for i in ids]))
    is_train = bk < int(round(0.8 * GRANULARITY))
    mx = ts[is_train].max()
    expect_leaky = int(((~is_train) & (ts <= mx)).sum())
    assert out.n_train[0] == int(is_train.sum())
    assert out.n_test[0] == int((~is_train).sum())
    assert out.n_leaky[0] == expect_leaky
    assert expect_leaky > 0  # hash split over a timeline MUST leak


def test_temporal_leakage_oracle(ray_session):
    _oracle_check("events_split_leakage", tables=("events",))


# ---- transition_diversity ---------------------------------------------------

def test_transition_diversity_hand_case(ray_session):
    from verify_ray.pipelines.sessions import transition_diversity

    us = 1_000_000
    # user 1: a->b, b->a, a->b  (3 transitions, 2 distinct,
    #   counts {a->b: 2, b->a: 1} -> sum_c2 = 2)
    # user 2: single event -> no row
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array([0, us, 2 * us, 3 * us, 0],
                       type=pa.timestamp("us")),
        "event_type": ["a", "b", "a", "b", "x"],
        "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64())})
    out = transition_diversity(_ds(t), num_buckets=4)
    assert list(out.user_id) == [1]
    assert list(out.n_transitions) == [3]
    assert list(out.n_distinct) == [2]
    assert list(out.sum_c2) == [2]


def test_transition_diversity_ts_tie_orders_by_event_id(ray_session):
    from verify_ray.pipelines.sessions import transition_diversity

    t = pa.table({
        "user_id": pa.array([1, 1, 1], type=pa.int64()),
        "ts": pa.array([0, 0, 0], type=pa.timestamp("us")),
        "event_type": ["c", "a", "b"],
        "event_id": pa.array([30, 10, 20], type=pa.int64())})
    out = transition_diversity(_ds(t), num_buckets=2)
    # order by (ts, event_id): a, b, c -> transitions a->b, b->c
    assert list(out.n_transitions) == [2]
    assert list(out.n_distinct) == [2]
    assert list(out.sum_c2) == [0]


def test_transition_diversity_oracle(ray_session):
    _oracle_check("events_transition_diversity", tables=("events",))


# ---- token_epoch_drift ------------------------------------------------------

def test_token_drift_counts_and_union(ray_session):
    from verify_ray.pipelines.text import token_epoch_drift

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": ["x x y", "y z", "x q"]})
    out = token_epoch_drift(_ds(t), k=2).set_index("token")
    # even epoch (docs 0, 2): x:3, y:1, q:1; odd (doc 1): y:1, z:1
    assert out.loc["x"].tolist() == [3, 0]
    assert out.loc["y"].tolist() == [1, 1]
    assert out.loc["z"].tolist() == [0, 1]
    # top-2 even = {x, q} (count, then token ASC); top-2 odd = {y, z}
    assert set(out.index) == {"x", "q", "y", "z"}


def test_token_drift_oracle(ray_session):
    _oracle_check("docs_token_drift", tables=("documents",))


# ---- cross_source_dup_matrix ------------------------------------------------

def test_cross_source_dup_matrix_hand_case(ray_session):
    from verify_ray.pipelines.dedup import cross_source_dup_matrix

    t = pa.table({
        "source": ["s1", "s2", "s3", "s1", "s2", "s1", "s1"],
        "text": ["dup", "dup", "dup",      # shared by s1,s2,s3
                 "only-a", "only-b",
                 "dup",                    # same-source repeat: no pair
                 "pair"]})
    out = cross_source_dup_matrix(_ds(t), num_buckets=4)
    got = {(r.source_a, r.source_b): r.n_shared
           for r in out.itertuples()}
    assert got == {("s1", "s2"): 1, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_cross_source_dup_matrix_oracle(ray_session):
    _oracle_check("docs_cross_source_dups", tables=("documents",))


# ---- theil_sen_daily --------------------------------------------------------

def test_theil_sen_hand_case(ray_session):
    from verify_ray.pipelines.analytics import theil_sen_daily

    day = 86_400_000_000
    # daily counts: day0 -> 2, day1 -> 4, day2 -> 1
    ts = [0] * 2 + [day] * 4 + [2 * day] * 1
    t = pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))})
    out = theil_sen_daily(_ds(t))
    # slopes permille: (4-2)/1 -> 2000; (1-2)/2 -> floor(-500)= -500;
    # (1-4)/1 -> -3000.  sorted [-3000, -500, 2000], lower median -500
    assert out.n_days[0] == 3
    assert out.n_pairs[0] == 3
    assert out.median_slope_permille[0] == -500


def test_theil_sen_floor_negative_semantics(ray_session):
    from verify_ray.pipelines.analytics import theil_sen_daily

    day = 86_400_000_000
    # counts: day0 -> 3, day2 -> 2: slope floor(1000*(-1)/2) = -500
    ts = [0] * 3 + [2 * day] * 2
    t = pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))})
    out = theil_sen_daily(_ds(t))
    assert out.median_slope_permille[0] == -500


def test_theil_sen_oracle(ray_session):
    _oracle_check("events_theil_sen_trend", tables=("events",))


# ---- term_position_stats ----------------------------------------------------

def test_term_position_stats_hand_case(ray_session):
    from verify_ray.pipelines.retrieval import term_position_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["cat dog cat",      # cat at pos 1,3 (first 1); dog 2
                 "dog",              # dog at 1
                 "bird"]})
    out = term_position_stats(_ds(t), terms=["cat", "dog", "fish"])
    out = out.set_index("term")
    assert "fish" not in out.index  # absent term emits nothing
    assert out.loc["cat"].tolist() == [1, 2, 4, 1]   # df tf sum_pos sum_first
    assert out.loc["dog"].tolist() == [2, 2, 3, 3]
    assert list(out.index) == ["cat", "dog"]


def test_term_position_stats_oracle(ray_session):
    _oracle_check("docs_term_positions", tables=("documents",))


# ---- ab_uplift_counts -------------------------------------------------------

def test_ab_uplift_counts_hand_case(ray_session):
    from verify_ray.pipelines.analytics import ab_uplift_counts
    from verify_ray.pipelines.sample import _hash_buckets

    users = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
    v = _hash_buckets(pa.array([str(u) for u in users])) % 2
    # every user clicks twice; variant-0 users also purchase once
    uu = np.repeat(users, 2)
    t = pa.table({
        "user_id": pa.array(np.r_[uu, users[v == 0]]),
        "event_type": ["click"] * len(uu) + ["buy"] * int((v == 0).sum())})
    out = ab_uplift_counts(_ds(t, blocks=3)).set_index("event_type")
    n0, n1 = int((v == 0).sum()), int((v == 1).sum())
    assert out.loc["click"].tolist() == [2 * n0, 2 * n1, n0, n1]
    assert out.loc["buy"].tolist() == [n0, 0, n0, 0]


def test_ab_uplift_oracle(ray_session):
    _oracle_check("events_ab_uplift", tables=("events",))


# ---- user_growth_accounting -------------------------------------------------

def test_user_growth_hand_case(ray_session):
    from verify_ray.pipelines.sessions import user_growth_accounting

    day = 86_400_000_000
    # day0: users 1,2 (both new); day1: users 2,3 (3 new);
    # day2: user 1 (returning)
    t = pa.table({
        "user_id": pa.array([1, 2, 2, 3, 1, 1], type=pa.int64()),
        "ts": pa.array([0, 1, day, day + 5, 2 * day, 2 * day + 9],
                       type=pa.timestamp("us"))})
    out = user_growth_accounting(_ds(t), num_buckets=4)
    assert list(out.day) == [0, 1, 2]
    assert list(out.n_new) == [2, 1, 0]
    assert list(out.n_active) == [2, 2, 1]
    assert list(out.cum_users) == [2, 3, 3]


def test_user_growth_oracle(ray_session):
    _oracle_check("events_user_growth", tables=("events",))


# ---- grouped_weighted_median ------------------------------------------------

def test_weighted_median_hand_case(ray_session):
    from verify_ray.pipelines.analytics import grouped_weighted_median

    t = pa.table({
        "g": ["a"] * 3 + ["b"] * 2,
        "v": pa.array([10.0, 20.0, 30.0, 1.0, 2.0]),
        "w": pa.array([1, 1, 4, 3, 3], type=pa.int64())})
    out = grouped_weighted_median(_ds(t), "g", "v", "w")
    # a: W=6, thr=3 -> cum [1,2,6] -> first >=3 is 30
    # b: W=6, thr=3 -> cum [3,6] -> first >=3 is 1
    assert list(out.g) == ["a", "b"]
    assert list(out.wmedian) == [30.0, 1.0]
    assert list(out.total_w) == [6, 6]
    assert list(out.n) == [3, 2]


def test_weighted_median_zero_weight_drops(ray_session):
    from verify_ray.pipelines.analytics import grouped_weighted_median

    t = pa.table({
        "g": ["a", "a", "a"],
        "v": pa.array([5.0, 99.0, None]),
        "w": pa.array([2, 0, 7], type=pa.int64())})
    out = grouped_weighted_median(_ds(t, blocks=1), "g", "v", "w")
    assert list(out.wmedian) == [5.0]
    assert list(out.total_w) == [2]


def test_weighted_median_oracle(ray_session):
    _oracle_check("lineitem_weighted_median", tables=("lineitem",))


# ---- pareto_coverage --------------------------------------------------------

def test_pareto_coverage_hand_case(ray_session):
    from verify_ray.pipelines.analytics import pareto_coverage

    # per-key counts: 10, 5, 3, 1, 1 (total 20); 80% -> thr 16
    # greedy: 10 + 5 = 15 < 16 -> need the 3 too -> k_min = 3
    keys = [1] * 10 + [2] * 5 + [3] * 3 + [4] + [5]
    t = pa.table({"user_id": pa.array(keys, type=pa.int64())})
    out = pareto_coverage(_ds(t, blocks=3), permille=800)
    assert out.n_keys[0] == 5
    assert out.n_events[0] == 20
    assert out.threshold[0] == 16
    assert out.k_min[0] == 3


def test_pareto_coverage_tie_runs(ray_session):
    from verify_ray.pipelines.analytics import pareto_coverage

    # four keys with equal counts 5 (total 20); thr(500‰)=10 -> 2 keys
    keys = sum(([k] * 5 for k in range(4)), [])
    t = pa.table({"user_id": pa.array(keys, type=pa.int64())})
    out = pareto_coverage(_ds(t), permille=500)
    assert out.k_min[0] == 2


def test_pareto_coverage_oracle(ray_session):
    _oracle_check("users_pareto_coverage", tables=("events",))


# ---- global_gap_windows -----------------------------------------------------

def test_global_gaps_within_and_across_days(ray_session):
    from verify_ray.pipelines.analytics import global_gap_windows

    h = 3_600_000_000
    day = 24 * h
    # day0: events at 0h, 1h (gap 1h), 1h+1s; then silence until
    # day2 10h (cross-day hole spanning empty day1)
    ts = [0, h, h + 1_000_000, 2 * day + 10 * h]
    t = pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))})
    out = global_gap_windows(_ds(t), min_gap_us=h // 2)
    assert list(out.gap_start_us) == [0, h + 1_000_000]
    assert list(out.gap_end_us) == [h, 2 * day + 10 * h]
    assert list(out.gap_us) == [h, 2 * day + 9 * h - 1_000_000]


def test_global_gaps_duplicate_ts_collapse(ray_session):
    from verify_ray.pipelines.analytics import global_gap_windows

    t = pa.table({"ts": pa.array([0, 0, 5_000_000_000, 5_000_000_000],
                                 type=pa.timestamp("us"))})
    out = global_gap_windows(_ds(t), min_gap_us=1_000_000_000)
    assert len(out) == 1
    assert out.gap_us[0] == 5_000_000_000


def test_global_gaps_oracle(ray_session):
    _oracle_check("events_global_gaps", tables=("events",))


# ---- source_bigram_coverage -------------------------------------------------

def test_bigram_coverage_hand_case(ray_session):
    from verify_ray.pipelines.text import source_bigram_coverage

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": ["A", "B", "B"],
        "text": ["x y z",          # A bigrams: "x y", "y z"
                 "x y x y",        # B: "x y" x2, "y x"
                 "q r"]})          # B: "q r"
    out = source_bigram_coverage(_ds(t), num_buckets=4)
    out = out.set_index(["source_a", "source_b"])
    # B has 4 bigram tokens; A covers the two "x y" -> 2
    assert out.loc[("A", "B")].tolist() == [4, 2]
    # A has 2 bigram tokens; B covers "x y" -> 1
    assert out.loc[("B", "A")].tolist() == [2, 1]


def test_bigram_coverage_oracle(ray_session):
    _oracle_check("docs_bigram_coverage", tables=("documents",))
