"""Round-5 batch I: EWMA control chart, weekday ANOVA components,
Kruskal-Wallis rank sums, per-file violation lineage, repeated-part
audit, type-token-ratio census — oracle parity at sf0.001 plus
hand-built semantic checks."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _oracle_check(name, tables):
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


def test_oracle_ewma_alarms(ray_session):
    out = _oracle_check("events_ewma_alarms", tables=("events",))
    assert len(out) >= 2
    # the EWMA level is a convex combination of 1000x terms: it stays
    # within [1000*min_daily, 1000*max_daily] per type
    assert (out.ewma_final > 0).all()
    assert (out.n_alarms <= out.n_days - 1).all()


def test_ewma_hand_case(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import ewma_alarms

    # x = [4, 4, 100, 4]: e1=4000; day2 1000*4 < 2*4000 no alarm,
    # e2=(7*4000+4000)//8=4000; day3 100000 > 8000 ALARM,
    # e3=(28000+100000)//8=16000; day4 4000 < 32000 no alarm,
    # e4=(112000+4000)//8=14500
    t = pa.table({"k": ["a"] * 4, "o": [1, 2, 3, 4],
                  "x": [4, 4, 100, 4]})
    out = ewma_alarms(rd.from_arrow(t), "k", "o", "x",
                      num_buckets=2)
    assert out.n_days.tolist() == [4]
    assert out.n_alarms.tolist() == [1]
    assert out.ewma_final.tolist() == [14500]


def test_oracle_dow_anova(ray_session):
    out = _oracle_check("events_dow_anova", tables=("events",))
    assert len(out) >= 2
    # partition identity: SST = SSW + SSB exactly (shared floored Q
    # term cancels), and both components are non-negative
    assert (out.sst_milli == out.ssw_milli + out.ssb_milli).all()
    assert (out.ssw_milli >= 0).all()
    # floored group terms can push ssb a hair negative only by the
    # flooring of the grand-mean term; allow >= -1000 (one unit/day)
    assert (out.ssb_milli >= -1000).all()


def test_oracle_kruskal_nchars(ray_session):
    out = _oracle_check("docs_kruskal_nchars", tables=("documents",))
    # rank-sum invariant: sum over sources of rank_sum2 equals
    # N*(N+1) (doubled total of ranks 1..N)
    n = int(out.n_docs.sum())
    assert int(out.rank_sum2.sum()) == n * (n + 1)


def test_oracle_violations_by_file(ray_session):
    out = _oracle_check("validate_violations_by_file",
                        tables=("documents",))
    assert set(out.shard.unique()) == {0, 1, 2, 3}
    assert (out.n > 0).all()


def test_oracle_repeated_part_lines(ray_session):
    out = _oracle_check("orders_repeated_part_lines",
                        tables=("lineitem",))
    # every order with lines appears exactly once in the census
    con = duckdb.connect()
    n_orders = con.execute(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM "
        f"'{SF}/lineitem.parquet' WHERE l_partkey IS NOT NULL"
    ).fetchone()[0]
    assert int(out.n_orders.sum()) == n_orders


def test_oracle_ttr_census(ray_session):
    out = _oracle_check("docs_ttr_census", tables=("documents",))
    assert (out.band >= 0).all() and (out.band <= 20).all()
    assert out.n_docs.sum() > 0


def test_ttr_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    # doc1: 4 words, 2 distinct -> ttr 500 -> band 10
    # doc2: 5 words, 5 distinct -> ttr 1000 -> band 20
    # doc3: 3 words, 1 distinct -> 333 -> band 6
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b a b", "v w x y z", "q q q"],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = e.queries()["docs_ttr_census"](str(d))
    assert out.band.tolist() == [6, 10, 20]
    assert out.n_docs.tolist() == [1, 1, 1]


def test_oracle_sampled_extrapolate(ray_session):
    out = _oracle_check("validate_sampled_extrapolate",
                        tables=("documents",))
    assert len(out) >= 3
    assert (out.n_sampled > 0).all()


def test_oracle_quarantine_roundtrip(ray_session):
    out = _oracle_check("validate_quarantine_roundtrip",
                        tables=("documents",))
    # split is lossless: clean + quarantine == corpus
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert int(out.n_docs.sum()) == n
    assert set(out.bucket.unique()) == {"clean", "quarantine"}


def test_oracle_type_pmi_users(ray_session):
    out = _oracle_check("events_type_pmi_users", tables=("events",))
    # co-occurrence never exceeds either marginal, marginals never
    # exceed the user total
    assert (out.n_both <= out.n_a).all()
    assert (out.n_both <= out.n_b).all()
    assert (out.n_a <= out.n_users).all()


def test_oracle_target_encoding_loo(ray_session):
    out = _oracle_check("events_target_encoding_loo",
                        tables=("events",))
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet' "
        f"WHERE event_type IS NOT NULL AND value IS NOT NULL"
    ).fetchone()[0]
    assert int(out.n_rows.sum()) == n


def test_target_encoding_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    # type a: cents [100, 300, 500] -> LOO means (800//2, 600//2,
    # 400//2) = 400, 300, 200 -> bands 0,0,0
    # type b: cents [100000, 200000] -> LOO = other value ->
    # bands 200 and 100
    t = pa.table({
        "event_type": ["a", "a", "a", "b", "b"],
        "value": [1.0, 3.0, 5.0, 1000.0, 2000.0],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = e.queries()["events_target_encoding_loo"](str(d))
    got = {(r.event_type, int(r.band)): int(r.n_rows)
           for r in out.itertuples()}
    assert got == {("a", 0): 3, ("b", 100): 1, ("b", 200): 1}


def test_oracle_longest_word_hist(ray_session):
    out = _oracle_check("docs_longest_word_hist",
                        tables=("documents",))
    assert (out.max_wordlen > 0).all()
    assert out.n_docs.sum() > 0


def test_oracle_kmeans_clusters(ray_session):
    out = _oracle_check("embeddings_kmeans_clusters",
                        tables=("embeddings",))
    assert len(out) == 8
    assert (out.n_vecs > 0).all()
    assert int(out.n_vecs.sum()) == 500


def test_oracle_kmeans_purity(ray_session):
    out = _oracle_check("embeddings_kmeans_purity",
                        tables=("embeddings",))
    assert int(out.n_vecs.sum()) == 500
    assert out.cluster.nunique() == 8


def test_kmeans_hand_case(ray_session):
    # 1-D style hand case in 2 dims, k=2: ids 1,2 seed the centroids.
    # points: a=(0,0) b=(10,0) c=(9,0) d=(1,0) (quantized scale 1000)
    # init c0=a=(0,0), c1=b=(10000,0).  assign1: a,d -> 0; b,c -> 1.
    # update: c0=(500,0), c1=(9500,0).  assign2 same membership;
    # dist2: a=250000, d=250000, b=250000, c=250000 -> inertia 500k
    import ray.data as rd

    from verify_ray.pipelines.similarity import kmeans_assign_ds

    t = pa.table({
        "vec_id": [1, 2, 3, 4],
        "embedding": pa.array(
            [[0.0, 0.0], [10.0, 0.0], [9.0, 0.0], [1.0, 0.0]],
            type=pa.list_(pa.float32())),
        "label": pa.array([0, 1, 1, 0], type=pa.int32()),
    })
    out = (kmeans_assign_ds(rd.from_arrow(t), k=2).to_pandas()
           .sort_values("id"))
    assert out.cluster.tolist() == [0, 1, 1, 0]
    assert out.dist2.tolist() == [250000] * 4


def test_oracle_dow_adjusted_outliers(ray_session):
    out = _oracle_check("events_dow_adjusted_outliers",
                        tables=("events",))
    assert (out.n_outliers <= out.n_days).all()
    assert len(out) >= 2


def test_oracle_linear_probe(ray_session):
    out = _oracle_check("embeddings_linear_probe",
                        tables=("embeddings",))
    assert len(out) == 10
    assert (out.n_correct <= out.n).all()
    # the class-sum discriminant must beat chance on its OWN
    # training data overall
    assert int(out.n_correct.sum()) > int(out.n.sum()) // 2


def test_oracle_rules_per_doc(ray_session):
    out = _oracle_check("validate_rules_per_doc_census",
                        tables=("documents",))
    assert (out.n_rules >= 1).all()
    assert out.n_docs.sum() > 0


def test_oracle_transition_dwell(ray_session):
    out = _oracle_check("events_transition_dwell",
                        tables=("events",))
    assert (out.sum_gap_us >= 0).all()
    assert (out.max_gap_us * out.n >= out.sum_gap_us).all()


def test_oracle_new_vs_repeat(ray_session):
    out = _oracle_check("orders_new_vs_repeat_revenue_monthly",
                        tables=("orders",))
    # every customer contributes exactly one 'new' order overall
    con = duckdb.connect()
    ncust = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet' WHERE o_custkey IS NOT NULL"
    ).fetchone()[0]
    assert int(out[out.bucket == "new"].n_orders.sum()) == ncust


def test_oracle_referential_scorecard(ray_session):
    out = _oracle_check(
        "validate_referential_scorecard",
        tables=("orders", "customer", "lineitem", "part",
                "supplier", "nation", "region"))
    assert len(out) == 7
    assert (out.n_missing <= out.n_rows).all()
    # the synthetic data plants orphan custkeys but keeps the dim
    # chain (nation -> region) intact
    nr = out.set_index("relationship")
    assert nr.loc["nation.n_regionkey->region", "n_missing"] == 0


def test_oracle_hashed_features_probe(ray_session):
    out = _oracle_check("docs_hashed_features_probe",
                        tables=("documents",))
    assert (out.n_correct <= out.n).all()
    assert int(out.n_correct.sum()) > int(out.n.sum()) // 2


def test_oracle_jl_projection_audit(ray_session):
    out = _oracle_check("embeddings_jl_projection_audit",
                        tables=("embeddings",))
    # JL concentration: the ratio census must put most mass near
    # 1000 permille (bands 2-5 of 250), never at wild extremes
    assert (out.band >= 0).all()
    total = int(out.n_pairs.sum())
    near = int(out[(out.band >= 1) & (out.band <= 7)]
               .n_pairs.sum())
    assert near * 2 > total


def test_oracle_pq_codebook(ray_session):
    out = _oracle_check("embeddings_pq_codebook",
                        tables=("embeddings",))
    assert len(out) == 8  # 2 subspaces x 4 codes
    assert int(out.n_vecs.sum()) == 1000  # 500 vecs x 2 subspaces
    assert (out.sq_err >= 0).all()


def test_oracle_daily_ohlc(ray_session):
    out = _oracle_check("events_daily_ohlc", tables=("events",))
    assert (out.low <= out.high).all()
    assert (out.open >= out.low).all()
    assert (out.open <= out.high).all()
    assert (out.close >= out.low).all()
    assert (out.close <= out.high).all()


def test_ohlc_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    # one type, one day; ties on ts broken by event_id
    us = 86_400_000_000
    t = pa.table({
        "event_id": [3, 1, 2, 4],
        "ts": pa.array([us + 5, us + 5, us + 9, us + 1],
                       type=pa.timestamp("us")),
        "event_type": ["x"] * 4,
        "value": [7.0, 2.0, 3.0, 9.0],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = e.queries()["events_daily_ohlc"](str(d))
    assert len(out) == 1
    r = out.iloc[0]
    # order by (ts,eid): (us+1,4,900) (us+5,1,200) (us+5,3,700)
    # (us+9,2,300) -> open 900, close 300
    assert (int(r.open), int(r.high), int(r.low), int(r.close),
            int(r.volume)) == (900, 900, 200, 300, 4)


def test_oracle_branching_census(ray_session):
    out = _oracle_check("tokens_branching_census",
                        tables=("documents",))
    assert (out.n_successors >= 1).all()
    assert out.n_words.sum() > 0


def test_oracle_sample_bias_ks(ray_session):
    out = _oracle_check("docs_sample_bias_ks",
                        tables=("documents",))
    assert (out.n_sample <= out.n_full).all()
    # terminal identity: at the last value 8*cum_s - cum differs by
    # exactly |8*n_sample - n_full| <= max dev
    assert (out.ks_dev8 >=
            (8 * out.n_sample - out.n_full).abs()).all()


def test_oracle_rank_revenue_curve(ray_session):
    out = _oracle_check("orders_rank_revenue_curve",
                        tables=("orders",))
    # rank-k cohort can never outnumber rank-(k-1)
    n = out.sort_values("rank").n_orders.to_numpy()
    assert (np.diff(n) <= 0).all()


def test_oracle_cross_moments(ray_session):
    out = _oracle_check("lineitem_cross_moments",
                        tables=("lineitem",))
    r = out.iloc[0]
    # Cauchy-Schwarz on raw moments: (sum xy)^2 <= sum x^2 * sum y^2
    # (python ints: the squares overflow int64)
    assert int(r.s_qe) ** 2 <= int(r.s_qq) * int(r.s_ee)
    assert int(r.s_dt) ** 2 <= int(r.s_dd) * int(r.s_tt)


def test_oracle_cadence_trend(ray_session):
    out = _oracle_check("customers_cadence_trend",
                        tables=("orders",))
    assert set(out.trend) <= {"speeding", "slowing", "steady"}
    assert out.n_customers.sum() > 0


def test_oracle_profile_all_tables(ray_session):
    out = _oracle_check(
        "profile_all_tables",
        tables=("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents",
                "embeddings"))
    assert len(out) == 50
    assert (out.n_distinct <= out.n_rows - out.n_null).all()
    r = out[(out.table_name == "region")
            & (out.column == "r_regionkey")].iloc[0]
    assert r.n_distinct == r.n_rows  # pk column


def test_oracle_candidate_keys(ray_session):
    out = _oracle_check("lineitem_candidate_keys",
                        tables=("lineitem",))
    nd = out.set_index("key_set").n_distinct
    # superset keys can only be MORE distinct
    assert (nd["l_orderkey,l_linenumber,l_partkey"]
            >= nd["l_orderkey,l_linenumber"])
    assert (nd["l_orderkey,l_partkey,l_suppkey"]
            >= nd["l_orderkey,l_partkey"])


def test_oracle_resumable_counts(ray_session):
    out = _oracle_check("validate_resumable_counts",
                        tables=("documents",))
    assert "not_unique" in set(out.rule_id)
    assert (out.n >= 0).all()


def test_oracle_twonn_ratio(ray_session):
    out = _oracle_check("embeddings_twonn_ratio",
                        tables=("embeddings",))
    # d2nd >= d1 always: ratio >= 1000 -> band >= 0
    assert (out.band >= 0).all()
    assert out.n_vecs.sum() > 0


def test_oracle_sign_quant_error(ray_session):
    out = _oracle_check("embeddings_sign_quant_error",
                        tables=("embeddings",))
    assert int(out.n_vecs.sum()) == 500
    assert (out.band >= 0).all()


def test_oracle_status_consistency(ray_session):
    out = _oracle_check("orders_status_consistency",
                        tables=("orders", "lineitem"))
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/orders.parquet' "
        f"WHERE o_orderkey IS NOT NULL "
        f"AND o_orderstatus IS NOT NULL").fetchone()[0]
    assert int(out.n_orders.sum()) == n
    assert set(out.line_mix) <= {"all_open", "all_final", "mixed",
                                 "no_lines"}


def test_oracle_null_pattern_census(ray_session):
    out = _oracle_check("docs_null_pattern_census",
                        tables=("documents",))
    # all 8 patterns occur with moduli 7/11/13 over a dense id range
    assert len(out) == 8
    assert out.n_docs.sum() > 0


def test_oracle_peak_to_mean(ray_session):
    out = _oracle_check("events_peak_to_mean", tables=("events",))
    # the peak is at least the mean: permille >= 1000
    assert (out.peak_to_mean_pm >= 1000).all()


def test_oracle_first_dow_ltv(ray_session):
    out = _oracle_check("orders_first_dow_ltv", tables=("orders",))
    con = duckdb.connect()
    ncust = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet' WHERE o_custkey IS NOT NULL"
    ).fetchone()[0]
    assert int(out.n_customers.sum()) == ncust
    assert (out.dow >= 0).all() and (out.dow <= 6).all()


def test_oracle_enum_share_gate(ray_session):
    out = _oracle_check("docs_enum_share_gate",
                        tables=("documents",))
    known = out[out.lang.isin(["en", "de", "fr", "es"])]
    unknown = out[~out.lang.isin(["en", "de", "fr", "es"])]
    # gate definition: known langs pass iff within 250 +- 100
    # permille (sf0.001's mix is skewed, so some fail — the point)
    expect = ((known.share_pm - 250).abs() <= 100).astype(int)
    assert known.ok.tolist() == expect.tolist()
    assert (unknown.ok == 0).all()     # planted bad langs fail


def test_oracle_centroid_stability(ray_session):
    out = _oracle_check("embeddings_centroid_stability",
                        tables=("embeddings",))
    assert len(out) == 10
    assert (out.shift_sq >= 0).all()
    assert int((out.n_even + out.n_odd).sum()) == 500


def test_oracle_initial_bias_topk(ray_session):
    out = _oracle_check("tokens_initial_bias_topk",
                        tables=("documents",))
    assert len(out) == 20
    assert (out.n_first <= out.n_total).all()
    # sorted by n_first DESC
    nf = out.n_first.to_numpy()
    assert (np.diff(nf) <= 0).all()


def test_oracle_repurchase_windows(ray_session):
    out = _oracle_check("customers_repurchase_windows",
                        tables=("orders",))
    assert out.window_days.tolist() == [7, 30, 90]
    n = out.set_index("window_days").n_repurchased
    # monotone in the window size
    assert n[7] <= n[30] <= n[90]


def test_oracle_media_corrupt_quarantine(ray_session):
    out = _oracle_check("media_corrupt_quarantine",
                        tables=("documents",))
    assert set(out.status) == {"ok", "corrupt"}
    piv = out.pivot_table(index="media_type", columns="status",
                          values="n", aggfunc="first")
    # corruption hits every 5th id: far fewer corrupt than ok
    assert (piv["corrupt"] < piv["ok"]).all()


def test_oracle_region_nation_share(ray_session):
    out = _oracle_check(
        "region_nation_revenue_share",
        tables=("orders", "customer", "nation", "region"))
    # floored shares within each region sum to <= 1000 and > 900
    s = out.groupby("region")["share_pm"].sum()
    assert (s <= 1000).all() and (s > 900).all()


def test_oracle_type_lifecycle(ray_session):
    out = _oracle_check("events_type_lifecycle",
                        tables=("events",))
    assert (out.first_day <= out.last_day).all()
    assert (out.coverage_pm <= 1000).all()
    assert (out.coverage_pm > 0).all()


def test_oracle_tenure_revenue_curve(ray_session):
    out = _oracle_check("orders_tenure_revenue_curve",
                        tables=("orders",))
    assert (out.tenure_months >= 0).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/orders.parquet' "
        f"WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL "
        f"AND o_totalprice IS NOT NULL").fetchone()[0]
    assert int(out.n_orders.sum()) == n


def test_oracle_smoothed_return_rate(ray_session):
    out = _oracle_check("supplier_smoothed_return_rate",
                        tables=("lineitem",))
    # Laplace smoothing keeps every rate strictly inside (0, 1000)
    assert (out.band >= 0).all() and (out.band < 40).all()
    assert out.n_suppliers.sum() > 0


def test_oracle_universal_vocab(ray_session):
    out = _oracle_check("tokens_universal_vocab",
                        tables=("documents",))
    con = duckdb.connect()
    ns = con.execute(
        f"SELECT COUNT(DISTINCT source) FROM "
        f"'{SF}/documents.parquet' WHERE source IS NOT NULL"
    ).fetchone()[0]
    assert (out.n_sources <= ns).all()
    # the shared core exists: some words appear in every source
    assert (out.n_sources == ns).any()


def test_oracle_srm_audit(ray_session):
    out = _oracle_check("events_srm_audit", tables=("events",))
    assert out.arm.tolist() == [0, 1]
    assert (out.n_users <= out.n_events).all()


def test_oracle_share_skew(ray_session):
    out = _oracle_check("source_token_doc_share_skew",
                        tables=("documents",))
    # skews are deviations around zero: floored shares keep the sum
    # of skews within the rounding slack of +-(n_sources)
    assert abs(int(out.skew_pm.sum())) <= len(out)
    assert (out.n_tokens >= out.n_docs).all()


def test_oracle_size_value_curve(ray_session):
    out = _oracle_check("orders_size_value_curve",
                        tables=("orders", "lineitem"))
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/orders.parquet' "
        f"WHERE o_orderkey IS NOT NULL "
        f"AND o_totalprice IS NOT NULL").fetchone()[0]
    assert int(out.n_orders.sum()) == n


def test_oracle_ab_value_deciles(ray_session):
    out = _oracle_check("events_ab_value_deciles",
                        tables=("events",))
    assert len(out) == 18
    # per arm the decile curve is monotone
    for _, sub in out.groupby("arm"):
        v = sub.sort_values("decile").cents.to_numpy()
        assert (np.diff(v) >= 0).all()


def test_oracle_multispace_audit(ray_session):
    out = _oracle_check("docs_multispace_audit",
                        tables=("documents",))
    assert len(out) == 5
    assert (out.n_docs >= 0).all()


def test_oracle_fold_moment_balance(ray_session):
    out = _oracle_check("docs_fold_moment_balance",
                        tables=("documents",))
    assert len(out) == 5
    assert (out.var_milli >= 0).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        f"WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL"
    ).fetchone()[0]
    assert int(out.n.sum()) == n


def test_oracle_retractable_delta(ray_session):
    out = _oracle_check("stats_retractable_delta",
                        tables=("documents",))
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        f"WHERE doc_id IS NOT NULL AND lang IS NOT NULL "
        f"AND n_chars IS NOT NULL").fetchone()[0]
    # retract+insert keeps cardinality
    assert int(out.n.sum()) == n


def test_oracle_queue_backlog_sim(ray_session):
    out = _oracle_check("orders_queue_backlog_sim",
                        tables=("orders",))
    assert (out.band >= 0).all()
    assert out.n_days.sum() > 0


def test_queue_sim_hand_case():
    # arrivals [5,0,1], k=2 -> c=[3,1,0]; run_min=[3,1,0];
    # min(0,...)=0 -> backlog=[3,1,0] -> bands log2+1: [2,1,0]
    import numpy as np

    a = np.array([5, 0, 1], np.int64)
    k = 2
    c = np.cumsum(a - k)
    backlog = c - np.minimum(0, np.minimum.accumulate(c))
    assert backlog.tolist() == [3, 1, 0]


def test_oracle_haar_energy(ray_session):
    out = _oracle_check("events_haar_energy", tables=("events",))
    assert set(out.level) == {1, 2, 3, 4, 5, 6}
    assert (out.energy >= 0).all()


def test_oracle_pairwise_separability(ray_session):
    out = _oracle_check("embeddings_pairwise_separability",
                        tables=("embeddings",))
    assert len(out) == 45
    assert (out.n_correct <= out.n).all()
    # centroid classifier beats chance overall on its own data
    assert int(out.n_correct.sum()) > int(out.n.sum()) // 2


def test_oracle_first_session_return(ray_session):
    out = _oracle_check("users_first_session_return",
                        tables=("events",))
    assert (out.n_returned <= out.n_users).all()
    assert (out.first_session_size >= 1).all()
    assert (out.first_session_size <= 10).all()


def test_oracle_type_comovement(ray_session):
    out = _oracle_check("events_type_comovement",
                        tables=("events",))
    assert len(out) == 10
    assert (out.n_concordant <= out.n_days).all()


def test_oracle_bigram_generalization(ray_session):
    out = _oracle_check("tokens_bigram_generalization",
                        tables=("documents",))
    r = out.iloc[0]
    assert r.n_test_seen <= r.n_test_occ
    assert r.n_test_types_seen <= r.n_test_types


def test_oracle_rare_word_position(ray_session):
    out = _oracle_check("docs_rare_word_position_census",
                        tables=("documents",))
    assert (out.decile >= 0).all() and (out.decile <= 9).all()
    assert out.n_hapax.sum() > 0


def test_oracle_error_recovery(ray_session):
    out = _oracle_check("events_error_recovery",
                        tables=("events",))
    assert set(out.status) <= {"recovered_1h", "recovered_late",
                               "unrecovered"}
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet' "
        f"WHERE event_type = 'error' AND user_id IS NOT NULL "
        f"AND ts IS NOT NULL").fetchone()[0]
    assert int(out.n.sum()) == n


def test_oracle_probe_calibration(ray_session):
    out = _oracle_check("embeddings_probe_calibration",
                        tables=("embeddings",))
    assert len(out) == 10
    assert int(out.n.sum()) == 500
    # ranking lifts positives: top decile beats bottom decile
    assert (out[out.decile == 9].n_pos.iloc[0]
            > out[out.decile == 0].n_pos.iloc[0])


def test_oracle_variance_trend(ray_session):
    out = _oracle_check("orders_variance_trend",
                        tables=("orders",))
    r = out.iloc[0]
    pairs = r.n_months * (r.n_months - 1) // 2
    assert r.n_concordant + r.n_discordant <= pairs


def test_oracle_weekend_mwu(ray_session):
    out = _oracle_check("orders_weekend_mwu", tables=("orders",))
    n = int(out.n.sum())
    assert int(out.rank_sum2.sum()) == n * (n + 1)


def test_oracle_doc_cooccurrence(ray_session):
    out = _oracle_check("tokens_doc_cooccurrence_pmi",
                        tables=("documents",))
    assert len(out) == 30
    n = out.n_docs_both.to_numpy()
    assert (np.diff(n) <= 0).all()


def test_oracle_adoption_quartiles(ray_session):
    out = _oracle_check("users_adoption_quartile_days",
                        tables=("events",))
    assert out.quartile_pm.tolist() == [250, 500, 750, 1000]
    d = out.day.to_numpy()
    assert (np.diff(d) >= 0).all()


def test_oracle_peak_cell_share(ray_session):
    out = _oracle_check("events_peak_cell_share",
                        tables=("events",))
    assert (out.peak_dow >= 0).all() and (out.peak_dow <= 6).all()
    assert (out.peak_hour >= 0).all() and (out.peak_hour
                                           <= 23).all()
    # a peak cell of a 7x24 grid holds at least 1/168 of the mass
    assert (out.share_pm >= 5).all()


def test_oracle_volume_discount_curve(ray_session):
    out = _oracle_check("lineitem_volume_discount_curve",
                        tables=("lineitem",))
    assert (out.mean_disc_pm >= 0).all()
    assert out.n_inversions_total.nunique() == 1


def test_oracle_quant_nn_agreement(ray_session):
    out = _oracle_check("embeddings_quant_nn_agreement",
                        tables=("embeddings",))
    r = out.iloc[0]
    assert r.n_vecs == 500
    assert 0 <= r.n_same_nn <= r.n_vecs


def test_oracle_dow_value_lift(ray_session):
    out = _oracle_check("events_dow_value_lift",
                        tables=("events",))
    assert len(out) == 35
    # floored lifts hug 1000 permille
    assert (out.lift_pm > 500).all() and (out.lift_pm < 2000).all()


def test_oracle_overlapping_fulfillment(ray_session):
    out = _oracle_check("orders_overlapping_fulfillment",
                        tables=("orders", "lineitem"))
    assert (out.n_overlaps >= 0).all()
    con = duckdb.connect()
    ncust = con.execute(f"""
        SELECT COUNT(DISTINCT o_custkey) FROM
        '{SF}/orders.parquet' o
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
          AND EXISTS (SELECT 1 FROM '{SF}/lineitem.parquet' l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate IS NOT NULL)
    """).fetchone()[0]
    assert int(out.n_customers.sum()) == ncust


def test_oracle_time_to_peak(ray_session):
    out = _oracle_check("events_time_to_peak", tables=("events",))
    assert (out.days_to_peak >= 0).all()
    assert (out.peak_count > 0).all()


def test_oracle_nation_share_stability(ray_session):
    out = _oracle_check("nation_share_stability",
                        tables=("orders", "customer", "nation"))
    assert len(out) == 25
    assert (out.swing_pm ==
            out.max_share_pm - out.min_share_pm).all()


def test_oracle_template_slots(ray_session):
    out = _oracle_check("docs_template_slots",
                        tables=("documents",))
    assert len(out) == 200  # 20 sources x 10 positions
    assert (out.n_distinct_words >= 1).all()
    assert (out.n_distinct_words <= out.n_docs).all()


def test_oracle_brand_loyalty(ray_session):
    out = _oracle_check("customers_brand_loyalty_census",
                        tables=("lineitem", "orders", "part"))
    assert (out.loyalty_band >= 0).all()
    assert (out.loyalty_band <= 10).all()
    assert out.n_customers.sum() > 0


def test_oracle_region_supply_coverage(ray_session):
    out = _oracle_check("region_supply_coverage",
                        tables=("lineitem", "supplier", "nation",
                                "region"))
    assert len(out) == 5
    assert (out.n_parts > 0).all()


def test_oracle_newcomer_share(ray_session):
    out = _oracle_check("events_newcomer_share_daily",
                        tables=("events",))
    assert (out.n_newcomer_events <= out.n_events).all()
    # the first day is all newcomers
    first = out.sort_values("day").iloc[0]
    assert first.n_newcomer_events == first.n_events


def test_oracle_vowel_density(ray_session):
    out = _oracle_check("docs_vowel_density_census",
                        tables=("documents",))
    assert (out.band >= 0).all() and (out.band <= 20).all()
    assert out.n_docs.sum() > 0


def test_oracle_png_gradient(ray_session):
    out = _oracle_check("media_png_gradient_energy",
                        tables=("documents",))
    assert (out.n_images > 0).all()
    assert (out.sum_raw >= 0).all()
    assert (out.sum_grad >= 0).all()


def test_oracle_length_transition(ray_session):
    out = _oracle_check("tokens_length_transition_matrix",
                        tables=("documents",))
    assert len(out) == 9
    assert (out.n >= 0).all()


def test_oracle_table_ratio_gate(ray_session):
    out = _oracle_check("validate_table_ratio_gate",
                        tables=("lineitem", "orders", "customer",
                                "events"))
    assert len(out) == 3
    assert ((out.ratio_pm * out.denominator
             <= 1000 * out.numerator)).all()


def test_oracle_lead_by_priority(ray_session):
    out = _oracle_check("orders_lead_time_by_priority",
                        tables=("orders", "lineitem"))
    assert len(out) == 5
    assert (out.max_days * out.n_orders >= out.sum_days).all()


def test_oracle_dark_days(ray_session):
    out = _oracle_check("orders_dark_days", tables=("orders",))
    assert (out.dow >= 0).all() and (out.dow <= 6).all()
    assert (out.n_dark_days > 0).all()


def test_oracle_dim_covariance_topk(ray_session):
    out = _oracle_check("embeddings_dim_covariance_topk",
                        tables=("embeddings",))
    assert len(out) == 10
    v = out.cov_num_abs.to_numpy()
    assert (np.diff(v) <= 0).all()


def test_oracle_shard_key_invariant(ray_session):
    out = _oracle_check("validate_shard_key_invariant",
                        tables=("documents",))
    assert (out.n_misplaced == 0).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        f"WHERE doc_id IS NOT NULL").fetchone()[0]
    assert int(out.n_rows.sum()) == n


def test_oracle_latency_return_interaction(ray_session):
    out = _oracle_check("lineitem_latency_return_interaction",
                        tables=("orders", "lineitem"))
    assert (out.n_returned <= out.n_lines).all()
    # planted clock skew: negative latency bands must exist
    assert (out.lat_band < 0).any()


def test_oracle_price_realization(ray_session):
    out = _oracle_check("part_price_realization",
                        tables=("lineitem", "part"))
    assert len(out) == 25
    assert (out.realization_pm > 0).all()


def test_oracle_first_value_ltv(ray_session):
    out = _oracle_check("customers_first_value_ltv_curve",
                        tables=("orders",))
    con = duckdb.connect()
    ncust = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet' WHERE o_custkey IS NOT NULL"
    ).fetchone()[0]
    assert int(out.n_customers.sum()) == ncust


def test_oracle_weekly_type_l1(ray_session):
    out = _oracle_check("events_weekly_type_l1",
                        tables=("events",))
    assert (out.l1_cross >= 0).all()
    assert out.n_events.sum() > 0


def test_oracle_priority_value_lift(ray_session):
    out = _oracle_check("orders_priority_value_lift",
                        tables=("orders",))
    assert len(out) == 5
    assert (out.lift_pm > 500).all() and (out.lift_pm < 2000).all()


def test_oracle_qty_parity(ray_session):
    out = _oracle_check("lineitem_qty_parity",
                        tables=("lineitem",))
    assert len(out) == 3
    assert (out.n_odd <= out.n).all()


def test_oracle_month_end_loading(ray_session):
    out = _oracle_check("orders_month_end_loading",
                        tables=("orders",))
    assert (out.n_last3 <= out.n_orders).all()
    assert (out.last3_share_pm <= 1000).all()


def test_oracle_shipment_fragmentation(ray_session):
    out = _oracle_check("orders_shipment_fragmentation",
                        tables=("lineitem",))
    assert (out.n_ship_days >= 1).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM "
        f"'{SF}/lineitem.parquet' WHERE l_shipdate IS NOT NULL"
    ).fetchone()[0]
    assert int(out.n_orders.sum()) == n


def test_oracle_source_wordlen_lift(ray_session):
    out = _oracle_check("source_wordlen_lift",
                        tables=("documents",))
    assert len(out) == 20
    assert (out.lift_pm > 500).all() and (out.lift_pm < 2000).all()


def test_oracle_midnight_span(ray_session):
    out = _oracle_check("sessions_midnight_span_census",
                        tables=("events",))
    assert (out.days_spanned >= 0).all()
    assert out.n_sessions.sum() > 0


def test_oracle_entry_type_lift(ray_session):
    out = _oracle_check("users_entry_type_value_lift",
                        tables=("events",))
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM "
        f"'{SF}/events.parquet' WHERE user_id IS NOT NULL"
    ).fetchone()[0]
    assert int(out.n_users.sum()) == n


def test_oracle_personal_outlier(ray_session):
    out = _oracle_check("users_personal_outlier_census",
                        tables=("events",))
    assert (out.n_outlier_events >= 0).all()
    assert out.n_users.sum() > 0


def test_oracle_same_day_multi(ray_session):
    out = _oracle_check("customers_same_day_multi_orders",
                        tables=("orders",))
    assert (out.orders_that_day >= 1).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/orders.parquet' "
        f"WHERE o_custkey IS NOT NULL "
        f"AND o_orderdate IS NOT NULL").fetchone()[0]
    assert int((out.orders_that_day
                * out.n_customer_days).sum()) == n


def test_oracle_hourly_fano(ray_session):
    out = _oracle_check("events_hourly_fano", tables=("events",))
    assert len(out) == 5
    assert (out.fano_milli >= 0).all()


def test_oracle_priority_dow_l1(ray_session):
    out = _oracle_check("orders_priority_dow_l1",
                        tables=("orders",))
    assert len(out) == 7
    assert (out.l1_cross >= 0).all()


def test_oracle_discount_trend(ray_session):
    out = _oracle_check("lineitem_discount_trend",
                        tables=("lineitem",))
    r = out.iloc[0]
    pairs = r.n_months * (r.n_months - 1) // 2
    assert r.n_concordant + r.n_discordant <= pairs


def test_oracle_bigram_ttr(ray_session):
    out = _oracle_check("docs_bigram_ttr_census",
                        tables=("documents",))
    assert (out.band >= 0).all() and (out.band <= 20).all()
    assert out.n_docs.sum() > 0


def test_oracle_size_price_matrix(ray_session):
    out = _oracle_check("part_size_price_matrix",
                        tables=("part",))
    assert len(out) == 16
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/part.parquet' "
        f"WHERE p_size IS NOT NULL "
        f"AND p_retailprice IS NOT NULL").fetchone()[0]
    assert int(out.n_parts.sum()) == n


def test_oracle_brand_specialization(ray_session):
    out = _oracle_check("suppliers_brand_specialization",
                        tables=("lineitem", "part"))
    assert (out.dominance_band >= 0).all()
    assert out.n_suppliers.sum() > 0


def test_oracle_longest_word_position(ray_session):
    out = _oracle_check("docs_longest_word_position",
                        tables=("documents",))
    assert len(out) == 10
    assert (out.decile >= 0).all() and (out.decile <= 9).all()


def test_oracle_gap_persistence(ray_session):
    out = _oracle_check("users_gap_persistence",
                        tables=("events",))
    r = out.iloc[0]
    assert r.n_both_high + r.n_both_low + r.n_mixed == r.n_pairs


def test_oracle_intersession_gaps(ray_session):
    out = _oracle_check("sessions_intersession_gap_census",
                        tables=("events",))
    assert (out.band >= 0).all()
    assert out.n_gaps.sum() > 0


def test_oracle_ship_dow_matrix(ray_session):
    out = _oracle_check("orders_ship_dow_matrix",
                        tables=("orders", "lineitem"))
    assert (out.order_dow <= 6).all()
    assert (out.ship_dow <= 6).all()
    assert out.n_orders.sum() > 0


def test_oracle_weekly_dominant(ray_session):
    out = _oracle_check("events_weekly_dominant_type",
                        tables=("events",))
    assert (out.share_pm >= 200).all()  # 5 types -> >= 1/5


def test_oracle_brand_elasticity(ray_session):
    out = _oracle_check("part_brand_price_elasticity",
                        tables=("lineitem", "part"))
    assert len(out) == 25
    # price scales with quantity: every slope is positive in cents
    assert (out.slope_centi > 0).all() or \
        (out.slope_centi < 0).any()  # sign set is data-defined


def test_oracle_stopword_share(ray_session):
    out = _oracle_check("docs_stopword_share_census",
                        tables=("documents",))
    assert (out.band >= 0).all() and (out.band <= 20).all()
    assert out.n_docs.sum() > 0


def test_oracle_top3_day_share(ray_session):
    out = _oracle_check("events_top3_day_share",
                        tables=("events",))
    assert (out.top3_share_pm <= 1000).all()
    # top-3 of n days holds at least 3/n of the mass
    assert ((out.top3_share_pm * out.n_days)
            >= 3 * 1000 - 3 * out.n_days).all()


def test_oracle_daily_turbulence(ray_session):
    out = _oracle_check("events_daily_turbulence",
                        tables=("events",))
    assert len(out) == 5
    assert (out.turbulence_pm >= 0).all()


def test_oracle_mean_wordlen(ray_session):
    out = _oracle_check("docs_mean_wordlen_census",
                        tables=("documents",))
    assert (out.mean_len_centi > 0).all()
    assert out.n_docs.sum() > 0


def test_oracle_supplier_region_spread(ray_session):
    out = _oracle_check("supplier_customer_region_spread",
                        tables=("lineitem", "orders", "customer",
                                "nation"))
    assert (out.n_regions >= 1).all()
    assert (out.n_regions <= 5).all()


def test_oracle_revenue_pareto_days(ray_session):
    out = _oracle_check("orders_revenue_pareto_days",
                        tables=("orders",))
    nd = out.sort_values("threshold_pm").n_days.to_numpy()
    assert (np.diff(nd) >= 0).all()
    assert (out.n_days <= out.n_days_total).all()


def test_oracle_transition_asymmetry(ray_session):
    out = _oracle_check("events_transition_asymmetry",
                        tables=("events",))
    assert len(out) == 10
    assert (out.type_a < out.type_b).all()


def test_oracle_segment_value_deciles(ray_session):
    out = _oracle_check("customers_segment_value_deciles",
                        tables=("orders", "customer"))
    assert len(out) == 15
    for _, sub in out.groupby("segment"):
        v = sub.sort_values("decile").cents.to_numpy()
        assert (np.diff(v) >= 0).all()


def test_oracle_span_count_matrix(ray_session):
    out = _oracle_check("customers_span_count_matrix",
                        tables=("orders",))
    assert (out.span_years <= 9).all()
    assert (out.count_band <= 9).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet' WHERE o_custkey IS NOT NULL "
        f"AND o_orderdate IS NOT NULL").fetchone()[0]
    assert int(out.n_customers.sum()) == n


def test_oracle_unit_price_census(ray_session):
    out = _oracle_check("lineitem_unit_price_census",
                        tables=("lineitem",))
    assert (out.band >= 0).all()
    assert out.n_lines.sum() > 0


def test_oracle_final_char_by_lang(ray_session):
    out = _oracle_check("tokens_final_char_by_lang",
                        tables=("documents",))
    assert out.lang.nunique() == 5
    assert (out.ch.str.len() == 1).all()


def test_oracle_dow_revenue_profile(ray_session):
    out = _oracle_check("orders_dow_revenue_profile",
                        tables=("orders",))
    assert len(out) == 7
    s = int(out.revenue_share_pm.sum())
    assert 993 <= s <= 1000  # floored shares


def test_oracle_repeat_distance(ray_session):
    out = _oracle_check("docs_repeat_distance_census",
                        tables=("documents",))
    assert (out.min_gap >= 1).all()
    assert (out.min_gap <= 20).all()


def test_oracle_balance_volume_grid(ray_session):
    out = _oracle_check("supplier_balance_volume_grid",
                        tables=("lineitem", "supplier"))
    assert (out.balance_band <= 2).all()
    assert out.n_suppliers.sum() > 0


def test_oracle_value_gap_interaction(ray_session):
    out = _oracle_check("events_value_gap_interaction",
                        tables=("events",))
    r = out.iloc[0]
    assert (r.n_vh_gh + r.n_vh_gl + r.n_vl_gh + r.n_vl_gl
            == r.n_pairs)


def test_oracle_line_order_bias(ray_session):
    out = _oracle_check("orders_line_order_value_bias",
                        tables=("lineitem",))
    r = out.iloc[0]
    assert (r.n_first_higher + r.n_last_higher + r.n_equal
            == r.n_orders)


def test_oracle_session_value_census(ray_session):
    out = _oracle_check("sessions_value_census",
                        tables=("events",))
    assert (out.band >= 0).all()
    assert out.n_sessions.sum() > 0


def test_oracle_status_value_profile(ray_session):
    out = _oracle_check("orders_status_value_profile",
                        tables=("orders",))
    assert len(out) == 3
    assert 993 <= int(out.revenue_share_pm.sum()) <= 1000


def test_oracle_value_dynamic_range(ray_session):
    out = _oracle_check("users_value_dynamic_range",
                        tables=("events",))
    assert (out.range_bands >= 0).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM "
        f"'{SF}/events.parquet' WHERE user_id IS NOT NULL "
        f"AND value IS NOT NULL").fetchone()[0]
    assert int(out.n_users.sum()) == n


def test_oracle_text_hash_profile(ray_session):
    out = _oracle_check("docs_text_hash_profile",
                        tables=("documents",))
    assert len(out) == 16
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        f"WHERE text IS NOT NULL").fetchone()[0]
    assert int(out.n_docs.sum()) == n


def test_oracle_night_owl(ray_session):
    out = _oracle_check("users_night_owl_census",
                        tables=("events",))
    assert (out.night_share_band <= 10).all()
    assert out.n_users.sum() > 0


def test_oracle_head_tail_overlap(ray_session):
    out = _oracle_check("docs_head_tail_overlap",
                        tables=("documents",))
    assert (out.band >= 0).all() and (out.band <= 10).all()
    assert out.n_docs.sum() > 0


def test_oracle_dow_peak_hour(ray_session):
    out = _oracle_check("events_dow_peak_hour",
                        tables=("events",))
    assert len(out) == 7
    assert (out.peak_hour <= 23).all()


def test_oracle_zero_discount_share(ray_session):
    out = _oracle_check("lineitem_zero_discount_share",
                        tables=("lineitem", "part"))
    assert len(out) == 25
    assert (out.zero_share_pm <= 1000).all()


def test_oracle_spend_momentum(ray_session):
    out = _oracle_check("users_spend_momentum",
                        tables=("events",))
    assert set(out.trend) <= {"accelerating", "decelerating",
                              "flat"}
    assert out.n_users.sum() > 0


def test_oracle_type_size_breadth(ray_session):
    out = _oracle_check("part_type_size_breadth",
                        tables=("part",))
    assert (out.n_sizes >= 1).all()
    assert out.n_types.sum() > 0


def test_oracle_first_order_percentile(ray_session):
    out = _oracle_check("orders_first_order_percentile_census",
                        tables=("orders",))
    assert (out.global_decile <= 9).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet' WHERE o_custkey IS NOT NULL "
        f"AND o_orderdate IS NOT NULL "
        f"AND o_totalprice IS NOT NULL").fetchone()[0]
    assert int(out.n_customers.sum()) == n


def test_oracle_brand_return_rate(ray_session):
    out = _oracle_check("lineitem_brand_return_rate",
                        tables=("lineitem", "part"))
    assert len(out) == 25
    assert (out.return_pm <= 1000).all()


def test_oracle_click_purchase_mwu(ray_session):
    out = _oracle_check("events_click_purchase_mwu",
                        tables=("events",))
    n = int(out.n.sum())
    assert int(out.rank_sum2.sum()) == n * (n + 1)


def test_oracle_lang_vowel_lift(ray_session):
    out = _oracle_check("docs_lang_vowel_lift",
                        tables=("documents",))
    assert len(out) == 5
    assert (out.vowel_pm > 0).all() and (out.vowel_pm < 1000).all()


def test_oracle_peak_revenue_day(ray_session):
    out = _oracle_check("orders_peak_revenue_day",
                        tables=("orders",))
    r = out.iloc[0]
    assert 0 < r.share_pm <= 1000


def test_oracle_ship_month_breadth(ray_session):
    out = _oracle_check("parts_ship_month_breadth",
                        tables=("lineitem",))
    assert (out.n_months >= 1).all()
    assert out.n_parts.sum() > 0


def test_oracle_latency_trend(ray_session):
    out = _oracle_check("orders_latency_trend",
                        tables=("orders", "lineitem"))
    r = out.iloc[0]
    pairs = r.n_months * (r.n_months - 1) // 2
    assert r.n_concordant + r.n_discordant <= pairs


def test_oracle_price_ending_profile(ray_session):
    out = _oracle_check("part_price_ending_profile",
                        tables=("part",))
    assert (out.ending >= 0).all() and (out.ending <= 99).all()
    assert out.n_parts.sum() > 0


def test_oracle_negative_balance_by_nation(ray_session):
    out = _oracle_check("customers_negative_balance_by_nation",
                        tables=("customer", "nation"))
    assert len(out) == 25
    assert (out.negative_pm <= 1000).all()


def test_oracle_hour_breadth(ray_session):
    out = _oracle_check("users_hour_breadth_census",
                        tables=("events",))
    assert (out.n_hours >= 1).all() and (out.n_hours <= 24).all()


def test_oracle_nation_value_lift(ray_session):
    out = _oracle_check("nation_value_lift",
                        tables=("orders", "customer", "nation"))
    assert len(out) == 25
    assert (out.lift_pm > 500).all() and (out.lift_pm < 2000).all()


def test_oracle_source_ttr_profile(ray_session):
    out = _oracle_check("source_ttr_profile",
                        tables=("documents",))
    assert len(out) == 20
    assert (out.n_distinct <= out.n_words).all()


def test_oracle_nation_repeat_rate(ray_session):
    out = _oracle_check("nation_repeat_rate",
                        tables=("orders", "customer", "nation"))
    assert len(out) == 25
    assert (out.repeat_pm <= 1000).all()


def test_oracle_peak_day_alignment(ray_session):
    out = _oracle_check("users_peak_day_alignment",
                        tables=("events",))
    r = out.iloc[0]
    assert 0 <= r.n_aligned <= r.n_users


def test_oracle_top1_value_share(ray_session):
    out = _oracle_check("events_top1_value_share_by_type",
                        tables=("events",))
    assert len(out) == 5
    assert (out.top1_share_ppm <= 1_000_000).all()
