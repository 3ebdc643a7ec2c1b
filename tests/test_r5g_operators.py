"""Round-5 batch G: grouped exact mode (deterministic tie), per-group
daily max drawdown, weighted (multiset) source Jaccard — oracle parity
at sf0.001 plus hand-built semantic checks."""

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


def test_oracle_quantity_mode(ray_session):
    out = _oracle_check("lineitem_quantity_mode", tables=("lineitem",))
    # every (rf, ls) cell present; mode count never exceeds the total
    assert (out.mode_count <= out.n_rows).all()
    assert (out.mode_qty >= 1).all() and (out.mode_qty <= 50).all()


def test_grouped_mode_tie_smallest_value(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import grouped_mode_multi

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 3 + [None]),
        "v": pa.array([7, 3, 7, 3, 5, None, 5, 1],
                      type=pa.int64())})).materialize()
    out = grouped_mode_multi(ds, ["g"], "v")
    # group a: 3 and 7 both count 2 -> tie resolves to 3
    a = out[out.g == "a"].iloc[0]
    assert a.mode_v == 3 and a.mode_count == 2 and a.n_rows == 4
    # group b: null value dropped; 5 wins with count 2 of 2 rows
    b = out[out.g == "b"].iloc[0]
    assert b.mode_v == 5 and b.mode_count == 2 and b.n_rows == 2
    # null group dropped entirely
    assert set(out.g) == {"a", "b"}


def test_oracle_priority_drawdown(ray_session):
    out = _oracle_check("orders_priority_drawdown", tables=("orders",))
    assert (out.max_dd_cents >= 0).all()
    assert (out.peak_cents >= 0).all()
    assert len(out) == 5  # five priorities


def test_grouped_drawdown_hand_series(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import grouped_drawdown

    # series 10, 4, 12, 5, 5: peak 10 dip to 4 (dd 6), then peak 12
    # dip to 5 (dd 7, twice) -> max_dd 7 at the EARLIEST day (3)
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["x"] * 5),
        "day": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "v": pa.array([10, 4, 12, 5, 5], type=pa.int64()),
    })).materialize()
    out = grouped_drawdown(ds, "g", "day", "v")
    r = out.iloc[0]
    assert (r.n_days, r.max_dd, r.dd_day, r.peak_at_dd) == (5, 7, 3, 12)


def test_oracle_weighted_jaccard(ray_session):
    out = _oracle_check("source_weighted_jaccard",
                        tables=("documents",))
    # all canonical pairs of the observed sources, Σmin <= Σmax
    assert (out.sum_min <= out.sum_max).all()
    assert (out.source_a < out.source_b).all()
    n_src = len(set(out.source_a) | set(out.source_b))
    assert len(out) == n_src * (n_src - 1) // 2
    # weighted Jaccard is bounded by 1000 permille
    assert (out.wjac_pm <= 1000).all() and (out.wjac_pm >= 0).all()


def test_weighted_jaccard_hand_counts(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.contamination import \
        source_weighted_jaccard

    # src a tokens {1:2, 2:1}; src b {1:1, 3:2}; src c shares nothing
    ds = rd.from_arrow(pa.table({
        "source": pa.array(["a", "a", "b", "c"]),
        "tokens": pa.array([[1, 1, 2], [], [1, 3, 3], [9]],
                           type=pa.list_(pa.int64())),
    })).materialize()
    out = source_weighted_jaccard(ds).set_index(
        ["source_a", "source_b"])
    ab = out.loc[("a", "b")]
    # Σmin = min(2,1) = 1; Σmax = 3 + 3 - 1 = 5
    assert (ab.sum_min, ab.sum_max, ab.wjac_pm) == (1, 5, 200)
    ac = out.loc[("a", "c")]
    assert (ac.sum_min, ac.sum_max, ac.wjac_pm) == (0, 4, 0)
    bc = out.loc[("b", "c")]
    assert (bc.sum_min, bc.sum_max) == (0, 4)


def test_oracle_bounce_by_entry(ray_session):
    out = _oracle_check("events_bounce_by_entry", tables=("events",))
    assert (out.n_bounce <= out.n_sessions).all()
    assert (out.bounce_pm <= 1000).all()


def test_bounce_hand_sessions(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.sessions import session_bounce_by_entry

    us = 1_000_000
    # user 1: [a at 0, b at 60s] one session (entry a, size 2);
    #         [c at 2h] bounce (entry c)
    # user 2: [b at 0] bounce (entry b)
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array([0, 60 * us, 7200 * us, 0],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "c", "b"]),
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
    })).materialize()
    out = session_bounce_by_entry(ds).set_index("event_type")
    assert out.loc["a"].n_sessions == 1 and out.loc["a"].n_bounce == 0
    assert out.loc["b"].n_sessions == 1 and out.loc["b"].n_bounce == 1
    assert out.loc["c"].n_sessions == 1 and out.loc["c"].n_bounce == 1


def test_oracle_mean_shift(ray_session):
    out = _oracle_check("orders_daily_mean_shift", tables=("orders",))
    r = out.iloc[0]
    assert r.n_left + r.n_right > 0 and r.score >= 0


def test_mean_shift_hand_series(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import mean_shift_split

    # days 0-3 value 10, days 4-7 value 20 -> split after day 3
    ds = rd.from_arrow(pa.table({
        "day": pa.array(list(range(8)), type=pa.int64()),
        "v": pa.array([10] * 4 + [20] * 4, type=pa.int64()),
    })).materialize()
    r = mean_shift_split(ds, "day", "v").iloc[0]
    assert (r.split_day, r.n_left, r.sum_left, r.n_right,
            r.sum_right) == (3, 4, 40, 4, 80)
    # score = |40*8 - 4*120| = 160; means 10.0 / 20.0 in permille
    assert r.score == 160
    assert r.mean_left_pm == 10000 and r.mean_right_pm == 20000


def test_oracle_margin_stats(ray_session):
    out = _oracle_check("embeddings_margin_stats",
                        tables=("embeddings",))
    assert (out.n_nonpos <= out.n).all()
    assert (out.min_margin <= out.sum_margin // out.n.clip(1)).all()


def test_margin_consistent_with_confusion(ray_session):
    # n_nonpos counts vectors NOT strictly closest to their own
    # centroid; confusion's off-diagonal counts vectors ASSIGNED
    # elsewhere (ties -> smallest label may still be the own label),
    # so off_diag <= n_nonpos per label
    import ray

    import __ray_entry__ as e

    margins = e.queries()["embeddings_margin_stats"](SF)
    conf = e.queries()["embeddings_centroid_confusion"](SF)
    off = (conf[conf.label != conf.assigned]
           .groupby("label").n.sum())
    for _, r in margins.iterrows():
        assert off.get(r.label, 0) <= r.n_nonpos


def test_oracle_quality_decile_dup_rate(ray_session):
    out = _oracle_check("docs_quality_decile_dup_rate",
                        tables=("documents",))
    assert (out.n_dup <= out.n_docs).all()
    assert len(out) <= 10
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        "WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL "
        "AND text IS NOT NULL").fetchone()[0]
    assert out.n_docs.sum() == n


def test_oracle_nation_ltv(ray_session):
    out = _oracle_check("nation_ltv_quantiles",
                        tables=("customer", "orders"))
    assert (out.q50_cents <= out.q90_cents).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/customer.parquet' "
        "WHERE c_custkey IS NOT NULL "
        "AND c_nationkey IS NOT NULL").fetchone()[0]
    assert out.n.sum() == n  # every customer lands in one nation


def test_oracle_nation_top3(ray_session):
    out = _oracle_check("nation_top3_months",
                        tables=("customer", "orders"))
    assert (out.n_top3 <= out.n_months).all()
    # each month awards at most 3 top-3 slots
    con = duckdb.connect()
    months = con.execute(
        f"SELECT COUNT(DISTINCT (EXTRACT(year FROM o_orderdate) "
        f"- 1970) * 12 + EXTRACT(month FROM o_orderdate) - 1) "
        f"FROM '{SF}/orders.parquet' "
        "WHERE o_orderdate IS NOT NULL").fetchone()[0]
    assert out.n_top3.sum() <= 3 * months


def test_oracle_burstiness(ray_session):
    out = _oracle_check("part_ship_burstiness_hist",
                        tables=("lineitem",))
    assert (out.bin >= 0).all() and (out.n_keys > 0).all()


def test_burstiness_hand_series(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import burstiness_log_hist

    # key 1: days 0,1,2,3 (even: gaps 1,1,1 -> band=1000, k=1, bin 0)
    # key 2: days 0,1,10  (bursty: gaps 1,9 -> band=2*82*1000//100
    #        = 1640, k=1, bin 0)
    # key 3: days 0,1,100 (gaps 1,99: band=2*9802*1000//10000=1960,
    #        k=1, bin 0) -> need a burstier one for bin>0:
    # key 4: days 0,1,2,1000 (gaps 1,1,998: band=3*996006*1000
    #        //1000000 = 2988, k=2, bin 1)
    # key 5: single day -> excluded; key 6: dup day only -> excluded
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1]*4 + [2]*3 + [4]*4 + [5] + [6, 6],
                      type=pa.int64()),
        "d": pa.array([0, 1, 2, 3, 0, 1, 10, 0, 1, 2, 1000, 7, 3, 3],
                      type=pa.int64())})).materialize()
    out = burstiness_log_hist(ds, "k", "d").set_index("bin")
    assert out.loc[0].n_keys == 2  # keys 1 and 2
    assert out.loc[1].n_keys == 1  # key 4
    assert out.n_keys.sum() == 3   # keys 5, 6 excluded


def test_oracle_token_simpson(ray_session):
    out = _oracle_check("source_token_simpson",
                        tables=("documents",))
    assert (out.n_distinct <= out.n_tokens).all()
    assert (out.rep_pm <= 1000).all() and (out.rep_pm >= 0).all()


def test_token_simpson_hand_counts(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.text import source_token_simpson

    # src a: counts {1:3, 2:1} -> n=4, distinct=2, simpson=3*2=6,
    #        rep_pm = 6000 // 12 = 500
    ds = rd.from_arrow(pa.table({
        "source": pa.array(["a", "a"]),
        "tokens": pa.array([[1, 1, 2], [1]],
                           type=pa.list_(pa.int64()))})).materialize()
    r = source_token_simpson(ds).iloc[0]
    assert (r.n_tokens, r.n_distinct, r.simpson_num, r.rep_pm) == \
        (4, 2, 6, 500)


def test_oracle_acctbal_health(ray_session):
    out = _oracle_check("customer_acctbal_health",
                        tables=("customer",))
    assert (out.n_neg <= out.n).all()
    assert (out.min_cents <= out.max_cents).all()


def test_oracle_norm_hist(ray_session):
    out = _oracle_check("embeddings_norm_hist",
                        tables=("embeddings",))
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL").fetchone()[0]
    assert out.n_vecs.sum() == n


def test_norm_hist_hand_vectors(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.similarity import norm_log_hist

    # unit-ish vec [1.0, 0.0]: q=(1000,0), s2=1e6 -> k=2, bin 1
    # zero vec: s2=0 -> k=1, bin 0
    # big vec [3.0, 0.0]: s2=9e6 -> k=10, bin 3
    ds = rd.from_arrow(pa.table({
        "embedding": pa.array([[1.0, 0.0], [0.0, 0.0], [3.0, 0.0]],
                              type=pa.list_(pa.float32())),
    })).materialize()
    out = norm_log_hist(ds).set_index("bin")
    assert out.loc[0].n_vecs == 1
    assert out.loc[1].n_vecs == 1
    assert out.loc[3].n_vecs == 1


def test_oracle_dow_chi2(ray_session):
    out = _oracle_check("events_dow_chi2", tables=("events",))
    # chi2_num is 0 iff counts are perfectly uniform (n % 7 == 0)
    assert (out.chi2_num >= 0).all()
    assert (out.n > 0).all()


def test_dow_chi2_zero_cells_counted(ray_session):
    # a type concentrated on ONE weekday must score the maximal
    # chi2_num 6*n^2 + (7n-n)^2 = 42n^2... verify the exact formula:
    # cells: one day has c=n -> (7n-n)^2 = 36n^2; six days c=0 ->
    # 6*n^2; total 42n^2
    import __ray_entry__ as e
    import duckdb as dk
    import ray.data as rd

    con = dk.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, "
                "ts TIMESTAMP, event_id BIGINT, user_id BIGINT, "
                "value DOUBLE, props VARCHAR)")
    # 3 events, all on day 19723 ((19723+4)%7 = same dow)
    con.execute("INSERT INTO events VALUES "
                "('x', epoch_ms(CAST(19723 AS BIGINT)*86400000), 1, 1, 0.0, ''),"
                "('x', epoch_ms(CAST(19723 AS BIGINT)*86400000), 2, 1, 0.0, ''),"
                "('x', epoch_ms(CAST(19723 AS BIGINT)*86400000), 3, 1, 0.0, '')")
    orc = con.execute(e.oracle_sql()["events_dow_chi2"]).df()
    assert orc.iloc[0].chi2_num == 42 * 9


def test_oracle_part_tokens(ray_session):
    out = _oracle_check("part_name_top_tokens", tables=("part",))
    assert len(out) <= 10
    # ranks are contiguous from 1 and counts non-increasing
    assert list(out.rn) == list(range(1, len(out) + 1))
    assert (np.diff(out.n.to_numpy()) <= 0).all()


def test_oracle_domain_holes(ray_session):
    out = _oracle_check("events_value_domain_holes",
                        tables=("events",))
    assert (out.max_gap >= 0).all()
    assert (out.lo <= out.gap_left).all()
    assert (out.gap_left <= out.hi).all()


def test_domain_hole_hand_values(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import domain_hole_audit

    # group x: distinct {1, 2, 10, 11} -> max gap 8 at left=2
    # group y: single value -> max_gap 0
    # two equal max gaps: z {0, 5, 10} -> gap 5 twice, left=0 wins
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["x"] * 5 + ["y"] + ["z"] * 3),
        "v": pa.array([1, 2, 10, 11, 2, 7, 0, 5, 10],
                      type=pa.int64())})).materialize()
    out = domain_hole_audit(ds, "g", "v").set_index("g")
    x = out.loc["x"]
    assert (x.n_distinct, x.max_gap, x.gap_left) == (4, 8, 2)
    y = out.loc["y"]
    assert (y.n_distinct, y.max_gap, y.gap_left) == (1, 0, 7)
    z = out.loc["z"]
    assert (z.max_gap, z.gap_left) == (5, 0)


def test_oracle_saturation(ray_session):
    out = _oracle_check("lineitem_saturation_audit",
                        tables=("lineitem",))
    assert set(out.col) == {"cents", "disc_pct", "qty", "tax_pct"}
    assert (out.n_at_min >= 1).all() and (out.n_at_max >= 1).all()


def test_saturation_split_batches(ray_session):
    # global min lives in one batch, max in another; counts must
    # come only from the batches holding the global bound
    import ray.data as rd

    from verify_ray.pipelines.profile import saturation_audit

    t1 = pa.table({"a": pa.array([5, 5, 9], type=pa.int64())})
    t2 = pa.table({"a": pa.array([7, 9, 9, None], type=pa.int64())})
    ds = rd.from_arrow([t1, t2]).materialize()
    r = saturation_audit(ds, ["a"]).iloc[0]
    assert (r.n, r.min_v, r.max_v, r.n_at_min, r.n_at_max) == \
        (6, 5, 9, 2, 3)


def test_oracle_ks_census(ray_session):
    out = _oracle_check("source_length_ks_census",
                        tables=("documents",))
    assert (out.ks_pm <= 1000).all() and (out.ks_num >= 0).all()


def test_ks_census_agrees_with_pair_surface(ray_session):
    # one-group-vs-global with TWO groups relates to the pair KS:
    # |N*Ca - na*C| = |(na+nb)*Ca - na*(Ca+Cb)| = |nb*Ca - na*Cb|
    # so ks_num (vs global) == d_x (pair) for both groups
    import ray.data as rd

    from verify_ray.pipelines.analytics import (ks_census_vs_global,
                                                ks_surface)

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 7),
        "v": pa.array([1, 2, 2, 3, 9, 1, 1, 4, 5, 5, 6, 9],
                      type=pa.int64())})).materialize()
    census = ks_census_vs_global(ds, "g", "v")
    pair = ks_surface(ds, "g", "v", "a", "b").iloc[0]
    assert set(census.ks_num) == {int(pair.d_x)}


def test_oracle_qq_deciles(ray_session):
    out = _oracle_check("source_qq_deciles", tables=("documents",))
    # deciles are monotone within each source and diff is exact
    for _, g in out.groupby("source"):
        assert (np.diff(g.q_src.to_numpy()) >= 0).all()
        assert (g["diff"] == g.q_src - g.q_all).all()


def test_oracle_day_fill(ray_session):
    out = _oracle_check("users_day_fill_hist", tables=("events",))
    assert (out.band >= 0).all() and (out.band <= 10).all()


def test_day_fill_hand_users(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import day_fill_hist

    # user 1: days 0..4 of span 5 -> fill 1000, band 10
    # user 2: days 0 and 9 -> 2/10 -> 200, band 2
    # user 3: single day -> 1000, band 10
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1]*5 + [2, 2, 3], type=pa.int64()),
        "d": pa.array([0, 1, 2, 3, 4, 0, 9, 7], type=pa.int64()),
    })).materialize()
    out = day_fill_hist(ds, "k", "d").set_index("band")
    assert out.loc[10].n_keys == 2
    assert out.loc[2].n_keys == 1


def test_oracle_rank_shift(ray_session):
    out = _oracle_check("source_epoch_rank_shift",
                        tables=("documents",))
    n = len(out)
    # each rank column is a permutation of 1..n
    assert sorted(out.rank_even) == list(range(1, n + 1))
    assert sorted(out.rank_odd) == list(range(1, n + 1))
    assert out["shift"].sum() == 0  # displacements sum to zero


def test_oracle_rank_footrule(ray_session):
    out = _oracle_check("events_daily_rank_footrule",
                        tables=("events",))
    # footrule is even (sum of rank displacements of a permutation)
    assert (out.footrule % 2 == 0).all()
    assert (out.footrule >= 0).all()


def test_oracle_octant(ray_session):
    out = _oracle_check("embeddings_octant_occupancy",
                        tables=("embeddings",))
    assert (out.cell >= 0).all() and (out.cell <= 255).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL").fetchone()[0]
    assert out.n_vecs.sum() == n


def test_oracle_cents_residue(ray_session):
    out = _oracle_check("orders_cents_residue_profile",
                        tables=("orders",))
    assert (out.residue >= 0).all() and (out.residue <= 99).all()


def test_oracle_survivor_bias(ray_session):
    out = _oracle_check("dedup_survivor_length_bias",
                        tables=("documents",))
    assert set(out.status) <= {"kept", "dropped"}
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        "WHERE doc_id IS NOT NULL AND text IS NOT NULL "
        "AND n_chars IS NOT NULL").fetchone()[0]
    assert out.n.sum() == n
    # kept >= number of distinct fingerprints implies dropped exists
    # iff there are dup groups (just shape-check both rows coherent)
    k = out[out.status == "kept"].iloc[0]
    assert k.min_len <= k.max_len


def test_oracle_brand_dispersion(ray_session):
    out = _oracle_check("brand_price_dispersion", tables=("part",))
    n = len(out)
    assert sorted(out["rank"]) == list(range(1, n + 1))
    assert (out.m2_x >= 0).all()  # n*sum(c^2) >= sum(c)^2


def test_oracle_benford_monthly(ray_session):
    out = _oracle_check("orders_benford_monthly_l1",
                        tables=("orders",))
    assert (out.l1_x >= 0).all() and (out.n > 0).all()


def test_benford_monthly_uniform_is_zero(ray_session):
    # a month whose digit profile equals the global profile exactly
    # must score l1_x = 0: single month -> global == month
    import __ray_entry__ as e
    import duckdb as dk

    con = dk.connect()
    con.execute("CREATE TABLE orders (o_orderkey BIGINT, o_custkey "
                "BIGINT, o_orderstatus VARCHAR, o_totalprice DOUBLE,"
                " o_orderdate TIMESTAMP, o_orderpriority VARCHAR)")
    con.execute("INSERT INTO orders VALUES "
                "(1, 1, 'O', 1.00, TIMESTAMP '1995-01-01', 'X'),"
                "(2, 1, 'O', 2.00, TIMESTAMP '1995-01-02', 'X'),"
                "(3, 1, 'O', 9.00, TIMESTAMP '1995-01-03', 'X')")
    orc = con.execute(e.oracle_sql()["orders_benford_monthly_l1"]).df()
    assert len(orc) == 1 and orc.iloc[0].l1_x == 0


def test_oracle_dominant_dow(ray_session):
    out = _oracle_check("customers_dominant_dow_hist",
                        tables=("orders",))
    assert (out.dow >= 0).all() and (out.dow <= 6).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet' WHERE o_custkey IS NOT NULL "
        "AND o_orderdate IS NOT NULL").fetchone()[0]
    assert out.n_keys.sum() == n  # every customer gets one persona


def test_dominant_value_hist_tie_rule(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import dominant_value_hist

    # key 1: {3: 2, 7: 2} tie -> 3; key 2: {7: 1} -> 7
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "v": pa.array([3, 7, 3, 7, 7], type=pa.int64()),
    })).materialize()
    out = dominant_value_hist(ds, "k", "v").set_index("v")
    assert out.loc[3].n_keys == 1 and out.loc[7].n_keys == 1


def test_oracle_session_position(ray_session):
    out = _oracle_check("events_value_by_session_position",
                        tables=("events",))
    p = out.set_index("position")
    # every session has exactly one first and one last (size >= 2)
    if "first" in p.index and "last" in p.index:
        assert p.loc["first"].n_events == p.loc["last"].n_events


def test_oracle_frontload(ray_session):
    out = _oracle_check("users_frontload_hist", tables=("events",))
    assert (out.band >= 0).all() and (out.band <= 10).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet' "
        "WHERE user_id IS NOT NULL AND ts IS NOT NULL "
        "AND value IS NOT NULL").fetchone()[0]
    assert out.n_users.sum() == n


def test_oracle_new_value_share(ray_session):
    out = _oracle_check("events_new_value_share_daily",
                        tables=("events",))
    assert set(out.is_new) <= {0, 1}
    # the first observed day has only new users
    d0 = out.day.min()
    assert (out[out.day == d0].is_new == 1).all()


def test_oracle_ship_span(ray_session):
    out = _oracle_check("orders_ship_span_hist",
                        tables=("lineitem",))
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM "
        f"'{SF}/lineitem.parquet' WHERE l_orderkey IS NOT NULL "
        "AND l_shipdate IS NOT NULL").fetchone()[0]
    assert out.n_orders.sum() == n


def test_oracle_props_moments(ray_session):
    out = _oracle_check("events_props_value_moments",
                        tables=("events",))
    # Cauchy-Schwarz on the integer moment surface
    for _, r in out.iterrows():
        assert r.n * r.sum_k2 >= r.sum_k ** 2
        assert r.n * r.sum_v2 >= r.sum_v ** 2
