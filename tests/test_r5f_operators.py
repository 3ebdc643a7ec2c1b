"""Round-5 batch F: order fill-rate histogram (tagged-union
join-aggregate), supplier lead-time quantiles (composed hash_join +
grouped quantiles), daily type co-occurrence — oracle parity at
sf0.001 plus hand-built semantic checks."""

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


def test_oracle_fill_rate(ray_session):
    out = _oracle_check("orders_fill_rate",
                        tables=("orders", "lineitem"))
    con = duckdb.connect()
    n_orders = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/orders.parquet' "
        "WHERE o_orderkey IS NOT NULL "
        "AND o_orderstatus IS NOT NULL").fetchone()[0]
    # every qualifying order lands in exactly one histogram cell
    assert out.n_orders.sum() == n_orders
    assert (out.n_lines >= 0).all()


def test_fact_count_histogram_zero_count_dim(ray_session):
    # a dim key with no fact rows must appear in the cnt=0 cell;
    # fact keys missing from the dim must drop
    import ray.data as rd

    from verify_ray.pipelines.analytics import \
        fact_count_histogram_by_dim

    fact = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 99], type=pa.int64())})).materialize()
    dim = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "s": pa.array(["a", "b", "a"])})).materialize()
    out = fact_count_histogram_by_dim(fact, "k", dim, "k", "s",
                                      num_buckets=4)
    got = {(r.s, r.cnt): r.n_keys for r in out.itertuples()}
    assert got == {("a", 0): 1, ("a", 2): 1, ("b", 1): 1}


def test_oracle_lead_time_quantiles(ray_session):
    out = _oracle_check(
        "supplier_lead_time_quantiles",
        tables=("lineitem", "orders", "supplier", "nation"))
    assert len(out) > 0
    assert (out.q50 <= out.q90).all()
    assert (out.n > 0).all()


def test_oracle_type_affinity(ray_session):
    out = _oracle_check("events_type_affinity_daily",
                        tables=("events",))
    assert len(out) > 0
    # unordered pairs: strictly increasing lexicographic order
    assert (out.type_a < out.type_b).all()


def test_type_cooccurrence_hand_built(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.sessions import type_cooccurrence_daily

    day = 86_400_000_000
    ts = pa.array(
        np.array([0, 1, 2, day, day + 1, 2 * day], dtype=np.int64),
        type=pa.int64()).cast(pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([7, 7, 7, 7, 7, 8], type=pa.int64()),
        "ts": ts,
        # basket (7, d0) = {x, y}; (7, d1) = {x, z}; (8, d2) = {y}
        "event_type": pa.array(["x", "y", "x", "x", "z", "y"]),
    })).materialize()
    out = type_cooccurrence_daily(ev, num_buckets=4)
    got = {(r.type_a, r.type_b): r.n_user_days
           for r in out.itertuples()}
    assert got == {("x", "y"): 1, ("x", "z"): 1}


def test_oracle_open_aging(ray_session):
    out = _oracle_check("orders_open_aging", tables=("orders",))
    con = duckdb.connect()
    n_open = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/orders.parquet' "
        "WHERE o_orderstatus = 'O' AND o_orderdate IS NOT NULL "
        "AND o_orderpriority IS NOT NULL").fetchone()[0]
    assert out.n_orders.sum() == n_open
    assert (out.age_weeks >= 0).all()


def test_oracle_segment_priority_lift(ray_session):
    out = _oracle_check("customer_segment_priority_lift",
                        tables=("orders", "customer"))
    assert len(out) == 25  # 5 segments x 5 priorities
    # floors make observed >= expected iff lift_pm >= 1000 is not
    # guaranteed cellwise, but totals must reconcile
    assert out.n.sum() == out.groupby("seg").n.sum().sum()
    assert (out.lift_pm > 0).all()


def test_oracle_first_ship_latency(ray_session):
    out = _oracle_check("orders_first_ship_latency",
                        tables=("orders", "lineitem"))
    assert len(out) == 5
    assert (out.q50 <= out.q90).all()


def test_oracle_gram_matrix(ray_session):
    out = _oracle_check("embeddings_gram_matrix",
                        tables=("embeddings",))
    assert len(out) == 64 * 65 // 2
    # diagonal cells are sums of squares: non-negative
    diag = out[out.i == out.j]
    assert (diag.s >= 0).all()


def test_gram_matrix_hand_built(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.similarity import gram_matrix_quantized

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], type=pa.int64()),
        "embedding": pa.array([[0.001, 0.002], [0.003, -0.001]],
                              type=pa.list_(pa.float32())),
    })).materialize()
    out = gram_matrix_quantized(ds)
    # float32 -0.001 is -0.00100000005, so floor(1000*x) = -2 (the
    # oracle's list_transform floors the same widened float32);
    # q rows: (1, 2) and (3, -2); cells are per-DIM-pair sums
    got = {(r.i, r.j): r.s for r in out.itertuples()}
    assert got == {(1, 1): 1 + 9, (1, 2): 2 - 6, (2, 2): 4 + 4}


def test_oracle_knn_label_agreement(ray_session):
    out = _oracle_check("embeddings_knn_label_agreement",
                        tables=("embeddings",))
    assert (out.n_agree <= out.n).all()
    assert (out.agree_pm <= 1000).all()


def test_knn_agreement_two_blobs(ray_session):
    # two tight blobs with one planted cross-label point: its NN is
    # in the other blob, every other point agrees
    import ray.data as rd

    from verify_ray.pipelines.similarity import knn_label_agreement

    vecs = [[1.0, 0.0], [0.99, 0.01], [0.98, 0.02],
            [0.0, 1.0], [0.01, 0.99],
            [0.97, 0.03]]  # label-1 point inside blob 0
    labels = [0, 0, 0, 1, 1, 1]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(1, 7), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })).materialize()
    out = knn_label_agreement(ds)
    got = {r.label: (r.n, r.n_agree) for r in out.itertuples()}
    # blob-0 points all agree; the two axis label-1 points agree with
    # each other; the planted point's NN is a label-0 neighbor
    assert got[0] == (3, 3)
    assert got[1] == (3, 2)


def test_oracle_users_lifetime_hist(ray_session):
    out = _oracle_check("users_lifetime_hist", tables=("events",))
    # active days never exceed span + 1
    assert (out.active_days <= out.span_d + 1).all()
    assert (out.n_users > 0).all()


def test_oracle_value_quantiles_exact(ray_session):
    out = _oracle_check("events_value_quantiles_exact",
                        tables=("events",))
    assert list(out.q) == [250, 500, 900, 990]
    assert out.value.is_monotonic_increasing


def test_continuous_quantiles_mass_point(ray_session):
    # a single repeated double: every quantile is that value, and the
    # nextafter mass-point guard must terminate the bisection
    import ray.data as rd

    from verify_ray.pipelines.select import exact_quantiles_continuous

    ds = rd.from_arrow(pa.table({
        "x": pa.array([3.25] * 1000 + [99.5],
                      type=pa.float64())})).materialize()
    t = exact_quantiles_continuous(ds, "x", [100, 500, 999, 1000],
                                   n_pivots=8, final_budget=4)
    vals = dict(zip(t.column("q").to_pylist(),
                    t.column("value").to_pylist()))
    assert vals[100] == 3.25 and vals[500] == 3.25
    assert vals[999] == 3.25  # rank ceil(.999*1001)=1000 <= 1000
    assert vals[1000] == 99.5


def test_continuous_quantiles_vs_numpy(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.select import exact_quantiles_continuous

    rng = np.random.default_rng(7)
    x = rng.normal(size=5000)
    ds = rd.from_arrow(pa.table({"x": pa.array(x)})).materialize()
    t = exact_quantiles_continuous(ds, "x", [10, 500, 975],
                                   n_pivots=16, final_budget=64)
    xs = np.sort(x)
    for q, v in zip(t.column("q").to_pylist(),
                    t.column("value").to_pylist()):
        r = max(1, -(-q * len(x) // 1000))
        assert v == xs[r - 1], q


def test_oracle_milestone_day(ray_session):
    out = _oracle_check("users_milestone_day", tables=("events",))
    con = duckdb.connect()
    n_cross = con.execute(f"""
        WITH e AS (SELECT user_id,
                          SUM(CAST(round(100*value) AS BIGINT)) AS s
                   FROM '{SF}/events.parquet'
                   WHERE user_id IS NOT NULL AND ts IS NOT NULL
                     AND value IS NOT NULL AND event_id IS NOT NULL
                   GROUP BY 1)
        SELECT COUNT(*) FROM e WHERE s >= 100000""").fetchone()[0]
    # every user whose total crosses has exactly one first-cross day
    assert out.n_users.sum() == n_cross


def test_oracle_max_burst(ray_session):
    out = _oracle_check("users_max_burst_hist", tables=("events",))
    assert (out.max_burst >= 1).all()


def test_max_burst_hand_built(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.sessions import max_burst_histogram

    s = 1_000_000  # 1 second in us
    ts = pa.array(np.array(
        [0, 5 * s, 9 * s, 100 * s,        # user 1: burst of 3 in 10s
         0, 60 * s],                      # user 2: never 2 in 10s
        dtype=np.int64), type=pa.int64()).cast(pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "ts": ts})).materialize()
    out = max_burst_histogram(ev, window_us=10 * s, num_buckets=4)
    got = dict(zip(out.max_burst, out.n_users))
    assert got == {1: 1, 3: 1}


def test_oracle_cross_correlation(ray_session):
    out = _oracle_check("orders_ship_cross_correlation",
                        tables=("orders", "lineitem"))
    assert list(out.lag) == list(range(15))
    # shipments follow orders: positive lags must correlate at least
    # as strongly as lag 0 somewhere (lead times are 1..120 days)
    assert out.sum_ab.max() >= out.sum_ab.iloc[0]


def test_oracle_value_quantiles_by_type(ray_session):
    out = _oracle_check("events_value_quantiles_by_type",
                        tables=("events",))
    assert len(out) == 5
    assert (out.q50 <= out.q90).all()


def test_grouped_continuous_vs_numpy(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.select import grouped_quantiles_continuous

    rng = np.random.default_rng(11)
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, 4000)]
    x = rng.normal(size=4000) * (1 + (g == "b"))
    ds = rd.from_arrow(pa.table({"g": pa.array(g),
                                 "x": pa.array(x)})).materialize()
    out = grouped_quantiles_continuous(ds, "g", "x", [500, 900],
                                       n_pivots=8, final_budget=32)
    for r in out.itertuples():
        xs = np.sort(x[g == r.g])
        assert r.n == len(xs)
        for q, v in ((500, r.q50), (900, r.q90)):
            rank = max(1, -(-q * len(xs) // 1000))
            assert v == xs[rank - 1], (r.g, q)


def test_oracle_event_type_scc(ray_session):
    out = _oracle_check("event_type_scc", tables=("events",))
    # scc_id is always a member <= the type itself lexicographically
    assert (out.scc_id <= out.event_type).all()
    # sizes are consistent: each scc_id's size equals its member count
    sizes = out.groupby("scc_id").size()
    for r in out.itertuples():
        assert r.scc_size == sizes[r.scc_id]


def test_type_scc_hand_built(ray_session):
    # a -> b -> a heavy cycle; c only receives a weak edge (below
    # 80% of max) so c is a singleton; edge counts are forced by
    # repeating transitions across users
    import ray.data as rd

    from verify_ray.pipelines.graph import type_transition_scc

    seq = (["a", "b"] * 10 + ["c"])  # per user: a->b x10 ... b->c x1
    users, types, ts, eid = [], [], [], []
    k = 0
    for u in range(3):
        for t in seq:
            users.append(u)
            types.append(t)
            ts.append(k * 1_000_000)
            eid.append(k)
            k += 1
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array(np.array(ts, dtype=np.int64),
                       type=pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(types),
        "event_id": pa.array(eid, type=pa.int64()),
    })).materialize()
    out = type_transition_scc(ev, num_buckets=4)
    got = {r.event_type: (r.scc_id, r.scc_size)
           for r in out.itertuples()}
    assert got["a"] == ("a", 2) and got["b"] == ("a", 2)
    assert got["c"] == ("c", 1)


def test_oracle_source_token_l1(ray_session):
    out = _oracle_check("source_token_l1_matrix",
                        tables=("documents",))
    assert (out.s1 < out.s2).all()
    assert (out.l1 >= 0).all()


def test_source_token_l1_hand_built(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.text import source_token_l1

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["a a b", "a c", "b b"]),
        "source": pa.array(["s1", "s1", "s2"]),
    })).materialize()
    out = source_token_l1(ds, num_buckets=4)
    # s1: a=3, b=1, c=1; s2: b=2 -> |3-0|+|1-2|+|1-0| = 5
    assert list(out.s1) == ["s1"] and list(out.s2) == ["s2"]
    assert list(out.l1) == [5]


def test_oracle_value_concentration(ray_session):
    out = _oracle_check("events_value_concentration",
                        tables=("events",))
    assert (out.k_star <= out.n).all()
    assert (out.k_star >= 1).all()
    # 80% of value from fewer than 80% of events (skewed values)
    assert (out.k_share_pm <= 800).all()


def test_oracle_fold_balance(ray_session):
    out = _oracle_check("docs_fold_balance", tables=("documents",))
    assert set(out.fold) <= set(range(5))
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        "WHERE doc_id IS NOT NULL AND lang IS NOT NULL"
    ).fetchone()[0]
    assert out.n_docs.sum() == n


def test_oracle_cluster_source_purity(ray_session):
    out = _oracle_check("dedup_cluster_source_purity",
                        tables=("documents",))
    assert (out.n_docs >= out.n_groups).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        "WHERE text IS NOT NULL AND source IS NOT NULL"
    ).fetchone()[0]
    assert out.n_docs.sum() == n


def test_oracle_mixed_returns(ray_session):
    out = _oracle_check("orders_mixed_returns_monthly",
                        tables=("orders", "lineitem"))
    assert (out.n_mixed <= out.n_orders).all()
    assert len(out) > 0


def test_oracle_loyalty_hist(ray_session):
    out = _oracle_check("users_loyalty_hist", tables=("events",))
    # a user's dominant share is at least 1/#types (5 types -> >=200)
    assert (out.loyalty_band >= 2).all()
    assert (out.loyalty_band <= 10).all()


def test_oracle_handoff_matrix(ray_session):
    out = _oracle_check("sessions_handoff_matrix",
                        tables=("events",))
    assert len(out) > 0
    assert (out.n > 0).all()


def test_handoff_hand_built(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.sessions import session_handoff_matrix

    mn = 60_000_000  # one minute in us
    # user 1: session [a, b] then (40 min later) session [c];
    # user 2: single session [a] only -> no handoff
    ts = [0, 5 * mn, 45 * mn, 0]
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array(np.array(ts, dtype=np.int64),
                       type=pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "c", "a"]),
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
    })).materialize()
    out = session_handoff_matrix(ev, num_buckets=4)
    assert list(out.itertuples(index=False)) == [("b", "c", 1)]


def test_oracle_nation_diversity(ray_session):
    out = _oracle_check(
        "customer_supplier_nation_diversity",
        tables=("lineitem", "orders", "supplier"))
    assert (out.n_nations >= 1).all()
    assert (out.n_customers > 0).all()


def test_oracle_inactive_by_segment(ray_session):
    out = _oracle_check("customers_inactive_by_segment",
                        tables=("customer", "orders"))
    assert len(out) == 5
    assert (out.n_inactive <= out.n_total).all()
    assert (out.inactive_pm <= 1000).all()


def test_oracle_token_rarity(ray_session):
    out = _oracle_check("docs_token_rarity_hist",
                        tables=("documents",))
    assert (out.rarity_band >= 0).all()
    assert (out.rarity_band <= 10).all()  # ranks capped at 1001
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        "WHERE text IS NOT NULL AND source IS NOT NULL "
        "AND doc_id IS NOT NULL").fetchone()[0]
    assert out.n_docs.sum() == n


def test_token_rarity_hand_built(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.text import token_rarity_histogram

    # vocab counts: x=4 (rank 1), y=2 (rank 2), z=1 (rank 3)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["x x y", "x y z", "x"]),
        "source": pa.array(["s", "s", "s"]),
    })).materialize()
    out = token_rarity_histogram(ds, vocab_size=2, band=1)
    # ranks: doc1 [1,1,2] med 1; doc2 [1,2,3->OOV 3] med 2;
    # doc3 [1] med 1  (vocab_size=2 -> z is OOV rank 3)
    got = dict(zip(out.rarity_band, out.n_docs))
    assert got == {1: 2, 2: 1}


def test_oracle_monthly_acquisition(ray_session):
    out = _oracle_check("customers_monthly_acquisition",
                        tables=("orders",))
    assert (out.n_new <= out.n_active).all()
    assert (out.n_active <= out.n_orders).all()
    con = duckdb.connect()
    n_cust = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet' WHERE o_custkey IS NOT NULL "
        "AND o_orderdate IS NOT NULL").fetchone()[0]
    # every customer is new exactly once
    assert out.n_new.sum() == n_cust


def test_oracle_priority_transitions(ray_session):
    out = _oracle_check("orders_priority_transitions",
                        tables=("orders",))
    assert len(out) == 25
    con = duckdb.connect()
    tot = con.execute(f"""
        WITH o AS (SELECT o_custkey, COUNT(*) AS n
                   FROM '{SF}/orders.parquet'
                   WHERE o_custkey IS NOT NULL
                     AND o_orderdate IS NOT NULL
                     AND o_orderkey IS NOT NULL
                     AND o_orderpriority IS NOT NULL GROUP BY 1)
        SELECT SUM(n - 1) FROM o""").fetchone()[0]
    assert out.n.sum() == tot


def test_oracle_value_drift_exact(ray_session):
    out = _oracle_check("events_value_drift_exact",
                        tables=("events",))
    assert list(out.epoch) == ["first", "second"]
    assert (out.q50 <= out.q90).all()


def test_oracle_discount_tax_joint(ray_session):
    out = _oracle_check("lineitem_discount_tax_joint",
                        tables=("lineitem",))
    assert (out.disc_pct >= 0).all() and (out.disc_pct <= 10).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet' "
        "WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL "
        "AND l_extendedprice IS NOT NULL").fetchone()[0]
    assert out.n_lines.sum() == n


def test_oracle_gini_monthly(ray_session):
    out = _oracle_check("orders_value_gini_monthly",
                        tables=("orders",))
    # Gini numerator bounds: 0 <= num <= (n-1) * sum_v
    assert (out.gini_num >= 0).all()
    assert (out.gini_num <= (out.n - 1) * out.sum_v).all()
