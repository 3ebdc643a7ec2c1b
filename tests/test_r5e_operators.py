"""Round-5 batch E: inventory balance, calendar lift, price
reconciliation (committed batch A) plus Zipf decile mass, centroid
confusion, session duration by entry — oracle parity at sf0.001 and
semantic spot checks (decile arithmetic, pandas session reference)."""

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


def test_oracle_zipf_decile_mass(ray_session):
    out = _oracle_check("docs_zipf_decile_mass",
                        tables=("documents",))
    assert len(out) == 10
    assert list(out.decile) == list(range(10))
    # the head decile dominates the tail decile and permille mass
    # sums to at most 1000 (floors)
    assert out.mass_pm.iloc[0] >= out.mass_pm.iloc[-1]
    assert out.mass_pm.sum() <= 1000
    # per-decile key counts partition the vocabulary evenly (+-1)
    assert out.n_keys.max() - out.n_keys.min() <= 1


def test_rank_decile_mass_small_vocab(ray_session):
    # V < 10: deciles holding no rank are omitted; masses recount
    import ray.data as rd

    from verify_ray.pipelines.analytics import rank_decile_mass

    rows = pa.table({"token": pa.array(
        [1] * 5 + [2] * 3 + [3] * 1, type=pa.int64())})
    out = rank_decile_mass(rd.from_arrow(rows).materialize())
    # V=3 -> rank r lands in decile (10*(r-1))//3 = 0, 3, 6
    assert list(out.decile) == [0, 3, 6]
    assert list(out.mass) == [5, 3, 1]
    assert list(out.n_keys) == [1, 1, 1]
    assert list(out.mass_pm) == [555, 333, 111]


def test_oracle_centroid_confusion(ray_session):
    out = _oracle_check("embeddings_centroid_confusion",
                        tables=("embeddings",))
    assert len(out) > 0
    con = duckdb.connect()
    n_vec = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL AND label IS NOT NULL"
    ).fetchone()[0]
    assert out.n.sum() == n_vec
    labels = set(out.label) | set(out.assigned)
    assert set(out.assigned) <= set(out.label)
    assert all(l >= 0 for l in labels)


def test_centroid_confusion_two_point(ray_session):
    # hand-checkable: two well-separated labels assign to themselves
    import ray.data as rd

    from verify_ray.pipelines.similarity import centroid_confusion

    vecs = ([[1.0, 0.0]] * 4 + [[0.9, 0.1]] * 2
            + [[0.0, 1.0]] * 4 + [[0.1, 0.9]] * 2)
    labs = [0] * 6 + [1] * 6
    t = pa.table({"embedding": pa.array(vecs,
                                        type=pa.list_(pa.float32())),
                  "label": pa.array(labs, type=pa.int32())})
    out = centroid_confusion(rd.from_arrow(t).materialize())
    assert list(out.label) == [0, 1]
    assert list(out.assigned) == [0, 1]
    assert list(out.n) == [6, 6]


def test_oracle_session_duration_by_entry(ray_session):
    out = _oracle_check("events_session_duration_by_entry",
                        tables=("events",))
    assert len(out) > 0
    assert (out.q50 <= out.q90).all()
    assert (out.q50 >= 0).all()
    # sessions partition events: total session count matches an
    # independent pandas recount
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"]).dropna()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    t = ev.ts.astype("datetime64[us]").astype("int64").to_numpy()
    u = ev.user_id.to_numpy()
    new = np.ones(len(ev), dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > 1_800_000_000)
    assert out.n.sum() == int(new.sum())


def test_session_duration_by_entry_reference(ray_session):
    # randomized pandas differential on a synthetic event log
    import ray.data as rd

    from verify_ray.pipelines.sessions import session_duration_by_entry

    rng = np.random.RandomState(7)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 40, n),
        "ts": pd.to_datetime(
            rng.randint(0, 3_600_000, n) * 1000, unit="us"),
        "event_type": rng.choice(["a", "b", "c"], n),
        "event_id": np.arange(n, dtype=np.int64)})
    out = session_duration_by_entry(
        rd.from_arrow(pa.Table.from_pandas(df)).materialize(),
        gap_minutes=5.0)

    sdf = df.sort_values(["user_id", "ts", "event_id"])
    t = sdf.ts.astype("datetime64[us]").astype("int64").to_numpy()
    u = sdf.user_id.to_numpy()
    new = np.ones(len(sdf), dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > 300_000_000)
    sid = np.cumsum(new)
    g = pd.DataFrame({"sid": sid, "t": t,
                      "et": sdf.event_type.to_numpy()})
    agg = g.groupby("sid").agg(
        entry=("et", "first"), lo=("t", "min"), hi=("t", "max"))
    agg["dur_s"] = (agg.hi - agg.lo) // 1_000_000

    def qdisc(v, q):
        v = np.sort(v.to_numpy())
        return int(v[max(0, int(np.ceil(q * len(v))) - 1)])

    ref = (agg.groupby("entry").dur_s
           .agg(n="size", q50=lambda v: qdisc(v, 0.5),
                q90=lambda v: qdisc(v, 0.9))
           .reset_index().rename(columns={"entry": "event_type"}))
    ref = ref.sort_values("event_type").reset_index(drop=True)
    assert list(out.event_type) == list(ref.event_type)
    assert list(out.n) == list(ref.n)
    assert list(out.q50) == list(ref.q50)
    assert list(out.q90) == list(ref.q90)


def test_oracle_token_waterfill(ray_session):
    out = _oracle_check("source_token_waterfill",
                        tables=("documents",))
    assert len(out) > 0
    assert (out.alloc <= out.tokens).all()
    # allocation exhausts at most the budget and capped groups all
    # sit at the same water level
    total = int(out.tokens.sum())
    assert out.alloc.sum() <= 500 * total // 1000
    caps = out.loc[out.capped == 1, "alloc"]
    if len(caps):
        assert caps.nunique() == 1
        # uncapped groups sit at or below the level
        assert (out.loc[out.capped == 0, "alloc"]
                <= caps.iloc[0]).all()


def test_token_waterfill_brute_force(ray_session):
    # randomized: the reported water level C satisfies
    # sum(min(t, C)) <= B < sum(min(t, C+1))
    import ray.data as rd

    from verify_ray.pipelines.sample import token_waterfill

    rng = np.random.RandomState(11)
    for trial in range(5):
        sizes = rng.randint(0, 60, size=rng.randint(2, 9))
        texts, groups = [], []
        for gi, sz in enumerate(sizes):
            texts.append(" ".join(["w"] * max(1, sz)))
            groups.append(f"g{gi}")
        t = pa.table({"source": pa.array(groups),
                      "text": pa.array(texts)})
        pm = int(rng.choice([200, 500, 800]))
        out = token_waterfill(rd.from_arrow(t).materialize(),
                              budget_permille=pm)
        tok = out.tokens.to_numpy()
        B = pm * int(tok.sum()) // 1000
        assert out.alloc.sum() <= B
        if (out.capped == 1).any():
            C = int(out.loc[out.capped == 1, "alloc"].iloc[0])
            assert np.minimum(tok, C).sum() <= B
            assert np.minimum(tok, C + 1).sum() > B
        else:
            assert (out.alloc == out.tokens).all()


def test_oracle_label_influence(ray_session):
    out = _oracle_check("embeddings_label_influence",
                        tables=("embeddings",))
    assert len(out) > 0
    assert (out.l1_x >= 0).all()
    con = duckdb.connect()
    n_vec = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL AND label IS NOT NULL"
    ).fetchone()[0]
    assert out.n.sum() == n_vec


def test_label_influence_single_label_zero(ray_session):
    # one label == the global centroid -> zero displacement
    import ray.data as rd

    from verify_ray.pipelines.similarity import label_influence

    t = pa.table({"embedding": pa.array(
        [[0.5, -0.25], [0.1, 0.9]], type=pa.list_(pa.float32())),
        "label": pa.array([3, 3], type=pa.int32())})
    out = label_influence(rd.from_arrow(t).materialize())
    assert list(out.label) == [3]
    assert list(out.l1_x) == [0]


def test_oracle_daily_periodicity(ray_session):
    out = _oracle_check("events_daily_periodicity",
                        tables=("events",))
    assert list(out.lag) == list(range(1, len(out) + 1))
    # spine identity: n_pairs shrinks by exactly 1 per lag
    assert (np.diff(out.n_pairs.to_numpy()) == -1).all()
    # Cauchy-Schwarz on the raw moments
    assert (out.sum_xy * out.sum_xy
            <= out.sum_head_sq * out.sum_tail_sq).all()


def test_oracle_peak_load_window(ray_session):
    out = _oracle_check("events_peak_load_window",
                        tables=("events",))
    assert len(out) == 1
    r = out.iloc[0]
    assert r.end_day >= r.start_day
    assert r.n_days == r.end_day - r.start_day + 1
    # a max-sum window of a zero-sum-ish centered series is positive
    # unless the series is constant
    assert r.score_x >= 0


def test_peak_load_window_handcheck(ray_session):
    # planted burst: three quiet days, two heavy days, two quiet
    import ray.data as rd

    from verify_ray.pipelines.analytics import peak_load_window

    days = [0] * 1 + [1] * 1 + [2] * 1 + [3] * 10 + [4] * 10 \
        + [5] * 1 + [6] * 1
    ts = pd.to_datetime(np.array(days) * 86_400_000_000 * 1000,
                        unit="ns")
    t = pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))})
    out = peak_load_window(rd.from_arrow(t).materialize())
    r = out.iloc[0]
    # D=7, T=25; dev = [-18,-18,-18,45,45,-18,-18] -> window [3,4]
    assert (r.start_day, r.end_day, r.n_days, r.score_x) \
        == (3, 4, 2, 90)


def test_oracle_supplier_hhi(ray_session):
    out = _oracle_check("part_supplier_hhi", tables=("lineitem",))
    assert len(out) > 0
    # bounds: n_lines^2 / n_suppliers <= hhi_x <= n_lines^2
    assert (out.hhi_x <= out.n_lines ** 2).all()
    assert (out.hhi_x * out.n_suppliers >= out.n_lines ** 2).all()
    # consistency with the switches audit's distinct-supplier count
    import __ray_entry__ as e

    sw = e.queries()["part_supplier_switches"](SF)
    m = out.merge(sw, on="l_partkey")
    assert (m.n_suppliers_x == m.n_suppliers_y).all()


def test_oracle_segment_gap_quantiles(ray_session):
    out = _oracle_check("segment_reorder_gap_quantiles",
                        tables=("orders", "customer"))
    assert len(out) > 0
    assert (out.q50 <= out.q90).all()
    assert (out.n > 0).all()


def test_oracle_bracket_balance(ray_session):
    out = _oracle_check("docs_bracket_balance",
                        tables=("documents",))
    assert len(out) > 0
    assert (out.n_paren_unbal <= out.n_docs).all()
    assert (out.n_bracket_unbal <= out.n_docs).all()
    assert (out.n_quote_odd <= out.n_docs).all()


def test_oracle_degree_log_hist(ray_session):
    out = _oracle_check("copurchase_degree_log_hist",
                        tables=("lineitem",))
    assert len(out) > 0
    # bin boundaries: 2^bin <= min_deg <= max_deg < 2^(bin+1)
    assert (out.min_deg >= 2 ** out.bin).all()
    assert (out.max_deg < 2 ** (out.bin + 1)).all()
    assert (out.sum_deg >= out.n_nodes * out.min_deg).all()
    assert (out.sum_deg <= out.n_nodes * out.max_deg).all()
    # handshake: total degree is even (each edge counted twice)
    assert out.sum_deg.sum() % 2 == 0


def test_oracle_return_clustering(ray_session):
    out = _oracle_check("lineitem_return_clustering",
                        tables=("lineitem",))
    assert len(out) == 1
    r = out.iloc[0]
    assert r.n_rr <= r.n_adj
    assert r.n_rr <= r.n_returns
    assert r.n_returns <= r.n_lines
    # recount n_lines straight off the table
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_returnflag"]).dropna()
    assert r.n_lines == len(li)
    assert r.n_returns == int((li.l_returnflag == "R").sum())


def test_oracle_scatter_ratio(ray_session):
    out = _oracle_check("embeddings_scatter_ratio",
                        tables=("embeddings",))
    assert len(out) > 0
    assert (out.within_x >= 0).all()
    assert (out.between_x >= 0).all()
    con = duckdb.connect()
    n_vec = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL AND label IS NOT NULL"
    ).fetchone()[0]
    assert out.n.sum() == n_vec


def test_scatter_ratio_two_blob(ray_session):
    # two tight, well-separated blobs: between >> within
    import ray.data as rd

    from verify_ray.pipelines.similarity import scatter_ratio

    vecs = [[1.0, 0.0]] * 5 + [[-1.0, 0.0]] * 5
    labs = [0] * 5 + [1] * 5
    t = pa.table({"embedding": pa.array(vecs,
                                        type=pa.list_(pa.float32())),
                  "label": pa.array(labs, type=pa.int32())})
    out = scatter_ratio(rd.from_arrow(t).materialize())
    assert list(out.label) == [0, 1]
    assert (out.within_x == 0).all()
    # centroids (1000, 0) and (-1000, 0); global (0, 0):
    # between = 5 * 1000^2 each
    assert list(out.between_x) == [5_000_000, 5_000_000]


def test_oracle_reactivation_counts(ray_session):
    out = _oracle_check("events_reactivation_counts",
                        tables=("events",))
    assert len(out) > 1  # both dormant-returners and steady users
    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet' "
        "WHERE user_id IS NOT NULL AND ts IS NOT NULL "
        "AND event_id IS NOT NULL").fetchone()[0]
    assert out.n_users.sum() == n_users


def test_oracle_brand_discount_depth(ray_session):
    out = _oracle_check("brand_discount_depth",
                        tables=("lineitem", "part"))
    assert len(out) > 0
    assert (out.n_below <= out.n_lines).all()
    assert (out.below_pm <= 1000).all()


def test_oracle_type_adoption(ray_session):
    out = _oracle_check("user_type_first_adoption",
                        tables=("events",))
    assert len(out) > 0
    # each (user, type) pair adopts exactly once: totals match the
    # distinct pair count
    con = duckdb.connect()
    n_pairs = con.execute(
        f"SELECT COUNT(*) FROM (SELECT DISTINCT user_id, event_type "
        f"FROM '{SF}/events.parquet' WHERE user_id IS NOT NULL "
        "AND ts IS NOT NULL AND event_type IS NOT NULL)"
    ).fetchone()[0]
    assert out.n_new_users.sum() == n_pairs
    # adoption is front-loaded: the first month dominates
    first_mon = out.mon.min()
    assert (out[out.mon == first_mon].n_new_users.sum()
            >= out.n_new_users.sum() // 2)


def test_oracle_supplier_corr(ray_session):
    out = _oracle_check("supplier_volume_balance_corr",
                        tables=("supplier", "lineitem"))
    assert len(out) > 0
    # Cauchy-Schwarz on centered moments (cross-multiplied)
    n = out.n.to_numpy()
    cov = n * out.sum_xy.to_numpy() - out.sum_x.to_numpy() \
        * out.sum_y.to_numpy()
    vx = n * out.sum_x2.to_numpy() - out.sum_x.to_numpy() ** 2
    vy = n * out.sum_y2.to_numpy() - out.sum_y.to_numpy() ** 2
    assert (cov.astype(object) ** 2
            <= vx.astype(object) * vy.astype(object)).all()
    # every supplier is counted exactly once across nations
    con = duckdb.connect()
    n_sup = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/supplier.parquet' "
        "WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL "
        "AND s_acctbal IS NOT NULL").fetchone()[0]
    assert out.n.sum() == n_sup


def test_oracle_trade_matrix(ray_session):
    out = _oracle_check("nation_trade_matrix",
                        tables=("lineitem", "orders", "customer",
                                "supplier", "nation"))
    assert len(out) > 0
    assert (out.revenue_x > 0).all()
    # total joined lines = lineitem rows whose order exists
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet' l "
        f"JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey"
    ).fetchone()[0]
    assert out.n_lines.sum() == n


def test_oracle_burst_ratio(ray_session):
    out = _oracle_check("events_burst_ratio_by_type",
                        tables=("events",))
    assert len(out) > 0
    assert (out.max_daily >= out.med_daily).all()
    assert (out.burst_pm >= 1000).all()


def test_oracle_monthly_hhi(ray_session):
    out = _oracle_check("orders_monthly_customer_hhi",
                        tables=("orders",))
    assert len(out) > 0
    # HHI bounds: 1e6/n <= hhi <= 1e6 on true shares; floored
    # permille shares can only sit lower
    assert (out.hhi_pm2 <= 1_000_000).all()
    assert (out.top_share_pm <= 1000).all()
    assert (out.hhi_pm2 >= out.top_share_pm ** 2).all()


def test_oracle_orc_roundtrip(ray_session):
    out = _oracle_check("orc_roundtrip", tables=("documents",))
    assert len(out) > 0
    assert out.n_docs.sum() > 0


def test_oracle_feather_roundtrip(ray_session):
    out = _oracle_check("feather_roundtrip", tables=("documents",))
    assert len(out) > 0


def test_columnar_projection_and_lineage(ray_session):
    # projection prunes columns at the read; path lineage present
    import os
    import tempfile

    import pyarrow.feather as feather
    from pyarrow import orc

    import ray.data as rd

    from verify_ray.sources.columnar import (read_feather_with_lineage,
                                             read_orc_with_lineage)

    t = pa.table({"a": pa.array([1, 2, 3], type=pa.int64()),
                  "b": pa.array(["x", "y", "z"]),
                  "c": pa.array([1.5, 2.5, 3.5])})
    d = tempfile.mkdtemp(prefix="vr_columnar_")
    op, fp = os.path.join(d, "t.orc"), os.path.join(d, "t.feather")
    orc.write_table(t, op)
    feather.write_feather(t, fp)
    for reader, path in ((read_orc_with_lineage, op),
                         (read_feather_with_lineage, fp)):
        ds = reader([path], columns=["a", "b"])
        got = pa.concat_tables(
            [pa.Table.from_pandas(df) for df in
             [ds.to_pandas()]])
        assert sorted(got.column_names) == ["a", "b", "path"]
        assert got.num_rows == 3
        assert got.column("path").to_pylist()[0] == path


def test_oracle_coverage_curve(ray_session):
    out = _oracle_check("tokens_coverage_curve",
                        tables=("documents",))
    assert len(out) > 1
    # mass strictly increases with k; last k covers everything
    assert (np.diff(out.mass.to_numpy()) > 0).all()
    assert out.mass_pm.iloc[-1] == 1000
    ks = out.k.to_numpy()
    assert (ks[:-1] == 2 ** np.arange(len(ks) - 1)).all()
    # consistency with the decile surface's total
    import __ray_entry__ as e

    dec = e.queries()["docs_zipf_decile_mass"](SF)
    assert out.mass.iloc[-1] == dec.mass.sum()


def test_oracle_centroid_distances(ray_session):
    out = _oracle_check("embeddings_centroid_distances",
                        tables=("embeddings",))
    k = len(set(out.label_a) | set(out.label_b))
    assert len(out) == k * (k - 1) // 2
    assert (out.label_a < out.label_b).all()
    assert (out.l2sq_x >= 0).all()


def test_oracle_length_band(ray_session):
    out = _oracle_check("docs_length_band_by_source",
                        tables=("documents",))
    assert set(out.band) <= {0, 1, 2, 3}
    # bands partition the docs; per-band shares sum to <= 1000
    g = out.groupby("band")
    assert (g.share_pm.sum() <= 1000).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' WHERE "
        "source IS NOT NULL AND n_chars IS NOT NULL").fetchone()[0]
    assert out.n_docs.sum() == n


def test_oracle_band_migration(ray_session):
    out = _oracle_check("customer_value_band_migration",
                        tables=("orders",))
    assert len(out) > 0
    assert out.band_first.between(0, 3).all()
    assert out.band_second.between(0, 3).all()
    # matrix counts = customers active in both halves
    assert out.n_customers.sum() > 0


def test_oracle_wordlen_by_position(ray_session):
    out = _oracle_check("docs_wordlen_by_position",
                        tables=("documents",))
    assert list(out.tercile) == [0, 1, 2]
    # total word count matches the corpus token total
    import __ray_entry__ as e

    cov = e.queries()["tokens_coverage_curve"](SF)
    assert out.n_words.sum() == cov.mass.iloc[-1]


def test_oracle_csv_roundtrip(ray_session):
    out = _oracle_check("csv_roundtrip", tables=("documents",))
    assert len(out) > 0
    assert out.n_docs.sum() > 0
