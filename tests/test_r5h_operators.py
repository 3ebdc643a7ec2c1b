"""Round-5 batch H: open-order backlog day series, monthly
repeat-customer share, per-user event-type concentration census —
oracle parity at sf0.001 plus hand-built semantic checks."""

import duckdb
import numpy as np
import pandas as pd

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


def test_oracle_backlog_series(ray_session):
    out = _oracle_check("orders_daily_backlog_series",
                        tables=("orders", "lineitem"))
    # backlog is a running open-count: never negative, contiguous spine
    assert (out.n_open >= 0).all()
    days = out.day.to_numpy(np.int64)
    assert np.array_equal(days, np.arange(days[0], days[-1] + 1))
    # orders with no lineitem never close: terminal backlog equals them
    con = duckdb.connect()
    nolines = con.execute(f"""
        SELECT COUNT(*) FROM '{SF}/orders.parquet' o
        WHERE NOT EXISTS (SELECT 1 FROM '{SF}/lineitem.parquet' l
                          WHERE l.l_orderkey = o.o_orderkey)
    """).fetchone()[0]
    # closes beyond the spine keep the tail >= the never-closing floor
    assert out.n_open.iloc[-1] >= nolines


def test_backlog_hand_case(ray_session, tmp_path):
    # two orders: A opens d10 ships d12 (close 12); B opens d11, no
    # lines (never closes); C opens d10, ships d9 (close at max=10)
    import pyarrow as pa
    import pyarrow.parquet as pq

    def d2us(d):
        return d * 86_400_000_000

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([d2us(10), d2us(11), d2us(10)],
                                pa.timestamp("us")),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 3], pa.int64()),
        "l_shipdate": pa.array([d2us(13), d2us(12), d2us(9)],
                               pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    import __ray_entry__ as e

    out = e.queries()["orders_daily_backlog_series"](str(tmp_path))
    # d10: A,C open, C closes same day -> 1 open (A); d11: +B -> 2;
    # spine ends at max order day 11 (A's close at 12 is off-spine)
    assert out.day.tolist() == [10, 11]
    assert out.n_open.tolist() == [1, 2]


def test_oracle_monthly_repeat(ray_session):
    out = _oracle_check("customers_monthly_repeat_share",
                        tables=("orders",))
    assert (out.n_repeat <= out.n_customers).all()
    assert (out.n_first <= out.n_customers).all()
    # every customer is first exactly once: firsts sum to distinct custs
    con = duckdb.connect()
    nc = con.execute(f"SELECT COUNT(DISTINCT o_custkey) FROM "
                     f"'{SF}/orders.parquet'").fetchone()[0]
    assert out.n_first.sum() == nc
    # first month has zero repeats
    assert out.n_repeat.iloc[0] == 0


def test_oracle_type_concentration(ray_session):
    out = _oracle_check("users_type_concentration_hist",
                        tables=("events",))
    # bands live in [0, 10]; single-type users land in band 10
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu


def test_type_concentration_hand_case(ray_session, tmp_path):
    # user 1: 4 events of one type -> permille 1000 -> band 10
    # user 2: 2+2 of two types -> 1000*8/16 = 500 -> band 5
    # user 3: 3+1 -> 1000*10/16 = 625 -> band 6
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "user_id": pa.array([1] * 4 + [2] * 4 + [3] * 4, pa.int64()),
        "event_type": pa.array(
            ["a"] * 4 + ["a", "a", "b", "b"] + ["a", "a", "a", "b"]),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["users_type_concentration_hist"](str(tmp_path))
    assert dict(zip(out.band, out.n_users)) == {5: 1, 6: 1, 10: 1}


def test_oracle_pingpong(ray_session):
    out = _oracle_check("events_pingpong_rate_hist",
                        tables=("events",))
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    nu = con.execute(f"""
        SELECT COUNT(*) FROM (SELECT user_id FROM
        '{SF}/events.parquet' GROUP BY 1 HAVING COUNT(*) >= 3)
    """).fetchone()[0]
    assert out.n_users.sum() == nu


def test_pingpong_hand_case(ray_session, tmp_path):
    # user 1: a b a b -> trigrams (aba), (bab) both pingpong -> 1000
    # user 2: a a a  -> 1 trigram, not pingpong (t == t1) -> 0
    # user 3: a b    -> no trigram, excluded
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, 3, 3], pa.int64()),
        "ts": pa.array(list(range(9)), pa.timestamp("us")),
        "event_id": pa.array(list(range(9)), pa.int64()),
        "event_type": pa.array(
            ["a", "b", "a", "b", "a", "a", "a", "a", "b"]),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["events_pingpong_rate_hist"](str(tmp_path))
    assert dict(zip(out.band, out.n_users)) == {0: 1, 10: 1}


def test_oracle_hubness(ray_session):
    out = _oracle_check("embeddings_hubness_hist",
                        tables=("embeddings",))
    # every vector is counted exactly once across degree rows, and
    # total in-degree mass equals the number of 1-NN edges (= n_vecs)
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/embeddings.parquet'").fetchone()[0]
    assert out.n_vecs.sum() == n
    assert (out.indegree * out.n_vecs).sum() == n


def test_hubness_hand_case(ray_session, tmp_path):
    # 0 and 1 identical (mutual NN); 2 close to them; 3 far away:
    # nn(0)=1, nn(1)=0, nn(2)=0 (tie dot -> min id), nn(3)=0 (dot 0
    # beats negatives? no -- all dots equal 0 for 3; tie -> id 0)
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0, 1], pa.int32()),
    }), tmp_path / "embeddings.parquet")
    import __ray_entry__ as e

    out = e.queries()["embeddings_hubness_hist"](str(tmp_path))
    # nn(0)=1, nn(1)=0, nn(2)=0, nn(3)=0 -> indeg: 0:3, 1:1 -> hist:
    # degree 0 x2 (vec 2,3), degree 1 x1 (vec 1), degree 3 x1 (vec 0)
    assert dict(zip(out.indegree, out.n_vecs)) == {0: 2, 1: 1, 3: 1}


def test_oracle_retention_drop(ray_session):
    out = _oracle_check("events_retention_drop_census",
                        tables=("events",))
    assert (out.n_dropped <= out.n_events).all()
    con = duckdb.connect()
    total, over = con.execute(f"""
        SELECT SUM(n), SUM(CASE WHEN n > 10 THEN n - 10 ELSE 0 END)
        FROM (SELECT COUNT(*) AS n FROM '{SF}/events.parquet'
              GROUP BY user_id)
    """).fetchone()
    assert out.n_events.sum() == total
    assert out.n_dropped.sum() == over


def test_oracle_ship_gap_median(ray_session):
    out = _oracle_check("part_ship_gap_median_hist",
                        tables=("lineitem",))
    assert (out.median_gap >= 1).all()
    # parts counted = parts with >= 2 distinct ship days
    con = duckdb.connect()
    np2 = con.execute(f"""
        SELECT COUNT(*) FROM (
          SELECT l_partkey FROM (
            SELECT DISTINCT l_partkey,
                   epoch_us(l_shipdate) // 86400000000 AS d
            FROM '{SF}/lineitem.parquet')
          GROUP BY 1 HAVING COUNT(*) >= 2)
    """).fetchone()[0]
    assert out.n_parts.sum() == np2


def test_ship_gap_median_hand_case(ray_session, tmp_path):
    # part 1 ships days [0,3,4,10] (dup day 3 collapses):
    # gaps [3,1,6] -> lower median 3; part 2 days [5,7]: gap 2
    import pyarrow as pa
    import pyarrow.parquet as pq

    def d2us(d):
        return d * 86_400_000_000

    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array(
            [d2us(0), d2us(3), d2us(3), d2us(4), d2us(10),
             d2us(5), d2us(7)], pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    import __ray_entry__ as e

    out = e.queries()["part_ship_gap_median_hist"](str(tmp_path))
    assert dict(zip(out.median_gap, out.n_parts)) == {2: 1, 3: 1}


def test_oracle_word_stutter(ray_session):
    out = _oracle_check("docs_adjacent_word_stutter",
                        tables=("documents",))
    assert (out.n_stutter <= out.n_pairs).all()
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/documents.parquet'").fetchone()[0]
    assert out.n_docs.sum() == nd


def test_word_stutter_hand_case(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the the cat", "a b a", "  x  "]),
        "source": pa.array(["s1", "s1", "s2"]),
    }), tmp_path / "documents.parquet")
    import __ray_entry__ as e

    out = e.queries()["docs_adjacent_word_stutter"](str(tmp_path))
    s1 = out[out.source == "s1"].iloc[0]
    # doc1: pairs 2 stutter 1; doc2: pairs 2 stutter 0
    assert (s1.n_docs, s1.n_pairs, s1.n_stutter) == (2, 4, 1)
    s2 = out[out.source == "s2"].iloc[0]
    # "  x  " -> trim spaces -> "x" -> 1 word, 0 pairs
    assert (s2.n_docs, s2.n_pairs, s2.n_stutter) == (1, 0, 0)


def test_oracle_sign_agreement(ray_session):
    out = _oracle_check("embeddings_sign_agreement",
                        tables=("embeddings",))
    assert len(out) == 28  # C(8,2) dimension pairs
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/embeddings.parquet'").fetchone()[0]
    assert (out.n == n).all()
    assert (out.n_agree <= out.n).all()


def test_oracle_daily_user_overlap(ray_session):
    out = _oracle_check("events_daily_user_overlap",
                        tables=("events",))
    assert (out.n_inter <= out.n_union).all()
    days = out.day.to_numpy(np.int64)
    assert np.array_equal(days, np.arange(days[0], days[-1] + 1))


def test_daily_user_overlap_hand_case(ray_session, tmp_path):
    # d0: {1,2}; d1: {2,3}; d2: {3}
    import pyarrow as pa
    import pyarrow.parquet as pq

    def d2us(d):
        return d * 86_400_000_000

    pq.write_table(pa.table({
        "user_id": pa.array([1, 2, 2, 3, 3], pa.int64()),
        "ts": pa.array([d2us(0), d2us(0), d2us(1), d2us(1), d2us(2)],
                       pa.timestamp("us")),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["events_daily_user_overlap"](str(tmp_path))
    assert out.day.tolist() == [1, 2]
    assert out.n_inter.tolist() == [1, 1]   # {2}, {3}
    assert out.n_union.tolist() == [3, 2]   # {1,2,3}, {2,3}


def test_oracle_trimmed_by_type(ray_session):
    out = _oracle_check("events_value_trimmed_by_type",
                        tables=("events",))
    assert (out.n_kept == out.n - 2 * (out.n // 10)).all()


def test_trimmed_hand_case(ray_session, tmp_path):
    # type a: cents [1..10]*100 -> n=10, k=1, keep ranks 2..9
    # -> kept sum = (2+..+9)*100 = 4400
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "event_type": pa.array(["a"] * 10),
        "value": pa.array([float(i) for i in range(1, 11)]),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["events_value_trimmed_by_type"](str(tmp_path))
    r = out.iloc[0]
    assert (r.n, r.n_kept, r.sum_kept_cents) == (10, 8, 4400)


def test_oracle_first_line_dup(ray_session):
    out = _oracle_check("docs_first_line_dup",
                        tables=("documents",))
    # planted: 20 originals + 20 republished copies are all dups
    assert out.n_dup_firstline.sum() >= 40
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/documents.parquet'").fetchone()[0]
    assert out.n_docs.sum() == nd + 20


def test_oracle_acctbal_outliers(ray_session):
    out = _oracle_check("supplier_acctbal_outliers",
                        tables=("supplier",))
    assert (out.n_outliers <= out.n_suppliers).all()
    # Chebyshev: at most 1/4 of any group can sit beyond 2 sigma
    assert (4 * out.n_outliers <= out.n_suppliers).all()


def test_acctbal_outliers_hand_case(ray_session, tmp_path):
    # nation 0: five zeros + one spike x: (x-mu)^2 = (5x/6)^2 =
    # 25/36 x^2 > 4*sigma^2 = 20/36 x^2 -> the spike IS an outlier
    # (with n=5 the two sides are exactly equal -> not an outlier)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "s_nationkey": pa.array([0] * 6, pa.int32()),
        "s_acctbal": pa.array([0.0] * 5 + [1.01]),
    }), tmp_path / "supplier.parquet")
    import __ray_entry__ as e

    out = e.queries()["supplier_acctbal_outliers"](str(tmp_path))
    assert out.n_suppliers.tolist() == [6]
    assert out.n_outliers.tolist() == [1]


def test_oracle_linenumber_integrity(ray_session):
    out = _oracle_check("lineitem_linenumber_integrity",
                        tables=("lineitem",))
    con = duckdb.connect()
    no = con.execute(f"SELECT COUNT(DISTINCT l_orderkey) FROM "
                     f"'{SF}/lineitem.parquet'").fetchone()[0]
    assert out.n_orders.sum() == no


def test_linenumber_integrity_hand_case(ray_session, tmp_path):
    # order 1: [1,2,3] ok; order 2: [1,1,2] dup (distinct {1,2}
    # contiguous); order 3: [1,3] gap; order 4: [2,2] dup+gap
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 2, 3, 3, 4, 4],
                               pa.int64()),
        "l_linenumber": pa.array([1, 2, 3, 1, 1, 2, 1, 3, 2, 2],
                                 pa.int32()),
    }), tmp_path / "lineitem.parquet")
    import __ray_entry__ as e

    out = e.queries()["lineitem_linenumber_integrity"](str(tmp_path))
    assert dict(zip(out.anomaly, out.n_orders)) == {
        "ok": 1, "dup": 1, "gap": 1, "dup+gap": 1}


def test_oracle_weekend_share(ray_session):
    out = _oracle_check("users_weekend_share_hist",
                        tables=("events",))
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu


def test_oracle_dim_deciles(ray_session):
    out = _oracle_check("embeddings_dim_deciles",
                        tables=("embeddings",))
    assert len(out) == 72  # 8 dims x 9 deciles
    # deciles are monotone within each dim
    for _, sub in out.groupby("dim"):
        v = sub.sort_values("decile").val.to_numpy()
        assert (np.diff(v) >= 0).all()


def test_dim_deciles_hand_case(ray_session, tmp_path):
    # dim 0 values i/1024 (float32-EXACT; i/1000 is not: the
    # float32(0.005)*1000 -> 4.9999999 floor trap) -> q = floor(
    # 1000*i/1024); decile d picks rank d -> val of element d-1
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = [[i / 1024.0] + [0.0] * 7 for i in range(10)]
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(10)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")
    import __ray_entry__ as e

    out = e.queries()["embeddings_dim_deciles"](str(tmp_path))
    d0 = out[out.dim == 0].sort_values("decile")
    exp = [int(1000 * i // 1024) for i in range(9)]
    assert d0.val.tolist() == exp


def test_oracle_value_magnitude(ray_session):
    out = _oracle_check("orders_value_magnitude_priority",
                        tables=("orders",))
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/orders.parquet'").fetchone()[0]
    assert out.n_orders.sum() == n
    # min price ~1000 -> cents >= 1e5 -> band >= 16
    assert (out.band >= 16).all()


def test_oracle_cross_lang_dups(ray_session):
    out = _oracle_check("docs_cross_lang_dups",
                        tables=("documents",))
    # the 25 planted 'xx' copies + their originals are all dups
    assert out.n_cross_lang_dup.sum() >= 50
    xx = out[out.lang == "xx"].iloc[0]
    assert xx.n_docs == 25 and xx.n_cross_lang_dup == 25


def test_oracle_nchars_reconcile(ray_session):
    out = _oracle_check("docs_nchars_reconcile",
                        tables=("documents",))
    # the 15 planted corruptions are the only mismatches (diff 7)
    assert out.n_mismatch.sum() == 15
    assert out[out.n_mismatch > 0].max_abs_diff.max() == 7
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/documents.parquet'").fetchone()[0]
    assert out.n_docs.sum() == nd + 15


def test_oracle_exploration_speed(ray_session):
    out = _oracle_check("users_exploration_speed_hist",
                        tables=("events",))
    # reaching 3 distinct types takes at least 3 events
    assert (out.pos >= 3).all()


def test_exploration_hand_case(ray_session, tmp_path):
    # user 1: a a b a c -> 3rd distinct at pos 5
    # user 2: a b c     -> pos 3; user 3: a b a b -> never
    import pyarrow as pa
    import pyarrow.parquet as pq

    types = ["a", "a", "b", "a", "c", "a", "b", "c", "a", "b",
             "a", "b"]
    pq.write_table(pa.table({
        "user_id": pa.array([1] * 5 + [2] * 3 + [3] * 4, pa.int64()),
        "ts": pa.array(list(range(12)), pa.timestamp("us")),
        "event_id": pa.array(list(range(12)), pa.int64()),
        "event_type": pa.array(types),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["users_exploration_speed_hist"](str(tmp_path))
    assert dict(zip(out.pos, out.n_users)) == {3: 1, 5: 1}


def test_oracle_value_momentum(ray_session):
    out = _oracle_check("customers_order_value_momentum",
                        tables=("orders",))
    assert out.prev_sign.isin([-1, 0, 1]).all()
    assert out.next_sign.isin([-1, 0, 1]).all()
    # transition count = sum over customers of max(n_orders - 2, 0)
    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT SUM(GREATEST(n - 2, 0)) FROM (
          SELECT COUNT(*) AS n FROM '{SF}/orders.parquet'
          GROUP BY o_custkey)
    """).fetchone()[0]
    assert out.n.sum() == exp


def test_oracle_peak_hour(ray_session):
    out = _oracle_check("events_peak_hour_share",
                        tables=("events",))
    assert out.peak_hour.between(0, 23).all()
    assert (out.peak_n <= out.total).all()
    # the peak hour holds at least the uniform share
    assert (24 * out.peak_n >= out.total).all()


def test_oracle_length_by_freq_band(ray_session):
    out = _oracle_check("tokens_length_by_freq_band",
                        tables=("documents",))
    # band b holds counts in [2^b, 2^(b+1)): mass bounds per band
    b = out.band.to_numpy(np.int64)
    assert ((out.sum_count >= out.n_types * (1 << b)).all())
    assert ((out.sum_count < out.n_types * (1 << (b + 1))).all())


def test_oracle_whale_share(ray_session):
    out = _oracle_check("orders_monthly_whale_share",
                        tables=("orders",))
    assert (out.top_decile_cents <= out.total_cents).all()
    # the top decile's average is >= the overall average (per month)
    k = (out.n_customers + 9) // 10
    assert ((out.top_decile_cents * out.n_customers
             >= out.total_cents * k)).all()


def test_whale_share_hand_case(ray_session, tmp_path):
    # one month, 10 customers spending 1..10 -> k=1, top = 10
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(10)), pa.int64()),
        "o_custkey": pa.array(list(range(10)), pa.int64()),
        "o_orderdate": pa.array([86_400_000_000] * 10,
                                pa.timestamp("us")),
        "o_totalprice": pa.array([float(i) for i in range(1, 11)]),
    }), tmp_path / "orders.parquet")
    import __ray_entry__ as e

    out = e.queries()["orders_monthly_whale_share"](str(tmp_path))
    r = out.iloc[0]
    assert (r.n_customers, r.total_cents, r.top_decile_cents) == \
        (10, 5500, 1000)


def test_oracle_validate_embeddings(ray_session):
    out = _oracle_check("validate_embeddings",
                        tables=("embeddings",))
    # both the enum arm and the element arm fire on the testdata
    assert (out.rule_id == "invalid_enum_value").sum() > 0
    assert (out.rule_id == "element_out_of_bounds").sum() > 0
    # element spans carry the dotted index convention
    el = out[out.rule_id == "element_out_of_bounds"].span
    assert el.str.match(r"^embedding\.\d+$").all()


def test_oracle_knn_confusion(ray_session):
    out = _oracle_check("embeddings_knn_confusion",
                        tables=("embeddings",))
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/embeddings.parquet'").fetchone()[0]
    # every vector has exactly one NN edge
    assert out.n.sum() == n
    # the confusion diagonal reproduces knn_label_agreement
    import __ray_entry__ as e

    ag = e.queries()["embeddings_knn_label_agreement"](SF)
    diag = (out[out.label == out.nn_label]
            .set_index("label").n.to_dict())
    for r in ag.itertuples():
        assert diag.get(r.label, 0) == r.n_agree


def test_oracle_jaccard_topk(ray_session):
    out = _oracle_check("copurchase_jaccard_topk",
                        tables=("lineitem",))
    assert len(out) <= 10
    assert (out.jac_pm <= 1000).all() and (out.c_ab >= 2).all()
    # descending jaccard order
    assert (np.diff(out.jac_pm.to_numpy(np.int64)) <= 0).all()


def test_oracle_completeness_curve(ray_session):
    out = _oracle_check("orders_shipment_completeness",
                        tables=("lineitem", "orders"))
    assert out.offset_days.tolist() == [7, 30, 60, 90]
    # curve is monotone in the offset
    w = out.n_shipped_within.to_numpy(np.int64)
    assert (np.diff(w) >= 0).all()
    assert (out.n_shipped_within <= out.n_lines).all()
    assert out.n_lines.nunique() == 1


def test_oracle_value_per_day(ray_session):
    out = _oracle_check("users_value_per_day_hist",
                        tables=("events",))
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu
    assert (out.band >= 0).all()


def test_oracle_hour_l1(ray_session):
    out = _oracle_check("events_hour_profile_l1",
                        tables=("events",))
    # pair count = C(k, 2) over distinct types
    con = duckdb.connect()
    k = con.execute(f"SELECT COUNT(DISTINCT event_type) FROM "
                    f"'{SF}/events.parquet'").fetchone()[0]
    assert len(out) == k * (k - 1) // 2
    # L1 of cross-multiplied profiles is bounded by 2 * n_a * n_b
    assert (out.l1_cross <= 2 * out.n_a * out.n_b).all()


def test_hour_l1_hand_case(ray_session, tmp_path):
    # type a: all at hour 0 (2 events); type b: all at hour 1
    # (3 events) -> disjoint profiles -> L1 = 2 * 2 * 3 = 12
    import pyarrow as pa
    import pyarrow.parquet as pq

    H = 3_600_000_000
    pq.write_table(pa.table({
        "event_type": pa.array(["a", "a", "b", "b", "b"]),
        "ts": pa.array([0, 0, H, H, H], pa.timestamp("us")),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["events_hour_profile_l1"](str(tmp_path))
    r = out.iloc[0]
    assert (r.n_a, r.n_b, r.l1_cross) == (2, 3, 12)


def test_oracle_wav_dynamics(ray_session):
    out = _oracle_check("media_wav_dynamics",
                        tables=("documents",))
    con = duckdb.connect()
    nodd = con.execute(f"SELECT COUNT(*) FROM "
                       f"'{SF}/documents.parquet' "
                       f"WHERE doc_id % 2 = 1").fetchone()[0]
    assert len(out) == nodd
    assert (out.n_samples == 256).all()
    assert (out.smin >= -2048).all() and (out.smax <= 2047).all()
    # decode is real: near-rail counts are nontrivial somewhere
    assert out.n_near_rail.sum() > 0


def test_oracle_png_pixel_hist(ray_session):
    out = _oracle_check("media_png_pixel_hist",
                        tables=("documents",))
    con = duckdb.connect()
    nev = con.execute(f"SELECT COUNT(*) FROM "
                      f"'{SF}/documents.parquet' "
                      f"WHERE doc_id % 2 = 0").fetchone()[0]
    assert len(out) == nev
    # every image decodes all 64 pixels
    assert ((out.b0 + out.b1 + out.b2 + out.b3) == 64).all()


def test_oracle_session_count(ray_session):
    out = _oracle_check("users_session_count_hist",
                        tables=("events",))
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu
    assert (out.n_sessions >= 1).all()


def test_session_count_hand_case(ray_session, tmp_path):
    # user 1: events at 0s, 60s, 4000s -> 2 sessions (gap 3940 > 1800)
    # user 2: single event -> 1 session
    import pyarrow as pa
    import pyarrow.parquet as pq

    S = 1_000_000
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 60 * S, 4000 * S, 0], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["users_session_count_hist"](str(tmp_path))
    assert dict(zip(out.n_sessions, out.n_users)) == {1: 1, 2: 1}


def test_oracle_minute_collision(ray_session):
    out = _oracle_check("events_minute_collision_audit",
                        tables=("events",))
    assert (out.n_in_collision <= out.n_events).all()
    assert (2 * out.n_collision_groups <= out.n_in_collision).all()


def test_minute_collision_hand_case(ray_session, tmp_path):
    # type a: 3 events in one minute + 1 alone -> 1 group, 3 inside
    # type b: 2 events in different minutes -> 0 groups
    import pyarrow as pa
    import pyarrow.parquet as pq

    M = 60_000_000
    pq.write_table(pa.table({
        "event_type": pa.array(["a", "a", "a", "a", "b", "b"]),
        "ts": pa.array([0, 10_000_000, 50_000_000, 2 * M,
                        0, 3 * M], pa.timestamp("us")),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["events_minute_collision_audit"](str(tmp_path))
    a = out[out.event_type == "a"].iloc[0]
    assert (a.n_events, a.n_in_collision,
            a.n_collision_groups) == (4, 3, 1)
    b = out[out.event_type == "b"].iloc[0]
    assert (b.n_events, b.n_in_collision,
            b.n_collision_groups) == (2, 0, 0)


def test_oracle_dominant_line(ray_session):
    out = _oracle_check("orders_dominant_line_share",
                        tables=("lineitem",))
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    no = con.execute(f"SELECT COUNT(DISTINCT l_orderkey) FROM "
                     f"'{SF}/lineitem.parquet'").fetchone()[0]
    assert out.n_orders.sum() == no


def test_oracle_nation_priority_l1(ray_session):
    out = _oracle_check("nation_priority_mix_l1",
                        tables=("orders", "customer"))
    # L1 of cross-multiplied mixes is bounded by 2 * tn * total
    total = out.n_orders.sum()
    assert (out.l1_cross <= 2 * out.n_orders * total).all()
    assert len(out) == 25


def test_oracle_return_by_discount(ray_session):
    out = _oracle_check("lineitem_return_by_discount",
                        tables=("lineitem",))
    assert (out.n_returned <= out.n_lines).all()
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/lineitem.parquet'").fetchone()[0]
    assert out.n_lines.sum() == n


def test_oracle_norm2_deciles(ray_session):
    out = _oracle_check("embeddings_norm2_deciles",
                        tables=("embeddings",))
    assert len(out) == 10 * 9  # 10 labels x 9 deciles
    for _, sub in out.groupby("label"):
        v = sub.sort_values("decile").n2_val.to_numpy()
        assert (np.diff(v) >= 0).all()
    assert (out.n2_val >= 0).all()


def test_oracle_balance_activity_corr(ray_session):
    out = _oracle_check("segment_balance_activity_corr",
                        tables=("orders", "customer"))
    con = duckdb.connect()
    nc = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/customer.parquet'").fetchone()[0]
    no = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/orders.parquet' WHERE o_custkey IN "
                     f"(SELECT c_custkey FROM "
                     f"'{SF}/customer.parquet')").fetchone()[0]
    assert out.n_customers.sum() == nc
    # sum_y counts each customer's orders once
    assert out.sum_y.sum() == no
    # Cauchy-Schwarz on the moments
    n = out.n_customers.to_numpy(np.int64)
    vx = n * out.sum_x2.to_numpy(np.int64) \
        - out.sum_x.to_numpy(np.int64) ** 2
    vy = n * out.sum_y2.to_numpy(np.int64) \
        - out.sum_y.to_numpy(np.int64) ** 2
    cxy = n * out.sum_xy.to_numpy(np.int64) \
        - out.sum_x.to_numpy(np.int64) * out.sum_y.to_numpy(np.int64)
    assert (cxy.astype(float) ** 2 <=
            vx.astype(float) * vy.astype(float) * (1 + 1e-12)).all()


def test_oracle_qoq_growth(ray_session):
    out = _oracle_check("orders_qoq_growth", tables=("orders",))
    # deltas telescope: sum of deltas = last - first revenue
    c = out.revenue_cents.to_numpy(np.int64)
    d = out.delta_cents.to_numpy(np.int64)
    assert d[0] == 0
    assert d[1:].sum() == c[-1] - c[0]
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/orders.parquet'").fetchone()[0]
    assert out.n_orders.sum() == n


def test_oracle_lang_purity(ray_session):
    out = _oracle_check("docs_source_lang_purity",
                        tables=("documents",))
    assert (out.top_n <= out.n_docs).all()
    assert (out.purity_pm <= 1000).all()
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/documents.parquet'").fetchone()[0]
    assert out.n_docs.sum() == nd


def test_oracle_first_last_matrix(ray_session):
    out = _oracle_check("users_first_last_type_matrix",
                        tables=("events",))
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu


def test_first_last_hand_case(ray_session, tmp_path):
    # user 1: a..b; user 2: c only (first == last == c)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 1, 2, 0], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["a", "c", "b", "c"]),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["users_first_last_type_matrix"](str(tmp_path))
    got = {(r.first_type, r.last_type): r.n_users
           for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("c", "c"): 1}


def test_oracle_weekly_rhythm(ray_session):
    out = _oracle_check("users_weekly_rhythm_hist",
                        tables=("events",))
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu
    # lag-7 pairs exist in the synthetic (non-vacuous)
    assert (out.band > 0).any()


def test_weekly_rhythm_hand_case(ray_session, tmp_path):
    # user 1: days [0, 7, 14] -> pairs 2 of 3 days -> 666 -> band 6
    # user 2: days [0, 3] -> 0 pairs -> band 0
    import pyarrow as pa
    import pyarrow.parquet as pq

    D = 86_400_000_000
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([0, 7 * D, 14 * D, 0, 3 * D],
                       pa.timestamp("us")),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["users_weekly_rhythm_hist"](str(tmp_path))
    assert dict(zip(out.band, out.n_users)) == {0: 1, 6: 1}


def test_oracle_unsold_parts(ray_session):
    out = _oracle_check("parts_unsold_census",
                        tables=("part", "lineitem"))
    # exactly the 30 planted re-listings are unsold
    assert out.n_unsold.sum() == 30
    con = duckdb.connect()
    np_ = con.execute(f"SELECT COUNT(*) FROM "
                      f"'{SF}/part.parquet'").fetchone()[0]
    assert out.n_parts.sum() == np_ + 30


def test_oracle_supplier_concentration(ray_session):
    out = _oracle_check("supplier_top_customer_share",
                        tables=("lineitem", "orders"))
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    ns = con.execute(f"""
        SELECT COUNT(DISTINCT l_suppkey) FROM
        '{SF}/lineitem.parquet' l
        WHERE EXISTS (SELECT 1 FROM '{SF}/orders.parquet' o
                      WHERE o.o_orderkey = l.l_orderkey)
    """).fetchone()[0]
    assert out.n_suppliers.sum() == ns


def test_oracle_prefix_depth(ray_session):
    out = _oracle_check("docs_prefix_depth_census",
                        tables=("documents",))
    assert set(out.depth).issubset({0, 4, 8, 16, 32})
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/documents.parquet'").fetchone()[0]
    assert out.n_docs.sum() == nd
    # synthetic template text shares prefixes (non-vacuous)
    assert out[out.depth > 0].n_docs.sum() > 0


def test_prefix_depth_hand_case(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["aaaabbbbccccdddd000", "aaaabbbbccccdddd111",
             "aaaaZZZZ", "zzzz"]
    # docs 0,1 share 16-prefix; doc 2 shares only 4 with them;
    # doc 3 shares nothing
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts),
    }), tmp_path / "documents.parquet")
    import __ray_entry__ as e

    out = e.queries()["docs_prefix_depth_census"](str(tmp_path))
    assert dict(zip(out.depth, out.n_docs)) == {0: 1, 4: 1, 16: 2}


def test_oracle_discount_spread(ray_session):
    out = _oracle_check("orders_discount_spread_hist",
                        tables=("lineitem",))
    assert (out.spread_pct >= 0).all()
    con = duckdb.connect()
    no = con.execute(f"SELECT COUNT(DISTINCT l_orderkey) FROM "
                     f"'{SF}/lineitem.parquet'").fetchone()[0]
    assert out.n_orders.sum() == no


def test_oracle_quant_digit(ray_session):
    out = _oracle_check("embeddings_quant_digit_uniformity",
                        tables=("embeddings",))
    assert out.digit.tolist() == list(range(10))
    con = duckdb.connect()
    n = con.execute(f"SELECT SUM(len(embedding)) FROM "
                    f"'{SF}/embeddings.parquet'").fetchone()[0]
    assert out.n.sum() == n


def test_oracle_negative_latency(ray_session):
    out = _oracle_check("lineitem_negative_latency",
                        tables=("lineitem", "orders"))
    assert (out.n_negative <= out.n_lines).all()
    # the synthetic genuinely ships before order dates somewhere
    assert out.n_negative.sum() > 0
    assert out.min_latency.min() < 0


def test_oracle_median_gap(ray_session):
    out = _oracle_check("users_median_gap_hist",
                        tables=("events",))
    con = duckdb.connect()
    nu = con.execute(f"""
        SELECT COUNT(*) FROM (SELECT user_id FROM
        '{SF}/events.parquet' GROUP BY 1 HAVING COUNT(*) >= 2)
    """).fetchone()[0]
    assert out.n_users.sum() == nu
    assert (out.band >= 0).all()


def test_median_gap_hand_case(ray_session, tmp_path):
    # user 1 gaps [10s, 30s, 1000s] -> lower median 30 -> band 4
    # (bin(31) has 5 digits); user 2 single event excluded
    import pyarrow as pa
    import pyarrow.parquet as pq

    S = 1_000_000
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10 * S, 40 * S, 1040 * S, 0],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["users_median_gap_hist"](str(tmp_path))
    assert dict(zip(out.band, out.n_users)) == {4: 1}


def test_oracle_hapax_presence(ray_session):
    out = _oracle_check("docs_hapax_presence_by_length",
                        tables=("documents",))
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/documents.parquet'").fetchone()[0]
    assert out.n_docs.sum() == nd
    assert out.has_hapax.isin([0, 1]).all()


def test_oracle_name_key_reconcile(ray_session):
    out = _oracle_check("customer_name_key_reconcile",
                        tables=("customer",))
    r = out.iloc[0]
    con = duckdb.connect()
    nc = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/customer.parquet'").fetchone()[0]
    # exactly the 10 planted rows mismatch; formats are all valid
    assert (r.n, r.n_format_bad, r.n_suffix_mismatch) == \
        (nc + 10, 0, 10)


def test_oracle_pair_novelty(ray_session):
    out = _oracle_check("partsupp_pair_novelty_monthly",
                        tables=("lineitem",))
    assert (out.n_pairs_new <= out.n_pairs_active).all()
    con = duckdb.connect()
    np_ = con.execute(f"""
        SELECT COUNT(*) FROM (SELECT DISTINCT l_suppkey, l_partkey
        FROM '{SF}/lineitem.parquet')
    """).fetchone()[0]
    # every pair is new exactly once
    assert out.n_pairs_new.sum() == np_
    # the first observed month is all-new
    assert out.n_pairs_new.iloc[0] == out.n_pairs_active.iloc[0]


def test_oracle_first_session_share(ray_session):
    out = _oracle_check("users_first_session_value_share",
                        tables=("events",))
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu


def test_first_session_share_hand_case(ray_session, tmp_path):
    # user 1: session A value 3.00, then gap 1h, session B 1.00
    # -> 300/400 = 750 -> band 7; user 2 all in one session -> 10
    import pyarrow as pa
    import pyarrow.parquet as pq

    S = 1_000_000
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 60 * S, 4000 * S, 0], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "value": pa.array([1.0, 2.0, 1.0, 5.0]),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["users_first_session_value_share"](
        str(tmp_path))
    assert dict(zip(out.band, out.n_users)) == {7: 1, 10: 1}


def test_oracle_emb_exact_dup(ray_session):
    out = _oracle_check("embeddings_exact_dup_census",
                        tables=("embeddings",))
    # the 10 planted copies + their originals are all dups
    assert out.n_dup_rows.sum() == 20
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/embeddings.parquet'").fetchone()[0]
    assert out.n_rows.sum() == n + 10


def test_oracle_support_hist(ray_session):
    out = _oracle_check("copurchase_support_hist",
                        tables=("lineitem",))
    assert (out.band >= 0).all()
    # band mass bound: counts in [2^b, 2^(b+1))
    b = out.band.to_numpy(np.int64)
    assert (out.n_pairs > 0).all()


def test_oracle_minute_residue(ray_session):
    out = _oracle_check("events_minute_residue_profile",
                        tables=("events",))
    assert out.residue.between(0, 9).all()
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n.sum() == n


def test_oracle_max_gap_share(ray_session):
    out = _oracle_check("users_max_gap_share_hist",
                        tables=("events",))
    # max gap is at least span/(n-1) >= span/n but never above span
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    nu = con.execute(f"""
        SELECT COUNT(*) FROM (
          SELECT user_id FROM '{SF}/events.parquet' GROUP BY 1
          HAVING COUNT(*) >= 2 AND MAX(ts) > MIN(ts))
    """).fetchone()[0]
    assert out.n_users.sum() == nu


def test_max_gap_share_hand_case(ray_session, tmp_path):
    # user 1: ts [0, 10, 100] -> span 100, max gap 90 -> band 9
    import pyarrow as pa
    import pyarrow.parquet as pq

    S = 1_000_000
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([0, 10 * S, 100 * S], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
    }), tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = e.queries()["users_max_gap_share_hist"](str(tmp_path))
    assert dict(zip(out.band, out.n_users)) == {9: 1}


def test_oracle_priority_diversity(ray_session):
    out = _oracle_check("customers_priority_diversity",
                        tables=("orders",))
    assert out.n_priorities.between(1, 5).all()
    con = duckdb.connect()
    nc = con.execute(f"SELECT COUNT(DISTINCT o_custkey) FROM "
                     f"'{SF}/orders.parquet'").fetchone()[0]
    assert out.n_customers.sum() == nc


def test_oracle_df_bands(ray_session):
    out = _oracle_check("tokens_df_bands", tables=("documents",))
    b = out.band.to_numpy(np.int64)
    assert (out.sum_df >= out.n_types * (1 << b)).all()
    assert (out.sum_df < out.n_types * (1 << (b + 1))).all()
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/documents.parquet'").fetchone()[0]
    # no word appears in more docs than exist
    assert (1 << int(out.band.max())) <= nd


def test_oracle_value_cv(ray_session):
    out = _oracle_check("users_value_cv_hist", tables=("events",))
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu
    assert (out.band >= 0).all()


def test_oracle_price_qty_inversions(ray_session):
    out = _oracle_check("lineitem_price_qty_inversions",
                        tables=("lineitem",))
    r = out.iloc[0]
    assert 0 <= r.n_inversions <= r.n_pairs
    assert r.n_pairs > 0


def test_inversions_hand_case(ray_session, tmp_path):
    # part 1: (q=1, ep=100), (q=2, ep=50), (q=3, ep=200):
    # pairs with q< : (1,2) inv, (1,3) ok, (2,3) ok -> 3 pairs 1 inv
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1], pa.int64()),
        "l_quantity": pa.array([1.0, 2.0, 3.0]),
        "l_extendedprice": pa.array([1.0, 0.5, 2.0]),
    }), tmp_path / "lineitem.parquet")
    import __ray_entry__ as e

    out = e.queries()["lineitem_price_qty_inversions"](str(tmp_path))
    r = out.iloc[0]
    assert (r.n_pairs, r.n_inversions) == (3, 1)


def test_oracle_dominant_type_value(ray_session):
    out = _oracle_check("users_dominant_type_value_share",
                        tables=("events",))
    assert out.band.between(0, 10).all()
    con = duckdb.connect()
    nu = con.execute(f"SELECT COUNT(DISTINCT user_id) FROM "
                     f"'{SF}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == nu


def test_oracle_lines_per_order_monthly(ray_session):
    out = _oracle_check("orders_lines_per_order_monthly",
                        tables=("lineitem", "orders"))
    con = duckdb.connect()
    no = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/orders.parquet'").fetchone()[0]
    nl = con.execute(f"""
        SELECT COUNT(*) FROM '{SF}/lineitem.parquet' l
        WHERE EXISTS (SELECT 1 FROM '{SF}/orders.parquet' o
                      WHERE o.o_orderkey = l.l_orderkey)
    """).fetchone()[0]
    assert out.n_orders.sum() == no
    assert out.n_lines.sum() == nl


def test_oracle_supplier_volume_cv(ray_session):
    out = _oracle_check("supplier_volume_cv_hist",
                        tables=("lineitem",))
    con = duckdb.connect()
    ns = con.execute(f"SELECT COUNT(DISTINCT l_suppkey) FROM "
                     f"'{SF}/lineitem.parquet'").fetchone()[0]
    assert out.n_suppliers.sum() == ns


def test_oracle_alphabet_coverage(ray_session):
    out = _oracle_check("docs_alphabet_coverage",
                        tables=("documents",))
    assert out.n_letters.between(0, 26).all()
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM "
                     f"'{SF}/documents.parquet'").fetchone()[0]
    assert out.n_docs.sum() == nd


def test_alphabet_coverage_hand_case(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["abcabc", "zzz", "123 !"]),
    }), tmp_path / "documents.parquet")
    import __ray_entry__ as e

    out = e.queries()["docs_alphabet_coverage"](str(tmp_path))
    assert dict(zip(out.n_letters, out.n_docs)) == {0: 1, 1: 1, 3: 1}
