"""Round-5 batch D1: postings gamma-bit audit, frequent triples,
nation revenue share — oracle parity at sf0.001 plus semantic spot
checks (gamma cost identity, triple support recount)."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
ALL_TABLES = ("documents", "lineitem", "orders", "customer",
              "nation", "region")


def _oracle_check(name, tables=ALL_TABLES):
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


def test_oracle_postings_gamma(ray_session):
    out = _oracle_check("postings_gamma_bits")
    assert len(out) > 0
    # gamma cost identity: a df-1 list whose every gap is 1 plus the
    # first posting costs exactly (df-1)*1 + 2*bitlen(first+1)-1 only
    # for dense terms; generic invariant: bits >= df (every gap costs
    # >= 1 bit) and bits <= df * (2*64 - 1)
    assert (out.gamma_bits >= out.df).all()
    assert (out.gamma_bits < out.df * 127).all()
    assert (out.max_gap >= 1).all()


def test_oracle_frequent_triples(ray_session):
    out = _oracle_check("lineitem_frequent_triples")
    assert len(out) > 0  # planted skewed parts co-occur
    assert (out.item_a < out.item_b).all()
    assert (out.item_b < out.item_c).all()
    assert (out.support >= 2).all()


def test_frequent_triples_recount(ray_session):
    # recount one reported triple's support straight off the table
    import __ray_entry__ as e

    out = e.queries()["lineitem_frequent_triples"](SF)
    row = out.iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    baskets = (li.drop_duplicates()
               .groupby("l_orderkey").l_partkey.apply(set))
    baskets = baskets[baskets.map(len).between(3, 64)]
    n = sum(1 for s in baskets
            if {row.item_a, row.item_b, row.item_c} <= s)
    assert n == row.support


def test_oracle_revenue_share(ray_session):
    out = _oracle_check("revenue_share_nation")
    assert len(out) > 0
    # shares within a region sum to <= 1000 (floor rounding) and
    # > 1000 - n_nations (floor loses < 1 permille per nation)
    g = out.groupby("r_name").share_pm
    assert (g.sum() <= 1000).all()
    assert ((g.sum() + g.count()) > 1000).all()


def test_oracle_readability(ray_session):
    out = _oracle_check("docs_readability")
    assert len(out) > 0
    assert (out.n_words >= out.n_docs).all()


def test_oracle_daily_dispersion(ray_session):
    import __ray_entry__ as e

    out = _oracle_check("events_daily_dispersion",
                        tables=("events",))
    # Cauchy-Schwarz on integer moments: n*sum_cnt2 >= sum_cnt^2
    assert (out.n_days * out.sum_cnt2 >= out.sum_cnt ** 2).all()
    # total events recounted straight off the table
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    assert out.sum_cnt.sum() == ev.ts.notna().sum()


def test_oracle_unit_price_spread(ray_session):
    out = _oracle_check("part_unit_price_spread",
                        tables=("lineitem",))
    assert len(out) > 0
    assert (out.spread_pm == out.max_up_pm - out.min_up_pm).all()
    assert (out.n_lines >= 2).all()


def test_oracle_link_prediction(ray_session):
    out = _oracle_check("copurchase_link_prediction",
                        tables=("lineitem",))
    assert len(out) > 0
    assert (out.u < out.v).all()
    assert (out.n_common >= 2).all()


def test_link_prediction_non_adjacent(ray_session):
    # every reported pair must NOT be a direct co-purchase edge
    import __ray_entry__ as e

    out = e.queries()["copurchase_link_prediction"](SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    li = li[(li.l_partkey & 3) == 0]
    m = li.merge(li, on="l_orderkey")
    edges = set(zip(np.minimum(m.l_partkey_x, m.l_partkey_y),
                    np.maximum(m.l_partkey_x, m.l_partkey_y)))
    assert all((u, v) not in edges
               for u, v in zip(out.u, out.v))


def test_oracle_growth_runs(ray_session):
    out = _oracle_check("events_growth_runs", tables=("events",))
    assert len(out) > 0
    assert (out.longest_run >= 1).all()
    assert (out.longest_run <= out.n_days).all()


def test_oracle_quantized_dot_hist(ray_session):
    out = _oracle_check("embeddings_quantized_dot_hist",
                        tables=("embeddings",))
    assert len(out) > 0
    assert out.n_pairs.sum() >= 2
    # bin boundaries: min/max dots of each bin live inside it
    assert (out.min_dot >= out.bin * 250_000).all()
    assert (out.max_dot < (out.bin + 1) * 250_000).all()


def test_oracle_label_centroids(ray_session):
    out = _oracle_check("embeddings_label_centroids",
                        tables=("embeddings",))
    assert len(out) > 0
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    assert out.n_vecs.sum() == emb.label.notna().sum()


def test_oracle_ship_delay(ray_session):
    out = _oracle_check("orders_ship_delay_hist",
                        tables=("lineitem", "orders"))
    assert len(out) > 0
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey"])
    assert out.n.sum() == len(li)  # every lineitem has an order


def test_oracle_cohort_ltv(ray_session):
    out = _oracle_check("events_cohort_ltv", tables=("events",))
    assert len(out) > 0
    # offset 0 of each cohort contains that cohort's first events
    assert (out[out.week_offset == 0].n_users > 0).all()
    # users never exceed events in a cell
    assert (out.n_users <= out.n_events).all()


def test_oracle_double_submit(ray_session):
    out = _oracle_check("orders_double_submit", tables=("orders",))
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey"])
    n_planted = (orders.o_orderkey % 97 == 0).sum()
    # at least every planted twin is found (organic dups may add)
    assert len(out) >= n_planted > 0
    assert (out.day_gap <= 7).all()
    assert (out.id_a < out.id_b).all()


def test_oracle_survival_gaps(ray_session):
    out = _oracle_check("events_survival_gaps", tables=("events",))
    assert len(out) > 0
    # censored count == number of distinct purchasing users (each
    # user contributes exactly one censored duration)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    n_users = ev[ev.event_type == "purchase"].user_id.nunique()
    assert out.n_censored.sum() == n_users


def test_oracle_distinctive_terms(ray_session):
    out = _oracle_check("docs_distinctive_terms",
                        tables=("documents",))
    assert len(out) > 0
    assert (out.groupby("lang").word.count() <= 10).all()
    assert (out.c >= 5).all()


def test_oracle_brand_cumulative(ray_session):
    out = _oracle_check("brand_monthly_cumulative",
                        tables=("lineitem", "part"))
    assert len(out) > 0
    # running total ends at the brand's total
    last = out.groupby("p_brand").tail(1)
    tot = out.groupby("p_brand", as_index=False).qty_pm.sum()
    m = last.merge(tot, on="p_brand")
    assert (m.cum_qty_pm == m.qty_pm_y).all()


def test_oracle_return_rate(ray_session):
    out = _oracle_check("nation_return_rate_monthly",
                        tables=("lineitem", "orders", "customer",
                                "nation"))
    assert len(out) > 0
    assert (out.ret_rate_pm <= 1000).all()
    assert (out.n_returned <= out.n_lines).all()


def test_oracle_key_density(ray_session):
    out = _oracle_check("orders_key_density_audit",
                        tables=("orders",))
    assert len(out) > 0
    assert (out.n_missing >= 0).all()
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey"])
    assert out.n_present.sum() == len(orders)


def test_oracle_markup_audit(ray_session):
    out = _oracle_check("docs_markup_audit", tables=("documents",))
    assert len(out) > 0
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id"])
    n_planted = (docs.doc_id % 13 == 0).sum()
    # the corpus itself is clean: counts == planted occurrences
    # only the opening tag matches <[a-zA-Z]...> (</b> starts '</')
    assert out.n_tags.sum() == n_planted
    assert out.n_urls.sum() == n_planted
    assert out.n_ticks.sum() == 2 * n_planted


def test_oracle_dim_stats(ray_session):
    out = _oracle_check("embeddings_dim_stats",
                        tables=("embeddings",))
    assert len(out) == 64  # fixed embedding width
    assert (out.n == out.n.iloc[0]).all()
    assert (out.min_q <= out.max_q).all()


def test_oracle_supplier_switches(ray_session):
    out = _oracle_check("part_supplier_switches",
                        tables=("lineitem",))
    assert len(out) > 0
    # switches happen only where >1 supplier exists, and are bounded
    # by adjacency count
    assert (out[out.n_suppliers == 1].n_switches == 0).all()
    assert (out.n_switches <= out.n_lines - 1).all()


def test_oracle_priority_mix(ray_session):
    out = _oracle_check("orders_priority_mix_monthly",
                        tables=("orders",))
    assert len(out) > 0
    g = out.groupby("mon").share_pm
    assert (g.sum() <= 1000).all()
    assert ((g.sum() + g.count()) > 1000).all()


def test_oracle_inventory_balance(ray_session):
    out = _oracle_check("part_inventory_balance",
                        tables=("lineitem",))
    assert len(out) > 0
    assert (out.min_bal <= out.final_bal).all()
    # every part's timeline starts with one move, so min <= first
    # signed quantity <= 50 and n_moves >= 1
    assert (out.n_moves >= 1).all()
    assert (out.min_bal <= 50).all()


def test_inventory_balance_recount(ray_session):
    # recount one part's balance straight off the table
    import __ray_entry__ as e

    out = e.queries()["part_inventory_balance"](SF)
    row = out.iloc[len(out) // 2]
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_returnflag",
                 "l_shipdate", "l_orderkey", "l_linenumber"])
    li = li[li.l_partkey == row.l_partkey].copy()
    li["d"] = li.l_shipdate.astype("datetime64[us]").astype(
        "int64") // 86_400_000_000
    li = li.sort_values(["d", "l_orderkey", "l_linenumber"])
    q = np.rint(li.l_quantity.to_numpy()).astype(np.int64)
    q = np.where(li.l_returnflag.to_numpy() == "R", -q, q)
    bal = np.cumsum(q)
    assert row.n_moves == len(li)
    assert row.final_bal == bal[-1]
    assert row.min_bal == bal.min()
    assert row.min_day == li.d.to_numpy()[int(np.argmin(bal))]


def test_oracle_weekday_month_lift(ray_session):
    out = _oracle_check("orders_weekday_month_lift",
                        tables=("orders",))
    assert len(out) > 0
    assert out.dow.between(0, 6).all()
    assert out.moy.between(1, 12).all()
    # floored expectation never exceeds the larger marginal
    assert (out.expected_f >= 0).all()
    # lift is centered around 1000 under independence
    assert out.lift_pm.median() > 500
    assert out.lift_pm.median() < 2000


def test_oracle_price_reconcile(ray_session):
    out = _oracle_check("orders_price_reconcile",
                        tables=("orders", "lineitem"))
    assert len(out) > 0
    assert (out.n == out.n_over + out.n_under + out.n_exact).all()
    assert (out.max_abs_diff >= 0).all()
    # only orders having at least one line are audited
    con = duckdb.connect()
    con.execute(f"CREATE VIEW o AS SELECT * FROM "
                f"'{SF}/orders.parquet'")
    con.execute(f"CREATE VIEW l AS SELECT * FROM "
                f"'{SF}/lineitem.parquet'")
    n_with = con.execute(
        "SELECT COUNT(DISTINCT o_orderkey) FROM o JOIN l "
        "ON o_orderkey = l_orderkey").fetchone()[0]
    assert out.n.sum() == n_with
