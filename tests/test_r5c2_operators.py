"""Round-5 batch C2: k-core, association rules, gap moments, token
Pareto coverage — unit semantics + oracle parity at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

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


# ---- kcore --------------------------------------------------------------

def _edge_table(pairs):
    x, y = zip(*pairs)
    return pa.table({"x": pa.array(x, pa.int64()),
                     "y": pa.array(y, pa.int64())})


def test_kcore_peels_tail(ray_session):
    from verify_ray.pipelines.graph import kcore

    # triangle 1-2-3 plus a tail 3-4-5: 2-core = the triangle
    # (4 and 5 peel in two rounds), parallel edge 1-2 dedups
    t = _edge_table([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 1)])
    out = kcore(_ds(t), k=2)
    assert list(out.node) == [1, 2, 3]
    assert list(out.deg_core) == [2, 2, 2]


def test_kcore_empty_when_overpeeled(ray_session):
    from verify_ray.pipelines.graph import kcore

    t = _edge_table([(1, 2), (2, 3), (1, 3)])
    out = kcore(_ds(t), k=3)  # triangle has max degree 2
    assert len(out) == 0


def test_kcore_distributed_arm_matches_local(ray_session):
    from verify_ray.pipelines.graph import kcore

    rng = np.random.RandomState(7)
    x = rng.randint(0, 40, 300)
    y = rng.randint(0, 40, 300)
    keep = x != y
    t = pa.table({"x": pa.array(x[keep], pa.int64()),
                  "y": pa.array(y[keep], pa.int64())})
    local = kcore(_ds(t), k=4)
    dist = kcore(_ds(t), k=4, driver_budget_edges=0, num_buckets=4)
    pd.testing.assert_frame_equal(local, dist)


# ---- association_rules ---------------------------------------------------

def test_association_rules_exact_stats(ray_session):
    from verify_ray.pipelines.graph import association_rules

    # baskets: {1,2,3}, {1,2}, {2,3}, {1,2} -> pair (1,2) support 3,
    # (2,3) support 2, (1,3) support 1 (dropped at min_support=2)
    g = [10, 10, 10, 20, 20, 30, 30, 40, 40]
    i = [1, 2, 3, 1, 2, 2, 3, 1, 2]
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "i": pa.array(i, pa.int64())})
    out = association_rules(_ds(t), "g", "i", min_support=2,
                            num_buckets=4)
    assert list(out.x) == [1, 2] and list(out.y) == [2, 3]
    r12 = out.iloc[0]
    # c_1 = 3 baskets, c_2 = 4, c_12 = 3, N = 4
    assert (r12.c_ab, r12.c_x, r12.c_y) == (3, 3, 4)
    assert r12.conf_xy_pm == 1000 and r12.conf_yx_pm == 750
    assert (r12.lift_num, r12.lift_den) == (12, 12)  # lift exactly 1
    r23 = out.iloc[1]
    assert (r23.c_ab, r23.c_x, r23.c_y) == (2, 4, 2)
    assert (r23.lift_num, r23.lift_den) == (8, 8)


def test_association_rules_in_basket_repeat_counts_once(ray_session):
    from verify_ray.pipelines.graph import association_rules

    t = pa.table({"g": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "i": pa.array([5, 5, 6, 5, 6], pa.int64())})
    out = association_rules(_ds(t), "g", "i", min_support=2,
                            num_buckets=4)
    assert list(out.c_ab) == [2] and list(out.c_x) == [2]


# ---- gap_moments ---------------------------------------------------------

def test_gap_moments_floors_and_sums(ray_session):
    from verify_ray.pipelines.analytics import gap_moments

    us = [0, 1_500_000, 4_500_000]  # gaps 1.5s, 3.0s -> floored 1, 3
    t = pa.table({
        "user_id": pa.array([7, 7, 7, 8], pa.int64()),
        "ts": pa.array(us + [0], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64())})
    out = gap_moments(_ds(t))
    # user 8 has one event -> absent
    assert list(out.user_id) == [7]
    assert list(out.n_gaps) == [2]
    assert list(out.sum_gap_s) == [4]
    assert list(out.sum_gap2_s) == [10]


def test_gap_moments_tiebreak_by_event_id(ray_session):
    from verify_ray.pipelines.analytics import gap_moments

    # equal timestamps: order by event_id -> both gaps are 0
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([5, 5], pa.timestamp("us")),
        "event_id": pa.array([2, 1], pa.int64())})
    out = gap_moments(_ds(t))
    assert list(out.sum_gap_s) == [0] and list(out.n_gaps) == [1]


# ---- oracle parity -------------------------------------------------------

def test_oracle_kcore(ray_session):
    _oracle_check("graph_kcore")


def test_oracle_association_rules(ray_session):
    _oracle_check("copurchase_rules")


def test_oracle_gap_moments(ray_session):
    _oracle_check("events_gap_moments")


def test_oracle_tokens_pareto(ray_session):
    _oracle_check("tokens_pareto_coverage")
