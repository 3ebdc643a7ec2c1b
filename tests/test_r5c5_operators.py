"""Round-5 batch C5: local clustering, simhash bit balance, Lorenz
points, monthly seasonality — unit semantics + oracle at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def _oracle_check(name, tables=("events", "documents", "lineitem",
                                "orders")):
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


# ---- local_clustering -------------------------------------------------------

def _edges(pairs):
    x, y = zip(*pairs)
    return pa.table({"src": pa.array(x, pa.int64()),
                     "dst": pa.array(y, pa.int64())})


def test_local_clustering_counts_per_node(ray_session):
    from verify_ray.pipelines.graph import local_clustering

    # K4 minus edge (3,4): triangles (1,2,3) and (1,2,4).
    # node 1: 2 triangles, node 3: 1; degrees 3,3,2,2
    t = _edges([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])
    out = local_clustering(_ds(t), num_buckets=4)
    assert list(out.node) == [1, 2, 3, 4]
    assert list(out.deg) == [3, 3, 2, 2]
    assert list(out.n_tri) == [2, 2, 1, 1]


def test_local_clustering_triangle_free(ray_session):
    from verify_ray.pipelines.graph import local_clustering

    t = _edges([(1, 2), (2, 3), (3, 4)])  # a path
    out = local_clustering(_ds(t), num_buckets=4)
    assert list(out.n_tri) == [0, 0, 0, 0]


def test_local_clustering_matches_global_triangles(ray_session):
    from verify_ray.pipelines.graph import local_clustering, triangle_count

    rng = np.random.RandomState(11)
    x = rng.randint(0, 30, 200)
    y = rng.randint(0, 30, 200)
    keep = x != y
    t = pa.table({"src": pa.array(x[keep], pa.int64()),
                  "dst": pa.array(y[keep], pa.int64())})
    local = local_clustering(_ds(t), num_buckets=4)
    glob = triangle_count(_ds(t), num_buckets=4)
    # Σ per-node counts = 3 × #triangles
    assert int(local.n_tri.sum()) == 3 * int(glob.n_triangles.iloc[0])


# ---- lorenz_points ----------------------------------------------------------

def test_lorenz_points_grid(ray_session):
    from verify_ray.pipelines.analytics import lorenz_points

    # 10 users with counts 1..10 (user k has k events): at decile d,
    # cum_users = d, cum_events = d(d+1)/2
    rows = [u for u in range(1, 11) for _ in range(u)]
    t = pa.table({"user_id": pa.array(rows, pa.int64())})
    out = lorenz_points(_ds(t))
    assert list(out.decile) == list(range(1, 11))
    assert list(out.cum_users) == list(range(1, 11))
    assert list(out.cum_events) == [d * (d + 1) // 2
                                    for d in range(1, 11)]


# ---- oracle parity ----------------------------------------------------------

def test_oracle_local_clustering(ray_session):
    _oracle_check("graph_local_clustering")


def test_oracle_bit_balance(ray_session):
    _oracle_check("simhash_bit_balance")


def test_oracle_lorenz(ray_session):
    _oracle_check("users_lorenz_points")


def test_oracle_seasonality(ray_session):
    _oracle_check("orders_monthly_seasonality")
