"""grouped_count_distinct vs DuckDB COUNT(DISTINCT) — null values
ignored, null group its own group, and the driver oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_differential_vs_duckdb(ray_session):
    from verify_ray.pipelines.analytics import grouped_count_distinct

    rng = np.random.RandomState(5)
    n = 2000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", None], n),
        "v": pd.array(rng.randint(0, 40, n), dtype="Int64")})
    df.loc[df.index % 11 == 0, "v"] = None
    got = grouped_count_distinct(_ds(df), "g", "v", num_buckets=8)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT g, CAST(COUNT(DISTINCT v) AS BIGINT) AS n FROM t "
        "GROUP BY g ORDER BY g NULLS LAST").df()
    assert got.n.tolist() == exp.n.tolist()
    assert got.g.fillna("<null>").tolist() == exp.g.fillna("<null>").tolist()


def test_repeats_collapse_map_side(ray_session):
    from verify_ray.pipelines.analytics import grouped_count_distinct

    df = pd.DataFrame({"g": ["x"] * 1000 + ["y"] * 10,
                       "v": [1] * 1000 + list(range(10))})
    got = grouped_count_distinct(_ds(df), "g", "v", num_buckets=4)
    assert got.set_index("g").n.to_dict() == {"x": 1, "y": 10}


def test_driver_query_matches_oracle(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["users_per_event_type"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = con.execute(e.oracle_sql()["users_per_event_type"]).df()
    assert list(mine.columns) == list(orc.columns)
    pd.testing.assert_frame_equal(
        mine.astype({"n_users": "int64"}),
        orc.astype({"n_users": "int64"}), check_dtype=False)


def test_poisoned_duckdb_connection_recovers(ray_session):
    # a Ray task cancelled mid-execute leaves the per-worker cached
    # DuckDB connection unusable; the next call must rebuild it
    import hashlib

    import duckdb

    import verify_ray.functions.hashing as H

    H._DUCK = duckdb.connect()
    H._DUCK.execute("SET threads=1")
    H._DUCK.close()  # poison
    out = H.md5_u64le(pa.array(["a"]))
    assert out[0] == np.uint64(int.from_bytes(
        hashlib.md5(b"a").digest()[:8], "little"))


def test_grouped_having_count_differential(ray_session):
    from verify_ray.pipelines.analytics import grouped_having_count

    rng = np.random.RandomState(8)
    n = 3000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z", None], n),
        "b": pd.array(rng.randint(0, 6, n), dtype="Int64")})
    df.loc[df.index % 23 == 0, "b"] = None
    got = (grouped_having_count(_ds(df), ["a", "b"], min_count=100,
                                num_buckets=8)
           .to_pandas())
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM t "
        "GROUP BY a, b HAVING COUNT(*) >= 100").df()
    key = lambda d: sorted(
        (str(r.a), str(r.b), int(r.n)) for r in d.itertuples())
    assert len(got) == len(exp) and key(got) == key(exp)


def test_grouped_having_hot_key_one_row_per_block(ray_session):
    # a hot pair leaves each block as ONE partial row; counts still sum
    import ray.data as rd

    from verify_ray.pipelines.analytics import grouped_having_count

    t = pa.table({"a": ["hot"] * 5000 + ["cold"],
                  "b": [1] * 5000 + [2]})
    ds = rd.from_arrow(t).repartition(16)
    out = grouped_having_count(ds, ["a", "b"], min_count=2).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].a == "hot" and int(out.iloc[0].n) == 5000


def test_grouped_having_driver_oracle(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["hot_user_event_pairs"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = con.execute(e.oracle_sql()["hot_user_event_pairs"]).df()
    assert len(mine) == len(orc) and len(mine) > 0
    pd.testing.assert_frame_equal(
        mine.astype({"user_id": "int64", "n": "int64"}),
        orc.astype({"user_id": "int64", "n": "int64"}),
        check_dtype=False)
