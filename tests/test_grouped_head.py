"""grouped_head (per-group first-k cap) vs DuckDB ROW_NUMBER
differential — multi-column groups, nulls dropped, k larger than a
group, timestamp order columns, and the driver oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _run(df, **kw):
    from verify_ray.pipelines.select import grouped_head

    out = grouped_head(_ds(df), **kw).to_pandas()
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def test_differential_vs_duckdb(ray_session):
    rng = np.random.RandomState(11)
    n = 800
    df = pd.DataFrame({
        "g1": rng.choice(["a", "b", "c", None], n),
        "g2": pd.array(rng.randint(0, 4, n), dtype="Int64"),
        "rid": np.arange(n, dtype=np.int64),  # unique order col
        "payload": rng.randint(0, 100, n).astype(np.int64)})
    df.loc[df.index % 19 == 0, "g2"] = None
    got = _run(df, group_cols=["g1", "g2"], k=5, order_col="rid",
               values=["rid", "g1", "payload"], num_buckets=8)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT rid, g1, payload FROM (
          SELECT rid, g1, payload,
                 ROW_NUMBER() OVER (PARTITION BY g1, g2
                                    ORDER BY rid) AS rn
          FROM t WHERE g1 IS NOT NULL AND g2 IS NOT NULL
            AND rid IS NOT NULL)
        WHERE rn <= 5
    """).df().sort_values(["rid", "g1", "payload"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"rid": "int64", "payload": "int64"}), exp,
        check_dtype=False)


def test_k_exceeds_group_size_keeps_all(ray_session):
    df = pd.DataFrame({"g": ["x", "x", "y"], "rid": [2, 1, 3]})
    got = _run(df, group_cols=["g"], k=10, order_col="rid",
               values=["rid", "g"], num_buckets=4)
    assert len(got) == 3


def test_timestamp_order_column(ray_session):
    ts = pd.to_datetime(["2024-01-03", "2024-01-01", "2024-01-02",
                         "2024-01-04"])
    df = pd.DataFrame({"g": ["x", "x", "x", "y"], "ts": ts,
                       "rid": [0, 1, 2, 3]})
    got = _run(df, group_cols=["g"], k=2, order_col="ts",
               values=["rid"], num_buckets=4)
    # x keeps its two earliest (rid 1, 2); y keeps its only row
    assert sorted(got.rid.astype(int)) == [1, 2, 3]


def test_hot_group_across_many_blocks(ray_session):
    # one 10k-row group scattered over 16 blocks: the map-side pre-cap
    # ships at most k rows per block, and the global first-k survives
    import ray.data as rd

    from verify_ray.pipelines.select import grouped_head

    rng = np.random.RandomState(2)
    rid = rng.permutation(10_000).astype(np.int64)  # shuffled order col
    t = pa.table({"g": pa.array(["hot"] * 10_000),
                  "rid": pa.array(rid)})
    ds = rd.from_arrow(t).repartition(16)
    out = grouped_head(ds, ["g"], k=3, order_col="rid",
                       values=["rid"], num_buckets=4).to_pandas()
    assert sorted(out.rid.astype(int)) == [0, 1, 2]


def test_driver_query_matches_oracle(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["docs_per_source_cap"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["docs_per_source_cap"]).df()
    assert list(mine.columns) == list(orc.columns)
    pd.testing.assert_frame_equal(
        mine.astype({"doc_id": "int64"}),
        orc.astype({"doc_id": "int64"}), check_dtype=False)


def test_grouped_sample_k_nested_and_oracle(ray_session):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e
    from verify_ray.pipelines.select import grouped_sample_k

    sf = "/root/testdata/sf0.001"
    mine = (e.queries()["docs_sample_per_lang"](sf)
            .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["docs_sample_per_lang"]).df()
    assert mine.doc_id.tolist() == orc.doc_id.tolist()
    assert mine.lang.tolist() == orc.lang.tolist()
    # nesting: the k=3 sample is a subset of the k=5 sample
    import pyarrow.parquet as pq_

    t = pq_.read_table(f"{sf}/documents.parquet",
                       columns=["doc_id", "lang"])
    small = (grouped_sample_k(rd.from_arrow(t), ["lang"], k=3)
             .to_pandas())
    assert set(small.doc_id).issubset(set(mine.doc_id))


def test_float_order_column_rejected(ray_session):
    from verify_ray.pipelines.select import grouped_head

    df = pd.DataFrame({"g": ["x", "x"], "score": [2.0, 10.0],
                       "rid": [0, 1]})
    with pytest.raises(Exception, match="unsupported"):
        grouped_head(_ds(df), ["g"], k=1, order_col="score",
                     values=["rid"], num_buckets=2).to_pandas()


def test_sample_k_drops_null_keys(ray_session):
    from verify_ray.pipelines.select import grouped_sample_k

    df = pd.DataFrame({"doc_id": pd.array([1, 2, None, None],
                                          dtype="Int64"),
                       "lang": ["en"] * 4})
    out = grouped_sample_k(_ds(df), ["lang"], k=10).to_pandas()
    assert sorted(out.doc_id.astype(int)) == [1, 2]
