"""canonical_filter (keep-best per near-dup cluster): unit semantics,
default distinct-word score parity, and the driver oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows))


def _ids(out_ds):
    return sorted(out_ds.to_pandas().doc_id.astype(int))


def test_keeps_best_scorer_per_group(ray_session):
    from verify_ray.pipelines.dedup import canonical_filter

    ds = _ds({"doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
              "text": ["a b c", "a b c d e", "a", "x y", "q"]})
    groups = pd.DataFrame({"doc_id": [1, 2, 3], "group_id": [1, 1, 1]})
    # doc 2 has the most distinct words -> wins; 4 and 5 are outside
    # the group and pass through
    assert _ids(canonical_filter(ds, groups)) == [2, 4, 5]


def test_tie_breaks_to_min_id(ray_session):
    from verify_ray.pipelines.dedup import canonical_filter

    ds = _ds({"doc_id": pa.array([7, 3, 9], type=pa.int64()),
              "text": ["a b", "c d", "e f"]})
    groups = pd.DataFrame({"doc_id": [7, 3, 9],
                           "group_id": [3, 3, 3]})
    assert _ids(canonical_filter(ds, groups)) == [3]


def test_empty_groups_passthrough(ray_session):
    from verify_ray.pipelines.dedup import canonical_filter

    ds = _ds({"doc_id": pa.array([1, 2], type=pa.int64()),
              "text": ["a", "b"]})
    out = canonical_filter(ds, pd.DataFrame({"doc_id": [], "group_id": []}))
    assert _ids(out) == [1, 2]


def test_distinct_word_count_matches_duckdb(ray_session):
    from verify_ray.pipelines.dedup import _distinct_word_count

    texts = ["a b a c", "  x  ", "one two two three three three",
             "solo", "a a a a"]
    t = pa.table({"text": texts})
    got = _distinct_word_count(t, "text").tolist()
    exp = duckdb.sql(
        "SELECT len(list_distinct(regexp_split_to_array(trim(text), "
        "'\\s+'))) FROM (SELECT unnest($1) AS text)",
        params=[texts]).fetchall()
    assert got == [r[0] for r in exp]


def test_driver_query_matches_oracle(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["dedup_canonical"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["dedup_canonical"]).df()
    assert len(mine) == len(orc)
    assert np.array_equal(mine.doc_id.to_numpy(np.int64),
                          orc.doc_id.to_numpy(np.int64))
    # the planted "+ extra tail" copies should mostly WIN their
    # clusters (two extra distinct words) — a doc already containing
    # "extra"/"tail" ties and loses to the smaller original id
    assert int((mine.doc_id >= 1_000_000).sum()) >= 15
