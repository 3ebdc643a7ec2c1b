"""Round-5 batch B operators: n-gram novelty — unit semantics +
the driver oracle at sf0.001."""

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


# ---- ngram_novelty ----------------------------------------------------------

def test_ngram_novelty_first_doc_credits(ray_session):
    from verify_ray.pipelines.text import ngram_novelty

    t = pa.table({
        "doc_id": pa.array([3, 1, 2, 4], type=pa.int64()),
        "text": ["a b c d",        # grams: "a b c", "b c d" (doc 3)
                 "a b c",          # gram "a b c" first appears in doc 1
                 "x y",            # < 3 words -> no grams, no row
                 "b c d e"]})      # "b c d" credited to doc 3, "c d e" new
    out = ngram_novelty(_ds(t), n=3)
    assert list(out.doc_id) == [1, 3, 4]
    # doc 1: 1 gram, novel (min doc_id for "a b c" is 1)
    # doc 3: 2 grams, "b c d" novel here (3 < 4), "a b c" not (1 < 3)
    # doc 4: 2 grams, only "c d e" novel
    assert list(out.n_grams) == [1, 2, 2]
    assert list(out.n_novel) == [1, 1, 1]


def test_ngram_novelty_within_doc_distinct(ray_session):
    from verify_ray.pipelines.text import ngram_novelty

    t = pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "text": ["a b a b a b"]})  # grams: "a b a","b a b","a b a","b a b"
    out = ngram_novelty(_ds(t, blocks=1), n=3)
    assert list(out.n_grams) == [2]       # distinct within the doc
    assert list(out.n_novel) == [2]


def test_ngram_novelty_nulls_and_empty(ray_session):
    from verify_ray.pipelines.text import ngram_novelty

    t = pa.table({
        "doc_id": pa.array([1, None, 2], type=pa.int64()),
        "text": [None, "a b c", "  "]})
    out = ngram_novelty(_ds(t), n=3)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_grams", "n_novel"]


def test_ngram_novelty_oracle(ray_session):
    _oracle_check("docs_ngram_novelty", tables=("documents",))
