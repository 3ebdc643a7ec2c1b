"""split_assign (deterministic named splits) and build_vocab /
encode_with_vocab (frequency vocabulary + OOV positional encode)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_split_covers_all_and_nests_with_hash_sample(ray_session):
    from verify_ray.pipelines.sample import hash_sample, split_assign

    df = pd.DataFrame({"doc_id": np.arange(3000, dtype=np.int64)})
    out = split_assign(_ds(df), {"train": 0.8, "val": 0.1, "test": 0.1}
                       ).to_pandas()
    assert len(out) == 3000 and out.split.notna().all()
    frac = out.split.value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    # nesting: a 10% hash_sample is a subset of... the FIRST range
    # (train), because both use the same bucket function
    sampled = hash_sample(_ds(df), rate=0.1).to_pandas().doc_id
    assert (out.set_index("doc_id").loc[sampled, "split"]
            == "train").all()


def test_split_null_key_gets_null_label(ray_session):
    from verify_ray.pipelines.sample import split_assign

    df = pd.DataFrame({"doc_id": pd.array([1, None], dtype="Int64")})
    out = split_assign(_ds(df), {"a": 0.5, "b": 0.5}).to_pandas()
    assert out.loc[out.doc_id.isna(), "split"].isna().all()
    assert out.loc[out.doc_id.notna(), "split"].notna().all()


def test_split_fractions_must_sum_to_one(ray_session):
    from verify_ray.pipelines.sample import split_assign

    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(_ds(pd.DataFrame({"doc_id": [1]})),
                     {"a": 0.5, "b": 0.4})


def test_vocab_rank_order_and_oov(ray_session):
    from verify_ray.pipelines.tokenize import (build_vocab,
                                               encode_with_vocab)

    df = pd.DataFrame({
        "doc_id": pa.array([1, 2, 3]).to_pylist(),
        "text": ["b b b a a c", "a b", "z q"]})
    vocab = build_vocab(_ds(df), size=3)
    # counts: b=4, a=3, c=1/z=1/q=1 -> ties by word asc: c wins rank 3
    assert vocab.column("word").to_pylist() == ["b", "a", "c"]
    assert vocab.column("id").to_pylist() == [1, 2, 3]
    enc = (encode_with_vocab(_ds(df), vocab).to_pandas()
           .set_index("doc_id"))
    # doc 1: words b b b a a c -> ids 1,1,1,2,2,3, checksum sum(pos*id)
    assert enc.loc[1, "checksum"] == 1*1 + 2*1 + 3*1 + 4*2 + 5*2 + 6*3
    assert enc.loc[1, "n_oov"] == 0
    # doc 3: both OOV
    assert enc.loc[3, "n_oov"] == 2 and enc.loc[3, "checksum"] == 0


@pytest.mark.parametrize("name,table", [
    ("split_documents", "documents"),
    ("vocab_encode", "documents"),
])
def test_driver_query_matches_oracle(ray_session, name, table):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()[name](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM '{sf}/{table}.parquet'")
    orc = con.execute(e.oracle_sql()[name]).df()
    assert list(mine.columns) == list(orc.columns)
    for c in mine.columns:
        if mine[c].dtype == object:
            assert mine[c].tolist() == orc[c].tolist(), c
        else:
            assert np.array_equal(mine[c].to_numpy(np.int64),
                                  orc[c].to_numpy(np.int64)), c


def test_encode_null_text_does_not_poison_block(ray_session):
    from verify_ray.pipelines.tokenize import (build_vocab,
                                               encode_with_vocab)

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a b", None, "a a"]})
    vocab = build_vocab(_ds(df.dropna()), size=2)
    enc = (encode_with_vocab(_ds(df), vocab).to_pandas()
           .set_index("doc_id"))
    assert 2 not in enc.index  # null text dropped
    # rows AFTER the null keep exact offsets: doc 3 = a a -> 1*1 + 2*1
    assert enc.loc[3, "checksum"] == 3 and enc.loc[3, "n_tok"] == 2
