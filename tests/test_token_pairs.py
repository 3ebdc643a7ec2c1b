"""tokenize.token_pair_topk (BPE merge-candidate scan) vs a scalar
reference and the driver's DuckDB oracle."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.pipelines.tokenize import token_pair_topk


def _seqs_ds(token_lists, blocks=1):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(token_lists))]),
        "tokens": pa.array(token_lists, type=pa.list_(pa.int32())),
    })
    return rd.from_arrow(t).repartition(blocks)


def _brute(token_lists, k, min_count=1):
    cnt = Counter()
    for toks in token_lists:
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] += 1
    rows = [(a, b, c) for (a, b), c in cnt.items() if c >= min_count]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return pd.DataFrame(rows[:k], columns=["tok_a", "tok_b", "cnt"])


@pytest.mark.parametrize("blocks", [1, 6])
def test_pair_counts_match_brute(ray_session, blocks):
    rng = np.random.default_rng(11)
    docs = [rng.integers(0, 6, size=rng.integers(0, 25)).tolist()
            for _ in range(60)]
    got = token_pair_topk(_seqs_ds(docs, blocks), k=20)
    want = _brute(docs, k=20)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), want.astype("int64"))


def test_tie_break_is_total_order(ray_session):
    # every pair occurs exactly once: cutoff decided by (tok_a, tok_b)
    docs = [[5, 1], [4, 2], [3, 3], [2, 4], [1, 5]]
    got = token_pair_topk(_seqs_ds(docs), k=3)
    want = _brute(docs, k=3)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_min_count_and_empty(ray_session):
    docs = [[1, 2, 1, 2, 9], [7], []]
    got = token_pair_topk(_seqs_ds(docs), k=10, min_count=2)
    want = _brute(docs, k=10, min_count=2)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    empty = token_pair_topk(_seqs_ds([[3], []]), k=5)
    assert list(empty.columns) == ["tok_a", "tok_b", "cnt"]
    assert len(empty) == 0


def test_driver_token_pair_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["token_pair_topk"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["token_pair_topk"]).df()
    assert len(mine) == 50
    pd.testing.assert_frame_equal(mine.astype("int64"),
                                  orc.astype("int64"), check_dtype=False)
