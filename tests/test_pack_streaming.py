"""pack_sequences_streaming (two-phase, no per-group task
materialization) must equal pack_sequences exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.pipelines.pack import pack_sequences, pack_sequences_streaming


def _seqs(groups, ids, token_lists, blocks=1):
    import ray.data as rd

    t = pa.table({
        "source": pa.array(groups, type=pa.string()),
        "doc_id": pa.array(ids, type=pa.string()),
        "tokens": pa.array(token_lists, type=pa.list_(pa.int32())),
    })
    return rd.from_arrow(t).materialize().repartition(blocks)


@pytest.mark.parametrize("blocks,seq_len", [(1, 16), (5, 16), (3, 7)])
def test_streaming_equals_onepass(ray_session, blocks, seq_len):
    rng = np.random.default_rng(21)
    n = 120
    groups = [f"src{i % 4}" for i in range(n)]
    ids = [f"{i:04d}" for i in range(n)]
    toks = [rng.integers(0, 100, size=rng.integers(0, 40)).tolist()
            for _ in range(n)]
    ds = _seqs(groups, ids, toks, blocks)
    a = pack_sequences(ds, seq_len=seq_len).reset_index(drop=True)
    b = pack_sequences_streaming(ds, seq_len=seq_len).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.astype({"example_id": "int64", "n_tokens": "int64",
                  "token_sum": "int64"}),
        b.astype({"example_id": "int64", "n_tokens": "int64",
                  "token_sum": "int64"}))


def test_streaming_single_giant_group(ray_session):
    # one group dominating the corpus: the one-pass variant puts the
    # whole group in one task; the streaming one must not — but the
    # OUTPUT must be identical
    rng = np.random.default_rng(4)
    n = 200
    groups = ["big"] * n
    ids = [f"{i:04d}" for i in range(n)]
    toks = [rng.integers(0, 50, size=30).tolist() for _ in range(n)]
    ds = _seqs(groups, ids, toks, 8)
    a = pack_sequences(ds, seq_len=64)
    b = pack_sequences_streaming(ds, seq_len=64, num_buckets=16)
    pd.testing.assert_frame_equal(
        a.astype("object").reset_index(drop=True),
        b.astype("object").reset_index(drop=True))


def test_streaming_zero_token_docs(ray_session):
    ds = _seqs(["a", "a", "a"], ["0", "1", "2"], [[1, 2], [], [3]], 2)
    b = pack_sequences_streaming(ds, seq_len=2)
    assert b.n_tokens.tolist() == [2, 1]
    assert b.token_sum.tolist() == [3, 3]


def test_driver_pack_streaming_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["pack_sequences_streaming"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["pack_sequences_streaming"]).df()
    ints = {c: "int64" for c in ["example_id", "n_tokens", "token_sum"]}
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)
