"""top_k_by_score / exact_quantiles / chunk_documents vs scalar
references and the driver's DuckDB oracle forms."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _scored_ds(scores):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(scores)), type=pa.int64()),
        "score": pa.array(scores, type=pa.int64())})).materialize()


@pytest.mark.parametrize("seed,k", [(0, 10), (1, 57), (2, 200)])
def test_top_k_exact_with_ties(ray_session, seed, k):
    from verify_ray.pipelines.select import top_k_by_score

    rng = np.random.RandomState(seed)
    scores = rng.randint(0, 12, 200)  # heavy ties: boundary resolution
    out = (top_k_by_score(_scored_ds(scores), k=k).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    ref = (pd.DataFrame({"doc_id": np.arange(200), "score": scores})
           .sort_values(["score", "doc_id"], ascending=[False, True])
           .head(k).sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype("int64"), ref.astype("int64"))


def test_top_k_larger_than_input(ray_session):
    from verify_ray.pipelines.select import top_k_by_score

    out = top_k_by_score(_scored_ds([5, 3, 9]), k=10).to_pandas()
    assert len(out) == 3


@pytest.mark.parametrize("seed", [0, 3])
def test_exact_quantiles(ray_session, seed):
    from verify_ray.pipelines.select import exact_quantiles

    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 50, 333)
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"v": pa.array(vals, type=pa.int64())}))
    qs = [100, 500, 900, 1000]
    out = exact_quantiles(ds, "v", qs).to_pandas().set_index("q")["value"]
    sv = np.sort(vals)
    for q in qs:
        rank = (q * len(vals) + 999) // 1000
        assert out[q] == sv[rank - 1], q  # rank-th smallest (1-based)


def _chunk_ref(texts, window, stride):
    import re

    rows = []
    for i, t in enumerate(texts):
        ws = re.split(r"\s+", t.strip())
        for c, start in enumerate(range(0, len(ws), stride)):
            piece = ws[start:start + window]
            rows.append({"doc_id": i, "chunk_id": c,
                         "n_words": len(piece),
                         "chunk_text": " ".join(piece)})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("window,stride", [(4, 3), (4, 4), (100, 7), (1, 1)])
def test_chunk_matches_reference(ray_session, window, stride):
    import ray.data as rd

    from verify_ray.pipelines.chunk import chunk_documents

    texts = ["a b c d e f g h i j", "one two three", "solo", "",
             "  padded   whitespace  here  "]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))
    out = (chunk_documents(ds, window=window, stride=stride).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    ref = _chunk_ref(texts, window, stride)
    pd.testing.assert_frame_equal(
        out.astype({"chunk_id": "int64", "n_words": "int64"}), ref)


def test_chunk_overlap_invariant(ray_session):
    # stride < window: consecutive chunks share window-stride words
    import ray.data as rd

    from verify_ray.pipelines.chunk import chunk_documents

    text = " ".join(f"w{i}" for i in range(20))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                 "text": pa.array([text])}))
    out = (chunk_documents(ds, window=8, stride=5).to_pandas()
           .sort_values("chunk_id"))
    chunks = [c.split(" ") for c in out.chunk_text]
    for a, b in zip(chunks, chunks[1:]):
        assert a[5:] == b[:len(a) - 5]


def _oracle_check(name, tables=("documents",)):
    duckdb = __import__("duckdb")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()[name](sf).reset_index(drop=True)
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = con.execute(e.oracle_sql()[name]).df()
    ints = {c: "int64" for c in mine.columns
            if mine[c].dtype.kind in "iu"}
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)


def test_driver_top_quality_oracle(ray_session):
    _oracle_check("select_top_quality")


def test_driver_quantiles_oracle(ray_session):
    _oracle_check("stats_token_quantiles")


def test_driver_chunk_oracle(ray_session):
    _oracle_check("chunk_documents")
