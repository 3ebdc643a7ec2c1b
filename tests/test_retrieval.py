"""retrieval.bm25_topk vs a scalar reference, the conventional
log-idf BM25, and the driver's DuckDB oracle."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.pipelines.retrieval import (SCALE, bm25_float_score,
                                            bm25_topk, corpus_term_stats)


def _docs_ds(texts, blocks=1):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([f"{i:03d}" for i in range(len(texts))]),
        "text": pa.array(texts, type=pa.string()),
    })
    return rd.from_arrow(t).repartition(blocks)


def _brute(texts, terms, k):
    """Scalar reference of the integer scoring contract."""
    split = [t.strip().split() if t.strip() else [""] for t in texts]
    # NB: python split() on all-whitespace gives [], engine/SQL give
    # [''] — the test corpus avoids all-whitespace texts
    D = len(split)
    A = sum(len(ws) for ws in split)
    rows = []
    for i, ws in enumerate(split):
        dl = len(ws)
        L = (10 * dl * D) // A
        score, n_match = 0, 0
        for term in sorted(set(terms)):
            tf = ws.count(term)
            if tf == 0:
                continue
            df = sum(1 for w2 in split if term in w2)
            idf = (SCALE * (2 * (D - df) + 1)) // (2 * df + 1)
            score += idf * ((220 * SCALE * tf) // (100 * tf + 30 + 9 * L))
            n_match += 1
        if n_match:
            rows.append((f"{i:03d}", n_match, dl, score))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return pd.DataFrame(rows[:k],
                        columns=["doc_id", "n_match", "dl", "score"])


TEXTS = [
    "alpha beta gamma alpha",
    "beta beta beta delta",
    "gamma delta epsilon",
    "alpha alpha alpha alpha beta",
    "zeta eta theta",
    "beta gamma",
    "plain filler words here only",
]


@pytest.mark.parametrize("blocks", [1, 4])
def test_bm25_matches_brute(ray_session, blocks):
    terms = ["alpha", "beta", "gamma"]
    got = bm25_topk(_docs_ds(TEXTS, blocks), terms, k=5)
    want = _brute(TEXTS, terms, k=5)
    pd.testing.assert_frame_equal(
        got.astype({"n_match": "int64", "dl": "int64", "score": "int64"}),
        want.astype({"n_match": "int64", "dl": "int64", "score": "int64"}))


def test_corpus_term_stats(ray_session):
    D, A, df = corpus_term_stats(_docs_ds(TEXTS, 3), ["alpha", "beta", "nope"])
    assert D == len(TEXTS)
    assert A == sum(len(t.split()) for t in TEXTS)
    assert df == {"alpha": 2, "beta": 4, "nope": 0}


def test_single_term_ranking_matches_log_idf(ray_session):
    # for ONE term, the rational idf is a positive constant, so the
    # integer ranking must equal conventional log-idf BM25 ranking
    terms = ["beta"]
    got = bm25_topk(_docs_ds(TEXTS), terms, k=10)
    split = [t.split() for t in TEXTS]
    D = len(split)
    A = sum(len(ws) for ws in split)
    df = sum(1 for ws in split if "beta" in ws)
    ref = []
    for i, ws in enumerate(split):
        s = bm25_float_score(ws.count("beta"), df, len(ws), D, A)
        if s != 0.0:
            ref.append((f"{i:03d}", s))
    ref.sort(key=lambda r: (-r[1], r[0]))
    assert got.doc_id.tolist() == [d for d, _ in ref]


def test_no_match_and_unknown_terms(ray_session):
    out = bm25_topk(_docs_ds(TEXTS), ["nonexistent"], k=5)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_match", "dl", "score"]


def test_driver_bm25_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["bm25_topk"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["bm25_topk"]).df()
    assert len(mine) == 20
    ints = {c: "int64" for c in ["n_match", "dl", "score"]}
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)
