"""Bigram-LM perplexity scoring vs a scalar reference + the SQL
oracle form (integer features exact; floats vs numpy reference)."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tok(t):
    return re.split(r"\s+", t.strip())


def _ref(texts_model, texts_score, ids, min_count=2, alpha=0.1):
    c1, c2 = Counter(), Counter()
    for t in texts_model:
        ws = _tok(t)
        c1.update(ws)
        c2.update(zip(ws, ws[1:]))
    c2 = {k: v for k, v in c2.items() if v >= min_count}
    V = len(c1) + 1
    rows = []
    for i, t in zip(ids, texts_score):
        ws = _tok(t)
        bigs = list(zip(ws, ws[1:]))
        lp = 0.0
        sb = sc = oov = 0
        for v, w in bigs:
            cb, cc = c2.get((v, w), 0), c1.get(v, 0)
            sb += cb
            sc += cc
            oov += cb == 0
            lp += np.log((cb + alpha) / (cc + alpha * V))
        rows.append({
            "doc_id": i, "n_tok": len(ws), "n_big": len(bigs),
            "sum_big_cnt": sb, "sum_ctx_cnt": sc, "n_oov_big": oov,
            "logprob": lp if bigs else np.nan,
            "ppl": float(np.exp(-lp / len(bigs))) if bigs else np.nan,
        })
    return pd.DataFrame(rows)


CORPUS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "the dog sat on the mat",
    "a lone sentence with unique words entirely",
    "the cat",           # 1 bigram
    "single",            # no bigrams
    "",                  # empty -> one '' token, no bigrams
    "the cat sat quietly near the mat",
]


def _ds(texts, ids=None):
    import ray.data as rd

    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })).materialize()


def test_self_scoring_matches_reference(ray_session):
    from verify_ray.pipelines.lm import bigram_perplexity

    out = (bigram_perplexity(_ds(CORPUS)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    ref = _ref(CORPUS, CORPUS, range(len(CORPUS)))
    ints = ["doc_id", "n_tok", "n_big", "sum_big_cnt", "sum_ctx_cnt",
            "n_oov_big"]
    pd.testing.assert_frame_equal(out[ints].astype("int64"),
                                  ref[ints].astype("int64"))
    np.testing.assert_allclose(out.logprob, ref.logprob, rtol=1e-12)
    np.testing.assert_allclose(out.ppl, ref.ppl, rtol=1e-12)
    # pruning sanity: the unique-word doc is all-OOV at min_count=2
    row = out[out.doc_id == 3].iloc[0]
    assert row.n_oov_big == row.n_big > 0


def test_cross_corpus_scoring(ray_session):
    """Model trained on one corpus, scored on another (unknown context
    words -> c1 = 0 denominator path)."""
    from verify_ray.pipelines.lm import score_perplexity, train_bigram_lm

    score_texts = ["the cat sat", "zzq qqz xxj vvk", "the cat"]
    model = train_bigram_lm(_ds(CORPUS), min_count=2)
    out = (score_perplexity(_ds(score_texts), model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    ref = _ref(CORPUS, score_texts, range(len(score_texts)))
    for c in ["n_big", "sum_big_cnt", "sum_ctx_cnt", "n_oov_big"]:
        assert list(out[c]) == list(ref[c]), c
    np.testing.assert_allclose(out.ppl, ref.ppl, rtol=1e-12)
    # novel doc: every bigram OOV and every context unseen
    assert out.loc[1, "sum_ctx_cnt"] == 0


def test_no_prune_no_oov_self(ray_session):
    """min_count=1: self-scoring can never see an OOV bigram."""
    from verify_ray.pipelines.lm import bigram_perplexity

    out = bigram_perplexity(_ds(CORPUS), min_count=1).to_pandas()
    assert int(out.n_oov_big.sum()) == 0


def test_duckdb_oracle_form(ray_session):
    """The driver's integer-feature oracle reproduced on testdata."""
    duckdb = __import__("duckdb")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["text_perplexity"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["text_perplexity"]).df()
    pd.testing.assert_frame_equal(
        mine.astype({c: "int64" for c in mine.columns}),
        orc.astype({c: "int64" for c in orc.columns}))
