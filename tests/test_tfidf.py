"""tfidf_topk vs a scalar reference and the SQL oracle form."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000


def _ref(texts, k=3, min_df=1):
    toks = [re.split(r"\s+", t.strip()) for t in texts]
    df = Counter()
    for ws in toks:
        df.update(set(ws))
    n = len(texts)
    rows = []
    for i, ws in enumerate(toks):
        tf = Counter(ws)
        scored = [(t, c, c * ((SCALE * n) // df[t]))
                  for t, c in tf.items() if df[t] >= min_df]
        scored.sort(key=lambda x: (-x[2], x[0]))
        for r, (t, c, s) in enumerate(scored[:k], start=1):
            rows.append({"doc_id": i, "term": t, "tf": c,
                         "score": s, "rank": r})
    return pd.DataFrame(rows)


TEXTS = [
    "apple banana apple cherry",
    "banana banana date",
    "cherry date elderberry apple",
    "fig fig fig fig",
    "apple banana cherry date elderberry fig grape",
    "",
]


def _run(texts, **kw):
    import ray.data as rd

    from verify_ray.pipelines.tfidf import tfidf_topk

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())})).materialize()
    return (tfidf_topk(ds, **kw).to_pandas()
            .sort_values(["doc_id", "rank"]).reset_index(drop=True))


def test_matches_reference(ray_session):
    out = _run(TEXTS, k=3)
    ref = _ref(TEXTS, k=3)
    pd.testing.assert_frame_equal(
        out.astype({"doc_id": "int64", "tf": "int64", "score": "int64",
                    "rank": "int64"}), ref)
    # rare terms outrank common ones at equal tf: doc 4 is all-distinct
    # terms, so rank order == ascending document frequency
    d4 = out[out.doc_id == 4]
    assert list(d4["term"])[:2] == ["grape", "elderberry"]


def test_min_df_prunes(ray_session):
    out = _run(TEXTS, k=5, min_df=2)
    ref = _ref(TEXTS, k=5, min_df=2)
    pd.testing.assert_frame_equal(
        out.astype({"doc_id": "int64", "tf": "int64", "score": "int64",
                    "rank": "int64"}), ref)
    assert "grape" not in set(out.term)   # df=1 pruned


def test_duckdb_oracle_form(ray_session):
    duckdb = __import__("duckdb")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["text_tfidf_topk"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["text_tfidf_topk"]).df()
    ints = {c: "int64" for c in mine.columns if c != "term"}
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints))
