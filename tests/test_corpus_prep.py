"""End-to-end corpus_prep composition: each stage must demonstrably
act, and the whole pipeline must match the driver's single-SQL oracle."""

import pandas as pd
import pyarrow as pa


def _run(texts_by_id, bench_ids, **kw):
    import ray.data as rd

    from verify_ray.pipelines.corpus_prep import corpus_prep

    t = pa.table({
        "doc_id": pa.array(list(texts_by_id), type=pa.int64()),
        "text": pa.array(list(texts_by_id.values()), type=pa.string())})
    bench = t.filter(pa.array([i in bench_ids for i in texts_by_id]))
    out = corpus_prep(rd.from_arrow(t), rd.from_arrow(bench), **kw)
    return (out.to_pandas().sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True))


def test_each_stage_acts(ray_session):
    long = " ".join(f"w{i}" for i in range(30))        # 30 distinct
    bench_text = " ".join(f"b{i}" for i in range(20))  # benchmark doc
    docs = {
        0: bench_text,                  # in benchmark -> self-hit, dropped
        1: long,                        # survives
        2: long,                        # exact dup of 1 -> dropped
        3: "short words only few",      # < min_distinct -> dropped
        4: bench_text + " suffix",      # shares 8-grams w/ bench -> dropped
        5: " ".join(f"x{i}" for i in range(100)),  # survives, 2 chunks
    }
    out = _run(docs, bench_ids={0}, min_distinct=5, ngram=8,
               window=64, stride=64)
    assert set(out.doc_id) == {1, 5}
    assert len(out[out.doc_id == 5]) == 2  # 100 words / 64-window
    assert out[out.doc_id == 5].n_words.tolist() == [64, 36]
    # chunk text reassembles the original document
    joined = " ".join(out[out.doc_id == 5].chunk_text)
    assert joined == docs[5]


def test_driver_oracle(ray_session):
    duckdb = __import__("duckdb")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["corpus_prep"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["corpus_prep"]).df()
    ints = {c: "int64" for c in mine.columns if mine[c].dtype.kind in "iu"}
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)
