"""build_postings (inverted index) and percentile_filter."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 3):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)]
                         if n else tbl)


def test_build_postings_small_corpus(ray_session):
    from verify_ray.pipelines.retrieval import build_postings

    t = pa.table({
        "doc_id": pa.array([3, 1, 2, 4], type=pa.int64()),
        "text": pa.array(["a b a", "b c", "a  b", None])})
    out = (build_postings(_ds(t, 2), min_df=2, num_buckets=4)
           .to_pandas().sort_values("word").reset_index(drop=True))
    # a: docs {1? no -> {3, 2}; b: {3, 1, 2}; c: {1} pruned by min_df
    assert out["word"].tolist() == ["a", "b"]
    assert out["df"].tolist() == [2, 3]
    assert out["postings"].tolist() == ["2,3", "1,2,3"]
    assert out["doc_sum"].tolist() == [5, 6]


def test_build_postings_dedups_across_blocks(ray_session):
    from verify_ray.pipelines.retrieval import build_postings

    # the same (word, doc) pair arriving from two blocks must count
    # once: split one doc's text across a duplicated row id? ids are
    # unique per row here, so instead verify within-doc repetition
    # plus multi-block routing with a bigger random corpus
    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(30)])
    ids = np.arange(60, dtype=np.int64)
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 15)))
             for _ in ids]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    out = (build_postings(_ds(t, 5), min_df=1, num_buckets=8)
           .to_pandas())
    ref: dict = {}
    for i, txt in zip(ids, texts):
        for w in set(txt.split()):
            ref.setdefault(w, set()).add(int(i))
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        docs = sorted(ref[row["word"]])
        assert row["df"] == len(docs)
        assert row["postings"] == ",".join(str(d) for d in docs)
        assert row["doc_sum"] == sum(docs)


def test_percentile_filter_strict_rank_rule(ray_session):
    from verify_ray.pipelines.select import percentile_filter

    # group x: scores [1,2,2,3,10] n=5; keep 500 permille:
    # n_less*1000 < 500*5=2500 -> scores 1 (0), 2 (1000), 2 (1000)
    # survive; 3 (n_less=3 -> 3000) and 10 drop; ties share a fate
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "g": pa.array(["x"] * 5),
        "s": pa.array([1, 2, 2, 3, 10], type=pa.int64())})
    out = (percentile_filter(_ds(t, 2), "g", "s", keep_permille=500)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["id"].tolist() == [1, 2, 3]


def test_percentile_filter_matches_sql_rule(ray_session):
    from verify_ray.pipelines.select import percentile_filter

    rng = np.random.default_rng(6)
    n = 300
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array(rng.choice(["a", "b", "c"], n)),
        "s": pa.array(rng.integers(0, 25, n).astype(np.int64))})
    out = (percentile_filter(_ds(t, 4), "g", "s", keep_permille=300)
           .to_pandas())
    df = t.to_pandas()
    df["n_less"] = (df.groupby("g")["s"].rank(method="min")
                    .astype(int) - 1)
    df["n_group"] = df.groupby("g")["s"].transform("size")
    ref = df[df.n_less * 1000 < 300 * df.n_group]
    assert sorted(out["id"]) == sorted(ref["id"])


def test_percentile_filter_keep_all_and_nulls(ray_session):
    from verify_ray.pipelines.select import percentile_filter

    t = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "g": pa.array(["x", None, "x"]),
        "s": pa.array([5, 1, None], type=pa.int64())})
    out = (percentile_filter(_ds(t, 1), "g", "s", keep_permille=1000)
           .to_pandas())
    assert out["id"].tolist() == [1]  # null group/score rows drop
