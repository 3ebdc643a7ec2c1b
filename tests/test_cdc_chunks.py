"""chunk.content_defined_chunks vs a scalar reference, the CDC
boundary-stability property, and the driver oracle."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.pipelines.chunk import content_defined_chunks


def _md5_u64le(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _brute(texts, w, mod):
    out = []
    for i, text in enumerate(texts):
        ws = text.strip().split() if text.strip() else [""]
        chunks, cur = [], []
        for j, word in enumerate(ws):
            cur.append(word)
            if j + 1 >= w and _md5_u64le(
                    " ".join(ws[j - w + 1:j + 1])) % mod == 0:
                chunks.append(cur)
                cur = []
        if cur:
            chunks.append(cur)
        for cid, ch in enumerate(chunks):
            out.append((f"{i:03d}", cid, len(ch),
                        sum(_md5_u64le(x) % 50_000 for x in ch)))
    return out


def _ds(texts, blocks=1):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([f"{i:03d}"
                                      for i in range(len(texts))]),
                  "text": pa.array(texts)})
    return rd.from_arrow(t).repartition(blocks)


def _run(texts, w=4, mod=4, blocks=1):
    out = (content_defined_chunks(_ds(texts, blocks), w=w, mod=mod)
           .to_pandas().sort_values(["doc_id", "chunk_id"]))
    return list(map(tuple, out.itertuples(index=False)))


@pytest.mark.parametrize("blocks", [1, 4])
def test_cdc_matches_brute(ray_session, blocks):
    rng = np.random.default_rng(23)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 60)))
             for _ in range(50)]
    assert _run(texts, blocks=blocks) == _brute(texts, 4, 4)


def test_cdc_short_docs_single_chunk(ray_session):
    texts = ["a b", "solo", "x y z"]
    got = _run(texts, w=4, mod=2)
    assert [(g[0], g[1]) for g in got] == [("000", 0), ("001", 0),
                                          ("002", 0)]


def test_cdc_boundary_stability_under_insertion(ray_session):
    # THE content-defined property: prepending words only re-chunks
    # the prefix — chunks after the first boundary are identical
    rng = np.random.default_rng(31)
    vocab = [f"v{i}" for i in range(30)]
    base = " ".join(rng.choice(vocab, size=400))
    shifted = "inserted words here " + base
    a = _run([base], w=4, mod=8)
    b = _run([shifted], w=4, mod=8)
    sig_a = [(n, c) for (_, _, n, c) in a]
    sig_b = [(n, c) for (_, _, n, c) in b]
    # the re-chunked neighborhood is the prefix only (junction grams
    # may add/shift one early boundary): the chunk sequences must
    # share a suffix covering all but the first couple of chunks
    common = 0
    while (common < min(len(sig_a), len(sig_b))
           and sig_a[-1 - common] == sig_b[-1 - common]):
        common += 1
    assert common >= len(sig_a) - 2, (len(sig_a), len(sig_b), common)


def test_driver_cdc_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["cdc_chunks"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["cdc_chunks"]).df()
    assert mine.chunk_id.max() > 0  # boundaries actually fire
    ints = {c: "int64" for c in ["chunk_id", "n_words", "checksum"]}
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)
