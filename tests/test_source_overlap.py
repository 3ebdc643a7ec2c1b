"""contamination.source_overlap vs a scalar reference and the driver
oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.pipelines.contamination import source_overlap


def _ds(rows, blocks=1):
    import ray.data as rd

    t = pa.table({"source": pa.array([r[0] for r in rows]),
                  "text": pa.array([r[1] for r in rows])})
    return rd.from_arrow(t).repartition(blocks)


def _brute(rows, n):
    sets: dict = {}
    for src, text in rows:
        ws = text.strip().split()
        grams = {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
        sets.setdefault(src, set()).update(grams)
    out = []
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(sets[a] & sets[b])
            if shared:
                out.append((a, b, shared))
    return out


@pytest.mark.parametrize("blocks", [1, 4])
def test_overlap_matches_brute(ray_session, blocks):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(f"s{i % 3}",
             " ".join(rng.choice(vocab, size=rng.integers(0, 15))))
            for i in range(60)]
    got = source_overlap(_ds(rows, blocks), n=3)
    want = _brute(rows, 3)
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_overlap_disjoint_sources(ray_session):
    rows = [("a", "x1 x2 x3 x4"), ("b", "y1 y2 y3 y4")]
    out = source_overlap(_ds(rows), n=3)
    assert len(out) == 0
    assert list(out.columns) == ["src_a", "src_b", "n_shared"]


def test_overlap_same_gram_many_docs_counts_once(ray_session):
    # the SAME shared gram in many docs of both sources counts ONCE
    rows = [("a", "p q r"), ("a", "p q r extra"), ("b", "p q r"),
            ("b", "z p q r")]
    out = source_overlap(_ds(rows, 2), n=3)
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("a", "b", 1)]


def test_driver_source_overlap_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["source_overlap"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["source_overlap"]).df()
    assert len(mine) > 0  # word-salad corpus shares 3-grams
    pd.testing.assert_frame_equal(
        mine.astype({"n_shared": "int64"}),
        orc.astype({"n_shared": "int64"}), check_dtype=False)
