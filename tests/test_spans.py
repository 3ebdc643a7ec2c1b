"""duplicate_token_spans vs a brute-force scalar reference."""

import numpy as np
import pyarrow as pa
import pytest

from verify_ray.pipelines.spans import (duplicate_token_spans,
                                        duplicated_window_set,
                                        window_hashes)


def _seqs_ds(token_lists, ids=None, blocks=1):
    import ray.data as rd

    ids = ids or [f"d{i}" for i in range(len(token_lists))]
    t = pa.table({
        "doc_id": pa.array(ids, type=pa.string()),
        "tokens": pa.array(token_lists, type=pa.list_(pa.int32())),
    })
    return rd.from_arrow(t).repartition(blocks)


def _brute_spans(token_lists, ids, k, min_count):
    """Reference: count every window (as a tuple) with multiplicity,
    mark hits, merge per doc with the gap>k rule."""
    from collections import Counter

    cnt = Counter()
    for toks in token_lists:
        for i in range(len(toks) - k + 1):
            cnt[tuple(toks[i:i + k])] += 1
    out = []
    for did, toks in zip(ids, token_lists):
        hits = [i for i in range(len(toks) - k + 1)
                if cnt[tuple(toks[i:i + k])] >= min_count]
        # cur = (last_start, end, n_windows, first_start)
        merged = []
        cur = None
        for s in hits:
            if cur is not None and s - cur[0] <= k:
                cur = (s, s + k, cur[2] + 1, cur[3])
            else:
                if cur is not None:
                    merged.append(cur)
                cur = (s, s + k, 1, s)
        if cur is not None:
            merged.append(cur)
        for last_s, e, n, first_s in merged:
            out.append((did, first_s, e, n))
    return sorted(out)


def _run(token_lists, k=3, min_count=2, blocks=1):
    ids = [f"d{i}" for i in range(len(token_lists))]
    ds = _seqs_ds(token_lists, ids, blocks)
    got = duplicate_token_spans(ds, k=k, min_count=min_count).to_pandas()
    if got.empty:
        got = []
    else:
        got = sorted(map(tuple, got[["doc_id", "span_start", "span_end",
                                     "n_windows"]].itertuples(index=False)))
    return got, _brute_spans(token_lists, ids, k, min_count)


def test_cross_doc_duplicate_span():
    a = [1, 2, 3, 4, 5, 6, 7, 8]
    b = [9, 9] + [3, 4, 5, 6] + [8, 8, 8]
    got, want = _run([a, b], k=3)
    assert got == want
    # the shared [3,4,5,6] run must appear in both docs
    docs = {d for d, *_ in got}
    assert docs == {"d0", "d1"}


def test_within_doc_repetition_counts():
    # window repeated inside ONE doc duplicates (Lee et al. semantics)
    a = [1, 2, 3, 0, 1, 2, 3]
    got, want = _run([a], k=3)
    assert got == want
    assert len(got) == 2  # two separate occurrences of [1,2,3]


def test_merging_overlapping_windows():
    # a long shared run merges into ONE maximal span per doc
    shared = list(range(100, 120))
    a = list(range(1, 6)) + shared + list(range(11, 16))
    b = list(range(21, 28)) + shared + list(range(31, 33))
    got, want = _run([a, b], k=4)
    assert got == want
    for d, s0, s1, n in got:
        assert s1 - s0 == len(shared)
        assert n == len(shared) - 4 + 1


def test_min_count_threshold():
    a = [1, 2, 3]
    b = [1, 2, 3]
    c = [1, 2, 3]
    got2, want2 = _run([a, b, c], k=3, min_count=3)
    assert got2 == want2 and len(got2) == 3
    got3, _ = _run([a, b], k=3, min_count=3)
    assert got3 == []


def test_short_docs_and_empty():
    got, want = _run([[1, 2], [], [1, 2]], k=3)
    assert got == want == []


def test_multi_block_parity():
    rng = np.random.default_rng(7)
    docs = [rng.integers(0, 9, size=rng.integers(0, 30)).tolist()
            for _ in range(40)]
    got1, want = _run(docs, k=3, blocks=1)
    got8, _ = _run(docs, k=3, blocks=8)
    assert got1 == want
    assert got8 == want


def test_window_hashes_start_offsets():
    t = pa.table({"tokens": pa.array([[1, 2, 3, 4], [5, 6, 7]],
                                     type=pa.list_(pa.int32()))})
    rows, starts, h = window_hashes(t, 2)
    assert rows.tolist() == [0, 0, 0, 1, 1]
    assert starts.tolist() == [0, 1, 2, 0, 1]
    assert len(np.unique(h)) == 5


def test_driver_dedup_token_spans_oracle():
    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["dedup_token_spans"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["dedup_token_spans"]).df()
    ints = {c: "int64" for c in mine.columns if mine[c].dtype.kind in "iu"}
    assert len(mine) > 0  # planted copies must surface
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)


def _brute_clean(token_lists, k, min_count):
    from collections import Counter

    cnt = Counter()
    for toks in token_lists:
        for i in range(len(toks) - k + 1):
            cnt[tuple(toks[i:i + k])] += 1
    out = []
    for toks in token_lists:
        covered = [False] * len(toks)
        for i in range(len(toks) - k + 1):
            if cnt[tuple(toks[i:i + k])] >= min_count:
                for j in range(i, i + k):
                    covered[j] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        out.append(kept)
    return out


@pytest.mark.parametrize("blocks", [1, 6])
def test_remove_duplicate_spans_matches_brute(ray_session, blocks):
    from verify_ray.pipelines.spans import remove_duplicate_spans

    rng = np.random.default_rng(13)
    docs = [rng.integers(0, 8, size=rng.integers(0, 30)).tolist()
            for _ in range(50)]
    ds = _seqs_ds(docs, blocks=blocks)
    got = (remove_duplicate_spans(ds, k=3).to_pandas()
           .sort_values("doc_id", key=lambda s: s.str[1:].astype(int))
           .reset_index(drop=True))
    want = _brute_clean(docs, 3, 2)
    for i, kept in enumerate(want):
        row = got.iloc[i]
        assert list(row.tokens) == kept
        assert row.n_tok == len(kept)
        assert row.n_removed == len(docs[i]) - len(kept)
        assert row.token_sum == sum(kept)


def test_remove_spans_no_duplicates_is_identity(ray_session):
    from verify_ray.pipelines.spans import remove_duplicate_spans

    docs = [list(range(i * 50, i * 50 + 10)) for i in range(5)]
    got = remove_duplicate_spans(_seqs_ds(docs), k=3).to_pandas()
    assert got.n_removed.sum() == 0
    assert got.n_tok.tolist() == [10] * 5


def test_driver_remove_spans_oracle():
    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["dedup_token_spans_removed"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["dedup_token_spans_removed"]).df()
    assert mine.n_removed.sum() > 0  # planted copies get excised
    ints = {c: "int64" for c in ["n_tok", "n_removed", "token_sum"]}
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)


def test_skew_heavy_duplicate_cluster(ray_session):
    # 300 identical 60-token docs + unique fillers: the duplicated
    # window set stays DISTINCT-window-sized (57 hashes, not 300x57),
    # and every copy reports one full-cover span
    from verify_ray.pipelines.spans import (duplicate_token_spans,
                                            duplicated_window_set)

    base = list(range(1000, 1060))
    docs = [base] * 300 + [list(range(i * 100, i * 100 + 20))
                           for i in range(2000, 2040)]
    ds = _seqs_ds(docs, ids=[f"d{i}" for i in range(len(docs))], blocks=8)
    dup = duplicated_window_set(ds, k=4, min_count=2)
    assert len(dup) == 60 - 4 + 1  # distinct-window-sized broadcast
    out = duplicate_token_spans(ds, k=4, min_count=2).to_pandas()
    clones = out[out.doc_id.str[1:].astype(int) < 300]
    assert len(clones) == 300
    assert (clones.span_start == 0).all()
    assert (clones.span_end == 60).all()


def test_duplicated_window_set_multiplicity():
    ds = _seqs_ds([[1, 2, 3, 1, 2, 3], [7, 8, 9]])
    dup = duplicated_window_set(ds, k=3, min_count=2)
    # [1,2,3] twice (within one doc) and [2,3,1] once, [3,1,2] once
    assert len(dup) == 1
