"""Round-5 batch C operators: privacy (l-diversity, t-closeness),
Mann-Whitney surface, journey signatures, simhash hamming histogram —
unit semantics + the driver oracle at sf0.001."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def _oracle_check(name, tables=("events", "documents", "lineitem")):
    import __ray_entry__ as e

    mine = e.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    orc = con.execute(e.oracle_sql()[name]).df()
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    for c in mine.columns:
        a, b = mine[c].to_numpy(), orc[c].to_numpy()
        if a.dtype == object or b.dtype == object:
            assert list(map(str, a)) == list(map(str, b)), c
        else:
            assert np.array_equal(a, b), c
    return mine


# ---- l_diversity ------------------------------------------------------------

def test_l_diversity_counts_distinct_and_filters(ray_session):
    from verify_ray.pipelines.analytics import l_diversity

    t = pa.table({
        "qa": ["x", "x", "x", "y", "y", "y", "y", None],
        "qb": [1, 1, 1, 2, 2, 2, 2, 2],
        "s":  [7, 7, 8, 1, 2, 3, None, 5]})
    out = l_diversity(_ds(t), ["qa", "qb"], "s", max_distinct=3)
    # class (x,1): distinct {7,8} = 2 < 3 -> kept
    # class (y,2): distinct {1,2,3} = 3 -> filtered (null s drops)
    # null-qa row drops entirely
    assert list(out.qa) == ["x"]
    assert list(out.qb) == [1]
    assert list(out.n_distinct) == [2]


def test_l_diversity_empty_when_all_diverse(ray_session):
    from verify_ray.pipelines.analytics import l_diversity

    t = pa.table({"q": ["a", "a"], "s": [1, 2]})
    out = l_diversity(_ds(t), ["q"], "s", max_distinct=2)
    assert len(out) == 0 and list(out.columns) == ["q", "n_distinct"]


# ---- t_closeness_surface ----------------------------------------------------

def test_t_closeness_exact_l1(ray_session):
    from verify_ray.pipelines.analytics import t_closeness_surface

    # class A: v=0 x3, v=1 x1; class B: v=1 x4 (v=0 absent)
    t = pa.table({"q": ["A"] * 4 + ["B"] * 4,
                  "v": [0, 0, 0, 1, 1, 1, 1, 1]})
    out = t_closeness_surface(_ds(t), "q", "v")
    # N=8, C_0=3, C_1=5; A: n=4, |3*8-3*4| + |1*8-5*4| = 12+12 = 24
    # B: n=4, |0*8-3*4| + |4*8-5*4| = 12+12 = 24
    assert list(out.qi) == ["A", "B"]
    assert list(out.n) == [4, 4]
    assert list(out.l1_x) == [24, 24]


def test_t_closeness_identical_distribution_is_zero(ray_session):
    from verify_ray.pipelines.analytics import t_closeness_surface

    t = pa.table({"q": ["A", "A", "B", "B"], "v": [0, 1, 0, 1]})
    out = t_closeness_surface(_ds(t), "q", "v")
    assert list(out.l1_x) == [0, 0]


# ---- mannwhitney_surface ----------------------------------------------------

def test_mannwhitney_doubled_u(ray_session):
    from verify_ray.pipelines.analytics import mannwhitney_surface

    # group g: side0 = [1, 3], side1 = [2, 4]
    # ranks (1-based): 1->1, 2->2, 3->3, 4->4; R0 = 1+3 = 4
    # U0 = R0 - n0(n0+1)/2 = 4 - 3 = 1 -> u0_x2 = 2
    t = pa.table({"g": ["g"] * 4, "v": [1.0, 2.0, 3.0, 4.0],
                  "side": [0, 1, 0, 1]})
    out = mannwhitney_surface(_ds(t), "g", "v", "side")
    assert list(out.n0) == [2] and list(out.n1) == [2]
    assert list(out.u0_x2) == [2]


def test_mannwhitney_ties_stay_integral(ray_session):
    from verify_ray.pipelines.analytics import mannwhitney_surface

    # all values equal: avg rank = (n+1)/2, doubled = n+1 = 5
    # R0_x2 = 2*5 = 10, u0_x2 = 10 - 2*3 = 4  (U0 = n0*n1/2 = 2)
    t = pa.table({"g": ["g"] * 4, "v": [9.0] * 4,
                  "side": [0, 0, 1, 1]})
    out = mannwhitney_surface(_ds(t), "g", "v", "side")
    assert list(out.u0_x2) == [4]
    # identity: U0 + U1 = n0*n1 -> U1 = 4 - 2 = 2 (symmetric here)


# ---- journey_signatures -----------------------------------------------------

def test_journey_signatures_shared_path(ray_session):
    from verify_ray.pipelines.sessions import journey_signatures

    # users 1 and 2 share the exact ordered path a,b; user 3 differs.
    # user 1's ties on ts break by event_id (20 before 21 -> a,b).
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
        "ts": pa.array([100, 100, 50, 60, 10], type=pa.timestamp("us")),
        "event_type": ["b", "a", "a", "b", "a"],
        "event_id": pa.array([21, 20, 1, 2, 3], type=pa.int64())})
    out = journey_signatures(_ds(t), topk=10)
    sig_ab = hashlib.md5(b"a,b").hexdigest()
    sig_a = hashlib.md5(b"a").hexdigest()
    assert list(out.sig) == [sig_ab, sig_a]
    assert list(out.n_users) == [2, 1]
    assert list(out.n_events) == [2, 1]
    assert list(out.example_user) == [1, 3]


def test_journey_signatures_topk_truncates(ray_session):
    from verify_ray.pipelines.sessions import journey_signatures

    t = pa.table({
        "user_id": pa.array([1, 2, 3], type=pa.int64()),
        "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
        "event_type": ["x", "y", "z"],
        "event_id": pa.array([1, 2, 3], type=pa.int64())})
    out = journey_signatures(_ds(t), topk=2)
    assert len(out) == 2
    # all n_users=1 -> lexicographically smallest two sigs win
    sigs = sorted(hashlib.md5(s.encode()).hexdigest()
                  for s in ["x", "y", "z"])
    assert list(out.sig) == sigs[:2]


# ---- simhash_hamming_histogram ----------------------------------------------

def test_simhash_hist_matches_bruteforce(ray_session):
    from verify_ray.pipelines.dedup import (simhash_batch,
                                            simhash_hamming_histogram)

    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy cat",
             "completely different words here entirely",
             "the quick brown fox jumps over the lazy dog"]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": texts})
    out = simhash_hamming_histogram(_ds(t), max_hamming=7)
    # brute force over the same sketches
    sh = simhash_batch(t, "text", "doc_id")["simhash"].to_numpy()
    dists = []
    for i in range(4):
        for j in range(i + 1, 4):
            d = bin(int(sh[i]) ^ int(sh[j])).count("1")
            if d <= 7:
                dists.append(d)
    exp = pd.Series(dists).value_counts().sort_index()
    assert list(out.hamming) == list(exp.index)
    assert list(out.n_pairs) == list(exp.to_numpy())
    assert 0 in list(out.hamming)  # docs 1 and 4 are identical


# ---- oracle parity at sf0.001 ----------------------------------------------

def test_oracle_l_diversity(ray_session):
    _oracle_check("events_l_diversity")


def test_oracle_t_closeness(ray_session):
    _oracle_check("events_t_closeness")


def test_oracle_mannwhitney(ray_session):
    _oracle_check("docs_mannwhitney_u")


def test_oracle_journey_signatures(ray_session):
    _oracle_check("user_journey_signatures")


def test_oracle_simhash_histogram(ray_session):
    _oracle_check("simhash_hamming_histogram")
