"""Session-5 operators: interval overlap join, CDC merge-upsert,
bloom-prefiltered semi/anti join, weighted Bernoulli sampling, Pareto
frontier — each pinned against a brute-force or sibling-operator
reference on randomized inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: pa.Table, blocks: int = 3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


# ---------------------------------------------------------------------------
# interval_join


def _brute_overlap(l: pd.DataFrame, r: pd.DataFrame) -> set:
    out = set()
    for a in l.itertuples():
        if a.key is None or a.ls is None or a.le is None:
            continue
        for b in r.itertuples():
            if b.key is None or b.rs is None or b.re_ is None:
                continue
            if a.key == b.key and a.ls <= b.re_ and b.rs <= a.le:
                out.add((a.lid, b.rid))
    return out


@pytest.mark.parametrize("max_span", [None, 40])
def test_interval_join_brute(ray_session, max_span):
    from verify_ray.pipelines.joins import interval_join

    rng = np.random.default_rng(7)
    nl, nr = 120, 90
    lkey = rng.integers(0, 8, nl).astype(object)
    rkey = rng.integers(0, 8, nr).astype(object)
    lkey[rng.random(nl) < 0.05] = None
    rkey[rng.random(nr) < 0.05] = None
    ls = rng.integers(0, 300, nl)
    le = ls + rng.integers(0, 30, nl)
    rs = rng.integers(0, 300, nr)
    re_ = rs + rng.integers(0, 40, nr)  # right span <= 39 < 40
    lt = pa.table({"lid": pa.array(range(nl), pa.int64()),
                   "key": pa.array(lkey, pa.int64()),
                   "ls": pa.array(ls, pa.int64()),
                   "le": pa.array(le, pa.int64())})
    rt = pa.table({"rid": pa.array(range(nr), pa.int64()),
                   "key2": pa.array(rkey, pa.int64()),
                   "rs": pa.array(rs, pa.int64()),
                   "re_": pa.array(re_, pa.int64())})
    out = interval_join(_ds(lt), _ds(rt), "key", "ls", "le", "rs", "re_",
                        ["lid"], ["rid"], right_key="key2",
                        max_right_span=max_span,
                        num_buckets=8).to_pandas()
    got = set(zip(out.lid, out.rid))
    want = _brute_overlap(
        lt.to_pandas().assign(key=lkey),
        rt.to_pandas().rename(columns={"key2": "key"}).assign(key=rkey))
    assert got == want and len(want) > 50


def test_interval_join_null_bounds_and_timestamps(ray_session):
    from verify_ray.pipelines.joins import interval_join

    ts = lambda s: pa.array(s, pa.timestamp("us"))  # noqa: E731
    lt = pa.table({"lid": pa.array([1, 2, 3], pa.int64()),
                   "key": pa.array(["a", "a", "a"]),
                   "ls": ts([100, None, 300]),
                   "le": ts([200, 250, 400])})
    rt = pa.table({"rid": pa.array([10, 11], pa.int64()),
                   "key": pa.array(["a", "a"]),
                   "rs": ts([200, None]),
                   "re": ts([299, 500])})
    out = interval_join(_ds(lt, 1), _ds(rt, 1), "key", "ls", "le",
                        "rs", "re", ["lid"], ["rid"],
                        num_buckets=4).to_pandas()
    # lid=1 touches rid=10 at the closed endpoint 200; null bounds
    # (lid=2, rid=11) match nothing
    assert set(zip(out.lid, out.rid)) == {(1, 10)}


# ---------------------------------------------------------------------------
# merge_upsert


def test_merge_upsert_semantics(ray_session):
    from verify_ray.pipelines.joins import merge_upsert

    base = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "v": pa.array(["b1", "b2", "b3", "b4"])})
    # k=2 updated, k=3 deleted, k=5 inserted, k=4 untouched;
    # k=1 gets two delta rows — version 7 must win over 5
    delta = pa.table({"k": pa.array([2, 3, 5, 1, 1], pa.int64()),
                      "v": pa.array(["d2", None, "d5", "d1a", "d1b"]),
                      "op": pa.array(["u", "d", "u", "u", "u"]),
                      "ver": pa.array([1, 1, 1, 5, 7], pa.int64())})
    out = merge_upsert(_ds(base), _ds(delta), ["k"], ["v"],
                       op_col="op", delta_version_col="ver",
                       num_buckets=4).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    want = pd.DataFrame({"k": [1, 2, 4, 5],
                         "v": ["d1b", "d2", "b4", "d5"]})
    pd.testing.assert_frame_equal(out, want)


def test_merge_upsert_delete_then_nothing(ray_session):
    from verify_ray.pipelines.joins import merge_upsert

    base = pa.table({"k": pa.array([1], pa.int64()),
                     "v": pa.array(["x"])})
    delta = pa.table({"k": pa.array([1], pa.int64()),
                      "v": pa.array([None], pa.string()),
                      "op": pa.array(["d"])})
    out = merge_upsert(_ds(base, 1), _ds(delta, 1), ["k"], ["v"],
                       num_buckets=2)
    # stable schema even when every row deletes (blocks stay typed —
    # Ray's to_pandas on an all-empty dataset drops columns, so assert
    # on the dataset schema, the contract parquet writes rely on)
    assert out.schema().names == ["k", "v"]
    assert out.count() == 0


# ---------------------------------------------------------------------------
# bloom_semi_join


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_bloom_join_equals_hash_join(ray_session, how):
    from verify_ray.pipelines.joins import bloom_semi_join, hash_join

    rng = np.random.default_rng(11)
    nl, nr = 400, 60
    lkey = rng.integers(0, 500, nl).astype(object)
    lkey[rng.random(nl) < 0.04] = None
    rkey = rng.integers(0, 120, nr).astype(object)  # ~sparse hits
    lt = pa.table({"k": pa.array(lkey, pa.int64()),
                   "lid": pa.array(range(nl), pa.int64())})
    rt = pa.table({"k": pa.array(rkey, pa.int64()),
                   "rid": pa.array(range(nr), pa.int64())})
    lds, rds = _ds(lt), _ds(rt)
    got = bloom_semi_join(lds, rds, "k", ["lid", "k"], how=how,
                          num_buckets=8).to_pandas()
    want = hash_join(lds, rds, "k", ["lid", "k"], [], how=how,
                     num_buckets=8).to_pandas()
    assert sorted(got.lid) == sorted(want.lid)
    assert len(got) == len(got.lid.unique())


def test_bloom_join_composite_keys(ray_session):
    from verify_ray.pipelines.joins import bloom_semi_join, hash_join

    lt = pa.table({"a": pa.array([1, 1, 2, 2, 3], pa.int64()),
                   "b": pa.array(["x", "y", "x", "y", "x"]),
                   "lid": pa.array(range(5), pa.int64())})
    rt = pa.table({"a2": pa.array([1, 2], pa.int64()),
                   "b2": pa.array(["y", "x"])})
    got = bloom_semi_join(_ds(lt, 2), _ds(rt, 1), ["a", "b"], ["lid"],
                          right_key=["a2", "b2"],
                          num_buckets=4).to_pandas()
    want = hash_join(_ds(lt, 2), _ds(rt, 1), ["a", "b"], ["lid"], [],
                     right_key=["a2", "b2"], how="semi",
                     num_buckets=4).to_pandas()
    assert sorted(got.lid) == sorted(want.lid) == [1, 2]


# ---------------------------------------------------------------------------
# weighted_sample


def test_weighted_sample_rule_and_nesting(ray_session):
    from verify_ray.pipelines.sample import (GRANULARITY, _hash_buckets,
                                             weighted_sample)

    rng = np.random.default_rng(3)
    n = 800
    w = rng.integers(0, 120, n).astype(object)
    w[rng.random(n) < 0.05] = None
    ids = np.arange(n).astype(object)
    ids[0] = None
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "w": pa.array(w, pa.int64())})
    out = weighted_sample(_ds(t), "w", max_weight=100).to_pandas()

    bk = _hash_buckets(pa.array([str(i) for i in range(n)]))
    wv = np.array([0 if x is None else int(x) for x in w])
    want = {i for i in range(1, n)
            if bk[i] * 100 < wv[i] * GRANULARITY}
    assert set(out.doc_id) == want
    # rows at w >= max_weight always keep
    heavy = [i for i in range(1, n) if wv[i] >= 100]
    assert set(heavy) <= set(out.doc_id)
    # sample size tracks E[sum(min(1, w/100))] loosely
    exp = sum(min(1.0, x / 100) for x in wv[1:])
    assert abs(len(out) - exp) < 0.25 * exp


# ---------------------------------------------------------------------------
# pareto_frontier


def _brute_pareto(x, y):
    keep = []
    for i in range(len(x)):
        dominated = any(
            x[j] >= x[i] and y[j] <= y[i] and (x[j] > x[i] or y[j] < y[i])
            for j in range(len(x)))
        if not dominated:
            keep.append(i)
    return keep


def test_pareto_frontier_brute_and_layout_invariance(ray_session):
    from verify_ray.pipelines.select import pareto_frontier

    rng = np.random.default_rng(5)
    n = 300
    x = rng.integers(0, 40, n)       # many duplicates -> both-axis ties
    y = rng.integers(0, 40, n)
    ids = np.arange(n)
    xa = x.astype(object)
    xa[::97] = None                  # null rows drop
    t = pa.table({"x": pa.array(xa, pa.int64()),
                  "y": pa.array(y, pa.int64()),
                  "rid": pa.array(ids, pa.int64())})
    got = pareto_frontier(_ds(t), "x", "y", values=["rid", "x", "y"])
    valid = [i for i in range(n) if xa[i] is not None]
    bi = _brute_pareto(x[valid], y[valid])
    want = sorted(np.array(valid)[bi])
    assert sorted(got.rid) == want and len(want) >= 2

    # block layout must not change the result
    got1 = pareto_frontier(_ds(t, 1), "x", "y", values=["rid", "x", "y"])
    assert sorted(got1.rid) == sorted(got.rid)
    # output ordering contract: (x desc, y asc)
    assert list(got.x) == sorted(got.x, reverse=True)


def test_grouped_pareto_matches_per_group_brute(ray_session):
    from verify_ray.pipelines.select import grouped_pareto

    rng = np.random.default_rng(13)
    n = 400
    g = rng.integers(0, 4, n).astype(object)
    g[::101] = None                      # null groups drop
    x = rng.integers(0, 30, n)
    y = rng.integers(0, 30, n)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "x": pa.array(x, pa.int64()),
                  "y": pa.array(y, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    got = grouped_pareto(_ds(t), ["g"], "x", "y",
                         values=["g", "rid", "x", "y"])
    want = []
    for gv in range(4):
        idx = [i for i in range(n) if g[i] == gv]
        bi = _brute_pareto(x[idx], y[idx])
        want.extend(sorted(np.array(idx)[bi]))
    assert sorted(got.rid) == sorted(want) and len(want) > 4
    # per-group ordering contract: x desc within each group
    for gv, sub in got.groupby("g"):
        assert list(sub.x) == sorted(sub.x, reverse=True)


def test_pareto_frontier_duplicates_survive(ray_session):
    from verify_ray.pipelines.select import pareto_frontier

    t = pa.table({"x": pa.array([5, 5, 5, 3, 3], pa.int64()),
                  "y": pa.array([2, 2, 4, 1, 2], pa.int64()),
                  "rid": pa.array(range(5), pa.int64())})
    got = pareto_frontier(_ds(t, 2), "x", "y", values=["rid"])
    # (5,2) twice (mutual ties survive), (5,4) dominated by (5,2),
    # (3,1) survives (y strictly better than 2), (3,2) dominated
    assert sorted(got.rid) == [0, 1, 3]
