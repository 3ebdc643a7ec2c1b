"""Round-5 batch C3: KS surface, char-class profile, subsequence
support, hour heatmap — unit semantics + oracle parity at sf0.001."""

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


# ---- ks_surface -----------------------------------------------------------

def test_ks_surface_disjoint_supports_is_maximal(ray_session):
    from verify_ray.pipelines.analytics import ks_surface

    # A = {1,2}, B = {10}: at v=2 cumA=2, cumB=0 -> |2*1 - 0*2| = 2
    t = pa.table({"g": ["a", "a", "b", "c"],
                  "v": pa.array([1, 2, 10, 99], pa.int64())})
    out = ks_surface(_ds(t), "g", "v", "a", "b")
    assert out.iloc[0].to_dict() == {
        "n_a": 2, "n_b": 1, "d_x": 2, "at_value": 2}


def test_ks_surface_identical_is_zero_at_first_value(ray_session):
    from verify_ray.pipelines.analytics import ks_surface

    t = pa.table({"g": ["a", "a", "b", "b"],
                  "v": pa.array([5, 9, 5, 9], pa.int64())})
    out = ks_surface(_ds(t), "g", "v", "a", "b")
    assert out.iloc[0].d_x == 0 and out.iloc[0].at_value == 5


# ---- charclass_profile ------------------------------------------------------

def test_charclass_counts(ray_session):
    from verify_ray.pipelines.text import charclass_profile

    t = pa.table({"source": ["s1", "s1", "s2"],
                  "text": ["AB c1 2", None, "xyz"]})
    out = charclass_profile(_ds(t))
    r1 = out[out.grp == "s1"].iloc[0]
    assert (r1.n_docs, r1.n_chars) == (2, 7)
    assert (r1.n_digit, r1.n_upper, r1.n_space) == (2, 2, 2)
    r2 = out[out.grp == "s2"].iloc[0]
    assert (r2.n_digit, r2.n_upper, r2.n_space) == (0, 0, 0)


# ---- subsequence_support ----------------------------------------------------

def _ev(rows):
    u, ts, s = zip(*rows)
    return pa.table({
        "user_id": pa.array(u, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": list(s)})


def test_subsequence_strict_order_required(ray_session):
    from verify_ray.pipelines.sessions import subsequence_support

    t = _ev([(1, 10, "a"), (1, 20, "b"),      # match
             (2, 20, "b"), (2, 30, "a"),      # wrong order
             (3, 10, "a"), (3, 10, "b")])     # equal ts: no chain
    out = subsequence_support(_ds(t), ["a", "b"])
    assert out.iloc[0].to_dict() == {"n_users": 3, "n_match": 1}


def test_subsequence_greedy_earliest_is_optimal(ray_session):
    from verify_ray.pipelines.sessions import subsequence_support

    # a@10, a@50, b@20: greedy picks a@10 then b@20 -> match
    t = _ev([(1, 10, "a"), (1, 50, "a"), (1, 20, "b")])
    out = subsequence_support(_ds(t), ["a", "b"])
    assert out.iloc[0].n_match == 1


def test_subsequence_repeated_state(ray_session):
    from verify_ray.pipelines.sessions import subsequence_support

    # pattern a,a needs two a's at distinct increasing ts
    t = _ev([(1, 10, "a"), (1, 11, "a"),
             (2, 10, "a")])
    out = subsequence_support(_ds(t), ["a", "a"])
    assert out.iloc[0].to_dict() == {"n_users": 2, "n_match": 1}


# ---- oracle parity -----------------------------------------------------------

def test_oracle_ks_surface(ray_session):
    _oracle_check("docs_ks_surface")


def test_oracle_charclass(ray_session):
    _oracle_check("docs_charclass_by_source")


def test_oracle_subsequence(ray_session):
    _oracle_check("events_subsequence_support")


def test_oracle_hour_heatmap(ray_session):
    _oracle_check("events_hour_type_heatmap")
