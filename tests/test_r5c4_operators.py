"""Round-5 batch C4: hapax-by-source, autocorr surface, type-set
counts — unit semantics + oracle parity at sf0.001."""

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


# ---- hapax_by_source --------------------------------------------------------

def test_hapax_attribution(ray_session):
    from verify_ray.pipelines.text import hapax_by_source

    # "cat" occurs twice (once in each source) -> not hapax anywhere;
    # "dog" once in s1 -> hapax of s1; "rat rat" is one type with
    # global count 2 -> not hapax
    t = pa.table({"source": ["s1", "s2", "s2"],
                  "text": ["cat dog", "cat", "rat rat"]})
    out = hapax_by_source(_ds(t))
    r1 = out[out.grp == "s1"].iloc[0]
    r2 = out[out.grp == "s2"].iloc[0]
    assert (r1.n_types, r1.n_hapax) == (2, 1)
    assert (r2.n_types, r2.n_hapax) == (2, 0)


# ---- autocorr_surface -------------------------------------------------------

def test_autocorr_sums(ray_session):
    from verify_ray.pipelines.analytics import autocorr_surface

    # user 1 values 1.0, 2.0, 3.0 -> permille 1000, 2000, 3000
    # pairs: (1000,2000), (2000,3000)
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([10, 20, 30, 5], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 9.0], pa.float64())})
    out = autocorr_surface(_ds(t))
    assert list(out.user_id) == [1]  # single-event user 2 absent
    r = out.iloc[0]
    assert r.n_pairs == 2
    assert r.s_xy == 1000 * 2000 + 2000 * 3000
    assert (r.s_head, r.s_tail) == (3000, 5000)
    assert (r.s_head2, r.s_tail2) == (5_000_000, 13_000_000)


def test_autocorr_negative_floor(ray_session):
    from verify_ray.pipelines.analytics import autocorr_surface

    # -0.0015 floors to -2 (floor, not trunc)
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([1, 2], pa.timestamp("us")),
        "event_id": pa.array([1, 2], pa.int64()),
        "value": pa.array([-0.0015, 1.0], pa.float64())})
    out = autocorr_surface(_ds(t))
    assert out.iloc[0].s_head == -2 and out.iloc[0].s_xy == -2000


# ---- type_set_counts --------------------------------------------------------

def test_type_sets_sorted_and_counted(ray_session):
    from verify_ray.pipelines.sessions import type_set_counts

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": ["b", "a", "b", "a", "b", "a"]})
    out = type_set_counts(_ds(t))
    assert list(out.type_set) == ["a", "a,b"]
    assert list(out.n_users) == [1, 2]


# ---- oracle parity ----------------------------------------------------------

def test_oracle_hapax(ray_session):
    _oracle_check("docs_hapax_by_source")


def test_oracle_autocorr(ray_session):
    _oracle_check("events_autocorr_surface")


def test_oracle_type_sets(ray_session):
    _oracle_check("user_type_sets")
