"""hash_join (big-big shuffle equi-join) vs DuckDB differential —
inner/left, many-to-many enumeration, null keys (SQL: match nothing),
string keys, empty-match schema stability, and the driver oracles.

DuckDB (not pandas.merge) is the reference because pandas merge treats
NaN keys as equal — the opposite of SQL NULL semantics.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _run(left, right, **kw):
    from verify_ray.pipelines.joins import hash_join

    return hash_join(_ds(left), _ds(right), **kw).to_pandas()


def _duck(left, right, sql):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.execute(sql).df()


def _canon(df, cols):
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype("string")
        else:
            out[c] = out[c].astype("float64")
    return out.sort_values(cols, kind="stable").reset_index(drop=True)


def _rand_frames(seed, n_left=500, n_right=400, n_keys=12):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": pd.array(rng.randint(0, n_keys, n_left), dtype="Int64"),
        "lid": np.arange(n_left, dtype=np.int64)})
    right = pd.DataFrame({
        "rk": pd.array(rng.randint(0, n_keys, n_right), dtype="Int64"),
        "val": rng.randint(0, 10_000, n_right).astype(np.int64)})
    # sprinkle nulls on both sides: SQL says they match NOTHING
    left.loc[left.index % 17 == 0, "k"] = None
    right.loc[right.index % 13 == 0, "rk"] = None
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "right", "full"])
def test_differential_vs_duckdb(ray_session, how):
    left, right = _rand_frames(seed=hash(how) % 97)
    got = _run(left, right, key="k", left_values=["k", "lid"],
               right_values=["val"], right_key="rk", how=how,
               num_buckets=8)
    join_kw = {"inner": "JOIN", "left": "LEFT JOIN",
               "right": "RIGHT JOIN", "full": "FULL JOIN"}[how]
    exp = _duck(left, right,
                f"SELECT l.k, l.lid, r.val FROM l {join_kw} r "
                f"ON l.k = r.rk")
    cols = ["k", "lid", "val"]
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols))


def test_many_to_many_enumerates_cross_product(ray_session):
    left = pd.DataFrame({"k": [1, 1, 2], "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": [1, 1, 1, 3], "val": [10, 20, 30, 99]})
    got = _run(left, right, key="k", left_values=["lid"],
               right_values=["val"], num_buckets=4)
    # lid 0 and 1 each match all three k=1 right rows; lid 2 matches none
    pairs = sorted(zip(got.lid.astype(int), got.val.astype(int)))
    assert pairs == [(0, 10), (0, 20), (0, 30), (1, 10), (1, 20), (1, 30)]


def test_string_keys_with_nulls(ray_session):
    left = pd.DataFrame({"k": ["a", None, "b", "c"], "lid": [0, 1, 2, 3]})
    right = pd.DataFrame({"k": ["a", None, "c"], "val": [1, 2, 3]})
    got = _run(left, right, key="k", left_values=["k", "lid"],
               right_values=["val"], how="left", num_buckets=4)
    assert len(got) == 4
    by = got.set_index("lid")
    assert by.loc[0, "val"] == 1
    assert pd.isna(by.loc[1, "val"])  # null key: no match, still emitted
    assert pd.isna(by.loc[2, "val"])  # unmatched key
    assert by.loc[3, "val"] == 3


def test_disjoint_keys_inner_is_empty_with_schema(ray_session):
    from verify_ray.pipelines.joins import hash_join

    left = pd.DataFrame({"k": [1, 2], "lid": [0, 1]})
    right = pd.DataFrame({"k": [3, 4], "val": [9, 9]})
    out = hash_join(_ds(left), _ds(right), key="k", left_values=["lid"],
                    right_values=["val"], num_buckets=4)
    # Dataset-level schema is the contract (Ray's to_pandas drops
    # columns when every block is empty)
    assert out.schema().names == ["lid", "val"]
    assert out.count() == 0


def test_output_name_collision_raises(ray_session):
    left = pd.DataFrame({"k": [1], "v": [0]})
    right = pd.DataFrame({"k": [1], "v": [1]})
    with pytest.raises(ValueError, match="collide"):
        _run(left, right, key="k", left_values=["v"], right_values=["v"])


def test_full_outer_emits_null_key_rows_both_sides(ray_session):
    left = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                         "lid": [0, 1]})
    right = pd.DataFrame({"k": pd.array([2, None], dtype="Int64"),
                          "val": [20, 99]})
    got = _run(left, right, key="k", left_values=["lid"],
               right_values=["val"], how="full", num_buckets=4)
    # no key matches: all four rows surface exactly once, half-null
    assert len(got) == 4
    assert sorted(got.lid.dropna().astype(int)) == [0, 1]
    assert sorted(got.val.dropna().astype(int)) == [20, 99]
    assert int(got.lid.isna().sum()) == 2 and int(got.val.isna().sum()) == 2


@pytest.mark.parametrize("name,tables", [
    ("hash_join_lineitem_orders", ("lineitem", "orders")),
    ("hash_join_events_customers", ("events", "customer")),
    ("hash_join_customers_events_full", ("events", "customer")),
    ("orphan_events_anti", ("events", "customer")),
    ("customers_with_events_semi", ("events", "customer")),
])
def test_driver_query_matches_oracle(ray_session, name, tables):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()[name](sf).reset_index(drop=True)
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = con.execute(e.oracle_sql()[name]).df()
    cols = list(orc.columns)
    assert list(mine.columns) == cols
    pd.testing.assert_frame_equal(_canon(mine, cols), _canon(orc, cols))


def test_composite_key_differential(ray_session):
    rng = np.random.RandomState(21)
    n = 600
    left = pd.DataFrame({
        "k1": rng.choice(["a", "b", "c"], n),
        "k2": pd.array(rng.randint(0, 5, n), dtype="Int64"),
        "lid": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({
        "r1": rng.choice(["a", "b", "c", "d"], 300),
        "r2": pd.array(rng.randint(0, 5, 300), dtype="Int64"),
        "val": np.arange(300, dtype=np.int64)})
    left.loc[left.index % 13 == 0, "k2"] = None
    got = _run(left, right, key=["k1", "k2"], right_key=["r1", "r2"],
               left_values=["lid"], right_values=["val"], how="left",
               num_buckets=8)
    exp = _duck(left, right,
                "SELECT l.lid, r.val FROM l LEFT JOIN r "
                "ON l.k1 = r.r1 AND l.k2 = r.r2")
    cols = ["lid", "val"]
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols))


def test_composite_key_arity_mismatch_raises(ray_session):
    left = pd.DataFrame({"k1": ["a"], "k2": [1], "lid": [0]})
    right = pd.DataFrame({"r1": ["a"], "val": [1]})
    with pytest.raises(ValueError, match="arity"):
        _run(left, right, key=["k1", "k2"], right_key="r1",
             left_values=["lid"], right_values=["val"])


def test_broadcast_join_differential(ray_session):
    from verify_ray.pipelines.joins import broadcast_join

    rng = np.random.RandomState(9)
    fact = pd.DataFrame({
        "k": pd.array(rng.randint(0, 30, 500), dtype="Int64"),
        "fid": np.arange(500, dtype=np.int64)})
    fact.loc[fact.index % 17 == 0, "k"] = None
    dim = pa.table({"dk": pa.array(np.arange(0, 20), type=pa.int64()),
                    "name": pa.array([f"n{i}" for i in range(20)])})
    for how in ("left", "inner"):
        got = (broadcast_join(_ds(fact), dim, key="k",
                              values=["name"], right_key="dk", how=how)
               .to_pandas())
        join_kw = "LEFT JOIN" if how == "left" else "JOIN"
        exp = _duck(fact, dim.to_pandas().rename(columns={}),
                    f"SELECT l.k, l.fid, r.name FROM l {join_kw} r "
                    f"ON l.k = r.dk")
        cols = ["k", "fid", "name"]
        assert len(got) == len(exp), how
        pd.testing.assert_frame_equal(_canon(got, cols),
                                      _canon(exp, cols))


def test_broadcast_join_rejects_duplicate_dimension_keys(ray_session):
    from verify_ray.pipelines.joins import broadcast_join

    fact = pd.DataFrame({"k": [1], "fid": [0]})
    dim = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                    "name": ["a", "b"]})
    with pytest.raises(ValueError, match="not unique"):
        broadcast_join(_ds(fact), dim, key="k", values=["name"])


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_semi_anti_differential(ray_session, how):
    left, right = _rand_frames(seed=31 if how == "semi" else 32)
    got = _run(left, right, key="k", left_values=["k", "lid"],
               right_values=[], right_key="rk", how=how, num_buckets=8)
    pred = "EXISTS" if how == "semi" else "NOT EXISTS"
    exp = _duck(left, right,
                f"SELECT l.k, l.lid FROM l WHERE {pred} "
                f"(SELECT 1 FROM r WHERE r.rk = l.k)")
    cols = ["k", "lid"]
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols))


def test_semi_anti_null_key_vs_zero_key(ray_session):
    # a null right key must NOT shadow (or be shadowed by) a real 0 key
    # in the map-side distinct pass
    left = pd.DataFrame({"k": pd.array([0, 1, None], dtype="Int64"),
                         "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": pd.array([None, 0], dtype="Int64")})
    semi = _run(left, right, key="k", left_values=["lid"],
                right_values=[], how="semi", num_buckets=4)
    assert sorted(semi.lid.astype(int)) == [0]  # k=0 matches
    anti = _run(left, right, key="k", left_values=["lid"],
                right_values=[], how="anti", num_buckets=4)
    # k=1 unmatched; null-key left row qualifies for NOT EXISTS
    assert sorted(anti.lid.astype(int)) == [1, 2]


def test_semi_anti_reject_right_values(ray_session):
    left = pd.DataFrame({"k": [1], "lid": [0]})
    right = pd.DataFrame({"k": [1], "v": [9]})
    with pytest.raises(ValueError, match="left columns only"):
        _run(left, right, key="k", left_values=["lid"],
             right_values=["v"], how="semi")


def test_mixed_int_string_key_types_bucket_together(ray_session):
    # int left key joined to digit-string right key: both sides must
    # bucket under the SHARED key type or matches silently vanish
    left = pd.DataFrame({"k": pd.array([1, 2, 3], dtype="Int64"),
                         "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": ["1", "3", "9"], "val": [10, 30, 90]})
    got = _run(left, right, key="k", left_values=["lid"],
               right_values=["val"], num_buckets=8)
    assert sorted(zip(got.lid.astype(int), got.val.astype(int))) == \
        [(0, 10), (2, 30)]
