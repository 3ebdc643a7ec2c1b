"""Property-based differential for hash_join: random small frames with
nulls and duplicate keys, every join mode, DuckDB as the ground truth.
Bounded examples (each runs a Ray pipeline); the fixed-seed
differentials in test_hash_join.py remain the broad-coverage net."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

_JOIN_SQL = {
    "inner": "SELECT l.k, l.lid, r.val FROM l JOIN r ON l.k = r.rk",
    "left": "SELECT l.k, l.lid, r.val FROM l LEFT JOIN r ON l.k = r.rk",
    "right": "SELECT l.k, l.lid, r.val FROM l RIGHT JOIN r ON l.k = r.rk",
    "full": "SELECT l.k, l.lid, r.val FROM l FULL JOIN r ON l.k = r.rk",
    "semi": ("SELECT l.k, l.lid FROM l WHERE EXISTS "
             "(SELECT 1 FROM r WHERE r.rk = l.k)"),
    "anti": ("SELECT l.k, l.lid FROM l WHERE NOT EXISTS "
             "(SELECT 1 FROM r WHERE r.rk = l.k)"),
}


def _canon(df):
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].astype("float64")
    return (out.sort_values(list(out.columns), kind="stable",
                            na_position="last").reset_index(drop=True))


@settings(max_examples=10, deadline=None)
@given(
    data=st.data(),
    mode=st.sampled_from(["inner", "left", "right", "full",
                          "semi", "anti"]),
)
def test_hash_join_matches_duckdb(ray_session, data, mode):
    import ray.data as rd

    from verify_ray.pipelines.joins import hash_join

    key = st.one_of(st.integers(min_value=0, max_value=5), st.none())
    lkeys = data.draw(st.lists(key, min_size=0, max_size=25))
    rkeys = data.draw(st.lists(key, min_size=0, max_size=25))
    left = pd.DataFrame({"k": pd.array(lkeys, dtype="Int64"),
                         "lid": np.arange(len(lkeys), dtype=np.int64)})
    right = pd.DataFrame({"rk": pd.array(rkeys, dtype="Int64"),
                          "val": np.arange(len(rkeys), dtype=np.int64)})
    semi_anti = mode in ("semi", "anti")
    out = hash_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        key="k", right_key="rk",
        left_values=["k", "lid"],
        right_values=[] if semi_anti else ["val"],
        how=mode, num_buckets=4)
    cols = ["k", "lid"] if semi_anti else ["k", "lid", "val"]
    got = out.to_pandas()
    if got.empty:
        got = pd.DataFrame({c: pd.Series(dtype="float64") for c in cols})
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute(_JOIN_SQL[mode]).df()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_canon(got[cols]), _canon(exp[cols]),
                                  check_dtype=False)
