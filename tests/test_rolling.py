"""rolling_window_agg vs a brute-force reference (ties, null keys,
null sum values) and the driver's DuckDB RANGE-window oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute(df, span):
    out_c, out_s = [], []
    for _, r in df.iterrows():
        same = df[(df.k.isna() if pd.isna(r.k) else (df.k == r.k))]
        w = same[(same.ts >= r.ts - span) & (same.ts <= r.ts)]
        out_c.append(len(w))
        out_s.append(int(w.v.fillna(0).sum()))
    return np.array(out_c), np.array(out_s)


@pytest.mark.parametrize("seed", [0, 1])
def test_vs_brute_force(ray_session, seed):
    import ray.data as rd

    from verify_ray.pipelines.rolling import rolling_window_agg

    rng = np.random.RandomState(seed)
    n = 250
    df = pd.DataFrame({
        "k": rng.randint(0, 5, n).astype(np.int64),
        "ts": rng.randint(0, 100, n).astype(np.int64),  # many ts ties
        "v": rng.randint(0, 50, n).astype(np.int64),
        "rid": np.arange(n, dtype=np.int64)})
    df.loc[::17, "k"] = None  # null keys: one partition (SQL windows)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (rolling_window_agg(ds, key="k", ts="ts", span_us=20,
                              sum_cols=["v"], num_buckets=8)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    c, s = _brute(df, span=20)
    np.testing.assert_array_equal(out.w_count.to_numpy(), c)
    np.testing.assert_array_equal(out.w_sum_v.to_numpy(), s)


def test_float_sum_col_rejected(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.rolling import rolling_window_agg

    ds = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                 "ts": pa.array([1], pa.int64()),
                                 "v": pa.array([1.0])}))
    with pytest.raises(ValueError, match="integer"):
        rolling_window_agg(ds, key="k", ts="ts", span_us=10,
                           sum_cols=["v"])


def test_driver_oracle(ray_session):
    duckdb = __import__("duckdb")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["events_rolling_1h"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = con.execute(e.oracle_sql()["events_rolling_1h"]).df()
    pd.testing.assert_frame_equal(mine.astype("int64"),
                                  orc.astype("int64"))
