"""rolling.keyed_scan: per-key LAG gap + running sum."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 3):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)]
                         if n else tbl)


def test_keyed_scan_small(ray_session):
    from verify_ray.pipelines.rolling import keyed_scan

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, None], type=pa.int64()),
        "ts": pa.array([100, 50, 200, 30, 10], type=pa.timestamp("us")),
        "i": pa.array([10, 11, 12, 20, 30], type=pa.int64()),
        "v": pa.array([5, 3, 2, 7, 9], type=pa.int64())})
    out = (keyed_scan(_ds(t, 2), "k", "ts", "i", "v", num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # key 1 in ts order: (50,i11,v3) (100,i10,v5) (200,i12,v2)
    by_id = out.set_index("id")
    assert np.isnan(by_id.loc[11, "gap_us"])
    assert by_id.loc[10, "gap_us"] == 50
    assert by_id.loc[12, "gap_us"] == 100
    assert by_id.loc[11, "run_sum"] == 3
    assert by_id.loc[10, "run_sum"] == 8
    assert by_id.loc[12, "run_sum"] == 10
    assert by_id.loc[20, "run_sum"] == 7
    assert 30 not in by_id.index  # null key drops


def test_keyed_scan_null_value_keeps_row(ray_session):
    # review fix: a null VALUE contributes 0 but the row keeps its
    # place in the order (dropping it would corrupt the next gap)
    from verify_ray.pipelines.rolling import keyed_scan

    t = pa.table({
        "k": pa.array([1, 1, 1], type=pa.int64()),
        "ts": pa.array([10, 20, 30], type=pa.timestamp("us")),
        "i": pa.array([1, 2, 3], type=pa.int64()),
        "v": pa.array([5, None, 2], type=pa.int64())})
    out = (keyed_scan(_ds(t, 1), "k", "ts", "i", "v", num_buckets=2)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["id"].tolist() == [1, 2, 3]  # null-v row survives
    assert out.loc[2, "gap_us"] == 10  # gap vs row 2, not row 1
    assert out["run_sum"].tolist() == [5, 5, 7]


def test_keyed_scan_string_keys(ray_session):
    # review fix: string keys bucket by md5 (was: hard int64 cast)
    from verify_ray.pipelines.rolling import keyed_scan

    t = pa.table({
        "k": pa.array(["b", "a", "b"], type=pa.string()),
        "ts": pa.array([10, 5, 30], type=pa.timestamp("us")),
        "i": pa.array([1, 2, 3], type=pa.int64()),
        "v": pa.array([1, 2, 4], type=pa.int64())})
    out = (keyed_scan(_ds(t, 1), "k", "ts", "i", "v", num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["key"].tolist() == ["b", "a", "b"]
    assert out["run_sum"].tolist() == [1, 2, 5]


def test_rolling_distinct_small(ray_session):
    import duckdb

    from verify_ray.pipelines.rolling import rolling_window_agg

    rng = np.random.default_rng(17)
    n = 300
    df = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 10, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 100, n).astype(np.int64)
                       .astype("datetime64[us]")),
        "c": pa.array(rng.choice(["a", "b", "c", None], n))})
    out = (rolling_window_agg(_ds(df, 4), "k", "ts", span_us=20,
                              distinct_cols=["c"], num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    pdf = df.to_pandas()
    ref = duckdb.sql("""
        SELECT id, CAST(COUNT(DISTINCT c) OVER w AS BIGINT) AS d
        FROM pdf WINDOW w AS (PARTITION BY k ORDER BY ts
            RANGE BETWEEN INTERVAL 20 MICROSECONDS PRECEDING
                  AND CURRENT ROW)
        ORDER BY id""").df()
    assert out["w_distinct_c"].tolist() == ref["d"].tolist()


def test_rolling_distinct_max_card_guard(ray_session):
    import pytest

    from verify_ray.pipelines.rolling import rolling_window_agg

    n = 100
    t = pa.table({
        "k": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64)
                       .astype("datetime64[us]")),
        "c": pa.array([f"v{i}" for i in range(n)])})
    ds = _ds(t, 1)
    with pytest.raises(Exception, match="max_card"):
        rolling_window_agg(ds, "k", "ts", span_us=10,
                           distinct_cols=["c"], max_card=8,
                           num_buckets=2).to_pandas()


def test_keyed_scan_matches_pandas(ray_session):
    from verify_ray.pipelines.rolling import keyed_scan

    rng = np.random.default_rng(9)
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 25, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 50, n).astype(np.int64)
                       .astype("datetime64[us]")),
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 9, n).astype(np.int64))})
    out = (keyed_scan(_ds(t, 5), "k", "ts", "i", "v", num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = (t.to_pandas()
          .assign(ts_us=lambda d: d["ts"].astype(np.int64))
          .sort_values(["k", "ts_us", "i"], kind="stable"))
    df["gap_us"] = df.groupby("k")["ts_us"].diff()
    df["run_sum"] = df.groupby("k")["v"].cumsum()
    ref = (df.rename(columns={"i": "id"}).sort_values("id")
           .reset_index(drop=True))
    assert out["run_sum"].tolist() == ref["run_sum"].tolist()
    pd.testing.assert_series_equal(out["gap_us"].astype("float64"),
                                   ref["gap_us"].astype("float64"),
                                   check_names=False)
