"""Regression tests for the round-3 ADVICE findings (fixed round 4):

1. jsonx Python fallback crashed the whole batch on strings like
   "--5" (lstrip("-") stripped every minus sign, int() then raised).
2. rolling_window_agg distinct_cols: the null fill ("") counted toward
   max_card and collided with a genuine empty-string category.
3. analytics.pivot_counts on an empty input returned object-dtype
   count columns (non-empty path: int64).
"""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 3):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)]
                         if n else tbl)


def test_jsonx_fallback_double_minus_string(monkeypatch):
    from verify_ray.functions import jsonx

    cases = pa.array(['{"k": "--5"}', '{"k": "-5"}', '{"k": "5-"}',
                      '{"k": ""}', '{"k": "-"}'], type=pa.string())
    duck = jsonx.json_extract_int64(cases, "$.k").to_pylist()
    monkeypatch.setitem(sys.modules, "duckdb", None)  # import -> error
    py = jsonx.json_extract_int64(cases, "$.k").to_pylist()
    assert py == duck == [None, -5, None, None, None]


def test_rolling_distinct_nulls_dont_count_toward_max_card(ray_session):
    # max_card real values PLUS nulls must not raise
    from verify_ray.pipelines.rolling import rolling_window_agg

    n = 60
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(np.zeros(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64)
                       .astype("datetime64[us]")),
        "c": pa.array([["a", "b", None][i % 3] for i in range(n)])})
    out = (rolling_window_agg(_ds(t, 2), "k", "ts", span_us=5,
                              distinct_cols=["c"], max_card=2,
                              num_buckets=2)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert len(out) == n  # did not raise despite nulls present


def test_rolling_distinct_empty_string_vs_null(ray_session):
    # "" is a genuine category distinct from NULL (SQL COUNT(DISTINCT)
    # skips NULLs, counts "")
    import duckdb

    from verify_ray.pipelines.rolling import rolling_window_agg

    rng = np.random.default_rng(41)
    n = 200
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 4, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 60, n).astype(np.int64)
                       .astype("datetime64[us]")),
        "c": pa.array(rng.choice(["a", "", None], n))})
    out = (rolling_window_agg(_ds(t, 3), "k", "ts", span_us=15,
                              distinct_cols=["c"], num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT id, CAST(COUNT(DISTINCT c) OVER w AS BIGINT) AS d
        FROM pdf WINDOW w AS (PARTITION BY k ORDER BY ts
            RANGE BETWEEN INTERVAL 15 MICROSECONDS PRECEDING
                  AND CURRENT ROW)
        ORDER BY id""").df()
    assert out["w_distinct_c"].tolist() == ref["d"].tolist()


def test_pivot_counts_empty_input_dtypes(ray_session):
    from verify_ray.pipelines.analytics import pivot_counts

    t = pa.table({"u": pa.array([], type=pa.string()),
                  "d": pa.array([], type=pa.string())})
    out = pivot_counts(_ds(t, 1), "u", "d", ["mon", "tue"])
    assert list(out.columns) == ["u", "n_mon", "n_tue"]
    assert out["n_mon"].dtype == np.dtype("int64")
    assert out["n_tue"].dtype == np.dtype("int64")
    assert out["u"].dtype == np.dtype(object)
    assert len(out) == 0
