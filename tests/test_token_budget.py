"""token_budget_sample — per-group budgeted deterministic selection.

Ground truth is the window-function form the SQL oracle uses: within a
group, order by (md5_number_upper(key), key) and keep a row iff the
cumulative weight BEFORE it is < the group's budget.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from verify_ray.functions.hashing import md5_u64le
from verify_ray.pipelines.sample import token_budget_sample


def _mkdf(n=200, groups=("a", "b", "c"), seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(groups, size=n),
        "w": rng.integers(1, 50, size=n).astype(np.int64),
    })


def _brute(df, budgets):
    """Reference kept-set via explicit per-group priority sort."""
    keep = set()
    for g, gdf in df[df.source.isin(budgets)].groupby("source"):
        k = gdf.doc_id.astype(str)
        h = md5_u64le(pa.array(k.tolist()))
        order = gdf.assign(h=h, k=k).sort_values(["h", "k"])
        before = order.w.cumsum() - order.w
        keep |= set(order.doc_id[before < budgets[g]])
    return keep


def _run(df, budgets, **kw):
    import ray.data as rd

    out = token_budget_sample(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .materialize(),
        budgets, weight_col="w", **kw).to_pandas()
    return out


def test_matches_brute_force(ray_session):
    df = _mkdf()
    totals = df.groupby("source").w.sum()
    budgets = {"a": int(totals["a"] * 0.4), "b": int(totals["b"] * 0.7),
               "c": 10_000_000}          # c: whole group kept
    out = _run(df, budgets)
    assert set(out.doc_id) == _brute(df, budgets)
    # schema passthrough: exact input columns, no helper columns
    assert list(out.columns) == ["doc_id", "source", "w"]
    # group c fully kept
    assert (out.source == "c").sum() == (df.source == "c").sum()


def test_boundary_range_shared(ray_session):
    """coarse_shift=62 -> only 4 h-ranges, so the boundary range holds
    ~a quarter of each group and the exact driver resolution is truly
    exercised (at the default shift every doc has its own range)."""
    df = _mkdf(n=400, seed=11)
    totals = df.groupby("source").w.sum()
    budgets = {g: int(totals[g] * 0.5) for g in ("a", "b", "c")}
    out = _run(df, budgets, coarse_shift=62)
    assert set(out.doc_id) == _brute(df, budgets)


def test_nested_budgets(ray_session):
    """Raising a budget only ever ADDS documents (mixture experiments
    rely on this)."""
    df = _mkdf(n=150, seed=3)
    small = _run(df, {"a": 300, "b": 100})
    big = _run(df, {"a": 900, "b": 400})
    assert set(small.doc_id) <= set(big.doc_id)


def test_edges(ray_session):
    df = _mkdf(n=60, seed=5)
    # zero budget -> group empty; absent group -> ignored;
    # group not in budgets -> dropped
    out = _run(df, {"a": 0, "b": 10_000_000, "zzz": 50})
    assert (out.source == "a").sum() == 0
    assert (out.source == "c").sum() == 0
    assert set(out[out.source == "b"].doc_id) == set(
        df[df.source == "b"].doc_id)


def test_null_keys_never_selected(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1, None, 3, None, 5], type=pa.int64()),
        "source": ["a"] * 5,
        "w": pa.array([1, 1, 1, 1, 1], type=pa.int64()),
    })
    out = token_budget_sample(rd.from_arrow(t).materialize(),
                              {"a": 100}, weight_col="w").to_pandas()
    assert set(out.doc_id) == {1, 3, 5}


def test_duckdb_window_parity(ray_session):
    """The exact oracle form the driver runs (window-function SQL)."""
    duckdb = __import__("duckdb")
    df = _mkdf(n=120, seed=19)
    budgets = {"a": 400, "b": 250}
    out = _run(df, budgets).sort_values("doc_id").reset_index(drop=True)
    sql = duckdb.sql("""
        WITH sel AS (
          SELECT doc_id, source, w,
                 COALESCE(SUM(w) OVER (
                     PARTITION BY source
                     ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)),
                              CAST(doc_id AS VARCHAR)
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS before_w
          FROM df WHERE source IN ('a', 'b'))
        SELECT doc_id, source, w FROM sel
        WHERE before_w < CASE source WHEN 'a' THEN 400 ELSE 250 END
        ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(
        out.astype({"doc_id": "int64", "w": "int64"}),
        sql.astype({"doc_id": "int64", "w": "int64"}))
