"""analytics.grouped_regression: exact integer OLS sufficient stats."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df: pd.DataFrame, blocks: int = 3):
    import ray.data as rd

    t = pa.Table.from_pandas(df, preserve_index=False)
    step = max(1, t.num_rows // blocks)
    return rd.from_arrow([t.slice(i, step)
                          for i in range(0, t.num_rows, step)])


def _ref(df, key, x, y):
    d = df.dropna(subset=[x, y]).copy()
    d["x"] = d[x].astype("int64")
    d["y"] = d[y].astype("int64")
    rows = []
    for k, g in d.groupby(key):
        n = len(g)
        sx, sy = g.x.sum(), g.y.sum()
        sxx, sxy = (g.x * g.x).sum(), (g.x * g.y).sum()
        rows.append((k, n, sx, sy, sxx, sxy,
                     n * sxy - sx * sy, n * sxx - sx * sx))
    return pd.DataFrame(rows, columns=[
        key, "n", "sum_x", "sum_y", "sum_xx", "sum_xy",
        "slope_num", "slope_den"]).sort_values(key).reset_index(
        drop=True)


def test_grouped_regression_matches_reference(ray_session):
    from verify_ray.pipelines.analytics import grouped_regression

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "x": rng.integers(-5, 50, n),
        "y": rng.integers(-100, 100, n)})
    # plant nulls in both columns (pairwise exclusion)
    df.loc[::17, "x"] = None
    df.loc[::23, "y"] = None
    out = grouped_regression(_ds(df), ["g"], "x", "y")
    ref = _ref(df, "g", "x", "y")
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_grouped_regression_exchange_route(ray_session):
    # partial_budget=0 forces the exchange merge — must equal the
    # driver merge exactly
    from verify_ray.pipelines.analytics import grouped_regression

    rng = np.random.default_rng(12)
    df = pd.DataFrame({
        "g": rng.integers(0, 40, 400),
        "x": rng.integers(0, 10, 400),
        "y": rng.integers(0, 10, 400)})
    a = grouped_regression(_ds(df), ["g"], "x", "y")
    b = grouped_regression(_ds(df), ["g"], "x", "y",
                           partial_budget=0)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_grouped_regression_perfect_line(ray_session):
    from verify_ray.pipelines.analytics import grouped_regression

    x = np.arange(1, 21)
    df = pd.DataFrame({"g": ["z"] * 20, "x": x, "y": 3 * x + 7})
    out = grouped_regression(_ds(df, 2), ["g"], "x", "y")
    assert (out.slope_num / out.slope_den).iloc[0] == 3.0
    # intercept = (sum_y - slope*sum_x)/n
    assert (out.sum_y - 3 * out.sum_x).iloc[0] / 20 == 7.0
