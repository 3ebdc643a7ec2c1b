"""repair.impute_nulls: per-group median/mode null filling."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df: pd.DataFrame, blocks: int = 2):
    import ray.data as rd

    t = pa.Table.from_pandas(df, preserve_index=False)
    step = max(1, t.num_rows // blocks)
    return rd.from_arrow([t.slice(i, step)
                          for i in range(0, t.num_rows, step)])


def test_impute_median_lower_rule(ray_session):
    from verify_ray.pipelines.repair import impute_nulls

    # group a non-nulls {1, 3, 7, 9}: n=4, lower median = value at
    # rank ceil(4/2)=2 -> 3 (never the 5.0 average)
    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 3,
        "v": pd.array([1, 3, 7, 9, None, 5, 5, None],
                      dtype="Int64")})
    out = (impute_nulls(_ds(df).materialize(), "v", "g",
                        strategy="median")
           .to_pandas())
    assert out.loc[out.v.isna()].empty
    assert sorted(out[out.g == "a"].v) == [1, 3, 3, 7, 9]
    assert sorted(out[out.g == "b"].v) == [5, 5, 5]


def test_impute_mode_tie_smallest_and_untouched_rows(ray_session):
    from verify_ray.pipelines.repair import impute_nulls

    df = pd.DataFrame({
        "g": ["x"] * 5,
        "v": pd.array([4, 4, 2, 2, None], dtype="Int64")})
    out = (impute_nulls(_ds(df, 1).materialize(), "v", "g",
                        strategy="mode").to_pandas())
    # tie {4:2, 2:2} -> smallest value 2
    assert sorted(out.v) == [2, 2, 2, 4, 4]


def test_impute_keeps_null_when_no_fill_exists(ray_session):
    from verify_ray.pipelines.repair import impute_nulls

    df = pd.DataFrame({
        "g": ["only_nulls", "only_nulls", None],
        "v": pd.array([None, None, None], dtype="Int64")})
    out = (impute_nulls(_ds(df, 1).materialize(), "v", "g")
           .to_pandas())
    assert out.v.isna().all()


def test_impute_matches_pandas_reference(ray_session):
    from verify_ray.pipelines.repair import impute_nulls

    rng = np.random.default_rng(6)
    n = 600
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "v": pd.array(rng.integers(0, 40, n), dtype="Int64")})
    df.loc[df.sample(frac=0.2, random_state=1).index, "v"] = None

    def lower_median(s):
        s = np.sort(s.dropna().astype(int).to_numpy())
        return int(s[(len(s) + 1) // 2 - 1])

    fills = df.groupby("g")["v"].apply(lower_median)
    ref = df.copy()
    for g, f in fills.items():
        ref.loc[(ref.g == g) & ref.v.isna(), "v"] = f
    out = (impute_nulls(_ds(df, 3).materialize(), "v", "g")
           .to_pandas())
    assert sorted(out.v.astype(int)) == sorted(ref.v.astype(int))
