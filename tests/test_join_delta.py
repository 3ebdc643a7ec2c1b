"""joins.join_delta: incremental inner-join maintenance (insert-only
delta rule ΔL⋈R_old ∪ L_old⋈ΔR ∪ ΔL⋈ΔR)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df: pd.DataFrame, blocks: int = 2):
    import ray.data as rd

    t = pa.Table.from_pandas(df, preserve_index=False)
    n = max(1, t.num_rows)
    step = max(1, n // blocks)
    return rd.from_arrow([t.slice(i, step)
                          for i in range(0, t.num_rows, step)] or [t])


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(list(df.columns))
            .reset_index(drop=True))


def _recompute_diff(l_old, l_new, r_old, r_new, key, rkey):
    # the delta rule stated directly: three disjoint pair categories
    a = l_new.merge(r_old, left_on=key, right_on=rkey)
    b = l_old.merge(r_new, left_on=key, right_on=rkey)
    c = l_new.merge(r_new, left_on=key, right_on=rkey)
    return pd.concat([a, b, c], ignore_index=True)


def test_join_delta_matches_recompute_diff(ray_session):
    from verify_ray.pipelines.joins import join_delta

    rng = np.random.default_rng(5)
    lo = pd.DataFrame({"k": rng.integers(0, 20, 80),
                       "lv": rng.integers(0, 9, 80)})
    ld = pd.DataFrame({"k": rng.integers(0, 20, 30),
                       "lv": rng.integers(0, 9, 30)})
    ro = pd.DataFrame({"rk": rng.integers(0, 20, 60),
                       "rv": rng.integers(0, 9, 60)})
    rd_ = pd.DataFrame({"rk": rng.integers(0, 20, 25),
                        "rv": rng.integers(0, 9, 25)})
    out = join_delta(_ds(lo), _ds(ld), _ds(ro), _ds(rd_),
                     key="k", right_key="rk",
                     left_values=["k", "lv"], right_values=["rv"],
                     num_buckets=4).to_pandas()
    ref = _recompute_diff(lo, ld, ro, rd_, "k", "rk")[
        ["k", "lv", "rv"]]
    pd.testing.assert_frame_equal(_norm(out), _norm(ref),
                                  check_dtype=False)


def test_join_delta_empty_deltas_and_null_keys(ray_session):
    from verify_ray.pipelines.joins import join_delta

    lo = pd.DataFrame({"k": pd.array([1, 2, None], dtype="Int64"),
                       "lv": [10, 20, 30]})
    ro = pd.DataFrame({"rk": pd.array([1, None], dtype="Int64"),
                       "rv": [7, 8]})
    empty_l = lo.iloc[0:0]
    empty_r = ro.iloc[0:0]
    # both deltas empty -> no new join rows at all
    out = join_delta(_ds(lo), _ds(empty_l), _ds(ro), _ds(empty_r),
                     key="k", right_key="rk",
                     left_values=["k", "lv"], right_values=["rv"],
                     num_buckets=2)
    assert out.count() == 0
    # delta row with a null key matches nothing (SQL)
    ld = pd.DataFrame({"k": pd.array([None], dtype="Int64"),
                       "lv": [99]})
    out2 = join_delta(_ds(lo), _ds(ld), _ds(ro), _ds(empty_r),
                      key="k", right_key="rk",
                      left_values=["k", "lv"], right_values=["rv"],
                      num_buckets=2)
    assert out2.count() == 0


def test_join_delta_categories(ray_session):
    from verify_ray.pipelines.joins import join_delta

    # one key per category: old×old (excluded), ΔL×old, old×ΔR, Δ×Δ
    lo = pd.DataFrame({"k": [1, 2], "lv": [1, 2]})
    ld = pd.DataFrame({"k": [1, 3], "lv": [10, 30]})
    ro = pd.DataFrame({"rk": [1, 2], "rv": [100, 200]})
    rd_ = pd.DataFrame({"rk": [2, 3], "rv": [201, 300]})
    out = _norm(join_delta(_ds(lo, 1), _ds(ld, 1), _ds(ro, 1),
                           _ds(rd_, 1), key="k", right_key="rk",
                           left_values=["k", "lv"],
                           right_values=["rv"],
                           num_buckets=2).to_pandas())
    ref = _norm(pd.DataFrame({
        "k": [1, 2, 3], "lv": [10, 2, 30],
        "rv": [100, 201, 300]}))
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
