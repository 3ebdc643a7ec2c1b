"""survivorship.golden_records: field-wise survivorship rules."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df: pd.DataFrame, blocks: int = 2):
    import ray.data as rd

    t = pa.Table.from_pandas(df, preserve_index=False)
    step = max(1, t.num_rows // blocks)
    return rd.from_arrow([t.slice(i, step)
                          for i in range(0, t.num_rows, step)])


def test_mode_tie_breaks_to_smallest(ray_session):
    from verify_ray.pipelines.survivorship import golden_records

    df = pd.DataFrame({
        "cl": [1, 1, 1, 1],
        "name": ["zeta", "zeta", "alpha", "alpha"],
        "ts": [1, 2, 3, 4], "id": [1, 2, 3, 4]})
    out = golden_records(_ds(df), "cl", {"name": "mode"},
                         num_buckets=2).to_pandas()
    assert out["name_mode"].tolist() == ["alpha"]


def test_latest_null_survives(ray_session):
    from verify_ray.pipelines.survivorship import golden_records

    # the freshest row asserts NULL: survivorship keeps it
    df = pd.DataFrame({
        "cl": [1, 1], "v": ["old", None],
        "ts": [1, 2], "id": [1, 2]})
    out = golden_records(_ds(df, 1), "cl", {"v": "latest"},
                         order_col="ts", id_col="id",
                         num_buckets=2).to_pandas()
    assert out["v_latest"].isna().all()


def test_latest_tiebreak_on_id(ray_session):
    from verify_ray.pipelines.survivorship import golden_records

    df = pd.DataFrame({
        "cl": [1, 1], "v": ["a", "b"], "ts": [5, 5], "id": [1, 2]})
    out = golden_records(_ds(df, 1), "cl", {"v": "latest"},
                         order_col="ts", id_col="id",
                         num_buckets=2).to_pandas()
    assert out["v_latest"].tolist() == ["b"]


def test_min_max_integer_not_lexicographic(ray_session):
    from verify_ray.pipelines.survivorship import golden_records

    # 9 < 10 numerically but "10" < "9" lexicographically — the
    # integer path must win
    df = pd.DataFrame({
        "cl": [1, 1], "x": pd.array([9, 10], dtype="Int64"),
        "ts": [1, 2], "id": [1, 2]})
    out = golden_records(_ds(df, 1), "cl",
                         {"x": "max"}, num_buckets=2).to_pandas()
    assert out["x_max"].tolist() == [10]
    out2 = golden_records(_ds(df, 1), "cl",
                          {"x": "min"}, num_buckets=2).to_pandas()
    assert out2["x_min"].tolist() == [9]


def test_matches_pandas_reference(ray_session):
    from verify_ray.pipelines.survivorship import golden_records

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({
        "cl": rng.integers(0, 25, n),
        "name": rng.choice(["a", "b", "c", None], n),
        "score": pd.array(rng.integers(0, 50, n), dtype="Int64"),
        "ts": rng.integers(0, 1000, n),
        "id": np.arange(n)})
    out = (golden_records(_ds(df, 4), "cl",
                          {"name": "mode", "score": "max",
                           "id": "latest"},
                          order_col="ts", id_col="id",
                          num_buckets=4)
           .to_pandas().sort_values("cl").reset_index(drop=True))

    def ref_of(g):
        nn = g.dropna(subset=["name"])
        if len(nn):
            cnt = nn.groupby("name").size()
            mode = sorted(cnt[cnt == cnt.max()].index)[0]
        else:
            mode = None
        win = g.sort_values(["ts", "id"]).iloc[-1]
        return pd.Series({"name_mode": mode,
                          "score_max": g.score.max(),
                          "id_latest": win.id})

    ref = (df.groupby("cl").apply(ref_of, include_groups=False)
           .reset_index().rename(columns={"cl": "cl"}))
    out["cl"] = out["cl"].astype("int64")
    pd.testing.assert_frame_equal(
        out[["cl", "name_mode", "score_max", "id_latest"]],
        ref[["cl", "name_mode", "score_max", "id_latest"]],
        check_dtype=False)
