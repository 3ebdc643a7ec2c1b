"""select.grouped_percentile_rank vs a pandas reference and the
driver oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.pipelines.select import grouped_percentile_rank


def _ds(groups, scores, blocks=1):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([f"{i:03d}" for i in range(len(groups))]),
        "g": pa.array(groups, type=pa.string()),
        "s": pa.array(scores, type=pa.int64()),
    })
    return rd.from_arrow(t).repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 5])
def test_rank_matches_pandas(ray_session, blocks):
    rng = np.random.default_rng(9)
    groups = [f"g{i % 4}" for i in range(200)]
    scores = rng.integers(0, 15, 200).tolist()  # heavy ties
    out = (grouped_percentile_rank(_ds(groups, scores, blocks), "g", "s")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    df = pd.DataFrame({"doc_id": [f"{i:03d}" for i in range(200)],
                       "g": groups, "s": scores})
    df["n_less"] = df.groupby("g")["s"].rank(method="min").astype(int) - 1
    df["n_group"] = df.groupby("g")["s"].transform("size")
    assert out.n_less.tolist() == df.n_less.tolist()
    assert out.n_group.tolist() == df.n_group.tolist()
    assert out.score.tolist() == df.s.tolist()


def test_null_group_and_score_dropped(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(["a", "b", "c", "d"]),
                  "g": pa.array(["x", None, "x", "x"]),
                  "s": pa.array([1, 2, None, 3], type=pa.int64())})
    out = (grouped_percentile_rank(rd.from_arrow(t), "g", "s")
           .to_pandas().sort_values("doc_id"))
    assert out.doc_id.tolist() == ["a", "d"]
    assert out.n_less.tolist() == [0, 1]
    assert out.n_group.tolist() == [2, 2]


def test_driver_percentile_rank_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["percentile_rank"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = con.execute(e.oracle_sql()["percentile_rank"]).df()
    ints = {c: "int64" for c in ["score", "n_less", "n_group"]}
    assert len(mine) == len(orc) and len(mine) > 0
    pd.testing.assert_frame_equal(mine.astype(ints), orc.astype(ints),
                                  check_dtype=False)
