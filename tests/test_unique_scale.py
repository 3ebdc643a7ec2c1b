"""Skew/hot-key behavior of the uniqueness hash exchange."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_hot_key_preaggregation(ray_session, tmp_path):
    """A key duplicated 100k× must cost ~one row per map task in the
    exchange (per-task value_counts pre-aggregation), and be reported
    once with its full count."""
    from verify_ray.stages.unique import unique_violations_from_files

    files = []
    for i in range(4):
        n = 50_000
        ids = np.array([f"id-{i}-{j}" for j in range(n)], dtype=object)
        ids[::2] = "HOT"  # 25k copies of one key in every file
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(pa.table({"doc_id": pa.array(ids)}), p)
        files.append(p)
    uv = unique_violations_from_files(files, "doc_id")
    rows = {r["doc_id"]: r for r in uv.to_pylist()}
    assert set(rows) == {"HOT"}
    assert "(100000 occurrences)" in rows["HOT"]["message"]


def test_cross_file_duplicates_only(ray_session, tmp_path):
    from verify_ray.stages.unique import unique_violations_from_files

    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(["x", "y", "z"])}), p1)
    pq.write_table(pa.table({"doc_id": pa.array(["z", "w", None])}), p2)
    uv = unique_violations_from_files([p1, p2], "doc_id")
    assert uv.column("doc_id").to_pylist() == ["z"]
