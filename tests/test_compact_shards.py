"""compact_shards small-file compaction: deterministic whole-file
packing plan, data equality, resume skips finished shards."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_small_files(d, sizes, start=0):
    os.makedirs(d, exist_ok=True)
    base = start
    for i, n in enumerate(sizes):
        pq.write_table(
            pa.table({"x": pa.array(range(base, base + n), type=pa.int64())}),
            os.path.join(d, f"part-{i:04d}.parquet"))
        base += n
    return base


def test_compact_plan_and_data(ray_session, tmp_path):
    from verify_ray.sinks import compact_shards

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    # 7 files of 10 rows, target 25 -> spans of 3,3,1 files (30,30,10)
    _write_small_files(src, [10] * 7)
    r = compact_shards(src, out, target_rows=25)
    assert r["shards"] == 3
    assert r["written"] == [0, 1, 2] and not r["skipped"]
    assert r["total_rows"] == 70

    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert files == [f"shard-{i:05d}.parquet" for i in range(3)]
    got = pq.read_table(out).column("x").to_pylist()
    assert sorted(got) == list(range(70))
    # shard sizes follow the greedy whole-file plan
    ns = [pq.read_metadata(os.path.join(out, f)).num_rows for f in files]
    assert ns == [30, 30, 10]


def test_compact_resume_skips_done(ray_session, tmp_path):
    from verify_ray.sinks import compact_shards

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write_small_files(src, [10] * 7)
    compact_shards(src, out, target_rows=25)
    # simulate a crash that lost shard 1's marker: it (and only it)
    # must be rewritten on the next run
    os.remove(os.path.join(out, "_shard-00001.done"))
    r = compact_shards(src, out, target_rows=25)
    assert r["written"] == [1] and r["skipped"] == [0, 2]
    got = pq.read_table(out).column("x").to_pylist()
    assert sorted(got) == list(range(70))
