"""write_sharded resumable sink: atomic commit markers, resume skips
committed shards, fingerprint change invalidates, audit from markers."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _mk(n, base):
    import ray.data as rd

    def make():
        make.calls += 1
        return rd.from_arrow(pa.table({
            "x": pa.array(range(base, base + n), type=pa.int64())}))
    make.calls = 0
    return make


def test_write_resume_and_audit(ray_session, tmp_path):
    from verify_ray.sinks import audit_shards, write_sharded

    out = str(tmp_path / "out")
    a, b = _mk(10, 0), _mk(5, 100)
    r1 = write_sharded({"a": a, "b": b}, out, fingerprint="v1")
    assert sorted(r1["written"]) == ["a", "b"]
    assert r1["rows"] == {"a": 10, "b": 5}

    # resume: nothing rebuilt, make_ds not even called
    r2 = write_sharded({"a": a, "b": b}, out, fingerprint="v1")
    assert sorted(r2["skipped"]) == ["a", "b"] and not r2["written"]
    assert a.calls == 1 and b.calls == 1
    assert r2["rows"] == {"a": 10, "b": 5}

    audit = audit_shards(out, fingerprint="v1")
    assert audit["committed"] == ["a", "b"]
    assert audit["total_rows"] == 15


def test_partial_shard_without_marker_is_rebuilt(ray_session, tmp_path):
    from verify_ray.sinks import audit_shards, write_sharded

    out = str(tmp_path / "out")
    a = _mk(10, 0)
    write_sharded({"a": a}, out, fingerprint="v1")
    # simulate a crash AFTER data, BEFORE marker: delete the marker,
    # leave stale data files behind
    os.remove(os.path.join(out, "shard=a", "_SUCCESS.json"))
    assert audit_shards(out, "v1")["stale_or_partial"] == ["a"]

    r = write_sharded({"a": a}, out, fingerprint="v1")
    assert r["written"] == ["a"] and a.calls == 2
    # the rebuild replaced the directory, not appended to it
    t = pq.read_table(os.path.join(out, "shard=a"))
    assert t.num_rows == 10


def test_fingerprint_change_invalidates(ray_session, tmp_path):
    from verify_ray.sinks import write_sharded

    out = str(tmp_path / "out")
    a = _mk(10, 0)
    write_sharded({"a": a}, out, fingerprint="v1")
    r = write_sharded({"a": a}, out, fingerprint="v2")
    assert r["written"] == ["a"] and a.calls == 2


def test_partition_cols_layout(ray_session, tmp_path):
    import ray.data as rd

    from verify_ray.sinks import write_sharded

    out = str(tmp_path / "out")

    def make():
        return rd.from_arrow(pa.table({
            "x": pa.array([1, 2, 3, 4], type=pa.int64()),
            "lang": ["en", "de", "en", "de"]}))

    write_sharded({"s0": make}, out, fingerprint="v1",
                  partition_cols=["lang"])
    sub = os.listdir(os.path.join(out, "shard=s0"))
    assert any(d.startswith("lang=") for d in sub)
    t = pq.read_table(os.path.join(out, "shard=s0"))
    assert sorted(t.column("x").to_pylist()) == [1, 2, 3, 4]
