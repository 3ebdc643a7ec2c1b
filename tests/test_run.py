"""Resumable runner tests: streaming sinks, checkpoints, resume-skips,
spec-hash invalidation (SURVEY §4/§5)."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from verify_ray.run import run
from verify_ray.sources.synth import default_spec_dict


@pytest.fixture(scope="module")
def run_out(ray_session, synth_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("runout"))
    manifest = pq.read_table(synth_dir["manifest"])
    report = run(
        default_spec_dict(max_n_tok=256),
        synth_dir["dir"],
        out,
        manifests={"source_manifest": manifest},
        group_size=3,  # 8 files -> 3 groups
    )
    return {"out": out, "report": report, "manifest": manifest}


def test_report_and_layout(run_out, synth_dir):
    rep = run_out["report"]
    assert rep["n_rows"] == synth_dir["result"].n_rows
    assert rep["groups_total"] == 3 and rep["groups_ran"] == 3
    assert not rep["pass"]
    out = run_out["out"]
    assert os.path.exists(os.path.join(out, "report.json"))
    assert os.path.exists(os.path.join(out, "verdicts.parquet"))
    assert len(glob.glob(os.path.join(out, "groups", "*", "kind=v", "*.parquet"))) >= 3
    assert len(glob.glob(os.path.join(out, "checkpoints", "*.json"))) == 3


def test_violations_match_expected(run_out, synth_dir):
    out = run_out["out"]
    vfiles = glob.glob(os.path.join(out, "groups", "*", "kind=v", "*.parquet"))
    import pyarrow as pa

    vt = pa.concat_tables([pq.read_table(f) for f in vfiles])
    got = set(zip(vt.column("doc_id").to_pylist(),
                  vt.column("rule_id").to_pylist(),
                  vt.column("span").to_pylist()))
    gfiles = glob.glob(os.path.join(out, "violations_global", "unique", "*.parquet"))
    gt = pa.concat_tables([pq.read_table(f) for f in gfiles])
    got |= set(zip(gt.column("doc_id").to_pylist(),
                   gt.column("rule_id").to_pylist(),
                   gt.column("span").to_pylist()))
    exp = synth_dir["result"].expected_violations
    expected = set(zip(exp.column("doc_id").to_pylist(),
                       exp.column("rule_id").to_pylist(),
                       exp.column("span").to_pylist()))
    assert got == expected


def test_verdicts_parquet(run_out, synth_dir):
    vd = pq.read_table(os.path.join(run_out["out"], "verdicts.parquet")).to_pandas()
    vd = vd.set_index("partition_id")
    for exp in synth_dir["result"].expected_verdicts:
        assert bool(vd.loc[exp["partition_id"]]["pass"]) == exp["pass"]
        assert int(vd.loc[exp["partition_id"]]["n_rows"]) == exp["n_rows"]


def test_resume_skips_completed(run_out, synth_dir):
    rep2 = run(
        default_spec_dict(max_n_tok=256),
        synth_dir["dir"],
        run_out["out"],
        manifests={"source_manifest": run_out["manifest"]},
        group_size=3,
    )
    assert rep2["groups_ran"] == 0
    assert rep2["groups_resumed"] == 3
    # outputs unchanged and still correct
    assert rep2["n_violations_narrow"] == run_out["report"]["n_violations_narrow"]
    assert rep2["n_violations_global"] == run_out["report"]["n_violations_global"]


def test_partial_run_resumes(ray_session, synth_dir, tmp_path, run_out):
    """Simulate a crash after one group: drop two checkpoints, re-run,
    only the missing groups execute; final outputs identical."""
    import shutil

    out = str(tmp_path / "partial")
    shutil.copytree(run_out["out"], out)
    for gid in (1, 2):
        os.remove(os.path.join(out, "checkpoints", f"group-{gid:06d}.json"))
    rep = run(
        default_spec_dict(max_n_tok=256),
        synth_dir["dir"],
        out,
        manifests={"source_manifest": run_out["manifest"]},
        group_size=3,
    )
    assert rep["groups_ran"] == 2 and rep["groups_resumed"] == 1
    assert rep["n_violations_narrow"] == run_out["report"]["n_violations_narrow"]


def test_spec_change_invalidates_resume(ray_session, synth_dir, run_out, tmp_path):
    import shutil

    out = str(tmp_path / "specchange")
    shutil.copytree(run_out["out"], out)
    spec = default_spec_dict(max_n_tok=256)
    spec["columns"]["n_tok"]["maximum"] = 64  # stricter spec (synth n_tok < 128)
    rep = run(spec, synth_dir["dir"], out,
              manifests={"source_manifest": run_out["manifest"]}, group_size=3)
    assert rep["groups_ran"] == 3  # nothing resumed
    assert rep["n_violations_narrow"] > run_out["report"]["n_violations_narrow"]


def test_run_with_batch_size(ray_session, synth_dir, tmp_path):
    rep = run(
        default_spec_dict(max_n_tok=256),
        synth_dir["dir"],
        str(tmp_path / "bs"),
        manifests={"source_manifest": pq.read_table(synth_dir["manifest"])},
        group_size=4,
        batch_size=128,
    )
    assert rep["n_violations_narrow"] > 0 and not rep["pass"]


def test_run_heterogeneous_schemas(ray_session, tmp_path):
    """read_projected path through run(): files with different schemas in
    one checkpoint group validate without crashing."""
    import pyarrow as pa

    p1, p2 = str(tmp_path / "h1.parquet"), str(tmp_path / "h2.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(["a1"])}), p1)
    pq.write_table(pa.table({"doc_id": pa.array(["b1"]),
                             "score": pa.array([9.0])}), p2)
    rep = run({"key": "doc_id",
               "columns": {"doc_id": {"dtype": "string"},
                           "score": {"dtype": "float64", "maximum": 1.0}}},
              [p1, p2], str(tmp_path / "out"), group_size=2)
    assert rep["n_violations_narrow"] >= 2  # required_property + bound


def test_stale_group_dirs_not_merged(ray_session, tmp_path):
    """A reused output dir with leftover g=... directories from a prior
    run (different file set / --group-size) must not leak stale partials
    into uniqueness or verdicts (ADVICE.md run.py:233)."""
    import pyarrow as pa

    files = []
    for i in range(4):
        p = str(tmp_path / f"f{i}.parquet")
        # every file repeats key 100+i -> within-file dup per file
        pq.write_table(pa.table({
            "doc_id": pa.array([100 + i, 100 + i, i], type=pa.int64())}), p)
        files.append(p)
    spec = {"key": "doc_id",
            "columns": {"doc_id": {"dtype": "int64", "unique": True}}}
    out = str(tmp_path / "out")

    # run 1: 4 files, group_size=1 -> groups g=0..3
    rep1 = run(spec, files, out, group_size=1, resume=False)
    assert rep1["n_violations_global"] == 4

    # run 2: only 2 files, group_size=2 -> a single group g=0; stale
    # g=000001..3 dirs remain on disk but must be ignored
    rep2 = run(spec, files[:2], out, group_size=2, resume=False)
    assert rep2["n_violations_global"] == 2
    assert rep2["n_rows"] == 6


def test_streaming_w1_first_span(ray_session, tmp_path):
    """The streaming run's NotUnique violations carry the first-seen
    partition (errors.rs:119-122 parity through the kind=c partials)."""
    import pyarrow as pa

    # key 77 first in file 0, again in file 2; key 5 only in file 1
    for i, ids in enumerate([[77, 1], [5, 5], [77, 3]]):
        pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64())}),
                       str(tmp_path / f"f{i}.parquet"))
    spec = {"key": "doc_id",
            "columns": {"doc_id": {"dtype": "int64", "unique": True}}}
    out = str(tmp_path / "out")
    rep = run(spec, [str(tmp_path / f"f{i}.parquet") for i in range(3)],
              out, group_size=1, resume=False)
    assert rep["n_violations_global"] == 2
    dups = pq.read_table(os.path.join(out, "violations_global", "unique",
                                      "dups-doc_id.parquet"))
    rows = {r["doc_id"]: r["first_span"] for r in dups.to_pylist()}
    assert rows == {"77": "partition=0", "5": "partition=1"}


def test_run_nested_and_tagged_spec(ray_session, tmp_path):
    """The streaming (100 TB) path handles struct fields and tagged
    dispatch like the interactive path."""
    import pyarrow as pa

    typ = pa.struct([("lang", pa.string()), ("score", pa.float64())])
    for i in range(2):
        pq.write_table(pa.table({
            "doc_id": pa.array([i * 2, i * 2 + 1], type=pa.int64()),
            "kind": pa.array(["purchase", "browse"]),
            "value": pa.array([1.0, -50.0]),
            "meta": pa.array([{"lang": "xx", "score": 0.5},
                              {"lang": "en", "score": 2.0}], type=typ),
        }), str(tmp_path / f"f{i}.parquet"))
    spec = {
        "key": "doc_id",
        "columns": {
            "doc_id": {"dtype": "int64", "unique": True},
            "kind": {"dtype": "string"},
            "value": {"dtype": "float64"},
            "meta": {"fields": {
                "lang": {"enum": ["en", "de"]},
                "score": {"maximum": 1.0},
            }},
        },
        "tagged": [{"tag": "kind", "variants": {
            "purchase": {"columns": {"value": {"minimum": 5}}},
        }}],
    }
    out = str(tmp_path / "out")
    rep = run(spec, [str(tmp_path / f"f{i}.parquet") for i in range(2)],
              out, group_size=1, resume=False)
    files = glob.glob(os.path.join(out, "groups", "*", "kind=v", "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    got = sorted(zip(t["doc_id"].to_pylist(), t["rule_id"].to_pylist(),
                     t["span"].to_pylist()))
    # per file: doc even -> nested enum (xx) + tagged purchase value<5;
    # doc odd -> nested score>1.0 (browse passes tagged)
    assert got == [
        ("0", "invalid_enum_value", "meta.lang"),
        ("0", "less_than_expected", "value"),
        ("1", "more_than_expected", "meta.score"),
        ("2", "invalid_enum_value", "meta.lang"),
        ("2", "less_than_expected", "value"),
        ("3", "more_than_expected", "meta.score"),
    ]
    assert rep["n_violations_narrow"] == 6
