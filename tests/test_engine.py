"""End-to-end engine tests: synthetic table with injected violations of
every rule class → exact expected violation rows + per-partition
verdicts (SURVEY §5)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from verify_ray.engine import validate
from verify_ray.spec import ConstraintSpec
from verify_ray.sources.synth import default_spec_dict, make_golden


def vset(table, with_part=False):
    cols = ["doc_id", "rule_id", "span"] + (["partition_id"] if with_part else [])
    return set(zip(*[table.column(c).to_pylist() for c in cols]))


@pytest.fixture(scope="module")
def report(ray_session, synth_dir):
    spec = ConstraintSpec.from_dict(default_spec_dict(max_n_tok=256))
    manifest = pq.read_table(synth_dir["manifest"])
    return validate(synth_dir["dir"], spec, manifests={"source_manifest": manifest})


def test_exact_violation_set(report, synth_dir):
    got = vset(report.violations)
    expected = vset(synth_dir["result"].expected_violations)
    missing = expected - got
    extra = got - expected
    assert not missing, f"missing violations: {sorted(missing)[:10]}"
    assert not extra, f"unexpected violations: {sorted(extra)[:10]}"


def test_partition_lineage(report, synth_dir):
    # every narrow violation carries the partition of its source file
    exp = {(d, r, s): p for d, r, s, p in
           vset(synth_dir["result"].expected_violations, with_part=True)}
    for d, r, s, p in vset(report.violations, with_part=True):
        if exp.get((d, r, s), -1) >= 0:
            assert p == exp[(d, r, s)], (d, r, s)
    # global rules (uniqueness) are partition -1
    for d, r, s, p in vset(report.violations, with_part=True):
        if r == "not_unique":
            assert p == -1


def test_verdicts(report, synth_dir):
    vd = report.verdicts.set_index("partition_id")
    for exp in synth_dir["result"].expected_verdicts:
        row = vd.loc[exp["partition_id"]]
        assert int(row.n_rows) == exp["n_rows"]
        assert bool(row["pass"]) == exp["pass"]
    assert report.summary["n_rows"] == synth_dir["result"].n_rows
    assert not report.summary["pass"]


def test_clean_table_passes(ray_session, tmp_path):
    from verify_ray.sources.synth import make_sequences, make_manifest

    d = str(tmp_path / "clean")
    make_sequences(d, n_rows=1000, n_files=4, seed=7, clean=True)
    manifest = pq.read_table(make_manifest(str(tmp_path)))
    spec = ConstraintSpec.from_dict(default_spec_dict(max_n_tok=256))
    rep = validate(d, spec, manifests={"source_manifest": manifest})
    assert rep.ok, rep.violations.to_pylist()[:5]
    assert rep.verdicts["pass"].all()
    assert rep.summary["n_rows"] == 1000


def test_golden_parity(ray_session, tmp_path):
    """FIXTURES T4: the reference golden-example scenario translated to
    the table domain (examples/schemars_json.rs:72-75), incl. one row
    violating 3 rules at once (AddAssign accumulation)."""
    path, expected = make_golden(str(tmp_path))
    spec = ConstraintSpec.from_dict(default_spec_dict(max_n_tok=256))
    rep = validate(path, spec, manifests={"source_manifest": ["web", "books", "code", "wiki"]})
    assert vset(rep.violations) == vset(expected)
    bad_rows = [r for r in rep.violations.to_pylist() if r["doc_id"] == "bad"]
    assert len(bad_rows) == 3  # too_short + no_pattern_match + non_null


def test_missing_manifest_raises(ray_session, synth_dir):
    spec = ConstraintSpec.from_dict(default_spec_dict())
    with pytest.raises(ValueError, match="source_manifest"):
        validate(synth_dir["dir"], spec)


def test_in_memory_dataset_source(ray_session):
    import ray.data as rd

    spec = ConstraintSpec.from_dict(
        {"key": "doc_id", "columns": {"doc_id": {"dtype": "string", "unique": True},
                                      "n": {"dtype": "int64", "minimum": 0}}}
    )
    ds = rd.from_arrow(pa.table({"doc_id": ["a", "b", "a"], "n": [1, -1, 2]}))
    rep = validate(ds, spec)
    got = {(r, s) for _, r, s in vset(rep.violations)}
    assert got == {("less_than_expected", "n"), ("not_unique", "doc_id")}


def test_schema_violation_required_column(ray_session, tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(["a"])}), p)
    spec = ConstraintSpec.from_dict(
        {"key": "doc_id", "columns": {"doc_id": {"dtype": "string"},
                                      "n_tok": {"dtype": "int32"}}}
    )
    rep = validate(p, spec)
    rows = rep.violations.to_pylist()
    assert any(r["rule_id"] == "required_property" and r["span"] == ""
               and 'n_tok' in r["message"] for r in rows)


def test_pattern_columns_constraints(ray_session, tmp_path):
    """M2: constraints applied to columns matched by name regex
    (schema.rs:914-939) — resolved once at read time, first match wins."""
    p = str(tmp_path / "pc.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(["a", "b"]),
        "score_x": pa.array([0.5, 2.0]),
        "score_y": pa.array([-1.0, 0.3]),
        "other": pa.array([99.0, 99.0]),
    }), p)
    spec = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {"doc_id": {"dtype": "string"}},
        "pattern_columns": {"^score_": {"minimum": 0, "maximum": 1}},
    })
    rep = validate(p, spec)
    got = {(d, r, s) for d, r, s in zip(
        rep.violations.column("doc_id").to_pylist(),
        rep.violations.column("rule_id").to_pylist(),
        rep.violations.column("span").to_pylist())}
    assert got == {("b", "more_than_expected", "score_x"),
                   ("a", "less_than_expected", "score_y")}


def test_run_with_drift(ray_session, tmp_path):
    """run()'s finalize drift path over the kind=s sketch partials."""
    from verify_ray.run import run as engine_run
    from verify_ray.sources.synth import (default_spec_dict, make_manifest,
                                          make_sequences)
    from verify_ray.spec import DriftSpec
    from verify_ray.stages.drift import make_reference_stats

    ref_dir = str(tmp_path / "ref")
    cur_dir = str(tmp_path / "cur")
    make_sequences(ref_dir, n_rows=4000, n_files=4, seed=200, clean=True)
    make_sequences(cur_dir, n_rows=4000, n_files=4, seed=201, clean=True,
                   drift_partition=2, id_offset=500_000)
    drift = DriftSpec(group_by="source", column="n_tok", token_column="tokens",
                      min_rows=50)
    stats = str(tmp_path / "stats.parquet")
    make_reference_stats(ref_dir, drift, out_path=stats)
    spec_d = default_spec_dict(max_n_tok=256, with_drift=True)
    spec_d["drift"]["min_rows"] = 50
    manifest = pq.read_table(make_manifest(str(tmp_path)))
    rep = engine_run(spec_d, cur_dir, str(tmp_path / "out"),
                     manifests={"source_manifest": manifest},
                     drift_reference=stats, group_size=2)
    assert rep["n_violations_global"] >= 1  # the drifted source flags
    import glob as g
    drift_files = g.glob(str(tmp_path / "out" / "violations_global" / "drift.parquet"))
    assert drift_files
    dv = pq.read_table(drift_files[0])
    assert "code" in set(dv.column("doc_id").to_pylist())


def test_ref_bound_per_group(ray_session, tmp_path):
    """FIXTURES T2 max_n_tok: per-source bound drawn from manifest DATA
    (join-driven rule) — rows exceeding THEIR source's bound flag."""
    p = str(tmp_path / "seq.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(["a", "b", "c", "d", "e"]),
        "n_tok": pa.array([100, 600, 100, 2100, 50], type=pa.int32()),
        "source": pa.array(["web", "web", "code", "code", "mystery"]),
    }), p)
    manifest = pa.table({
        "source": pa.array(["web", "code"]),
        "max_n_tok": pa.array([500, 2048], type=pa.int32()),
    })
    spec = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {
            "doc_id": {"dtype": "string"},
            "source": {"dtype": "string"},
            "n_tok": {"dtype": "int32",
                      "ref_bound": {"manifest": "m", "key": "source",
                                    "bound_column": "max_n_tok", "op": "le"}},
        },
    })
    rep = validate(p, spec, manifests={"m": manifest})
    got = {(d, r) for d, r, _ in zip(rep.violations.column("doc_id").to_pylist(),
                                     rep.violations.column("rule_id").to_pylist(),
                                     rep.violations.column("span").to_pylist())}
    # b: 600 > web's 500; d: 2100 > code's 2048; e passes (unknown source
    # — tagged_allow parity, ref-missing is a separate rule)
    assert got == {("b", "more_than_expected"), ("d", "more_than_expected")}


def test_format_errors_reference_style(ray_session, tmp_path):
    """Printout parity with the reference's `(span) message` loop
    (examples/schemars_json.rs:63-71)."""
    from verify_ray import verify_value

    path, _ = make_golden(str(tmp_path / "g2"))
    spec = ConstraintSpec.from_dict(default_spec_dict(max_n_tok=256))
    rep = verify_value(path, spec,
                       manifests={"source_manifest": ["web", "books", "code", "wiki"]})
    lines = rep.format_errors()
    assert any(l.startswith("doc-000000000002: (n_tok) the value is expected "
                            "to be at least 1") for l in lines)
    assert any("(tokens.1)" in l and "at least 0" in l for l in lines)
    assert any('the string must match the pattern' in l for l in lines)


def test_heterogeneous_file_schemas(ray_session, tmp_path):
    """regression (review #5): a column present only in LATER files must
    still get its row-level checks; the file missing it gets
    required_property."""
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(["a1", "a2"])}), p1)
    pq.write_table(pa.table({"doc_id": pa.array(["b1", "b2"]),
                             "score": pa.array([0.5, 7.0])}), p2)
    spec = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {"doc_id": {"dtype": "string"},
                    "score": {"dtype": "float64", "maximum": 1.0}},
    })
    rep = validate([p1, p2], spec)
    rows = rep.violations.to_pylist()
    # the file that HAS score gets the bound check on its rows
    assert any(r["doc_id"] == "b2" and r["rule_id"] == "more_than_expected"
               for r in rows), rows
    # the file missing score gets required_property for ITS partition only
    req = [r for r in rows if r["rule_id"] == "required_property"]
    assert len(req) == 1 and req[0]["partition_id"] == 0


def test_run_heterogeneous_with_unique_and_drift(ray_session, tmp_path):
    """regression (review 2): run() with unique+drift over files lacking
    those columns must not crash."""
    from verify_ray.run import run as engine_run

    p1, p2 = str(tmp_path / "u1.parquet"), str(tmp_path / "u2.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(["a", "b"]),
                             "n_tok": pa.array([5, 6], type=pa.int32()),
                             "source": pa.array(["web", "web"])}), p1)
    pq.write_table(pa.table({"other": pa.array([1])}), p2)
    spec = {"key": "doc_id",
            "columns": {"doc_id": {"dtype": "string", "unique": True},
                        "n_tok": {"dtype": "int32"},
                        "source": {"dtype": "string"}},
            "drift": {"group_by": "source", "column": "n_tok",
                      "token_column": None}}
    rep = engine_run(spec, [p1, p2], str(tmp_path / "out"), group_size=2)
    assert rep["n_violations_narrow"] >= 3  # required_property ×3 for p2


def test_ref_bound_numeric_key_cross_dtype(ray_session, tmp_path):
    """regression (review 3): int64 manifest keys must match float64 data
    keys numerically (5 == 5.0), and an empty manifest must not crash."""
    p = str(tmp_path / "rb.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(["a", "b"]),
        "grp": pa.array([5.0, 6.0], type=pa.float64()),
        "val": pa.array([100, 100], type=pa.int64()),
    }), p)
    manifest = pa.table({"grp": pa.array([5], type=pa.int64()),
                         "cap": pa.array([50], type=pa.int64())})
    spec = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {"doc_id": {"dtype": "string"},
                    "grp": {"dtype": "float64"},
                    "val": {"ref_bound": {"manifest": "m", "key": "grp",
                                          "bound_column": "cap"}}},
    })
    rep = validate(p, spec, manifests={"m": manifest})
    got = {(d, r) for d, r in zip(rep.violations.column("doc_id").to_pylist(),
                                  rep.violations.column("rule_id").to_pylist())}
    assert ("a", "more_than_expected") in got   # 100 > cap 50 for grp 5
    assert not any(d == "b" for d, _ in got)    # grp 6 not in manifest → pass
    # empty manifest: no crash, no violations
    rep2 = validate(p, spec, manifests={"m": manifest.slice(0, 0)})
    assert rep2.ok


def test_connected_components_min_id_ints():
    import pandas as pd

    from verify_ray.pipelines.dedup import connected_components

    cc = connected_components(pd.DataFrame({"doc_a": [10], "doc_b": [2]}))
    assert set(cc.group_id) == {2}  # numeric min, not lexicographic '10'
