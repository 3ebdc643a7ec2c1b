"""W3 drift end-to-end: clean epoch → reference stats; shifted partition
flags its source, clean sources stay quiet (FIXTURES T1/T3)."""

import pyarrow.parquet as pq
import pytest

from verify_ray.spec import ConstraintSpec, DriftSpec
from verify_ray.sources.synth import default_spec_dict, make_manifest, make_sequences


@pytest.fixture(scope="module")
def drift_setup(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("drift")
    ref_dir = str(d / "reference_epoch")
    cur_dir = str(d / "current_epoch")
    # clean reference epoch; disjoint id space
    make_sequences(ref_dir, n_rows=8000, n_files=4, seed=100, clean=True)
    # current epoch: clean rows but partition 1's `code` rows shifted hard
    make_sequences(cur_dir, n_rows=8000, n_files=4, seed=101, clean=True,
                   drift_partition=1, id_offset=1_000_000)
    drift = DriftSpec(group_by="source", column="n_tok", token_column="tokens",
                      min_rows=50)
    from verify_ray.stages.drift import make_reference_stats

    stats_path = str(d / "reference_stats.parquet")
    make_reference_stats(ref_dir, drift, out_path=stats_path)
    return {"ref": ref_dir, "cur": cur_dir, "stats": stats_path, "drift": drift,
            "root": str(d)}


def test_reference_stats_shape(drift_setup):
    t = pq.read_table(drift_setup["stats"])
    assert t.column_names == ["source", "n_tok_quantiles", "token_freq_topk",
                              "row_count"]
    assert sorted(t.column("source").to_pylist()) == ["books", "code", "web", "wiki"]
    assert sum(t.column("row_count").to_pylist()) == 8000


def test_drift_flags_shifted_source_only(ray_session, drift_setup):
    import ray.data as rd

    from verify_ray.stages.drift import drift_violations

    ds = rd.read_parquet(drift_setup["cur"] + "/")
    dv = drift_violations(ds, drift_setup["drift"], drift_setup["stats"])
    rows = dv.to_pylist()
    flagged = {r["doc_id"] for r in rows}
    assert "code" in flagged, rows
    assert flagged <= {"code"}, f"clean sources flagged: {rows}"
    assert all(r["rule_id"] == "drift" for r in rows)
    assert any(r["span"] == "source.code.n_tok" for r in rows)


def test_clean_epoch_self_check_quiet(ray_session, drift_setup):
    import ray.data as rd

    from verify_ray.stages.drift import drift_violations

    ds = rd.read_parquet(drift_setup["ref"] + "/")
    dv = drift_violations(ds, drift_setup["drift"], drift_setup["stats"])
    assert dv.num_rows == 0, dv.to_pylist()


def test_engine_integration_with_drift(ray_session, drift_setup):
    from verify_ray.engine import validate

    spec_d = default_spec_dict(max_n_tok=256, with_drift=True)
    spec_d["drift"]["min_rows"] = 50
    spec = ConstraintSpec.from_dict(spec_d)
    manifest = pq.read_table(make_manifest(drift_setup["root"]))
    rep = validate(drift_setup["cur"], spec,
                   manifests={"source_manifest": manifest},
                   drift_reference=drift_setup["stats"])
    drift_rows = [r for r in rep.violations.to_pylist() if r["rule_id"] == "drift"]
    assert drift_rows and all(r["doc_id"] == "code" for r in drift_rows)
    assert all(r["partition_id"] == -1 for r in drift_rows)
    # drift (global) must not fail per-partition verdicts
    assert rep.verdicts["pass"].all()


def test_ks_check_flags_shape_shift(ray_session):
    """KS vs the reference quantile grid catches a distribution shift;
    identical data stays quiet."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from verify_ray.spec import DriftSpec
    from verify_ray.stages.drift import drift_violations, make_reference_stats

    rng = np.random.RandomState(3)
    base = rng.randint(50, 150, size=4000)

    def ds_of(vals):
        return rd.from_arrow(pa.table({
            "source": pa.array(["s0"] * len(vals)),
            "n_tok": pa.array(vals, type=pa.int32()),
        }))

    drift = DriftSpec(group_by="source", column="n_tok", token_column=None,
                      ks_max=0.2, max_rel_err=10.0)  # isolate the KS arm
    ref = make_reference_stats(ds_of(base), drift)

    same = drift_violations(ds_of(base), drift, ref)
    assert same.num_rows == 0

    shifted = drift_violations(ds_of(base + 120), drift, ref)
    msgs = shifted["message"].to_pylist()
    assert any("KS statistic" in m for m in msgs)


def test_drift_with_tdigest_sketch(ray_session, drift_setup):
    """The tdigest quantile-sketch family must detect the same shifted
    source (and stay quiet on the clean epoch) through the same
    streaming partial/merge/serialize machinery."""
    import ray.data as rd

    from verify_ray.stages.drift import drift_violations, make_reference_stats

    drift = DriftSpec(group_by="source", column="n_tok",
                      token_column="tokens", min_rows=50,
                      quantile_sketch="tdigest")
    stats = str(drift_setup["root"] + "/reference_stats_tdigest.parquet")
    make_reference_stats(drift_setup["ref"], drift, out_path=stats)

    cur = rd.read_parquet(drift_setup["cur"] + "/")
    dv = drift_violations(cur, drift, stats)
    flagged = {r["doc_id"] for r in dv.to_pylist()}
    assert flagged == {"code"}, dv.to_pylist()

    ref = rd.read_parquet(drift_setup["ref"] + "/")
    assert drift_violations(ref, drift, stats).num_rows == 0


def test_drift_spec_rejects_unknown_sketch():
    from verify_ray.spec import SpecError

    with pytest.raises(SpecError) as ei:
        ConstraintSpec.from_dict({
            "key": "doc_id",
            "columns": {"doc_id": {"dtype": "string"},
                        "source": {"dtype": "string"},
                        "n_tok": {"dtype": "int32"}},
            "drift": {"group_by": "source", "column": "n_tok",
                      "quantile_sketch": "bogus"},
        }).compile()
    assert "quantile_sketch" in str(ei.value)
