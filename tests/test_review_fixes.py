"""Regression tests for the round-2 self-review findings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from verify_ray.errors import SpecError
from verify_ray.spec import ConstraintSpec


# ---- nested unique key (was: silent false pass / crash) -------------------

NESTED_UNIQUE_SPEC = {
    "key": "meta.x",
    "columns": {
        "meta": {"fields": {"x": {"dtype": "int64", "unique": True}}},
    },
}


def _nested_table(xs):
    typ = pa.struct([("x", pa.int64())])
    return pa.table({"meta": pa.array([{"x": v} for v in xs], type=typ)})


def test_nested_unique_file_source(ray_session, tmp_path):
    from verify_ray.engine import validate

    pq.write_table(_nested_table([7, 8]), str(tmp_path / "a.parquet"))
    pq.write_table(_nested_table([7, 9]), str(tmp_path / "b.parquet"))
    rep = validate(str(tmp_path), ConstraintSpec.from_dict(NESTED_UNIQUE_SPEC))
    nu = rep.violations.filter(
        pa.compute.equal(rep.violations["rule_id"], "not_unique"))
    assert nu["doc_id"].to_pylist() == ["7"]
    assert nu["span"].to_pylist() == ["meta.x"]
    assert nu["first_span"].to_pylist() == ["partition=0"]


def test_nested_unique_inmemory(ray_session):
    import ray.data as rd

    from verify_ray.engine import validate

    rep = validate(rd.from_arrow(_nested_table([1, 2, 1])),
                   ConstraintSpec.from_dict(NESTED_UNIQUE_SPEC))
    nu = rep.violations.filter(
        pa.compute.equal(rep.violations["rule_id"], "not_unique"))
    assert nu["doc_id"].to_pylist() == ["1"]


# ---- exact_dedup: null-content rows agree across regimes ------------------

def test_exact_dedup_null_content_both_paths(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.dedup import exact_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["a", "a", None, None]),
    })

    def ids(ds):
        out = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            out.extend(b["doc_id"].to_pylist())
        return sorted(out)

    bc = ids(exact_dedup(rd.from_arrow(t)))
    jn = ids(exact_dedup(rd.from_arrow(t), broadcast_limit=0))
    # GROUP-BY-NULL semantics: nulls form ONE group, smallest id wins
    assert bc == jn == [1, 3]


# ---- tagged variants reject schema-level constraint keys ------------------

@pytest.mark.parametrize("key,val", [
    ("dtype", "int64"), ("unique", True), ("ref", "nation"),
    ("required", True),
])
def test_tagged_variant_schema_level_keys_rejected(key, val):
    spec = {
        "key": "id",
        "columns": {"id": {"dtype": "string"}, "kind": {"dtype": "string"},
                    "v": {"dtype": "float64"}},
        "tagged": [{"tag": "kind",
                    "variants": {"a": {"columns": {"v": {key: val}}}}}],
    }
    with pytest.raises(SpecError) as ei:
        ConstraintSpec.from_dict(spec).compile()
    assert "schema-level" in str(ei.value)


# ---- old-format count partials (no partition_id) don't crash finalize -----

def test_find_duplicate_keys_tolerates_missing_first_pid(ray_session, tmp_path):
    from verify_ray.stages.unique import find_duplicate_keys

    # old-format partial: (doc_id, cnt, span) without partition_id
    pq.write_table(pa.table({
        "doc_id": pa.array(["k1", "k1", "k2"]),
        "cnt": pa.array([1, 2, 1], type=pa.int64()),
        "span": pa.array(["doc_id"] * 3),
    }), str(tmp_path / "old.parquet"))
    dups = find_duplicate_keys([[str(tmp_path / "old.parquet")]], "doc_id",
                               num_buckets=2, cnt_column="cnt",
                               where=("span", "doc_id"),
                               first_pid_column="partition_id")
    assert dups.column("doc_id").to_pylist() == ["k1"]


# ---- empty-input degradations ---------------------------------------------

def test_ivf_empty_dataset(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.similarity import ivf_ann_topk

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float64())),
    }))
    out = ivf_ann_topk(ds, np.ones((2, 4)), k=3)
    assert len(out) == 0
