"""Regression tests for the round-2 fix batch (ADVICE.md + VERDICT.md):

* unique_items never aborts on null / mixed-type list elements (the
  documented NULL policy: nulls never trip kernels, runs never abort);
* NotUnique carries the {first, duplicate} span pair
  (reference errors.rs:119-122, schema.rs:738-755) for both the
  within-row S3 kernel and the global W1 exchange;
* more_than_one_valid reports the ACTUAL matched count
  (errors.rs:284-288), not a hardcoded 2;
* in-memory (-2 partition) verdicts never report a false pass;
* ngram_jaccard_pairs skips candidate pairs whose docs are absent.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from verify_ray.engine import build_verdicts_from_counts
from verify_ray.spec import ColumnSpec, ConstraintSpec


def plan_for(**col_kwargs):
    name = col_kwargs.pop("name", "x")
    cols = [ColumnSpec(name="id", dtype="string"),
            ColumnSpec(name=name, **col_kwargs)]
    return ConstraintSpec(key="id", columns=cols).compile()


def list_tbl(rows, vtype=pa.string()):
    return pa.table({
        "id": pa.array([f"r{i}" for i in range(len(rows))], type=pa.string()),
        "x": pa.array(rows, type=pa.list_(vtype)),
    })


# ---- ADVICE high: null elements must not abort unique_items ---------------

def test_unique_items_null_string_elements_no_abort():
    plan = plan_for(unique_items=True)
    t = list_tbl([["x", None, "x"], [None, None], ["a", "b"]])
    v = plan.validate_batch(t)
    rows = sorted(zip(v["doc_id"].to_pylist(), v["rule_id"].to_pylist(),
                      v["span"].to_pylist()))
    # the duplicate "x" IS still detected; the null elements are ignored
    # (nullability is non_null's business), and nothing aborts
    assert rows == [("r0", "not_unique", "x.2")]


def test_unique_items_all_null_elements():
    plan = plan_for(unique_items=True)
    v = plan.validate_batch(list_tbl([[None, None, None]]))
    assert v.num_rows == 0


# ---- VERDICT #8: NotUnique{first, duplicate} span pair --------------------

def test_not_unique_span_pair_within_row():
    plan = plan_for(unique_items=True)
    t = list_tbl([["a", "b", "a", "a"], ["c", "d"]])
    v = plan.validate_batch(t)
    got = sorted(zip(v["span"].to_pylist(), v["first_span"].to_pylist()))
    # duplicates at elements 2 and 3, first occurrence at element 0
    assert got == [("x.2", "x.0"), ("x.3", "x.0")]


def test_not_unique_first_span_null_for_other_rules():
    plan = plan_for(minimum=5, name="x")
    t = pa.table({"id": pa.array(["a"]), "x": pa.array([1], type=pa.int64())})
    v = plan.validate_batch(t)
    assert v["first_span"].to_pylist() == [None]


def test_global_unique_first_partition(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from verify_ray.engine import validate

    # key 7 first appears in file 0, again in file 2
    for i, ids in enumerate([[7, 1], [2, 3], [7, 4]]):
        pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64())}),
                       str(tmp_path / f"part-{i}.parquet"))
    spec = ConstraintSpec.from_dict({
        "table": "t", "key": "doc_id",
        "columns": {"doc_id": {"dtype": "int64", "unique": True}},
    })
    rep = validate(str(tmp_path), spec)
    nu = rep.violations.filter(
        pa.compute.equal(rep.violations["rule_id"], "not_unique"))
    assert nu.num_rows == 1
    assert nu["doc_id"].to_pylist() == ["7"]
    assert nu["first_span"].to_pylist() == ["partition=0"]


# ---- ADVICE low: more_than_one_valid actual match count -------------------

def test_more_than_one_valid_actual_count():
    plan = plan_for(checks=[{"one_of": [{"minimum": 0}, {"minimum": 10},
                                        {"minimum": 100}]}])
    t = pa.table({"id": pa.array(["a", "b", "c"]),
                  "x": pa.array([5, 50, 500], type=pa.int64())})
    v = plan.validate_batch(t)
    msgs = dict(zip(v["doc_id"].to_pylist(), v["message"].to_pylist()))
    assert "but 2 schemas matched" in msgs["b"]
    assert "but 3 schemas matched" in msgs["c"]
    assert "a" not in msgs  # exactly one match passes


# ---- ADVICE medium: no false pass=True verdict for partition -2 -----------

def test_inmemory_partition_verdict_not_false_pass():
    counts = pd.DataFrame(
        {"partition_id": [-2], "rule_id": ["non_null"], "cnt": [5]})
    verdicts = build_verdicts_from_counts(counts, {-2: 100})
    assert len(verdicts) == 1
    row = verdicts.iloc[0]
    assert row["partition_id"] == -2
    assert row["n_violations"] == 5
    assert not row["pass"]


def test_global_minus1_still_excluded_from_partition_verdicts():
    counts = pd.DataFrame(
        {"partition_id": [-1, 0], "rule_id": ["not_unique", "non_null"],
         "cnt": [3, 2]})
    verdicts = build_verdicts_from_counts(counts, {0: 10, 1: 10})
    by_pid = verdicts.set_index("partition_id")
    assert by_pid.loc[0, "n_violations"] == 2 and not by_pid.loc[0, "pass"]
    assert by_pid.loc[1, "n_violations"] == 0 and by_pid.loc[1, "pass"]


def test_inmemory_validate_verdict_matches_report(ray_session):
    import ray.data as rd

    from verify_ray.engine import validate

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "n": pa.array([1, -5, 2], type=pa.int64()),
    }))
    spec = ConstraintSpec.from_dict({
        "table": "t", "key": "doc_id",
        "columns": {"doc_id": {"dtype": "string"},
                    "n": {"dtype": "int64", "minimum": 0}},
    })
    rep = validate(ds, spec)
    assert not rep.ok and rep.summary["n_violations"] == 1
    # the dataset's own (-2) verdict row must agree with the report
    assert len(rep.verdicts) == 1
    assert not rep.verdicts.iloc[0]["pass"]
    assert rep.verdicts.iloc[0]["n_violations"] == 1


# ---- ADVICE low: ngram_jaccard_pairs missing-doc guard --------------------

def test_ngram_jaccard_missing_doc_skipped(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["the quick brown fox jumps",
                          "the quick brown fox leaps"]),
    }))
    cand = pd.DataFrame({"doc_a": [1, 1], "doc_b": [2, 999]})
    out = ngram_jaccard_pairs(ds, cand)
    assert list(out["doc_b"]) == [2]  # pair with missing doc 999 skipped
    assert 0 < out["jaccard"].iloc[0] < 1


# ---- VERDICT #4: exact_dedup filter paths agree (broadcast vs join) -------

def test_exact_dedup_paths_agree(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.dedup import exact_dedup

    t = pa.table({
        "doc_id": pa.array([3, 1, 2, 10, 11], type=pa.int64()),
        "text": pa.array(["aa", "aa", "bb", "bb", "cc"]),
    })
    def ids(ds):
        out = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            out.extend(b["doc_id"].to_pylist())
        return sorted(out)

    bc = ids(exact_dedup(rd.from_arrow(t)))                      # broadcast
    jn = ids(exact_dedup(rd.from_arrow(t), broadcast_limit=0))   # join
    assert bc == jn == [1, 2, 11]


# ---- VERDICT #5: vectorized sessionize boundary semantics -----------------

def test_sessionize_boundaries(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.sessions import sessionize

    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:10",   # user 1, session 1
        "2024-01-01 11:00",                        # user 1, session 2 (gap 50m)
        "2024-01-01 10:05",                        # user 2, single
    ])
    df = pd.DataFrame({"user_id": [1, 1, 1, 2], "ts": ts,
                       "value": [1.0, 2.0, 4.0, 8.0]})
    out = sessionize(rd.from_pandas(df), gap_minutes=30)
    assert len(out) == 3
    u1 = out[out.user_id == 1]
    assert list(u1.n_events) == [2, 1]
    assert list(u1.sum_value) == [3.0, 4.0]
    assert list(u1.duration_sec) == [600.0, 0.0]
    assert out[out.user_id == 2].n_events.iloc[0] == 1


# ---- VERDICT #9: distributed components == union-find ---------------------

def test_distributed_components_match_union_find(ray_session):
    rng = np.random.RandomState(7)
    a = rng.randint(0, 400, size=300)
    b = rng.randint(0, 400, size=300)
    pairs = pd.DataFrame({"doc_a": np.minimum(a, b),
                          "doc_b": np.maximum(a, b)})
    pairs = pairs[pairs.doc_a != pairs.doc_b].drop_duplicates()

    from verify_ray.pipelines.dedup import (connected_components,
                                            connected_components_distributed)

    uf = connected_components(pairs).sort_values("doc_id").reset_index(drop=True)
    lp = connected_components_distributed(pairs)
    lp = lp.sort_values("doc_id").reset_index(drop=True)
    assert list(uf.doc_id) == list(lp.doc_id)
    assert list(uf.group_id) == list(lp.group_id)


def test_distributed_components_chain(ray_session):
    # a long chain exercises multi-round propagation
    pairs = pd.DataFrame({"doc_a": list(range(0, 30)),
                          "doc_b": list(range(1, 31))})
    from verify_ray.pipelines.dedup import connected_components_distributed

    lp = connected_components_distributed(pairs)
    assert set(lp.group_id) == {0}
    assert len(lp) == 31


# ---- schema-metadata title interpolation (errors.rs:289-315) --------------

def test_not_title_interpolated():
    plan = plan_for(checks=[{"not": {"minimum": 10, "title": "BigNumber"}}])
    t = pa.table({"id": pa.array(["a"]), "x": pa.array([50], type=pa.int64())})
    v = plan.validate_batch(t)
    assert v["message"].to_pylist() == ['the value must not be a "BigNumber"']


def test_contains_title_interpolated():
    plan = plan_for(contains={"minimum": 100, "title": "LargeValue"})
    t = pa.table({"id": pa.array(["a"]),
                  "x": pa.array([[1, 2]], type=pa.list_(pa.int64()))})
    v = plan.validate_batch(t)
    assert v["message"].to_pylist() == [
        'at least one of the items in the array must be "LargeValue"']


# ---- deterministic hash sampling properties -------------------------------

def test_hash_sample_nested_and_deterministic(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.sample import hash_sample

    t = pa.table({"doc_id": pa.array(list(range(2000)), type=pa.int64())})
    ds = rd.from_arrow(t)

    def ids(rate):
        out = []
        for b in hash_sample(ds, rate).iter_batches(batch_format="pyarrow"):
            out.extend(b["doc_id"].to_pylist())
        return set(out)

    s10, s30 = ids(0.1), ids(0.3)
    assert s10 == ids(0.1)             # deterministic
    assert s10 <= s30                  # nested samples
    assert 0.05 < len(s10) / 2000 < 0.15
    assert 0.25 < len(s30) / 2000 < 0.35


# ---- sequence packing semantics -------------------------------------------

def test_pack_sequences_layout(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.pack import pack_sequences

    t = pa.table({
        "source": pa.array(["a", "a", "a", "b"]),
        "doc_id": pa.array(["1", "2", "3", "9"]),
        "tokens": pa.array([[1, 2, 3], [4, 5], [6], [7, 8]],
                           type=pa.list_(pa.int32())),
    })
    out = pack_sequences(rd.from_arrow(t), seq_len=4)
    a = out[out.source == "a"].reset_index(drop=True)
    # stream 1,2,3,4,5,6 -> examples [1,2,3,4], [5,6]
    assert list(a.example_id) == [0, 1]
    assert list(a.n_tokens) == [4, 2]
    assert list(a.token_sum) == [10, 11]
    b = out[out.source == "b"]
    assert list(b.n_tokens) == [2] and list(b.token_sum) == [15]


def test_pack_sequences_empty_and_null_groups(ray_session):
    """Latent-crash regressions: zero-token groups and null token lists
    must not break the packing layout."""
    import ray.data as rd

    from verify_ray.pipelines.pack import pack_sequences

    t = pa.table({
        "source": pa.array(["a", "b", "b", "c"]),
        "doc_id": pa.array(["1", "2", "3", "4"]),
        "tokens": pa.array([[], [1, 2], None, [3]],
                           type=pa.list_(pa.int32())),
    })
    out = pack_sequences(rd.from_arrow(t), seq_len=4)
    got = {(r.source, r.example_id): (r.n_tokens, r.token_sum)
           for r in out.itertuples()}
    # 'a' contributes nothing; 'b' packs [1,2] (null list = no tokens);
    # 'c' packs [3]
    assert got == {("b", 0): (2, 3), ("c", 0): (1, 3)}
