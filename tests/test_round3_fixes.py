"""Round-3 regression tests for the ADVICE r2 fixes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_hopping_window_unit_safe(ray_session):
    """hopping_window_events must normalize timestamps to microseconds:
    a timestamp[ns] input (the pandas default) previously produced
    garbage window boundaries because the int64 cast yields ns ticks
    while the arithmetic assumes us."""
    import ray

    from verify_ray.pipelines.analytics import hopping_window_events

    ts = pd.to_datetime(["2024-01-01 00:30:00", "2024-01-01 07:00:00",
                         "2024-01-01 13:15:00"])
    df = pd.DataFrame({"ts": ts, "value": [1.0, 2.0, 4.0]})
    assert df["ts"].dtype == "datetime64[ns]"  # the trap being tested

    out_ns = hopping_window_events(ray.data.from_pandas(df).materialize(),
                                   width_hours=24, slide_hours=6)
    df_us = df.copy()
    df_us["ts"] = df_us["ts"].astype("datetime64[us]")
    out_us = hopping_window_events(ray.data.from_pandas(df_us).materialize(),
                                   width_hours=24, slide_hours=6)
    pd.testing.assert_frame_equal(out_ns, out_us)
    # each event lands in 24/6 = 4 windows; earliest window containing
    # the 00:30 event starts 18h earlier, at 06:00 the previous day
    assert out_ns["ws"].min() == pd.Timestamp("2023-12-31 06:00:00")
    assert out_ns["n_events"].sum() == 3 * 4


def test_unique_unknown_lineage_null_first_span(ray_session, tmp_path):
    """Files absent from path_pids must yield a NULL first_span, not the
    bogus 'partition=-1' — and must not beat a real pid in the min."""
    from verify_ray.stages.unique import (dup_table_to_violations,
                                          find_duplicate_keys)

    p1, p2, p3 = (str(tmp_path / f"{n}.parquet") for n in "abc")
    pq.write_table(pa.table({"doc_id": ["dup1", "x"]}), p1)
    pq.write_table(pa.table({"doc_id": ["dup1", "dup2"]}), p2)
    pq.write_table(pa.table({"doc_id": ["dup2", "y"]}), p3)

    # p1 has no pid (unknown lineage); p2=5, p3=7
    dups = find_duplicate_keys([[p1], [p2], [p3]], "doc_id", num_buckets=2,
                               path_pids={p2: 5, p3: 7})
    v = dup_table_to_violations(dups, "doc_id")
    spans = {r["doc_id"]: r["first_span"] for r in v.to_pylist()}
    # dup1 first seen in p1 (unknown) and p2 (pid 5): real pid wins
    assert spans["dup1"] == "partition=5"
    # dup2 seen only in known files: min(5, 7) = 5
    assert spans["dup2"] == "partition=5"

    # all-unknown lineage -> null first_span
    dups2 = find_duplicate_keys([[p1], [p2]], "doc_id", num_buckets=1,
                                path_pids={})
    v2 = dup_table_to_violations(dups2, "doc_id")
    rows = {r["doc_id"]: r for r in v2.to_pylist()}
    assert rows["dup1"]["first_span"] is None
    assert "partition=-1" not in str(v2.to_pylist())


def test_hash_buckets_vectorized_speed_and_parity():
    """The DuckDB-vectorized sampling hash must agree with the
    pure-Python little-endian md5 definition and clearly beat it on a
    high-cardinality batch (VERDICT r2 item 4)."""
    import hashlib
    import time

    from verify_ray.pipelines.sample import GRANULARITY, _hash_buckets

    keys = [f"doc-{i:012d}" for i in range(100_000)] + [None]
    arr = pa.array(keys, type=pa.string())

    t0 = time.time()
    fast = _hash_buckets(arr)
    t_fast = time.time() - t0

    t0 = time.time()
    slow = np.array(
        [-1 if k is None else
         int.from_bytes(hashlib.md5(k.encode()).digest()[:8], "little")
         % GRANULARITY for k in keys], dtype=np.int64)
    t_slow = time.time() - t0

    assert np.array_equal(fast, slow)
    assert fast[-1] == -1  # null key -> never sampled
    # warm path (connection cached) for the timing claim
    t0 = time.time()
    _hash_buckets(arr)
    t_warm = time.time() - t0
    assert t_warm * 2.5 < t_slow, (t_warm, t_slow)


def test_ngram_jaccard_skewed_cluster_in_exchange(ray_session):
    """A 500-member duplicate cluster (~125k candidate pairs) must
    verify inside the exchange: pairs fan out over multiple verify
    tasks, texts never form a driver-side dict, and every pair comes
    back jaccard=1.0 (VERDICT r2 item 3 skew criterion)."""
    import itertools

    import ray.data as rd

    from verify_ray.pipelines.dedup import ngram_jaccard_pairs

    n = 500
    text = "the same boilerplate sentence repeated across the corpus"
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array([text] * n),
    })).materialize()
    pairs = np.array(list(itertools.combinations(range(n), 2)))
    cand = pd.DataFrame({"doc_a": pairs[:, 0], "doc_b": pairs[:, 1]})
    out = ngram_jaccard_pairs(ds, cand, pairs_per_task=20_000)
    assert len(out) == len(cand)
    assert (out["jaccard"] == 1.0).all()


# ---- VERDICT r2 item 7: anyOf/oneOf child-error detail ---------------------

def test_any_of_detail_names_failing_branches():
    """NoneValid child-error payload (errors.rs:106-110 parity): the
    detail JSON names each branch (title or index) with the child rules
    it fails — extending the golden-example scenario with a one_of."""
    import json

    from verify_ray import ConstraintSpec

    plan = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {
            "doc_id": {"dtype": "string"},
            "n": {"dtype": "int64", "checks": [{"any_of": [
                {"title": "SmallValue", "maximum": 10},
                {"minimum": 100},      # untitled -> "branch 1"
            ]}]},
        },
    }).compile()
    t = pa.table({"doc_id": pa.array(["a", "b"]),
                  "n": pa.array([5, 50], type=pa.int64())})
    v = plan.validate_batch(t).to_pylist()
    assert len(v) == 1
    row = v[0]
    assert (row["doc_id"], row["rule_id"]) == ("b", "none_valid")
    d = json.loads(row["detail"])
    names = [b["schema"] for b in d["branches"]]
    assert names == ["SmallValue", "branch 1"]
    assert d["branches"][0]["errors"][0]["rule_id"] == "more_than_expected"
    assert d["branches"][1]["errors"][0]["rule_id"] == "less_than_expected"
    # passing rows carry no detail rows at all
    assert [r for r in v if r["doc_id"] == "a"] == []


def test_one_of_more_than_one_valid_detail_lists_matched():
    import json

    from verify_ray import ConstraintSpec

    plan = ConstraintSpec.from_dict({
        "key": "doc_id",
        "columns": {
            "doc_id": {"dtype": "string"},
            "n": {"dtype": "int64", "checks": [{"one_of": [
                {"title": "Low", "maximum": 100},
                {"title": "High", "minimum": 50},
            ]}]},
        },
    }).compile()
    t = pa.table({"doc_id": pa.array(["x"]), "n": pa.array([75])})
    v = plan.validate_batch(t).to_pylist()
    assert v[0]["rule_id"] == "more_than_one_valid"
    assert json.loads(v[0]["detail"]) == {"matched": ["Low", "High"]}


def test_streaming_run_emits_w1_first_span(ray_session, tmp_path):
    """The streaming run() path must carry lineage into NotUnique
    first_span (kind=c partials are pid-stamped; finalize min-aggregates
    them) — locks in the NOTES_r2 rough edge as fixed."""
    import glob
    import os

    import pyarrow.parquet as pq2

    from verify_ray.run import run
    from verify_ray.sources.synth import (default_spec_dict, make_manifest,
                                          make_sequences)

    base = str(tmp_path)
    make_sequences(os.path.join(base, "seq"), n_rows=5_000, n_files=4)
    mpath = make_manifest(base)
    run(default_spec_dict(max_n_tok=256), os.path.join(base, "seq"),
        os.path.join(base, "out"),
        manifests={"source_manifest": pq2.read_table(mpath)}, group_size=2)
    files = glob.glob(os.path.join(base, "out", "violations_global",
                                   "unique", "*.parquet"))
    assert files
    spans = []
    for f in files:
        spans.extend(pq2.read_table(f).column("first_span").to_pylist())
    assert spans and all(s is not None and s.startswith("partition=")
                         for s in spans)


def test_minhash_verify_in_exchange_multi_task(ray_session):
    """MinHash verification now runs inside the exchange: force several
    verify tasks (pairs_per_task=2) and check estimates survive task
    partitioning; pairs referencing absent docs are skipped."""
    import ray.data as rd

    from verify_ray.pipelines.dedup import _verify_minhash_exchange

    texts = {i: f"document number {i} with shared boilerplate text "
                f"{'x' * (i % 3)}" for i in range(8)}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), type=pa.int64()),
        "text": pa.array(list(texts.values())),
    })).materialize()
    cand = pd.DataFrame({"doc_a": [0, 1, 2, 3, 0],
                         "doc_b": [4, 5, 6, 7, 999]})  # 999 absent
    out = _verify_minhash_exchange(ds, cand, "text", "doc_id",
                                   num_perm=32, shingle_k=5, threshold=0.0,
                                   pairs_per_task=2)
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == {(0, 4), (1, 5), (2, 6), (3, 7)}  # absent-doc pair skipped
    assert ((out["jaccard_est"] >= 0) & (out["jaccard_est"] <= 1)).all()


def test_grouped_exact_quantiles_matches_quantile_disc(ray_session):
    """Counting-based exact quantiles must reproduce DuckDB
    quantile_disc, incl. a null GROUP (SQL GROUP BY semantics) and
    null values excluded."""
    import duckdb
    import ray.data as rd

    from verify_ray.pipelines.analytics import grouped_exact_quantiles

    rng = np.random.RandomState(13)
    langs = rng.choice(["en", "de", None], 3000, p=[0.5, 0.3, 0.2])
    vals = rng.randint(0, 400, 3000).astype("float64")
    vals[::17] = np.nan  # null values
    t = pa.table({"lang": pa.array(langs.tolist(), type=pa.string()),
                  "n_chars": pa.array([None if np.isnan(v) else int(v)
                                       for v in vals], type=pa.int64())})
    ds = rd.from_arrow(t).materialize()
    out = grouped_exact_quantiles(ds, "lang", "n_chars", qs=(0.1, 0.5, 0.9))
    con = duckdb.connect()
    ora = con.execute("""
        SELECT lang, COUNT(n_chars) AS n,
               quantile_disc(n_chars, 0.1) AS q10,
               quantile_disc(n_chars, 0.5) AS q50,
               quantile_disc(n_chars, 0.9) AS q90
        FROM t WHERE n_chars IS NOT NULL GROUP BY lang ORDER BY lang
    """).df()
    a = (out.fillna("NULL").astype(str)
         .sort_values("lang").reset_index(drop=True))
    b = (ora.fillna("NULL").astype(str)
         .sort_values("lang").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_md5_hex_vectorized_parity():
    import hashlib

    from verify_ray.functions.hashing import md5_hex

    texts = ["hello", None, "", "unicode-é-漢", "x" * 10_000]
    got = md5_hex(pa.array(texts, type=pa.string())).to_pylist()
    exp = [None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in texts]
    assert got == exp
