"""VERDICT r4 #1 — dataset-returning variants of the last three
driver-materializing operators (sessionize, dataset_diff,
canonical_filter's membership input) must be row-identical to the
pandas forms."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "value"])


def test_sessionize_ds_matches_pandas_form(ray_session):
    from verify_ray.pipelines.sessions import sessionize, sessionize_ds

    pdf = sessionize(_events_ds(), gap_minutes=30)
    ds_out = sessionize_ds(_events_ds(), gap_minutes=30)
    got = (ds_out.to_pandas()
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    assert list(got.columns) == list(pdf.columns)
    pd.testing.assert_frame_equal(
        got.astype({"session_start": "datetime64[us]"}),
        pdf.astype({"session_start": "datetime64[us]"}))
    assert len(pdf) > 0


def test_sessionize_ds_stays_resident(ray_session):
    """The _ds form returns a Dataset with a stable schema (nothing
    driver-side until the caller consumes it)."""
    import ray.data as rd

    from verify_ray.pipelines.sessions import sessionize_ds

    out = sessionize_ds(_events_ds(), gap_minutes=30)
    assert isinstance(out, rd.Dataset)
    assert out.schema().names == ["user_id", "session_start", "n_events",
                                  "sum_value", "duration_sec"]


def _diff_inputs():
    import ray.data as rd

    ref = [("a", "one"), ("b", "two"), ("c", "three"), ("d", "four")]
    cur = [("a", "one"), ("b", "two CHANGED"), ("d", "four"), ("e", "five")]

    def mk(rows, blocks):
        t = pa.table({"doc_id": pa.array([r[0] for r in rows]),
                      "text": pa.array([r[1] for r in rows])})
        return rd.from_arrow(t).repartition(blocks).materialize()

    return mk(cur, 3), mk(ref, 2)


def test_dataset_diff_as_dataset_matches_pandas_form(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.diff import dataset_diff

    cur, ref = _diff_inputs()
    pdf = dataset_diff(cur, ref)
    out = dataset_diff(cur, ref, as_dataset=True)
    assert isinstance(out, rd.Dataset)
    got = (out.to_pandas().sort_values(["doc_id", "status"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, pdf)
    assert set(map(tuple, got.itertuples(index=False))) == {
        ("b", "changed"), ("c", "removed"), ("e", "added")}


def test_dataset_diff_as_dataset_empty_delta_schema(ray_session):
    from verify_ray.pipelines.diff import dataset_diff

    cur, _ = _diff_inputs()
    out = dataset_diff(cur, cur, as_dataset=True)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "status"]


def _canon_corpus():
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 7, 9, 11, 12], type=pa.int64()),
        "text": ["a b c", "a b c d e", "a", "x y", "x y", "solo", "q r"],
    })
    return rd.from_arrow(t).repartition(3).materialize()


def test_canonical_filter_dataset_membership_matches_pandas(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.dedup import canonical_filter

    groups = pd.DataFrame({"doc_id": [1, 2, 3, 7, 9],
                           "group_id": [1, 1, 1, 7, 7]})
    want = sorted(canonical_filter(_canon_corpus(), groups)
                  .to_pandas().doc_id.astype(int))
    groups_ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(groups.doc_id, type=pa.int64()),
                  "group_id": pa.array(groups.group_id,
                                       type=pa.int64())})
    ).repartition(2).materialize()
    got_ds = canonical_filter(_canon_corpus(), groups_ds)
    got = sorted(got_ds.to_pandas().doc_id.astype(int))
    # group 1: doc 2 wins (most distinct words); group 7: tie on
    # distinct-word count -> min id 7 wins; 11, 12 pass through
    assert got == want == [2, 7, 11, 12]


def test_canonical_filter_dataset_membership_empty(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.dedup import canonical_filter

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "group_id": pa.array([], type=pa.int64())}))
    out = canonical_filter(_canon_corpus(), empty)
    assert sorted(out.to_pandas().doc_id.astype(int)) == [1, 2, 3, 7, 9,
                                                          11, 12]


def test_canonical_filter_ds_randomized_vs_pandas(ray_session):
    """Randomized membership over a bigger corpus — both arms must keep
    the exact same survivor set (argmax + tie rule parity)."""
    import ray.data as rd

    from verify_ray.pipelines.dedup import canonical_filter

    rng = np.random.default_rng(17)
    n = 400
    words = ["w%d" % i for i in range(40)]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 12)))
             for _ in range(n)]
    ids = np.arange(n, dtype=np.int64) * 3 + 5
    t = pa.table({"doc_id": pa.array(ids), "text": texts})
    corpus = rd.from_arrow(t).repartition(5).materialize()
    member = rng.choice(ids, size=150, replace=False)
    groups = pd.DataFrame({"doc_id": member,
                           "group_id": rng.integers(0, 25, size=150)})
    want = sorted(canonical_filter(corpus, groups)
                  .to_pandas().doc_id.astype(int))
    groups_ds = rd.from_arrow(pa.Table.from_pandas(
        groups.astype({"doc_id": "int64", "group_id": "int64"}),
        preserve_index=False)).repartition(3).materialize()
    got = sorted(canonical_filter(corpus, groups_ds)
                 .to_pandas().doc_id.astype(int))
    assert got == want
