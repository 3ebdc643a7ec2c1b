"""Round-4 session-4 operators: term_counts (dictionary spotting),
equidepth_bins (equal-frequency histogram)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df: pd.DataFrame, blocks: int = 2):
    import ray.data as rd

    t = pa.Table.from_pandas(df, preserve_index=False)
    step = max(1, t.num_rows // blocks)
    return rd.from_arrow([t.slice(i, step)
                          for i in range(0, t.num_rows, step)])


# -- term_counts ------------------------------------------------------

def test_term_counts_whole_word_and_omission(ray_session):
    from verify_ray.pipelines.text import term_counts

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["join the join club", "joint venture", "no hits"]})
    out = (term_counts(_ds(df), ["join", "club"])
           .to_pandas().sort_values(["doc_id", "term"])
           .reset_index(drop=True))
    # "joint" must NOT match whole-word "join"; zero rows omitted
    ref = pd.DataFrame({"doc_id": [1, 1], "term": ["club", "join"],
                        "n": [1, 2]})
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_term_counts_regex_metachars_escaped(ray_session):
    from verify_ray.pipelines.text import term_count_batch

    b = pa.table({"doc_id": [1, 2],
                  "text": ["cost is 5.99 total", "cost is 5x99 bad"]})
    out = term_count_batch(b, ["5.99"])
    # escaped literal matches doc 1 only; an unescaped '.' would
    # also match doc 2's 5x99
    assert out.to_pydict() == {"doc_id": [1], "term": ["5.99"],
                               "n": [1]}


def test_term_counts_empty_result_schema(ray_session):
    from verify_ray.pipelines.text import term_count_batch

    b = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = term_count_batch(b, ["x"])
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "term", "n"]


# -- equidepth_bins ---------------------------------------------------

def _equidepth_ref(v: np.ndarray, B: int) -> pd.DataFrame:
    vals, counts = np.unique(v, return_counts=True)
    cum = np.cumsum(counts)
    total = cum[-1]
    cuts = [vals[np.searchsorted(cum * B, i * total, "left")]
            for i in range(1, B)]
    bins = np.array([np.sum(np.array(cuts) < x) for x in v])
    rows = []
    for b in np.unique(bins):
        sel = v[bins == b]
        rows.append((b, sel.min(), sel.max(), len(sel), sel.sum()))
    return pd.DataFrame(rows, columns=["bin", "lo", "hi", "n_rows",
                                       "sum_v"])


def test_equidepth_bins_uniform(ray_session):
    from verify_ray.pipelines.select import equidepth_bins

    v = np.arange(1, 81, dtype=np.int64)  # 80 rows, 8 bins of 10
    out = equidepth_bins(_ds(pd.DataFrame({"v": v}), 4), "v", 8)
    assert out.n_rows.tolist() == [10] * 8
    assert out.lo.tolist() == [1, 11, 21, 31, 41, 51, 61, 71]
    pd.testing.assert_frame_equal(out, _equidepth_ref(v, 8),
                                  check_dtype=False)


def test_equidepth_bins_heavy_ties_share_fate(ray_session):
    from verify_ray.pipelines.select import equidepth_bins

    # one value holds 90% of rows: it spans several depth boundaries,
    # stays in ONE bin, and bin indices legitimately skip
    v = np.concatenate([np.full(90, 5, np.int64),
                        np.arange(10, dtype=np.int64)])
    out = equidepth_bins(_ds(pd.DataFrame({"v": v}), 3), "v", 4)
    ref = _equidepth_ref(v, 4)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert (out[out.lo <= 5][out.hi >= 5].n_rows >= 90).any()


def test_equidepth_bins_empty(ray_session):
    from verify_ray.pipelines.select import equidepth_bins

    out = equidepth_bins(
        _ds(pd.DataFrame({"v": pd.Series(dtype="int64")}), 1), "v", 4)
    assert len(out) == 0
    assert list(out.columns) == ["bin", "lo", "hi", "n_rows", "sum_v"]


# -- kmv_overlap ------------------------------------------------------

def test_kmv_overlap_exact_when_not_full(ray_session):
    from verify_ray.pipelines.analytics import kmv_overlap

    a = pd.DataFrame({"v": list(range(50))})
    b = pd.DataFrame({"v": list(range(30, 80))})
    out = kmv_overlap(_ds(a), _ds(b), "v", "v", k=1024)
    # registers not full -> every statistic is exact
    assert out.n_reg_a[0] == 50 and out.n_reg_b[0] == 50
    assert out.n_union[0] == 80
    assert out.n_common[0] == 20
    assert out.est_union[0] == 80
    assert out.est_intersection[0] == 20
    assert out.jaccard_permille[0] == 20 * 1000 // 80


def test_kmv_overlap_estimator_accuracy(ray_session):
    from verify_ray.pipelines.analytics import kmv_overlap

    n = 20_000
    a = pd.DataFrame({"v": list(range(n))})
    b = pd.DataFrame({"v": list(range(n // 2, n + n // 2))})
    out = kmv_overlap(_ds(a, 4), _ds(b, 4), "v", "v", k=512)
    # true union = 1.5n, intersection = 0.5n; KMV k=512 ~ 4-5% rel err
    assert abs(out.est_union[0] - 1.5 * n) / (1.5 * n) < 0.15
    assert abs(out.est_intersection[0] - 0.5 * n) / (0.5 * n) < 0.25


def test_kmv_overlap_disjoint_and_nulls(ray_session):
    from verify_ray.pipelines.analytics import kmv_overlap

    a = pd.DataFrame({"v": pd.array([1, 2, 3, None], dtype="Int64")})
    b = pd.DataFrame({"v": pd.array([4, 5, None], dtype="Int64")})
    out = kmv_overlap(_ds(a, 1), _ds(b, 1), "v", "v", k=64)
    assert out.n_common[0] == 0
    assert out.n_union[0] == 5  # nulls excluded


# -- fd_violations ----------------------------------------------------

def test_fd_holds_yields_empty(ray_session):
    from verify_ray.pipelines.analytics import fd_violations

    df = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": [10, 10, 20, 20, 30]})
    out = fd_violations(_ds(df), ["a"], "b", num_buckets=2)
    assert out.count() == 0
    assert out.schema().base_schema.names == ["a", "n_rhs", "rhs_min",
                                              "rhs_max"]


def test_fd_violations_detected_with_evidence(ray_session):
    from verify_ray.pipelines.analytics import fd_violations

    df = pd.DataFrame({
        "a": [1, 1, 1, 2, 2, 3, 3],
        "b": pd.array([9, 10, 9, 5, 5, None, 7], dtype="Int64")})
    out = (fd_violations(_ds(df), ["a"], "b", num_buckets=2)
           .to_pandas().sort_values("a").reset_index(drop=True))
    # a=1 maps to {9,10}; a=2 fine; a=3 has one non-null rhs
    assert out["a"].tolist() == [1]
    assert out["n_rhs"].tolist() == [2]
    # integer rhs: numeric min/max (9 < 10 despite "10" < "9")
    assert out["rhs_min"].tolist() == [9]
    assert out["rhs_max"].tolist() == [10]


def test_fd_composite_lhs_and_null_lhs_ignored(ray_session):
    from verify_ray.pipelines.analytics import fd_violations

    df = pd.DataFrame({
        "a": pd.array([1, 1, None], dtype="Int64"),
        "c": ["x", "x", "y"],
        "b": ["p", "q", "r"]})
    out = (fd_violations(_ds(df, 1), ["a", "c"], "b", num_buckets=2)
           .to_pandas())
    assert len(out) == 1
    assert out["n_rhs"].tolist() == [2]
    assert out["rhs_min"].tolist() == ["p"]
    assert out["rhs_max"].tolist() == ["q"]


# -- join_size_estimate -----------------------------------------------

def test_join_size_never_underestimates_and_tight_when_sparse(
        ray_session):
    from verify_ray.pipelines.analytics import join_size_estimate

    rng = np.random.default_rng(4)
    a = pd.DataFrame({"k": rng.integers(0, 200, 1000)})
    b = pd.DataFrame({"k": rng.integers(100, 300, 800)})
    true = len(a.merge(b, on="k"))
    out = join_size_estimate(_ds(a, 3), _ds(b, 3), "k", "k",
                             width=4096, depth=4)
    assert out.est[0] >= true           # CM never underestimates
    assert out.est[0] <= true * 1.2     # sparse keys: near-exact
    assert out.n_a[0] == 1000 and out.n_b[0] == 800
    # est is the min of the row inner products
    assert out.est[0] == min(out[f"ip_{j}"][0] for j in range(4))


def test_join_size_nulls_and_disjoint(ray_session):
    from verify_ray.pipelines.analytics import join_size_estimate

    a = pd.DataFrame({"k": pd.array([1, 2, None], dtype="Int64")})
    b = pd.DataFrame({"k": pd.array([3, 4, None], dtype="Int64")})
    out = join_size_estimate(_ds(a, 1), _ds(b, 1), "k", "k",
                             width=4096, depth=4)
    assert out.n_a[0] == 2 and out.n_b[0] == 2  # nulls excluded
    assert out.est[0] == 0  # width >> keys: disjoint stays 0


# -- phrase_occurrences ----------------------------------------------

def test_phrase_overlapping_and_boundaries(ray_session):
    from verify_ray.pipelines.retrieval import phrase_occurrences

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a a a a", "b a a b", "a b a", "a"]})
    out = (phrase_occurrences(_ds(df, 2), ["a", "a"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc1: 3 overlapping; doc2: 1; doc3: none (not adjacent);
    # doc4: too short
    assert out.doc_id.tolist() == [1, 2]
    assert out.n_occ.tolist() == [3, 1]


def test_phrase_never_crosses_documents(ray_session):
    from verify_ray.pipelines.retrieval import phrase_occurrences

    # doc 1 ends with "x", doc 2 starts with "y": the flattened
    # array contains "... x y ..." but the phrase must not match
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["q x", "y q"]})
    out = phrase_occurrences(_ds(df, 1), ["x", "y"])
    assert out.count() == 0


def test_phrase_three_terms(ray_session):
    from verify_ray.pipelines.retrieval import phrase_occurrences

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["fast merge sort wins", "merge sort fast"]})
    out = (phrase_occurrences(_ds(df, 1),
                              ["fast", "merge", "sort"])
           .to_pandas())
    assert out.doc_id.tolist() == [1]
    assert out.n_occ.tolist() == [1]


# -- transition_counts / activity_streaks -----------------------------

def test_transitions_never_cross_keys_and_order(ray_session):
    from verify_ray.pipelines.sessions import transition_counts

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([10, 20, 30, 5, 15],
                             unit="s").astype("datetime64[us]"),
        "event_type": ["a", "b", "a", "a", "c"],
        "event_id": [1, 2, 3, 4, 5]})
    out = transition_counts(_ds(df, 2), num_buckets=2)
    ref = pd.DataFrame({"prev_state": ["a", "a", "b"],
                        "next_state": ["b", "c", "a"],
                        "n": [1, 1, 1]})
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_transitions_tiebreak_by_event_id(ray_session):
    from verify_ray.pipelines.sessions import transition_counts

    # equal ts: event_id orders them (2 then 5 -> x before y)
    df = pd.DataFrame({
        "user_id": [7, 7],
        "ts": pd.to_datetime([100, 100],
                             unit="s").astype("datetime64[us]"),
        "event_type": ["y", "x"],
        "event_id": [5, 2]})
    out = transition_counts(_ds(df, 1), num_buckets=2)
    assert out.values.tolist() == [["x", "y", 1]]


def test_activity_streaks_islands(ray_session):
    from verify_ray.pipelines.sessions import activity_streaks

    day = 86_400
    # user 1: days 0,1,2, 5,6 -> max 3, total 5 (dup day collapses)
    # user 2: day 9 only
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 1, 1, 2],
        "ts": pd.to_datetime(
            [0, day, 2 * day, 2 * day + 100, 5 * day, 6 * day,
             9 * day], unit="s").astype("datetime64[us]")})
    out = (activity_streaks(_ds(df, 2), num_buckets=2)
           .to_pandas().sort_values("user_id")
           .reset_index(drop=True))
    assert out.max_streak.tolist() == [3, 1]
    assert out.n_days.tolist() == [5, 1]


# -- word_collocations ------------------------------------------------

def test_collocations_counts_and_components(ray_session):
    from verify_ray.pipelines.text import word_collocations

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["x y x y z", "x y", "q"]})
    ds = _ds(df, 2).materialize()
    out = word_collocations(ds, k=10)
    top = out.iloc[0]
    # "x y" occurs 3 times (docs 1 twice + doc 2 once)
    assert (top.a, top.b, top.n_pair) == ("x", "y", 3)
    assert top.n_left == 3 and top.n_right == 3  # x, y unigrams
    # bigram total: doc1 has 4, doc2 has 1, doc3 has 0
    assert (out.n_bigrams == 5).all()
    assert (out.n_words == 8).all()
    # never a cross-document bigram ("y","x") count excludes doc
    # boundary ("y" end of doc2 -> "q" doc3 must not appear)
    assert not ((out.a == "y") & (out.b == "q")).any()


def test_collocations_k_cap_and_tie_order(ray_session):
    from verify_ray.pipelines.text import word_collocations

    df = pd.DataFrame({"doc_id": [1], "text": ["b c a b d a"]})
    out = word_collocations(_ds(df, 1).materialize(), k=2)
    assert len(out) == 2
    # all bigrams count 1 -> ties break (a asc, b asc): "a b" first
    assert out.iloc[0].a == "a" and out.iloc[0].b == "b"


# -- peak_concurrency / budget_select ---------------------------------

def test_peak_concurrency_half_open(ray_session):
    from verify_ray.pipelines.sessions import peak_concurrency

    # duration 10us: [0,10) and [10,20) do NOT overlap; [0,10) and
    # [5,15) do
    df = pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "ts": pd.to_datetime([0, 10, 0, 5],
                             unit="us").astype("datetime64[us]")})
    out = peak_concurrency(_ds(df, 1), "k", "ts", duration_us=10,
                           num_buckets=2)
    assert dict(zip(out.k, out.peak)) == {"a": 1, "b": 2}


def test_peak_concurrency_matches_reference(ray_session):
    from verify_ray.pipelines.sessions import peak_concurrency

    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame({
        "k": rng.choice(["x", "y"], n),
        "ts": pd.to_datetime(rng.integers(0, 5000, n),
                             unit="us").astype("datetime64[us]")})
    out = peak_concurrency(_ds(df, 3), "k", "ts", duration_us=500,
                           num_buckets=2)

    def ref(times, dur=500):
        pts = sorted([(t, 1) for t in times]
                     + [(t + dur, -1) for t in times])
        run = peak = 0
        for _, d in pts:
            run += d
            peak = max(peak, run)
        return peak

    for k, g in df.groupby("k"):
        times = (g.ts.astype("int64")).tolist()
        assert int(out[out.k == k].peak.iloc[0]) == ref(times)


def test_budget_select_greedy_window_rule(ray_session):
    from verify_ray.pipelines.select import budget_select

    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"],
        "id": [1, 2, 3, 4, 5],
        "score": [10, 9, 8, 7, 1],
        "cost": [5, 5, 5, 5, 100]})
    out = (budget_select(_ds(df, 2), "g", "score", "cost", "id",
                         budget=12, values=["g", "id"],
                         num_buckets=2)
           .to_pandas().sort_values("id"))
    # group a: cum = 5,10,15,... -> ids 1,2 fit; group b: 100 > 12
    assert out.id.tolist() == [1, 2]


def test_budget_select_score_then_id_order(ray_session):
    from verify_ray.pipelines.select import budget_select

    # equal scores: id ASC decides who eats the budget first
    df = pd.DataFrame({
        "g": ["z"] * 3, "id": [30, 10, 20],
        "score": [5, 5, 5], "cost": [4, 4, 4]})
    out = (budget_select(_ds(df, 1), "g", "score", "cost", "id",
                         budget=8, values=["id"], num_buckets=2)
           .to_pandas().sort_values("id"))
    assert out.id.tolist() == [10, 20]


# -- rank_vs_reference / column_overlap_matrix ------------------------

def test_rank_vs_reference_exact(ray_session):
    from verify_ray.pipelines.select import rank_vs_reference

    cur = pd.DataFrame({"id": [1, 2, 3],
                        "v": pd.array([5, 0, 100], dtype="Int64")})
    ref = pd.DataFrame({"id": [9, 9, 9, 9],
                        "v": pd.array([1, 5, 5, 50], dtype="Int64")})
    out = (rank_vs_reference(_ds(cur, 1), _ds(ref, 1), "v", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    # v=5 -> {1,5,5} = 3; v=0 -> 0; v=100 -> all 4
    assert out.n_ref_le.tolist() == [3, 0, 4]


def test_column_overlap_matrix_pairs(ray_session):
    from verify_ray.pipelines.analytics import column_overlap_matrix

    a = pd.DataFrame({"k": list(range(20))})
    b = pd.DataFrame({"k": list(range(10, 30))})
    c = pd.DataFrame({"k": list(range(100, 105))})
    out = column_overlap_matrix({
        "a": (_ds(a, 1), "k"), "b": (_ds(b, 1), "k"),
        "c": (_ds(c, 1), "k")}, k=1024)
    out = out.set_index(["col_a", "col_b"])
    # registers not full -> exact
    assert out.loc[("a", "b")].n_common == 10
    assert out.loc[("a", "b")].n_union == 30
    assert out.loc[("a", "c")].n_common == 0
    assert out.loc[("b", "c")].n_common == 0
    assert len(out) == 3  # unordered pairs only


# -- audit_sorted_layout ----------------------------------------------

def test_audit_sorted_layout_clean_and_planted(ray_session):
    from verify_ray.pipelines.shuffle import audit_sorted_layout

    clean = pd.DataFrame({
        "shard_id": [0, 0, 0, 1, 1],
        "pos": [1, 2, 3, 1, 2],
        "v": [5, 5, 9, 10, 12]})
    out = audit_sorted_layout(_ds(clean, 1), "v", num_buckets=2)
    assert len(out) == 0

    # within-shard dip at (0,3) and a cross-shard boundary dip at
    # (1,1): shard 1 starts below shard 0's last value
    bad = pd.DataFrame({
        "shard_id": [0, 0, 0, 1, 1],
        "pos": [1, 2, 3, 1, 2],
        "v": [5, 8, 6, 2, 12]})
    out = audit_sorted_layout(_ds(bad, 1), "v", num_buckets=2)
    assert out[["shard_id", "pos"]].values.tolist() == [[0, 3],
                                                        [1, 1]]
    assert out.prev_value.tolist() == [8, 6]


# -- map_key_stats ----------------------------------------------------

def test_map_key_stats_counts_and_null_values(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import map_key_stats

    mtype = pa.map_(pa.string(), pa.string())
    rows = [[("a", "x"), ("b", "1")],
            [("a", "y")],
            [("a", "x"), ("b", None)],
            None]
    t = pa.table({"m": pa.array(rows, type=mtype)})
    out = map_key_stats(rd.from_arrow(t), "m", num_buckets=2)
    got = out.set_index("key")
    # key a: 3 rows, values {x, y}; key b: 2 rows, 1 non-null value
    assert got.loc["a"].n_rows == 3 and got.loc["a"].n_vals == 2
    assert got.loc["b"].n_rows == 2 and got.loc["b"].n_vals == 1


def test_map_key_stats_sliced_blocks(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.analytics import map_key_stats

    mtype = pa.map_(pa.string(), pa.string())
    rows = [[(f"k{i % 3}", f"v{i}")] for i in range(30)]
    t = pa.table({"m": pa.array(rows, type=mtype)})
    # two sliced blocks share one child buffer: the offsets-window
    # slice must not double-count entries
    ds = rd.from_arrow([t.slice(0, 15), t.slice(15, 15)])
    out = map_key_stats(ds, "m", num_buckets=2)
    assert out.n_rows.sum() == 30
    assert out.n_vals.sum() == 30


# -- write_jsonl_sharded ----------------------------------------------

def test_write_jsonl_sharded_resume_and_counts(ray_session, tmp_path):
    import os

    from verify_ray import sinks

    df = pd.DataFrame({"a": range(10), "b": list("abcdefghij")})
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return _ds(df, 2)

    root = str(tmp_path / "jl")
    r1 = sinks.write_jsonl_sharded({"x": make}, root, fingerprint="f1")
    assert r1["written"] == ["x"] and r1["rows"]["x"] == 10
    # matching fingerprint: skipped, make() not called again
    r2 = sinks.write_jsonl_sharded({"x": make}, root, fingerprint="f1")
    assert r2["skipped"] == ["x"] and calls["n"] == 1
    # stale fingerprint: rebuilt
    r3 = sinks.write_jsonl_sharded({"x": make}, root, fingerprint="f2")
    assert r3["written"] == ["x"] and calls["n"] == 2
    # data files exist and markers are underscore-prefixed
    files = [f for _, _, fs in os.walk(root) for f in fs]
    assert any(f.endswith(".json") and not f.startswith("_")
               for f in files)
    assert "_SUCCESS.json" in files


# -- cusum_alarms -----------------------------------------------------

def test_cusum_matches_sequential_reference(ray_session):
    from verify_ray.pipelines.analytics import cusum_alarms

    rng = np.random.default_rng(21)
    rows = []
    for g in ("a", "b"):
        x = rng.integers(0, 20, 40)
        if g == "a":
            x[25:] += 30  # planted upward shift
        rows.append(pd.DataFrame({"g": g, "t": np.arange(40),
                                  "x": x}))
    df = pd.concat(rows, ignore_index=True)
    out = cusum_alarms(_ds(df, 3), "g", "t", "x", k=12, h=40,
                       num_buckets=2)

    # sequential reference: s_t = max(0, s_{t-1} + x - k)
    for g, grp in df.groupby("g"):
        s = 0
        ref = []
        for x in grp.sort_values("t").x:
            s = max(0, s + int(x) - 12)
            ref.append(s)
        got = out[out.g == g].sort_values("t").s.tolist()
        assert got == ref
    # the planted shift in group a must alarm; group b must not
    assert out[(out.g == "a") & (out.t >= 30)].alarm.any()
    assert not out[out.g == "b"].alarm.any()


# -- resample_interpolate ---------------------------------------------

def test_resample_interpolate_exact_and_midpoints(ray_session):
    from verify_ray.pipelines.sessions import resample_interpolate

    # key 1: events at t=0 (v=10) and t=100 (v=30); step 25 ->
    # grid 0,25,50,75,100 with linear values 10,15,20,25,30
    df = pd.DataFrame({
        "k": [1, 1], "ts": [0, 100], "v": [10, 30]})
    out = (resample_interpolate(_ds(df, 1), "k", "ts", "v",
                                step_us=25, num_buckets=2)
           .to_pandas().sort_values("grid_us"))
    assert out.grid_us.tolist() == [0, 25, 50, 75, 100]
    assert out.val.tolist() == [10, 15, 20, 25, 30]


def test_resample_interpolate_truncation_and_dedup(ray_session):
    from verify_ray.pipelines.sessions import resample_interpolate

    # negative slope with non-divisible step: -7/2 truncates to -3
    # (DuckDB semantics), so v(5) = 10 + (3-10)*5 // 10 -> trunc
    df = pd.DataFrame({
        "k": [2, 2, 2], "ts": [0, 0, 10], "v": [4, 10, 3]})
    out = (resample_interpolate(_ds(df, 1), "k", "ts", "v",
                                step_us=5, num_buckets=2)
           .to_pandas().sort_values("grid_us"))
    # dup (k,0) -> MAX(v)=10; v(5) = 10 + trunc(-7*5/10) = 10-3 = 7
    assert out.val.tolist() == [10, 7, 3]


# -- validate_custom_rules (D6 under the driver contract) -------------

def test_custom_rules_nulls_never_trip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from verify_ray.pipelines.validation_queries import (
        validate_custom_rules)

    p = tmp_path / "documents.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["one two", None, " ".join(["w"] * 60)]),
        "n_chars": pa.array([100, 50, None], pa.int64())}), str(p))
    out = validate_custom_rules(str(tmp_path))
    # doc1: min_words (2 < 55) and ratio (100 > 6*2); doc2: null text
    # trips NOTHING; doc3: null n_chars trips nothing, words ok
    assert out.values.tolist() == [["1", "char_word_ratio", "n_chars"],
                                   ["1", "min_words", "text"]]


# -- snm_pairs --------------------------------------------------------

def _lev_ref(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        nd = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            nd[j] = min(dp[j] + 1, nd[j - 1] + 1,
                        dp[j - 1] + (ca != cb))
        dp = nd
    return dp[-1]


def _snm_ref(df, window, max_dist, trunc=32):
    r = df.sort_values(["k", "doc_id"]).reset_index(drop=True)
    out = []
    for i in range(len(r)):
        for j in range(i + 1, min(i + window + 1, len(r))):
            d = _lev_ref(r.k[i][:trunc], r.k[j][:trunc])
            if d <= max_dist:
                out.append((r.doc_id[i], r.doc_id[j], d))
    return (pd.DataFrame(out, columns=["id_a", "id_b", "dist"])
            .sort_values(["id_a", "id_b", "dist"])
            .reset_index(drop=True))


def test_snm_pairs_matches_brute_force(ray_session):
    from verify_ray.pipelines.joins import snm_pairs

    rng = np.random.default_rng(5)
    base = ["alpha", "beta", "gamma", "delta", "epsi"]
    keys = []
    for _ in range(250):
        w = base[rng.integers(0, 5)] + str(rng.integers(0, 20))
        if rng.random() < 0.4:
            w = w[:-1] + "q"
        keys.append(w)
    df = pd.DataFrame({"doc_id": np.arange(250, dtype=np.int64),
                       "k": keys})
    out = snm_pairs(_ds(df, 3), "doc_id", "k", window=3,
                    max_dist=2, n_shards=5)
    ref = _snm_ref(df, 3, 2)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_snm_pairs_cross_boundary_with_tiny_shards(ray_session):
    from verify_ray.pipelines.joins import snm_pairs

    # many shards over few rows -> most shards hold < window rows,
    # so window pairs must survive MULTI-shard boundary spans
    df = pd.DataFrame({"doc_id": np.arange(12, dtype=np.int64),
                       "k": [f"key{i:02d}" for i in range(12)]})
    out = snm_pairs(_ds(df, 2), "doc_id", "k", window=4,
                    max_dist=2, n_shards=10, sample_mod=1)
    ref = _snm_ref(df, 4, 2)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


# -- generalize_k_anonymous -------------------------------------------

def test_k_generalize_ladder(ray_session):
    from verify_ray.pipelines.analytics import generalize_k_anonymous

    # class (a, 1) has 3 rows -> released at level 0 (k=3);
    # (a, 2) and (a, 3) have 1 each -> together reach 2 <3 at level
    # [g] -> a-residual 2 rows suppressed... make them reach k at g:
    df = pd.DataFrame({
        "g": ["a"] * 3 + ["a", "a", "a"] + ["b"],
        "d": [1, 1, 1, 2, 3, 4, 9]})
    out = generalize_k_anonymous(_ds(df, 2), [["g", "d"], ["g"]],
                                 k=3)
    got = {(r.lvl, r["class"]): r.n for _, r in out.iterrows()}
    # (a|1) released fine; a's other 3 rows regroup at level 1 under
    # "a" (n=3 >= 3); b's single row is suppressed
    assert got[(0, "a|1")] == 3
    assert got[(1, "a")] == 3
    assert got[(2, "__suppressed")] == 1


def test_k_generalize_all_pass_first_level(ray_session):
    from verify_ray.pipelines.analytics import generalize_k_anonymous

    df = pd.DataFrame({"g": ["x"] * 5, "d": [1] * 5})
    out = generalize_k_anonymous(_ds(df, 1), [["g", "d"], ["g"]],
                                 k=2)
    assert out.values.tolist() == [[0, "x|1", 5]]


# -- interval_overlap_audit -------------------------------------------

def test_interval_audit_overlap_touch_negative(ray_session):
    from verify_ray.pipelines.sessions import interval_overlap_audit

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "s": [0, 10, 5, 0, 10, 8],
        "e": [10, 20, 12, 10, 5, 9]})
    # k=1 in (s,e) order: [0,10), [5,12), [10,20) — [5,12) overlaps
    # (prev_end 10) and [10,20) overlaps its predecessor [5,12)
    # (10 < 12; it TOUCHES [0,10) but order is by start);
    # k=2: [10,5) negative, [0,10) fine; k=3: clean
    out = interval_overlap_audit(_ds(df, 2), "k", "s", "e",
                                 num_buckets=2)
    kinds = out.set_index(["key", "start"])["kind"].to_dict()
    assert kinds == {("1", 5): "overlap", ("1", 10): "overlap",
                     ("2", 10): "negative"}
    ov = out[out.kind == "overlap"].sort_values("start")
    assert ov.prev_end.tolist() == [10, 12]


# -- apportioned_sample -----------------------------------------------

def test_apportioned_sample_exact_total_and_proportions(ray_session):
    from verify_ray.pipelines.sample import apportioned_sample

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "id": np.arange(1000, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], 1000, p=[0.6, 0.3, 0.1])})
    out = apportioned_sample(_ds(df, 4), "g", "id",
                             total=100).to_pandas()
    assert len(out) == 100
    share = out.groupby("g").size()
    true = df.groupby("g").size()
    # largest remainder: within 1 seat of exact proportionality
    for g in true.index:
        assert abs(share.get(g, 0) - 100 * true[g] / 1000) <= 1


def test_apportioned_sample_largest_remainder_rule(ray_session):
    from verify_ray.pipelines.sample import apportioned_sample

    # counts 5/3/2, total seats 3: quotas 1.5/0.9/0.6 -> bases
    # 1/0/0, two leftover seats go to remainders .9 ('b') then .6
    # ('c')? no: remainders 5*3%10=5, 3*3%10=9, 2*3%10=6 -> b, c
    df = pd.DataFrame({
        "id": np.arange(10, dtype=np.int64),
        "g": ["a"] * 5 + ["b"] * 3 + ["c"] * 2})
    out = apportioned_sample(_ds(df, 1), "g", "id",
                             total=3).to_pandas()
    share = out.groupby("g").size().to_dict()
    assert share == {"a": 1, "b": 1, "c": 1}


def test_apportioned_sample_deterministic_members(ray_session):
    from verify_ray.pipelines.sample import apportioned_sample

    df = pd.DataFrame({"id": np.arange(50, dtype=np.int64),
                       "g": ["x"] * 50})
    a = (apportioned_sample(_ds(df, 2), "g", "id", total=10)
         .to_pandas().id.sort_values().tolist())
    b = (apportioned_sample(_ds(df, 5), "g", "id", total=10)
         .to_pandas().id.sort_values().tolist())
    assert a == b  # block-layout invariant (md5 order, not arrival)


# -- negative_samples / rendezvous_assign -----------------------------

def test_negative_samples_no_self_and_deterministic(ray_session):
    from verify_ray.pipelines.sample import negative_samples

    df = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64)})
    a = (negative_samples(_ds(df, 2), "doc_id", n_ids=20, k=3)
         .to_pandas().sort_values(["doc_id", "j"])
         .reset_index(drop=True))
    assert len(a) == 60
    assert (a.doc_id != a.neg_id).all()       # never self
    assert a.neg_id.between(0, 19).all()      # in the id space
    b = (negative_samples(_ds(df, 5), "doc_id", n_ids=20, k=3)
         .to_pandas().sort_values(["doc_id", "j"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)       # layout-invariant


def test_rendezvous_minimal_movement(ray_session):
    from verify_ray.pipelines.shuffle import rendezvous_assign

    df = pd.DataFrame({"k": [str(i) for i in range(300)]})
    full = (rendezvous_assign(_ds(df, 2), "k",
                              ["n1", "n2", "n3", "n4"])
            .to_pandas().set_index("key")["node"])
    less = (rendezvous_assign(_ds(df, 2), "k", ["n1", "n2", "n4"])
            .to_pandas().set_index("key")["node"])
    # the defining HRW property: only n3's keys move
    moved = full.index[(full != less.reindex(full.index))]
    assert set(full.loc[moved]) == {"n3"}
    assert (full[full != "n3"] ==
            less.reindex(full.index)[full != "n3"]).all()
    # rough balance across 4 nodes
    share = full.value_counts()
    assert share.min() > 40 and share.max() < 110


# -- leakage-safe split (cluster-level assignment) --------------------

def test_leakage_safe_split_twins_share_fate(ray_session):
    import __ray_entry__ as entry

    out = entry.queries()["docs_leakage_safe_split"](
        "/root/testdata/sf0.001")
    # every planted twin (id + 1_000_000) must share its
    # original's split — the anti-leakage invariant
    twins = out[out.doc_id >= 1_000_000].copy()
    twins["orig"] = twins.doc_id - 1_000_000
    merged = twins.merge(out, left_on="orig", right_on="doc_id",
                         suffixes=("_twin", "_orig"))
    assert len(merged) == len(twins) > 0
    assert (merged.split_twin == merged.split_orig).all()
    # both splits non-empty
    assert set(out.split.unique()) == {"train", "test"}


def test_write_jsonl_sharded_lost_marker_rebuilds(ray_session,
                                                  tmp_path):
    import os

    from verify_ray import sinks

    df = pd.DataFrame({"a": range(6)})
    root = str(tmp_path / "jl2")
    sinks.write_jsonl_sharded({"s": lambda: _ds(df, 1)}, root,
                              fingerprint="f")
    # crash between data and marker: marker lost -> shard rebuilds
    os.remove(os.path.join(root, "shard=s", "_SUCCESS.json"))
    r = sinks.write_jsonl_sharded({"s": lambda: _ds(df, 1)}, root,
                                  fingerprint="f")
    assert r["written"] == ["s"] and r["rows"]["s"] == 6


# -- containment_pairs ------------------------------------------------

def test_containment_matches_brute_force(ray_session):
    from verify_ray.pipelines.dedup import containment_pairs

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(words, rng.integers(8, 25)))
            for _ in range(80)]
    for i in range(10):  # planted: doc embedded in noise
        docs.append(docs[i] + " "
                    + " ".join(rng.choice(words, 30)))
    df = pd.DataFrame({"doc_id": np.arange(len(docs),
                                           dtype=np.int64),
                       "text": docs})
    out = containment_pairs(_ds(df, 3).materialize(),
                            tau_permille=800, n=3, max_df=64,
                            num_buckets=4)

    def sh(t, n=3):
        w = t.split()
        return set(tuple(w[i:i + n]) for i in range(len(w) - n + 1))

    S = [sh(t) for t in docs]
    from collections import Counter
    dfc = Counter(g for s in S for g in s)
    ref = []
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            c = len(S[a] & S[b])
            m = min(len(S[a]), len(S[b]))
            if (m and c and 1000 * c >= 800 * m
                    and any(dfc[g] <= 64 for g in S[a] & S[b])):
                ref.append((a, b, c, m))
    got = list(map(tuple, out.values.tolist()))
    assert sorted(got) == sorted(ref)
    # every planted embedding found
    planted = {(i, 80 + i) for i in range(10)}
    assert planted <= {(a, b) for a, b, _, _ in got}
