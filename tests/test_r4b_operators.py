"""Round-4 second batch: cube_counts, heavy_hitters (Count-Min
sketch-then-verify), grouped_ntile, dataset set-ops, segment-level
dedup, IQR outliers, zone-map pruned reads."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(tbl: pa.Table, blocks: int = 4):
    import ray.data as rd

    n = tbl.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)]
                         if n else tbl)


# ---------------------------------------------------------------- cube


def test_cube_counts_matches_sql(ray_session):
    from verify_ray.pipelines.analytics import cube_counts

    rng = np.random.default_rng(5)
    n = 4000
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z", None], n)),
        "b": pa.array(rng.choice(["p", "q", None], n))})
    out = cube_counts(_ds(t, 6), ["a", "b"])
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM pdf
        WHERE a IS NOT NULL AND b IS NOT NULL
        GROUP BY CUBE (a, b)
        ORDER BY a NULLS LAST, b NULLS LAST""").df()
    pd.testing.assert_frame_equal(
        out.fillna("~"), ref.fillna("~"), check_dtype=False)


def test_cube_counts_empty_input(ray_session):
    from verify_ray.pipelines.analytics import cube_counts

    t = pa.table({"a": pa.array([None, None], type=pa.string()),
                  "b": pa.array(["u", "v"])})
    out = cube_counts(_ds(t, 1), ["a", "b"])
    # SQL CUBE on a fully-filtered input still emits the grand total
    assert len(out) == 1
    assert out["n"].iloc[0] == 0 and out["a"].iloc[0] is None


# ------------------------------------------------------- heavy hitters


def test_heavy_hitters_exact_vs_sql(ray_session):
    from verify_ray.pipelines.analytics import heavy_hitters

    rng = np.random.default_rng(11)
    # zipf-ish skew: a few hot keys + a long tail
    keys = np.concatenate([
        np.repeat(["hot1", "hot2", "hot3"], [400, 250, 120]),
        rng.choice([f"t{i}" for i in range(2000)], 6000)])
    rng.shuffle(keys)
    t = pa.table({"k": pa.array(keys.astype(object))})
    ds = _ds(t, 8).materialize()
    out = heavy_hitters(ds, ["k"], min_count=100)
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT k, COUNT(*) AS n FROM pdf GROUP BY k
        HAVING COUNT(*) >= 100 ORDER BY k""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_heavy_hitters_tiny_sketch_stays_exact(ray_session):
    # deliberately undersized sketch → many collision false positives;
    # the exact verify pass must still return the exact answer
    from verify_ray.pipelines.analytics import heavy_hitters

    rng = np.random.default_rng(3)
    keys = np.concatenate([np.repeat("HH", 300),
                           rng.choice([f"t{i}" for i in range(500)], 3000)])
    rng.shuffle(keys)
    t = pa.table({"k": pa.array(keys.astype(object))})
    out = heavy_hitters(_ds(t, 6).materialize(), ["k"], min_count=150,
                        width=32, depth=2)
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT k, COUNT(*) AS n FROM pdf GROUP BY k
        HAVING COUNT(*) >= 150 ORDER BY k""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_heavy_hitters_multi_col_and_empty(ray_session):
    from verify_ray.pipelines.analytics import heavy_hitters

    t = pa.table({"a": pa.array(["x"] * 5 + ["y"] * 2 + [None]),
                  "b": pa.array([1] * 5 + [2] * 2 + [3],
                                type=pa.int64())})
    ds = _ds(t, 2).materialize()
    out = heavy_hitters(ds, ["a", "b"], min_count=5)
    assert list(out["a"]) == ["x"] and list(out["n"]) == [5]
    out2 = heavy_hitters(ds, ["a", "b"], min_count=50)
    assert len(out2) == 0 and list(out2.columns) == ["a", "b", "n"]


# -------------------------------------------------------------- ntile


def test_grouped_ntile_matches_window_sql(ray_session):
    from verify_ray.pipelines.select import grouped_ntile

    rng = np.random.default_rng(17)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c", None], n)),
        "s": pa.array(rng.integers(0, 25, n).astype(np.int64)),  # ties
        "i": pa.array(rng.permutation(n).astype(np.int64))})
    out = (grouped_ntile(_ds(t, 6), ["g"], 4, "s", "i", ["g", "s", "i"],
                         num_buckets=4)
           .to_pandas().sort_values(["g", "s", "i"])
           .reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT g, s, i, CAST(NTILE(4) OVER (PARTITION BY g
            ORDER BY s, i) AS BIGINT) AS tile
        FROM pdf WHERE g IS NOT NULL
        ORDER BY g, s, i""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_grouped_ntile_small_groups(ray_session):
    # m < n_tiles: every row its own tile, SQL parity
    from verify_ray.pipelines.select import grouped_ntile

    t = pa.table({"g": pa.array(["a", "a", "b"]),
                  "s": pa.array([5, 3, 9], type=pa.int64()),
                  "i": pa.array([1, 2, 3], type=pa.int64())})
    out = (grouped_ntile(_ds(t, 1), ["g"], 10, "s", "i", ["g", "i"],
                         num_buckets=2)
           .to_pandas().sort_values(["g", "i"]).reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT g, i, CAST(NTILE(10) OVER (PARTITION BY g
            ORDER BY s, i) AS BIGINT) AS tile
        FROM pdf ORDER BY g, i""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


# ------------------------------------------------------------ set ops


def _setop_tables():
    # A draws keys 0..59, B only 0..39 → EXCEPT is non-empty by
    # construction (Ray's to_pandas on an all-empty Dataset loses
    # column names — the empty path is asserted via schema below)
    n = 2500
    mk = lambda seed_off, hi: pa.table({
        "u": pa.array(np.random.default_rng(29 + seed_off)
                      .integers(0, hi, n).astype(np.int64)),
        "t": pa.array(np.random.default_rng(31 + seed_off)
                      .choice(["x", "y", "z", None], n))})
    return mk(0, 60), mk(7, 40)


def test_distinct_except_intersect_union_vs_sql(ray_session):
    from verify_ray.pipelines.setops import distinct_setop, distinct_union

    ta, tb = _setop_tables()
    a, b = _ds(ta, 5), _ds(tb, 3)
    pda, pdb = ta.to_pandas(), tb.to_pandas()
    for op, sql_op in [("except", "EXCEPT"), ("intersect", "INTERSECT")]:
        out = (distinct_setop(a, b, ["u", "t"], op, num_buckets=4)
               .to_pandas().sort_values(["u", "t"]).reset_index(drop=True))
        ref = duckdb.sql(f"""
            SELECT DISTINCT u, t FROM pda
            WHERE u IS NOT NULL AND t IS NOT NULL
            {sql_op}
            SELECT DISTINCT u, t FROM pdb
            WHERE u IS NOT NULL AND t IS NOT NULL
            ORDER BY u, t""").df()
        pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    out = (distinct_union(a, b, ["u", "t"], num_buckets=4)
           .to_pandas().sort_values(["u", "t"]).reset_index(drop=True))
    ref = duckdb.sql("""
        SELECT u, t FROM pda WHERE u IS NOT NULL AND t IS NOT NULL
        UNION
        SELECT u, t FROM pdb WHERE u IS NOT NULL AND t IS NOT NULL
        ORDER BY u, t""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_distinct_setop_disjoint_and_empty(ray_session):
    from verify_ray.pipelines.setops import distinct_setop

    ta = pa.table({"u": pa.array([1, 2, 2], type=pa.int64())})
    tb = pa.table({"u": pa.array([9], type=pa.int64())})
    exc = (distinct_setop(_ds(ta, 2), _ds(tb, 1), ["u"], "except",
                          num_buckets=2).to_pandas()
           .sort_values("u").reset_index(drop=True))
    assert list(exc["u"]) == [1, 2]
    inter_ds = distinct_setop(_ds(ta, 2), _ds(tb, 1), ["u"], "intersect",
                              num_buckets=2)
    # empty result keeps its typed schema at the Dataset level (Ray's
    # to_pandas drops names on all-empty blocks — known quirk)
    assert inter_ds.schema().names == ["u"] and inter_ds.count() == 0


# ---------------------------------------------------- segment dedup


def test_segment_dedup_matches_sql(ray_session):
    from verify_ray.pipelines.text import segment_counts, segment_dedup

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(30)]
    texts, ids = [], []
    for i in range(300):
        nw = int(rng.integers(0, 40))
        texts.append(" ".join(rng.choice(vocab, nw)) if nw else "")
        ids.append(i)
    # plant exact repeated segments: doc 300 repeats doc 0's text
    texts.append(texts[0]); ids.append(300)
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    W = 5
    kept = (segment_dedup(_ds(t, 6), words_per_seg=W, num_buckets=4)
            .to_pandas().sort_values(["doc_id", "seg_idx"])
            .reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql(f"""
        WITH words AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\\s+')) AS w,
                 generate_subscripts(
                     string_split_regex(trim(text), '\\s+'), 1) AS ord
          FROM pdf),
        segs AS (
          SELECT doc_id, (ord - 1) // {W} AS seg_idx,
                 string_agg(w, ' ' ORDER BY ord) AS seg
          FROM words GROUP BY doc_id, (ord - 1) // {W}),
        ranked AS (
          SELECT doc_id, seg_idx,
                 ROW_NUMBER() OVER (PARTITION BY md5_number_upper(seg)
                     ORDER BY doc_id, seg_idx) AS rn
          FROM segs)
        SELECT doc_id, seg_idx FROM ranked WHERE rn = 1
        ORDER BY doc_id, seg_idx""").df()
    pd.testing.assert_frame_equal(kept, ref, check_dtype=False)
    # doc 300 (exact copy of doc 0) must keep nothing doc 0 kept
    d0 = set(kept[kept.doc_id == 0].seg_idx)
    d300 = set(kept[kept.doc_id == 300].seg_idx)
    assert not (d0 & d300)

    counts = (segment_counts(_ds(t, 6), words_per_seg=W)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    refc = duckdb.sql(f"""
        SELECT doc_id, CAST(CEIL(len(string_split_regex(trim(text),
            '\\s+')) / {W}.0) AS BIGINT) AS n_seg
        FROM pdf ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(counts, refc, check_dtype=False)


# -------------------------------------------------------- IQR outliers


def test_iqr_outliers_matches_sql(ray_session):
    from verify_ray.pipelines.analytics import iqr_outliers

    rng = np.random.default_rng(53)
    n = 4000
    # heavy-tailed: mostly 0..99, a few huge / tiny
    v = rng.integers(0, 100, n).astype(np.int64)
    v[rng.choice(n, 40, replace=False)] = rng.integers(500, 900, 40)
    v[rng.choice(n, 10, replace=False)] = -rng.integers(400, 600, 10)
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", None], n)),
        "v": pa.array(v),
        "i": pa.array(np.arange(n, dtype=np.int64))})
    out = (iqr_outliers(_ds(t, 6).materialize(), "g", "v", "i", k_half=3)
           .to_pandas().sort_values("i").reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        WITH q AS (SELECT g, quantile_disc(v, 0.25) q1,
                          quantile_disc(v, 0.75) q3
                   FROM pdf WHERE g IS NOT NULL GROUP BY g)
        SELECT i, d.g, v,
               CASE WHEN 2*v > 2*q3 + 3*(q3-q1) THEN 'high'
                    ELSE 'low' END AS side
        FROM pdf d JOIN q ON d.g = q.g
        WHERE 2*v > 2*q3 + 3*(q3-q1) OR 2*v < 2*q1 - 3*(q3-q1)
        ORDER BY i""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_iqr_outliers_uniform_group_empty(ray_session):
    # a constant group has IQR 0 and fences [q1, q3] = [v, v] → no rows
    from verify_ray.pipelines.analytics import iqr_outliers

    t = pa.table({"g": pa.array(["c"] * 50),
                  "v": pa.array([7] * 50, type=pa.int64()),
                  "i": pa.array(np.arange(50, dtype=np.int64))})
    out = iqr_outliers(_ds(t, 2).materialize(), "g", "v", "i")
    assert out.count() == 0


# ---------------------------------------------------- zone-map reads


def test_zone_map_prunes_files_and_matches_full_scan(ray_session,
                                                     tmp_path):
    import pyarrow.parquet as pq

    from verify_ray.sources.zonemap import build_zone_map, pruned_read

    # 6 range-partitioned files: file i holds keys [i*100, i*100+99]
    root = str(tmp_path / "layout")
    for i in range(6):
        d = f"{root}/shard={i}"
        import os
        os.makedirs(d)
        keys = np.arange(i * 100, i * 100 + 100, dtype=np.int64)
        pq.write_table(pa.table({"k": pa.array(keys),
                                 "v": pa.array(keys * 7)}),
                       f"{d}/part.parquet")

    zm = build_zone_map(root, "k")
    assert len(zm) == 6 and all(e["min"] is not None for e in zm)

    ds, stats = pruned_read(root, "k", 150, 320, columns=["k", "v"])
    # range [150, 320] overlaps files 1, 2, 3 only
    assert stats["files_total"] == 6 and stats["files_read"] == 3
    assert stats["rows_skipped_bound"] == 300
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == list(range(150, 321))
    assert (got["v"] == got["k"] * 7).all()

    # empty-range lookup: zero files read, typed empty result
    ds2, stats2 = pruned_read(root, "k", 10_000, 10_100,
                              columns=["k", "v"])
    assert stats2["files_read"] == 0 and ds2.count() == 0
    assert ds2.schema().names == ["k", "v"]


# -------------------------------------------------------- salted join


def _skewed_join_tables():
    rng = np.random.default_rng(61)
    n = 20_000
    # key 7 holds ~60% of the left side — the hot key
    k = np.where(rng.random(n) < 0.6, 7,
                 rng.integers(0, 200, n)).astype(np.int64)
    left = pa.table({"k": pa.array(k),
                     "lv": pa.array(np.arange(n, dtype=np.int64))})
    rk = np.concatenate([np.arange(0, 150, dtype=np.int64),
                         np.full(3, 7, dtype=np.int64)])  # hot key x4
    right = pa.table({"k2": pa.array(rk),
                      "rv": pa.array(rk * 100)})
    return left, right


def test_salted_join_inner_equals_plain_join(ray_session):
    from verify_ray.pipelines.joins import salted_join

    left, right = _skewed_join_tables()
    out = (salted_join(_ds(left, 8).materialize(), _ds(right, 2),
                       "k", ["k", "lv"], ["rv"], right_key="k2",
                       how="inner", num_buckets=8, n_salts=4,
                       hot_threshold=1000)
           .to_pandas().sort_values(["k", "lv", "rv"])
           .reset_index(drop=True))
    pdl, pdr = left.to_pandas(), right.to_pandas()
    ref = duckdb.sql("""
        SELECT l.k, l.lv, r.rv FROM pdl l JOIN pdr r ON l.k = r.k2
        ORDER BY l.k, l.lv, r.rv""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_salted_join_left_semi_anti(ray_session):
    from verify_ray.pipelines.joins import salted_join

    left, right = _skewed_join_tables()
    pdl, pdr = left.to_pandas(), right.to_pandas()
    lds = _ds(left, 8).materialize()
    out = (salted_join(lds, _ds(right, 2), "k", ["k", "lv"], ["rv"],
                       right_key="k2", how="left", num_buckets=8,
                       n_salts=4, hot_threshold=1000)
           .to_pandas().sort_values(["k", "lv", "rv"])
           .reset_index(drop=True))
    ref = duckdb.sql("""
        SELECT l.k, l.lv, r.rv FROM pdl l LEFT JOIN pdr r ON l.k = r.k2
        ORDER BY l.k, l.lv, r.rv""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    for how, sql in [("semi", "WHERE EXISTS (SELECT 1 FROM pdr r "
                              "WHERE r.k2 = l.k)"),
                     ("anti", "WHERE NOT EXISTS (SELECT 1 FROM pdr r "
                              "WHERE r.k2 = l.k)")]:
        out = (salted_join(lds, _ds(right, 2), "k", ["k", "lv"], [],
                           right_key="k2", how=how, num_buckets=8,
                           n_salts=4, hot_threshold=1000)
               .to_pandas().sort_values(["k", "lv"])
               .reset_index(drop=True))
        ref = duckdb.sql(f"""
            SELECT l.k, l.lv FROM pdl l {sql}
            ORDER BY l.k, l.lv""").df()
        pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_salted_join_rejects_outer_right(ray_session):
    import pytest

    from verify_ray.pipelines.joins import salted_join

    left, right = _skewed_join_tables()
    with pytest.raises(ValueError, match="inner|left|semi|anti"):
        salted_join(_ds(left, 2), _ds(right, 1), "k", ["k"], ["rv"],
                    right_key="k2", how="full", hot_threshold=10)


# ----------------------------------------------- incremental stats


def test_incremental_stats_equal_full_recompute(ray_session):
    from verify_ray.pipelines.analytics import (finalize_stats,
                                                grouped_stats,
                                                merge_stats_states,
                                                stats_state)

    rng = np.random.default_rng(71)
    n = 6000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], n)),
        "v": pa.array(rng.integers(-50, 5000, n).astype(np.int64))})
    aggs = {"v": ["count", "min", "max", "mean", "sum"]}
    # three ingest epochs
    cuts = [0, 2000, 4500, n]
    states = [stats_state(_ds(t.slice(cuts[i], cuts[i + 1] - cuts[i]), 3),
                          ["g"], aggs) for i in range(3)]
    merged = merge_stats_states(states, ["g"])
    inc = finalize_stats(merged, ["g"], aggs)
    full = grouped_stats(_ds(t, 5), ["g"], aggs)
    pd.testing.assert_frame_equal(
        inc.reset_index(drop=True), full.reset_index(drop=True),
        check_dtype=False, check_like=True)


def test_incremental_stats_disjoint_groups_union(ray_session):
    from verify_ray.pipelines.analytics import (finalize_stats,
                                                merge_stats_states,
                                                stats_state)

    t1 = pa.table({"g": pa.array(["x"] * 4),
                   "v": pa.array([1, 2, 3, 4], type=pa.int64())})
    t2 = pa.table({"g": pa.array(["y"] * 2),
                   "v": pa.array([10, 20], type=pa.int64())})
    aggs = {"v": ["count", "sum"]}
    m = merge_stats_states(
        [stats_state(_ds(t1, 1), ["g"], aggs),
         stats_state(_ds(t2, 1), ["g"], aggs)], ["g"])
    out = finalize_stats(m, ["g"], aggs)
    assert list(out["g"]) == ["x", "y"]
    assert list(out["v_sum"]) == [10, 30]
    assert list(out["v_count"]) == [4, 2]


# ------------------------------------------------------ grouped apply


def test_grouped_apply_whole_groups(ray_session):
    from verify_ray.pipelines.apply import grouped_apply

    rng = np.random.default_rng(83)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c", None], n)),
        "v": pa.array(rng.integers(0, 1000, n).astype(np.int64))})
    schema = pa.schema([("g", pa.string()), ("n", pa.int64()),
                        ("vsum", pa.int64())])

    def fn(key, grp):
        v = grp.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"g": pa.array([key[0]]),
                         "n": pa.array([len(v)], type=pa.int64()),
                         "vsum": pa.array([int(v.sum())],
                                          type=pa.int64())})

    out = (grouped_apply(_ds(t, 6), ["g"], fn, schema, num_buckets=4)
           .to_pandas().sort_values("g").reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT g, COUNT(*) AS n, SUM(v) AS vsum FROM pdf
        WHERE g IS NOT NULL GROUP BY g ORDER BY g""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_grouped_mad_matches_sql(ray_session):
    from verify_ray.pipelines.apply import grouped_mad

    rng = np.random.default_rng(89)
    n = 4000
    t = pa.table({
        "g": pa.array(rng.choice(["x", "y", "z"], n)),
        "v": pa.array(rng.integers(-200, 5000, n).astype(np.int64))})
    out = (grouped_mad(_ds(t, 5), "g", "v", num_buckets=4)
           .to_pandas().sort_values("g").reset_index(drop=True))
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        WITH m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(quantile_disc(v, 0.5) AS BIGINT) AS median
                   FROM pdf GROUP BY g)
        SELECT m.g, m.n, m.median,
               CAST(quantile_disc(ABS(d.v - m.median), 0.5)
                    AS BIGINT) AS mad
        FROM pdf d JOIN m ON d.g = m.g
        GROUP BY m.g, m.n, m.median ORDER BY m.g""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


# ---------------------------------------------------------- band join


def test_band_join_matches_sql(ray_session):
    from verify_ray.pipelines.joins import band_join

    rng = np.random.default_rng(97)
    n = 3000
    mk = lambda seed: pa.table({
        "k": pa.array(np.random.default_rng(seed)
                      .integers(0, 40, n).astype(np.int64)),
        "t": pa.array(np.random.default_rng(seed + 1)
                      .integers(0, 100_000, n).astype(np.int64)),
        "i": pa.array(np.arange(n, dtype=np.int64))})
    left, right = mk(97), mk(103)
    right = right.rename_columns(["k2", "t2", "j"])
    out = (band_join(_ds(left, 5), _ds(right, 3), "k", "t", "t2",
                     delta_us=500, left_values=["i", "k", "t"],
                     right_values=["j", "t2"], right_key="k2",
                     num_buckets=4)
           .to_pandas().sort_values(["i", "j"]).reset_index(drop=True))
    pdl, pdr = left.to_pandas(), right.to_pandas()
    ref = duckdb.sql("""
        SELECT l.i, l.k, l.t, r.j, r.t2 FROM pdl l JOIN pdr r
        ON l.k = r.k2 AND ABS(l.t - r.t2) <= 500
        ORDER BY l.i, r.j""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert len(out) > 0


def test_band_join_null_ts_and_boundary(ray_session):
    from verify_ray.pipelines.joins import band_join

    left = pa.table({"k": pa.array([1, 1, 1], type=pa.int64()),
                     "t": pa.array([100, None, 300], type=pa.int64()),
                     "i": pa.array([0, 1, 2], type=pa.int64())})
    right = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                      "t2": pa.array([150, None], type=pa.int64()),
                      "j": pa.array([10, 11], type=pa.int64())})
    out = (band_join(_ds(left, 1), _ds(right, 1), "k", "t", "t2",
                     delta_us=50, left_values=["i"], right_values=["j"],
                     num_buckets=2)
           .to_pandas().sort_values(["i", "j"]).reset_index(drop=True))
    # only (i=0, j=10): |100-150| = 50 <= 50 inclusive; nulls match
    # nothing; |300-150| = 150 excluded
    assert out.to_dict("list") == {"i": [0], "j": [10]}


# ----------------------------------------------------- table checksum


def test_table_checksum_matches_sql_and_detects_change(ray_session):
    from verify_ray.pipelines.diff import table_checksum

    rng = np.random.default_rng(101)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b"], n)),
        "x": pa.array(rng.integers(0, 99, n).astype(np.int64)),
        "s": pa.array(rng.choice(["u", "v", None], n))})
    out = table_checksum(_ds(t, 6), ["x", "s"], group_col="g")
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        WITH r AS (SELECT g,
            md5_number_upper(
              concat(CASE WHEN x IS NULL THEN '1' ELSE '0' END,
                     chr(30), COALESCE(CAST(x AS VARCHAR), ''),
                     chr(31),
                     CASE WHEN s IS NULL THEN '1' ELSE '0' END,
                     chr(30), COALESCE(s, ''))) % 1099511627776
              AS term
            FROM pdf)
        SELECT g, COUNT(*) AS n_rows,
               CAST(SUM(term) % 2305843009213693952 AS BIGINT)
                   AS checksum
        FROM r GROUP BY g ORDER BY g""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)

    # flipping ONE value changes its group's checksum only
    t2 = t.set_column(1, "x", pa.array(
        np.where(np.arange(n) == 5,
                 t.column("x").to_numpy() + 1,
                 t.column("x").to_numpy())))
    out2 = table_checksum(_ds(t2, 6), ["x", "s"], group_col="g")
    changed_g = t.column("g")[5].as_py()
    for _, row in out.merge(out2, on="g", suffixes=("_a", "_b")).iterrows():
        same = row["checksum_a"] == row["checksum_b"]
        assert same == (row["g"] != changed_g)


def test_table_checksum_order_insensitive_global(ray_session):
    from verify_ray.pipelines.diff import table_checksum

    t = pa.table({"x": pa.array([3, 1, 2], type=pa.int64())})
    rev = pa.table({"x": pa.array([2, 1, 3], type=pa.int64())})
    a = table_checksum(_ds(t, 2), ["x"])
    b = table_checksum(_ds(rev, 1), ["x"])
    assert a["checksum"].iloc[0] == b["checksum"].iloc[0]
    assert list(a.columns) == ["n_rows", "checksum"]


# --------------------------------- quantile partial-merge routing


def test_exact_quantiles_null_group_and_exchange_route(ray_session):
    from verify_ray.pipelines.analytics import (_merge_partials,
                                                grouped_exact_quantiles)

    rng = np.random.default_rng(107)
    n = 2000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", None], n)),
        "v": pa.array(rng.integers(0, 50, n).astype(np.int64))})
    out = grouped_exact_quantiles(_ds(t, 5), "g", "v")
    pdf = t.to_pandas()
    ref = duckdb.sql("""
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(quantile_disc(v, 0.25) AS BIGINT) AS q25,
               CAST(quantile_disc(v, 0.5) AS BIGINT) AS q50,
               CAST(quantile_disc(v, 0.75) AS BIGINT) AS q75
        FROM pdf GROUP BY g ORDER BY g NULLS FIRST""").df()
    a = out.fillna("~").reset_index(drop=True)
    b = ref.fillna("~").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_like=True)

    # the exchange route (partial_budget=0) must keep null keys too
    import ray.data as rd

    parts = rd.from_arrow(pa.table({
        "g": pa.array(["a", None, "a", None]),
        "cnt": pa.array([1, 2, 3, 4], type=pa.int64())}))
    m = _merge_partials(parts.materialize(), ["g"], {"cnt": "sum"},
                        partial_budget=0, keep_null_keys=True)
    m = m.sort_values("g", na_position="first").reset_index(drop=True)
    assert list(m["cnt"]) == [6, 4]


def test_table_checksum_null_group_is_own_group(ray_session):
    from verify_ray.pipelines.diff import table_checksum

    t = pa.table({"g": pa.array(["a", None, "a", None]),
                  "x": pa.array([1, 2, 3, 4], type=pa.int64())})
    out = table_checksum(_ds(t, 2), ["x"], group_col="g")
    assert len(out) == 2
    assert out["g"].iloc[0] == "a" and out["g"].iloc[1] is None
    assert list(out["n_rows"]) == [2, 2]
