"""Round-4 session-4 operator tests: cross-column comparison rules
(the `compare` ColumnSpec key — column-rhs generalization of the
reference's constant bounds, macros.rs:261-315)."""

import numpy as np
import pyarrow as pa
import pytest

from verify_ray.spec import ConstraintSpec, SpecError


def _compile(cols):
    return ConstraintSpec.from_dict(
        {"table": "t", "key": "id", "columns": cols}).compile()


def _cmp_masks(plan, t):
    return {r.span: r.mask_fn(t)
            for r in plan.row_rules if r.rule_id == "column_comparison"}


class TestCompareColumns:
    def test_all_six_ops(self):
        plan = _compile({
            "id": {"dtype": "int64"},
            "b": {"dtype": "int64"},
            "lt": {"dtype": "int64", "compare": [{"column": "b", "op": "lt"}]},
            "le": {"dtype": "int64", "compare": [{"column": "b", "op": "le"}]},
            "gt": {"dtype": "int64", "compare": [{"column": "b", "op": "gt"}]},
            "ge": {"dtype": "int64", "compare": [{"column": "b", "op": "ge"}]},
            "eq": {"dtype": "int64", "compare": [{"column": "b", "op": "eq"}]},
            "ne": {"dtype": "int64", "compare": [{"column": "b", "op": "ne"}]},
        })
        t = pa.table({"id": [1, 2, 3], "b": [5, 5, 5],
                      "lt": [4, 5, 6], "le": [4, 5, 6], "gt": [4, 5, 6],
                      "ge": [4, 5, 6], "eq": [4, 5, 6], "ne": [4, 5, 6]})
        m = _cmp_masks(plan, t)
        # violation mask = NOT(op) on comparable non-null rows
        assert m["lt"].tolist() == [False, True, True]
        assert m["le"].tolist() == [False, False, True]
        assert m["gt"].tolist() == [True, True, False]
        assert m["ge"].tolist() == [True, False, False]
        assert m["eq"].tolist() == [True, False, True]
        assert m["ne"].tolist() == [False, True, False]

    def test_null_and_nan_never_trip(self):
        plan = _compile({
            "id": {"dtype": "int64"},
            "a": {"dtype": "float64", "compare": [{"column": "b", "op": "lt"}]},
            "b": {"dtype": "float64"},
        })
        t = pa.table({
            "id": [1, 2, 3, 4, 5],
            "a": pa.array([9.0, None, 9.0, float("nan"), 9.0], "float64"),
            "b": pa.array([1.0, 1.0, None, 1.0, float("nan")], "float64"),
        })
        (m,) = _cmp_masks(plan, t).values()
        # row 1 trips (9 !< 1); null/NaN on either side never trips
        assert m.tolist() == [True, False, False, False, False]

    def test_timestamp_comparison(self):
        plan = _compile({
            "id": {"dtype": "int64"},
            "start": {"dtype": "timestamp[us]",
                      "compare": [{"column": "end", "op": "le"}]},
            "end": {"dtype": "timestamp[us]"},
        })
        t = pa.table({
            "id": [1, 2],
            "start": pa.array([1000, 5000], pa.timestamp("us")),
            "end": pa.array([2000, 4000], pa.timestamp("us")),
        })
        (m,) = _cmp_masks(plan, t).values()
        assert m.tolist() == [False, True]

    def test_incomparable_dtypes_never_trip(self):
        plan = _compile({
            "id": {"dtype": "int64"},
            "a": {"dtype": "string", "compare": [{"column": "b", "op": "lt"}]},
            "b": {"dtype": "int64"},
        })
        t = pa.table({"id": [1], "a": ["x"], "b": [1]})
        (m,) = _cmp_masks(plan, t).values()
        assert m.tolist() == [False]

    def test_missing_column_never_trips(self):
        plan = _compile({
            "id": {"dtype": "int64"},
            "a": {"dtype": "int64", "compare": [{"column": "b", "op": "lt"}]},
            "b": {"dtype": "int64"},
        })
        t = pa.table({"id": [1], "a": [3]})  # b absent from the batch
        (m,) = _cmp_masks(plan, t).values()
        assert m.tolist() == [False]

    def test_spec_errors(self):
        with pytest.raises(SpecError) as ei:
            _compile({
                "id": {"dtype": "int64"},
                "a": {"compare": [{"column": "zz", "op": "xx", "junk": 1}]},
            })
        msg = str(ei.value)
        assert '"zz" is not declared' in msg
        assert "op must be one of" in msg
        assert "unknown keys" in msg
        with pytest.raises(SpecError):
            _compile({"id": {}, "a": {"compare": {"column": "id", "op": "lt"}}})

    def test_referenced_columns_pruned_read(self):
        # the rhs column must appear in the compiled read projection
        plan = _compile({
            "id": {"dtype": "int64"},
            "a": {"dtype": "int64", "compare": [{"column": "b", "op": "lt"}]},
            "b": {"dtype": "int64"},
        })
        assert "b" in plan.referenced_columns

    def test_cross_column_query_matches_oracle_sf0001(self, ray_session):
        import duckdb
        from verify_ray.pipelines.validation_queries import (
            CROSS_COLUMN_ORACLE, validate_cross_column)

        sf = "/root/testdata/sf0.001"
        got = validate_cross_column(sf)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS "
            f"SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
        want = con.execute(CROSS_COLUMN_ORACLE).df()
        assert len(got) > 0  # non-trivial on the testdata
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        want = want.sort_values(list(want.columns)).reset_index(drop=True)
        assert got.columns.tolist() == want.columns.tolist()
        assert got.equals(want)


class TestGroupedMode:
    def _mode(self, rows, **kw):
        import ray.data as rd

        from verify_ray.pipelines.analytics import grouped_mode

        ds = rd.from_arrow(pa.table(rows)).materialize()
        return grouped_mode(ds, "g", "v", **kw)

    def test_basic_and_tie_break(self, ray_session):
        out = self._mode({"g": ["a", "a", "a", "b", "b", "b", "b"],
                          "v": ["x", "y", "y", "q", "p", "q", "p"]})
        # a: y wins 2-1; b: p/q tie 2-2 -> smallest value p
        assert out.g.tolist() == ["a", "b"]
        assert out.mode_value.tolist() == ["y", "p"]
        assert out.mode_count.tolist() == [2, 2]

    def test_null_value_ignored_null_group_kept(self, ray_session):
        out = self._mode({"g": ["a", "a", None, None, "a"],
                          "v": ["x", None, "z", "z", "x"]})
        assert out.g.tolist()[:1] == ["a"]
        assert out.mode_value.tolist() == ["x", "z"]
        assert out.g.isna().tolist() == [False, True]

    def test_multi_block_merge(self, ray_session):
        import ray.data as rd

        from verify_ray.pipelines.analytics import grouped_mode

        # same rows split across 4 blocks must merge counts exactly
        t = pa.table({"g": ["a"] * 40 + ["b"] * 40,
                      "v": (["x"] * 15 + ["y"] * 25) + (["y"] * 19 + ["x"] * 21)})
        ds = rd.from_arrow(t).repartition(4).materialize()
        out = grouped_mode(ds, "g", "v")
        assert out.mode_value.tolist() == ["y", "x"]
        assert out.mode_count.tolist() == [25, 21]

    def test_empty(self, ray_session):
        out = self._mode({"g": pa.array([], type=pa.string()),
                          "v": pa.array([], type=pa.string())})
        assert len(out) == 0
        assert out.mode_count.dtype == "int64"


class TestZscoreOutliers:
    def _run(self, rows, k=1, nblocks=1):
        import ray.data as rd

        from verify_ray.pipelines.analytics import zscore_outliers

        ds = rd.from_arrow(pa.table(rows))
        if nblocks > 1:
            ds = ds.repartition(nblocks)
        out = zscore_outliers(ds.materialize(), "g", "x", "id", k=k)
        df = out.to_pandas()
        if len(df) == 0:  # all-empty blocks: Ray to_pandas drops names
            return df
        return df.sort_values("id").reset_index(drop=True)

    def test_strict_boundary_exact(self, ray_session):
        # g: values 0,0,8,8 -> mean 4, pop sigma 4.  k=1: |x-4| > 4 is
        # STRICT — values exactly at the fence must NOT trip.
        out = self._run({"id": [1, 2, 3, 4], "g": ["a"] * 4,
                         "x": [0, 0, 8, 8]})
        assert len(out) == 0
        # shift one value to 9: mean 17/4, var (x-mean)^2... recompute
        # exactly: n=4 S=17 S2=145, R=4*145-289=291, T=isqrt(291)=17
        # n*x > S+T -> 4x > 34 -> x >= 9 ; n*x < S-T -> 4x < 0 -> x < 0
        out = self._run({"id": [1, 2, 3, 4], "g": ["a"] * 4,
                         "x": [0, 0, 8, 9]})
        assert out.id.tolist() == [4]
        assert out.x.tolist() == [9]

    def test_perfect_square_r(self, ray_session):
        # n=2, x={0,4}: S=4 S2=16 R=k^2*(2*16-16)=16 (perfect square),
        # T=4; n*x>S+T -> 2x>8 -> x>4: nothing trips; x=5 instead: S=5
        # S2=25 R=25 T=5 -> 2x>10 -> x>5: still nothing (both at fence)
        out = self._run({"id": [1, 2], "g": ["a", "a"], "x": [0, 4]})
        assert len(out) == 0
        out = self._run({"id": [1, 2], "g": ["a", "a"], "x": [0, 5]})
        assert len(out) == 0

    def test_nulls_ignored(self, ray_session):
        out = self._run({"id": [1, 2, 3, 4, 5, 6],
                         "g": ["a", "a", "a", "a", None, "a"],
                         "x": [10, 10, 10, None, 99, 100]})
        # nulls drop from stats; group of {10,10,10,100}: the 100 trips
        assert out.id.tolist() == [6]

    def test_multi_block_same_as_single(self, ray_session):
        rows = {"id": list(range(40)), "g": ["a", "b"] * 20,
                "x": [7] * 38 + [1000, -500]}
        one = self._run(rows, k=2, nblocks=1)
        four = self._run(rows, k=2, nblocks=4)
        assert one.equals(four)
        assert set(one.id) == {38, 39}

    def test_two_groups_independent(self, ray_session):
        out = self._run({"id": [1, 2, 3, 4, 5, 6],
                         "g": ["a", "a", "a", "b", "b", "b"],
                         "x": [5, 5, 500, 500, 500, 5]})
        assert out.id.tolist() == [3, 6]


class TestMergeIntervals:
    def _run(self, rows, nblocks=1, **kw):
        import ray.data as rd

        from verify_ray.pipelines.sessions import merge_intervals

        ds = rd.from_arrow(pa.table(rows))
        if nblocks > 1:
            ds = ds.repartition(nblocks)
        out = merge_intervals(ds.materialize(), "k", "s", "e", **kw)
        df = out.to_pandas()
        if len(df) == 0:
            return df
        return df.sort_values(["key", "start_us"]).reset_index(drop=True)

    def test_overlap_touch_and_gap(self, ray_session):
        out = self._run({"k": [1, 1, 1, 1],
                         "s": [0, 5, 10, 21],
                         "e": [6, 10, 20, 30]})
        # [0,6]+[5,10] overlap; [10,20] touches; [21,30] new island
        assert out.start_us.tolist() == [0, 21]
        assert out.end_us.tolist() == [20, 30]
        assert out.n_merged.tolist() == [3, 1]

    def test_nested_interval_extends_running_end(self, ray_session):
        # [0,100] swallows [10,20]; [50,60] still inside; [90,110] chains
        out = self._run({"k": [1] * 4,
                         "s": [0, 10, 50, 90],
                         "e": [100, 20, 60, 110]})
        assert out.start_us.tolist() == [0]
        assert out.end_us.tolist() == [110]
        assert out.n_merged.tolist() == [4]

    def test_keys_isolated_and_string_keys(self, ray_session):
        out = self._run({"k": ["a", "b", "a"],
                         "s": [0, 5, 8], "e": [10, 6, 20]})
        assert out.key.tolist() == ["a", "b"]
        assert out.n_merged.tolist() == [2, 1]

    def test_multi_block_invariance(self, ray_session):
        import numpy as np

        rng = np.random.RandomState(7)
        n = 500
        rows = {"k": rng.randint(0, 20, n).tolist(),
                "s": rng.randint(0, 10_000, n).tolist()}
        rows["e"] = [s + int(d) for s, d in
                     zip(rows["s"], rng.randint(1, 500, n))]
        one = self._run(rows, nblocks=1)
        eight = self._run(rows, nblocks=8, num_buckets=16)
        assert one.equals(eight)

    def test_null_rows_drop(self, ray_session):
        out = self._run({"k": [1, None, 1], "s": [0, 5, None],
                         "e": [10, 20, 30]})
        assert out.n_merged.tolist() == [1]


class TestPrefixDupGroups:
    def _run(self, ids, toks, nblocks=1, **kw):
        import ray.data as rd

        from verify_ray.pipelines.spans import prefix_dup_groups

        t = pa.table({"doc_id": pa.array(ids, type=pa.string()),
                      "tokens": pa.array(toks,
                                         type=pa.list_(pa.int32()))})
        ds = rd.from_arrow(t)
        if nblocks > 1:
            ds = ds.repartition(nblocks)
        out = prefix_dup_groups(ds.materialize(), **kw)
        df = out.to_pandas()
        if len(df) == 0:
            return df
        return df.sort_values("doc_id").reset_index(drop=True)

    def test_head_groups_and_short_rows_skip(self, ray_session):
        out = self._run(
            ["a", "b", "c", "d"],
            [[1, 2, 3, 9], [1, 2, 3, 7], [1, 2], [4, 5, 6]], k=3)
        # a,b share prefix (1 2 3); c too short; d alone
        assert out.doc_id.tolist() == ["a", "b"]
        assert out.group_min.tolist() == ["a", "a"]
        assert out.group_size.tolist() == [2, 2]

    def test_tail_mode(self, ray_session):
        out = self._run(
            ["a", "b", "c"],
            [[9, 1, 2, 3], [7, 7, 1, 2, 3], [1, 2, 4]], k=3, tail=True)
        assert out.doc_id.tolist() == ["a", "b"]

    def test_multi_block_and_group_min(self, ray_session):
        ids = [f"d{i:02d}" for i in range(12)]
        toks = [[5, 5, 5, i] for i in range(6)] + \
               [[8, 8, 8, i] for i in range(6)]
        out = self._run(ids, toks, nblocks=4, k=3, num_buckets=8)
        assert len(out) == 12
        assert set(out.group_size) == {6}
        assert out[out.doc_id < "d06"].group_min.unique().tolist() == ["d00"]
        assert out[out.doc_id >= "d06"].group_min.unique().tolist() == ["d06"]

    def test_no_dups(self, ray_session):
        out = self._run(["a", "b"], [[1, 2, 3], [4, 5, 6]], k=3)
        assert len(out) == 0


class TestTokenRunStats:
    def _run(self, ids, toks):
        import ray.data as rd

        from verify_ray.pipelines.spans import token_run_stats

        t = pa.table({"doc_id": pa.array(ids, type=pa.string()),
                      "tokens": pa.array(toks,
                                         type=pa.list_(pa.int32()))})
        out = token_run_stats(rd.from_arrow(t))
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def test_runs(self, ray_session):
        out = self._run(
            ["a", "b", "c", "d", "e"],
            [[7, 7, 7, 1, 1], [1, 2, 3], [], [5], [2, 2, 9, 2, 2, 2]])
        assert out.n_tok.tolist() == [5, 3, 0, 1, 6]
        assert out.n_runs.tolist() == [2, 3, 0, 1, 3]
        assert out.max_run.tolist() == [3, 1, 0, 1, 3]

    def test_runs_never_span_rows(self, ray_session):
        # row boundary splits a would-be run of 4s
        out = self._run(["a", "b"], [[4, 4], [4, 4, 4]])
        assert out.max_run.tolist() == [2, 3]

    def test_null_token_array_is_empty(self, ray_session):
        out = self._run(["a", "b"], [None, [1, 1]])
        assert out.n_tok.tolist() == [0, 2]
        assert out.max_run.tolist() == [0, 2]


class TestSourceJaccard:
    def test_exact_sets(self, ray_session):
        import ray.data as rd

        from verify_ray.pipelines.contamination import source_jaccard

        t = pa.table({
            "source": ["A", "A", "B", "C"],
            "tokens": pa.array([[1, 2, 3], [3, 4], [2, 3, 9], [100]],
                               type=pa.list_(pa.int32()))})
        out = source_jaccard(rd.from_arrow(t).repartition(2).materialize())
        # A={1,2,3,4} B={2,3,9} C={100}: only (A,B) share tokens
        assert out.source_a.tolist() == ["A"]
        assert out.source_b.tolist() == ["B"]
        assert out.n_common.tolist() == [2]
        assert out.n_union.tolist() == [5]

    def test_duplicate_tokens_counted_once(self, ray_session):
        import ray.data as rd

        from verify_ray.pipelines.contamination import source_jaccard

        t = pa.table({
            "source": ["A", "B", "B"],
            "tokens": pa.array([[5, 5, 5], [5], [5, 5]],
                               type=pa.list_(pa.int32()))})
        out = source_jaccard(rd.from_arrow(t).materialize())
        assert out.n_common.tolist() == [1]
        assert out.n_union.tolist() == [1]


class TestKMVDistinct:
    def _run(self, rows, k=4, nblocks=1):
        import ray.data as rd

        from verify_ray.pipelines.analytics import kmv_distinct

        ds = rd.from_arrow(pa.table(rows))
        if nblocks > 1:
            ds = ds.repartition(nblocks)
        return kmv_distinct(ds.materialize(), "g", "v", k=k)

    def test_exact_below_k(self, ray_session):
        out = self._run({"g": ["a"] * 6, "v": [1, 2, 3, 1, 2, 1]}, k=10)
        assert out.n_reg.tolist() == [3]
        assert out.est.tolist() == [3]  # exact while register not full

    def test_merge_invariance(self, ray_session):
        rows = {"g": ["a", "b"] * 200,
                "v": [i % 37 for i in range(400)]}
        one = self._run(rows, k=8, nblocks=1)
        six = self._run(rows, k=8, nblocks=6)
        assert one.equals(six)
        assert (one.n_reg == 8).all()  # register full at 37 distinct

    def test_estimator_accuracy(self, ray_session):
        n = 5000
        out = self._run({"g": ["a"] * n, "v": list(range(n))}, k=256)
        est = out.est.iloc[0]
        assert abs(est - n) / n < 0.2  # ~1/sqrt(k) relative error

    def test_register_is_k_smallest(self, ray_session):
        from verify_ray.functions.hashing import md5_u64le

        vals = list(range(100))
        out = self._run({"g": ["a"] * 100, "v": vals}, k=5)
        h = sorted(int(x) for x in
                   md5_u64le(pa.array([str(v) for v in vals])))
        assert out.kth_hash.iloc[0] == str(h[4])
        assert out.reg_checksum.iloc[0] == sum(x % 1_000_000_007
                                               for x in h[:5])


class TestWinsorize:
    def test_clamps_to_discrete_fences(self, ray_session):
        import ray.data as rd

        from verify_ray.pipelines.analytics import winsorize

        # 20 values 1..20 in one group: q05 -> index ceil(.05*20)-1 = 0
        # (value 1), q95 -> index ceil(.95*20)-1 = 18 (value 19)
        t = pa.table({"id": list(range(20)), "g": ["a"] * 20,
                      "v": list(range(1, 21))})
        out = (winsorize(rd.from_arrow(t).materialize(), "g", "v", "id")
               .to_pandas().sort_values("id"))
        assert out.v_w.max() == 19  # 20 clamped down
        assert out.v_w.min() == 1
        assert out.v_w.tolist()[:3] == [1, 2, 3]  # interior untouched

    def test_null_rows_omitted_groups_isolated(self, ray_session):
        import ray.data as rd

        from verify_ray.pipelines.analytics import winsorize

        t = pa.table({"id": [1, 2, 3, 4],
                      "g": ["a", "a", None, "b"],
                      "v": [5, None, 7, 9]})
        out = (winsorize(rd.from_arrow(t).materialize(), "g", "v", "id")
               .to_pandas().sort_values("id"))
        assert out.id.tolist() == [1, 4]


class TestGlobalNtile:
    def _run(self, n_rows, n_tiles):
        import ray.data as rd

        from verify_ray.pipelines.select import global_ntile

        t = pa.table({"id": list(range(n_rows)),
                      "s": [i % 7 for i in range(n_rows)]})
        out = global_ntile(rd.from_arrow(t).repartition(3), "s", "id",
                           n_tiles, values=["id", "s"], num_buckets=8)
        return out.to_pandas().sort_values("id").reset_index(drop=True)

    def test_sql_tile_rule(self, ray_session):
        # m=10, n=3: sizes 4,3,3 under (s, id) order
        out = self._run(10, 3)
        sizes = out.tile.value_counts().sort_index().tolist()
        assert sizes == [4, 3, 3]

    def test_more_tiles_than_rows(self, ray_session):
        out = self._run(3, 10)
        assert sorted(out.tile.tolist()) == [1, 2, 3]


class TestBucketedJoin:
    @pytest.fixture()
    def layouts(self, ray_session, tmp_path):
        import ray.data as rd

        rng = np.random.RandomState(11)
        left = pa.table({
            "k": [int(x) if x >= 0 else None
                  for x in rng.randint(-1, 30, 200)],
            "lv": list(range(200))})
        right = pa.table({
            "k": [int(x) if x >= 0 else None
                  for x in rng.randint(-1, 25, 150)],
            "rv": [i * 10 for i in range(150)]})
        from verify_ray.pipelines.joins import write_bucketed

        dl, dr = str(tmp_path / "L"), str(tmp_path / "R")
        ml = write_bucketed(rd.from_arrow(left).repartition(4), "k", 8, dl)
        mr = write_bucketed(rd.from_arrow(right).repartition(3), "k", 8, dr)
        assert ml.rows.sum() == 200 and mr.rows.sum() == 150
        return left, right, dl, dr

    @pytest.mark.parametrize("how", ["inner", "left", "right", "full",
                                     "semi", "anti"])
    def test_matches_hash_join(self, layouts, how):
        import ray.data as rd

        from verify_ray.pipelines.joins import bucketed_join, hash_join

        left, right, dl, dr = layouts
        rvals = [] if how in ("semi", "anti") else ["rv"]
        got = bucketed_join(dl, dr, "k", ["k", "lv"], rvals,
                            how=how).to_pandas()
        want = hash_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                         ["k", "lv"], rvals, how=how).to_pandas()
        cols = list(want.columns)
        got = got.sort_values(cols).reset_index(drop=True)
        want = want.sort_values(cols).reset_index(drop=True)
        assert got.equals(want), how

    def test_mismatched_layouts_rejected(self, layouts, tmp_path):
        import ray.data as rd

        from verify_ray.pipelines.joins import bucketed_join, write_bucketed

        left, right, dl, dr = layouts
        d2 = str(tmp_path / "R2")
        write_bucketed(rd.from_arrow(right), "k", 4, d2)  # wrong B
        with pytest.raises(ValueError, match="bucket counts differ"):
            bucketed_join(dl, d2, "k", ["k", "lv"], ["rv"])
