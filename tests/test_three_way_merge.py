"""three_way_merge: every status arm (base/ours/theirs/both/conflict),
winning deletes emit nothing, adds on either/both sides, schema
stability."""

import pandas as pd
import pyarrow as pa


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def _t(rows):
    ks = [r[0] for r in rows]
    vs = [r[1] for r in rows]
    return pa.table({"k": pa.array(ks, pa.int64()),
                     "v": pa.array(vs, pa.string())})


def test_three_way_merge_all_arms(ray_session):
    from verify_ray.pipelines.diff import three_way_merge

    base = _t([(1, "b"), (2, "b"), (3, "b"), (4, "b"), (5, "b"),
               (6, "b"), (7, "b"), (8, "b"), (12, "b")])
    ours = _t([(1, "b"),            # unchanged
               (2, "O"),            # ours changed
               (3, "b"),            # unchanged (theirs changes)
               (4, "S"),            # both change the same
               (5, "O"),            # both change differently
               # 6 deleted by ours (theirs unchanged) -> no row
               # 7 deleted by both -> no row ('both' delete)
               # 8 deleted by ours, changed by theirs -> conflict
               (12, "b"),           # unchanged (theirs deletes)
               (9, "O"),            # added by ours only
               (10, "S"),           # added by both, same
               (11, "O")])          # added by both, different
    theirs = _t([(1, "b"), (2, "b"), (3, "T"), (4, "S"), (5, "T"),
                 (6, "b"), (8, "T"),
                 (10, "S"), (11, "T")])
    out = (three_way_merge(_ds(base), _ds(ours), _ds(theirs), "k", ["v"],
                           num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({
        "k": [1, 2, 3, 4, 5, 8, 9, 10, 11],
        "v": ["b", "O", "T", "S", None, None, "O", "S", None],
        "status": ["base", "ours", "theirs", "both", "conflict",
                   "conflict", "ours", "both", "conflict"]})
    pd.testing.assert_frame_equal(out, want)


def test_three_way_merge_multicol_and_empty(ray_session):
    from verify_ray.pipelines.diff import three_way_merge

    base = pa.table({"k": pa.array([1], pa.int64()),
                     "a": pa.array(["x"]),
                     "b": pa.array([7], pa.int64())})
    # a change in EITHER value column counts as changed
    ours = pa.table({"k": pa.array([1], pa.int64()),
                     "a": pa.array(["x"]),
                     "b": pa.array([8], pa.int64())})
    out = three_way_merge(_ds(base, 1), _ds(ours, 1), _ds(base, 1),
                          "k", ["a", "b"], num_buckets=2).to_pandas()
    assert out.to_dict("records") == [
        {"k": 1, "a": "x", "b": 8, "status": "ours"}]

    # all keys deleted on the winning side -> empty, schema stable
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "a": pa.array([], pa.string()),
                      "b": pa.array([], pa.int64())})
    gone = three_way_merge(_ds(base, 1), _ds(empty, 1), _ds(base, 1),
                           "k", ["a", "b"], num_buckets=2)
    assert gone.schema().names == ["k", "a", "b", "status"]
    assert gone.count() == 0


def test_three_way_merge_null_vs_value_change(ray_session):
    from verify_ray.pipelines.diff import three_way_merge

    # null is a VALUE: base null -> ours "x" is a change; the
    # null-flagged row string cannot confuse null with ""
    base = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "v": pa.array([None, ""], pa.string())})
    ours = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "v": pa.array(["", None], pa.string())})
    out = (three_way_merge(_ds(base, 1), _ds(ours, 1), _ds(base, 1),
                           "k", ["v"], num_buckets=2)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out.status) == ["ours", "ours"]
    assert out.v.tolist() == ["", None]
