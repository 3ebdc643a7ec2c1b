"""changed_columns: column-scoped dataset diff — per-column change
rows, null transitions, added/removed ids emit nothing."""

import pyarrow as pa


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def test_changed_columns_semantics(ray_session):
    from verify_ray.pipelines.diff import changed_columns

    ref = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "a": pa.array(["x", "x", None, "", "x"]),
        "b": pa.array([10, 20, 30, 40, 50], pa.int64())})
    cur = pa.table({
        # id 5 removed, id 6 added -> neither emits
        "id": pa.array([1, 2, 3, 4, 6], pa.int64()),
        "a": pa.array(["x", "y", "", "", None]),
        "b": pa.array([10, 20, 31, 41, 60], pa.int64())})
    out = (changed_columns(_ds(cur), _ds(ref), "id", ["a", "b"],
                           num_buckets=4)
           .to_pandas().sort_values(["doc_id", "column"])
           .reset_index(drop=True))
    got = list(zip(out.doc_id, out.column))
    # id2: a changed; id3: a null->"" (a REAL change) and b changed;
    # id4: b changed only (""=="" unchanged); id1 unchanged
    assert got == [("2", "a"), ("3", "a"), ("3", "b"), ("4", "b")]


def test_changed_columns_empty_and_schema(ray_session):
    from verify_ray.pipelines.diff import changed_columns

    t = pa.table({"id": pa.array([1], pa.int64()),
                  "a": pa.array(["x"])})
    out = changed_columns(_ds(t, 1), _ds(t, 1), "id", ["a"],
                          num_buckets=2)
    assert out.schema().names == ["doc_id", "column"]
    assert out.count() == 0
