"""Skew/hot-key behavior of the uniqueness hash exchange."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_hot_key_preaggregation(ray_session, tmp_path):
    """A key duplicated 100k× must cost ~one row per map task in the
    exchange (per-task value_counts pre-aggregation), and be reported
    once with its full count."""
    from verify_ray.stages.unique import unique_violations_from_files

    files = []
    for i in range(4):
        n = 50_000
        ids = np.array([f"id-{i}-{j}" for j in range(n)], dtype=object)
        ids[::2] = "HOT"  # 25k copies of one key in every file
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(pa.table({"doc_id": pa.array(ids)}), p)
        files.append(p)
    uv = unique_violations_from_files(files, "doc_id")
    rows = {r["doc_id"]: r for r in uv.to_pylist()}
    assert set(rows) == {"HOT"}
    assert "(100000 occurrences)" in rows["HOT"]["message"]


def test_cross_file_duplicates_only(ray_session, tmp_path):
    from verify_ray.stages.unique import unique_violations_from_files

    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(["x", "y", "z"])}), p1)
    pq.write_table(pa.table({"doc_id": pa.array(["z", "w", None])}), p2)
    uv = unique_violations_from_files([p1, p2], "doc_id")
    assert uv.column("doc_id").to_pylist() == ["z"]


def test_run_two_unique_columns(ray_session, tmp_path):
    """regression: multi-unique-column partials must not pool together
    (a value shared ACROSS columns is not a duplicate)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from verify_ray.run import run

    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    # 'x' appears once in col a and once in col b -> NOT a duplicate;
    # 'd' duplicates within col a across files; 'e' within col b
    pq.write_table(pa.table({"a": ["x", "d"], "b": ["e", "q"]}), p1)
    pq.write_table(pa.table({"a": ["d", "y"], "b": ["x", "e"]}), p2)
    spec = {"key": "a", "columns": {"a": {"dtype": "string", "unique": True},
                                    "b": {"dtype": "string", "unique": True}}}
    rep = run(spec, [p1, p2], str(tmp_path / "out"), group_size=1)
    import glob
    import pyarrow.parquet as _pq

    dups = {}
    for f in glob.glob(str(tmp_path / "out" / "violations_global" / "unique" / "*.parquet")):
        t = _pq.read_table(f)
        for r in t.to_pylist():
            dups.setdefault(r["span"], set()).add(r["doc_id"])
    assert dups == {"a": {"d"}, "b": {"e"}}


def test_referential_type_mismatch_flags(ray_session, tmp_path):
    """regression: un-castable column vs manifest keys must flag every
    non-null value, not silently pass."""
    import pyarrow as pa

    from verify_ray.stages.referential import make_ref_rule

    rule = make_ref_rule("c", pa.table({"k": pa.array([1, 2], type=pa.int64())}),
                         "m")
    t = pa.table({"c": pa.array(["abc", None, "2"])})
    mask = rule.mask_fn(t)
    # "2" casts fine... whole-column cast fails on "abc" -> all non-null flag
    assert mask.tolist() == [True, False, True]
