"""read_evolved: one logical schema over mixed-epoch parquet files —
renames resolve, missing columns default/null-fill, dtypes cast,
footer-only planning (one projected read per schema group)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, table):
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, name))


def test_read_evolved_three_epochs(ray_session, tmp_path):
    from verify_ray.sources.parquet import read_evolved

    d = str(tmp_path / "lake")
    # epoch 1: old name "nc", no lang column
    _write(d, "e1.parquet", pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "nc": pa.array([10, 20], pa.int32())}))
    # epoch 2: renamed to n_chars, still no lang
    _write(d, "e2.parquet", pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "n_chars": pa.array([30], pa.int64())}))
    # epoch 3: full current schema
    _write(d, "e3.parquet", pa.table({
        "doc_id": pa.array([4], pa.int64()),
        "n_chars": pa.array([40], pa.int64()),
        "lang": pa.array(["de"])}))

    ds = read_evolved(
        d,
        target={"doc_id": pa.int64(), "n_chars": pa.int64(),
                "lang": pa.string()},
        renames={"nc": "n_chars"},
        defaults={"lang": "en"})
    assert [(f.name, str(f.type)) for f in ds.schema().base_schema] == [
        ("doc_id", "int64"), ("n_chars", "int64"), ("lang", "string")]
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df.doc_id.tolist() == [1, 2, 3, 4]
    assert df.n_chars.tolist() == [10, 20, 30, 40]  # int32 cast up
    assert df.lang.tolist() == ["en", "en", "en", "de"]


def test_read_evolved_null_fill_and_missing(ray_session, tmp_path):
    from verify_ray.sources.parquet import read_evolved

    d = str(tmp_path / "lake")
    _write(d, "e1.parquet", pa.table({
        "doc_id": pa.array([1], pa.int64())}))
    ds = read_evolved(d, target={"doc_id": pa.int64(),
                                 "extra": pa.float64()})
    df = ds.to_pandas()
    assert df.extra.isna().all()

    import pytest
    # a path that is neither dir nor glob is treated as a literal file
    # (list_input_files contract) -> the read itself raises
    with pytest.raises((ValueError, FileNotFoundError)):
        read_evolved(str(tmp_path / "nope"),
                     target={"x": pa.int64()}).materialize()
