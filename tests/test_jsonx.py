"""functions.jsonx: vectorized JSON field extraction + Python-fallback
parity."""

import sys

import pyarrow as pa
import pytest


CASES = pa.array([
    '{"k": 7, "tag": "x", "nest": {"d": 3}}',
    "not json",
    None,
    "{}",
    '{"k": "9"}',          # JSON CAST: string "9" -> 9
    '{"k": 1.5}',          # non-integer number -> CAST truncates? see test
    '{"k": true}',
    '{"tag": 42}',
], type=pa.string())


def test_json_extract_int64_duckdb():
    from verify_ray.functions.jsonx import json_extract_int64

    out = json_extract_int64(CASES, "$.k").to_pylist()
    assert out[0] == 7
    assert out[1] is None and out[2] is None and out[3] is None
    assert out[4] == 9
    assert out[7] is None  # missing key


def test_json_extract_string_and_nested():
    from verify_ray.functions.jsonx import (json_extract_int64,
                                            json_extract_string)

    s = json_extract_string(CASES, "$.tag").to_pylist()
    assert s[0] == "x"
    assert s[1] is None and s[2] is None and s[3] is None
    assert s[7] == "42"  # scalar rendered as its JSON text
    n = json_extract_int64(CASES, "$.nest.d").to_pylist()
    assert n[0] == 3 and n[4] is None


def test_python_fallback_parity(monkeypatch):
    from verify_ray.functions import jsonx

    duck_int = jsonx.json_extract_int64(CASES, "$.k").to_pylist()
    duck_str = jsonx.json_extract_string(CASES, "$.tag").to_pylist()
    duck_nest = jsonx.json_extract_int64(CASES, "$.nest.d").to_pylist()

    monkeypatch.setitem(sys.modules, "duckdb", None)  # import -> error
    py_int = jsonx.json_extract_int64(CASES, "$.k").to_pylist()
    py_str = jsonx.json_extract_string(CASES, "$.tag").to_pylist()
    py_nest = jsonx.json_extract_int64(CASES, "$.nest.d").to_pylist()

    # the bool row is the one documented divergence risk: pin both
    assert duck_int == py_int
    assert duck_str == py_str
    assert duck_nest == py_nest


def test_parse_json_fields_dataset(ray_session):
    import ray.data as rd

    from verify_ray.functions.jsonx import parse_json_fields

    t = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                  "props": pa.array(['{"k": 5, "tag": "a"}', "bad"])})
    out = (parse_json_fields(rd.from_arrow(t), "props",
                             int_fields={"k": "$.k"},
                             str_fields={"tag": "$.tag"})
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["k"].tolist()[0] == 5
    assert out["tag"].tolist() == ["a", None]
    assert "props" in out.columns
