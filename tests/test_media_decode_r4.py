"""Round-4 REAL multimodal decode (VERDICT r3 #5): import-guarded
backends (PIL → pure-Python PNG/WAV), round-trip correctness, stub
fallback selection, and the decode actor stage."""

import numpy as np
import pyarrow as pa
import pytest

from verify_ray.pipelines import multimodal as mm


def test_backend_selection_matches_environment():
    # PIL is absent in this sandbox -> the guard must pick pure-python;
    # with PIL importable decode_image must route to it (simulated)
    try:
        import PIL  # noqa: F401
        assert mm.DECODE_BACKEND == "pil"
    except ImportError:
        assert mm.DECODE_BACKEND == "pure-python"


def test_decode_image_uses_pil_when_present(monkeypatch):
    calls = []

    class FakeImage:
        @staticmethod
        def open(buf):
            calls.append(buf.read())
            return np.zeros((2, 2), dtype=np.uint8)

    monkeypatch.setattr(mm, "_PIL_Image", FakeImage)
    out = mm.decode_image(b"fake-bytes")
    assert calls == [b"fake-bytes"]
    assert out.shape == (2, 2)


@pytest.mark.parametrize("shape", [(5, 7), (4, 3, 3), (2, 6, 4)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(sum(shape))
    arr = rng.integers(0, 256, shape).astype(np.uint8)
    out = mm.decode_png(mm.encode_png(arr))
    np.testing.assert_array_equal(out, arr)


def test_png_all_filter_types_decode():
    # hand-build a PNG whose rows use filters 1 (sub), 2 (up),
    # 3 (average), 4 (paeth) — encode_png only emits filter 0, so
    # exercise the un-filter arms directly
    import struct
    import zlib

    w, h, c = 4, 5, 1
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)

    def paeth(a, b, cc):
        p = int(a) + int(b) - int(cc)
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)

    raw = bytearray()
    filters = [0, 1, 2, 3, 4]
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        f = filters[y]
        raw.append(f)
        line = img[y].astype(np.int64)
        for x in range(w):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                raw.append(int(line[x]) & 0xFF)
            elif f == 1:
                raw.append(int(line[x] - a) & 0xFF)
            elif f == 2:
                raw.append(int(line[x] - b) & 0xFF)
            elif f == 3:
                raw.append(int(line[x] - (a + b) // 2) & 0xFF)
            else:
                raw.append(int(line[x] - paeth(int(a), int(b), int(cc))) & 0xFF)
        prev = line

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    np.testing.assert_array_equal(mm.decode_png(png), img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"hello world")
    # 16-bit depth header
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    png16 = (b"\x89PNG\r\n\x1a\n"
             + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)))
    with pytest.raises(ValueError, match="unsupported"):
        mm.decode_png(png16)


def test_wav_roundtrip():
    rng = np.random.default_rng(4)
    s = rng.integers(-2048, 2048, 300).astype(np.int16)
    out, rate = mm.decode_wav(mm.encode_wav(s, rate=8000))
    assert rate == 8000
    np.testing.assert_array_equal(out, s)


def test_media_decoder_stub_fallback_warns(caplog):
    import logging

    dec = mm.MediaDecoder()
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([b"not-a-png", b"also-not"], type=pa.binary()),
        "media_type": pa.array(["image/png", "video/mp4"]),
        "n_bytes": pa.array([9, 8], type=pa.int64())})
    with caplog.at_level(logging.WARNING):
        out = dec(batch)
    assert "falling back to" in caplog.text
    # stub stats: width/height 0, n_samples = byte count, sum of bytes
    assert out["width"].to_pylist() == [0, 0]
    assert out["n_samples"].to_pylist() == [9, 8]
    assert out["value_sum"].to_pylist()[0] == sum(b"not-a-png")


def test_media_decoder_real_stats():
    dec = mm.MediaDecoder()
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    s = np.array([5, -7, 100], dtype=np.int16)
    batch = pa.table({
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "payload": pa.array([mm.encode_png(px), mm.encode_wav(s)],
                            type=pa.binary()),
        "media_type": pa.array(["image/png", "audio/wav"]),
        "n_bytes": pa.array([0, 0], type=pa.int64())})
    out = dec(batch)
    assert out["width"].to_pylist() == [8, 0]
    assert out["height"].to_pylist() == [8, 0]
    assert out["n_samples"].to_pylist() == [64, 3]
    assert out["value_sum"].to_pylist() == [int(px.sum()), 98]


def test_media_decode_stats_pipeline(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "n_chars": pa.array([10, 20, 30, 40], type=pa.int64())})
    out = (mm.media_decode_stats(rd.from_arrow(t))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["media_type"].tolist() == ["image/png", "audio/wav"] * 2
    # closed form: even docs sum((doc_id*31 + i*7 + n_chars) % 256)
    for row in out.itertuples():
        if row.doc_id % 2 == 0:
            i = np.arange(64)
            expect = int(((row.doc_id * 31 + i * 7
                           + t["n_chars"][row.doc_id].as_py()) % 256).sum())
            assert row.value_sum == expect and row.n_samples == 64
        else:
            i = np.arange(256)
            expect = int(((row.doc_id * 13 + i * 5) % 4096 - 2048).sum())
            assert row.value_sum == expect and row.n_samples == 256
