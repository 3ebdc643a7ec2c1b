"""Image average-hash near-dup: AHasher bit rule on hand-built PNGs
(gray / RGB / 16x16 block-average / non-image drop), band-join pairs
vs brute-force popcount, and the simhash refactor regression."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def _expected_ahash(flat: np.ndarray) -> int:
    s = int(flat.sum())
    h = 0
    for i, p in enumerate(flat):
        if int(p) * len(flat) > s:
            h |= 1 << i
    return h


def test_ahasher_bit_rule_and_variants(ray_session):
    from verify_ray.pipelines.multimodal import AHasher, encode_png

    gray = (np.arange(64, dtype=np.int64) * 4 % 256).astype(np.uint8)
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[..., 0] = gray.reshape(8, 8)
    rgb[..., 2] = 10
    big = np.repeat(np.repeat(gray.reshape(8, 8), 2, 0), 2, 1)  # 16x16
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "media_type": pa.array(["image/png", "image/png", "image/png",
                                "audio/wav"]),
        "payload": pa.array([encode_png(gray.reshape(8, 8)),
                             encode_png(rgb), encode_png(big),
                             b"RIFFnotapng"], pa.binary()),
    })
    out = AHasher()(batch)
    ids = out["doc_id"].to_pylist()
    hs = dict(zip(ids, out["ahash"].to_pylist()))
    assert ids == [1, 2, 3]          # audio payload dropped
    g64 = gray.astype(np.int64)
    assert hs[1] == _expected_ahash(g64)
    # RGB: integer luma = channel sum; constant blue shifts every
    # pixel AND the mean equally -> same bits as gray
    assert hs[2] == _expected_ahash(g64 + 10)
    assert hs[2] == hs[1]
    # 16x16: 2x2 block sums of a pixel-doubled image scale uniformly
    assert hs[3] == _expected_ahash(4 * g64)
    assert hs[3] == hs[1]


def test_image_ahash_pairs_matches_brute(ray_session):
    from verify_ray.pipelines.multimodal import (AHasher,
                                                 image_ahash_pairs,
                                                 synth_media_batch)

    n = 120
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "n_chars": pa.array([(i * 37) % 300 for i in range(n)],
                                      pa.int64())})
    got = image_ahash_pairs(_ds(t), max_hamming=3)
    # brute force over the same sketches
    hs = AHasher()(synth_media_batch(t))
    ids = hs["doc_id"].to_pylist()
    vals = [int(v) for v in hs["ahash"].to_pylist()]
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(vals[i] ^ vals[j]).count("1") <= 3:
                a, b = sorted((ids[i], ids[j]))
                want.add((a, b))
    assert set(zip(got.doc_a, got.doc_b)) == want and len(want) > 0


def test_simhash_refactor_regression(ray_session):
    # simhash_pairs must keep finding the planted near-dup after the
    # hamming_pairs_from_hashes refactor
    from verify_ray.pipelines.dedup import simhash_pairs

    base = "the quick brown fox jumps over the lazy dog " * 10
    texts = [base, base + "extra", "совершенно другой текст " * 12]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = simhash_pairs(_ds(t), max_hamming=5)
    assert (0, 1) in set(zip(out.doc_a, out.doc_b))
    assert not any(2 in p for p in zip(out.doc_a, out.doc_b))
