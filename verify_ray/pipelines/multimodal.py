"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real media codecs are not available in this environment, so the DECODE
step is a deterministic stub (clearly marked); everything around it —
the binary-column schema, actor-pool stage shape, batch sizing for
large payloads, output layout — is real and tested.  Swapping
``StubImageDecoder._decode_one`` for a PIL/ffmpeg call is the only
change needed on a real cluster.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

PAYLOAD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("payload", pa.binary()),       # opaque media bytes
        ("media_type", pa.string()),    # e.g. image/png, audio/wav
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("checksum", pa.string()),        # md5 of payload
        ("feature", pa.list_(pa.float32())),  # decoded feature vector
    ]
)


def to_payload_batch(batch: pa.Table, content_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Turn a text column into an opaque binary payload column — the
    testdata stand-in for real media bytes (deterministic: utf-8 bytes,
    media_type by doc_id parity)."""
    texts = batch[content_col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    payloads = [t.encode("utf-8") if t is not None else None for t in texts]
    mtypes = ["image/png" if i % 2 == 0 else "audio/wav" for i in ids]
    return pa.table(
        {
            "doc_id": batch[id_col],
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(mtypes, type=pa.string()),
            "n_bytes": pa.array([len(p) if p is not None else 0 for p in payloads],
                                type=pa.int64()),
        }
    )


class StubImageDecoder:
    """Actor-pool decode/feature-extract stage.

    The stateful-stage pattern in full: "model load" happens once per
    actor in __init__; __call__ decodes a batch of payloads into fixed-
    size feature vectors.  `_decode_one` is the STUB — deterministic
    bytes→features; a real deployment replaces it with an image/audio
    codec + model forward pass (and keeps batch_size small: payload
    bytes × batch_size × concurrency must fit the worker heap).
    """

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim
        # stands in for: self.model = load_model(...)
        self._mixer = np.arange(1, feature_dim + 1, dtype=np.float32)

    def _decode_one(self, payload: bytes) -> np.ndarray:
        # STUB — deterministic fake decode: crc32-seeded profile of the
        # byte histogram.  NOT a real media decode.
        if payload is None:
            return np.zeros(self.feature_dim, dtype=np.float32)
        hist = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                           minlength=256).astype(np.float32)
        seed = zlib.crc32(payload) % 997 + 1
        folded = hist.reshape(self.feature_dim, 256 // self.feature_dim).sum(axis=1)
        return np.round(folded * self._mixer / seed, 4)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = [self._decode_one(p) for p in payloads]
        cks = [hashlib.md5(p).hexdigest() if p is not None else None
               for p in payloads]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_type": batch["media_type"],
                "n_bytes": batch["n_bytes"],
                "checksum": pa.array(cks, type=pa.string()),
                "feature": pa.array([f.tolist() for f in feats],
                                    type=pa.list_(pa.float32())),
            }
        )


def media_features(ds, content_col: str = "text", id_col: str = "doc_id",
                   concurrency=2, batch_size: int = 1024):
    """documents -> payloads -> decoded features (actor pool).

    batch_size deliberately small: binary payload stages are sized by
    BYTES (payload × batch × concurrency), not rows.
    """
    payloads = ds.map_batches(
        lambda b: to_payload_batch(b, content_col, id_col),
        batch_format="pyarrow")
    return payloads.map_batches(
        StubImageDecoder, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


FRAME_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("frame_idx", pa.int64()),       # frame number within the payload
        ("frame_n_bytes", pa.int64()),
        ("frame_checksum", pa.string()),
    ]
)


class StubFrameSampler:
    """Actor-pool frame-sampling stage (one payload -> many frame rows).

    Treats the opaque payload as a fixed-frame-size "video": frame i is
    bytes [i*frame_bytes, (i+1)*frame_bytes); every ``every``-th frame
    is emitted as its own row.  The CHUNKING is the real plumbing under
    test (one-to-many row expansion, byte-sized batching); a real
    deployment replaces the byte slicing with an ffmpeg/pyav frame
    iterator in ``_frames_of`` and keeps everything else.
    """

    def __init__(self, frame_bytes: int = 256, every: int = 4):
        self.frame_bytes = frame_bytes
        self.every = every

    def _frames_of(self, payload: bytes):
        # STUB decode boundary: byte-sliced pseudo-frames
        for i in range(0, -(-len(payload) // self.frame_bytes), self.every):
            yield i, payload[i * self.frame_bytes:(i + 1) * self.frame_bytes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, sizes, cks = [], [], [], []
        for doc_id, payload in zip(batch["doc_id"].to_pylist(),
                                   batch["payload"].to_pylist()):
            if payload is None:
                continue
            for i, frame in self._frames_of(payload):
                ids.append(doc_id)
                idxs.append(i)
                sizes.append(len(frame))
                cks.append(hashlib.md5(frame).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(idxs, type=pa.int64()),
            "frame_n_bytes": pa.array(sizes, type=pa.int64()),
            "frame_checksum": pa.array(cks, type=pa.string()),
        })


class StubResizer:
    """Actor-pool resize stage: payload -> fixed-size payload.

    STUB transform = truncate-or-zero-pad to ``target_bytes`` (a real
    deployment swaps in PIL/libvips resize); schema, sizing and
    determinism are the tested surface.
    """

    def __init__(self, target_bytes: int = 512):
        self.target_bytes = target_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["payload"].to_pylist():
            if p is None:
                out.append(None)
            elif len(p) >= self.target_bytes:
                out.append(p[: self.target_bytes])
            else:
                out.append(p + b"\x00" * (self.target_bytes - len(p)))
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "payload": pa.array(out, type=pa.binary()),
            "n_bytes": pa.array(
                [len(p) if p is not None else 0 for p in out],
                type=pa.int64()),
        })


def media_frames(ds, content_col: str = "text", id_col: str = "doc_id",
                 frame_bytes: int = 256, every: int = 4,
                 concurrency=2, batch_size: int = 512):
    """documents -> payloads -> sampled frame rows (actor pool)."""
    payloads = ds.map_batches(
        lambda b: to_payload_batch(b, content_col, id_col),
        batch_format="pyarrow")
    return payloads.map_batches(
        StubFrameSampler,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "every": every},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def media_resized(ds, content_col: str = "text", id_col: str = "doc_id",
                  target_bytes: int = 512, concurrency=2,
                  batch_size: int = 512):
    """documents -> payloads -> resized payloads (actor pool)."""
    payloads = ds.map_batches(
        lambda b: to_payload_batch(b, content_col, id_col),
        batch_format="pyarrow")
    return payloads.map_batches(
        StubResizer, fn_constructor_kwargs={"target_bytes": target_bytes},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
