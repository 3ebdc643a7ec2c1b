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
