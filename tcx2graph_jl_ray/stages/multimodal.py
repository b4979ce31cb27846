"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns plus a metadata
struct (format, width, height). Decode / feature-extract / resize run as
actor-pool ``map_batches`` stages with SMALL batch sizes (a batch of large
binaries times pool concurrency must fit worker heap — the memory note from
the project brief). The actual codecs (PIL/ffmpeg) are not present in this
container, so the decode step is STUBBED: the Ray-side plumbing — schema,
actor signature, batch sizing, output layout — is real and tested, while
``format`` values other than ``fake`` raise ``NotImplementedError``.

The ``fake`` decoder is deterministic (content-hash -> feature vector), so
downstream stages (e.g. embedding-cosine near-dup over these features) are
testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

FAKE_FORMAT = "fake"
_FEATURE_DIM = 8


def attach_fake_payload(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Test/bench helper: synthesize a binary payload column (+ metadata) from
    the text column, standing in for real image bytes."""

    def make(batch: pd.DataFrame) -> pd.DataFrame:
        payload = [t.encode() for t in batch["text"].to_numpy()]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "payload": payload,
                "format": FAKE_FORMAT,
                "width": pd.array([len(p) % 640 for p in payload], dtype="int32"),
                "height": pd.array([len(p) % 480 for p in payload], dtype="int32"),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        make, batch_format="pandas", batch_size=2048
    )


class PayloadFeatureExtractor:
    """Actor-pool stage: binary payload -> fixed-dim feature vector.

    __init__ is where a real model/codec would load ONCE per actor; here it
    resolves the decoder table. Unknown formats fail loudly — a stub must
    never silently fabricate output for real media.
    """

    def __init__(self):
        self.decoders = {FAKE_FORMAT: self._decode_fake}

    @staticmethod
    def _decode_fake(payload: bytes) -> np.ndarray:
        digest = hashlib.md5(payload).digest()
        # 16 bytes -> 8 deterministic floats in [0, 1)
        arr = np.frombuffer(digest, dtype=np.uint16).astype(np.float64)
        return arr / 65536.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for fmt, payload in zip(batch["format"].to_numpy(), batch["payload"].to_numpy()):
            decoder = self.decoders.get(fmt)
            if decoder is None:
                raise NotImplementedError(
                    f"no codec for format={fmt!r} in this environment; "
                    "register a decoder (PIL/ffmpeg) in PayloadFeatureExtractor"
                )
            feats.append(decoder(bytes(payload)))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "feature": [f.astype(np.float32) for f in feats],
            }
        )


def extract_payload_features(
    payloads: ray.data.Dataset, concurrency=(1, 4), batch_size: int = 256
) -> ray.data.Dataset:
    """Feature extraction over binary payloads. Batch size is deliberately
    small: batch_bytes x concurrency must fit in the worker heap for real
    media (the large-binary memory rule)."""
    return payloads.map_batches(
        PayloadFeatureExtractor,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
