"""Multimodal binary-column plumbing (stubbed codec, real Ray-side layout)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from tcx2graph_jl_ray.stages.multimodal import (
    PayloadFeatureExtractor,
    attach_fake_payload,
    extract_payload_features,
)
from tests.parity import to_pandas


def _docs(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def test_payload_roundtrip_and_features(ray_session, sf_dir):
    payloads = attach_fake_payload(_docs(sf_dir))
    feats = to_pandas(extract_payload_features(payloads))
    assert len(feats) == 500
    v = np.stack(feats["feature"].to_numpy())
    assert v.shape == (500, 8) and v.dtype == np.float32
    assert (v >= 0).all() and (v < 1).all()
    # deterministic across runs
    again = to_pandas(extract_payload_features(attach_fake_payload(_docs(sf_dir))))
    a = np.stack(feats.sort_values("doc_id")["feature"].to_numpy())
    b = np.stack(again.sort_values("doc_id")["feature"].to_numpy())
    assert (a == b).all()


def test_unknown_format_fails_loudly():
    batch = pd.DataFrame(
        {"doc_id": [1], "payload": [b"\x00\x01"], "format": ["jpeg"]}
    )
    with pytest.raises(NotImplementedError, match="jpeg"):
        PayloadFeatureExtractor()(batch)
