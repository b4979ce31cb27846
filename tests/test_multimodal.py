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


def test_multimodal_features_oracle(ray_session, duck, sf_dir):
    """The full payload->actor-pool-decode->feature path is value-exact vs
    DuckDB (md5_number_lower/_upper lane decomposition)."""
    from tcx2graph_jl_ray.stages.multimodal import (
        MULTIMODAL_FEATURES_SQL,
        payload_feature_table,
    )
    from tests.parity import assert_parity

    assert_parity(payload_feature_table(_docs(sf_dir)), MULTIMODAL_FEATURES_SQL, duck)


def test_frame_sample_oracle(ray_session, duck, sf_dir):
    from tcx2graph_jl_ray.stages.multimodal import (
        FRAME_SAMPLE_SQL_TEMPLATE,
        attach_fake_payload,
        sample_frames,
    )
    from tests.parity import assert_parity

    ds = sample_frames(attach_fake_payload(_docs(sf_dir)))
    assert_parity(ds, FRAME_SAMPLE_SQL_TEMPLATE.format(frame_bytes=64, every_n=2), duck)


def test_frame_sample_every_n_semantics(ray_session):
    """9 frames sampled every 3 -> indices 0, 3, 6; last frame is partial."""
    from tcx2graph_jl_ray.stages.multimodal import FrameSampler

    batch = pd.DataFrame(
        {"doc_id": [7], "payload": [b"x" * 402], "format": ["fake"]}
    )
    out = FrameSampler(frame_bytes=64, every_n=3)(batch)
    assert list(out["frame_idx"]) == [0, 3, 6]
    assert list(out["frame_bytes"]) == [64, 64, 18]  # 402 = 6*64 + 18


def test_resize_payloads(ray_session, sf_dir):
    from tcx2graph_jl_ray.stages.multimodal import (
        PayloadResizer,
        attach_fake_payload,
        resize_payloads,
    )

    resized = resize_payloads(attach_fake_payload(_docs(sf_dir)), 32, 8).to_pandas()
    assert (resized["payload"].map(len) == 32 * 8).all()
    assert (resized["width"] == 32).all() and (resized["height"] == 8).all()
    with pytest.raises(NotImplementedError, match="png"):
        PayloadResizer(4, 4)(
            pd.DataFrame({"doc_id": [1], "payload": [b"ab"], "format": ["png"]})
        )


def test_audio_windows_planted(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.multimodal import (
        attach_fake_payload,
        audio_windows,
    )

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["abcd", "ab"],  # 4 bytes -> 2 windows (w=2,h=1... see below)
            "lang": "en",
            "source": "s",
            "n_chars": [4, 2],
        }
    )
    out = (
        audio_windows(
            attach_fake_payload(ray.data.from_pandas(df)), width=2, hop=2
        )
        .to_pandas()
        .set_index(["doc_id", "window_idx"])
    )
    a, b, c, d = (ord(ch) for ch in "abcd")
    # doc0 "abcd": windows [ab], [cd]; doc1 "ab": one window
    assert out.loc[(0, 0), "energy"] == a * a + b * b
    assert out.loc[(0, 1), "energy"] == c * c + d * d
    assert out.loc[(0, 0), "peak"] == b and out.loc[(0, 1), "peak"] == d
    assert out.loc[(1, 0), "energy"] == a * a + b * b
    assert len(out) == 3


def test_audio_windows_unknown_format_fails_loudly(ray_session):
    import pandas as pd
    import pytest
    import ray.data

    from tcx2graph_jl_ray.stages.multimodal import audio_windows

    payloads = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0],
                "payload": [b"xxxx"],
                "format": ["wav"],
                "width": pd.array([0], dtype="int32"),
                "height": pd.array([0], dtype="int32"),
            }
        )
    )
    with pytest.raises(Exception):
        audio_windows(payloads, width=2, hop=2).to_pandas()
