"""Bloom-filter broadcast utility + input schema validation."""

import numpy as np
import pandas as pd
import pytest

from tcx2graph_jl_ray.functions.bloom import BloomFilter


def test_bloom_no_false_negatives_and_bounded_fp():
    members = pd.Series([f"conv_{i}" for i in range(10_000)])
    non_members = pd.Series([f"other_{i}" for i in range(10_000)])
    bf = BloomFilter(capacity=10_000, fp_rate=0.01)
    bf.add(members)
    assert bf.contains(members).all()  # Bloom invariant: no false negatives
    fp = bf.contains(non_members).mean()
    assert fp < 0.03, f"false-positive rate {fp}"


def test_bloom_deterministic_across_instances():
    keys = pd.Series(["a", "b", "c"])
    b1 = BloomFilter(100)
    b2 = BloomFilter(100)
    b1.add(keys)
    b2.add(keys)
    assert (b1.bits == b2.bits).all()  # stable hashing, same filter bytes


def test_read_transcripts_rejects_wrong_schema(ray_session, tmp_path):
    from tcx2graph_jl_ray.pipelines.kg import read_transcripts

    bad = pd.DataFrame({"conv_id": ["a"], "text": ["x"]})  # missing columns
    p = str(tmp_path / "bad.parquet")
    bad.to_parquet(p, index=False)
    with pytest.raises(Exception, match="turn_idx|missing"):
        read_transcripts(p).count()
