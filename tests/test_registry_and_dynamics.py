"""Stage registry (user-extension surface) + new analysis oracles."""

import pandas as pd
import pytest
import ray.data

from tcx2graph_jl_ray.config import DEFAULT_CONFIG
from tcx2graph_jl_ray.pipelines.registry import (
    STAGE_REGISTRY,
    compose,
    get_stage,
    register_stage,
)
from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
from tcx2graph_jl_ray.stages.analysis import (
    CONV_DYNAMICS_SQL_TEMPLATE,
    conv_dynamics,
)
from tests.parity import assert_parity, to_pandas


def test_conv_dynamics_oracle(ray_session, duck, sf_dir):
    ds = conv_dynamics(derive_transcripts(sf_dir))
    assert_parity(
        ds, CONV_DYNAMICS_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck
    )


def test_registry_compose_with_user_stage(ray_session, sf_dir):
    @register_stage("test_drop_tool_turns")
    def drop_tool(ds, config):
        return ds.map_batches(
            lambda b: b[b["role"] != "tool"], batch_format="pandas"
        )

    try:
        pipeline = compose(["normalize", "test_drop_tool_turns", "nodes"])
        nodes = to_pandas(pipeline(derive_transcripts(sf_dir), DEFAULT_CONFIG))
        assert len(nodes) > 0
        assert (nodes["role"] != "tool").all()
        direct = to_pandas(get_stage("nodes")(derive_transcripts(sf_dir), DEFAULT_CONFIG))
        assert len(nodes) < len(direct)  # tool turns actually removed
    finally:
        STAGE_REGISTRY.pop("test_drop_tool_turns", None)


def test_registry_errors():
    with pytest.raises(KeyError, match="unknown stage"):
        get_stage("nope")

    @register_stage("test_dup")
    def s1(ds, config):
        return ds

    try:
        with pytest.raises(ValueError, match="already registered"):
            register_stage("test_dup")(lambda ds, c: ds)
    finally:
        STAGE_REGISTRY.pop("test_dup", None)
