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


def test_sweep_order_front_loads_unverified():
    """The driver samples the FIRST 50 queries() entries per round; the
    registry must front-load entries without a cumulative driver-green row
    (and keep the round-3 hash-FAIL rel_part_pareto in the window so its
    integer-cents fix gets re-checked)."""
    import __ray_entry__ as e

    keys = list(e.queries())
    front = keys[:50]
    unverified = [k for k in front if k not in e._DRIVER_VERIFIED]
    assert len(unverified) >= 45, (
        f"front-50 wastes driver budget on already-green rows: "
        f"{[k for k in front if k in e._DRIVER_VERIFIED]}"
    )
    assert "rel_part_pareto" in front
