"""User-extension surface: a registry of named stages composable into
pipelines without touching the engine.

The reference's extension model is "edit config constants and call exported
functions from new scripts" (examples/main.jl:17-65, §2.9). Here a stage is
any ``(Dataset, PipelineConfig) -> Dataset`` callable registered by name;
``compose(names)`` chains them. UDF hooks are plain ``map_batches``
callables/classes, so user stages get actor pools, autoscaling, and Arrow
batches for free.

    @register_stage("my_filter")
    def my_filter(ds, config):
        return ds.map_batches(lambda b: b[b["role"] != "tool"],
                              batch_format="pandas")

    pipeline = compose(["normalize", "my_filter", "nodes"])
    nodes = pipeline(transcripts, config)
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import ray.data

from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig

Stage = Callable[[ray.data.Dataset, PipelineConfig], ray.data.Dataset]

STAGE_REGISTRY: dict[str, Stage] = {}


def register_stage(name: str) -> Callable[[Stage], Stage]:
    def deco(fn: Stage) -> Stage:
        if name in STAGE_REGISTRY:
            raise ValueError(f"stage {name!r} already registered")
        STAGE_REGISTRY[name] = fn
        return fn

    return deco


def get_stage(name: str) -> Stage:
    try:
        return STAGE_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(STAGE_REGISTRY)}"
        ) from None


def compose(names: list[str]) -> Stage:
    """Chain registered stages into one Dataset -> Dataset callable."""
    stages = [get_stage(n) for n in names]

    def run(ds: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG):
        for s in stages:
            ds = s(ds, config)
        return ds

    return run


# --- built-in stages ---------------------------------------------------------


@register_stage("normalize")
def _normalize(ds, config):
    """Drop rows with null text (the lat/lon presence filter, M2,
    src/TCXParser.jl:58) — vectorized mask, not a per-row filter."""

    def drop_null_text(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["text"].notna()]

    return ds.map_batches(drop_null_text, batch_format="pandas", batch_size=16384)


@register_stage("nodes")
def _nodes(ds, config):
    from tcx2graph_jl_ray.stages.graph import build_nodes

    return build_nodes(ds)


@register_stage("edges")
def _edges(ds, config):
    from tcx2graph_jl_ray.stages.graph import build_next_turn_edges

    return build_next_turn_edges(ds)


@register_stage("mentions")
def _mentions(ds, config):
    from tcx2graph_jl_ray.stages.extract import extract_mentions

    return extract_mentions(
        ds, concurrency=(1, config.extract_concurrency),
        batch_size=config.extract_batch_size,
    )


@register_stage("triples")
def _triples(ds, config):
    from tcx2graph_jl_ray.stages.extract import extract_triples

    return extract_triples(
        ds, concurrency=(1, config.extract_concurrency),
        batch_size=config.extract_batch_size,
    )


@register_stage("digests")
def _digests(ds, config):
    from tcx2graph_jl_ray.stages.graph import conv_digests

    return conv_digests(ds)


@register_stage("dynamics")
def _dynamics(ds, config):
    from tcx2graph_jl_ray.stages.analysis import conv_dynamics

    return conv_dynamics(ds)
