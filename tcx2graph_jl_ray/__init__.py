"""tcx2graph_jl_ray — a Ray-Data-native knowledge-graph construction engine.

Recasts the reference (firefly-cpp/TCX2Graph.jl, a per-file GPS property-graph
builder) as a transcript-to-KG pipeline over Parquet tables of multi-turn
conversation transcripts, executed as ``ray.data.Dataset`` pipelines:

- ordered trackpoint nodes      -> turn nodes under stable (conv_id, turn_idx)
  (reference src/GraphBuilder.jl:104-107)
- consecutive-point edges       -> NEXT_TURN edges per conversation
  (reference src/GraphBuilder.jl:109-111)
- OSM/weather enrichment        -> mention detection + triple extraction
  (reference src/TCXParser.jl:83-101)       via stateful actor pools
- overlapping-segment merge     -> entity canonicalization: blocking +
  (reference src/OverlappingSegmentsUtils.jl:91-277)  pairwise verify +
  distributed union-find connected components
- segment aggregation/transitions -> node/edge property tables
  (reference src/DataPreprocessing.jl:178-397)
- Neo4j/CSV sinks               -> partitioned Parquet with per-partition
  (examples/saveToNeo4j.jl)        lineage manifests (resumable)

Nothing here calls ``ray.init()`` — the driver / bench / test fixture owns the
Ray session.
"""

from tcx2graph_jl_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
