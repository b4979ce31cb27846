"""Pipeline configuration.

The reference exposes its knob set as config constants in examples/main.jl:17-65
(segment params max_length_m / tol_m / window_step / min_runs / dedup_overlap_frac,
missing-data thresholds, case-study selectors). We expose the analogous knobs as a
dataclass so every stage is parameterized from one place.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- extraction -------------------------------------------------------
    # batch size for the extractor actor pool (reference processes whole files
    # at a time, src/TCXParser.jl:50-115; we batch for vectorization)
    extract_batch_size: int = 8192
    # actor pool cap for stateful extract/enrich stages (reference uses
    # Threads.@threads, src/OverlappingSegmentsUtils.jl:173). This is the
    # autoscaling MAX of a (min, max) pool — a low cap silently serializes
    # the regex-heavy extraction on large sessions (measured twice: 4 actors
    # capped the round-1 32-CPU scaling run, and the round-2 cap of 16 held
    # triple extraction to 1.7x from 8 -> 32 CPUs). None = one actor per
    # session CPU (stages/extract.py pool_bounds sizes it at call time).
    extract_concurrency: int | None = None
    # bench-only: per-batch model-inference stand-in layers inside the
    # extractor actors (stages/extract.py _InferenceStandIn). 0 = off (all
    # production/correctness paths). Nonzero moves the scaling protocol into
    # the compute-dominated regime a real (model-based) extractor runs in.
    extract_heavy_reps: int = 0

    # --- canonicalization (analogue of find_overlapping_segments params,
    #     examples/main.jl:40-53) -----------------------------------------
    # pairwise verify threshold: token-set containment |A∩B| / min(|A|,|B|)
    # (analogue of Fréchet tol_m, src/OverlappingSegmentsUtils.jl:97)
    verify_containment: float = 0.8
    # drop blocking tokens that appear in more than this many distinct
    # surfaces (hot-block cap, analogue of window_step work-capping,
    # src/OverlappingSegmentsUtils.jl:95-99); also the skew/salting guard
    max_block_size: int = 256
    # max union-find pointer-jumping rounds before declaring convergence
    union_find_max_rounds: int = 16
    # below this many distinct surfaces, run the component loop driver-side
    # (identical algorithm/result; skips per-round shuffle fixed costs) —
    # the distributed path engages above it
    small_graph_threshold: int = 200_000
    # above this many distinct surfaces the canonical map is no longer
    # broadcast as a ray.put dict: canonicalize returns it as a Dataset and
    # rewrite/attach apply it with a distributed hash join on norm
    broadcast_map_budget: int = 2_000_000
    # hash-partition fan-out for native Dataset.join stages
    join_num_partitions: int = 32

    # --- near-dup / MinHash ----------------------------------------------
    minhash_num_perm: int = 64
    minhash_bands: int = 16          # rows per band = num_perm // bands
    shingle_size: int = 3            # character shingles for doc near-dup
    jaccard_threshold: float = 0.7

    # --- cleaning (reference src/DataPreprocessing.jl:83-163) -------------
    missing_drop_threshold: float = 0.6   # drop columns with > this frac null

    # --- windows / transitions (reference src/DataPreprocessing.jl:330-397)
    max_gap_s: float = 3600.0        # max gap between consecutive runs
    session_gap_s: float = 1800.0    # sessionization gap for events

    # --- physical ---------------------------------------------------------
    group_batch_format: str = "pandas"
    salt_buckets: int = 16           # salting fan-out for hot keys

    # --- paths ------------------------------------------------------------
    extra: dict = field(default_factory=dict, compare=False)


DEFAULT_CONFIG = PipelineConfig()
