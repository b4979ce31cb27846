"""KG analysis operators vs DuckDB oracles (planted-truth canonical labels)."""

from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
from tcx2graph_jl_ray.stages.analysis import (
    CONV_STATS_SQL_TEMPLATE,
    COOCCURRENCE_SQL_TEMPLATE,
    HOT_ENTITIES_SQL_TEMPLATE,
    REACHABLE_SQL_TEMPLATE,
    TRANSITIONS_SQL_TEMPLATE,
    attach_entities,
    conv_stats,
    cooccurrence_edges,
    entity_transitions,
    hot_entities,
    reachable_pairs,
)
from tcx2graph_jl_ray.stages.canonicalize import canonicalize
from tcx2graph_jl_ray.stages.extract import MENTIONS_SQL_TEMPLATE, extract_mentions
from tcx2graph_jl_ray.stages.link import LINKED_ENTITIES_SQL_TEMPLATE, link_entities, load_kb
from tcx2graph_jl_ray.stages.canonicalize import ENTITIES_SQL_TEMPLATE
from tests.parity import assert_parity

_MENTIONS_SQL = MENTIONS_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL)


def _mentions_with_entity(sf_dir):
    m = extract_mentions(derive_transcripts(sf_dir)).materialize()
    _, cmap = canonicalize(m)
    return attach_entities(m, cmap)


def test_conv_stats_match_oracle(ray_session, duck, sf_dir):
    ds = conv_stats(derive_transcripts(sf_dir))
    assert_parity(ds, CONV_STATS_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck)


def test_hot_entities_match_oracle(ray_session, duck, sf_dir):
    ds = hot_entities(_mentions_with_entity(sf_dir), min_convs=2)
    sql = HOT_ENTITIES_SQL_TEMPLATE.format(mentions=_MENTIONS_SQL, min_convs=2)
    assert_parity(ds, sql, duck)


def test_cooccurrence_match_oracle(ray_session, duck, sf_dir):
    ds = cooccurrence_edges(_mentions_with_entity(sf_dir))
    assert_parity(ds, COOCCURRENCE_SQL_TEMPLATE.format(mentions=_MENTIONS_SQL), duck)


def test_transitions_match_oracle(ray_session, duck, sf_dir):
    ds = entity_transitions(_mentions_with_entity(sf_dir), max_turn_gap=5)
    sql = TRANSITIONS_SQL_TEMPLATE.format(mentions=_MENTIONS_SQL, max_turn_gap=5)
    assert_parity(ds, sql, duck)


def test_reachable_match_oracle(ray_session, duck, sf_dir):
    trans = entity_transitions(_mentions_with_entity(sf_dir), max_turn_gap=5)
    ds = reachable_pairs(trans, min_n=2)
    sql = REACHABLE_SQL_TEMPLATE.format(
        transitions=TRANSITIONS_SQL_TEMPLATE.format(
            mentions=_MENTIONS_SQL, max_turn_gap=5
        ),
        min_n=2,
    )
    assert_parity(ds, sql, duck)


def test_reachable_on_sparse_graph(ray_session):
    """a->b->c chain: (a,c) is reachable only via 2 hops; weak edges drop."""
    import pandas as pd
    import ray.data

    trans = ray.data.from_pandas(
        pd.DataFrame(
            {
                "from_entity": ["a", "b", "weak", "loop"],
                "to_entity": ["b", "c", "x", "loop"],
                "n": pd.array([5, 5, 1, 9], dtype="int64"),
            }
        )
    )
    out = reachable_pairs(trans, min_n=2).to_pandas()
    got = {(r.src, r.dst): r.hops for r in out.itertuples(index=False)}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 2}


def test_linked_entities_match_oracle(ray_session, duck, sf_dir):
    m = extract_mentions(derive_transcripts(sf_dir))
    entities, _ = canonicalize(m)
    linked = link_entities(entities, load_kb(sf_dir))
    sql = LINKED_ENTITIES_SQL_TEMPLATE.format(
        entities=ENTITIES_SQL_TEMPLATE.format(mentions=_MENTIONS_SQL)
    )
    assert_parity(linked, sql, duck)


def test_top_entities_dedup_suppression(ray_session):
    """Among tied tops, a near-duplicate of a lexicographically smaller tied
    entity is suppressed (containment >= 0.8); dissimilar ties survive."""
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.analysis import top_entities_dedup

    hot = ray.data.from_pandas(
        pd.DataFrame(
            {
                "entity_id": ["nation 7", "the nation 7 team", "nation 9",
                              "other thing"],
                "n_convs": pd.array([10, 10, 10, 5], dtype="int64"),
                "n_turns": pd.array([30, 20, 10, 5], dtype="int64"),
            }
        )
    )
    out = top_entities_dedup(hot, 0.8).to_pandas()
    assert sorted(out["entity_id"]) == ["nation 7", "nation 9"]


def test_triangle_stats_planted_graph(ray_session):
    """Planted structure: a 4-clique (every vertex in C(3,2)=3 triangles,
    clustering 1.0), a pendant vertex (degree 1, 0 triangles), and a hub
    wheel (hub h connected to spokes that are NOT connected to each other:
    0 triangles despite high degree — degree orientation must not blow up
    or miscount at the hub)."""
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.analysis import triangle_stats

    clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
              ("c", "d")]
    pendant = [("d", "e")]
    hub = [(f"h", f"s{i:02d}") for i in range(20)]
    edges = pd.DataFrame(clique + pendant + hub, columns=["src", "dst"])
    edges["src"], edges["dst"] = (
        edges[["src", "dst"]].min(axis=1), edges[["src", "dst"]].max(axis=1)
    )
    out = (
        triangle_stats(ray.data.from_pandas(edges), n_buckets=4)
        .to_pandas()
        .set_index("entity_id")
        .sort_index()
    )
    assert out.loc["a", "n_triangles"] == 3
    assert out.loc["a", "clustering"] == 1.0
    assert out.loc["d", "degree"] == 4  # clique + pendant
    assert out.loc["d", "n_triangles"] == 3
    assert out.loc["e", "n_triangles"] == 0
    assert out.loc["e", "clustering"] == 0.0
    assert out.loc["h", "degree"] == 20
    assert out.loc["h", "n_triangles"] == 0
    assert int(out["n_triangles"].sum()) == 12  # 4 triangles x 3 vertices


def test_kcore_planted_graph(ray_session):
    """Planted structure for k=2: a 4-clique (3-core, survives k=2 with
    in-core degree 3), a tail chain d-e-f hanging off the clique (chain
    vertices have degree <= 2 but peel from the free end: f goes first,
    then e, then d's tail edge — none survive the k=2 core), and an
    isolated triangle (its own 2-core, in-core degree 2 each)."""
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.analysis import kcore_members

    clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
              ("c", "d")]
    tail = [("d", "e"), ("e", "f")]
    tri = [("x", "y"), ("x", "z"), ("y", "z")]
    edges = pd.DataFrame(clique + tail + tri, columns=["src", "dst"])

    out = (
        kcore_members(ray.data.from_pandas(edges), k=2, n_buckets=4)
        .to_pandas()
        .set_index("entity_id")["core_degree"]
        .sort_index()
    )
    assert set(out.index) == {"a", "b", "c", "d", "x", "y", "z"}
    assert all(out[v] == 3 for v in "abcd")
    assert all(out[v] == 2 for v in "xyz")

    out3 = (
        kcore_members(ray.data.from_pandas(edges), k=3, n_buckets=4)
        .to_pandas()
    )
    assert set(out3["entity_id"]) == {"a", "b", "c", "d"}
    assert set(out3["core_degree"]) == {3}

    # k above the max core -> empty result with the stable schema
    # (Dataset.to_pandas() on zero blocks drops columns, so check the
    # dataset-level schema, which is what the driver contract promises)
    out9 = kcore_members(ray.data.from_pandas(edges), k=9, n_buckets=4)
    assert out9.count() == 0
    assert out9.schema().names == ["entity_id", "core_degree"]


def test_entity_components_planted(ray_session):
    """Two planted components (a triangle and a 2-chain) plus both physical
    paths: driver union-find (default threshold) and distributed min-label
    propagation (small_graph_threshold=0) must produce identical labels."""
    import dataclasses

    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.analysis import entity_components
    from tcx2graph_jl_ray.stages.canonicalize import DEFAULT_CONFIG

    edges = pd.DataFrame(
        [("b", "c"), ("a", "b"), ("a", "c"), ("p", "q")],
        columns=["src", "dst"],
    )
    expect = {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "p": ("p", 2), "q": ("p", 2),
    }
    for cfg in (
        DEFAULT_CONFIG,
        dataclasses.replace(DEFAULT_CONFIG, small_graph_threshold=0),
    ):
        out = (
            entity_components(ray.data.from_pandas(edges), cfg, n_buckets=4)
            .to_pandas()
            .set_index("entity_id")
            .sort_index()
        )
        got = {
            i: (r["component_id"], r["component_size"])
            for i, r in out.iterrows()
        }
        assert got == expect, cfg.small_graph_threshold


def test_neighbor_jaccard_planted(ray_session):
    """4-cycle a-b-d-c-a: opposite corners have identical 2-neighborhoods
    (jaccard 1.0), adjacent corners share nothing (0.0, filtered). A star
    hub above max_pivot_degree is skipped for pair generation (hub guard)."""
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.analysis import neighbor_jaccard

    square = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    star = [("h", f"s{i:02d}") for i in range(30)]
    edges = ray.data.from_pandas(
        pd.DataFrame(square + star, columns=["src", "dst"])
    )

    out = neighbor_jaccard(edges, tau=0.5, n_buckets=4).to_pandas()
    got = {(r.a, r.b): r.jaccard for r in out.itertuples(index=False)}
    # star spokes all have neighborhood {h}: jaccard 1.0 pairwise
    assert got[("a", "d")] == 1.0 and got[("b", "c")] == 1.0
    assert all(v == 1.0 for (a, b), v in got.items() if a.startswith("s"))
    assert len(got) == 2 + 30 * 29 // 2

    capped = neighbor_jaccard(
        edges, tau=0.5, n_buckets=4, max_pivot_degree=8
    ).to_pandas()
    got_c = {(r.a, r.b) for r in capped.itertuples(index=False)}
    # pivot h (degree 30 > 8) skipped: spoke pairs gone, square pairs remain
    assert got_c == {("a", "d"), ("b", "c")}
