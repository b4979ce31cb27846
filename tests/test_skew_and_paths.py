"""Hot-key skew handling and graph path finding."""

import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.stages.analysis import shortest_entity_path
from tcx2graph_jl_ray.stages.graph import build_next_turn_edges, conv_digests
from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
from tcx2graph_jl_ray.stages.graph import CONV_DIGEST_SQL_TEMPLATE
from tcx2graph_jl_ray.stages.window import FLATTEN_PROPS_SQL, flatten_props
from tests.parity import assert_parity, to_pandas


def test_conv_digest_oracle(ray_session, duck, sf_dir):
    ds = conv_digests(derive_transcripts(sf_dir))
    assert_parity(ds, CONV_DIGEST_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck)


def test_flatten_props_oracle(ray_session, duck, sf_dir):
    ds = flatten_props(ray.data.read_parquet(f"{sf_dir}/events.parquet"))
    assert_parity(ds, FLATTEN_PROPS_SQL, duck)


def test_hot_conversation_skew(ray_session):
    """FIXTURES.md: a conversation 100x the median must still produce exact
    ordered edges and digests — the hot-key case the bucketed shuffle must
    absorb (one bucket carries the whale; batches stay bounded)."""
    rng = np.random.RandomState(3)
    rows = []
    for c in range(50):  # 50 normal conversations, 20 turns each
        for t in range(20):
            rows.append((f"conv_{c:03d}", t))
    for t in range(20_000):  # one whale
        rows.append(("whale", t))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["role"] = "user"
    df["text"] = "t" + df["turn_idx"].astype(str)
    df["tool"] = None
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df["turn_idx"], unit="s")
    # shuffle row order so ordering is reconstructed, not inherited
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)

    ds = ray.data.from_pandas(df).repartition(16)
    edges = to_pandas(build_next_turn_edges(ds))
    per_conv = edges.groupby("conv_id").size()
    assert per_conv["whale"] == 19_999
    assert (per_conv.drop("whale") == 19).all()
    whale = edges[edges.conv_id == "whale"].sort_values("src_turn")
    assert (whale["dst_turn"].to_numpy() == whale["src_turn"].to_numpy() + 1).all()
    assert (whale["delta_us"] == 1_000_000).all()

    digests = to_pandas(conv_digests(ds)).set_index("conv_id")
    assert digests.loc["whale", "n_turns"] == 20_000
    import hashlib

    expected = hashlib.md5(
        "\x1f".join(f"t{t}" for t in range(20_000)).encode()
    ).hexdigest()
    assert digests.loc["whale", "digest"] == expected


def _star_transitions():
    """Hub graph: hub has 30 in-edges and 30 out-edges (900 two-hop pairs
    through it) plus a weak edge filtered by min_n."""
    ins = [f"i{j:02d}" for j in range(30)]
    outs = [f"o{j:02d}" for j in range(30)]
    rows = [(a, "hub", 5) for a in ins] + [("hub", b, 5) for b in outs]
    rows.append(("weak_src", "hub", 1))
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["from_entity", "to_entity", "n"]).assign(
            n=lambda d: d["n"].astype("int64")
        )
    )


def test_reachable_pairs_salted_hub_parity(ray_session):
    """Forcing the hub-salting path (salt_threshold=1) must give the exact
    same pair set as the unsalted path."""
    from tcx2graph_jl_ray.stages.analysis import reachable_pairs

    base = to_pandas(reachable_pairs(_star_transitions(), min_n=2,
                                     salt_threshold=10**9))
    salted = to_pandas(reachable_pairs(_star_transitions(), min_n=2,
                                       salt_threshold=1, n_salts=4))
    cols = ["src", "dst", "hops"]
    a = base[cols].sort_values(cols).reset_index(drop=True)
    b = salted[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # 30*30 two-hop pairs through the hub + 60 one-hop edges
    assert (a["hops"] == 2).sum() == 900
    assert (a["hops"] == 1).sum() == 60
    assert "weak_src" not in set(a["src"])


def test_khop_paths_planted_chain(ray_session):
    """A 4-node chain plus a shortcut: hops and the lexicographically smallest
    shortest path must be reconstructed exactly."""
    from tcx2graph_jl_ray.stages.analysis import khop_paths

    tr = ray.data.from_pandas(
        pd.DataFrame(
            {
                "from_entity": ["a", "b", "c", "a"],
                "to_entity": ["b", "c", "d", "c"],
                "n": pd.array([5, 5, 5, 5], dtype="int64"),
            }
        )
    )
    out = to_pandas(khop_paths(tr, max_hops=3, min_n=2)).set_index(["src", "dst"])
    assert out.loc[("a", "d"), "hops"] == 2          # a>c>d beats a>b>c>d
    assert out.loc[("a", "d"), "path"] == "a>c>d"
    assert out.loc[("a", "c"), "hops"] == 1          # direct shortcut
    assert out.loc[("a", "c"), "path"] == "a>c"
    assert out.loc[("b", "d"), "hops"] == 2
    assert out.loc[("b", "d"), "path"] == "b>c>d"


def test_convs_in_window_bloom_path_parity(ray_session, duck, sf_dir):
    """Force the Bloom + left-semi-join path (broadcast_budget=0): result must
    stay value-exact vs the window oracle."""
    from tcx2graph_jl_ray.stages.analysis import (
        CONVS_IN_WINDOW_SQL_TEMPLATE,
        convs_in_window,
    )

    ds = convs_in_window(
        derive_transcripts(sf_dir), "2024-01-01", "2024-01-03",
        broadcast_budget=0,
    )
    sql = CONVS_IN_WINDOW_SQL_TEMPLATE.format(
        transcripts=TRANSCRIPTS_SQL, start="2024-01-01", end="2024-01-03"
    )
    assert_parity(ds, sql, duck)


def test_shortest_entity_path():
    edges = pd.DataFrame(
        {
            "src": ["a", "b", "c", "a", "x"],
            "dst": ["b", "c", "d", "weak", "y"],
            "n_convs": pd.array([5, 5, 5, 1, 5], dtype="int64"),
        }
    )
    assert shortest_entity_path(edges, "a", "d", min_weight=2) == ["a", "b", "c", "d"]
    assert shortest_entity_path(edges, "a", "weak", min_weight=2) is None
    assert shortest_entity_path(edges, "a", "weak", min_weight=1) == ["a", "weak"]
    assert shortest_entity_path(edges, "a", "y", min_weight=1) is None
    assert shortest_entity_path(edges, "a", "a") == ["a"]


# --- degree stats + PageRank -------------------------------------------------

def _tiny_transitions(ray_session):
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "from_entity": ["a", "a", "b", "c"],
                "to_entity": ["b", "c", "c", "a"],
                "n": pd.array([2, 1, 3, 4], dtype="int64"),
            }
        )
    )


def test_degree_stats_tiny(ray_session):
    from tcx2graph_jl_ray.stages.analysis import entity_degree_stats

    out = (
        entity_degree_stats(_tiny_transitions(ray_session))
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    assert list(out["entity_id"]) == ["a", "b", "c"]
    assert list(out["out_deg"]) == [2, 1, 1]
    assert list(out["in_deg"]) == [1, 1, 2]
    assert list(out["out_n"]) == [3, 3, 4]
    assert list(out["in_n"]) == [4, 2, 4]


def test_pagerank_small_vs_streaming_parity(ray_session):
    """The driver numpy fast path and the streaming-edges path must agree
    exactly (same float schedule per node, rounded output)."""
    import pandas as pd
    from tcx2graph_jl_ray.stages.analysis import entity_pagerank

    small = entity_pagerank(_tiny_transitions(ray_session)).to_pandas()
    streamed = entity_pagerank(
        _tiny_transitions(ray_session), small_graph_threshold=0
    ).to_pandas()
    key = "entity_id"
    pd.testing.assert_frame_equal(
        small.sort_values(key).reset_index(drop=True),
        streamed.sort_values(key).reset_index(drop=True),
    )
    assert abs(small["pagerank"].sum() - 1.0) < 1e-4


def test_pagerank_dangling_node(ray_session):
    """A sink node's rank must be redistributed, not lost: ranks still sum
    to ~1 and the sink accumulates more than the uniform share."""
    import ray.data
    from tcx2graph_jl_ray.stages.analysis import entity_pagerank

    tr = ray.data.from_pandas(
        pd.DataFrame(
            {
                "from_entity": ["a", "b"],
                "to_entity": ["sink", "sink"],
                "n": pd.array([1, 1], dtype="int64"),
            }
        )
    )
    out = entity_pagerank(tr).to_pandas().set_index("entity_id")["pagerank"]
    assert abs(out.sum() - 1.0) < 1e-4
    assert out["sink"] > 1.0 / 3
