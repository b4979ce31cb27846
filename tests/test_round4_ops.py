"""Planted-truth tests for the round-3 scale-hardening work: the exact
distributed global-quantile primitive, whale-key salting, frontier caps,
and budget-switched rank vectors."""

import numpy as np
import pandas as pd
import pytest
import ray.data


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


# --- multimodal soft-imported real codecs -----------------------------------


def test_codec_registration_tracks_environment():
    """Real-format decoders register exactly when their lib imports; absent
    libs keep the loud-fail contract (unknown format -> NotImplementedError,
    never fabricated output)."""
    from tcx2graph_jl_ray.stages.multimodal import (
        AudioFramer,
        PayloadFeatureExtractor,
        PayloadResizer,
    )

    fx, rs, au = PayloadFeatureExtractor(), PayloadResizer(4, 4), AudioFramer()
    assert ("png" in fx.decoders) == _has("PIL")
    assert ("png" in rs.resizers) == _has("PIL")
    assert ("wav" in au.decoders) == _has("soundfile")
    with pytest.raises(NotImplementedError):
        fx(pd.DataFrame({"doc_id": [1], "format": ["mp4"], "payload": [b"x"]}))


@pytest.mark.skipif(not _has("PIL"), reason="PIL not in this environment")
def test_pil_decode_and_resize_real_image():
    import io

    from PIL import Image

    from tcx2graph_jl_ray.stages.multimodal import (
        PayloadFeatureExtractor,
        PayloadResizer,
    )

    im = Image.new("RGB", (8, 6), (255, 0, 0))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    payload = buf.getvalue()
    batch = pd.DataFrame(
        {"doc_id": [7], "format": ["png"], "payload": [payload]}
    )
    feat = PayloadFeatureExtractor()(batch)["feature"].iloc[0]
    assert len(feat) == 8
    assert abs(feat[0] - 1.0) < 1e-6 and feat[1] < 1e-6  # solid red
    out = PayloadResizer(4, 4, bytes_per_px=3)(batch)
    assert len(out["payload"].iloc[0]) == 4 * 4 * 3


@pytest.mark.skipif(not _has("soundfile"), reason="soundfile not present")
def test_soundfile_decode_real_audio():
    import io

    import soundfile as sf

    from tcx2graph_jl_ray.stages.multimodal import AudioFramer

    buf = io.BytesIO()
    sf.write(buf, np.sin(np.linspace(0, 20, 400)), 8000, format="WAV")
    batch = pd.DataFrame(
        {"doc_id": [1], "format": ["wav"], "payload": [buf.getvalue()]}
    )
    out = AudioFramer(width=32, hop=16)(batch)
    assert len(out) > 0 and (out["energy"] > 0).any()


# --- exact_global_quantiles -------------------------------------------------


def _vals_ds(values):
    return ray.data.from_pandas(
        pd.DataFrame({"v": np.asarray(values, dtype="float64")})
    )


def test_quantiles_match_numpy_under_tiny_budget(ray_session):
    """collect_budget far below n forces histogram-refinement rounds; the
    result must still be the exact linearly-interpolated order statistic."""
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [rng.gamma(2.0, 100.0, 5000), rng.normal(1e6, 1.0, 37)]
    )
    n, got = exact_global_quantiles(
        _vals_ds(vals), "v", [0.0, 0.5, 0.95, 1.0], collect_budget=16, n_bins=32
    )
    assert n == len(vals)
    for q in [0.0, 0.5, 0.95, 1.0]:
        want = float(np.quantile(vals, q))
        assert got[q] == want, (q, got[q], want)


def test_quantiles_duplicate_heavy_cannot_split(ray_session):
    """A value repeated beyond the budget cannot be split by bisection; the
    interval-collapse short-circuit must return it exactly."""
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    vals = np.concatenate([np.full(4000, 42.5), [1.0, 99.0]])
    n, got = exact_global_quantiles(
        _vals_ds(vals), "v", [0.5], collect_budget=8, n_bins=16
    )
    assert n == 4002
    assert got[0.5] == 42.5


def test_quantiles_empty_and_single(ray_session):
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    n, got = exact_global_quantiles(_vals_ds([]), "v", [0.5])
    assert n == 0 and np.isnan(got[0.5])
    n, got = exact_global_quantiles(_vals_ds([3.25]), "v", [0.5, 0.95])
    assert n == 1 and got[0.5] == 3.25 and got[0.95] == 3.25


def test_conv_simplify_planted(ray_session):
    """Douglas-Peucker keep set: flat conversation -> endpoints only; a
    token-count spike above tol is kept (plus recursion around it); a
    single-turn conversation survives whole."""
    from tcx2graph_jl_ray.stages.graph import conv_simplify

    def turns(conv, texts):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": np.arange(len(texts), dtype="int32"),
                "role": "user",
                "text": texts,
                "tool": None,
                "ts": pd.to_datetime("2024-01-01"),
            }
        )

    flat = turns("flat", ["a b c"] * 8)                      # constant y=3
    spike = turns("spike", ["a"] * 3 + ["a " * 9] * 1 + ["a"] * 3)
    single = turns("single", ["hello world"])
    ds = ray.data.from_pandas(pd.concat([flat, spike, single], ignore_index=True))

    out = conv_simplify(ds, tol=2.0, depth=5).to_pandas()
    f = out[out["conv_id"] == "flat"]
    assert sorted(f["turn_idx"]) == [0, 7]  # endpoints only
    s = out[out["conv_id"] == "spike"]
    assert 3 in set(s["turn_idx"])          # the spike survives
    assert int(s.set_index("turn_idx").loc[3, "n_tokens"]) == 9
    assert sorted(out[out["conv_id"] == "single"]["turn_idx"]) == [0]

    # tol above the spike: everything flattens to endpoints
    out_hi = conv_simplify(ds, tol=50.0, depth=5).to_pandas()
    s_hi = out_hi[out_hi["conv_id"] == "spike"]
    assert sorted(s_hi["turn_idx"]) == [0, 6]


def test_pii_scrub_planted(ray_session):
    """Each PII class is counted then redacted in the fixed class order;
    counts run on the progressively scrubbed text (so a class never counts
    inside an earlier class's tag)."""
    from tcx2graph_jl_ray.stages.text import pii_scrub

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "mail me at jo.doe+x@ex-ample.org or admin@a.bc thanks",
                    "server 10.0.255.1 rebooted, call +1-555-0100-22",
                    "plain text with no pii at all",
                    None,
                ],
            }
        )
    )
    out = pii_scrub(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_emails"] == 2 and out.loc[1, "n_ips"] == 0
    assert out.loc[1, "text_clean"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out.loc[2, "n_ips"] == 1 and out.loc[2, "n_phones"] == 1
    assert out.loc[2, "text_clean"] == "server <IP> rebooted, call <PHONE>"
    assert out.loc[3, "text_clean"] == "plain text with no pii at all"
    assert 4 not in out.index  # null text drops at the operator boundary


def test_vocab_by_source_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import vocab_by_source

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "source": ["a", "a", "b"],
                "text": ["x y x", "y z", "x x x"],
            }
        )
    ).repartition(3)
    out = vocab_by_source(docs).to_pandas().set_index("source")
    assert out.loc["a", "n_distinct_words"] == 3  # x y z
    assert out.loc["a", "n_words"] == 5
    assert out.loc["b", "n_distinct_words"] == 1
    assert out.loc["b", "n_words"] == 3


def test_heavy_hitters_planted(ray_session):
    """Exact φ-frequent set: a word at exactly the threshold survives, one
    below it does not, and counts are exact despite the sketch gate."""
    from tcx2graph_jl_ray.stages.text import heavy_hitter_words

    # 100 words total: 'hot' x 50, 'warm' x 30, 'edge' x 10, 10 singletons
    texts = (["hot"] * 50 + ["warm"] * 30 + ["edge"] * 10
             + [f"rare{i}" for i in range(10)])
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(8)
    out = heavy_hitter_words(docs, phi=0.10).to_pandas().set_index("w")
    # threshold = ceil(0.10 * 100) = 10: edge is IN, singletons are out
    assert set(out.index) == {"hot", "warm", "edge"}
    assert int(out.loc["hot", "n"]) == 50
    assert int(out.loc["edge", "n"]) == 10


def test_cms_never_undercounts():
    from tcx2graph_jl_ray.functions.cms import cms_estimate, cms_partial

    rng = np.random.RandomState(5)
    vals = pd.Series(rng.choice([f"w{i}" for i in range(5000)], size=20000))
    regs = cms_partial(vals, depth=4, width=512)  # narrow: force collisions
    true = vals.value_counts()
    est = cms_estimate(regs, pd.Series(true.index))
    assert (est >= true.to_numpy()).all()


def test_heavy_hitters_empty_and_null_corpus(ray_session):
    from tcx2graph_jl_ray.stages.text import heavy_hitter_words

    from tests.parity import to_pandas

    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": [None, ""]})
    )
    out = to_pandas(heavy_hitter_words(docs, phi=0.1))
    assert len(out) == 0
    assert sorted(out.columns) == ["n", "w"]


def test_vocab_by_source_null_text_drops(ray_session):
    from tcx2graph_jl_ray.stages.text import vocab_by_source

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2], "source": ["a", "a"], "text": ["x y", None]}
        )
    )
    out = vocab_by_source(docs).to_pandas()
    assert len(out) == 1 and int(out["n_words"].iloc[0]) == 2


def test_ann_pq_exact_on_codeword_vectors(ray_session, tmp_path):
    """Vectors assembled from codebook codewords quantize losslessly, so a
    query built the same way has ADC distance exactly 0 to itself -> rank 1;
    ranks are deterministic via the (dist, vec_id) tie-break."""
    from tcx2graph_jl_ray.stages.ann import _pq_codebooks, ann_pq_topk

    m, ksub, dim = 8, 16, 64
    books = _pq_codebooks(dim, m, ksub)
    rng = np.random.RandomState(13)
    vecs = [
        np.concatenate([books[s, rng.randint(ksub)] for s in range(m)])
        for _ in range(12)
    ]
    df = pd.DataFrame(
        {"vec_id": range(len(vecs)),
         "embedding": [v.astype("float64") for v in vecs],
         "label": "x"}
    )
    sf = str(tmp_path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df), f"{sf}/embeddings.parquet")
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet")
    out = ann_pq_topk(ds, sf, n_queries=2, k=3).to_pandas()
    for qid in (0, 1):
        top = out[(out["query_id"] == qid) & (out["rank"] == 1)]
        assert int(top["vec_id"].iloc[0]) == qid  # self at ADC distance 0


def test_bm25_planted(ray_session):
    """Higher term frequency wins within a query; docs without any query
    term never appear; length normalization demotes a padded doc with the
    same tf."""
    from tcx2graph_jl_ray.stages.text import bm25_topk

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "alpha alpha alpha beta",
                    "alpha beta gamma delta",
                    "alpha beta " + "pad " * 30,
                    "nothing relevant here",
                ],
            }
        )
    ).repartition(2)
    out = bm25_topk(docs, queries=((0, ("alpha",)),), k=10).to_pandas()
    ranked = out.sort_values("rank")["doc_id"].tolist()
    assert ranked[0] == 1          # tf=3 beats tf=1
    assert 4 not in ranked         # no query term -> excluded
    assert ranked.index(2) < ranked.index(3)  # same tf, shorter doc wins


# --- whale-key salting ------------------------------------------------------


def test_salted_group_apply_matches_unsalted_and_bounds_partials(ray_session):
    """One whale key with rows >> any batch: the salted two-level aggregate
    must match the single-level result, and no partial_fn invocation may see
    more than ~rows/salt_buckets of the whale."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )

    n_whale = 50_000
    df = pd.DataFrame(
        {
            "k": ["whale"] * n_whale + ["a", "a", "b"],
            "v": np.concatenate([np.ones(n_whale), [10.0, 20.0, 5.0]]),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", sort=False)["v"].agg(["sum", "size"]).reset_index()
        out.columns = ["k", "s", "n"]
        # n doubles as the per-task row bound witness
        return out

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("k", sort=False).agg(
            s=("s", "sum"), n=("n", "sum"), max_partial=("n", "max")
        ).reset_index()
        return g

    salted = (
        salted_group_apply(ds, ["k"], partial, merge, salt_buckets=16)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert salted.loc[salted["k"] == "whale", "s"].iloc[0] == n_whale
    assert salted.loc[salted["k"] == "whale", "n"].iloc[0] == n_whale
    assert salted.loc[salted["k"] == "a", "s"].iloc[0] == 30.0
    # the whale never hit one task whole: largest partial ≤ ~1/16 + slack
    assert salted.loc[salted["k"] == "whale", "max_partial"].iloc[0] < n_whale / 2

    plain = (
        bucketed_group_apply(
            ds, ["k"],
            lambda b: b.groupby("k", sort=False)["v"].sum().reset_index(name="s"),
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        salted[["k", "s"]], plain[["k", "s"]], check_dtype=False
    )


def test_sliced_turn_idx_matches_plain_on_whale_conv(ray_session):
    """A single conversation with rows >> batch size spanning many slices:
    the sliced path must produce byte-identical turn indices to the
    single-bucket path, while no (conv, slice) group holds the whole conv."""
    import ray.data as rd

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.sources.transcripts import (
        _assign_turn_idx,
        assign_turn_idx_sliced,
    )

    n = 20_000
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.arange(n) * 7, unit="s"
    )
    df = pd.DataFrame(
        {
            "conv_id": "conv_whale",
            "event_id": np.random.RandomState(3).permutation(n),
            "ts": ts[np.random.RandomState(4).permutation(n)],
            "role": "user",
            "text": "t",
            "tool": None,
        }
    )
    # a handful of ts ties to exercise the event_id tie-break
    df.loc[5:9, "ts"] = df.loc[0, "ts"]
    small = pd.DataFrame(
        {
            "conv_id": "conv_tiny",
            "event_id": [1, 0],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
            "role": "user",
            "text": "t",
            "tool": None,
        }
    )
    ds = rd.from_pandas(pd.concat([df, small], ignore_index=True)).repartition(8)

    span = 3600.0
    sliced = assign_turn_idx_sliced(ds, span).to_pandas()
    plain = bucketed_group_apply(ds, ["conv_id"], _assign_turn_idx).to_pandas()
    key = ["conv_id", "turn_idx"]
    sliced, plain = (
        x.sort_values(key).reset_index(drop=True)[
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ]
        for x in (sliced, plain)
    )
    pd.testing.assert_frame_equal(sliced, plain, check_dtype=False)
    # boundedness witness: the whale spans many slices, so no slice holds it
    slices = (
        pd.to_datetime(df["ts"]).astype("int64") // int(span * 1e9)
    ).nunique()
    assert slices > 10


def test_pagerank_dataset_rank_path_matches_broadcast(ray_session, sf_dir):
    """Forcing rank_vector_budget=1 exercises the Dataset-join rank path; it
    must match the broadcast-vector path after the 6-decimal rounding both
    paths apply."""
    import __ray_entry__ as entry_mod
    from tcx2graph_jl_ray.stages.analysis import entity_pagerank

    trans = entry_mod._transitions(sf_dir)
    a = (
        entity_pagerank(trans)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    b = (
        entity_pagerank(trans, small_graph_threshold=0, rank_vector_budget=1)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_khop_hub_and_frontier_guards(ray_session):
    """Planted hub: with guards disabled paths through the hub exist; the
    hub-degree guard removes them; the per-source frontier budget bounds the
    surviving paths deterministically."""
    from tcx2graph_jl_ray.stages.analysis import khop_paths

    hub_edges = [("hub", f"t{i:02d}") for i in range(20)]
    chain = [("a", "hub"), ("x", "y")]
    df = pd.DataFrame(hub_edges + chain, columns=["from_entity", "to_entity"])
    df["n"] = 5
    trans = ray.data.from_pandas(df)

    full = khop_paths(trans, 2, 1).to_pandas()
    assert (full["src"] == "a").sum() == 21  # a>hub plus a>hub>t*

    no_hub = khop_paths(trans, 2, 1, max_out_degree=10).to_pandas()
    assert set(no_hub["src"]) == {"a", "x"}  # hub edges dropped entirely
    assert list(no_hub.loc[no_hub["src"] == "a", "dst"]) == ["hub"]

    capped = khop_paths(
        trans, 2, 1, per_src_budget=3, cap_trigger_rows=0
    ).to_pandas()
    a_two_hop = capped[(capped["src"] == "a") & (capped["hops"] == 2)]
    # budget keeps the 3 lexicographically smallest 2-hop paths from 'a'
    assert sorted(a_two_hop["dst"]) == ["t00", "t01", "t02"]


def test_session_stats_budget_path_matches_collected(ray_session, sf_dir):
    """session_stats forced through the refinement path (budget=4) must equal
    the same computation done the collected way."""
    from tcx2graph_jl_ray.stages.window import session_stats, sessionize

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    got = session_stats(ev, 1800.0, collect_budget=4).to_pandas()

    sess = sessionize(ev, 1800.0).to_pandas()
    dur = (
        pd.to_datetime(sess["last_ts"]) - pd.to_datetime(sess["first_ts"])
    ).dt.total_seconds()
    assert int(got["n_sessions"].iloc[0]) == len(sess)
    assert int(got["n_events"].iloc[0]) == int(sess["n_events"].sum())
    # np.round, not Python round(): the engine (and DuckDB ROUND) use
    # scaled-product semantics; Python round's exact-decimal semantics
    # diverge at representability boundaries (p95 here = 137.7178855)
    assert float(got["median_duration_s"].iloc[0]) == float(
        np.round(float(dur.quantile(0.5)), 6)
    )
    assert float(got["p95_duration_s"].iloc[0]) == float(
        np.round(float(dur.quantile(0.95)), 6)
    )
