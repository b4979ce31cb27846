"""Dedup suite + text analysis: oracles where SQL-expressible, synthetic
ground truth for the sketch-based ops."""

import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.config import PipelineConfig
from tcx2graph_jl_ray.stages.dedup import (
    CHARSET_JOIN_SQL_TEMPLATE,
    EXACT_DEDUP_SQL,
    SIMHASH_PAIRS_SQL_TEMPLATE,
    SIMHASH_SQL,
    charset_similarity_join,
    exact_dedup,
    neardup_minhash,
    simhash_neardup_pairs,
    simhash_table,
)
from tcx2graph_jl_ray.stages.text import (
    FINGERPRINT_SQL,
    LANG_ID_SQL,
    QUALITY_SQL,
    TOKEN_COUNT_SQL,
    fingerprints,
    lang_id,
    quality_stats,
    token_count_by_source,
)
from tests.parity import assert_parity, to_pandas


def _docs(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def test_exact_dedup_oracle(ray_session, duck, sf_dir):
    assert_parity(exact_dedup(_docs(sf_dir)), EXACT_DEDUP_SQL, duck)


def test_charset_join_oracle(ray_session, duck, sf_dir):
    ds = charset_similarity_join(_docs(sf_dir), threshold=0.86)
    assert_parity(ds, CHARSET_JOIN_SQL_TEMPLATE.format(threshold=0.86), duck)


def test_quality_oracle(ray_session, duck, sf_dir):
    assert_parity(quality_stats(_docs(sf_dir)), QUALITY_SQL, duck)


def test_lang_id_oracle(ray_session, duck, sf_dir):
    assert_parity(lang_id(_docs(sf_dir)), LANG_ID_SQL, duck)


def test_fingerprint_oracle(ray_session, duck, sf_dir):
    assert_parity(fingerprints(_docs(sf_dir)), FINGERPRINT_SQL, duck)


def test_token_count_oracle(ray_session, duck, sf_dir):
    assert_parity(token_count_by_source(_docs(sf_dir)), TOKEN_COUNT_SQL, duck)


def test_simhash_oracle(ray_session, duck, sf_dir):
    """The md5-based SimHash is value-reproducible in SQL."""
    assert_parity(simhash_table(_docs(sf_dir)), SIMHASH_SQL, duck)


def test_simhash_pairs_oracle(ray_session, duck, sf_dir):
    sql = SIMHASH_PAIRS_SQL_TEMPLATE.format(simhash=SIMHASH_SQL, max_hamming=3)
    assert_parity(simhash_neardup_pairs(_docs(sf_dir), max_hamming=3), sql, duck)


def _synthetic_neardups():
    """3 planted clusters + singletons. Cluster docs share >70% shingles."""
    base1 = "the quick brown fox jumps over the lazy dog again and again today"
    base2 = "distributed systems require careful attention to partial failure modes"
    rows = [
        (0, base1),
        (1, base1 + " tonight"),                 # near-dup of 0
        (2, base1.replace("quick", "quick red")),  # near-dup of 0
        (10, base2),
        (11, base2 + " always"),                 # near-dup of 10
        (20, "completely unrelated text about cooking pasta with fresh basil"),
        (21, "yet another lonely document mentioning satellites and orbits"),
    ]
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    )


def test_minhash_clusters_planted(ray_session):
    cfg = PipelineConfig(jaccard_threshold=0.6)
    out = to_pandas(neardup_minhash(_synthetic_neardups(), cfg))
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[0] == cl[1] == cl[2] == 0
    assert cl[10] == cl[11] == 10
    assert cl[20] == 20 and cl[21] == 21


def test_minhash_planted_large(ray_session):
    """Planted ground truth at a size that exercises the distributed
    join-verify across many buckets: 40 clusters x 4 near-identical docs plus
    160 unique docs -> exact cluster recovery (recall AND precision 1.0 on the
    construction)."""
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    did = 0
    expected = {}
    for c in range(40):
        base = " ".join(rng.choice(vocab, size=30))
        root = did
        for v in range(4):
            text = base + (f" extra{v}" if v else "")
            rows.append((did, text))
            expected[did] = root
            did += 1
    for u in range(160):
        # disjoint vocabulary per unique doc -> zero shingle overlap
        text = " ".join(f"u{u}_{j}" for j in range(25))
        rows.append((did, text))
        expected[did] = did
        did += 1
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    )
    out = to_pandas(neardup_minhash(ds, PipelineConfig(jaccard_threshold=0.6)))
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == expected


def test_minhash_deterministic(ray_session):
    a = to_pandas(neardup_minhash(_synthetic_neardups())).sort_values("doc_id")
    b = to_pandas(neardup_minhash(_synthetic_neardups())).sort_values("doc_id")
    assert (a.to_numpy() == b.to_numpy()).all()


def test_simhash_properties(ray_session):
    ds = _synthetic_neardups()
    t = to_pandas(simhash_table(ds)).set_index("doc_id")["simhash"]
    # identical text -> identical hash; near-dup text -> small hamming distance
    from tcx2graph_jl_ray.functions.minhash import hamming64

    h0 = np.array([t[0]], dtype=np.int64).view(np.uint64)
    h1 = np.array([t[1]], dtype=np.int64).view(np.uint64)
    h20 = np.array([t[20]], dtype=np.int64).view(np.uint64)
    assert hamming64(h0, h1)[0] <= 8
    assert hamming64(h0, h20)[0] > 8
    pairs = to_pandas(simhash_neardup_pairs(ds, max_hamming=8))
    got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
    assert (0, 1) in got
    assert (0, 20) not in got


# --- word n-gram Jaccard join ------------------------------------------------

def test_ngram_jaccard_oracle(ray_session, duck, sf_dir):
    from tcx2graph_jl_ray.stages.dedup import (
        NGRAM_JACCARD_SQL_TEMPLATE,
        ngram_jaccard_join,
    )

    ds = ngram_jaccard_join(_docs(sf_dir), threshold=0.5)
    assert_parity(ds, NGRAM_JACCARD_SQL_TEMPLATE.format(k=2, threshold=0.5), duck)


def test_ngram_jaccard_planted(ray_session):
    """Near-identical docs must pair; disjoint-vocab docs must not; a doc
    shorter than k tokens falls back to its whole-token shingle."""
    import ray.data
    from tcx2graph_jl_ray.stages.dedup import ngram_jaccard_join

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy cat",
                    "completely different words here entirely",
                    "tiny",
                    "tiny",
                ],
            }
        )
    )
    out = ngram_jaccard_join(docs, threshold=0.5).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (1, 2) in pairs
    assert (4, 5) in pairs  # single-token docs share their whole-text shingle
    assert not any(3 in p for p in pairs)
    sim12 = float(out.set_index(["a", "b"]).loc[(1, 2), "sim"])
    assert 0.5 < sim12 < 1.0


def test_ngram_jaccard_prefix_filter_keeps_stop_shingle_pairs(ray_session):
    """The PPJoin prefix filter must find pairs whose ONLY similarity runs
    through corpus-hot stop shingles — the exact class the old max_df cap
    silently dropped. Planted: every doc shares 'common stop phrase'; two
    docs are near-identical. All qualifying pairs must appear, with exact
    sims."""
    import ray.data
    from tcx2graph_jl_ray.stages.dedup import _word_shingle_set, ngram_jaccard_join

    texts = [f"common stop phrase unique{i}" for i in range(30)]
    texts += [
        "common stop phrase twin alpha beta",
        "common stop phrase twin alpha gamma",
    ]
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    )
    got = ngram_jaccard_join(docs, threshold=0.1).to_pandas()
    got_pairs = {
        (a, b): s for a, b, s in zip(got["a"], got["b"], got["sim"])
    }
    # brute-force truth over the planted corpus
    sets = {i: _word_shingle_set(t, 2) for i, t in enumerate(texts)}
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            if inter:
                sim = inter / len(sets[i] | sets[j])
                if sim >= 0.1:
                    want[(i, j)] = sim
    assert got_pairs.keys() == want.keys()
    for p, s in want.items():
        assert abs(got_pairs[p] - s) < 1e-12, p
    # the twin pair (similar through rare AND hot shingles) is present
    assert (30, 31) in got_pairs


def test_bpe_token_counts_oracle(ray_session, duck, sf_dir):
    from tcx2graph_jl_ray.stages.text import (
        BPE_TOKEN_COUNT_SQL,
        bpe_token_count_by_source,
    )

    assert_parity(bpe_token_count_by_source(_docs(sf_dir)), BPE_TOKEN_COUNT_SQL, duck)


def test_cosine_pairs_oracle(ray_session, duck, sf_dir):
    import ray.data
    from tcx2graph_jl_ray.stages.ann import (
        COSINE_PAIRS_SQL_TEMPLATE,
        embedding_cosine_pairs,
    )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    ds = embedding_cosine_pairs(emb, sf_dir, threshold=0.4)
    assert_parity(ds, COSINE_PAIRS_SQL_TEMPLATE.format(threshold=0.4), duck)


def test_minhash_pairs_oracle(ray_session, duck, sf_dir):
    """The full MinHash candidate+verify path (md5 sketch, banded blocking,
    Jaccard verify) is value-exact vs the generated DuckDB oracle."""
    from tcx2graph_jl_ray.stages.dedup import minhash_pairs_sql, neardup_minhash_pairs

    ds = neardup_minhash_pairs(_docs(sf_dir))
    assert_parity(ds, minhash_pairs_sql(), duck)


def test_split_assign_deterministic_ratios(ray_session):
    """Split assignment is content-independent, deterministic, and lands
    near the 204/26/26 per-256 proportions on a planted id range."""
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.text import split_assign

    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(4000), "text": "x"})
    )
    a = split_assign(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = split_assign(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 204 / 256) < 0.03
    assert abs(frac["val"] - 26 / 256) < 0.02
    assert abs(frac["test"] - 26 / 256) < 0.02


def test_winnow_guarantee(ray_session):
    """Winnowing guarantee: two docs sharing a run of >= k+window-1 words
    share at least one fingerprint; unrelated docs share none; a doc
    shorter than k+window-1 words yields no fingerprints."""
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.text import winnow_fingerprints

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
                "text": [
                    f"one prefix here {shared} and a suffix",
                    f"totally different opening {shared} closing words now",
                    "nothing in common with anything else at all here",
                    "too short",
                ],
            }
        )
    )
    out = winnow_fingerprints(docs, k=3, window=4).to_pandas()
    by = {i: set(g["fp"]) for i, g in out.groupby("doc_id")}
    assert by[1] & by[2], "shared 9-word run must share a fingerprint"
    assert not (by[1] & by[3]) and not (by[2] & by[3])
    assert 4 not in by
