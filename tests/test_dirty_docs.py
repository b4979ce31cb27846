"""Dirty-input contract for the documents operators: rows with null text are
dropped at the operator boundary, value-exactly mirroring the oracles'
``WHERE text IS NOT NULL`` — no crash, no silent NaN propagation."""

import duckdb
import pandas as pd
import pytest
import ray.data

from tests.parity import assert_parity


@pytest.fixture(scope="module")
def dirty():
    df = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "the quick brown fox jumps over it",
                None,
                "",
                "the quick brown fox jumps over it",
                "la le lo words here now",
                None,
                "solo",
                "the quick brown fox jumps over us",
            ],
            "lang": ["en"] * 8,
            "source": ["s0", "s0", "s1", "s1", "s1", "s2", "s2", "s2"],
            "n_chars": [33, 0, 0, 33, 23, 0, 4, 33],
        }
    )
    con = duckdb.connect()
    con.register("documents", df)
    return df, con


def _ds(df):
    return ray.data.from_pandas(df)


def test_dirty_exact_dedup(ray_session, dirty):
    from tcx2graph_jl_ray.stages.dedup import EXACT_DEDUP_SQL, exact_dedup

    df, con = dirty
    assert_parity(exact_dedup(_ds(df)), EXACT_DEDUP_SQL, con)


def test_dirty_ngram_jaccard(ray_session, dirty):
    from tcx2graph_jl_ray.stages.dedup import (
        NGRAM_JACCARD_SQL_TEMPLATE,
        ngram_jaccard_join,
    )

    df, con = dirty
    assert_parity(
        ngram_jaccard_join(_ds(df), threshold=0.5),
        NGRAM_JACCARD_SQL_TEMPLATE.format(k=2, threshold=0.5),
        con,
    )


def test_dirty_simhash(ray_session, dirty):
    from tcx2graph_jl_ray.stages.dedup import SIMHASH_SQL, simhash_table

    df, con = dirty
    assert_parity(simhash_table(_ds(df)), SIMHASH_SQL, con)


def test_dirty_charset_join(ray_session, dirty):
    from tcx2graph_jl_ray.stages.dedup import (
        CHARSET_JOIN_SQL_TEMPLATE,
        charset_similarity_join,
    )

    df, con = dirty
    # threshold low enough that at least one same-source pair qualifies
    # (an all-empty result exercises a separate zero-block edge, not this)
    assert_parity(
        charset_similarity_join(_ds(df), threshold=0.3),
        CHARSET_JOIN_SQL_TEMPLATE.format(threshold=0.3),
        con,
    )


def test_dirty_minhash_pairs_and_clusters(ray_session, dirty):
    from tcx2graph_jl_ray.stages.dedup import (
        minhash_pairs_sql,
        neardup_minhash,
        neardup_minhash_pairs,
    )

    df, con = dirty
    assert_parity(neardup_minhash_pairs(_ds(df)), minhash_pairs_sql(), con)
    # clustering runs, and null-text docs keep a (singleton) row: every doc
    # is labeled, dirty or not — the cluster table covers the whole corpus
    labels = neardup_minhash(_ds(df)).to_pandas()
    assert set(labels["doc_id"]) == set(df["doc_id"])


def test_dirty_text_ops(ray_session, dirty):
    from tcx2graph_jl_ray.stages.text import (
        BPE_TOKEN_COUNT_SQL,
        FINGERPRINT_SQL,
        LANG_ID_SQL,
        QUALITY_SQL,
        TOKEN_COUNT_SQL,
        bpe_token_count_by_source,
        fingerprints,
        lang_id,
        quality_stats,
        token_count_by_source,
    )

    df, con = dirty
    assert_parity(quality_stats(_ds(df)), QUALITY_SQL, con)
    assert_parity(lang_id(_ds(df)), LANG_ID_SQL, con)
    assert_parity(fingerprints(_ds(df)), FINGERPRINT_SQL, con)
    assert_parity(token_count_by_source(_ds(df)), TOKEN_COUNT_SQL, con)
    assert_parity(bpe_token_count_by_source(_ds(df)), BPE_TOKEN_COUNT_SQL, con)


def test_dirty_curation_ops(ray_session, dirty):
    """TF-IDF / quota sample / scrub / repetition on the dirty corpus —
    null text dropped, empty text and single-token docs handled like the
    oracles (zero tokens contribute nothing; no-bigram docs excluded)."""
    from tcx2graph_jl_ray.stages.text import (
        QUOTA_SAMPLE_SQL_TEMPLATE,
        REPETITION_SQL,
        SCRUB_SQL,
        TFIDF_SQL_TEMPLATE,
        quota_sample_by_source,
        repetition_stats,
        scrub_denylist,
        tfidf_top_terms,
    )

    df, con = dirty
    assert_parity(
        tfidf_top_terms(_ds(df), k_top=3), TFIDF_SQL_TEMPLATE.format(k_top=3),
        con,
    )
    assert_parity(
        quota_sample_by_source(_ds(df), k=2),
        QUOTA_SAMPLE_SQL_TEMPLATE.format(k=2), con,
    )
    assert_parity(scrub_denylist(_ds(df)), SCRUB_SQL, con)
    assert_parity(repetition_stats(_ds(df)), REPETITION_SQL, con)


def test_dirty_multimodal(ray_session, dirty):
    from tcx2graph_jl_ray.stages.multimodal import (
        FRAME_SAMPLE_SQL_TEMPLATE,
        MULTIMODAL_FEATURES_SQL,
        attach_fake_payload,
        payload_feature_table,
        sample_frames,
    )

    df, con = dirty
    assert_parity(payload_feature_table(_ds(df)), MULTIMODAL_FEATURES_SQL, con)
    assert_parity(
        sample_frames(attach_fake_payload(_ds(df)), frame_bytes=4, every_n=2),
        FRAME_SAMPLE_SQL_TEMPLATE.format(frame_bytes=4, every_n=2),
        con,
    )


def test_contamination_oracle_sf(ray_session, duck, sf_dir):
    from tcx2graph_jl_ray.stages.dedup import (
        CONTAMINATION_SQL_TEMPLATE,
        contamination_check,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    assert_parity(
        contamination_check(docs, "src0", 5),
        CONTAMINATION_SQL_TEMPLATE.format(k=5, benchmark_source="src0"),
        duck,
    )


def test_contamination_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import contamination_check

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta",       # benchmark
                "x alpha beta gamma delta epsilon y",        # contaminated
                "totally unrelated words in this doc here",  # clean
            ],
            "source": ["bench", "web", "web"],
        }
    )
    out = contamination_check(ray.data.from_pandas(df), "bench", 5).to_pandas()
    assert list(out["doc_id"]) == [2]
    assert int(out["n_overlap"].iloc[0]) == 1  # one shared 5-gram
