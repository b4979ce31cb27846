"""Planted-truth tests for the exact-substring duplication suite
(duplicated_grams / doc_dup_ratio) and the char-entropy quality gate —
brute-force Python oracles over tiny corpora, independent of DuckDB."""

import math

import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.stages.dedup import doc_dup_ratio, duplicated_grams
from tcx2graph_jl_ray.stages.text import char_entropy

SHARED = "the quick brown fox jumps over the lazy dog!"  # 44 chars > k=32


def _docs_ds(texts):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                      "text": texts})
    )


def _brute_grams(texts, k):
    per_doc = [
        {t[i:i + k] for i in range(len(t) - k + 1)} if t and len(t) >= k else set()
        for t in texts
    ]
    counts = {}
    for s in per_doc:
        for g in s:
            counts[g] = counts.get(g, 0) + 1
    return per_doc, counts


def test_duplicated_grams_planted(ray_session):
    texts = [
        "A" * 10 + SHARED + "B" * 10,
        "C" * 7 + SHARED + "D" * 3,
        "unrelated filler content with nothing shared at all here....",
        None,
        "short",  # < k: emits nothing
    ]
    k = 32
    _, counts = _brute_grams([t for t in texts if t], k)
    want = sorted(
        [(g, n) for g, n in counts.items() if n >= 2],
        key=lambda x: (-x[1], x[0]),
    )
    got = duplicated_grams(_docs_ds(texts), k=k, min_docs=2, top=100).to_pandas()
    assert list(map(tuple, got[["gram", "n_docs"]].to_numpy())) == want
    # the shared sentence contributes exactly len-k+1 duplicated grams
    assert len(want) == len(SHARED) - k + 1
    assert set(got["n_docs"]) == {2}


def test_duplicated_grams_top_truncates_with_total_order(ray_session):
    texts = ["x" + SHARED, "y" + SHARED]
    got = duplicated_grams(_docs_ds(texts), k=32, min_docs=2, top=5).to_pandas()
    _, counts = _brute_grams(texts, 32)
    want = sorted(
        [(g, n) for g, n in counts.items() if n >= 2],
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert list(map(tuple, got[["gram", "n_docs"]].to_numpy())) == want


def test_doc_dup_ratio_planted(ray_session):
    texts = [
        "A" * 10 + SHARED + "B" * 10,
        "C" * 7 + SHARED + "D" * 3,
        "unrelated filler content with nothing shared at all here....",
        "short",
    ]
    k = 32
    per_doc, counts = _brute_grams(texts, k)
    got = (
        doc_dup_ratio(_docs_ds(texts), k=k, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want_ids = [i for i, s in enumerate(per_doc) if s]
    assert list(got["doc_id"]) == want_ids
    for _, row in got.iterrows():
        s = per_doc[int(row["doc_id"])]
        n_dup = sum(1 for g in s if counts[g] >= 2)
        assert int(row["n_grams"]) == len(s)
        assert int(row["n_dup_grams"]) == n_dup
        assert row["dup_frac"] == float(np.round(n_dup / len(s), 6))


def test_char_entropy_planted(ray_session):
    texts = ["aaaa", "abab", "aabb" * 4, None, ""]
    got = (
        char_entropy(_docs_ds(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # null and empty texts are absent
    assert list(got["doc_id"]) == [0, 1, 2]
    assert list(got["n_chars"]) == [4, 4, 16]
    assert got.loc[0, "char_entropy"] == 0.0  # and +0.0, not -0.0
    assert math.copysign(1.0, got.loc[0, "char_entropy"]) == 1.0
    assert got.loc[1, "char_entropy"] == 1.0
    assert got.loc[2, "char_entropy"] == 1.0


def test_char_entropy_matches_brute(ray_session):
    rng = np.random.default_rng(7)
    alphabet = np.array(list("abcdefg hij"))
    texts = ["".join(rng.choice(alphabet, size=rng.integers(1, 200)))
             for _ in range(50)]
    got = (
        char_entropy(_docs_ds(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        c = pd.Series(list(t)).value_counts().to_numpy().astype("float64")
        p = c / c.sum()
        want = float(np.round(-(p * np.log2(p)).sum() + 0.0, 6))
        assert abs(got.loc[i, "char_entropy"] - want) < 2e-6, (i, t)


def test_zipf_slope_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import zipf_slope_by_source

    # source A: word k appears (4-k) times -> freqs 3,2,1 at ranks 1,2,3
    texts_a = ["w1 w1 w1 w2 w2 w3"]
    # source B: uniform freqs -> slope exactly 0 (ties in every position)
    texts_b = ["u1 u2 u3 u4"]
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(2, dtype="int64"),
                "text": texts_a + texts_b,
                "source": ["A", "B"],
            }
        )
    )
    got = (
        zipf_slope_by_source(docs, top_n=50)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    x = np.log(np.arange(1, 4, dtype="float64"))
    y = np.log(np.array([3.0, 2.0, 1.0]))
    m = 3
    want_a = (m * np.sum(x * y) - x.sum() * y.sum()) / (
        m * np.sum(x * x) - x.sum() ** 2
    )
    assert list(got["source"]) == ["A", "B"]
    assert list(got["n_top"]) == [3, 4]
    assert got.loc[0, "zipf_slope"] == float(np.round(want_a, 6))
    assert got.loc[1, "zipf_slope"] == 0.0  # uniform freqs: flat fit


def test_zipf_slope_top_n_truncates(ray_session):
    from tcx2graph_jl_ray.stages.text import zipf_slope_by_source

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([0], dtype="int64"),
                "text": ["a a a a b b b c c d"],
                "source": ["A"],
            }
        )
    )
    got = zipf_slope_by_source(docs, top_n=2).to_pandas()
    # only ranks 1..2 (freqs 4,3) enter the fit
    x = np.log(np.array([1.0, 2.0]))
    y = np.log(np.array([4.0, 3.0]))
    want = (2 * np.sum(x * y) - x.sum() * y.sum()) / (
        2 * np.sum(x * x) - x.sum() ** 2
    )
    assert int(got.loc[0, "n_top"]) == 2
    assert got.loc[0, "zipf_slope"] == float(np.round(want, 6))


def test_part_min_price_argmin_ties(ray_session, tmp_path):
    """Two suppliers at the identical min price -> lowest suppkey wins; the
    combiner's partial/merge must agree with the brute join-back."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.stages.relational import part_min_price_supplier

    li = pd.DataFrame(
        {
            "l_partkey": [1, 1, 1, 2, 2, 3],
            "l_extendedprice": [5.0, 5.0, 9.0, 7.5, 8.0, 2.25],
            "l_suppkey": [20, 10, 1, 4, 3, 9],
            "l_orderkey": [1, 2, 3, 4, 5, 6],
        }
    )
    part = pd.DataFrame({"p_partkey": [1, 2, 3], "p_name": ["a", "b", "c"]})
    pq.write_table(pa.Table.from_pandas(li), f"{tmp_path}/lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(part), f"{tmp_path}/part.parquet")

    got = (
        part_min_price_supplier(str(tmp_path))
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    assert list(got["p_partkey"]) == [1, 2, 3]
    assert list(got["min_price"]) == [5.0, 7.5, 2.25]
    assert list(got["min_suppkey"]) == [10, 4, 9]  # tie on part 1 -> supp 10
    assert list(got["p_name"]) == ["a", "b", "c"]


def test_emb_label_outliers_planted(ray_session):
    """Hand-planted clusters: centroid math, the worst offender per label,
    and the rounded-distance tie broken by lowest vec_id."""
    from tcx2graph_jl_ray.stages.ann import label_outliers

    # label 0: three points on a line; centroid = (2,0); vec 2 is farthest.
    # label 1: two points symmetric about the centroid -> dist tie; the
    # lower vec_id (3) must win the argmax.
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype="int64"),
            "label": np.array([0, 0, 0, 1, 1], dtype="int32"),
            "embedding": [
                [0.0, 0.0], [1.0, 0.0], [5.0, 0.0],
                [0.0, 2.0], [0.0, 6.0],
            ],
        }
    )
    got = (
        label_outliers(ray.data.from_pandas(emb))
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    assert list(got["label"]) == [0, 1]
    assert list(got["n_vecs"]) == [3, 2]
    # label 0: centroid (2, 0); dists 4, 1, 9 -> max 9 at vec 2
    assert got.loc[0, "max_dist2"] == 9.0
    assert int(got.loc[0, "outlier_vec_id"]) == 2
    assert got.loc[0, "mean_dist2"] == float(np.round((4 + 1 + 9) / 3, 6))
    # label 1: centroid (0, 4); both dists 4 -> tie -> vec 3
    assert got.loc[1, "max_dist2"] == 4.0
    assert int(got.loc[1, "outlier_vec_id"]) == 3


def test_empty_corpus_keeps_schema(ray_session):
    """No duplicated grams / no words: typed empty frames with the contract
    schema (the house empty-path pattern — Ray drops empty blocks)."""
    from tcx2graph_jl_ray.stages.text import zipf_slope_by_source
    from tests.parity import to_pandas

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": np.array([0], dtype="int64"),
             "text": [None], "source": ["A"]}
        )
    )
    g = to_pandas(duplicated_grams(docs, k=32, min_docs=2, top=10))
    assert list(g.columns) == ["gram", "n_docs"]
    assert len(g) == 0 and str(g["n_docs"].dtype) == "int64"
    z = to_pandas(zipf_slope_by_source(docs))
    assert list(z.columns) == ["source", "n_top", "zipf_slope"]
    assert len(z) == 0 and str(z["zipf_slope"].dtype) == "float64"


def test_dup_span_coverage_planted(ray_session):
    """Two docs sharing one 44-char sentence: each covers exactly 44 chars
    (13 overlapping 32-gram windows merge into one 44-char interval); the
    unrelated doc reports zero."""
    from tcx2graph_jl_ray.stages.dedup import dup_span_coverage

    texts = [
        "A" * 10 + SHARED + "B" * 10,
        "C" * 7 + SHARED + "D" * 3,
        "unrelated filler content with nothing shared at all here....",
        "short",
    ]
    got = (
        dup_span_coverage(_docs_ds(texts), k=32, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [0, 1, 2]  # "short" absent (< k)
    assert list(got["n_chars"]) == [64, 54, 60]
    assert list(got["n_dup_chars"]) == [44, 44, 0]
    assert got.loc[0, "dup_char_frac"] == float(np.round(44 / 64, 6))
    assert got.loc[2, "dup_char_frac"] == 0.0


def test_duplicated_grams_hash64_matches_string(ray_session):
    """The 8-byte-hash exchange with gated exact recovery returns exactly
    the string-keyed result — on the planted corpus and on sf0.001."""
    texts = [
        "A" * 10 + SHARED + "B" * 10,
        "C" * 7 + SHARED + "D" * 3,
        "unrelated filler content with nothing shared at all here....",
        "pad " * 20 + SHARED,
    ]
    a = duplicated_grams(
        _docs_ds(texts), k=32, min_docs=2, top=100, exchange="string"
    ).to_pandas()
    b = duplicated_grams(
        _docs_ds(texts), k=32, min_docs=2, top=100, exchange="hash64"
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    a = duplicated_grams(docs, top=50, exchange="string").to_pandas()
    b = duplicated_grams(docs, top=50, exchange="hash64").to_pandas()
    pd.testing.assert_frame_equal(a, b)
