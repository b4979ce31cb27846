"""Triple/mention extraction: oracle parity + exact P/R on the planted corpus."""

import pandas as pd

from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
from tcx2graph_jl_ray.stages.extract import (
    MENTIONS_SQL_TEMPLATE,
    TRIPLES_SQL_TEMPLATE,
    MentionExtractor,
    TripleExtractor,
    extract_mentions,
    extract_triples,
    normalize_surface,
)
from tests.parity import assert_parity, to_pandas


def test_triples_match_oracle(ray_session, duck, sf_dir):
    ds = extract_triples(derive_transcripts(sf_dir))
    assert_parity(ds, TRIPLES_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck)


def test_mentions_match_oracle(ray_session, duck, sf_dir):
    ds = extract_mentions(derive_transcripts(sf_dir))
    assert_parity(ds, MENTIONS_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck)


def test_extractor_precision_recall(ray_session, duck, sf_dir):
    """P/R vs the reference extractor (single-threaded oracle run) must be
    >= 0.95 — here exactly 1.0 on the clean planted corpus (BASELINE.json)."""
    got = to_pandas(extract_triples(derive_transcripts(sf_dir)))
    want = duck.execute(
        TRIPLES_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL)
    ).fetchdf()
    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    want_set = set(map(tuple, want[key].itertuples(index=False)))
    precision = len(got_set & want_set) / len(got_set)
    recall = len(got_set & want_set) / len(want_set)
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0


def test_extractor_units():
    """Smoke the actor classes directly (actor __init__ errors surface late in
    pipelines) on hand-written rows, including non-matching text."""
    batch = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2", "c2"],
            "turn_idx": pd.array([0, 1, 0, 1], dtype="int32"),
            "text": [
                "please look up Ada Lovelace and report signup",
                "Ada Lovelace is located in EUROPE ; Ada Lovelace reported signup",
                "lookup[view] -> ada lovelace k=7",
                "free text with no pattern at all",
            ],
        }
    )
    triples = TripleExtractor()(batch)
    assert len(triples) == 4  # 1 user + 2 assistant + 1 tool, nothing for row 4
    assert set(triples["pred"]) == {"asked_about", "located_in", "reported", "k_value"}
    located = triples[triples["pred"] == "located_in"].iloc[0]
    assert located["subj"] == "Ada Lovelace" and located["obj"] == "EUROPE"

    mentions = MentionExtractor()(batch)
    assert len(mentions) == 3
    m1 = mentions[mentions["turn_idx"] == 1].iloc[0]
    assert m1["surface"] == "Ada Lovelace"
    assert m1["n_occurrences"] == 2  # appears twice in the assistant turn
    assert m1["norm"] == "ada lovelace"
    assert normalize_surface("The_NATION 7  team!") == "the nation 7 team"
