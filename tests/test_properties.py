"""Property-based tests (hypothesis): algorithmic invariants that example
tests can miss."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tcx2graph_jl_ray.functions.minhash import (
    jaccard_of_sets,
    minhash_signatures,
    word_shingles,
)
from tcx2graph_jl_ray.stages.canonicalize import _components_local
from tcx2graph_jl_ray.stages.extract import normalize_surface

# --- union-find vs naive reference -------------------------------------------

_node = st.integers(min_value=0, max_value=14)


@given(
    edges=st.lists(st.tuples(_node, _node), max_size=30),
    extra_nodes=st.sets(_node, max_size=15),
)
@settings(max_examples=200, deadline=None)
def test_components_match_naive_bfs(edges, extra_nodes):
    nodes = sorted({f"n{a}" for a, b in edges} | {f"n{b}" for a, b in edges}
                   | {f"n{x}" for x in extra_nodes})
    e = [(f"n{a}", f"n{b}") for a, b in edges]
    got = dict(
        zip(*(lambda df: (df["node"], df["label"]))(_components_local(nodes, e)))
    )

    # naive reference: BFS components, label = min member
    adj = {n: set() for n in nodes}
    for a, b in e:
        adj[a].add(b)
        adj[b].add(a)
    seen, want = set(), {}
    for n in nodes:
        if n in seen:
            continue
        comp, stack = [], [n]
        seen.add(n)
        while stack:
            cur = stack.pop()
            comp.append(cur)
            for nxt in adj[cur]:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        label = min(comp)
        for m in comp:
            want[m] = label
    assert got == want


# --- normalization -----------------------------------------------------------


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent_and_clean(s):
    n = normalize_surface(s)
    assert normalize_surface(n) == n  # idempotent
    assert n == n.strip()
    assert "  " not in n
    assert n == n.lower()


# --- minhash estimates true jaccard ------------------------------------------


@given(
    base=st.lists(st.sampled_from("abcdefghij"), min_size=20, max_size=40),
    flips=st.integers(min_value=0, max_value=10),
)
@settings(max_examples=30, deadline=None)
def test_minhash_band_collision_tracks_jaccard(base, flips):
    """Docs with identical shingle sets share the full signature; disjoint
    sets share (almost) none of it."""
    text_a = " ".join(base)
    texts = pd.Series([text_a, text_a, " ".join("zwxyq"[i % 5] + str(i) for i in range(25))])
    sh = word_shingles(texts, k=3)
    sig = minhash_signatures(np.array([0, 1, 2]), sh, num_perm=32)
    sigs = {d: s for d, s in zip(sig["doc_id"], sig["sig"])}
    assert (sigs[0] == sigs[1]).all()  # identical docs -> identical signature
    frac_cd = (sigs[0] == sigs[2]).mean()
    assert frac_cd < 0.5  # disjoint docs share (almost) no signature

    true_j = jaccard_of_sets(set(sh[0]), set(sh[2]))
    assert true_j < 0.1


# --- bucketed grouping == pandas groupby -------------------------------------


def test_bucketed_group_apply_equals_pandas(ray_session):
    import ray.data

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 500, size=5000).astype(str),
            "v": rng.randint(0, 100, size=5000),
        }
    )

    def bucket_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("k", sort=False)["v"].agg(["sum", "size"]).reset_index()
        return g.rename(columns={"sum": "s", "size": "n"})

    got = (
        bucketed_group_apply(ray.data.from_pandas(df).repartition(8), ["k"], bucket_fn)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k")["v"].agg(["sum", "size"]).reset_index()
        .rename(columns={"sum": "s", "size": "n"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"s": "int64", "n": "int64"}),
        want.astype({"s": "int64", "n": "int64"}),
    )


@given(st.integers(min_value=-(10**17), max_value=10**17))
def test_signed_money_matches_decimal_half_away(s):
    """money_from_scaled4_signed == Decimal ROUND_HALF_UP away from zero,
    for any signed 1e-4-scaled int (the q9 profit display rule)."""
    from decimal import ROUND_HALF_UP, Decimal

    from tcx2graph_jl_ray.functions.money import money_from_scaled4_signed

    want = float(
        (Decimal(s) / Decimal(10_000)).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP
        )
    )
    assert money_from_scaled4_signed(s) == want


@given(
    st.integers(min_value=0, max_value=10**18),
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=1, max_value=10**6),
)
def test_q11_threshold_rewrite_is_exact(total, value, ppm):
    """The overflow-proof HAVING rewrite used by q11_important_parts:
    value * 1e6 > total * ppm  <=>  value > (total * ppm) // 1e6
    for non-negative ints (exact, no per-row big product needed)."""
    lhs = value * 1_000_000 > total * ppm  # Python ints: no overflow
    rhs = value > (total * ppm) // 1_000_000
    assert lhs == rhs


@given(st.integers(min_value=0, max_value=10**15))
def test_q17_integer_div7_half_up(total_cents):
    """q17's (2c+7)//14 == round-half-up(c/7) in exact integer space."""
    from decimal import ROUND_HALF_UP, Decimal

    want = int(
        (Decimal(total_cents) / Decimal(7)).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )
    assert (2 * total_cents + 7) // 14 == want


@given(
    st.lists(
        st.tuples(
            st.decimals(
                min_value="0.01", max_value="99999.99", places=2
            ),
            st.decimals(min_value="0.00", max_value="0.99", places=2),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_rev_scaled4_is_exact_decimal_product(rows):
    """rev_scaled4 equals the exact Decimal price*(1-disc) at 1e-4 scale
    for any 2-dp price/discount — the invariant every money sum rests on."""
    from decimal import Decimal

    from tcx2graph_jl_ray.functions.money import rev_scaled4

    prices = np.array([float(p) for p, _ in rows])
    discs = np.array([float(d) for _, d in rows])
    got = rev_scaled4(prices, discs)
    for (p, d), g in zip(rows, got):
        assert int(g) == int(p * (Decimal(1) - d) * 10_000)
