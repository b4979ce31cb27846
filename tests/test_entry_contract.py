"""Driver-contract test: every queries() entry must match its oracle_sql()
exactly (the same comparison the grading driver runs at sf0.01, here at
sf0.001 for speed) and entry() must produce rows with a stable schema."""

import pytest

import __ray_entry__ as entry_mod
from tests.parity import assert_parity, to_pandas


def test_queries_and_oracles_aligned():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q), "oracle for unknown query"
    # every query is either oracle-checked or deliberately rows-only
    rows_only = set(q) - set(o)
    assert rows_only == set(entry_mod.ROWS_ONLY_QUERIES), (
        f"undocumented rows-only queries: {rows_only}"
    )


@pytest.mark.parametrize("name", sorted(entry_mod.ROWS_ONLY_QUERIES))
def test_rows_only_queries_run(ray_session, sf_dir, name):
    """Rows-only queries must at least execute and return rows (the weaker
    driver check) deterministically."""
    result = entry_mod.queries()[name](sf_dir)
    df = to_pandas(result)
    assert len(df) > 0


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(ray_session, duck, sf_dir, name):
    result = entry_mod.queries()[name](sf_dir)
    assert_parity(result, entry_mod.oracle_sql()[name], duck)


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    df = to_pandas(ds)
    assert len(df) > 0
    assert set(df.columns) == {"conv_id", "turn_idx", "subj", "pred", "obj"}


def test_cli_list_is_ray_free_and_complete():
    """`python -m tcx2graph_jl_ray list` must enumerate the registry without
    owning a Ray session (subprocess: no ray.init side effects leak here)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "tcx2graph_jl_ray", "list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0
    names = out.stdout.split()
    import __ray_entry__ as entry

    assert set(names) == set(entry.queries())
