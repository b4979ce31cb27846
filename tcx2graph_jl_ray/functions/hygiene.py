"""Shared dirty-input hygiene for document operators."""

from __future__ import annotations

import pandas as pd


def nonnull_text(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Dirty-input contract: rows with a null text column are dropped at the
    operator boundary (the presence-filter M2 recast, src/TCXParser.jl:58 —
    a point without coordinates is skipped, not an error). Every SQL oracle
    filters identically (``WHERE text IS NOT NULL``)."""
    return batch[batch[col].notna()]
