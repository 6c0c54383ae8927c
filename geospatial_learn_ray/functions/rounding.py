"""Half-away-from-zero rounding, matching SQL ROUND semantics.

numpy/pandas ``round`` is banker's (half-even): 4.40625 → 4.4062, while
DuckDB's ROUND gives 4.4063. Every value the engine rounds for an oracle
comparison goes through this helper so both sides agree on exact binary
fractions (ratios of small integers hit .5 boundaries exactly)."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 4):
    """Vectorized round-half-away-from-zero (SQL ROUND semantics)."""
    arr = np.asarray(x, np.float64)
    scale = 10.0**decimals
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if np.isscalar(x) or np.ndim(x) == 0:
        return float(out)
    return out
