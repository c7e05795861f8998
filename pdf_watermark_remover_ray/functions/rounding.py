"""DuckDB-compatible rounding.

DuckDB's ROUND(double, n) rounds halves AWAY from zero; ``np.round`` rounds
half-to-even.  Integer-ratio columns (alpha/stop ratios, Jaccard) regularly
produce dyadic doubles that sit EXACTLY on a half at n decimals (e.g.
105/128 = 0.8203125), where the two conventions diverge and break the
driver's value-hash compare — so every float column that faces an oracle is
rounded with this helper on the Ray side.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int):
    """Vectorized round-half-away-from-zero (DuckDB ROUND semantics)."""
    a = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale
