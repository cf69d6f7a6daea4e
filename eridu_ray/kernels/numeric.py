"""Numeric kernels shared by oracle-paired pipelines."""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Round half AWAY from zero, matching DuckDB/SQL ``round()``.

    ``np.rint`` is round-half-to-even, which diverges from the oracle
    whenever the scaled value lands exactly on ``k + 0.5`` (dyadic
    fractions such as 0.125 * 100 = 12.5 -> rint 12, DuckDB 13).  The
    current events/lineitem tables carry 2-decimal values where the two
    rules agree, but the oracle contract must not depend on that
    (ADVICE r4).  Works on scalars and arrays; caller casts to int64.
    """
    x = np.asarray(x)
    return np.where(x >= 0.0, np.floor(x + 0.5), np.ceil(x - 0.5))
