"""round_bit_pattern / truncate_bit_pattern + Auto adjusters.

Reference: frontends/concrete-python/concrete/fhe/extensions/
round_bit_pattern.py:42,159 and truncate_bit_pattern.py:41,173.

Semantics: clear the `lsbs_to_remove` low bits (rounding to nearest for
round_bit_pattern, toward zero for truncate).  Today both lower to a single
TLU (univariate); fusing the rounding into the *consumer* TLU's modulus
switch (the reference's ProcessRounding optimization) is planned — the API
and semantics are stable either way.
"""

from __future__ import annotations

import numpy as np

from concrete_tpu.tracing.tracer import Tracer


class AutoRounder:
    """Chooses lsbs_to_remove from inputset bounds so that `target_msbs`
    significant bits remain (reference AutoRounder, round_bit_pattern.py:159).
    """

    def __init__(self, target_msbs: int = 6):
        self.target_msbs = target_msbs
        self.lsbs_to_remove = 0
        self._max_bit_width = 0

    def adjust(self, value):
        arr = np.asarray(value)
        hi = int(np.abs(arr).max()) if arr.size else 0
        width = max(hi.bit_length(), 1)
        self._max_bit_width = max(self._max_bit_width, width)
        self.lsbs_to_remove = max(self._max_bit_width - self.target_msbs, 0)


class AutoTruncator(AutoRounder):
    """Reference truncate_bit_pattern.py:173."""


def _resolve_lsbs(lsbs_to_remove) -> int:
    if isinstance(lsbs_to_remove, AutoRounder):
        return lsbs_to_remove.lsbs_to_remove
    return int(lsbs_to_remove)


def round_bit_pattern(x, lsbs_to_remove):
    """Round to the nearest multiple of 2^lsbs_to_remove."""
    lsbs = _resolve_lsbs(lsbs_to_remove)
    if lsbs == 0:
        return x
    half = 1 << (lsbs - 1)
    step = 1 << lsbs

    def fn(v):
        return ((int(v) + half) // step) * step

    if not isinstance(x, Tracer):
        return np.vectorize(fn, otypes=[np.int64])(np.asarray(x))
    from concrete_tpu.extensions.univariate import univariate
    return univariate(fn)(x)


def truncate_bit_pattern(x, lsbs_to_remove):
    """Clear the low lsbs_to_remove bits (truncate toward -inf on the raw
    bit pattern, matching the reference's bitwise semantics)."""
    lsbs = _resolve_lsbs(lsbs_to_remove)
    if lsbs == 0:
        return x

    def fn(v):
        return (int(v) >> lsbs) << lsbs

    if not isinstance(x, Tracer):
        return np.vectorize(fn, otypes=[np.int64])(np.asarray(x))
    from concrete_tpu.extensions.univariate import univariate
    return univariate(fn)(x)
