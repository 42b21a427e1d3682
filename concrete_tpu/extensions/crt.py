"""CRT (residue number system) encrypted integers.

Reference: the compiler's CRT mode for >=9-bit integers
(lib/Conversion/FHEToTFHECrt/FHEToTFHECrt.cpp, lib/Common/CRT.cpp): a value
is held as residues mod pairwise-coprime moduli; add/mul act per residue
(with TLU reduction mod m_j), decode via CRT reconstruction.  Arbitrary
table lookups over CRT values need WoP-PBS (bit extract + circuit bootstrap
+ vertical packing, wrappers.cpp:855) — planned; arithmetic and decode work
today.
"""

from __future__ import annotations

from functools import reduce

import numpy as np

from concrete_tpu.extensions.univariate import univariate

#: the reference's default CRT basis for 16-bit integers (CRT.cpp usage)
DEFAULT_MODULI = (7, 8, 9, 11, 13)


def crt_encode_clear(value: int, moduli=DEFAULT_MODULI):
    return [int(value) % m for m in moduli]


def crt_decode_clear(residues, moduli=DEFAULT_MODULI) -> int:
    product = reduce(lambda a, b: a * b, moduli)
    out = 0
    for r, m in zip(residues, moduli):
        q = product // m
        out += int(r) * q * pow(q, -1, m)
    return out % product


def crt_add(a_res, b_res, moduli=DEFAULT_MODULI):
    """Per-residue addition with TLU reduction mod m_j."""
    out = []
    for a, b, m in zip(a_res, b_res, moduli):
        out.append(univariate(lambda v, m=m: int(v) % m)(a + b))
    return tuple(out)


def crt_add_clear(a_res, constant: int, moduli=DEFAULT_MODULI):
    out = []
    for a, m in zip(a_res, moduli):
        c = int(constant) % m
        out.append(univariate(lambda v, m=m: int(v) % m)(a + c))
    return tuple(out)


def crt_mul(a_res, b_res, moduli=DEFAULT_MODULI):
    """Per-residue multiplication via one packed TLU per residue."""
    from concrete_tpu.extensions.multivariate import multivariate
    out = []
    for a, b, m in zip(a_res, b_res, moduli):
        out.append(multivariate(lambda x, y, m=m: (int(x) * int(y)) % m)(
            a, b))
    return tuple(out)


def crt_mul_clear(a_res, constant: int, moduli=DEFAULT_MODULI):
    out = []
    for a, m in zip(a_res, moduli):
        c = int(constant) % m
        out.append(univariate(lambda v, m=m, c=c: (int(v) * c) % m)(a))
    return tuple(out)
