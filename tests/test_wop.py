"""WoP-PBS oracle tests: bit extraction, circuit bootstrap, vertical
packing, and the full large-precision TLU.

Mirrors the reference's wop coverage (wop_pbs.rs unit tests /
compiler end-to-end 16-bit TLU tests) against plaintext oracles.
"""

import numpy as np
import pytest

from concrete_tpu.core import refimpl as ref
from concrete_tpu.core import wop
from concrete_tpu.params import TEST_PARAMS_TINY_WIDE

WP = wop.WopParams(base=TEST_PARAMS_TINY_WIDE)


@pytest.fixture(scope="module")
def keyset():
    rng = np.random.default_rng(11)
    sk, server = ref.keygen(rng, WP.base)
    wop_keys = wop.pfpksk_gen(rng, sk, WP)
    return rng, sk, server, wop_keys


def _decode_bit(sk, bit_ct):
    phase = ref.lwe_decrypt(sk.lwe_big, bit_ct)
    return int((phase + (1 << 62)) >> np.uint64(63)) & 1


def test_extract_bits(keyset):
    rng, sk, server, _ = keyset
    p = 6
    delta = 63 - p
    m = 0b101101
    ct = ref.lwe_encrypt(rng, sk.lwe_big,
                         np.uint64(m) << np.uint64(delta),
                         WP.base.lwe_std / 64)
    bits = wop.extract_bits(ct, p, delta, server, WP.base)
    got = [_decode_bit(sk, bits[i]) for i in range(p)]  # MSB first
    want = [(m >> (p - 1 - i)) & 1 for i in range(p)]
    assert got == want, (got, want)


def test_circuit_bootstrap_external_product(keyset):
    """GGSW(b) from the circuit bootstrap must act correctly in an external
    product: GGSW(b) . GLWE(T) ~ b*T."""
    rng, sk, server, wop_keys = keyset
    n = WP.base.polynomial_size
    for b in (0, 1):
        bit_ct = ref.lwe_encrypt(rng, sk.lwe_big,
                                 np.uint64(b) << np.uint64(63),
                                 WP.base.lwe_std / 64)
        ggsw = wop.circuit_bootstrap(bit_ct, server, wop_keys, WP)
        t_poly = np.zeros(n, dtype=np.uint64)
        t_poly[0] = np.uint64(5) << np.uint64(60)
        trivial = ref.glwe_trivial(t_poly, WP.base.glwe_dimension)
        out = ref.external_product(ggsw, trivial, WP.cbs_base_log,
                                   WP.cbs_level)
        phase = ref.glwe_decrypt(sk.glwe, out)
        got = int((phase[0] + (1 << 59)) >> np.uint64(60)) & 0xF
        assert got == 5 * b, (b, got)


def test_vertical_packing_single_chunk(keyset):
    """nb <= log2(N): pure GGSW blind rotation (no tree)."""
    rng, sk, server, wop_keys = keyset
    p = 5
    lut = np.arange(1 << p, dtype=np.uint64)[::-1].copy()
    lut_torus = lut << np.uint64(64 - p - 1)
    m = 19
    ggsws = []
    for i in range(p):  # MSB first
        b = (m >> (p - 1 - i)) & 1
        bit_ct = ref.lwe_encrypt(rng, sk.lwe_big,
                                 np.uint64(b) << np.uint64(63),
                                 WP.base.lwe_std / 64)
        ggsws.append(wop.circuit_bootstrap(bit_ct, server, wop_keys, WP))
    out = wop.vertical_packing(lut_torus, np.stack(ggsws), WP)
    phase = ref.lwe_decrypt(sk.lwe_big, out)
    got = int(ref.decode(phase, p))
    assert got == int(lut[m]), (got, int(lut[m]))


def test_wop_pbs_10bit(keyset):
    """Full pipeline at 10 bits (4 chunks at N=256: exercises the CMUX
    tree + rotation + extraction + CBS end to end)."""
    rng, sk, server, wop_keys = keyset
    p = 10
    out_bits = 6
    delta = 63 - p
    table = ((np.arange(1 << p) * 7) % (1 << out_bits)).astype(np.uint64)
    for m in (0, 613, 1023):
        ct = ref.lwe_encrypt(rng, sk.lwe_big,
                             np.uint64(m) << np.uint64(delta),
                             WP.base.lwe_std / 64)
        out = wop.wop_pbs(ct, table, p, delta, out_bits, server,
                          wop_keys, WP)
        phase = ref.lwe_decrypt(sk.lwe_big, out)
        got = int(ref.decode(phase, out_bits))
        assert got == int(table[m]), (m, got, int(table[m]))
