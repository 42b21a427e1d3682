"""Batched JAX WoP kernels vs the numpy oracle (core/wop.py) — bit-exact."""

import numpy as np
import pytest

from concrete_tpu.core import kernels as kn
from concrete_tpu.core import kernels_wop as kw
from concrete_tpu.core import refimpl as ref
from concrete_tpu.core import wop
from concrete_tpu.params import TEST_PARAMS_TINY_WIDE

WP = wop.WopParams(base=TEST_PARAMS_TINY_WIDE)


@pytest.fixture(scope="module")
def keyset():
    rng = np.random.default_rng(23)
    sk, server = ref.keygen(rng, WP.base)
    wop_keys = wop.pfpksk_gen(rng, sk, WP)
    ksk = kn.pack_ksk(server.ksk, WP.base)
    bsk = kn.pack_bsk(server.bsk, WP.base)
    pfp = kw.pack_pfpksk(wop_keys.pfpksk, WP)
    return rng, sk, server, wop_keys, ksk, bsk, pfp


def test_private_packing_keyswitch_batch(keyset):
    rng, sk, server, wop_keys, ksk, bsk, pfp = keyset
    b = 3
    cts = np.stack([
        ref.lwe_encrypt(rng, sk.lwe_big,
                        np.uint64(i) << np.uint64(60), WP.base.lwe_std / 64)
        for i in range(b)])
    got = np.asarray(kw.private_packing_keyswitch_batch(cts, pfp))
    for bi in range(b):
        for r in range(WP.base.glwe_dimension + 1):
            want = wop.private_packing_keyswitch(
                cts[bi], wop_keys.pfpksk[r], WP.pfks_base_log, WP.pfks_level)
            np.testing.assert_array_equal(got[bi, r], want)


def test_external_product_batch_matches_oracle(keyset):
    rng, sk, server, wop_keys, ksk, bsk, pfp = keyset
    params = WP.base
    k, n = params.glwe_dimension, params.polynomial_size
    l, base = WP.cbs_level, WP.cbs_base_log
    b = 2
    ggsws = np.stack([
        ref.ggsw_encrypt(rng, sk.glwe, bit, base, l, params.glwe_std)
        for bit in (0, 1)])
    glwes = ref.sample_uniform_u64(rng, (b, k + 1, n))
    got = np.asarray(kw.external_product_batch(ggsws, glwes, base, l))
    for bi in range(b):
        want = ref.external_product(ggsws[bi], glwes[bi], base, l)
        np.testing.assert_array_equal(got[bi], want)


def test_extract_bits_batch(keyset):
    rng, sk, server, wop_keys, ksk, bsk, pfp = keyset
    p = 6
    delta = 63 - p
    msgs = [0b101101, 0b000111, 0b111111]
    cts = np.stack([
        ref.lwe_encrypt(rng, sk.lwe_big, np.uint64(m) << np.uint64(delta),
                        WP.base.lwe_std / 64) for m in msgs])
    got = np.asarray(kw.extract_bits_batch(cts, p, delta, ksk, bsk, WP.base))
    for bi, m in enumerate(msgs):
        decoded = [
            int((ref.lwe_decrypt(sk.lwe_big, got[bi, i])
                 + np.uint64(1 << 62)) >> np.uint64(63)) & 1
            for i in range(p)]
        want = [(m >> (p - 1 - i)) & 1 for i in range(p)]
        assert decoded == want, (m, decoded, want)


def test_extract_bits_to_selected_positions(keyset):
    """Cheap cascade: request a subset of bits at reassembly scales; summing
    the outputs must decode to the reassembled integer."""
    rng, sk, server, wop_keys, ksk, bsk, pfp = keyset
    p = 5
    delta = 63 - p
    positions = (0, 2, 3)
    p_out = len(positions)
    scales = tuple(63 - p_out + j for j in range(len(positions)))
    msgs = [0b10110, 0b01101, 0b11111, 0b00000]
    cts = np.stack([
        ref.lwe_encrypt(rng, sk.lwe_big, np.uint64(m) << np.uint64(delta),
                        WP.base.lwe_std / 64) for m in msgs])
    got = np.asarray(kw.extract_bits_to(cts, positions, scales, delta,
                                        ksk, bsk, WP.base))
    assert got.shape == (len(msgs), len(positions), cts.shape[1])
    for bi, m in enumerate(msgs):
        summed = got[bi].sum(axis=0, dtype=np.uint64)
        phase = ref.lwe_decrypt(sk.lwe_big, summed)
        want = sum(((m >> b) & 1) << j for j, b in enumerate(positions))
        assert int(ref.decode(phase, p_out)) == want, (m, want)


def test_wop_pbs_batch_end_to_end(keyset):
    rng, sk, server, wop_keys, ksk, bsk, pfp = keyset
    p, out_bits = 10, 6
    delta = 63 - p
    table = ((np.arange(1 << p) * 11 + 3) % (1 << out_bits)).astype(np.uint64)
    msgs = [0, 401, 1023]
    cts = np.stack([
        ref.lwe_encrypt(rng, sk.lwe_big, np.uint64(m) << np.uint64(delta),
                        WP.base.lwe_std / 64) for m in msgs])
    got = np.asarray(kw.wop_pbs_batch(cts, table, p, delta, out_bits,
                                      ksk, bsk, pfp, WP))
    for bi, m in enumerate(msgs):
        phase = ref.lwe_decrypt(sk.lwe_big, got[bi])
        assert int(ref.decode(phase, out_bits)) == int(table[m]), m


def test_wop_pbs_batch_bit_exact_vs_oracle(keyset):
    """Same keys, same input ciphertext: the batched kernel must reproduce
    the oracle's output ciphertext exactly (not just the decryption)."""
    rng, sk, server, wop_keys, ksk, bsk, pfp = keyset
    p, out_bits = 9, 5
    delta = 63 - p
    table = ((np.arange(1 << p) * 5) % (1 << out_bits)).astype(np.uint64)
    m = 277
    ct = ref.lwe_encrypt(rng, sk.lwe_big, np.uint64(m) << np.uint64(delta),
                         WP.base.lwe_std / 64)
    want = wop.wop_pbs(ct, table, p, delta, out_bits, server, wop_keys, WP)
    got = np.asarray(kw.wop_pbs_batch(ct[None], table, p, delta, out_bits,
                                      ksk, bsk, pfp, WP))[0]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("base_log,levels", [(16, 1), (12, 2)])
def test_external_product_wide_gadget_base(keyset, base_log, levels):
    """Gadget bases above 15 bits produce digits needing 3 int8 limbs;
    the runtime conv must size its limb split from base_log (regression:
    it hardcoded 2 limbs and silently wrapped 2^15-magnitude digits)."""
    rng, sk, server, wop_keys, ksk, bsk, pfp = keyset
    params = WP.base
    k, n = params.glwe_dimension, params.polynomial_size
    b = 2
    ggsws = np.stack([
        ref.ggsw_encrypt(rng, sk.glwe, bit, base_log, levels,
                         params.glwe_std)
        for bit in (0, 1)])
    glwes = ref.sample_uniform_u64(rng, (b, k + 1, n))
    got = np.asarray(kw.external_product_batch(ggsws, glwes,
                                               base_log, levels))
    for bi in range(b):
        want = ref.external_product(ggsws[bi], glwes[bi], base_log, levels)
        np.testing.assert_array_equal(got[bi], want)
