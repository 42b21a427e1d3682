"""GLWE polynomial-limb sharding tests (virtual 8-device CPU mesh).

The limb-sharded NTT external product / blind rotate / PBS must be
bit-identical to the single-device XLA CRT-NTT path (which is itself
bit-identical to the banded path and the numpy oracle).
"""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as K
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY as P
from concrete_tpu.parallel import limb_sharding as ls

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh")


def _mesh():
    return ls.make_limb_mesh()


def test_check_limb_shardable():
    primes = nt.choose_primes(P)
    plan = nt.build_plan(P.polynomial_size, primes[0])
    assert ls.check_limb_shardable(P, 1)
    assert ls.check_limb_shardable(P, min(plan.n1, plan.n2))
    assert not ls.check_limb_shardable(P, 2 * max(plan.n1, plan.n2))


def test_external_product_matches_ntt(rng):
    primes = nt.choose_primes(P)
    n = P.polynomial_size
    k, l = P.glwe_dimension, P.pbs_level
    cin = l * (k + 1)
    b = 3
    bsk_u64 = rng.integers(0, 1 << 63, (4, l, k + 1, k + 1, n),
                           dtype=np.uint64)
    nbsk = nt.pack_bsk_ntt(bsk_u64, P, primes=primes)
    spec_j = jnp.moveaxis(nbsk.spectra, 1, 0)[0]       # (primes, Cin, k+1, N)
    d = jnp.asarray(rng.integers(-(1 << (P.pbs_base_log - 1)),
                                 1 << (P.pbs_base_log - 1),
                                 (b, cin, n)).astype(np.int32))
    want = np.asarray(nt.external_product_ntt(d, spec_j, primes, P))
    got = np.asarray(ls.external_product_limb_sharded(
        _mesh(), d, spec_j, P, primes))
    np.testing.assert_array_equal(got, want)


def test_blind_rotate_matches(rng):
    sk, server = kg.keygen(rng, P)
    nbsk = nt.pack_bsk_ntt(server.bsk, P)
    bits = 3
    lut = rng.integers(0, 1 << bits, 1 << bits, dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size,
                                                 bits))
    b = 2
    msgs = rng.integers(0, 1 << bits, b)
    ct = kg.encrypt_lwe_batch(rng, sk.lwe_small, ref.encode(msgs, bits),
                              P.lwe_std)
    want = np.asarray(nt.blind_rotate_ntt(jnp.asarray(ct), nbsk, lut_poly, P))
    got = np.asarray(ls.blind_rotate_limb_sharded(
        _mesh(), jnp.asarray(ct), nbsk, lut_poly, P))
    np.testing.assert_array_equal(got, want)


def test_full_pbs_matches_and_decrypts(rng):
    sk, server = kg.keygen(rng, P)
    ksk = K.pack_ksk(server.ksk, P)
    nbsk = nt.pack_bsk_ntt(server.bsk, P)
    bits = 3
    table = np.array([(2 * v + 1) % (1 << bits) for v in range(1 << bits)],
                     dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(table, P.polynomial_size,
                                                 bits))
    b = 4
    msgs = rng.integers(0, 1 << bits, b)
    ct = kg.encrypt_lwe_batch(rng, sk.lwe_big, ref.encode(msgs, bits),
                              P.lwe_std / 1024)
    # single-device oracle through the BANDED path (the NttBSK dispatch
    # was retired from pbs_batch in round 4; NttBSK math lives on only
    # behind the limb-sharded layout being tested here)
    want = np.asarray(K.pbs_batch(jnp.asarray(ct), ksk,
                                  K.pack_bsk(server.bsk, P), lut_poly, P,
                                  bits))
    got = np.asarray(ls.pbs_batch_limb_sharded(
        _mesh(), jnp.asarray(ct), ksk, nbsk, lut_poly, P, bits))
    np.testing.assert_array_equal(got, want)
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, got), bits)
    np.testing.assert_array_equal(dec, table[msgs])


def test_sharding_really_splits_poly_axis(rng):
    """The device-local shard of the spectrum must be N/D wide: assert via
    the sharding of an intermediate (the jitted fn's output sharding is
    replicated by design, so probe the input layout constraint instead)."""
    primes = nt.choose_primes(P)
    plan = nt.build_plan(P.polynomial_size, primes[0])
    mesh = _mesh()
    d_devices = len(mesh.devices)
    assert plan.n1 % d_devices == 0 and plan.n2 % d_devices == 0
    # shard a spectrum tensor the way the sharded path does and check the
    # per-device shard shape
    from jax.sharding import NamedSharding, PartitionSpec as Pspec
    spec = jnp.zeros((len(primes), 2, 2, plan.n1, plan.n2), jnp.uint32)
    sharded = jax.device_put(
        spec, NamedSharding(mesh, Pspec(None, None, None, ls.LIMB_AXIS,
                                        None)))
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(len(primes), 2, 2, plan.n1 // d_devices,
                             plan.n2)}
