"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as K
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY as P
from concrete_tpu.parallel import (make_mesh, replicate_keys,
                                   shard_ciphertexts, sharded_pbs_fn)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_pbs_matches_unsharded(rng):
    p = 3
    sk, server = kg.keygen(rng, P)
    ksk = K.pack_ksk(server.ksk, P)
    bsk = K.pack_bsk(server.bsk, P)
    lut = np.array([(v + 1) % 8 for v in range(8)], dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size, p))
    msgs = rng.integers(0, 8, 16)
    ct = jnp.asarray(kg.encrypt_lwe_batch(rng, sk.lwe_big,
                                          ref.encode(msgs, p),
                                          P.lwe_std / 256))
    # unsharded
    want = np.asarray(K.pbs_batch(ct, ksk, bsk, lut_poly, P, p))

    mesh = make_mesh(8)
    ct_s = shard_ciphertexts(mesh, ct)
    ksk_r, bsk_r = replicate_keys(mesh, ksk, bsk)
    fn = sharded_pbs_fn(mesh, P, p)
    got = np.asarray(fn(ct_s, ksk_r, bsk_r, lut_poly))
    # bit-exact across shardings
    assert np.array_equal(got, want)
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, got), p)
    assert np.array_equal(dec, (msgs + 1) % 8)


def test_local_batch_slice_covers_remainder(monkeypatch):
    import jax
    from concrete_tpu.parallel import distributed

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    covered = []
    for i in range(3):
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        s = distributed.local_batch_slice(10)
        covered.extend(range(s.start, s.stop))
    assert covered == list(range(10))
