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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_full_circuit_run(rng):
    """The frontend path under a mesh: a compiled Circuit runs on a
    batch-sharded encrypted input and stays correct (and the jitted
    executor's output follows the batch sharding) — the DFR/SDFG analog is
    XLA partitioning over the mesh, SURVEY §2.7."""
    import concrete_tpu as fhe
    from jax.sharding import NamedSharding, PartitionSpec

    from concrete_tpu.parallel import make_mesh

    table = fhe.LookupTable([(v + 3) % 8 for v in range(8)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x] + 1

    batch = 16
    circuit = f.compile([rng.integers(0, 8, batch) for _ in range(4)],
                        forced_parameters=P)
    circuit.keygen(seed=13)
    msgs = rng.integers(0, 8, batch)
    enc = circuit.encrypt(msgs)

    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, PartitionSpec("batch", None))
    enc_sharded = jax.device_put(jnp.asarray(enc), sharding)

    for _ in range(4):  # absorb tiny-params p_error
        out = circuit.run(enc_sharded)
        got = circuit.decrypt(out)
        if np.array_equal(got, (msgs + 3) % 8 + 1):
            break
    assert np.array_equal(got, (msgs + 3) % 8 + 1)

    # the jitted executor must propagate the batch sharding to its output
    eval_keys = circuit._evaluation_keys()
    raw = circuit.server._jitted(
        {0: enc_sharded},
        eval_keys[0], eval_keys[1],
        {uid: jnp.asarray(s.lut_poly)
         for uid, s in circuit.server._executor.tlu_specs.items()},
        {}, None, None)[0]
    assert not raw.sharding.is_fully_replicated
