"""Multi-chip scale-out: ciphertext-batch sharding over a device mesh.

The TPU-native replacement for the reference's distribution stack (HPX
dataflow runtime, lib/Runtime/DFRuntime.cpp; key broadcast via
hpx::collectives, include/concretelang/Runtime/key_manager.hpp:105-157):

- the ciphertext *batch* is sharded across devices (PartitionSpec("batch")),
  the embarrassingly-parallel axis of PBS workloads;
- evaluation keys (BSK/KSK limb planes, tens of MB) are *replicated* into
  every chip's HBM — the analog of the reference's per-node key broadcast;
- XLA inserts no collectives in the PBS path (batch-parallel); collectives
  only appear when a circuit reduces across the batch.

Multi-host: the same code runs under `jax.distributed` with a global mesh —
batch crosses DCN only at input distribution time.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from concrete_tpu.core import kernels as kn
from concrete_tpu.params import CryptoParams


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "batch"
              ) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_ciphertexts(mesh: Mesh, ct, axis_name: str = "batch"):
    """Place a ciphertext batch (B, n+1) sharded on its batch axis.

    A single unbatched ciphertext (n+1,) has no batch axis — replicate it
    (sharding the LWE-coefficient axis would split the mask across
    devices, failing outright for n+1 not divisible by the device count).
    """
    spec = P(axis_name) if ct.ndim >= 2 else P()
    return jax.device_put(ct, NamedSharding(mesh, spec))


def replicate_keys(mesh: Mesh, ksk: kn.LimbKSK, bsk: kn.LimbBSK):
    """Replicate evaluation keys into every device's HBM."""
    rep = NamedSharding(mesh, P())
    return (jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), ksk),
            jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), bsk))


def sharded_pbs_fn(mesh: Mesh, params: CryptoParams, message_bits: int,
                   signed: bool = False, axis_name: str = "batch"):
    """A jitted batch-sharded PBS: batch split over the mesh, keys replicated.

    Returns fn(ct, ksk, bsk, lut_poly) -> ct_out with the same sharding.
    """
    batch_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def fn(ct, ksk, bsk, lut_poly):
        return kn.pbs_batch(ct, ksk, bsk, lut_poly, params, message_bits,
                            signed=signed)

    # sharding pytree prefixes: `replicated` broadcasts over the key pytrees
    return jax.jit(
        fn,
        in_shardings=(batch_sharding, replicated, replicated, replicated),
        out_shardings=batch_sharding)
