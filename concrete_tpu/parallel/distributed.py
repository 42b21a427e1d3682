"""Multi-host execution helpers.

The reference distributes work with an HPX runtime (one locality per node,
key broadcast via hpx collectives — SURVEY §2.7).  The TPU-native equivalent
is jax's multi-controller runtime: one process per host, a global mesh over
all chips, ciphertext batches sharded globally (DCN only at input
distribution), evaluation keys replicated into every chip's HBM.

Usage on each host of a pod slice:

    from concrete_tpu.parallel import distributed
    distributed.initialize()                  # jax.distributed.initialize()
    mesh = distributed.global_mesh()
    fn = sharded_pbs_fn(mesh, params, p)
    ...

Single-host multi-chip works with the same code (initialize() is a no-op
when no coordinator is configured).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Start the jax distributed runtime (no-op for single-process runs).

    Arguments default to the standard JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment variables.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id if process_id is not None
        else int(os.environ["JAX_PROCESS_ID"]))


def global_mesh(axis_name: str = "batch") -> Mesh:
    """A 1-D mesh over every chip of every host."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-sharded batch this host should feed.

    With batch sharding, each host materializes only its local shard
    (jax.make_array_from_process_local_data handles the assembly).
    A remainder of global_batch % processes is spread over the first hosts
    so every element is covered.
    """
    n_proc = jax.process_count()
    per, rem = divmod(global_batch, n_proc)
    i = jax.process_index()
    start = i * per + min(i, rem)
    return slice(start, start + per + (1 if i < rem else 0))


def scaling_report(pbs_per_sec_one_chip: float,
                   pbs_per_sec_mesh: float) -> dict:
    """Scaling efficiency record (BASELINE: >=85% at 2 hosts)."""
    n = len(jax.devices())
    ideal = pbs_per_sec_one_chip * n
    return {
        "devices": n,
        "hosts": jax.process_count(),
        "pbs_per_sec": pbs_per_sec_mesh,
        "scaling_efficiency": pbs_per_sec_mesh / ideal if ideal else 0.0,
    }
