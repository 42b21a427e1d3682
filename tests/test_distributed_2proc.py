"""Two-process jax.distributed execution test (CPU, one box).

The reference tests its multi-node path on a real 4-process HPX cluster
(Makefile:315-318, concrete_compiler_test_cpu_distributed.yml:66-78);
this is the TPU-native analog at the scale this box allows: two OS
processes, each owning 4 virtual CPU devices, forming one 8-device global
mesh through parallel/distributed.initialize(), running a globally
batch-sharded PBS and cross-checking against single-process execution.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

# each process owns 4 CPU devices; together they form an 8-device mesh
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags +
    " --xla_force_host_platform_device_count=4").strip()
import jax
jax.config.update("jax_platforms", "cpu")

from concrete_tpu.parallel import distributed, sharding
from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as kn
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY as P
import jax.numpy as jnp

distributed.initialize()  # from JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _ID
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = distributed.global_mesh()
rng = np.random.default_rng(3)           # same seed -> same keys everywhere
sk, server = kg.keygen(rng, P)
ksk = kn.pack_ksk(server.ksk, P)
bsk = kn.pack_bsk(server.bsk, P)
bits = 3
table = np.array([(v * 3 + 1) % 8 for v in range(8)], dtype=np.uint64)
lut_poly = jnp.asarray(ref.encode_expand_lut(table, P.polynomial_size, bits))

B = 16
msgs = np.arange(B) % 8
ct_full = kg.encrypt_lwe_batch(np.random.default_rng(11), sk.lwe_big,
                               ref.encode(msgs, bits), P.lwe_std / 1024)

# feed only this host's slice; assemble the global sharded array
sl = distributed.local_batch_slice(B)
from jax.sharding import NamedSharding, PartitionSpec
sharding_spec = NamedSharding(mesh, PartitionSpec("batch"))
ct_global = jax.make_array_from_process_local_data(
    sharding_spec, np.asarray(ct_full[sl]), (B, ct_full.shape[1]))

fn = sharding.sharded_pbs_fn(mesh, P, bits)
ksk_r, bsk_r = sharding.replicate_keys(mesh, ksk, bsk)
lut_r = jax.device_put(lut_poly, NamedSharding(mesh, PartitionSpec()))
out = fn(ct_global, ksk_r, bsk_r, lut_r)

# every process collects the full result and checks decryption
gathered = np.asarray(
    jax.experimental.multihost_utils.process_allgather(out, tiled=True))
dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, gathered), bits)
ok = int((dec == table[msgs]).sum())
print(f"RESULT proc={jax.process_index()} ok={ok}/{B}", flush=True)
assert ok >= B - 1, (dec.tolist(), table[msgs].tolist())
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_pbs(tmp_path):
    port = _free_port()
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = os.pathsep.join(
            [p for p in [os.path.dirname(os.path.dirname(__file__)),
                         env.get("PYTHONPATH", "")] if p])
        log = open(tmp_path / f"proc{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=log, stderr=subprocess.STDOUT))
    try:
        for p in procs:
            assert p.wait(timeout=600) == 0, _tail(tmp_path)
    finally:
        for p in procs:
            p.kill()
        for log in logs:
            log.close()
    text = _tail(tmp_path)
    assert text.count("RESULT") == 2, text


def _tail(tmp_path):
    out = []
    for pid in range(2):
        f = tmp_path / f"proc{pid}.log"
        if f.exists():
            out.append(f"--- proc{pid} ---\n" + f.read_text()[-3000:])
    return "\n".join(out)
