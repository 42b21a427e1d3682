"""Central JAX configuration for concrete_tpu.

TFHE torus arithmetic is mod 2^64, so the framework requires x64 mode.  Import
this module (it is imported by every core module) before using JAX APIs.
Hot kernels never put u64 *vectors* through the MXU/VPU — they split into
int8/int32 limb planes — but u64 scalars/elementwise ops at the XLA level rely
on x64 emulation.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Optional persistent compilation cache (off by default: the axon
# remote-compile path bypasses it, and cross-machine XLA:CPU AOT entries
# can trigger feature-mismatch loads).
_cache_dir = os.environ.get("CONCRETE_TPU_JAX_CACHE")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
