"""Probe the Mosaic ops the fused CRT-NTT step kernel depends on.

Run on the real TPU: validates, one at a time,
  1. in-kernel minor-dim reshape (M, N) -> (M, n1, n2) and back
  2. in-kernel swapaxes on the two minor dims of a 3D value
  3. revisited output blocks as a VMEM accumulator across the inner grid
     dim (grid (i, j), out block index (i, 0): read-modify-write per j)
  4. pltpu.roll on the flat (M, N) lanes (cross-tile wraparound)
  5. dot_general int8 -> int32 inside the same kernel as 1-3

Each prints OK/FAIL vs a numpy oracle.  PYTHONPATH must keep
/root/.axon_site first (axon backend registration).
"""
import functools

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I0 = np.int32(0)
M, N1, N2 = 16, 32, 128
N = N1 * N2


def check(name, got, want):
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"{name:40s} {'OK' if ok else 'FAIL'}", flush=True)
    return ok


# 1+2: reshape + swapaxes round trip ------------------------------------
def _k_reshape(x_ref, o_ref):
    x = x_ref[...]                              # (M, N) i32
    y = x.reshape(M, N1, N2)
    y = jnp.swapaxes(y, 1, 2)                   # (M, N2, N1)
    y = y + jnp.int32(1)
    y = jnp.swapaxes(y, 1, 2)
    o_ref[...] = y.reshape(M, N)


def probe_reshape():
    x = np.arange(M * N, dtype=np.int32).reshape(M, N)
    out = pl.pallas_call(
        _k_reshape,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    return check("reshape+swapaxes round trip", out, x + 1)


# 2b: transpose-collapse like the NTT stage-1 feed ----------------------
def _k_stage_feed(x_ref, o_ref):
    x = x_ref[...]                              # (M, N)
    y = jnp.swapaxes(x.reshape(M, N1, N2), 1, 2).reshape(M * N2, N1)
    o_ref[...] = y


def probe_stage_feed():
    x = np.arange(M * N, dtype=np.int32).reshape(M, N)
    want = np.swapaxes(x.reshape(M, N1, N2), 1, 2).reshape(M * N2, N1)
    out = pl.pallas_call(
        _k_stage_feed,
        out_shape=jax.ShapeDtypeStruct((M * N2, N1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    return check("stage-1 feed transpose-collapse", out, want)


# 3: revisited output accumulation across inner grid dim ----------------
def _k_acc(x_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] = o_ref[...] + x_ref[...]


def probe_revisit(gi=4, gj=7, r=8):
    x = np.arange(gi * r * gj * 128, dtype=np.int32).reshape(gi * r, gj * 128)
    out = pl.pallas_call(
        _k_acc,
        grid=(gi, gj),
        in_specs=[pl.BlockSpec((r, 128), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((r, 128), lambda i, j: (i, _I0)),
        out_shape=jax.ShapeDtypeStruct((gi * r, 128), jnp.int32),
    )(jnp.asarray(x))
    want = x.reshape(gi * r, gj, 128).sum(axis=1)
    return check("revisited out-block accumulator", out, want)


# 4: flat roll across lane tiles ----------------------------------------
def _k_roll(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 1234, axis=1)


def probe_roll():
    x = np.arange(M * N, dtype=np.int32).reshape(M, N)
    out = pl.pallas_call(
        _k_roll,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    return check("flat roll 1234 over 4096 lanes", out, np.roll(x, 1234, 1))


# 5: all of it together + int8 matmul -----------------------------------
def _k_mix(x_ref, w_ref, o_ref):
    x = x_ref[...]                               # (M, N) i32
    y = jnp.swapaxes(x.reshape(M, N1, N2), 1, 2).reshape(M * N2, N1)
    y8 = (y & jnp.int32(0x7F)).astype(jnp.int8)
    planes = jax.lax.dot_general(
        y8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)        # (M*N2, N1)
    z = planes.reshape(M, N2, N1)
    z = jnp.swapaxes(z, 1, 2)
    o_ref[...] = z.reshape(M, N)


def probe_mix():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 20, (M, N)).astype(np.int32)
    w = rng.integers(-128, 128, (N1, N1)).astype(np.int8)
    y = np.swapaxes(x.reshape(M, N1, N2), 1, 2).reshape(M * N2, N1)
    want = ((y & 0x7F).astype(np.int64) @ w.astype(np.int64)).astype(np.int32)
    want = np.swapaxes(want.reshape(M, N2, N1), 1, 2).reshape(M, N)
    out = pl.pallas_call(
        _k_mix,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x), jnp.asarray(w))
    return check("reshape+transpose+int8 dot mix", out, want)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    results = []
    for fn in (probe_reshape, probe_stage_feed, probe_revisit, probe_roll,
               probe_mix):
        try:
            results.append(fn())
        except Exception as e:  # noqa: BLE001
            print(f"{fn.__name__:40s} ERROR {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            results.append(False)
    print("ALL OK" if all(results) else "SOME FAILED", flush=True)
