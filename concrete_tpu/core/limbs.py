"""Limb decompositions: u64 <-> balanced int8 planes, and recombination.

TPUs have no 64-bit integer datapath (XLA emulates u64 with 32-bit pairs, and
the MXU multiplies int8/bf16).  All hot multiplications in this framework are
therefore expressed over *balanced base-256 limbs*:

    x  =  sum_j  limb_j * 2^(8 j)   (mod 2^64),   limb_j in [-128, 127]

Products of two balanced limbs fit comfortably in the MXU's int8 x int8 ->
int32 path, and a negacyclic polynomial product mod 2^64 becomes a small
2-D convolution over (limb index, coefficient index) with int32 accumulation
(see core/kernels.py).  This replaces the reference's f64 FFT
(concrete-fft / tfhe-rs, see backends/concrete-cpu) with *exact* integer
arithmetic: no rounding noise term.

The recombination  sum_s P_s << 8s (mod 2^64)  only needs limb-plane sums for
s in [0, 8): higher planes vanish mod 2^64.
"""

from __future__ import annotations

import numpy as np

import concrete_tpu.jax_config  # noqa: F401  (enables x64)
import jax.numpy as jnp

N_LIMBS_U64 = 8


def u64_to_balanced_i8(x, num_limbs: int = N_LIMBS_U64):
    """Split u64 values into `num_limbs` balanced base-256 limbs (int8).

    Works on numpy or jax arrays; returns limbs stacked on a new trailing axis.
    Exact: sum_j limb_j * 2^(8j) == x (mod 2^64) when num_limbs == 8.
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    v = x.astype(xp.uint64)
    limbs = []
    for _ in range(num_limbs):
        d = (v & xp.uint64(0xFF)).astype(xp.int32)
        carry = (d >= 128).astype(xp.uint64)
        d = d - (carry.astype(xp.int32) << 8)
        v = (v >> xp.uint64(8)) + carry
        limbs.append(d.astype(xp.int8))
    return xp.stack(limbs, axis=-1)


def i32_digits_to_balanced_i8(d, num_limbs: int):
    """Split signed int32 digits (|d| <= 2^(8*num_limbs - 1)) into balanced
    base-256 limbs (int8), exactly."""
    xp = jnp if isinstance(d, jnp.ndarray) else np
    # two's-complement view, then same balanced split truncated to num_limbs;
    # the final carry folds into the top limb (values are small enough that
    # the top limb stays in [-128, 127]).
    v = d.astype(xp.int64)
    limbs = []
    for i in range(num_limbs):
        if i < num_limbs - 1:
            lo = (v & xp.int64(0xFF)).astype(xp.int32)
            carry = (lo >= 128).astype(xp.int64)
            lo = lo - (carry.astype(xp.int32) << 8)
            v = (v >> xp.int64(8)) + carry
        else:
            lo = v.astype(xp.int32)  # top limb takes the remainder
        limbs.append(lo.astype(xp.int8))
    return xp.stack(limbs, axis=-1)


def num_digit_limbs(base_log: int) -> int:
    """Limbs needed for balanced gadget digits with |d| <= 2^(base_log-1)."""
    # need 2^(base_log-1) <= 2^(8*A - 1)  =>  A >= base_log / 8, and the
    # +2^(b-1) endpoint forces one extra bit, so use ceil((base_log + 1) / 8)
    return -(-(base_log + 1) // 8)


def recombine_i32_planes_to_u64(planes, axis: int = -1,
                                limb_offset: int = 0):
    """sum_s planes[..., s] << (8 (s + limb_offset))  (mod 2^64).

    `planes` are int32 (sign-extended); the limb axis is `axis`.  Only planes
    with 8*(s + limb_offset) < 64 contribute mod 2^64.
    """
    xp = jnp if isinstance(planes, jnp.ndarray) else np
    planes = xp.moveaxis(planes, axis, -1)
    num = min(planes.shape[-1], N_LIMBS_U64 - limb_offset)
    out = None
    for s in range(num):
        term = (planes[..., s].astype(xp.int64).astype(xp.uint64)
                << xp.uint64(8 * (s + limb_offset)))
        out = term if out is None else out + term
    return out
