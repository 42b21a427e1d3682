"""GLWE polynomial-limb sharding: the NTT external product over a device
mesh, with all-to-all exchanges between the four-step NTT's butterfly
stages.

This is the scale-out axis for *latency* (small-batch) workloads, where
batch sharding (parallel/sharding.py) has nothing to split: the polynomial
coefficient axis of every transform is sharded over the mesh's "limb" axis
instead, so the O(N(n1+n2)) MAC work of each NTT — where the blind
rotate's FLOPs live — is divided across chips.

Design (per CRT prime; tensors u32 residues, exact math identical to
core/ntt_tpu.py):

  coefficients (R, n1, n2), sharded on i1 (= contiguous coefficient blocks)
    --all_to_all-->  (R, n1, n2/D) sharded on i2
    stage-1 matmul over i1 (local, MXU)  + twiddle (tw rows pre-sharded)
    --all_to_all-->  (R, n2, n1/D) sharded on k1
    stage-2 matmul over i2 (local, MXU)
  spectrum (R, n1/D, n2) sharded on k1
    pointwise GGSW contraction: BSK spectra are PRE-SHARDED on the same k1
    axis, so the product and the Cin accumulation are fully local
  inverse transform mirrors the exchanges back to i1-sharded coefficients
  Garner/CRT recombination local; one all_gather re-replicates the
  external product for the (tiny) accumulator update.

The accumulator itself stays replicated: at latency-mode batch sizes it is
KBs, and the data-dependent negacyclic rotations that act on it would
otherwise need per-row cross-shard gathers.

Reference parity: the scale-out requirement of SURVEY.md §2.7 / BASELINE's
north star ("sharding GLWE polynomial limbs, exchanging NTT butterfly
stages all-to-all over ICI"); the reference's own distribution (HPX
dataflow, lib/Runtime/DFRuntime.cpp) has no analog of this axis — it is a
TPU-first design.
"""

from __future__ import annotations

import functools

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from concrete_tpu.core import kernels as kn
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.params import CryptoParams

U32 = jnp.uint32
U64 = jnp.uint64

LIMB_AXIS = "limb"


def make_limb_mesh(n_devices: int | None = None,
                   axis_name: str = LIMB_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def _plans_for(params: CryptoParams, primes: tuple):
    return [nt.build_plan(params.polynomial_size, p) for p in primes]


def check_limb_shardable(params: CryptoParams, n_devices: int,
                         primes: tuple = None) -> bool:
    """True when every four-step factor is divisible by the mesh size."""
    if primes is None:
        primes = nt.choose_primes(params)
    plan = nt.build_plan(params.polynomial_size, primes[0])
    return plan.n1 % n_devices == 0 and plan.n2 % n_devices == 0


# ---------------------------------------------------------------------------
# Per-shard transform stages (run inside shard_map)
# ---------------------------------------------------------------------------

def _fwd_local(x3, twf_local, plan, axis):
    """(R, n1/D, n2) i1-sharded residues -> (R, n1/D, n2) k1-sharded
    spectrum, exchanging stage layouts all-to-all over `axis`."""
    # i1-shard -> i2-shard: split lanes (i2), gather limbs (i1)
    y = jax.lax.all_to_all(x3, axis, split_axis=2, concat_axis=1)
    y = jnp.swapaxes(y, -1, -2)                       # (R, n2/D, n1)
    y = nt._matmul_mod(y, plan.dft1, plan)            # (R, n2/D, k1)
    y = nt._mul_mod32(y, twf_local, plan)             # local twiddle rows
    # i2-shard -> k1-shard
    y = jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=1)
    y = jnp.swapaxes(y, -1, -2)                       # (R, n1/D, n2)
    return nt._matmul_mod(y, plan.dft2, plan)         # (R, n1/D, k2)


def _inv_local(z3, twi_local, plan, axis):
    """(R, n1/D, n2) k1-sharded spectrum -> (R, n1/D, n2) i1-sharded
    coefficients (mirror of _fwd_local)."""
    z = nt._matmul_mod(z3, plan.idft2, plan)          # (R, n1/D, i2)
    z = nt._mul_mod32(z, twi_local, plan)
    # k1-shard -> i2-shard
    z = jax.lax.all_to_all(z, axis, split_axis=2, concat_axis=1)
    z = jnp.swapaxes(z, -1, -2)                       # (R, n2/D, n1)
    z = nt._matmul_mod(z, plan.idft1, plan)           # (R, n2/D, i1)
    # i2-shard -> i1-shard
    z = jax.lax.all_to_all(z, axis, split_axis=2, concat_axis=1)
    return jnp.swapaxes(z, -1, -2)                    # (R, n1/D, n2)


def _ext_local(d3, spec5, twf, twi, *, plans, params, axis):
    """Per-device external product body.

    d3:    (B, Cin, n1/D, n2) i32 gadget digits, i1-sharded
    spec5: (primes, Cin, k+1, n1/D, n2) u32 BSK spectra, k1-sharded
    twf:   (primes, n2/D, n1) u32 forward twiddles (rows i2-sharded)
    twi:   (primes, n1/D, n2) u32 inverse twiddles (rows k1-sharded)
    Returns the full (B, k+1, N) u64 external product, replicated.
    """
    b, cin = d3.shape[0], d3.shape[1]
    kp1 = spec5.shape[2]
    n1d, n2 = d3.shape[2], d3.shape[3]
    residues = []
    for pi, plan in enumerate(plans):
        bias = ((1 << 31) // plan.p + 1) * plan.p
        d_res = (d3.astype(jnp.int64) + jnp.int64(bias)).astype(U64)
        d_res = nt._fold(d_res, plan, 1 << 33).astype(U32)
        d_hat = _fwd_local(d_res.reshape(b * cin, n1d, n2),
                           twf[pi], plan, axis)
        d_hat = d_hat.reshape(b, cin, n1d, n2)
        prod = None
        for ci in range(cin):
            term = nt._mul_mod32(d_hat[:, ci, None], spec5[pi, ci], plan)
            prod = term if prod is None else nt._add_mod32(prod, term, plan)
        residues.append(_inv_local(prod.reshape(b * kp1, n1d, n2),
                                   twi[pi], plan, axis))
    out = nt.garner_to_u64(residues, tuple(p.p for p in plans), plans)
    out = out.reshape(b, kp1, n1d, n2)
    # re-replicate: gather the i1 shards back into the full polynomial
    full = jax.lax.all_gather(out, axis, axis=2, tiled=True)
    return full.reshape(b, kp1, n1d * jax.lax.axis_size(axis) * n2)


def _sharded_tables(params: CryptoParams, primes: tuple):
    """Stacked per-prime twiddle tables for the shard_map arguments."""
    plans = _plans_for(params, primes)
    twf = jnp.stack([p.tw_f for p in plans])          # (P, n2, n1)
    twi = jnp.stack([p.tw_i for p in plans])          # (P, n1, n2)
    return plans, twf, twi


def external_product_limb_sharded(mesh: Mesh, digits, bsk_step,
                                  params: CryptoParams, primes: tuple,
                                  axis_name: str = LIMB_AXIS):
    """One CMUX external product with the polynomial axis sharded.

    digits: (B, Cin, N) i32; bsk_step: (primes, Cin, k+1, N) u32 spectra
    (one blind-rotate step).  Returns (B, k+1, N) u64, bit-identical to
    ntt_tpu.external_product_ntt.
    """
    plans, twf, twi = _sharded_tables(params, primes)
    plan0 = plans[0]
    n1, n2 = plan0.n1, plan0.n2
    b, cin, n = digits.shape
    kp1 = bsk_step.shape[2]
    d3 = digits.reshape(b, cin, n1, n2)
    spec5 = bsk_step.reshape(bsk_step.shape[0], cin, kp1, n1, n2)
    fn = jax.shard_map(
        functools.partial(_ext_local, plans=plans, params=params,
                          axis=axis_name),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None),
                  P(None, None, None, axis_name, None),
                  P(None, axis_name, None),
                  P(None, axis_name, None)),
        out_specs=P(),
        # the all_gather at the end of _ext_local replicates the
        # result; the static VMA check cannot see through it
        check_vma=False)
    return fn(d3, spec5, twf, twi)


def blind_rotate_limb_sharded(mesh: Mesh, ct_small, bsk: nt.NttBSK,
                              lut_poly, params: CryptoParams,
                              axis_name: str = LIMB_AXIS):
    """Batched blind rotation with the limb-sharded external product:
    (B, n+1) u64 + (N,) LUT -> accumulator (B, k+1, N) u64.  Bit-identical
    to kernels.blind_rotate / ntt_tpu.blind_rotate_ntt."""
    b_ct = ct_small.shape[0]
    n = params.polynomial_size
    k = params.glwe_dimension
    l = params.pbs_level
    cin = l * (k + 1)
    plans, twf, twi = _sharded_tables(params, bsk.primes)
    plan0 = plans[0]
    n1, n2 = plan0.n1, plan0.n2
    n_primes = len(bsk.primes)

    switched = kn.modulus_switch(ct_small, params.log2_polynomial_size)
    a_t = switched[:, :-1]
    b_t = switched[:, -1]
    body0 = kn._lut_rows(lut_poly, b_ct, n)
    body0 = kn.monomial_mul_rolls(body0, (2 * n - b_t) % (2 * n))
    acc0 = jnp.zeros((b_ct, k + 1, n), dtype=U64).at[:, k, :].set(
        body0[:, 0, :])
    spectra_steps = jnp.moveaxis(bsk.spectra, 1, 0)   # (n_small, primes, ..)

    ext_fn = jax.shard_map(
        functools.partial(_ext_local, plans=plans, params=params,
                          axis=axis_name),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None),
                  P(None, None, None, axis_name, None),
                  P(None, axis_name, None),
                  P(None, axis_name, None)),
        out_specs=P(),
        # the all_gather at the end of _ext_local replicates the
        # result; the static VMA check cannot see through it
        check_vma=False)

    def step(acc, xs):
        a_j, spec_j = xs
        rot = kn.monomial_mul_rolls(acc, a_j)
        diff = rot - acc
        digits = kn.decompose(diff, params.pbs_base_log, l)
        d = jnp.transpose(digits, (0, 3, 1, 2)).reshape(b_ct, cin, n)
        ext = ext_fn(d.reshape(b_ct, cin, n1, n2),
                     spec_j.reshape(n_primes, cin, k + 1, n1, n2),
                     twf, twi)
        return acc + ext, None

    acc, _ = jax.lax.scan(step, acc0, (a_t.T, spectra_steps))
    return acc


def pbs_batch_limb_sharded(mesh: Mesh, ct_big, ksk: kn.LimbKSK,
                           bsk: nt.NttBSK, lut_poly,
                           params: CryptoParams, message_bits: int,
                           signed: bool = False,
                           axis_name: str = LIMB_AXIS):
    """Full PBS (keyswitch + limb-sharded blind rotate + sample extract),
    bit-identical to kernels.pbs_batch with an NTT BSK.  Latency-oriented:
    use for small batches on a multi-chip mesh; for large batches prefer
    batch sharding (parallel/sharding.py)."""
    if signed:
        offset = U64((1 << (message_bits - 1))
                     << (params.q_log - message_bits - 1))
        ct_big = ct_big.at[:, -1].add(offset)
    ct_small = kn.keyswitch(ct_big, ksk)
    acc = blind_rotate_limb_sharded(mesh, ct_small, bsk, lut_poly, params,
                                    axis_name=axis_name)
    return kn.sample_extract(acc)
