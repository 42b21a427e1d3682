"""Micro-benchmark the Garner/CRT recombination variants on hardware.

Round-4 ablation: garner is ~45% of the fused N=4096 step (5.3 of
11.7 ms).  This probes the recombination alone — grid of (16, 4096) cells
like the real kernel — for the shipped mixed-radix form and cheaper
reformulations, checking bit-exactness against numpy and printing
ms/cell-equivalent so wins translate directly to step time.

python tools/probe_garner.py [cells]
"""
import functools
import sys
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.ops import pallas_ntt as pn
from concrete_tpu.ops.pallas_ntt import (_garner_value, _lt_u32, _mul_pair,
                                         _shr16)

U32 = jnp.uint32
_I0 = np.int32(0)

CELLS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
R, N = 16, 4096
PRIMES = tuple(nt.ntt_primes_near_pow2(N, 128)[:3])
PNEG = tuple((-pow(p, -1, 1 << 32)) % (1 << 32) for p in PRIMES)


def _shoup_pair_const(val: int, p: int):
    return int(val % p), int(((val % p) << 32) // p)


def _shoup_mul_const(a, c_val: int, c_sh: int, p: int):
    hi, _lo = _mul_pair(a, U32(c_sh))
    r = a * U32(c_val) - hi * U32(p)
    return r - U32(p) * (~_lt_u32(r, U32(p))).astype(U32)


# --- variant 1: shipped mixed-radix (_garner_value) ------------------------

def _k_ship(r0, r1, r2, lo_ref, hi_ref):
    hi, lo = _garner_value(PRIMES, PNEG, [r0[...], r1[...], r2[...]])
    lo_ref[...] = lo
    hi_ref[...] = hi


# --- variant 2: mixed-radix with Shoup constant multiplies -----------------

@functools.lru_cache(maxsize=None)
def _shoup_tables():
    inv = {}
    for j in range(1, 3):
        for i in range(j):
            inv[(i, j)] = _shoup_pair_const(
                pow(PRIMES[i], -1, PRIMES[j]), PRIMES[j])
    total = PRIMES[0] * PRIMES[1] * PRIMES[2]
    half = (total - 1) // 2
    h_digits = []
    rem = half
    for p in PRIMES:
        h_digits.append(int(rem % p))
        rem //= p
    t64 = total % (1 << 64)
    return inv, tuple(h_digits), (t64 >> 32, t64 & 0xFFFFFFFF)


def _pair_mul_const(hi, lo, c: int):
    mh, ml = _mul_pair(lo, U32(c))
    return hi * U32(c) + mh, ml


def _garner_shoup(res):
    inv, h_digits, (t_hi, t_lo) = _shoup_tables()
    digits = [res[0]]
    for j in range(1, 3):
        p_j = PRIMES[j]
        t = res[j]
        for i in range(j):
            gi = digits[i]
            gi = gi - U32(p_j) * (~_lt_u32(gi, U32(p_j))).astype(U32)
            d = t - gi
            t = d + U32(p_j) * _lt_u32(t, gi).astype(U32)
            cv, cs = inv[(i, j)]
            t = _shoup_mul_const(t, cv, cs, p_j)
        digits.append(t)
    v_hi = jnp.zeros_like(digits[-1])
    v_lo = digits[-1]
    for j in (1, 0):
        v_hi, v_lo = _pair_mul_const(v_hi, v_lo, PRIMES[j])
        s = v_lo + digits[j]
        v_hi = v_hi + _lt_u32(s, v_lo).astype(U32)
        v_lo = s
    gt = None
    for j in range(3):
        h = U32(h_digits[j])
        gt_j = _lt_u32(h, digits[j])
        eq_j = digits[j] == h
        gt = gt_j if gt is None else gt_j | (eq_j & gt)
    g = gt.astype(U32)
    s = v_lo - U32(t_lo) * g
    borrow = _lt_u32(v_lo, s).astype(U32)
    return v_hi - U32(t_hi) * g - borrow, s


def _k_shoup(r0, r1, r2, lo_ref, hi_ref):
    hi, lo = _garner_shoup([r0[...], r1[...], r2[...]])
    lo_ref[...] = lo
    hi_ref[...] = hi


# --- variant 3: explicit-CRT with a shift-free exact overshoot -------------
#
# w = (z + H) mod P (H = (P-1)/2, so w is the UNSIGNED representative and
# z mod 2^64 = w64 - H64 without any compare chain) reconstructed as
#   w = sum_i c_i * M_i - k * P,   c_i = (r_i + H) * M_i^{-1} mod p_i,
# with M_i = P / p_i.  k = floor(sum c_i / p_i) in {0, 1, 2}; since the
# primes are 2^31 - a_i with a_i < 2^19 and any accepted configuration has
# |z| <= P/4 (choose_fused_primes' +2 guard bits), sum c_i / p_i is at
# least 1/4 away from every integer while the estimate
#   (sum_i (c_i >> 1)) >> 30
# errs by < 3 * (a_i / 2^31 + 2^-31) < 2^-11 — so the 6-op estimate is
# EXACT.  No digit chain, no compares, and the three c_i are mutually
# independent (ILP) where mixed-radix digits serialize.

@functools.lru_cache(maxsize=None)
def _idem_tables():
    P_ = PRIMES[0] * PRIMES[1] * PRIMES[2]
    H = (P_ - 1) // 2
    inv = []
    m64 = []
    for p in PRIMES:
        assert (1 << 31) - p < (1 << 28), "k-estimate bound needs 2^31-ish"
        M = P_ // p
        inv.append(_shoup_pair_const(pow(M % p, -1, p), p))
        m64.append((int((M >> 32) % (1 << 32)), int(M % (1 << 32))))
    h_mod = [int(H % p) for p in PRIMES]
    p64 = (int((P_ >> 32) % (1 << 32)), int(P_ % (1 << 32)))
    h64 = (int((H >> 32) % (1 << 32)), int(H % (1 << 32)))
    return tuple(inv), tuple(h_mod), tuple(m64), p64, h64


def _addc(lo_a, hi_a, lo_b, hi_b):
    lo = lo_a + lo_b
    carry = _lt_u32(lo, lo_b).astype(U32)
    return lo, hi_a + hi_b + carry


def _subc_pair(lo_a, hi_a, lo_b, hi_b):
    lo = lo_a - lo_b
    borrow = _lt_u32(lo_a, lo).astype(U32)
    return lo, hi_a - hi_b - borrow


def _garner_idem(res):
    inv, h_mod, m64, p64, h64 = _idem_tables()
    # c_i = (r_i + H) * M_i^{-1} mod p_i  (independent chains, ILP)
    cs = []
    for i, p in enumerate(PRIMES):
        s = res[i] + U32(h_mod[i])
        s = s - U32(p) * (~_lt_u32(s, U32(p))).astype(U32)
        cs.append(_shoup_mul_const(s, inv[i][0], inv[i][1], p))
    # k = floor(sum c_i / p_i), exact via the near-2^31 estimate
    k = ((cs[0] >> U32(1)) + (cs[1] >> U32(1))
         + (cs[2] >> U32(1))) >> U32(30)
    # w64 = sum c_i * M_i - k * P (mod 2^64); z64 = w64 - H64
    lo = jnp.zeros_like(res[0])
    hi = jnp.zeros_like(res[0])
    for i in range(3):
        mh_c, ml_c = m64[i]
        mh, ml = _mul_pair(cs[i], U32(ml_c))
        mh = mh + cs[i] * U32(mh_c)
        lo, hi = _addc(lo, hi, ml, mh)
    kh = k * U32(p64[0])
    klo_hi, klo_lo = _mul_pair(k, U32(p64[1]))
    lo, hi = _subc_pair(lo, hi, klo_lo, kh + klo_hi)
    return _subc_pair(lo, hi, U32(h64[1]), U32(h64[0]))


def _k_idem(r0, r1, r2, lo_ref, hi_ref):
    lo, hi = _garner_idem([r0[...], r1[...], r2[...]])
    lo_ref[...] = lo
    hi_ref[...] = hi


def run(name, kernel, res, iters=3):
    cells = res[0].shape[0] // R

    def call(*rs):
        spec = pl.BlockSpec((R, N), lambda i: (i, _I0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(cells,),
            in_specs=[spec] * 3, out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct(rs[0].shape, U32),) * 2,
            interpret=jax.devices()[0].platform == "cpu",
        )(*rs)

    f = jax.jit(call)
    out = f(*res)
    int(np.asarray(out[0][0, 0]))
    t0 = time.time()
    for _ in range(iters):
        out = f(*res)
        int(np.asarray(out[0][0, 0]))
    dt = (time.time() - t0) / iters
    print(f"{name:10s} {dt * 1e3:8.3f} ms for {cells} cells "
          f"-> {dt / cells * 1e6:7.2f} us/cell", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # residues of a random |z| < P/4 value (like real external products)
    P_ = PRIMES[0] * PRIMES[1] * PRIMES[2]
    z = rng.integers(-(1 << 62), 1 << 62, (CELLS * R, N)).astype(object)
    # adversarial edge: the exact-k estimate's worst case is |z| -> P/4
    # (choose_fused_primes' guard keeps accepted configs under this)
    edge = [(P_ >> 2) - 1, -(P_ >> 2), (P_ >> 2) - 12345,
            -((P_ >> 2) - 7), 1, -1, 0, (P_ >> 3) * 2 - 3]
    z[0, :len(edge)] = edge
    res = [jnp.asarray((np.vectorize(int)(z) % p).astype(np.uint32))
           for p in PRIMES]
    want = np.vectorize(lambda v: int(v) % (1 << 64),
                        otypes=[object])(z)
    want_lo = (want % (1 << 32)).astype(np.int64).astype(np.uint32)
    want_hi = (want >> 32).astype(np.int64).astype(np.uint32)

    for name, kern in [("shipped", _k_ship), ("shoup", _k_shoup),
                       ("idem", _k_idem)]:
        lo, hi = run(name, kern, res)
        ok = (np.array_equal(np.asarray(lo), want_lo)
              and np.array_equal(np.asarray(hi), want_hi))
        print(f"{name:10s} {'BIT-EXACT' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
