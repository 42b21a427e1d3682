"""Batched JAX WoP-PBS kernels — the TPU path for large-precision TLUs.

Bit-exact against the numpy oracle in ``core/wop.py`` (tests/test_wop_kernels
enforces it).  Same pipeline as the oracle / reference
(compiler/lib/Runtime/wrappers.cpp:855-998, concrete-cpu wop_pbs.rs):

  extract_bits -> circuit bootstrap (sign-PBS + PFPKSK) -> vertical packing

Batched-TPU design decisions:

- All sign-PBS calls of the circuit bootstrap (nb_bits x cbs_level) are
  flattened into ONE keyswitch + blind-rotate batch with per-row LUT
  polynomials: the MXU sees a single large banded-matmul scan instead of
  nb*l small ones.
- The PFPKSK application is one int8 limb matmul per digit limb:
  (B, (n_big+1)*l) @ ((n_big+1)*l, (k+1)^2*N*8) with the key packed once
  into balanced limb planes (``pack_pfpksk``), mirroring how kernels.py
  packs the KSK.
- External products with *runtime* GGSWs (circuit-bootstrap outputs) cannot
  use the pre-packed Toeplitz band trick of the main path, so they run as a
  grouped exact limb convolution with per-batch filters
  (``lax.conv_general_dilated`` with ``batch_group_count``).  The CMUX tree
  over LUT chunks folds its pair axis into the conv batch for utilization.
  (The CRT-NTT path replaces this convolution on TPU; see core/ntt.py.)

Shapes: B = batch, nb = extracted bits, n_big = big LWE dim, k = GLWE dim,
N = poly size, l = gadget levels (cbs or pfks by context).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from concrete_tpu.core import kernels as kn
from concrete_tpu.core import limbs as lb
from concrete_tpu.core.wop import WopParams
from concrete_tpu.params import CryptoParams

U64 = jnp.uint64
_Q_LOG = 64


# ---------------------------------------------------------------------------
# Key packing
# ---------------------------------------------------------------------------

@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["planes"],
                   meta_fields=["base_log", "levels", "glwe_dimension",
                                "polynomial_size"])
@dataclasses.dataclass(frozen=True)
class LimbPFPKSK:
    """PFPKSK packed for the MXU: ((n_big+1)*l, (k+1)*(k+1)*N*8) int8.

    Row index = i * l + j (input digit i, level j); column index =
    ((r * (k+1) + c) * N + t) * 8 + s for output row r, GLWE component c,
    coefficient t, limb s.
    """
    planes: jnp.ndarray
    base_log: int
    levels: int
    glwe_dimension: int
    polynomial_size: int


def pack_pfpksk(pfpksk_u64: np.ndarray, wp: WopParams) -> LimbPFPKSK:
    """Pack the (k+1, n_big+1, l, k+1, N) u64 PFPKSK into int8 limb planes."""
    kp1, n_in, l, kp1_, n = pfpksk_u64.shape
    # -> (n_big+1, l, r, c, N, 8) balanced limbs
    limbs = lb.u64_to_balanced_i8(np.asarray(pfpksk_u64))
    limbs = np.moveaxis(limbs, 0, 2)                 # (n_in, l, r, c, N, 8)
    planes = limbs.reshape(n_in * l, kp1 * kp1 * n * 8)
    return LimbPFPKSK(planes=jnp.asarray(planes), base_log=wp.pfks_base_log,
                      levels=wp.pfks_level, glwe_dimension=kp1 - 1,
                      polynomial_size=n)


def private_packing_keyswitch_batch(lwe_ct, pfpksk: LimbPFPKSK):
    """Batched PFPKSK: (B, n_big+1) u64 -> (B, k+1, k+1, N) u64.

    Applies all k+1 per-row keys at once: out[b, r] is the GLWE of the input
    message multiplied by the key's secret function v_r (oracle:
    wop.private_packing_keyswitch per r).
    """
    b_ct = lwe_ct.shape[0]
    kp1 = pfpksk.glwe_dimension + 1
    n = pfpksk.polynomial_size
    digits = kn.decompose(lwe_ct, pfpksk.base_log, pfpksk.levels)
    a_limbs_n = lb.num_digit_limbs(pfpksk.base_log)
    d_limbs = lb.i32_digits_to_balanced_i8(digits, a_limbs_n)
    d_limbs = d_limbs.reshape(b_ct, -1, a_limbs_n)   # (B, n_in*l, A)
    planes = jnp.zeros((b_ct, kp1 * kp1 * n, 8 + a_limbs_n - 1),
                       dtype=jnp.int32)
    for a in range(a_limbs_n):
        prod = jnp.matmul(d_limbs[:, :, a].astype(jnp.int8), pfpksk.planes,
                          preferred_element_type=jnp.int32)
        planes = planes.at[:, :, a:a + 8].add(
            prod.reshape(b_ct, kp1 * kp1 * n, 8))
    out = lb.recombine_i32_planes_to_u64(planes[:, :, :8])
    return out.reshape(b_ct, kp1, kp1, n)


# ---------------------------------------------------------------------------
# Runtime-weight exact negacyclic product (grouped limb convolution)
# ---------------------------------------------------------------------------

def negacyclic_conv_runtime(d_digits, w_u64, a_limbs_n: int = 2):
    """Exact  out[b, co] = sum_ci  d[b, ci] (*) w[b, ci, co]  (mod 2^64).

    d_digits: (B, Cin, N) int32 gadget digits.
    w_u64:    (B, Cin, Cout, N) u64 runtime weights (GGSW rows).
    digit_limbs: int8 limbs needed for the digits
                 (lb.num_digit_limbs(base_log); 2 covers base_log <= 15).
    Returns   (B, Cout, N) u64.

    Grouped convolution with per-batch filters: lhs channels = Cin, spatial
    = (limb, N); ``batch_group_count=B`` gives every batch element its own
    filter bank.  Limb planes recombine exactly mod 2^64.
    """
    b_ct, cin, n = d_digits.shape
    cout = w_u64.shape[2]
    d_limbs = lb.i32_digits_to_balanced_i8(d_digits, a_limbs_n)
    lhs = jnp.moveaxis(d_limbs, -1, 2)               # (B, Cin, A, N)
    w_limbs = lb.u64_to_balanced_i8(w_u64)           # (B, Cin, Cout, N, 8)
    # filters: (B*Cout*8, Cin, 1, N) flipped on N for true convolution
    filt = jnp.transpose(w_limbs, (0, 2, 4, 1, 3))   # (B, Cout, 8, Cin, N)
    filt = filt.reshape(b_ct * cout * 8, cin, 1, n)[..., ::-1]
    out = lax.conv_general_dilated(
        lhs.astype(jnp.int32), filt.astype(jnp.int32),
        window_strides=(1, 1),
        padding=((0, 0), (n - 1, n - 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        batch_group_count=b_ct,
        preferred_element_type=jnp.int32,
    )                                                # (1, B*Cout*8, A, 2N-1)
    out = out.reshape(b_ct, cout, 8, a_limbs_n, 2 * n - 1)
    # fold limb axes: plane s+a carries limb product (s, a)
    planes = jnp.zeros((b_ct, cout, 8 + a_limbs_n - 1, 2 * n - 1),
                      dtype=jnp.int32)
    for a in range(a_limbs_n):
        planes = planes.at[:, :, a:a + 8, :].add(out[:, :, :, a, :])
    # negacyclic fold on the coefficient axis
    hi = jnp.pad(planes[..., n:], ((0, 0), (0, 0), (0, 0), (0, 1)))
    planes = planes[..., :n] - hi
    return lb.recombine_i32_planes_to_u64(planes[:, :, :8, :], axis=2)


def external_product_batch(ggsw, glwe, base_log: int, levels: int):
    """Batched GGSW (.) GLWE: ggsw (B, l, k+1, k+1, N), glwe (B, k+1, N)."""
    b_ct, l, kp1, _, n = ggsw.shape
    digits = kn.decompose(glwe, base_log, levels)    # (B, k+1, N, l)
    # Cin = j * (k+1) + r  (level-major to match ggsw[j, r])
    d = jnp.transpose(digits, (0, 3, 1, 2)).reshape(b_ct, l * kp1, n)
    w = ggsw.reshape(b_ct, l * kp1, kp1, n)
    return negacyclic_conv_runtime(d, w,
                                   a_limbs_n=lb.num_digit_limbs(base_log))


def cmux_batch(ggsw, ct0, ct1, base_log: int, levels: int):
    """ct0 + GGSW (.) (ct1 - ct0), batched."""
    return ct0 + external_product_batch(ggsw, ct1 - ct0, base_log, levels)


# ---------------------------------------------------------------------------
# Sign-PBS (batched, per-row output scales)
# ---------------------------------------------------------------------------

def sign_pbs_batch(lwe_big, ksk: kn.LimbKSK, bsk: kn.LimbBSK,
                   params: CryptoParams, out_scale_logs):
    """Batched bit-cleaning bootstrap: rows encrypt bit*2^63 (+ noise); the
    output encrypts bit * 2^out_scale_logs[row] exactly.

    Oracle: wop._sign_pbs (quarter-torus centering, constant test poly
    -2^(out-1), plaintext half added back).
    """
    b_ct = lwe_big.shape[0]
    n = params.polynomial_size
    scales = jnp.asarray(out_scale_logs, dtype=jnp.uint64)
    halves = (U64(1) << scales) >> U64(1)            # (B,) 2^(out-1)
    ct = jnp.asarray(lwe_big, dtype=U64)
    ct = ct.at[:, -1].add(U64(1) << U64(62))
    ct_small = kn.keyswitch(ct, ksk)
    test_polys = jnp.broadcast_to(
        (U64(0) - halves)[:, None], (b_ct, n))       # (B, N) constant rows
    acc = kn.blind_rotate(ct_small, bsk, test_polys, params)
    out = kn.sample_extract(acc, 0)
    return out.at[:, -1].add(halves)


# ---------------------------------------------------------------------------
# 1. Bit extraction (batched over ciphertexts)
# ---------------------------------------------------------------------------

def extract_bits_batch(lwe_big, nb_bits: int, delta_log: int,
                       ksk: kn.LimbKSK, bsk: kn.LimbBSK,
                       params: CryptoParams):
    """(B, n_big+1) -> (B, nb_bits, n_big+1), row 0 = MSB (packing order).

    LSB-first peel, two fused sign-PBS rows per bit (output scale 63 for the
    packing copy, scale pos for the cleaning copy) except the last.
    """
    b_ct, width = lwe_big.shape
    acc = jnp.asarray(lwe_big, dtype=U64)
    out = jnp.zeros((b_ct, nb_bits, width), dtype=U64)
    for i in range(nb_bits):
        pos = delta_log + i
        shift = U64(_Q_LOG - 1 - pos)
        shifted = acc * (U64(1) << shift)
        if i < nb_bits - 1:
            both = sign_pbs_batch(
                jnp.concatenate([shifted, shifted], axis=0), ksk, bsk,
                params, jnp.concatenate([
                    jnp.full((b_ct,), 63, dtype=jnp.uint64),
                    jnp.full((b_ct,), pos, dtype=jnp.uint64)]))
            out = out.at[:, nb_bits - 1 - i, :].set(both[:b_ct])
            acc = acc - both[b_ct:]
        else:
            bit = sign_pbs_batch(shifted, ksk, bsk, params,
                                 jnp.full((b_ct,), 63, dtype=jnp.uint64))
            out = out.at[:, nb_bits - 1 - i, :].set(bit)
    return out


def extract_bits_to(lwe_big, positions, out_scale_logs, delta_log: int,
                    ksk: kn.LimbKSK, bsk: kn.LimbBSK, params: CryptoParams):
    """Cheap bit extraction: peel LSB-first, emit requested bits re-encoded.

    positions: ascending message-relative bit indices; out_scale_logs[j] is
    the torus scale of returned bit j (e.g. 63 - p_out + j to reassemble an
    integer at width p_out by summing the outputs).  Returns
    (B, len(positions), n_big+1).

    Cost: one sign-PBS per peeled bit for cleaning plus one per requested
    bit (shared when the requested scale equals the peel scale) — the
    lsb-cascade analog of the reference's fhe.bits lowering
    (mlir/context.py:2423 extract_bits), replacing one full-width TLU per
    bit.
    """
    b_ct, width = lwe_big.shape
    acc = jnp.asarray(lwe_big, dtype=U64)
    positions = tuple(int(p) for p in positions)
    out_of = {p: i for i, p in enumerate(positions)}
    outs: dict[int, jnp.ndarray] = {}
    max_bit = max(positions)
    for i in range(max_bit + 1):
        pos = delta_log + i
        shifted = acc * (U64(1) << U64(_Q_LOG - 1 - pos))
        want = i in out_of
        out_scale = int(out_scale_logs[out_of[i]]) if want else None
        need_clean = i < max_bit
        if want and need_clean and out_scale == pos:
            both = sign_pbs_batch(shifted, ksk, bsk, params,
                                  jnp.full((b_ct,), pos, dtype=jnp.uint64))
            outs[i] = both
            acc = acc - both
            continue
        rows, scales, tags = [], [], []
        if want:
            rows.append(shifted)
            scales.append(jnp.full((b_ct,), out_scale, dtype=jnp.uint64))
            tags.append("out")
        if need_clean:
            rows.append(shifted)
            scales.append(jnp.full((b_ct,), pos, dtype=jnp.uint64))
            tags.append("clean")
        if not rows:
            continue
        res = sign_pbs_batch(jnp.concatenate(rows, axis=0), ksk, bsk,
                             params, jnp.concatenate(scales))
        chunks = [res[j * b_ct:(j + 1) * b_ct] for j in range(len(tags))]
        for tag, chunk in zip(tags, chunks):
            if tag == "out":
                outs[i] = chunk
            else:
                acc = acc - chunk
    return jnp.stack([outs[p] for p in positions], axis=1)


# ---------------------------------------------------------------------------
# 2. Circuit bootstrap (all bits x levels in one PBS batch)
# ---------------------------------------------------------------------------

def circuit_bootstrap_batch(bit_lwes, ksk: kn.LimbKSK, bsk: kn.LimbBSK,
                            pfpksk: LimbPFPKSK, wp: WopParams):
    """(B, nb, n_big+1) bit ciphertexts -> (B, nb, l_cbs, k+1, k+1, N) GGSWs.

    One sign-PBS batch of B*nb*l rows (per-row scale 2^(64-(j+1)*base)),
    then one PFPKSK matmul batch over all rows.
    """
    params = wp.base
    b_ct, nb, width = bit_lwes.shape
    l, base = wp.cbs_level, wp.cbs_base_log
    kp1 = params.glwe_dimension + 1
    n = params.polynomial_size
    rows = jnp.broadcast_to(bit_lwes[:, :, None, :],
                            (b_ct, nb, l, width)).reshape(-1, width)
    scales = jnp.broadcast_to(
        jnp.array([_Q_LOG - (j + 1) * base for j in range(l)],
                  dtype=jnp.uint64)[None, None, :],
        (b_ct, nb, l)).reshape(-1)
    lev = sign_pbs_batch(rows, ksk, bsk, params, scales)   # (B*nb*l, n_big+1)
    glwes = private_packing_keyswitch_batch(lev, pfpksk)   # (.., k+1, k+1, N)
    return glwes.reshape(b_ct, nb, l, kp1, kp1, n)


# ---------------------------------------------------------------------------
# 3. Vertical packing (CMUX tree + GGSW blind rotation)
# ---------------------------------------------------------------------------

def vertical_packing_batch(lut_torus, ggsw_bits, wp: WopParams):
    """lut u64: (2^nb,) shared across the batch, or (B, 2^nb) per-element
    tables (the apply_multi_lookup_table path); ggsw_bits
    (B, nb, l, k+1, k+1, N) MSB-first.

    Tree CMUXes fold the chunk-pair axis into the conv batch; the rotation
    phase runs log2(N)-ish sequential batched CMUXes.  Returns the extracted
    (B, n_big+1) LWE of lut[m].
    """
    params = wp.base
    n = params.polynomial_size
    k = params.glwe_dimension
    l, base = wp.cbs_level, wp.cbs_base_log
    b_ct, nb = ggsw_bits.shape[:2]
    lut = jnp.asarray(lut_torus, dtype=U64)
    if lut.ndim == 1:
        lut = jnp.broadcast_to(lut[None], (b_ct, lut.shape[0]))
    n_in_chunk = min(nb, int(np.log2(n)))
    n_tree = nb - n_in_chunk

    chunks = lut.reshape(b_ct, 1 << n_tree, -1)
    if chunks.shape[2] < n:
        chunks = jnp.pad(chunks, ((0, 0), (0, 0), (0, n - chunks.shape[2])))
    # layer: (B, L, k+1, N) trivial GLWEs (mask zeros, body = chunk)
    n_chunks = 1 << n_tree
    layer = jnp.zeros((b_ct, n_chunks, k + 1, n), dtype=U64)
    layer = layer.at[:, :, k, :].set(chunks)

    for t in range(n_tree):
        half = layer.shape[1] // 2
        ct0 = layer[:, 0::2]                         # (B, half, k+1, N)
        ct1 = layer[:, 1::2]
        bit = ggsw_bits[:, n_tree - 1 - t]           # (B, l, k+1, k+1, N)
        bit_rep = jnp.broadcast_to(
            bit[:, None], (b_ct, half) + bit.shape[1:]).reshape(
                (b_ct * half,) + bit.shape[1:])
        merged = cmux_batch(
            bit_rep,
            ct0.reshape(b_ct * half, k + 1, n),
            ct1.reshape(b_ct * half, k + 1, n), base, l)
        layer = merged.reshape(b_ct, half, k + 1, n)
    acc = layer[:, 0]                                # (B, k+1, N)

    for t in range(n_in_chunk):
        bit = ggsw_bits[:, nb - 1 - t]
        r = jnp.full((b_ct,), 2 * n - (1 << t), dtype=jnp.int32)
        rotated = kn.monomial_mul_rolls(acc, r)
        acc = cmux_batch(bit, acc, rotated, base, l)
    return kn.sample_extract(acc, 0)


# ---------------------------------------------------------------------------
# Full batched WoP-PBS
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("moduli", "wp"))
def wop_pbs_crt_batch(res_cts, luts, moduli: tuple, ksk: kn.LimbKSK,
                      bsk: kn.LimbBSK, pfpksk: LimbPFPKSK, wp: WopParams):
    """Batched CRT TLU: (n_blocks, B, n_big+1) residue ciphertexts ->
    (n_blocks, B, n_big+1) output residues (native encoding).

    luts: (n_blocks, 2^total_bits) raw integer tables (wop.crt_lut_tables).
    One shared bit extraction + circuit bootstrap feeds one vertical
    packing per output block — the batched analog of
    memref_wop_pbs_crt_buffer (wrappers.cpp:855-998); oracle:
    wop.wop_pbs_crt.
    """
    from concrete_tpu.core.wop import crt_block_bits
    bits = crt_block_bits(moduli)
    # block n-1 first = MSB of the combined vertical-packing index
    chunks = []
    for j in reversed(range(len(moduli))):
        delta_log = _Q_LOG - bits[j] - 1
        chunks.append(extract_bits_batch(res_cts[j], bits[j], delta_log,
                                         ksk, bsk, wp.base))
    bit_stack = jnp.concatenate(chunks, axis=1)    # (B, total, n_big+1)
    ggsws = circuit_bootstrap_batch(bit_stack, ksk, bsk, pfpksk, wp)
    outs = []
    for j in range(len(moduli)):
        out_bits_j = bits[j]
        lut_torus = ((jnp.asarray(luts[j], dtype=U64)
                      & U64((1 << (out_bits_j + 1)) - 1))
                     << U64(_Q_LOG - out_bits_j - 1))
        outs.append(vertical_packing_batch(lut_torus, ggsws, wp))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("nb_bits", "delta_log",
                                             "out_bits", "wp"))
def wop_pbs_batch(lwe_big, lut, nb_bits: int, delta_log: int, out_bits: int,
                  ksk: kn.LimbKSK, bsk: kn.LimbBSK, pfpksk: LimbPFPKSK,
                  wp: WopParams):
    """Batched large-precision TLU: (B, n_big+1) u64 -> (B, n_big+1) u64.

    `lut` holds raw integer entries — (2^nb_bits,) shared, or
    (B, 2^nb_bits) per-element tables; output encoded at out_bits.
    Oracle: wop.wop_pbs.
    """
    bits = extract_bits_batch(lwe_big, nb_bits, delta_log, ksk, bsk, wp.base)
    lut_torus = ((jnp.asarray(lut, dtype=U64)
                  & U64((1 << (out_bits + 1)) - 1))
                 << U64(_Q_LOG - out_bits - 1))
    return _cbs_vp_chunked(bits, lut_torus, ksk, bsk, pfpksk, wp)


def _cbs_vp_chunked(bits, lut_torus, ksk, bsk, pfpksk, wp: WopParams):
    """Circuit bootstrap + vertical packing, chunked over the batch.

    The per-element GGSW stack is nb * cbs_level * (k+1)^2 * N u64 plus
    several times that in limb/product intermediates — a 12-bit TLU at
    the only feasible monolithic-WoP parameters (N=16384, cbs_level 8)
    costs ~1 GB per batch element live, and an unchunked B=64 run was
    OOM-killed at 107 GB host RSS (the reason wop_tlu_12bit was never
    captured in rounds 3-5).  lax.map over fixed-size chunks caps live
    memory at one chunk with a single compiled body.

    CONCRETE_TPU_WOP_CHUNK_MB bounds the modeled per-chunk GGSW bytes
    (default 1024; intermediates are ~6x that model)."""
    import os
    b_ct, nb = bits.shape[:2]
    params = wp.base
    kp1 = params.glwe_dimension + 1
    per_elem = nb * wp.cbs_level * kp1 * kp1 * params.polynomial_size * 8
    budget = int(os.environ.get("CONCRETE_TPU_WOP_CHUNK_MB", "1024")) << 20
    cs = max(1, budget // max(per_elem, 1))
    per_lut = lut_torus.ndim == 2
    if cs >= b_ct:
        ggsws = circuit_bootstrap_batch(bits, ksk, bsk, pfpksk, wp)
        return vertical_packing_batch(lut_torus, ggsws, wp)
    n_chunks = -(-b_ct // cs)
    pad = n_chunks * cs - b_ct
    bits_p = jnp.pad(bits, ((0, pad),) + ((0, 0),) * (bits.ndim - 1))
    bits_c = bits_p.reshape((n_chunks, cs) + bits.shape[1:])
    if per_lut:
        lut_p = jnp.pad(lut_torus, ((0, pad), (0, 0)))
        lut_c = lut_p.reshape(n_chunks, cs, lut_torus.shape[1])

        def body(args):
            b, lt = args
            ggsws = circuit_bootstrap_batch(b, ksk, bsk, pfpksk, wp)
            return vertical_packing_batch(lt, ggsws, wp)

        out = jax.lax.map(body, (bits_c, lut_c))
    else:
        def body(b):
            ggsws = circuit_bootstrap_batch(b, ksk, bsk, pfpksk, wp)
            return vertical_packing_batch(lut_torus, ggsws, wp)

        out = jax.lax.map(body, bits_c)
    return out.reshape(n_chunks * cs, -1)[:b_ct]
