// TFHE crypto primitives mod 2^64 shared by the native executor (run.h)
// and the WoP-PBS module (wop.h) — mirrors core/refimpl.py exactly (same
// rounding, same layouts), which cites the reference implementations
// (compiler/lib/Runtime/wrappers.cpp, concrete-cpu c_api).
#pragma once

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace ctpu {
namespace rt {

[[noreturn]] inline void fail(const std::string &msg) {
  throw std::runtime_error("run: " + msg);
}

// ---------------------------------------------------------------------------
// TFHE math mod 2^64 — mirrors core/refimpl.py exactly (same rounding,
// same layouts), which cites the reference implementations.
// ---------------------------------------------------------------------------

inline uint64_t encode_torus(int64_t m, int width) {
  return static_cast<uint64_t>(m) << (64 - width - 1);
}

// Balanced signed gadget decomposition (refimpl.decompose): digit j+1 of
// round_half_up(v / 2^(64-l*B)) in (-2^(B-1), 2^(B-1)], kept as wrapped
// u64 (products/sums mod 2^64 are exact).
inline void decompose_u64(uint64_t v, int base_log, int levels,
                          uint64_t *digits) {
  uint64_t prev = ((v >> (64 - 1)) + 1) >> 1;  // j = 0: shift 63
  for (int j = 1; j <= levels; j++) {
    int shift = 64 - j * base_log - 1;
    uint64_t wj = ((v >> shift) + 1) >> 1;
    digits[j - 1] = wj - (prev << base_log);
    prev = wj;
  }
}

// LWE keyswitch big -> small with the raw KSK (n_big, l, n_small+1)
// (refimpl.keyswitch): out = trivial(b) - sum_{i,j} Decomp_j(a_i)*KSK[i][j].
inline std::vector<uint64_t> keyswitch(const uint64_t *ct, size_t n_big,
                                       const uint64_t *ksk, size_t n_small,
                                       int base_log, int levels) {
  std::vector<uint64_t> acc(n_small + 1, 0);
  std::vector<uint64_t> digits(levels);
  for (size_t i = 0; i < n_big; i++) {
    decompose_u64(ct[i], base_log, levels, digits.data());
    for (int j = 0; j < levels; j++) {
      uint64_t d = digits[j];
      if (!d) continue;
      const uint64_t *row = ksk + (i * levels + j) * (n_small + 1);
      for (size_t m = 0; m <= n_small; m++) acc[m] += d * row[m];
    }
  }
  std::vector<uint64_t> out(n_small + 1, 0);
  out[n_small] = ct[n_big];
  for (size_t m = 0; m <= n_small; m++) out[m] -= acc[m];
  return out;
}

// Torus u64 -> Z_2N with the reference's rounding (refimpl.modulus_switch).
inline uint64_t modulus_switch(uint64_t v, int log2_n) {
  v >>= (64 - log2_n - 2);
  v += v & 1u;
  v >>= 1;
  return v & ((uint64_t(2) << log2_n) - 1);
}

// out[j] (+)= X^r * poly mod (X^N + 1), r in [0, 2N) (refimpl.monomial_mul).
inline void monomial_mul(const uint64_t *poly, size_t n, uint64_t r,
                         uint64_t *out) {
  r %= 2 * n;
  for (size_t j = 0; j < n; j++) {
    uint64_t src = (j + 2 * n - r) % (2 * n);
    bool neg = src >= n;
    uint64_t v = poly[src % n];
    out[j] = neg ? static_cast<uint64_t>(-static_cast<int64_t>(v)) : v;
  }
}

// acc[t] += a (*) b over Z_2^64[X]/(X^N+1), schoolbook
// (refimpl.negacyclic_polymul).
inline void negacyclic_polymul_add(const uint64_t *a, const uint64_t *b,
                                   size_t n, uint64_t *acc) {
  for (size_t i = 0; i < n; i++) {
    uint64_t ai = a[i];
    if (!ai) continue;
    size_t j = 0;
    for (; j + i < n; j++) acc[i + j] += ai * b[j];
    for (; j < n; j++) acc[i + j - n] -= ai * b[j];
  }
}

// GLWE external product acc += GGSW (.) glwe (refimpl.external_product),
// with the GGSW laid out (l, k+1, k+1, N) as keygen.h writes the BSK rows.
inline void external_product_add(const uint64_t *ggsw,
                                 const std::vector<uint64_t> &glwe, size_t k,
                                 size_t n, int base_log, int levels,
                                 std::vector<uint64_t> &acc,
                                 std::vector<uint64_t> &scratch) {
  // scratch: (k+1)*levels digit polynomials
  scratch.assign((k + 1) * levels * n, 0);
  std::vector<uint64_t> digs(levels);
  for (size_t r = 0; r <= k; r++)
    for (size_t t = 0; t < n; t++) {
      decompose_u64(glwe[r * n + t], base_log, levels, digs.data());
      for (int j = 0; j < levels; j++)
        scratch[(r * levels + j) * n + t] = digs[j];
    }
  for (size_t r = 0; r <= k; r++)
    for (int j = 0; j < levels; j++) {
      const uint64_t *d = scratch.data() + (r * levels + j) * n;
      const uint64_t *row = ggsw + (static_cast<size_t>(j) * (k + 1) + r) *
                                       (k + 1) * n;
      for (size_t c = 0; c <= k; c++)
        negacyclic_polymul_add(d, row + c * n, n, acc.data() + c * n);
    }
}

// Blind rotation (refimpl.blind_rotate): acc = X^{-b~} LUT;
// acc <- CMUX(bsk_i, acc, X^{a~_i} acc) per small-key bit.
inline std::vector<uint64_t> blind_rotate(
    const std::vector<uint64_t> &ct_small, const uint64_t *bsk, size_t k,
    size_t n, int log2_n, int pbs_base_log, int pbs_level,
    const std::vector<uint64_t> &lut_poly) {
  size_t n_small = ct_small.size() - 1;
  std::vector<uint64_t> acc((k + 1) * n, 0);
  uint64_t b_t = modulus_switch(ct_small[n_small], log2_n);
  monomial_mul(lut_poly.data(), n, 2 * n - b_t, acc.data() + k * n);
  std::vector<uint64_t> diff((k + 1) * n), scratch;
  size_t ggsw_words = static_cast<size_t>(pbs_level) * (k + 1) * (k + 1) * n;
  for (size_t i = 0; i < n_small; i++) {
    uint64_t a_t = modulus_switch(ct_small[i], log2_n);
    if (!a_t) continue;   // rotation by X^0: CMUX(acc, acc) is a no-op
    // diff = X^{a~_i} acc - acc
    for (size_t c = 0; c <= k; c++)
      monomial_mul(acc.data() + c * n, n, a_t, diff.data() + c * n);
    for (size_t t = 0; t < (k + 1) * n; t++) diff[t] -= acc[t];
    external_product_add(bsk + i * ggsw_words, diff, k, n, pbs_base_log,
                         pbs_level, acc, scratch);
  }
  return acc;
}

// LWE under the flattened GLWE key from coefficient 0 (refimpl.sample_extract).
inline std::vector<uint64_t> sample_extract0(const std::vector<uint64_t> &glwe,
                                             size_t k, size_t n) {
  std::vector<uint64_t> out(k * n + 1);
  for (size_t r = 0; r < k; r++) {
    const uint64_t *a = glwe.data() + r * n;
    out[r * n] = a[0];
    for (size_t t = 1; t < n; t++)
      out[r * n + t] =
          static_cast<uint64_t>(-static_cast<int64_t>(a[n - t]));
  }
  out[k * n] = glwe[k * n];
  return out;
}

// LUT expansion (refimpl.encode_expand_lut): mega-case repeat, centered by
// X^{-mega/2}; signed LUTs half-rotated; entries scaled at out_bits.
inline std::vector<uint64_t> encode_expand_lut(
    const std::vector<uint64_t> &lut, size_t poly_size, int message_bits,
    bool is_signed, int out_bits) {
  size_t p_size = size_t(1) << message_bits;
  if (lut.size() != p_size) fail("lut size mismatch");
  size_t mega = poly_size / p_size;
  if (mega == 0 || mega % 2 != 0)
    fail("polynomial size must give even mega-cases (TLU too wide for N)");
  std::vector<uint64_t> rot(lut);
  if (is_signed)
    std::rotate(rot.begin(), rot.begin() + p_size / 2, rot.end());
  std::vector<uint64_t> naive(poly_size);
  for (size_t e = 0; e < p_size; e++) {
    uint64_t v = rot[e] << (64 - out_bits - 1);
    for (size_t m = 0; m < mega; m++) naive[e * mega + m] = v;
  }
  std::vector<uint64_t> out(poly_size);
  monomial_mul(naive.data(), poly_size, 2 * poly_size - mega / 2, out.data());
  return out;
}

}  // namespace rt
}  // namespace ctpu
