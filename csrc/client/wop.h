// WoP-PBS (without-padding programmable bootstrap) for the native circuit
// executor: bit extraction + circuit bootstrap + vertical packing — the
// large-precision TLU path over the raw u64 keyset.
//
// Exact u64 torus arithmetic mirroring core/wop.py (the repo's numpy
// oracle, which cites the reference semantics:
// compiler/lib/Runtime/wrappers.cpp:855-998 memref_wop_pbs_crt_buffer,
// backends/concrete-cpu/implementation/src/c_api/wop_pbs.rs).  Because
// every stage is deterministic given the keys, outputs decrypt to exactly
// what the Python/TPU server produces (tests/test_cpp_client.py).
#pragma once

#include <cstdint>
#include <vector>

#include "run_primitives.h"  // keyswitch/blind_rotate/monomial_mul/...

namespace ctpu {
namespace wop {

struct WopGadgets {
  int cbs_level = 0, cbs_base_log = 0;
  int pfks_level = 0, pfks_base_log = 0;
};

struct CryptoShape {
  size_t n_small = 0, k = 0, n = 0, n_big = 0;
  int log2_n = 0, pbs_base_log = 0, pbs_level = 0;
  int ks_base_log = 0, ks_level = 0;
};

// GGSW(bit) with the cbs gadget: (cbs_level, k+1, k+1, N) u64 — the same
// row layout external_product_add expects for the BSK.
using Ggsw = std::vector<uint64_t>;

// LWE(b * 2^63 + small) -> LWE(b * 2^out_scale_log) exactly (core/wop.py
// _sign_pbs): quarter-torus centering, KS, blind rotate over the constant
// test polynomial -2^(out-1), sample extract, add the half back.
inline std::vector<uint64_t> sign_pbs(const std::vector<uint64_t> &lwe_big,
                                      const CryptoShape &s,
                                      const uint64_t *ksk,
                                      const uint64_t *bsk,
                                      int out_scale_log) {
  std::vector<uint64_t> ct(lwe_big);
  ct[s.n_big] += uint64_t(1) << 62;
  std::vector<uint64_t> small = rt::keyswitch(
      ct.data(), s.n_big, ksk, s.n_small, s.ks_base_log, s.ks_level);
  uint64_t half = uint64_t(1) << (out_scale_log - 1);
  std::vector<uint64_t> test_poly(s.n, uint64_t(0) - half);
  std::vector<uint64_t> acc =
      rt::blind_rotate(small, bsk, s.k, s.n, s.log2_n, s.pbs_base_log,
                       s.pbs_level, test_poly);
  std::vector<uint64_t> out = rt::sample_extract0(acc, s.k, s.n);
  out[s.n_big] += half;
  return out;
}

// Extract nb_bits of the message (LSB at position delta_log) as LWEs each
// encrypting bit * 2^63; row 0 = MSB (core/wop.py extract_bits).
inline std::vector<std::vector<uint64_t>> extract_bits(
    const std::vector<uint64_t> &lwe_big, int nb_bits, int delta_log,
    const CryptoShape &s, const uint64_t *ksk, const uint64_t *bsk) {
  std::vector<uint64_t> acc(lwe_big);
  std::vector<std::vector<uint64_t>> bits(nb_bits);
  for (int i = 0; i < nb_bits; i++) {
    int pos = delta_log + i;
    uint64_t shift = uint64_t(64 - 1 - pos);
    std::vector<uint64_t> shifted(acc);
    for (uint64_t &v : shifted) v <<= shift;
    bits[nb_bits - 1 - i] = sign_pbs(shifted, s, ksk, bsk, 63);
    if (i < nb_bits - 1) {
      std::vector<uint64_t> cleaned = sign_pbs(shifted, s, ksk, bsk, pos);
      for (size_t t = 0; t <= s.n_big; t++) acc[t] -= cleaned[t];
    }
  }
  return bits;
}

// One LWE (big key) -> GLWE with the message multiplied by the key's
// secret function v_r (core/wop.py private_packing_keyswitch).
// pfpksk_r: (n_big+1, pfks_level, k+1, N).
inline std::vector<uint64_t> private_packing_keyswitch(
    const std::vector<uint64_t> &lwe, const uint64_t *pfpksk_r,
    const CryptoShape &s, const WopGadgets &g) {
  size_t kp1 = s.k + 1;
  std::vector<uint64_t> out(kp1 * s.n, 0);
  std::vector<uint64_t> digs(g.pfks_level);
  for (size_t i = 0; i <= s.n_big; i++) {
    rt::decompose_u64(lwe[i], g.pfks_base_log, g.pfks_level, digs.data());
    for (int j = 0; j < g.pfks_level; j++) {
      uint64_t d = digs[j];
      if (!d) continue;
      const uint64_t *row =
          pfpksk_r + (i * g.pfks_level + j) * kp1 * s.n;
      for (size_t t = 0; t < kp1 * s.n; t++) out[t] += d * row[t];
    }
  }
  return out;
}

// LWE(b * 2^63) -> GGSW(b) (core/wop.py circuit_bootstrap): one sign-PBS
// per cbs level + one PFPKSK per GLWE row.  pfpksk: (k+1, n_big+1,
// pfks_level, k+1, N).
inline Ggsw circuit_bootstrap(const std::vector<uint64_t> &bit_lwe,
                              const CryptoShape &s, const WopGadgets &g,
                              const uint64_t *ksk, const uint64_t *bsk,
                              const uint64_t *pfpksk) {
  size_t kp1 = s.k + 1;
  size_t row_words = kp1 * s.n;
  size_t pf_stride = (s.n_big + 1) * g.pfks_level * row_words;
  Ggsw ggsw(static_cast<size_t>(g.cbs_level) * kp1 * row_words);
  for (int j = 0; j < g.cbs_level; j++) {
    int scale_log = 64 - (j + 1) * g.cbs_base_log;
    std::vector<uint64_t> lev = sign_pbs(bit_lwe, s, ksk, bsk, scale_log);
    for (size_t r = 0; r <= s.k; r++) {
      std::vector<uint64_t> packed = private_packing_keyswitch(
          lev, pfpksk + r * pf_stride, s, g);
      std::copy(packed.begin(), packed.end(),
                ggsw.begin() + (size_t(j) * kp1 + r) * row_words);
    }
  }
  return ggsw;
}

// acc <- CMUX(ggsw_bit, acc, other) = acc + GGSW (.) (other - acc)
// (refimpl.cmux over run_primitives external_product_add).
inline void cmux_inplace(const Ggsw &bit, std::vector<uint64_t> &acc,
                         const std::vector<uint64_t> &other,
                         const CryptoShape &s, const WopGadgets &g,
                         std::vector<uint64_t> &scratch) {
  std::vector<uint64_t> diff(other);
  for (size_t t = 0; t < diff.size(); t++) diff[t] -= acc[t];
  rt::external_product_add(bit.data(), diff, s.k, s.n, g.cbs_base_log,
                           g.cbs_level, acc, scratch);
}

// LUT (2^nb torus values) selected by nb GGSW bits, MSB first
// (core/wop.py vertical_packing): CMUX tree over the high bits, GGSW
// blind rotation over the low log2(N) bits, sample-extract coefficient 0.
inline std::vector<uint64_t> vertical_packing(
    const std::vector<uint64_t> &lut_torus, const std::vector<Ggsw> &bits,
    const CryptoShape &s, const WopGadgets &g) {
  size_t kp1 = s.k + 1;
  int nb = static_cast<int>(bits.size());
  int n_in_chunk = nb < s.log2_n ? nb : s.log2_n;
  int n_tree = nb - n_in_chunk;
  size_t chunk_len = lut_torus.size() >> n_tree;

  std::vector<std::vector<uint64_t>> layer(size_t(1) << n_tree);
  for (size_t c = 0; c < layer.size(); c++) {
    layer[c].assign(kp1 * s.n, 0);
    for (size_t t = 0; t < chunk_len && t < s.n; t++)
      layer[c][s.k * s.n + t] = lut_torus[c * chunk_len + t];
  }
  std::vector<uint64_t> scratch;
  // tree LSB first: bit n_tree-1-t distinguishes adjacent chunks
  for (int t = 0; t < n_tree; t++) {
    const Ggsw &bit = bits[n_tree - 1 - t];
    std::vector<std::vector<uint64_t>> next(layer.size() / 2);
    for (size_t u = 0; u < next.size(); u++) {
      next[u] = std::move(layer[2 * u]);
      cmux_inplace(bit, next[u], layer[2 * u + 1], s, g, scratch);
    }
    layer = std::move(next);
  }
  std::vector<uint64_t> acc = std::move(layer[0]);

  // GGSW blind rotation over the low bits: bit t has weight 2^t
  std::vector<uint64_t> rotated(kp1 * s.n);
  for (int t = 0; t < n_in_chunk; t++) {
    const Ggsw &bit = bits[nb - 1 - t];
    for (size_t c = 0; c <= s.k; c++)
      rt::monomial_mul(acc.data() + c * s.n, s.n,
                       2 * s.n - (uint64_t(1) << t),
                       rotated.data() + c * s.n);
    cmux_inplace(bit, acc, rotated, s, g, scratch);
  }
  return rt::sample_extract0(acc, s.k, s.n);
}

// Full p-bit TLU: extract -> circuit-bootstrap -> vertical packing
// (core/wop.py wop_pbs).  `table` holds raw integer entries; output
// encoded at out_bits.
inline std::vector<uint64_t> wop_pbs(const std::vector<uint64_t> &lwe_big,
                                     const std::vector<int64_t> &table,
                                     int nb_bits, int delta_log,
                                     int out_bits, const CryptoShape &s,
                                     const WopGadgets &g,
                                     const uint64_t *ksk,
                                     const uint64_t *bsk,
                                     const uint64_t *pfpksk) {
  std::vector<std::vector<uint64_t>> bit_lwes =
      extract_bits(lwe_big, nb_bits, delta_log, s, ksk, bsk);
  std::vector<Ggsw> ggsws(bit_lwes.size());
  for (size_t i = 0; i < bit_lwes.size(); i++)
    ggsws[i] = circuit_bootstrap(bit_lwes[i], s, g, ksk, bsk, pfpksk);
  std::vector<uint64_t> lut_torus(table.size());
  uint64_t mask = (uint64_t(1) << (out_bits + 1)) - 1;
  for (size_t i = 0; i < table.size(); i++)
    lut_torus[i] = (static_cast<uint64_t>(table[i]) & mask)
                   << (64 - out_bits - 1);
  return vertical_packing(lut_torus, ggsws, s, g);
}

}  // namespace wop
}  // namespace ctpu
