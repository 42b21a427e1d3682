// Native key generation: secret keys, bootstrap key, keyswitch key, and
// WoP private functional packing keyswitch keys, written as a keys.npz
// that compilation/keys.py Keys.load accepts.
//
// The second-language keygen the reference ships as a standalone Rust
// crate (frontends/concrete-rust/concrete-keygen/src/lib.rs, 1760 LoC over
// tfhe-rs): with it, a deployment's trust side never needs Python — the
// C++ client generates keys, encrypts, and decrypts; only evaluation keys
// ever leave the box.
//
// Math mirrors concrete_tpu/core/keygen.py exactly (same distributions,
// same layouts; ChaCha20 randomness as in utils/csprng.py):
//   - binary secret keys; uniform u64 GLWE masks; gaussian torus noise
//   - GLWE body = sum_r A_r (*) S_r + m + e  over Z_2^64[X]/(X^N+1),
//     computed with the binary key's sparsity (one negacyclic
//     add/subtract per set key bit)
//   - BSK: GGSW(s_i) rows (keygen.py make_bsk layout (n, l, k+1, k+1, N))
//   - KSK: LWE rows (n_big, l, n_small+1) (make_ksk)
//   - PFPKSK: (k+1, n_big+1, levels, k+1, N) (core/wop.py pfpksk_gen)
#pragma once

#include <cstdint>
#include <string>
#include <vector>

#include "csprng.h"
#include "npz_write.h"
#include "specs.h"

namespace ctpu {

// out[t] (+)= sign * a[(t - u) negacyclic] for one key bit at position u:
// (a (*) X^u)[t] = a[t-u] for t >= u, -a[N + t - u] below.
inline void add_rotated(const uint64_t *a, size_t n, size_t u,
                        uint64_t *out) {
  for (size_t t = 0; t < u; t++) out[t] -= a[n + t - u];
  for (size_t t = u; t < n; t++) out[t] += a[t - u];
}

// body += sum_r a[r] (*) key[r] for a binary GLWE key.
inline void accumulate_key_dot(const uint64_t *a, const uint64_t *key,
                               size_t k, size_t n, uint64_t *body) {
  for (size_t r = 0; r < k; r++)
    for (size_t u = 0; u < n; u++)
      if (key[r * n + u]) add_rotated(a + r * n, n, u, body);
}

struct KeygenResult {
  std::vector<uint64_t> sk_small;   // (n_small,)
  std::vector<uint64_t> glwe;       // (k, N)
  std::vector<uint64_t> bsk;        // (n_small, l, k+1, k+1, N)
  std::vector<uint64_t> ksk;        // (n_big, ks_l, n_small+1)
  std::vector<uint64_t> pfpksk;     // (k+1, n_big+1, pl, k+1, N) or empty
  int pfks_level = 0, pfks_base = 0;
};

// Batched GLWE encryption of `rows` message polynomials (row-major in
// msgs): returns (rows, k+1, N).  Randomness is drawn serially (the
// csprng is not thread-safe); the polynomial math is parallel.
inline std::vector<uint64_t> glwe_encrypt_batch(
    Csprng &rng, const std::vector<uint64_t> &key, size_t k, size_t n,
    const std::vector<uint64_t> &msgs, size_t rows, double std) {
  std::vector<uint64_t> out(rows * (k + 1) * n);
  for (size_t i = 0; i < rows; i++) {
    uint64_t *row = out.data() + i * (k + 1) * n;
    for (size_t j = 0; j < k * n; j++) row[j] = rng.next_u64();
    uint64_t *body = row + k * n;
    for (size_t t = 0; t < n; t++)
      body[t] = msgs[i * n + t] + rng.torus_gaussian(std);
  }
#pragma omp parallel for schedule(dynamic)
  for (long long i = 0; i < static_cast<long long>(rows); i++) {
    uint64_t *row = out.data() + i * (k + 1) * n;
    accumulate_key_dot(row, key.data(), k, n, row + k * n);
  }
  return out;
}

inline KeygenResult generate_keys(const ClientSpecs &s, Csprng &rng) {
  const size_t n_small = s.n_small, k = s.glwe_dimension,
               n = s.polynomial_size;
  const size_t l = s.pbs_level, n_big = k * n;
  KeygenResult out;
  out.sk_small.resize(n_small);
  for (auto &b : out.sk_small) b = rng.next_u64() & 1;
  out.glwe.resize(k * n);
  for (auto &b : out.glwe) b = rng.next_u64() & 1;

  // ---- BSK: message polys per (i, level j, row r) -----------------------
  {
    size_t rows = n_small * l * (k + 1);
    std::vector<uint64_t> msgs(rows * n, 0);
    for (size_t i = 0; i < n_small; i++)
      for (size_t j = 0; j < l; j++) {
        uint64_t g = 1ull << (64 - (j + 1) * s.pbs_base_log);
        for (size_t r = 0; r < k; r++) {
          uint64_t *m = msgs.data() + ((i * l + j) * (k + 1) + r) * n;
          if (out.sk_small[i])
            for (size_t t = 0; t < n; t++)
              m[t] = static_cast<uint64_t>(-static_cast<int64_t>(
                         out.glwe[r * n + t])) * g;
        }
        msgs[((i * l + j) * (k + 1) + k) * n] = out.sk_small[i] * g;
      }
    out.bsk = glwe_encrypt_batch(rng, out.glwe, k, n, msgs, rows,
                                 s.glwe_std);
  }

  // ---- KSK: big key bits under the small key ----------------------------
  {
    const size_t kl = s.ks_level;
    out.ksk.resize(n_big * kl * (n_small + 1));
    for (size_t i = 0; i < n_big; i++)
      for (size_t j = 0; j < kl; j++) {
        uint64_t *row = out.ksk.data() + (i * kl + j) * (n_small + 1);
        uint64_t acc = 0;
        for (size_t t = 0; t < n_small; t++) {
          row[t] = rng.next_u64();
          if (out.sk_small[t]) acc += row[t];
        }
        uint64_t g = 1ull << (64 - (j + 1) * s.ks_base_log);
        // big key = flattened GLWE key (sample-extract order = row-major)
        row[n_small] = acc + out.glwe[i] * g +
                       rng.torus_gaussian(s.lwe_std);
      }
  }

  // ---- PFPKSK (WoP circuits) --------------------------------------------
  if (s.has_wop) {
    const size_t pl = s.pfks_level;
    out.pfks_level = s.pfks_level;
    out.pfks_base = s.pfks_base_log;
    size_t rows = (k + 1) * (n_big + 1) * pl;
    std::vector<uint64_t> msgs(rows * n, 0);
    for (size_t r = 0; r <= k; r++)
      for (size_t i = 0; i <= n_big; i++)
        for (size_t j = 0; j < pl; j++) {
          uint64_t g = 1ull << (64 - (j + 1) * s.pfks_base_log);
          // in_coeff: -sk_big[i] for masks, +1 for the body position
          uint64_t coeff = (i < n_big)
              ? static_cast<uint64_t>(-static_cast<int64_t>(out.glwe[i]))
              : 1ull;
          uint64_t *m = msgs.data() + ((r * (n_big + 1) + i) * pl + j) * n;
          if (r < k) {
            // v_r(X) = -S_r
            for (size_t t = 0; t < n; t++)
              m[t] = coeff * static_cast<uint64_t>(
                         -static_cast<int64_t>(out.glwe[r * n + t])) * g;
          } else {
            m[0] = coeff * g;   // v_k(X) = +1
          }
        }
    out.pfpksk = glwe_encrypt_batch(rng, out.glwe, k, n, msgs, rows,
                                    s.glwe_std);
  }
  return out;
}

// Double -> shortest round-trip decimal (so Python json parses the exact
// same float and CryptoParams equality holds).
inline std::string fmt_double(double v) {
  for (int prec = 1; prec <= 17; prec++) {
    char buf[64];
    snprintf(buf, sizeof(buf), "%.*g", prec, v);
    if (strtod(buf, nullptr) == v) return buf;
  }
  return "0.0";
}

inline void write_keys_npz(const std::string &path, const ClientSpecs &s,
                           const KeygenResult &kg) {
  const uint64_t n_small = s.n_small, k = s.glwe_dimension,
                 n = s.polynomial_size, l = s.pbs_level;
  std::string header =
      "{\"version\": 1, \"params\": {"
      "\"n_small\": " + std::to_string(s.n_small) +
      ", \"glwe_dimension\": " + std::to_string(s.glwe_dimension) +
      ", \"polynomial_size\": " + std::to_string(s.polynomial_size) +
      ", \"pbs_level\": " + std::to_string(s.pbs_level) +
      ", \"pbs_base_log\": " + std::to_string(s.pbs_base_log) +
      ", \"ks_level\": " + std::to_string(s.ks_level) +
      ", \"ks_base_log\": " + std::to_string(s.ks_base_log) +
      ", \"lwe_std\": " + fmt_double(s.lwe_std) +
      ", \"glwe_std\": " + fmt_double(s.glwe_std) +
      ", \"security_level\": " + std::to_string(s.security_level) +
      ", \"q_log\": 64}}";
  NpzWriter w(path);
  w.add_u8("header", std::vector<uint8_t>(header.begin(), header.end()));
  w.add_u64("lwe_small", {n_small}, kg.sk_small.data());
  w.add_u64("glwe", {k, n}, kg.glwe.data());
  w.add_u64("bsk", {n_small, l, k + 1, k + 1, n}, kg.bsk.data());
  w.add_u64("ksk", {k * n, static_cast<uint64_t>(s.ks_level), n_small + 1},
            kg.ksk.data());
  if (!kg.pfpksk.empty())
    w.add_u64("pfpksk_" + std::to_string(kg.pfks_level) + "_" +
                  std::to_string(kg.pfks_base),
              {k + 1, k * n + 1, static_cast<uint64_t>(kg.pfks_level),
               k + 1, n},
              kg.pfpksk.data());
  w.finish();
}

}  // namespace ctpu
