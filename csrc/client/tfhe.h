// Client-side TFHE primitives: torus encode/decode and LWE encrypt/decrypt.
//
// Bit-exact counterparts of the Python client path (core/refimpl.py
// encode/decode, core/keygen.py encrypt_lwe_batch), which themselves mirror
// the reference Transformers (lib/Common/Transformers.cpp:385-427 for the
// rounded decode).  Coefficients live mod q = 2^64 — plain uint64_t wraps.
#pragma once

#include <cstdint>
#include <vector>

#include "csprng.h"

namespace ctpu {

// m -> m << (64 - (p+1)): p message bits plus one padding bit.  Signed
// messages rely on two's-complement wrap, like numpy's int64->uint64 cast.
inline uint64_t encode(int64_t m, int message_bits) {
  return static_cast<uint64_t>(m) << (64 - (message_bits + 1));
}

// Round-to-nearest decode of a torus value to a p-bit integer.
inline int64_t decode(uint64_t t, int p, bool is_signed) {
  uint64_t out = t >> (64 - p - 2);
  uint64_t carry = out & 1u;
  out = ((out >> 1) + carry) & ((uint64_t(1) << (p + 1)) - 1);
  if (is_signed) {
    int64_t res = static_cast<int64_t>(out);
    if (res >= (int64_t(1) << (p - 1))) res |= (~int64_t(0)) << p;
    return res;
  }
  return static_cast<int64_t>(out & ((uint64_t(1) << p) - 1));
}

// LWE ciphertext (a_0..a_{n-1}, b) with b = <a, s> + m + e, all mod 2^64.
inline void lwe_encrypt(Csprng &rng, const uint64_t *sk, size_t n,
                        uint64_t m_torus, double std, uint64_t *out) {
  rng.fill(reinterpret_cast<uint8_t *>(out), n * sizeof(uint64_t));
  uint64_t body = m_torus + rng.torus_gaussian(std);
  for (size_t i = 0; i < n; i++) body += out[i] * sk[i];
  out[n] = body;
}

// Phase b - <a, s> mod 2^64; decode separately.
inline uint64_t lwe_decrypt(const uint64_t *sk, size_t n, const uint64_t *ct) {
  uint64_t dot = 0;
  for (size_t i = 0; i < n; i++) dot += ct[i] * sk[i];
  return ct[n] - dot;
}

}  // namespace ctpu
