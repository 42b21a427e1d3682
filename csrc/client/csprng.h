// ChaCha20-based CSPRNG for client-side encryption randomness.
//
// Same keystream primitive as the Python side's SecureGenerator
// (csrc/chacha20.c via utils/csprng.py) — the client's masks and gaussian
// noise never touch a non-cryptographic RNG, matching the reference's
// dedicated encryption csprng (include/concretelang/Common/Csprng.h:18-61).
#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <stdexcept>

extern "C" uint32_t chacha20_fill(const uint8_t key[32], uint32_t counter,
                                  const uint8_t nonce[12], uint8_t *out,
                                  uint64_t n_bytes);

namespace ctpu {

class Csprng {
 public:
  // Seed from the OS entropy pool (default) or deterministically from a
  // 32-byte seed (tests only).
  Csprng() {
    std::ifstream ur("/dev/urandom", std::ios::binary);
    if (!ur || !ur.read(reinterpret_cast<char *>(key_), 32))
      throw std::runtime_error("csprng: cannot read /dev/urandom");
    memset(nonce_, 0, sizeof(nonce_));
  }
  explicit Csprng(const uint8_t seed[32]) {
    memcpy(key_, seed, 32);
    memset(nonce_, 0, sizeof(nonce_));
  }

  void fill(uint8_t *out, uint64_t n) {
    // the 32-bit block counter covers 256 GiB per nonce; advance the
    // nonce before it wraps so keystream (and thus LWE masks) never
    // repeats within one generator
    uint64_t blocks = (n + 63) / 64;
    if (blocks > 0xFFFFFFFFull - counter_) {
      bump_nonce();
      counter_ = 0;
    }
    counter_ = chacha20_fill(key_, counter_, nonce_, out, n);
    if (counter_ == 0 && blocks > 0) bump_nonce();
  }

  uint64_t next_u64() {
    if (buf_pos_ + 8 > sizeof(buf_)) {
      fill(buf_, sizeof(buf_));
      buf_pos_ = 0;
    }
    uint64_t v;
    memcpy(&v, buf_ + buf_pos_, 8);
    buf_pos_ += 8;
    return v;
  }

  // Uniform double in (0, 1] — never 0, so log() below is safe.
  double next_unit() {
    return (static_cast<double>(next_u64() >> 11) + 1.0) * 0x1p-53;
  }

  // Standard normal via Box-Muller on the ChaCha stream.
  double next_normal() {
    if (have_spare_) { have_spare_ = false; return spare_; }
    double u = next_unit(), v = next_unit();
    double r = std::sqrt(-2.0 * std::log(u));
    double theta = 2.0 * M_PI * v;
    spare_ = r * std::sin(theta);
    have_spare_ = true;
    return r * std::cos(theta);
  }

  // Gaussian torus noise: round(N(0, std) * 2^64) as a wrapping u64
  // (core/refimpl.py sample_torus_gaussian).
  uint64_t torus_gaussian(double std) {
    double x = next_normal() * std * 0x1p64;
    return static_cast<uint64_t>(static_cast<int64_t>(std::llround(x)));
  }

 private:
  void bump_nonce() {
    for (int i = 0; i < 12; i++)
      if (++nonce_[i] != 0) break;
  }

  uint8_t key_[32];
  uint8_t nonce_[12];
  uint32_t counter_ = 0;
  uint8_t buf_[65536];
  size_t buf_pos_ = sizeof(buf_);
  bool have_spare_ = false;
  double spare_ = 0.0;
};

}  // namespace ctpu
