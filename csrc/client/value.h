// CTPV1 framed transport values — byte-compatible with the Python side's
// compilation/value.py Value.serialize/deserialize (the stand-in for the
// reference's capnp TransportValue, lib/Common/Values.cpp).
//
// Layout: b"CTPV1\0" + u32le header_len + JSON header + raw LE payload.
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "json.h"

namespace ctpu {

struct TransportValue {
  std::string dtype;             // "uint64" or "int64"
  std::vector<int64_t> shape;
  bool is_encrypted = true;
  std::vector<uint8_t> payload;  // raw little-endian element bytes

  int64_t size() const {
    int64_t n = 1;
    for (int64_t d : shape) n *= d;
    return n;
  }
  const uint64_t *as_u64() const {
    if (dtype != "uint64")
      throw std::runtime_error("value: expected uint64 payload, got " + dtype);
    return reinterpret_cast<const uint64_t *>(payload.data());
  }
  const int64_t *as_i64() const {
    if (dtype != "int64")
      throw std::runtime_error("value: expected int64 payload, got " + dtype);
    return reinterpret_cast<const int64_t *>(payload.data());
  }

  std::vector<uint8_t> serialize() const {
    std::string header = "{\"dtype\": \"" + dtype + "\", \"shape\": [";
    for (size_t i = 0; i < shape.size(); i++) {
      if (i) header += ", ";
      header += std::to_string(shape[i]);
    }
    header += "], \"is_encrypted\": ";
    header += is_encrypted ? "true" : "false";
    header += "}";
    std::vector<uint8_t> out;
    out.reserve(10 + header.size() + payload.size());
    const char magic[6] = {'C', 'T', 'P', 'V', '1', '\0'};
    out.insert(out.end(), magic, magic + 6);
    uint32_t hlen = static_cast<uint32_t>(header.size());
    for (int i = 0; i < 4; i++)
      out.push_back(static_cast<uint8_t>(hlen >> (8 * i)));
    out.insert(out.end(), header.begin(), header.end());
    out.insert(out.end(), payload.begin(), payload.end());
    return out;
  }

  static TransportValue deserialize(const std::vector<uint8_t> &blob) {
    if (blob.size() < 10 || memcmp(blob.data(), "CTPV1\0", 6) != 0)
      throw std::runtime_error("value: not a concrete_tpu Value payload");
    uint32_t hlen = 0;
    for (int i = 0; i < 4; i++)
      hlen |= static_cast<uint32_t>(blob[6 + i]) << (8 * i);
    if (10 + static_cast<size_t>(hlen) > blob.size())
      throw std::runtime_error("value: truncated header");
    Json h = JsonParser::parse(
        std::string(reinterpret_cast<const char *>(&blob[10]), hlen));
    TransportValue v;
    v.dtype = h["dtype"].as_str();
    for (const Json &d : h["shape"].as_arr()) v.shape.push_back(d.as_int());
    v.is_encrypted = h["is_encrypted"].as_bool();
    v.payload.assign(blob.begin() + 10 + hlen, blob.end());
    // fail closed on truncated/padded payloads (the Python side's
    // np.frombuffer+reshape enforces the same invariant)
    size_t itemsize;
    if (v.dtype == "uint64" || v.dtype == "int64") itemsize = 8;
    else if (v.dtype == "uint32" || v.dtype == "int32") itemsize = 4;
    else throw std::runtime_error("value: unsupported dtype " + v.dtype);
    uint64_t want = itemsize;
    for (int64_t d : v.shape) {
      if (d < 0) throw std::runtime_error("value: negative dimension");
      want *= static_cast<uint64_t>(d);
    }
    if (v.payload.size() != want)
      throw std::runtime_error(
          "value: payload is " + std::to_string(v.payload.size()) +
          " bytes, header declares " + std::to_string(want));
    return v;
  }

  void save(const std::string &path) const {
    std::ofstream f(path, std::ios::binary);
    if (!f) throw std::runtime_error("value: cannot write " + path);
    auto bytes = serialize();
    f.write(reinterpret_cast<const char *>(bytes.data()), bytes.size());
  }

  static TransportValue load(const std::string &path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) throw std::runtime_error("value: cannot open " + path);
    std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                             std::istreambuf_iterator<char>());
    return deserialize(buf);
  }
};

}  // namespace ctpu
