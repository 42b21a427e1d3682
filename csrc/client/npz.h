// Minimal .npz (stored-zip of .npy) reader for concrete_tpu key files.
//
// The Python side serializes keysets with np.savez (compilation/keys.py
// Keys.save: data-only npz, ZIP_STORED — never compressed), so the client
// only needs the stored-entry subset of the zip format plus the npy v1/v2
// header.  Counterpart of the reference ClientLib's capnp keyset reader
// (lib/Common/Keysets.cpp) for our data-only format.
//
// Deliberately NOT a general zip library: compressed entries and zip64
// archives are rejected with a clear error.
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace ctpu {

struct NpyArray {
  std::string descr;             // e.g. "<u8", "|u1"
  std::vector<uint64_t> shape;
  std::vector<uint8_t> data;     // raw little-endian buffer

  uint64_t size() const {
    uint64_t n = 1;
    for (uint64_t d : shape) n *= d;
    return n;
  }
  const uint64_t *as_u64() const {
    if (descr != "<u8")
      throw std::runtime_error("npy: expected <u8 array, got " + descr);
    return reinterpret_cast<const uint64_t *>(data.data());
  }
  // Graph-archive payloads (TLU tables, constants) as int64, converting
  // the narrower integer descrs numpy may have chosen for small values.
  std::vector<int64_t> to_i64() const {
    std::vector<int64_t> out(size());
    const uint8_t *p = data.data();
    if (descr == "<i8")
      memcpy(out.data(), p, out.size() * 8);
    else if (descr == "<u8")
      for (size_t i = 0; i < out.size(); i++)
        out[i] = static_cast<int64_t>(
            reinterpret_cast<const uint64_t *>(p)[i]);
    else if (descr == "<i4")
      for (size_t i = 0; i < out.size(); i++)
        out[i] = reinterpret_cast<const int32_t *>(p)[i];
    else if (descr == "<u4")
      for (size_t i = 0; i < out.size(); i++)
        out[i] = reinterpret_cast<const uint32_t *>(p)[i];
    else if (descr == "<i2")
      for (size_t i = 0; i < out.size(); i++)
        out[i] = reinterpret_cast<const int16_t *>(p)[i];
    else if (descr == "<u2")
      for (size_t i = 0; i < out.size(); i++)
        out[i] = reinterpret_cast<const uint16_t *>(p)[i];
    else if (descr == "|i1")
      for (size_t i = 0; i < out.size(); i++)
        out[i] = reinterpret_cast<const int8_t *>(p)[i];
    else if (descr == "|u1" || descr == "|b1")
      for (size_t i = 0; i < out.size(); i++) out[i] = p[i];
    else
      throw std::runtime_error("npy: expected an integer array, got " +
                               descr);
    return out;
  }
};

namespace detail {

inline uint16_t rd16(const uint8_t *p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
inline uint32_t rd32(const uint8_t *p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}

inline NpyArray parse_npy(const uint8_t *p, uint64_t len) {
  if (len < 10 || memcmp(p, "\x93NUMPY", 6) != 0)
    throw std::runtime_error("npy: bad magic");
  uint8_t major = p[6];
  uint64_t hlen, hoff;
  if (major == 1) { hlen = rd16(p + 8); hoff = 10; }
  else if (major == 2) {
    if (len < 12) throw std::runtime_error("npy: truncated header");
    hlen = rd32(p + 8); hoff = 12;
  }
  else throw std::runtime_error("npy: unsupported version");
  if (hoff + hlen > len) throw std::runtime_error("npy: truncated header");
  std::string header(reinterpret_cast<const char *>(p + hoff), hlen);

  NpyArray out;
  // descr: first quoted string after 'descr':
  size_t d = header.find("'descr'");
  if (d == std::string::npos) throw std::runtime_error("npy: no descr");
  size_t q1 = header.find('\'', d + 7);
  size_t q2 = header.find('\'', q1 + 1);
  out.descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (header.find("'fortran_order': True") != std::string::npos)
    throw std::runtime_error("npy: fortran order unsupported");
  size_t s = header.find("'shape':");
  size_t lp = header.find('(', s), rp = header.find(')', lp);
  std::string tup = header.substr(lp + 1, rp - lp - 1);
  for (size_t i = 0; i < tup.size();) {
    while (i < tup.size() && !isdigit(static_cast<unsigned char>(tup[i]))) i++;
    if (i >= tup.size()) break;
    uint64_t v = 0;
    while (i < tup.size() && isdigit(static_cast<unsigned char>(tup[i])))
      v = v * 10 + (tup[i++] - '0');
    out.shape.push_back(v);
  }
  out.data.assign(p + hoff + hlen, p + len);
  size_t itemsize = 0;
  for (char ch : out.descr)
    if (ch >= '0' && ch <= '9') itemsize = itemsize * 10 + (ch - '0');
  if (itemsize == 0 || out.data.size() != out.size() * itemsize)
    throw std::runtime_error(
        "npy: data is " + std::to_string(out.data.size()) +
        " bytes but shape/descr require " +
        std::to_string(out.size() * itemsize));
  return out;
}

}  // namespace detail

// Every stored (uncompressed) entry of a zip, name -> raw bytes.  Shared
// by the npz keyset reader and the server deployment archive reader
// (Server.save writes ZIP_STORED entries: client.specs.json, graph.json,
// graph_arrays.npz).
inline std::map<std::string, std::vector<uint8_t>> read_zip_entries(
    const std::vector<uint8_t> &buf) {
  if (buf.size() < 22) throw std::runtime_error("zip: too small");

  // End of central directory: scan backwards for the signature
  size_t eocd = std::string::npos;
  for (size_t i = buf.size() - 22; ; i--) {
    if (detail::rd32(&buf[i]) == 0x06054b50u) { eocd = i; break; }
    if (i == 0 || buf.size() - i > (1 << 16) + 22) break;
  }
  if (eocd == std::string::npos)
    throw std::runtime_error("zip: no end-of-central-directory record");
  uint16_t n_entries = detail::rd16(&buf[eocd + 10]);
  uint32_t cd_off = detail::rd32(&buf[eocd + 16]);
  if (n_entries == 0xFFFF || cd_off == 0xFFFFFFFFu)
    throw std::runtime_error("zip: zip64 archives unsupported");

  std::map<std::string, std::vector<uint8_t>> out;
  size_t p = cd_off;
  for (uint16_t e = 0; e < n_entries; e++) {
    if (p + 46 > buf.size() || detail::rd32(&buf[p]) != 0x02014b50u)
      throw std::runtime_error("zip: bad central directory entry");
    uint16_t method = detail::rd16(&buf[p + 10]);
    uint32_t usize = detail::rd32(&buf[p + 24]);
    uint16_t fnlen = detail::rd16(&buf[p + 28]);
    uint16_t extlen = detail::rd16(&buf[p + 30]);
    uint16_t cmtlen = detail::rd16(&buf[p + 32]);
    uint32_t lho = detail::rd32(&buf[p + 42]);
    if (p + 46 + static_cast<size_t>(fnlen) + extlen + cmtlen > buf.size())
      throw std::runtime_error("zip: truncated central directory entry");
    std::string name(reinterpret_cast<const char *>(&buf[p + 46]), fnlen);
    if (method != 0)
      throw std::runtime_error("zip: compressed entry '" + name +
                               "' unsupported (archives are saved stored)");
    // local header: data starts after its own (possibly different) lengths
    if (lho + 30 > buf.size() || detail::rd32(&buf[lho]) != 0x04034b50u)
      throw std::runtime_error("zip: bad local header for " + name);
    uint16_t lfn = detail::rd16(&buf[lho + 26]);
    uint16_t lex = detail::rd16(&buf[lho + 28]);
    uint64_t doff = static_cast<uint64_t>(lho) + 30 + lfn + lex;
    if (doff + usize > buf.size())
      throw std::runtime_error("zip: truncated data for " + name);
    out[name] = std::vector<uint8_t>(buf.begin() + doff,
                                     buf.begin() + doff + usize);
    p += 46 + fnlen + extlen + cmtlen;
  }
  return out;
}

inline std::vector<uint8_t> read_file_bytes(const std::string &path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  return std::vector<uint8_t>((std::istreambuf_iterator<char>(f)),
                              std::istreambuf_iterator<char>());
}

// Parse npz bytes (zip of .npy) into name -> NpyArray; entry names have
// their trailing ".npy" stripped, matching np.load.
inline std::map<std::string, NpyArray> parse_npz_bytes(
    const std::vector<uint8_t> &buf) {
  std::map<std::string, NpyArray> out;
  for (auto &kv : read_zip_entries(buf)) {
    std::string name = kv.first;
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      name = name.substr(0, name.size() - 4);
    out[name] = detail::parse_npy(kv.second.data(), kv.second.size());
  }
  return out;
}

inline std::map<std::string, NpyArray> load_npz(const std::string &path) {
  return parse_npz_bytes(read_file_bytes(path));
}

}  // namespace ctpu
