// Minimal .npz (stored-zip of .npy) WRITER — the counterpart of npz.h's
// reader.  Produces archives byte-compatible with np.savez(compress=False)
// as far as np.load cares: npy v1.0 entries, ZIP_STORED, CRC-32, one
// central directory.  Used by the native keygen (keygen.h) so a C++-only
// client can write keysets compilation/keys.py Keys.load accepts.
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace ctpu {

namespace zipdetail {

inline uint32_t crc32(const uint8_t *data, size_t n, uint32_t crc = 0) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++)
        c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  crc = ~crc;
  for (size_t i = 0; i < n; i++)
    crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

inline void put16(std::string &s, uint16_t v) {
  s.push_back(static_cast<char>(v & 0xFF));
  s.push_back(static_cast<char>(v >> 8));
}

inline void put32(std::string &s, uint32_t v) {
  for (int i = 0; i < 4; i++) s.push_back(static_cast<char>((v >> (8 * i)) & 0xFF));
}

}  // namespace zipdetail

// One npy payload: header + raw little-endian data.
inline std::vector<uint8_t> npy_bytes(const std::string &descr,
                                      const std::vector<uint64_t> &shape,
                                      const uint8_t *data, size_t n_bytes) {
  std::string dict = "{'descr': '" + descr + "', 'fortran_order': False, "
                     "'shape': (";
  for (size_t i = 0; i < shape.size(); i++)
    dict += std::to_string(shape[i]) + (shape.size() == 1 ? "," :
                                        i + 1 < shape.size() ? ", " : "");
  dict += "), }";
  // pad so that magic(6)+ver(2)+len(2)+dict is a multiple of 64, ending \n
  size_t header = 6 + 2 + 2 + dict.size() + 1;
  size_t pad = (64 - header % 64) % 64;
  dict += std::string(pad, ' ');
  dict += '\n';
  std::vector<uint8_t> out;
  out.reserve(10 + dict.size() + n_bytes);
  const char magic[] = "\x93NUMPY\x01\x00";
  out.insert(out.end(), magic, magic + 8);
  out.push_back(static_cast<uint8_t>(dict.size() & 0xFF));
  out.push_back(static_cast<uint8_t>(dict.size() >> 8));
  out.insert(out.end(), dict.begin(), dict.end());
  out.insert(out.end(), data, data + n_bytes);
  return out;
}

class NpzWriter {
 public:
  explicit NpzWriter(const std::string &path)
      : f_(path, std::ios::binary) {
    if (!f_) throw std::runtime_error("npz: cannot write " + path);
  }

  void add_u64(const std::string &name, const std::vector<uint64_t> &shape,
               const uint64_t *data) {
    uint64_t count = 1;
    for (uint64_t d : shape) count *= d;
    add_entry(name, npy_bytes("<u8", shape,
                              reinterpret_cast<const uint8_t *>(data),
                              count * 8));
  }

  void add_u8(const std::string &name, const std::vector<uint8_t> &data) {
    add_entry(name, npy_bytes("|u1", {data.size()}, data.data(),
                              data.size()));
  }

  // writes the central directory; the writer is unusable afterwards
  void finish() {
    using namespace zipdetail;
    std::string central;
    for (const Entry &e : entries_) {
      std::string h;
      put32(h, 0x02014b50);
      put16(h, 20); put16(h, 20);   // version made by / needed
      put16(h, 0); put16(h, 0);     // flags, method=stored
      put16(h, 0); put16(h, 0);     // time, date
      put32(h, e.crc);
      put32(h, e.size); put32(h, e.size);
      put16(h, static_cast<uint16_t>(e.name.size()));
      put16(h, 0); put16(h, 0);     // extra, comment
      put16(h, 0);                  // disk
      put16(h, 0); put32(h, 0);     // internal/external attrs
      put32(h, e.offset);
      h += e.name;
      central += h;
    }
    uint64_t cd_offset = offset_;
    f_.write(central.data(), static_cast<std::streamsize>(central.size()));
    std::string eocd;
    put32(eocd, 0x06054b50);
    put16(eocd, 0); put16(eocd, 0);
    put16(eocd, static_cast<uint16_t>(entries_.size()));
    put16(eocd, static_cast<uint16_t>(entries_.size()));
    put32(eocd, static_cast<uint32_t>(central.size()));
    put32(eocd, static_cast<uint32_t>(cd_offset));
    put16(eocd, 0);
    f_.write(eocd.data(), static_cast<std::streamsize>(eocd.size()));
    f_.close();
  }

 private:
  struct Entry {
    std::string name;
    uint32_t crc, size, offset;
  };

  void add_entry(const std::string &base_name,
                 const std::vector<uint8_t> &payload) {
    using namespace zipdetail;
    if (payload.size() > 0xFFFFFFFFull - 1)
      throw std::runtime_error("npz: entry too large (zip64 unsupported)");
    std::string name = base_name + ".npy";
    Entry e;
    e.name = name;
    e.crc = crc32(payload.data(), payload.size());
    e.size = static_cast<uint32_t>(payload.size());
    e.offset = static_cast<uint32_t>(offset_);
    std::string h;
    put32(h, 0x04034b50);
    put16(h, 20);                  // version needed
    put16(h, 0); put16(h, 0);      // flags, method=stored
    put16(h, 0); put16(h, 0);      // time, date
    put32(h, e.crc);
    put32(h, e.size); put32(h, e.size);
    put16(h, static_cast<uint16_t>(name.size()));
    put16(h, 0);                   // extra len
    h += name;
    f_.write(h.data(), static_cast<std::streamsize>(h.size()));
    f_.write(reinterpret_cast<const char *>(payload.data()),
             static_cast<std::streamsize>(payload.size()));
    offset_ += h.size() + payload.size();
    entries_.push_back(e);
  }

  std::ofstream f_;
  uint64_t offset_ = 0;
  std::vector<Entry> entries_;
};

}  // namespace ctpu
