// Minimal JSON parser for the concrete_tpu client-side formats
// (ClientSpecs JSON sidecars, CTPV1 Value headers).  Counterpart of the
// reference's capnp/serde readers on the client side
// (tools/concrete-protocol/concrete-protocol.capnp; our formats are
// data-only JSON + npz instead).
//
// Supports the full JSON grammar needed by those formats: objects, arrays,
// strings (with escapes), numbers, booleans, null.  Throws
// std::runtime_error with a byte offset on malformed input.
#pragma once

#include <cstdint>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace ctpu {

struct Json {
  enum class Type { Null, Bool, Num, Str, Arr, Obj };
  Type type = Type::Null;
  bool boolean = false;
  double num = 0.0;
  std::string str;
  std::vector<Json> arr;
  std::map<std::string, Json> obj;

  bool is_null() const { return type == Type::Null; }
  bool as_bool() const { require(Type::Bool, "bool"); return boolean; }
  double as_num() const { require(Type::Num, "number"); return num; }
  int64_t as_int() const { return static_cast<int64_t>(as_num()); }
  const std::string &as_str() const { require(Type::Str, "string"); return str; }
  const std::vector<Json> &as_arr() const { require(Type::Arr, "array"); return arr; }

  const Json &operator[](const std::string &key) const {
    require(Type::Obj, "object");
    auto it = obj.find(key);
    if (it == obj.end()) {
      static const Json null_json;
      return null_json;
    }
    return it->second;
  }
  bool has(const std::string &key) const {
    return type == Type::Obj && obj.count(key) > 0;
  }

 private:
  void require(Type t, const char *name) const {
    if (type != t) throw std::runtime_error(std::string("json: expected ") + name);
  }
};

class JsonParser {
 public:
  static Json parse(const std::string &text) {
    JsonParser p(text);
    Json v = p.value();
    p.skip_ws();
    if (p.pos_ != text.size()) p.fail("trailing data");
    return v;
  }

 private:
  explicit JsonParser(const std::string &t) : text_(t) {}

  const std::string &text_;
  size_t pos_ = 0;
  int depth_ = 0;

  [[noreturn]] void fail(const std::string &msg) const {
    throw std::runtime_error("json: " + msg + " at byte " + std::to_string(pos_));
  }
  void skip_ws() {
    while (pos_ < text_.size() &&
           (text_[pos_] == ' ' || text_[pos_] == '\t' || text_[pos_] == '\n' ||
            text_[pos_] == '\r'))
      pos_++;
  }
  char peek() {
    if (pos_ >= text_.size()) fail("unexpected end of input");
    return text_[pos_];
  }
  void expect(char c) {
    if (peek() != c) fail(std::string("expected '") + c + "'");
    pos_++;
  }

  Json value() {
    // untrusted input: bound the object/array nesting so a crafted
    // header fails with a runtime_error instead of a stack overflow
    if (depth_ > 256) fail("nesting too deep");
    skip_ws();
    switch (peek()) {
      case '{': { depth_++; Json v = object(); depth_--; return v; }
      case '[': { depth_++; Json v = array(); depth_--; return v; }
      case '"': { Json v; v.type = Json::Type::Str; v.str = string(); return v; }
      case 't': literal("true");  { Json v; v.type = Json::Type::Bool; v.boolean = true; return v; }
      case 'f': literal("false"); { Json v; v.type = Json::Type::Bool; v.boolean = false; return v; }
      case 'n': literal("null");  return Json{};
      default:  return number();
    }
  }

  void literal(const char *lit) {
    for (const char *c = lit; *c; c++) {
      if (pos_ >= text_.size() || text_[pos_] != *c) fail("bad literal");
      pos_++;
    }
  }

  Json object() {
    expect('{');
    Json v; v.type = Json::Type::Obj;
    skip_ws();
    if (peek() == '}') { pos_++; return v; }
    while (true) {
      skip_ws();
      std::string key = string();
      skip_ws(); expect(':');
      v.obj[key] = value();
      skip_ws();
      if (peek() == ',') { pos_++; continue; }
      expect('}');
      return v;
    }
  }

  Json array() {
    expect('[');
    Json v; v.type = Json::Type::Arr;
    skip_ws();
    if (peek() == ']') { pos_++; return v; }
    while (true) {
      v.arr.push_back(value());
      skip_ws();
      if (peek() == ',') { pos_++; continue; }
      expect(']');
      return v;
    }
  }

  std::string string() {
    expect('"');
    std::string out;
    while (true) {
      if (pos_ >= text_.size()) fail("unterminated string");
      char c = text_[pos_++];
      if (c == '"') return out;
      if (c != '\\') { out += c; continue; }
      if (pos_ >= text_.size()) fail("bad escape");
      char e = text_[pos_++];
      switch (e) {
        case '"': out += '"'; break;
        case '\\': out += '\\'; break;
        case '/': out += '/'; break;
        case 'b': out += '\b'; break;
        case 'f': out += '\f'; break;
        case 'n': out += '\n'; break;
        case 'r': out += '\r'; break;
        case 't': out += '\t'; break;
        case 'u': {
          if (pos_ + 4 > text_.size()) fail("bad \\u escape");
          unsigned cp = 0;
          for (int i = 0; i < 4; i++) {
            char h = text_[pos_++];
            cp <<= 4;
            if (h >= '0' && h <= '9') cp |= h - '0';
            else if (h >= 'a' && h <= 'f') cp |= h - 'a' + 10;
            else if (h >= 'A' && h <= 'F') cp |= h - 'A' + 10;
            else fail("bad hex digit");
          }
          // UTF-8 encode (BMP only; the formats never emit surrogates)
          if (cp < 0x80) out += static_cast<char>(cp);
          else if (cp < 0x800) {
            out += static_cast<char>(0xC0 | (cp >> 6));
            out += static_cast<char>(0x80 | (cp & 0x3F));
          } else {
            out += static_cast<char>(0xE0 | (cp >> 12));
            out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
            out += static_cast<char>(0x80 | (cp & 0x3F));
          }
          break;
        }
        default: fail("bad escape");
      }
    }
  }

  Json number() {
    size_t start = pos_;
    if (peek() == '-') pos_++;
    while (pos_ < text_.size() &&
           (isdigit(static_cast<unsigned char>(text_[pos_])) || text_[pos_] == '.' ||
            text_[pos_] == 'e' || text_[pos_] == 'E' || text_[pos_] == '+' ||
            text_[pos_] == '-'))
      pos_++;
    if (pos_ == start) fail("expected value");
    std::string tok = text_.substr(start, pos_ - start);
    Json v; v.type = Json::Type::Num;
    size_t used = 0;
    try {
      v.num = std::stod(tok, &used);
    } catch (const std::exception &) {
      fail("bad number '" + tok + "'");
    }
    if (used != tok.size()) fail("bad number '" + tok + "'");
    return v;
  }
};

inline std::string json_escape(const std::string &s) {
  std::string out;
  for (char c : s) {
    switch (c) {
      case '"': out += "\\\""; break;
      case '\\': out += "\\\\"; break;
      case '\n': out += "\\n"; break;
      case '\r': out += "\\r"; break;
      case '\t': out += "\\t"; break;
      default: out += c;
    }
  }
  return out;
}

}  // namespace ctpu
