// ClientSpecs: the JSON sidecar a client needs to encrypt/decrypt for a
// compiled circuit (compilation/specs.py ClientSpecs.serialize; the analog
// of the reference's ProgramInfo / client.specs.json,
// lib/Support/ProgramInfoGeneration.cpp).
#pragma once

#include <cstdint>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "json.h"

namespace ctpu {

struct GateSpec {
  int bit_width = 0;
  bool is_signed = false;
  std::vector<int64_t> shape;
  bool is_encrypted = true;

  int64_t size() const {
    int64_t n = 1;
    for (int64_t d : shape) n *= d;
    return n;
  }
  int64_t min_value() const {
    return is_signed ? -(int64_t(1) << (bit_width - 1)) : 0;
  }
  int64_t max_value() const {
    return is_signed ? (int64_t(1) << (bit_width - 1)) - 1
                     : (int64_t(1) << bit_width) - 1;
  }
};

struct ClientSpecs {
  // mono-keyset crypto parameters (params.py CryptoParams)
  int n_small = 0, glwe_dimension = 0, polynomial_size = 0;
  int pbs_level = 0, pbs_base_log = 0, ks_level = 0, ks_base_log = 0;
  int security_level = 128;
  double lwe_std = 0.0, glwe_std = 0.0;
  // WoP gadgets (specs "wop_gadgets": [cbs_l, cbs_b, pfks_l, pfks_b])
  bool has_wop = false;
  int cbs_level = 0, cbs_base_log = 0, pfks_level = 0, pfks_base_log = 0;
  int message_bits = 0;
  std::vector<GateSpec> inputs, outputs;
  std::vector<int> input_widths, output_widths;   // empty -> message_bits
  bool is_multi = false;

  int n_big() const { return glwe_dimension * polynomial_size; }
  int input_width(size_t pos) const {
    return input_widths.empty() ? message_bits : input_widths[pos];
  }
  int output_width(size_t pos) const {
    return output_widths.empty() ? message_bits : output_widths[pos];
  }

  static ClientSpecs parse(const std::string &text) {
    Json root = JsonParser::parse(text);
    ClientSpecs s;
    const Json &p = root["params"];
    s.n_small = static_cast<int>(p["n_small"].as_int());
    s.glwe_dimension = static_cast<int>(p["glwe_dimension"].as_int());
    s.polynomial_size = static_cast<int>(p["polynomial_size"].as_int());
    s.lwe_std = p["lwe_std"].as_num();
    s.glwe_std = p["glwe_std"].as_num();
    s.pbs_level = static_cast<int>(p["pbs_level"].as_int());
    s.pbs_base_log = static_cast<int>(p["pbs_base_log"].as_int());
    s.ks_level = static_cast<int>(p["ks_level"].as_int());
    s.ks_base_log = static_cast<int>(p["ks_base_log"].as_int());
    if (!p["security_level"].is_null())
      s.security_level = static_cast<int>(p["security_level"].as_int());
    s.message_bits = static_cast<int>(root["message_bits"].as_int());
    if (!root["wop_gadgets"].is_null()) {
      const auto &g = root["wop_gadgets"].as_arr();
      if (g.size() != 4)
        throw std::runtime_error("specs: wop_gadgets must have 4 entries");
      s.has_wop = true;
      s.cbs_level = static_cast<int>(g[0].as_int());
      s.cbs_base_log = static_cast<int>(g[1].as_int());
      s.pfks_level = static_cast<int>(g[2].as_int());
      s.pfks_base_log = static_cast<int>(g[3].as_int());
    }
    auto gates = [](const Json &arr) {
      std::vector<GateSpec> out;
      for (const Json &g : arr.as_arr()) {
        GateSpec gs;
        gs.bit_width = static_cast<int>(g["bit_width"].as_int());
        gs.is_signed = g["is_signed"].as_bool();
        gs.is_encrypted = g["is_encrypted"].as_bool();
        for (const Json &d : g["shape"].as_arr())
          gs.shape.push_back(d.as_int());
        out.push_back(gs);
      }
      return out;
    };
    s.inputs = gates(root["inputs"]);
    s.outputs = gates(root["outputs"]);
    if (!root["input_widths"].is_null())
      for (const Json &w : root["input_widths"].as_arr())
        s.input_widths.push_back(static_cast<int>(w.as_int()));
    if (!root["output_widths"].is_null())
      for (const Json &w : root["output_widths"].as_arr())
        s.output_widths.push_back(static_cast<int>(w.as_int()));
    s.is_multi = !root["partitions"].is_null();
    return s;
  }

  static ClientSpecs load(const std::string &path) {
    std::ifstream f(path);
    if (!f) throw std::runtime_error("specs: cannot open " + path);
    std::stringstream ss;
    ss << f.rdbuf();
    return parse(ss.str());
  }
};

}  // namespace ctpu
