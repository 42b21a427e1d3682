// concrete-tpu-client: a second-language (C++) client frontend.
//
// The native counterpart of concrete_tpu.compilation.client.Client — it
// speaks the framework's deployment formats directly (ClientSpecs JSON,
// npz keysets, CTPV1 transport values) with no Python dependency, filling
// the role of the reference's Rust client frontend
// (frontends/concrete-rust, ClientLib lib/Common/Keysets.cpp): a deployed
// client encrypts inputs and decrypts results; the TPU server runs the
// circuit.
//
//   concrete-tpu-client inspect --specs specs.json
//   concrete-tpu-client encrypt --specs specs.json --keys keys.npz \
//       --out outdir 3 '[1, 2, 3]' ...      -> outdir/arg0.ctv ...
//   concrete-tpu-client decrypt --specs specs.json --keys keys.npz \
//       result0.ctv [result1.ctv ...]       -> decoded JSON on stdout
//
// Exactness: encode/decode/LWE math is bit-compatible with
// core/refimpl.py; ciphertexts produced here decrypt/evaluate identically
// to Python-client ones (tests/test_cpp_client.py round-trips both ways).

#include <cstdint>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "csprng.h"
#include "json.h"
#include "keygen.h"
#include "npz.h"
#include "npz_write.h"
#include "run.h"
#include "specs.h"
#include "tfhe.h"
#include "value.h"

namespace {

using namespace ctpu;

[[noreturn]] void die(const std::string &msg) {
  std::cerr << "concrete-tpu-client: " << msg << std::endl;
  exit(1);
}

struct Args {
  std::string cmd, specs, keys, out, server;
  std::vector<std::string> rest;
};

Args parse_args(int argc, char **argv) {
  if (argc < 2) die("usage: concrete-tpu-client <inspect|encrypt|decrypt> ...");
  Args a;
  a.cmd = argv[1];
  for (int i = 2; i < argc; i++) {
    std::string s = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) die("missing value for " + s);
      return argv[++i];
    };
    if (s == "--specs") a.specs = next();
    else if (s == "--keys") a.keys = next();
    else if (s == "--out") a.out = next();
    else if (s == "--server") a.server = next();
    else a.rest.push_back(s);
  }
  return a;
}

// Load the big LWE secret key (flattened GLWE key) from a keyset npz
// written by compilation/keys.py Keys.save.
std::vector<uint64_t> load_big_key(const std::string &path,
                                   const ClientSpecs &specs) {
  auto npz = load_npz(path);
  auto it = npz.find("glwe");
  if (it == npz.end()) die("keys: no 'glwe' entry in " + path);
  const NpyArray &glwe = it->second;
  if (glwe.size() != static_cast<uint64_t>(specs.n_big()))
    die("keys: glwe key has " + std::to_string(glwe.size()) +
        " coefficients, specs expect " + std::to_string(specs.n_big()));
  const uint64_t *p = glwe.as_u64();
  return std::vector<uint64_t>(p, p + glwe.size());
}

// Flatten a parsed JSON literal (scalar or nested arrays) row-major,
// verifying it matches the gate's shape.
void flatten(const Json &v, const std::vector<int64_t> &shape, size_t dim,
             std::vector<int64_t> &out) {
  if (dim == shape.size()) {
    if (v.type != Json::Type::Num) die("argument: expected integer");
    out.push_back(v.as_int());
    return;
  }
  if (v.type != Json::Type::Arr ||
      static_cast<int64_t>(v.arr.size()) != shape[dim])
    die("argument: shape mismatch at axis " + std::to_string(dim));
  for (const Json &e : v.arr) flatten(e, shape, dim + 1, out);
}

std::string dump_array(const int64_t *vals, const std::vector<int64_t> &shape,
                       size_t dim, size_t &pos) {
  if (dim == shape.size()) return std::to_string(vals[pos++]);
  std::string out = "[";
  for (int64_t i = 0; i < shape[dim]; i++) {
    if (i) out += ", ";
    out += dump_array(vals, shape, dim + 1, pos);
  }
  return out + "]";
}

int cmd_inspect(const Args &a) {
  ClientSpecs s = ClientSpecs::load(a.specs);
  std::cout << "params: n_small=" << s.n_small << " k=" << s.glwe_dimension
            << " N=" << s.polynomial_size << " n_big=" << s.n_big()
            << " lwe_std=" << s.lwe_std << "\n";
  std::cout << "message_bits: " << s.message_bits
            << (s.is_multi ? " (multi-partition)" : "") << "\n";
  auto show = [&](const char *label, const std::vector<GateSpec> &gates,
                  bool input) {
    for (size_t i = 0; i < gates.size(); i++) {
      const GateSpec &g = gates[i];
      std::cout << label << i << ": "
                << (g.is_encrypted ? "encrypted" : "clear") << " "
                << (g.is_signed ? "int" : "uint") << g.bit_width << " shape=(";
      for (size_t d = 0; d < g.shape.size(); d++)
        std::cout << (d ? "," : "") << g.shape[d];
      std::cout << ") width="
                << (input ? s.input_width(i) : s.output_width(i)) << "\n";
    }
  };
  show("input ", s.inputs, true);
  show("output ", s.outputs, false);
  return 0;
}

int cmd_encrypt(const Args &a) {
  ClientSpecs s = ClientSpecs::load(a.specs);
  if (s.is_multi)
    die("multi-partition circuits need per-partition keys; use the Python "
        "client for now");
  if (a.rest.size() != s.inputs.size())
    die("expected " + std::to_string(s.inputs.size()) + " argument(s), got " +
        std::to_string(a.rest.size()));
  std::vector<uint64_t> sk = load_big_key(a.keys, s);
  size_t n = sk.size();
  Csprng rng;

  for (size_t pos = 0; pos < a.rest.size(); pos++) {
    const GateSpec &g = s.inputs[pos];
    Json lit = JsonParser::parse(a.rest[pos]);
    std::vector<int64_t> vals;
    flatten(lit, g.shape, 0, vals);
    for (int64_t v : vals)
      if (v < g.min_value() || v > g.max_value())
        die("argument " + std::to_string(pos) + " value " + std::to_string(v) +
            " outside the compiled range [" + std::to_string(g.min_value()) +
            ", " + std::to_string(g.max_value()) + "]");

    TransportValue out;
    out.shape = g.shape;
    if (!g.is_encrypted) {
      out.dtype = "int64";
      out.is_encrypted = false;
      out.payload.resize(vals.size() * 8);
      memcpy(out.payload.data(), vals.data(), out.payload.size());
    } else {
      int width = s.input_width(pos);
      out.dtype = "uint64";
      out.is_encrypted = true;
      out.shape.push_back(static_cast<int64_t>(n) + 1);
      out.payload.resize(vals.size() * (n + 1) * 8);
      uint64_t *ct = reinterpret_cast<uint64_t *>(out.payload.data());
      for (size_t i = 0; i < vals.size(); i++)
        // fresh inputs encrypt under the BIG (glwe) key at its own
        // curve-minimal noise (client.py _secret_for): the small
        // key's much larger lwe_std would drown levelled circuits
        lwe_encrypt(rng, sk.data(), n, encode(vals[i], width),
                    s.glwe_std, ct + i * (n + 1));
    }
    std::string path = a.out + "/arg" + std::to_string(pos) + ".ctv";
    out.save(path);
    std::cout << path << "\n";
  }
  return 0;
}

int cmd_keygen(const Args &a) {
  // concrete-tpu-client keygen --specs specs.json --out keys.npz
  //
  // Generates a FULL keyset (secret keys + BSK + KSK + PFPKSK when the
  // circuit uses WoP-PBS) with no Python on the trust side — the
  // second-language keygen the reference ships as concrete-keygen
  // (frontends/concrete-rust/concrete-keygen/src/lib.rs).  The archive is
  // Keys.load-compatible; hand the server Keys.evaluation material only.
  ClientSpecs s = ClientSpecs::load(a.specs);
  if (s.is_multi)
    die("multi-partition keygen is not supported natively yet; use the "
        "Python client for multi circuits");
  if (a.out.empty()) die("keygen: --out keys.npz is required");
  Csprng rng;
  KeygenResult kg = generate_keys(s, rng);
  write_keys_npz(a.out, s, kg);
  std::cout << a.out << "\n";
  return 0;
}

int cmd_run(const Args &a) {
  // concrete-tpu-client run --server server.zip --keys keys.npz
  //     --out outdir arg0.ctv [arg1.ctv ...]   -> outdir/result0.ctv ...
  //
  // Executes the deployment archive natively (run.h NativeExecutor): the
  // C++ analog of Server.run, closing the second-language deployment loop
  // (keygen -> encrypt -> run -> decrypt with no Python anywhere).
  if (a.server.empty()) die("run: --server server.zip is required");
  if (a.keys.empty()) die("run: --keys keys.npz is required");
  if (a.out.empty()) die("run: --out outdir is required");
  auto entries = read_zip_entries(read_file_bytes(a.server));
  auto need = [&](const char *name) -> std::vector<uint8_t> & {
    auto it = entries.find(name);
    if (it == entries.end())
      die(std::string("run: archive has no ") + name);
    return it->second;
  };
  ClientSpecs specs = ClientSpecs::parse(std::string(
      need("client.specs.json").begin(), need("client.specs.json").end()));
  Json graph_json = JsonParser::parse(std::string(
      need("graph.json").begin(), need("graph.json").end()));
  auto arrays = parse_npz_bytes(need("graph_arrays.npz"));
  auto keys = load_npz(a.keys);

  rt::LoadedGraph graph = rt::parse_graph(graph_json);
  if (a.rest.size() != specs.inputs.size())
    die("run: expected " + std::to_string(specs.inputs.size()) +
        " argument file(s), got " + std::to_string(a.rest.size()));

  NativeExecutor ex(specs, std::move(graph), std::move(arrays), keys);
  std::map<int, Tensor> inputs;
  for (size_t pos = 0; pos < a.rest.size(); pos++) {
    const GateSpec &g = specs.inputs[pos];
    TransportValue v = TransportValue::load(a.rest[pos]);
    if (v.is_encrypted != g.is_encrypted)
      die("run: argument " + std::to_string(pos) +
          " encryption flag does not match the circuit specs");
    Tensor t;
    if (g.is_encrypted) {
      if (v.shape.empty() ||
          v.shape.back() != static_cast<int64_t>(ex.n_big()) + 1)
        die("run: argument " + std::to_string(pos) + " has the wrong "
            "ciphertext size for these parameters");
      t.encrypted = true;
      t.shape.assign(v.shape.begin(), v.shape.end() - 1);
      t.ct_len = ex.n_big() + 1;
      const uint64_t *p = v.as_u64();
      t.ct.assign(p, p + v.size());
    } else {
      t.shape = v.shape;
      const int64_t *p = v.as_i64();
      t.clear.assign(p, p + v.size());
    }
    if (t.elements() != g.size())
      die("run: argument " + std::to_string(pos) + " shape mismatch");
    inputs[static_cast<int>(pos)] = std::move(t);
  }

  std::vector<Tensor> outs = ex.run(std::move(inputs));
  for (size_t pos = 0; pos < outs.size(); pos++) {
    const Tensor &t = outs[pos];
    TransportValue v;
    v.shape = t.shape;
    v.is_encrypted = t.encrypted;
    if (t.encrypted) {
      v.dtype = "uint64";
      v.shape.push_back(static_cast<int64_t>(t.ct_len));
      v.payload.resize(t.ct.size() * 8);
      memcpy(v.payload.data(), t.ct.data(), v.payload.size());
    } else {
      v.dtype = "int64";
      v.payload.resize(t.clear.size() * 8);
      memcpy(v.payload.data(), t.clear.data(), v.payload.size());
    }
    std::string path = a.out + "/result" + std::to_string(pos) + ".ctv";
    v.save(path);
    std::cout << path << "\n";
  }
  return 0;
}

int cmd_decrypt(const Args &a) {
  ClientSpecs s = ClientSpecs::load(a.specs);
  if (s.is_multi)
    die("multi-partition circuits need per-partition keys; use the Python "
        "client for now");
  if (a.rest.size() != s.outputs.size())
    die("expected " + std::to_string(s.outputs.size()) + " result file(s), "
        "got " + std::to_string(a.rest.size()));
  std::vector<uint64_t> sk = load_big_key(a.keys, s);
  size_t n = sk.size();

  std::string out = a.rest.size() > 1 ? "[" : "";
  for (size_t pos = 0; pos < a.rest.size(); pos++) {
    const GateSpec &g = s.outputs[pos];
    TransportValue v = TransportValue::load(a.rest[pos]);
    int width = s.output_width(pos);
    std::vector<int64_t> decoded(g.size());
    if (v.is_encrypted != g.is_encrypted)
      die("result " + std::to_string(pos) +
          " encryption flag does not match the circuit specs");
    if (!v.is_encrypted) {
      if (v.size() != g.size())
        die("result " + std::to_string(pos) + " has " +
            std::to_string(v.size()) + " elements, specs expect " +
            std::to_string(g.size()));
      const int64_t *p = v.as_i64();
      for (int64_t i = 0; i < g.size(); i++) decoded[i] = p[i];
    } else {
      if (v.shape.empty() ||
          v.shape.back() != static_cast<int64_t>(n) + 1 ||
          v.size() != g.size() * static_cast<int64_t>(n + 1))
        die("result " + std::to_string(pos) + " has the wrong shape");
      const uint64_t *ct = v.as_u64();
      for (int64_t i = 0; i < g.size(); i++)
        decoded[i] = decode(lwe_decrypt(sk.data(), n, ct + i * (n + 1)),
                            width, g.is_signed);
    }
    size_t p = 0;
    if (pos) out += ", ";
    out += dump_array(decoded.data(), g.shape, 0, p);
  }
  if (a.rest.size() > 1) out += "]";
  std::cout << out << std::endl;
  return 0;
}

}  // namespace

int main(int argc, char **argv) {
  try {
    Args a = parse_args(argc, argv);
    if (a.cmd == "inspect") return cmd_inspect(a);
    if (a.cmd == "keygen") return cmd_keygen(a);
    if (a.cmd == "encrypt") return cmd_encrypt(a);
    if (a.cmd == "run") return cmd_run(a);
    if (a.cmd == "decrypt") return cmd_decrypt(a);
    die("unknown command '" + a.cmd + "'");
  } catch (const std::exception &e) {
    die(e.what());
  }
}
