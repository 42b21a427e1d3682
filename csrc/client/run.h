// Native circuit execution: a C++ evaluator over the deployment archive.
//
// The reference's second-language frontend EXECUTES compiled circuits
// (frontends/concrete-rust/concrete/src/ffi.rs: ServerProgram over the
// dlopen'ed artifact); this is the analog over our data-only archive
// (Server.save: client.specs.json + graph.json + graph_arrays.npz).  A
// topological interpreter evaluates the graph with exact mod-2^64 TFHE
// math mirroring core/refimpl.py (which itself cites the reference
// semantics): leveled ops are LWE-linear, TLUs run the full
// KS -> modswitch -> blind rotate -> sample extract pipeline over the raw
// u64 keys the native keygen (keygen.h) already produces.
//
// Because keyswitch and blind rotation are deterministic given the keys,
// the output ciphertexts decrypt to exactly what the Python/TPU server
// produces for the same inputs (tests/test_cpp_client.py round-trips the
// two against each other).
//
// Scope (fails with a clear error otherwise): mono-partition circuits,
// native-width TLUs (<= min(8, log2(N)-1) effective bits).  WoP/CRT wide
// TLUs, multivariate packing, and multi-partition crossing need the
// Python/TPU server.
#pragma once

#include <algorithm>
#include <cstdint>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

#include "json.h"
#include "npz.h"
#include "specs.h"
#include "run_primitives.h"
#include "wop.h"

namespace ctpu {

// ---------------------------------------------------------------------------
// Tensors: clear int64 values or encrypted u64 LWE arrays (ct axis last,
// length n_big+1 — matching the Python executor's layout).
// ---------------------------------------------------------------------------

struct Tensor {
  bool encrypted = false;
  std::vector<int64_t> shape;     // data shape (WITHOUT the ct axis)
  size_t ct_len = 0;              // n_big+1 when encrypted
  std::vector<int64_t> clear;     // row-major, when !encrypted
  std::vector<uint64_t> ct;       // row-major (elements * ct_len)

  int64_t elements() const {
    int64_t n = 1;
    for (int64_t d : shape) n *= d;
    return n;
  }
};

namespace rt {

// -- numpy-style broadcasting over data shapes -------------------------------

inline std::vector<int64_t> broadcast_shape(const std::vector<int64_t> &a,
                                            const std::vector<int64_t> &b) {
  std::vector<int64_t> out(std::max(a.size(), b.size()));
  for (size_t i = 0; i < out.size(); i++) {
    int64_t da = i < out.size() - a.size() ? 1 : a[i - (out.size() - a.size())];
    int64_t db = i < out.size() - b.size() ? 1 : b[i - (out.size() - b.size())];
    if (da != db && da != 1 && db != 1) fail("shapes do not broadcast");
    out[i] = std::max(da, db);
  }
  return out;
}

// Row-major strides of `shape` as seen from broadcast shape `out`
// (stride 0 on broadcast axes).
inline std::vector<int64_t> broadcast_strides(
    const std::vector<int64_t> &shape, const std::vector<int64_t> &out) {
  std::vector<int64_t> st(out.size(), 0);
  int64_t acc = 1;
  for (size_t i = shape.size(); i-- > 0;) {
    size_t o = i + (out.size() - shape.size());
    st[o] = shape[i] == 1 ? 0 : acc;
    acc *= shape[i];
  }
  return st;
}

// Iterate the flat index pairs of two broadcast operands.
template <typename F>
inline void broadcast_for_each(const std::vector<int64_t> &sa,
                               const std::vector<int64_t> &sb,
                               const std::vector<int64_t> &out, F f) {
  std::vector<int64_t> sta = broadcast_strides(sa, out);
  std::vector<int64_t> stb = broadcast_strides(sb, out);
  int64_t total = 1;
  for (int64_t d : out) total *= d;
  std::vector<int64_t> idx(out.size(), 0);
  for (int64_t flat = 0; flat < total; flat++) {
    int64_t ia = 0, ib = 0;
    for (size_t i = 0; i < out.size(); i++) {
      ia += idx[i] * sta[i];
      ib += idx[i] * stb[i];
    }
    f(flat, ia, ib);
    for (size_t i = out.size(); i-- > 0;) {
      if (++idx[i] < out[i]) break;
      idx[i] = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Graph records (graph_io.py schema)
// ---------------------------------------------------------------------------

struct GraphNode {
  std::string operation;          // "input" | "constant" | "generic"
  std::string name;               // op name for generic nodes
  bool approximate = false;       // Exactness.APPROXIMATE truncation
  bool out_encrypted = false, out_signed = false;
  int out_bits = 0;
  std::vector<int64_t> out_shape;
  int encoding_width = 0;         // 0 -> circuit default
  Json kwargs;                    // generic kwargs (may be Null)
  Json constant;                  // constant payload record
  std::vector<int> preds;         // node index per input position
};

struct LoadedGraph {
  std::vector<GraphNode> nodes;   // topological order (serialized that way)
  std::map<int, int> inputs;      // position -> node index
  std::map<int, int> outputs;     // position -> node index
};

inline LoadedGraph parse_graph(const Json &record) {
  if (record["version"].as_int() > 1) fail("graph format too new");
  LoadedGraph g;
  const auto &nodes = record["nodes"].as_arr();
  g.nodes.resize(nodes.size());
  for (size_t i = 0; i < nodes.size(); i++) {
    const Json &rec = nodes[i];
    GraphNode &n = g.nodes[i];
    n.operation = rec["operation"].as_str();
    if (!rec["name"].is_null()) n.name = rec["name"].as_str();
    const Json &out = rec["output"];
    n.out_encrypted = out["is_encrypted"].as_bool();
    n.out_signed = out["is_signed"].as_bool();
    n.out_bits = static_cast<int>(out["bit_width"].as_int());
    for (const Json &d : out["shape"].as_arr())
      n.out_shape.push_back(d.as_int());
    if (!rec["encoding_width"].is_null())
      n.encoding_width = static_cast<int>(rec["encoding_width"].as_int());
    if (rec.has("approximate") && rec["approximate"].as_bool())
      n.approximate = true;
    n.kwargs = rec["kwargs"];       // copies (Null when absent)
    n.constant = rec["constant"];
    n.preds.assign(rec["inputs"].as_arr().size(), -1);
  }
  for (const Json &e : record["edges"].as_arr()) {
    int u = static_cast<int>(e.as_arr()[0].as_int());
    int v = static_cast<int>(e.as_arr()[1].as_int());
    int idx = static_cast<int>(e.as_arr()[2].as_int());
    if (idx >= static_cast<int>(g.nodes[v].preds.size()))
      g.nodes[v].preds.resize(idx + 1, -1);
    g.nodes[v].preds[idx] = u;
  }
  for (const auto &kv : record["inputs"].obj)
    g.inputs[std::stoi(kv.first)] = static_cast<int>(kv.second.as_int());
  for (const auto &kv : record["outputs"].obj)
    g.outputs[std::stoi(kv.first)] = static_cast<int>(kv.second.as_int());
  return g;
}

// Decode a kwargs/constant value that should be an integer tensor:
// {"__ndarray__": key} into the arrays npz, a bare number, or a (nested)
// __list__/__tuple__ of numbers.
struct I64Array {
  std::vector<int64_t> shape;
  std::vector<int64_t> data;
};

inline void flatten_json_nums(const Json &v, std::vector<int64_t> &out,
                              std::vector<int64_t> &shape, size_t depth) {
  const std::vector<Json> *items = nullptr;
  if (v.type == Json::Type::Obj && v.has("__list__"))
    items = &v["__list__"].as_arr();
  else if (v.type == Json::Type::Obj && v.has("__tuple__"))
    items = &v["__tuple__"].as_arr();
  else if (v.type == Json::Type::Arr)
    items = &v.as_arr();
  if (items) {
    if (depth == shape.size())
      shape.push_back(static_cast<int64_t>(items->size()));
    else if (shape[depth] != static_cast<int64_t>(items->size()))
      fail("ragged nested list in archive kwargs");
    for (const Json &e : *items) flatten_json_nums(e, out, shape, depth + 1);
    return;
  }
  if (v.type != Json::Type::Num) fail("expected integer in archive kwargs");
  out.push_back(v.as_int());
}

inline I64Array decode_i64_array(const Json &v,
                                 const std::map<std::string, NpyArray> &arrays) {
  I64Array out;
  if (v.type == Json::Type::Obj && v.has("__ndarray__")) {
    auto it = arrays.find(v["__ndarray__"].as_str());
    if (it == arrays.end()) fail("missing array payload in archive");
    for (uint64_t d : it->second.shape)
      out.shape.push_back(static_cast<int64_t>(d));
    out.data = it->second.to_i64();
    return out;
  }
  if (v.type == Json::Type::Num) {
    out.data.push_back(v.as_int());
    return out;   // scalar: empty shape
  }
  flatten_json_nums(v, out.data, out.shape, 0);
  return out;
}

// An int-or-int-tuple kwarg (sum axis, transpose axes).  Returns true and
// fills `vals` when present and non-null.
inline bool decode_int_tuple(const Json &v, std::vector<int64_t> &vals) {
  if (v.is_null()) return false;
  if (v.type == Json::Type::Num) {
    vals.push_back(v.as_int());
    return true;
  }
  I64Array arr = decode_i64_array(v, {});
  vals = arr.data;
  return true;
}

}  // namespace rt

// ---------------------------------------------------------------------------
// The interpreter (compilation/executor.py GraphExecutor analog, scoped to
// mono partitions + native TLUs).
// ---------------------------------------------------------------------------

class NativeExecutor {
 public:
  NativeExecutor(const ClientSpecs &specs, rt::LoadedGraph graph,
                 std::map<std::string, NpyArray> arrays,
                 const std::map<std::string, NpyArray> &keys)
      : specs_(specs), graph_(std::move(graph)), arrays_(std::move(arrays)) {
    if (specs_.is_multi)
      rt::fail("multi-partition circuits need the Python/TPU server");
    n_ = static_cast<size_t>(specs_.polynomial_size);
    k_ = static_cast<size_t>(specs_.glwe_dimension);
    n_small_ = static_cast<size_t>(specs_.n_small);
    n_big_ = k_ * n_;
    log2_n_ = 0;
    while ((size_t(1) << (log2_n_ + 1)) <= n_) log2_n_++;
    auto need = [&](const char *name) -> const NpyArray & {
      auto it = keys.find(name);
      if (it == keys.end())
        rt::fail(std::string("keys: missing '") + name +
                 "' (run expects the full keyset npz from keygen)");
      return it->second;
    };
    const NpyArray &bsk = need("bsk"), &ksk = need("ksk");
    if (bsk.size() != n_small_ * specs_.pbs_level * (k_ + 1) * (k_ + 1) * n_)
      rt::fail("keys: bsk shape does not match the circuit parameters");
    if (ksk.size() != n_big_ * specs_.ks_level * (n_small_ + 1))
      rt::fail("keys: ksk shape does not match the circuit parameters");
    bsk_ = bsk.as_u64();
    ksk_ = ksk.as_u64();
    if (specs_.has_wop) {
      std::string pfname = "pfpksk_" + std::to_string(specs_.pfks_level) +
                           "_" + std::to_string(specs_.pfks_base_log);
      auto it = keys.find(pfname);
      if (it != keys.end()) {
        size_t want = (k_ + 1) * (n_big_ + 1) *
                      static_cast<size_t>(specs_.pfks_level) * (k_ + 1) * n_;
        if (it->second.size() != want)
          rt::fail("keys: pfpksk shape does not match the circuit "
                   "parameters");
        pfpksk_ = it->second.as_u64();
      }
    }
  }

  // Evaluate the circuit.  `inputs` maps input position -> Tensor.
  std::vector<Tensor> run(std::map<int, Tensor> inputs) {
    std::vector<Tensor> values(graph_.nodes.size());
    std::vector<int> node_of_input(graph_.nodes.size(), -1);
    for (const auto &kv : graph_.inputs) node_of_input[kv.second] = kv.first;

    for (size_t ni = 0; ni < graph_.nodes.size(); ni++) {
      const rt::GraphNode &node = graph_.nodes[ni];
      if (node.operation == "input") {
        auto it = inputs.find(node_of_input[ni]);
        if (it == inputs.end()) rt::fail("missing circuit input");
        values[ni] = std::move(it->second);
        continue;
      }
      if (node.operation == "constant") {
        rt::I64Array c = rt::decode_i64_array(node.constant, arrays_);
        Tensor t;
        t.shape = c.shape;
        t.clear = std::move(c.data);
        values[ni] = std::move(t);
        continue;
      }
      values[ni] = eval_generic(node, values);
    }

    std::vector<Tensor> out;
    for (const auto &kv : graph_.outputs)
      out.push_back(values[kv.second]);
    return out;
  }

  size_t n_big() const { return n_big_; }

 private:
  const ClientSpecs &specs_;
  rt::LoadedGraph graph_;
  std::map<std::string, NpyArray> arrays_;
  const uint64_t *bsk_ = nullptr;
  const uint64_t *ksk_ = nullptr;
  const uint64_t *pfpksk_ = nullptr;
  size_t n_ = 0, k_ = 0, n_small_ = 0, n_big_ = 0;
  int log2_n_ = 0;
  // shared per-element GGSW stacks across the sibling output residues of
  // one fhe.crt_tlu (executor.py crt_ggsw_cache), keyed by pred indices
  std::map<std::vector<int>, std::vector<std::vector<wop::Ggsw>>>
      crt_ggsw_cache_;

  wop::CryptoShape wop_shape() const {
    wop::CryptoShape s;
    s.n_small = n_small_;
    s.k = k_;
    s.n = n_;
    s.n_big = n_big_;
    s.log2_n = log2_n_;
    s.pbs_base_log = specs_.pbs_base_log;
    s.pbs_level = specs_.pbs_level;
    s.ks_base_log = specs_.ks_base_log;
    s.ks_level = specs_.ks_level;
    return s;
  }

  wop::WopGadgets wop_gadgets() const {
    wop::WopGadgets g;
    g.cbs_level = specs_.cbs_level;
    g.cbs_base_log = specs_.cbs_base_log;
    g.pfks_level = specs_.pfks_level;
    g.pfks_base_log = specs_.pfks_base_log;
    return g;
  }

  void require_wop(const char *what) const {
    if (!specs_.has_wop)
      rt::fail(std::string(what) +
               " needs WoP-PBS but the circuit was compiled without WoP "
               "gadget parameters");
    if (!pfpksk_)
      rt::fail(std::string(what) +
               " needs WoP-PBS but the keyset has no PFPKSK (regenerate "
               "keys with this circuit's specs)");
  }

  int width_of(const rt::GraphNode &node) const {
    return node.encoding_width ? node.encoding_width : specs_.message_bits;
  }

  int max_native_bits() const {
    int bl = 0;
    size_t v = n_;
    while (v) { bl++; v >>= 1; }
    return std::min(8, bl - 2);
  }

  // Trivial LWE encryption of clear values at `width`.
  Tensor trivial(const Tensor &clear, int width) const {
    Tensor t;
    t.encrypted = true;
    t.shape = clear.shape;
    t.ct_len = n_big_ + 1;
    t.ct.assign(clear.clear.size() * t.ct_len, 0);
    for (size_t i = 0; i < clear.clear.size(); i++)
      t.ct[i * t.ct_len + n_big_] = rt::encode_torus(clear.clear[i], width);
    return t;
  }

  // -- elementwise helpers ---------------------------------------------------

  Tensor add_sub(const Tensor &a, const Tensor &b, bool subtract, int width) {
    using namespace rt;
    std::vector<int64_t> oshape = broadcast_shape(a.shape, b.shape);
    Tensor out;
    out.shape = oshape;
    if (a.encrypted && b.encrypted) {
      out.encrypted = true;
      out.ct_len = a.ct_len;
      out.ct.resize(out.elements() * out.ct_len);
      broadcast_for_each(a.shape, b.shape, oshape,
                         [&](int64_t f, int64_t ia, int64_t ib) {
        const uint64_t *pa = a.ct.data() + ia * a.ct_len;
        const uint64_t *pb = b.ct.data() + ib * b.ct_len;
        uint64_t *po = out.ct.data() + f * out.ct_len;
        for (size_t m = 0; m < out.ct_len; m++)
          po[m] = subtract ? pa[m] - pb[m] : pa[m] + pb[m];
      });
    } else if (a.encrypted || b.encrypted) {
      const Tensor &e = a.encrypted ? a : b;
      const Tensor &c = a.encrypted ? b : a;
      bool enc_left = a.encrypted;
      out.encrypted = true;
      out.ct_len = e.ct_len;
      out.ct.resize(out.elements() * out.ct_len);
      broadcast_for_each(a.shape, b.shape, oshape,
                         [&](int64_t f, int64_t ia, int64_t ib) {
        int64_t ie = enc_left ? ia : ib, ic = enc_left ? ib : ia;
        const uint64_t *pe = e.ct.data() + ie * e.ct_len;
        uint64_t enc_c = rt::encode_torus(c.clear[ic], width);
        uint64_t *po = out.ct.data() + f * out.ct_len;
        // enc + clear / enc - clear / clear - enc (executor.py:537-553)
        if (!subtract) {
          for (size_t m = 0; m < out.ct_len; m++) po[m] = pe[m];
          po[out.ct_len - 1] += enc_c;
        } else if (enc_left) {
          for (size_t m = 0; m < out.ct_len; m++) po[m] = pe[m];
          po[out.ct_len - 1] -= enc_c;
        } else {
          for (size_t m = 0; m < out.ct_len; m++)
            po[m] = static_cast<uint64_t>(-static_cast<int64_t>(pe[m]));
          po[out.ct_len - 1] += enc_c;
        }
      });
    } else {
      out.clear.resize(out.elements());
      broadcast_for_each(a.shape, b.shape, oshape,
                         [&](int64_t f, int64_t ia, int64_t ib) {
        out.clear[f] = subtract ? a.clear[ia] - b.clear[ib]
                                : a.clear[ia] + b.clear[ib];
      });
    }
    return out;
  }

  Tensor multiply(const Tensor &a, const Tensor &b) {
    using namespace rt;
    if (a.encrypted && b.encrypted)
      rt::fail("enc x enc multiply must be lowered before archiving");
    std::vector<int64_t> oshape = broadcast_shape(a.shape, b.shape);
    Tensor out;
    out.shape = oshape;
    if (!a.encrypted && !b.encrypted) {
      out.clear.resize(out.elements());
      broadcast_for_each(a.shape, b.shape, oshape,
                         [&](int64_t f, int64_t ia, int64_t ib) {
        out.clear[f] = a.clear[ia] * b.clear[ib];
      });
      return out;
    }
    const Tensor &e = a.encrypted ? a : b;
    const Tensor &c = a.encrypted ? b : a;
    bool enc_left = a.encrypted;
    out.encrypted = true;
    out.ct_len = e.ct_len;
    out.ct.resize(out.elements() * out.ct_len);
    broadcast_for_each(a.shape, b.shape, oshape,
                       [&](int64_t f, int64_t ia, int64_t ib) {
      int64_t ie = enc_left ? ia : ib, ic = enc_left ? ib : ia;
      const uint64_t *pe = e.ct.data() + ie * e.ct_len;
      uint64_t w = static_cast<uint64_t>(c.clear[ic]);
      uint64_t *po = out.ct.data() + f * out.ct_len;
      for (size_t m = 0; m < out.ct_len; m++) po[m] = pe[m] * w;
    });
    return out;
  }

  // -- the node dispatch -------------------------------------------------------

  Tensor eval_generic(const rt::GraphNode &node,
                      const std::vector<Tensor> &values) {
    using namespace rt;
    const std::string &op = node.name;
    std::vector<const Tensor *> args;
    for (int p : node.preds) {
      if (p < 0) rt::fail("graph edge missing for op " + op);
      args.push_back(&values[p]);
    }

    if (op == "add" || op == "subtract")
      return add_sub(*args[0], *args[1], op == "subtract", width_of(node));
    if (op == "multiply") return multiply(*args[0], *args[1]);
    if (op == "negative") {
      Tensor out = *args[0];
      if (out.encrypted)
        for (auto &v : out.ct) v = static_cast<uint64_t>(-static_cast<int64_t>(v));
      else
        for (auto &v : out.clear) v = -v;
      return out;
    }
    if (op == "hint" || op == "identity" || op == "trace_message" ||
        op == "refresh_hint")
      return *args[0];
    if (op == "round_bit_pattern" || op == "truncate_bit_pattern") {
      // fused rounding (executor.py:793): identity here, the consumer
      // TLU's modulus switch rounds; truncation biases by -half a step
      Tensor out = *args[0];
      if (op == "truncate_bit_pattern" && out.encrypted &&
          !node.approximate) {
        int lsbs = static_cast<int>(node.kwargs["lsbs_to_remove"].as_int());
        uint64_t bias = rt::encode_torus(int64_t(1) << (lsbs - 1),
                                         width_of(node));
        for (int64_t i = 0; i < out.elements(); i++)
          out.ct[i * out.ct_len + out.ct_len - 1] -= bias;
      }
      return out;
    }
    if (op == "reshape") {
      Tensor out = *args[0];
      rt::I64Array sh = rt::decode_i64_array(node.kwargs["shape"], arrays_);
      out.shape = sh.data;
      // resolve a single -1 like numpy
      int64_t known = 1, neg = -1;
      for (size_t i = 0; i < out.shape.size(); i++) {
        if (out.shape[i] < 0) neg = static_cast<int64_t>(i);
        else known *= out.shape[i];
      }
      if (neg >= 0) out.shape[neg] = args[0]->elements() / known;
      if (out.elements() != args[0]->elements())
        rt::fail("reshape element count mismatch");
      return out;
    }
    if (op == "broadcast_to") {
      rt::I64Array sh = rt::decode_i64_array(node.kwargs["shape"], arrays_);
      Tensor out;
      out.shape = sh.data;
      out.encrypted = args[0]->encrypted;
      out.ct_len = args[0]->ct_len;
      if (out.encrypted) {
        out.ct.resize(out.elements() * out.ct_len);
        broadcast_for_each(args[0]->shape, out.shape, out.shape,
                           [&](int64_t f, int64_t ia, int64_t) {
          memcpy(out.ct.data() + f * out.ct_len,
                 args[0]->ct.data() + ia * out.ct_len, out.ct_len * 8);
        });
      } else {
        out.clear.resize(out.elements());
        broadcast_for_each(args[0]->shape, out.shape, out.shape,
                           [&](int64_t f, int64_t ia, int64_t) {
          out.clear[f] = args[0]->clear[ia];
        });
      }
      return out;
    }
    if (op == "transpose") return transpose(node, *args[0]);
    if (op == "concatenate") return concatenate(node, args);
    if (op == "sum") return reduce_sum(node, *args[0]);
    if (op == "matmul" || op == "dot") return matmul(node, *args[0], *args[1]);
    if (op == "tlu" || op == "univariate")
      return tlu(node, *args[0]);
    if (op == "crt_tlu") return crt_tlu(node, args);
    if (op == "encrypted_constant") {
      rt::I64Array c = rt::decode_i64_array(node.kwargs["value"], arrays_);
      Tensor t;
      t.shape = c.shape;
      t.clear = std::move(c.data);
      return trivial(t, width_of(node));
    }
    rt::fail("op '" + op + "' is not supported by the native executor; "
             "use the Python/TPU server");
  }

  Tensor transpose(const rt::GraphNode &node, const Tensor &a) {
    std::vector<int64_t> axes;
    if (!rt::decode_int_tuple(node.kwargs["axes"], axes)) {
      for (size_t i = a.shape.size(); i-- > 0;)
        axes.push_back(static_cast<int64_t>(i));
    }
    size_t nd = a.shape.size();
    Tensor out;
    out.encrypted = a.encrypted;
    out.ct_len = a.ct_len;
    out.shape.resize(nd);
    for (size_t i = 0; i < nd; i++) out.shape[i] = a.shape[axes[i]];
    std::vector<int64_t> in_strides(nd, 1);
    for (size_t i = nd - 1; i-- > 0;)
      in_strides[i] = in_strides[i + 1] * a.shape[i + 1];
    int64_t total = a.elements();
    if (out.encrypted) out.ct.resize(total * out.ct_len);
    else out.clear.resize(total);
    std::vector<int64_t> idx(nd, 0);
    for (int64_t f = 0; f < total; f++) {
      int64_t src = 0;
      for (size_t i = 0; i < nd; i++) src += idx[i] * in_strides[axes[i]];
      if (out.encrypted)
        memcpy(out.ct.data() + f * out.ct_len, a.ct.data() + src * a.ct_len,
               out.ct_len * 8);
      else
        out.clear[f] = a.clear[src];
      for (size_t i = nd; i-- > 0;) {
        if (++idx[i] < out.shape[i]) break;
        idx[i] = 0;
      }
    }
    return out;
  }

  Tensor concatenate(const rt::GraphNode &node,
                     const std::vector<const Tensor *> &args) {
    std::vector<int64_t> ax;
    int64_t axis = rt::decode_int_tuple(node.kwargs["axis"], ax) ? ax[0] : 0;
    size_t nd = args[0]->shape.size();
    if (axis < 0) axis += nd;
    bool enc = false;
    for (auto *a : args) enc = enc || a->encrypted;
    if (enc)
      for (auto *a : args)
        if (!a->encrypted)
          rt::fail("concatenate of mixed clear/encrypted operands is not "
                   "supported natively");
    Tensor out;
    out.encrypted = enc;
    out.ct_len = args[0]->ct_len;
    out.shape = args[0]->shape;
    out.shape[axis] = 0;
    for (auto *a : args) out.shape[axis] += a->shape[axis];
    int64_t outer = 1, inner = 1;
    for (int64_t i = 0; i < axis; i++) outer *= out.shape[i];
    for (size_t i = axis + 1; i < nd; i++) inner *= out.shape[i];
    size_t w = enc ? out.ct_len : 1;
    if (enc) out.ct.resize(out.elements() * w);
    else out.clear.resize(out.elements());
    int64_t off = 0;
    for (auto *a : args) {
      int64_t rows = a->shape[axis];
      for (int64_t o = 0; o < outer; o++)
        for (int64_t r = 0; r < rows; r++) {
          int64_t src = (o * rows + r) * inner * w;
          int64_t dst = (o * out.shape[axis] + off + r) * inner * w;
          if (enc)
            memcpy(out.ct.data() + dst, a->ct.data() + src, inner * w * 8);
          else
            memcpy(out.clear.data() + dst, a->clear.data() + src, inner * 8);
        }
      off += rows;
    }
    return out;
  }

  Tensor reduce_sum(const rt::GraphNode &node, const Tensor &a) {
    std::vector<int64_t> axes;
    if (!rt::decode_int_tuple(node.kwargs["axis"], axes))
      for (size_t i = 0; i < a.shape.size(); i++)
        axes.push_back(static_cast<int64_t>(i));
    for (auto &ax : axes)
      if (ax < 0) ax += a.shape.size();
    std::sort(axes.begin(), axes.end());
    Tensor out;
    out.encrypted = a.encrypted;
    out.ct_len = a.ct_len;
    for (size_t i = 0; i < a.shape.size(); i++)
      if (!std::binary_search(axes.begin(), axes.end(),
                              static_cast<int64_t>(i)))
        out.shape.push_back(a.shape[i]);
    size_t w = a.encrypted ? a.ct_len : 1;
    if (a.encrypted) out.ct.assign(out.elements() * w, 0);
    else out.clear.assign(out.elements(), 0);
    std::vector<int64_t> idx(a.shape.size(), 0);
    for (int64_t f = 0; f < a.elements(); f++) {
      int64_t dst = 0;
      for (size_t i = 0; i < a.shape.size(); i++)
        if (!std::binary_search(axes.begin(), axes.end(),
                                static_cast<int64_t>(i)))
          dst = dst * a.shape[i] + idx[i];
      if (a.encrypted) {
        const uint64_t *pa = a.ct.data() + f * w;
        uint64_t *po = out.ct.data() + dst * w;
        for (size_t m = 0; m < w; m++) po[m] += pa[m];
      } else {
        out.clear[dst] += a.clear[f];
      }
      for (size_t i = a.shape.size(); i-- > 0;) {
        if (++idx[i] < a.shape[i]) break;
        idx[i] = 0;
      }
    }
    return out;
  }

  // matmul/dot with one clear operand (executor.py:567-613 cases).
  Tensor matmul(const rt::GraphNode &, const Tensor &a, const Tensor &b) {
    if (a.encrypted && b.encrypted)
      rt::fail("enc x enc matmul must be lowered before archiving");
    if (!a.encrypted && !b.encrypted) {
      // clear matmul: support 1-D/2-D
      if (a.shape.size() == 2 && b.shape.size() == 2) {
        Tensor out;
        out.shape = {a.shape[0], b.shape[1]};
        out.clear.assign(out.elements(), 0);
        for (int64_t i = 0; i < a.shape[0]; i++)
          for (int64_t kk = 0; kk < a.shape[1]; kk++)
            for (int64_t j = 0; j < b.shape[1]; j++)
              out.clear[i * b.shape[1] + j] +=
                  a.clear[i * a.shape[1] + kk] * b.clear[kk * b.shape[1] + j];
        return out;
      }
      rt::fail("clear matmul is only lowered for 2-D operands natively");
    }
    bool enc_left = a.encrypted;
    const Tensor &ct = enc_left ? a : b;
    const Tensor &cl = enc_left ? b : a;
    size_t w = ct.ct_len;
    Tensor out;
    out.encrypted = true;
    out.ct_len = w;
    if (enc_left && cl.shape.size() == 1) {
      // (..., K, d) x (K,) -> (..., d)
      int64_t K = cl.shape[0];
      out.shape.assign(ct.shape.begin(), ct.shape.end() - 1);
      out.ct.assign(out.elements() * w, 0);
      for (int64_t r = 0; r < out.elements(); r++)
        for (int64_t kk = 0; kk < K; kk++) {
          uint64_t c = static_cast<uint64_t>(cl.clear[kk]);
          const uint64_t *pc = ct.ct.data() + (r * K + kk) * w;
          uint64_t *po = out.ct.data() + r * w;
          for (size_t m = 0; m < w; m++) po[m] += c * pc[m];
        }
      return out;
    }
    if (enc_left && cl.shape.size() == 2 && !ct.shape.empty()) {
      // encrypted (..., K) x clear (K, M) -> (..., M)
      // (executor.py:585: ct[..., :, None, :] * w[:, :, None], sum K)
      int64_t K = ct.shape.back(), M = cl.shape[1];
      out.shape.assign(ct.shape.begin(), ct.shape.end() - 1);
      out.shape.push_back(M);
      int64_t rows = 1;
      for (size_t i = 0; i + 1 < ct.shape.size(); i++) rows *= ct.shape[i];
      out.ct.assign(rows * M * w, 0);
      for (int64_t r = 0; r < rows; r++)
        for (int64_t kk = 0; kk < K; kk++) {
          const uint64_t *pc = ct.ct.data() + (r * K + kk) * w;
          for (int64_t j = 0; j < M; j++) {
            uint64_t c = static_cast<uint64_t>(cl.clear[kk * M + j]);
            if (!c) continue;
            uint64_t *po = out.ct.data() + (r * M + j) * w;
            for (size_t m = 0; m < w; m++) po[m] += c * pc[m];
          }
        }
      return out;
    }
    if (!enc_left && cl.shape.size() == 1) {
      // (K,) x (K, ...) -> (...): contract the leading encrypted axis
      int64_t K = cl.shape[0];
      out.shape.assign(ct.shape.begin() + 1, ct.shape.end());
      out.ct.assign(out.elements() * w, 0);
      int64_t inner = out.elements();
      for (int64_t kk = 0; kk < K; kk++) {
        uint64_t c = static_cast<uint64_t>(cl.clear[kk]);
        if (!c) continue;
        for (int64_t r = 0; r < inner; r++) {
          const uint64_t *pc = ct.ct.data() + (kk * inner + r) * w;
          uint64_t *po = out.ct.data() + r * w;
          for (size_t m = 0; m < w; m++) po[m] += c * pc[m];
        }
      }
      return out;
    }
    if (!enc_left && cl.shape.size() == 2 && ct.shape.size() == 1) {
      // clear (M, K) x encrypted (K,) -> (M,) (executor.py:599)
      int64_t M = cl.shape[0], K = cl.shape[1];
      out.shape = {M};
      out.ct.assign(M * w, 0);
      for (int64_t i = 0; i < M; i++)
        for (int64_t kk = 0; kk < K; kk++) {
          uint64_t c = static_cast<uint64_t>(cl.clear[i * K + kk]);
          if (!c) continue;
          const uint64_t *pc = ct.ct.data() + kk * w;
          uint64_t *po = out.ct.data() + i * w;
          for (size_t m = 0; m < w; m++) po[m] += c * pc[m];
        }
      return out;
    }
    rt::fail("matmul shape combination not supported natively");
  }

  // Native TLU: LUT build (executor.py raw_table/_materialize_table) +
  // full PBS (kernels.pbs_batch order: signed offset -> KS -> BR -> extract).
  Tensor tlu(const rt::GraphNode &node, const Tensor &ct) {
    if (!ct.encrypted) {
      // clear-path TLU: plain table lookup (executor clear subgraphs)
      rt::I64Array table = rt::decode_i64_array(node.kwargs["table"], arrays_);
      if (table.shape.size() != 1)
        rt::fail("clear per-element tables are not supported natively");
      Tensor out;
      out.shape = ct.shape;
      out.clear.resize(ct.clear.size());
      int64_t tl = static_cast<int64_t>(table.data.size());
      for (size_t i = 0; i < ct.clear.size(); i++) {
        int64_t v = ct.clear[i] % tl;
        if (v < 0) v += tl;
        out.clear[i] = table.data[v];
      }
      return out;
    }
    const rt::GraphNode &pred = graph_.nodes[node.preds[0]];
    int p_in = width_of(pred);
    int p_out = width_of(node);
    bool in_signed = pred.out_signed;
    // fused rounding: single pred that is a round/truncate_bit_pattern
    int lsbs = 0;
    if ((pred.name == "round_bit_pattern" ||
         pred.name == "truncate_bit_pattern") &&
        node.preds.size() == 1)
      lsbs = static_cast<int>(pred.kwargs["lsbs_to_remove"].as_int());
    int p_eff = std::max(p_in - lsbs, 1);
    if (p_eff > max_native_bits())
      return tlu_wop(node, ct, p_eff, p_out, in_signed, lsbs);

    // raw_table at p_eff with shift=lsbs (executor.py:146-171)
    rt::I64Array table = rt::decode_i64_array(node.kwargs["table"], arrays_);
    if (table.shape.size() > 1)
      rt::fail("per-element TLU tables are not supported natively");
    int64_t tl = static_cast<int64_t>(table.data.size());
    size_t entries = size_t(1) << p_eff;
    std::vector<uint64_t> lut(entries);
    for (size_t e = 0; e < entries; e++) {
      int64_t v = static_cast<int64_t>(e);
      if (in_signed && v >= (int64_t(1) << (p_eff - 1)))
        v -= int64_t(1) << p_eff;
      v <<= lsbs;
      int64_t ti = v % tl;
      if (ti < 0) ti += tl;
      // mod 2^(p_out+1) wrap (executor.py:191)
      lut[e] = static_cast<uint64_t>(table.data[ti]) &
               ((uint64_t(1) << (p_out + 1)) - 1);
    }
    std::vector<uint64_t> lut_poly =
        rt::encode_expand_lut(lut, n_, p_eff, in_signed, p_out);

    Tensor out;
    out.encrypted = true;
    out.shape = ct.shape;
    out.ct_len = n_big_ + 1;
    out.ct.resize(ct.elements() * out.ct_len);
    int64_t total = ct.elements();
#pragma omp parallel for schedule(dynamic)
    for (long long i = 0; i < static_cast<long long>(total); i++) {
      std::vector<uint64_t> one(ct.ct.begin() + i * ct.ct_len,
                                ct.ct.begin() + (i + 1) * ct.ct_len);
      if (in_signed)
        one[n_big_] += rt::encode_torus(int64_t(1) << (p_eff - 1), p_eff);
      std::vector<uint64_t> small =
          rt::keyswitch(one.data(), n_big_, ksk_, n_small_,
                        specs_.ks_base_log, specs_.ks_level);
      std::vector<uint64_t> acc =
          rt::blind_rotate(small, bsk_, k_, n_, log2_n_,
                           specs_.pbs_base_log, specs_.pbs_level, lut_poly);
      std::vector<uint64_t> res = rt::sample_extract0(acc, k_, n_);
      memcpy(out.ct.data() + i * out.ct_len, res.data(), res.size() * 8);
    }
    return out;
  }

  // Wide (>native) TLU via WoP-PBS (executor.py _materialize_wop_table +
  // run_wop -> core/wop.py wop_pbs): signed inputs extract p_eff+1 bits
  // (the encoding's bit pattern, sign wrap at the top, unreachable middle
  // band clamped into the domain); lsbs > 0 is fused rounding (only the
  // top bits are extracted — extraction floors for free).
  Tensor tlu_wop(const rt::GraphNode &node, const Tensor &ct, int p_eff,
                 int p_out, bool in_signed, int lsbs) {
    require_wop("wide TLU");
    rt::I64Array table = rt::decode_i64_array(node.kwargs["table"], arrays_);
    if (table.shape.size() > 1)
      rt::fail("per-element TLU tables are not supported natively");
    int64_t tl = static_cast<int64_t>(table.data.size());
    int nb = p_eff + (in_signed ? 1 : 0);
    int delta_log = 63 - p_eff;
    std::vector<int64_t> entries(size_t(1) << nb);
    for (size_t e = 0; e < entries.size(); e++) {
      int64_t v = static_cast<int64_t>(e);
      if (in_signed) {
        if (v >= (int64_t(1) << p_eff)) v -= int64_t(1) << nb;
        int64_t half = int64_t(1) << (p_eff - 1);
        v = std::max(-half, std::min(v, half - 1));
      }
      v <<= lsbs;
      int64_t ti = v % tl;
      if (ti < 0) ti += tl;
      entries[e] = table.data[ti];
    }
    wop::CryptoShape s = wop_shape();
    wop::WopGadgets g = wop_gadgets();
    Tensor out;
    out.encrypted = true;
    out.shape = ct.shape;
    out.ct_len = n_big_ + 1;
    out.ct.resize(ct.elements() * out.ct_len);
    int64_t total = ct.elements();
#pragma omp parallel for schedule(dynamic)
    for (long long i = 0; i < static_cast<long long>(total); i++) {
      std::vector<uint64_t> one(ct.ct.begin() + i * ct.ct_len,
                                ct.ct.begin() + (i + 1) * ct.ct_len);
      std::vector<uint64_t> res = wop::wop_pbs(
          one, entries, nb, delta_log, p_out, s, g, ksk_, bsk_, pfpksk_);
      memcpy(out.ct.data() + i * out.ct_len, res.data(), res.size() * 8);
    }
    return out;
  }

  // CRT TLU (executor.py crt_tlu branch -> core/wop.py wop_pbs_crt): one
  // output residue per node; per-residue bit extraction + circuit
  // bootstrap shared with the sibling residues through crt_ggsw_cache_.
  Tensor crt_tlu(const rt::GraphNode &node,
                 const std::vector<const Tensor *> &args) {
    require_wop("crt_tlu");
    rt::I64Array table = rt::decode_i64_array(node.kwargs["table"], arrays_);
    std::vector<int64_t> moduli;
    if (!rt::decode_int_tuple(node.kwargs["moduli"], moduli))
      rt::fail("crt_tlu without moduli");
    int out_index = static_cast<int>(node.kwargs["out_index"].as_int());
    int p_out = width_of(node);
    size_t nblk = moduli.size();
    if (args.size() != nblk) rt::fail("crt_tlu pred count mismatch");

    // per-block index bits: min(ceil(log2 m_j), assigned residue width)
    std::vector<int> block_bits(nblk), block_widths(nblk);
    int total_bits = 0;
    for (size_t j = 0; j < nblk; j++) {
      int nb = 0;
      while ((int64_t(1) << nb) < moduli[j]) nb++;
      block_widths[j] = width_of(graph_.nodes[node.preds[j]]);
      block_bits[j] = std::min(nb, block_widths[j]);
      total_bits += block_bits[j];
    }

    // bit-indexed table for THIS output residue (core/wop.py
    // crt_lut_tables: block 0's bits least significant; unreachable
    // residue combinations zero-filled)
    int64_t total_m = 1;
    for (int64_t m : moduli) total_m *= m;
    std::vector<int64_t> entries(size_t(1) << total_bits, 0);
    int64_t n_x = std::min<int64_t>(
        total_m, static_cast<int64_t>(table.data.size()));
    for (int64_t x = 0; x < n_x; x++) {
      int64_t idx = 0;
      int offset = 0;
      bool reachable = true;
      for (size_t j = 0; j < nblk; j++) {
        int64_t r = x % moduli[j];
        if (r >= (int64_t(1) << block_bits[j])) { reachable = false; break; }
        idx |= r << offset;
        offset += block_bits[j];
      }
      if (!reachable) continue;
      int64_t v = table.data[x] % moduli[out_index];
      if (v < 0) v += moduli[out_index];
      entries[idx] = v;
    }

    wop::CryptoShape s = wop_shape();
    wop::WopGadgets g = wop_gadgets();
    int64_t total = args[0]->elements();
    std::vector<int> cache_key(node.preds.begin(), node.preds.end());
    auto cached = crt_ggsw_cache_.find(cache_key);
    if (cached == crt_ggsw_cache_.end()) {
      std::vector<std::vector<wop::Ggsw>> per_elem(total);
#pragma omp parallel for schedule(dynamic)
      for (long long i = 0; i < static_cast<long long>(total); i++) {
        // block n-1 extracted first = most significant index bits; each
        // residue's LSB sits at 63 - (its assigned encoding width)
        std::vector<std::vector<uint64_t>> bit_stack;
        for (size_t jj = nblk; jj-- > 0;) {
          const Tensor &rj = *args[jj];
          std::vector<uint64_t> one(rj.ct.begin() + i * rj.ct_len,
                                    rj.ct.begin() + (i + 1) * rj.ct_len);
          auto bits = wop::extract_bits(one, block_bits[jj],
                                        63 - block_widths[jj], s, ksk_,
                                        bsk_);
          for (auto &b : bits) bit_stack.push_back(std::move(b));
        }
        std::vector<wop::Ggsw> ggsws(bit_stack.size());
        for (size_t b = 0; b < bit_stack.size(); b++)
          ggsws[b] = wop::circuit_bootstrap(bit_stack[b], s, g, ksk_, bsk_,
                                            pfpksk_);
        per_elem[i] = std::move(ggsws);
      }
      cached = crt_ggsw_cache_
                   .emplace(std::move(cache_key), std::move(per_elem))
                   .first;
    }

    std::vector<uint64_t> lut_torus(entries.size());
    uint64_t mask = (uint64_t(1) << (p_out + 1)) - 1;
    for (size_t i = 0; i < entries.size(); i++)
      lut_torus[i] = (static_cast<uint64_t>(entries[i]) & mask)
                     << (64 - p_out - 1);
    Tensor out;
    out.encrypted = true;
    out.shape = args[0]->shape;
    out.ct_len = n_big_ + 1;
    out.ct.resize(total * out.ct_len);
#pragma omp parallel for schedule(dynamic)
    for (long long i = 0; i < static_cast<long long>(total); i++) {
      std::vector<uint64_t> res =
          wop::vertical_packing(lut_torus, cached->second[i], s, g);
      memcpy(out.ct.data() + i * out.ct_len, res.data(), res.size() * 8);
    }
    return out;
  }
};

}  // namespace ctpu
