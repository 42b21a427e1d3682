"""Graph executor: lowers a traced Graph onto batched TFHE JAX kernels.

This is the TPU-native replacement for the reference's entire
FHE->TFHE->Concrete->LLVM pipeline (lib/Support/Pipeline.cpp): instead of
emitting code, the graph is interpreted once at compile time to build a single
JAX function over ciphertext arrays, which XLA then fuses/compiles for the
TPU.  Leveled ops (add/sub/mul-by-clear/matmul/sum) are u64 tensor ops;
table lookups dispatch the whole tensor as one batched programmable bootstrap
(kernels.pbs_batch) — the analog of the reference's Batching pass
(lib/Transforms/Batching.cpp), but native rather than recovered by a
rewrite.

Ciphertext layout: an encrypted integer tensor of shape S is a u64 array of
shape (*S, n_big + 1) — LWE dimension last.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu.core import kernels as kn
from concrete_tpu.core import refimpl as ref
from concrete_tpu.dtypes import Integer
from concrete_tpu.params import CryptoParams
from concrete_tpu.representation import Graph, Node, Operation

U64 = jnp.uint64


@dataclasses.dataclass
class TluSpec:
    """A materialized table lookup: expanded LUT polynomial + signedness."""
    node_uid: int
    lut_poly: np.ndarray      # (N,) u64 accumulator polynomial
    signed_input: bool
    message_bits: int         # input encoding width (LUT index domain)


@dataclasses.dataclass
class WopTluSpec:
    """A wide (>8-bit) table lookup lowered to WoP-PBS.

    `table` holds 2^nb_bits raw integer entries indexed by the extracted
    bit pattern of the encoding (signed inputs extract p+1 bits, negative
    values indexing the wrapped top range).  Reference: the FHEToTFHECrt
    lowering's wop_pbs path (wrappers.cpp:855)."""
    node_uid: int
    table: np.ndarray         # (2^nb,) int64 raw entries
    nb_bits: int
    delta_log: int            # bit position of the extraction LSB
    out_bits: int             # output encoding width
    # multivariate packing layout (None for univariate wide TLUs)
    mins: list = None
    offsets: list = None


@dataclasses.dataclass
class CrtTluSpec:
    """One output residue of a CRT TLU (fhe.crt_tlu), lowered to WoP-PBS:
    shared per-residue bit extraction + circuit bootstrap, one vertical
    packing per output residue.  Reference: memref_wop_pbs_crt_buffer
    (wrappers.cpp:855-998)."""
    node_uid: int
    table: np.ndarray         # (2^nb,) raw entries for THIS output residue
    nb_bits: int              # total bits over all residue blocks
    delta_log: int            # unused (per-block deltas); stats compat
    out_bits: int             # this residue's assigned encoding width
    moduli: tuple = None
    block_bits: tuple = None    # index bits per residue block
    block_widths: tuple = None  # actual encoding width per residue block
    out_index: int = 0
    mins: list = None         # WopTluSpec-compat (unused)
    offsets: list = None


def _materialize_crt_tlu(node: Node, p_out: int,
                         block_widths: tuple) -> CrtTluSpec:
    """`block_widths[j]` is residue j's ASSIGNED encoding width — the index
    bits per block are min(ceil(log2 m_j), width): a residue can't exceed
    its encoding (measured bounds), and values above m_j-1 are unreachable.
    The output residue is encoded at the node's assigned width `p_out`."""
    from concrete_tpu.core.wop import crt_block_bits, crt_lut_tables
    kw = node.properties["kwargs"]
    moduli = tuple(kw["moduli"])
    j = int(kw["out_index"])
    bits = tuple(min(nb, w) for nb, w in
                 zip(crt_block_bits(moduli), block_widths))
    luts = crt_lut_tables(kw["table"], moduli, bits=bits)
    return CrtTluSpec(node_uid=node.uid, table=luts[j],
                      nb_bits=sum(bits), delta_log=0, out_bits=p_out,
                      moduli=moduli, block_bits=bits,
                      block_widths=tuple(block_widths), out_index=j)


def _materialize_wop_table(node: Node, p_in: int, p_out: int,
                           lsbs: int = 0) -> WopTluSpec:
    """Build the bit-indexed table for a wide TLU.

    Unsigned p-bit input: nb = p, index = value.  Signed: nb = p+1 (the
    encoding's p+1-bit pattern, sign wrap at the top), index =
    value mod 2^(p+1) — entries in the unused middle range are don't-care
    (filled with f of the wrapped value).

    `lsbs` > 0 is fused rounding (ProcessRounding for the WoP path): only
    the top p_in - lsbs message bits are extracted — bit extraction floors
    the value for free; entry j maps the rounded value j << lsbs."""
    signed = isinstance(node.inputs[0].dtype, Integer) \
        and node.inputs[0].dtype.is_signed
    p_eff = max(p_in - lsbs, 1)
    nb = p_eff + (1 if signed else 0)
    idx = np.arange(1 << nb)
    if signed:
        dom = 1 << nb
        sval = np.where(idx < (1 << p_eff), idx, idx - dom)
        # the middle band of the nb-bit pattern space is unreachable
        # (don't-care); clamp into the declared signed domain so partial
        # user functions are never evaluated out of range
        half = 1 << (p_eff - 1)
        sval = np.clip(sval, -half, half - 1)
    else:
        sval = idx
    sval = sval << lsbs
    if node.name == "tlu":
        table = np.asarray(node.properties["kwargs"]["table"],
                           dtype=np.int64)
        if table.ndim > 1:
            # per-element tables (apply_multi_lookup_table): one row per
            # flattened element, matching the flattened PBS batch order
            flat = table.reshape(-1, table.shape[-1])
            vals = flat[:, sval % table.shape[-1]]
        else:
            vals = table[sval % len(table)]
    else:
        fn = node.properties["kwargs"]["function"]
        vals = np.vectorize(fn, otypes=[np.int64])(sval)
    return WopTluSpec(node_uid=node.uid, table=vals.astype(np.int64),
                      nb_bits=nb, delta_log=63 - p_eff, out_bits=p_out)


def raw_table(node: Node, p: int, shift: int = 0) -> np.ndarray:
    """The 2^p-entry integer table of a tlu/univariate node.

    Index semantics follow the reference (extensions/table.py): index =
    value mod 2^p (so signed values use negative indexing).  `shift` is the
    fused-rounding scale (ProcessRounding): entry j represents the rounded
    value j << shift.
    """
    in_node_signed = node.inputs[0].dtype.is_signed if isinstance(
        node.inputs[0].dtype, Integer) else False
    idx = np.arange(1 << p)
    if in_node_signed:
        vals = np.where(idx < (1 << (p - 1)), idx, idx - (1 << p))
    else:
        vals = idx
    vals = vals << shift
    if node.name == "tlu":
        table = np.asarray(node.properties["kwargs"]["table"], dtype=np.int64)
        if table.ndim > 1:
            # per-element tables (apply_multi_lookup_table): one row of
            # raw entries per flattened element
            flat = table.reshape(-1, table.shape[-1])
            return flat[:, vals % table.shape[-1]]
        return table[vals % len(table)]
    fn = node.properties["kwargs"]["function"]
    return np.vectorize(fn, otypes=[np.int64])(vals)


def _materialize_table(node: Node, p_in: int, p_out: int,
                       params: CryptoParams, lsbs: int = 0) -> TluSpec:
    """Build the LUT for a tlu/univariate node, then expand it.

    Table semantics follow the reference (extensions/table.py /
    wrappers.cpp:388): index = value mod 2^p_in, signed handled by
    half-rotation + offset in the kernels.  p_in is the input partition's
    encoding width, p_out the output's — they differ when the TLU crosses
    precision partitions (multi-precision mono, assign_bit_widths.py:18).

    `lsbs` > 0 is fused rounding (ProcessRounding): the LUT index domain is
    p_in - lsbs and the PBS modulus switch rounds the low bits for free.
    """
    in_node_signed = node.inputs[0].dtype.is_signed if isinstance(
        node.inputs[0].dtype, Integer) else False
    p_eff = max(p_in - lsbs, 1)
    lut_vals = raw_table(node, p_eff, shift=lsbs)
    lut_enc = lut_vals & ((1 << (p_out + 1)) - 1)  # mod 2^(p_out+1) wrap
    lut_poly = ref.encode_expand_lut(
        lut_enc.astype(np.uint64), params.polynomial_size, p_eff,
        signed=in_node_signed, out_bits=p_out)
    return TluSpec(node_uid=node.uid, lut_poly=lut_poly,
                   signed_input=in_node_signed, message_bits=p_eff)


@dataclasses.dataclass
class MultivariateSpec:
    """A packed n-operand TLU: bias/shift per operand + expanded LUT.

    packed = sum_i (x_i - min_i) << offset_i; table indexed by the packed
    value (reference packing lowering, mlir/context.py:1325).
    """
    node_uid: int
    mins: list[int]
    offsets: list[int]
    widths: list[int]
    lut_poly: np.ndarray
    message_bits: int         # packed-operand encoding width


def packed_layout(graph: Graph, node: Node):
    """(mins, widths, offsets) for a multivariate node's operands, from
    measured bounds; offsets are bit positions, operand 0 most significant."""
    preds = graph.ordered_preds_of(node)
    mins, widths = [], []
    for pr in preds:
        lo, hi = pr.bounds
        mins.append(lo)
        widths.append(max(int(hi - lo).bit_length(), 1))
    offsets = []
    acc = 0
    for w in reversed(widths):
        offsets.append(acc)
        acc += w
    offsets = list(reversed(offsets))
    return mins, widths, offsets


def multivariate_raw_table(graph: Graph, node: Node,
                           p_in: int) -> np.ndarray:
    """2^p_in-entry packed-index table of a multivariate node (from its
    callable, or the explicit table of a deserialized archive node)."""
    kwargs = node.properties["kwargs"]
    if "table" in kwargs:
        t = np.asarray(kwargs["table"], dtype=np.int64)
        if len(t) < (1 << p_in):
            # width class wider than the packed range: upper entries are
            # unreachable don't-cares
            t = np.resize(t, 1 << p_in)
        return t
    fn = kwargs["function"]
    mins, widths, offsets = packed_layout(graph, node)
    idx = np.arange(1 << p_in)
    operands = []
    for mn, w, off in zip(mins, widths, offsets):
        operands.append(((idx >> off) & ((1 << w) - 1)) + mn)
    return np.vectorize(fn, otypes=[np.int64])(*operands)


def _materialize_multivariate(graph: Graph, node: Node, p_in: int,
                              p_out: int,
                              params: CryptoParams) -> MultivariateSpec:
    mins, widths, offsets = packed_layout(graph, node)
    lut_vals = multivariate_raw_table(graph, node, p_in)
    lut_enc = lut_vals & ((1 << (p_out + 1)) - 1)
    lut_poly = ref.encode_expand_lut(
        lut_enc.astype(np.uint64), params.polynomial_size, p_in,
        signed=False, out_bits=p_out)
    return MultivariateSpec(node_uid=node.uid, mins=mins, offsets=offsets,
                            widths=widths, lut_poly=lut_poly,
                            message_bits=p_in)


class GraphExecutor:
    """Compile-time lowering of a Graph to a jittable evaluation function.

    Mono mode: one keyset (`params`) serves every PBS.  Multi mode (specs
    with partitions, compilation/multi.py): each PBS runs in its *input*
    class's partition (the class encoding width is the partition key), and
    a big->big conversion keyswitch moves crossing outputs into their
    class's partition — the reference's TFHECircuitSolutionParametrization
    change-partition lowering shape.
    """

    def __init__(self, graph: Graph, params: CryptoParams, p: int,
                 wop_gadgets: tuple = None, specs=None):
        from concrete_tpu.compilation.widths import (encoding_width,
                                                     partition_of,
                                                     tlu_fused_lsbs)
        self.graph = graph
        self.params = params
        self.p = p  # circuit-wide max width (fallback for old archives)
        self.width_of = lambda node: encoding_width(node, p)
        # partition id of a node's value: its width under the PRECISION
        # cut, synthetic under PRECISION_AND_NORM2 (widths.partition_of)
        self.part_of = lambda node: partition_of(node, p)
        self.specs = specs
        self.partitions = dict(specs.partitions) \
            if specs is not None and specs.is_multi else None
        self.conversions = dict(specs.conversions or {}) \
            if self.partitions else {}
        self.wop_params = None
        self.wop_params_by_width: dict[int, object] = {}
        if self.partitions and specs.partition_wop_gadgets:
            for w in specs.partition_wop_gadgets:
                self.wop_params_by_width[w] = specs.wop_params(w)
        elif wop_gadgets is not None:
            from concrete_tpu.core.wop import WopParams
            cbs_l, cbs_b, pfks_l, pfks_b = wop_gadgets
            self.wop_params = WopParams(
                base=params, cbs_level=cbs_l, cbs_base_log=cbs_b,
                pfks_level=pfks_l, pfks_base_log=pfks_b)
        self.tlu_specs: dict[int, TluSpec] = {}
        self.wop_specs: dict[int, WopTluSpec] = {}
        self.multivariate_specs: dict[int, MultivariateSpec] = {}
        for node in graph.topological_order():
            if not node.output.is_encrypted:
                # clear-output ops never bootstrap (a TLU on a clear value
                # evaluates in the clear-subgraph path): no spec, no WoP
                # requirement, no 2^p table evaluation of the user function
                continue
            if node.name in ("tlu", "univariate"):
                preds = graph.ordered_preds_of(node)
                p_in = self.width_of(preds[0]) if preds else p
                pid_in = self.part_of(preds[0]) if preds else p
                pparams = self.params_for_width(pid_in)
                lsbs = tlu_fused_lsbs(graph, node)
                if max(p_in - lsbs, 1) > self.max_native_bits(pid_in):
                    self._require_wop(node, pid_in)
                    self.wop_specs[node.uid] = _materialize_wop_table(
                        node, p_in, self.width_of(node), lsbs=lsbs)
                else:
                    self.tlu_specs[node.uid] = _materialize_table(
                        node, p_in, self.width_of(node), pparams, lsbs=lsbs)
            elif node.name == "multivariate":
                preds = [q for q in graph.ordered_preds_of(node)
                         if q.output.is_encrypted]
                p_in = max((self.width_of(q) for q in preds), default=p)
                pid_in = self.part_of(preds[0]) if preds else p
                if p_in > self.max_native_bits(pid_in):
                    self._require_wop(node, pid_in)
                    mins, mwidths, offsets = packed_layout(graph, node)
                    vals = multivariate_raw_table(graph, node, p_in)
                    self.wop_specs[node.uid] = WopTluSpec(
                        node_uid=node.uid, table=vals, nb_bits=p_in,
                        delta_log=63 - p_in, out_bits=self.width_of(node),
                        mins=mins, offsets=offsets)
                else:
                    self.multivariate_specs[node.uid] = \
                        _materialize_multivariate(
                            graph, node, p_in, self.width_of(node),
                            self.params_for_width(pid_in))
            elif node.name == "crt_tlu":
                preds = [q for q in graph.ordered_preds_of(node)
                         if q.output.is_encrypted]
                self._require_wop(node, self.part_of(preds[0]))
                self.wop_specs[node.uid] = _materialize_crt_tlu(
                    node, self.width_of(node),
                    tuple(self.width_of(q) for q in preds))
            elif node.name == "dynamic_tlu":
                preds = graph.ordered_preds_of(node)
                p_in = self.width_of(preds[1])
                if p_in > self.max_native_bits(self.part_of(preds[1])):
                    raise ValueError(
                        f"dynamic table lookup at {p_in} bits exceeds the "
                        "native LUT width; dynamic tables cannot lower to "
                        "WoP-PBS (their contents are only known at run "
                        "time) — round/truncate the index first")
                tshape = tuple(preds[0].output.shape)
                if len(tshape) != 1:
                    raise ValueError(
                        "dynamic table lookups need a 1-D clear table "
                        f"(got shape {tshape}); per-element dynamic "
                        "tables are not supported — use a static "
                        "multi-dimensional LookupTable")
                table_len = tshape[-1] if tshape else 0
                if table_len != (1 << p_in):
                    raise ValueError(
                        f"dynamic table needs exactly 2^{p_in} = "
                        f"{1 << p_in} entries for its {p_in}-bit index "
                        f"(got {table_len}); pad the table or fhe.hint "
                        "the index wider")

    def params_for_width(self, width: int) -> CryptoParams:
        """Parameters of a partition id (= the encoding width unless the
        norm2 cut assigned synthetic ids; see widths.partition_of)."""
        if self.partitions and width in self.partitions:
            return self.partitions[width]
        return self.params

    def max_native_bits(self, pid: int) -> int:
        """Widest TLU one blind rotate serves in partition `pid`."""
        n = self.params_for_width(pid).polynomial_size
        return min(8, n.bit_length() - 2)

    def wop_params_for(self, width: int):
        if self.partitions:
            return self.wop_params_by_width.get(width)
        return self.wop_params

    def _require_wop(self, node: Node, width: int):
        if self.wop_params_for(width) is None:
            raise ValueError(
                f"node '{node.name}' needs a WoP-PBS lowering "
                "(input wider than the native LUT) but the circuit was "
                "compiled without WoP gadget parameters")

    # -- helpers -----------------------------------------------------------

    def _encode_clear(self, value, width: int) -> jnp.ndarray:
        if hasattr(value, "aval"):
            # runtime clear input (jit-traced): encode with jnp ops
            return (jnp.asarray(value).astype(jnp.int64)
                    .astype(jnp.uint64) << jnp.uint64(64 - width - 1))
        return jnp.asarray(ref.encode(np.asarray(value), width))

    def _trivial(self, value, width: int, pid: int = None) -> jnp.ndarray:
        """Trivial LWE encryption of clear values (mask zeros), sized for
        partition `pid` (default: the `width`-bit partition)."""
        enc = ref.encode(np.asarray(value), width)
        n_big = self.params_for_width(width if pid is None else pid).n_big
        out = np.zeros(enc.shape + (n_big + 1,), dtype=np.uint64)
        out[..., -1] = enc
        return jnp.asarray(out)

    def _trivial_traced(self, value, width: int,
                        pid: int = None) -> jnp.ndarray:
        """_trivial for values only known inside the jit (runtime clear
        inputs): same encoding, jnp ops throughout."""
        enc = (jnp.asarray(value).astype(jnp.int64).astype(jnp.uint64)
               << jnp.uint64(64 - width - 1))
        n_big = self.params_for_width(width if pid is None else pid).n_big
        out = jnp.zeros(jnp.shape(enc) + (n_big + 1,), dtype=jnp.uint64)
        return out.at[..., -1].set(enc)

    def _trivial_any(self, value, width: int,
                     pid: int = None) -> jnp.ndarray:
        """Trivial encryption routing jit-traced values (runtime clear
        inputs and clear-subgraph results) through the traced path."""
        if hasattr(value, "aval"):
            return self._trivial_traced(value, width, pid)
        return self._trivial(value, width, pid)

    # -- the lowered evaluation -------------------------------------------

    def run(self, enc_inputs: dict[int, jnp.ndarray], ksk,
            bsk, lut_polys: dict[int, jnp.ndarray],
            wop_tables: dict[int, jnp.ndarray] = None, pfpksk=None,
            fks: dict = None):
        """Evaluate the graph.  enc_inputs maps input position ->
        u64 ciphertext array (or clear np array for clear inputs).
        wop_tables/pfpksk serve the WoP-PBS path of >8-bit TLUs.

        Mono: ksk/bsk are one packed key pair (pfpksk one packed PFPKSK).
        Multi-partition: ksk/bsk/pfpksk are dicts keyed by partition width
        and `fks` maps (src_width, dst_width) -> packed conversion LimbKSK.
        """
        graph = self.graph
        values: dict[Node, object] = {}
        # shared extraction + circuit bootstrap across the sibling output
        # residues of one fhe.crt_tlu (keyed by the residue input nodes)
        crt_ggsw_cache: dict[tuple, object] = {}

        def keys_for(w: int):
            if isinstance(ksk, dict):
                return ksk[w], bsk[w]
            return ksk, bsk

        def pfpksk_for(w: int):
            if isinstance(pfpksk, dict):
                return pfpksk.get(w)
            return pfpksk

        def cross(out, w_in: int, w_out: int):
            """Move a fresh PBS output across a partition frontier."""
            if self.partitions is None or w_in == w_out \
                    or (w_in, w_out) not in (fks or {}):
                return out
            shape = out.shape[:-1]
            flat = out.reshape((-1, out.shape[-1]))
            conv = kn.keyswitch(flat, fks[(w_in, w_out)])
            return conv.reshape(shape + (conv.shape[-1],))

        def run_wop(ct, spec: WopTluSpec, table, w_in: int):
            from concrete_tpu.core import kernels_wop as kw
            kkey, bkey = keys_for(w_in)
            shape = ct.shape[:-1]
            flat = ct.reshape((-1, ct.shape[-1]))
            out = kw.wop_pbs_batch(
                flat, table, spec.nb_bits, spec.delta_log, spec.out_bits,
                kkey, bkey, pfpksk_for(w_in), self.wop_params_for(w_in))
            return out.reshape(shape + (out.shape[-1],))

        def is_ct(node: Node) -> bool:
            return node.output.is_encrypted

        for node in graph.topological_order():
            name = node.name
            preds = graph.ordered_preds_of(node)
            if node.operation == Operation.Input:
                pos = next(p for p, n in graph.input_nodes.items()
                           if n is node)
                values[node] = enc_inputs[pos]
                continue
            if node.operation == Operation.Constant:
                values[node] = node()
                continue
            if name == "encrypted_constant":
                values[node] = self._trivial(
                    node.properties["kwargs"]["value"], self.width_of(node),
                    pid=self.part_of(node))
                continue

            args = [values[pr] for pr in preds]
            enc_flags = [is_ct(pr) for pr in preds]

            if not is_ct(node) and not any(enc_flags) \
                    and node.operation == Operation.Generic:
                # fully-clear subcomputation (the encrypted branches below
                # assume at least one ciphertext operand).  Clear INPUTS
                # are jit-traced arrays, so numpy-reduction evaluators
                # cannot run; dispatch the np.* shapes to jnp and rely on
                # operator/ufunc evaluators dispatching natively otherwise.
                kw = node.properties.get("kwargs", {})
                if name == "sum":
                    values[node] = jnp.sum(args[0], axis=kw.get("axis"))
                elif name == "reshape":
                    values[node] = jnp.reshape(args[0], kw["shape"])
                elif name == "transpose":
                    values[node] = jnp.transpose(args[0], kw["axes"])
                elif name == "broadcast_to":
                    values[node] = jnp.broadcast_to(args[0], kw["shape"])
                elif name == "concatenate":
                    values[node] = jnp.concatenate(args, axis=kw["axis"])
                elif name in ("tlu", "univariate", "dynamic_tlu") \
                        and any(hasattr(a, "aval") for a in args):
                    raise NotImplementedError(
                        f"clear {name} over a runtime clear input is not "
                        "supported; precompute it outside the circuit")
                else:
                    values[node] = node(*args)
                continue

            if name == "add" or name == "subtract":
                a, b = args
                ea, eb = enc_flags
                if ea and eb:
                    out = a + b if name == "add" else a - b
                elif ea and not eb:
                    enc_b = self._encode_clear(b, self.width_of(node))
                    if name == "add":
                        out = a.at[..., -1].add(enc_b)
                    else:
                        out = a.at[..., -1].add(jnp.uint64(0) - enc_b)
                else:  # clear - encrypted (or clear + encrypted)
                    enc_a = self._encode_clear(a, self.width_of(node))
                    if name == "add":
                        out = b.at[..., -1].add(enc_a)
                    else:
                        out = (jnp.uint64(0) - b).at[..., -1].add(enc_a)
                values[node] = out
            elif name == "multiply":
                a, b = args
                ea, eb = enc_flags
                if ea and eb:
                    raise NotImplementedError(
                        "encrypted x encrypted multiplication lowers to two "
                        "TLUs ((x+y)^2/4 - (x-y)^2/4); planned")
                ct, clear = (a, b) if ea else (b, a)
                c = jnp.asarray(clear).astype(jnp.int64).astype(jnp.uint64)
                values[node] = ct * c[..., None]
            elif name == "negative":
                values[node] = jnp.uint64(0) - args[0]
            elif name in ("matmul", "dot"):
                # NOTE: contractions stay multiply+reduce-sum (not
                # dot_general): XLA's x64-removal pass cannot rewrite a u64
                # dot on TPU, but handles elementwise mul and add-reductions.
                a, b = args
                ea, eb = enc_flags
                if ea and eb:
                    raise NotImplementedError("enc x enc matmul planned")
                # traced-safe clear conversion: runtime clear inputs are
                # jit tracers, so no np.asarray here
                def u64_clear(v):
                    return (jnp.asarray(v).astype(jnp.int64)
                            .astype(jnp.uint64))
                if ea:
                    ct, w = a, u64_clear(b)
                    if w.ndim == 1:
                        out = (ct * w[..., None]).sum(axis=-2)
                    elif w.ndim == 2:
                        # (..., K, d) x (K, M) -> (..., M, d)
                        out = (ct[..., :, None, :]
                               * w[:, :, None]).sum(axis=-3)
                    else:
                        raise NotImplementedError(
                            "matmul with a clear operand above 2-D is not "
                            "lowered; reshape to a stack of 2-D matmuls")
                else:
                    w, ct = u64_clear(a), b
                    if w.ndim == 1:
                        # (K,) x (K, ..., d): contract the leading K axis
                        # whatever the encrypted rank
                        out = (w.reshape((-1,) + (1,) * (ct.ndim - 1))
                               * ct).sum(axis=0)
                    elif w.ndim == 2 and ct.ndim == 2:
                        # (M, K) x (K, d) -> (M, d)
                        out = (w[..., None] * ct[None, ...]).sum(axis=1)
                    elif w.ndim == 2:
                        # (M, K) x (..., K, P, d) -> (..., M, P, d):
                        # numpy matmul broadcasts the clear matrix over the
                        # encrypted stack, contracting the ct's axis -2
                        # (axis -3 with the trailing ciphertext dim)
                        out = (w[:, :, None, None]
                               * ct[..., None, :, :, :]).sum(axis=-3)
                    else:
                        raise NotImplementedError(
                            "matmul with a clear operand above 2-D is not "
                            "lowered; reshape to a stack of 2-D matmuls")
                values[node] = out
            elif name == "sum":
                axis = node.properties["kwargs"].get("axis")
                ct = args[0]
                nd = ct.ndim - 1  # data dims (ciphertext axis is last)
                if axis is None:
                    out = ct.sum(axis=tuple(range(nd))) if nd else ct
                else:
                    axes = axis if isinstance(axis, tuple) else (axis,)
                    # negative axes count from the last *data* dim, i.e. one
                    # before the trailing ciphertext axis
                    out = ct.sum(axis=tuple(a if a >= 0 else a - 1
                                            for a in axes))
                values[node] = out
            elif name == "crt_tlu":
                from concrete_tpu.core import kernels_wop as kw_mod
                spec = self.wop_specs[node.uid]
                w_in = self.part_of(preds[0])
                kkey, bkey = keys_for(w_in)
                wp = self.wop_params_for(w_in)
                cache_key = tuple(pr.uid for pr in preds)
                if cache_key not in crt_ggsw_cache:
                    chunks = []
                    for j in reversed(range(len(spec.moduli))):
                        flat = args[j].reshape((-1, args[j].shape[-1]))
                        # LSB of residue j sits at 63 - (its actual
                        # encoding width); index bits per block were
                        # clamped to that width at materialize time
                        chunks.append(kw_mod.extract_bits_batch(
                            flat, spec.block_bits[j],
                            63 - spec.block_widths[j], kkey, bkey,
                            wp.base))
                    bit_stack = jnp.concatenate(chunks, axis=1)
                    crt_ggsw_cache[cache_key] = \
                        kw_mod.circuit_bootstrap_batch(
                            bit_stack, kkey, bkey, pfpksk_for(w_in), wp)
                ggsws = crt_ggsw_cache[cache_key]
                ob = spec.out_bits
                lut_torus = ((jnp.asarray(wop_tables[node.uid],
                                          dtype=jnp.uint64)
                              & jnp.uint64((1 << (ob + 1)) - 1))
                             << jnp.uint64(63 - ob))
                out = kw_mod.vertical_packing_batch(lut_torus, ggsws, wp)
                out = out.reshape(args[0].shape[:-1] + (out.shape[-1],))
                values[node] = cross(out, w_in, self.part_of(node))
            elif name in ("tlu", "univariate"):
                ct = args[0]
                pid_in = self.part_of(preds[0]) if preds else self.p
                pid_out = self.part_of(node)
                if node.uid in self.wop_specs:
                    out = run_wop(ct, self.wop_specs[node.uid],
                                  wop_tables[node.uid], pid_in)
                    values[node] = cross(out, pid_in, pid_out)
                    continue
                spec = self.tlu_specs[node.uid]
                kkey, bkey = keys_for(pid_in)
                lut_poly = lut_polys[node.uid]
                shape = ct.shape[:-1]
                flat = ct.reshape((-1, ct.shape[-1]))
                out = kn.pbs_batch(flat, kkey, bkey, lut_poly,
                                   self.params_for_width(pid_in),
                                   spec.message_bits,
                                   signed=spec.signed_input)
                out = out.reshape(shape + (out.shape[-1],))
                values[node] = cross(out, pid_in, pid_out)
            elif name == "dynamic_tlu":
                # table is a runtime clear tensor: build the accumulator
                # polynomial in-circuit (kernels.encode_expand_lut_jnp) and
                # run the same batched PBS as a static TLU
                table_vals, ct = args
                w_in = self.width_of(preds[1])
                w_out = self.width_of(node)
                pid_in = self.part_of(preds[1])
                signed = isinstance(preds[1].output.dtype, Integer) \
                    and preds[1].output.dtype.is_signed
                pparams = self.params_for_width(pid_in)
                lut_poly = kn.encode_expand_lut_jnp(
                    jnp.asarray(table_vals), pparams.polynomial_size,
                    w_in, w_out, signed=signed)
                kkey, bkey = keys_for(pid_in)
                shape = ct.shape[:-1]
                flat = ct.reshape((-1, ct.shape[-1]))
                out = kn.pbs_batch(flat, kkey, bkey, lut_poly, pparams,
                                   w_in, signed=signed)
                out = out.reshape(shape + (out.shape[-1],))
                values[node] = cross(out, pid_in, self.part_of(node))
            elif name == "multivariate":
                spec = self.wop_specs.get(node.uid) \
                    or self.multivariate_specs[node.uid]
                preds_enc = [q for q in preds if q.output.is_encrypted]
                w_in = self.part_of(preds_enc[0]) if preds_enc else self.p
                w_out = self.part_of(node)
                packed = None
                bias = 0
                for ct, mn, off in zip(args, spec.mins, spec.offsets):
                    term = ct * jnp.uint64(1 << off)
                    packed = term if packed is None else packed + term
                    bias += mn << off
                if node.uid in self.wop_specs:
                    packed = packed.at[..., -1].add(
                        jnp.uint64(0) - self._encode_clear(
                            bias, spec.nb_bits))
                    out = run_wop(packed, spec, wop_tables[node.uid], w_in)
                    values[node] = cross(out, w_in, w_out)
                    continue
                packed = packed.at[..., -1].add(
                    jnp.uint64(0) - self._encode_clear(
                        bias, spec.message_bits))
                kkey, bkey = keys_for(w_in)
                lut_poly = lut_polys[node.uid]
                shape = packed.shape[:-1]
                flat = packed.reshape((-1, packed.shape[-1]))
                out = kn.pbs_batch(flat, kkey, bkey, lut_poly,
                                   self.params_for_width(w_in),
                                   spec.message_bits, signed=False)
                out = out.reshape(shape + (out.shape[-1],))
                values[node] = cross(out, w_in, w_out)
            elif name == "conv":
                # contraction looped over the kh*kw KERNEL positions (small,
                # static), not the oh*ow output pixels: each term is one big
                # strided-slice + u64-safe multiply-reduce that XLA tiles
                # well, and the jaxpr stays O(kh*kw) regardless of image
                # size (per-pixel unrolling blew up MNIST-size graphs).
                kw = node.properties["kwargs"]
                w = np.asarray(kw["weight"], dtype=np.int64).astype(np.uint64)
                bias = kw.get("bias")
                sh, sw = kw["strides"]
                ph, pw = kw["padding"]
                ct = args[0]                     # (n, c, h, w, d)
                o, i, kh, kwid = w.shape
                nb, c, h, wdt, d = ct.shape
                if ph or pw:
                    ct = jnp.pad(ct, ((0, 0), (0, 0), (ph, ph), (pw, pw),
                                      (0, 0)))
                oh = (h + 2 * ph - kh) // sh + 1
                ow = (wdt + 2 * pw - kwid) // sw + 1
                w_j = jnp.asarray(w)             # (o, c, kh, kw)
                out = None
                for ki in range(kh):
                    for kj in range(kwid):
                        # (n, c, oh, ow, d) strided window at (ki, kj)
                        win = ct[:, :, ki:ki + sh * (oh - 1) + 1:sh,
                                 kj:kj + sw * (ow - 1) + 1:sw, :]
                        # contract c (u64-safe: multiply + add-reduce)
                        term = (win[:, None]
                                * w_j[None, :, :, ki, kj, None, None, None]
                                ).sum(axis=2)
                        out = term if out is None else out + term
                if bias is not None:
                    enc_b = self._encode_clear(
                        np.asarray(bias, dtype=np.int64),
                        self.width_of(node))
                    out = out.at[..., -1].add(enc_b[None, :, None, None])
                values[node] = out
            elif name == "extract_bits":
                # lsb-cascade bit extraction (kernels_wop.extract_bits_to):
                # ~2 sign-PBS per peeled bit, reassembled at the output
                # width by summing re-scaled bit ciphertexts
                from concrete_tpu.core import kernels_wop as kw_mod
                positions = node.properties["kwargs"]["positions"]
                ct = args[0]
                preds_enc = [q for q in preds if q.output.is_encrypted]
                p_in = self.width_of(preds_enc[0])
                p_out = self.width_of(node)
                pid_in = self.part_of(preds_enc[0])
                order = sorted(range(len(positions)),
                               key=lambda j: positions[j])
                asc_pos = [positions[j] for j in order]
                # requested bit j carries weight 2^j in the reassembled
                # output: encoded scale = (63 - p_out) + j
                asc_scales = [63 - p_out + j for j in order]
                kkey, bkey = keys_for(pid_in)
                shape = ct.shape[:-1]
                flat = ct.reshape((-1, ct.shape[-1]))
                bits_out = kw_mod.extract_bits_to(
                    flat, tuple(asc_pos), tuple(asc_scales),
                    63 - p_in, kkey, bkey, self.params_for_width(pid_in))
                out = bits_out.sum(axis=1)
                out = out.reshape(shape + (out.shape[-1],))
                values[node] = cross(out, pid_in, self.part_of(node))
            elif name in ("round_bit_pattern", "truncate_bit_pattern"):
                # fused rounding (ProcessRounding): the consumer TLU's LUT
                # is built at the reduced width, so the consumer's
                # round-to-nearest (the native path's modulus switch OR the
                # WoP path's lowest bit-extraction decision — both round on
                # the dropped bits) performs the rounding for free.
                # Truncation (floor) additionally biases by -half a step.
                ct = args[0]
                if name == "truncate_bit_pattern" \
                        and not node.properties.get("approximate"):
                    # Exactness.APPROXIMATE skips this bias (off-by-half
                    # on ties, one clear addition cheaper)
                    lsbs = int(node.properties["kwargs"]["lsbs_to_remove"])
                    half = 1 << (lsbs - 1)
                    bias = self._encode_clear(half, self.width_of(node))
                    ct = ct.at[..., -1].add(jnp.uint64(0) - bias)
                values[node] = ct
            elif name == "hint":
                values[node] = args[0]
            elif name == "array":
                # fhe.array: stack scalar ciphertexts into one tensor;
                # clear entries are trivially encrypted first
                shape = node.output.shape
                w = self.width_of(node)
                cts = [a if flag
                       else self._trivial_traced(a, w,
                                                 pid=self.part_of(node))
                       for a, flag in zip(args, enc_flags)]
                values[node] = jnp.stack(cts).reshape(
                    tuple(shape) + (cts[0].shape[-1],))
            elif name == "trace_message":
                # Tracing dialect analog: free identity in execution; with
                # CONCRETE_TPU_TRACE=1 emits a runtime print of the
                # ciphertext body word (the server cannot decrypt — same
                # visibility as the reference's trace_ciphertext)
                import os
                ct = args[0]
                if os.environ.get("CONCRETE_TPU_TRACE") == "1":
                    msg = node.properties["kwargs"].get("message", "trace")
                    jax.debug.print(msg + ": body={x}",
                                    x=ct[..., -1] if is_ct(node) else ct)
                values[node] = ct
            elif name == "concatenate":
                axis = node.properties["kwargs"]["axis"]
                if is_ct(node):
                    nd = len(node.output.shape)
                    ax = axis % nd  # data axes only; ct axis stays last
                    values[node] = jnp.concatenate(args, axis=ax)
                else:
                    values[node] = np.concatenate(args, axis=axis)
            elif name == "transpose":
                axes = node.properties["kwargs"]["axes"]
                ct = args[0]
                if is_ct(node):
                    nd = ct.ndim - 1
                    perm = tuple(axes) if axes is not None \
                        else tuple(reversed(range(nd)))
                    values[node] = jnp.transpose(ct, perm + (nd,))
                else:
                    values[node] = np.transpose(ct, axes)
            elif name == "broadcast_to":
                shape = node.properties["kwargs"]["shape"]
                ct = args[0]
                if is_ct(node):
                    values[node] = jnp.broadcast_to(
                        ct, tuple(shape) + (ct.shape[-1],))
                else:
                    values[node] = np.broadcast_to(ct, shape)
            elif name == "index":
                index = node.properties["kwargs"]["index"]
                if is_ct(node):
                    # the index addresses *data* dims; keep the trailing
                    # ciphertext axis out of its reach (incl. Ellipsis)
                    idx_t = index if isinstance(index, tuple) else (index,)
                    values[node] = args[0][idx_t + (slice(None),)]
                else:
                    values[node] = args[0][index]
            elif name == "assign":
                # x[index] = v (static or fancy assignment,
                # FHELinalgOps.td fancy_assign)
                index = node.properties["kwargs"]["index"]
                x, v = args
                ex, ev_ = enc_flags
                if is_ct(node):
                    w = self.width_of(node)
                    if not ex:
                        x = self._trivial_any(x, w, pid=self.part_of(node))
                    if not ev_:
                        v = self._trivial_any(v, w, pid=self.part_of(node))
                    idx_t = index if isinstance(index, tuple) else (index,)
                    values[node] = x.at[idx_t + (slice(None),)].set(v)
                else:
                    out = np.array(x)
                    out[index] = v
                    values[node] = out
            elif name == "reshape":
                shape = node.properties["kwargs"]["shape"]
                ct = args[0]
                if is_ct(node):
                    values[node] = ct.reshape(
                        tuple(node.output.shape) + (ct.shape[-1],))
                else:
                    values[node] = np.reshape(ct, shape)
            else:
                raise NotImplementedError(
                    f"operation '{name}' is not lowered yet")

        outs = []
        from concrete_tpu.compilation.widths import output_encoding_width
        for out_node in graph.ordered_outputs:
            v = values[out_node]
            if not is_ct(out_node):
                # clear outputs may derive from runtime clear inputs (jit
                # tracers): traced encoder, at a width covering the clear
                # value's full range (must match ClientSpecs.output_widths)
                v = self._trivial_any(
                    v, output_encoding_width(out_node, self.p))
            outs.append(v)
        return tuple(outs)
