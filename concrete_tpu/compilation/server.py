"""Server: executes the compiled circuit on encrypted data.

Reference: frontends/concrete-python/concrete/fhe/compilation/server.py
(Server.create/run/save/load at :88,245,307,379 over the native
ServerProgram/dlopen'ed circuit).  Here "the compiled artifact" is the traced
graph + crypto parameters; the executable is a jitted JAX function produced
by GraphExecutor, compiled (and cached) by XLA on first run.
"""

from __future__ import annotations

import zipfile

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu.compilation.executor import GraphExecutor
from concrete_tpu.compilation.specs import ClientSpecs
from concrete_tpu.representation import Graph


class Server:
    def __init__(self, graph: Graph, specs: ClientSpecs):
        self.graph = graph
        self.client_specs = specs
        self._executor = GraphExecutor(graph, specs.params,
                                       specs.message_bits,
                                       wop_gadgets=specs.wop_gadgets,
                                       specs=specs)
        self._jitted = None

    # -- execution ---------------------------------------------------------

    def run(self, *args, evaluation_keys) -> tuple:
        """Run the circuit on encrypted/clear arguments.

        evaluation_keys: (LimbKSK, LimbBSK) from Keys.evaluation, plus the
        packed PFPKSK as a third element when the circuit has WoP TLUs.
        Multi-partition circuits take a 4-tuple (ksk_by_width, bsk_by_width,
        pfpksk_by_width_or_None, fks_by_frontier) — Circuit._evaluation_keys
        builds it from MultiKeys.
        """
        from concrete_tpu.compilation.evaluation_keys import EvaluationKeys
        from concrete_tpu.core.compression import (SeededLweCiphertext,
                                                   decompress)
        if isinstance(evaluation_keys, EvaluationKeys):
            # public-material object from Client.evaluation_keys: pack for
            # the device with this circuit's truncation/WoP requirements
            wp = self.client_specs.wop_params()
            # WoP circuits need the untruncated BSK (Circuit._evaluation_keys
            # has the rationale)
            evaluation_keys = evaluation_keys.packed(
                None if wp is not None else self.client_specs.message_bits,
                norm2=self.graph.max_norm2(), wop_params=wp)
        ksk, bsk, *rest = evaluation_keys
        pfpksk = rest[0] if rest else None
        fks = rest[1] if len(rest) > 1 else None
        enc_inputs = {}
        for pos, arg in enumerate(args):
            spec = self.client_specs.inputs[pos]
            if isinstance(arg, SeededLweCiphertext):
                arg = decompress(arg)
            enc_inputs[pos] = jnp.asarray(arg) if spec.is_encrypted \
                else np.asarray(arg)
        lut_polys = {uid: jnp.asarray(s.lut_poly)
                     for uid, s in self._executor.tlu_specs.items()}
        lut_polys.update({uid: jnp.asarray(s.lut_poly)
                          for uid, s in
                          self._executor.multivariate_specs.items()})
        wop_tables = {uid: jnp.asarray(s.table)
                      for uid, s in self._executor.wop_specs.items()}
        if self._executor.wop_specs and pfpksk is None:
            raise ValueError(
                "circuit contains WoP-PBS table lookups; pass the packed "
                "PFPKSK as evaluation_keys[2] (Keys.wop_evaluation)")
        if self._jitted is None:
            ex = self._executor

            def fn(enc_inputs, ksk, bsk, lut_polys, wop_tables, pfpksk, fks):
                return ex.run(enc_inputs, ksk, bsk, lut_polys,
                              wop_tables, pfpksk, fks=fks)
            self._jitted = jax.jit(fn)
        outs = self._jitted(enc_inputs, ksk, bsk, lut_polys, wop_tables,
                            pfpksk, fks)
        return tuple(np.asarray(o) for o in outs)

    # -- deployment (reference server.py:245-378) --------------------------

    def save(self, path: str) -> None:
        """Save a deployment archive (graph + specs) — data-only formats
        (JSON + npz), so Server.load of an untrusted archive executes no
        code (the reference ships capnp/MLIR for the same reason,
        server.py:245, concrete-protocol.capnp).

        Univariate nodes are materialized into explicit tables first so the
        archive contains no Python callables.
        """
        import networkx as nx
        from concrete_tpu.compilation.executor import (multivariate_raw_table,
                                                       packed_layout,
                                                       raw_table)
        from concrete_tpu.compilation.graph_io import serialize_graph
        from concrete_tpu.compilation.widths import encoding_width
        p = self.client_specs.message_bits
        mapping = {}
        for node in self.graph.graph.nodes:
            if node.name == "univariate":
                preds = self.graph.ordered_preds_of(node)
                p_in = encoding_width(preds[0], p) if preds else p
                mapping[node] = node.materialized_as_tlu(
                    raw_table(node, p_in))
            elif node.name == "multivariate" \
                    and "table" not in node.properties["kwargs"]:
                from concrete_tpu.compilation.widths import packed_width
                p_in = packed_width(self.graph, node)
                mins, widths, offsets = packed_layout(self.graph, node)
                mapping[node] = node.materialized_as_multivariate(
                    multivariate_raw_table(self.graph, node, p_in),
                    mins, widths, offsets)
        g2 = nx.relabel_nodes(self.graph.graph, mapping, copy=True) \
            if mapping else self.graph.graph
        graph2 = Graph(
            g2,
            {q: mapping.get(n, n) for q, n in self.graph.input_nodes.items()},
            {q: mapping.get(n, n) for q, n in self.graph.output_nodes.items()},
            self.graph.name)
        graph_json, graph_npz = serialize_graph(graph2)
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("client.specs.json", self.client_specs.serialize())
            z.writestr("graph.json", graph_json)
            z.writestr("graph_arrays.npz", graph_npz)

    @classmethod
    def load(cls, path: str) -> "Server":
        from concrete_tpu.compilation.graph_io import deserialize_graph
        from concrete_tpu.representation.typing import validate_graph
        with zipfile.ZipFile(path) as z:
            specs = ClientSpecs.deserialize(
                z.read("client.specs.json").decode())
            graph = deserialize_graph(z.read("graph.json").decode(),
                                      z.read("graph_arrays.npz"))
        # archives are untrusted input: reject inconsistent type records
        # before building the executor (representation/typing.py)
        validate_graph(graph)
        return cls(graph, specs)

    # -- introspection -----------------------------------------------------

    def lowering_text(self) -> str:
        """Human-readable per-node lowering plan — the analog of the
        reference's `show_mlir` dump (Configuration.show_mlir): what kernel
        each graph node dispatches to and at which encoding width."""
        from concrete_tpu.compilation.widths import encoding_width
        ex = self._executor
        lines = []
        for node in self.graph.topological_order():
            if not node.output.is_encrypted:
                continue
            w = encoding_width(node, self.client_specs.message_bits)
            kind = node.name
            if node.uid in ex.wop_specs:
                s = ex.wop_specs[node.uid]
                kind = f"wop_pbs(nb={s.nb_bits}, out={s.out_bits})"
            elif node.uid in ex.tlu_specs:
                s = ex.tlu_specs[node.uid]
                kind = f"keyswitch+pbs(p={s.message_bits}" \
                    + (", signed" if s.signed_input else "") + ")"
            elif node.uid in getattr(ex, "multivariate_specs", {}):
                kind = "packed multivariate keyswitch+pbs"
            lines.append(f"%{node.uid} = {kind} : eint{w}"
                         f"{list(node.output.shape)}")
        return "\n".join(lines)

    @property
    def complexity(self) -> float:
        """Estimated cost in int8 MACs (our optimizer's cost model).

        Multi-partition circuits cost each PBS with its own partition's
        parameters (plus conversion keyswitches at the frontiers)."""
        from concrete_tpu.compilation.widths import tlu_input_partition
        from concrete_tpu.optimizer.v0 import (cost_fks_macs, cost_ks_macs,
                                               cost_pbs_macs, cost_wop_macs)
        ex = self._executor
        default = self.client_specs.message_bits

        def atomic_cost(p):
            return (cost_pbs_macs(p.n_small, p.glwe_dimension,
                                  p.polynomial_size, p.pbs_level,
                                  p.pbs_base_log)
                    + cost_ks_macs(p.n_big, p.n_small, p.ks_level,
                                   p.ks_base_log))
        total = 0.0
        for n in self.graph.graph.nodes:
            if n.name not in ("tlu", "univariate", "multivariate",
                              "dynamic_tlu", "extract_bits") \
                    or not n.output.is_encrypted:
                continue
            size = max(int(np.prod(n.output.shape)), 1)
            w_in = tlu_input_partition(self.graph, n, default)
            p = ex.params_for_width(w_in)
            if n.name == "extract_bits":
                # lsb cascade: cleans + per-requested-bit sign-PBS
                # (statistics.py extract_bits accounting)
                positions = n.properties["kwargs"]["positions"]
                n_pbs = max(int(b) for b in positions) + len(positions)
                total += size * n_pbs * atomic_cost(p)
                continue
            spec = ex.wop_specs.get(n.uid)
            wp = ex.wop_params_for(w_in)
            if spec is not None and wp is not None:
                total += size * cost_wop_macs(
                    p, spec.nb_bits, wp.cbs_level, wp.pfks_level,
                    wp.cbs_base_log, wp.pfks_base_log)
            else:
                total += size * atomic_cost(p)
            w_out = ex.part_of(n)
            if (w_in, w_out) in ex.conversions:
                lvl, base = ex.conversions[(w_in, w_out)]
                total += size * cost_fks_macs(
                    p.n_big, ex.params_for_width(w_out).n_big, lvl, base)
        return total

    def programmable_bootstrap_count(self) -> int:
        """PBS count from the statistics grid (one source of truth with
        Circuit.programmable_bootstrap_count; counts multivariate packing,
        dynamic lookups, and bit extraction, skips clear-output TLUs)."""
        from concrete_tpu.compilation import statistics as st
        records = st.collect(self.graph, self._executor,
                             self.client_specs.message_bits)
        return st.total(records, st.PBS)
