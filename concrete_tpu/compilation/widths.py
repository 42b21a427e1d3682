"""Per-value encoding-width assignment (multi-precision mono compilation).

The reference assigns every value its own bit width with a z3 optimizer
(frontends/concrete-python/concrete/fhe/mlir/processors/assign_bit_widths.py:18):
equality constraints tie together the operands/results of leveled ops, while
table lookups may change width freely (the PBS re-encodes its output).  Under
single-keyset ("mono") semantics the optimal solution of that constraint
system is simply the maximum width within each equivalence class, which the
union-find below computes directly — no solver needed.

Classes ("encoding partitions") are the connected components of encrypted
values linked by non-TLU ops; a TLU's output starts a fresh class.  Each
node gets `properties["encoding_width"]`; TLUs then build 2^{p_in}-entry
tables and encode outputs at p_out, so a circuit mixing 2-bit and 8-bit
TLUs runs each PBS at its own width instead of the global max (the verdictly
biggest cost distortion of round 1).
"""

from __future__ import annotations

from concrete_tpu.dtypes import Integer
from concrete_tpu.representation import Graph, Node, Operation

# ops whose (encrypted) output is a *fresh* encoding — everything else keeps
# its operands' encoding
TLU_OPS = ("tlu", "univariate", "multivariate")


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


def packed_width(graph: Graph, node: Node) -> int:
    """Bit width of a multivariate node's packed operand (sum of operand
    widths from measured bounds, executor.packed_layout)."""
    total = 0
    for pr in graph.ordered_preds_of(node):
        lo, hi = pr.bounds
        total += max(int(hi - lo).bit_length(), 1)
    return total


def assign_encoding_widths(graph: Graph) -> dict[Node, int]:
    """Compute and store each encrypted node's encoding width.

    Returns the node -> width mapping; also sets
    node.properties["encoding_width"].  Must run after
    update_dtypes_from_bounds (widths come from measured dtypes).
    """
    uf = _UnionFind()
    enc_nodes = [n for n in graph.topological_order()
                 if n.output.is_encrypted]
    for node in enc_nodes:
        uf.find(node.uid)

    for node in graph.topological_order():
        preds = [p for p in graph.ordered_preds_of(node)
                 if p.output.is_encrypted]
        if node.name == "multivariate":
            # packed operands share one encoding; output is fresh
            for a, b in zip(preds, preds[1:]):
                uf.union(a.uid, b.uid)
            continue
        if node.name in TLU_OPS:
            continue  # output re-encoded by the PBS
        if not node.output.is_encrypted:
            continue
        for p in preds:
            uf.union(node.uid, p.uid)

    # class width = max member width, plus multivariate packing minimums
    width_of_root: dict[int, int] = {}
    for node in enc_nodes:
        root = uf.find(node.uid)
        w = node.output.dtype.bit_width \
            if isinstance(node.output.dtype, Integer) else 1
        width_of_root[root] = max(width_of_root.get(root, 1), w)
    for node in graph.topological_order():
        if node.name == "multivariate":
            preds = [p for p in graph.ordered_preds_of(node)
                     if p.output.is_encrypted]
            if preds:
                root = uf.find(preds[0].uid)
                width_of_root[root] = max(width_of_root.get(root, 1),
                                          packed_width(graph, node))

    result: dict[Node, int] = {}
    for node in enc_nodes:
        w = width_of_root[uf.find(node.uid)]
        node.properties["encoding_width"] = w
        result[node] = w
    return result


def encoding_width(node: Node, default: int) -> int:
    """The node's assigned encoding width (falling back to the circuit-wide
    message_bits for graphs compiled/serialized before width assignment)."""
    return int(node.properties.get("encoding_width", default))


ROUNDING_OPS = ("round_bit_pattern", "truncate_bit_pattern")


def tlu_fused_lsbs(graph: Graph, node: Node) -> int:
    """lsbs rounded away for free by this TLU's modulus switch (0 if the
    TLU's input is not a fused round/truncate_bit_pattern node)."""
    if node.name not in ("tlu", "univariate"):
        return 0
    preds = graph.ordered_preds_of(node)
    if len(preds) == 1 and preds[0].name in ROUNDING_OPS:
        return int(preds[0].properties["kwargs"]["lsbs_to_remove"])
    return 0


def tlu_effective_input_width(graph: Graph, node: Node, default: int) -> int:
    """The width at which this TLU's PBS actually runs: the input
    partition's encoding width, minus any fused rounding (ProcessRounding —
    the LUT index domain shrinks, mega-cases grow, noise tolerance rises)."""
    preds = [p for p in graph.ordered_preds_of(node)
             if p.output.is_encrypted]
    if not preds:
        return default
    p_in = max(encoding_width(p, default) for p in preds)
    return max(p_in - tlu_fused_lsbs(graph, node), 1)


def tlu_atomic_patterns(graph: Graph) -> list[tuple[int, int]]:
    """(precision, norm2) pairs the crypto parameters must satisfy.

    One per TLU (input-class width + accumulated MANP entering it, the
    packed norm for multivariate TLUs) plus one per encrypted output (decode
    margin at the output's width).  The reference optimizer builds the same
    per-PBS constraints from its operation DAG (dag/solo_key/analyze.rs);
    here MANP comes from the graph's norm2 dataflow.
    """
    manp, boundary = graph.manp_map()
    default = graph.max_bit_width
    patterns: list[tuple[int, int]] = []
    for node in graph.topological_order():
        if node.name in TLU_OPS:
            preds = [p for p in graph.ordered_preds_of(node)
                     if p.output.is_encrypted]
            if not preds:
                continue
            p_in = tlu_effective_input_width(graph, node, default)
            patterns.append((p_in, max(boundary.get(node, 1), 1)))
    for node in graph.ordered_outputs:
        if node.output.is_encrypted:
            patterns.append((encoding_width(node, default),
                             max(manp.get(node, 1), 1)))
    return patterns or [(1, 1)]
