"""Graph rewrite passes (pre-lowering).

The TPU-native analog of the reference's FHE-level transform passes
(lib/Support/Pipeline.cpp:234-299 — EncryptedMulToDoubleTLU, FHEMaxTransform,
boolean/bigint transforms): rewrites run on the traced Graph *before* bounds
measurement, so inserted nodes get measured bounds and bit widths like any
user node.
"""

from __future__ import annotations

import numpy as np

from concrete_tpu.representation import Graph, Node, Operation
from concrete_tpu.values import ValueDescription


def _square_div4(v):
    v = np.asarray(v, dtype=np.int64)
    return (v * v) // 4


def lower_encrypted_multiplication(graph: Graph) -> None:
    """multiply(enc, enc) -> tlu((x+y)^2/4) - tlu((x-y)^2/4).

    Reference: EncryptedMulToDoubleTLU (lib/Conversion/utils, invoked from
    Pipeline.cpp:234 transformHighLevelFHEOps); exact for integers because
    x+y and x-y share parity.
    """
    g = graph.graph
    targets = [n for n in list(g.nodes)
               if n.name == "multiply"
               and len(n.inputs) == 2
               and all(v.is_encrypted for v in n.inputs)]
    for node in targets:
        preds = graph.ordered_preds_of(node)
        x_node, y_node = preds[0], preds[1]

        def vd(shape, encrypted=True):
            return ValueDescription(dtype=None, shape=shape,
                                    is_encrypted=encrypted)

        shape = node.output.shape
        add_n = Node.generic("add", [x_node.output, y_node.output],
                             vd(shape), lambda x, y: x + y)
        sub_n = Node.generic("subtract", [x_node.output, y_node.output],
                             vd(shape), lambda x, y: x - y)
        sq1 = Node.generic("univariate", [add_n.output], vd(shape),
                           lambda v: _square_div4(v), function=_square_div4)
        sq2 = Node.generic("univariate", [sub_n.output], vd(shape),
                           lambda v: _square_div4(v), function=_square_div4)
        out_n = Node.generic("subtract", [sq1.output, sq2.output],
                             vd(shape), lambda a, b: a - b)

        for new in (add_n, sub_n, sq1, sq2, out_n):
            g.add_node(new)
        g.add_edge(x_node, add_n, input_idx=0)
        g.add_edge(y_node, add_n, input_idx=1)
        g.add_edge(x_node, sub_n, input_idx=0)
        g.add_edge(y_node, sub_n, input_idx=1)
        g.add_edge(add_n, sq1, input_idx=0)
        g.add_edge(sub_n, sq2, input_idx=0)
        g.add_edge(sq1, out_n, input_idx=0)
        g.add_edge(sq2, out_n, input_idx=1)

        # rewire consumers of the multiply node
        for _, succ, key, data in list(g.out_edges(node, keys=True,
                                                   data=True)):
            g.add_edge(out_n, succ, **data)
        g.remove_node(node)
        for pos, n2 in list(graph.output_nodes.items()):
            if n2 is node:
                graph.output_nodes[pos] = out_n


def run_default_transforms(graph: Graph) -> None:
    lower_encrypted_multiplication(graph)
