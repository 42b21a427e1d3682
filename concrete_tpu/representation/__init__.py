from concrete_tpu.representation.node import Node, Operation
from concrete_tpu.representation.graph import Graph

__all__ = ["Node", "Operation", "Graph"]
