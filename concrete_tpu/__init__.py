"""concrete_tpu — a TPU-native TFHE execution framework (JAX/XLA/Pallas).

Functionally equivalent to Zama Concrete's Python stack (reference:
frontends/concrete-python/concrete/fhe/__init__.py) but architected for TPUs:
circuits trace to a graph executed by batched JAX/Pallas kernels instead of
the MLIR->LLVM CPU path.

Quickstart (mirrors the reference README):

    import concrete_tpu as fhe

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def add(x, y):
        return x + y

    circuit = add.compile([(2, 3), (0, 0), (7, 7)])
    assert circuit.encrypt_run_decrypt(2, 6) == 8
"""

import enum as _enum

from concrete_tpu.version import __version__

from concrete_tpu.compilation.artifacts import (DebugArtifacts,
    FunctionDebugArtifacts, ModuleDebugArtifacts)
from concrete_tpu.compilation import (Circuit, Client, Compiler,
                                      Configuration, Keys, Server, compiler,
                                      function, module)
from concrete_tpu.compilation import FheFunction as Function
from concrete_tpu.compilation import FheModule as Module
from concrete_tpu.compilation.compiler import circuit
from concrete_tpu.compilation.composition import (AllComposable, AllInputs,
                                                  AllOutputs,
                                                  CompositionPolicy, Input,
                                                  NotComposable, Output,
                                                  Wire, Wired)
from concrete_tpu.compilation.configuration import (
    ApproximateRoundingConfig, BitwiseStrategy, ComparisonStrategy,
    Exactness, KeysetRestriction, MinMaxStrategy, MultiParameterStrategy,
    MultivariateStrategy, ParameterSelectionStrategy, RangeRestriction,
    SecurityLevel)
from concrete_tpu.compilation.evaluation_keys import EvaluationKeys
from concrete_tpu.compilation.scheduler import DataflowScheduler
from concrete_tpu.compilation.specs import ClientSpecs
from concrete_tpu.compilation.value import TransportValue, Value
from concrete_tpu.tracing import typing as _typing
import sys as _sys
for _w in range(1, 65):
    setattr(_sys.modules[__name__], f"uint{_w}", getattr(_typing, f"uint{_w}"))
    setattr(_sys.modules[__name__], f"int{_w}", getattr(_typing, f"int{_w}"))
tensor = _typing.tensor
f32 = _typing.f32
f64 = _typing.f64
from concrete_tpu.dtypes import Float, Integer
from concrete_tpu.extensions import (AutoRounder, AutoTruncator, LookupTable,
                                     array, bits, constant, conv, hint,
                                     identity, if_then_else, inputset,
                                     maxpool, multivariate, mux, one, ones,
                                     ones_like,
                                     refresh, relu, round_bit_pattern, tag,
                                     trace, truncate_bit_pattern, univariate,
                                     zero, zeros, zeros_like)
from concrete_tpu.params import CryptoParams
from concrete_tpu.representation import Graph, Node, Operation
from concrete_tpu.tracing import Tracer
from concrete_tpu import tfhers

#: reference configuration.py:24-27 defaults
MAXIMUM_TLU_BIT_WIDTH = 16
DEFAULT_P_ERROR = None
DEFAULT_GLOBAL_P_ERROR = 1 / 100_000


class EncryptionStatus(str, _enum.Enum):
    """Parameter encryption status (reference compilation/status.py)."""
    CLEAR = "clear"
    ENCRYPTED = "encrypted"


class GraphProcessor:
    """Base class for Configuration.additional_pre/post_processors
    (reference representation/GraphProcessor): subclass and implement
    apply(graph)."""

    def apply(self, graph):
        raise NotImplementedError

    def __call__(self, graph):
        return self.apply(graph)


__all__ = [
    "__version__",
    "Circuit", "Client", "Compiler", "Configuration", "Keys", "Server",
    "Function", "Module", "compiler", "circuit", "function", "module",
    "ClientSpecs", "EvaluationKeys", "Value", "TransportValue",
    "DataflowScheduler",
    "ParameterSelectionStrategy", "MultiParameterStrategy",
    "ComparisonStrategy", "BitwiseStrategy", "MultivariateStrategy",
    "MinMaxStrategy", "Exactness", "SecurityLevel",
    "ApproximateRoundingConfig", "RangeRestriction", "KeysetRestriction",
    "CompositionPolicy", "AllComposable", "NotComposable", "Wired", "Wire",
    "Input", "Output", "AllInputs", "AllOutputs",
    "EncryptionStatus", "GraphProcessor",
    "MAXIMUM_TLU_BIT_WIDTH", "DEFAULT_P_ERROR", "DEFAULT_GLOBAL_P_ERROR",
    "CryptoParams", "Tracer", "Graph", "Node", "Operation",
    "Integer", "Float", "tensor", "tfhers",
    "LookupTable", "univariate", "multivariate", "constant", "identity",
    "trace", "array", "inputset",
    "refresh", "zero", "zeros", "one", "ones",
    "zeros_like", "ones_like", "f32", "f64",
    "FunctionDebugArtifacts", "ModuleDebugArtifacts",
    "AutoRounder", "AutoTruncator", "round_bit_pattern",
    "truncate_bit_pattern", "bits", "if_then_else", "mux", "relu",
    "conv", "maxpool", "tag", "hint", "DebugArtifacts",
]
