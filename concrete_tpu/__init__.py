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

from concrete_tpu.version import __version__

from concrete_tpu.compilation.artifacts import DebugArtifacts
from concrete_tpu.compilation import (Circuit, Client, Compiler,
                                      Configuration, Keys, Server, compiler,
                                      function, module)
from concrete_tpu.compilation.compiler import circuit
from concrete_tpu.tracing import typing as _typing
import sys as _sys
for _w in range(1, 17):
    setattr(_sys.modules[__name__], f"uint{_w}", getattr(_typing, f"uint{_w}"))
    setattr(_sys.modules[__name__], f"int{_w}", getattr(_typing, f"int{_w}"))
tensor = _typing.tensor
from concrete_tpu.compilation.configuration import ParameterSelectionStrategy
from concrete_tpu.extensions import (AutoRounder, AutoTruncator, LookupTable,
                                     bits, constant, conv, hint, identity,
                                     trace,
                                     if_then_else, maxpool, multivariate, mux,
                                     one, ones, refresh, relu,
                                     round_bit_pattern, tag,
                                     truncate_bit_pattern, univariate, zero,
                                     zeros)
from concrete_tpu.params import CryptoParams
from concrete_tpu.tracing import Tracer

__all__ = [
    "__version__",
    "Circuit", "Client", "Compiler", "Configuration", "Keys", "Server",
    "compiler", "circuit", "function", "module",
    "ParameterSelectionStrategy",
    "CryptoParams", "Tracer",
    "LookupTable", "univariate", "multivariate", "constant", "identity",
    "trace",
    "refresh", "zero", "zeros", "one", "ones",
    "AutoRounder", "AutoTruncator", "round_bit_pattern",
    "truncate_bit_pattern", "bits", "if_then_else", "mux", "relu",
    "conv", "maxpool", "tag", "hint", "DebugArtifacts",
]
