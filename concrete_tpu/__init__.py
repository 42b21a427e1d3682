"""concrete_tpu — a TPU-native TFHE execution framework (JAX/XLA/Pallas).

Functionally equivalent to Zama Concrete's Python stack (reference:
/root/reference, frontends/concrete-python/concrete/fhe/__init__.py) but
architected for TPUs: circuits trace to a graph executed by batched JAX/Pallas
kernels instead of the MLIR->LLVM CPU path.
"""

from concrete_tpu.version import __version__

__all__ = ["__version__"]
