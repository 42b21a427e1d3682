from concrete_tpu.extensions.table import LookupTable
from concrete_tpu.extensions.univariate import univariate
from concrete_tpu.extensions.multivariate import multivariate
from concrete_tpu.extensions.basics import (zero, zeros, one, ones,
                                            zeros_like, ones_like,
                                            constant, identity, refresh)
from concrete_tpu.extensions.rounding import (AutoRounder, AutoTruncator,
                                              round_bit_pattern,
                                              truncate_bit_pattern)
from concrete_tpu.extensions.bits import bits
from concrete_tpu.extensions.control import if_then_else, mux, relu
from concrete_tpu.extensions.convolution import conv, maxpool
from concrete_tpu.extensions.tag import tag, hint
from concrete_tpu.extensions.tracing_ops import trace
from concrete_tpu.extensions.array_ops import array, inputset

__all__ = ["LookupTable", "univariate", "multivariate", "zero", "zeros",
           "one", "ones", "zeros_like", "ones_like", "constant",
           "identity", "refresh",
           "AutoRounder", "AutoTruncator", "round_bit_pattern",
           "truncate_bit_pattern", "bits", "if_then_else", "mux", "relu",
           "conv", "maxpool", "tag", "hint", "trace", "array", "inputset"]
