from concrete_tpu.extensions.table import LookupTable
from concrete_tpu.extensions.univariate import univariate
from concrete_tpu.extensions.multivariate import multivariate
from concrete_tpu.extensions.basics import (zero, zeros, one, ones,
                                            constant, identity, refresh)

__all__ = ["LookupTable", "univariate", "multivariate", "zero", "zeros", "one", "ones",
           "constant", "identity", "refresh"]
