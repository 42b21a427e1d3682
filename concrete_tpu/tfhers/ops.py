"""Tracing ops: TFHE-rs radix values <-> native encrypted integers.

Reference: tfhers/tracing.py to_native/from_native and the compiler lowering
mlir/converter.py:937-1009 (per-limb keyswitch + PBS partition changes).

Here: a TFHE-rs value inside a circuit is its vector of block values
(shape (..., n_blocks), LSB-first).  to_native recombines blocks into one
native integer (leveled dot with radix weights after per-block message
extraction); from_native splits a native integer into blocks via one TLU per
block.
"""

from __future__ import annotations

import numpy as np

from concrete_tpu.tfhers.dtypes import TFHERSIntegerType
from concrete_tpu.tracing.tracer import Tracer


def to_native(value, dtype: TFHERSIntegerType):
    """blocks (..., n_blocks) -> native integer.

    Blocks may carry garbage in their carry space; each block is first
    reduced mod msg_modulus by a TLU, then recombined with radix weights.
    """
    msg_mod = dtype.msg_modulus
    weights = np.array([msg_mod ** i for i in range(dtype.n_blocks)],
                       dtype=np.int64)
    if isinstance(value, (tuple, list)):
        # from_native's traced form: one tracer per block
        from concrete_tpu.extensions.univariate import univariate
        out = None
        for i, block in enumerate(value):
            clean = univariate(lambda v: int(v) % msg_mod)(block) \
                if isinstance(block, Tracer) else \
                np.asarray(block) % msg_mod
            term = clean * int(weights[i])
            out = term if out is None else out + term
        return out
    if not isinstance(value, Tracer):
        blocks = np.asarray(value) % msg_mod
        return (blocks * weights).sum(axis=-1)
    from concrete_tpu.extensions.univariate import univariate
    clean = univariate(lambda v: int(v) % msg_mod)(value)
    return np.dot(clean, weights)


def from_native(value, dtype: TFHERSIntegerType):
    """native integer -> blocks (..., n_blocks), one TLU per block."""
    msg_mod = dtype.msg_modulus
    w = dtype.msg_width
    if not isinstance(value, Tracer):
        v = np.asarray(value)
        return np.stack([(v >> (i * w)) & (msg_mod - 1)
                         for i in range(dtype.n_blocks)], axis=-1)
    from concrete_tpu.extensions.univariate import univariate
    blocks = []
    for i in range(dtype.n_blocks):
        blocks.append(univariate(
            lambda v, i=i: (int(v) >> (i * w)) & (msg_mod - 1))(value))
    # one tracer per radix block; to_native accepts this tuple directly
    return tuple(blocks) if len(blocks) > 1 else blocks[0]
