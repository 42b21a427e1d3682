"""fhe.LookupTable — explicit table lookups.

Reference: frontends/concrete-python/concrete/fhe/extensions/table.py:15.
`table[x]` on an encrypted value becomes a TLU node executed as one
programmable bootstrap; negative indices wrap (lut[-1] == lut[len - 1]),
matching the reference's indexing semantics for signed inputs.
"""

from __future__ import annotations

import numpy as np

from concrete_tpu.tracing.tracer import Tracer
from concrete_tpu.values import ValueDescription


class LookupTable:
    def __init__(self, table):
        self.table = np.asarray(table, dtype=np.int64)
        if self.table.ndim != 1:
            raise ValueError("LookupTable must be one-dimensional")
        n = len(self.table)
        if n & (n - 1):
            raise ValueError("LookupTable length must be a power of two")

    def __len__(self) -> int:
        return len(self.table)

    def __getitem__(self, index):
        if not isinstance(index, Tracer):
            return self.table[np.asarray(index) % len(self.table)] \
                if not isinstance(index, (int, np.integer)) \
                else self.table[int(index) % len(self.table)]
        table = self.table

        def evaluator(x):
            return table[np.asarray(x) % len(table)]

        output = ValueDescription.of(
            np.zeros(index.node.output.shape, dtype=np.int64),
            is_encrypted=index.node.output.is_encrypted)
        out_desc = ValueDescription(
            dtype=ValueDescription.of(table).dtype,
            shape=output.shape, is_encrypted=output.is_encrypted)
        return Tracer._generic("tlu", [index], evaluator, out_desc,
                               table=table)

    def __repr__(self) -> str:
        return f"LookupTable{list(self.table)}"
