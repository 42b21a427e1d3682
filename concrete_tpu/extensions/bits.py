"""fhe.bits — bit extraction from encrypted integers.

Reference: frontends/concrete-python/concrete/fhe/extensions/bits.py:19,155
(`fhe.bits(x)[i]`, slices of bits).  Each extracted bit costs one TLU today;
the reference's dedicated lsb-cascade lowering (FHE.lsb chains) is a planned
optimization.
"""

from __future__ import annotations




class Bits:
    def __init__(self, value):
        self.value = value

    def __getitem__(self, index):
        from concrete_tpu.extensions.univariate import univariate
        if isinstance(index, int):
            if index < 0:
                raise ValueError(
                    "negative bit indices require a known bit width; "
                    "use non-negative indices")
            return univariate(lambda v, i=index: (int(v) >> i) & 1)(
                self.value)
        if isinstance(index, slice):
            start = index.start or 0
            stop = index.stop
            step = index.step or 1
            if stop is None:
                raise ValueError("bit slices need an explicit stop")
            # value of the sliced bits reassembled as an integer
            sel = list(range(start, stop, step))

            def fn(v, sel=tuple(sel)):
                out = 0
                for j, b in enumerate(sel):
                    out |= ((int(v) >> b) & 1) << j
                return out

            return univariate(fn)(self.value)
        raise TypeError(f"unsupported bit index: {index!r}")


def bits(x) -> Bits:
    return Bits(x)
