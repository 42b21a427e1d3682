"""Multi-partition execution: per-precision keysets + partition changes.

The mechanism underlying the reference's DAG_MULTI parameter strategy
(TFHECircuitSolutionParametrization + FHE.change_partition,
lib/Dialect/TFHE/Transforms/TFHECircuitSolutionParametrization.cpp:1308):
different circuit regions run under different crypto parameters, with
conversion keyswitch keys carrying ciphertexts across partition frontiers.

Here: a `PartitionedKeyset` holds one keyset per partition plus conversion
KSKs (source partition's big key -> target partition's *small* key, so a
partition crossing rides the KS->BR of the target's bootstrap — exactly the
reference's tfhers_to_native/change_partition lowering shape,
mlir/converter.py:937).  `cross_partition_pbs` applies a TLU whose input
lives in partition A and whose output lives in partition B.

The automatic partition *assignment* (the reference optimizer's
multi_parameters/partitionning.rs) is round-2 work; this module provides the
executable mechanism and is exercised directly in tests/test_partitions.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax.numpy as jnp

from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as kn
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import CryptoParams


@dataclasses.dataclass
class Partition:
    name: str
    params: CryptoParams
    message_bits: int
    secret: ref.SecretKeys
    server: ref.ServerKeys
    packed_ksk: kn.LimbKSK = None
    packed_bsk: kn.LimbBSK = None

    def packed(self):
        if self.packed_ksk is None:
            self.packed_ksk = kn.pack_ksk(self.server.ksk, self.params)
            self.packed_bsk = kn.pack_bsk(self.server.bsk, self.params)
        return self.packed_ksk, self.packed_bsk


@dataclasses.dataclass
class PartitionedKeyset:
    partitions: dict[str, Partition]
    #: (src, dst) -> conversion KSK: src big key -> dst small key, packed
    conversion: dict[tuple[str, str], kn.LimbKSK]

    def partition(self, name: str) -> Partition:
        return self.partitions[name]


def keygen_partitioned(rng, specs: dict[str, tuple[CryptoParams, int]],
                       conversions: list[tuple[str, str]]
                       ) -> PartitionedKeyset:
    """Generate keysets for every partition plus the requested conversion
    keyswitch keys.

    specs: name -> (params, message_bits); conversions: (src, dst) pairs.
    The conversion KSK uses the *destination* partition's keyswitch
    decomposition (the reference's optimizer emits per-frontier conversion
    keys the same way, keys_spec.rs ConversionKeySwitchKey).
    """
    parts = {}
    for name, (params, bits) in specs.items():
        secret, server = kg.keygen(rng, params)
        parts[name] = Partition(name=name, params=params, message_bits=bits,
                                secret=secret, server=server)
    conv = {}
    for src, dst in conversions:
        a, b = parts[src], parts[dst]
        ksk_u64 = kg.make_ksk(rng, a.secret.lwe_big, b.secret.lwe_small,
                              b.params.ks_base_log, b.params.ks_level,
                              b.params.lwe_std)
        conv[(src, dst)] = kn.pack_ksk(ksk_u64, b.params)
    return PartitionedKeyset(partitions=parts, conversion=conv)


def cross_partition_pbs(keyset: PartitionedKeyset, src: str, dst: str,
                        ct_batch, table: np.ndarray, in_bits: int,
                        out_bits: int, signed: bool = False):
    """TLU with input under partition `src`, output under partition `dst`.

    Pipeline: conversion keyswitch (src.big -> dst.small) -> modswitch ->
    blind rotate with dst's BSK -> sample extract.

    Precision belongs to *values*, not partitions: `in_bits` is the input
    value's encoded precision (requires dst.polynomial_size >= 2^(in_bits+1)),
    `out_bits` the output's.  A partition only accepts TLUs whose input
    precision it can resolve — exactly the reference optimizer's feasibility
    constraint when assigning partitions.
    """
    b = keyset.partition(dst)
    if b.params.polynomial_size < (1 << (in_bits + 1)):
        raise ValueError(
            f"partition '{dst}' (N={b.params.polynomial_size}) cannot "
            f"resolve a {in_bits}-bit TLU input")
    conv_ksk = keyset.conversion[(src, dst)]
    _, bsk = b.packed()
    lut_vals = np.asarray(table, dtype=np.int64)
    idx = np.arange(1 << in_bits)
    lut_enc = (lut_vals[idx % len(lut_vals)]
               & ((1 << (out_bits + 1)) - 1)).astype(np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(
        lut_enc, b.params.polynomial_size, in_bits, signed=signed,
        out_bits=out_bits))
    return np.asarray(kn.pbs_batch(
        jnp.asarray(ct_batch), conv_ksk, bsk, lut_poly, b.params,
        in_bits, signed=signed))
