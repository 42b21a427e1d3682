"""Bridge: import/export TFHE-rs ciphertexts into a compiled circuit.

Reference: frontends/concrete-python/concrete/fhe/tfhers/bridge.py:18-303
(Bridge with import_value/export_value/keygen_with_initial_keys and
serialize_input_secret_key) over concrete-cpu's fheint.rs radix parsing.

This implementation operates at the raw-LWE level: a TFHE-rs radix
ciphertext is (n_blocks, lwe_dim + 1) u64 arrays encrypted under a shared
secret key with the TFHE-rs block encoding (delta = 2^(64 - msg - carry - 1)).
Byte-level (de)serialization of tfhe-rs' bincode framing is intentionally
out of scope in-process — `import_value`/`export_value` accept/produce the
raw block arrays, matching what concrete-cpu's C API exchanges after
parsing (fheint.rs `concrete_cpu_tfhers_fheint_to_lwe_array`).
"""

from __future__ import annotations

import numpy as np

from concrete_tpu.tfhers.dtypes import TFHERSIntegerType


class Bridge:
    def __init__(self, circuit, input_types: dict[int, TFHERSIntegerType]):
        self.circuit = circuit
        self.input_types = input_types

    # -- key management ----------------------------------------------------

    def keygen_with_initial_keys(self, input_idx_to_key: dict[int, np.ndarray],
                                 force: bool = False) -> None:
        """Generate circuit keys reusing a TFHE-rs secret key for the bridged
        inputs (the shared-key model of reference bridge.py:237).

        The BSK/KSK are generated *from* the shared key (core.keygen
        glwe_key injection), so imported ciphertexts bootstrap and decrypt
        correctly.  The shared key must equal the circuit's big LWE key
        dimension; full key-exchange across differing dimensions needs the
        multi-keyset partition machinery (core/partitions.py).
        """
        keys_in = {int(i): np.asarray(k, dtype=np.uint64)
                   for i, k in input_idx_to_key.items()}
        key = next(iter(keys_in.values()))
        for other in keys_in.values():
            if not np.array_equal(other, key):
                raise NotImplementedError(
                    "all bridged inputs must share one TFHE-rs secret key "
                    "(per-input keys need the multi-keyset partitions)")
        params = self.circuit.client_specs.params
        if key.size != params.n_big:
            raise NotImplementedError(
                "shared TFHE-rs key dimension differs from the circuit's big "
                "key; cross-partition key exchange is not implemented yet")
        keys = self.circuit.keys
        if (not force and keys.are_generated
                and np.array_equal(keys.secret.lwe_big, key.ravel())):
            return  # already generated from this exact shared key
        keys.generate(glwe_key=key)

    # -- values ------------------------------------------------------------

    def import_value(self, blocks: np.ndarray, input_idx: int) -> np.ndarray:
        """Raw TFHE-rs radix blocks (n_blocks, n+1) u64 -> circuit input.

        Re-encodes each block's phase from the TFHE-rs delta to the circuit's
        native scale by a plaintext multiply (both are powers of two).
        """
        dtype = self.input_types[input_idx]
        circuit_bits = self.circuit.client_specs.input_width(input_idx)
        native_delta_log2 = 64 - circuit_bits - 1
        blocks = np.asarray(blocks, dtype=np.uint64)
        if native_delta_log2 == dtype.delta_log2:
            return blocks
        if native_delta_log2 > dtype.delta_log2:
            # native scale coarser: multiply phase up (exact power of two)
            return blocks * np.uint64(
                1 << (native_delta_log2 - dtype.delta_log2))
        raise NotImplementedError(
            f"circuit precision ({circuit_bits} bits) exceeds the TFHE-rs "
            f"block precision; rescaling down needs a per-block PBS "
            f"(planned with the multi-partition machinery)")

    def export_value(self, ct: np.ndarray, output_idx: int,
                     dtype: TFHERSIntegerType) -> np.ndarray:
        """Circuit output -> raw TFHE-rs radix blocks (from_native must have
        produced one ciphertext per block)."""
        return np.asarray(ct, dtype=np.uint64)

    def serialize_input_secret_key(self, input_idx: int) -> bytes:
        key = self.circuit.keys.secret.lwe_big
        return np.asarray(key, dtype=np.uint64).tobytes()


def new_bridge(circuit, input_types: dict[int, TFHERSIntegerType] = None
               ) -> Bridge:
    return Bridge(circuit, input_types or {})
