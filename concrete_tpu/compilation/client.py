"""Client: keygen, encrypt, decrypt.

Reference: frontends/concrete-python/concrete/fhe/compilation/client.py
(Client.encrypt/decrypt at :156,264 over the native ClientProgram's
encode->encrypt->compress transformer chain, lib/Common/Transformers.cpp).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from concrete_tpu.compilation.keys import Keys
from concrete_tpu.compilation.specs import ClientSpecs
from concrete_tpu.core import keygen as kg
from concrete_tpu.core import refimpl as ref
from concrete_tpu.dtypes import Integer


class Client:
    def __init__(self, specs: ClientSpecs, keys: Optional[Keys] = None):
        self.specs = specs
        self.keys = keys if keys is not None else Keys(specs.params)

    def keygen(self, force: bool = False, seed: Optional[int] = None) -> None:
        if force or not self.keys.are_generated:
            self.keys.generate(seed)

    @property
    def evaluation_keys(self):
        """Public key material for the server (reference
        Client.evaluation_keys): serializable, secret-free."""
        self.keygen()
        return self.keys.evaluation_keys

    # -- encryption --------------------------------------------------------

    def encrypt(self, *args, compress: bool = False):
        """Encrypt positional arguments (clear args pass through).

        Returns a tuple (or single value) of u64 LWE arrays of shape
        (*value_shape, n_big + 1) — or SeededLweCiphertext when
        compress=True (Compression::SEED, reference Transformers.cpp:224).
        """
        self.keygen()
        if len(args) != len(self.specs.inputs):
            raise ValueError(
                f"expected {len(self.specs.inputs)} argument(s), "
                f"got {len(args)}")
        # encryption masks/noise from the ChaCha20 CSPRNG (the reference's
        # dedicated *encryption* csprng, Csprng.h:18-61)
        from concrete_tpu.utils.csprng import SecureGenerator
        rng = SecureGenerator()
        out = []
        for pos, arg in enumerate(args):
            spec = self.specs.inputs[pos]
            if not spec.is_encrypted:
                arr = np.asarray(arg)
                # clear arguments get the same shape/range validation as
                # encrypted ones (a wrong-shaped clear value would
                # otherwise broadcast silently inside the jitted executor)
                self._validate(np.asarray(arr, dtype=np.int64), spec, pos)
                out.append(arr)
                continue
            arr = np.asarray(arg, dtype=np.int64)
            self._validate(arr, spec, pos)
            width = self.specs.input_width(pos)
            sk, std = self._secret_for(self.specs.input_partition(pos))
            enc = ref.encode(arr, width)
            if compress:
                import os
                from concrete_tpu.core import compression as cz
                ct = cz.encrypt_seeded(rng, sk, enc, std,
                                       seed=os.urandom(32))
            else:
                ct = kg.encrypt_lwe_batch(rng, sk, enc, std)
            out.append(ct)
        return tuple(out) if len(out) != 1 else out[0]

    def _secret_for(self, width: int):
        """(big LWE secret key, encryption std) of a partition id
        (mono: the single keyset).

        Fresh inputs encrypt under the BIG key (dimension k*N), whose
        curve-minimal noise is glwe_std — using the small key's (much
        larger) lwe_std here would needlessly drown levelled circuits
        (e.g. wide matmuls with no PBS) in fresh noise."""
        from concrete_tpu.compilation.keys import MultiKeys
        if isinstance(self.keys, MultiKeys):
            return (self.keys.secret_for(width).lwe_big,
                    self.specs.params_for_width(width).glwe_std)
        return self.keys.secret.lwe_big, self.specs.params.glwe_std

    def _validate(self, arr, spec, pos):
        dtype = spec.dtype
        if isinstance(dtype, Integer):
            if arr.size and (arr.min() < dtype.min or arr.max() > dtype.max):
                raise ValueError(
                    f"argument {pos} has value(s) outside the compiled range "
                    f"[{dtype.min}, {dtype.max}] (got "
                    f"[{arr.min()}, {arr.max()}]); recompile with a wider "
                    "inputset")
        if tuple(arr.shape) != tuple(spec.shape):
            raise ValueError(
                f"argument {pos} has shape {arr.shape}, expected {spec.shape}")

    # -- decryption --------------------------------------------------------

    def decrypt(self, *results):
        if not self.keys.are_generated:
            # never auto-generate here: decrypting under a fresh keyset
            # would silently decode noise into plausible-looking integers
            raise RuntimeError(
                "keys are not generated/loaded; call keygen() or "
                "Keys.load() with the keyset the inputs were encrypted "
                "under before decrypting")
        out = []
        for pos, res in enumerate(results):
            spec = self.specs.outputs[pos]
            width = self.specs.output_width(pos)
            sk, _ = self._secret_for(self.specs.output_partition(pos))
            phase = ref.lwe_decrypt(sk, np.asarray(res))
            signed = isinstance(spec.dtype, Integer) and spec.dtype.is_signed
            val = ref.decode(phase, width, signed=signed)
            out.append(val if spec.shape else val[()] if
                       np.ndim(val) == 0 else val)
        return tuple(out) if len(out) != 1 else out[0]
