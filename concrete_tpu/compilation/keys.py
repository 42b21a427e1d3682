"""Key management: generation, caching, save/load.

Reference: frontends/concrete-python/concrete/fhe/compilation/keys.py:19-258
(Keys with generate/save/load and KeysetCache) and compiler-side
lib/Common/Keysets.cpp (on-disk keyset cache keyed by parameter hash).
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Optional

import numpy as np

from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as kn
from concrete_tpu.core.refimpl import SecretKeys, ServerKeys
from concrete_tpu.params import CryptoParams


class Keys:
    """Client secret keys + server evaluation keys for one parameter set."""

    def __init__(self, params: CryptoParams,
                 cache_directory: Optional[str] = None):
        self.params = params
        self.cache_directory = cache_directory
        self._secret: Optional[SecretKeys] = None
        self._server: Optional[ServerKeys] = None
        self._packed_ksk: Optional[kn.LimbKSK] = None
        self._packed_bsk: Optional[kn.LimbBSK] = None

    # -- generation --------------------------------------------------------

    @property
    def are_generated(self) -> bool:
        return self._secret is not None

    def generate(self, seed: Optional[int] = None) -> None:
        """Generate (or load from the insecure cache) all key material.

        All secret/noise randomness comes from the ChaCha20 CSPRNG
        (utils/csprng.SecureGenerator; reference Csprng.h:18-61) — seeded
        from os.urandom by default, deterministically from `seed` for
        reproducible (test) keys.
        """
        if self.cache_directory is not None:
            path = self._cache_path(seed)
            if os.path.exists(path):
                self.load(path)
                return
        from concrete_tpu.utils.csprng import SecureGenerator
        rng = SecureGenerator(seed)
        self._secret, self._server = kg.keygen(rng, self.params)
        self._packed_ksk = None
        self._packed_bsk = None
        if self.cache_directory is not None:
            os.makedirs(self.cache_directory, exist_ok=True)
            self.save(self._cache_path(seed))

    def _cache_path(self, seed) -> str:
        h = hashlib.sha256(
            repr((self.params, seed)).encode()).hexdigest()[:24]
        return os.path.join(self.cache_directory, f"keys_{h}.pkl")

    # -- accessors ---------------------------------------------------------

    @property
    def secret(self) -> SecretKeys:
        self._require()
        return self._secret

    @property
    def server(self) -> ServerKeys:
        self._require()
        return self._server

    @property
    def evaluation(self) -> tuple[kn.LimbKSK, kn.LimbBSK]:
        """Device-packed evaluation keys (limb KSK + banded limb BSK)."""
        return self.evaluation_for(message_bits=None)

    def evaluation_for(self, message_bits=None, norm2: int = 1
                       ) -> tuple[kn.LimbKSK, kn.LimbBSK]:
        """Packed keys with noise-budget-aware BSK limb truncation.

        When `message_bits` is given, the largest provably-negligible
        truncation is chosen (params.choose_truncate_limbs, scaled by the
        circuit's norm2 amplification); else none.
        """
        self._require()
        truncate = 0
        if message_bits is not None:
            from concrete_tpu.params import choose_truncate_limbs
            truncate = choose_truncate_limbs(self.params, message_bits,
                                             norm2=norm2)
        if (self._packed_ksk is None
                or self._packed_bsk.truncate_limbs != truncate):
            self._packed_ksk = kn.pack_ksk(self._server.ksk, self.params)
            self._packed_bsk = kn.pack_bsk(self._server.bsk, self.params,
                                           truncate_limbs=truncate)
        return self._packed_ksk, self._packed_bsk

    def _require(self):
        if self._secret is None:
            raise RuntimeError("keys are not generated yet; call generate()")

    # -- serialization -----------------------------------------------------

    def save(self, path: str) -> None:
        self._require()
        with open(path, "wb") as f:
            pickle.dump({"params": self.params,
                         "secret": self._secret,
                         "server": self._server}, f)

    def load(self, path: str) -> None:
        with open(path, "rb") as f:
            data = pickle.load(f)
        if data["params"] != self.params:
            raise ValueError("key file was generated for other parameters")
        self._secret = data["secret"]
        self._server = data["server"]
        self._packed_ksk = None
        self._packed_bsk = None

    def serialize(self) -> bytes:
        self._require()
        return pickle.dumps({"params": self.params, "secret": self._secret,
                             "server": self._server})

    @classmethod
    def deserialize(cls, blob: bytes) -> "Keys":
        data = pickle.loads(blob)
        keys = cls(data["params"])
        keys._secret = data["secret"]
        keys._server = data["server"]
        return keys
