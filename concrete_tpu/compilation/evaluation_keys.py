"""EvaluationKeys: the PUBLIC key material a client ships to a server.

Reference: concrete.fhe.EvaluationKeys (compilation/evaluation_keys.py) /
ServerKeyset in the compiler — bootstrap + keyswitch (+ packing) keys with
serialize/deserialize, strictly excluding secret keys.  `Keys.serialize`
covers the *client's* full keyset (secrets included, for the client's own
storage); deployment must send only this object.

Serialization is the same data-only npz discipline as Keys (versioned
header, allow_pickle=False).  The raw u64 keys are shipped; the server
packs them for its device (limb planes / NTT spectra) on arrival, exactly
like a freshly generated keyset.
"""

from __future__ import annotations

import dataclasses
import io
import json
from typing import Optional

import numpy as np

from concrete_tpu.params import CryptoParams

_FORMAT_VERSION = 1


@dataclasses.dataclass
class EvaluationKeys:
    """bsk (n, l, k+1, k+1, N) u64, ksk (n_big, ks_l, n_small+1) u64,
    optional PFPKSKs keyed by (level, base_log)."""
    params: CryptoParams
    bsk: np.ndarray
    ksk: np.ndarray
    pfpksk: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_keys(cls, keys) -> "EvaluationKeys":
        """Extract the public material from a generated Keys object."""
        from concrete_tpu.compilation.keys import MultiKeys
        if isinstance(keys, MultiKeys):
            raise NotImplementedError(
                "EvaluationKeys covers mono keysets; multi-partition "
                "deployments currently ship Circuit._evaluation_keys "
                "(per-partition packed keys) directly")
        keys._require()
        return cls(params=keys.params,
                   bsk=np.asarray(keys.server.bsk),
                   ksk=np.asarray(keys.server.ksk),
                   pfpksk=dict(keys._pfpksk))

    # -- packing for the device (what Server.run consumes) ------------------

    def packed(self, message_bits: Optional[int] = None, norm2: int = 1,
               wop_params=None):
        """(LimbKSK, BSK[, packed PFPKSK]) for Server.run — the SAME
        packing policy as Keys.evaluation_for (noise-budget BSK
        truncation, NTT switchover at N >= Keys.NTT_MIN_POLY_SIZE),
        implemented by delegating to a transient Keys holding only the
        public material.  Results are cached on the instance: Server.run
        repacks nothing on repeat calls."""
        from concrete_tpu.compilation.keys import Keys
        from concrete_tpu.core.refimpl import SecretKeys, ServerKeys
        wop_key = None if wop_params is None else \
            (wop_params.pfks_level, wop_params.pfks_base_log)
        cache_key = (message_bits, norm2, wop_key)
        if not hasattr(self, "_packed_cache"):
            object.__setattr__(self, "_packed_cache", {})
        if cache_key in self._packed_cache:
            return self._packed_cache[cache_key]
        holder = Keys(self.params)
        holder._secret = SecretKeys(
            lwe_small=np.zeros(self.params.n_small, dtype=np.uint64),
            glwe=np.zeros((self.params.glwe_dimension,
                           self.params.polynomial_size), dtype=np.uint64))
        holder._server = ServerKeys(bsk=self.bsk, ksk=self.ksk)
        out = holder.evaluation_for(message_bits, norm2=norm2)
        if wop_params is not None:
            from concrete_tpu.core import kernels_wop as kw
            if wop_key not in self.pfpksk:
                raise ValueError(
                    f"evaluation keys carry no PFPKSK for gadget "
                    f"{wop_key}; regenerate them from a keyset with WoP "
                    "keys")
            out = out + (kw.pack_pfpksk(self.pfpksk[wop_key], wop_params),)
        self._packed_cache[cache_key] = out
        return out

    # -- serialization -------------------------------------------------------

    def serialize(self) -> bytes:
        header = {"version": _FORMAT_VERSION,
                  "params": dataclasses.asdict(self.params)}
        out = {"header": np.frombuffer(json.dumps(header).encode(),
                                       dtype=np.uint8),
               "bsk": self.bsk, "ksk": self.ksk}
        for (lev, base), arr in self.pfpksk.items():
            out[f"pfpksk_{lev}_{base}"] = arr
        buf = io.BytesIO()
        np.savez(buf, **out)
        return buf.getvalue()

    @classmethod
    def deserialize(cls, blob: bytes) -> "EvaluationKeys":
        with np.load(io.BytesIO(blob), allow_pickle=False) as z:
            header = json.loads(bytes(np.asarray(z["header"])).decode())
            if header.get("version", 0) > _FORMAT_VERSION:
                raise ValueError(
                    "evaluation-key format is newer than this library")
            pfpksk = {}
            for name in z.files:
                if name.startswith("pfpksk_"):
                    _, lev, base = name.split("_")
                    pfpksk[(int(lev), int(base))] = np.asarray(z[name])
            return cls(params=CryptoParams(**header["params"]),
                       bsk=np.asarray(z["bsk"]), ksk=np.asarray(z["ksk"]),
                       pfpksk=pfpksk)
