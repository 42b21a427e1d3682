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
        keys._require()
        return cls(params=keys.params,
                   bsk=np.asarray(keys.server.bsk),
                   ksk=np.asarray(keys.server.ksk),
                   pfpksk=dict(keys._pfpksk))

    # -- packing for the device (what Server.run consumes) ------------------

    def packed(self, message_bits: Optional[int] = None, norm2: int = 1,
               wop_params=None):
        """(LimbKSK, LimbBSK[, packed PFPKSK]) for Server.run, mirroring
        Keys.evaluation_for's packing choices."""
        from concrete_tpu.core import kernels as kn
        ksk = kn.pack_ksk(self.ksk, self.params)
        truncate = 0
        if message_bits is not None:
            from concrete_tpu.params import choose_truncate_limbs
            truncate = choose_truncate_limbs(self.params, message_bits,
                                             norm2=norm2)
        bsk = kn.pack_bsk(self.bsk, self.params, truncate_limbs=truncate)
        if wop_params is None:
            return ksk, bsk
        from concrete_tpu.core import kernels_wop as kw
        key = (wop_params.pfks_level, wop_params.pfks_base_log)
        if key not in self.pfpksk:
            raise ValueError(
                f"evaluation keys carry no PFPKSK for gadget {key}; "
                "regenerate them from a keyset with WoP keys")
        return ksk, bsk, kw.pack_pfpksk(self.pfpksk[key], wop_params)

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
