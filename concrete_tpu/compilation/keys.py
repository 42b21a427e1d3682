"""Key management: generation, caching, save/load.

Reference: frontends/concrete-python/concrete/fhe/compilation/keys.py:19-258
(Keys with generate/save/load and KeysetCache) and compiler-side
lib/Common/Keysets.cpp (on-disk keyset cache keyed by parameter hash).
"""

from __future__ import annotations

import dataclasses
import hashlib
import io
import json
import os
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
        self._packed_bsk_ntt = None
        # WoP-PBS private functional packing keyswitch keys, keyed by the
        # pfks gadget (level, base_log): raw u64 + packed limb planes
        self._pfpksk: dict[tuple, np.ndarray] = {}
        self._packed_pfpksk: dict[tuple, object] = {}

    # -- generation --------------------------------------------------------

    @property
    def are_generated(self) -> bool:
        return self._secret is not None

    def generate(self, seed: Optional[int] = None,
                 glwe_key: Optional[np.ndarray] = None,
                 secret_only: bool = False) -> None:
        """Generate (or load from the insecure cache) all key material.

        All secret/noise randomness comes from the ChaCha20 CSPRNG
        (utils/csprng.SecureGenerator; reference Csprng.h:18-61) — seeded
        from os.urandom by default, deterministically from `seed` for
        reproducible (test) keys.

        `glwe_key` injects an externally shared big secret key (TFHE-rs
        bridge); such keysets are never cached.

        `secret_only` skips the evaluation keys (BSK/KSK): partitions that
        run no PBS (e.g. a multi-partition circuit's pure output encoding)
        only ever encrypt/decrypt, and a BSK at their parameters can be
        arbitrarily large (N up to 2^16).
        """
        self._seed = seed
        if self.cache_directory is not None and glwe_key is None:
            path = self._cache_path(seed, secret_only)
            if os.path.exists(path):
                self.load(path)
                return
        from concrete_tpu.utils.csprng import SecureGenerator
        rng = SecureGenerator(seed)
        self._seed = seed
        self._foreign_key = glwe_key is not None
        if secret_only:
            from concrete_tpu.core.refimpl import (SecretKeys,
                                                   sample_binary_key)
            sk_small = sample_binary_key(rng, (self.params.n_small,))
            gsk = sample_binary_key(
                rng, (self.params.glwe_dimension,
                      self.params.polynomial_size))                 if glwe_key is None else np.asarray(
                    glwe_key, dtype=np.uint64).reshape(
                        self.params.glwe_dimension,
                        self.params.polynomial_size)
            self._secret, self._server = SecretKeys(lwe_small=sk_small,
                                                    glwe=gsk), None
        else:
            self._secret, self._server = kg.keygen(rng, self.params,
                                                   glwe_key=glwe_key)
        self._packed_ksk = None
        self._packed_bsk = None
        self._packed_bsk_ntt = None
        if self.cache_directory is not None and glwe_key is None:
            os.makedirs(self.cache_directory, exist_ok=True)
            self.save(self._cache_path(seed, secret_only))

    def _cache_path(self, seed, secret_only: bool = False) -> str:
        # NOTE: cache files contain PLAINTEXT SECRET KEYS (hence the
        # "insecure" in use_insecure_key_cache); they are data-only npz.
        h = hashlib.sha256(
            repr((self.params, seed, secret_only)).encode()).hexdigest()[:24]
        return os.path.join(self.cache_directory, f"keys_{h}.npz")

    # -- accessors ---------------------------------------------------------

    @property
    def secret(self) -> SecretKeys:
        self._require()
        return self._secret

    @property
    def server(self) -> ServerKeys:
        self._require_server()
        return self._server

    @property
    def evaluation(self) -> tuple[kn.LimbKSK, kn.LimbBSK]:
        """Device-packed evaluation keys (limb KSK + banded limb BSK)."""
        return self.evaluation_for(message_bits=None)

    @property
    def evaluation_keys(self):
        """The serializable PUBLIC key material to ship to a server
        (reference fhe.EvaluationKeys) — bsk/ksk/pfpksk, no secrets."""
        from concrete_tpu.compilation.evaluation_keys import EvaluationKeys
        return EvaluationKeys.from_keys(self)

    def evaluation_for(self, message_bits=None, norm2: int = 1):
        """Packed evaluation keys (LimbKSK + BSK).

        When `message_bits` is given, the largest provably-negligible BSK
        limb truncation is chosen (params.choose_truncate_limbs for the
        banded path, choose_fused_primes for the fused-NTT path, both
        scaled by the circuit's norm2 amplification); else none.

        The blind-rotate kernel is chosen by the SAME hardware-calibrated
        cost comparison the parameter optimizer uses
        (optimizer.v0.fused_ntt_preferred): the fused single-kernel
        CRT-NTT (ops/pallas_fused_ntt.py) when its modeled effective MACs
        beat the banded limb-plane path — in practice N >= 2048, where
        banded's ~N^2 MACs explode — else banded.  Both give oracle-exact
        PBS results.  CONCRETE_TPU_FUSED_NTT=0 forces banded; =1 forces
        fused at any supported N (>= 1024).  (The retired per-stage
        XLA/Pallas CRT-NTT variants lost to these everywhere and the XLA
        one crashed the TPU worker — VERDICT r3 #10; core/ntt_tpu.py
        remains only as the limb-sharded multi-chip math.)
        """
        import os
        self._require_server()
        forced_fused = os.environ.get("CONCRETE_TPU_FUSED_NTT")
        if forced_fused is None:
            from concrete_tpu.optimizer.v0 import fused_ntt_preferred
            use_fused = fused_ntt_preferred(self.params, message_bits)
        else:
            use_fused = forced_fused == "1"
        if use_fused:
            from concrete_tpu.ops import pallas_fused_ntt as fnt
            if self._packed_ksk is None:
                self._packed_ksk = kn.pack_ksk(self._server.ksk, self.params)
            cached = getattr(self, "_packed_bsk_fused", None)
            key = (message_bits, int(norm2))
            if cached is None or cached[0] != key:
                fbsk = fnt.pack_bsk_fused(self._server.bsk, self.params,
                                          message_bits=message_bits,
                                          norm2=norm2)
                self._packed_bsk_fused = cached = (key, fbsk)
            return self._packed_ksk, cached[1]
        truncate = 0
        if message_bits is not None:
            from concrete_tpu.params import choose_truncate_limbs
            truncate = choose_truncate_limbs(self.params, message_bits,
                                             norm2=norm2)
        if (self._packed_ksk is None or self._packed_bsk is None
                or self._packed_bsk.truncate_limbs != truncate):
            self._packed_ksk = kn.pack_ksk(self._server.ksk, self.params)
            self._packed_bsk = kn.pack_bsk(self._server.bsk, self.params,
                                           truncate_limbs=truncate)
        return self._packed_ksk, self._packed_bsk

    def wop_evaluation(self, wop_params):
        """Device-packed PFPKSK for WoP-PBS (generated lazily per pfks
        gadget; reference PackingKeyswitchKey keygen, Keys.cpp:365)."""
        from concrete_tpu.core import kernels_wop as kw
        from concrete_tpu.core import wop
        self._require()
        key = (wop_params.pfks_level, wop_params.pfks_base_log)
        if key not in self._pfpksk:
            from concrete_tpu.utils.csprng import SecureGenerator
            rng = SecureGenerator()
            self._pfpksk[key] = wop.pfpksk_gen(
                rng, self._secret, wop_params).pfpksk
            if self.cache_directory is not None \
                    and not getattr(self, "_foreign_key", False):
                # refresh the cache so the PFPKSK is not regenerated —
                # but NEVER cache keysets derived from an injected
                # (TFHE-rs shared) secret key, mirroring generate()
                path = self._cache_path(getattr(self, "_seed", None))
                if os.path.exists(path):
                    self.save(path)
        if key not in self._packed_pfpksk:
            self._packed_pfpksk[key] = kw.pack_pfpksk(
                self._pfpksk[key], wop_params)
        return self._packed_pfpksk[key]

    def _require(self):
        if self._secret is None:
            raise RuntimeError("keys are not generated yet; call generate()")

    def _require_server(self):
        self._require()
        if self._server is None:
            raise RuntimeError(
                "this keyset was generated secret-only (a PBS-less "
                "partition); it has no evaluation keys")

    # -- serialization (data-only npz + JSON params; no pickle — loading a
    # key blob must never execute code.  Reference ships capnp Keysets for
    # the same reason, concrete-protocol.capnp) ------------------------------

    _FORMAT_VERSION = 1

    def _to_npz_dict(self) -> dict:
        self._require()
        header = {"version": self._FORMAT_VERSION,
                  "params": dataclasses.asdict(self.params)}
        out = {
            "header": np.frombuffer(json.dumps(header).encode(),
                                    dtype=np.uint8),
            "lwe_small": self._secret.lwe_small,
            "glwe": self._secret.glwe,
        }
        if self._server is not None:
            out["bsk"] = self._server.bsk
            out["ksk"] = self._server.ksk
        for (lev, base), pfpksk in self._pfpksk.items():
            out[f"pfpksk_{lev}_{base}"] = pfpksk
        return out

    def _from_npz(self, z) -> None:
        header = json.loads(bytes(np.asarray(z["header"])).decode())
        if header.get("version", 0) > self._FORMAT_VERSION:
            raise ValueError("key file format is newer than this library")
        params = CryptoParams(**header["params"])
        if params != self.params:
            raise ValueError("key file was generated for other parameters")
        self._secret = SecretKeys(lwe_small=np.asarray(z["lwe_small"]),
                                  glwe=np.asarray(z["glwe"]))
        files = getattr(z, "files", [])
        self._server = ServerKeys(bsk=np.asarray(z["bsk"]),
                                  ksk=np.asarray(z["ksk"])) \
            if "bsk" in files else None
        self._packed_ksk = None
        self._packed_bsk = None
        self._packed_bsk_ntt = None
        self._pfpksk = {}
        self._packed_pfpksk = {}
        for name in getattr(z, "files", []):
            if name.startswith("pfpksk_"):
                _, lev, base = name.split("_")
                self._pfpksk[(int(lev), int(base))] = np.asarray(z[name])

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            np.savez(f, **self._to_npz_dict())

    def load(self, path: str) -> None:
        with np.load(path, allow_pickle=False) as z:
            self._from_npz(z)

    def serialize(self) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, **self._to_npz_dict())
        return buf.getvalue()

    @classmethod
    def deserialize(cls, blob: bytes) -> "Keys":
        with np.load(io.BytesIO(blob), allow_pickle=False) as z:
            header = json.loads(bytes(np.asarray(z["header"])).decode())
            keys = cls(CryptoParams(**header["params"]))
            keys._from_npz(z)
        return keys


class MultiKeys:
    """Keysets for a multi-partition circuit: one `Keys` per partition width
    plus big->big conversion keyswitch keys for the partition frontiers.

    The analog of the reference's multi-parameter Keyset
    (concrete-optimizer keys_spec.rs CircuitKeys: secret/bootstrap/keyswitch
    keys per partition + ConversionKeySwitchKey per frontier).  Cached as
    ONE file covering every partition and conversion, so the cache can never
    mix key material from different generations.
    """

    def __init__(self, partitions: dict, conversions: dict,
                 cache_directory: Optional[str] = None,
                 pbs_widths=None):
        """partitions: width -> CryptoParams; conversions:
        (src_width, dst_width) -> (level, base_log); pbs_widths: the
        partitions that actually run a PBS (None = all) — the others get
        secret-only keysets (their BSK would be dead weight, and a pure
        output partition can sit at N=2^14+ where a BSK is GBs)."""
        self.partitions = dict(partitions)
        self.conversions = dict(conversions)
        self.cache_directory = cache_directory
        self.pbs_widths = frozenset(pbs_widths) \
            if pbs_widths is not None else None
        self._keys: dict[int, Keys] = {
            w: Keys(p) for w, p in self.partitions.items()}
        self._fks: dict[tuple, np.ndarray] = {}
        self._packed_fks: dict[tuple, kn.LimbKSK] = {}

    def _needs_eval(self, w: int) -> bool:
        return self.pbs_widths is None or w in self.pbs_widths

    @property
    def are_generated(self) -> bool:
        return all(k.are_generated for k in self._keys.values()) \
            and set(self._fks) == set(self.conversions)

    def generate(self, seed: Optional[int] = None) -> None:
        self._seed = seed
        if self.cache_directory is not None:
            path = self._cache_path(seed)
            if os.path.exists(path):
                self.load(path)
                return
        from concrete_tpu.utils.csprng import SecureGenerator
        for w, keys in self._keys.items():
            # derive distinct per-partition seeds so equal-parameter
            # partitions never share secret key material
            keys.generate(None if seed is None else seed + 7919 * w,
                          secret_only=not self._needs_eval(w))
        self._fks = {}
        self._packed_fks = {}
        rng = SecureGenerator(None if seed is None else seed + 13)
        for (s, d), (lvl, base) in self.conversions.items():
            self._fks[(s, d)] = kg.make_ksk(
                rng, self._keys[s].secret.lwe_big,
                self._keys[d].secret.lwe_big, base, lvl,
                self.partitions[d].glwe_std)
        if self.cache_directory is not None:
            os.makedirs(self.cache_directory, exist_ok=True)
            self.save(self._cache_path(seed))

    def _cache_path(self, seed) -> str:
        h = hashlib.sha256(repr((sorted(self.pbs_widths)
                                  if self.pbs_widths is not None else None,
                                  sorted(self.partitions.items()),
                                 sorted(self.conversions.items()),
                                 seed)).encode()).hexdigest()[:24]
        return os.path.join(self.cache_directory, f"multikeys_{h}.npz")

    # -- accessors ---------------------------------------------------------

    def keys_for(self, width: int) -> Keys:
        return self._keys[width]

    def secret_for(self, width: int):
        return self._keys[width].secret

    def evaluation_for_width(self, width: int, norm2: int = 1):
        """Packed (LimbKSK, LimbBSK) of one partition id, with noise-budget
        BSK truncation at the partition's own message width (synthetic
        norm2-cut ids carry the width in their low byte)."""
        from concrete_tpu.compilation.widths import part_width
        return self._keys[width].evaluation_for(part_width(width),
                                                norm2=norm2)

    def conversion_key(self, src: int, dst: int) -> kn.LimbKSK:
        """Packed big->big conversion keyswitch key for a frontier."""
        key = (src, dst)
        if key not in self._packed_fks:
            import jax.numpy as jnp

            from concrete_tpu.core import limbs as lb
            lvl, base = self.conversions[key]
            limbs = lb.u64_to_balanced_i8(np.asarray(self._fks[key]))
            self._packed_fks[key] = kn.LimbKSK(
                planes=jnp.asarray(limbs), base_log=base, levels=lvl)
        return self._packed_fks[key]

    def wop_evaluation_for(self, width: int, wop_params):
        return self._keys[width].wop_evaluation(wop_params)

    # -- serialization (data-only npz; see Keys) ---------------------------

    def _to_npz_dict(self) -> dict:
        header = {"version": Keys._FORMAT_VERSION,
                  "partitions": sorted(self.partitions),
                  "conversions": [[s, d, l, b] for (s, d), (l, b)
                                  in sorted(self.conversions.items())]}
        out = {"multi_header": np.frombuffer(
            json.dumps(header).encode(), dtype=np.uint8)}
        for w, keys in self._keys.items():
            for name, arr in keys._to_npz_dict().items():
                out[f"p{w}__{name}"] = arr
        for (s, d), arr in self._fks.items():
            out[f"fks_{s}_{d}"] = arr
        return out

    def _from_npz(self, z) -> None:
        header = json.loads(bytes(np.asarray(z["multi_header"])).decode())
        if header.get("version", 0) > Keys._FORMAT_VERSION:
            raise ValueError("key file format is newer than this library")

        class _View:
            def __init__(self, z, prefix):
                self.z, self.prefix = z, prefix
                self.files = [n[len(prefix):] for n in getattr(z, "files", [])
                              if n.startswith(prefix)]

            def __getitem__(self, name):
                return self.z[self.prefix + name]

        for w, keys in self._keys.items():
            keys._from_npz(_View(z, f"p{w}__"))
        self._fks = {}
        self._packed_fks = {}
        for name in getattr(z, "files", []):
            if name.startswith("fks_"):
                _, s, d = name.split("_")
                self._fks[(int(s), int(d))] = np.asarray(z[name])

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            np.savez(f, **self._to_npz_dict())

    def load(self, path: str) -> None:
        with np.load(path, allow_pickle=False) as z:
            self._from_npz(z)

    def serialize(self) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, **self._to_npz_dict())
        return buf.getvalue()

    @classmethod
    def deserialize_with(cls, blob: bytes, partitions: dict,
                         conversions: dict) -> "MultiKeys":
        keys = cls(partitions, conversions)
        with np.load(io.BytesIO(blob), allow_pickle=False) as z:
            keys._from_npz(z)
        return keys
