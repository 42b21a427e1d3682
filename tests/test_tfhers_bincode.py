"""tfhe-rs safe_serialization codec tests (tfhers/bincode.py).

The byte fixtures below are HAND-AUTHORED with raw struct.pack calls from
the spec in docs/tfhers_wire.md — written independently of the codec so a
codec bug cannot hide in a shared helper.  Real tfhe-rs captures dropped
into tests/data/tfhers/*.bin are auto-discovered and must parse.
"""

import glob
import os
import struct

import numpy as np
import pytest

from concrete_tpu.tfhers import bincode as bc
from concrete_tpu.tfhers.serialization import (RadixCiphertext,
                                               deserialize_radix,
                                               serialize_radix)


def _hand_authored_fheuint4() -> tuple[bytes, np.ndarray]:
    """A FheUint4 (2 blocks of 2+2 bits, lwe_size 3) written byte-by-byte
    per docs/tfhers_wire.md."""
    lwes = np.array([[11, 22, 33], [44, 55, 66]], dtype=np.uint64)
    out = b""

    def s(string):
        raw = string.encode()
        return struct.pack("<Q", len(raw)) + raw

    out += s("0.1") + s("0.1") + s("high_level_api::FheUint")
    out += struct.pack("<I", 0)            # FheUintVersions::V0
    out += struct.pack("<I", 0)            # InnerCiphertext Cpu
    out += struct.pack("<I", 0)            # RadixCiphertextVersions::V0
    out += struct.pack("<Q", 2)            # 2 blocks
    for row in lwes:
        out += struct.pack("<I", 0)        # CiphertextVersions::V0
        out += struct.pack("<I", 0)        # LweCiphertextVersions::V0
        out += struct.pack("<Q", 3)        # data len
        out += row.astype("<u8").tobytes()
        out += struct.pack("<I", 0)        # CiphertextModulusVersions::V0
        out += struct.pack("<QQ", 0, 0)    # u128 native modulus
        out += struct.pack("<I", 0) + struct.pack("<Q", 3)   # degree
        out += struct.pack("<I", 0) + struct.pack("<Q", 1)   # noise lvl
        out += struct.pack("<I", 0) + struct.pack("<Q", 4)   # msg mod
        out += struct.pack("<I", 0) + struct.pack("<Q", 4)   # carry mod
        out += struct.pack("<I", 0)        # PBSOrder::KeyswitchBootstrap
    out += struct.pack("<I", 0)            # FheUintId
    return out, lwes


def test_deserialize_hand_authored_bytes():
    blob, lwes = _hand_authored_fheuint4()
    ct = bc.deserialize_fheuint(blob, expected_width=4)
    np.testing.assert_array_equal(ct.blocks, lwes)
    assert ct.message_modulus == 4
    assert ct.carry_modulus == 4
    assert ct.pbs_order == bc.PBS_ORDER_KS_PBS
    assert list(ct.degrees) == [3, 3]
    assert list(ct.noise_levels) == [1, 1]


def test_serialize_matches_hand_authored_bytes():
    blob, lwes = _hand_authored_fheuint4()
    ct = RadixCiphertext(
        blocks=lwes, message_modulus=4, carry_modulus=4,
        degrees=np.array([3, 3], dtype=np.uint64),
        noise_levels=np.array([1, 1], dtype=np.uint64), pbs_order=0)
    assert bc.serialize_fheuint(ct, 4) == blob


def test_roundtrip_random():
    rng = np.random.default_rng(5)
    blocks = rng.integers(0, 1 << 63, (4, 1025), dtype=np.uint64)
    ct = RadixCiphertext(
        blocks=blocks, message_modulus=4, carry_modulus=8,
        degrees=np.full(4, 3, dtype=np.uint64),
        noise_levels=np.ones(4, dtype=np.uint64), pbs_order=1)
    out = bc.deserialize_fheuint(bc.serialize_fheuint(ct, 8))
    np.testing.assert_array_equal(out.blocks, ct.blocks)
    assert out.message_modulus == 4 and out.carry_modulus == 8
    assert out.pbs_order == 1


def test_ctrx_transcoding_roundtrip():
    rng = np.random.default_rng(6)
    blocks = rng.integers(0, 1 << 62, (2, 9), dtype=np.uint64)
    ct = RadixCiphertext(
        blocks=blocks, message_modulus=4, carry_modulus=4,
        degrees=np.array([3, 2], dtype=np.uint64),
        noise_levels=np.ones(2, dtype=np.uint64))
    ctrx = serialize_radix(ct)
    tfhers_bytes = bc.ctrx_to_bincode(ctrx)
    back = bc.bincode_to_ctrx(tfhers_bytes)
    out = deserialize_radix(back)
    np.testing.assert_array_equal(out.blocks, ct.blocks)
    assert out.message_modulus == ct.message_modulus
    np.testing.assert_array_equal(out.degrees, ct.degrees)


def test_malformed_inputs_fail_closed():
    blob, _ = _hand_authored_fheuint4()
    with pytest.raises(ValueError):
        bc.deserialize_fheuint(blob[:40])          # truncated
    with pytest.raises(ValueError):
        bc.deserialize_fheuint(b"\x00" * 64)       # garbage header
    bad = bytearray(blob)
    bad[8:11] = b"9.9"                             # wrong header version is
    ct = bc.deserialize_fheuint(bytes(bad))        # tolerated (fwd compat)
    assert ct.n_blocks == 2
    with pytest.raises(ValueError):
        bc.deserialize_fheuint(blob, expected_width=8)   # width mismatch


def test_real_tfhers_captures_if_present():
    """Auto-discover real tfhe-rs safe_serialize captures (docs/
    tfhers_wire.md validation plan).  Skips when none are vendored."""
    fixture_dir = os.path.join(os.path.dirname(__file__), "data", "tfhers")
    captures = sorted(glob.glob(os.path.join(fixture_dir, "*.bin")))
    if not captures:
        pytest.skip("no real tfhe-rs captures vendored yet "
                    "(see docs/tfhers_wire.md)")
    for path in captures:
        with open(path, "rb") as f:
            ct = bc.deserialize_fheuint(f.read())
        assert ct.n_blocks >= 1
