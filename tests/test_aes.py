"""functions/aes.py — FIPS 197 known-answer vectors, mode roundtrips,
and pure-Python vs optional-accelerator equivalence (the cipher is
deterministic, so the two paths must be bit-identical)."""

from __future__ import annotations

import pytest

from data_engineering_assignment_spark.functions import aes
from data_engineering_assignment_spark.functions.aes import (
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_ecb_decrypt_block,
    aes_ecb_encrypt_block,
)

# FIPS 197 Appendix C example vectors (public known answers)
_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_VECTORS = [
    (16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
    (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
    (32, "8ea2b7ca516745bfeafc49904b496089"),
]


@pytest.fixture
def pure_path(monkeypatch):
    """Force the dependency-free cipher (as if cryptography were absent)."""
    monkeypatch.setattr(aes, "_ACCEL", None)
    monkeypatch.setattr(aes, "_ACCEL_PROBED", True)


def test_fips_197_known_answers():
    for klen, want in _VECTORS:
        key = bytes(range(klen))
        w, nr = aes._expand_key(key)
        ct = aes._encrypt_block(w, nr, _PT)
        assert ct.hex() == want
        assert aes._decrypt_block(w, nr, ct) == _PT
        assert aes_ecb_encrypt_block(key, _PT).hex() == want
        assert aes_ecb_decrypt_block(key, ct) == _PT


def test_cbc_roundtrip_pure(pure_path):
    import hashlib

    for klen in (16, 24, 32):
        key = hashlib.sha256(b"key%d" % klen).digest()[:klen]
        iv = hashlib.md5(b"iv").digest()
        for n in (16, 48, 256):
            data = hashlib.sha512(b"data%d" % n).digest() * (n // 16)
            data = data[:n]
            ct = aes_cbc_encrypt(key, iv, data)
            assert len(ct) == len(data) and ct != data
            assert aes_cbc_decrypt(key, iv, ct) == data


def test_cbc_requires_block_alignment(pure_path):
    with pytest.raises(ValueError, match="block-aligned"):
        aes_cbc_encrypt(bytes(16), bytes(16), b"short")
    with pytest.raises(ValueError, match="block-aligned"):
        aes_cbc_decrypt(bytes(16), bytes(16), bytes(17))
    with pytest.raises(ValueError, match="key length"):
        aes_cbc_encrypt(bytes(15), bytes(16), bytes(16))


def test_pure_matches_accelerator_when_present():
    """When the optional cryptography package exists, the hook path and
    the pure path must produce identical bytes (cross-validation — the
    strongest available oracle for the hand-rolled cipher)."""
    pytest.importorskip("cryptography")
    assert aes._accelerator() is not None
    import hashlib

    for klen in (16, 32):
        key = hashlib.sha256(b"x%d" % klen).digest()[:klen]
        iv = hashlib.md5(b"y").digest()
        data = hashlib.sha512(b"z").digest() * 8  # 512 bytes
        native_ct = aes_cbc_encrypt(key, iv, data)
        # force pure
        saved = (aes._ACCEL, aes._ACCEL_PROBED)
        aes._ACCEL, aes._ACCEL_PROBED = None, True
        try:
            pure_ct = aes_cbc_encrypt(key, iv, data)
            assert pure_ct == native_ct
            assert aes_cbc_decrypt(key, iv, native_ct) == data
        finally:
            aes._ACCEL, aes._ACCEL_PROBED = saved


def test_sbox_fixed_points():
    """Spot values of the derived S-box against the published table."""
    assert aes._SBOX[0x00] == 0x63
    assert aes._SBOX[0x01] == 0x7C
    assert aes._SBOX[0x53] == 0xED
    assert aes._SBOX[0xFF] == 0x16
    assert all(aes._INV_SBOX[aes._SBOX[i]] == i for i in range(256))
