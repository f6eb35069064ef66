"""Dependency-free AES (FIPS 197) + CBC/ECB modes, for the PDF standard
security handler's AESV2/AESV3 profiles (functions/pdf.py) — the
container has no guaranteed cipher package, and the codec-gate
discipline requires the supported subset to work everywhere.

The pure-Python cipher is complete and exact for 128/192/256-bit keys
(tables derived at import from the GF(2^8) definitions, not transcribed
— FIPS 197 known-answer vectors pin them in tests/test_aes.py). It is
also slow (~1 MB/s): :func:`_accelerator` probes for the optional
``cryptography`` package (the br/zstd ``_optional_decoder`` hook
discipline, memoized) and routes the CBC bulk paths through it when
present — AES is deterministic, so both paths are bit-identical and the
tests cross-validate them. Absence changes throughput, never results.
"""

from __future__ import annotations

# --- GF(2^8) tables, derived (poly x^8+x^4+x^3+x+1, generator 3) -----------


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


_EXP = [0] * 255
_a = 1
for _i in range(255):
    _EXP[_i] = _a
    _a ^= _xtime(_a)  # multiply by 3 (a generator)
_LOG = {v: i for i, v in enumerate(_EXP)}


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[(_LOG[a] + _LOG[b]) % 255]


def _rotl8(b: int, n: int) -> int:
    return ((b << n) | (b >> (8 - n))) & 0xFF


_SBOX = [0] * 256
for _x in range(256):
    _inv = 0 if _x == 0 else _EXP[(255 - _LOG[_x]) % 255]
    _SBOX[_x] = (
        _inv
        ^ _rotl8(_inv, 1)
        ^ _rotl8(_inv, 2)
        ^ _rotl8(_inv, 3)
        ^ _rotl8(_inv, 4)
        ^ 0x63
    )
_INV_SBOX = [0] * 256
for _x, _y in enumerate(_SBOX):
    _INV_SBOX[_y] = _x

# --- key schedule + block cipher -------------------------------------------


def _expand_key(key: bytes) -> tuple[list[list[int]], int]:
    """FIPS 197 §5.2 key expansion; returns (words, rounds)."""
    nk = len(key) // 4
    if len(key) not in (16, 24, 32):
        raise ValueError(f"bad AES key length {len(key)}")
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[b] for b in t[1:] + t[:1]]
            t[0] ^= rcon
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return w, nr


def _encrypt_block(w: list[list[int]], nr: int, block: bytes) -> bytes:
    # state: s[4*c + r], column-major (FIPS 197 §3.4)
    s = [block[i] ^ w[i // 4][i % 4] for i in range(16)]
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        s = [s[4 * ((c + r) % 4) + r] for c in range(4) for r in range(4)]
        if rnd < nr:
            t = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                t += [
                    _xtime(a0) ^ _xtime(a1) ^ a1 ^ a2 ^ a3,
                    a0 ^ _xtime(a1) ^ _xtime(a2) ^ a2 ^ a3,
                    a0 ^ a1 ^ _xtime(a2) ^ _xtime(a3) ^ a3,
                    _xtime(a0) ^ a0 ^ a1 ^ a2 ^ _xtime(a3),
                ]
            s = t
        s = [s[4 * c + r] ^ w[4 * rnd + c][r] for c in range(4) for r in range(4)]
    return bytes(s)


def _decrypt_block(w: list[list[int]], nr: int, block: bytes) -> bytes:
    s = [block[4 * c + r] ^ w[4 * nr + c][r] for c in range(4) for r in range(4)]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows (row r shifts RIGHT by r), then InvSubBytes
        s = [s[4 * ((c - r) % 4) + r] for c in range(4) for r in range(4)]
        s = [_INV_SBOX[b] for b in s]
        s = [s[4 * c + r] ^ w[4 * rnd + c][r] for c in range(4) for r in range(4)]
        if rnd > 0:
            t = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                t += [
                    _gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13) ^ _gmul(a3, 9),
                    _gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11) ^ _gmul(a3, 13),
                    _gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14) ^ _gmul(a3, 11),
                    _gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9) ^ _gmul(a3, 14),
                ]
            s = t
    return bytes(s)


# --- optional native accelerator (hook discipline) --------------------------

_ACCEL: tuple | None = None
_ACCEL_PROBED = False


def _accelerator():
    """Memoized probe for the optional ``cryptography`` package; returns
    (Cipher, algorithms, modes) or None. Probed once — the CBC helpers
    run per encrypted PDF object inside mapInPandas."""
    global _ACCEL, _ACCEL_PROBED
    if not _ACCEL_PROBED:
        _ACCEL_PROBED = True
        try:
            from cryptography.hazmat.primitives.ciphers import (
                Cipher,
                algorithms,
                modes,
            )

            _ACCEL = (Cipher, algorithms, modes)
        except ImportError:
            _ACCEL = None
    return _ACCEL


# --- modes (no padding: PDF's PKCS#7 handling lives with the caller) -------


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt; ``data`` must already be block-aligned."""
    if len(data) % 16:
        raise ValueError("CBC input not block-aligned")
    accel = _accelerator()
    if accel is not None:
        cipher, algorithms, modes = accel
        e = cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
        return e.update(data) + e.finalize()
    w, nr = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block(
            w, nr, bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        )
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC decrypt; ``data`` must be block-aligned (no pad strip)."""
    if len(data) % 16:
        raise ValueError("CBC input not block-aligned")
    accel = _accelerator()
    if accel is not None:
        cipher, algorithms, modes = accel
        d = cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
        return d.update(data) + d.finalize()
    w, nr = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(w, nr, blk), prev))
        prev = blk
    return bytes(out)


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One-block ECB encrypt (the /Perms entry of AESV3)."""
    if len(block) != 16:
        raise ValueError("ECB block must be 16 bytes")
    w, nr = _expand_key(key)
    return _encrypt_block(w, nr, block)


def aes_ecb_decrypt_block(key: bytes, block: bytes) -> bytes:
    """One-block ECB decrypt (verifying /Perms)."""
    if len(block) != 16:
        raise ValueError("ECB block must be 16 bytes")
    w, nr = _expand_key(key)
    return _decrypt_block(w, nr, block)
