"""G.711 A-law + IMA/DVI ADPCM decode tests (functions/multimodal.py):
golden anchors from the reference g711 tables, a hand-runnable scalar IMA
reference vs the vectorized production decoder, roundtrip error bounds,
block/channel layout, and the `fact`-chunk frame trim. javax.sound interop
for the companded formats lives in tests/test_java_interop.py."""

import struct

import numpy as np

from data_engineering_assignment_spark.functions.multimodal import (
    _IMA_INDEX,
    _IMA_STEP,
    _decode_ima_adpcm,
    decode_wav,
    encode_wav_ima_adpcm,
)


def make_wav(tag: int, n_ch: int, data: bytes, bits: int = 8) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, n_ch, 8000, 8000 * n_ch, n_ch, bits)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_alaw_golden_anchors():
    """The four canonical alaw2linear anchors: 0x55 -> -8, 0xD5 -> +8
    (quietest codes), 0x2A -> -32256, 0xAA -> +32256 (full scale)."""
    s, meta = decode_wav(make_wav(6, 1, bytes([0x55, 0xD5, 0x2A, 0xAA])))
    got = np.round(s[:, 0] * 32768.0).astype(int)
    assert got.tolist() == [-8, 8, -32256, 32256]
    assert meta["bit_depth"] == 8 and meta["n_samples"] == 4


def test_alaw_monotone_per_segment():
    """Within each positive segment, linear values increase with mantissa."""
    vals = []
    for seg in range(8):
        for mant in range(16):
            byte = (0x80 | (seg << 4) | mant) ^ 0x55
            s, _ = decode_wav(make_wav(6, 1, bytes([byte])))
            vals.append(int(round(s[0, 0] * 32768.0)))
    assert vals == sorted(vals)
    assert vals[0] == 8 and vals[-1] == 32256


def _scalar_ima(data: bytes, n_ch: int, ba: int) -> list[int]:
    """Straight-from-the-spec scalar IMA decoder (the independent
    reference the vectorized production decoder is held to)."""
    step_t, idx_t = _IMA_STEP.tolist(), _IMA_INDEX.tolist()
    out = []
    for off in range(0, len(data) - ba + 1, ba):
        blk = data[off : off + ba]
        chans, idxs = [], []
        for ch in range(n_ch):
            p = int.from_bytes(blk[4 * ch : 4 * ch + 2], "little", signed=True)
            chans.append([p])
            idxs.append(min(max(blk[4 * ch + 2], 0), 88))
        body = blk[4 * n_ch :]
        for w in range(len(body) // (4 * n_ch)):
            for ch in range(n_ch):
                four = body[(w * n_ch + ch) * 4 : (w * n_ch + ch) * 4 + 4]
                for byte in four:
                    for nib in (byte & 0xF, byte >> 4):
                        step = step_t[idxs[ch]]
                        diff = step >> 3
                        if nib & 4:
                            diff += step
                        if nib & 2:
                            diff += step >> 1
                        if nib & 1:
                            diff += step >> 2
                        p = chans[ch][-1] + (-diff if nib & 8 else diff)
                        chans[ch].append(max(-32768, min(32767, p)))
                        idxs[ch] = max(0, min(88, idxs[ch] + idx_t[nib]))
        for t in range(len(chans[0])):
            for ch in range(n_ch):
                out.append(chans[ch][t])
    return out


def test_ima_vectorized_matches_scalar_reference():
    rng = np.random.default_rng(42)
    for n_ch, ba in ((1, 36), (2, 72), (1, 256)):
        data = rng.integers(0, 256, 3 * ba, np.uint8).tobytes()
        got = _decode_ima_adpcm(data, n_ch, ba)
        assert got.tolist() == _scalar_ima(data, n_ch, ba), (n_ch, ba)


def test_ima_roundtrip_error_bound_and_block_headers():
    """Smooth per-block-slope signal: block headers decode VERBATIM, the
    4-bit quantization error stays tiny, and `fact` trims the padded tail."""
    spb = 1 + (64 - 4) * 2  # mono, block_align 64 -> 121 samples/block
    slopes = [3, 7, 5]
    s = np.empty(2 * spb + 17, np.int64)
    s[0] = -6000
    for t in range(1, len(s)):
        s[t] = s[t - 1] + slopes[min(t // spb, 2)]
    wav = encode_wav_ima_adpcm(s.astype(np.int16), block_align=64)
    dec, meta = decode_wav(wav)
    got = np.round(dec[:, 0] * 32768.0).astype(np.int64)
    assert meta["n_samples"] == len(s) == len(got)  # fact trim
    assert got[0] == s[0] and got[spb] == s[spb]  # headers verbatim
    assert int(np.abs(got - s).max()) <= 16
    # stereo with distinct per-channel content
    st = np.stack([s[:242], s[:242] * -1 + 100], axis=1).astype(np.int16)
    wav = encode_wav_ima_adpcm(st, block_align=64)
    dec, meta = decode_wav(wav)
    got = np.round(dec * 32768.0).astype(np.int64)
    assert meta["n_channels"] == 2 and meta["n_samples"] == 242
    assert int(np.abs(got - st).max()) <= 16


def test_ima_step_golden():
    """Hand-computed first steps from (pred=0, index=0, step=7):
    nibble 2 -> diff 7>>1 = +3, index 0-1 clamps to 0; still step=7,
    nibble 15 -> -(0 + 7 + 3 + 1) = -11, index 0+8 = 8."""
    from data_engineering_assignment_spark.functions.multimodal import (
        _ima_step_nibble,
    )

    p, i = _ima_step_nibble(np.int32(0), np.int32(0), np.int32(2))
    assert (int(p), int(i)) == (3, 0)
    p, i = _ima_step_nibble(p, i, np.int32(15))
    assert (int(p), int(i)) == (3 - 11, 8)


def test_wav_error_paths():
    import pytest

    # format tag 2 (MS-ADPCM) decodes natively since round 10; MP3-in-WAV
    # (tag 85) remains the guarded unsupported profile
    with pytest.raises(NotImplementedError, match="format tag 85"):
        decode_wav(make_wav(85, 1, b"\x00" * 8, bits=4))
    with pytest.raises(ValueError, match="block_align too small"):
        _decode_ima_adpcm(b"\x00" * 8, 2, 8)
    with pytest.raises(ValueError, match="block_align too small"):
        decode_wav(make_wav(2, 1, b"\x00" * 8, bits=4))


def test_ms_adpcm_matches_scalar_spec_reference():
    """The vectorized MS-ADPCM decoder reproduces a literal scalar
    transcription of the spec recurrence (predict >> 8, signed nibble *
    delta, 16-entry adaptation, floor-16 delta) on random blocks."""
    import struct

    import numpy as np

    from data_engineering_assignment_spark.functions.multimodal import (
        _MS_ADAPT,
        _MS_COEF1,
        _MS_COEF2,
        _decode_ms_adpcm,
    )

    rng = np.random.default_rng(11)
    for n_ch in (1, 2):
        for _ in range(3):
            nfrm = 20
            pred = [int(rng.integers(0, 7)) for _ in range(n_ch)]
            delta = [int(rng.integers(16, 900)) for _ in range(n_ch)]
            s1 = [int(rng.integers(-2000, 2000)) for _ in range(n_ch)]
            s2 = [int(rng.integers(-2000, 2000)) for _ in range(n_ch)]
            nibs = rng.integers(0, 16, (nfrm - 2) * n_ch).tolist()
            blk = bytearray(bytes(pred))
            for d in delta:
                blk += struct.pack("<h", d)
            for v in s1:
                blk += struct.pack("<h", v)
            for v in s2:
                blk += struct.pack("<h", v)
            padded = nibs + ([0] if len(nibs) % 2 else [])
            for i in range(0, len(padded), 2):
                blk += bytes([(padded[i] << 4) | padded[i + 1]])
            got = _decode_ms_adpcm(bytes(blk), n_ch, len(blk))
            # scalar reference
            want = []
            st = {
                ch: {
                    "d": delta[ch],
                    "s1": s1[ch],
                    "s2": s2[ch],
                    "c1": int(_MS_COEF1[pred[ch]]),
                    "c2": int(_MS_COEF2[pred[ch]]),
                }
                for ch in range(n_ch)
            }
            want += s2 + s1
            for t, n in enumerate(nibs):
                ch = t % n_ch
                c = st[ch]
                signed = n - 16 if n >= 8 else n
                predict = (c["s1"] * c["c1"] + c["s2"] * c["c2"]) >> 8
                new = max(-32768, min(32767, predict + signed * c["d"]))
                c["s2"], c["s1"] = c["s1"], new
                c["d"] = max((int(_MS_ADAPT[n]) * c["d"]) >> 8, 16)
                want.append(new)
            assert got.tolist() == want, (n_ch, pred)


def test_ms_adpcm_roundtrip_and_header_exactness():
    import numpy as np

    from data_engineering_assignment_spark.functions.multimodal import (
        decode_wav,
        encode_wav_ms_adpcm,
    )

    t = np.arange(300)
    sig = (4000 * np.sin(2 * np.pi * t / 40)).astype(np.int64)
    x = np.stack([sig, -sig // 3], axis=1)
    s, meta = decode_wav(encode_wav_ms_adpcm(x, block_frames=32))
    assert meta["n_samples"] == 300 and meta["n_channels"] == 2
    got = np.round(s * 32768.0).astype(np.int64)
    for b in range(0, 300, 32):  # header frames are verbatim
        assert (got[b] == x[b]).all() and (got[b + 1] == x[b + 1]).all()
    assert np.abs(got - x).max() < 600


def _walk_riff(blob: bytes) -> dict:
    """Chunk id -> (offset_of_body, size) for a RIFF/WAVE blob."""
    out, pos = {}, 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        out[cid] = (pos + 8, size)
        pos += 8 + size + (size & 1)
    return out


def test_ms_adpcm_spare_block_capacity_uses_samples_per_block():
    """A conformant foreign file whose blocks carry spare nibble capacity
    (capacity > wSamplesPerBlock) must decode to EXACTLY wSamplesPerBlock
    frames per interior block — decoding the spare nibbles would insert
    phantom frames and desynchronize every later sample position."""
    from data_engineering_assignment_spark.functions.multimodal import (
        decode_wav,
        encode_wav_ms_adpcm,
    )

    rng = np.random.default_rng(7)
    x = rng.integers(-3000, 3000, (16, 1)).astype(np.int64)
    orig = encode_wav_ms_adpcm(x, block_frames=4)  # block_align = 8, 4 blocks
    want, meta = decode_wav(orig)
    assert meta["n_samples"] == 16

    ch = _walk_riff(orig)
    off, size = ch[b"data"]
    data = orig[off : off + size]
    assert len(data) % 8 == 0
    # foreign re-framing: one junk byte (2 spare nibbles) per block,
    # block_align 8 -> 9, wSamplesPerBlock stays 4
    blocks = [data[i : i + 8] + b"\xff" for i in range(0, len(data), 8)]
    data2 = b"".join(blocks)
    foff, fsize = ch[b"fmt "]
    fmt2 = bytearray(orig[foff : foff + fsize])
    struct.pack_into("<H", fmt2, 12, 9)  # nBlockAlign at offset 12
    fact_off, fact_size = ch[b"fact"]
    fact = orig[fact_off : fact_off + fact_size]
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt2) + 8 + len(fact) + 8 + len(data2))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt2)) + bytes(fmt2)
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data2)) + data2
    )
    got, meta2 = decode_wav(blob)
    assert meta2["n_samples"] == 16
    assert np.array_equal(got, want)


def test_ima_adpcm_spare_block_capacity_uses_samples_per_block():
    """Same spare-capacity contract for IMA ADPCM: a spare 4-byte channel
    word per block must not inject 8 phantom frames per interior block."""
    from data_engineering_assignment_spark.functions.multimodal import (
        decode_wav,
        encode_wav_ima_adpcm,
    )

    rng = np.random.default_rng(8)
    x = rng.integers(-3000, 3000, (18, 1)).astype(np.int64)
    orig = encode_wav_ima_adpcm(x, block_align=8)  # spb = 9, 2 blocks
    want, meta = decode_wav(orig)
    assert meta["n_samples"] == 18

    ch = _walk_riff(orig)
    off, size = ch[b"data"]
    data = orig[off : off + size]
    assert len(data) % 8 == 0
    blocks = [data[i : i + 8] + b"\x77" * 4 for i in range(0, len(data), 8)]
    data2 = b"".join(blocks)
    foff, fsize = ch[b"fmt "]
    fmt2 = bytearray(orig[foff : foff + fsize])
    struct.pack_into("<H", fmt2, 12, 12)  # nBlockAlign 8 -> 12
    fact_off, fact_size = ch[b"fact"]
    fact = orig[fact_off : fact_off + fact_size]
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt2) + 8 + len(fact) + 8 + len(data2))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt2)) + bytes(fmt2)
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data2)) + data2
    )
    got, meta2 = decode_wav(blob)
    assert meta2["n_samples"] == 18
    assert np.array_equal(got, want)
