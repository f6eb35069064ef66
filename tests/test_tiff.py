"""Baseline-TIFF codec tests (functions/tiff.py): own-encoder roundtrips
across the full supported profile, LZW early-change width boundaries,
PackBits edge runs, and error paths. Cross-implementation interop against
the JDK's ImageIO TIFF plugin lives in tests/test_java_interop.py."""

import numpy as np
import pytest

from data_engineering_assignment_spark.functions.multimodal import decode_any
from data_engineering_assignment_spark.functions.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _frame(rng, h, w):
    return rng.integers(0, 256, (h, w, 4), np.uint8)


def test_tiff_rgb_roundtrip_profiles():
    """RGB/RGBA/gray/inverted-gray x compression x predictor x byte order
    x multi-strip all reconstruct the exact pixels through decode_any."""
    rng = np.random.default_rng(7)
    for comp in (1, 5, 32773):
        for pred in (1, 2) if comp != 1 else (1,):
            for be in (False, True):
                f = _frame(rng, 7, 11)
                data = encode_tiff(
                    f, 2, comp, pred, big_endian=be, rows_per_strip=3, alpha=True
                )
                d, meta = decode_any(data)
                assert np.array_equal(d[0], f), (comp, pred, be)
                assert meta == {
                    "width": 11, "height": 7, "channels": 4, "n_frames": 1,
                }
    # RGB without alpha -> opaque
    f = _frame(rng, 5, 4)
    d, _ = decode_tiff(encode_tiff(f, 2, 5, 2))
    assert np.array_equal(d[0, :, :, :3], f[:, :, :3])
    assert (d[0, :, :, 3] == 255).all()
    # gray (photometric 1) and inverted gray (photometric 0) replicate the
    # B channel into BGR
    for photo in (0, 1):
        d, _ = decode_tiff(encode_tiff(f, photo, 32773))
        g = f[:, :, 0]
        assert np.array_equal(d[0, :, :, 0], g), photo
        assert np.array_equal(d[0, :, :, 1], g), photo


def test_tiff_palette_roundtrip():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), np.uint8)  # RGB palette
    idx = rng.integers(0, 16, (6, 9)).astype(np.uint8)
    for comp in (1, 5, 32773):
        d, _ = decode_tiff(
            encode_tiff(None, 3, comp, palette=pal, indices=idx, rows_per_strip=2)
        )
        assert np.array_equal(d[0, :, :, 2], pal[idx][:, :, 0]), comp  # R
        assert np.array_equal(d[0, :, :, 0], pal[idx][:, :, 2]), comp  # B
        assert (d[0, :, :, 3] == 255).all()


def test_tiff_lzw_width_boundaries():
    """Cross the 9->10->11->12-bit early-change boundaries and the table
    clear: pseudorandom bytes create one new code per ~input byte, so 6000
    bytes cross 511, 1023, 2047 and the 4094 clear point."""
    rng = np.random.default_rng(3)
    for n in (1, 2, 253, 254, 300, 6000):
        raw = rng.integers(0, 256, n, np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(raw), n) == raw, n
    # highly repetitive data exercises long table entries
    raw = (b"abcab" * 400) + bytes(400)
    assert _lzw_decode(_lzw_encode(raw), len(raw)) == raw


def test_packbits_edges():
    for raw in (
        b"", b"\x00", b"a" * 1, b"a" * 2, b"a" * 128, b"a" * 129, b"a" * 300,
        b"abc" + b"d" * 5 + b"efg", bytes(range(200)) * 2,
    ):
        enc = _packbits_encode(raw)
        assert _packbits_decode(enc, len(raw)) == raw, raw[:16]
    # spec noop byte 0x80 is skipped
    assert _packbits_decode(b"\x80\x01ab", 2) == b"ab"


def test_tiff_error_paths():
    rng = np.random.default_rng(5)
    f = _frame(rng, 4, 4)
    good = encode_tiff(f, 2, 5, 2)
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II\x2b\x00" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_tiff(good[:-20] + b"")
    # unsupported bits per sample: patch BitsPerSample inline value
    import struct

    data = bytearray(encode_tiff(f, 1, 1))  # gray, uncompressed, spp 1
    (n,) = struct.unpack_from("<H", data, 8)
    for i in range(n):
        base = 10 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", data, base)
        if tag == 258:
            struct.pack_into("<H", data, base + 8, 16)
    with pytest.raises(NotImplementedError, match="8 bits"):
        decode_tiff(bytes(data))


def test_tiff_missing_strip_offsets_is_value_error():
    """StripOffsets absent (here: carried with an entry type the IFD walk
    skips) must fail with the codec's ValueError contract, not KeyError."""
    import struct

    rng = np.random.default_rng(7)
    f = _frame(rng, 4, 4)
    data = bytearray(encode_tiff(f, 1, 1))  # gray, uncompressed
    (n,) = struct.unpack_from("<H", data, 8)
    for i in range(n):
        base = 10 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", data, base)
        if tag == 273:  # StripOffsets -> unsupported RATIONAL type
            struct.pack_into("<H", data, base + 2, 5)
    with pytest.raises(ValueError, match="StripOffsets"):
        decode_tiff(bytes(data))


def test_tiff_tiled_roundtrip_all_compressions():
    """Tiled organization (TIFF 6.0 §15): edge tiles are zero-padded and
    cropped, predictor 2 restarts at every tile's left edge, and the
    decode is pixel-identical to the stripped encoding of the same frame
    across none/LZW/PackBits and both byte orders."""
    rng = np.random.default_rng(21)
    for (w, h) in [(16, 16), (40, 24), (33, 17)]:
        f = _frame(rng, h, w)
        for comp in (1, 5, 32773):
            for pred in (1, 2):
                for be in (False, True):
                    tiled = encode_tiff(
                        f, 2, comp, pred, big_endian=be, tile_size=(16, 16)
                    )
                    striped = encode_tiff(f, 2, comp, pred, big_endian=be)
                    dt, meta = decode_tiff(tiled)
                    ds, _ = decode_tiff(striped)
                    assert np.array_equal(dt, ds), (w, h, comp, pred, be)
                    assert meta["width"] == w and meta["height"] == h
    # decode_any dispatches tiled TIFFs identically
    t = encode_tiff(_frame(rng, 20, 20), 2, 5, 2, tile_size=(16, 16))
    da, _ = decode_any(t)
    dd, _ = decode_tiff(t)
    assert np.array_equal(da, dd)


def test_tiff_tiled_error_paths():
    import struct

    rng = np.random.default_rng(22)
    f = _frame(rng, 20, 20)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(f, 2, 1, tile_size=(8, 8))
    good = bytearray(encode_tiff(f, 2, 5, tile_size=(16, 16)))
    # patch TileOffsets' entry type to an unsupported one -> missing
    (n,) = struct.unpack_from("<H", good, 8)
    for i in range(n):
        base = 10 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", good, base)
        if tag == 324:
            struct.pack_into("<H", good, base + 2, 5)
    with pytest.raises(ValueError, match="TileOffsets"):
        decode_tiff(bytes(good))
