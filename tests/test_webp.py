"""functions/webp.py — RIFF/WebP metadata walk: builder/parser
roundtrip across the three profiles, guard contract on junk."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.webp import (
    build_webp,
    parse_webp,
)


def test_vp8_lossy_roundtrip():
    r = parse_webp(build_webp(320, 240, "VP8"))
    assert r == {
        "format": "VP8", "width": 320, "height": 240,
        "has_alpha": False, "is_animated": False, "n_frames": 1,
        "duration_ms": 0, "has_exif": False, "has_icc": False,
    }
    # 14-bit dim boundary
    r = parse_webp(build_webp(16383, 1, "VP8"))
    assert (r["width"], r["height"]) == (16383, 1)


def test_vp8l_lossless_roundtrip():
    for alpha in (False, True):
        r = parse_webp(build_webp(100, 50, "VP8L", alpha=alpha))
        assert (r["format"], r["width"], r["height"]) == ("VP8L", 100, 50)
        assert r["has_alpha"] is alpha


def test_vp8x_extended_profile():
    # still
    r = parse_webp(build_webp(64, 48, "VP8X"))
    assert (r["format"], r["n_frames"], r["is_animated"]) == ("VP8X", 1, False)
    assert (r["width"], r["height"]) == (64, 48)
    # animated + alpha + exif: exact integer duration sum
    r = parse_webp(
        build_webp(64, 48, "VP8X", alpha=True, frames=[100, 250, 40],
                   exif=b"Exif\x00\x00x")
    )
    assert r["n_frames"] == 3 and r["duration_ms"] == 390
    assert r["is_animated"] and r["has_alpha"] and r["has_exif"]
    assert not r["has_icc"]
    # ICCP chunk (written FIRST in the chunk order, per spec) sets the
    # flag and leaves the canvas dims intact (r14 advisor finding:
    # has_icc was parsed but dropped by the webp_meta source schema)
    r = parse_webp(build_webp(64, 48, "VP8X", icc=b"icc-profile"))
    assert r["has_icc"] and not r["has_exif"]
    assert (r["width"], r["height"], r["n_frames"]) == (64, 48, 1)
    # ICC + animation together: the ICCP chunk must not be counted as
    # a frame or perturb the duration sum
    r = parse_webp(build_webp(32, 32, "VP8X", frames=[10, 20], icc=b"i"))
    assert r["has_icc"] and r["n_frames"] == 2 and r["duration_ms"] == 30


def test_odd_chunk_padding():
    # EXIF payload with odd length forces the even-byte pad on the walk
    b = build_webp(10, 10, "VP8X", exif=b"Exif\x00\x00odd")
    assert len(b"Exif\x00\x00odd") % 2 == 1
    assert parse_webp(b)["has_exif"]


def test_guards():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        parse_webp(b"junk")
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        parse_webp(b"RIFF\x10\x00\x00\x00WAVEdata\x00\x00\x00\x00")
    # non-keyframe first VP8 frame
    good = build_webp(16, 16, "VP8")
    i = good.find(b"VP8 ") + 8
    with pytest.raises(ValueError, match="keyframe"):
        parse_webp(good[:i] + bytes([good[i] | 1]) + good[i + 1 :])
    # bad start code
    with pytest.raises(ValueError, match="start code"):
        parse_webp(good.replace(b"\x9d\x01\x2a", b"\x9d\x01\x2b"))
    # chunk size bomb cannot over-read
    bomb = good[: i - 4] + struct.pack("<I", 1 << 30) + good[i:]
    with pytest.raises(ValueError, match="out of bounds"):
        parse_webp(bomb)
    # unknown VP8L version bits
    l = build_webp(10, 10, "VP8L")
    j = l.find(b"VP8L") + 8 + 4  # last byte of the packed header u32
    with pytest.raises(ValueError, match="version"):
        parse_webp(l[:j] + bytes([l[j] | 0xE0]) + l[j + 1 :])
    # animated flag without ANMF frames
    x = build_webp(10, 10, "VP8X")
    k = x.find(b"VP8X") + 8
    with pytest.raises(ValueError, match="ANMF"):
        parse_webp(x[:k] + bytes([x[k] | 0x02]) + x[k + 1 :])


@settings(max_examples=200, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=64),
    mutations=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 255)),
        min_size=0,
        max_size=8,
    ),
)
def test_adversarial_bytes_never_escape_error_contract(data, mutations):
    """Mutated real files and raw fuzz either parse to a dict or raise
    ValueError — never an allocation blowup or a foreign exception
    (the pdf/mp4 fuzz-contract discipline)."""
    base = bytearray(
        build_webp(40, 30, "VP8X", alpha=True, frames=[10, 20]) + data
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_webp(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass
