"""functions/mp4.py — ISO-BMFF metadata walk: builder/parser roundtrip
across the layout axes, guard contract on adversarial bytes."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.mp4 import (
    _box,
    build_mp4,
    parse_mp4,
)


def test_roundtrip_all_axes():
    for v1 in (False, True):
        for lg in (False, True):
            for audio in (None, ("mp4a", 8000)):
                b = build_mp4(
                    3,
                    video=("avc1", 320, 240, 24),
                    audio=audio,
                    version1=v1,
                    large_mdat=lg,
                )
                r = parse_mp4(b)
                assert r["major_brand"] == "isom"
                assert r["movie_timescale"] == 1000
                assert r["movie_duration_ms"] == 3000
                assert r["n_tracks"] == (2 if audio else 1)
                vt = r["tracks"][0]
                assert vt["kind"] == "video" and vt["codec"] == "avc1"
                assert (vt["width"], vt["height"]) == (320, 240)
                assert vt["n_samples"] == 72 and vt["duration_ms"] == 3000
                if audio:
                    at = r["tracks"][1]
                    assert at["kind"] == "audio" and at["codec"] == "mp4a"
                    assert at["n_samples"] == 24000
                    assert at["duration_ms"] == 3000


def test_duration_floor_division():
    # 1000-tick movie scale with v1 64-bit durations: exact floor
    b = build_mp4(7, video=("hev1", 16, 16, 30), version1=True)
    r = parse_mp4(b)
    assert r["movie_duration_ms"] == 7000
    assert r["tracks"][0]["n_samples"] == 210


def test_size_zero_box_extends_to_eof():
    b = build_mp4(1)
    # rewrite the trailing mdat header size to 0 (to-end-of-file form)
    i = b.rfind(b"mdat") - 4
    b2 = b[:i] + struct.pack(">I", 0) + b[i + 4 :]
    assert parse_mp4(b2) == parse_mp4(b)


def test_trackless_moov_and_missing_stbl_members():
    b = build_mp4(2, video=None)
    r = parse_mp4(b)
    assert r["n_tracks"] == 0 and r["movie_duration_ms"] == 2000
    # drop the stts box: n_samples degrades to None, container still ok
    full = build_mp4(2)
    i = full.find(b"stts") - 4
    size = struct.unpack(">I", full[i : i + 4])[0]
    gutted = full[:i] + _box(b"free", b"\x00" * (size - 8)) + full[i + size :]
    r = parse_mp4(gutted)
    assert r["tracks"][0]["n_samples"] is None
    assert r["tracks"][0]["codec"] == "avc1"


def test_guards():
    with pytest.raises(ValueError):
        parse_mp4(b"")
    with pytest.raises(ValueError):
        parse_mp4(b"junk bytes, definitely not an mp4")
    # ftyp without moov
    with pytest.raises(ValueError, match="ftyp/moov"):
        parse_mp4(_box(b"ftyp", b"isom\x00\x00\x00\x00") + _box(b"free", b""))
    # box over-reads its parent
    bomb = struct.pack(">I", 1 << 30) + b"moov"
    with pytest.raises(ValueError, match="out of bounds"):
        parse_mp4(_box(b"ftyp", b"isom\x00\x00\x00\x00") + bomb)
    # stts entry-count bomb cannot allocate
    good = build_mp4(1)
    i = good.find(b"stts")
    bad = good[: i + 8] + struct.pack(">I", 1 << 30) + good[i + 12 :]
    with pytest.raises(ValueError):
        parse_mp4(bad)
    # nesting bomb: 32 boxes deep trips the depth bound, not recursion
    inner = _box(b"mvhd", b"")
    for _ in range(32):
        inner = _box(b"trak", inner)
    with pytest.raises(ValueError):
        parse_mp4(
            _box(b"ftyp", b"isom\x00\x00\x00\x00") + _box(b"moov", inner)
        )


@settings(max_examples=200, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=64),
    mutations=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 255)),
        min_size=0,
        max_size=8,
    ),
)
def test_adversarial_bytes_never_escape_error_contract(data, mutations):
    """Mutated real files and raw fuzz either parse to a dict or raise
    ValueError — never an unbounded allocation, recursion error, or a
    foreign exception type (the pdf fuzz-contract discipline)."""
    base = bytearray(build_mp4(2, audio=("mp4a", 8000)) + data)
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_mp4(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass


def test_bmff_image_roundtrip_and_alpha_trap():
    """AVIF/HEIC item structure: dims must come from the ispe that
    ipma associates with the pitm primary item — the builder plants the
    alpha auxiliary's HALF-SIZE ispe first in ipco, so first-ispe
    readers report wrong dims."""
    from data_engineering_assignment_spark.functions.mp4 import (
        build_bmff_image,
        parse_bmff_image,
    )

    for v1 in (False, True):
        for alpha in (False, True):
            for exif in (False, True):
                b = build_bmff_image(
                    640, 480, "avif", "av01",
                    with_exif=exif, with_alpha=alpha, version1=v1,
                )
                r = parse_bmff_image(b)
                assert (r["width"], r["height"]) == (640, 480), (v1, alpha)
                assert r["codec"] == "av01" and r["primary_item"] == 1
                assert r["n_items"] == 1 + alpha + exif
                assert r["has_exif"] is exif
    r = parse_bmff_image(build_bmff_image(100, 80, "heic", "hvc1"))
    assert (r["major_brand"], r["codec"]) == ("heic", "hvc1")


def test_bmff_image_guards():
    from data_engineering_assignment_spark.functions.mp4 import (
        build_bmff_image,
        build_mp4,
        parse_bmff_image,
    )

    with pytest.raises(ValueError):
        parse_bmff_image(b"junk not bmff at all")
    # a video mp4 is not an image container (no meta box)
    with pytest.raises(ValueError, match="ftyp/meta"):
        parse_bmff_image(build_mp4(1))
    # non-image brand with no image compat brand
    b = build_bmff_image(10, 10)
    with pytest.raises(ValueError, match="image brand"):
        parse_bmff_image(
            b.replace(b"avif", b"qt  ").replace(b"mif1miaf", b"qt  qt  ")
        )
    # dangling pitm (points at a missing item id)
    i = b.find(b"pitm") + 8
    broken = b[:i] + b"\x00\x63" + b[i + 2 :]
    with pytest.raises(ValueError, match="pitm"):
        parse_bmff_image(broken)
    # ipma entry-count bomb cannot loop
    j = b.find(b"ipma") + 8
    bomb = b[:j] + struct.pack(">I", 1 << 30) + b[j + 4 :]
    with pytest.raises(ValueError):
        parse_bmff_image(bomb)


@settings(max_examples=200, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=48),
    mutations=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 255)),
        min_size=0,
        max_size=8,
    ),
)
def test_bmff_image_adversarial_error_contract(data, mutations):
    from data_engineering_assignment_spark.functions.mp4 import (
        build_bmff_image,
        parse_bmff_image,
    )

    base = bytearray(
        build_bmff_image(64, 48, with_alpha=True, with_exif=True) + data
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_bmff_image(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass


def test_fragmented_profile():
    """fMP4/CMAF: top-level moof count and per-track trun sample sums;
    a progressive file reports zero fragments, and a traf without tfhd
    is structural."""
    from data_engineering_assignment_spark.functions.mp4 import (
        _box,
        _fullbox,
        build_mp4,
        parse_mp4,
    )

    b = build_mp4(2, fragments=[10, 20, 5])
    r = parse_mp4(b)
    assert r["n_fragments"] == 3
    assert r["tracks"][0]["fragment_samples"] == 35
    prog = parse_mp4(build_mp4(2))
    assert prog["n_fragments"] == 0
    assert prog["tracks"][0]["fragment_samples"] == 0
    # fragments for an unknown track id don't credit track 1
    alien = build_mp4(1) + _box(
        b"moof",
        _fullbox(b"mfhd", 0, struct.pack(">I", 1))
        + _box(
            b"traf",
            _fullbox(b"tfhd", 0, struct.pack(">I", 9))
            + _fullbox(b"trun", 0, struct.pack(">I", 7)),
        ),
    )
    r = parse_mp4(alien)
    assert r["n_fragments"] == 1
    assert r["tracks"][0]["fragment_samples"] == 0
    # traf without tfhd is a structural error
    broken = build_mp4(1) + _box(
        b"moof", _box(b"traf", _fullbox(b"trun", 0, struct.pack(">I", 7)))
    )
    with pytest.raises(ValueError, match="tfhd"):
        parse_mp4(broken)


def test_truncated_field_reads_raise_not_zero():
    """Truncated boxes must raise, never report 0 samples with
    parse_ok semantics (r14 review finding): a trun cut after its
    version/flags, an stts cut before its entry count."""
    from data_engineering_assignment_spark.functions.mp4 import (
        _box,
        _fullbox,
        build_mp4,
        parse_mp4,
    )

    base = build_mp4(1)
    # moof with a 4-byte trun body (version/flags only, no sample count)
    bad = base + _box(
        b"moof",
        _fullbox(b"mfhd", 0, struct.pack(">I", 1))
        + _box(
            b"traf",
            _fullbox(b"tfhd", 0, struct.pack(">I", 1))
            + _fullbox(b"trun", 0, b""),
        ),
    )
    with pytest.raises(ValueError, match="truncated trun"):
        parse_mp4(bad)
    # stts body with only version/flags
    i = base.find(b"stts") - 4
    size = struct.unpack(">I", base[i : i + 4])[0]
    gutted = (
        base[:i]
        + _fullbox(b"stts", 0, b"")
        + _box(b"free", b"\x00" * (size - 12))
        + base[i + size :]
    )
    with pytest.raises(ValueError, match="truncated stts"):
        parse_mp4(gutted)
