"""functions/mp3.py — ID3 tag walks + MPEG-1 Layer III frame census."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.mp3 import (
    build_mp3,
    parse_mp3,
)


def test_roundtrip_tag_versions_and_encodings():
    for id3 in ("2.3", "2.4", "1", "none"):
        for enc in (0, 1, 3):
            b = build_mp3(
                25, 44100, 128,
                title="Tïtle", artist="Ärtist", album="Albüm",
                id3=id3, encoding=enc,
            )
            r = parse_mp3(b)
            assert r["n_frames"] == 25 and r["sample_rate"] == 44100
            assert r["cbr"] and r["bitrate_kbps"] == 128
            assert r["duration_ms"] == 25 * 1152 * 1000 // 44100
            if id3 == "none":
                assert r["title"] is None and r["id3_version"] is None
            else:
                assert r["title"] == "Tïtle", (id3, enc)
                assert r["artist"] == "Ärtist" and r["album"] == "Albüm"
                assert r["id3_version"] == ("1" if id3 == "1" else id3)


def test_vbr_and_sample_rates():
    for sr in (44100, 48000, 32000):
        r = parse_mp3(build_mp3(30, sr, 96, vbr_every=5))
        assert not r["cbr"] and r["bitrate_kbps"] == 96
        assert r["n_frames"] == 30
        assert r["duration_ms"] == 30 * 1152 * 1000 // sr
    assert parse_mp3(build_mp3(30, 44100, 96))["cbr"]


def test_truncated_and_trailing_junk():
    b = build_mp3(10, 44100, 128, id3="none")
    # truncated final frame: complete frames still count
    assert parse_mp3(b[:-50])["n_frames"] == 9
    # trailing junk after a valid stream stops the walk, keeps the count
    assert parse_mp3(b + b"garbage after the stream")["n_frames"] == 10


def test_guards():
    with pytest.raises(ValueError, match="no MPEG audio frame"):
        parse_mp3(b"junk bytes, not an mp3!!")
    with pytest.raises(ValueError, match="exceeds file"):
        parse_mp3(build_mp3(1)[:10])
    with pytest.raises(ValueError, match="too short"):
        parse_mp3(b"ID3")
    # MPEG-2 (version bits 10) stays honestly guarded
    b = bytearray(build_mp3(3, 44100, 128, id3="none"))
    b[1] = 0xF3  # version 2, layer III
    with pytest.raises(NotImplementedError, match="MPEG-1"):
        parse_mp3(bytes(b))
    # a tag with no audio after it is structural
    tag_only = build_mp3(1, id3="2.3", title="t")
    i = tag_only.find(b"\xff\xfb")
    with pytest.raises(ValueError, match="no MPEG audio frame"):
        parse_mp3(tag_only[:i] + b"\x00" * 4)
    # ID3v1 126 bytes of tag are not audio frames
    v1 = build_mp3(5, id3="1", title="t")
    assert parse_mp3(v1)["n_frames"] == 5


@settings(max_examples=200, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=48),
    mutations=st.lists(
        st.tuples(st.integers(0, 600), st.integers(0, 255)),
        min_size=0,
        max_size=8,
    ),
)
def test_adversarial_bytes_never_escape_error_contract(data, mutations):
    base = bytearray(
        build_mp3(4, 44100, 128, title="t", id3="2.4", encoding=1) + data
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_mp3(bytes(base))
        assert isinstance(r, dict)
    except (ValueError, NotImplementedError):
        # UnicodeDecodeError from mutated ID3 text IS a ValueError
        pass


def test_unsync_and_frame_flag_guards():
    """ID3v2 unsynchronisation and per-frame format flags change the
    payload layout — decoding without honoring them yields silently
    WRONG text, so both are honest guards (r14 review finding)."""
    b = bytearray(build_mp3(3, title="ÿes", id3="2.3"))
    b[5] |= 0x80  # tag-level unsynchronisation flag
    with pytest.raises(NotImplementedError, match="unsynchronisation"):
        parse_mp3(bytes(b))
    b = bytearray(build_mp3(3, title="t", id3="2.4"))
    i = bytes(b).find(b"TIT2")
    b[i + 9] = 0x02  # v2.4 per-frame unsync format flag
    with pytest.raises(NotImplementedError, match="format flags"):
        parse_mp3(bytes(b))
