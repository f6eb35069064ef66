"""functions/hls.py — M3U8 playlist parsing contract (RFC 8216;
exact integer millisecond durations)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.hls import (
    build_master,
    build_media,
    parse_m3u8,
)


def test_master_roundtrip():
    raw = build_master(
        [
            {"bandwidth": 800000, "width": 640, "height": 360,
             "codecs": "avc1.4d401e,mp4a.40.2", "uri": "low.m3u8"},
            {"bandwidth": 2500000, "uri": "high.m3u8"},
        ]
    )
    r = parse_m3u8(raw)
    assert r["kind"] == "master" and r["n_variants"] == 2
    v = r["variants"][0]
    assert v["bandwidth"] == 800000 and (v["width"], v["height"]) == (640, 360)
    # quoted CODECS value contains a comma — the attr tokenizer must
    # not split inside quotes
    assert v["codecs"] == "avc1.4d401e,mp4a.40.2"
    assert r["variants"][1]["width"] is None
    assert r["version"] == 7


def test_media_roundtrip_exact_ms():
    raw = build_media([4000, 4000, 2500])
    r = parse_m3u8(raw)
    assert r["kind"] == "media" and r["n_segments"] == 3
    assert r["total_duration_ms"] == 10500  # exact integer sum
    assert r["target_duration_s"] == 4
    assert r["endlist"] is True
    assert r["segments"][2] == {"duration_ms": 2500, "uri": "seg2.m4s"}


def test_media_live_no_endlist_and_fractional():
    r = parse_m3u8(build_media([1234], endlist=False))
    assert not r["endlist"]
    assert r["segments"][0]["duration_ms"] == 1234
    # whole-second EXTINF (no fraction) parses too
    r2 = parse_m3u8("#EXTM3U\n#EXTINF:4,\nseg.ts\n")
    assert r2["segments"][0]["duration_ms"] == 4000


def test_tags_between_extinf_and_uri_skipped():
    raw = (
        "#EXTM3U\n#EXTINF:2.000,\n"
        "#EXT-X-BYTERANGE:1000@0\nseg0.m4s\n#EXT-X-ENDLIST\n"
    )
    r = parse_m3u8(raw)
    assert r["segments"][0]["uri"] == "seg0.m4s"


def test_empty_media_playlist():
    r = parse_m3u8("#EXTM3U\n#EXT-X-TARGETDURATION:6\n")
    assert r["kind"] == "media" and r["n_segments"] == 0
    assert r["total_duration_ms"] == 0


def test_guards():
    with pytest.raises(ValueError, match="EXTM3U"):
        parse_m3u8("not a playlist")
    with pytest.raises(ValueError, match="not UTF-8"):
        parse_m3u8(b"\xff\xfe broken \x80")
    with pytest.raises(ValueError, match="variant URI"):
        parse_m3u8("#EXTM3U\n#EXT-X-STREAM-INF:BANDWIDTH=1\n#EXT-X-ENDLIST")
    with pytest.raises(ValueError, match="segment URI"):
        parse_m3u8("#EXTM3U\n#EXTINF:4.0,\n#EXT-X-ENDLIST")
    with pytest.raises(ValueError, match="BANDWIDTH"):
        parse_m3u8("#EXTM3U\n#EXT-X-STREAM-INF:RESOLUTION=1x1\nu.m3u8")
    with pytest.raises(ValueError, match="RESOLUTION"):
        parse_m3u8(
            "#EXTM3U\n#EXT-X-STREAM-INF:BANDWIDTH=1,RESOLUTION=abc\nu.m3u8"
        )
    with pytest.raises(ValueError, match="duration"):
        parse_m3u8("#EXTM3U\n#EXTINF:4.x,\nseg.ts")
    with pytest.raises(ValueError, match="unterminated"):
        parse_m3u8('#EXTM3U\n#EXT-X-STREAM-INF:CODECS="a,BANDWIDTH=1\nu')


@settings(max_examples=150, deadline=None)
@given(
    mutations=st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
    master=st.booleans(),
)
def test_mutation_contract(mutations, master):
    base = bytearray(
        (
            build_master(
                [{"bandwidth": 1000, "width": 64, "height": 36,
                  "codecs": "avc1", "uri": "v.m3u8"}]
            )
            if master
            else build_media([4000, 2500])
        ).encode()
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_m3u8(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass


def test_double_extinf_raises_not_silently_drops():
    """A second #EXTINF before the URI means the first cue's URI is
    missing — raise, never bind duration 1 to segment 2 (r15 review
    finding: the tag-skip loop swallowed it)."""
    with pytest.raises(ValueError, match="segment URI"):
        parse_m3u8("#EXTM3U\n#EXTINF:4.000,\n#EXTINF:5.000,\nseg1.ts")
