"""functions/subtitles.py — SRT / WebVTT parsing contract (exact
integer milliseconds; dead-letter discipline)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.subtitles import (
    build_srt,
    build_vtt,
    parse_srt,
    parse_subtitles,
    parse_vtt,
)

_CUES = [
    {"start_ms": 1000, "end_ms": 2500, "text": "first line"},
    {"start_ms": 2500, "end_ms": 3723456 % 3600000, "text": "a\nb"},
]


def test_srt_roundtrip_exact_ms():
    r = parse_srt(build_srt(_CUES))
    assert r["kind"] == "srt" and r["n_cues"] == 2
    assert r["cues"][0] == {
        "idx": 1, "start_ms": 1000, "end_ms": 2500, "text": "first line",
    }
    assert r["cues"][1]["text"] == "a\nb"
    assert r["duration_ms"] == _CUES[1]["end_ms"]


def test_srt_hours_and_comma_ms():
    r = parse_srt("1\n01:02:03,456 --> 01:02:04,000\nx\n")
    c = r["cues"][0]
    assert c["start_ms"] == 3600000 + 120000 + 3000 + 456
    assert c["end_ms"] == 3600000 + 120000 + 4000


def test_srt_missing_cue_number_tolerated():
    r = parse_srt("00:00:01,000 --> 00:00:02,000\nno number\n")
    assert r["cues"][0]["idx"] is None
    assert r["cues"][0]["text"] == "no number"


def test_vtt_roundtrip_ids_notes_settings():
    raw = build_vtt(
        [{"idx": "intro", **_CUES[0]}, _CUES[1]], note="a comment"
    )
    r = parse_vtt(raw)
    assert r["kind"] == "vtt" and r["n_cues"] == 2
    assert r["cues"][0]["idx"] == "intro"
    assert r["cues"][1]["idx"] is None
    # cue settings after the end timestamp are ignored
    r2 = parse_vtt(
        "WEBVTT\n\n00:01.000 --> 00:02.000 align:start line:0\nhi\n"
    )
    assert r2["cues"][0] == {
        "idx": None, "start_ms": 1000, "end_ms": 2000, "text": "hi",
    }


def test_vtt_hourless_timestamps():
    r = parse_vtt("WEBVTT\n\n05:01.200 --> 05:02.000\nx\n")
    assert r["cues"][0]["start_ms"] == 301200


def test_sniffing_front_door_and_bytes():
    assert parse_subtitles(build_vtt(_CUES))["kind"] == "vtt"
    assert parse_subtitles(build_srt(_CUES).encode())["kind"] == "srt"
    with pytest.raises(ValueError, match="not UTF-8"):
        parse_subtitles(b"\xff\xfe\x00 garbage bytes \x80")


def test_guards():
    with pytest.raises(ValueError, match="WEBVTT header"):
        parse_vtt("not a vtt file")
    with pytest.raises(ValueError, match="malformed SRT timing"):
        parse_srt("1\n00:00:01 --> 00:00:02\nmissing ms\n")
    with pytest.raises(ValueError, match="ends before it starts"):
        parse_srt("1\n00:00:05,000 --> 00:00:01,000\nbackwards\n")
    with pytest.raises(ValueError, match="out of range"):
        parse_srt("1\n00:61:00,000 --> 00:62:00,000\nbad minutes\n")
    with pytest.raises(ValueError, match="malformed VTT timing"):
        parse_vtt("WEBVTT\n\n00:00:01.000 -> 00:00:02.000\nbad arrow\n")
    with pytest.raises(ValueError, match="identifier without a cue"):
        parse_vtt("WEBVTT\n\ndangling-id")


@settings(max_examples=150, deadline=None)
@given(
    mutations=st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
    vtt=st.booleans(),
)
def test_mutation_contract(mutations, vtt):
    """Byte-mutated subtitle files parse or raise ValueError — never
    an IndexError/KeyError (the codec fuzz discipline)."""
    base = bytearray(
        (build_vtt(_CUES, note="n") if vtt else build_srt(_CUES)).encode()
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_subtitles(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass


def test_build_srt_numberless_cue_roundtrip():
    """build_srt over parse_srt output with idx=None falls back to
    sequential numbering, never a literal 'None' line (r15 review
    finding: the fixture-twin round-trip broke)."""
    cues = parse_srt("00:00:01,000 --> 00:00:02,000\nhello\n")["cues"]
    assert cues[0]["idx"] is None
    rebuilt = build_srt(cues)
    assert "None" not in rebuilt
    assert parse_srt(rebuilt)["cues"][0]["text"] == "hello"
