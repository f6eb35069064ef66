"""functions/flac.py + functions/ogg.py — audio container metadata
contracts (the census walks; decode stays guarded)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.flac import (
    build_flac,
    parse_flac,
)
from data_engineering_assignment_spark.functions.ogg import (
    build_ogg,
    parse_ogg,
)

# --------------------------------------------------------------------------
# FLAC
# --------------------------------------------------------------------------


def test_flac_streaminfo_roundtrip():
    r = parse_flac(build_flac(441000, sample_rate=44100, channels=2,
                              bits_per_sample=16))
    assert r["sample_rate"] == 44100 and r["channels"] == 2
    assert r["bits_per_sample"] == 16 and r["total_samples"] == 441000
    assert r["duration_ms"] == 10000  # exact integer
    assert r["n_blocks"] == 1 and not r["has_picture"]
    assert r["title"] is None


def test_flac_exact_integer_duration_and_exotic_params():
    # 96kHz/8ch/24bit exercises the full packed-field widths
    r = parse_flac(build_flac(96001, sample_rate=96000, channels=8,
                              bits_per_sample=24))
    assert (r["channels"], r["bits_per_sample"]) == (8, 24)
    assert r["duration_ms"] == 96001 * 1000 // 96000  # floor, not round


def test_flac_vorbis_comment_tags_and_picture():
    r = parse_flac(
        build_flac(1000, title="T & T", artist="someone", album="LP",
                   picture=True, padding=16)
    )
    assert (r["title"], r["artist"], r["album"]) == ("T & T", "someone", "LP")
    assert r["has_picture"]
    assert r["n_blocks"] == 4  # streaminfo + comment + picture + padding


def test_flac_case_insensitive_keys_first_wins():
    raw = bytearray(build_flac(1000, title="lower"))
    # the builder writes 'TITLE=' — parse must match case-insensitively
    assert parse_flac(bytes(raw))["title"] == "lower"


def test_flac_unknown_length_stream():
    assert parse_flac(build_flac(0))["duration_ms"] == 0


def test_flac_guards():
    with pytest.raises(ValueError, match="fLaC magic"):
        parse_flac(b"not flac")
    good = build_flac(1000, title="t")
    with pytest.raises(ValueError, match="truncated FLAC"):
        parse_flac(good[:20])
    # STREAMINFO must be first: flip the first block type to padding
    bad = bytearray(good)
    bad[4] = (bad[4] & 0x80) | 1
    with pytest.raises(ValueError, match="not first|mis-sized|truncated"):
        parse_flac(bytes(bad))
    # zero sample rate is structural garbage, not a 0-duration row
    z = bytearray(build_flac(1000))
    z[4 + 4 + 10 : 4 + 4 + 18] = (0).to_bytes(8, "big")
    with pytest.raises(ValueError, match="sample rate is zero"):
        parse_flac(bytes(z))


@settings(max_examples=150, deadline=None)
@given(
    mutations=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
)
def test_flac_mutation_contract(mutations):
    """Byte-mutated FLAC parses or raises ValueError — never an
    IndexError/struct.error/KeyError (the codec fuzz discipline)."""
    base = bytearray(
        build_flac(44100, title="t", artist="a", picture=True, padding=8)
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_flac(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass


# --------------------------------------------------------------------------
# Ogg
# --------------------------------------------------------------------------


def test_ogg_vorbis_roundtrip():
    r = parse_ogg(build_ogg("vorbis", 441000, sample_rate=44100,
                            channels=2, n_audio_pages=3))
    assert r["codec"] == "vorbis" and r["sample_rate"] == 44100
    assert r["channels"] == 2 and r["n_streams"] == 1
    assert r["n_pages"] == 4  # BOS + 3 audio pages
    assert r["duration_ms"] == 10000


def test_ogg_opus_preskip_and_48k_rule():
    r = parse_ogg(build_ogg("opus", 96312, sample_rate=16000,
                            channels=1, pre_skip=312))
    # output timeline is ALWAYS 48 kHz, input rate is advisory
    assert r["codec"] == "opus" and r["sample_rate"] == 48000
    assert r["pre_skip"] == 312
    assert r["duration_ms"] == (96312 - 312) * 1000 // 48000 == 2000


def test_ogg_opus_preskip_clamps_at_zero():
    r = parse_ogg(build_ogg("opus", 100, pre_skip=500))
    assert r["duration_ms"] == 0


def test_ogg_multistream_and_unknown_codec():
    r = parse_ogg(build_ogg("vorbis", 44100, extra_streams=2))
    assert r["n_streams"] == 3
    assert r["codec"] == "vorbis"  # primary = first BOS
    u = parse_ogg(build_ogg("unknown", 500))
    assert u["codec"] == "unknown"
    assert u["sample_rate"] is None and u["duration_ms"] is None


def test_ogg_large_packet_lacing():
    # a >255-byte identification packet forces the 255-run lacing path
    import struct

    from data_engineering_assignment_spark.functions.ogg import _page

    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
        + struct.pack("<I", 44100) + b"\x00" * 300
    )
    raw = _page(7, 0, 0, [ident], htype=0x02) + _page(
        7, 1, 44100, [b"\x00" * 10], htype=0x04
    )
    r = parse_ogg(raw)
    assert r["codec"] == "vorbis" and r["duration_ms"] == 1000


def test_ogg_guards():
    with pytest.raises(ValueError, match="OggS capture"):
        parse_ogg(b"not ogg")
    good = build_ogg("vorbis", 44100)
    with pytest.raises(ValueError, match="truncated Ogg"):
        parse_ogg(good[:20])
    # junk between pages is a bad capture, not silently skipped
    with pytest.raises(ValueError, match="capture pattern"):
        parse_ogg(good + b"garbage")
    bad = bytearray(good)
    bad[4] = 9  # version
    with pytest.raises(ValueError, match="page version"):
        parse_ogg(bytes(bad))


@settings(max_examples=150, deadline=None)
@given(
    mutations=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
)
def test_ogg_mutation_contract(mutations):
    base = bytearray(build_ogg("opus", 48000, pre_skip=100,
                               n_audio_pages=2, extra_streams=1))
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_ogg(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass
