"""functions/pngmeta.py — PNG ancillary-chunk metadata contract."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.pngmeta import (
    build_png_meta,
    parse_png_meta,
)


def test_text_chunk_kinds_roundtrip():
    r = parse_png_meta(
        build_png_meta(
            3, 2,
            texts=[
                ("Title", "doc one", "text"),
                ("Comment", "compressed body", "ztxt"),
                ("Author", "ünïcode name", "itxt"),
                ("Software", "zipped ünïcode", "itxtz"),
            ],
        )
    )
    assert (r["width"], r["height"]) == (3, 2)
    assert r["texts"] == [
        ("Title", "doc one"),
        ("Comment", "compressed body"),
        ("Author", "ünïcode name"),
        ("Software", "zipped ünïcode"),
    ]
    assert not r["has_exif"] and r["time"] is None and r["dpi_x"] is None


def test_exif_time_phys():
    r = parse_png_meta(
        build_png_meta(
            2, 2,
            exif=b"II*\x00" + b"\x00" * 20,
            time=(2026, 1, 5, 12, 34, 56),
            dpi=96,
        )
    )
    assert r["has_exif"] and r["exif_bytes"] == 24
    assert r["time"] == "2026-01-05T12:34:56"
    assert (r["dpi_x"], r["dpi_y"]) == (96, 96)
    # common dpi values survive the metre round-trip exactly
    for dpi in (72, 96, 150, 300, 600):
        assert parse_png_meta(build_png_meta(2, 2, dpi=dpi))["dpi_x"] == dpi


def test_still_a_decodable_png():
    from data_engineering_assignment_spark.functions.multimodal import (
        decode_png,
    )

    raw = build_png_meta(4, 3, texts=[("k", "v", "text")], dpi=72)
    frames, meta = decode_png(raw)  # (n_frames, h, w, ch)
    assert frames.shape == (1, 3, 4, 4)
    assert (meta["width"], meta["height"]) == (4, 3)


def test_guards():
    with pytest.raises(ValueError, match="signature"):
        parse_png_meta(b"not a png")
    good = build_png_meta(2, 2, texts=[("k", "v", "text")])
    with pytest.raises(ValueError, match="truncated"):
        parse_png_meta(good[: len(good) - 6])
    # flip one byte inside the tEXt body -> CRC catches it
    bad = bytearray(good)
    i = good.find(b"k\x00v")
    bad[i + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_png_meta(bytes(bad))


@settings(max_examples=150, deadline=None)
@given(
    mutations=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
)
def test_mutation_contract(mutations):
    base = bytearray(
        build_png_meta(
            2, 2,
            texts=[("T", "doc", "text"), ("C", "zz", "ztxt")],
            exif=b"II*\x00", time=(2026, 2, 3, 4, 5, 6), dpi=72,
        )
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_png_meta(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass
