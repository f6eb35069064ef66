"""functions/svg.py — SVG metadata extraction contract."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.svg import (
    build_svg,
    parse_svg,
)


def test_attribute_dims_resolve():
    r = parse_svg(build_svg(64, 48, n_shapes=3))
    assert (r["width"], r["height"]) == (64.0, 48.0)
    assert (r["width_unit"], r["height_unit"]) == ("px", "px")
    assert r["vb_width"] is None and r["vb_height"] is None
    assert r["n_elements"] == 1 + 3  # root + rects
    assert not r["has_script"] and r["title"] is None


def test_px_suffix_and_float_dims():
    r = parse_svg(build_svg("64px", "48.5px", n_shapes=0))
    assert (r["width"], r["height"]) == (64.0, 48.5)
    assert r["n_elements"] == 1


def test_viewbox_fallback_no_attrs():
    r = parse_svg(build_svg(viewbox=(0, 0, 120, 80)))
    assert (r["width"], r["height"]) == (120.0, 80.0)
    assert (r["width_unit"], r["height_unit"]) == (None, None)
    assert (r["vb_width"], r["vb_height"]) == (120.0, 80.0)


def test_percent_width_falls_back_to_viewbox():
    r = parse_svg(build_svg("100%", "50%", viewbox=(0, 0, 24, 12)))
    assert (r["width"], r["height"]) == (24.0, 12.0)
    assert (r["width_unit"], r["height_unit"]) == ("%", "%")


def test_nonresolvable_unit_without_viewbox_is_none():
    r = parse_svg(build_svg("10em", "5em"))
    assert r["width"] is None and r["height"] is None
    assert r["width_unit"] == "em"


def test_viewbox_comma_separated_and_script_title():
    raw = build_svg(
        viewbox=None, n_shapes=2, script=True, title="a & b"
    ).replace(b"<svg ", b'<svg viewBox="0,0,30,20" ', 1)
    r = parse_svg(raw)
    assert (r["vb_width"], r["vb_height"]) == (30.0, 20.0)
    assert r["has_script"] and r["title"] == "a & b"
    assert r["n_elements"] == 1 + 2 + 1 + 1  # root + rects + title + script


def test_gzip_sniff_and_str_input():
    gz = build_svg(10, 10, gzipped=True)
    assert gz[:2] == b"\x1f\x8b"
    raw = build_svg(10, 10)
    assert parse_svg(gz) == parse_svg(raw) == parse_svg(raw.decode())


def test_namespaced_root_and_comments_not_counted():
    raw = (
        '<svg xmlns="http://www.w3.org/2000/svg" width="5" height="5">'
        "<!-- a comment, not an element --><rect/></svg>"
    )
    r = parse_svg(raw)
    assert r["n_elements"] == 2


def test_guards():
    with pytest.raises(ValueError, match="malformed XML"):
        parse_svg(b"not xml at all")
    with pytest.raises(ValueError, match="unexpected root"):
        parse_svg("<html><body/></html>")
    with pytest.raises(ValueError, match="malformed width"):
        parse_svg('<svg width="abc"/>')
    with pytest.raises(ValueError, match="malformed width"):
        parse_svg('<svg width="-4"/>')  # negative length is a spec error
    with pytest.raises(ValueError, match="malformed viewBox"):
        parse_svg('<svg viewBox="0 0 10"/>')
    with pytest.raises(ValueError, match="negative viewBox"):
        parse_svg('<svg viewBox="0 0 -10 5"/>')
    # unknown encoding declaration (the r14 feeds counterexample class)
    with pytest.raises(ValueError, match="malformed XML"):
        parse_svg(b'<?xml version="1.0" encoding="ATF-8"?><svg/>')
    # truncated / corrupted gzip member
    gz = build_svg(10, 10, gzipped=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_svg(gz[: len(gz) // 2])


@settings(max_examples=150, deadline=None)
@given(
    mutations=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 255)),
        min_size=1,
        max_size=6,
    ),
    gzipped=st.booleans(),
)
def test_mutation_contract(mutations, gzipped):
    """Byte-mutated SVGs parse or raise ValueError — never anything
    else (the codec fuzz discipline)."""
    base = bytearray(
        build_svg(64, 48, viewbox=(0, 0, 64, 48), n_shapes=2,
                  title="t", gzipped=gzipped)
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_svg(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass
