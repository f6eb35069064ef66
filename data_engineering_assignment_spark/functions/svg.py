"""Dependency-free SVG metadata extraction — the one common web image
format the census previously had no row for (binary_media_inventory
covered PNG/JPEG/GIF/BMP/ICO/TIFF/WebP/AVIF; crawls are full of SVG
logos and icons). Additive vs the reference (its image route is
Databricks ``format("image")``, Assignment-python.py:710).

* :func:`parse_svg` — one SVG document → intrinsic-size + census
  fields. Strict about structure (junk bytes, a non-``svg`` root, a
  malformed length or viewBox raise ValueError — the per-row
  dead-letter discipline every codec gate counts), tolerant about
  content (unknown elements/attributes ride along ignored). Bytes
  input sniffs gzip by magic (``.svgz``); the XML decode wraps
  LookupError (unknown encoding declaration — the r14 feeds
  counterexample) into the same ValueError class.
* :func:`build_svg` — fixture generator for the oracle gates.

Intrinsic-size resolution follows the browser rule for raster
replacement: a unitless or ``px`` width/height attribute IS the pixel
size; a relative/absolute-unit length (%, em, pt, ...) does not
resolve without layout context, so the size falls back to the viewBox
extent (the declared unit is still reported); no attribute falls back
to viewBox too; neither present → None. No unit conversion math —
pt/mm/in→px multipliers would put non-terminating floats into
oracle-gated sums.
"""

from __future__ import annotations

import gzip
import re
import xml.etree.ElementTree as ET
import zlib

_LENGTH_RE = re.compile(
    r"^\s*([0-9]+(?:\.[0-9]+)?)(px|pt|pc|mm|cm|in|em|ex|%)?\s*$"
)


def _local(tag) -> str:
    return tag.rpartition("}")[2] if isinstance(tag, str) else ""


def _length(value: str | None, what: str):
    """SVG length attribute → (resolved_px | None, unit | None).
    Unitless and ``px`` resolve; any other legal unit is reported but
    not converted; negative or garbage lengths raise (spec: a negative
    length on svg width/height is an error)."""
    if value is None:
        return None, None
    m = _LENGTH_RE.match(value)
    if m is None:
        raise ValueError(f"svg: malformed {what} length {value!r}")
    num, unit = float(m.group(1)), m.group(2)
    if unit in (None, "px"):
        return num, "px"
    return None, unit


def parse_svg(content: bytes | str) -> dict:
    """Parse one SVG document → ``{"width", "height", "width_unit",
    "height_unit", "vb_width", "vb_height", "n_elements",
    "has_script", "title"}``.

    ``width``/``height`` are the resolved intrinsic pixel size (see
    module docstring for the fallback ladder); ``vb_*`` the viewBox
    extent; ``n_elements`` the total element count (census weight);
    ``has_script`` flags ``<script>`` anywhere in the tree (the
    sanitization signal a corpus pipeline filters on); ``title`` the
    first direct ``<title>`` child of the root. Raises ValueError on
    junk bytes, a truncated/corrupt gzip member, a non-``svg`` root,
    or a malformed length/viewBox."""
    if isinstance(content, (bytes, bytearray)):
        data = bytes(content)
        if data[:2] == b"\x1f\x8b":
            try:
                data = gzip.decompress(data)
            except (OSError, EOFError, zlib.error) as e:
                raise ValueError(f"svg: bad gzip member ({e})") from e
    else:
        data = content.encode("utf-8")
    try:
        root = ET.fromstring(data)
    except (ET.ParseError, LookupError) as e:
        raise ValueError(f"svg: malformed XML ({e})") from e
    if _local(root.tag) != "svg":
        raise ValueError(f"svg: unexpected root element {_local(root.tag)!r}")

    w, w_unit = _length(root.get("width"), "width")
    h, h_unit = _length(root.get("height"), "height")

    vb_w = vb_h = None
    vb = root.get("viewBox")
    if vb is not None:
        parts = [p for p in re.split(r"[\s,]+", vb.strip()) if p]
        if len(parts) != 4:
            raise ValueError(f"svg: malformed viewBox {vb!r}")
        try:
            _, _, vb_w, vb_h = (float(p) for p in parts)
        except ValueError as e:
            raise ValueError(f"svg: malformed viewBox {vb!r}") from e
        if vb_w < 0 or vb_h < 0:
            raise ValueError(f"svg: negative viewBox extent {vb!r}")

    # fallback ladder: attribute px → viewBox extent → None (covers
    # both "no attribute" and "attribute in a non-resolvable unit")
    if w is None:
        w = vb_w
    if h is None:
        h = vb_h

    n_elements = 0
    has_script = False
    for el in root.iter():
        if not isinstance(el.tag, str):
            continue  # comments / processing instructions
        n_elements += 1
        if _local(el.tag) == "script":
            has_script = True
    title = next(
        (
            (el.text or "").strip()
            for el in root
            if _local(el.tag) == "title"
        ),
        None,
    )
    return {
        "width": w,
        "height": h,
        "width_unit": w_unit,
        "height_unit": h_unit,
        "vb_width": vb_w,
        "vb_height": vb_h,
        "n_elements": n_elements,
        "has_script": has_script,
        "title": title,
    }


def build_svg(
    width: int | str | None = None,
    height: int | str | None = None,
    viewbox: tuple | None = None,
    n_shapes: int = 1,
    script: bool = False,
    title: str | None = None,
    gzipped: bool = False,
) -> bytes:
    """Fixture generator: declared dims (int → unitless, str passes a
    unit suffix through), optional ``viewbox`` (min-x, min-y, w, h),
    ``n_shapes`` rect children, an optional ``<script>`` child and
    ``<title>``, optionally gzipped (``.svgz``). Element count of the
    output: 1 (root) + n_shapes + script + title."""
    from xml.sax.saxutils import escape, quoteattr

    attrs = ['xmlns="http://www.w3.org/2000/svg"']
    if width is not None:
        attrs.append(f"width={quoteattr(str(width))}")
    if height is not None:
        attrs.append(f"height={quoteattr(str(height))}")
    if viewbox is not None:
        attrs.append(
            'viewBox="' + " ".join(str(v) for v in viewbox) + '"'
        )
    parts = [f"<svg {' '.join(attrs)}>"]
    if title is not None:
        parts.append(f"<title>{escape(title)}</title>")
    for i in range(n_shapes):
        parts.append(f'<rect x="{i}" y="0" width="1" height="1"/>')
    if script:
        parts.append("<script>/* fixture */</script>")
    parts.append("</svg>")
    out = ('<?xml version="1.0" encoding="UTF-8"?>\n' + "".join(parts)).encode(
        "utf-8"
    )
    return gzip.compress(out, 6) if gzipped else out
