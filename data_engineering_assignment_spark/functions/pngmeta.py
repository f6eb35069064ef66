"""PNG ancillary-chunk metadata walk — the census side of the PNG
story (``functions.multimodal.decode_png`` is the pixel side):
tEXt / zTXt / iTXt textual metadata, eXIf presence, tIME
modification stamps, pHYs physical resolution. Real corpora filter
and attribute on exactly these (generator tags, copyright strings,
capture dates). Additive vs the reference (its PNG use is pixel
decode only, Assignment-python.py:654-661).

Bounded-read discipline: every field read stays inside its own
chunk's declared length; chunk CRCs ARE verified (unlike the pixel
decoder, a metadata walk is cheap enough to afford it — and a
corrupted keyword silently attributed to a corpus would be worse
than a dead-letter); truncation, a bad CRC, or undecodable
compressed text raise ValueError.

* :func:`parse_png_meta` — one PNG → dims + metadata census.
* :func:`build_png_meta` — fixture twin (splices chunks into a
  ``functions.multimodal.encode_png`` skeleton before IEND).
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_png_meta(content: bytes) -> dict:
    """Parse PNG metadata → ``{"width", "height", "bit_depth",
    "color_type", "texts": [(keyword, text), ...], "has_exif",
    "exif_bytes", "time", "dpi_x", "dpi_y"}``.

    ``texts`` collects tEXt (latin-1), zTXt (zlib-inflated latin-1)
    and iTXt (UTF-8, optionally zlib-inflated) in chunk order —
    the keyword is always latin-1 per spec. ``time`` is the tIME
    stamp as ``YYYY-MM-DDTHH:MM:SS``; ``dpi_*`` derive from pHYs
    only for unit 1 (metres): ``round(ppu * 0.0254)`` — exact
    integer arithmetic ``(ppu * 254 + 5000) // 10000``."""
    data = bytes(content)
    if data[:8] != _MAGIC:
        raise ValueError("PNG: bad signature")
    pos = 8
    hdr = None
    texts: list[tuple] = []
    has_exif = False
    exif_bytes = 0
    time = None
    dpi_x = dpi_y = None
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("PNG: truncated chunk header")
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body_start = pos + 8
        body_end = body_start + length
        if body_end + 4 > len(data):
            raise ValueError(
                f"PNG: truncated {ctype.decode('latin-1')} chunk"
            )
        body = data[body_start:body_end]
        (crc,) = struct.unpack_from(">I", data, body_end)
        if crc != zlib.crc32(ctype + body) & 0xFFFFFFFF:
            raise ValueError(f"PNG: bad {ctype.decode('latin-1')} CRC")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("PNG: mis-sized IHDR")
            w, h, depth, color = struct.unpack_from(">IIBB", body)
            hdr = {
                "width": w, "height": h,
                "bit_depth": depth, "color_type": color,
            }
        elif ctype == b"tEXt":
            kw, sep, txt = body.partition(b"\x00")
            if not sep:
                raise ValueError("PNG: tEXt without keyword separator")
            texts.append(
                (kw.decode("latin-1"), txt.decode("latin-1"))
            )
        elif ctype == b"zTXt":
            kw, sep, rest = body.partition(b"\x00")
            if not sep or len(rest) < 1:
                raise ValueError("PNG: malformed zTXt")
            if rest[0] != 0:
                raise ValueError("PNG: unknown zTXt compression method")
            try:
                txt = zlib.decompress(rest[1:])
            except zlib.error as e:
                raise ValueError(f"PNG: bad zTXt stream ({e})") from e
            texts.append(
                (kw.decode("latin-1"), txt.decode("latin-1"))
            )
        elif ctype == b"iTXt":
            kw, sep, rest = body.partition(b"\x00")
            if not sep or len(rest) < 2:
                raise ValueError("PNG: malformed iTXt")
            compflag, compmethod = rest[0], rest[1]
            rest = rest[2:]
            lang, sep1, rest = rest.partition(b"\x00")
            trans, sep2, txt = rest.partition(b"\x00")
            if not (sep1 and sep2):
                raise ValueError("PNG: malformed iTXt separators")
            if compflag:
                if compmethod != 0:
                    raise ValueError("PNG: unknown iTXt compression")
                try:
                    txt = zlib.decompress(txt)
                except zlib.error as e:
                    raise ValueError(f"PNG: bad iTXt stream ({e})") from e
            texts.append(
                (kw.decode("latin-1"), txt.decode("utf-8", "replace"))
            )
        elif ctype == b"eXIf":
            has_exif = True
            exif_bytes = length
        elif ctype == b"tIME":
            if length != 7:
                raise ValueError("PNG: mis-sized tIME")
            y, mo, d, h, mi, s = struct.unpack_from(">HBBBBB", body)
            time = f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}"
        elif ctype == b"pHYs":
            if length != 9:
                raise ValueError("PNG: mis-sized pHYs")
            px, py, unit = struct.unpack_from(">IIB", body)
            if unit == 1:  # pixels per metre -> dpi, exact integers
                dpi_x = (px * 254 + 5000) // 10000
                dpi_y = (py * 254 + 5000) // 10000
        pos = body_end + 4
        if ctype == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG: missing IHDR")
    return {
        **hdr,
        "texts": texts,
        "has_exif": has_exif,
        "exif_bytes": exif_bytes,
        "time": time,
        "dpi_x": dpi_x,
        "dpi_y": dpi_y,
    }


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def build_png_meta(
    width: int = 2,
    height: int = 2,
    texts: list[tuple] | None = None,
    exif: bytes | None = None,
    time: tuple | None = None,
    dpi: int | None = None,
) -> bytes:
    """Fixture twin: a real decodable PNG (via
    ``functions.multimodal.encode_png``) with ancillary chunks
    spliced before IEND. ``texts`` entries are (keyword, text, kind)
    with kind in {"text", "ztxt", "itxt", "itxtz"}; ``time`` a
    (y, mo, d, h, mi, s) tuple; ``dpi`` writes pHYs in metres."""
    import numpy as np

    from .multimodal import encode_png

    frame = np.zeros((height, width, 4), dtype=np.uint8)
    base = encode_png(frame)
    extra = b""
    for kw, txt, kind in texts or []:
        kwb = kw.encode("latin-1")
        if kind == "text":
            extra += _chunk(b"tEXt", kwb + b"\x00" + txt.encode("latin-1"))
        elif kind == "ztxt":
            extra += _chunk(
                b"zTXt",
                kwb + b"\x00\x00" + zlib.compress(txt.encode("latin-1")),
            )
        elif kind == "itxt":
            extra += _chunk(
                b"iTXt",
                kwb + b"\x00\x00\x00" + b"\x00" + b"\x00"
                + txt.encode("utf-8"),
            )
        elif kind == "itxtz":
            extra += _chunk(
                b"iTXt",
                kwb + b"\x00\x01\x00" + b"\x00" + b"\x00"
                + zlib.compress(txt.encode("utf-8")),
            )
        else:
            raise ValueError(f"unknown text-chunk kind {kind!r}")
    if exif is not None:
        extra += _chunk(b"eXIf", exif)
    if time is not None:
        extra += _chunk(b"tIME", struct.pack(">HBBBBB", *time))
    if dpi is not None:
        ppm = (dpi * 10000 + 127) // 254  # dpi -> pixels/metre, exact
        extra += _chunk(b"pHYs", struct.pack(">IIB", ppm, ppm, 1))
    iend = base.rfind(b"IEND") - 4
    return base[:iend] + extra + base[iend:]
