"""EXIF metadata extraction for JPEG media columns (dependency-free).

A training-data crawl needs image metadata (orientation for decode-time
rotation, capture time for dedup/freshness, GPS for geo filtering) long
before it needs the pixels; the reference's image route (OpenCV imread,
Assignment-python.py:710) drops EXIF entirely, so this is an additive
operator in the multimodal set.

* :func:`parse_exif` — walks the JPEG marker stream to the APP1
  ``Exif\\x00\\x00`` segment and parses the embedded TIFF structure
  (both byte orders; BYTE/ASCII/SHORT/LONG/RATIONAL/UNDEFINED/SLONG/
  SRATIONAL entry types; inline vs offset values), following the Exif
  and GPS sub-IFD pointers. Returns a flat {tag_name: value} dict —
  rationals as (numerator, denominator) tuples so no precision is lost
  to floats (exact downstream arithmetic, the repo-wide rule).
* :func:`build_exif_app1` / :func:`insert_exif` — fixture generators:
  serialize a field dict into a spec-shaped APP1 segment (IFD0 + Exif +
  GPS sub-IFDs) and splice it into a real JPEG after SOI.

Shares the IFD wire format with ``functions/tiff.py`` but not code: the
pixel decoder reads a fixed tag set into arrays, this walker maps the
full entry-type table into Python values.
"""

from __future__ import annotations

import struct

# Exif 2.3 tag names for the fields a crawl pipeline actually uses
_IFD0_TAGS = {
    271: "make",
    272: "model",
    274: "orientation",
    282: "x_resolution",
    283: "y_resolution",
    306: "datetime",
    34665: "_exif_ifd",
    34853: "_gps_ifd",
}
_EXIF_TAGS = {
    33434: "exposure_time",
    33437: "f_number",
    34855: "iso",
    36867: "datetime_original",
    37386: "focal_length",
    40962: "pixel_x_dimension",
    40963: "pixel_y_dimension",
}
_GPS_TAGS = {
    1: "gps_latitude_ref",
    2: "gps_latitude",
    3: "gps_longitude_ref",
    4: "gps_longitude",
}

# {type: (struct char or None, size in bytes)}
_TYPES = {
    1: ("B", 1),  # BYTE
    2: (None, 1),  # ASCII
    3: ("H", 2),  # SHORT
    4: ("I", 4),  # LONG
    5: (None, 8),  # RATIONAL
    7: ("B", 1),  # UNDEFINED
    9: ("i", 4),  # SLONG
    10: (None, 8),  # SRATIONAL
}


def _parse_ifd(tiff: bytes, bo: str, off: int, names: dict) -> dict:
    out: dict = {}
    if off + 2 > len(tiff):
        raise ValueError("EXIF: IFD offset out of bounds")
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, base)
        name = names.get(tag)
        if name is None or typ not in _TYPES:
            continue
        ch, sz = _TYPES[typ]
        total = sz * cnt
        voff = (
            base + 8
            if total <= 4
            else struct.unpack_from(bo + "I", tiff, base + 8)[0]
        )
        if voff + total > len(tiff):
            raise ValueError(f"EXIF: value of tag {tag} out of bounds")
        if typ == 2:  # ASCII, NUL-terminated
            raw = tiff[voff : voff + cnt]
            out[name] = raw.split(b"\0", 1)[0].decode("ascii", "replace")
        elif typ in (5, 10):  # (S)RATIONAL pairs
            kind = "ii" if typ == 10 else "II"
            vals = [
                struct.unpack_from(bo + kind, tiff, voff + 8 * k)
                for k in range(cnt)
            ]
            out[name] = vals[0] if cnt == 1 else vals
        else:
            vals = struct.unpack_from(bo + str(cnt) + ch, tiff, voff)
            out[name] = vals[0] if cnt == 1 else list(vals)
    return out


def parse_exif(content: bytes) -> dict:
    """Extract the EXIF fields of a JPEG (see module docstring). Returns
    {} when the image carries no APP1 Exif segment; raises ValueError on
    a structurally broken segment."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("EXIF: not a JPEG (no SOI)")
    pos = 2
    tiff = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            break
        # JPEG B.1.1.2: any number of 0xFF fill bytes may pad before the
        # marker byte — skip the run so the byte after the LAST 0xFF is
        # read as the marker
        while pos + 2 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no metadata past
            break
        (size,) = struct.unpack_from(">H", content, pos + 2)
        if marker == 0xE1 and content[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = content[pos + 10 : pos + 2 + size]
            break
        pos += 2 + size
    if tiff is None:
        return {}
    if tiff[:2] not in (b"II", b"MM"):
        raise ValueError("EXIF: bad TIFF byte-order mark")
    bo = "<" if tiff[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", tiff, 2)
    if magic != 42:
        raise ValueError("EXIF: bad TIFF magic")
    (ifd0,) = struct.unpack_from(bo + "I", tiff, 4)
    out = _parse_ifd(tiff, bo, ifd0, _IFD0_TAGS)
    exif_off = out.pop("_exif_ifd", None)
    gps_off = out.pop("_gps_ifd", None)
    if exif_off is not None:
        out.update(_parse_ifd(tiff, bo, exif_off, _EXIF_TAGS))
    if gps_off is not None:
        out.update(_parse_ifd(tiff, bo, gps_off, _GPS_TAGS))
    return out


_NAME_TO_TAG = {
    **{v: (k, 0) for k, v in _IFD0_TAGS.items()},
    **{v: (k, 1) for k, v in _EXIF_TAGS.items()},
    **{v: (k, 2) for k, v in _GPS_TAGS.items()},
}


def _entry_bytes(value, bo: str) -> tuple[int, int, bytes]:
    """(type, count, packed value bytes) for one field."""
    if isinstance(value, str):
        raw = value.encode("ascii") + b"\0"
        return 2, len(raw), raw
    if isinstance(value, tuple):  # one rational
        return 5, 1, struct.pack(bo + "II", *value)
    if isinstance(value, list):  # rational list
        return 5, len(value), b"".join(struct.pack(bo + "II", *v) for v in value)
    if isinstance(value, int):
        if value < 0:  # SLONG (type 9) — SHORT/LONG are unsigned
            return 9, 1, struct.pack(bo + "i", value)
        if value < 0x10000:
            return 3, 1, struct.pack(bo + "H", value)
        return 4, 1, struct.pack(bo + "I", value)
    raise TypeError(f"unsupported EXIF fixture value {value!r}")


def _build_ifd(
    entries: list[tuple[int, int, int, bytes]], ifd_off: int, bo: str
) -> bytes:
    """Serialize one IFD at ifd_off; overflow values follow the table."""
    head = struct.pack(bo + "H", len(entries))
    table = b""
    over = b""
    over_off = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, cnt, raw in sorted(entries):
        if len(raw) <= 4:
            table += struct.pack(bo + "HHI", tag, typ, cnt) + raw.ljust(4, b"\0")
        else:
            table += struct.pack(bo + "HHII", tag, typ, cnt, over_off + len(over))
            over += raw + (b"\0" if len(raw) & 1 else b"")
    return head + table + struct.pack(bo + "I", 0) + over


def build_exif_app1(fields: dict, big_endian: bool = False) -> bytes:
    """Serialize {tag_name: value} into an APP1 Exif segment (IFD0 with
    Exif/GPS sub-IFDs as needed, either byte order)."""
    bo = ">" if big_endian else "<"
    groups: list[list[tuple[int, int, int, bytes]]] = [[], [], []]
    for name, value in fields.items():
        tag, grp = _NAME_TO_TAG[name]
        typ, cnt, raw = _entry_bytes(value, bo)
        groups[grp].append((tag, typ, cnt, raw))

    def ifd_size(entries, extra_ptrs=0):
        n = len(entries) + extra_ptrs
        over = sum(len(r) + (len(r) & 1) for _, _, _, r in entries if len(r) > 4)
        return 2 + 12 * n + 4 + over

    ifd0_off = 8
    ptrs = (1 if groups[1] else 0) + (1 if groups[2] else 0)
    exif_off = ifd0_off + ifd_size(groups[0], ptrs)
    gps_off = exif_off + (ifd_size(groups[1]) if groups[1] else 0)
    ifd0 = list(groups[0])
    if groups[1]:
        ifd0.append((34665, 4, 1, struct.pack(bo + "I", exif_off)))
    if groups[2]:
        ifd0.append((34853, 4, 1, struct.pack(bo + "I", gps_off)))
    tiff = (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, ifd0_off)
    tiff += _build_ifd(ifd0, ifd0_off, bo)
    if groups[1]:
        tiff += _build_ifd(groups[1], exif_off, bo)
    if groups[2]:
        tiff += _build_ifd(groups[2], gps_off, bo)
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment into a JPEG right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]
