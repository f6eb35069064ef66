"""Dependency-free FLAC container metadata — completes the audio
census (WAV/ADPCM + MP3 today; FLAC is the dominant lossless archive
format in crawled media dumps). Additive vs the reference (no audio
route). Audio DECODE stays out of scope per the codec-gate
discipline — this is the metadata-block walk only.

* :func:`parse_flac` — STREAMINFO (sample rate / channels / bit depth
  / total samples / exact integer duration), VORBIS_COMMENT tags
  (TITLE/ARTIST/ALBUM, case-insensitive keys), PICTURE presence,
  block census. Every field read is bounded inside its OWN metadata
  block: a truncated field is a ``'truncated ...'`` ValueError, never
  a zero value, an IndexError, or bytes read from the next block
  (CLAUDE.md binary-walk invariant).
* :func:`build_flac` — fixture generator for the oracle gates.

Format notes (public spec, RFC 9639): ``fLaC`` magic, then metadata
blocks — 1-byte header (bit 7 = last-block flag, bits 0..6 = type),
24-bit big-endian length, payload. STREAMINFO (type 0, 34 bytes) is
mandatory first; its packed tail is 20 bits sample rate, 3 bits
channels-1, 5 bits bits-per-sample-1, 36 bits total samples.
VORBIS_COMMENT (type 4) is LITTLE-endian inside (the one Ogg-heritage
block): u32 vendor length + vendor, u32 count, then per comment u32
length + ``KEY=value`` UTF-8.
"""

from __future__ import annotations

import struct

_BLOCK_NAMES = {
    0: "streaminfo",
    1: "padding",
    2: "application",
    3: "seektable",
    4: "vorbis_comment",
    5: "cuesheet",
    6: "picture",
}


def parse_flac(content: bytes) -> dict:
    """Parse FLAC metadata → ``{"sample_rate", "channels",
    "bits_per_sample", "total_samples", "duration_ms", "title",
    "artist", "album", "n_blocks", "has_picture"}``.

    ``duration_ms`` is the exact integer
    ``total_samples * 1000 // sample_rate`` (0 when the stream length
    is unknown, i.e. total_samples = 0). Raises ValueError on a
    missing magic, a STREAMINFO that is not first or mis-sized, or
    any field truncated inside its declared block."""
    if len(content) < 4 or content[:4] != b"fLaC":
        raise ValueError("not a FLAC file (missing fLaC magic)")
    pos = 4
    n_blocks = 0
    has_picture = False
    info: dict | None = None
    tags: dict[str, str] = {}
    last = False
    while not last:
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC metadata block header")
        hdr = content[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body_start = pos + 4
        body_end = body_start + size
        if body_end > len(content):
            raise ValueError(
                f"truncated FLAC {_BLOCK_NAMES.get(btype, btype)} block"
            )
        n_blocks += 1
        if n_blocks == 1 and btype != 0:
            raise ValueError("FLAC STREAMINFO block is not first")
        if btype == 0:
            if size != 34:
                raise ValueError("mis-sized FLAC STREAMINFO block")
            b = content[body_start:body_end]
            # bytes 10..17: 20b rate | 3b channels-1 | 5b bps-1 | 36b samples
            packed = int.from_bytes(b[10:18], "big")
            info = {
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
            }
            if info["sample_rate"] == 0:
                raise ValueError("FLAC STREAMINFO sample rate is zero")
        elif btype == 4:
            tags = _vorbis_comment(content, body_start, body_end)
        elif btype == 6:
            has_picture = True
        pos = body_end
    if info is None:
        raise ValueError("FLAC without a STREAMINFO block")
    return {
        **info,
        "duration_ms": info["total_samples"] * 1000 // info["sample_rate"],
        "title": tags.get("title"),
        "artist": tags.get("artist"),
        "album": tags.get("album"),
        "n_blocks": n_blocks,
        "has_picture": has_picture,
    }


def _vorbis_comment(content: bytes, start: int, end: int) -> dict[str, str]:
    """VORBIS_COMMENT payload walk (little-endian), every read bounded
    by the block's own [start, end)."""

    def u32(pos: int) -> int:
        if pos + 4 > end:
            raise ValueError("truncated FLAC vorbis_comment field")
        return struct.unpack_from("<I", content, pos)[0]

    pos = start
    vendor_len = u32(pos)
    pos += 4
    if pos + vendor_len > end:
        raise ValueError("truncated FLAC vorbis_comment vendor string")
    pos += vendor_len
    count = u32(pos)
    pos += 4
    tags: dict[str, str] = {}
    for _ in range(count):
        clen = u32(pos)
        pos += 4
        if pos + clen > end:
            raise ValueError("truncated FLAC vorbis_comment entry")
        entry = content[pos : pos + clen].decode("utf-8", "replace")
        pos += clen
        key, sep, val = entry.partition("=")
        if sep:
            tags.setdefault(key.lower(), val)
    return tags


def build_flac(
    total_samples: int,
    sample_rate: int = 44100,
    channels: int = 2,
    bits_per_sample: int = 16,
    title: str | None = None,
    artist: str | None = None,
    album: str | None = None,
    picture: bool = False,
    padding: int = 0,
) -> bytes:
    """Serialize a spec-valid FLAC metadata skeleton (no audio frames —
    metadata-only contract, like build_mp4's mdat): STREAMINFO with
    the packed rate/channels/bps/samples tail, an optional
    VORBIS_COMMENT (written only when a tag is present), an optional
    minimal PICTURE block, optional PADDING."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096)  # min/max block size
        + (0).to_bytes(3, "big") * 2  # min/max frame size (unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # MD5 of unencoded audio (unknown)
    )
    blocks: list[tuple[int, bytes]] = [(0, streaminfo)]
    tags = [
        f"{k}={v}"
        for k, v in (("TITLE", title), ("ARTIST", artist), ("ALBUM", album))
        if v is not None
    ]
    if tags:
        vendor = b"fixture"
        body = struct.pack("<I", len(vendor)) + vendor
        body += struct.pack("<I", len(tags))
        for t in tags:
            tb = t.encode("utf-8")
            body += struct.pack("<I", len(tb)) + tb
        blocks.append((4, body))
    if picture:
        # minimal PICTURE: type 3 (front cover), mime, empty desc/dims
        mime = b"image/png"
        body = (
            struct.pack(">I", 3)
            + struct.pack(">I", len(mime))
            + mime
            + struct.pack(">I", 0)  # description length
            + struct.pack(">IIII", 1, 1, 24, 0)  # w, h, depth, colors
            + struct.pack(">I", 4)
            + b"\x89PNG"  # truncated payload (never decoded)
        )
        blocks.append((6, body))
    if padding:
        blocks.append((1, b"\x00" * padding))
    out = b"fLaC"
    for i, (btype, body) in enumerate(blocks):
        hdr = btype | (0x80 if i == len(blocks) - 1 else 0)
        out += bytes([hdr]) + len(body).to_bytes(3, "big") + body
    return out
