"""Dependency-free Ogg container metadata — the streaming half of the
audio census (FLAC covers the archive half; Ogg carries Vorbis/Opus on
real crawls). Additive vs the reference (no audio route). Codec
DECODE stays out of scope per the codec-gate discipline — this is the
page walk + identification-header reads only.

* :func:`parse_ogg` — page census (count, stream count via BOS
  flags), primary-stream codec identification (Vorbis / Opus /
  Theora by the first BOS packet's magic), sample rate / channels
  from the codec ID header, and the exact integer duration from the
  primary stream's LAST page granule position (Vorbis granules count
  PCM samples at the stream rate; Opus granules always count 48 kHz
  samples, minus the declared pre-skip). Every field read is bounded
  inside its OWN page: a truncated lacing table or header is a
  ``'truncated ...'`` ValueError, never a zero value or bytes read
  from the next page (CLAUDE.md binary-walk invariant). Page CRCs are
  not verified (checksum validation is a transport concern; the
  census contract is structural).
* :func:`build_ogg` — fixture generator for the oracle gates.

Format notes (public specs: RFC 3533 framing, RFC 7845 Opus mapping,
Vorbis I spec): pages start ``OggS``, version 0, 1-byte header-type
(bit 1 = BOS, bit 2 = EOS), u64le granule position, u32le serial,
u32le sequence, u32le CRC, u8 segment count, lacing table; the page
body is the lacing sum. The first packet of a Vorbis stream starts
``\\x01vorbis`` (then u32le version, u8 channels, u32le rate); an
Opus stream starts ``OpusHead`` (u8 version, u8 channels, u16le
pre-skip, u32le input rate — output is ALWAYS 48 kHz).
"""

from __future__ import annotations

import struct


def parse_ogg(content: bytes) -> dict:
    """Parse Ogg metadata → ``{"n_pages", "n_streams", "codec",
    "sample_rate", "channels", "duration_ms", "pre_skip"}``.

    ``codec``/``sample_rate``/``channels``/``duration_ms`` describe
    the PRIMARY (first-BOS) stream; an unrecognized first packet
    yields codec ``'unknown'`` with None rate/channels/duration.
    Vorbis duration is ``granule * 1000 // rate``; Opus duration is
    ``(granule - pre_skip) * 1000 // 48000`` (RFC 7845 §4.1, clamped
    at zero). Raises ValueError on junk, a bad page version, or any
    truncated page structure."""
    if len(content) < 4 or content[:4] != b"OggS":
        raise ValueError("not an Ogg stream (missing OggS capture)")
    pos = 0
    n_pages = 0
    bos_serials: list[int] = []
    primary_serial: int | None = None
    primary_first_packet: bytes | None = None
    primary_last_granule: int | None = None
    while pos < len(content):
        if content[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at offset {pos}")
        if pos + 27 > len(content):
            raise ValueError("truncated Ogg page header")
        version = content[pos + 4]
        if version != 0:
            raise ValueError(f"unknown Ogg page version {version}")
        htype = content[pos + 5]
        granule = struct.unpack_from("<q", content, pos + 6)[0]
        serial = struct.unpack_from("<I", content, pos + 14)[0]
        nseg = content[pos + 26]
        lacing_end = pos + 27 + nseg
        if lacing_end > len(content):
            raise ValueError("truncated Ogg lacing table")
        body_len = sum(content[pos + 27 : lacing_end])
        body_end = lacing_end + body_len
        if body_end > len(content):
            raise ValueError("truncated Ogg page body")
        n_pages += 1
        if htype & 0x02:  # BOS
            bos_serials.append(serial)
            if primary_serial is None:
                primary_serial = serial
                # first packet = first lacing run (bounded by this page)
                first_len = 0
                for lace in content[pos + 27 : lacing_end]:
                    first_len += lace
                    if lace < 255:
                        break
                primary_first_packet = content[
                    lacing_end : lacing_end + first_len
                ]
        if serial == primary_serial and granule >= 0:
            primary_last_granule = granule
        pos = body_end

    codec = "unknown"
    rate = channels = pre_skip = None
    p = primary_first_packet or b""
    if p[:7] == b"\x01vorbis":
        if len(p) < 16:
            raise ValueError("truncated Vorbis identification header")
        codec = "vorbis"
        channels = p[11]
        rate = struct.unpack_from("<I", p, 12)[0]
        if rate == 0:
            raise ValueError("Vorbis identification header rate is zero")
        pre_skip = 0
    elif p[:8] == b"OpusHead":
        if len(p) < 19:
            raise ValueError("truncated OpusHead")
        codec = "opus"
        channels = p[9]
        pre_skip = struct.unpack_from("<H", p, 10)[0]
        rate = 48000  # Opus output is always 48 kHz (input rate is advisory)
    elif p[:7] == b"\x80theora":
        codec = "theora"

    duration_ms = None
    if rate and primary_last_granule is not None:
        samples = primary_last_granule - (pre_skip or 0)
        duration_ms = max(samples, 0) * 1000 // rate
    return {
        "n_pages": n_pages,
        "n_streams": len(bos_serials),
        "codec": codec,
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": duration_ms,
        "pre_skip": pre_skip,
    }


def _page(
    serial: int, seq: int, granule: int, packets: list[bytes], htype: int = 0
) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pk in packets:
        q, r = divmod(len(pk), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pk
    return (
        b"OggS\x00"
        + bytes([htype])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # CRC (not verified by the census walk)
        + bytes([len(lacing)])
        + bytes(lacing)
        + bytes(body)
    )


def build_ogg(
    codec: str,
    last_granule: int,
    sample_rate: int = 44100,
    channels: int = 2,
    pre_skip: int = 0,
    n_audio_pages: int = 1,
    extra_streams: int = 0,
) -> bytes:
    """Fixture generator: a BOS page carrying the codec ID header
    ('vorbis' / 'opus' / 'unknown'), ``n_audio_pages`` data pages with
    granules stepping up to ``last_granule`` (EOS on the last), plus
    ``extra_streams`` secondary one-page BOS streams (stream-count
    census). Packet payloads are skeletal — never decoded."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<I", 0)
            + bytes([channels])
            + struct.pack("<I", sample_rate)
            + b"\x00" * 16
        )
    elif codec == "opus":
        ident = (
            b"OpusHead\x01"
            + bytes([channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)  # advisory input rate
            + b"\x00\x00\x00"
        )
    elif codec == "unknown":
        ident = b"\x7ffixture-codec"
    else:
        raise ValueError(f"unknown fixture codec {codec!r}")
    out = _page(7, 0, 0, [ident], htype=0x02)
    for s in range(extra_streams):
        out += _page(100 + s, 0, 0, [b"\x03secondary"], htype=0x02)
    for i in range(n_audio_pages):
        granule = last_granule * (i + 1) // n_audio_pages
        htype = 0x04 if i == n_audio_pages - 1 else 0
        out += _page(7, 1 + i, granule, [b"\x00" * 20], htype=htype)
    return out
