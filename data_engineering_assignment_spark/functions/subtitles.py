"""Dependency-free SRT / WebVTT subtitle parsing — the transcript
side of the video census (mp4/fmp4 cover the containers; subtitle
tracks are how a video-training pipeline gets aligned text). Additive
vs the reference (no media-text route).

* :func:`parse_srt` — SubRip: numbered cues, ``HH:MM:SS,mmm -->
  HH:MM:SS,mmm`` timing lines, text until a blank line.
* :func:`parse_vtt` — WebVTT: mandatory ``WEBVTT`` header, optional
  cue identifiers, ``HH:MM:SS.mmm`` or ``MM:SS.mmm`` timings with
  optional cue settings after the end timestamp, NOTE/STYLE/REGION
  blocks skipped.
* :func:`build_srt` / :func:`build_vtt` — fixture twins.

Timing math is exact integer milliseconds (no float surface — the
oracle gates replay ``h*3600000 + m*60000 + s*1000 + ms``). Strict
about structure (a malformed timing line, a non-monotonic cue range,
or a missing WEBVTT header raises ValueError — the per-row
dead-letter discipline), tolerant about content (cue payload text is
arbitrary; markup/voice tags ride along verbatim; out-of-order cue
START times across cues are legal in both formats and ride along).
"""

from __future__ import annotations

import re

_SRT_TIME = re.compile(
    r"^(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*$"
)
# WebVTT allows omitting the hours field
_VTT_TIME = re.compile(
    r"^(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})(?:[ \t]+(?![ \t]).*)?$"
)


def _ms(h, m, s, ms) -> int:
    m, s = int(m), int(s)
    if m > 59 or s > 59:
        raise ValueError(f"subtitle: minutes/seconds out of range {m}:{s}")
    return (int(h or 0) * 3600 + m * 60 + s) * 1000 + int(ms)


def _cue(start: int, end: int, lines: list[str], idx) -> dict:
    if end < start:
        raise ValueError(
            f"subtitle: cue ends before it starts ({start} --> {end})"
        )
    return {
        "idx": idx,
        "start_ms": start,
        "end_ms": end,
        "text": "\n".join(lines).strip(),
    }


def parse_srt(content: str) -> dict:
    """Parse SubRip text → ``{"kind": "srt", "cues": [{"idx",
    "start_ms", "end_ms", "text"}, ...], "n_cues", "duration_ms"}``.
    ``duration_ms`` is the max cue end (0 for an empty file).
    Cue numbers pass through as ``idx`` (int; None when the numbering
    line is absent — common in the wild). Raises ValueError on a
    malformed timing line or a cue that ends before it starts."""
    cues: list[dict] = []
    block: list[str] = []
    for raw in content.split("\n") + [""]:
        line = raw.rstrip("\r").lstrip("﻿")
        if line.strip():
            block.append(line)
            continue
        if not block:
            continue
        idx = None
        rest = block
        if len(rest) >= 2 and rest[0].strip().isdigit():
            idx = int(rest[0])
            rest = rest[1:]
        m = _SRT_TIME.match(rest[0].strip()) if rest else None
        if m is None:
            raise ValueError(
                f"subtitle: malformed SRT timing line {rest[0]!r}"
                if rest
                else "subtitle: empty SRT cue block"
            )
        g = m.groups()
        cues.append(_cue(_ms(*g[:4]), _ms(*g[4:]), rest[1:], idx))
        block = []
    return {
        "kind": "srt",
        "cues": cues,
        "n_cues": len(cues),
        "duration_ms": max((c["end_ms"] for c in cues), default=0),
    }


def parse_vtt(content: str) -> dict:
    """Parse WebVTT text → the :func:`parse_srt` shape with
    ``kind = "vtt"`` (``idx`` is the optional cue identifier STRING).
    The ``WEBVTT`` header line is mandatory (junk text dead-letters);
    NOTE / STYLE / REGION blocks are skipped; cue settings after the
    end timestamp are ignored."""
    lines = [
        ln.rstrip("\r") for ln in content.lstrip("﻿").split("\n")
    ]
    if not lines or not lines[0].startswith("WEBVTT"):
        raise ValueError("subtitle: missing WEBVTT header")
    cues: list[dict] = []
    i = 1
    while i < len(lines):
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        if line.split(" ", 1)[0] in ("NOTE", "STYLE", "REGION"):
            while i < len(lines) and lines[i].strip():
                i += 1
            continue
        ident = None
        if "-->" not in line:
            ident = line
            i += 1
            if i >= len(lines):
                raise ValueError("subtitle: VTT identifier without a cue")
            line = lines[i].strip()
        m = _VTT_TIME.match(line)
        if m is None:
            raise ValueError(f"subtitle: malformed VTT timing line {line!r}")
        g = m.groups()
        i += 1
        text: list[str] = []
        while i < len(lines) and lines[i].strip():
            text.append(lines[i])
            i += 1
        cues.append(_cue(_ms(*g[:4]), _ms(*g[4:]), text, ident))
    return {
        "kind": "vtt",
        "cues": cues,
        "n_cues": len(cues),
        "duration_ms": max((c["end_ms"] for c in cues), default=0),
    }


def parse_subtitles(content: bytes | str) -> dict:
    """Sniffing front door: WEBVTT header → :func:`parse_vtt`, else
    :func:`parse_srt`. Bytes decode as UTF-8 (both specs mandate it);
    undecodable bytes raise ValueError (dead-letter)."""
    if isinstance(content, (bytes, bytearray)):
        try:
            content = bytes(content).decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"subtitle: not UTF-8 ({e})") from e
    if content.lstrip("﻿").startswith("WEBVTT"):
        return parse_vtt(content)
    return parse_srt(content)


def _fmt(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"


def build_srt(cues: list[dict]) -> str:
    """Fixture twin: cue dicts (start_ms/end_ms/text, optional idx) →
    SubRip text."""
    out = []
    for n, c in enumerate(cues, 1):
        # an explicit idx=None (what parse_srt returns for numberless
        # cues) falls back to sequential numbering — never a literal
        # 'None' line (review finding: the round-trip broke on it)
        idx = c.get("idx")
        out.append(str(n if idx is None else idx))
        out.append(
            f"{_fmt(c['start_ms'], ',')} --> {_fmt(c['end_ms'], ',')}"
        )
        out.append(str(c["text"]))
        out.append("")
    return "\n".join(out)


def build_vtt(cues: list[dict], note: str | None = None) -> str:
    """Fixture twin: cue dicts → WebVTT text (optional leading NOTE
    block; cue ids emitted when ``idx`` is set)."""
    out = ["WEBVTT", ""]
    if note is not None:
        out += [f"NOTE {note}", ""]
    for c in cues:
        if c.get("idx") is not None:
            out.append(str(c["idx"]))
        out.append(
            f"{_fmt(c['start_ms'], '.')} --> {_fmt(c['end_ms'], '.')}"
        )
        out.append(str(c["text"]))
        out.append("")
    return "\n".join(out)
