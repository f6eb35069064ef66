"""Dependency-free sitemap parser (sitemaps.org protocol 0.9) — the
crawl frontier's SEED source: a polite crawler discovers sitemaps from
robots.txt ``Sitemap:`` lines (RFC 9309 records them as extension
fields), fetches the XML, and enqueues the listed URLs. Additive vs the
reference, which has no crawl route.

* :func:`parse_sitemap` — one sitemap document (``<urlset>`` page lists
  or ``<sitemapindex>`` child-sitemap lists) → kind + entry dicts.
  Accepts ``bytes`` (gzip members sniffed by the 1f 8b magic — the
  common ``.xml.gz`` wire form) or ``str``. Strict about structure
  (malformed XML / wrong root raises — the dead-letter discipline
  expects callers to catch per-row), tolerant about content (unknown
  child elements ride along ignored, entries missing the mandatory
  ``<loc>`` are skipped).
* :func:`build_sitemap` — fixture generator for the oracle gates.

Namespace handling is by LOCAL NAME (the spec's namespace URI, a
default ``xmlns``, or none at all are all accepted): real-world
sitemaps are sloppy about the declaration and a reader that rejects an
undeclared namespace loses whole hosts.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
import zlib

_FIELDS = ("lastmod", "changefreq", "priority")


def _local(tag: str) -> str:
    """Local element name: '{ns}loc' -> 'loc' (namespace-agnostic)."""
    return tag.rpartition("}")[2]


def parse_sitemap(content: bytes | str) -> dict:
    """Parse one sitemap document → ``{"kind": "urlset"|"sitemapindex"|
    "textlist", "entries": [{"loc", "lastmod", "changefreq",
    "priority", "images", "videos"}, ...]}``. ``images`` is the Google
    image-extension loc list; ``videos`` the video-extension
    ``{"title", "duration"}`` dicts (duration in integer seconds, None
    when absent/non-integer) — both empty for sitemapindex/textlist.
    ``sitemapindex`` children carry the same dict
    shape (``lastmod`` only; the other fields stay None). Non-XML input
    is accepted as the spec's PLAIN-TEXT sitemap form — one
    fully-qualified URL per line, UTF-8 — but ONLY if every non-empty
    line starts with http(s)://, so junk bytes still dead-letter.
    Raises ValueError on malformed XML, a non-sitemap root element, or
    non-XML content that is not a clean URL list."""
    if isinstance(content, (bytes, bytearray)):
        data = bytes(content)
        if data[:2] == b"\x1f\x8b":
            try:
                data = gzip.decompress(data)
            except (OSError, EOFError, zlib.error) as e:
                # BadGzipFile is an OSError; corrupted-deflate is zlib.error
                raise ValueError(f"sitemap: bad gzip member ({e})") from e
    else:
        data = content.encode("utf-8")
    if not data.lstrip().startswith(b"<"):
        lines = [ln.strip() for ln in data.decode("utf-8").splitlines()]
        lines = [ln for ln in lines if ln]
        if lines and all(
            ln.startswith(("http://", "https://")) for ln in lines
        ):
            return {
                "kind": "textlist",
                "entries": [
                    {
                        "loc": ln,
                        **{k: None for k in _FIELDS},
                        "images": [],
                        "videos": [],
                    }
                    for ln in lines
                ],
            }
        raise ValueError("sitemap: neither XML nor a plain-text URL list")
    try:
        root = ET.fromstring(data)
    except (ET.ParseError, LookupError) as e:
        # LookupError: an unknown encoding name in the XML declaration
        # (crawled bytes) escapes ParseError — same contract, same class.
        raise ValueError(f"sitemap: malformed XML ({e})") from e
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"sitemap: unexpected root element {kind!r}")
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries: list[dict] = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        fields: dict[str, str] = {}
        images: list[str] = []
        videos: list[dict] = []
        for f in el:
            lname = _local(f.tag)
            if lname == "image":
                # Google image extension: <image:image><image:loc>
                iloc = next(
                    (
                        (c.text or "").strip()
                        for c in f
                        if _local(c.tag) == "loc" and (c.text or "").strip()
                    ),
                    None,
                )
                if iloc:
                    images.append(iloc)
                continue
            if lname == "video":
                # Google video extension: title + duration (seconds,
                # integer per spec; non-integer text rides along as
                # None — tolerant about content)
                sub: dict[str, str] = {}
                for c in f:
                    sub.setdefault(_local(c.tag), (c.text or "").strip())
                dur = sub.get("duration")
                videos.append(
                    {
                        "title": sub.get("title") or None,
                        "duration": (
                            int(dur) if dur and dur.isdigit() else None
                        ),
                    }
                )
                continue
            fields.setdefault(lname, (f.text or "").strip())
        loc = fields.get("loc")
        if not loc:
            continue  # <loc> is mandatory per spec; loc-less entries skip
        entries.append(
            {
                "loc": loc,
                **{k: fields.get(k) for k in _FIELDS},
                "images": images,
                "videos": videos,
            }
        )
    return {"kind": kind, "entries": entries}


def build_sitemap(
    entries: list[dict],
    kind: str = "urlset",
    gzipped: bool = False,
) -> bytes:
    """Fixture generator: entry dicts → spec-shaped sitemap XML bytes
    (namespace declared, fields in spec order, field text XML-escaped —
    query-string URLs carry ``&``, which unescaped would make the
    round-trip parse reject the whole document), optionally gzipped."""
    from xml.sax.saxutils import escape

    child_tag = "url" if kind == "urlset" else "sitemap"
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{kind} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
        ' xmlns:image="http://www.google.com/schemas/sitemap-image/1.1"'
        ' xmlns:video="http://www.google.com/schemas/sitemap-video/1.1">',
    ]
    for e in entries:
        lines.append(f"<{child_tag}>")
        lines.append(f"<loc>{escape(str(e['loc']))}</loc>")
        for k in _FIELDS:
            if e.get(k) is not None:
                lines.append(f"<{k}>{escape(str(e[k]))}</{k}>")
        for iloc in e.get("images") or []:
            lines.append(
                "<image:image><image:loc>"
                f"{escape(str(iloc))}</image:loc></image:image>"
            )
        for v in e.get("videos") or []:
            lines.append("<video:video>")
            if v.get("title") is not None:
                lines.append(
                    f"<video:title>{escape(str(v['title']))}</video:title>"
                )
            if v.get("duration") is not None:
                lines.append(
                    f"<video:duration>{v['duration']}</video:duration>"
                )
            lines.append("</video:video>")
        lines.append(f"</{child_tag}>")
    lines.append(f"</{kind}>")
    out = "\n".join(lines).encode("utf-8")
    return gzip.compress(out, 6) if gzipped else out
