"""Dependency-free RSS 2.0 / Atom feed parser — the crawl frontier's
OTHER seed source beside sitemaps (functions/sitemaps.py): feeds are
how recency-sensitive crawls discover new URLs between sitemap
refreshes, and real frontiers enqueue both. Additive vs the reference
(no crawl route).

* :func:`parse_feed` — one feed document → kind + entry dicts. RSS 2.0
  (``<rss><channel><item>``: link/title/pubDate/guid) and Atom
  (``<feed><entry>``: the first ``<link>`` whose ``rel`` is absent or
  ``alternate``, title/published-or-updated/id). Strict about
  structure (malformed XML / a non-feed root raises — per-row
  dead-letter discipline), tolerant about content (unknown children
  ride along ignored; entries with no usable link are skipped, the
  sitemap loc-less rule). Bytes input sniffs gzip by magic.
* :func:`build_feed` — fixture generator for the oracle gates.

Namespace handling is by LOCAL NAME, the sitemap parser's rule — real
feeds are as sloppy about ``xmlns`` as real sitemaps.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
import zlib


def _local(tag: str) -> str:
    return tag.rpartition("}")[2]


def _atom_link(entry) -> str | None:
    fallback = None
    for el in entry:
        if _local(el.tag) != "link":
            continue
        rel = el.get("rel")
        href = el.get("href")
        if not href:
            continue
        if rel in (None, "alternate"):
            return href
        if fallback is None:
            fallback = href
    return fallback


def parse_feed(content: bytes | str) -> dict:
    """Parse one feed document → ``{"kind": "rss"|"atom", "title",
    "entries": [{"link", "title", "published", "id"}, ...]}``.
    ``published`` passes through verbatim (pubDate for RSS, published
    falling back to updated for Atom) — date PARSING is the caller's
    concern; a metadata walk that reinterprets strings invents wrong
    answers. Raises ValueError on malformed XML or a non-feed root."""
    if isinstance(content, (bytes, bytearray)):
        data = bytes(content)
        if data[:2] == b"\x1f\x8b":
            try:
                data = gzip.decompress(data)
            except (OSError, EOFError, zlib.error) as e:
                # BadGzipFile is an OSError; corrupted-deflate is zlib.error
                raise ValueError(f"feed: bad gzip member ({e})") from e
    else:
        data = content.encode("utf-8")
    try:
        root = ET.fromstring(data)
    except (ET.ParseError, LookupError) as e:
        # LookupError: an XML declaration naming an unknown encoding
        # (one mutated byte in encoding="UTF-8") escapes ParseError.
        raise ValueError(f"feed: malformed XML ({e})") from e
    kind = _local(root.tag)
    entries: list[dict] = []
    if kind == "rss":
        channel = next(
            (el for el in root if _local(el.tag) == "channel"), None
        )
        if channel is None:
            raise ValueError("feed: rss without a channel element")
        fields = {
            _local(el.tag): (el.text or "").strip() for el in channel
        }
        title = fields.get("title")
        for item in channel:
            if _local(item.tag) != "item":
                continue
            f = {_local(el.tag): (el.text or "").strip() for el in item}
            link = f.get("link")
            if not link:
                continue
            entries.append(
                {
                    "link": link,
                    "title": f.get("title"),
                    "published": f.get("pubDate") or None,
                    "id": f.get("guid") or None,
                }
            )
        return {"kind": "rss", "title": title, "entries": entries}
    if kind == "feed":
        title = next(
            (
                (el.text or "").strip()
                for el in root
                if _local(el.tag) == "title"
            ),
            None,
        )
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            link = _atom_link(entry)
            if not link:
                continue
            f = {_local(el.tag): (el.text or "").strip() for el in entry}
            entries.append(
                {
                    "link": link,
                    "title": f.get("title"),
                    "published": f.get("published") or f.get("updated") or None,
                    "id": f.get("id") or None,
                }
            )
        return {"kind": "atom", "title": title, "entries": entries}
    raise ValueError(f"feed: unexpected root element {kind!r}")


def build_feed(
    entries: list[dict],
    kind: str = "rss",
    title: str = "fixture feed",
    gzipped: bool = False,
) -> bytes:
    """Fixture generator: entry dicts (link/title/published/id) →
    spec-shaped feed XML bytes, field text XML-escaped (query-string
    links carry ``&``), optionally gzipped."""
    from xml.sax.saxutils import escape, quoteattr

    lines = ['<?xml version="1.0" encoding="UTF-8"?>']
    if kind == "rss":
        lines += ["<rss version=\"2.0\">", "<channel>",
                  f"<title>{escape(title)}</title>"]
        for e in entries:
            lines.append("<item>")
            lines.append(f"<link>{escape(str(e['link']))}</link>")
            if e.get("title") is not None:
                lines.append(f"<title>{escape(str(e['title']))}</title>")
            if e.get("published") is not None:
                lines.append(
                    f"<pubDate>{escape(str(e['published']))}</pubDate>"
                )
            if e.get("id") is not None:
                lines.append(f"<guid>{escape(str(e['id']))}</guid>")
            lines.append("</item>")
        lines += ["</channel>", "</rss>"]
    elif kind == "atom":
        lines += ['<feed xmlns="http://www.w3.org/2005/Atom">',
                  f"<title>{escape(title)}</title>"]
        for e in entries:
            lines.append("<entry>")
            lines.append(f"<link href={quoteattr(str(e['link']))}/>")
            if e.get("title") is not None:
                lines.append(f"<title>{escape(str(e['title']))}</title>")
            if e.get("published") is not None:
                lines.append(
                    f"<published>{escape(str(e['published']))}</published>"
                )
            if e.get("id") is not None:
                lines.append(f"<id>{escape(str(e['id']))}</id>")
            lines.append("</entry>")
        lines.append("</feed>")
    else:
        raise ValueError(f"unknown feed kind {kind!r}")
    out = "\n".join(lines).encode("utf-8")
    return gzip.compress(out, 6) if gzipped else out
