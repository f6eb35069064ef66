"""functions/feeds.py — RSS 2.0 / Atom parsing contract."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.feeds import (
    build_feed,
    parse_feed,
)

_ENTRIES = [
    {"link": "http://a.example/1?b=2&a=1", "title": "one & only",
     "published": "2024-01-01", "id": "id-1"},
    {"link": "http://a.example/2", "title": None, "published": None,
     "id": None},
]


def test_rss_roundtrip():
    r = parse_feed(build_feed(_ENTRIES, kind="rss", title="t & t"))
    assert r["kind"] == "rss" and r["title"] == "t & t"
    assert [e["link"] for e in r["entries"]] == [
        "http://a.example/1?b=2&a=1", "http://a.example/2",
    ]
    assert r["entries"][0]["title"] == "one & only"
    assert r["entries"][0]["published"] == "2024-01-01"
    assert r["entries"][0]["id"] == "id-1"
    assert r["entries"][1]["title"] is None
    assert r["entries"][1]["published"] is None


def test_atom_roundtrip_and_gzip():
    raw = build_feed(_ENTRIES, kind="atom", title="t")
    assert parse_feed(raw)["kind"] == "atom"
    gz = build_feed(_ENTRIES, kind="atom", title="t", gzipped=True)
    assert gz[:2] == b"\x1f\x8b"
    assert parse_feed(gz) == parse_feed(raw)
    # str input accepted
    assert parse_feed(raw.decode())["entries"] == parse_feed(raw)["entries"]


def test_atom_link_rel_rule():
    """First rel-less/alternate link wins; rel='self' etc. is only a
    fallback when nothing better exists."""
    feed = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
        '<link rel="self" href="http://a.example/self"/>'
        '<link rel="alternate" href="http://a.example/alt"/>'
        "</entry><entry>"
        '<link rel="enclosure" href="http://a.example/only"/>'
        "</entry><entry><title>linkless, skipped</title></entry></feed>"
    )
    r = parse_feed(feed)
    assert [e["link"] for e in r["entries"]] == [
        "http://a.example/alt", "http://a.example/only",
    ]


def test_atom_published_falls_back_to_updated():
    feed = (
        '<feed><entry><link href="http://x.example/"/>'
        "<updated>2024-02-03</updated></entry></feed>"
    )
    assert parse_feed(feed)["entries"][0]["published"] == "2024-02-03"


def test_rss_linkless_items_skipped_and_empty_feed():
    feed = (
        "<rss><channel><title>t</title>"
        "<item><title>no link</title></item></channel></rss>"
    )
    r = parse_feed(feed)
    assert r["entries"] == [] and r["title"] == "t"


def test_guards():
    with pytest.raises(ValueError, match="malformed XML"):
        parse_feed(b"not xml at all")
    with pytest.raises(ValueError, match="unexpected root"):
        parse_feed("<html><body>a page</body></html>")
    with pytest.raises(ValueError, match="channel"):
        parse_feed("<rss><item/></rss>")
    with pytest.raises(ValueError, match="kind"):
        build_feed([], kind="rdf")
    # truncated gzip member is a dead-letter ValueError, not a foreign
    # exception (EOFError/BadGzipFile are wrapped)
    gz = build_feed(_ENTRIES, gzipped=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_feed(gz[: len(gz) // 2])
    # unknown encoding in the XML declaration raises LookupError inside
    # ET.fromstring — wrapped into the same ValueError class (the r14
    # mutation-fuzz counterexample: one byte flips UTF-8 -> ATF-8)
    with pytest.raises(ValueError, match="malformed XML"):
        parse_feed(b'<?xml version="1.0" encoding="ATF-8"?><rss/>')


@settings(max_examples=150, deadline=None)
@given(
    mutations=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 255)),
        min_size=1,
        max_size=6,
    ),
)
def test_mutation_contract(mutations):
    """Byte-mutated feeds parse or raise ValueError/OSError (gzip) —
    never anything else (the codec fuzz discipline)."""
    base = bytearray(build_feed(_ENTRIES, kind="rss"))
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_feed(bytes(base))
        assert isinstance(r, dict)
    except (ValueError, OSError):
        pass
