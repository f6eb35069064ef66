"""WARC reader tests (functions/warc.py, sources.warc_records): plain +
per-record-gzip roundtrips, HTTP split, structural error paths, and the
dead-letter operator row."""

import pytest

from data_engineering_assignment_spark.functions.warc import (
    build_warc,
    parse_warc,
)

RECS = [
    (
        {"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:1>"},
        b"software: graft\r\n",
    ),
    (
        {
            "WARC-Type": "request",
            "WARC-Target-URI": "http://x.test/a",
            "Content-Type": "application/http;msgtype=request",
        },
        b"GET /a HTTP/1.1\r\nHost: x.test\r\n\r\n",
    ),
    (
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "http://x.test/a",
            "Content-Type": "application/http;msgtype=response",
        },
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello world",
    ),
]


def test_warc_roundtrip_plain_and_gzip():
    for gz in (False, True):
        got = parse_warc(build_warc(RECS, gzip_members=gz))
        assert [r["headers"]["WARC-Type"] for r in got] == [
            "warcinfo",
            "request",
            "response",
        ]
        assert got[1]["headers"]["WARC-Target-URI"] == "http://x.test/a"
        assert got[2]["http_status"] == 200
        assert got[2]["http_body"] == b"hello world"
        assert got[0]["payload"] == b"software: graft\r\n"
        # payloads are length-framed: binary content with CRLFs inside
        # must not confuse the walk
    tricky = [({"WARC-Type": "resource"}, b"\r\n\r\nWARC/1.0\r\n\r\n\r\nraw")]
    got = parse_warc(build_warc(tricky))
    assert len(got) == 1 and got[0]["payload"].endswith(b"raw")


def test_warc_error_paths():
    blob = build_warc(RECS)
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="truncated payload"):
        parse_warc(blob[:-30])
    # strip a Content-Length header
    bad = blob.replace(b"Content-Length: 17\r\n", b"", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(bad)
    # truncated gzip member
    gz = build_warc(RECS, gzip_members=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(gz[: len(gz) // 2])


def test_warc_records_operator_dead_letter(spark):
    from data_engineering_assignment_spark.sources import warc_records

    good = build_warc(RECS, gzip_members=True)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\x1f\x8b broken"))],
        "archive_id long, content binary",
    )
    rows = warc_records(df).collect()
    ok = [r for r in rows if r.parse_ok]
    bad = [r for r in rows if not r.parse_ok]
    assert len(ok) == 3 and len(bad) == 1 and bad[0].archive_id == 2
    by_type = {r.warc_type: r for r in ok}
    assert by_type["response"].http_status == 200
    assert by_type["response"].payload_len == len(RECS[2][1])
    assert by_type["request"].target_uri == "http://x.test/a"


def test_warc_corrupt_gzip_member_is_value_error():
    """A record whose gzip member is corrupt (not merely truncated) must
    raise the documented ValueError, not leak zlib.error."""
    gz = bytearray(build_warc(RECS, gzip_members=True))
    gz[20] ^= 0xFF  # flip a deflate byte inside the first member
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(bytes(gz))


def test_zip_members_operator(spark):
    """ZIP member explode: stored + deflate members with verified CRCs, a
    corrupt member flips only its own crc_ok, an unreadable archive
    survives as a parse_ok=false row."""
    import io
    import zipfile

    from data_engineering_assignment_spark.sources import zip_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", "x" * 100, zipfile.ZIP_DEFLATED)
        zf.writestr("b.bin", b"y" * 37, zipfile.ZIP_STORED)
        zf.writestr("dir/", b"")  # directories are skipped
    good = buf.getvalue()
    # corrupt b.bin's stored payload (flip a byte after its local header)
    at = good.find(b"y" * 37)
    corrupt = good[:at] + b"z" + good[at + 1 :]
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(corrupt)),
            (3, bytearray(b"PK\x03\x04 nope")),
        ],
        "archive_id long, content binary",
    )
    rows = zip_members(df).collect()
    by = {(r.archive_id, r.member): r for r in rows}
    assert by[(1, "a.txt")].size_uncompressed == 100
    assert by[(1, "a.txt")].method == "deflate" and by[(1, "a.txt")].crc_ok
    assert by[(1, "b.bin")].method == "stored" and by[(1, "b.bin")].crc_ok
    assert not by[(2, "b.bin")].crc_ok and by[(2, "a.txt")].crc_ok
    dead = [r for r in rows if not r.parse_ok]
    assert len(dead) == 1 and dead[0].archive_id == 3
    assert not any(r.member and r.member.endswith("/") for r in rows)


def test_warc_negative_content_length_raises_not_hangs():
    """Content-Length < 0 makes the truncation check pass vacuously and
    would move next_pos BACKWARD (re-parsing the same record forever) —
    the parser must raise the documented ValueError instead."""
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"Content-Length: -28\r\n\r\n" + b"\r\n\r\n"
    )
    with pytest.raises(ValueError, match="negative Content-Length"):
        parse_warc(rec)
    # non-numeric lengths get the same contract (not a bare int() error)
    rec2 = rec.replace(b"-28", b"zzz")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(rec2)


def test_zip_members_duplicate_names_crc_checked_per_member(spark):
    """Duplicate member names are legal in ZIP; a by-NAME read resolves to
    the first match, so the second member's CRC would never actually be
    verified. zip_members must read by ZipInfo and flag the corrupt
    SECOND member while the intact first stays crc_ok."""
    import io
    import warnings
    import zipfile

    from data_engineering_assignment_spark.sources import zip_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("same.txt", b"first-payload-00", zipfile.ZIP_STORED)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # zipfile warns on dup names
            zf.writestr("same.txt", b"second-payload-0", zipfile.ZIP_STORED)
    good = buf.getvalue()
    at = good.find(b"second-payload-0")
    corrupt = good[:at] + b"X" + good[at + 1 :]
    df = spark.createDataFrame(
        [(1, bytearray(corrupt))], "archive_id long, content binary"
    )
    rows = sorted(zip_members(df).collect(), key=lambda r: r.crc_ok)
    assert len(rows) == 2
    assert [r.member for r in rows] == ["same.txt", "same.txt"]
    assert [r.crc_ok for r in rows] == [False, True]


def test_parse_warc_fuzz_terminates_with_valueerror_or_result():
    """Property fuzz: arbitrary bytes must either parse or raise the
    documented ValueError — never another exception type and never a
    hang (the negative/backward Content-Length class)."""
    from hypothesis import given, settings, strategies as hst

    frags = hst.sampled_from(
        [b"WARC/1.0\r\n", b"Content-Length: ", b"-12", b"7", b"\r\n",
         b"\r\n\r\n", b"WARC-Type: response\r\n", b"x" * 9, b"\x1f\x8b",
         b"\x00", b": ", b"Content-Length: 4\r\n\r\nabcd\r\n\r\n"]
    )
    blobs = hst.lists(frags, max_size=24).map(b"".join)

    @settings(max_examples=300, deadline=None)
    @given(blobs)
    def run(blob):
        try:
            recs = parse_warc(blob)
        except ValueError:
            return
        assert isinstance(recs, list)

    run()


def test_http_content_type_extraction(spark):
    """warc_records exposes the HTTP response's OWN Content-Type header
    (first occurrence wins per RFC 9110; NULL when absent or for
    non-HTTP records) — distinct from the WARC envelope content_type."""
    from data_engineering_assignment_spark.functions.warc import build_warc
    from data_engineering_assignment_spark.sources import warc_records

    http_ct = {"Content-Type": "application/http;msgtype=response"}
    recs = [
        (
            {"WARC-Type": "response", **http_ct},
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"content-type: application/json\r\n\r\n<p>x</p>",
        ),
        (
            {"WARC-Type": "response", **http_ct},
            b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\nheaderless",
        ),
        ({"WARC-Type": "warcinfo"}, b"software: x\r\n"),
    ]
    df = spark.createDataFrame(
        [(1, bytearray(build_warc(recs)))], "archive_id long, content binary"
    )
    rows = {
        r.rec_idx: r.http_content_type for r in warc_records(df).collect()
    }
    assert rows == {
        0: "text/html; charset=utf-8",  # first wins, case-insensitive name
        1: None,
        2: None,
    }


def test_decode_http_body_framings():
    """Chunked de-framing, gzip/x-gzip, zlib-wrapped AND raw deflate,
    identity passthrough; unsupported/broken codings return the RAW
    bytes flagged false — never raise, never drop."""
    import gzip
    import zlib

    from data_engineering_assignment_spark.functions.warc import (
        _dechunk,
        decode_http_body,
    )

    body = b"<p>hello encoded world</p>"
    assert decode_http_body(body, {}) == (body, True)
    assert decode_http_body(
        gzip.compress(body, mtime=0), {"content-encoding": "gzip"}
    ) == (body, True)
    assert decode_http_body(
        gzip.compress(body, mtime=0), {"content-encoding": "x-gzip"}
    ) == (body, True)
    assert decode_http_body(
        zlib.compress(body), {"content-encoding": "deflate"}
    ) == (body, True)
    # raw-deflate servers (no zlib wrapper) — the real-world split
    raw = zlib.compressobj(wbits=-15)
    rawb = raw.compress(body) + raw.flush()
    assert decode_http_body(rawb, {"content-encoding": "deflate"}) == (
        body,
        True,
    )
    # chunked framing, with a chunk extension and a trailing header
    chunked = (
        b"5;ext=1\r\n<p>he\r\n" b"15\r\nllo encoded world</p>\r\n"
        b"0\r\nX-Trailer: t\r\n\r\n"
    )
    assert _dechunk(chunked) == body
    assert decode_http_body(
        chunked, {"transfer-encoding": "chunked"}
    ) == (body, True)
    # chunked THEN gzip (transfer framing outside content coding)
    cg = (
        b"a\r\n" + gzip.compress(body, mtime=0)[:10] + b"\r\n"
        + f"{len(gzip.compress(body, mtime=0)) - 10:x}".encode()
        + b"\r\n" + gzip.compress(body, mtime=0)[10:] + b"\r\n0\r\n\r\n"
    )
    assert decode_http_body(
        cg, {"transfer-encoding": "chunked", "content-encoding": "gzip"}
    ) == (body, True)
    # unsupported content coding: raw + False
    assert decode_http_body(b"\x8b\x02", {"content-encoding": "br"}) == (
        b"\x8b\x02",
        False,
    )
    # stacked transfer codings: raw + False
    assert decode_http_body(
        b"x", {"transfer-encoding": "gzip, chunked"}
    ) == (b"x", False)
    # corrupt gzip: raw + False, no raise
    assert decode_http_body(b"\x1f\x8bjunk", {"content-encoding": "gzip"}) == (
        b"\x1f\x8bjunk",
        False,
    )
    # malformed chunk framing: raw + False
    assert decode_http_body(
        b"zz\r\nnope", {"transfer-encoding": "chunked"}
    ) == (b"zz\r\nnope", False)


def test_decode_http_body_brotli_zstd_hook(monkeypatch):
    """br/zstd decode through the guarded optional-dependency hook (the
    PIL-hook discipline): codec absent -> flagged raw (the standing
    dead-letter contract, asserted above); codec present -> decoded
    with ok=True, and hook FAILURES still dead-letter. Proven by
    injecting a stand-in module whose decompress is zlib's."""
    import sys
    import types
    import zlib

    from data_engineering_assignment_spark.functions.warc import (
        decode_http_body,
    )

    from data_engineering_assignment_spark.functions.warc import (
        _optional_decoder,
    )

    body = b"<p>hello encoded world</p>"
    blob = zlib.compress(body)
    # hook absent (neither brotli nor brotlicffi in this container)
    _optional_decoder.cache_clear()
    assert decode_http_body(blob, {"content-encoding": "br"}) == (blob, False)
    fake = types.ModuleType("brotli")
    fake.decompress = zlib.decompress
    monkeypatch.setitem(sys.modules, "brotli", fake)
    _optional_decoder.cache_clear()  # the probe memoizes (hot parse path)
    assert decode_http_body(blob, {"content-encoding": "br"}) == (body, True)
    # a live hook that FAILS on the payload still dead-letters
    assert decode_http_body(b"junk", {"content-encoding": "br"}) == (
        b"junk",
        False,
    )
    fake_z = types.ModuleType("zstandard")

    class _Dec:
        def decompress(self, b):
            return zlib.decompress(b)

    fake_z.ZstdDecompressor = _Dec
    monkeypatch.setitem(sys.modules, "zstandard", fake_z)
    _optional_decoder.cache_clear()
    assert decode_http_body(blob, {"content-encoding": "zstd"}) == (
        body,
        True,
    )
    _optional_decoder.cache_clear()  # don't leak fakes to other tests


def test_record_spans_support_range_requests():
    """rec_offset/rec_length is the CDX range-request contract: slicing
    exactly that span out of the archive and re-parsing yields exactly
    that record — for plain WARCs (record's own bytes) AND .warc.gz
    (the compressed gzip member's bytes)."""
    from data_engineering_assignment_spark.functions.warc import (
        build_warc,
        parse_warc,
    )

    recs = [
        ({"WARC-Type": "warcinfo"}, b"software: graft\r\n"),
        (
            {"WARC-Type": "response", "WARC-Target-URI": "http://a/1"},
            b"HTTP/1.1 200 OK\r\n\r\nbody one",
        ),
        (
            {"WARC-Type": "response", "WARC-Target-URI": "http://a/2"},
            b"HTTP/1.1 404 NO\r\n\r\nbody two",
        ),
    ]
    for gz in (False, True):
        blob = build_warc(recs, gzip_members=gz)
        parsed = parse_warc(blob)
        assert len(parsed) == 3
        # spans tile the archive exactly, in order, no gaps
        pos = 0
        for r in parsed:
            assert r["rec_offset"] == pos
            pos += r["rec_length"]
        assert pos == len(blob)
        for r in parsed:
            sub = parse_warc(
                blob[r["rec_offset"] : r["rec_offset"] + r["rec_length"]]
            )
            assert len(sub) == 1
            assert sub[0]["headers"] == r["headers"]
            assert sub[0]["payload"] == r["payload"]


def test_surt_key(spark):
    from data_engineering_assignment_spark.operators.crawl import surt_key

    cases = [
        ("http://www.Example.com/p?a=1", "com,example,www)/p?a=1"),
        ("https://s3.example/q/1", "example,s3)/q/1"),
        ("http://host.example/", "example,host)/"),
        ("not a url", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r.k for r in df.select(surt_key("u").alias("k")).collect()]
    assert got == [want for _, want in cases]
