"""Dependency-free WARC 1.0/1.1 reader (ISO 28500) for crawl-archive
binary columns — THE ingest format of LLM training-data pipelines
(Common Crawl ships WARC; WET/WAT are derived views). Additive vs the
reference, which has no crawl-archive route.

* :func:`parse_warc` — iterate the records of a WARC file: plain
  concatenated records OR the standard ``.warc.gz`` form (one gzip
  MEMBER per record, detected by the 1f 8b magic and walked with
  ``zlib`` ``unused_data`` — a whole-file gunzip would work too, but
  member-at-a-time is the streamable shape real readers use). Each
  record yields its headers dict + raw payload ``bytes``; ``response``
  records with an ``application/http`` content type additionally split
  the HTTP status line / headers from the body.
* :func:`build_warc` — fixture generator: serialize (headers, payload)
  pairs into spec-shaped records (CRLF header block, Content-Length,
  double-CRLF record terminator), optionally per-record-gzipped.

The parser is strict about structure (ValueError on a bad version line,
missing Content-Length, or a truncated payload) and tolerant about
content (unknown header fields ride along verbatim) — the dead-letter
discipline expects callers to catch per-row.
"""

from __future__ import annotations

import functools
import zlib


def _gzip_members(content: bytes):
    """Yield (decompressed member, compressed offset, compressed length)
    triples (RFC 1952 allows concatenation — WARC.gz uses one gzip
    member per record; the offsets are what a CDX index records)."""
    pos = 0
    while pos < len(content):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(content[pos:])
        except zlib.error as e:  # corrupt member: keep the ValueError contract
            raise ValueError(f"WARC: bad gzip member ({e})") from e
        if not d.eof:
            raise ValueError("WARC: truncated gzip member")
        consumed = len(content) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("WARC: gzip member made no progress")
        yield out, pos, consumed
        pos += consumed


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing (RFC 9112 §7.1): hex
    size line (chunk extensions after ';' ignored) + data + CRLF,
    terminated by a zero-size chunk; trailer fields after the last
    chunk are ignored. Strict — malformed framing raises ValueError."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("chunked: missing size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            n = int(size_tok, 16)
        except ValueError:
            raise ValueError(
                f"chunked: bad size line {size_tok!r}"
            ) from None
        if n == 0:
            return bytes(out)
        start = eol + 2
        chunk = body[start : start + n]
        if len(chunk) < n:
            raise ValueError("chunked: truncated chunk")
        out += chunk
        if body[start + n : start + n + 2] != b"\r\n":
            raise ValueError("chunked: missing chunk terminator")
        pos = start + n + 2


@functools.lru_cache(maxsize=None)
def _optional_decoder(coding: str):
    """Guarded optional-dependency hook (the PIL-hook discipline) for
    content codings whose codecs aren't in this container: ``br``
    (brotli / brotlicffi) and ``zstd`` (stdlib ``compression.zstd`` on
    3.14+, else the zstandard package). Returns a bytes->bytes
    decompressor or None (memoized — decode_http_body runs per WARC
    record inside mapInPandas, and an uncached failed import probe per
    br record would re-scan the path finder millions of times); absence
    keeps the flagged-raw dead-letter
    contract, presence upgrades those rows to decoded — ~half of
    compressed HTTP on the modern web is br, so a deployment that
    installs the codec recovers that mass with no code change."""
    if coding == "br":
        for mod in ("brotli", "brotlicffi"):
            try:
                m = __import__(mod)
                return m.decompress
            except ImportError:
                continue
        return None
    if coding == "zstd":
        try:
            from compression import zstd as _zstd  # Python 3.14+

            return _zstd.decompress
        except ImportError:
            pass
        try:
            import zstandard as _zstandard

            return lambda b: _zstandard.ZstdDecompressor().decompress(b)
        except ImportError:
            return None
    return None


def decode_http_body(body: bytes, http_headers: dict[str, str]) -> tuple[bytes, bool]:
    """(decoded message body, ok) per the response's OWN framing headers
    (lowercase-keyed dict): ``Transfer-Encoding: chunked`` is undone
    first (WARC captures the raw wire bytes, chunk framing included),
    then ``Content-Encoding`` gzip/x-gzip/deflate decompress (deflate
    tries zlib-wrapped then raw per the real-world split); ``br`` and
    ``zstd`` decode through :func:`_optional_decoder` when the codec
    is installed. Codings without a live codec (br/zstd hook absent,
    compress) and any decode failure return the RAW bytes with
    ok = False — the countable dead-letter contract: the downstream
    extractor will dead-letter the undecoded bytes, and the flag says
    WHY."""
    import gzip as _gzip

    try:
        te = http_headers.get("transfer-encoding", "").lower()
        if te:
            codings = [t.strip() for t in te.split(",") if t.strip()]
            if codings == ["chunked"]:
                body = _dechunk(body)
            elif codings and codings != ["identity"]:
                return body, False  # stacked/unknown transfer codings
        ce = http_headers.get("content-encoding", "identity").lower().strip()
        if ce in ("gzip", "x-gzip"):
            body = _gzip.decompress(body)
        elif ce == "deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:
                body = zlib.decompress(body, wbits=-15)  # raw-deflate servers
        elif ce in ("br", "zstd"):
            dec = _optional_decoder(ce)
            if dec is None:
                return body, False  # codec not installed: flagged raw
            body = dec(body)
        elif ce not in ("identity", ""):
            return body, False  # compress etc.: guarded out of scope
        return body, True
    except Exception:
        return body, False


def _parse_one(buf: bytes, pos: int) -> tuple[dict, int]:
    """Parse one record at ``pos`` → (record dict, next position)."""
    head_end = buf.find(b"\r\n\r\n", pos)
    if head_end < 0:
        raise ValueError("WARC: unterminated header block")
    lines = buf[pos:head_end].split(b"\r\n")
    version = lines[0].decode("ascii", "replace")
    if not version.startswith("WARC/"):
        raise ValueError(f"WARC: bad version line {version!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        headers[k.decode("ascii", "replace").strip()] = v.decode(
            "utf-8", "replace"
        ).strip()
    if "Content-Length" not in headers:
        raise ValueError("WARC: record missing Content-Length")
    try:
        n = int(headers["Content-Length"])
    except ValueError:
        raise ValueError(
            f"WARC: non-numeric Content-Length {headers['Content-Length']!r}"
        ) from None
    if n < 0:
        # A negative length would make the truncation check pass vacuously
        # and next_pos move BACKWARD (the bytes before `pos` are the prior
        # record's CRLFCRLF), re-parsing the same record forever — a hang,
        # which the dead-letter discipline (exceptions) cannot catch.
        raise ValueError(f"WARC: negative Content-Length {n}")
    body_start = head_end + 4
    payload = buf[body_start : body_start + n]
    if len(payload) < n:
        raise ValueError("WARC: truncated payload")
    rec = {"version": version, "headers": headers, "payload": payload}
    if headers.get("Content-Type", "").startswith("application/http"):
        split = payload.find(b"\r\n\r\n")
        if split >= 0:
            http_head = payload[:split].split(b"\r\n")
            status_line = http_head[0].decode("ascii", "replace")
            parts = status_line.split(" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                rec["http_status"] = int(parts[1])
            hh: dict[str, str] = {}
            for line in http_head[1:]:
                k, sep, v = line.partition(b":")
                if sep:
                    name = k.strip().lower().decode("ascii", "replace")
                    # first header wins (RFC 9110 singleton semantics)
                    hh.setdefault(
                        name, v.decode("utf-8", "replace").strip()
                    )
            if "content-type" in hh:
                rec["http_content_type"] = hh["content-type"]
            if "location" in hh:
                # Location is a singleton header (RFC 9110 §10.2.2) and may
                # be a RELATIVE reference — resolution against the capture
                # URI happens downstream (operators.crawl.resolve_redirects).
                rec["http_location"] = hh["location"]
            # request-side identity headers (msgtype=request records;
            # harmless NULLs on responses) — what pair_requests joins
            # onto the response via WARC-Concurrent-To
            if "user-agent" in hh:
                rec["http_user_agent"] = hh["user-agent"]
            if "referer" in hh:
                rec["http_referer"] = hh["referer"]
            body, ok = decode_http_body(payload[split + 4 :], hh)
            rec["http_body"] = body
            rec["http_body_ok"] = ok
    # the record terminator (two CRLFs) follows the payload
    term = buf[body_start + n : body_start + n + 4]
    if term[:4] != b"\r\n\r\n":
        raise ValueError("WARC: record missing terminating CRLFCRLF")
    return rec, body_start + n + 4


def parse_warc(content: bytes) -> list[dict]:
    """All records of a WARC file (plain or per-record-gzip); see module
    docstring for the record dict shape.

    Every record carries ``rec_offset``/``rec_length``: the byte span a
    range request needs to fetch EXACTLY this record from the archive —
    the CDX index contract. For a plain WARC that is the record's own
    span; for ``.warc.gz`` it is the span of the COMPRESSED gzip member
    holding the record (Common Crawl's convention: range-fetch the
    member, gunzip, parse), shared by every record in that member."""
    records: list[dict] = []
    if content[:2] == b"\x1f\x8b":
        for member, moff, mlen in _gzip_members(content):
            pos = 0
            while pos < len(member):
                rec, nxt = _parse_one(member, pos)
                if nxt <= pos:  # structural invariant: records can't be empty
                    raise ValueError("WARC: record made no progress")
                pos = nxt
                rec["rec_offset"] = moff
                rec["rec_length"] = mlen
                records.append(rec)
        return records
    pos = 0
    while pos < len(content):
        rec, nxt = _parse_one(content, pos)
        if nxt <= pos:
            raise ValueError("WARC: record made no progress")
        rec["rec_offset"] = pos
        rec["rec_length"] = nxt - pos
        pos = nxt
        records.append(rec)
    return records


def build_warc(
    records: list[tuple[dict, bytes]], gzip_members: bool = False
) -> bytes:
    """Fixture generator: (headers, payload) pairs → WARC bytes. Adds
    Content-Length; ``gzip_members`` emits the standard .warc.gz form
    (one gzip member per record)."""
    out = bytearray()
    for headers, payload in records:
        head = bytearray(b"WARC/1.0\r\n")
        for k, v in headers.items():
            head += f"{k}: {v}\r\n".encode()
        head += f"Content-Length: {len(payload)}\r\n".encode()
        rec = bytes(head) + b"\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)
