"""Dependency-free PDF text extraction — the second document-ingest
surface of the crawl pipeline after HTML (real crawl archives carry
``application/pdf`` payloads; before this module those rows dead-lettered
out of the corpus at ``operators.crawl.html_extract``). Additive vs the
reference (no crawl/document route; Assignment-python.py stops at image
color analytics).

Scope follows the repo's codec-gate discipline (the JPEG/TIFF model):
the structurally honest subset is implemented completely and exactly —
classic (non-object-stream) PDFs whose content streams are plain or
FlateDecode — and everything outside it raises a GUARDED error that the
operator layer converts to a dead-letter row, never a wrong answer:

* encrypted documents (``/Encrypt`` in a trailer) raise;
* content-stream filters other than ``/FlateDecode`` raise (DCTDecode,
  LZW, ASCII85, ...), as do ``/DecodeParms`` predictors;
* cross-reference STREAMS (PDF 1.5 ``/Type /ObjStm`` compressed
  objects) raise — the page tree would be invisible to a byte scanner.

Parsing is xref-INDEPENDENT by design: objects are discovered by
scanning ``N G obj ... endobj`` spans (the repair path every real PDF
reader has, and the only honest one for crawled files whose xref tables
are routinely truncated or wrong; when the same object id appears more
than once — incremental updates — the LAST definition wins, matching
xref-table shadowing semantics).

Deterministic text contract (what a closed-form fixture oracle can
re-derive; the functions/html.py discipline):

* pages in page-TREE order (depth-first ``/Kids`` walk from the
  catalog), never file-byte order;
* within a content stream, the text-showing operators ``Tj`` ``'``
  ``"`` ``TJ`` append to the current line (``TJ`` kerning numbers are
  ignored); a new LINE starts at ``BT``, ``T*``, ``'``, ``"``, ``Tm``,
  and ``Td``/``TD`` with a non-zero ty operand (a tx-only ``Td`` is a
  horizontal kern and continues the line);
* literal strings decode the spec escapes (\\n \\r \\t \\b \\f \\( \\)
  \\\\, octal ``\\ddd``, backslash-EOL continuation; raw EOLs normalize
  to \\n), hex strings ``<...>`` pad an odd final digit with 0; string
  BYTES decode as Latin-1 (fixtures stay in that range — full
  ToUnicode/CMap handling is out of scope and documented here);
* empty lines vanish; lines join with \\n; pages join with \\n. Unlike
  the HTML extractor, whitespace is NOT collapsed — PDF text is
  explicit, every byte was placed deliberately.
"""

from __future__ import annotations

import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# ---------------------------------------------------------------------------
# builder (fixtures + tests; the build_warc twin)
# ---------------------------------------------------------------------------


def _escape_literal(s: str) -> bytes:
    out = s.encode("latin-1")
    return (
        out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def _content_stream(
    lines: list[str], tj_split: bool = False, hex_strings: bool = False
) -> bytes:
    """One page's content stream: one text line per Td line advance.
    ``tj_split`` shows each line as a TJ array split mid-string with a
    kerning number (same extracted text, different bytes); ``hex_strings``
    shows lines as hex strings (same text, different bytes)."""
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        if hex_strings:
            ops.append(b"<" + line.encode("latin-1").hex().encode() + b"> Tj")
        elif tj_split and len(line) > 2:
            a, b = line[: len(line) // 2], line[len(line) // 2 :]
            ops.append(
                b"[(" + _escape_literal(a) + b") -20 ("
                + _escape_literal(b) + b")] TJ"
            )
        else:
            ops.append(b"(" + _escape_literal(line) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def build_pdf(
    pages: list[list[str]],
    flate: bool = True,
    tj_split: bool = False,
    hex_strings: bool = False,
    nested_kids: bool = False,
) -> bytes:
    """Serialize text pages into a complete, standards-valid PDF 1.4
    (header, catalog, page tree, per-page FlateDecode-or-plain content
    streams, xref table, trailer) — the fixture writer for the extraction
    gates, exactly like ``functions.warc.build_warc`` is for WARC.
    ``nested_kids`` routes pages through an intermediate ``/Pages`` node
    so the depth-first tree walk (not file order) is what the oracle
    pins."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_id = 3 + 2 * n_pages + (1 if nested_kids else 0)
    page_ids = []
    content_ids = []
    next_id = 4 if nested_kids else 3
    inner_pages_id = 3 if nested_kids else None
    for _ in pages:
        page_ids.append(next_id)
        content_ids.append(next_id + 1)
        next_id += 2

    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    if nested_kids and n_pages > 1:
        # catalog -> 2 (root Pages) -> [3 (inner Pages with all but the
        # last page), last page] ; file order stays ascending object id
        inner = b" ".join(b"%d 0 R" % p for p in page_ids[:-1])
        objs[2] = (
            b"<< /Type /Pages /Kids [3 0 R %d 0 R] /Count %d >>"
            % (page_ids[-1], n_pages)
        )
        objs[3] = (
            b"<< /Type /Pages /Parent 2 0 R /Kids [%s] /Count %d >>"
            % (inner, n_pages - 1)
        )
        parent_of = {
            p: (3 if i < n_pages - 1 else 2) for i, p in enumerate(page_ids)
        }
    else:
        kids = b" ".join(b"%d 0 R" % p for p in page_ids)
        objs[2] = (
            b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
        )
        if nested_kids:  # single page: keep the object numbering stable
            objs[3] = b"<< /Type /Pages /Kids [] /Count 0 >>"
        parent_of = {p: 2 for p in page_ids}

    for (pid, cid, lines) in zip(page_ids, content_ids, pages):
        raw = _content_stream(lines, tj_split=tj_split, hex_strings=hex_strings)
        if flate:
            data = zlib.compress(raw)
            filt = b" /Filter /FlateDecode"
        else:
            data, filt = raw, b""
        objs[pid] = (
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (parent_of[pid], font_id, cid)
        )
        # indirect /Length on every other content stream: the resolver
        # path (length lives in its own object) is exercised structurally
        if cid % 2 == 0:
            objs[cid] = (
                b"<< /Length %d 0 R%s >>\nstream\n" % (font_id + 1 + cid, filt)
                + data
                + b"\nendstream"
            )
            objs[font_id + 1 + cid] = b"%d" % len(data)
        else:
            objs[cid] = (
                b"<< /Length %d%s >>\nstream\n" % (len(data), filt)
                + data
                + b"\nendstream"
            )
    objs[font_id] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += b"%d 0 obj\n" % oid + objs[oid] + b"\nendobj\n"
    xref_at = len(out)
    max_id = max(objs)
    out += b"xref\n0 %d\n" % (max_id + 1)
    out += b"0000000000 65535 f \n"
    for oid in range(1, max_id + 1):
        if oid in offsets:
            out += b"%010d 00000 n \n" % offsets[oid]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_id + 1, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# object-level parsing (xref-independent scan)
# ---------------------------------------------------------------------------


class _Lexer:
    """Tokenizer for PDF object syntax (shared by the document scanner
    and the content-stream text extractor)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def next_token(self):
        """-> (kind, value) with kind in {'name','num','str','dict_open',
        'dict_close','arr_open','arr_close','kw'} or None at EOF."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            self.pos += 2
            return ("dict_open", None)
        if d.startswith(b">>", self.pos):
            self.pos += 2
            return ("dict_close", None)
        if c == 0x5B:  # [
            self.pos += 1
            return ("arr_open", None)
        if c == 0x5D:  # ]
            self.pos += 1
            return ("arr_close", None)
        if c == 0x2F:  # /name
            self.pos += 1
            start = self.pos
            while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
                self.pos += 1
            return ("name", d[start : self.pos].decode("latin-1"))
        if c == 0x28:  # ( literal string
            return ("str", self._literal_string())
        if c == 0x3C:  # < hex string (<<' handled above)
            return ("str", self._hex_string())
        if c in b"+-.0123456789":
            start = self.pos
            self.pos += 1
            while self.pos < n and d[self.pos] in b"+-.0123456789":
                self.pos += 1
            tok = d[start : self.pos]
            try:
                return ("num", float(tok))
            except ValueError:
                return ("kw", tok.decode("latin-1"))
        # keyword/operator run (obj, endobj, stream, R, true, Tj, ...)
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:  # lone delimiter we don't model: skip it
            self.pos += 1
            return self.next_token()
        return ("kw", d[start : self.pos].decode("latin-1"))

    def _literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        assert d[self.pos] == 0x28
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f",
                    }[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"01234567":  # octal, 1-3 digits
                    oct_digits = bytearray()
                    while (
                        len(oct_digits) < 3
                        and self.pos < n
                        and d[self.pos] in b"01234567"
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:  # unknown escape: the char stands for itself
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            elif c == 0x0D:  # raw EOL normalizes to \n
                out += b"\n"
                self.pos += 1
                if self.pos < n and d[self.pos] == 0x0A:
                    self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("unterminated literal string")

    def _hex_string(self) -> bytes:
        d, n = self.data, len(self.data)
        assert d[self.pos] == 0x3C
        self.pos += 1
        digits = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c == 0x3E:
                self.pos += 1
                if len(digits) % 2:
                    digits += b"0"
                return bytes.fromhex(digits.decode("ascii"))
            if c in b"0123456789abcdefABCDEF":
                digits.append(c)
            elif c not in _WS:
                raise ValueError("bad hex string")
            self.pos += 1
        raise ValueError("unterminated hex string")


def _parse_value(lex: _Lexer, tok=None):
    """Recursive-descent PDF value: dict/array/name/num/str/bool/null/ref.
    Refs come back as ('ref', n) after number-number-R lookahead."""
    if tok is None:
        tok = lex.next_token()
    if tok is None:
        raise ValueError("unexpected EOF in object")
    kind, val = tok
    if kind == "dict_open":
        d = {}
        while True:
            t = lex.next_token()
            if t is None:
                raise ValueError("unterminated dict")
            if t[0] == "dict_close":
                return d
            if t[0] != "name":
                raise ValueError("dict key is not a name")
            d[t[1]] = _parse_value(lex)
        # unreachable
    if kind == "arr_open":
        arr = []
        while True:
            t = lex.next_token()
            if t is None:
                raise ValueError("unterminated array")
            if t[0] == "arr_close":
                return arr
            arr.append(_parse_value(lex, t))
    if kind == "num":
        # number number R  -> indirect reference (backtrack otherwise)
        save = lex.pos
        t2 = lex.next_token()
        if t2 is not None and t2[0] == "num":
            t3 = lex.next_token()
            if t3 == ("kw", "R"):
                return ("ref", int(val))
        lex.pos = save
        return int(val) if float(val).is_integer() else val
    if kind == "kw":
        if val == "true":
            return True
        if val == "false":
            return False
        if val == "null":
            return None
        raise ValueError(f"unexpected keyword {val!r} in object")
    if kind in ("str", "name"):
        return val
    raise ValueError(f"unexpected token {kind} in object")


_OBJ_RE = re.compile(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream(\r\n|\n|\r)")


def _scan_objects(data: bytes) -> tuple[dict[int, object], dict[int, tuple]]:
    """Byte-scan every ``N G obj`` span -> ({obj_id: value},
    {obj_id: (dict, stream_start)}) with last-definition-wins shadowing
    (incremental updates). Stream payload extents resolve later (the
    /Length may itself be an indirect reference)."""
    values: dict[int, object] = {}
    streams: dict[int, tuple] = {}
    cursor = 0  # matches INSIDE a stream payload are not objects:
    # compressed bytes can contain 'N G obj' by accident, so the scan
    # skips to past each stream's endstream before matching again
    for m in _OBJ_RE.finditer(data):
        if m.start() < cursor:
            continue
        oid = int(m.group(1))
        lex = _Lexer(data, m.end())
        try:
            val = _parse_value(lex)
        except ValueError:
            continue  # a malformed object body; scanning continues
        values[oid] = val
        lex._skip_ws()
        sm = _STREAM_RE.match(data, lex.pos)
        if sm is not None:
            if not isinstance(val, dict):
                raise ValueError("stream without a dict")
            streams[oid] = (val, sm.end())
            end = data.find(b"endstream", sm.end())
            cursor = len(data) if end < 0 else end + len(b"endstream")
        else:
            cursor = lex.pos
    return values, streams


def _stream_bytes(
    oid: int, values: dict, streams: dict, data: bytes
) -> bytes:
    """One stream object's decoded payload (resolving indirect /Length,
    verifying 'endstream', applying /FlateDecode)."""
    sdict, start = streams[oid]
    length = sdict.get("Length")
    if isinstance(length, tuple) and length[0] == "ref":
        length = values.get(length[1])
    if not isinstance(length, int) or length < 0:
        raise ValueError("unresolvable stream /Length")
    raw = data[start : start + length]
    tail = data[start + length : start + length + 20]
    if b"endstream" not in tail.translate(None, bytes(_WS)):
        raise ValueError("stream /Length does not reach endstream")
    filt = sdict.get("Filter")
    if isinstance(filt, list):
        if len(filt) > 1:
            raise ValueError(f"unsupported filter chain {filt!r}")
        filt = filt[0] if filt else None
    if "DecodeParms" in sdict and sdict["DecodeParms"] is not None:
        raise NotImplementedError("PDF stream predictors not supported")
    if filt is None:
        return raw
    if filt == "FlateDecode":
        return zlib.decompress(raw)
    raise NotImplementedError(f"PDF stream filter {filt!r} not supported")


# ---------------------------------------------------------------------------
# page tree + text operators
# ---------------------------------------------------------------------------


def _resolve(v, values):
    return values.get(v[1]) if isinstance(v, tuple) and v and v[0] == "ref" else v


def _walk_pages(node_ref, values, visited) -> list[dict]:
    node = _resolve(node_ref, values)
    if not isinstance(node, dict):
        raise ValueError("page-tree node is not a dict")
    key = id(node) if not isinstance(node_ref, tuple) else node_ref[1]
    if key in visited:
        raise ValueError("cycle in page tree")
    visited.add(key)
    t = node.get("Type")
    if t == "Page":
        return [node]
    if t == "Pages" or "Kids" in node:
        out: list[dict] = []
        for kid in node.get("Kids") or []:
            out.extend(_walk_pages(kid, values, visited))
        return out
    raise ValueError(f"unexpected page-tree node type {t!r}")


def _page_text(content: bytes) -> str:
    """Apply the module's text-operator contract to one page's
    (concatenated) content stream."""
    lex = _Lexer(content)
    lines: list[str] = []
    cur: list[str] = []
    operands: list = []

    def newline() -> None:
        text = "".join(cur)
        if text:
            lines.append(text)
        cur.clear()

    def show(val) -> None:
        if isinstance(val, bytes):
            cur.append(val.decode("latin-1"))

    while True:
        tok = lex.next_token()
        if tok is None:
            break
        kind, val = tok
        if kind == "kw":
            if val == "Tj":
                if operands:
                    show(operands[-1])
            elif val == "TJ":
                if operands and isinstance(operands[-1], list):
                    for el in operands[-1]:
                        show(el)
            elif val == "'":
                newline()
                if operands:
                    show(operands[-1])
            elif val == '"':
                newline()
                if operands:
                    show(operands[-1])
            elif val in ("T*", "Tm", "BT"):
                newline()
            elif val in ("Td", "TD"):
                # tx ty Td: a pure-horizontal move continues the line
                if len(operands) >= 2 and operands[-1] != 0:
                    newline()
            operands = []
        elif kind == "arr_open":
            # reuse the object parser for the array operand
            operands.append(_parse_value(lex, tok))
        elif kind in ("num", "str", "name"):
            operands.append(val if kind != "num" else val)
        # dict operands (BDC etc.) would arrive as dict_open: parse+drop
        elif kind == "dict_open":
            operands.append(_parse_value(lex, tok))
    newline()
    return "\n".join(lines)


def pdf_text(data: bytes) -> dict:
    """Extract ``{pages: [str], text: str, n_pages: int}`` from PDF
    bytes per the module contract. Raises ValueError on structurally
    broken documents and NotImplementedError on the guarded
    out-of-scope profiles (encryption, non-Flate filters, object
    streams) — the operator layer (``operators.crawl.pdf_extract``)
    converts both into dead-letter rows."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    values, streams = _scan_objects(data)
    # encryption is declared in a trailer dict, not an object
    for tm in re.finditer(rb"trailer\b", data):
        lex = _Lexer(data, tm.end())
        try:
            tdict = _parse_value(lex)
        except ValueError:
            continue
        if isinstance(tdict, dict) and "Encrypt" in tdict:
            raise NotImplementedError("encrypted PDF not supported")
    for oid, (sdict, _) in streams.items():
        if sdict.get("Type") == "ObjStm":
            raise NotImplementedError(
                "PDF 1.5 object streams not supported"
            )
    catalog = None
    for oid in values:
        v = values[oid]
        if isinstance(v, dict) and v.get("Type") == "Catalog":
            catalog = v  # last definition wins (dict order = scan order)
    if catalog is None:
        raise ValueError("no document catalog")
    pages = _walk_pages(catalog.get("Pages"), values, set())
    if not pages:
        raise ValueError("empty page tree")
    texts: list[str] = []
    for page in pages:
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for ref in refs:
            if not (isinstance(ref, tuple) and ref[0] == "ref"):
                raise ValueError("page /Contents is not a reference")
            if ref[1] not in streams:
                raise ValueError("page /Contents is not a stream")
            parts.append(_stream_bytes(ref[1], values, streams, data))
        texts.append(_page_text(b"\n".join(parts)))
    return {
        "pages": texts,
        "text": "\n".join(texts),
        "n_pages": len(texts),
    }
