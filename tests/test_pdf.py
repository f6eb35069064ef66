"""PDF text extraction: builder/parser roundtrip, the deterministic
text-operator contract, guarded out-of-scope profiles, and the
operator-layer dead-letter discipline (functions/pdf.py,
operators/crawl.py pdf_extract / document_extract)."""

import pytest

from data_engineering_assignment_spark.functions.pdf import (
    _page_text,
    build_pdf,
    pdf_text,
)


def test_roundtrip_all_builder_variants():
    """Every builder variant (plain/Flate, Tj/TJ-split, literal/hex
    strings, flat/nested page tree) extracts the identical text."""
    pages = [
        ["Doc 42 page 0", "text (42) on 0"],
        ["Doc 42 page 1", "text (42) on 1"],
        ["Doc 42 page 2", "x \\ y"],
    ]
    for flate in (False, True):
        for tj in (False, True):
            for hx in (False, True):
                for nest in (False, True):
                    b = build_pdf(
                        pages, flate=flate, tj_split=tj,
                        hex_strings=hx, nested_kids=nest,
                    )
                    r = pdf_text(b)
                    assert r["n_pages"] == 3
                    assert r["pages"] == [
                        "Doc 42 page 0\ntext (42) on 0",
                        "Doc 42 page 1\ntext (42) on 1",
                        "Doc 42 page 2\nx \\ y",
                    ]
                    assert r["text"] == "\n".join(r["pages"])


def test_page_tree_order_not_file_order():
    """Pages come back in /Kids tree order: the nested builder puts the
    LAST page's object directly under the root while earlier pages sit
    in an inner /Pages node — extraction order must still be logical."""
    pages = [["first"], ["second"], ["third"]]
    r = pdf_text(build_pdf(pages, nested_kids=True))
    assert r["pages"] == ["first", "second", "third"]


def test_text_operator_contract():
    """Tj / TJ / ' / \" / T* / Tm / Td-with-ty newline semantics, and
    escape handling (octal, specials, continuation, hex padding)."""
    c = rb"""BT (a\101\(b) Tj 0 -14 Td (cont\
inued) Tj T* (x) Tj 5 0 Td (y) Tj ET"""
    assert _page_text(c) == "aA(b\ncontinued\nxy"
    # hex string, odd final digit pads with 0: 414 -> 41 40 -> 'A@'
    assert _page_text(b"BT <414> Tj ET") == "A@"
    # TJ ignores kerning numbers; ' and " start a new line then show
    assert _page_text(b"BT [(a) -20 (b)] TJ (c) ' 1 2 (d) \" ET") == (
        "ab\nc\nd"
    )
    # Tm starts a new line; a tx-only Td does not
    assert _page_text(b"BT (p) Tj 1 0 0 1 72 700 Tm (q) Tj ET") == "p\nq"
    # raw EOL inside a literal string normalizes to \n (stays in-line
    # as string CONTENT, not a line break)
    assert _page_text(b"BT (a\r\nb) Tj ET") == "a\nb"


def test_incremental_update_last_definition_wins():
    """Appending a redefinition of a page's content stream (incremental
    update) shadows the original object — xref-table semantics
    reproduced by the scan."""
    import zlib

    base = build_pdf([["old text"]], flate=True)
    new = zlib.compress(b"BT (new text) Tj ET")
    patch = (
        b"\n4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(new)
        + new
        + b"\nendstream\nendobj\n"
    )
    assert pdf_text(base)["text"] == "old text"
    assert pdf_text(base + patch)["text"] == "new text"


def test_guarded_profiles_raise():
    """The guard narrows to encryption, foreign filters and CID fonts —
    the PDF 1.5 compressed profile and predictors now PARSE (r12 judge
    item: most post-2004 PDFs no longer dead-letter)."""
    good = build_pdf([["hi"]], flate=True)
    with pytest.raises(ValueError):
        pdf_text(b"not a pdf")
    with pytest.raises(ValueError):
        pdf_text(b"%PDF-1.4\nno objects here")
    with pytest.raises(ValueError):
        pdf_text(good[: len(good) // 2])  # truncated mid-structure
    # LZWDecode is now SUPPORTED — mislabeling Flate bytes as LZW is a
    # STRUCTURAL error (ValueError dead-letter), not an unsupported
    # profile; the unsupported-filter guard moved to the image filters
    with pytest.raises(ValueError):
        pdf_text(good.replace(b"/FlateDecode", b"/LZWDecode\x20\x20"))
    with pytest.raises(NotImplementedError):
        pdf_text(good.replace(b"/FlateDecode", b"/JPXDecode\x20\x20"))
    # a declared /Encrypt pointing at a MISSING object is structural
    # breakage (r13: supported RC4 encryption has its own test; the
    # unreadable classes raise from _StdSecurity)
    with pytest.raises(ValueError):
        pdf_text(
            good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 99 0 R")
        )
    # 1.5 profile: /Encrypt lives in the XRef STREAM dict (no trailer
    # keyword in the file at all) — detection must look there
    g15 = build_pdf([["hi"]], object_streams=True)
    assert b"trailer" not in g15
    with pytest.raises(ValueError):
        pdf_text(g15.replace(b"/Type /XRef", b"/Type /XRef /Encrypt 99 0 R"))
    # composite Type0 font WITHOUT /ToUnicode: CID decoding is guarded
    tu = build_pdf([["hi"]], tounicode=True)
    t0 = tu.replace(b"/Subtype /TrueType", b"/Subtype /Type0")
    assert pdf_text(t0)["text"] == "hi"  # with /ToUnicode: decodes fine
    start = t0.find(b"/ToUnicode")
    end = t0.find(b" R", start) + 2
    with pytest.raises(NotImplementedError):
        pdf_text(t0[:start] + t0[end:])


def test_pdf15_objstm_and_xref_stream_roundtrip():
    """The PDF 1.5 compressed profile end-to-end: all non-stream
    objects in a /Type /ObjStm, trailer-less xref STREAM, nested page
    tree, predictor-encoded content — extraction identical to the
    classic build."""
    pages = [["first page", "line (two)"], ["second \\ page"]]
    classic = pdf_text(build_pdf(pages))
    for pred in (False, True):
        got = pdf_text(
            build_pdf(
                pages,
                object_streams=True,
                content_predictor=pred,
                nested_kids=True,
            )
        )
        assert got == classic


def test_pdf15_incremental_update_shadows_objstm_member():
    """A direct object appended AFTER an ObjStm shadows the compressed
    member (file-order = xref-table outcome); an ObjStm member never
    shadows a LATER direct definition."""
    base = build_pdf([["old text"]], object_streams=True, flate=True)
    import zlib as _z

    new = _z.compress(b"BT (new text) Tj ET")
    # object 4 is the first page's content stream (same numbering as
    # the classic builder); append a redefinition
    patch = (
        b"\n4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(new)
        + new
        + b"\nendstream\nendobj\n"
    )
    assert pdf_text(base)["text"] == "old text"
    assert pdf_text(base + patch)["text"] == "new text"


def test_xref_stream_decodes_through_predictor():
    """The fixture's xref stream (PNG Up predictor, W [1 4 1]) decodes
    through _stream_bytes/_unpredict to rows whose type-1 entries point
    at real object headers and whose type-2 entries name the ObjStm —
    pins the predictor implementation against self-generated ground
    truth."""
    from data_engineering_assignment_spark.functions.pdf import (
        _scan_objects,
        _stream_bytes,
    )

    data = build_pdf([["page one"], ["page two"]], object_streams=True)
    values, streams, _pos, _gens = _scan_objects(data)
    xref_oid = next(
        o for o, (d, _) in streams.items() if d.get("Type") == "XRef"
    )
    objstm_oid = next(
        o for o, (d, _) in streams.items() if d.get("Type") == "ObjStm"
    )
    rows = _stream_bytes(xref_oid, values, streams, data)
    assert len(rows) % 6 == 0
    seen_direct = seen_member = 0
    for oid in range(len(rows) // 6):
        t = rows[6 * oid]
        f2 = int.from_bytes(rows[6 * oid + 1 : 6 * oid + 5], "big")
        if t == 1 and oid != xref_oid:
            assert data[f2:].startswith(b"%d 0 obj" % oid)
            seen_direct += 1
        elif t == 2:
            assert f2 == objstm_oid
            seen_member += 1
    assert seen_direct >= 2 and seen_member >= 4


def test_adversarial_bytes_never_escape_error_contract():
    """Crawled junk discipline: pdf_text on mutated/truncated/hostile
    bytes terminates with a RESULT or a DECLARED error class
    (ValueError / NotImplementedError) — never a hang, RecursionError
    or stray exception (hypothesis-driven mutations over every builder
    profile plus hand-built pathological byte shapes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base_pdfs = [
        build_pdf([["seed text", "line (2)"]], flate=f, object_streams=o)
        for f in (False, True)
        for o in (False, True)
    ] + [build_pdf([["seed text"]], encrypt="rc4-128", tounicode=True)]

    @settings(max_examples=150, deadline=None)
    @given(
        st.integers(0, len(base_pdfs) - 1),
        st.lists(
            st.tuples(st.integers(0, 4000), st.integers(0, 255)),
            min_size=1,
            max_size=8,
        ),
        st.integers(0, 4000),
    )
    def mutate(which, flips, cut):
        raw = bytearray(base_pdfs[which])
        for pos, val in flips:
            raw[pos % len(raw)] = val
        data = bytes(raw[: max(8, cut % (len(raw) + 1))])
        try:
            r = pdf_text(data)
            assert isinstance(r["text"], str)
        except (ValueError, NotImplementedError):
            pass

    mutate()
    # pathological shapes: delimiter runs, deep nesting, giant lengths,
    # stream keyword with no dict, unterminated strings
    for evil in (
        b"%PDF-1.4\n" + b"{}" * 200000,
        b"%PDF-1.4\n1 0 obj\n" + b"[" * 50000 + b"\nendobj",
        b"%PDF-1.4\n1 0 obj\n<< /Length 999999999 >>\nstream\nxx\nendstream\nendobj",
        b"%PDF-1.4\n1 0 obj\n(never closed\nendobj",
        b"%PDF-1.4\n1 0 obj\n<< /K (" + b"(" * 9000 + b") >>\nendobj",
        b"%PDF-1.4\ntrailer << /Encrypt 1 0 R >>",
    ):
        try:
            pdf_text(evil)
        except (ValueError, NotImplementedError):
            pass


def test_adversarial_cmap_tree_and_parms_bounded():
    """r13 review findings pinned: an empty bfchar code can't stall the
    decoder (zero-width keys are dropped), a giant bfrange can't
    amplify into millions of entries, a linear /Pages chain raises the
    declared ValueError (not RecursionError), and a junk /Columns
    raises ValueError instead of allocating gigabytes."""
    from data_engineering_assignment_spark.functions.pdf import (
        _font_decoder,
        _parse_tounicode,
        _unpredict,
    )

    # empty bfchar code: dropped at parse, and the decoder treats a
    # map with only wide codes safely
    cmap = b"2 beginbfchar\n<> <0041>\n<41> <0058>\nendbfchar\nendstream"
    m = _parse_tounicode(cmap)
    assert b"" not in m and m[b"\x41"] == "X"
    dec = _font_decoder(
        {"ToUnicode": ("ref", 9)},
        {},
        {9: ({"Length": len(cmap) - len(b"endstream")}, 0)},
        cmap,
    )
    assert dec(b"\x41\x42") == "XB"  # terminates; unmapped -> Latin-1
    # bfrange amplification cap: 4-byte bounds spanning 2^20 codes
    big = _parse_tounicode(
        b"1 beginbfrange\n<00000000> <000fffff> <0041>\nendbfrange"
    )
    assert len(big) == 0
    # linear /Pages chain: declared error class, never RecursionError
    objs = [b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"]
    depth = 3000
    for i in range(2, depth):
        objs.append(
            b"%d 0 obj\n<< /Type /Pages /Kids [%d 0 R] /Count 1 >>\nendobj\n"
            % (i, i + 1)
        )
    objs.append(b"%d 0 obj\n<< /Type /Page >>\nendobj\n" % depth)
    with pytest.raises(ValueError, match="too deep"):
        pdf_text(b"".join(objs))
    # /Columns bomb: structural error, not a giant allocation
    with pytest.raises(ValueError):
        _unpredict(b"\x02abc", {"Predictor": 12, "Columns": 10**18}, {})
    with pytest.raises(ValueError):
        _unpredict(b"\x02abc", {"Predictor": 2, "Columns": 10**9}, {})


def test_rc4_encrypted_readable_class():
    """Standard security handler, empty user password (V1 R2 40-bit
    and V2 R3 128-bit RC4): encrypted fixtures extract the identical
    text through the classic AND 1.5 compressed profiles (per-object
    stream decryption incl. the ObjStm and the CMap; the xref stream
    stays unencrypted); a tampered /U (i.e. a real user password)
    raises the password guard; AES/V4 raises the cipher guard."""
    pages = [["Doc 5 page 0", "text (5) on 0"], ["x \\ y"]]
    want = pdf_text(build_pdf(pages))["pages"]
    for enc in ("rc4-40", "rc4-128"):
        for objstm in (False, True):
            for tu in (False, True):
                b = build_pdf(
                    pages, encrypt=enc, object_streams=objstm, tounicode=tu
                )
                assert b"Doc 5" not in b  # bytes really are encrypted
                assert pdf_text(b)["pages"] == want, (enc, objstm, tu)
    b = build_pdf(pages, encrypt="rc4-128")
    i = b.find(b"/U <")
    flip = b"0" if b[i + 5 : i + 6] != b"0" else b"1"
    with pytest.raises(NotImplementedError, match="password-protected"):
        pdf_text(b[: i + 5] + flip + b[i + 6 :])
    # unknown revision combinations stay guarded (V4/V5 AES are now
    # SUPPORTED — see test_aes_encrypted_readable_class)
    with pytest.raises(NotImplementedError, match="not supported"):
        pdf_text(b.replace(b"/V 2 /R 3", b"/V 6 /R 7"))
    # RC4 self-inverse sanity (the spec's test property)
    from data_engineering_assignment_spark.functions.pdf import _rc4

    key = bytes(range(16))
    blob = bytes(range(256)) * 3
    assert _rc4(key, _rc4(key, blob)) == blob


def test_aes_encrypted_readable_class(monkeypatch):
    """AES standard security handlers, empty user password: V4 R4
    /CFM /AESV2 (AES-128-CBC, sAlT per-object keys) and V5 R6
    /CFM /AESV3 (AES-256, Algorithm 2.B hash, /UE file-key unwrap) —
    the post-2006 majority of encrypted crawl PDFs. Encrypted fixtures
    extract the identical text through the classic AND 1.5 compressed
    profiles; a tampered /U raises the password guard on both; an
    unknown /CFM raises the filter guard; the pure-Python AES fallback
    (cryptography absent) produces the same extraction."""
    pages = [["Doc 6 page 0", "text (6) on 0"], ["k \\ v"]]
    want = pdf_text(build_pdf(pages))["pages"]
    for enc in ("aes-128", "aes-256"):
        for objstm in (False, True):
            for tu in (False, True):
                b = build_pdf(
                    pages, encrypt=enc, object_streams=objstm, tounicode=tu
                )
                assert b"Doc 6" not in b  # bytes really are encrypted
                assert pdf_text(b)["pages"] == want, (enc, objstm, tu)
        b = build_pdf(pages, encrypt=enc)
        i = b.find(b"/U <")
        flip = b"0" if b[i + 5 : i + 6] != b"0" else b"1"
        with pytest.raises(NotImplementedError, match="password-protected"):
            pdf_text(b[: i + 5] + flip + b[i + 6 :])
    # unknown crypt filter method stays guarded
    b = build_pdf(pages, encrypt="aes-128")
    with pytest.raises(NotImplementedError, match="CFM"):
        pdf_text(b.replace(b"/CFM /AESV2", b"/CFM /FooBar"))
    # split StmF/StrF stays guarded
    with pytest.raises(NotImplementedError, match="StmF"):
        pdf_text(b.replace(b"/StrF /StdCF", b"/StrF /Identity"))
    # V4 key-length precedence (r14 review): AESV2 is AES-128 by spec,
    # so a document with NO top-level /Length (legal — the crypt filter
    # dict is authoritative for V4) still decrypts
    b = build_pdf(pages, encrypt="aes-128")
    b2 = b.replace(b"/V 4 /R 4 /Length 128 ", b"/V 4 /R 4 ")
    assert b2 != b
    assert pdf_text(b2)["pages"] == want
    # pure-Python AES fallback: same bytes, same text (hook discipline)
    from data_engineering_assignment_spark.functions import aes as aes_mod

    monkeypatch.setattr(aes_mod, "_ACCEL", None)
    monkeypatch.setattr(aes_mod, "_ACCEL_PROBED", True)
    assert pdf_text(build_pdf(pages, encrypt="aes-256"))["pages"] == want
    assert pdf_text(build_pdf(pages, encrypt="aes-128"))["pages"] == want


def test_pdf_uri_link_annotations():
    """/Annots URI actions surface as links in page-tree order across
    every profile: plain, 1.5 compressed (member strings stay PLAIN per
    §7.5.7), and all four encryption profiles (classic-profile URI
    strings are really encrypted in the bytes and decrypt under the
    containing object's key). Non-Link annots and non-URI actions are
    skipped; a links/pages length mismatch raises in the builder."""
    pages = [["p0"], ["p1"], ["p2"]]
    links = [["http://a.example/x", "/rel?b=2&a=1#f"], [], ["//b.example/y"]]
    flat = ["http://a.example/x", "/rel?b=2&a=1#f", "//b.example/y"]
    want_text = pdf_text(build_pdf(pages))["text"]
    for enc in (None, "rc4-128", "aes-128", "aes-256"):
        for objstm in (False, True):
            b = build_pdf(
                pages, links=links, encrypt=enc, object_streams=objstm
            )
            r = pdf_text(b)
            assert r["text"] == want_text, (enc, objstm)
            assert r["links"] == flat, (enc, objstm)
            if enc and not objstm:
                assert b"a.example" not in b  # string really encrypted
    # page-TREE order (nested kids), not file order
    b = build_pdf(pages, links=[["u0"], ["u1"], ["u2"]], nested_kids=True)
    assert pdf_text(b)["links"] == ["u0", "u1", "u2"]
    # linkless documents keep links == []
    assert pdf_text(build_pdf(pages))["links"] == []
    with pytest.raises(ValueError, match="one entry per page"):
        build_pdf(pages, links=[["u"]])
    # a non-URI action and a non-Link annot are skipped, URI kept
    b = build_pdf([["p0"]], links=[["http://k.example/"]])
    b = b.replace(
        b"/Annots [",
        b"/Annots [<< /Type /Annot /Subtype /Square >> "
        b"<< /Type /Annot /Subtype /Link /A << /S /GoTo /D (x) >> >> ",
    )
    assert pdf_text(b)["links"] == ["http://k.example/"]


def test_hash_r6_frozen_known_answers():
    """Algorithm 2.B (ISO 32000-2 R6 password hash) pinned values: the
    AES gates' builder and reader share this function, so a roundtrip
    alone could not catch a semantics drift — these frozen digests can
    (no independent PDF implementation exists in this container to
    cross-validate against; the algorithm follows the published spec,
    and the AES core underneath is FIPS-vector-pinned separately)."""
    from data_engineering_assignment_spark.functions.pdf import _hash_r6

    assert (
        _hash_r6(b"", b"salt8byt").hex()
        == "a77cf236aa3981cd3243f73551c74b600e3dc3ab0b9ab3cc8dc622b2d6f8cdc3"
    )
    assert (
        _hash_r6(b"owner", b"abcdefgh", b"U" * 48).hex()
        == "263e2439fd2c06b5a15dcea83524596d8f4c0c1306bae79c97916fd374ca845d"
    )


def test_tounicode_two_byte_codes():
    """2-byte CMap codes (the Type0/CID shape): bfchar + bfrange with
    <xxxx> sources decode greedily (longest code first in mixed-width
    maps), surrogate-free UTF-16BE targets, unmapped wide code ->
    U+FFFD per code."""
    from data_engineering_assignment_spark.functions.pdf import (
        _font_decoder,
        _parse_tounicode,
    )

    cmap = (
        b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        b"2 beginbfchar\n<0041> <0058>\n<0102> <4E2D>\nendbfchar\n"
        b"1 beginbfrange\n<0200> <0202> <0061>\nendbfrange\n"
    )
    m = _parse_tounicode(cmap)
    assert m[b"\x00\x41"] == "X" and m[b"\x01\x02"] == "中"
    assert m[b"\x02\x00"] == "a" and m[b"\x02\x02"] == "c"
    data = cmap + b"endstream"
    streams = {9: ({"Length": len(cmap)}, 0)}
    dec = _font_decoder({"ToUnicode": ("ref", 9)}, {}, streams, data)
    assert dec(b"\x00\x41\x02\x01") == "Xb"
    # unmapped 2-byte code: U+FFFD, stream stays aligned
    assert dec(b"\x7f\x7f\x00\x41") == "�X"
    # mixed widths: 1-byte entries coexist, longest match wins
    mixed = (
        b"2 beginbfchar\n<41> <0031>\n<4142> <0032>\nendbfchar\n"
        b"endstream"
    )
    dec2 = _font_decoder(
        {"ToUnicode": ("ref", 9)},
        {},
        {9: ({"Length": len(mixed) - len(b"endstream")}, 0)},
        mixed,
    )
    assert dec2(b"\x41\x42\x41") == "21"  # <4142> then <41>


def test_filter_chains_roundtrip():
    """LZW / ASCIIHex / ASCII85 / RunLength legs and multi-filter
    CHAINS (decoded in /Filter array order) all extract the identical
    text, classic AND 1.5-profile; image filters stay guarded and a
    junk /EarlyChange is a structural error."""
    from data_engineering_assignment_spark.functions.pdf import (
        _apply_filter,
        _runlength_decode,
        _runlength_encode,
    )

    pages = [["Doc 7 page 0", "text (7) on 0"], ["x \\ y <z>"]]
    want = pdf_text(build_pdf(pages))["pages"]
    chains = [
        ["LZWDecode"],
        ["ASCIIHexDecode"],
        ["ASCII85Decode"],
        ["RunLengthDecode"],
        ["ASCII85Decode", "FlateDecode"],
        ["ASCIIHexDecode", "LZWDecode"],
        ["ASCII85Decode", "RunLengthDecode", "FlateDecode"],
    ]
    for ch in chains:
        for objstm in (False, True):
            b = build_pdf(pages, filter_chain=ch, object_streams=objstm)
            assert pdf_text(b)["pages"] == want, (ch, objstm)
    # RunLength encoder/decoder unit: runs, literals, 128-chunking, EOD
    for blob in (b"", b"a", b"ab", b"aaab" * 3, bytes(range(256)) * 2,
                 b"x" * 400, b"ab" * 200 + b"z" * 5):
        assert _runlength_decode(_runlength_encode(blob)) == blob
    with pytest.raises(NotImplementedError):
        pdf_text(
            build_pdf(pages).replace(b"/FlateDecode", b"/DCTDecode\x20\x20\x20")
        )
    with pytest.raises(ValueError):
        _apply_filter("LZWDecode", b"", {"EarlyChange": 2}, {})
    with pytest.raises(ValueError):
        _apply_filter("ASCII85Decode", b"~>", {"Predictor": 12}, {})


def test_tiff_predictor_2():
    """TIFF predictor 2 (horizontal delta) on a multi-row, multi-color
    stream: hand-computed ground truth."""
    import zlib as _z

    from data_engineering_assignment_spark.functions.pdf import (
        _scan_objects,
        _stream_bytes,
    )

    raw = bytes([10, 20, 5, 1, 100, 200, 3, 250])  # 2 rows, 2 cols, 2 colors
    enc = bytearray(raw)
    for r0 in (0, 4):
        for i in range(r0 + 4 - 1, r0 + 2 - 1, -1):
            enc[i] = (enc[i] - enc[i - 2]) & 0xFF
    comp = _z.compress(bytes(enc))
    data = (
        b"%PDF-1.4\n1 0 obj\n"
        + b"<< /Length %d /Filter /FlateDecode " % len(comp)
        + b"/DecodeParms << /Predictor 2 /Colors 2 /Columns 2 >> >>\n"
        + b"stream\n"
        + comp
        + b"\nendstream\nendobj\n"
    )
    values, streams, _, _ = _scan_objects(data)
    assert _stream_bytes(1, values, streams, data) == raw


def test_subsetted_font_decoding_contract():
    """/Differences and /ToUnicode re-encoded strings extract as the
    VISIBLE text (raw string bytes differ — asserted), unknown glyph
    names decode to U+FFFD, and unmapped 1-byte ToUnicode codes fall
    back to Latin-1."""
    from data_engineering_assignment_spark.functions.pdf import (
        _font_decoder,
        _parse_tounicode,
    )

    pages = [["Subset (42) \\ test!", "second line 99"]]
    for kw in ({"differences": True}, {"tounicode": True}):
        b = build_pdf(pages, **kw)
        assert b"Subset (42)" not in b  # bytes really are re-encoded
        r = pdf_text(b)
        assert r["pages"] == ["Subset (42) \\ test!\nsecond line 99"]
    # unknown glyph name -> U+FFFD (declared contract)
    d = build_pdf(pages, differences=True)
    d = d.replace(b"/S ", b"/nosuchglyph ", 1)
    assert "�" in pdf_text(d)["text"]
    # direct decoder unit: unmapped 1-byte code falls back to Latin-1
    cmap = (
        b"2 beginbfchar\n<41> <0058>\n<42> <0059>\nendbfchar\n"
        b"1 beginbfrange\n<50> <52> <0061>\nendbfrange\n"
    )
    m = _parse_tounicode(cmap)
    assert m == {
        b"\x41": "X", b"\x42": "Y",
        b"\x50": "a", b"\x51": "b", b"\x52": "c",
    }
    data = cmap + b"endstream"
    streams = {9: ({"Length": len(cmap)}, 0)}
    dec = _font_decoder({"ToUnicode": ("ref", 9)}, {}, streams, data)
    assert dec(b"\x41\x50") == "Xa"
    assert dec(b"\x41\x7a\x50") == "Xza"  # 0x7a unmapped -> Latin-1 'z'


def test_scan_skips_obj_pattern_inside_stream_payload():
    """A stream payload containing the bytes 'N G obj' must not be
    mistaken for an object definition (compressed data can contain any
    byte sequence)."""
    evil = "trap 1 0 obj << >> endobj ("  # inside a literal string
    b = build_pdf([[f"before {evil} after"]], flate=False)
    r = pdf_text(b)
    assert r["text"] == f"before {evil} after"


def test_pdf_extract_operator_dead_letters(spark):
    import pandas as pd

    from data_engineering_assignment_spark.operators.crawl import (
        pdf_extract,
    )

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "http_body": [
                build_pdf([["page one"], ["page two"]]),
                b"%PDF-1.4 broken",
                None,
            ],
        }
    )
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id: (r.doc["pdf_ok"], r.doc["text"], r.doc["n_pages"])
        for r in pdf_extract(df).collect()
    }
    assert got == {
        1: (True, "page one\npage two", 2),
        2: (False, None, None),
        3: (False, None, None),
    }


def test_document_extract_dispatch(spark):
    import pandas as pd

    from data_engineering_assignment_spark.operators.crawl import (
        document_extract,
    )

    html = b"<html><head><title>T</title></head><body><p>hello  web</p>"
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "http_body": [
                html,                          # header says html
                build_pdf([["pdf body"]]),     # header says pdf
                build_pdf([["sniffed pdf"]]),  # no header: %PDF- magic
                html,                          # no header: '<' sniff
                b"\x00\x01binary junk",        # no header, no sniff
                b"%PDF-1.4 broken",            # pdf route, parse fails
            ],
            "content_type": [
                "text/html; charset=utf-8",
                "application/pdf",
                None,
                None,
                None,
                "application/pdf",
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = document_extract(df, content_type_col="content_type")
    got = {
        r.doc_id: (
            r.doc["kind"], r.doc["doc_ok"], r.doc["text"],
            r.doc["title"], r.doc["n_pages"],
        )
        for r in out.collect()
    }
    assert got == {
        1: ("html", True, "hello web", "T", 1),
        2: ("pdf", True, "pdf body", None, 1),
        3: ("pdf", True, "sniffed pdf", None, 1),
        4: ("html", True, "hello web", "T", 1),
        5: ("other", False, None, None, None),
        6: ("pdf", False, None, None, None),
    }


def test_contents_array_concatenates_streams():
    """A page whose /Contents is an ARRAY of stream refs concatenates
    them in order (spec: the array's streams form one content stream)."""
    import zlib

    base = build_pdf([["placeholder"]], flate=False)
    # rewrite page 3's /Contents to [4 0 R 8 0 R] and append stream 8
    assert b"/Contents 4 0 R" in base
    patched = base.replace(b"/Contents 4 0 R", b"/Contents [4 0 R 8 0 R]")
    extra_raw = b"BT 0 -14 Td (second stream) Tj ET"
    extra = zlib.compress(extra_raw)
    patch = (
        b"\n8 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(extra)
        + extra
        + b"\nendstream\nendobj\n"
    )
    r = pdf_text(patched + patch)
    assert r["pages"] == ["placeholder\nsecond stream"]


def test_decrypt_mixes_object_generation():
    """Algorithm-1 per-object keys mix the GENERATION's low 2 bytes —
    previously hardcoded 0, which made RC4 silently produce garbage
    for gen>0 objects in incremental-update files (r14 advisor
    finding). Pins: gen>0 derivation for RC4 and AESV2, gen-0 default
    for oids the scan never saw, and the 16-byte key cap."""
    import hashlib

    from data_engineering_assignment_spark.functions.aes import (
        aes_cbc_encrypt,
    )
    from data_engineering_assignment_spark.functions.pdf import (
        _rc4,
        _StdSecurity,
    )

    def derived(fkey, oid, gen, salt=b""):
        return hashlib.md5(
            fkey + oid.to_bytes(3, "little") + gen.to_bytes(2, "little")
            + salt
        ).digest()[: min(len(fkey) + 5, 16)]

    # RC4 (V2), 40-bit file key, object 7 generation 3
    s = _StdSecurity.__new__(_StdSecurity)
    s.cfm, s.key, s.gens = "V2", b"\x01\x02\x03\x04\x05", {7: 3}
    ct = _rc4(derived(s.key, 7, 3), b"plaintext payload")
    assert s.decrypt(7, ct) == b"plaintext payload"
    # the old gen-0 derivation must NOT decrypt it
    assert s.decrypt(8, ct) != b"plaintext payload"  # 8 unseen -> gen 0

    # AESV2, 128-bit file key, object 9 generation 1: the pad check
    # passes only under the gen-mixed key
    s2 = _StdSecurity.__new__(_StdSecurity)
    s2.cfm, s2.key, s2.gens = "AESV2", b"\x0f" * 16, {9: 1}
    key = derived(s2.key, 9, 1, b"sAlT")
    iv = b"\xaa" * 16
    raw = b"secret text!"
    padn = 16 - len(raw) % 16
    ct2 = iv + aes_cbc_encrypt(key, iv, raw + bytes([padn]) * padn)
    assert s2.decrypt(9, ct2) == raw
