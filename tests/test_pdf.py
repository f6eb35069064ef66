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
    good = build_pdf([["hi"]], flate=True)
    with pytest.raises(ValueError):
        pdf_text(b"not a pdf")
    with pytest.raises(ValueError):
        pdf_text(b"%PDF-1.4\nno objects here")
    with pytest.raises(ValueError):
        pdf_text(good[: len(good) // 2])  # truncated mid-structure
    with pytest.raises(NotImplementedError):
        pdf_text(good.replace(b"/FlateDecode", b"/LZWDecode\x20\x20"))
    with pytest.raises(NotImplementedError):
        pdf_text(
            good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
        )
    objstm = good.replace(b"/Filter /FlateDecode", b"/Type /ObjStm")
    with pytest.raises(NotImplementedError):
        pdf_text(objstm)


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
