"""functions/markdown.py — deterministic Markdown normalization
contract (the documented CommonMark subset; never raises)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.markdown import (
    build_markdown,
    parse_markdown,
)


def test_prose_and_headings():
    md = build_markdown(
        n_paras=2, para_words=3,
        headings=[(1, "Title"), (3, "Sub")],
    )
    r = parse_markdown(md)
    assert r["headings"] == [(1, "Title"), (3, "Sub")]
    assert r["text"].split("\n") == ["Title", "w w w", "Sub", "w w w"]
    assert r["n_lines"] == 4 and r["n_words"] == 8


def test_atx_trailing_hashes_and_markers():
    r = parse_markdown("## Head ##\n\n> quoted **bold** and *em* `code`\n")
    assert r["headings"] == [(2, "Head")]
    assert r["text"] == "Head\nquoted bold and em code"


def test_nested_emphasis_and_strikethrough():
    r = parse_markdown("***both*** and ~~gone~~ and __under__\n")
    assert r["text"] == "both and gone and under"


def test_links_images_autolinks():
    md = build_markdown(
        n_paras=1, para_words=2,
        links=[("click", "http://a.example/x")],
        images=[("logo", "http://a.example/i.png")],
    )
    r = parse_markdown(md + "see <http://b.example/> now\n")
    assert r["links"] == [
        ("click", "http://a.example/x"),
        ("http://b.example/", "http://b.example/"),
    ]
    assert r["images"] == [("logo", "http://a.example/i.png")]
    # link TEXT stays in prose; image alt does not
    assert "click" in r["text"] and "logo" not in r["text"]
    assert "http://a.example/x" not in r["text"]


def test_code_fences_excluded_with_census():
    md = build_markdown(
        n_paras=1, para_words=2,
        code=[("python", ["x = 1", "print(x)"]), ("", ["plain"])],
    )
    r = parse_markdown(md)
    assert r["code_blocks"] == [
        {"lang": "python", "n_lines": 2, "n_chars": 13},
        {"lang": None, "n_lines": 1, "n_chars": 5},
    ]
    assert "x = 1" not in r["text"]


def test_unterminated_fence_runs_to_eof():
    r = parse_markdown("para\n\n```js\nlet a;\nlet b;")
    assert r["code_blocks"] == [
        {"lang": "js", "n_lines": 2, "n_chars": 12},
    ]
    assert r["text"] == "para"


def test_tilde_fence_and_longer_fences():
    r = parse_markdown("~~~~\ncode\n~~~~\n")
    assert r["code_blocks"][0]["n_lines"] == 1
    # a 3-backtick line inside a 4-backtick fence is CONTENT
    r2 = parse_markdown("````\n```\ncode\n````\n")
    assert r2["code_blocks"][0]["n_lines"] == 2


def test_lists_breaks_html_tags():
    r = parse_markdown(
        "- item one\n2. item two\n\n---\n\n<div>html <b>kept</b> text</div>\n"
    )
    assert r["text"] == "item one\nitem two\nhtml kept text"


def test_never_raises_and_deterministic():
    for junk in ("", "\n\n\n", "][", "**", "```", "> > deep", "#", "<"):
        r1 = parse_markdown(junk)
        r2 = parse_markdown(junk)
        assert r1 == r2 and isinstance(r1["text"], str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_fuzz_never_raises(s):
    r = parse_markdown(s)
    assert isinstance(r, dict) and isinstance(r["n_words"], int)


def test_intraword_underscores_survive():
    """CommonMark: intraword '_' is not emphasis — snake_case
    identifiers in the target GitHub corpus must survive (r15 review
    finding). Flanked underscores still strip."""
    r = parse_markdown("use snake_case_name and my_var plus _em_ now\n")
    assert r["text"] == "use snake_case_name and my_var plus em now"
    assert parse_markdown("a __bold__ b\n")["text"] == "a bold b"
