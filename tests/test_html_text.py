"""Extraction-contract unit tests (SURVEY.md §2.9.1 analog of the reference's
single-document extraction smoke test, test_extraction.py:17-79)."""

from agenticknowledgegraphconstructionsystem_ray.functions.html_text import (
    html_to_text,
    text_stats,
)


def test_basic_blocks():
    h = b"<html><body><h1>Title</h1><p>one two</p><p>three</p></body></html>"
    assert html_to_text(h) == "Title\none two\nthree"


def test_script_style_head_dropped():
    h = (
        b"<html><head><title>T</title><style>p{}</style></head>"
        b"<body><script>var x=1;</script><p>kept</p>"
        b"<noscript>no</noscript></body></html>"
    )
    assert html_to_text(h) == "kept"


def test_entities_unescaped():
    assert html_to_text(b"<p>a &amp; b &#x27;c&#x27;</p>") == "a & b 'c'"


def test_whitespace_collapsed_nbsp():
    assert html_to_text("<p>a    b</p>".encode()) == "a b"


def test_inline_tags_no_break():
    assert html_to_text(b"<p>a <b>bold</b> c</p>") == "a bold c"


def test_empty_and_none():
    assert html_to_text(b"") == ""
    assert html_to_text(None) == ""
    assert html_to_text(b"<body></body>") == ""


def test_malformed_does_not_raise():
    assert isinstance(html_to_text(b"<p<><<>broken<<"), str)
    assert isinstance(html_to_text(b"<script>never closed"), str)


def test_non_ascii_roundtrip():
    assert html_to_text("<p>café naïve</p>".encode()) == "café naïve"


def test_comments_dropped():
    assert html_to_text(b"<p>a</p><!-- hidden --><p>b</p>") == "a\nb"


def test_stats():
    assert text_stats("one two\nthree") == (13, 3)
