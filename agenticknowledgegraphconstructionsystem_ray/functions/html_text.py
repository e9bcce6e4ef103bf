"""Deterministic HTML -> text extraction (the byte-identical per-url contract).

Plays the role of the reference's PDF text extractor
(``/root/reference/extract_and_populate.py:35-71``): a pure per-document
function whose output is the canonical ``text`` for a page. The reference's
contract is "per-unit extraction, concatenate, final strip, empty -> None";
ours is the HTML analog ("trafilatura-style" role, dependency-free
implementation):

1. decode bytes as UTF-8 (``errors="replace"``),
2. drop comments, ``<script>``/``<style>``/``<noscript>`` elements and the
   entire ``<head>``,
3. block-level tags become newline boundaries, ``<br>`` too,
4. all remaining tags are stripped,
5. HTML entities are unescaped,
6. within each line whitespace is collapsed to single spaces and the line is
   stripped; empty lines are dropped,
7. lines joined with ``"\n"``; final ``.strip()``; empty -> ``""``.

The function is pure and has no cross-row or cross-batch state, so the
distributed ``map_batches`` execution is byte-identical to the sequential
oracle by construction (SURVEY.md §2.9.1, §7.4).
"""

from __future__ import annotations

import re
from html import unescape

# Elements whose entire content is dropped. DOTALL regexes handle multi-line
# elements; unclosed script/style blocks simply don't match and degrade to
# tag-stripping (deterministically).
_DROP_ELEMENT_RE = re.compile(
    rb"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_HEAD_RE = re.compile(rb"<head\b[^>]*>.*?</head\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)

# Tags that terminate a text block (HTML block-level elements + <br>).
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|tbody|"
    r"section|article|aside|header|footer|nav|main|blockquote|pre|figure|"
    r"figcaption|hr|form|fieldset|address)\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile("[ \\t\\r\\f\\v\\u00a0]+")


def html_to_text(html: bytes | str | None) -> str:
    """Pure function: raw HTML bytes -> canonical extracted text.

    Deterministic, batch-independent; shared verbatim by the Ray stage and the
    sequential oracle.
    """
    if html is None:
        return ""
    if isinstance(html, str):
        raw = html.encode("utf-8", errors="replace")
    else:
        raw = bytes(html)
    if not raw:
        return ""

    raw = _COMMENT_RE.sub(b"", raw)
    raw = _DROP_ELEMENT_RE.sub(b"", raw)
    raw = _HEAD_RE.sub(b"", raw)

    text = raw.decode("utf-8", errors="replace")
    text = _BLOCK_TAG_RE.sub("\n", text)
    text = _ANY_TAG_RE.sub("", text)
    text = unescape(text)

    lines = []
    for line in text.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines).strip()


def text_stats(text: str) -> tuple[int, int]:
    """(char_count, word_count) — reference's text stats
    (``extract_and_populate.py:74-87``: ``len(text)``, ``len(text.split())``)."""
    return len(text), len(text.split())
