"""Deterministic outlink extraction from raw HTML (pure kernel).

The web-graph sibling of ``html_text.html_to_text``: a pure per-document
function shared verbatim by the distributed pipeline and the sequential
golden (NOTES.md invariant 1), so host-graph construction is verifiable
bit-for-bit. Reference analog: the citation-edge collection that built the
reference's paper->paper graph (``fetch_citing_papers.py:140-264``) —
re-expressed for Common-Crawl pages, where the edge evidence is ``<a href>``.

Contract:
- hrefs are taken in document order, duplicates kept (link multiplicity is
  real signal for the host graph);
- double-quoted, single-quoted and unquoted attribute values are accepted;
- empty, fragment-only (``#...``), ``javascript:``, ``mailto:``, ``tel:``
  and ``data:`` targets are dropped;
- relative targets resolve against the page url (RFC 3986 via
  ``urllib.parse.urljoin``);
- the host is the lowercased netloc; links whose resolved host equals the
  page's own host are INTERNAL, everything else EXTERNAL.

Known simplification (documented, deterministic): hrefs inside <script> or
comments are not excluded — the synthetic corpus plants none there, and a
regex scan keeps the kernel dependency-free and byte-stable.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit

_HREF_RE = re.compile(
    rb"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


def extract_hrefs(html: bytes | None) -> list[str]:
    """Raw href attribute values worth following, in document order."""
    if not html:
        return []
    out: list[str] = []
    for m in _HREF_RE.finditer(bytes(html)):
        v = next(g for g in m.groups() if g is not None)
        href = v.decode("utf-8", errors="replace").strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        out.append(href)
    return out


def host_of(url: str) -> str:
    return urlsplit(url).netloc.lower()


def _make_resolver(page_url: str):
    """(href) -> (dst_url, dst_host) | None, with the page's base context
    precomputed once. Hot path: absolute http(s) targets and
    root/bare-relative paths — the shapes covering ~all real links —
    resolve with string slicing (no per-link urlsplit); everything else
    (dot segments, scheme-relative, uppercase schemes, exotic shapes)
    falls back to RFC-3986 ``urljoin``. Fuzz-tested byte-identical to pure
    urljoin resolution."""
    parts = urlsplit(page_url)
    src_host = parts.netloc.lower()
    base_root = f"{parts.scheme}://{parts.netloc}"
    base_dir = page_url.rsplit("/", 1)[0] + "/" if "/" in parts.path else base_root + "/"
    plain_base = not parts.query and not parts.fragment

    def resolve(href: str):
        # (uppercase schemes fall through to urljoin, which lowercases them)
        if href.startswith(("https://", "http://")):
            dst = href
            rest = href[href.index("//") + 2 :]
            h = rest.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0].lower()
        elif href[0] == "/" and not href.startswith("//") and "/." not in href:
            dst = base_root + href
            h = src_host
        elif (
            "/" not in href and ":" not in href and "?" not in href
            and "#" not in href and href not in (".", "..") and plain_base
        ):
            dst = base_dir + href
            h = src_host
        else:
            dst = urljoin(page_url, href)
            h = host_of(dst)
        return (dst, h) if h else None

    return src_host, resolve


def resolve_outlinks(page_url: str, html: bytes | None) -> list[tuple[str, str, bool]]:
    """[(dst_url, dst_host, is_internal)] for every followed href."""
    src_host, resolve = _make_resolver(page_url)
    out = []
    for href in extract_hrefs(html):
        r = resolve(href)
        if r is None:
            continue
        dst, h = r
        out.append((dst, h, h == src_host))
    return out


def host_id(host: str) -> int:
    """Stable non-negative int63 id for a host — hash-derived so id
    assignment needs NO global coordination at any corpus size (collision
    odds ~n^2/2^63; the top-k label attach re-reads the host string, so a
    collision could only merge two hosts' rank mass, never crash)."""
    d = hashlib.blake2b(host.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & 0x7FFF_FFFF_FFFF_FFFF


_ANCHOR_RE = re.compile(
    rb"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))"
    rb"[^>]*>(.*?)</a\s*>",
    re.IGNORECASE | re.DOTALL,
)
_INNER_TAG_RE = re.compile(r"<[^>]*>")
_ANCHOR_WS_RE = re.compile(r"\s+")


def extract_anchor_links(
    page_url: str, html: bytes | None
) -> list[tuple[str, str, bool, str]]:
    """[(dst_url, dst_host, is_internal, anchor_text)] for every followed
    href whose ``<a>`` element is properly CLOSED (unclosed anchors carry no
    delimitable text; ``extract_hrefs`` still counts them as links).
    Anchor text is tag-stripped, entity-unescaped, whitespace-collapsed."""
    if not html:
        return []
    from html import unescape

    src_host, resolve = _make_resolver(page_url)
    out = []
    for m in _ANCHOR_RE.finditer(bytes(html)):
        v = next(g for g in m.groups()[:3] if g is not None)
        href = v.decode("utf-8", errors="replace").strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        r = resolve(href)
        if r is None:
            continue
        dst, h = r
        text = _INNER_TAG_RE.sub(" ", m.group(4).decode("utf-8", errors="replace"))
        text = _ANCHOR_WS_RE.sub(" ", unescape(text)).strip()
        out.append((dst, h, h == src_host, text))
    return out
