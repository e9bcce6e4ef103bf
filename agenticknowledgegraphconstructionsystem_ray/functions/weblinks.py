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


def resolve_outlinks(page_url: str, html: bytes | None) -> list[tuple[str, str, bool]]:
    """[(dst_url, dst_host, is_internal)] for every followed href.

    Hot path: absolute http(s) targets and root-relative paths — the two
    shapes covering ~all real links — resolve with string slicing (one
    urlsplit per PAGE, none per link); everything else falls back to
    RFC-3986 ``urljoin``. Both paths produce byte-identical results, and
    the kernel is shared with the sequential golden either way."""
    parts = urlsplit(page_url)
    src_host = parts.netloc.lower()
    base_root = f"{parts.scheme}://{parts.netloc}"
    base_dir = page_url.rsplit("/", 1)[0] + "/" if "/" in parts.path else base_root + "/"
    out = []
    for href in extract_hrefs(html):
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
            and "#" not in href and href not in (".", "..")
            and not parts.query and not parts.fragment
        ):
            dst = base_dir + href
            h = src_host
        else:
            dst = urljoin(page_url, href)
            h = host_of(dst)
        if not h:
            continue
        out.append((dst, h, h == src_host))
    return out


def host_id(host: str) -> int:
    """Stable non-negative int63 id for a host — hash-derived so id
    assignment needs NO global coordination at any corpus size (collision
    odds ~n^2/2^63; the top-k label attach re-reads the host string, so a
    collision could only merge two hosts' rank mass, never crash)."""
    d = hashlib.blake2b(host.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & 0x7FFF_FFFF_FFFF_FFFF
