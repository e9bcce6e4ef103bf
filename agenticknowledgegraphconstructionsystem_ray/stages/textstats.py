"""Text analysis for training-data pipelines: language-ID (stopword n-gram
heuristic), quality scoring, token-class counting (BPE-ish regex), and
rolling-hash document fingerprinting.

All scores are integers or integer-derived so SQL oracles can match
bit-exactly; the fingerprint (polynomial rolling hash + winnowing) has no SQL
analog and is covered by unit tests instead.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# Deterministic stopword evidence lists (tiny, embedded — no models in the
# container). Order defines the tie-break priority.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "los", "las", "es", "no", "por", "una", "para", "como", "pero"),
}
LANG_ORDER = tuple(LANG_STOPWORDS)

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_WORD_RE = re.compile(r"[a-z]+")
_NUM_RE = re.compile(r"[0-9]+")
_OTHER_RE = re.compile(r"[^a-z0-9\s]")
_PUNCT_RE = re.compile(r"[.,;:!?]")


_LANG_STOPSETS = {lang: frozenset(sw) for lang, sw in LANG_STOPWORDS.items()}


def lang_hits(text: str) -> dict[str, int]:
    """Per-language count of DISTINCT stopword hits in the token set."""
    toks = set(_TOKEN_RE.findall(text.lower()))
    return {lang: len(toks & sw) for lang, sw in _LANG_STOPSETS.items()}


def _detect_from_hits(hits: dict[str, int]) -> str:
    best = max(LANG_ORDER, key=lambda lang: (hits[lang], -LANG_ORDER.index(lang)))
    return best if hits[best] > 0 else "unknown"


def detect_lang(text: str) -> str:
    """argmax over stopword hits, ties broken by LANG_ORDER; 'unknown' when
    no evidence."""
    return _detect_from_hits(lang_hits(text))


def langid_batch(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    hits = [lang_hits(x) for x in texts]  # tokenize once per document
    cols = {"doc_id": t["doc_id"]}
    for lang in LANG_ORDER:
        cols[f"hits_{lang}"] = pa.array([h[lang] for h in hits], pa.int64())
    cols["lang_detected"] = pa.array(
        [_detect_from_hits(h) for h in hits], pa.string()
    )
    return pa.table(cols)


def quality_batch(t: pa.Table) -> pa.Table:
    """Quality components + bucket. Buckets use integer-exact ratios so the
    SQL mirror compares identically:
    high  : n_tokens >= 50 AND stop_hits >= 3 AND punct*4 <= n_tokens
    low   : n_tokens < 10 OR stop_hits = 0
    medium: otherwise."""
    texts = t["text"].to_pylist()
    lower = [x.lower() for x in texts]
    n_tokens = [len(_TOKEN_RE.findall(x)) for x in lower]
    stop_en = [len(set(_TOKEN_RE.findall(x)) & set(LANG_STOPWORDS["en"])) for x in lower]
    n_punct = [len(_PUNCT_RE.findall(x)) for x in texts]
    buckets = []
    for nt, se, np_ in zip(n_tokens, stop_en, n_punct):
        if nt >= 50 and se >= 3 and np_ * 4 <= nt:
            buckets.append("high")
        elif nt < 10 or se == 0:
            buckets.append("low")
        else:
            buckets.append("medium")
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "stop_hits_en": pa.array(stop_en, pa.int64()),
            "n_punct": pa.array(n_punct, pa.int64()),
            "quality": pa.array(buckets, pa.string()),
        }
    )


def token_classes_batch(t: pa.Table) -> pa.Table:
    """BPE-ish token-class counting over lowercased text: word runs, digit
    runs, non-space symbols (M3/token-counting analog)."""
    lower = [x.lower() for x in t["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_word_tokens": pa.array([len(_WORD_RE.findall(x)) for x in lower], pa.int64()),
            "n_num_tokens": pa.array([len(_NUM_RE.findall(x)) for x in lower], pa.int64()),
            "n_symbols": pa.array([len(_OTHER_RE.findall(x)) for x in lower], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Rolling-hash fingerprint (winnowing) — no SQL analog; unit-tested.
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1_000_003)
_FP_WINDOW = 8  # k-gram window for winnowing


def winnow_set(text: str, window: int = _FP_WINDOW) -> list[int]:
    """Sorted distinct winnowed fingerprints (Schleimer, Wilkerson & Aiken
    2003, "Winnowing: local algorithms for document fingerprinting"):
    polynomial rolling hash over token k-grams, then the minimum of each
    sliding window of ``window`` gram hashes. The shared pure kernel for
    fingerprint() and the cross-document pair detector."""
    import hashlib

    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < window:
        toks = toks + ["\x00"] * (window - len(toks)) if toks else ["\x00"] * window
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            for t in toks
        ),
        dtype=np.uint64,
        count=len(toks),
    )
    n = len(hs) - window + 1
    with np.errstate(over="ignore"):
        grams = np.zeros(n, dtype=np.uint64)
        for j in range(window):
            grams = grams * _FP_BASE + hs[j : j + n]
    # winnowing: minimum per sliding window of size `window` over gram hashes
    mins = set()
    for i in range(max(1, n - window + 1)):
        mins.add(int(np.min(grams[i : i + window])))
    return sorted(mins)


def fingerprint(text: str, window: int = _FP_WINDOW) -> tuple[int, int]:
    """(min_fingerprint, n_distinct_fingerprints) via the winnow_set
    kernel. Deterministic; shifting the text by whole tokens preserves
    interior fingerprints (tested)."""
    mins = winnow_set(text, window)
    return mins[0], len(mins)


def fingerprint_batch(t: pa.Table) -> pa.Table:
    res = [fingerprint(x) for x in t["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "fp_min": pa.array([np.uint64(r[0]) for r in res], pa.uint64()),
            "n_fps": pa.array([r[1] for r in res], pa.int64()),
        }
    )

ZLIB_LEVEL = 6  # fixed level: zlib output is deterministic per (input, level)


def zlib_ratio_batch(t: pa.Table) -> pa.Table:
    """Compression-ratio quality proxy (the classic cheap repetition /
    gibberish detector: highly repetitive text compresses far below prose,
    random noise barely compresses). ratio_ppm = deflated bytes * 1e6 //
    raw utf-8 bytes; integer-only output (NOTES invariant 2). Each row is
    one C zlib call — the batch loop is not the hot path."""
    import zlib

    n_bytes, n_comp, ratio = [], [], []
    for text in t["text"].to_pylist():
        raw = text.encode("utf-8")
        comp = zlib.compress(raw, ZLIB_LEVEL)
        n_bytes.append(len(raw))
        n_comp.append(len(comp))
        ratio.append(len(comp) * 1_000_000 // max(len(raw), 1))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "n_comp": pa.array(n_comp, pa.int64()),
            "ratio_ppm": pa.array(ratio, pa.int64()),
        }
    )


def term_count_partial(t: "pa.Table") -> "pa.Table":
    """Per-block TOTAL term counts -> (term, n_p) rows: THE shared combiner
    for every q14-family count shuffle (q14/q49/q64/q70/sk_cms). One
    definition so a tokenization change cannot silently fork the counters."""
    import pyarrow as pa

    counts: dict[str, int] = {}
    for text in t["text"].to_pylist():
        for tok in _TOKEN_RE.findall(text.lower()):
            counts[tok] = counts.get(tok, 0) + 1
    return pa.table(
        {
            "term": pa.array(list(counts.keys()), pa.string()),
            "n_p": pa.array(list(counts.values()), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# cross-document winnowing pairs — the MOSS shape: two documents that share
# >= WN_MIN_SHARED selected fingerprints are copy/plagiarism candidates.
# Scale shape: (fingerprint, doc) postings into ONE fingerprint-keyed
# groupby; a posting list longer than WN_CAP is a corpus-common fingerprint
# (boilerplate) and is DROPPED before pair generation — the same hot-bucket
# cap as the LSH band path, and the documented bound that keeps pair
# generation O(cap^2) per fingerprint instead of all-pairs.
# ---------------------------------------------------------------------------

WN_CAP = 64
WN_MIN_SHARED = 2


def winnow_pairs(sf_dir_or_ds, table: str = "documents") -> pa.Table:
    """(doc_a, doc_b, n_shared) for document pairs sharing >= WN_MIN_SHARED
    winnowed fingerprints, sorted. doc_a < doc_b."""
    import ray.data as rd

    from ray.data.aggregate import Sum

    from ..sources.tables import read_table

    docs = (
        sf_dir_or_ds
        if isinstance(sf_dir_or_ds, rd.Dataset)
        else read_table(sf_dir_or_ds, table, columns=["doc_id", "text"])
    )

    def postings(t: pa.Table) -> pa.Table:
        fps, ids = [], []
        for doc_id, text in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            for fp in winnow_set(text):
                fps.append(fp)
                ids.append(doc_id)
        return pa.table(
            {
                "fp": pa.array(np.asarray(fps, np.uint64), pa.uint64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    def bucket_pairs(df) -> pa.Table:
        ids = sorted(set(df["doc_id"].tolist()))
        if len(ids) < 2 or len(ids) > WN_CAP:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n_p": pa.array([], pa.int64()),
                }
            )
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "n_p": pa.array(np.ones(len(a), np.int64), pa.int64()),
            }
        )

    res = (
        docs.map_batches(postings, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("n_p", alias_name="n_shared"))
        .filter(expr=f"n_shared >= {WN_MIN_SHARED}")
        .sort(["a", "b"])
    )
    t = pa.concat_tables(
        [b for b in res.iter_batches(batch_format="pyarrow", batch_size=None)]
    )
    return t.rename_columns(["doc_a", "doc_b", "n_shared"])
