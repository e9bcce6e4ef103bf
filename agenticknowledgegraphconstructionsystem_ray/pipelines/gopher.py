"""Rule-based quality filtering and importance weighting over the documents
table — the two standard steps between web-crawl cleaning and training-data
assembly.

Reference analog: the reference's validation rule set (SURVEY §2.9 kernel 4,
`validation-agent.ts` rule constants) is a per-record boolean rule battery;
these operators apply the same shape to corpus quality (Gopher-style
repetition/length rules, Rae et al. 2021, arXiv:2112.11446) and to
importance-weighted data selection (DSIR, Xie et al. 2023,
arXiv:2302.03169 — hashed n-gram features, target/raw log-ratio weights).

- q57 gopher rules       per-document rule battery, fully vectorizable and
                         embarrassingly parallel (ONE map_batches, no
                         shuffle before the output sort): word-count
                         bounds, mean-word-length bounds, symbol-to-word
                         ratio, distinct-stopword floor. All comparisons
                         are integer cross-multiplications (no float), so
                         the SQL mirror is bit-exact. The per-rule flags
                         are emitted (not just the verdict) because a real
                         pipeline tunes thresholds from per-rule rejection
                         rates.
- q58 importance weights DSIR's integer-exact skeleton: tokens hash into
                         256 md5-prefix feature buckets; pass 1 counts
                         (raw, target) occurrences per bucket (per-block
                         combiner -> one 256-row groupby -> driver dict);
                         pass 2 broadcasts the 256-entry weight table and
                         scores every document in one dict-lookup pass.
                         weight(f) = target_cnt(f) * 1e6 // raw_cnt(f) —
                         the count-ratio analog of the DSIR log-ratio,
                         monotone in target affinity, integer-exact. The
                         target domain here is lang='en' documents.

Scale notes (100 TB): q57 touches each document once with zero shuffles.
q58's shuffle carries at most 256 rows per block (the feature domain), the
weight table broadcast is 256 entries regardless of corpus size, and the
scoring pass is map-only — the DSIR shape is designed exactly so that the
"distribution" state is O(buckets), never O(vocabulary).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray

from ray.data.aggregate import Sum

from ..sources.tables import read_table
from ..runtime import cluster_cpus
from ..stages.textstats import LANG_STOPWORDS

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_SYM_RE = re.compile(r"[^a-zA-Z0-9\s]")

# ---------------------------------------------------------------------------
# q57: Gopher-style quality rule battery
# ---------------------------------------------------------------------------

# Thresholds chosen to discriminate on the synthetic corpus (sf0.001:
# n_words 10..99 median 56, mean word length 3.69..5.08, stop hits 0..2).
MIN_WORDS, MAX_WORDS = 30, 80
MIN_MEAN_LEN, MAX_MEAN_LEN = 4, 10  # integer bounds, compared cross-multiplied
MIN_STOP_HITS = 2
_STOPS = frozenset(LANG_STOPWORDS["en"])


def _gopher_batch(t: pa.Table) -> pa.Table:
    """One pass per document: token counts + rule flags. The token loop IS
    the tokenizer (regex over text); everything downstream is columnar."""
    n_words, sum_len, n_stop, n_sym = [], [], [], []
    for text in t["text"].to_pylist():
        toks = _TOKEN_RE.findall(text.lower())
        n_words.append(len(toks))
        sum_len.append(sum(len(w) for w in toks))
        n_stop.append(len(set(toks) & _STOPS))
        n_sym.append(len(_SYM_RE.findall(text)))
    nw = np.asarray(n_words, dtype=np.int64)
    sl = np.asarray(sum_len, dtype=np.int64)
    ns = np.asarray(n_stop, dtype=np.int64)
    sym = np.asarray(n_sym, dtype=np.int64)
    r_nwords = (nw >= MIN_WORDS) & (nw <= MAX_WORDS)
    # mean word length in [MIN, MAX] without division: guard nw=0 as fail
    r_wordlen = (nw > 0) & (sl >= MIN_MEAN_LEN * nw) & (sl <= MAX_MEAN_LEN * nw)
    r_stop = ns >= MIN_STOP_HITS
    r_symbol = 2 * sym <= nw  # symbol-to-word ratio <= 0.5
    keep = r_nwords & r_wordlen & r_stop & r_symbol
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": pa.array(nw, pa.int64()),
            "sum_word_len": pa.array(sl, pa.int64()),
            "n_stop": pa.array(ns, pa.int64()),
            "n_symbols": pa.array(sym, pa.int64()),
            "r_nwords": pa.array(r_nwords.astype(np.int64), pa.int64()),
            "r_wordlen": pa.array(r_wordlen.astype(np.int64), pa.int64()),
            "r_stop": pa.array(r_stop.astype(np.int64), pa.int64()),
            "r_symbol": pa.array(r_symbol.astype(np.int64), pa.int64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        }
    )


def q57_gopher_rules(sf_dir: str):
    """Per-document Gopher rule flags + keep verdict (see module docstring)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_gopher_batch, batch_format="pyarrow").sort("doc_id")



# ---------------------------------------------------------------------------
# q72: per-source (domain) quality rollup
# ---------------------------------------------------------------------------

_Q_SCALE = 1_000_000


def q72_source_quality(sf_dir: str):
    """Domain-level curation view: per source, document count, Gopher keep
    count, integer keep rate (ppm) and mean words per doc (x100) — the
    aggregation a crawl pipeline uses to rank/blocklist whole domains.
    Shape: the q57 flag kernel + per-block (source) partial rollup ->
    one tiny groupby(source). Output sorted by source."""
    import pyarrow.compute as pc

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def flags_with_source(t: pa.Table) -> pa.Table:
        f = _gopher_batch(t).append_column("source", t["source"])
        g = f.group_by("source").aggregate(
            [("doc_id", "count"), ("keep", "sum"), ("n_words", "sum")]
        )
        return g.rename_columns(["source", "n_docs", "n_keep", "n_words"])

    out = (
        docs.map_batches(flags_with_source, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_keep", alias_name="n_keep"),
            Sum("n_words", alias_name="n_words"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].combine_chunks().to_numpy(zero_copy_only=False)
        nk = t["n_keep"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = t["n_words"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_keep": pc.cast(t["n_keep"], pa.int64()),
                "keep_ppm": pa.array(nk * _Q_SCALE // nd, pa.int64()),
                "mean_words_x100": pa.array(nw * 100 // nd, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("source")

# ---------------------------------------------------------------------------
# q58: DSIR-shape hashed importance weights
# ---------------------------------------------------------------------------

_W_SCALE = 1_000_000
TARGET_LANG = "en"


def _feat(term: str) -> str:
    """256-bucket hashed feature: first hex byte of md5 (mirrors SQL
    substr(md5(term), 1, 2))."""
    return hashlib.md5(term.encode("utf-8")).hexdigest()[:2]


class _FeatCache:
    """Per-actor term->feature memo so md5 runs once per distinct term."""

    def __init__(self) -> None:
        self.memo: dict[str, str] = {}

    def get(self, term: str) -> str:
        f = self.memo.get(term)
        if f is None:
            f = self.memo[term] = _feat(term)
        return f


def _feature_counts(t: pa.Table, cache: _FeatCache) -> pa.Table:
    """Per-block (feature, raw, tgt) partial counts — at most 256 rows out."""
    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    for text, lang in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
        is_tgt = lang == TARGET_LANG
        for tok in _TOKEN_RE.findall(text.lower()):
            f = cache.get(tok)
            raw[f] = raw.get(f, 0) + 1
            if is_tgt:
                tgt[f] = tgt.get(f, 0) + 1
    feats = sorted(raw)
    return pa.table(
        {
            "f": pa.array(feats, pa.string()),
            "raw": pa.array([raw[f] for f in feats], pa.int64()),
            "tgt": pa.array([tgt.get(f, 0) for f in feats], pa.int64()),
        }
    )


class _CountFeatures:
    def __init__(self) -> None:
        self.cache = _FeatCache()

    def __call__(self, t: pa.Table) -> pa.Table:
        return _feature_counts(t, self.cache)


class _ScoreDocs:
    """Broadcast 256-entry weight table, fetched once per actor."""

    def __init__(self, ref) -> None:
        self.w: dict[str, int] = ray.get(ref)
        self.cache = _FeatCache()

    def __call__(self, t: pa.Table) -> pa.Table:
        w, cache = self.w, self.cache
        n_tokens, weights = [], []
        for text in t["text"].to_pylist():
            toks = _TOKEN_RE.findall(text.lower())
            n_tokens.append(len(toks))
            weights.append(sum(w.get(cache.get(tok), 0) for tok in toks))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "weight_ppm": pa.array(weights, pa.int64()),
            }
        )


def q58_importance_weights(sf_dir: str):
    """Hashed importance weights vs the lang='en' target domain (see module
    docstring). Two passes; state is O(256) everywhere."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    counts = (
        docs.map_batches(_CountFeatures, batch_format="pyarrow", concurrency=(1, cluster_cpus()))
        .groupby("f")
        .aggregate(Sum("raw", alias_name="raw"), Sum("tgt", alias_name="tgt"))
        .take_all()  # <= 256 rows by construction
    )
    weights = {r["f"]: r["tgt"] * _W_SCALE // r["raw"] for r in counts}
    ref = ray.put(weights)
    return (
        docs.map_batches(
            _ScoreDocs,
            fn_constructor_kwargs={"ref": ref},
            batch_format="pyarrow",
            concurrency=(1, cluster_cpus()),
        )
        .sort("doc_id")
    )


# ---------------------------------------------------------------------------
# driver registration
# ---------------------------------------------------------------------------

QUERIES = {
    "q57_gopher_rules": q57_gopher_rules,
    "q58_importance_weights": q58_importance_weights,
    "q72_source_quality": q72_source_quality,
}

_STOP_SQL = ",".join(f"'{w}'" for w in sorted(_STOPS))

_TOK_LANG_SQL = (
    "SELECT doc_id, lang, unnest(list_filter(regexp_split_to_array("
    "lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term FROM documents"
)

ORACLE_SQL: dict[str, str] = {
    "q57_gopher_rules": f"""
        WITH tok AS ({_TOK_LANG_SQL}),
        agg AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(length(term)) AS BIGINT) AS sum_word_len,
                   CAST(COUNT(DISTINCT CASE WHEN term IN ({_STOP_SQL})
                        THEN term END) AS BIGINT) AS n_stop
            FROM tok GROUP BY doc_id
        ),
        per_doc AS (
            SELECT d.doc_id,
                   COALESCE(a.n_words, 0) AS n_words,
                   COALESCE(a.sum_word_len, 0) AS sum_word_len,
                   COALESCE(a.n_stop, 0) AS n_stop,
                   CAST(length(regexp_replace(d.text, '[a-zA-Z0-9\\s]', '',
                        'g')) AS BIGINT) AS n_symbols
            FROM documents d LEFT JOIN agg a USING (doc_id)
        )
        SELECT doc_id, n_words, sum_word_len, n_stop, n_symbols,
               CAST(CASE WHEN n_words >= {MIN_WORDS}
                          AND n_words <= {MAX_WORDS}
                    THEN 1 ELSE 0 END AS BIGINT) AS r_nwords,
               CAST(CASE WHEN n_words > 0
                          AND sum_word_len >= {MIN_MEAN_LEN} * n_words
                          AND sum_word_len <= {MAX_MEAN_LEN} * n_words
                    THEN 1 ELSE 0 END AS BIGINT) AS r_wordlen,
               CAST(CASE WHEN n_stop >= {MIN_STOP_HITS}
                    THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
               CAST(CASE WHEN 2 * n_symbols <= n_words
                    THEN 1 ELSE 0 END AS BIGINT) AS r_symbol,
               CAST(CASE WHEN n_words >= {MIN_WORDS}
                          AND n_words <= {MAX_WORDS}
                          AND n_words > 0
                          AND sum_word_len >= {MIN_MEAN_LEN} * n_words
                          AND sum_word_len <= {MAX_MEAN_LEN} * n_words
                          AND n_stop >= {MIN_STOP_HITS}
                          AND 2 * n_symbols <= n_words
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM per_doc
        ORDER BY doc_id
    """,
    "q58_importance_weights": f"""
        WITH tok AS ({_TOK_LANG_SQL}),
        feat AS (SELECT doc_id, lang, substr(md5(term), 1, 2) AS f FROM tok),
        cnts AS (
            SELECT f,
                   CAST(COUNT(*) AS BIGINT) AS raw,
                   CAST(SUM(CASE WHEN lang = '{TARGET_LANG}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS tgt
            FROM feat GROUP BY f
        ),
        w AS (SELECT f, tgt * {_W_SCALE} // raw AS w FROM cnts),
        agg AS (
            SELECT feat.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(w.w) AS BIGINT) AS weight_ppm
            FROM feat JOIN w USING (f) GROUP BY feat.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(a.weight_ppm, 0) AS BIGINT) AS weight_ppm
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
    """,
    "q72_source_quality": f"""
        WITH tok AS ({_TOK_LANG_SQL}),
        agg AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(length(term)) AS BIGINT) AS sum_word_len,
                   CAST(COUNT(DISTINCT CASE WHEN term IN ({_STOP_SQL})
                        THEN term END) AS BIGINT) AS n_stop
            FROM tok GROUP BY doc_id
        ),
        per_doc AS (
            SELECT d.doc_id, d.source,
                   COALESCE(a.n_words, 0) AS n_words,
                   COALESCE(a.sum_word_len, 0) AS sum_word_len,
                   COALESCE(a.n_stop, 0) AS n_stop,
                   CAST(length(regexp_replace(d.text, '[a-zA-Z0-9\\s]', '',
                        'g')) AS BIGINT) AS n_symbols
            FROM documents d LEFT JOIN agg a USING (doc_id)
        ),
        flags AS (
            SELECT source, n_words,
                   CASE WHEN n_words >= {MIN_WORDS}
                         AND n_words <= {MAX_WORDS}
                         AND n_words > 0
                         AND sum_word_len >= {MIN_MEAN_LEN} * n_words
                         AND sum_word_len <= {MAX_MEAN_LEN} * n_words
                         AND n_stop >= {MIN_STOP_HITS}
                         AND 2 * n_symbols <= n_words
                    THEN 1 ELSE 0 END AS keep
            FROM per_doc
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(keep) AS BIGINT) AS n_keep,
               CAST(SUM(keep) * {_Q_SCALE} // COUNT(*) AS BIGINT) AS keep_ppm,
               CAST(SUM(n_words) * 100 // COUNT(*) AS BIGINT)
                   AS mean_words_x100
        FROM flags GROUP BY source ORDER BY source
    """,
}
