"""Corpus-structure operators a web-crawl pipeline runs between ingest and
training-data assembly: cross-host mirror detection, histogram-exact corpus
quantiles, and a deterministic global sample.

Reference analog: the reference's dedup/statistics surface (SURVEY §2.7
dedup family, §2.5 aggregates) generalized from per-field to corpus-level
structure. All three are ANSI-SQL-exact.

- q54 mirror detection   the cross-host form of exact dedup: the same
                         content (md5 of the text) served by >= 2 distinct
                         sources — how CC-style pipelines find mirrored
                         sites. The synthetic corpus has one source per
                         doc, so the query deterministically augments it
                         with mirror copies (doc_id % 50 == 0 re-served
                         under 'mirror:'||source with doc_id+1_000_000);
                         the oracle builds the identical augmented corpus
                         in SQL. Shape: content-hash keyed two-level
                         groupby — per-(key, source) rollup, then
                         per-key distinct-source count. Both shuffles
                         carry (32-byte hash, source, ints) rows, never
                         text; hash keys are uniform so no skew.
- q55 hist quantiles     exact per-lang quantiles of n_chars WITHOUT a
                         row shuffle: per-block (lang, n_chars) count
                         partials (Arrow group_by combiner) -> one small
                         groupby over DISTINCT VALUES -> driver walks the
                         per-lang cumulative histogram. The shuffle moves
                         O(distinct values), not O(rows) — at 100 TB the
                         distinct (lang, n_chars) domain is ~1e6 rows vs
                         1e11 documents, a 1e5x reduction over the
                         sort-based exact-quantile path (q36, which stays
                         the right tool for unbounded/high-cardinality
                         value domains). Quantile definition shared with
                         the oracle: value at 1-based ascending rank
                         ceil(p*n), integer arithmetic on both sides.
- q56 corpus sample      deterministic fixed-size global sample (the
                         driverless reservoir-sampling analog): the K
                         smallest (md5('s56:'||doc_id), doc_id) keys via
                         a per-block min-K combiner, so the final sort
                         sees <= K rows per block. Re-runs and any
                         partitioning give the identical sample; rank in
                         the output is the audit trail.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min, Sum

from ..sources.tables import read_table

# ---------------------------------------------------------------------------
# q54: cross-source mirror detection
# ---------------------------------------------------------------------------

MIRROR_MOD = 50
MIRROR_ID_OFFSET = 1_000_000


def _augment_mirrors(t: pa.Table) -> pa.Table:
    """Append the deterministic mirror copies for this block's docs."""
    ids = t["doc_id"].to_numpy()
    mask = ids % MIRROR_MOD == 0
    base = pa.table(
        {"doc_id": t["doc_id"], "source": t["source"], "text": t["text"]}
    )
    if not mask.any():
        return base
    idx = pa.array(np.flatnonzero(mask))
    sub = t.take(idx)
    mirror = pa.table(
        {
            "doc_id": pa.array(sub["doc_id"].to_numpy() + MIRROR_ID_OFFSET),
            "source": pa.array(
                ["mirror:" + s for s in sub["source"].to_pylist()],
                pa.string(),
            ),
            "text": sub["text"],
        }
    )
    return pa.concat_tables([base, mirror])


def _content_keyed(t: pa.Table) -> pa.Table:
    """(content_key, source, doc_id): md5 hex of the text — one digest per
    document (not per token); text is DROPPED here, so the shuffles move
    32-byte keys + ids only."""
    keys = [
        hashlib.md5(tx.encode("utf-8")).hexdigest()
        for tx in t["text"].to_pylist()
    ]
    return pa.table(
        {
            "content_key": pa.array(keys, pa.string()),
            "source": t["source"],
            "doc_id": t["doc_id"],
        }
    )


def q54_mirror_detection(sf_dir: str):
    """Content served by >= 2 distinct sources (see module docstring)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
    keyed = docs.map_batches(_augment_mirrors, batch_format="pyarrow").map_batches(
        _content_keyed, batch_format="pyarrow"
    )

    def per_block(t: pa.Table) -> pa.Table:
        g = t.group_by(["content_key", "source"]).aggregate(
            [("doc_id", "count"), ("doc_id", "min")]
        )
        return g.rename_columns(["content_key", "source", "n", "rep"])

    per_src = (
        keyed.map_batches(per_block, batch_format="pyarrow")
        .groupby(["content_key", "source"])
        .aggregate(Sum("n", alias_name="n"), Min("rep", alias_name="rep"))
    )

    def src_rollup(t: pa.Table) -> pa.Table:
        g = t.group_by("content_key").aggregate(
            [("n", "sum"), ("source", "count"), ("rep", "min")]
        )
        return g.rename_columns(["content_key", "n_docs", "n_sources", "rep_doc"])

    # second level: per-(block) partial is NOT applied — (key, source) rows
    # were already globally reduced, so one exact groupby over them suffices
    out = (
        per_src.map_batches(src_rollup, batch_format="pyarrow")
        .groupby("content_key")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_sources", alias_name="n_sources"),
            Min("rep_doc", alias_name="rep_doc"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.greater_equal(t["n_sources"], pa.scalar(2, pa.int64()))
        t = t.filter(m)
        return pa.table(
            {
                "content_key": t["content_key"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_sources": pc.cast(t["n_sources"], pa.int64()),
                "rep_doc": pc.cast(t["rep_doc"], pa.int64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow").sort("content_key")


# ---------------------------------------------------------------------------
# q55: exact per-lang quantiles via a distinct-value histogram
# ---------------------------------------------------------------------------

_QUANTILES = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))


def _rank_ceil(a: int, b: int, n: int) -> int:
    """1-based rank ceil(a*n/b) in pure integer arithmetic (0.9*n in float64
    rounds UP for e.g. n=10 — both engines must avoid float here)."""
    return (a * n + b - 1) // b


def q55_hist_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-lang exact (p50, p90, p99, n_docs) of n_chars; the shuffle moves
    distinct (lang, n_chars) counts, never document rows."""
    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def per_block(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return g.rename_columns(["lang", "n_chars", "cnt"])

    hist = (
        docs.map_batches(per_block, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # distinct-value histogram: small by construction
    )
    rows = []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n_chars", kind="mergesort")
        vals = g["n_chars"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        qs = {
            name: int(vals[np.searchsorted(cum, _rank_ceil(a, b, n))])
            for a, b, name in _QUANTILES
        }
        rows.append({"lang": lang, "n_docs": n, **qs})
    out = pd.DataFrame(rows, columns=["lang", "n_docs", "p50", "p90", "p99"])
    return out.astype({c: "int64" for c in out.columns if c != "lang"})


# ---------------------------------------------------------------------------
# q56: deterministic global sample (driverless reservoir analog)
# ---------------------------------------------------------------------------

SAMPLE_K = 64


def _sample_key(t: pa.Table) -> pa.Table:
    keys = [
        hashlib.md5(f"s56:{i}".encode()).hexdigest()
        for i in t["doc_id"].to_pylist()
    ]
    return t.append_column("skey", pa.array(keys, pa.string()))


def q56_corpus_sample(sf_dir: str) -> pd.DataFrame:
    """The SAMPLE_K smallest (md5 key, doc_id) documents: per-block min-K
    combiner -> global sort over <= K rows/block -> rank. Deterministic
    under any partitioning; K rows to the driver."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def block_min_k(df: pd.DataFrame) -> pd.DataFrame:
        # reset_index: a pandas-format block can carry its index through
        # to_pandas() depending on which block format the sort picks —
        # returning a permuted index makes the output frame nondeterministic
        return (
            df.sort_values(["skey", "doc_id"], kind="mergesort")
            .head(SAMPLE_K)
            .reset_index(drop=True)
        )

    sample = (
        docs.map_batches(_sample_key, batch_format="pyarrow")
        .map_batches(block_min_k, batch_format="pandas")
        .sort(["skey", "doc_id"])
        .limit(SAMPLE_K)
        .to_pandas()  # K rows
        .reset_index(drop=True)
    )
    sample["rk"] = np.arange(len(sample), dtype=np.int64)
    return sample[["doc_id", "source", "n_chars", "rk"]]


# ---------------------------------------------------------------------------
# q63: crawl-to-crawl snapshot diff
# ---------------------------------------------------------------------------
# The delta operator between two corpus snapshots (what changed since the
# last crawl): the "new" snapshot is a deterministic mutation of the input
# (docs % 17 removed; surviving docs % 13 revised; docs % 29 re-added under
# a new id), and the diff classifies every differing doc_id as added /
# removed / changed by content hash. Both shuffles carry (doc_id, 32-byte
# hash, side) — never text — and the classification is ONE groupby with
# Max aggregates (each side contributes at most one row per id), fully
# vectorized: no map_groups, no driver state.

DIFF_RM_MOD = 17
DIFF_CH_MOD = 13
DIFF_ADD_MOD = 29
DIFF_ADD_OFFSET = 2_000_000
DIFF_REV = " [rev2]"


def q63_snapshot_diff(sf_dir: str):
    """(doc_id, status in added|removed|changed) sorted by doc_id."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed_sides(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        # re-added ids are doc_id + DIFF_ADD_OFFSET; a real id in that range
        # would collide and the Max-merge would silently fuse two documents
        # (the SQL oracle would not) — refuse rather than diverge
        if len(ids) and int(ids.max()) >= DIFF_ADD_OFFSET:
            raise ValueError(
                f"q63 snapshot mutation requires doc_id < {DIFF_ADD_OFFSET}; "
                "raise DIFF_ADD_OFFSET for larger corpora"
            )
        texts = t["text"].to_pylist()
        out_id, out_old, out_new = [], [], []
        for i, tx in zip(ids, texts):
            k = hashlib.md5(tx.encode()).hexdigest()
            out_id.append(int(i))
            out_old.append(k)
            out_new.append("")
            if i % DIFF_RM_MOD != 0:  # survives into the new snapshot
                k2 = (
                    hashlib.md5((tx + DIFF_REV).encode()).hexdigest()
                    if i % DIFF_CH_MOD == 0
                    else k
                )
                out_id.append(int(i))
                out_old.append("")
                out_new.append(k2)
            if i % DIFF_ADD_MOD == 0:  # re-served under a new id
                out_id.append(int(i) + DIFF_ADD_OFFSET)
                out_old.append("")
                out_new.append(k)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "k_old": pa.array(out_old, pa.string()),
                "k_new": pa.array(out_new, pa.string()),
            }
        )

    merged = (
        docs.map_batches(keyed_sides, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Max("k_old", alias_name="k_old"),
                   Max("k_new", alias_name="k_new"))
    )

    def classify(t: pa.Table) -> pa.Table:
        ko = np.asarray(t["k_old"].to_pylist())
        kn = np.asarray(t["k_new"].to_pylist())
        status = np.where(
            ko == "", "added", np.where(kn == "", "removed", "changed")
        )
        keep = (ko == "") | (kn == "") | (ko != kn)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "status": pa.array(status, pa.string()),
            }
        )
        return out.filter(pa.array(keep))

    return merged.map_batches(classify, batch_format="pyarrow").sort("doc_id")



# ---------------------------------------------------------------------------
# q71: cross-source overlap matrix
# ---------------------------------------------------------------------------

OVL_MAX_SOURCES = 16  # per-content-key source cap (hub guard, SQL-mirrored)


def q71_overlap_matrix(sf_dir: str):
    """Pairwise source-overlap counts over the mirror-augmented corpus
    (same augmentation as q54): for each content key served by 2..{cap}
    distinct sources, count every unordered source pair — the
    contamination/mirror MATRIX view (which domains copy which). Output:
    (source_a, source_b, n_shared) sorted by (source_a, source_b).

    Shape: content-key distinct-source rollup (two-level groupby, text
    dropped at the keying stage), vectorized pair expansion inside a
    map_groups over the key, pair-count groupby. Keys above the source cap
    are excluded (documented + mirrored in SQL) — the quadratic hub guard."""
    from ray.data.aggregate import Count, Sum as _Sum

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
    keyed = docs.map_batches(_augment_mirrors, batch_format="pyarrow").map_batches(
        _content_keyed, batch_format="pyarrow"
    )

    def per_block(t: pa.Table) -> pa.Table:
        g = t.group_by(["content_key", "source"]).aggregate([("doc_id", "count")])
        return g.rename_columns(["content_key", "source", "_n"])

    per_src = (
        keyed.map_batches(per_block, batch_format="pyarrow")
        .groupby(["content_key", "source"])
        .aggregate(_Sum("_n", alias_name="_n"))
    )

    def pairs(df) -> pa.Table:
        srcs = sorted(set(df["source"]))
        if len(srcs) < 2 or len(srcs) > OVL_MAX_SOURCES:
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                }
            )
        rows = [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]]
        return pa.table(
            {
                "source_a": pa.array([r[0] for r in rows], pa.string()),
                "source_b": pa.array([r[1] for r in rows], pa.string()),
            }
        )

    return (
        per_src.groupby("content_key")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["source_a", "source_b"])
        .aggregate(Count(alias_name="n_shared"))
        .sort(["source_a", "source_b"])
    )


# ---------------------------------------------------------------------------
# driver registration
# ---------------------------------------------------------------------------

QUERIES = {
    "q54_mirror_detection": q54_mirror_detection,
    "q55_hist_quantiles": q55_hist_quantiles,
    "q56_corpus_sample": q56_corpus_sample,
    "q63_snapshot_diff": q63_snapshot_diff,
    "q71_overlap_matrix": q71_overlap_matrix,
}

_AUG_SQL = f"""
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + {MIRROR_ID_OFFSET}, 'mirror:' || source, text
        FROM documents WHERE doc_id % {MIRROR_MOD} = 0
"""

ORACLE_SQL: dict[str, str] = {
    "q54_mirror_detection": f"""
        WITH aug AS ({_AUG_SQL}),
        keyed AS (
            SELECT md5(text) AS content_key, source, doc_id FROM aug
        ),
        per_src AS (
            SELECT content_key, source,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(doc_id) AS BIGINT) AS rep
            FROM keyed GROUP BY content_key, source
        )
        SELECT content_key,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(MIN(rep) AS BIGINT) AS rep_doc
        FROM per_src GROUP BY content_key
        HAVING COUNT(*) >= 2
        ORDER BY content_key
    """,
    "q55_hist_quantiles": """
        WITH ranked AS (
            SELECT lang, n_chars,
                   row_number() OVER (PARTITION BY lang ORDER BY n_chars)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS cnt
            FROM documents
        )
        SELECT lang,
               CAST(MAX(cnt) AS BIGINT) AS n_docs,
               CAST(MIN(CASE WHEN rn = (cnt + 1) // 2
                        THEN n_chars END) AS BIGINT) AS p50,
               CAST(MIN(CASE WHEN rn = (9 * cnt + 9) // 10
                        THEN n_chars END) AS BIGINT) AS p90,
               CAST(MIN(CASE WHEN rn = (99 * cnt + 99) // 100
                        THEN n_chars END) AS BIGINT) AS p99
        FROM ranked GROUP BY lang ORDER BY lang
    """,
    "q56_corpus_sample": f"""
        SELECT doc_id, source, n_chars,
               CAST(row_number() OVER (
                   ORDER BY md5('s56:' || doc_id), doc_id) - 1 AS BIGINT)
                   AS rk
        FROM documents
        QUALIFY rk < {SAMPLE_K}
        ORDER BY rk
    """,
    "q63_snapshot_diff": f"""
        WITH old AS (
            SELECT doc_id, md5(text) AS k FROM documents
        ),
        new AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {DIFF_CH_MOD} = 0
                        THEN md5(text || '{DIFF_REV}')
                        ELSE md5(text) END AS k
            FROM documents WHERE doc_id % {DIFF_RM_MOD} <> 0
            UNION ALL
            SELECT doc_id + {DIFF_ADD_OFFSET}, md5(text)
            FROM documents WHERE doc_id % {DIFF_ADD_MOD} = 0
        )
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.k <> n.k
        ORDER BY doc_id
    """,
    "q71_overlap_matrix": f"""
        WITH aug AS ({_AUG_SQL}),
        keyed AS (
            SELECT md5(text) AS content_key, source FROM aug
        ),
        per_key AS (
            SELECT content_key,
                   list_sort(list(DISTINCT source)) AS srcs
            FROM keyed GROUP BY content_key
            HAVING COUNT(DISTINCT source) BETWEEN 2 AND {OVL_MAX_SOURCES}
        ),
        pairs AS (
            SELECT srcs[i.i + 1] AS source_a, srcs[j.j + 1] AS source_b
            FROM per_key,
                 LATERAL (SELECT unnest(range(len(srcs))) AS i) i,
                 LATERAL (SELECT unnest(range(len(srcs))) AS j) j
            WHERE i.i < j.j
        )
        SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM pairs GROUP BY source_a, source_b
        ORDER BY source_a, source_b
    """,
}


# ---------------------------------------------------------------------------
# tx_vocab_growth: vocabulary-growth (Heaps' law) census — cumulative
# distinct-term count vs cumulative token count over doc_id-ordered corpus
# prefixes. The curve every tokenizer/vocab-size decision reads first.
# ---------------------------------------------------------------------------

VG_BUCKETS = 20


def tx_vocab_growth(sf_dir: str):
    """Corpus prefixes = VG_BUCKETS equal doc_id ranges (bucket =
    doc_id * B // (max_id + 1) — no density assumption, just range
    splitting). A term's contribution lands in the bucket of its FIRST
    document (groupby term -> Min(doc_id)), so per-bucket new-term counts
    sum to the cumulative vocabulary.

    Shape: per-block distinct (term, min doc_id) partials -> ONE term-keyed
    groupby Min (the only vocabulary-sized shuffle, carrying (term, int)
    pairs) -> bucket histogram (B rows); per-bucket doc/token counts are a
    map-side bincount partial -> B-row groupby. The driver joins two
    B-row tables and prefix-sums them — O(B) state. Output per bucket:
    n_docs, n_tokens, new_terms, vocab_cum, tokens_cum (all int64)."""
    import pyarrow.compute as pc
    import re

    from ray.data.aggregate import Count

    tok_re = re.compile(r"[a-z0-9]+")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_max = int(docs.max("doc_id")) + 1

    def term_first(t: pa.Table) -> pa.Table:
        first: dict[str, int] = {}
        for doc_id, text in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            for term in tok_re.findall(text.lower()):
                prev = first.get(term)
                if prev is None or doc_id < prev:
                    first[term] = doc_id
        return pa.table(
            {
                "term": pa.array(list(first), pa.string()),
                "fd": pa.array(list(first.values()), pa.int64()),
            }
        )

    new_terms_rows = (
        docs.map_batches(term_first, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Min("fd", alias_name="fd"))
        .map_batches(
            lambda t: pa.table(
                {
                    "bucket": pc.cast(
                        pc.divide(
                            pc.multiply(t["fd"], VG_BUCKETS), n_max
                        ),
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .aggregate(Count(alias_name="new_terms"))
        .take_all()
    )  # <= VG_BUCKETS rows

    def doc_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        toks = [
            len(tok_re.findall(x.lower())) for x in t["text"].to_pylist()
        ]
        bucket = [i * VG_BUCKETS // n_max for i in ids]
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "one": pa.array([1] * len(ids), pa.int64()),
                "n_tok": pa.array(toks, pa.int64()),
            }
        )

    doc_rows = (
        docs.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("one", alias_name="n_docs"),
            Sum("n_tok", alias_name="n_tokens"),
        )
        .take_all()
    )  # <= VG_BUCKETS rows

    nt = {r["bucket"]: r["new_terms"] for r in new_terms_rows}
    rows = sorted((r["bucket"], r["n_docs"], r["n_tokens"]) for r in doc_rows)
    out, vocab_cum, tokens_cum = [], 0, 0
    for b, n_docs, n_tokens in rows:
        new = nt.get(b, 0)
        vocab_cum += new
        tokens_cum += n_tokens
        out.append((b, n_docs, n_tokens, new, vocab_cum, tokens_cum))
    return pa.table(
        {
            "bucket": pa.array([r[0] for r in out], pa.int64()),
            "n_docs": pa.array([r[1] for r in out], pa.int64()),
            "n_tokens": pa.array([r[2] for r in out], pa.int64()),
            "new_terms": pa.array([r[3] for r in out], pa.int64()),
            "vocab_cum": pa.array([r[4] for r in out], pa.int64()),
            "tokens_cum": pa.array([r[5] for r in out], pa.int64()),
        }
    )


QUERIES["tx_vocab_growth"] = tx_vocab_growth

ORACLE_SQL["tx_vocab_growth"] = f"""
    WITH nn AS (SELECT MAX(doc_id) + 1 AS nd FROM documents),
    tok AS (
        SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
            '[^a-z0-9]+'), x -> x <> '')) AS term
        FROM documents
    ),
    first AS (SELECT term, MIN(doc_id) AS fd FROM tok GROUP BY term),
    fb AS (
        SELECT CAST(fd * {VG_BUCKETS} // nd AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS new_terms
        FROM first CROSS JOIN nn GROUP BY 1
    ),
    dt AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tok
        FROM documents
    ),
    db AS (
        SELECT CAST(doc_id * {VG_BUCKETS} // nd AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM dt CROSS JOIN nn GROUP BY 1
    )
    SELECT db.bucket, db.n_docs, db.n_tokens,
           CAST(COALESCE(fb.new_terms, 0) AS BIGINT) AS new_terms,
           CAST(SUM(COALESCE(fb.new_terms, 0))
                OVER (ORDER BY db.bucket) AS BIGINT) AS vocab_cum,
           CAST(SUM(db.n_tokens) OVER (ORDER BY db.bucket) AS BIGINT)
               AS tokens_cum
    FROM db LEFT JOIN fb ON fb.bucket = db.bucket
    ORDER BY db.bucket
"""


# ---------------------------------------------------------------------------
# ta_profile: column profiler — the schema/data-quality audit every engine
# runs before trusting a new corpus drop (null fractions, cardinalities,
# ranges, payload sizes). Reference analog: the reference's per-table stats
# queries (SURVEY §2.5 A1/A8) generalized to a per-COLUMN report.
#
# Shape (scales to 100 TB): distinct counts go through ONE (col, hash)
# groupby — per-block dedup first, and the shuffle carries 16-byte digests,
# never text. Min/max/null/length stats are per-block partials (5 rows per
# block) merged on the driver — O(blocks) ints, the ridge/pca partial
# pattern. Exactness caveat: n_distinct counts distinct md5 digests; a
# collision (2^-64 per pair) would undercount by one — documented trade for
# never shuffling raw text.
# ---------------------------------------------------------------------------

PROFILE_INT_COLS = ("doc_id", "n_chars")
PROFILE_STR_COLS = ("lang", "source", "text")
PROFILE_COLS = PROFILE_INT_COLS + PROFILE_STR_COLS


def ta_profile(sf_dir: str) -> pa.Table:
    """Per-column profile of the documents table: (col, n_rows, n_null,
    n_distinct, min_i, max_i, min_s, max_s, sum_len). Integer columns fill
    min_i/max_i (min_s/max_s NULL); string columns fill min_s/max_s and
    sum_len (character length, matching SQL length())."""
    from ray.data.aggregate import Count

    docs = read_table(sf_dir, "documents", columns=list(PROFILE_COLS))

    def hash_partial(t: pa.Table) -> pa.Table:
        cols, hs = [], []
        for c in PROFILE_COLS:
            vals = t[c].to_pylist()
            seen = set()
            for v in vals:
                if v is None:
                    continue
                s = str(v) if c in PROFILE_INT_COLS else v
                seen.add(hashlib.md5(s.encode("utf-8")).hexdigest())
            cols.extend([c] * len(seen))
            hs.extend(sorted(seen))
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "h": pa.array(hs, pa.string()),
            }
        )

    distinct_rows = (
        docs.map_batches(hash_partial, batch_format="pyarrow")
        .groupby(["col", "h"])
        .aggregate(Count(alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {"col": t["col"], "one": pa.array([1] * len(t), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("col")
        .aggregate(Sum("one", alias_name="n_distinct"))
        .take_all()
    )  # |PROFILE_COLS| rows
    n_distinct = {r["col"]: r["n_distinct"] for r in distinct_rows}

    def stats_partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in PROFILE_COLS:
            vals = [v for v in t[c].to_pylist()]
            nn = sum(1 for v in vals if v is None)
            live = [v for v in vals if v is not None]
            if c in PROFILE_INT_COLS:
                rows.append(
                    (c, len(vals), nn,
                     min(live) if live else None,
                     max(live) if live else None,
                     None, None, None)
                )
            else:
                rows.append(
                    (c, len(vals), nn, None, None,
                     min(live) if live else None,
                     max(live) if live else None,
                     sum(len(v) for v in live))
                )
        return pa.table(
            {
                "col": pa.array([r[0] for r in rows], pa.string()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "n_null": pa.array([r[2] for r in rows], pa.int64()),
                "min_i": pa.array([r[3] for r in rows], pa.int64()),
                "max_i": pa.array([r[4] for r in rows], pa.int64()),
                "min_s": pa.array([r[5] for r in rows], pa.string()),
                "max_s": pa.array([r[6] for r in rows], pa.string()),
                "sum_len": pa.array([r[7] for r in rows], pa.int64()),
            }
        )

    parts = docs.map_batches(stats_partial, batch_format="pyarrow").take_all()
    agg: dict[str, list] = {}
    for r in parts:  # O(blocks * n_cols) tiny rows — driver merge is exact
        a = agg.setdefault(r["col"], [0, 0, None, None, None, None, None])
        a[0] += r["n"]
        a[1] += r["n_null"]
        for i, key, lo in ((2, "min_i", True), (3, "max_i", False),
                           (4, "min_s", True), (5, "max_s", False)):
            v = r[key]
            if v is None:
                continue
            if a[i] is None or (v < a[i] if lo else v > a[i]):
                a[i] = v
        if r["sum_len"] is not None:
            a[6] = (a[6] or 0) + r["sum_len"]
    out = sorted(agg)
    return pa.table(
        {
            "col": pa.array(out, pa.string()),
            "n_rows": pa.array([agg[c][0] for c in out], pa.int64()),
            "n_null": pa.array([agg[c][1] for c in out], pa.int64()),
            "n_distinct": pa.array(
                [n_distinct.get(c, 0) for c in out], pa.int64()
            ),
            "min_i": pa.array([agg[c][2] for c in out], pa.int64()),
            "max_i": pa.array([agg[c][3] for c in out], pa.int64()),
            "min_s": pa.array([agg[c][4] for c in out], pa.string()),
            "max_s": pa.array([agg[c][5] for c in out], pa.string()),
            "sum_len": pa.array([agg[c][6] for c in out], pa.int64()),
        }
    )


QUERIES["ta_profile"] = ta_profile

_PROFILE_SQL_PARTS = []
for _c in PROFILE_INT_COLS:
    _PROFILE_SQL_PARTS.append(f"""
        SELECT '{_c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {_c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               CAST(COUNT(DISTINCT {_c}) AS BIGINT) AS n_distinct,
               CAST(MIN({_c}) AS BIGINT) AS min_i,
               CAST(MAX({_c}) AS BIGINT) AS max_i,
               CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s,
               CAST(NULL AS BIGINT) AS sum_len
        FROM documents""")
for _c in PROFILE_STR_COLS:
    _PROFILE_SQL_PARTS.append(f"""
        SELECT '{_c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {_c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               CAST(COUNT(DISTINCT {_c}) AS BIGINT) AS n_distinct,
               CAST(NULL AS BIGINT) AS min_i, CAST(NULL AS BIGINT) AS max_i,
               MIN({_c}) AS min_s, MAX({_c}) AS max_s,
               CAST(SUM(length({_c})) AS BIGINT) AS sum_len
        FROM documents""")

ORACLE_SQL["ta_profile"] = (
    "SELECT * FROM ("
    + " UNION ALL ".join(_PROFILE_SQL_PARTS)
    + ") ORDER BY col"
)


# ---------------------------------------------------------------------------
# ta_drift: distribution drift between two corpus halves — the
# data-quality monitor a crawl pipeline runs between snapshots: does the
# language mix of the newer half differ from the older half? Chi-square
# contingency statistic over (half, lang) counts, computed in EXACT
# integers (cell term = 1e6·(O·N − rt·ct)² // (rt·ct·N), floor per cell,
# mirrored verbatim in SQL via HUGEINT). Shape: one (half, lang) count
# groupby — cells = 2×|langs| rows to the driver; the bound reduce for
# the half split is Min/Max over doc_id.
# ---------------------------------------------------------------------------

def ta_drift(sf_dir: str) -> pa.Table:
    """(lang, n_first, n_second, chi2_cells_ppm) per language, sorted —
    chi2_cells_ppm sums the language's two contingency-cell terms."""
    from ray.data.aggregate import Count
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    b = ds.aggregate(_Min("doc_id"), _Max("doc_id"))
    mid = (int(b["min(doc_id)"]) + int(b["max(doc_id)"]) + 1) // 2

    def half_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        half = pc.cast(
            pc.greater_equal(t["doc_id"], pa.scalar(mid)), pa.int64()
        )
        return pa.table({"half": half, "lang": t["lang"]})

    counts = (
        ds.map_batches(half_rows, batch_format="pyarrow")
        .groupby(["half", "lang"])
        .aggregate(Count(alias_name="n"))
        .take_all()  # cells: 2 x |langs| rows
    )
    obs: dict[tuple[int, str], int] = {
        (int(r["half"]), r["lang"]): int(r["n"]) for r in counts
    }
    langs = sorted({k[1] for k in obs})
    row_tot = {h: sum(v for (hh, _), v in obs.items() if hh == h)
               for h in (0, 1)}
    col_tot = {g: sum(v for (_, gg), v in obs.items() if gg == g)
               for g in langs}
    n_total = sum(obs.values())

    n_first, n_second, chi2 = [], [], []
    for g in langs:
        cells = 0
        for h in (0, 1):
            o = obs.get((h, g), 0)
            rt, ct = row_tot[h], col_tot[g]
            if rt and ct:
                cells += (
                    1_000_000 * (o * n_total - rt * ct) ** 2
                    // (rt * ct * n_total)
                )
        n_first.append(obs.get((0, g), 0))
        n_second.append(obs.get((1, g), 0))
        chi2.append(cells)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_first": pa.array(n_first, pa.int64()),
            "n_second": pa.array(n_second, pa.int64()),
            "chi2_cells_ppm": pa.array(chi2, pa.int64()),
        }
    )


QUERIES["ta_drift"] = ta_drift

ORACLE_SQL["ta_drift"] = """
    WITH b AS (
        SELECT (MIN(doc_id) + MAX(doc_id) + 1) // 2 AS mid FROM documents
    ),
    o AS (
        SELECT CASE WHEN doc_id >= (SELECT mid FROM b) THEN 1 ELSE 0 END
                   AS half,
               lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT half, SUM(n) AS rt FROM o GROUP BY half),
    ct AS (SELECT lang, SUM(n) AS ct FROM o GROUP BY lang),
    tot AS (SELECT SUM(n) AS nt FROM o),
    grid AS (
        SELECT h.half, c.lang FROM (SELECT DISTINCT half FROM o) h
        CROSS JOIN (SELECT DISTINCT lang FROM o) c
    ),
    cells AS (
        SELECT g.lang, g.half, COALESCE(o.n, 0) AS n,
               CAST(1000000 AS HUGEINT)
               * (COALESCE(o.n, 0) * tot.nt - rt.rt * ct.ct)
               * (COALESCE(o.n, 0) * tot.nt - rt.rt * ct.ct)
               // (rt.rt * ct.ct * tot.nt) AS term
        FROM grid g
        LEFT JOIN o ON o.half = g.half AND o.lang = g.lang
        JOIN rt ON rt.half = g.half
        JOIN ct ON ct.lang = g.lang
        CROSS JOIN tot
    )
    SELECT lang,
           CAST(SUM(CASE WHEN half = 0 THEN n ELSE 0 END) AS BIGINT)
               AS n_first,
           CAST(SUM(CASE WHEN half = 1 THEN n ELSE 0 END) AS BIGINT)
               AS n_second,
           CAST(SUM(term) AS BIGINT) AS chi2_cells_ppm
    FROM cells GROUP BY lang ORDER BY lang
"""
