"""Frequent-itemset mining (a-priori level 2) over document term sets.

Reference parity: extends the reference's term-frequency analytics (SURVEY.md
§2 A4 / q14's shape) to term CO-occurrence — "which frequent terms appear
together in documents" is the classic market-basket operator, and on a web
corpus it surfaces collocations/boilerplate the mixture pipeline wants to
know about.

Scale shape (100 TB): the a-priori prune IS the scale story — L1 (terms with
document-support >= minsup) is bounded by avg_distinct_terms_per_doc / s
regardless of corpus size, so it broadcasts via ray.put; pair generation per
document touches only L1∩doc (int codes, numpy triu), and per-block pair
partials are combined BEFORE the one pair groupby. No stage is ever
vocabulary- or corpus-sized on the driver except the intentionally tiny L1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Sum

from ..sources.tables import read_table
from .analytics import _TOKEN_RE

SUP_DEN = 20  # minsup = max(2, n_docs // 20)  (5% document support)


def _minsup(n_docs: int) -> int:
    return max(2, n_docs // SUP_DEN)


def _doc_terms(text: str) -> set[str]:
    return set(_TOKEN_RE.findall(text.lower()))


def q82_frequent_pairs(sf_dir: str):
    """(term_a, term_b, support) for every pair of frequent terms with
    pair-document-support >= minsup, term_a < term_b, sorted."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    n_docs = docs.count()
    minsup = _minsup(n_docs)

    # --- pass 1: document frequency per term (combiner -> one groupby) ---
    def df_partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in t["text"].to_pylist():
            for tok in _doc_terms(text):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    l1_rows = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="df"))
        .filter(expr=f"df >= {minsup}")
        .take_all()  # L1: bounded by avg_terms_per_doc / support — small
    )
    l1 = sorted(r["term"] for r in l1_rows)
    code_of = {t: i for i, t in enumerate(l1)}
    l1_ref = ray.put(code_of)

    # --- pass 2: per-doc L1∩doc pair partials (combiner) -> one groupby ---
    def pair_partial(t: pa.Table) -> pa.Table:
        codes = ray.get(l1_ref)
        k = len(codes)
        counts: dict[int, int] = {}
        for text in t["text"].to_pylist():
            present = sorted(
                {codes[tok] for tok in _doc_terms(text) if tok in codes}
            )
            arr = np.asarray(present, dtype=np.int64)
            if arr.size < 2:
                continue
            a, b = np.triu_indices(arr.size, k=1)
            for key in (arr[a] * k + arr[b]).tolist():
                counts[key] = counts.get(key, 0) + 1
        return pa.table(
            {
                "pkey": pa.array(list(counts), pa.int64()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    sup = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pkey")
        .aggregate(Sum("n", alias_name="support"))
        .filter(expr=f"support >= {minsup}")
    )

    k = len(l1)

    def decode(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.schema(
                [("term_a", pa.string()), ("term_b", pa.string()),
                 ("support", pa.int64())]
            ).empty_table()
        keys = t["pkey"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "term_a": pa.array([l1[i] for i in keys // k], pa.string()),
                "term_b": pa.array([l1[i] for i in keys % k], pa.string()),
                "support": pa.compute.cast(t["support"], pa.int64()),
            }
        )

    return sup.map_batches(decode, batch_format="pyarrow").sort(
        ["term_a", "term_b"]
    )


QUERIES = {
    "q82_frequent_pairs": q82_frequent_pairs,
}

ORACLE_SQL: dict[str, str] = {
    "q82_frequent_pairs": f"""
        WITH n AS (
            SELECT GREATEST(2, COUNT(*) // {SUP_DEN}) AS minsup
            FROM documents
        ),
        terms AS (
            SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> x <> '')) AS term
                FROM documents)
        ),
        l1 AS (
            SELECT term FROM terms GROUP BY term
            HAVING COUNT(*) >= (SELECT minsup FROM n)
        ),
        ft AS (SELECT doc_id, term FROM terms
               WHERE term IN (SELECT term FROM l1))
        SELECT a.term AS term_a, b.term AS term_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM ft a JOIN ft b
          ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY a.term, b.term
        HAVING COUNT(*) >= (SELECT minsup FROM n)
        ORDER BY term_a, term_b
    """,
}
