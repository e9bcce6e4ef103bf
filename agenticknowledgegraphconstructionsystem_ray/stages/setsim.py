"""Exact set-similarity self-join via PREFIX FILTERING (q86).

Find every document pair whose DISTINCT word-3-gram sets have Jaccard >= tau
(default 1/2) — the exact-answer cousin of MinHash-LSH (stages/dedup.py finds
*approximately* this set; here the candidate generation itself is lossless).

Algorithm (public: Chaudhuri/Ganti/Kaushik SSJoin 2006, Bayardo/Ma/Srikant
"Scaling Up All Pairs" WWW'07): under ANY global total order of tokens, if
Jaccard(A, B) >= tau then the first ``|A| - ceil(tau*|A|) + 1`` tokens of A
and the corresponding prefix of B must intersect. So:

1. one pass: distinct shingles per doc (rows ``(term, doc_id)``);
2. document frequency per shingle via groupby (the combiner-backed A4
   shape); only shingles with df >= 2 can ever witness a pair, and that
   *shared* sub-vocabulary — far smaller than the full vocabulary — is the
   broadcast small side (``ray.put`` once);
3. second pass: per doc, sort its shingles by (df ASC, term) — the
   canonical order that puts RARE shingles in prefixes — emit only the
   prefix tokens with df >= 2 as blocking keys;
4. groupby blocking key -> within-bucket pairs. Bucket size is the df of a
   token that some member ranked among its rarest — big buckets arise only
   from genuinely-duplicated content, where the true answer itself is
   quadratic (same argument as the SymSpell join, pipelines/fuzzy.py);
5. pair-level groupby dedup, then EXACT Jaccard verification as a
   distributed pair<->payload join (reuses dedup._join_pair_payload) over
   only the involved documents.

At 100 TB the df dict broadcast is the documented trade-off: it is bounded
by the volume of *cross-document-repeated* content, not the corpus; if it
outgrows worker memory, step 3 becomes a repartition-by-term join of the
shingle rows against the df table (one extra shuffle, no broadcast).

Reference analog: the shared-concepts similarity join (SURVEY J1/J8,
db_init.py:240-252) lifted from exact concept ids to fuzzy token sets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count

from .dedup import _involved_id_set, _join_pair_payload, _spread, tokens_of

TAU_NUM, TAU_DEN = 1, 2  # Jaccard threshold 1/2


def doc_shingles(text: str, n: int = 3) -> list[str]:
    """Sorted distinct word n-grams; docs with < n tokens have NONE (matches
    the SQL oracle's generate_series bound exactly — dedup.shingles_of
    instead falls back to the whole token string, a different contract)."""
    toks = tokens_of(text)
    if len(toks) < n:
        return []
    return sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


def _prefix_len(t: int) -> int:
    """|prefix| = t - ceil(tau*t) + 1 for Jaccard threshold tau."""
    return t - (TAU_NUM * t + TAU_DEN - 1) // TAU_DEN + 1


def setsim_pairs(sf_dir_or_ds, table: str = "documents") -> pa.Table:
    """All (doc_a < doc_b) with shingle-set Jaccard >= tau, with exact
    intersection/union sizes and integer jac_ppm = floor(1e6*i/u)."""
    from ..sources.tables import read_table

    docs = (
        sf_dir_or_ds
        if isinstance(sf_dir_or_ds, rd.Dataset)
        else read_table(sf_dir_or_ds, table, columns=["doc_id", "text"])
    )
    docs = _spread(docs)

    def sh_rows(t: pa.Table) -> pa.Table:
        ids, terms = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for s in doc_shingles(text):
                ids.append(doc_id)
                terms.append(s)
        return pa.table(
            {"term": pa.array(terms, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )

    # df of every shingle; only df>=2 can witness a pair -> the broadcast side
    df_tbl = (
        docs.map_batches(sh_rows, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="df"))
        .filter(lambda r: r["df"] >= 2)
    )
    shared_df: dict[str, int] = {}
    for b in df_tbl.iter_batches(batch_format="pyarrow", batch_size=None):
        shared_df.update(zip(b["term"].to_pylist(), b["df"].to_pylist()))

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n_inter": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64()),
            "jac_ppm": pa.array([], pa.int64()),
        }
    )
    if not shared_df:
        return empty
    df_ref = ray.put(shared_df)

    def prefix_rows(t: pa.Table, ref=df_ref) -> pa.Table:
        dfm = ray.get(ref) if hasattr(ref, "hex") else ref
        ids, terms = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = doc_shingles(text)
            if not sh:
                continue
            # canonical order: rare first; unseen terms have df == 1
            sh.sort(key=lambda s: (dfm.get(s, 1), s))
            for s in sh[: _prefix_len(len(sh))]:
                if s in dfm:  # df == 1 can never collide
                    ids.append(doc_id)
                    terms.append(s)
        return pa.table(
            {"term": pa.array(terms, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )

    def bucket_pairs(g) -> dict:
        d = np.unique(g["doc_id"].to_numpy().astype(np.int64))
        if len(d) < 2:
            return {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
        ia, ib = np.triu_indices(len(d), k=1)
        return {"doc_a": d[ia], "doc_b": d[ib]}

    pairs = (
        docs.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("term")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_keys"))
        .select_columns(["doc_a", "doc_b"])
        .materialize()
    )
    if pairs.count() == 0:  # unique() on an empty Dataset returns None
        return empty
    involved = _involved_id_set(pairs)
    if not involved:
        return empty
    inv_ref = ray.put(involved)

    def fetch_payload(t: pa.Table, ref=inv_ref) -> pa.Table:
        want = ray.get(ref) if hasattr(ref, "hex") else ref
        ids, shs = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if doc_id in want:
                ids.append(doc_id)
                shs.append("\x00".join(doc_shingles(text)))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "sh": pa.array(shs, pa.string())}
        )

    payload = docs.map_batches(fetch_payload, batch_format="pyarrow")
    joined = _join_pair_payload(pairs, payload, "sh", pa.string())

    def verify(t: pa.Table) -> pa.Table:
        rows = []
        for a, b, sa, sb in zip(
            t["doc_a"].to_pylist(), t["doc_b"].to_pylist(),
            t["sh_a"].to_pylist(), t["sh_b"].to_pylist(),
        ):
            A = set(sa.split("\x00")) if sa else set()
            B = set(sb.split("\x00")) if sb else set()
            i = len(A & B)
            u = len(A) + len(B) - i
            # Jaccard >= NUM/DEN  <=>  (DEN+NUM)*i >= NUM*(|A|+|B|)
            if u and (TAU_DEN + TAU_NUM) * i >= TAU_NUM * (len(A) + len(B)):
                rows.append((a, b, i, u, (1_000_000 * i) // u))
        return pa.table(
            {
                "doc_a": pa.array([r[0] for r in rows], pa.int64()),
                "doc_b": pa.array([r[1] for r in rows], pa.int64()),
                "n_inter": pa.array([r[2] for r in rows], pa.int64()),
                "n_union": pa.array([r[3] for r in rows], pa.int64()),
                "jac_ppm": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow").take_all()
    rows = sorted(
        (r["doc_a"], r["doc_b"], r["n_inter"], r["n_union"], r["jac_ppm"])
        for r in out
    )
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "n_inter": pa.array([r[2] for r in rows], pa.int64()),
            "n_union": pa.array([r[3] for r in rows], pa.int64()),
            "jac_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
