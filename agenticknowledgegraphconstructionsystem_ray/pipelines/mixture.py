"""Data-mixing operators for training-corpus assembly: per-language
token-budget sampling and term-association (PMI) mining.

Reference analog: the reference caps and prioritizes its corpus manually
(papers_summary.csv curation, SURVEY §2.6 O4 head-N); these are the
corpus-level generalizations a 100 TB mixing stage needs. Both are
ANSI-SQL-exact.

- q59 mixture sample   Dolma/Pile-style language mixing: each language gets
                       an integer char budget (weight% of TOTAL_BUDGET) and
                       contributes documents in deterministic md5-key order
                       until the budget is exhausted (a document is kept iff
                       the running total BEFORE it is under budget, so the
                       boundary doc may overshoot — the standard fill rule).
                       Scale shape: NO per-row sort. A 256-way md5-prefix
                       bucket histogram (per-(lang,bucket) char sums via a
                       per-block Arrow combiner -> one tiny groupby) lets
                       the driver locate each language's cutoff bucket from
                       O(langs*256) rows; only the cutoff bucket's rows
                       (~1/256 of one language) are pulled to resolve the
                       exact threshold key; the final pass is a distributed
                       broadcast-threshold filter. At 10^12 docs the driver
                       state is langs*256 ints plus one bucket's keys —
                       recurse the same split if 1/256 of a language is
                       still too big.
- q60 term PMI         co-occurrence association mining over the top-V
                       document-frequency vocabulary (the classic
                       phrase/collocation discovery pass): presence
                       bitmatrix per block (docs x V bools) -> one
                       V x V int matmul per block (vectorized combiner) ->
                       groupby over pair indices (<= V(V-1)/2 rows per
                       block, never corpus-sized) -> integer PMI in ppm
                       (n_pair * n_docs * 1e6 // (df_a * df_b)). Token
                       definition shared with q14/q27 (textstats._TOKEN_RE).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

from ..sources.tables import read_table

# ---------------------------------------------------------------------------
# q59: per-language token-budget mixture sampling
# ---------------------------------------------------------------------------

TOTAL_BUDGET = 80_000  # chars at the driver's correctness scale
# integer percent weights (sum 100); unlisted languages get budget 0
MIX_WEIGHTS = {"en": 40, "zh": 20, "de": 15, "fr": 15, "es": 10}
N_MIX_BUCKETS = 256


def _budget(lang: str) -> int:
    return TOTAL_BUDGET * MIX_WEIGHTS.get(lang, 0) // 100


def _mix_key(doc_id: int) -> str:
    return hashlib.md5(f"m59:{doc_id}".encode()).hexdigest()


def _keyed(t: pa.Table) -> pa.Table:
    keys = [_mix_key(i) for i in t["doc_id"].to_pylist()]
    bucket = np.array([int(k[:2], 16) for k in keys], np.int64)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_chars": t["n_chars"],
            "skey": pa.array(keys, pa.string()),
            "bucket": pa.array(bucket, pa.int64()),
        }
    )


def q59_mixture_sample(sf_dir: str):
    """Documents kept by the per-language budget fill (see module docstring).
    Output: (doc_id, lang, n_chars) sorted by (lang, doc_id)."""
    import pyarrow.compute as pc

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    keyed = docs.map_batches(_keyed, batch_format="pyarrow")

    # 1) per-(lang, bucket) char sums: block combiner -> tiny groupby
    def per_block(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "bucket"]).aggregate([("n_chars", "sum")])
        return g.rename_columns(["lang", "bucket", "ch"])

    hist = (
        keyed.map_batches(per_block, batch_format="pyarrow")
        .groupby(["lang", "bucket"])
        .aggregate(Sum("ch", alias_name="ch"))
        .to_pandas()  # O(langs * 256)
    )

    # 2) driver: locate each language's cutoff bucket
    cutoff: dict[str, tuple[int, int]] = {}  # lang -> (bucket, chars_before)
    full: set[str] = set()  # languages whose whole corpus fits the budget
    for lang, g in hist.groupby("lang", sort=True):
        b = _budget(str(lang))
        g = g.sort_values("bucket", kind="mergesort")
        cum = 0
        placed = False
        for bucket, ch in zip(g["bucket"].to_numpy(), g["ch"].to_numpy()):
            if cum + int(ch) >= b:
                cutoff[str(lang)] = (int(bucket), cum)
                placed = True
                break
            cum += int(ch)
        if not placed:
            full.add(str(lang))

    # 3) exact threshold inside each cutoff bucket (~1/256 of one language)
    thresholds: dict[str, tuple[int, str, int]] = {}
    if cutoff:

        def in_cut(t: pa.Table) -> pa.Table:
            langs = np.asarray(t["lang"].to_pylist())
            buckets = t["bucket"].to_numpy()
            mask = np.zeros(t.num_rows, bool)
            for lg, (cb, _) in cutoff.items():
                mask |= (langs == lg) & (buckets == cb)
            return t.filter(pa.array(mask))

        cut_rows = (
            keyed.map_batches(in_cut, batch_format="pyarrow")
            .sort(["lang", "skey", "doc_id"])
            .to_pandas()  # one bucket per language
        )
        for lang, g in cut_rows.groupby("lang", sort=True):
            bucket, base = cutoff[str(lang)]
            budget_left = _budget(str(lang)) - base
            cum = 0
            last: tuple[str, int] | None = None
            for _, r in g.iterrows():
                if cum >= budget_left:
                    break
                last = (str(r["skey"]), int(r["doc_id"]))
                cum += int(r["n_chars"])
            if last is not None:
                thresholds[str(lang)] = (bucket, last[0], last[1])
            # no doc kept in the cutoff bucket: threshold stays absent and
            # only buckets strictly below the cutoff pass

    # 4) distributed final filter on the broadcast thresholds (vectorized
    # per language — the lang domain is tiny, the row domain is not)
    def keep(t: pa.Table) -> pa.Table:
        langs = np.asarray(t["lang"].to_pylist())
        buckets = t["bucket"].to_numpy()
        keys = np.asarray(t["skey"].to_pylist())
        ids = t["doc_id"].to_numpy()
        mask = np.zeros(t.num_rows, bool)
        for lg in full:
            mask |= langs == lg
        for lg, (cb, _) in cutoff.items():
            sel = langs == lg
            mask |= sel & (buckets < cb)
            if lg in thresholds:
                _, tk, tid = thresholds[lg]
                mask |= (
                    sel
                    & (buckets == cb)
                    & ((keys < tk) | ((keys == tk) & (ids <= tid)))
                )
        out = t.filter(pa.array(mask))
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "lang": out["lang"],
                "n_chars": pc.cast(out["n_chars"], pa.int64()),
            }
        )

    return keyed.map_batches(keep, batch_format="pyarrow").sort(
        ["lang", "doc_id"]
    )


# ---------------------------------------------------------------------------
# q60: term co-occurrence PMI over the top-V vocabulary
# ---------------------------------------------------------------------------

PMI_V = 48  # vocabulary size (top document frequency)
PMI_MIN_PAIR = 5  # pair support floor
PMI_SCALE = 1_000_000


def _doc_term_presence(t: pa.Table) -> pa.Table:
    """Per-block partial document frequency: (term, df) over this block."""
    from ..stages.textstats import _TOKEN_RE

    counts: dict[str, int] = {}
    for text in t["text"].to_pylist():
        for tok in set(_TOKEN_RE.findall(text.lower())):
            counts[tok] = counts.get(tok, 0) + 1
    return pa.table(
        {
            "term": pa.array(list(counts.keys()), pa.string()),
            "df_p": pa.array(list(counts.values()), pa.int64()),
        }
    )


def q60_term_pmi(sf_dir: str):
    """Pointwise mutual information (integer ppm) of top-V term pairs.
    Output: (term_a, term_b, n_pair, pmi_ppm) for pairs with support >=
    PMI_MIN_PAIR, sorted by (pmi_ppm desc, term_a, term_b)."""
    import pyarrow.compute as pc

    from ..stages.textstats import _TOKEN_RE

    docs = read_table(sf_dir, "documents", columns=["text"])
    n_docs = docs.count()

    # phase 1: exact document frequency -> top-V vocabulary (df desc, term)
    df_tbl = (
        docs.map_batches(_doc_term_presence, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
        .sort(["df", "term"], descending=[True, False])
        .limit(PMI_V)
        .to_pandas()  # V rows
    )
    vocab = list(df_tbl["term"])
    df_of = dict(zip(df_tbl["term"], df_tbl["df"].astype(int)))
    v_index = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)

    # phase 2: per-block presence bitmatrix -> V x V co-occurrence matmul
    iu = np.triu_indices(V, k=1)

    def pair_partial(t: pa.Table) -> pa.Table:
        m = np.zeros((t.num_rows, V), np.int64)
        for r, text in enumerate(t["text"].to_pylist()):
            for tok in set(_TOKEN_RE.findall(text.lower())):
                j = v_index.get(tok)
                if j is not None:
                    m[r, j] = 1
        co = m.T @ m
        return pa.table(
            {
                "pi": pa.array(iu[0], pa.int64()),
                "pj": pa.array(iu[1], pa.int64()),
                "n_p": pa.array(co[iu], pa.int64()),
            }
        )

    pairs = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["pi", "pj"])
        .aggregate(Sum("n_p", alias_name="n_pair"))
        .to_pandas()  # <= V(V-1)/2 rows
    )
    pairs = pairs[pairs["n_pair"] >= PMI_MIN_PAIR]
    # pair indices are in vocab-RANK order; the output contract (and the
    # oracle's a.term < b.term) is lexicographic — swap where needed
    ta = [min(vocab[i], vocab[j]) for i, j in zip(pairs["pi"], pairs["pj"])]
    tb = [max(vocab[i], vocab[j]) for i, j in zip(pairs["pi"], pairs["pj"])]
    npair = pairs["n_pair"].astype(np.int64).to_numpy()
    da = np.array([df_of[t] for t in ta], np.int64)
    db = np.array([df_of[t] for t in tb], np.int64)
    pmi = npair * np.int64(n_docs) * np.int64(PMI_SCALE) // (da * db)
    out = pa.table(
        {
            "term_a": pa.array(ta, pa.string()),
            "term_b": pa.array(tb, pa.string()),
            "n_pair": pa.array(npair, pa.int64()),
            "pmi_ppm": pa.array(pmi, pa.int64()),
        }
    )
    idx = pc.sort_indices(
        out,
        sort_keys=[
            ("pmi_ppm", "descending"),
            ("term_a", "ascending"),
            ("term_b", "ascending"),
        ],
    )
    return out.take(idx)


# ---------------------------------------------------------------------------
# q61: within-language percentile rank (curriculum bucketing)
# ---------------------------------------------------------------------------


def q61_percentile_rank(sf_dir: str):
    """Each document's 0-based rank and integer percentile within its
    language under (n_chars, doc_id) order — the curriculum-ordering /
    difficulty-bucketing pass (shorter docs first). Output:
    (doc_id, lang, n_chars, rk, pct) sorted by doc_id.

    Shape: one range-partitioned sort on (lang, n_chars, doc_id), then the
    per-block offset prefix scan (assembly._with_global_positions — one int
    per block to the driver) converted to within-language ranks by
    subtracting per-language start offsets (langs integers). The grouped
    generalization of q44's global-position mechanism; no per-row driver
    state."""
    import pyarrow.compute as pc

    from .assembly import _with_global_positions

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    ordered = docs.sort(["lang", "n_chars", "doc_id"]).materialize()
    pos = _with_global_positions(ordered, "gpos")

    counts = {
        r["lang"]: r["count()"]
        for r in ordered.groupby("lang").count().take_all()
    }  # langs integers
    langs_sorted = sorted(counts)
    starts: dict[str, int] = {}
    acc = 0
    for lg in langs_sorted:
        starts[lg] = acc
        acc += counts[lg]

    def localize(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        gpos = t["gpos"].combine_chunks().to_numpy(zero_copy_only=False)
        st = np.array([starts[lg] for lg in langs], np.int64)
        n = np.array([counts[lg] for lg in langs], np.int64)
        rk = gpos - st
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "rk": pa.array(rk, pa.int64()),
                "pct": pa.array(rk * 100 // n, pa.int64()),
            }
        )

    return pos.map_batches(localize, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# q80: weighted systematic sample (integer-exact weighted sampling
# without randomness — the deterministic form of weighted reservoir
# sampling a data-mixing pipeline uses to draw a token-budget-proportional
# subset: heavy documents are picked with probability proportional to
# weight, and a document heavier than the stride can absorb several picks)
# ---------------------------------------------------------------------------

WS_K = 100  # sample size (thresholds)


def q80_weighted_sample(sf_dir: str, k: int = WS_K):
    """Systematic sampling over the cumulative weight line: with W = total
    n_chars, thresholds t_j = (j * W) // k for j in 0..k-1 land in document
    i's interval [cum_{i-1}, cum_i) under doc_id order. Output: every doc
    holding >= 1 threshold as (doc_id, w, n_picks), sorted by doc_id.
    Exactly k picks total; expected picks per doc proportional to weight —
    all integer arithmetic, so the SQL mirror is bit-exact.

    Shape: ONE doc_id sort, then the per-block offset prefix scan (one
    int64 per block to the driver, q44/q61's mechanism); each block then
    resolves its own picks with two vectorized searchsorted calls against
    the broadcast k-threshold array. No per-row driver state; threshold
    array is k integers regardless of corpus size."""
    import ray
    import ray.data as rd

    docs = (
        read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
        .sort("doc_id")
        .materialize()
    )
    refs = docs.to_arrow_refs()

    @ray.remote
    def _wsum(t: pa.Table) -> int:
        import pyarrow.compute as pc

        if not t.num_rows:  # sort can emit empty zero-column blocks
            return 0
        return int(pc.sum(t["n_chars"]).as_py() or 0)

    sums = ray.get([_wsum.remote(r) for r in refs])
    total = int(sum(sums))
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) if sums else []
    thresholds = np.array([(j * total) // k for j in range(k)], np.int64)

    schema = pa.schema(
        [("doc_id", pa.int64()), ("w", pa.int64()), ("n_picks", pa.int64())]
    )

    @ray.remote
    def _pick(t: pa.Table, off: int) -> pa.Table:
        import pyarrow.compute as pc

        if not t.num_rows:
            return schema.empty_table()
        w = (
            pc.cast(t["n_chars"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cum = off + np.cumsum(w)
        n = np.searchsorted(thresholds, cum, side="left") - np.searchsorted(
            thresholds, cum - w, side="left"
        )
        sel = n > 0
        ids = (
            t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)[sel]
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "w": pa.array(w[sel], pa.int64()),
                "n_picks": pa.array(n[sel], pa.int64()),
            }
        )

    return rd.from_arrow_refs(
        [_pick.remote(r, int(off)) for r, off in zip(refs, offsets)]
    ).sort("doc_id")


# ---------------------------------------------------------------------------
# driver registration
# ---------------------------------------------------------------------------

QUERIES = {
    "q59_mixture_sample": q59_mixture_sample,
    "q60_term_pmi": q60_term_pmi,
    "q61_percentile_rank": q61_percentile_rank,
    "q80_weighted_sample": q80_weighted_sample,
}

_BUDGET_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lg}' THEN {TOTAL_BUDGET * w // 100}"
    for lg, w in sorted(MIX_WEIGHTS.items())
) + " ELSE 0 END"

_TOK_SQL = """
        SELECT DISTINCT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS term
        FROM documents
"""

ORACLE_SQL: dict[str, str] = {
    "q59_mixture_sample": f"""
        WITH ordered AS (
            SELECT doc_id, lang, n_chars,
                   COALESCE(SUM(n_chars) OVER (
                       PARTITION BY lang
                       ORDER BY md5('m59:' || doc_id), doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM documents
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM ordered
        WHERE cum_before < ({_BUDGET_SQL})
        ORDER BY lang, doc_id
    """,
    "q60_term_pmi": f"""
        WITH tok AS ({_TOK_SQL}),
        df AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM tok GROUP BY term
        ),
        vocab AS (
            SELECT term, df FROM df
            ORDER BY df DESC, term LIMIT {PMI_V}
        ),
        vtok AS (
            SELECT t.doc_id, t.term FROM tok t
            JOIN vocab v ON v.term = t.term
        ),
        pairs AS (
            SELECT a.term AS term_a, b.term AS term_b,
                   CAST(COUNT(*) AS BIGINT) AS n_pair
            FROM vtok a JOIN vtok b
              ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY a.term, b.term
            HAVING COUNT(*) >= {PMI_MIN_PAIR}
        )
        SELECT p.term_a, p.term_b, p.n_pair,
               CAST(p.n_pair * (SELECT COUNT(*) FROM documents)
                    * {PMI_SCALE} // (va.df * vb.df) AS BIGINT) AS pmi_ppm
        FROM pairs p
        JOIN vocab va ON va.term = p.term_a
        JOIN vocab vb ON vb.term = p.term_b
        ORDER BY pmi_ppm DESC, term_a, term_b
    """,
    "q61_percentile_rank": """
        WITH ranked AS (
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY n_chars, doc_id
                   ) - 1 AS BIGINT) AS rk,
                   COUNT(*) OVER (PARTITION BY lang) AS cnt
            FROM documents
        )
        SELECT doc_id, lang, n_chars, rk,
               CAST(rk * 100 // cnt AS BIGINT) AS pct
        FROM ranked ORDER BY doc_id
    """,
    "q80_weighted_sample": f"""
        WITH c AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                   SUM(CAST(n_chars AS BIGINT)) OVER (
                       ORDER BY doc_id ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM documents
        ),
        tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total FROM documents),
        th AS (
            SELECT CAST((j * total) // {WS_K} AS BIGINT) AS t
            FROM tot, (SELECT unnest(range(0, {WS_K})) AS j)
        )
        SELECT c.doc_id, c.w, CAST(COUNT(*) AS BIGINT) AS n_picks
        FROM c JOIN th ON th.t >= c.cum - c.w AND th.t < c.cum
        GROUP BY c.doc_id, c.w
        ORDER BY c.doc_id
    """,
}
