"""Fuzzy record linkage: edit-distance similarity self-join via SymSpell
deletion-neighborhood blocking.

The reference canonicalizes entity surface forms through an exact alias
dictionary (SURVEY.md D3, `entity-extraction-agent.ts` normalization); a
web-scale corpus additionally needs the FUZZY form — find every record pair
whose names differ by at most one edit (typos, OCR noise, crawl artifacts)
without an all-pairs scan.

Algorithm (public: Garbe's SymSpell / symmetric-delete spelling correction):
a pair of strings with levenshtein distance <= 1 ALWAYS shares at least one
key in {s} ∪ D1(s), where D1 is the set of single-character deletions —
  * equal strings share s itself;
  * a substitution at position i shares the delete-at-i variant;
  * an insertion/deletion shares the shorter string (it IS a deletion
    variant of the longer one).
So: emit |s|+1 blocking keys per record (ONE map pass, Arrow-vectorized
slicing per position), ONE groupby on the key, verify exact distance inside
each group, then ONE pair-level groupby to dedupe pairs found under several
keys (repeated characters make deletion variants collide). No distance
computation ever crosses groups; no O(n^2) anywhere.

Scale: group size is alphabet-bounded — a key of length L collects only
strings within one edit of each other THROUGH that key (<= |alphabet| * L
distinct forms), so the per-group verify is tiny regardless of corpus size.
The real skew risk is many IDENTICAL names: those form a genuine duplicate
class — quadratic in the class size BY PROBLEM DEFINITION (the answer set
itself is quadratic), exactly like exact-dedup classes. At 100 TB, run exact
dedup first (q13 shape) so identical-name classes collapse to one
representative before the fuzzy pass.

Oracle: DuckDB `levenshtein()` over the naive self-join (exact, quadratic —
fine at driver scale, the point of the blocked plan is to avoid it at 100x).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.tables import read_table

FJ_MAX_DIST = 1


def _lev_le1(a: str, b: str) -> int | None:
    """Exact levenshtein if <= 1, else None. Unit costs — matches DuckDB's
    levenshtein() on these inputs."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return None
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return None
        return 1
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else None


def _deletion_keys(t: pa.Table, key_col: str, name_col: str) -> pa.Table:
    """(blk, key, name) rows: the name itself plus every single-character
    deletion variant. Vectorized per deletion position (Arrow slice+concat
    kernels); the Python loop is over string LENGTH, not rows."""
    names = pc.cast(t[name_col], pa.string())
    keys = pc.cast(t[key_col], pa.int64())
    lens = pc.utf8_length(names)
    max_len = pc.max(lens).as_py() or 0

    blks, out_keys, out_names = [names], [keys], [names]
    big = 1 << 30
    for i in range(max_len):
        mask = pc.greater(lens, i)
        if not pc.any(mask).as_py():
            break
        sub_n = pc.filter(names, mask)
        variant = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub_n, 0, i),
            pc.utf8_slice_codeunits(sub_n, i + 1, big),
            "",
        )
        blks.append(variant)
        out_keys.append(pc.filter(keys, mask))
        out_names.append(sub_n)

    def _cat(cols, typ):
        return pa.chunked_array(
            [pc.cast(c, typ) for c in cols], typ
        ).combine_chunks()

    return pa.table(
        {
            "blk": _cat(blks, pa.string()),
            "key": _cat(out_keys, pa.int64()),
            "name": _cat(out_names, pa.string()),
        }
    )


def _verify_group(df: "pd.DataFrame") -> pa.Table:
    """All pairs within one blocking key with exact distance <= FJ_MAX_DIST.
    Group size is alphabet-bounded (module docstring), so the nested loop is
    over a handful of rows."""
    sub = df[["key", "name"]].drop_duplicates("key").sort_values("key")
    keys = sub["key"].to_numpy()
    names = sub["name"].to_numpy()
    ka, kb, dist = [], [], []
    n = len(keys)
    for i in range(n):
        for j in range(i + 1, n):
            d = _lev_le1(names[i], names[j])
            if d is not None:
                ka.append(keys[i])
                kb.append(keys[j])
                dist.append(d)
    return pa.table(
        {
            "key_a": pa.array(ka, pa.int64()),
            "key_b": pa.array(kb, pa.int64()),
            "dist": pa.array(dist, pa.int64()),
        }
    )


def fuzzy_self_join(
    ds, key_col: str, name_col: str
):
    """All record pairs (key_a < key_b) whose names are within edit distance
    FJ_MAX_DIST, with the exact distance. One map pass + two groupbys."""
    from ray.data.aggregate import Min

    keyed = ds.map_batches(
        lambda t: _deletion_keys(t, key_col, name_col),
        batch_format="pyarrow",
    )
    pairs = keyed.groupby("blk").map_groups(
        _verify_group, batch_format="pandas"
    )
    # a pair can surface under several shared deletion keys -> dedupe once
    return (
        pairs.groupby(["key_a", "key_b"])
        .aggregate(Min("dist", alias_name="dist"))
        .sort(["key_a", "key_b"])
    )


def q76_fuzzy_join(sf_dir: str):
    """Customer-name fuzzy self-join: every customer pair whose names differ
    by at most one edit. Oracle: DuckDB levenshtein() naive self-join."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return fuzzy_self_join(ds, "c_custkey", "c_name")


QUERIES = {
    "q76_fuzzy_join": q76_fuzzy_join,
}

ORACLE_SQL: dict[str, str] = {
    "q76_fuzzy_join": f"""
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= {FJ_MAX_DIST}
        ORDER BY key_a, key_b
    """,
}


# ---------------------------------------------------------------------------
# Entity-resolution clusters: exact dedup -> fuzzy pairs -> transitive
# closure. The canonical record-linkage recipe: collapse identical names
# first (one groupby — this is what keeps the fuzzy stage safe from
# quadratic identical-name classes), run the deletion-neighborhood join over
# the DISTINCT names, then connected components over the pair graph so
# chains of single edits (A~B, B~C) land in one cluster. Components run
# fully driverless (min-label propagation; both edges and labels stay
# distributed — stages/canonicalize.py).
#
# Oracle: DuckDB RECURSIVE CTE computing min reachable label over the
# levenshtein pair graph — an independent transitive-closure algorithm.
# ---------------------------------------------------------------------------


def fuzzy_clusters(ds, key_col: str, name_col: str):
    """(name_key, cluster) for every DISTINCT name: name_key = smallest
    ``key_col`` carrying the name, cluster = smallest name_key reachable
    through edit-distance<=1 steps."""
    from ray.data.aggregate import Min

    from ..stages.canonicalize import label_propagation_components_driverless

    names = ds.groupby(name_col).aggregate(
        Min(key_col, alias_name="name_key")
    )
    pairs = fuzzy_self_join(names, "name_key", name_col)

    def _pad(col: pa.ChunkedArray) -> pa.ChunkedArray:
        return pc.utf8_lpad(pc.cast(col, pa.string()), 19, "0")

    edge_rows = pairs.map_batches(
        lambda t: pa.table({"a": _pad(t["key_a"]), "b": _pad(t["key_b"])}),
        batch_format="pyarrow",
    ).union(
        # self-loops: names with no fuzzy neighbor form singleton clusters
        names.map_batches(
            lambda t: pa.table(
                {"a": _pad(t["name_key"]), "b": _pad(t["name_key"])}
            ),
            batch_format="pyarrow",
        )
    )
    labels = label_propagation_components_driverless(edge_rows)
    return labels.map_batches(
        lambda t: pa.table(
            {
                "name_key": pc.cast(t["node"], pa.int64()),
                "cluster": pc.cast(t["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("name_key")


def q77_fuzzy_clusters(sf_dir: str):
    """Part-name entity resolution: cluster DISTINCT part names connected by
    edit-distance<=1 chains. Oracle: DuckDB recursive-CTE transitive closure
    over the naive levenshtein pair graph."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    return fuzzy_clusters(ds, "p_partkey", "p_name")


QUERIES["q77_fuzzy_clusters"] = q77_fuzzy_clusters

ORACLE_SQL["q77_fuzzy_clusters"] = f"""
    WITH RECURSIVE names AS (
        SELECT p_name, CAST(MIN(p_partkey) AS BIGINT) AS name_key
        FROM part GROUP BY p_name
    ),
    pairs AS (
        SELECT a.name_key AS ka, b.name_key AS kb
        FROM names a JOIN names b
          ON a.name_key < b.name_key
         AND levenshtein(a.p_name, b.p_name) <= {FJ_MAX_DIST}
    ),
    sym AS (
        SELECT ka AS s, kb AS d FROM pairs
        UNION ALL SELECT kb, ka FROM pairs
    ),
    reach(node, lab) AS (
        SELECT name_key, name_key FROM names
        UNION
        SELECT s.d, r.lab FROM reach r JOIN sym s ON s.s = r.node
    )
    SELECT node AS name_key, CAST(MIN(lab) AS BIGINT) AS cluster
    FROM reach GROUP BY node ORDER BY name_key
"""


# ---------------------------------------------------------------------------
# q86: exact set-similarity self-join (prefix filtering) — stages/setsim.py
# ---------------------------------------------------------------------------


def q86_setsim_join(sf_dir: str):
    """Document pairs whose distinct word-3-gram sets have Jaccard >= 1/2,
    with exact intersection/union counts — lossless prefix-filtered
    candidate generation + distributed verification (stages/setsim.py)."""
    from ..stages.setsim import setsim_pairs

    return setsim_pairs(sf_dir)


QUERIES["q86_setsim_join"] = q86_setsim_join

ORACLE_SQL["q86_setsim_join"] = """
    WITH words AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS term
        FROM words, UNNEST(generate_series(1, greatest(0, len(w) - 2))) AS t(g)
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
        FROM sh a JOIN sh b USING (term)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST(i AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - i AS BIGINT) AS n_union,
           CAST((1000000 * i) // (sa.n + sb.n - i) AS BIGINT) AS jac_ppm
    FROM inter
    JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
    WHERE 3 * i >= sa.n + sb.n
    ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# q92: sorted-neighborhood record linkage (Hernandez/Stolfo 1995) — the
# OTHER classic ER blocking scheme next to the deletion-neighborhood join
# above: sort all records by the match key, compare only records within a
# fixed window of the sorted order. Distributed as: one range-partitioned
# sort -> global ranks via the per-block offset scan (one int per block to
# the driver, assembly._with_global_positions) -> records routed to
# rank//B buckets with a w-row HALO into the next bucket (the halo-exchange
# pattern: every within-window pair lands in at least one common bucket) ->
# vectorized in-bucket window pairs -> pair-level dedupe groupby (straddle
# pairs can form in two buckets) -> exact bounded levenshtein verify.
# ---------------------------------------------------------------------------

SN_WINDOW = 3
SN_MAX_DIST = 2
_SN_BUCKET = 64


def _lev_bounded(a: str, b: str, bound: int) -> int | None:
    """Exact unit-cost levenshtein if <= bound else None (banded DP,
    matches DuckDB's levenshtein())."""
    if abs(len(a) - len(b)) > bound:
        return None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = len(b) + 1
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
            lo = min(lo, cur[j])
        if lo > bound:
            return None
        prev = cur
    return prev[-1] if prev[-1] <= bound else None


def q92_sorted_neighborhood(sf_dir: str):
    """Customer-name pairs within SN_WINDOW of the (c_name, c_custkey)
    sort order at levenshtein <= SN_MAX_DIST. Output
    (key_a, key_b, dist) with key_a < key_b, sorted."""
    from .assembly import _with_global_positions

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ordered = ds.sort(["c_name", "c_custkey"]).materialize()
    pos = _with_global_positions(ordered, "rk")

    def route(t: pa.Table) -> pa.Table:
        rk = t["rk"].combine_chunks().to_numpy(zero_copy_only=False)
        names = t["c_name"].to_pylist()
        keys = t["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        b = rk // _SN_BUCKET
        halo = (rk % _SN_BUCKET) < SN_WINDOW
        out_b = np.concatenate([b, b[halo] - 1])
        out_rk = np.concatenate([rk, rk[halo]])
        out_k = np.concatenate([keys, keys[halo]])
        out_n = names + [names[i] for i in np.flatnonzero(halo)]
        keep = out_b >= 0
        return pa.table(
            {
                "bucket": pa.array(out_b[keep], pa.int64()),
                "rk": pa.array(out_rk[keep], pa.int64()),
                "key": pa.array(out_k[keep], pa.int64()),
                "name": pa.array(
                    [n for n, k in zip(out_n, keep) if k], pa.string()
                ),
            }
        )

    def window_pairs(g) -> dict:
        order = np.argsort(g["rk"].to_numpy(), kind="mergesort")
        rk = g["rk"].to_numpy()[order]
        keys = g["key"].to_numpy()[order]
        names = g["name"].to_numpy()[order]
        a_out, b_out, d_out = [], [], []
        for i in range(len(rk)):
            for j in range(i + 1, len(rk)):
                if rk[j] - rk[i] > SN_WINDOW:
                    break
                d = _lev_bounded(str(names[i]), str(names[j]), SN_MAX_DIST)
                if d is not None:
                    lo, hi = sorted((int(keys[i]), int(keys[j])))
                    a_out.append(lo)
                    b_out.append(hi)
                    d_out.append(d)
        return {
            "key_a": np.array(a_out, np.int64),
            "key_b": np.array(b_out, np.int64),
            "dist": np.array(d_out, np.int64),
        }

    def dedupe(g) -> dict:
        return {
            "key_a": np.array([g["key_a"].iloc[0]], np.int64),
            "key_b": np.array([g["key_b"].iloc[0]], np.int64),
            "dist": np.array([g["dist"].iloc[0]], np.int64),
        }

    pairs = (
        pos.map_batches(route, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(window_pairs, batch_format="pandas")
        .groupby(["key_a", "key_b"])
        .map_groups(dedupe, batch_format="pandas")
    )
    return pairs.sort(["key_a", "key_b"])


QUERIES["q92_sorted_neighborhood"] = q92_sorted_neighborhood

ORACLE_SQL["q92_sorted_neighborhood"] = f"""
    WITH r AS (
        SELECT c_custkey, c_name,
               row_number() OVER (ORDER BY c_name, c_custkey) - 1 AS rk
        FROM customer
    )
    SELECT LEAST(a.c_custkey, b.c_custkey) AS key_a,
           GREATEST(a.c_custkey, b.c_custkey) AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM r a JOIN r b
      ON b.rk - a.rk BETWEEN 1 AND {SN_WINDOW}
    WHERE levenshtein(a.c_name, b.c_name) <= {SN_MAX_DIST}
    ORDER BY key_a, key_b
"""
