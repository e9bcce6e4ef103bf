"""Relational operator suite over the driver testdata tables.

Each function here re-expresses one operator family from the reference's SQL
surface (SURVEY.md §2.4 joins, §2.5 aggregations, §2.6 sorts/limits, §2.7
set-ops/dedup) as an idiomatic Ray Data pipeline, and has a matching ANSI-SQL
oracle in ``ORACLE_SQL`` that DuckDB runs on the same Parquet views.

Determinism rules (the driver hash-compares values):
- monetary/float aggregates are emitted as INTEGER cents
  (``round(x*100)`` per ROW, then integer sums) so no cross-engine
  floating-point summation-order difference can change the output;
- ``pyarrow.compute.round(round_mode="half_towards_infinity")`` matches
  DuckDB's ROUND (half away from zero);
- every ordered/top-k result carries an explicit tiebreaker column.

Scale notes: small dimension sides (nation, region, distinct keysets) are
broadcast via ``ray.put`` and probed inside ``map_batches`` (no shuffle);
distinct-counting is dedup-then-count (SURVEY A6); token counting
pre-aggregates per block before the global groupby (combiner; SURVEY A4).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.tables import read_table

_CENTS = dict(ndigits=0, round_mode="half_towards_infinity")


def _cents(arr) -> pa.Array:
    """round(x*100) as int64 — per-row, before any aggregation. THE rounding
    convention for every monetary/float driver-query output (half away from
    zero, matching DuckDB ROUND); use this (or cents_np for numpy paths)
    instead of re-implementing."""
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0)), **_CENTS), pa.int64())


cents = _cents  # public alias for other query modules


def cents_np(values) -> np.ndarray:
    """numpy-side equivalent of ``cents``: round-half-away-from-zero of
    value*100 as int64 (pandas/numpy .round is half-to-even — never use it
    for driver-compared outputs)."""
    v = np.asarray(values, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# §2.5 aggregations
# ---------------------------------------------------------------------------

def q01_pricing_summary(sf_dir: str):
    """Filter -> computed column -> grouped aggregate (M5/M8 + A2/A5 family;
    TPC-H Q1 shape). Revenue is computed per row in integer cents."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], pa.scalar(5.0)))
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": _cents(t["l_quantity"]),
                "base_c": _cents(t["l_extendedprice"]),
                "disc_c": _cents(disc_price),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("base_c", alias_name="sum_base_c"),
            Sum("disc_c", alias_name="sum_disc_c"),
            Count(alias_name="n_rows"),
        )
    )


def q02_orders_by_status(sf_dir: str):
    """Grouped count + sum (A2; reference relationship_summary view,
    db_init.py:202-212)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderstatus": t["o_orderstatus"], "price_c": _cents(t["o_totalprice"])}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="total_c"))
    )


def q03_global_counts(sf_dir: str):
    """Scalar COUNTs per table (A1; database.ts:203-210)."""
    row = {
        f"n_{name}": read_table(sf_dir, name, columns=[col]).count()
        for name, col in [
            ("orders", "o_orderkey"),
            ("customer", "c_custkey"),
            ("lineitem", "l_orderkey"),
            ("part", "p_partkey"),
            ("documents", "doc_id"),
        ]
    }
    return pa.table({k: pa.array([v], pa.int64()) for k, v in row.items()})


def q04_avg_orders_per_customer(sf_dir: str):
    """Nested aggregate: AVG over per-customer order counts (A3;
    database_utils.py:341-349). Integer-exact then scaled to ppm."""
    per_cust = (
        read_table(sf_dir, "orders", columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="cnt"))
    )
    agg = per_cust.aggregate(Sum("cnt"), Count())
    total, n = int(agg["sum(cnt)"]), int(agg["count()"])
    avg_ppm = int(total / n * 1_000_000 + 0.5)  # half-away for positives
    return pa.table(
        {
            "n_orders_total": pa.array([total], pa.int64()),
            "n_customers_with_orders": pa.array([n], pa.int64()),
            "avg_orders_ppm": pa.array([avg_ppm], pa.int64()),
        }
    )


def q11_conditional_counts(sf_dir: str):
    """COUNT(CASE WHEN ...) conditional tallies (A5; database.ts:455-461).
    Block-level partial sums -> one global sum (combiner pattern)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        f = t["l_returnflag"]
        return pa.table(
            {
                "n_r": pa.array([pc.sum(pc.cast(pc.equal(f, "R"), pa.int64())).as_py() or 0], pa.int64()),
                "n_a": pa.array([pc.sum(pc.cast(pc.equal(f, "A"), pa.int64())).as_py() or 0], pa.int64()),
                "n_n": pa.array([pc.sum(pc.cast(pc.equal(f, "N"), pa.int64())).as_py() or 0], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_r", alias_name="n_returned"),
        Sum("n_a", alias_name="n_acked"),
        Sum("n_n", alias_name="n_none"),
    )
    return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in agg.items()})


def q12_events_hourly(sf_dir: str):
    """Tumbling-window aggregate over the events stream table (the engine's
    windowed-aggregate operator; SURVEY §2.10 — batch semantics, event-time
    bucket = date_trunc hour)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "value_c": _cents(t["value"]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
        # Ray's aggregate normalizes the key to timestamp[s]; cast back to
        # timestamp[us] to byte-match DuckDB date_trunc('hour', ts)
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("hour"),
                "hour",
                pc.cast(t["hour"], pa.timestamp("us")),
            ),
            batch_format="pyarrow",
        )
    )


def q21_orders_per_month(sf_dir: str):
    """Date normalization + monthly rollup (M1 date handling,
    extract_and_populate.py:122-125)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        # date32 to byte-match DuckDB date_trunc('month', DATE) -> DATE
        return pa.table(
            {
                "month": pc.cast(
                    pc.floor_temporal(t["o_orderdate"], unit="month"), pa.date32()
                )
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n_orders"))
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / top-k
# ---------------------------------------------------------------------------

def q05_top_parts(sf_dir: str):
    """ORDER BY ... DESC LIMIT k with tiebreaker (O1; db_init.py:231-238)."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    top = ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(10)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_name": t["p_name"],
                "price_c": _cents(t["p_retailprice"]),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


def q17_top_users_by_events(sf_dir: str):
    """Grouped count -> top-k (O1/A2 combo)."""
    return (
        read_table(sf_dir, "events", columns=["user_id"])
        .groupby("user_id")
        .aggregate(Count(alias_name="n_events"))
        .sort(["n_events", "user_id"], descending=[True, False])
        .limit(20)
    )


# ---------------------------------------------------------------------------
# §2.4 joins / lookups
# ---------------------------------------------------------------------------

def _broadcast_column_map(sf_dir: str, table: str, key: str, val: str):
    """Small-side lookup dict shipped to the object store ONCE (T3 broadcast
    pattern; reference: cached seminal paper)."""
    t = read_table(sf_dir, table, columns=[key, val])
    d: dict = {}
    for b in t.iter_batches(batch_size=65536, batch_format="pyarrow"):
        d.update(zip(b[key].to_pylist(), b[val].to_pylist()))
    return ray.put(d)


def _lookup_arrays(mapping: dict, key_type, value_type):
    """Broadcast dict -> parallel Arrow (keys, values) arrays, built ONCE per
    actor/worker in __init__; per-batch probes are then fully vectorized
    (pc.index_in + pc.take), no per-row Python."""
    items = list(mapping.items())
    return (
        pa.array([k for k, _ in items], key_type),
        pa.array([v for _, v in items], value_type),
    )


def _vec_lookup(keys: pa.Array, vals: pa.Array, col) -> pa.Array:
    """Vectorized dict lookup: missing keys -> null."""
    return pc.take(vals, pc.index_in(col, value_set=keys))


def _vec_member_mask(keys: pa.Array, col) -> pa.Array:
    """Vectorized set-membership mask."""
    return pc.is_valid(pc.index_in(col, value_set=keys))


def q06_revenue_by_segment(sf_dir: str):
    """orders ⋈ customer -> grouped revenue (J2 hash join; small side
    broadcast instead of shuffled — SURVEY §4.2)."""
    seg_ref = _broadcast_column_map(sf_dir, "customer", "c_custkey", "c_mktsegment")
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    class JoinSegment:
        def __init__(self, ref) -> None:
            self.keys, self.vals = _lookup_arrays(
                ray.get(ref), pa.int64(), pa.string()
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "c_mktsegment": _vec_lookup(
                        self.keys, self.vals, t["o_custkey"]
                    ),
                    "price_c": _cents(t["o_totalprice"]),
                }
            )

    return (
        orders.map_batches(
            JoinSegment,
            fn_constructor_kwargs={"ref": seg_ref},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="revenue_c"))
    )


def _custkeys_with_orders(sf_dir: str) -> set:
    keys = read_table(sf_dir, "orders", columns=["o_custkey"]).unique("o_custkey")
    return set(keys)


def q07_customers_no_orders(sf_dir: str):
    """Anti-join via broadcast keyset (J3; the resume NOT-EXISTS pattern,
    database.ts:66-81): customers with no finished ('F') orders — restricted
    so the result is non-empty at every scale factor."""
    finished = (
        read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(
                ["o_custkey"]
            ),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )
    have = ray.put(set(finished))
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    class AntiJoin:
        def __init__(self, ref) -> None:
            self.keys = pa.array(sorted(ray.get(ref)), pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(
                pc.invert(_vec_member_mask(self.keys, t["c_custkey"]))
            )

    return cust.map_batches(
        AntiJoin, fn_constructor_kwargs={"ref": have},
        batch_format="pyarrow", concurrency=(1, 2),
    ).sort("c_custkey")


def q08_customers_with_orders(sf_dir: str):
    """Semi-join via broadcast keyset (J4/J5; database.ts:295-326)."""
    have = ray.put(_custkeys_with_orders(sf_dir))
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    class SemiJoin:
        def __init__(self, ref) -> None:
            self.keys = pa.array(sorted(ray.get(ref)), pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(_vec_member_mask(self.keys, t["c_custkey"]))

    return cust.map_batches(
        SemiJoin, fn_constructor_kwargs={"ref": have},
        batch_format="pyarrow", concurrency=(1, 2),
    ).sort("c_custkey")


def q09_nation_customer_counts(sf_dir: str):
    """LEFT JOIN + grouped count keeping empty groups (J7;
    database.ts:419-431). Counts shuffle-aggregated; the 25-row nation dim is
    joined driver-side."""
    counts = (
        read_table(sf_dir, "customer", columns=["c_nationkey"])
        .groupby("c_nationkey")
        .aggregate(Count(alias_name="n_customers"))
        .to_pandas()
    )
    by_key = dict(zip(counts["c_nationkey"], counts["n_customers"]))
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    return pa.table(
        {
            "n_name": pa.array(nation["n_name"], pa.string()),
            "n_customers": pa.array(
                [int(by_key.get(k, 0)) for k in nation["n_nationkey"]], pa.int64()
            ),
        }
    )


def q19_suppliers_by_region(sf_dir: str):
    """3-way dim join via chained broadcast maps (J2 multi-join,
    database_utils.py:260-275)."""
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    nation_to_region = {
        int(k): dict(zip(reg["r_regionkey"], reg["r_name"]))[int(v)]
        for k, v in zip(nat["n_nationkey"], nat["n_regionkey"])
    }
    ref = ray.put(nation_to_region)
    sup = read_table(sf_dir, "supplier", columns=["s_nationkey"])

    class ToRegion:
        def __init__(self, r) -> None:
            self.keys, self.vals = _lookup_arrays(
                ray.get(r), pa.int64(), pa.string()
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table(
                {"r_name": _vec_lookup(self.keys, self.vals, t["s_nationkey"])}
            )

    return (
        sup.map_batches(
            ToRegion, fn_constructor_kwargs={"r": ref},
            batch_format="pyarrow", concurrency=1,
        )
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"))
    )


def q10_suppliers_per_part(sf_dir: str):
    """Exact COUNT(DISTINCT) (A6; no sketch — db_init.py:187-198) in ONE
    shuffle: block-level pair dedup (combiner), then a custom set-union
    aggregator per part key (accumulator state round-trips Arrow blocks as
    lists, hence the set()/sorted() dance). The distinct-suppkey set per
    part is dimension-bounded, so accumulator size is safe at scale."""
    from ray.data.aggregate import AggregateFn

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    distinct_count = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: sorted(set(a) | set(b)),
        name="n_suppliers",
        accumulate_block=lambda s, block: sorted(
            set(s) | set(block["l_suppkey"].to_pylist())
        ),
        finalize=lambda s: len(set(s)),
    )
    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(distinct_count)
    )


# ---------------------------------------------------------------------------
# §2.7 set ops / dedup
# ---------------------------------------------------------------------------

def q13_dedup_docs_exact(sf_dir: str):
    """Exact document dedup: hash-partition by content, keep first (D1;
    fetch_papers.py:84-96). Content hash computed per block, groupby hash."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        import hashlib

        hashes = [
            hashlib.sha1(x.encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({"h": pa.array(hashes, pa.string()), "doc_id": t["doc_id"]})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups"))
        .select_columns(["doc_id", "n_dups"])
    )


def q20_union_distinct(sf_dir: str):
    """Union of two filtered sources then exact dedup (D5 + D1;
    fetch_papers.py:183-186)."""
    a = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]).map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], pa.scalar(5000.0))).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    b = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    return (
        a.union(b)
        .groupby("c_custkey")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["c_custkey"])
        .sort("c_custkey")
    )


# ---------------------------------------------------------------------------
# text analysis over documents (SQL-expressible subset)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_WS_TOKEN_RE = re.compile(r"\S+")


def q14_term_counts(sf_dir: str):
    """Global token frequency, top 100 — the mention_count shuffle in
    miniature (A4; database.ts:102-110): per-block partial counts (combiner)
    -> global sum -> top-k."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
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

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n_p", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(100)
    )


def q15_doc_token_stats(sf_dir: str):
    """Per-document char/token stats (M3; extract_and_populate.py:74-87)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars2": pa.array([len(x) for x in texts], pa.int64()),
                "n_tokens": pa.array(
                    [len(_WS_TOKEN_RE.findall(x)) for x in texts], pa.int64()
                ),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def q18_docs_by_lang(sf_dir: str):
    """Grouped doc stats by language (A2 over documents)."""
    return (
        read_table(sf_dir, "documents", columns=["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
    )


# ---------------------------------------------------------------------------
# similarity search (brute-force cosine top-k; SQL oracle via DuckDB
# list_cosine_similarity)
# ---------------------------------------------------------------------------

def q16_knn_vec0(sf_dir: str):
    """Top-10 nearest neighbours of vec_id=0 by cosine — delegates to the
    brute-force per-block top-k combiner (stages/similarity.py): only k rows
    per block reach the driver merge, no global sort shuffle (SURVEY
    'similarity search')."""
    from ..stages.similarity import brute_force_topk

    top = brute_force_topk(sf_dir, query_ids=[0], k=10)
    return top.select(["vec_id", "rank"])


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — names and types mirror the Ray outputs exactly
# ---------------------------------------------------------------------------


def q69_rollup(sf_dir: str):
    """ROLLUP(o_orderstatus, month): detail rows plus per-status subtotals
    plus the grand total — the GROUPING SETS / OLAP-subtotal shape. The
    detail aggregate runs distributed (per-block combiner -> one groupby);
    the two upper levels are derived from the DETAIL aggregate (statuses x
    months rows, never the corpus), which is the standard rollup-from-
    finest optimization. 'ALL' marks rolled-up dimensions. Output:
    (o_orderstatus, month_s, n_orders, total_c) sorted by
    (o_orderstatus, month_s)."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        month = pc.cast(
            pc.cast(
                pc.floor_temporal(t["o_orderdate"], unit="month"), pa.date32()
            ),
            pa.string(),
        )
        g = (
            pa.table(
                {
                    "o_orderstatus": t["o_orderstatus"],
                    "month_s": month,
                    "tc": cents(t["o_totalprice"]),
                }
            )
            .group_by(["o_orderstatus", "month_s"])
            .aggregate([("tc", "count"), ("tc", "sum")])
        )
        return g.rename_columns(["o_orderstatus", "month_s", "n_p", "tc_p"])

    detail = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["o_orderstatus", "month_s"])
        .aggregate(Sum("n_p", alias_name="n_orders"),
                   Sum("tc_p", alias_name="total_c"))
        .to_pandas()  # statuses x months rows
    )
    import pandas as pd

    lvl1 = (
        detail.groupby("o_orderstatus", as_index=False)[["n_orders", "total_c"]]
        .sum()
        .assign(month_s="ALL")
    )
    lvl0 = pd.DataFrame(
        [
            {
                "o_orderstatus": "ALL",
                "month_s": "ALL",
                "n_orders": detail["n_orders"].sum(),
                "total_c": detail["total_c"].sum(),
            }
        ]
    )
    out = pd.concat([detail, lvl1, lvl0], ignore_index=True)
    out = out[["o_orderstatus", "month_s", "n_orders", "total_c"]]
    out = out.astype({"n_orders": "int64", "total_c": "int64"})
    return out.sort_values(["o_orderstatus", "month_s"]).reset_index(drop=True)

ORACLE_SQL: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_base_c,
               CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS sum_disc_c,
               COUNT(*) AS n_rows
        FROM lineitem WHERE l_quantity > 5
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_orders_by_status": """
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_c
        FROM orders GROUP BY o_orderstatus
    """,
    "q03_global_counts": """
        SELECT (SELECT COUNT(*) FROM orders)    AS n_orders,
               (SELECT COUNT(*) FROM customer)  AS n_customer,
               (SELECT COUNT(*) FROM lineitem)  AS n_lineitem,
               (SELECT COUNT(*) FROM part)      AS n_part,
               (SELECT COUNT(*) FROM documents) AS n_documents
    """,
    "q04_avg_orders_per_customer": """
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_orders_total,
               COUNT(*) AS n_customers_with_orders,
               CAST(round(AVG(cnt)*1000000, 0) AS BIGINT) AS avg_orders_ppm
        FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey)
    """,
    "q05_top_parts": """
        SELECT p_partkey, p_name,
               CAST(round(p_retailprice*100,0) AS BIGINT) AS price_c
        FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10
    """,
    "q06_revenue_by_segment": """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_c
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q07_customers_no_orders": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey
    """,
    "q08_customers_with_orders": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "q09_nation_customer_counts": """
        SELECT n_name, COUNT(c_custkey) AS n_customers
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q10_suppliers_per_part": """
        SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem GROUP BY l_partkey
    """,
    "q11_conditional_counts": """
        SELECT COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
               COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS n_acked,
               COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS n_none
        FROM lineitem
    """,
    "q12_events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
               CAST(SUM(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS value_c
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "q13_dedup_docs_exact": """
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
        FROM documents GROUP BY text
    """,
    "q14_term_counts": """
        SELECT term, COUNT(*) AS n FROM (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
            FROM documents)
        GROUP BY term ORDER BY n DESC, term LIMIT 100
    """,
    "q15_doc_token_stats": """
        SELECT doc_id, length(text) AS n_chars2,
               length(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '')) AS n_tokens
        FROM documents
    """,
    "q16_knn_vec0": """
        SELECT vec_id, rank FROM (
            SELECT vec_id,
                   CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
            FROM (
                SELECT vec_id,
                       list_cosine_similarity(
                           CAST(embedding AS DOUBLE[]),
                           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                            WHERE vec_id = 0)) AS sim
                FROM embeddings WHERE vec_id <> 0))
        WHERE rank <= 10
    """,
    "q17_top_users_by_events": """
        SELECT user_id, COUNT(*) AS n_events FROM events
        GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 20
    """,
    "q18_docs_by_lang": """
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    """,
    "q19_suppliers_by_region": """
        SELECT r_name, COUNT(*) AS n_suppliers
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q20_union_distinct": """
        SELECT DISTINCT c_custkey FROM customer
        WHERE c_acctbal > 5000 OR c_mktsegment = 'BUILDING'
        ORDER BY c_custkey
    """,
    "q21_orders_per_month": """
        SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders
        FROM orders GROUP BY date_trunc('month', o_orderdate)
    """,
    "q69_rollup": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               COALESCE(m, 'ALL') AS month_s,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS total_c
        FROM (
            SELECT o_orderstatus,
                   CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
                        AS VARCHAR) AS m,
                   o_totalprice
            FROM orders
        )
        GROUP BY ROLLUP (o_orderstatus, m)
        ORDER BY o_orderstatus, month_s
    """,
}

QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_orders_by_status": q02_orders_by_status,
    "q03_global_counts": q03_global_counts,
    "q04_avg_orders_per_customer": q04_avg_orders_per_customer,
    "q05_top_parts": q05_top_parts,
    "q06_revenue_by_segment": q06_revenue_by_segment,
    "q07_customers_no_orders": q07_customers_no_orders,
    "q08_customers_with_orders": q08_customers_with_orders,
    "q09_nation_customer_counts": q09_nation_customer_counts,
    "q10_suppliers_per_part": q10_suppliers_per_part,
    "q11_conditional_counts": q11_conditional_counts,
    "q12_events_hourly": q12_events_hourly,
    "q13_dedup_docs_exact": q13_dedup_docs_exact,
    "q14_term_counts": q14_term_counts,
    "q15_doc_token_stats": q15_doc_token_stats,
    "q16_knn_vec0": q16_knn_vec0,
    "q17_top_users_by_events": q17_top_users_by_events,
    "q18_docs_by_lang": q18_docs_by_lang,
    "q19_suppliers_by_region": q19_suppliers_by_region,
    "q20_union_distinct": q20_union_distinct,
    "q21_orders_per_month": q21_orders_per_month,
    "q69_rollup": q69_rollup,
}


# ---------------------------------------------------------------------------
# q93: referential-integrity audit — the data-quality pass a pipeline runs
# before trusting joins (the reference's validation theme, SURVEY §2.9.4,
# extended to cross-table invariants). For every FK edge: child row count
# and orphan count, via a tag-union groupby anti-join (parent keys and
# per-block-deduped child keys share one shuffle; a key's group decides
# orphanhood locally — the kcore _drop_low_bucketed shape, no broadcast,
# so the parent side may be arbitrarily large).
# ---------------------------------------------------------------------------

_FK_EDGES = [
    # (name, child table, child col, parent table, parent col)
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
]


def q93_fk_audit(sf_dir: str):
    """(fk, n_child, n_orphans) for every FK edge, sorted by fk."""
    rows = []
    for name, ctab, ccol, ptab, pcol in _FK_EDGES:
        child = read_table(sf_dir, ctab, columns=[ccol])
        parent = read_table(sf_dir, ptab, columns=[pcol])

        n_child = child.count()

        def child_rows(t: pa.Table, _c=ccol) -> pa.Table:
            import numpy as np

            k = t[_c].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            ids, cnt = np.unique(k, return_counts=True)
            return pa.table(
                {
                    "k": pa.array(ids, pa.int64()),
                    "n_c": pa.array(cnt.astype("int64"), pa.int64()),
                    "is_parent": pa.array([False] * len(ids), pa.bool_()),
                }
            )

        def parent_rows(t: pa.Table, _p=pcol) -> pa.Table:
            return pa.table(
                {
                    "k": pc.cast(t[_p], pa.int64()),
                    "n_c": pa.array([0] * t.num_rows, pa.int64()),
                    "is_parent": pa.array([True] * t.num_rows, pa.bool_()),
                }
            )

        def orphan_partial(g) -> dict:
            has_parent = bool(g["is_parent"].any())
            n = 0 if has_parent else int(g["n_c"].sum())
            return {"orph_p": np.array([n], np.int64)}

        tagged = child.map_batches(child_rows, batch_format="pyarrow").union(
            parent.map_batches(parent_rows, batch_format="pyarrow")
        )
        orph = tagged.groupby("k").map_groups(
            orphan_partial, batch_format="pandas"
        ).sum("orph_p")
        rows.append((name, int(n_child), int(orph or 0)))

    rows.sort()
    return pa.table(
        {
            "fk": pa.array([r[0] for r in rows], pa.string()),
            "n_child": pa.array([r[1] for r in rows], pa.int64()),
            "n_orphans": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


QUERIES["q93_fk_audit"] = q93_fk_audit

ORACLE_SQL["q93_fk_audit"] = """
    SELECT * FROM (
        SELECT 'orders.custkey' AS fk,
               CAST(COUNT(*) AS BIGINT) AS n_child,
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'lineitem.orderkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'customer.nationkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        UNION ALL
        SELECT 'supplier.nationkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
        UNION ALL
        SELECT 'nation.regionkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    ) ORDER BY fk
"""
