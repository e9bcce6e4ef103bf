"""Temporal / windowed / non-equi operators over the events and part tables.

Custom distributed operators Ray Data has no built-in for, each expressed as
the composition the SURVEY §2.10 plan prescribes (groupby().map_groups over
explicitly ordered groups, or broadcast small side + vectorized predicate),
with an exact DuckDB oracle:

- as-of join        (q33): per-user most-recent-prior match — the classic
                    event-to-state temporal join (DuckDB ASOF JOIN).
                    Partitioning assumption: one user's events fit one group.
- range join        (q34): many-to-many non-equi interval join against a
                    BROADCAST band table (the small-side path; an
                    interval-overlap join of two big sides would instead
                    bucket both sides by coarse range and join per bucket).
- windowed cumsum   (q35): ROWS UNBOUNDED PRECEDING running aggregate per
                    user, ordered by (ts, event_id).
- exact quantiles   (q36): per-group exact order statistics (lower median /
                    p90 by index selection — no interpolation, so results
                    are integer-exact across engines).
- pivot             (q37): event_type -> columns conditional aggregation,
                    pre-aggregated per block (combiner) before the shuffle.

All monetary/float outputs are integer cents (see analytics.py docstring);
every aggregate in the oracles is CAST(... AS BIGINT) (NOTES.md invariant 3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.tables import read_table
from .analytics import cents, cents_np


PAIR_WINDOW_S = 120  # q68 stream-stream join window (seconds)


def _np_i64(col) -> np.ndarray:
    return col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)


def _np_ts_us(col) -> np.ndarray:
    return (
        col.combine_chunks()
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )


# ---------------------------------------------------------------------------
# q33: as-of join (clicks matched to the most recent prior purchase per user)
# ---------------------------------------------------------------------------

def q33_asof_join(sf_dir: str):
    """For every 'click' event: the most recent 'purchase' by the same user
    with purchase.ts <= click.ts (inclusive), plus the lag in microseconds;
    unmatched clicks keep NULLs (ASOF LEFT JOIN semantics).

    Shape: one filtered read tags both sides, ONE hash shuffle on user_id,
    then a sorted searchsorted merge inside each group — the standard
    distributed as-of join (sort-merge within co-partitioned keys). Right
    rows sharing (user_id, ts) are deduped to max event_id first so the
    match is deterministic."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"])))
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "is_left": pc.equal(t["event_type"], "click"),
            }
        )

    def asof_group(t: pa.Table) -> pa.Table:
        ids = _np_i64(t["event_id"])
        ts = _np_ts_us(t["ts"])
        left = t["is_left"].combine_chunks().to_numpy(zero_copy_only=False).astype(bool)

        l_ids, l_ts = ids[left], ts[left]
        r_ids, r_ts = ids[~left], ts[~left]
        # dedup right side per ts -> max event_id (deterministic ASOF match)
        order = np.lexsort((r_ids, r_ts))
        r_ids, r_ts = r_ids[order], r_ts[order]
        if len(r_ts):
            last_of_ts = np.r_[r_ts[1:] != r_ts[:-1], True]
            r_ids, r_ts = r_ids[last_of_ts], r_ts[last_of_ts]

        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        miss = idx < 0
        safe = np.where(miss, 0, idx)
        matched = r_ids[safe] if len(r_ids) else np.zeros(len(l_ids), np.int64)
        lag = l_ts - (r_ts[safe] if len(r_ts) else 0)
        return pa.table(
            {
                "event_id": pa.array(l_ids, pa.int64()),
                "matched_id": pa.array(matched, pa.int64(), mask=miss),
                "lag_us": pa.array(lag, pa.int64(), mask=miss),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(asof_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# q34: range join against a broadcast band table (overlapping intervals ->
# genuinely many-to-many; binning alone cannot express it)
# ---------------------------------------------------------------------------

PRICE_BANDS: list[tuple[int, float, float]] = [
    (0, 900.0, 930.0),
    (1, 920.0, 960.0),
    (2, 950.0, 1000.0),
    (3, 925.0, 975.0),
    (4, 0.0, 10000.0),  # catch-all band overlaps every other band
]


def q34_range_join_bands(sf_dir: str):
    """part ⋈ bands ON lo <= p_retailprice < hi -> per-band count + total
    cents. The band table is a compile-time constant (the broadcast small
    side); each block evaluates every band predicate vectorized and emits
    per-block partials, so the only shuffle is the tiny per-band rollup."""
    ds = read_table(sf_dir, "part", columns=["p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        p = t["p_retailprice"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        c = cents_np(p)
        band_ids, ns, sums = [], [], []
        for band_id, lo, hi in PRICE_BANDS:
            m = (p >= lo) & (p < hi)
            if m.any():
                band_ids.append(band_id)
                ns.append(int(m.sum()))
                sums.append(int(c[m].sum()))
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int64()),
                "n_p": pa.array(ns, pa.int64()),
                "sum_p": pa.array(sums, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("band_id")
        .aggregate(
            Sum("n_p", alias_name="n_parts"),
            Sum("sum_p", alias_name="sum_price_c"),
        )
    )


# ---------------------------------------------------------------------------
# q35: per-user running aggregate (ROWS UNBOUNDED PRECEDING window)
# ---------------------------------------------------------------------------

def q35_window_cumsum(sf_dir: str):
    """Running cents-sum and row number per user over (ts, event_id) order —
    the ROWS-frame window aggregate (q31 is the RANGE-frame sibling)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def cum_group(t: pa.Table) -> pa.Table:
        ids = _np_i64(t["event_id"])
        ts = _np_ts_us(t["ts"])
        v_c = cents_np(t["value"].combine_chunks().to_numpy(zero_copy_only=False))
        order = np.lexsort((ids, ts))
        return pa.table(
            {
                "event_id": pa.array(ids[order], pa.int64()),
                "rn": pa.array(np.arange(1, len(ids) + 1), pa.int64()),
                "run_c": pa.array(np.cumsum(v_c[order]), pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(cum_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# q36: exact per-group order statistics (index selection, no interpolation)
# ---------------------------------------------------------------------------

def q36_grouped_quantiles(sf_dir: str):
    """Per event_type over integer cents: n, min, lower median
    (sorted[(n-1)//2]), p90 (sorted[floor(0.9*(n-1))]), max. Index selection
    keeps the result integer-exact across engines — interpolation would
    reintroduce float drift."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def q_group(t: pa.Table) -> pa.Table:
        v = np.sort(cents_np(t["value"].combine_chunks().to_numpy(zero_copy_only=False)))
        n = len(v)
        return pa.table(
            {
                "event_type": pa.array([t["event_type"][0].as_py()], pa.string()),
                "n": pa.array([n], pa.int64()),
                "min_c": pa.array([int(v[0])], pa.int64()),
                "median_c": pa.array([int(v[(n - 1) // 2])], pa.int64()),
                "p90_c": pa.array([int(v[int(np.floor(0.9 * (n - 1)))])], pa.int64()),
                "max_c": pa.array([int(v[-1])], pa.int64()),
            }
        )

    return ds.groupby("event_type").map_groups(q_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# q37: pivot (event_type -> columns), per-block partials before the shuffle
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q37_event_pivot(sf_dir: str):
    """Per-user event counts pivoted to one column per event_type. Each block
    pre-aggregates its own (user, type) counts via Arrow group_by (combiner),
    so the global shuffle carries at most users x types tiny rows."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for et in EVENT_TYPES:
            cols[f"p_{et}"] = pc.cast(pc.equal(t["event_type"], et), pa.int64())
        g = pa.table(cols).group_by("user_id").aggregate(
            [(f"p_{et}", "sum") for et in EVENT_TYPES]
        )
        return pa.Table.from_arrays(
            [g["user_id"]] + [pc.cast(g[f"p_{et}_sum"], pa.int64()) for et in EVENT_TYPES],
            names=["user_id"] + [f"n_{et}" for et in EVENT_TYPES],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{et}", alias_name=f"n_{et}") for et in EVENT_TYPES])
    )


# ---------------------------------------------------------------------------
# q38: stratified deterministic sample (per-group rates)
# ---------------------------------------------------------------------------

# per-stratum admission: md5 last hex digit of event_id in the first
# rate_hex characters of "0123456789abcdef" (purchase kept whole, clicks
# half, everything else a quarter) — membership depends only on the key
# (stable split family, like q32, but with PER-GROUP rates: the balanced /
# class-rebalancing sample a training-data pipeline draws)
STRATA_RATE_HEX = {"purchase": 16, "click": 8}
DEFAULT_RATE_HEX = 4
_HEX = "0123456789abcdef"


def q38_stratified_sample(sf_dir: str):
    """Deterministic stratified sample of events: per-event_type admission
    rates keyed on md5(event_id) — no RNG state, no partition dependence —
    then per-stratum count + cents total of the admitted rows."""
    import hashlib

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def sample(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_pylist()
        types = t["event_type"].to_pylist()
        keep = pa.array(
            [
                _HEX.index(hashlib.md5(str(i).encode()).hexdigest()[-1])
                < STRATA_RATE_HEX.get(et, DEFAULT_RATE_HEX)
                for i, et in zip(ids, types)
            ]
        )
        f = t.filter(keep)
        return pa.table(
            {
                "event_type": f["event_type"],
                "value_c": cents(f["value"]),
            }
        )

    return (
        ds.map_batches(sample, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_sampled"),
            Sum("value_c", alias_name="total_c"),
        )
    )


# ---------------------------------------------------------------------------
# q39: watermark + tumbling window (the batch analog of late-data handling)
# ---------------------------------------------------------------------------

WATERMARK_DELAY_US = 3600 * 1_000_000  # 1 hour


def q39_watermark_window(sf_dir: str):
    """Event-time watermark + tumbling hourly window: only events at or
    before (max event time - 1h) are counted — the batch expression of
    streaming late-data cutoff. Two-pass shape: a tiny global max aggregate
    reaches the driver, is broadcast as a filter constant, then the q12-style
    windowed rollup runs over the admitted rows."""
    import ray

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])
    max_ts = ds.max("ts")  # one scalar to the driver
    cutoff = (
        np.datetime64(max_ts, "us").astype(np.int64) - WATERMARK_DELAY_US
    )
    cut_ref = ray.put(cutoff)

    class AdmitAndBucket:
        def __init__(self, ref) -> None:
            self.cut = pa.scalar(
                np.int64(ray.get(ref)).item() , pa.timestamp("us")
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.less_equal(t["ts"], self.cut))
            return pa.table(
                {
                    "event_type": t["event_type"],
                    "hour": pc.floor_temporal(t["ts"], unit="hour"),
                }
            )

    return (
        ds.map_batches(
            AdmitAndBucket, fn_constructor_kwargs={"ref": cut_ref},
            batch_format="pyarrow", concurrency=(1, 2),
        )
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("hour"), "hour",
                pc.cast(t["hour"], pa.timestamp("us")),
            ),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# q40: large x large shuffle anti-join (cogroup form)
# ---------------------------------------------------------------------------

def q40_orders_no_returns(sf_dir: str):
    """Orders with NO returned ('R') lineitem — the anti-join where BOTH
    sides are big, so the broadcast-keyset form (q07) doesn't apply: tag the
    two sides, ONE hash shuffle on the key, keep keys whose group holds no
    right-side row. Per-key groups are order-sized (1 + its lineitems), so
    no group can blow up."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        lambda t: pa.table(
            {
                "k": t["o_orderkey"],
                "side": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    def returned_keys(t: pa.Table) -> pa.Table:
        # combiner: dedupe per block — the shuffle carries distinct keys per
        # block, not one row per matching lineitem
        ks = pc.unique(
            t.filter(pc.equal(t["l_returnflag"], "R"))["l_orderkey"]
        )
        return pa.table(
            {"k": ks, "side": pa.array(np.ones(len(ks), np.int8))}
        )

    returned = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"]
    ).map_batches(returned_keys, batch_format="pyarrow")

    # anti-join as a vectorized aggregate: a key survives iff its group's
    # MAX(side) == 0 (left present by construction — every order key has its
    # left row; right-only keys cannot exist since lineitems reference
    # orders). No per-group Python, just one shuffle aggregate + a filter.
    agg = orders.union(returned).groupby("k").aggregate(
        Max("side", alias_name="mx")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t.filter(pc.equal(t["mx"], 0))["k"]}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# q83: Markov transition matrix over consecutive events (lead/lag shape)
# ---------------------------------------------------------------------------

def q83_event_transitions(sf_dir: str):
    """Transition counts + integer-ppm probabilities between CONSECUTIVE
    event types per user (the window ``lead()`` shape; reference analog:
    ordered per-paper processing, database.ts:76, generalized to per-key
    sequences).

    Shape: ONE hash shuffle on user_id; inside each group events are sorted
    by (ts, event_id) and adjacent-pair counts are pre-aggregated (each
    group emits at most |types|^2 rows — a combiner), then a tiny global
    groupby sums them. p_ppm = floor(1e6 * n / n_src) is integer-exact.
    At 100 TB: the per-user groups are small and the aggregated matrix is
    |types|^2 regardless of corpus size — nothing corpus-sized moves after
    the single shuffle."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def pair_counts(g) -> dict:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return {"src": np.array([], dtype=object), "dst": np.array([], dtype=object),
                    "n": np.array([], np.int64)}
        import pandas as pd

        df = pd.DataFrame({"src": et[:-1], "dst": et[1:]})
        c = df.groupby(["src", "dst"], sort=False).size().reset_index(name="n")
        return {"src": c["src"].to_numpy(), "dst": c["dst"].to_numpy(),
                "n": c["n"].to_numpy().astype(np.int64)}

    agg = (
        ds.groupby("user_id")
        .map_groups(pair_counts, batch_format="pandas")
        .groupby(["src", "dst"])
        .aggregate(Sum("n", alias_name="n"))
    )
    # the aggregated matrix is <= |types|^2 rows: finalize driver-side
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_format="pyarrow", batch_size=None)]
    )
    import pandas as pd

    df = t.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    totals = df.groupby("src")["n"].transform("sum")
    df["p_ppm"] = (1_000_000 * df["n"]) // totals
    return pa.table(
        {
            "src": pa.array(df["src"], pa.string()),
            "dst": pa.array(df["dst"], pa.string()),
            "n": pa.array(df["n"], pa.int64()),
            "p_ppm": pa.array(df["p_ppm"], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q84: ordered grouped collect (string_agg / array_agg with ORDER BY shape)
# ---------------------------------------------------------------------------

def q84_user_paths(sf_dir: str):
    """Per user: the '>'-joined sequence of its FIRST 5 event types in
    (ts, event_id) order plus the total event count — the deterministic
    ordered-collect (``string_agg(... ORDER BY ...)``) operator.

    Shape: one hash shuffle on user_id; per group a bounded head-5 join —
    output is one short row per user, never proportional to events."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def collect(g) -> dict:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        return {
            "user_id": np.array([int(g["user_id"].iloc[0])], np.int64),
            "path5": np.array([">".join(et[:5])], dtype=object),
            "n_events": np.array([len(et)], np.int64),
        }

    return ds.groupby("user_id").map_groups(collect, batch_format="pandas")


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_BANDS_VALUES = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in PRICE_BANDS)

ORACLE_SQL: dict[str, str] = {
    "q33_asof_join": """
        WITH l AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click'),
             r AS (SELECT user_id, ts, MAX(event_id) AS matched_id
                   FROM events WHERE event_type = 'purchase'
                   GROUP BY user_id, ts)
        SELECT l.event_id,
               CAST(r.matched_id AS BIGINT) AS matched_id,
               CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS lag_us
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "q34_range_join_bands": f"""
        WITH bands(band_id, lo, hi) AS (VALUES {_BANDS_VALUES})
        SELECT CAST(band_id AS BIGINT) AS band_id,
               COUNT(*) AS n_parts,
               CAST(SUM(CAST(round(p_retailprice*100,0) AS BIGINT)) AS BIGINT)
                   AS sum_price_c
        FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band_id
    """,
    "q35_window_cumsum": """
        SELECT event_id,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(SUM(CAST(round(value*100,0) AS BIGINT)) OVER w AS BIGINT)
                   AS run_c
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "q36_grouped_quantiles": """
        WITH c AS (SELECT event_type,
                          CAST(round(value*100,0) AS BIGINT) AS v
                   FROM events),
             r AS (SELECT event_type, v,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY v) - 1 AS rn,
                          COUNT(*) OVER (PARTITION BY event_type) AS n
                   FROM c)
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(v) AS BIGINT) AS min_c,
               CAST(MAX(CASE WHEN rn = (n-1)//2 THEN v END) AS BIGINT)
                   AS median_c,
               CAST(MAX(CASE WHEN rn = CAST(floor(0.9*(n-1)) AS BIGINT)
                        THEN v END) AS BIGINT) AS p90_c,
               CAST(MAX(v) AS BIGINT) AS max_c
        FROM r GROUP BY event_type
    """,
    "q40_orders_no_returns": """
        SELECT o_orderkey FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
    """,
    "q39_watermark_window": """
        SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
        FROM events
        WHERE epoch_us(ts) <= (SELECT MAX(epoch_us(ts)) FROM events)
                              - 3600000000
        GROUP BY event_type, date_trunc('hour', ts)
    """,
    "q38_stratified_sample": """
        SELECT event_type, COUNT(*) AS n_sampled,
               CAST(SUM(CAST(round(value*100,0) AS BIGINT)) AS BIGINT)
                   AS total_c
        FROM events
        WHERE strpos('0123456789abcdef',
                     substr(md5(CAST(event_id AS VARCHAR)), 32, 1)) - 1
              < CASE event_type WHEN 'purchase' THEN 16
                                WHEN 'click' THEN 8 ELSE 4 END
        GROUP BY event_type
    """,
    "q37_event_pivot": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "q62_funnel": """
        WITH s1 AS (
            SELECT user_id,
                   MIN(ts) FILTER (event_type = 'signup') AS t1
            FROM events GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON s1.user_id = e.user_id
            WHERE e.event_type = 'view' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON s2.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > s2.t2
            GROUP BY e.user_id
        ),
        s4 AS (
            SELECT e.user_id, MIN(e.ts) AS t4
            FROM events e JOIN s3 ON s3.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s3.t3
            GROUP BY e.user_id
        )
        SELECT u.user_id,
               CAST(CASE WHEN s4.t4 IS NOT NULL THEN 4
                         WHEN s3.t3 IS NOT NULL THEN 3
                         WHEN s2.t2 IS NOT NULL THEN 2
                         WHEN s1.t1 IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS funnel_depth
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 ON s1.user_id = u.user_id
        LEFT JOIN s2 ON s2.user_id = u.user_id
        LEFT JOIN s3 ON s3.user_id = u.user_id
        LEFT JOIN s4 ON s4.user_id = u.user_id
        ORDER BY u.user_id
    """,
    "q66_value_outliers": """
        WITH c AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS vc
            FROM events
        ),
        ranked AS (
            SELECT event_type, vc,
                   row_number() OVER (PARTITION BY event_type ORDER BY vc)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM c
        ),
        thr AS (
            SELECT event_type,
                   MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN vc END)
                       AS p99
            FROM ranked GROUP BY event_type
        )
        SELECT c.event_id, c.event_type, c.vc AS value_cents
        FROM c JOIN thr USING (event_type)
        WHERE c.vc > thr.p99
        ORDER BY c.event_id
    """,
"q68_event_pairs": f"""
        SELECT e1.event_type AS type_a, e2.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND (e2.ts > e1.ts OR (e2.ts = e1.ts AND e2.event_id > e1.event_id))
         AND e2.ts <= e1.ts + INTERVAL {PAIR_WINDOW_S} SECOND
        GROUP BY e1.event_type, e2.event_type
        ORDER BY type_a, type_b
    """,
}


# ---------------------------------------------------------------------------
# q62: ordered conversion funnel
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def q62_funnel(sf_dir: str):
    """Per-user ordered funnel depth over FUNNEL_STAGES: stage i counts only
    if its earliest qualifying event is STRICTLY after the previous stage's
    matched time (the classic product-analytics conversion funnel). Output:
    (user_id, funnel_depth) for every user, sorted by user_id.

    Shape: one groupby(user_id) with a vectorized per-group walk (events
    sorted by (ts, event_id); each stage is a searchsorted over that user's
    stage-filtered times). Partitioning assumption: one user's events fit a
    group — same contract as q30/q33/q35."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type", "event_id"])

    def depth(df) -> pa.Table:
        uid = int(df["user_id"].iloc[0])
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        t_prev = -(1 << 62)
        d = 0
        for stage in FUNNEL_STAGES:
            cand = ts[(et == stage) & (ts > t_prev)]
            if not len(cand):
                break
            t_prev = int(cand[0])  # ts-sorted: first qualifying == earliest
            d += 1
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "funnel_depth": pa.array([d], pa.int64()),
            }
        )

    return ev.groupby("user_id").map_groups(depth, batch_format="pandas").sort("user_id")


# ---------------------------------------------------------------------------
# q66: grouped-quantile outlier filter
# ---------------------------------------------------------------------------


def q66_value_outliers(sf_dir: str):
    """Events whose value (in cents) is STRICTLY above their event_type's
    p99 — the data-cleaning pass that drops tail anomalies before training.
    p99 = value at 1-based ascending rank ceil(0.99 * n) within the type
    (same integer rank arithmetic as q55). Output:
    (event_id, event_type, value_cents) sorted by event_id.

    Shape: per-(type, cents) distinct-value histogram (block combiner ->
    small groupby; the shuffle moves distinct values, not rows), driver
    walks the tiny cumulative histogram to per-type thresholds (n_types
    ints), then a broadcast-threshold map filters the corpus. For an
    unbounded value domain use the q36 sort path instead."""
    from ray.data.aggregate import Sum as _Sum

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "vc": pa.array(
                    cents_np(t["value"].combine_chunks().to_numpy(
                        zero_copy_only=False)),
                    pa.int64(),
                ),
            }
        )

    kd = ev.map_batches(keyed, batch_format="pyarrow")

    def per_block(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "vc"]).aggregate([("vc", "count")])
        return g.rename_columns(["event_type", "vc", "cnt"])

    hist = (
        kd.map_batches(per_block, batch_format="pyarrow")
        .groupby(["event_type", "vc"])
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .to_pandas()  # distinct (type, cents) values
    )
    thr: dict[str, int] = {}
    for et, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("vc", kind="mergesort")
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        rank = (99 * n + 99) // 100  # ceil(99n/100), integer-exact
        thr[str(et)] = int(g["vc"].to_numpy()[np.searchsorted(cum, rank)])

    def keep(t: pa.Table) -> pa.Table:
        ets = t["event_type"].to_pylist()
        vc = t["vc"].combine_chunks().to_numpy(zero_copy_only=False)
        lim = np.array([thr[e] for e in ets], np.int64)
        out = t.filter(pa.array(vc > lim))
        return pa.table(
            {
                "event_id": out["event_id"],
                "event_type": out["event_type"],
                "value_cents": out["vc"],
            }
        )

    return kd.map_batches(keep, batch_format="pyarrow").sort("event_id")


# ---------------------------------------------------------------------------
# q68: windowed event-pair self-join (stream-stream join shape)
# ---------------------------------------------------------------------------


def q68_event_pairs(sf_dir: str):
    """Counts of ordered event-type pairs occurring within PAIR_WINDOW_S
    seconds for the same user (e1 strictly before e2 by (ts, event_id)) —
    the bounded-window stream-stream self-join (CEP / co-occurrence
    mining). Output: (type_a, type_b, n_pairs) sorted by (type_a, type_b).

    Shape: one groupby(user); inside each group a vectorized two-pointer
    sweep over the (ts, event_id)-sorted events emits pair-type counts —
    per-group work is O(events-in-window) per event, never all-pairs.
    Partitioning assumption: one user's events fit a group (q30/q33/q35
    contract)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type", "event_id"])

    def pair_counts(df) -> pa.Table:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        n = len(ts)
        hi = np.searchsorted(ts, ts + PAIR_WINDOW_S * 1_000_000, side="right")
        counts: dict[tuple, int] = {}
        for i in range(n):
            for j in range(i + 1, hi[i]):
                k = (et[i], et[j])
                counts[k] = counts.get(k, 0) + 1
        if not counts:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_p": pa.array([], pa.int64()),
                }
            )
        keys = sorted(counts)
        return pa.table(
            {
                "type_a": pa.array([k[0] for k in keys], pa.string()),
                "type_b": pa.array([k[1] for k in keys], pa.string()),
                "n_p": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    return (
        ev.groupby("user_id")
        .map_groups(pair_counts, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_p", alias_name="n_pairs"))
        .sort(["type_a", "type_b"])
    )

# ---------------------------------------------------------------------------
# q79: weekly retention cohort matrix
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86400 * 1_000_000


def q79_retention_cohorts(sf_dir: str):
    """Classic product-analytics retention matrix: cohort = the Monday-start
    week of each user's FIRST event; for every later week the user is active
    in, count them once at (cohort_week, week_offset). Output:
    (cohort_week, week_offset, n_users) sorted.

    Shape: per-block DISTINCT (user, week) combiner (bounds block output by
    users x weeks seen in the block, cutting the shuffle well below event
    volume) -> ONE user_id shuffle where each user's tiny week set resolves
    its cohort + offsets -> a (weeks x offsets)-sized final count groupby.
    The user dimension is never collected anywhere; per-group state is one
    user's distinct weeks."""

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def distinct_user_weeks(t: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(t["ts"], unit="week")
        sub = pa.table({"user_id": t["user_id"], "week": wk})
        return sub.group_by(["user_id", "week"]).aggregate([])

    def per_user(df) -> pa.Table:
        w = np.unique(
            df["week"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        cw = int(w.min())
        return pa.table(
            {
                "cw_us": pa.array(np.full(len(w), cw, np.int64)),
                "week_offset": pa.array((w - cw) // _WEEK_US, pa.int64()),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": pc.cast(t["cw_us"], pa.timestamp("us")),
                "week_offset": t["week_offset"],
                "n_users": pc.cast(t["n"], pa.int64()),
            }
        )

    return (
        ev.map_batches(distinct_user_weeks, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["cw_us", "week_offset"])
        .aggregate(Count(alias_name="n"))
        .map_batches(finalize, batch_format="pyarrow")
        .sort(["cohort_week", "week_offset"])
    )


QUERIES = {
    "q33_asof_join": q33_asof_join,
    "q34_range_join_bands": q34_range_join_bands,
    "q35_window_cumsum": q35_window_cumsum,
    "q36_grouped_quantiles": q36_grouped_quantiles,
    "q37_event_pivot": q37_event_pivot,
    "q38_stratified_sample": q38_stratified_sample,
    "q39_watermark_window": q39_watermark_window,
    "q40_orders_no_returns": q40_orders_no_returns,
    "q62_funnel": q62_funnel,
    "q66_value_outliers": q66_value_outliers,
    "q68_event_pairs": q68_event_pairs,
    "q79_retention_cohorts": q79_retention_cohorts,
    "q83_event_transitions": q83_event_transitions,
    "q84_user_paths": q84_user_paths,
}

ORACLE_SQL["q83_event_transitions"] = """
    WITH e AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    t AS (SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
          FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           CAST((1000000 * n) //
                CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS BIGINT)
               AS p_ppm
    FROM t ORDER BY src, dst
"""

ORACLE_SQL["q84_user_paths"] = """
    WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
    )
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY rn) AS path5,
           CAST(MAX(n) AS BIGINT) AS n_events
    FROM r WHERE rn <= 5 GROUP BY user_id
"""

ORACLE_SQL["q79_retention_cohorts"] = """
    WITH wk AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    ),
    f AS (SELECT user_id, MIN(aw) AS cw FROM wk GROUP BY user_id)
    SELECT CAST(f.cw AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', f.cw, w.aw) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM wk w JOIN f USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q91: daily active users + stickiness (DAU / MAU as integer ppm) — the
# product-analytics timeseries with two nested distinct-counts. Shape: ONE
# per-block DISTINCT (user, day) combiner, one (user, day)-key groupby to
# finish the dedup, then day-sized counting; MAU(day) = distinct users over
# the trailing 30 days, computed from the (user, day) pairs by exploding
# each pair to the <=30 window days it supports — window-days x users rows,
# bounded by 30x the dedup'd pair set, never the raw event count.
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q91_dau_stickiness(sf_dir: str):
    """(day, dau, mau30, stickiness_ppm) per day with >=1 event."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def user_days(t: pa.Table) -> pa.Table:
        u = _np_i64(t["user_id"])
        d = _np_ts_us(t["ts"]) // _DAY_US
        pairs = np.unique(np.stack([u, d], axis=1), axis=0)
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(user_days, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()  # (user, active-day) pairs; reused twice
    )

    active_days = sorted(
        r["day"] for r in pairs.groupby("day").aggregate(Count(alias_name="_c"))
        .select_columns(["day"]).take_all()
    )
    day_set = np.array(active_days, np.int64)
    ref = ray.put(day_set)

    def explode_windows(t: pa.Table, _ref=ref) -> pa.Table:
        days = ray.get(_ref) if hasattr(_ref, "hex") else _ref
        u = _np_i64(t["user_id"])
        d = _np_i64(t["day"])
        out_u, out_d, out_kind = [], [], []
        for uu, dd in zip(u, d):
            # dau row
            out_u.append(uu)
            out_d.append(dd)
            out_kind.append(0)
            # mau rows: window days w with w-29 <= dd <= w
            lo = np.searchsorted(days, dd)
            hi = np.searchsorted(days, dd + 30, side="left")
            for w in days[lo:hi]:
                out_u.append(uu)
                out_d.append(int(w))
                out_kind.append(1)
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "day": pa.array(out_d, pa.int64()),
                "kind": pa.array(out_kind, pa.int64()),
            }
        )

    # distinct (user, window-day, kind) then count per (day, kind)
    counts = (
        pairs.map_batches(explode_windows, batch_format="pyarrow")
        .groupby(["user_id", "day", "kind"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({"day": t["day"], "kind": t["kind"]}),
            batch_format="pyarrow",
        )
        .groupby(["day", "kind"])
        .aggregate(Count(alias_name="n"))
    )
    t = pa.concat_tables(
        [b for b in counts.iter_batches(batch_format="pyarrow", batch_size=None)]
    )
    dau = {int(d): int(n) for d, k, n in zip(
        t["day"].to_pylist(), t["kind"].to_pylist(), t["n"].to_pylist()) if k == 0}
    mau = {int(d): int(n) for d, k, n in zip(
        t["day"].to_pylist(), t["kind"].to_pylist(), t["n"].to_pylist()) if k == 1}
    days = sorted(dau)
    return pa.table(
        {
            "day": pa.array(
                [d * _DAY_US for d in days], pa.int64()
            ),
            "dau": pa.array([dau[d] for d in days], pa.int64()),
            "mau30": pa.array([mau[d] for d in days], pa.int64()),
            "stickiness_ppm": pa.array(
                [(1_000_000 * dau[d]) // mau[d] for d in days], pa.int64()
            ),
        }
    )


QUERIES["q91_dau_stickiness"] = q91_dau_stickiness

ORACLE_SQL["q91_dau_stickiness"] = """
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    mau AS (
        SELECT w.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau30
        FROM days w JOIN ud u
          ON u.day <= w.day AND u.day > w.day - 30
        GROUP BY w.day
    )
    SELECT CAST(d.day * 86400000000 AS BIGINT) AS day,
           d.dau, m.mau30,
           CAST((1000000 * d.dau) // m.mau30 AS BIGINT) AS stickiness_ppm
    FROM dau d JOIN mau m USING (day)
    ORDER BY day
"""


# ---------------------------------------------------------------------------
# q94: sliding-window DISTINCT count — the streaming primitive q31 (row
# counts) cannot express: per event, the number of DISTINCT users active
# for the same event_type in the preceding hour (inclusive). Two-pointer
# sweep with a multiset inside each type group: O(n) adds/removes total,
# exact, order-deterministic. SQL window functions cannot take DISTINCT;
# the oracle uses the correlated form.
# ---------------------------------------------------------------------------

def q94_sliding_distinct(sf_dir: str):
    """(event_id, nd) — distinct same-type users in (ts-1h, ts]."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def sweep(g) -> dict:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        users = g["user_id"].to_numpy().astype(np.int64)
        ids = g["event_id"].to_numpy().astype(np.int64)
        counts: dict[int, int] = {}
        out = np.zeros(len(ids), np.int64)
        lo = 0
        n = len(ids)
        i = 0
        # Equal-ts runs are processed as one block: the window predicate
        # `e2.ts <= e1.ts` includes ALL rows sharing e1's timestamp, even
        # those that sort after e1 on the (ts, event_id) tiebreak, so every
        # row of a tied run must see the full run's users in its multiset.
        while i < n:
            j = i
            while j < n and ts[j] == ts[i]:
                j += 1
            # evict rows with ts <= ts[i] - 1h (window is exclusive at the
            # lower bound: (ts-1h, ts])
            while ts[lo] <= ts[i] - 3_600_000_000:
                ulo = int(users[lo])
                counts[ulo] -= 1
                if not counts[ulo]:
                    del counts[ulo]
                lo += 1
            for k in range(i, j):
                u = int(users[k])
                counts[u] = counts.get(u, 0) + 1
            out[i:j] = len(counts)
            i = j
        return {"event_id": ids, "nd": out}

    return ds.groupby("event_type").map_groups(sweep, batch_format="pandas")


QUERIES["q94_sliding_distinct"] = q94_sliding_distinct

ORACLE_SQL["q94_sliding_distinct"] = """
    SELECT e1.event_id,
           CAST((SELECT COUNT(DISTINCT e2.user_id) FROM events e2
                 WHERE e2.event_type = e1.event_type
                   AND e2.ts <= e1.ts
                   AND e2.ts > e1.ts - INTERVAL 1 HOUR) AS BIGINT) AS nd
    FROM events e1 ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# q95: big x big band self-join — the two-large-sides variant q34's
# docstring promises: neither side fits a broadcast, so BOTH route to
# coarse value buckets (width == band radius: any pair within the radius
# shares a bucket or sits in adjacent ones). Rows go to their own bucket
# as CENTERS and to all three {b-1, b, b+1} as CANDIDATES; each group
# resolves its centers with two vectorized searchsorted probes. Every
# center is counted exactly once; candidate duplication is 3x, the
# classic halo trade.
# ---------------------------------------------------------------------------

BAND_RADIUS_C = 100  # +-1.00 in cents


def q95_price_band_selfjoin(sf_dir: str):
    """Per part: how many OTHER parts have |price difference| <= 1.00.
    Output (p_partkey, price_c, n_similar) sorted by key; isolated parts
    report 0."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    r = BAND_RADIUS_C

    def route(t: pa.Table) -> pa.Table:
        keys = t["p_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        c = cents_np(
            t["p_retailprice"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        b = c // r
        out_b, out_k, out_c, out_center = [], [], [], []
        for off in (-1, 0, 1):
            out_b.append(b + off)
            out_k.append(keys)
            out_c.append(c)
            out_center.append(
                np.full(len(c), off == 0, dtype=bool)
            )
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_b), pa.int64()),
                "key": pa.array(np.concatenate(out_k), pa.int64()),
                "c": pa.array(np.concatenate(out_c), pa.int64()),
                "is_center": pa.array(np.concatenate(out_center), pa.bool_()),
            }
        )

    def resolve(g) -> dict:
        c = g["c"].to_numpy().astype(np.int64)
        center = g["is_center"].to_numpy().astype(bool)
        cand_sorted = np.sort(c)
        cc = c[center]
        keys = g["key"].to_numpy().astype(np.int64)[center]
        hi = np.searchsorted(cand_sorted, cc + r, side="right")
        lo = np.searchsorted(cand_sorted, cc - r, side="left")
        # candidates include the center row's own 3 copies; within-radius
        # copies of SELF to subtract: the center value itself appears 3x
        # (its own -1/0/+1 routes land in 3 different buckets, only the
        # 3 rows of THIS bucket's candidate pool count: exactly one copy
        # of each value per bucket) -> subtract 1 for self
        return {
            "p_partkey": keys,
            "price_c": cc,
            "n_similar": (hi - lo - 1).astype(np.int64),
        }

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .sort("p_partkey")
    )


QUERIES["q95_price_band_selfjoin"] = q95_price_band_selfjoin

ORACLE_SQL["q95_price_band_selfjoin"] = f"""
    WITH c AS (SELECT p_partkey,
                      CAST(round(p_retailprice*100, 0) AS BIGINT) AS price_c
               FROM part)
    SELECT a.p_partkey, a.price_c,
           CAST(COUNT(b.p_partkey) AS BIGINT) AS n_similar
    FROM c a LEFT JOIN c b
      ON b.p_partkey <> a.p_partkey
     AND b.price_c BETWEEN a.price_c - {BAND_RADIUS_C}
                       AND a.price_c + {BAND_RADIUS_C}
    GROUP BY a.p_partkey, a.price_c
    ORDER BY a.p_partkey
"""


# ---------------------------------------------------------------------------
# q96: hourly anomaly detection — integer-exact 3-sigma outlier flags over
# the tumbling-window count series (the streaming anomaly-detector shape,
# run batch: per-series mean/variance as exact integer moments, the sigma
# test cross-multiplied so no sqrt/float ever enters)
# ---------------------------------------------------------------------------

ANOM_K2 = 9  # flag |c - mean| > 3*sigma  <=>  (m*c - S)^2 > 9*(m*Q - S^2)


def q96_anomaly_hours(sf_dir: str):
    """Per-event-type hourly counts, then flag hours whose count deviates
    from the type's mean by more than 3 population standard deviations.
    The test runs on cross-multiplied integers: with m hours, S = sum of
    counts, Q = sum of squared counts, hour count c is anomalous iff
    (m*c - S)^2 > ANOM_K2 * (m*Q - S^2) — exactly the 3-sigma rule scaled
    by m^2, evaluated in int64 (|m*c| <= total events <= 2^31 at any
    plausible per-type hour range; the product stays far inside int64 —
    and the oracle computes the identical integers).

    Shape: ONE (event_type, hour) groupby builds the count series; the
    per-type moment reduce is a tiny second groupby over series rows (rows
    = types x hours, not events); the per-type stats table (O(types))
    broadcasts into the final vectorized filter pass. Nothing driver-side
    is corpus-sized; the series itself stays distributed."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
            }
        )

    hourly = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"))
        .materialize()
    )

    def moments(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "m": pa.array(np.ones(len(n), np.int64)),
                "s1": pa.array(n.astype(np.int64)),
                "s2": pa.array((n * n).astype(np.int64)),
            }
        )

    stats_rows = (
        hourly.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("m", alias_name="m"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
        .take_all()
    )
    stats = {
        r["event_type"]: (int(r["m"]), int(r["s1"]), int(r["s2"]))
        for r in stats_rows
    }
    stats_ref = ray.put(stats)

    def flag(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        et = t["event_type"].to_pylist()
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.array([st[e][0] for e in et], np.int64)
        s1 = np.array([st[e][1] for e in et], np.int64)
        s2 = np.array([st[e][2] for e in et], np.int64)
        dev = m * n - s1
        keep = dev * dev > ANOM_K2 * (m * s2 - s1 * s1)
        out = t.filter(pa.array(keep))
        return pa.table(
            {
                "event_type": out["event_type"],
                "hour": pc.cast(out["hour"], pa.timestamp("us")),
                "n": pc.cast(out["n"], pa.int64()),
            }
        )

    return hourly.map_batches(flag, batch_format="pyarrow").sort(
        ["event_type", "hour"]
    )


QUERIES["q96_anomaly_hours"] = q96_anomaly_hours

ORACLE_SQL["q96_anomaly_hours"] = f"""
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, hour
    ),
    s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(n) AS BIGINT) AS s1,
               CAST(SUM(n*n) AS BIGINT) AS s2
        FROM h GROUP BY event_type
    )
    SELECT h.event_type, h.hour, h.n
    FROM h JOIN s USING (event_type)
    WHERE (s.m*h.n - s.s1)*(s.m*h.n - s.s1) > {ANOM_K2} * (s.m*s.s2 - s.s1*s.s1)
    ORDER BY h.event_type, h.hour
"""


# ---------------------------------------------------------------------------
# q97: dense time-axis gap filling — the resampling primitive every
# monitoring / time-series pipeline needs before windowed math: per
# event_type, one row for EVERY hour between the global min and max event
# hour, with zero counts where nothing happened. Shape: the sparse
# (type, hour) count series from ONE groupby; the global [lo, hi] bound is
# a two-value reduce over series rows; each type's group materializes its
# own dense range (state = hour-dimension x 1 type, never corpus-sized).
# ---------------------------------------------------------------------------

_HOUR_US = 3_600_000_000


def q97_gapfill_hours(sf_dir: str):
    """(event_type, hour, n) dense hourly series with zero-filled gaps."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
            }
        )

    sparse = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"))
        .materialize()
    )
    bounds = sparse.aggregate(Min("hour"), Max("hour"))
    lo_us = int(np.datetime64(bounds["min(hour)"], "us").astype(np.int64))
    hi_us = int(np.datetime64(bounds["max(hour)"], "us").astype(np.int64))

    def fill(g) -> pa.Table:
        et = g["event_type"].iloc[0]
        hrs = g["hour"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ns = g["n"].to_numpy().astype(np.int64)
        dense = np.arange(lo_us, hi_us + _HOUR_US, _HOUR_US, dtype=np.int64)
        out = np.zeros(len(dense), np.int64)
        out[(hrs - lo_us) // _HOUR_US] = ns
        return pa.table(
            {
                "event_type": pa.array([et] * len(dense), pa.string()),
                "hour": pa.array(dense, pa.timestamp("us")),
                "n": pa.array(out, pa.int64()),
            }
        )

    return (
        sparse.groupby("event_type")
        .map_groups(fill, batch_format="pandas")
        .sort(["event_type", "hour"])
    )


QUERIES["q97_gapfill_hours"] = q97_gapfill_hours

ORACLE_SQL["q97_gapfill_hours"] = """
    WITH b AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    cnt AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, h.hour, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM types t CROSS JOIN hours h
    LEFT JOIN cnt c ON c.event_type = t.event_type AND c.hour = h.hour
    ORDER BY t.event_type, h.hour
"""


# ---------------------------------------------------------------------------
# q98: interval-union busy time — the overlap-merge primitive (union length
# of per-event activity windows) that session counts (q30) can't express:
# each event opens a [ts, ts+30min) activity interval; a user's busy time
# is the length of the UNION of their intervals, overlaps merged exactly.
# Vectorized sweep per user group: sorted starts, running-max ends,
# contribution = max(0, end - max(start, prev_running_max)) — the same
# integer the SQL window formula computes row by row.
# ---------------------------------------------------------------------------

BUSY_WINDOW_US = 1_800_000_000  # 30 min


def q98_busy_time(sf_dir: str):
    """(user_id, busy_us): exact union length of activity intervals."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def busy(g) -> dict:
        ts = np.sort(
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        e = ts + BUSY_WINDOW_US
        prevmax = np.concatenate(
            [[np.iinfo(np.int64).min], np.maximum.accumulate(e)[:-1]]
        )
        add = np.maximum(e - np.maximum(ts, prevmax), 0)
        return {
            "user_id": np.array([int(g["user_id"].iloc[0])], np.int64),
            "busy_us": np.array([int(add.sum())], np.int64),
        }

    return (
        ds.groupby("user_id")
        .map_groups(busy, batch_format="pandas")
        .sort("user_id")
    )


QUERIES["q98_busy_time"] = q98_busy_time

ORACLE_SQL["q98_busy_time"] = f"""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s,
               epoch_us(ts) + {BUSY_WINDOW_US} AS e
        FROM events
    ),
    m AS (
        SELECT user_id, s, e,
               MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prev_max
        FROM iv
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN prev_max IS NULL OR prev_max < s THEN e - s
                         WHEN e > prev_max THEN e - prev_max
                         ELSE 0 END) AS BIGINT) AS busy_us
    FROM m GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q99: CUBE aggregation in ONE shuffle — the OLAP companion to q69's
# ROLLUP. Naive CUBE(lang, source) runs 4 separate groupbys (4 corpus
# passes + 4 shuffles); the scale form expands each per-block PARTIAL row
# into its 4 grouping-set variants (key or the ALL marker) and pays ONE
# groupby over <= 4 x |lang x source| pre-combined rows. The expansion
# happens AFTER block-level combining, so the shuffle volume is dimension-
# sized, not corpus-sized.
# ---------------------------------------------------------------------------

_CUBE_ALL = "*"  # grouping-set marker (no lang/source value collides)


def q99_cube(sf_dir: str):
    """(lang, source, n_docs, sum_chars) for every CUBE(lang, source)
    grouping set, ALL marked with '*'."""
    from ray.data.aggregate import Sum as _Sum

    ds = read_table(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        acc: dict[tuple[str, str], list[int]] = {}
        for lang, src, nc in zip(
            t["lang"].to_pylist(), t["source"].to_pylist(),
            t["n_chars"].to_pylist(),
        ):
            for k in (
                (lang, src),
                (lang, _CUBE_ALL),
                (_CUBE_ALL, src),
                (_CUBE_ALL, _CUBE_ALL),
            ):
                a = acc.setdefault(k, [0, 0])
                a[0] += 1
                a[1] += nc
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks], pa.string()),
                "source": pa.array([k[1] for k in ks], pa.string()),
                "n_p": pa.array([acc[k][0] for k in ks], pa.int64()),
                "c_p": pa.array([acc[k][1] for k in ks], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(
            _Sum("n_p", alias_name="n_docs"),
            _Sum("c_p", alias_name="sum_chars"),
        )
        .sort(["lang", "source"])
    )


QUERIES["q99_cube"] = q99_cube

ORACLE_SQL["q99_cube"] = f"""
    SELECT COALESCE(lang, '{_CUBE_ALL}') AS lang,
           COALESCE(source, '{_CUBE_ALL}') AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# q100: session SPANS — the materialized form of q30's session counts:
# one row per (user, session) with ordinal, bounds and size, gap threshold
# shared with q30 (_SESSION_GAP_S). Island detection per user group:
# session id = cumulative count of >gap steps (vectorized); the SQL oracle
# is the classic gaps-and-islands window (SUM of gap markers OVER
# preceding rows).
# ---------------------------------------------------------------------------

def q100_session_spans(sf_dir: str):
    """(user_id, session_id, ts_start, ts_end, n_events) sorted."""
    from .training import _SESSION_GAP_S

    gap_us = _SESSION_GAP_S * 1_000_000
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def spans(g) -> pa.Table:
        uid = int(g["user_id"].iloc[0])
        ts = np.sort(
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        new = np.concatenate([[0], (np.diff(ts) > gap_us).astype(np.int64)])
        sid = np.cumsum(new)
        n_sess = int(sid[-1]) + 1 if len(sid) else 0
        starts = np.zeros(n_sess, np.int64)
        ends = np.zeros(n_sess, np.int64)
        sizes = np.bincount(sid, minlength=n_sess).astype(np.int64)
        first = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        starts = ts[first]
        ends = ts[first + sizes - 1]
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(n_sess, uid, dtype=np.int64), pa.int64()
                ),
                "session_id": pa.array(
                    np.arange(n_sess, dtype=np.int64), pa.int64()
                ),
                "ts_start": pa.array(starts, pa.timestamp("us")),
                "ts_end": pa.array(ends, pa.timestamp("us")),
                "n_events": pa.array(sizes, pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(spans, batch_format="pandas")
        .sort(["user_id", "session_id"])
    )


QUERIES["q100_session_spans"] = q100_session_spans

ORACLE_SQL["q100_session_spans"] = """
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                         > 3600000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM o
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS ts_start, MAX(ts) AS ts_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# q101: grouped WEIGHTED median — the robust-statistics primitive plain
# percentiles (q36/q55/sk_quantiles) don't give: the discount value at
# which half the shipped QUANTITY sits below, per return flag. Lower
# weighted median (smallest v with 2·cumweight(v) >= total), exact
# integers throughout (discount scaled to ppm). Shape: per-block
# (flag, disc_ppm, w) partials pre-sum duplicate values, ONE small
# groupby (|flags|·|distinct discounts| rows), per-flag cumulative sweep.
# ---------------------------------------------------------------------------

def q101_weighted_median(sf_dir: str):
    """(l_returnflag, wmedian_disc_ppm, total_qty) sorted by flag."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_discount", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import math

        acc: dict[tuple[str, int], int] = {}
        for f, d, q in zip(
            t["l_returnflag"].to_pylist(),
            t["l_discount"].to_pylist(),
            t["l_quantity"].to_pylist(),
        ):
            # half-AWAY-from-zero like the SQL oracle's round() — Python's
            # round() is half-to-even and would diverge on an exact .5 ppm
            # boundary (same contract as analytics.cents_np)
            v = d * 1_000_000
            k = (f, int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1))
            acc[k] = acc.get(k, 0) + int(q)
        ks = sorted(acc)
        return pa.table(
            {
                "flag": pa.array([k[0] for k in ks], pa.string()),
                "disc_ppm": pa.array([k[1] for k in ks], pa.int64()),
                "w_p": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def pick(g) -> pa.Table:
        f = g["flag"].iloc[0]
        order = np.argsort(g["disc_ppm"].to_numpy(), kind="mergesort")
        d = g["disc_ppm"].to_numpy()[order].astype(np.int64)
        w = g["w"].to_numpy()[order].astype(np.int64)
        cw = np.cumsum(w)
        total = int(cw[-1])
        idx = int(np.searchsorted(2 * cw, total, side="left"))
        return pa.table(
            {
                "l_returnflag": pa.array([f], pa.string()),
                "wmedian_disc_ppm": pa.array([int(d[idx])], pa.int64()),
                "total_qty": pa.array([total], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["flag", "disc_ppm"])
        .aggregate(Sum("w_p", alias_name="w"))
        .groupby("flag")
        .map_groups(pick, batch_format="pandas")
        .sort("l_returnflag")
    )


QUERIES["q101_weighted_median"] = q101_weighted_median

ORACLE_SQL["q101_weighted_median"] = """
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_discount * 1000000, 0) AS BIGINT) AS disc_ppm,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT flag, disc_ppm, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY disc_ppm
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY flag) AS total
        FROM v
    )
    SELECT flag AS l_returnflag,
           CAST(MIN(CASE WHEN 2 * cw >= total THEN disc_ppm END) AS BIGINT)
               AS wmedian_disc_ppm,
           CAST(MAX(total) AS BIGINT) AS total_qty
    FROM c GROUP BY flag ORDER BY l_returnflag
"""
