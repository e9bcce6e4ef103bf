"""Marketing-style attribution over the events stream.

Reference parity: the reference's event-shaped analytics (SURVEY.md §2 S9 /
A-family) stop at grouped counts; last-touch attribution is the canonical
"credit assignment over an ordered per-user history" operator a web-scale
events pipeline needs (same per-user-ordered shape as sessionization, q30).

Scale shape (100 TB): ONE user_id shuffle; inside each group the scan is
vectorized (sort + searchsorted over the non-conversion positions — no
per-event Python loop); group output is pre-aggregated per channel before
the tiny global channel groupby, so the shuffle-out volume is
O(channels) per user, not O(events).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tables import read_table
from .analytics import cents_np

CONV_TYPE = "purchase"
DIRECT = "direct"


def _attribute_user(df):
    """Vectorized last-touch credit for one user: each conversion is
    credited to the channel of the latest strictly-preceding
    non-conversion event in (ts, event_id) order, or to 'direct' when no
    touch precedes it. Returns per-channel partial sums."""
    import pandas as pd

    df = df.sort_values(["ts", "event_id"], kind="mergesort")
    etypes = df["event_type"].to_numpy()
    is_conv = etypes == CONV_TYPE
    conv_pos = np.flatnonzero(is_conv)
    if not conv_pos.size:
        return pd.DataFrame(
            {"channel": [], "n_conversions": [], "revenue_c": []}
        ).astype({"channel": "string", "n_conversions": "int64",
                  "revenue_c": "int64"})
    touch_pos = np.flatnonzero(~is_conv)
    # index of the last touch strictly before each conversion position
    idx = np.searchsorted(touch_pos, conv_pos, side="left") - 1
    channels = np.where(
        idx >= 0, etypes[touch_pos[np.maximum(idx, 0)]], DIRECT
    )
    value_c = cents_np(df["value"].to_numpy()[conv_pos])
    out = (
        pd.DataFrame({"channel": channels, "revenue_c": value_c})
        .groupby("channel", as_index=False)
        .agg(n_conversions=("revenue_c", "size"),
             revenue_c=("revenue_c", "sum"))
    )
    return out[["channel", "n_conversions", "revenue_c"]].astype(
        {"channel": "string", "n_conversions": "int64",
         "revenue_c": "int64"}
    )


def q81_attribution(sf_dir: str):
    """Last-touch attribution: (channel, n_conversions, revenue_c) summed
    over every conversion in the corpus, sorted by channel."""
    from ray.data.aggregate import Sum

    ev = read_table(
        sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    partials = ev.groupby("user_id").map_groups(
        _attribute_user, batch_format="pandas"
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "channel": t["channel"],
                "n_conversions": pc.cast(t["sum(n_conversions)"], pa.int64()),
                "revenue_c": pc.cast(t["sum(revenue_c)"], pa.int64()),
            }
        )

    return (
        partials.groupby("channel")
        .aggregate(Sum("n_conversions"), Sum("revenue_c"))
        .map_batches(finalize, batch_format="pyarrow")
        .sort("channel")
    )


QUERIES = {
    "q81_attribution": q81_attribution,
}

ORACLE_SQL: dict[str, str] = {
    "q81_attribution": f"""
        WITH e AS (
            SELECT event_id, ts, user_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_c
            FROM events
        ),
        conv AS (SELECT * FROM e WHERE event_type = '{CONV_TYPE}'),
        touch AS (
            SELECT c.event_id, c.value_c,
                   (SELECT t.event_type FROM e t
                     WHERE t.user_id = c.user_id
                       AND t.event_type <> '{CONV_TYPE}'
                       AND (t.ts < c.ts
                            OR (t.ts = c.ts AND t.event_id < c.event_id))
                     ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
            FROM conv c
        )
        SELECT COALESCE(channel, '{DIRECT}') AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(SUM(value_c) AS BIGINT) AS revenue_c
        FROM touch GROUP BY 1 ORDER BY 1
    """,
}
