"""Pareto-frontier (skyline) operator — q85.

The skyline of ``part`` under (minimize price, maximize size): a part
survives iff no other part is at-most-as-expensive AND at-least-as-large
with at least one strict inequality. The classic distributed shape:

1. **per-block local skyline** (a combiner): domination is transitive, so a
   row dominated inside its own block is dominated globally — each block
   can drop it before anything moves. On skew-free data the local skyline
   of a block of B rows is O(sqrt(B)) expected for 2-d uniform data, so the
   shuffle carries a vanishing fraction of the input.
2. **final skyline over the survivors** — the union of local skylines is
   small (sum of per-block frontiers); one repartition(1) pass finishes it.

At 100 TB the same plan holds: step 1 is embarrassingly parallel and the
survivor set stays tiny relative to the corpus (it only grows with frontier
complexity, not row count). Ties on BOTH dimensions are kept (neither row
dominates the other), matching the SQL NOT EXISTS oracle exactly; prices
compare in integer cents (analytics.py docstring invariant).

Reference analog: top-k ordering surfaces (SURVEY §2.6 O1/O2) generalized
to a two-criteria frontier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tables import read_table
from .analytics import cents_np


def _skyline_np(price_c: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-d skyline (min price_c, max size).

    Sort by price asc; sweep price groups in order keeping a row iff its
    size is (a) the max of its equal-price group and (b) strictly greater
    than every cheaper row's size. Equal (price, size) duplicates all
    survive — no strict inequality separates them."""
    n = len(price_c)
    keep = np.zeros(n, dtype=bool)
    order = np.lexsort((-size, price_c))
    p_s, s_s = price_c[order], size[order]
    best = np.iinfo(np.int64).min
    i = 0
    while i < n:
        j = i
        while j < n and p_s[j] == p_s[i]:
            j += 1
        gmax = s_s[i]  # groups are sorted size-desc within equal price
        if gmax > best:
            k = i
            while k < j and s_s[k] == gmax:
                keep[order[k]] = True
                k += 1
            best = gmax
        i = j
    return keep


def q85_pareto_parts(sf_dir: str):
    """Skyline parts under (min retail price, max size)."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_size": pa.array(
                    t["p_size"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                "price_c": pa.array(
                    cents_np(t["p_retailprice"].combine_chunks().to_numpy(zero_copy_only=False)),
                    pa.int64(),
                ),
            }
        )

    def local_skyline(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        mask = _skyline_np(
            t["price_c"].combine_chunks().to_numpy(zero_copy_only=False),
            t["p_size"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        return t.filter(pa.array(mask))

    def final(t: pa.Table) -> pa.Table:
        t = local_skyline(t)
        idx = np.lexsort(
            (
                t["p_partkey"].combine_chunks().to_numpy(zero_copy_only=False),
                t["p_size"].combine_chunks().to_numpy(zero_copy_only=False),
                t["price_c"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        )
        return t.take(pa.array(idx, pa.int64()))

    survivors = (
        ds.map_batches(project, batch_format="pyarrow")
        .map_batches(local_skyline, batch_format="pyarrow")
    )
    # survivor set is frontier-sized; one partition finishes it
    return survivors.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


QUERIES = {"q85_pareto_parts": q85_pareto_parts}

ORACLE_SQL: dict[str, str] = {
    "q85_pareto_parts": """
        WITH c AS (SELECT p_partkey,
                          CAST(p_size AS BIGINT) AS p_size,
                          CAST(round(p_retailprice*100,0) AS BIGINT) AS price_c
                   FROM part)
        SELECT p_partkey, p_size, price_c
        FROM c p
        WHERE NOT EXISTS (
            SELECT 1 FROM c q
            WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size
              AND (q.price_c < p.price_c OR q.p_size > p.p_size)
        )
        ORDER BY price_c, p_size, p_partkey
    """,
}
