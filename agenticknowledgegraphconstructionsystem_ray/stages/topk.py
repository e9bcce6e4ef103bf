"""Grouped top-k with a block-level combiner (reusable engine block).

``groupby().map_groups(head)`` alone ships EVERY row of every group through
the shuffle; for top-k that is waste — only k rows per (block, group) can
survive. This operator pre-truncates inside each block (combiner), so the
shuffle carries at most k rows per group per block, then takes the global
per-group head. Same result as the naive form for any dataset; the win is
proportional to group size / k.

Ordering contract: rows are ranked by ``by`` with per-column ``descending``
flags; ties MUST be broken by including a unique column in ``by`` (the
caller's responsibility, same as every ordered operator in this engine).
"""

from __future__ import annotations

import pandas as pd


def _head_per_group(df: pd.DataFrame, group_key: str, by: list[str],
                    ascending: list[bool], k: int) -> pd.DataFrame:
    out = df.sort_values(by, ascending=ascending, kind="mergesort")
    # dropna=False: null group keys must survive the combiner, or the final
    # per-group head would silently lose the null group entirely
    return out.groupby(group_key, sort=False, dropna=False).head(k)


def grouped_topk(ds, group_key: str, by: list[str], descending: list[bool], k: int):
    """Per-group top-k over a Dataset. ``by`` must make ordering total
    (include a unique tiebreak column)."""
    ascending = [not d for d in descending]

    def block_combiner(df: pd.DataFrame) -> pd.DataFrame:
        return _head_per_group(df, group_key, by, ascending, k)

    def group_head(df: pd.DataFrame) -> pd.DataFrame:
        return _head_per_group(df, group_key, by, ascending, k)

    return (
        ds.map_batches(block_combiner, batch_format="pandas")
        .groupby(group_key)
        .map_groups(group_head, batch_format="pandas")
    )
