"""Salted / two-level grouped aggregation — the generic Zipf-skew guard
(SURVEY.md §4.2).

A plain ``groupby(key)`` ships every row of a hot key to one reducer; on
web-scale text the head of the surface-form distribution makes that reducer
the straggler. The standard fix is two-level aggregation:

1. block-level partial aggregation inside ``map_batches`` (each block
   contributes at most one row per key it contains — the same effect as
   salting the key with a per-block salt, without a second shuffle), then
2. a global ``groupby(key)`` over the partials, which is uniform because
   every key's row count is bounded by the block count.

``salted_aggregate`` packages that shape for the four decomposable
aggregates (count / sum / min / max). The KG pipeline's mention counting
(stages/triples.py mcount rows -> pipelines/kg.py merge) is the same pattern
fused into the extractor; this standalone utility is the open-vocabulary /
ad-hoc version.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_ARROW_FN = {"count": "count", "sum": "sum", "min": "min", "max": "max"}
# how partials re-combine at the global level
_MERGE_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def salted_aggregate(ds, key: str | list[str], aggs: dict[str, tuple[str, str]]):
    """Two-level grouped aggregation over a Ray Dataset.

    ``aggs``: output column -> (input column, op) with op in
    {"count", "sum", "min", "max"}. Returns a Dataset with the key column(s)
    plus one column per entry, equal to a direct
    ``groupby(key).aggregate(...)`` but skew-proof: the all-to-all moves at
    most (blocks x distinct keys per block) rows.

    Example::

        salted_aggregate(docs, "lang", {"n_docs": ("doc_id", "count"),
                                        "sum_chars": ("n_chars", "sum")})
    """
    from ray.data.aggregate import Max, Min, Sum

    keys = [key] if isinstance(key, str) else list(key)
    for out_col, (_, op) in aggs.items():
        if op not in _ARROW_FN:
            raise ValueError(f"{out_col}: op {op!r} not decomposable")

    def partial(t: pa.Table) -> pa.Table:
        # "count" counts ROWS (matching ray.data.aggregate.Count), not
        # non-null values — Arrow's hash count is only_valid by default, so
        # count ops aggregate a constant ones column instead
        specs = []
        needs_ones = any(op == "count" for _, (_, op) in aggs.items())
        if needs_ones:
            t = t.append_column(
                "__ones", pa.array([1] * t.num_rows, pa.int64())
            )
        for _, (col, op) in aggs.items():
            if op == "count":
                specs.append(("__ones", "sum"))
            else:
                specs.append((col, _ARROW_FN[op]))
        g = t.group_by(keys).aggregate(sorted(set(specs)))
        arrays = [g.column(k) for k in keys]
        names = list(keys)
        for (out_col, (col, op)), (scol, sop) in zip(aggs.items(), specs):
            c = g.column(f"{scol}_{sop}")
            if op in ("count", "sum") and pa.types.is_integer(c.type):
                c = pc.cast(c, pa.int64())
            arrays.append(c)
            names.append(out_col)
        return pa.Table.from_arrays(arrays, names=names)

    merge_aggs = []
    for out_col, (_, op) in aggs.items():
        cls = {"sum": Sum, "min": Min, "max": Max}[_MERGE_FN[op]]
        merge_aggs.append(cls(out_col, alias_name=out_col))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys[0] if len(keys) == 1 else keys)
        .aggregate(*merge_aggs)
    )
