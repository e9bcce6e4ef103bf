"""Shared Arrow-exact comparison kernel for every oracle-parity harness
(tools/check_oracles.py, tests/test_oracle_parity.py, tests/test_goldens.py).

The driver's value-hash is dtype-sensitive (e.g. DuckDB SUM(BIGINT) ->
decimal128(38,0) vs Ray int64 FAILS it), so comparisons here are over
``pyarrow.Table``s — columns sorted by name, rows sorted by all orderable
columns, then schema and values compared exactly. One definition, used by
all three harnesses, so "exact match" means the same thing everywhere.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def to_arrow(result) -> pa.Table:
    """queries() result (Dataset | pa.Table | DataFrame) -> pyarrow Table."""
    import ray
    import ray.data

    if isinstance(result, ray.data.Dataset):
        tables = list(ray.get(result.to_arrow_refs()))
        nonempty = [t for t in tables if t.num_rows]
        if nonempty:
            return pa.concat_tables(nonempty, promote_options="default")
        return tables[0] if tables else pa.table({})
    if isinstance(result, pa.Table):
        return result
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    raise TypeError(f"unsupported result type {type(result)!r}")


def canon(t: pa.Table) -> pa.Table:
    """Canonical form for order-insensitive compare: columns sorted by name,
    rows sorted by every orderable column (nested columns are skipped as
    sort keys but still compared)."""
    t = t.select(sorted(t.column_names)).combine_chunks()
    if t.num_rows:
        keys = [
            c for c in t.column_names
            if not pa.types.is_nested(t.schema.field(c).type)
        ]
        if keys:
            idx = pc.sort_indices(t, sort_keys=[(c, "ascending") for c in keys])
            t = t.take(idx)
    return t


def diff_report(mine: pa.Table, ref: pa.Table) -> list[str]:
    """Human-readable per-column diffs for two canon()-ed tables."""
    msgs = []
    for c in mine.column_names:
        a, b = mine[c], ref[c]
        if a.type != b.type:
            msgs.append(f"  col {c}: dtype {a.type} vs {b.type}")
        elif not a.equals(b):
            av, bv = a.to_pylist(), b.to_pylist()
            bad = [(x, y) for x, y in zip(av, bv) if x != y][:3]
            msgs.append(f"  col {c}: values differ, e.g. {bad}")
    return msgs
