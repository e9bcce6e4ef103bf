"""Local parity harness: run every queries() entry AND its oracle_sql() twice
(Ray vs DuckDB) on the same parquet tables and compare exactly, mirroring the
driver's order-insensitive, dtype-sensitive value comparison. Exits nonzero on
any mismatch.

The comparison is Arrow-exact: both sides are converted to ``pyarrow.Table``
(DuckDB via ``.arrow()``, never ``.df()`` — pandas object compare hides type
drift like DuckDB SUM(BIGINT) -> decimal128(38,0) vs Ray int64, which the
driver's value-hash DOES fail on), columns sorted by name, rows sorted by all
columns, then schema and values compared with ``Table.equals``.

Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_arrow(result) -> pa.Table:
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
    t = t.select(sorted(t.column_names))
    t = t.combine_chunks()
    if t.num_rows:
        try:
            idx = pc.sort_indices(
                t, sort_keys=[(c, "ascending") for c in t.column_names]
            )
            t = t.take(idx)
        except pa.ArrowError:
            # non-orderable column (e.g. nested list) — sort by orderable ones
            keys = [
                c for c in t.column_names
                if not pa.types.is_nested(t.schema.field(c).type)
            ]
            if keys:
                idx = pc.sort_indices(t, sort_keys=[(c, "ascending") for c in keys])
                t = t.take(idx)
    return t


def diff_report(name: str, mine: pa.Table, ref: pa.Table) -> list[str]:
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    from agenticknowledgegraphconstructionsystem_ray.sources.tables import (
        TESTDATA_TABLES,
    )

    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    n_checked = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.perf_counter()
        try:
            mine = canon(to_arrow(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ray side raised: {e!r}"))
            print(f"FAIL {name}: ray side raised {e!r}")
            continue
        wall = time.perf_counter() - t0
        if "/tmp/agkg_golden" in oracles.get(name, "") and not sf_dir.rstrip(
            "/"
        ).endswith("sf0.01"):
            # golden-file oracles are pinned to sf0.01 (the driver's
            # correctness scale); at other scales treat as rows-only
            print(f"ok   {name}: rows={mine.num_rows} (golden pinned to sf0.01; rows-only here) [{wall:.2f}s]")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={mine.num_rows} (no SQL oracle; rows-only) [{wall:.2f}s]")
            continue
        try:
            ref = canon(con.execute(oracles[name]).arrow())
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb raised: {e!r}"))
            print(f"FAIL {name}: duckdb raised {e!r}")
            continue
        if mine.column_names != ref.column_names:
            failures.append((name, f"columns {mine.column_names} != {ref.column_names}"))
            print(f"FAIL {name}: columns {mine.column_names} vs {ref.column_names}")
            continue
        if mine.num_rows != ref.num_rows:
            failures.append((name, f"rows {mine.num_rows} != {ref.num_rows}"))
            print(f"FAIL {name}: rows {mine.num_rows} vs {ref.num_rows}")
            continue
        if not mine.equals(ref):
            msgs = diff_report(name, mine, ref)
            failures.append((name, "; ".join(msgs) or "tables differ"))
            print(f"FAIL {name}:")
            for m in msgs[:4]:
                print(m)
        else:
            print(f"ok   {name}: rows={mine.num_rows} exact match [{wall:.2f}s]")

    print(f"\n{n_checked - len(failures)}/{n_checked} queries ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
