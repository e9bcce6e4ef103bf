"""Local parity harness: run every queries() entry AND its oracle_sql() twice
(Ray vs DuckDB) on the same parquet tables and compare exactly, mirroring the
driver's order-insensitive value comparison. Exits nonzero on any mismatch.

Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

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
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ray side raised: {e!r}"))
            print(f"FAIL {name}: ray side raised {e!r}")
            continue
        wall = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (no SQL oracle; rows-only) [{wall:.2f}s]")
            continue
        try:
            ref = canon(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb raised: {e!r}"))
            print(f"FAIL {name}: duckdb raised {e!r}")
            continue
        if list(mine.columns) != list(ref.columns):
            failures.append((name, f"columns {list(mine.columns)} != {list(ref.columns)}"))
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            continue
        if len(mine) != len(ref):
            failures.append((name, f"rows {len(mine)} != {len(ref)}"))
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
            continue
        # exact value compare (driver hashes values; any bit difference fails)
        mismatch_cols = []
        for c in mine.columns:
            a, b = mine[c], ref[c]
            try:
                same = a.equals(b) or (a.astype("object") == b.astype("object")).all()
            except Exception:  # noqa: BLE001
                same = False
            if not same:
                mismatch_cols.append(c)
        if mismatch_cols:
            failures.append((name, f"value mismatch in {mismatch_cols}"))
            print(f"FAIL {name}: value mismatch in {mismatch_cols}")
            for c in mismatch_cols[:2]:
                diff = mine[c] != ref[c]
                print("  mine:", mine.loc[diff.fillna(True), c].head(3).tolist())
                print("  ref :", ref.loc[diff.fillna(True), c].head(3).tolist())
        else:
            print(f"ok   {name}: rows={len(mine)} exact match [{wall:.2f}s]")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} queries ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
