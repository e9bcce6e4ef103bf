"""In-repo safety net for the driver's query-vs-SQL comparison: run a fast
subset of queries() against their oracle_sql() via DuckDB at sf0.001 and
require EXACT value equality (the driver hashes values; any bit difference
fails)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "q01_pricing_summary",
    "q03_global_counts",
    "q05_top_parts",
    "q09_nation_customer_counts",
    "q11_conditional_counts",
    "q13_dedup_docs_exact",
    "q14_term_counts",
    "q15_doc_token_stats",
    "q18_docs_by_lang",
    "q21_orders_per_month",
    "q25_langid",
    "q26_quality",
    "q27_token_classes",
    "mm_decode_meta",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def con():
    from agenticknowledgegraphconstructionsystem_ray.sources.tables import (
        TESTDATA_TABLES,
    )

    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_duckdb(entrymod, con, name):
    import pyarrow as pa

    import ray.data

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    result = fn(SF)
    if isinstance(result, ray.data.Dataset):
        mine = result.to_pandas()
    elif isinstance(result, pa.Table):
        mine = result.to_pandas()
    else:
        mine = result
    mine = _canon(mine)
    ref = _canon(con.execute(sql).df())
    assert list(mine.columns) == list(ref.columns)
    assert len(mine) == len(ref)
    for c in mine.columns:
        assert (
            mine[c].astype("object") == ref[c].astype("object")
        ).all(), f"{name}.{c}"
