"""Column-pruned readers for the driver testdata tables and KG outputs.

Reference analog: the nine Postgres query shapes (SURVEY.md S9,
``agents/src/database.ts``) become pruned ``read_parquet`` calls — only the
columns a pipeline needs leave storage (SURVEY.md "prune at the read").
"""

from __future__ import annotations

import os

import ray.data as rd

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """``ray.data.read_parquet`` with column pruning."""
    return rd.read_parquet(table_path(sf_dir, name), columns=columns)
