"""Driver-facing KG pipeline queries.

The driver testdata has no ``pages`` table, so each query deterministically
synthesizes the Common-Crawl-style corpus for the requested scale factor
(cached under /tmp, seeded — see synth.py) and runs the pipeline with resume
on, so repeated queries share phase-A work. These are non-SQL-expressible
(deterministic NER/union-find), so the driver records rows-only checks; the
pytest suite holds the strong oracle checks (byte-identical text, exact P/R).
"""

from __future__ import annotations

import os
import re

import ray.data as rd

from .. import synth
from . import kg


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


def _ensure_run(sf_dir: str) -> str:
    sf = sf_of(sf_dir)
    pages_dir = synth.ensure_pages(sf)
    out_dir = f"/tmp/agkg_out/sf{sf:g}"
    cfg = kg.KGConfig(pages_dir=pages_dir, out_dir=out_dir)
    kg.run_pipeline(cfg)
    return out_dir


def kg_edges(sf_dir: str):
    """Final deduplicated, validated, sorted edge table."""
    out = _ensure_run(sf_dir)
    import glob

    return rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "edges/**/*.parquet"), recursive=True))
    )


def kg_nodes(sf_dir: str):
    """Canonical entity table (aliases joined to a string for stable
    driver-side hashing of the list column)."""
    out = _ensure_run(sf_dir)
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(out, "nodes", "part-00000.parquet"))
    aliases = ["|".join(a) for a in t.column("aliases").to_pylist()]
    return t.drop_columns(["aliases"]).append_column(
        "aliases_joined", pa.array(aliases, pa.string())
    )


def kg_text(sf_dir: str):
    """Byte-identical extracted text per url."""
    out = _ensure_run(sf_dir)
    return kg.text_dataset(out, columns=["url", "text", "lang"])


def kg_mentions(sf_dir: str):
    """Per-(page, entity) mention/link rows (the page->entity edge table)."""
    out = _ensure_run(sf_dir)
    ds = kg.mentions_dataset(
        out,
        columns=["url", "norm_surface", "surface", "ent_type",
                 "score", "n_in_page", "link_score"],
    )
    return ds


def kg_validation_issues(sf_dir: str):
    """Validation report rows (S8 analog) — the partitioned issues table."""
    out = _ensure_run(sf_dir)
    import glob

    files = sorted(
        glob.glob(os.path.join(out, "validation", "issues", "*.parquet"))
    )
    return rd.read_parquet(files)
