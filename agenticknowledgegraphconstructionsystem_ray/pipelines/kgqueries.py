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
    kg.ensure_complete(cfg)
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


def kg_shared_entities(sf_dir: str, min_relevance: float = 0.4, top: int = 50):
    """Document-pair similarity via shared entities — the reference's
    shared-concepts self-join (J1, ``database.ts:236-259``: paper_concepts
    joined to itself on concept_id at relevance >= 0.4) and its documented
    2-hop co-occurrence query (J8, ``db_init.py:240-252``).

    Shape: mentions filtered to score >= min_relevance, grouped by entity,
    pairs emitted per group, re-grouped by pair with counts, top-k. Head
    (Zipf) entities are EXCLUDED above a degree cap — the standard guard
    against the quadratic pair blowup a high-degree node causes (SURVEY.md
    §4.2 skew note); a production variant would sample or salt instead.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    out = _ensure_run(sf_dir)
    mentions = kg.mentions_dataset(out, columns=["url", "norm_surface", "score"])

    def keep_relevant(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["score"], pa.scalar(min_relevance)))

    MAX_DEGREE = 20

    def entity_pairs(g):
        urls = sorted(g["url"].tolist())
        if len(urls) < 2 or len(urls) > MAX_DEGREE:
            return {
                "url_a": np.array([], dtype=object),
                "url_b": np.array([], dtype=object),
            }
        rows = [(a, b) for i, a in enumerate(urls) for b in urls[i + 1 :]]
        arr = np.array(rows, dtype=object)
        return {"url_a": arr[:, 0], "url_b": arr[:, 1]}

    pairs = (
        mentions.map_batches(keep_relevant, batch_format="pyarrow")
        .groupby("norm_surface")
        .map_groups(entity_pairs, batch_format="pandas")
        .groupby(["url_a", "url_b"])
        .aggregate(Count(alias_name="n_shared"))
        .sort(["n_shared", "url_a", "url_b"], descending=[True, False, False])
        .limit(top)
    )
    return pairs


def kg_validation_issues(sf_dir: str):
    """Validation report rows (S8 analog) — the partitioned issues table."""
    out = _ensure_run(sf_dir)
    import glob

    files = sorted(
        glob.glob(os.path.join(out, "validation", "issues", "*.parquet"))
    )
    return rd.read_parquet(files)
