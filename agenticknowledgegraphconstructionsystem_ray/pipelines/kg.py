"""The knowledge-graph construction pipeline (SURVEY.md §7.2 stage graph).

Two phases:

**Phase A — per-chunk, resumable** (the expensive per-document work;
reference analog: ingestion + entity extraction, SURVEY.md §3.1-3.2):
input Parquet files are grouped into chunks; for each PENDING chunk (resume
anti-join against lineage manifests, ``state/manifest.py``):

    read_parquet(chunk files)
      -> map_batches(extract_text_batch)             [stateless task; drops html]
      -> write text parquet (the byte-identical artifact)
      -> read text parquet
      -> map_batches(TripleExtractor, concurrency=N) [actor pool]
      -> map_batches(EntityLinker,   concurrency=N)  [actor pool, broadcast alias dict]
      -> write records parquet, partition_cols=["kind"]  (mention | triple)

Chunk outputs are staged to a temp dir and atomically renamed BEFORE the
manifest commits, so a manifest implies complete output and re-runs are
idempotent (reference: skip-if-done + extraction_logs anti-join,
``extract_and_populate.py:171-175``, ``database.ts:66-81``).

**Phase B — global shuffles, idempotent overwrite** (canonicalization +
materialization; reference analog: concept upserts + validation, §3.2-3.4):

    mentions -> map_batches(partial_mention_counts)  [block combiner]
             -> groupby(norm_surface).sum/min/max    [SHUFFLE 1 — small]
             -> driver union-find -> nodes + id map  (broadcast)
    triples  -> map_batches(ApplyEntityIds)          [broadcast id map]
             -> map_batches(dedup_edges_batch)       [block combiner]
             -> groupby(subj_id,pred,obj_id,url).min [SHUFFLE 2 — exact dedup]
             -> map_batches(ValidateEdges)           [stateless rules]
             -> sort(subj_id,pred,obj_id,url)        [SHUFFLE 3]
             -> write_parquet(edges/)
    nodes + validation report written alongside.

Scale notes: the only all-to-all exchanges are (1) over block-level partial
counts (rows bounded by blocks x vocabulary, not corpus size), (2) over
already block-deduplicated edges, (3) the final sort. The html column never
leaves phase A's first stage. The alias dictionary and the id map are
broadcast once via ``ray.put`` and read once per actor.
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from ..stages.canonicalize import (
    ApplyEntityIds,
    build_entity_table,
    dedup_edges_batch,
    partial_mention_counts,
)
from ..stages.extract import extract_text_batch
from ..stages.linking import EntityLinker
from ..stages.triples import TripleExtractor
from ..stages.validate import (
    validate_edges_batch,
    edge_issues_batch,
    summarize_issues,
    validate_nodes_table,
)
from ..state import manifest as mf
from .. import synth


@dataclass
class KGConfig:
    pages_dir: str
    out_dir: str
    chunk_files: int = 8          # input files per resumable chunk
    batch_size: int = 256         # pages per extraction batch
    extract_concurrency: int | None = None  # actor pool size (None -> auto tasks)
    lang_allow: frozenset[str] | None = None
    alias: dict[str, tuple[str, str]] | None = None  # norm alias -> (canonical, type)
    resume: bool = True
    max_chunks: int | None = None  # process at most this many pending chunks
                                   # (used by the kill/resume test)

    def alias_dict(self) -> dict[str, tuple[str, str]]:
        return self.alias if self.alias is not None else synth.alias_dict()


def plan_chunks(pages_dir: str, chunk_files: int) -> list[list[str]]:
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {pages_dir}")
    return [files[i : i + chunk_files] for i in range(0, len(files), chunk_files)]


def _text_dir(out: str, cid: int) -> str:
    return os.path.join(out, "text", f"chunk={cid:05d}")


def _records_dir(out: str, cid: int) -> str:
    return os.path.join(out, "extracted", f"chunk={cid:05d}")


def run_phase_a(cfg: KGConfig) -> dict:
    """Per-chunk extract + link; returns metrics."""
    chunks = plan_chunks(cfg.pages_dir, cfg.chunk_files)
    planned = list(range(len(chunks)))
    pending = mf.pending_chunks(cfg.out_dir, planned) if cfg.resume else planned
    if cfg.max_chunks is not None:
        pending = pending[: cfg.max_chunks]

    alias_ref = ray.put(cfg.alias_dict())
    t0 = time.perf_counter()
    n_pages = 0
    for cid in pending:
        files = chunks[cid]
        tstart = time.perf_counter()
        text_tmp = _text_dir(cfg.out_dir, cid) + ".tmp"
        rec_tmp = _records_dir(cfg.out_dir, cid) + ".tmp"
        for d in (text_tmp, rec_tmp):
            mf.clear_stale_tmp(d)
            os.makedirs(d, exist_ok=True)

        pages = rd.read_parquet(files)
        text_ds = pages.map_batches(
            extract_text_batch, batch_format="pyarrow", batch_size=cfg.batch_size
        )
        text_ds.write_parquet(text_tmp)

        text = rd.read_parquet(text_tmp)
        extractor_kwargs: dict = {}
        if cfg.extract_concurrency:
            extractor_kwargs["concurrency"] = cfg.extract_concurrency
        records = text.map_batches(
            TripleExtractor,
            fn_constructor_kwargs={"lang_allow": cfg.lang_allow},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            **(extractor_kwargs or {"concurrency": (1, 8)}),
        ).map_batches(
            EntityLinker,
            fn_constructor_kwargs={"alias_ref": alias_ref},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            **(extractor_kwargs or {"concurrency": (1, 4)}),
        )
        records.write_parquet(rec_tmp, partition_cols=["kind"])

        mf.atomic_replace_dir(text_tmp, _text_dir(cfg.out_dir, cid))
        mf.atomic_replace_dir(rec_tmp, _records_dir(cfg.out_dir, cid))
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        n_pages += rows
        mf.write_manifest(
            cfg.out_dir,
            cid,
            {
                "status": "success",
                "chunk_id": cid,
                "input_files": files,
                "row_count": rows,
                "wall_s": round(time.perf_counter() - tstart, 3),
            },
        )
    return {
        "chunks_total": len(chunks),
        "chunks_processed": len(pending),
        "pages_processed": n_pages,
        "phase_a_wall_s": round(time.perf_counter() - t0, 3),
    }


def _kind_files(out_dir: str, kind: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(out_dir, "extracted", "chunk=*", f"kind={kind}", "*.parquet"))
    )


def mentions_dataset(out_dir: str, columns: list[str] | None = None):
    files = _kind_files(out_dir, "mention")
    if not files:
        return None
    return rd.read_parquet(files, columns=columns)


def triples_dataset(out_dir: str, columns: list[str] | None = None):
    files = _kind_files(out_dir, "triple")
    if not files:
        return None
    return rd.read_parquet(files, columns=columns)


def run_phase_b(cfg: KGConfig) -> dict:
    """Global canonicalization + dedup + validate + materialize."""
    t0 = time.perf_counter()
    out = cfg.out_dir
    alias = cfg.alias_dict()

    # ---- SHUFFLE 1: mention counts (block combiner first) ----
    mentions = mentions_dataset(
        out, columns=["norm_surface", "n_in_page", "score"]
    )
    if mentions is None:
        counts_df = None
    else:
        partials = mentions.map_batches(
            partial_mention_counts, batch_format="pyarrow"
        )
        merged = partials.groupby("norm_surface").aggregate(
            Sum("mentions_p", alias_name="mention_count"),
            Sum("links_p", alias_name="link_count"),
            Sum("perfect_p", alias_name="perfect_links"),
            Max("max_score_p", alias_name="max_score"),
            Min("min_score_p", alias_name="min_score"),
        )
        counts_df = merged.to_pandas()  # bounded by vocabulary size

    if counts_df is None or counts_df.empty:
        nodes = pa.table(
            {
                "entity_id": pa.array([], pa.int64()),
                "canonical_name": pa.array([], pa.string()),
                "ent_type": pa.array([], pa.string()),
                "mention_count": pa.array([], pa.int64()),
                "link_count": pa.array([], pa.int64()),
                "perfect_links": pa.array([], pa.int64()),
                "max_score": pa.array([], pa.float64()),
                "min_score": pa.array([], pa.float64()),
                "aliases": pa.array([], pa.list_(pa.string())),
            }
        )
        id_map: dict[str, tuple[int, str]] = {}
    else:
        nodes, id_map = build_entity_table(counts_df, alias)

    nodes_dir = os.path.join(out, "nodes")
    _write_atomic_table(nodes, nodes_dir)

    # ---- SHUFFLE 2: edges dedup + validation + sort ----
    triples = triples_dataset(
        out,
        columns=[
            "url", "warc_ts", "subj", "subj_norm", "pred",
            "obj", "obj_norm", "confidence", "context",
        ],
    )
    edges_dir = os.path.join(out, "edges")
    n_edges = 0
    if triples is not None:
        id_ref = ray.put(id_map)
        edges = triples.map_batches(
            ApplyEntityIds,
            fn_constructor_kwargs={"id_map_ref": id_ref},
            batch_format="pyarrow",
            concurrency=(1, 8),
        ).map_batches(dedup_edges_batch, batch_format="pyarrow")
        edges = (
            edges.groupby(["subj_id", "pred", "obj_id", "url"])
            .aggregate(
                Min("subj", alias_name="subj"),
                Min("obj", alias_name="obj"),
                Min("warc_ts", alias_name="warc_ts"),
                Min("confidence", alias_name="confidence"),
                Min("context", alias_name="context"),
            )
        )
        edges = edges.map_batches(validate_edges_batch, batch_format="pyarrow")
        edges = edges.sort(["subj_id", "pred", "obj_id", "url"])
        tmp = edges_dir + ".tmp"
        mf.clear_stale_tmp(tmp)
        edges.write_parquet(tmp)
        mf.atomic_replace_dir(tmp, edges_dir)
        n_edges = sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(edges_dir, "*.parquet"))
        )
    else:
        os.makedirs(edges_dir, exist_ok=True)

    # ---- validation report (S8 analog) ----
    issue_rows = validate_nodes_table(nodes).to_pylist()
    if n_edges:
        issues_ds = rd.read_parquet(
            sorted(glob.glob(os.path.join(edges_dir, "*.parquet")))
        ).map_batches(edge_issues_batch, batch_format="pyarrow")
        issue_rows.extend(issues_ds.take_all())  # issues are sparse/small
    report = {
        "summary": summarize_issues(issue_rows, nodes.num_rows, n_edges),
        "issues": issue_rows,
    }
    report_path = os.path.join(out, "validation-results.json")
    with open(report_path + ".tmp", "w") as f:
        json.dump(report, f, sort_keys=True, default=str)
    os.replace(report_path + ".tmp", report_path)

    return {
        "n_nodes": nodes.num_rows,
        "n_edges": n_edges,
        "n_issues": len(issue_rows),
        "phase_b_wall_s": round(time.perf_counter() - t0, 3),
    }


def _write_atomic_table(table: pa.Table, out_dir: str) -> None:
    tmp = out_dir + ".tmp"
    mf.clear_stale_tmp(tmp)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "part-00000.parquet"))
    mf.atomic_replace_dir(tmp, out_dir)


def run_pipeline(cfg: KGConfig) -> dict:
    """End-to-end: phase A (resumable) + phase B (idempotent overwrite)."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    a = run_phase_a(cfg)
    b = run_phase_b(cfg)
    return {**a, **b, "out_dir": cfg.out_dir}
