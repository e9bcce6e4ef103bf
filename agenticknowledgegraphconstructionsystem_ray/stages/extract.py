"""Stateless HTML -> text extraction stage.

Reference analog: the PDF text extractor applied per row
(``/root/reference/extract_and_populate.py:35-71``). Ray mapping (SURVEY.md
S4): ``ds.map_batches(extract_text_batch, batch_format="pyarrow")`` —
stateless task, pure per-row kernel, so output is byte-identical regardless of
parallelism or batch boundaries.

The wide ``html`` binary column is DROPPED here, immediately after use, so it
never flows through the rest of the DAG (SURVEY.md §7.4 "wide rows").
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.html_text import html_to_text


def extract_text_batch(
    batch: pa.Table, path_to_chunk: dict[str, str] | None = None
) -> pa.Table:
    """pages(url, warc_ts, html, text, lang[, path]) ->
    text_pages(url, warc_ts, text, lang[, chunk]).

    HTML parsing is inherently per-row Python; the batch loop builds Arrow
    columns once per batch (no per-row Dataset ops).

    ``path_to_chunk``: optional map from source file path (the ``path``
    column of ``read_parquet(include_paths=True)``) to the lineage chunk
    tag — a tiny dict shipped by value, which keeps the whole phase-A chain
    (read -> extract -> records -> write) a single fused task operator
    instead of per-chunk dataset unions that fragment operator fusion.
    """
    htmls = batch.column("html").to_pylist()
    texts = [html_to_text(h) for h in htmls]
    arrays = [
        batch.column("url"),
        batch.column("warc_ts"),
        pa.array(texts, pa.string()),
        batch.column("lang"),
    ]
    names = ["url", "warc_ts", "text", "lang"]
    if path_to_chunk is not None and "path" in batch.schema.names:
        tags = [path_to_chunk[p] for p in batch.column("path").to_pylist()]
        arrays.append(pa.array(tags, pa.string()))
        names.append("chunk")
    elif "chunk" in batch.schema.names:  # pre-tagged input passed through
        arrays.append(batch.column("chunk"))
        names.append("chunk")
    return pa.Table.from_arrays(arrays, names=names)
