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


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, text, lang) -> text_pages(url, warc_ts, text, lang).

    HTML parsing is inherently per-row Python; the batch loop builds Arrow
    columns once per batch (no per-row Dataset ops).
    """
    htmls = batch.column("html").to_pylist()
    texts = [html_to_text(h) for h in htmls]
    return pa.Table.from_arrays(
        [
            batch.column("url"),
            batch.column("warc_ts"),
            pa.array(texts, pa.string()),
            batch.column("lang"),
        ],
        names=["url", "warc_ts", "text", "lang"],
    )
