"""Content-defined chunking (gear-hash CDC) + cross-corpus chunk dedup.

Reference parity: the storage-layer counterpart of the span dedup the text
path already has (q53/q78) — CDC is how dedupling stores (and training-data
pipelines that dedupe at the byte level) find shared content that shifts
position between documents: chunk boundaries depend only on LOCAL bytes, so
an insertion early in a document does not re-align every later chunk.

Algorithm (FastCDC-style gear rolling hash, no-reset variant): h_i =
(h_{i-1} << 1) + GEAR[byte_i] mod 2^64 — equivalently a function of the last
64 bytes only, which both vectorizes the hash pass and keeps boundaries
content-local; position i is a candidate boundary when h_i & MASK == 0, a
chunk must reach MIN bytes before a candidate closes it and is force-closed
at MAX. The GEAR table is derived from splitmix64 (public constant-based
mixer) so both the distributed path and the sequential golden generate it
identically.

Scale shape (100 TB): chunking is map-only (per-document, vectorized-enough:
one C-speed numpy pass per doc); the dedup is ONE groupby on the 64-bit
chunk hash carrying (hash, doc_id, offset, nbytes) rows — never the bytes
themselves; the global first occurrence per hash is resolved with a single
packed-min aggregate, and per-doc rollups are ONE more groupby. Nothing
corpus-sized touches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CDC_MASK = (1 << 6) - 1  # expected chunk size ~64 bytes (small test corpus)
CDC_MIN = 16
CDC_MAX = 256


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


with np.errstate(over="ignore"):
    GEAR = _splitmix64(np.arange(256, dtype=np.uint64))


def _gear_hashes(b: np.ndarray) -> np.ndarray:
    """Rolling gear hash WITHOUT reset: h_i = 2*h_{i-1} + GEAR[b_i] mod 2^64
    == sum_{k<64} GEAR[b_{i-k}] << k, i.e. each position depends only on the
    last 64 bytes — which is what makes it vectorizable (64 shifted adds,
    all C-speed) AND what makes boundaries content-local (an insertion
    re-aligns at most one 64-byte window downstream)."""
    g = GEAR[b]
    n = len(b)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(min(64, n)):
            if k == 0:
                h += g
            else:
                h[k:] += g[:-k] << np.uint64(k)
    return h


def chunk_spans(data: bytes) -> list[tuple[int, int]]:
    """Shared chunking kernel (pipeline AND golden): (offset, nbytes) spans
    covering ``data``. A candidate boundary closes at position i when
    (h_i & CDC_MASK) == 0; candidates closer than CDC_MIN to the chunk start
    are skipped and chunks are force-split at CDC_MAX. The Python scan below
    touches only the ~n/(CDC_MASK+1) candidate positions, not every byte."""
    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8)
    h = _gear_hashes(b)
    cand = np.flatnonzero((h & np.uint64(CDC_MASK)) == 0)
    spans: list[tuple[int, int]] = []
    start = 0
    for i in cand.tolist():
        if i < start:
            continue
        while i - start + 1 > CDC_MAX:
            spans.append((start, CDC_MAX))
            start += CDC_MAX
        if i - start + 1 >= CDC_MIN:
            spans.append((start, i - start + 1))
            start = i + 1
    while n - start > CDC_MAX:
        spans.append((start, CDC_MAX))
        start += CDC_MAX
    if start < n:
        spans.append((start, n - start))
    return spans


def chunk_hash(piece: bytes) -> int:
    """64-bit chunk content hash (blake2b-8) as signed int64."""
    import hashlib

    d = hashlib.blake2b(piece, digest_size=8).digest()
    return int(np.frombuffer(d, dtype="<i8")[0])


def doc_chunk_rows(doc_id: int, text: str):
    """(hash, doc_id, offset, nbytes) rows for one document."""
    data = text.encode("utf-8")
    return [
        (chunk_hash(data[off : off + ln]), doc_id, off, ln)
        for off, ln in chunk_spans(data)
    ]


def _chunk_batch(t: pa.Table) -> pa.Table:
    hs, ids, offs, lens = [], [], [], []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for h, d, off, ln in doc_chunk_rows(doc_id, text):
            hs.append(h)
            ids.append(d)
            offs.append(off)
            lens.append(ln)
    return pa.table(
        {
            "chash": pa.array(hs, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "off": pa.array(offs, pa.int64()),
            "nbytes": pa.array(lens, pa.int64()),
        }
    )


def cdc_dedup_stats(sf_dir: str):
    """Per-document CDC dedup rollup: (doc_id, n_chunks, n_bytes,
    dup_chunks, dup_bytes) where an occurrence is ``dup`` iff it is not the
    global first occurrence of its chunk hash (first = smallest
    (doc_id, offset)). Sorted by doc_id."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min, Sum

    from ..sources.tables import read_table

    chunks = read_table(
        sf_dir, "documents", columns=["doc_id", "text"]
    ).map_batches(_chunk_batch, batch_format="pyarrow")

    # pack (doc_id, off) so ONE Min aggregate finds the global first
    # occurrence per hash (off < 2^20 by CDC_MAX-bounded doc sizes is NOT
    # guaranteed — use a wide 2^40 shift; doc_id < 2^23 at any test sf)
    def pack(t: pa.Table) -> pa.Table:
        key = pc.add(
            pc.multiply(t["doc_id"], pa.scalar(1 << 40, pa.int64())),
            t["off"],
        )
        return t.append_column("okey", key)

    packed = chunks.map_batches(pack, batch_format="pyarrow")
    firsts = packed.groupby("chash").aggregate(Min("okey"))

    # mark each occurrence dup/not via the coarse-bucket attach (hash side
    # and occurrence side shuffled by the same coarse key)
    from ..pipelines.graphalgo import _attach_i64
    from ..runtime import cluster_cpus

    n_groups = max(8, cluster_cpus())
    marked = _attach_i64(
        packed, ["chash", "doc_id", "nbytes", "okey"], "chash",
        firsts, "chash", "min(okey)", "first_okey", n_groups,
    )

    def per_doc(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_chunks", pa.int64()),
                 ("n_bytes", pa.int64()), ("dup_chunks", pa.int64()),
                 ("dup_bytes", pa.int64())]
            ).empty_table()
        dup = pc.not_equal(t["okey"], t["first_okey"])
        dupi = pc.cast(dup, pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chunks": pa.array(
                    np.ones(t.num_rows, dtype=np.int64), pa.int64()
                ),
                "n_bytes": t["nbytes"],
                "dup_chunks": dupi,
                "dup_bytes": pc.multiply(dupi, t["nbytes"]),
            }
        )

    out = (
        marked.map_batches(per_doc, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_chunks"), Sum("n_bytes"), Sum("dup_chunks"),
            Sum("dup_bytes"),
        )
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chunks": pc.cast(t["sum(n_chunks)"], pa.int64()),
                "n_bytes": pc.cast(t["sum(n_bytes)"], pa.int64()),
                "dup_chunks": pc.cast(t["sum(dup_chunks)"], pa.int64()),
                "dup_bytes": pc.cast(t["sum(dup_bytes)"], pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow").sort("doc_id")
