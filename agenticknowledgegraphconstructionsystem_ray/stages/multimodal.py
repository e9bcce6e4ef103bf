"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Two layers:
- REAL container parsing (``functions/mediasniff.py``): actual PNG / GIF /
  BMP / JPEG / WAV header sniffers (marker-segment walk for JPEG, chunk walk
  for WAV) — the production path for extracting media metadata without
  decoding, exercised end-to-end by ``sniff_meta``/``mm_sniff_meta``.
- The container has no image/audio libraries, so PIXEL/SAMPLE DECODE is
  stubbed (the real-decoder path raises ``NotImplementedError``) while the
  Ray-side plumbing — binary Arrow schema, actor-pool stage, batch sizing,
  output layout — is real and tested.

Payload format (deterministic fake, built from the documents table so a SQL
oracle can validate the plumbing end-to-end):
  magic   4 bytes  b"IMG1" | b"AUD1" | b"VID1" (kind = doc_id % 3)
  width   4 bytes  big-endian uint32 = (n_chars % 640) + 16
  height  4 bytes  big-endian uint32 = (n_chars % 480) + 16
  body    text bytes (stands in for pixel/sample data)

Stages keep ``batch_format="pyarrow"`` throughout — binary columns do not
round-trip pandas cleanly (guide: "nested/binary columns ... keep those
stages in pyarrow").
"""

from __future__ import annotations

import pyarrow as pa

MAGIC_BY_KIND = {0: b"IMG1", 1: b"AUD1", 2: b"VID1"}
KIND_NAMES = {0: "image", 1: "audio", 2: "video"}
FRAME_BYTES = 256  # fake video frame size for frame sampling


def build_media_batch(t: pa.Table) -> pa.Table:
    """documents(doc_id, text, n_chars) -> media(media_id, kind, payload).
    Deterministic payload synthesis (stands in for reading real blobs)."""
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    n_chars = t["n_chars"].to_pylist()
    kinds, payloads = [], []
    for doc_id, text, nc in zip(ids, texts, n_chars):
        kind = doc_id % 3
        w = (nc % 640) + 16
        h = (nc % 480) + 16
        payloads.append(
            MAGIC_BY_KIND[kind]
            + w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + text.encode("utf-8")
        )
        kinds.append(KIND_NAMES[kind])
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class DecodeMedia:
    """Actor-pool decode stage. ``__init__`` is where a real decoder (PIL /
    torchaudio / ffmpeg) would be loaded once per actor; here it just records
    that the stub decoder is active. ``real_decode=True`` raises
    NotImplementedError — the marked stub boundary."""

    def __init__(self, real_decode: bool = False) -> None:
        if real_decode:
            raise NotImplementedError(
                "real image/audio decode requires PIL/torchaudio, absent in "
                "this container; stub header decode is active instead"
            )
        self.real = False

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, sizes, fmts = [], [], [], []
        for payload in t["payload"].to_pylist():
            magic, w, h = payload[:4], payload[4:8], payload[8:12]
            fmts.append(magic.decode("ascii", errors="replace"))
            widths.append(int.from_bytes(w, "big"))
            heights.append(int.from_bytes(h, "big"))
            sizes.append(len(payload) - 12)
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "body_bytes": pa.array(sizes, pa.int64()),
            }
        )


class FrameSampler:
    """Video frame sampling: split body into FRAME_BYTES frames, keep every
    ``stride``-th frame; emits one row per sampled frame (flat_map-shaped
    output from map_batches)."""

    def __init__(self, stride: int = 4) -> None:
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for media_id, kind, payload in zip(
            t["media_id"].to_pylist(),
            t["kind"].to_pylist(),
            t["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            body = payload[12:]
            n_frames = (len(body) + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, self.stride):
                ids.append(media_id)
                frame_idx.append(i)
                frames.append(body[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


REAL_FORMATS = ("PNG", "GIF", "BMP", "JPEG", "WAV")


def build_real_media_batch(t: pa.Table) -> pa.Table:
    """documents -> real-container media: each doc becomes a minimal VALID
    PNG/GIF/BMP/JPEG/WAV file (format = doc_id % 5) whose header encodes
    dimensions derived from n_chars, with the text bytes as body. Lets the
    real sniffers be driver-verified end-to-end against a SQL oracle."""
    from ..functions import mediasniff as ms

    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    n_chars = t["n_chars"].to_pylist()
    payloads = []
    for doc_id, text, nc in zip(ids, texts, n_chars):
        body = text.encode("utf-8")
        w = (nc % 640) + 16
        h = (nc % 480) + 16
        k = doc_id % 5
        if k == 0:
            payloads.append(ms.build_png(w, h, body))
        elif k == 1:
            payloads.append(ms.build_gif(w, h, body))
        elif k == 2:
            payloads.append(ms.build_bmp(w, h, body))
        elif k == 3:
            payloads.append(ms.build_jpeg(w, h, body))
        else:
            rate = 8000 + (nc % 8) * 1000
            channels = 1 + doc_id % 2
            payloads.append(ms.build_wav(rate, channels, body))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class SniffMedia:
    """Actor-pool metadata stage over REAL container bytes: per-payload
    header sniff (no decode). Unknown formats pass through with nulls rather
    than poisoning the batch."""

    def __init__(self) -> None:
        from ..functions.mediasniff import sniff

        self.sniff = sniff

    def __call__(self, t: pa.Table) -> pa.Table:
        fmts, widths, heights, bodies = [], [], [], []
        for payload in t["payload"].to_pylist():
            out = self.sniff(payload)
            if out is None:
                fmts.append(None)
                widths.append(None)
                heights.append(None)
                bodies.append(None)
            else:
                fmt, w, h, hdr_len = out
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                bodies.append(len(payload) - hdr_len)
        return pa.table(
            {
                "media_id": t["media_id"],
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "body_bytes": pa.array(bodies, pa.int64()),
            }
        )


def sniff_meta(sf_dir: str):
    """Real-format metadata extraction end-to-end: synthesize valid
    PNG/GIF/BMP/JPEG/WAV files from documents, sniff them back with the real
    header parsers (actor pool), emit (media_id, format, width, height,
    body_bytes)."""
    from ..sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return docs.map_batches(build_real_media_batch, batch_format="pyarrow").map_batches(
        SniffMedia, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )


def media_dataset(sf_dir: str):
    """documents -> media Dataset (binary payload column)."""
    from ..sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return docs.map_batches(build_media_batch, batch_format="pyarrow")


def decode_meta(sf_dir: str):
    """Full plumbing: build media -> actor-pool decode -> metadata rows.
    SQL-oracle-checkable because the fake header fields derive from
    documents.n_chars."""
    return media_dataset(sf_dir).map_batches(
        DecodeMedia, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )


def sampled_frames(sf_dir: str, stride: int = 4):
    """Video frame-sample counts per media_id (plumbing demo)."""
    from ray.data.aggregate import Count

    frames = media_dataset(sf_dir).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 2),
    )
    return frames.groupby("media_id").aggregate(Count(alias_name="n_sampled_frames"))
