"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Two layers:
- REAL container parsing (``functions/mediasniff.py``): actual PNG / GIF /
  BMP / JPEG / WAV header sniffers (marker-segment walk for JPEG, chunk walk
  for WAV) — the production path for extracting media metadata without
  decoding, exercised end-to-end by ``sniff_meta``/``mm_sniff_meta``.
- REAL pixel/sample decode (``functions/mediadecode.py``): actual PNG
  (zlib inflate + all-five-filter unfiltering, CRC-checked), 24-bit BMP,
  PCM16 WAV, GIF (variable-width LZW + palette) and baseline grayscale JPEG
  (FDCT + quantize + Huffman entropy coding) codecs — stdlib + numpy, no
  image/audio libraries needed. ``DecodePixels``/``ResizePixels`` run
  them in actor pools and are driver-verified against formula-direct golden
  oracles. No decode stub remains; the JPEG corpus is block-constant
  mosaics, for which the lossy codec round-trips exactly.

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
                "this stage handles the IMG1/AUD1/VID1 fake-header corpus; "
                "REAL PNG/BMP/WAV/GIF/JPEG pixel decode lives in "
                "DecodePixels (functions/mediadecode.py)"
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


# ---------------------------------------------------------------------------
# REAL pixel/sample decode (round 2): PNG / BMP / WAV / GIF / JPEG codecs
# from functions/mediadecode.py. The corpus is synthesized from a pure arithmetic
# formula (below); the pipeline path goes formula -> ENCODE -> Ray ->
# DECODE -> features, while the golden oracle computes features straight
# from the formula — so driver parity proves real codec inversion.
# ---------------------------------------------------------------------------

import numpy as np


def synth_pixels(doc_id: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image for a doc_id — pure arithmetic,
    vectorized, no RNG (resume/golden safety)."""
    h = 16 + doc_id % 33
    w = 16 + doc_id % 49
    y = np.arange(h, dtype=np.int64)[:, None, None] * 3
    x = np.arange(w, dtype=np.int64)[None, :, None] * 7
    c = np.arange(3, dtype=np.int64)[None, None, :] * 11
    return ((doc_id + y + x + c) % 256).astype(np.uint8)


def synth_samples(doc_id: int) -> tuple[int, np.ndarray]:
    """Deterministic (rate, (n_frames, channels) int16) audio for a doc_id."""
    channels = 1 + doc_id % 2
    n = 256 + doc_id % 512
    i = np.arange(n, dtype=np.int64)[:, None] * 17
    ch = np.arange(channels, dtype=np.int64)[None, :] * 29
    samples = (((doc_id * 13 + i + ch) % 65536) - 32768).astype(np.int16)
    return 8000 + (doc_id % 8) * 1000, samples


def synth_indexed(doc_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic ((h, w) uint8 palette indices, (256, 3) uint8 palette)
    for the GIF corpus — pure arithmetic, no RNG."""
    h = 16 + doc_id % 33
    w = 16 + doc_id % 49
    y = np.arange(h, dtype=np.int64)[:, None] * 3
    x = np.arange(w, dtype=np.int64)[None, :] * 7
    idx = ((doc_id + y + x) % 256).astype(np.uint8)
    i = np.arange(256, dtype=np.int64)[:, None]
    m = np.array([7, 13, 29], dtype=np.int64)[None, :]
    palette = ((doc_id + i * m) % 256).astype(np.uint8)
    return idx, palette


def synth_gif_rgb(doc_id: int) -> np.ndarray:
    """The RGB image a decoded GIF must equal: palette lookup straight from
    the synthesis formula (no codec involved)."""
    idx, palette = synth_indexed(doc_id)
    return palette[idx]


def synth_blocks(doc_id: int) -> np.ndarray:
    """Deterministic 8x8-block-constant grayscale mosaic for the JPEG corpus
    — the one image family whose JPEG round-trip is EXACT (each block is a
    lone DC coefficient; see functions/mediadecode.py), so the formula-direct
    golden still proves full codec inversion despite JPEG's lossiness."""
    bh = 2 + doc_id % 5
    bw = 2 + doc_id % 7
    by = np.arange(bh, dtype=np.int64)[:, None] * 5
    bx = np.arange(bw, dtype=np.int64)[None, :] * 11
    vals = ((doc_id + by + bx) % 256).astype(np.uint8)
    return np.kron(vals, np.ones((8, 8), np.uint8))


def build_decodable_media_batch(t: pa.Table) -> pa.Table:
    """documents -> real ENCODED media files: doc_id % 5 selects PNG / BMP /
    WAV / GIF / JPEG; the payload is a fully valid file of that format
    holding the formula-synthesized pixels/samples."""
    from ..functions import mediadecode as md

    ids = t["doc_id"].to_pylist()
    payloads = []
    for doc_id in ids:
        k = doc_id % 5
        if k == 0:
            payloads.append(md.encode_png(synth_pixels(doc_id)))
        elif k == 1:
            payloads.append(md.encode_bmp(synth_pixels(doc_id)))
        elif k == 2:
            rate, samples = synth_samples(doc_id)
            payloads.append(md.encode_wav(rate, samples))
        elif k == 3:
            payloads.append(md.encode_gif(*synth_indexed(doc_id)))
        else:
            payloads.append(md.encode_jpeg_gray(synth_blocks(doc_id)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class DecodePixels:
    """Actor-pool REAL decode stage: sniff the container, run the actual
    codec (PNG unfilter+inflate / BMP / WAV PCM), emit integer-exact
    features. For images width/height are pixel dims; for WAV width=sample
    rate, height=channels (the mediasniff convention). All features are
    int64 so driver value-hashes are dtype-stable."""

    def __init__(self) -> None:
        from ..functions import mediadecode as md

        self.md = md

    def __call__(self, t: pa.Table) -> pa.Table:
        md = self.md
        ids, fmts = [], []
        widths, heights, n_values, sums, mins, maxs = [], [], [], [], [], []
        for media_id, payload in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist()
        ):
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                arr = md.decode_png(payload).astype(np.int64)
                fmt, w, h = "PNG", arr.shape[1], arr.shape[0]
            elif payload[:2] == b"BM":
                arr = md.decode_bmp(payload).astype(np.int64)
                fmt, w, h = "BMP", arr.shape[1], arr.shape[0]
            elif payload[:4] == b"RIFF":
                rate, samples = md.decode_wav(payload)
                arr = samples.astype(np.int64)
                fmt, w, h = "WAV", rate, samples.shape[1]
            elif payload[:4] == b"GIF8":
                arr = md.decode_gif(payload).astype(np.int64)
                fmt, w, h = "GIF", arr.shape[1], arr.shape[0]
            elif payload[:2] == b"\xff\xd8":
                arr = md.decode_jpeg_gray(payload).astype(np.int64)
                fmt, w, h = "JPEG", arr.shape[1], arr.shape[0]
            else:
                raise ValueError("unknown media container")
            ids.append(media_id)
            fmts.append(fmt)
            widths.append(w)
            heights.append(h)
            n_values.append(int(arr.size))
            sums.append(int(arr.sum()))
            mins.append(int(arr.min()))
            maxs.append(int(arr.max()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "n_values": pa.array(n_values, pa.int64()),
                "sum_values": pa.array(sums, pa.int64()),
                "min_value": pa.array(mins, pa.int64()),
                "max_value": pa.array(maxs, pa.int64()),
            }
        )


class ResizePixels:
    """Actor-pool resize stage over REAL decoded images: exact 2x2 box
    downsample in integer arithmetic (sum of each 2x2 block // 4), the
    thumbnail/training-resize primitive. Odd edges are cropped (standard
    even-crop box filter). Audio rows are passed over."""

    def __init__(self) -> None:
        from ..functions import mediadecode as md

        self.md = md

    def __call__(self, t: pa.Table) -> pa.Table:
        md = self.md
        ids, rws, rhs, sums = [], [], [], []
        for media_id, payload in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist()
        ):
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                arr = md.decode_png(payload)
            elif payload[:2] == b"BM":
                arr = md.decode_bmp(payload)
            elif payload[:4] == b"GIF8":
                arr = md.decode_gif(payload)
            elif payload[:2] == b"\xff\xd8":
                arr = md.decode_jpeg_gray(payload)
            else:
                continue
            h2, w2 = arr.shape[0] // 2, arr.shape[1] // 2
            a = arr[: h2 * 2, : w2 * 2].astype(np.int64)
            if a.ndim == 2:  # grayscale (JPEG)
                small = a.reshape(h2, 2, w2, 2).sum(axis=(1, 3)) // 4
            else:
                small = a.reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3)) // 4
            ids.append(media_id)
            rws.append(w2)
            rhs.append(h2)
            sums.append(int(small.sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "resized_w": pa.array(rws, pa.int64()),
                "resized_h": pa.array(rhs, pa.int64()),
                "sum_resized": pa.array(sums, pa.int64()),
            }
        )


def decodable_media_dataset(sf_dir: str):
    """documents -> real encoded PNG/BMP/WAV/GIF/JPEG Dataset (binary
    payloads)."""
    from ..sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    return docs.map_batches(build_decodable_media_batch, batch_format="pyarrow")


def decode_pixels(sf_dir: str):
    """REAL decode end-to-end: encode the formula corpus into valid
    PNG/BMP/WAV/GIF/JPEG files, decode them back with the actual codecs in
    an actor pool, emit integer-exact pixel/sample features."""
    return decodable_media_dataset(sf_dir).map_batches(
        DecodePixels, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def resize_stats(sf_dir: str):
    """REAL decode + integer 2x2 box downsample over the image subset."""
    return decodable_media_dataset(sf_dir).map_batches(
        ResizePixels, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
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


# ---------------------------------------------------------------------------
# Cross-video near-dup via sampled-frame fingerprints (shot-level dedup):
# two videos are near-dups when they share >= VF_MIN_SHARED sampled-frame
# hashes. The posting list of a frame hash is capped at VF_POST_CAP videos
# — corpus-common frames (shared intros / boilerplate segments) would
# otherwise generate quadratic pairs from exactly the least-discriminative
# evidence (the tx_winnow_pairs hot-posting rule applied to frames).
# ---------------------------------------------------------------------------

# stride 1: shot-level dedup fingerprints EVERY frame (the sampler's
# stride is a cost dial for feature extraction, not for identity —
# skipping frames here would miss offset-aligned duplicates)
VF_STRIDE = 1
VF_MIN_SHARED = 2
VF_POST_CAP = 32


def frame_hash(frame: bytes) -> int:
    """Shared pure kernel: 8-byte blake2b of the frame payload as a
    non-negative int64 (top bit shifted out)."""
    import hashlib

    return (
        int.from_bytes(hashlib.blake2b(frame, digest_size=8).digest(), "big")
        >> 1
    )


def video_near_dups(sf_dir: str):
    """(id_a, id_b, n_shared) pairs of videos sharing >= VF_MIN_SHARED
    sampled-frame hashes, sorted. Shape: frame rows -> per-block distinct
    (fh, media_id) partials -> ONE fh groupby (8-byte hash + id rows — the
    frames themselves never shuffle) with capped in-group pair generation
    -> pair-count groupby -> threshold filter. Pair volume is bounded by
    postings * cap^2/2."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    frames = media_dataset(sf_dir).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": VF_STRIDE},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 4),
    )

    def hash_rows(t: pa.Table) -> pa.Table:
        seen: set[tuple[int, int]] = set()
        for mid, fr in zip(t["media_id"].to_pylist(), t["frame"].to_pylist()):
            seen.add((frame_hash(fr), mid))
        ks = sorted(seen)
        return pa.table(
            {
                "fh": pa.array([k[0] for k in ks], pa.int64()),
                "media_id": pa.array([k[1] for k in ks], pa.int64()),
            }
        )

    posts = (
        frames.map_batches(hash_rows, batch_format="pyarrow")
        .groupby(["fh", "media_id"])
        .aggregate(Count(alias_name="_n"))  # global distinct (fh, media_id)
    )

    def emit_pairs(g) -> dict:
        mids = sorted(set(int(m) for m in g["media_id"]))
        if len(mids) < 2 or len(mids) > VF_POST_CAP:
            return {
                "id_a": np.array([], np.int64),
                "id_b": np.array([], np.int64),
                "n_p": np.array([], np.int64),
            }
        a_idx, b_idx = np.triu_indices(len(mids), k=1)
        mv = np.asarray(mids, np.int64)
        return {
            "id_a": mv[a_idx],
            "id_b": mv[b_idx],
            "n_p": np.ones(len(a_idx), np.int64),
        }

    pairs = (
        posts.groupby("fh")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Sum("n_p", alias_name="n_shared"))
    )

    # pair set is candidate-bounded (<= postings * cap^2/2) — assemble the
    # final TYPED table on the driver so an empty result keeps its schema
    # (Ray's sort over zero matching rows loses it otherwise)
    rows = [
        r
        for r in pairs.take_all()
        if r.get("n_shared", 0) >= VF_MIN_SHARED
    ]
    rows.sort(key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table(
        {
            "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
            "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
            "n_shared": pa.array([r["n_shared"] for r in rows], pa.int64()),
        }
    )


class AudioStats:
    """Actor-pool audio feature extraction over REAL WAV payloads: decode
    PCM16 (functions/mediadecode.decode_wav), emit integer-exact features —
    n_frames, channels, energy = sum(s^2) over all channels, peak = max|s|,
    and zero crossings on channel 0 (count of adjacent sign products < 0).
    The batched-model-inference shape for audio (decoder held per actor)."""

    def __init__(self) -> None:
        from ..functions import mediadecode as md

        self.md = md

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, rates, chs, nfr, energy, peak, zc = [], [], [], [], [], [], []
        for media_id, payload in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist()
        ):
            rate, samples = self.md.decode_wav(payload)
            s = samples.astype(np.int64)
            c0 = s[:, 0]
            prod = c0[:-1] * c0[1:]
            ids.append(media_id)
            rates.append(rate)
            chs.append(samples.shape[1])
            nfr.append(samples.shape[0])
            energy.append(int((s * s).sum()))
            peak.append(int(np.abs(s).max()))
            zc.append(int((prod < 0).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "rate": pa.array(rates, pa.int64()),
                "channels": pa.array(chs, pa.int64()),
                "n_frames": pa.array(nfr, pa.int64()),
                "energy": pa.array(energy, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
                "zero_crossings": pa.array(zc, pa.int64()),
            }
        )


def audio_stats(sf_dir: str):
    """WAV members of the media corpus (doc_id % 5 == 2) -> integer audio
    features through the real RIFF/PCM16 decoder."""
    import ray.data as rd

    from ..sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = t.filter(pa.array(ids % 5 == 2))
        return build_decodable_media_batch(keep)

    media = docs.map_batches(build, batch_format="pyarrow")
    return media.map_batches(
        AudioStats, batch_format="pyarrow", concurrency=(1, 4)
    ).sort("media_id")


# ---------------------------------------------------------------------------
# Cross-audio near-dup — the audio-fingerprint dedup (shifted-recording
# detection, the Chromaprint/Shazam shape at toy scale): channel-0 sample
# WINDOWS (AF_WIN @ AF_STRIDE) hashed like video frames; audios sharing
# >= AF_MIN_SHARED window hashes pair up. Because windows slide, a
# re-encoded or offset copy of the same recording still collides — the
# property frame-exact hashing (mm_video_pairs) does not give. Same
# postings shape: per-block distinct (hash, id) partials, ONE hash
# groupby with the posting cap, pair-count groupby, typed driver
# assembly. Pipeline decodes REAL WAV payloads; the golden computes
# hashes straight from the synthesis formula — parity proves codec
# inversion (the dhash proof pattern).
# ---------------------------------------------------------------------------

AF_WIN = 64
AF_STRIDE = 32
AF_POST_CAP = 32
AF_MIN_SHARED = 2
AF_QSHIFT = 13  # 3-bit amplitude quantization before hashing


def audio_window_hashes(samples: "np.ndarray") -> list[int]:
    """Shared pure kernel: channel-0 windows of AF_WIN samples at
    AF_STRIDE, QUANTIZED to 3-bit amplitude levels (>> AF_QSHIFT) before
    the frame_hash blake2b — the fingerprint-robustness move: offset or
    lightly perturbed copies of a recording still collide, which exact
    int16 hashing would miss."""
    ch0 = samples[:, 0] if samples.ndim == 2 else samples
    q = np.ascontiguousarray(
        (ch0.astype(np.int32) >> AF_QSHIFT).astype(np.int8)
    )
    out = []
    for off in range(0, len(q) - AF_WIN + 1, AF_STRIDE):
        out.append(frame_hash(q[off : off + AF_WIN].tobytes()))
    return out


def audio_near_dups(sf_dir: str) -> pa.Table:
    """(id_a, id_b, n_shared) pairs of WAV corpus members sharing
    >= AF_MIN_SHARED sample-window hashes, sorted."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = t.filter(pa.array(ids % 5 == 2))
        return build_decodable_media_batch(keep)

    class WindowHashes:
        """Actor-pool decode + window hash: per-block DISTINCT
        (ah, media_id) partials — samples never leave the worker."""

        def __init__(self) -> None:
            from ..functions import mediadecode as md

            self.md = md

        def __call__(self, t: pa.Table) -> pa.Table:
            seen: set[tuple[int, int]] = set()
            for media_id, payload in zip(
                t["media_id"].to_pylist(), t["payload"].to_pylist()
            ):
                _rate, samples = self.md.decode_wav(payload)
                for h in audio_window_hashes(samples):
                    seen.add((h, media_id))
            ks = sorted(seen)
            return pa.table(
                {
                    "ah": pa.array([k[0] for k in ks], pa.int64()),
                    "media_id": pa.array([k[1] for k in ks], pa.int64()),
                }
            )

    posts = (
        docs.map_batches(build, batch_format="pyarrow")
        .map_batches(
            WindowHashes, batch_format="pyarrow", batch_size=512,
            concurrency=(1, 4),
        )
        .groupby(["ah", "media_id"])
        .aggregate(Count(alias_name="_n"))  # global distinct (ah, media_id)
    )

    def emit_pairs(g) -> dict:
        mids = sorted(set(int(m) for m in g["media_id"]))
        if len(mids) < 2 or len(mids) > AF_POST_CAP:
            return {
                "id_a": np.array([], np.int64),
                "id_b": np.array([], np.int64),
                "n_p": np.array([], np.int64),
            }
        a_idx, b_idx = np.triu_indices(len(mids), k=1)
        mv = np.asarray(mids, np.int64)
        return {
            "id_a": mv[a_idx],
            "id_b": mv[b_idx],
            "n_p": np.ones(len(a_idx), np.int64),
        }

    pairs = (
        posts.groupby("ah")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Sum("n_p", alias_name="n_shared"))
    )

    rows = [
        r for r in pairs.take_all() if r.get("n_shared", 0) >= AF_MIN_SHARED
    ]
    rows.sort(key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table(
        {
            "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
            "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
            "n_shared": pa.array([r["n_shared"] for r in rows], pa.int64()),
        }
    )
