"""Perceptual image hashing (dHash) + banded hamming near-dup pairs over
REAL decoded pixels — the image-corpus counterpart of the text SimHash path.

Reference parity: the reference treats media as opaque payloads; this is the
"beyond the reference" multimodal-dedup operator the survey calls for
(SURVEY.md §2 additions). The pipeline path is
encode(PNG/BMP/GIF/JPEG) -> REAL codec decode -> dHash -> banded LSH pairs,
while the golden oracle computes the same dHash straight from the synthesis
formulas (goldens._seq_dhash) — so driver parity proves codec inversion AND
hash/banding parity end-to-end.

Scale shape (100 TB): the hash pass is an actor-pool map (one 64-bit int per
image leaves the worker); candidate generation is ONE groupby on the 16-bit
band value (4 rows per image, corpus-size independent row width); buckets are
capped (PHASH_BUCKET_CAP, deterministic prefix by media_id) so a degenerate
band — e.g. monochrome thumbnails — cannot go O(n^2); pair dedup is one more
groupby on the packed pair key. Hamming verify happens INSIDE the band group
(both hashes are present in the group rows) — nothing is re-joined and no
corpus-sized state ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PHASH_BANDS = 4  # 4 x 16-bit bands over the 64-bit dHash
PHASH_HAM_MAX = 6  # emit pairs with hamming distance <= this
PHASH_BUCKET_CAP = 200  # deterministic per-bucket cap (hot-bucket guard)


def to_gray_i64(arr: np.ndarray) -> np.ndarray:
    """Channel-sum grayscale in exact int64 (RGB) or passthrough (gray)."""
    a = arr.astype(np.int64)
    return a.sum(axis=2) if a.ndim == 3 else a


def dhash64(gray: np.ndarray) -> int:
    """64-bit difference hash, exact integer arithmetic throughout.

    The image is partitioned into an 8x9 grid of box cells with boundaries
    r_i = i*h//8, c_j = j*w//9 (h >= 8, w >= 9). Bit (i*8 + j) is set iff
    mean(cell[i,j]) < mean(cell[i,j+1]), compared WITHOUT division via
    cross-multiplication (sum_l * n_r < sum_r * n_l) — bit-stable across
    platforms, no float rounding anywhere."""
    h, w = gray.shape
    if h < 8 or w < 9:  # pad tiny images by tiling (keeps arithmetic exact)
        reps = (-(-8 // h), -(-9 // w))
        gray = np.tile(gray, reps)
        h, w = gray.shape
    rb = (np.arange(9, dtype=np.int64) * h) // 8
    cb = (np.arange(10, dtype=np.int64) * w) // 9
    sums = np.add.reduceat(
        np.add.reduceat(gray, rb[:-1], axis=0), cb[:-1], axis=1
    )
    nr = (rb[1:] - rb[:-1])[:, None]
    nc = (cb[1:] - cb[:-1])[None, :]
    n = nr * nc  # (8, 9) cell pixel counts
    bits = sums[:, :-1] * n[:, 1:] < sums[:, 1:] * n[:, :-1]
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64).reshape(8, 8)
    return int(np.int64((bits.astype(np.uint64) * weights).sum()))


def band_values(h: int) -> list[int]:
    """Split a 64-bit hash (as signed int64) into PHASH_BANDS 16-bit ints."""
    u = h & 0xFFFFFFFFFFFFFFFF
    return [(u >> (16 * b)) & 0xFFFF for b in range(PHASH_BANDS)]


def hamming64(a: int, b: int) -> int:
    return ((a ^ b) & 0xFFFFFFFFFFFFFFFF).bit_count()


def pairs_from_bucket(
    ids: list[int], hashes: list[int], ham_max: int = PHASH_HAM_MAX,
    cap: int = PHASH_BUCKET_CAP,
) -> list[tuple[int, int, int]]:
    """Shared verify kernel (pipeline AND golden): within one band bucket,
    emit (a, b, hamming) for every id pair with hamming <= ham_max. The
    bucket is first truncated to its ``cap`` smallest media_ids —
    deterministic, so the distributed and sequential paths truncate
    identically."""
    order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")[:cap]
    sids = [ids[i] for i in order]
    shs = [hashes[i] for i in order]
    out = []
    for i in range(len(sids)):
        for j in range(i + 1, len(sids)):
            d = hamming64(shs[i], shs[j])
            if d <= ham_max:
                out.append((sids[i], sids[j], d))
    return out


class DHashImages:
    """Actor-pool stage: REAL codec decode (PNG/BMP/GIF/JPEG; WAV rows are
    skipped) -> grayscale -> dHash. One row (media_id, dhash) per image."""

    def __init__(self) -> None:
        from ..functions import mediadecode as md

        self.md = md

    def __call__(self, t: pa.Table) -> pa.Table:
        md = self.md
        ids, hs = [], []
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
                continue  # audio
            ids.append(media_id)
            hs.append(dhash64(to_gray_i64(arr)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "dhash": pa.array(hs, pa.int64()),
            }
        )


def _explode_bands(t: pa.Table) -> pa.Table:
    ids = t["media_id"].to_pylist()
    hs = t["dhash"].to_pylist()
    out_key, out_id, out_h = [], [], []
    for mid, h in zip(ids, hs):
        for b, v in enumerate(band_values(h)):
            out_key.append(b * 65536 + v)  # band index folded into the key
            out_id.append(mid)
            out_h.append(h)
    return pa.table(
        {
            "bkey": pa.array(out_key, pa.int64()),
            "media_id": pa.array(out_id, pa.int64()),
            "dhash": pa.array(out_h, pa.int64()),
        }
    )


def _bucket_pairs(df):
    """map_groups(pandas) over one band bucket -> verified pairs."""
    import pandas as pd

    prs = pairs_from_bucket(
        df["media_id"].tolist(), df["dhash"].tolist()
    )
    return pd.DataFrame(
        {
            "id_a": [p[0] for p in prs],
            "id_b": [p[1] for p in prs],
            "hamming": [p[2] for p in prs],
        },
        dtype="int64",
    )


def dhash_features(sf_dir: str):
    """(media_id, dhash) over the real-codec image corpus, sorted."""
    from .multimodal import decodable_media_dataset

    return (
        decodable_media_dataset(sf_dir)
        .map_batches(
            DHashImages, batch_format="pyarrow", batch_size=256,
            concurrency=(1, 4),
        )
        .sort("media_id")
    )


def dhash_pairs(sf_dir: str):
    """Banded near-dup pairs: (id_a, id_b, hamming), hamming <= PHASH_HAM_MAX,
    deduped across bands (a pair sharing several bands appears once),
    sorted by (id_a, id_b)."""
    from .multimodal import decodable_media_dataset

    hashes = decodable_media_dataset(sf_dir).map_batches(
        DHashImages, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )
    pairs = (
        hashes.map_batches(_explode_bands, batch_format="pyarrow")
        .groupby("bkey")
        .map_groups(_bucket_pairs, batch_format="pandas")
    )

    def pack(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.add(
            pc.multiply(
                pc.cast(t["id_a"], pa.int64()), pa.scalar(1 << 32, pa.int64())
            ),
            pc.cast(t["id_b"], pa.int64()),
        )
        return t.append_column("pkey", key)

    from ray.data.aggregate import Min

    deduped = (
        pairs.map_batches(pack, batch_format="pyarrow")
        .groupby("pkey")
        .aggregate(Min("hamming"))
    )

    def unpack(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = t["pkey"]
        return pa.table(
            {
                "id_a": pc.cast(
                    pc.divide(k, pa.scalar(1 << 32, pa.int64())), pa.int64()
                ),
                "id_b": pc.cast(
                    pc.bit_wise_and(k, pa.scalar((1 << 32) - 1, pa.int64())),
                    pa.int64(),
                ),
                "hamming": pc.cast(t["min(hamming)"], pa.int64()),
            }
        )

    return (
        deduped.map_batches(unpack, batch_format="pyarrow")
        .sort(["id_a", "id_b"])
    )
