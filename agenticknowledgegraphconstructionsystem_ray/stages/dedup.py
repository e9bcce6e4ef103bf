"""Document deduplication family (SURVEY.md §2.7 extended for training-data
pipelines): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

The reference only has exact-key dedup (D1-D5, UNIQUE constraints +
seen-sets); near-dup is the scale extension. Every hash here is derived from
blake2b/crc — NEVER Python's process-seeded ``hash()`` — so results are
deterministic across workers and runs.

Scale shape (the LSH pattern from the Ray guide): shingle+minhash per batch
(vectorized numpy) -> explode to (band, band_hash, doc_id) rows -> groupby
band bucket -> candidate pairs -> verify exact Jaccard -> connected
components. Candidate pairs are a tiny fraction of the corpus; verification
fetches only the involved documents.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows
_ROWS = _N_PERM // _BANDS


def tokens_of(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def shingles_of(text: str, n: int = 3) -> set[str]:
    toks = tokens_of(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _perm_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=_N_PERM, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=_N_PERM, dtype=np.int64)
    return a, b


_A, _B = _perm_params()


_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 500_000  # web-scale vocabularies are unbounded; cap
                                 # the per-worker cache so long-lived workers
                                 # don't grow without limit
_SHINGLE_P1 = np.uint64(0x9E3779B97F4A7C15)
_SHINGLE_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        if len(_TOKEN_HASH_CACHE) >= _TOKEN_HASH_CACHE_MAX:
            _TOKEN_HASH_CACHE.clear()
        h = _stable_u64(tok)
        _TOKEN_HASH_CACHE[tok] = h
    return h


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct uint64 hashes of the token n-gram shingles — token hashes
    are blake2b (cached per worker, vocabularies are small), shingle hashes
    combine them with wraparound multiply-add (vectorized); no per-shingle
    cryptographic hashing in the hot path."""
    toks = tokens_of(text)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    h = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
    if len(h) < n:
        out = np.zeros(1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for x in h:
                out = out * _SHINGLE_P1 + x
        return out
    with np.errstate(over="ignore"):
        grams = (
            h[: len(h) - n + 1] * _SHINGLE_P1
            + h[1 : len(h) - n + 2] * _SHINGLE_P2
            + h[2 : len(h) - n + 3]
        )
    return np.unique(grams)


def minhash_signature(text: str) -> np.ndarray:
    """64-permutation MinHash signature (uint64[_N_PERM]).

    Permutation family is (h*a + b) with uint64 wraparound — a standard
    multiply-shift-style universal-ish family; deterministic and fully
    vectorized (no per-shingle Python math)."""
    h = shingle_hashes(text)
    if not len(h):
        return np.full(_N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    a = _A.astype(np.uint64)
    b = _B.astype(np.uint64)
    with np.errstate(over="ignore"):
        vals = h[:, None] * a[None, :] + b[None, :]  # uint64 wrap is the hash
    return np.min(vals, axis=0)


def simhash64(text: str) -> int:
    """64-bit SimHash over the token multiset (vectorized bit counting)."""
    toks = tokens_of(text)
    if not toks:
        return 0
    h = np.fromiter((_stable_u64(t) for t in toks), dtype=np.uint64, count=len(toks))
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def _bucket_pairs(g):
    """Group-to-sorted-pairs kernel shared by both LSH paths (pandas group:
    one bucket)."""
    ids = sorted(g["doc_id"].tolist())
    rows = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    if not rows:
        return {
            "doc_a": np.array([], dtype=np.int64),
            "doc_b": np.array([], dtype=np.int64),
        }
    arr = np.array(rows, dtype=np.int64)
    return {"doc_a": arr[:, 0], "doc_b": arr[:, 1]}


# ---------------------------------------------------------------------------
# MinHash + LSH candidate generation over a documents Dataset
# ---------------------------------------------------------------------------

def _minhash_bands_batch(t: pa.Table) -> pa.Table:
    """doc batch -> (band, band_hash, doc_id) rows (the LSH explode)."""
    ids, bands, bhashes = [], [], []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        sig = minhash_signature(text)
        for band in range(_BANDS):
            chunk = sig[band * _ROWS : (band + 1) * _ROWS]
            bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            ids.append(doc_id)
            bands.append(band)
            bhashes.append(bh)
    return pa.table(
        {
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(bhashes, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )


def minhash_candidate_pairs(docs: rd.Dataset) -> list[tuple[int, int]]:
    """LSH bucket groupby -> unique candidate pairs (sorted, deduplicated)."""
    bands = docs.map_batches(_minhash_bands_batch, batch_format="pyarrow")

    pairs = (
        bands.groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_buckets"))
    )
    out = pairs.to_pandas()  # candidate set is small by construction
    return sorted(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))


def minhash_near_dups(
    sf_dir_or_ds, threshold: float = 0.8, table: str = "documents"
):
    """Full MinHash-LSH near-dup pipeline: candidates -> exact-Jaccard verify.

    Returns pa.Table(doc_a, doc_b, jaccard_ppm) sorted. Verification fetches
    only candidate documents (semi-join via broadcast id-set).
    """
    from ..sources.tables import read_table

    docs = (
        sf_dir_or_ds
        if isinstance(sf_dir_or_ds, rd.Dataset)
        else read_table(sf_dir_or_ds, table, columns=["doc_id", "text"])
    )
    cand = minhash_candidate_pairs(docs)
    if not cand:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_ppm": pa.array([], pa.int64()),
            }
        )
    involved = {d for p in cand for d in p}
    inv_ref = ray.put(involved)

    class FetchShingles:
        def __init__(self, ref) -> None:
            self.want = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, shs = [], []
            for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                if doc_id in self.want:
                    ids.append(doc_id)
                    shs.append("\x00".join(sorted(shingles_of(text))))
            return pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "sh": pa.array(shs, pa.string())}
            )

    fetched = docs.map_batches(
        FetchShingles, fn_constructor_kwargs={"ref": inv_ref},
        batch_format="pyarrow", concurrency=(1, 4),
    ).take_all()
    sh_by_id = {r["doc_id"]: set(r["sh"].split("\x00")) if r["sh"] else set() for r in fetched}

    rows = []
    for a, b in cand:
        j = jaccard(sh_by_id[a], sh_by_id[b])
        if j >= threshold:
            rows.append((a, b, int(j * 1_000_000 + 0.5)))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard_ppm": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_near_dups(sf_dir_or_ds, max_hamming: int = 3, table: str = "documents"):
    """SimHash near-dup: 4x16-bit band buckets -> candidate pairs -> hamming
    verify. Returns pa.Table(doc_a, doc_b, hamming)."""
    from ..sources.tables import read_table

    docs = (
        sf_dir_or_ds
        if isinstance(sf_dir_or_ds, rd.Dataset)
        else read_table(sf_dir_or_ds, table, columns=["doc_id", "text"])
    )

    def sim_batch(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ids.append(doc_id)
            hs.append(simhash64(text))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "simhash": pa.array(hs, pa.uint64())}
        )

    # consumed twice (candidate generation + hamming verify) -> materialize
    sims = docs.map_batches(sim_batch, batch_format="pyarrow").materialize()

    def explode_bands(t: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for doc_id, h in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            for band in range(4):
                ids.append(doc_id)
                bands.append(band)
                keys.append((h >> (band * 16)) & 0xFFFF)
        return pa.table(
            {
                "band": pa.array(bands, pa.int32()),
                "key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    cand = (
        sims.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    h_by_id = {r["doc_id"]: r["simhash"] for r in sims.take_all()}
    rows = []
    for a, b in zip(cand.get("doc_a", []), cand.get("doc_b", [])):
        d = hamming64(int(h_by_id[int(a)]), int(h_by_id[int(b)]))
        if d <= max_hamming:
            rows.append((int(a), int(b), d))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
