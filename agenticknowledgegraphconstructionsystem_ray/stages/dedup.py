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


# A degenerate LSH bucket (empty docs, shared boilerplate) is O(n^2) in
# pairs. Above this size, emit a sorted CHAIN (id_i, id_{i+1}) instead of all
# pairs: O(n) rows that still connect a true duplicate cluster for the
# downstream connected-components view, at the cost of possibly missing some
# direct pairs between near-(not exactly)-identical members — which the other
# LSH bands usually recover. Same guard family as kgqueries MAX_DEGREE.
MAX_BUCKET_ALL_PAIRS = 100


def _bucket_pairs(g):
    """Group-to-sorted-pairs kernel shared by both LSH paths (pandas group:
    one bucket). Oversized buckets degrade to chain pairs (see
    MAX_BUCKET_ALL_PAIRS) so no single hot bucket can go quadratic."""
    ids = sorted(g["doc_id"].tolist())
    if len(ids) > MAX_BUCKET_ALL_PAIRS:
        rows = list(zip(ids[:-1], ids[1:]))
    else:
        rows = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    if not rows:
        return {
            "doc_a": np.array([], dtype=np.int64),
            "doc_b": np.array([], dtype=np.int64),
        }
    arr = np.array(rows, dtype=np.int64)
    return {"doc_a": arr[:, 0], "doc_b": arr[:, 1]}


def _join_pair_payload(
    pairs: rd.Dataset, payload: rd.Dataset, col: str, col_type: pa.DataType
):
    """Attach a per-doc payload column to candidate pairs for BOTH endpoints
    (distributed; nothing corpus-sized ever reaches the driver). ``payload``
    columns: (doc_id, <col>); doc_id must be unique. Returns a Dataset with
    (doc_a, doc_b, <col>_a, <col>_b).

    Implemented as a join-via-groupby (union tagged rows, group on the doc
    key to pick up the payload, regroup on the pair): ``Dataset.join``'s
    hash partitions lose their schema when empty, which breaks the second
    join on small/skewed candidate sets, and a groupby tolerates any skew.
    """

    def pair_sides(t: pa.Table) -> pa.Table:
        a = t["doc_a"].combine_chunks()
        b = t["doc_b"].combine_chunks()
        n = len(a)
        return pa.table(
            {
                "k": pa.concat_arrays([a, b]),
                "doc_a": pa.concat_arrays([a, a]),
                "doc_b": pa.concat_arrays([b, b]),
                "role": pa.concat_arrays(
                    [pa.array(["a"] * n), pa.array(["b"] * n)]
                ),
                col: pa.nulls(2 * n, col_type),
            }
        )

    def payload_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "k": t["doc_id"],
                "doc_a": pa.nulls(n, pa.int64()),
                "doc_b": pa.nulls(n, pa.int64()),
                "role": pa.array(["p"] * n, pa.string()),
                col: t[col],
            }
        )

    tagged = pairs.map_batches(pair_sides, batch_format="pyarrow").union(
        payload.map_batches(payload_rows, batch_format="pyarrow")
    )

    def attach(g):
        vals = g.loc[g["role"] == "p", col]
        if not len(vals):
            return {
                "doc_a": np.array([], dtype=np.int64),
                "doc_b": np.array([], dtype=np.int64),
                "role": np.array([], dtype="U1"),
                col: np.array([], dtype="U1"),
            }
        v = vals.iloc[0]
        side = g[g["role"] != "p"]
        return {
            "doc_a": side["doc_a"].to_numpy(dtype=np.int64, na_value=-1),
            "doc_b": side["doc_b"].to_numpy(dtype=np.int64, na_value=-1),
            "role": side["role"].to_numpy(dtype=object),
            col: np.array([v] * len(side), dtype=object),
        }

    def combine(g):
        va = g.loc[g["role"] == "a", col]
        vb = g.loc[g["role"] == "b", col]
        if not len(va) or not len(vb):
            return {
                "doc_a": np.array([], dtype=np.int64),
                "doc_b": np.array([], dtype=np.int64),
                f"{col}_a": np.array([], dtype="U1"),
                f"{col}_b": np.array([], dtype="U1"),
            }
        return {
            "doc_a": np.array([g["doc_a"].iloc[0]], dtype=np.int64),
            "doc_b": np.array([g["doc_b"].iloc[0]], dtype=np.int64),
            f"{col}_a": np.array([va.iloc[0]], dtype=object),
            f"{col}_b": np.array([vb.iloc[0]], dtype=object),
        }

    return (
        tagged.groupby("k")
        .map_groups(attach, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(combine, batch_format="pandas")
    )


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


def minhash_candidate_pairs_ds(docs: rd.Dataset) -> rd.Dataset:
    """LSH bucket groupby -> unique candidate pairs as a DISTRIBUTED Dataset
    (doc_a, doc_b) — never collected to the driver."""
    bands = docs.map_batches(_minhash_bands_batch, batch_format="pyarrow")
    return (
        bands.groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_buckets"))
        .select_columns(["doc_a", "doc_b"])
    )


def minhash_candidate_pairs(docs: rd.Dataset) -> list[tuple[int, int]]:
    """Candidate pairs collected to the driver (small result; tests/tools)."""
    out = minhash_candidate_pairs_ds(docs).to_pandas()
    return sorted(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))


def _involved_id_set(pairs: rd.Dataset) -> set[int]:
    """Distinct doc ids appearing in candidate pairs — bounded by 2x the
    candidate count (the legitimate broadcast small side)."""

    def explode(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()]
        )
        import pyarrow.compute as pc

        return pa.table({"doc_id": pc.unique(both)})

    return set(
        pairs.map_batches(explode, batch_format="pyarrow").unique("doc_id")
    )


def minhash_near_dups(
    sf_dir_or_ds, threshold: float = 0.8, table: str = "documents"
):
    """Full MinHash-LSH near-dup pipeline: candidates -> exact-Jaccard verify.

    Returns pa.Table(doc_a, doc_b, jaccard_ppm) sorted. Scale shape: the
    candidate-pair set stays a Dataset; only the involved-id SET (2x pairs,
    small by LSH construction + the bucket cap) is broadcast to filter the
    shingle computation, and verification runs as two distributed hash joins
    (pair x shingles) + a vectorized-per-pair Jaccard map — no corpus-sized
    or content-sized driver materialization.
    """
    from ..sources.tables import read_table

    docs = (
        sf_dir_or_ds
        if isinstance(sf_dir_or_ds, rd.Dataset)
        else read_table(sf_dir_or_ds, table, columns=["doc_id", "text"])
    )
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard_ppm": pa.array([], pa.int64()),
        }
    )
    pairs = minhash_candidate_pairs_ds(docs).materialize()
    involved = _involved_id_set(pairs)
    if not involved:
        return empty
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

    shingle_ds = docs.map_batches(
        FetchShingles, fn_constructor_kwargs={"ref": inv_ref},
        batch_format="pyarrow", concurrency=(1, 4),
    )

    joined = _join_pair_payload(pairs, shingle_ds, "sh", pa.string())

    def verify(t: pa.Table) -> pa.Table:
        rows = []
        for a, b, sa, sb in zip(
            t["doc_a"].to_pylist(), t["doc_b"].to_pylist(),
            t["sh_a"].to_pylist(), t["sh_b"].to_pylist(),
        ):
            j = jaccard(
                set(sa.split("\x00")) if sa else set(),
                set(sb.split("\x00")) if sb else set(),
            )
            if j >= threshold:
                rows.append((a, b, int(j * 1_000_000 + 0.5)))
        return pa.table(
            {
                "doc_a": pa.array([r[0] for r in rows], pa.int64()),
                "doc_b": pa.array([r[1] for r in rows], pa.int64()),
                "jaccard_ppm": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow").take_all()
    rows = sorted((r["doc_a"], r["doc_b"], r["jaccard_ppm"]) for r in out)
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

    pairs = (
        sims.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["doc_a", "doc_b"])
    )

    # distributed hamming verify: join the (doc_id, simhash) dataset to the
    # candidate pairs for both endpoints — the corpus-sized simhash map never
    # reaches the driver (it used to via take_all)
    # hex-encode the simhash for the shuffle: uint64 values above 2^63 make
    # pandas/arrow type inference flap between int64 and uint64 across blocks
    sim_payload = sims.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pa.array(
                    [f"{v:016x}" for v in t["simhash"].to_pylist()], pa.string()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = _join_pair_payload(pairs, sim_payload, "h", pa.string())

    def verify(t: pa.Table) -> pa.Table:
        a = np.asarray(
            [int(x, 16) for x in t["h_a"].to_pylist()], dtype=np.uint64
        )
        b = np.asarray(
            [int(x, 16) for x in t["h_b"].to_pylist()], dtype=np.uint64
        )
        x = np.bitwise_xor(a, b)
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
            if len(x)
            else np.empty(0, dtype=np.int64)
        )
        keep = ham <= max_hamming
        da = np.asarray(t["doc_a"].to_pylist(), dtype=np.int64)[keep]
        db = np.asarray(t["doc_b"].to_pylist(), dtype=np.int64)[keep]
        return pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow").take_all()
    rows = sorted((r["doc_a"], r["doc_b"], r["hamming"]) for r in out)
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
