"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix — the exact baseline (q16 uses the single-query variant).
- IVF (inverted-file) top-k: deterministic driver-side k-means-lite over a
  sample builds centroids; vectors are bucketed by nearest centroid via
  ``map_batches``; a query probes only the ``nprobe`` nearest buckets — the
  scale path (search cost ~ nprobe/nlist of brute force). Approximate;
  recall vs brute force is asserted in tests, not by a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..sources.tables import read_table


def _matrix(t: pa.Table) -> np.ndarray:
    """list<float> column -> (rows, dim) float64 matrix without a Python
    list round-trip: flatten the Arrow list values (offset-aware) and
    reshape. Requires non-null fixed-dimension embeddings and FAILS LOUDLY
    otherwise — a null/ragged column whose total length happens to divide
    the row count would otherwise silently misalign every subsequent row."""
    col = t["embedding"].combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if col.null_count:
        raise ValueError("embedding column contains nulls")
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if lengths.min() != lengths.max():
        raise ValueError(
            f"ragged embedding lists (dims {lengths.min()}..{lengths.max()})"
        )
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(n, int(lengths[0]))


def brute_force_topk(
    sf_dir: str, query_ids: list[int], k: int = 10, table: str = "embeddings"
) -> pa.Table:
    """Exact top-k by cosine for each query id (excluding the query itself).
    Output: (query_id, vec_id, rank)."""
    emb = read_table(sf_dir, table, columns=["vec_id", "embedding"])
    want = pa.array(sorted(set(query_ids)), pa.int64())
    qrows = emb.map_batches(
        lambda t: t.filter(pc.is_valid(pc.index_in(t["vec_id"], value_set=want))),
        batch_format="pyarrow",
    ).take_all()
    qid_order = [r["vec_id"] for r in qrows]
    Q = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put((qid_order, Q))

    partials = emb.map_batches(
        PartialTopK, fn_constructor_kwargs={"ref": q_ref, "k": k},
        batch_format="pyarrow", concurrency=(1, 4),
    ).take_all()  # n_blocks * n_queries * k rows — small
    return _merge_partials(partials, k)


class PartialTopK:
    """Per-block top-k against every broadcast query (combiner: only k rows
    per query leave each block). Tie-break is (sim DESC, vec_id ASC) at BOTH
    the block truncation and the global merge — block-position tie-breaking
    could drop the globally tie-preferred vec_id.

    ``probe_ref`` (optional, the IVF path): broadcast ``{qid: set(buckets)}``;
    rows outside a query's probed buckets are excluded for that query (the
    block must then carry a ``bucket`` column)."""

    def __init__(self, ref, k, probe_ref=None) -> None:
        self.qids, self.Q = ray.get(ref)
        self.k = k
        self.probe = ray.get(probe_ref) if probe_ref is not None else None

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _matrix(t)
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ self.Q.T  # (rows, n_queries)
        buckets = (
            t["bucket"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            if self.probe is not None
            else None
        )
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            mask = ids != qid
            if buckets is not None:
                mask &= np.isin(buckets, list(self.probe[qid]))
            cids, csims = ids[mask], col[mask]
            top = np.lexsort((cids, -csims))[: self.k]
            out_q.extend([qid] * len(top))
            out_v.extend(cids[top].tolist())
            out_s.extend(csims[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _merge_partials(partials: list[dict], k: int) -> pa.Table:
    """Driver merge of per-block top-k rows: (sim DESC, vec_id ASC) -> rank."""
    rows = []
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(r["query_id"], []).append((r["sim"], r["vec_id"]))
    for qid in sorted(by_q):
        cand = sorted(by_q[qid], key=lambda x: (-x[0], x[1]))[:k]
        for rank, (_, vid) in enumerate(cand, 1):
            rows.append((qid, vid, rank))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _kmeans_lite(
    sample: np.ndarray, nlist: int, iters: int = 8, seed: int = 11
) -> np.ndarray:
    """Deterministic k-means on normalized vectors (fixed seed + iteration
    count; empty clusters re-seeded deterministically)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
            else:
                # deterministic re-seed: a dead centroid wastes probe slots
                cent[c] = sample[c % len(sample)]
    return cent


def ivf_topk(
    sf_dir: str,
    query_ids: list[int],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    table: str = "embeddings",
) -> pa.Table:
    """IVF approximate top-k: bucket by nearest centroid, probe nprobe
    buckets per query. Output (query_id, vec_id, rank)."""
    emb = read_table(sf_dir, table, columns=["vec_id", "embedding"])

    # train centroids on a deterministic sample (driver-side, small)
    sample_rows = emb.limit(2048).take_all()
    S = np.asarray([r["embedding"] for r in sample_rows], dtype=np.float64)
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    cent = _kmeans_lite(S, nlist)
    cent_ref = ray.put(cent)

    want = pa.array(sorted(set(query_ids)), pa.int64())
    qrows = emb.map_batches(
        lambda t: t.filter(pc.is_valid(pc.index_in(t["vec_id"], value_set=want))),
        batch_format="pyarrow",
    ).take_all()
    q_by_id = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in qrows
    }

    class AssignBucket:
        def __init__(self, ref) -> None:
            self.cent = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _matrix(t)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            buckets = np.argmax(m @ self.cent.T, axis=1)
            return t.append_column("bucket", pa.array(buckets, pa.int32()))

    bucketed = emb.map_batches(
        AssignBucket, fn_constructor_kwargs={"ref": cent_ref},
        batch_format="pyarrow", concurrency=(1, 4),
    )

    # probe set per query
    probe: dict[int, set[int]] = {}
    qid_order = sorted(q_by_id)
    Q = np.asarray([q_by_id[qid] for qid in qid_order], dtype=np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    for qid, qn in zip(qid_order, Q):
        order = np.argsort(-(cent @ qn), kind="stable")[:nprobe]
        probe[qid] = set(int(x) for x in order)
    all_probed = set().union(*probe.values()) if probe else set()
    probed_ref = ray.put(all_probed)
    q_ref = ray.put((qid_order, Q))
    probe_ref = ray.put(probe)

    class KeepProbed:
        def __init__(self, ref) -> None:
            self.keep = pa.array(sorted(ray.get(ref)), pa.int32())

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(
                pc.is_valid(pc.index_in(t["bucket"], value_set=self.keep))
            )

    # per-block top-k combiner within the probed buckets (same pattern as the
    # brute-force path) — only k rows per (block, query) reach the driver;
    # probed-bucket vectors are never materialized
    partials = (
        bucketed.map_batches(
            KeepProbed, fn_constructor_kwargs={"ref": probed_ref},
            batch_format="pyarrow", concurrency=(1, 2),
        )
        .map_batches(
            PartialTopK,
            fn_constructor_kwargs={"ref": q_ref, "k": k, "probe_ref": probe_ref},
            batch_format="pyarrow", concurrency=(1, 4),
        )
        .take_all()
    )
    return _merge_partials(partials, k)


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means (integer-exact)
# ---------------------------------------------------------------------------
# Unlike _kmeans_lite (a driver-side sample trainer for IVF), this is FULL
# Lloyd's over the whole corpus: each iteration is one streaming pass —
# broadcast centroids via ray.put, per-block int64 partial (count, sum)
# combiner, then a driver merge of (blocks x K) tiny rows. No corpus-sized
# driver state; the corpus is read, never materialized.
#
# Determinism contract (NOTES invariant 2): embeddings are quantized to
# int64 at _KM_QUANT, so distances, partial sums and floor-divided centroid
# updates are exact integers — the result is bit-identical regardless of
# block order or parallelism, which float accumulation cannot promise, and
# the sequential golden (goldens._seq_kmeans) reproduces it exactly.

_KM_QUANT = 1 << 20


def km_quantize(mat: np.ndarray) -> np.ndarray:
    """float embedding matrix -> int64 fixed-point (shared with the golden)."""
    return np.rint(mat * _KM_QUANT).astype(np.int64)


def km_assign(q: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(rows, dim) int64 x (K, dim) int64 -> (cluster ids, squared dists),
    ties to the smallest cluster id (np.argmin order). Exact int64: the
    expansion ||q||^2 - 2 q.c + ||c||^2 stays within ~2^43 for unit-norm-ish
    embeddings at _KM_QUANT."""
    qq = np.einsum("ij,ij->i", q, q)
    cc = np.einsum("ij,ij->i", cent, cent)
    d = qq[:, None] - 2 * (q @ cent.T) + cc[None, :]
    cl = np.argmin(d, axis=1)
    return cl, d[np.arange(len(q)), cl]


def kmeans_assign(sf_dir: str, k: int = 8, iters: int = 5):
    """Distributed Lloyd's k-means over the embeddings table: K deterministic
    seeds (the K smallest vec_ids), ``iters`` full passes, then a final
    assignment pass emitting (vec_id, cluster, dist2). Empty clusters keep
    their previous centroid (deterministic, no re-seeding RNG)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    seeds = ds.filter(expr=f"vec_id < {k}").take_all()
    seeds.sort(key=lambda r: r["vec_id"])
    cent = km_quantize(np.array([r["embedding"] for r in seeds], np.float64))

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            q = km_quantize(_matrix(t))
            cl, _ = km_assign(q, c)
            rows_c, rows_n, rows_s = [], [], []
            for j in np.unique(cl):
                sel = q[cl == j]
                rows_c.append(int(j))
                rows_n.append(len(sel))
                rows_s.append(sel.sum(axis=0).tolist())
            return pa.table(
                {
                    "cluster": pa.array(rows_c, pa.int64()),
                    "n": pa.array(rows_n, pa.int64()),
                    "s": pa.array(rows_s, pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        counts = np.zeros(k, np.int64)
        sums = np.zeros_like(cent)
        for r in parts:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["s"], np.int64)
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = sums[nz] // counts[nz, None]  # exact floor mean

    ref = ray.put(cent)

    def assign(t: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        q = km_quantize(_matrix(t))
        cl, d = km_assign(q, c)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(cl, pa.int64()),
                "dist2": pa.array(d, pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow").sort("vec_id")
