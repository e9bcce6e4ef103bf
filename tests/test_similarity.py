"""Similarity search: brute-force exactness (vs in-process numpy oracle) and
IVF recall/determinism."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from agenticknowledgegraphconstructionsystem_ray.stages import similarity

SF = "/root/testdata/sf0.001"


def _numpy_oracle(k=10, qids=(0, 1, 2)):
    t = pq.read_table(glob.glob(f"{SF}/embeddings.parquet")[0])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for q in qids:
        qv = m[ids == q][0]
        sims = m @ qv
        mask = ids != q
        order = np.lexsort((ids[mask], -sims[mask]))[:k]
        out[q] = [int(ids[mask][j]) for j in order]
    return out


def test_brute_force_matches_oracle():
    res = similarity.brute_force_topk(SF, query_ids=[0, 1, 2], k=10).to_pydict()
    oracle = _numpy_oracle()
    for q in (0, 1, 2):
        got = [
            v for qq, v, r in sorted(
                zip(res["query_id"], res["vec_id"], res["rank"]),
                key=lambda x: (x[0], x[2]),
            )
            if qq == q
        ]
        assert got == oracle[q], q


def test_ivf_recall_and_determinism():
    brute = similarity.brute_force_topk(SF, query_ids=[0, 1, 2], k=10).to_pydict()
    ivf1 = similarity.ivf_topk(SF, query_ids=[0, 1, 2], k=10, nlist=8, nprobe=4).to_pydict()
    ivf2 = similarity.ivf_topk(SF, query_ids=[0, 1, 2], k=10, nlist=8, nprobe=4).to_pydict()
    assert ivf1 == ivf2  # deterministic across runs
    recalls = []
    for q in (0, 1, 2):
        b = {v for qq, v in zip(brute["query_id"], brute["vec_id"]) if qq == q}
        a = {v for qq, v in zip(ivf1["query_id"], ivf1["vec_id"]) if qq == q}
        recalls.append(len(a & b) / len(b))
    # probing half the lists on unclustered data: expect decent recall
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_full_probe_equals_brute():
    brute = similarity.brute_force_topk(SF, query_ids=[5], k=5).to_pydict()
    full = similarity.ivf_topk(SF, query_ids=[5], k=5, nlist=4, nprobe=4).to_pydict()
    assert full["vec_id"] == brute["vec_id"]


@pytest.mark.parametrize("n,k", [(3, 2)])
def test_kmeans_lite_deterministic(n, k):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 8))
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    c1 = similarity._kmeans_lite(x, k)
    c2 = similarity._kmeans_lite(x, k)
    assert np.array_equal(c1, c2)


def test_matrix_rejects_nulls_and_ragged():
    import pyarrow as pa
    import pytest as _pt

    from agenticknowledgegraphconstructionsystem_ray.stages.similarity import _matrix

    with _pt.raises(ValueError, match="null"):
        _matrix(pa.table({"embedding": pa.array([[1.0, 2.0], None, [3.0, 4.0]])}))
    with _pt.raises(ValueError, match="ragged"):
        _matrix(pa.table({"embedding": pa.array([[1.0, 2.0], [3.0, 4.0, 5.0, 6.0]])}))
    m = _matrix(pa.table({"embedding": pa.array([[1.0, 2.0], [3.0, 4.0]])}))
    assert m.shape == (2, 2) and m[1, 0] == 3.0


class TestKMeans:
    def test_assignment_properties(self, ray_session):
        import numpy as np

        from agenticknowledgegraphconstructionsystem_ray.stages import similarity as sim

        out = sim.kmeans_assign("/root/testdata/sf0.001", k=8, iters=3).to_pandas()
        assert len(out) == 500
        assert set(out["cluster"]) <= set(range(8))
        assert (out["dist2"] >= 0).all()
        # multiple clusters actually used on random data
        assert out["cluster"].nunique() > 1

    def test_integer_kernel_deterministic_under_blocking(self):
        import numpy as np

        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            km_assign,
            km_quantize,
        )

        rng = np.random.default_rng(3)
        m = rng.normal(0, 0.3, (200, 16))
        q = km_quantize(m)
        cent = q[:4].copy()
        # summing per-cluster in any block split gives identical int sums
        cl, _ = km_assign(q, cent)
        full = np.stack([q[cl == j].sum(axis=0) for j in range(4)])
        split = np.zeros_like(full)
        for lo, hi in ((0, 67), (67, 131), (131, 200)):
            cls, _ = km_assign(q[lo:hi], cent)
            for j in range(4):
                split[j] += q[lo:hi][cls == j].sum(axis=0)
        assert np.array_equal(full, split)


def test_pq_matches_sequential_golden():
    from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_pq

    got = similarity.pq_topk(SF)
    want = _seq_pq(SF)
    assert got.equals(want)


def test_pq_recall_and_self_retrieval():
    brute = similarity.brute_force_topk(SF, query_ids=[0, 1, 2], k=10).to_pydict()
    pqr = similarity.pq_topk(SF).to_pydict()
    recalls = []
    for q in (0, 1, 2):
        b = {v for qq, v in zip(brute["query_id"], brute["vec_id"]) if qq == q}
        a = {v for qq, v in zip(pqr["query_id"], pqr["vec_id"]) if qq == q}
        recalls.append(len(a & b) / len(b))
    # 16 centroids x 4 subspaces on random data: coarse but useful recall
    assert sum(recalls) / len(recalls) >= 0.3, recalls
    # every query retrieves SOMETHING and ranks are 0..k-1 per query
    for q in (0, 1, 2):
        ranks = [r for qq, r in zip(pqr["query_id"], pqr["rank"]) if qq == q]
        assert ranks == list(range(len(ranks))) and len(ranks) == 10


def test_pq_codes_bounded():
    import pyarrow.parquet as pq_

    from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
        PQ_K,
        PQ_M,
        km_quantize,
        pq_encode,
    )

    t = pq_.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    mat = km_quantize(np.asarray(t["embedding"].to_pylist(), np.float64))
    cents = np.stack(
        [mat[:PQ_K, j * 16 : (j + 1) * 16].copy() for j in range(PQ_M)]
    )
    codes = pq_encode(mat, cents)
    assert codes.shape == (len(mat), PQ_M)
    assert codes.min() >= 0 and codes.max() < PQ_K


class TestSemDeDup:
    def test_kernel_identical_vectors_keep_first(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            semdedup_group_kernel,
        )

        mat = np.tile(np.array([1.0, 2.0, 3.0]), (4, 1))
        keep = semdedup_group_kernel(np.arange(4, dtype=np.int64), mat)
        assert keep.tolist() == [True, False, False, False]

    def test_kernel_greedy_earlier_kept_semantics(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            semdedup_group_kernel,
        )

        # b is near a (dropped); c is near b but NOT near a -> c kept,
        # because dropped members don't suppress later ones
        a = np.array([1.0, 0.0])
        b = np.array([np.cos(0.9), np.sin(0.9)])   # cos(a,b) ~= 0.62 >= tau
        c = np.array([np.cos(1.8), np.sin(1.8)])   # cos(a,c) ~= -0.23 < tau
        keep = semdedup_group_kernel(
            np.arange(3, dtype=np.int64), np.stack([a, b, c]), tau=0.3
        )
        assert keep.tolist() == [True, False, True]

    def test_matches_sequential_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_semdedup

        got = similarity.semdedup(SF).to_pandas()
        want = _seq_semdedup(SF).to_pandas()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_smallest_id_of_each_dup_set_survives(self, ray_session):
        got = similarity.semdedup(SF).to_pandas()
        # every cluster keeps its smallest vec_id unconditionally
        first = got.sort_values("vec_id").groupby("cluster").first()
        assert first["keep"].all()


class TestPQRerank:
    def test_matches_sequential_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.goldens import (
            _seq_pq_rerank,
        )

        got = similarity.pq_rerank_topk(SF)
        want = _seq_pq_rerank(SF)
        assert got.equals(want)

    def test_recall_not_worse_than_pq(self, ray_session):
        brute = similarity.brute_force_topk(
            SF, query_ids=[0, 1, 2], k=10
        ).to_pydict()
        pq_only = similarity.pq_topk(SF).to_pydict()
        rr = similarity.pq_rerank_topk(SF).to_pydict()

        def recall(res):
            tot = 0.0
            for q in (0, 1, 2):
                b = {
                    v
                    for qq, v in zip(brute["query_id"], brute["vec_id"])
                    if qq == q
                }
                a = {
                    v
                    for qq, v in zip(res["query_id"], res["vec_id"])
                    if qq == q
                }
                tot += len(a & b) / len(b)
            return tot / 3

        assert recall(rr) >= recall(pq_only)

    def test_ranks_dense_per_query(self, ray_session):
        rr = similarity.pq_rerank_topk(SF).to_pydict()
        for q in (0, 1, 2):
            ranks = [
                r for qq, r in zip(rr["query_id"], rr["rank"]) if qq == q
            ]
            assert ranks == list(range(1, len(ranks) + 1))
            assert len(ranks) == 10


class TestRrfFusion:
    def test_kernel_fuses_and_ranks(self):
        import pyarrow as pa

        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            RRF_K0,
            rrf_fuse_kernel,
        )

        l1 = pa.table(
            {
                "query_id": pa.array([0, 0], pa.int64()),
                "vec_id": pa.array([10, 11], pa.int64()),
                "rank": pa.array([1, 2], pa.int64()),
            }
        )
        l2 = pa.table(
            {
                "query_id": pa.array([0, 0], pa.int64()),
                "vec_id": pa.array([11, 12], pa.int64()),
                "rank": pa.array([1, 2], pa.int64()),
            }
        )
        out = rrf_fuse_kernel([l1, l2], k=3).to_pandas().set_index("vec_id")
        # 11 appears in both lists -> highest fused score
        assert out.index.tolist()[0] == 11 or out.loc[11, "rank"] == 1
        s1 = 1_000_000 // (RRF_K0 + 1)
        s2 = 1_000_000 // (RRF_K0 + 2)
        assert out.loc[11, "rrf_ppm"] == s2 + s1
        assert out.loc[10, "rrf_ppm"] == s1
        assert out.loc[12, "rrf_ppm"] == s2
        # tie between 10 (s1) and 12 (s2): s1 > s2 so 10 ranks above 12
        assert out.loc[10, "rank"] < out.loc[12, "rank"]

    def test_rrf_contains_exact_top1(self, ray_session):
        """The exact scan's #1 neighbor always survives fusion (it holds
        the max single-list score and can only gain)."""
        from agenticknowledgegraphconstructionsystem_ray.stages import similarity

        sf = "/root/testdata/sf0.001"
        exact = similarity.brute_force_topk(sf, [0, 1, 2], k=10).to_pandas()
        fused = similarity.rrf_topk(sf, [0, 1, 2], k=10).to_pandas()
        for qid in (0, 1, 2):
            top1 = exact.loc[
                (exact["query_id"] == qid) & (exact["rank"] == 1), "vec_id"
            ].iloc[0]
            assert top1 in set(
                fused.loc[fused["query_id"] == qid, "vec_id"]
            )


class TestLshTopk:
    def test_codes_norm_invariant_and_bounded(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            LSH_BITS,
            lsh_codes,
            lsh_planes,
        )

        rng = np.random.default_rng(5)
        m = rng.normal(size=(50, 16))
        planes = lsh_planes(16)
        c1 = lsh_codes(m, planes)
        c2 = lsh_codes(m / np.linalg.norm(m, axis=1, keepdims=True), planes)
        assert np.array_equal(c1, c2)  # sign codes ignore row norms
        assert c1.min() >= 0 and c1.max() < (1 << LSH_BITS)
        assert len(lsh_codes(np.zeros((0, 16)), planes)) == 0

    def test_matches_sequential_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.goldens import (
            _seq_lsh_topk,
        )

        got = similarity.lsh_topk(SF)
        want = _seq_lsh_topk(SF)
        assert got.equals(want)

    def test_deterministic_and_ranks_dense(self, ray_session):
        r1 = similarity.lsh_topk(SF).to_pydict()
        r2 = similarity.lsh_topk(SF).to_pydict()
        assert r1 == r2
        for q in (0, 1, 2):
            ranks = [r for qq, r in zip(r1["query_id"], r1["rank"]) if qq == q]
            assert ranks == list(range(1, len(ranks) + 1))

    def test_full_probe_equals_brute(self, ray_session):
        """With 1 bit, Hamming-1 probing covers BOTH buckets — the LSH path
        must then reproduce the exact scan."""
        brute = similarity.brute_force_topk(SF, query_ids=[5], k=5).to_pydict()
        full = similarity.lsh_topk(SF, query_ids=[5], k=5, nbits=1).to_pydict()
        assert full["vec_id"] == brute["vec_id"]


class TestKnn:
    def test_vote_majority_and_tiebreak(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            knn_vote,
        )

        assert knn_vote([3, 1, 3, 2, 3]) == (3, 3)
        assert knn_vote([2, 1, 2, 1]) == (1, 2)  # tie -> smallest label
        assert knn_vote([7]) == (7, 1)

    def test_matches_sequential_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_knn
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            knn_classify,
        )

        got = knn_classify(SF)
        want = _seq_knn(SF)
        assert got.equals(want)

    def test_shape_and_vote_bounds(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            KNN_K,
            KNN_QUERIES,
            knn_classify,
        )

        out = knn_classify(SF).to_pydict()
        assert out["query_id"] == sorted(set(KNN_QUERIES))
        assert all(1 <= v <= KNN_K for v in out["votes"])


class TestRidge:
    def test_partials_additive_under_blocking(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            ridge_partial,
        )

        rng = np.random.default_rng(11)
        m = rng.normal(0, 1.2, (250, 6))
        y = rng.integers(0, 10, 250)
        full = ridge_partial(m, y)
        parts = [ridge_partial(m[lo:hi], y[lo:hi]) for lo, hi in
                 ((0, 93), (93, 170), (170, 250))]
        assert sum(p[0] for p in parts) == full[0]
        assert np.array_equal(sum(p[1] for p in parts), full[1])
        assert np.array_equal(sum(p[2] for p in parts), full[2])
        assert np.array_equal(sum(p[3] for p in parts), full[3])
        assert sum(p[4] for p in parts) == full[4]
        assert sum(p[5] for p in parts) == full[5]

    def test_recovers_planted_linear_signal(self):
        """On y = 3*x0 - 2*x1 + 1 (+0 noise), the fit recovers the plant."""
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            ridge_partial,
            ridge_solve_ppm,
        )

        rng = np.random.default_rng(4)
        m = rng.normal(0, 1.0, (2000, 3))
        y = np.rint(3 * m[:, 0] - 2 * m[:, 1] + 1).astype(np.int64)
        n, sx, xtx, xty, sy, sy2 = ridge_partial(m, y)
        xtx_obj = np.asarray(
            [int(x) for x in xtx.reshape(-1)], dtype=object
        ).reshape(xtx.shape)
        out = ridge_solve_ppm(
            n, [int(v) for v in sx], xtx_obj, [int(v) for v in xty], sy, sy2
        ).to_pydict()
        got = dict(zip(out["name"], out["value_ppm"]))
        assert abs(got["coef_00"] - 3_000_000) < 100_000
        assert abs(got["coef_01"] + 2_000_000) < 100_000
        assert abs(got["coef_02"]) < 100_000
        assert abs(got["intercept"] - 1_000_000) < 100_000
        assert got["r2"] > 900_000  # rounding noise only

    def test_matches_sequential_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_ridge
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            ridge_fit,
        )

        got = ridge_fit(SF)
        want = _seq_ridge(SF)
        assert got.equals(want)


class TestPcaVar:
    def test_partials_additive_under_blocking(self):
        """Integer moment partials merge exactly: any block split sums to
        the full-matrix partial (the distributed-determinism invariant)."""
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            pca_partial,
        )

        rng = np.random.default_rng(9)
        m = rng.normal(0, 1.5, (300, 8))
        n_full, s_full, o_full = pca_partial(m)
        n_sum, s_sum, o_sum = 0, np.zeros(8, np.int64), np.zeros((8, 8), np.int64)
        for lo, hi in ((0, 71), (71, 200), (200, 300)):
            n, s, o = pca_partial(m[lo:hi])
            n_sum += n
            s_sum += s
            o_sum += o
        assert n_sum == n_full
        assert np.array_equal(s_sum, s_full)
        assert np.array_equal(o_sum, o_full)

    def test_matches_sequential_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_pca
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            pca_explained_var,
        )

        got = pca_explained_var(SF)
        want = _seq_pca(SF)
        assert got.equals(want)

    def test_spectrum_properties(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.stages.similarity import (
            pca_explained_var,
        )

        out = pca_explained_var(SF).to_pydict()
        v = out["var_ppm"]
        assert v == sorted(v, reverse=True)  # eigenvalues descending
        assert all(x >= 0 for x in v)
        assert out["cum_ppm"][-1] <= 1_000_000
        assert out["component"] == list(range(1, len(v) + 1))


class TestIVFPQRerank:
    def test_matches_sequential_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.goldens import (
            _seq_ivfpq_rerank,
        )
        from agenticknowledgegraphconstructionsystem_ray.stages import similarity

        sf = "/root/testdata/sf0.001"
        got = similarity.ivfpq_rerank_topk(sf).to_pandas()
        want = _seq_ivfpq_rerank(sf).to_pandas()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_self_excluded_and_ranked(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.stages import similarity

        got = similarity.ivfpq_rerank_topk("/root/testdata/sf0.001").to_pandas()
        assert not ((got.query_id == got.vec_id).any())
        for _, g in got.groupby("query_id"):
            assert list(g["rank"]) == list(range(1, len(g) + 1))


class TestQuantizeInt8:
    def _seq(self):
        t = pq.read_table(glob.glob(f"{SF}/embeddings.parquet")[0])
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        xfp = similarity.qz_fixed(m)
        mn, mx = xfp.min(axis=0), xfp.max(axis=0)
        err = similarity.qz_roundtrip_err(xfp, mn, mx)
        return xfp, mn, mx, err

    def test_matches_sequential_recompute(self, ray_session):
        out = similarity.quantize_int8_stats(SF).to_pydict()
        xfp, mn, mx, err = self._seq()
        assert out["min_fp"] == mn.tolist()
        assert out["max_fp"] == mx.tolist()
        assert out["sum_abs_err"] == err.sum(axis=0).tolist()
        assert out["max_err"] == err.max(axis=0).tolist()
        assert set(out["n_vals"]) == {xfp.shape[0]}

    def test_error_bound(self, ray_session):
        # floor-code/floor-dequant round trip loses at most
        # scale//255 + 1 fixed-point units per element
        out = similarity.quantize_int8_stats(SF).to_pydict()
        for lo, hi, me in zip(out["min_fp"], out["max_fp"], out["max_err"]):
            assert me <= (hi - lo) // similarity.QZ_LEVELS + 1

    def test_kernel_blocking_invariance(self):
        # per-block min/max + error partials merge to the single-block
        # answer: the aggregation is associative by construction
        rng = np.random.default_rng(7)
        m = rng.normal(size=(40, 5))
        xfp = similarity.qz_fixed(m)
        mn, mx = xfp.min(axis=0), xfp.max(axis=0)
        whole = similarity.qz_roundtrip_err(xfp, mn, mx)
        parts = [similarity.qz_roundtrip_err(b, mn, mx)
                 for b in np.array_split(xfp, 4)]
        assert np.concatenate(parts).sum(axis=0).tolist() == \
            whole.sum(axis=0).tolist()

    def test_constant_dim_zero_error(self):
        xfp = np.asarray([[5, 1], [5, 2], [5, 9]], dtype=np.int64)
        err = similarity.qz_roundtrip_err(
            xfp, xfp.min(axis=0), xfp.max(axis=0))
        assert err[:, 0].tolist() == [0, 0, 0]


class TestAnnRecall:
    def test_report_shape_and_rerank_dominance(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.pipelines import training

        t = training.ann_recall(SF).to_pydict()
        assert len(t["method"]) == 5 * 3
        assert all(0 <= r <= 1_000_000 for r in t["recall_ppm"])
        assert all(
            r == h * 1_000_000 // k
            for r, h, k in zip(t["recall_ppm"], t["hits"], t["k"])
        )
        by = {}
        for m, q, h in zip(t["method"], t["query_id"], t["hits"]):
            by[(m, q)] = h
        # exact re-ranking keeps every truth member the shortlist caught,
        # so its recall dominates code-only scoring of the same shortlist
        for q in (0, 1, 2):
            assert by[("pq_rerank", q)] >= by[("pq", q)]
