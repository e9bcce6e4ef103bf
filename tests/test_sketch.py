"""HyperLogLog sketch: kernel accuracy, merge algebra, distributed parity."""

import numpy as np

from agenticknowledgegraphconstructionsystem_ray.functions import hll
from agenticknowledgegraphconstructionsystem_ray.stages import sketch

SF = "/root/testdata/sf0.001"


def test_bit_length_exact():
    vals = np.array(
        [0, 1, 2, 3, 4, (1 << 52) - 1, 1 << 52, (1 << 62) - 1, 1 << 62],
        dtype=np.uint64,
    )
    got = hll._bit_length(vals)
    want = [int(v).bit_length() for v in vals.tolist()]
    assert got.tolist() == want  # float log2 gets (1<<52)-1 wrong; this must not


def test_small_range_is_linear_counting_accurate():
    keys = [f"user-{i}" for i in range(150)]
    est = hll.estimate(hll.sketch_of(keys))
    assert abs(est - 150) <= 3  # LC regime: near-exact


def test_large_range_error_within_bounds():
    n = 100_000
    keys = [f"key-{i}" for i in range(n)]
    est = hll.estimate(hll.sketch_of(keys))
    assert abs(est - n) / n < 0.05  # 3 sigma of 1.04/sqrt(4096)


def test_merge_is_order_invariant_and_idempotent():
    a = hll.sketch_of([f"a{i}" for i in range(5000)])
    b = hll.sketch_of([f"b{i}" for i in range(5000)])
    both = hll.sketch_of([f"a{i}" for i in range(5000)] + [f"b{i}" for i in range(5000)])
    m1 = hll.merge(a, b)
    m2 = hll.merge(b, a)
    assert np.array_equal(m1, m2)
    assert np.array_equal(m1, both)  # partition + merge == one-shot
    assert np.array_equal(hll.merge(m1, a), m1)  # idempotent (retry-safe)


def test_distributed_matches_sequential_and_exact(ray_session):
    import pyarrow.parquet as pq

    out = sketch.approx_distinct_users(SF).to_pandas().set_index("event_type")
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    exact: dict[str, set] = {}
    for et, u in zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()):
        exact.setdefault(et, set()).add(u)
    for et, us in exact.items():
        est = int(out.loc[et, "n_users_est"])
        seq = hll.estimate(hll.sketch_of([str(u) for u in sorted(us)]))
        assert est == seq  # distributed == sequential golden, bit-exact
        assert abs(est - len(us)) / len(us) < 0.05


def test_terms_estimate_close_to_exact(ray_session):
    import re

    import pyarrow.parquet as pq

    est = int(sketch.approx_distinct_terms(SF)["n_terms_est"][0].as_py())
    token_re = re.compile(r"[a-z0-9]+")
    toks = set()
    for text in pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist():
        toks.update(token_re.findall(text.lower()))
    assert abs(est - len(toks)) / len(toks) < 0.05


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

from agenticknowledgegraphconstructionsystem_ray.functions import cms


def test_cms_never_undercounts():
    counts = {f"t{i}": (i % 7) + 1 for i in range(5000)}
    m = cms.sketch_of(counts)
    toks = sorted(counts)
    est = cms.estimate(m, toks)
    exact = np.array([counts[t] for t in toks])
    assert (est >= exact).all()
    # total mass is preserved per row
    assert (m.sum(axis=1) == sum(counts.values())).all()


def test_cms_merge_equals_whole():
    a = {f"x{i}": i + 1 for i in range(300)}
    b = {f"x{i}": 2 * i + 1 for i in range(150, 450)}
    whole: dict[str, int] = dict(a)
    for k, v in b.items():
        whole[k] = whole.get(k, 0) + v
    merged = cms.merge(cms.sketch_of(a), cms.sketch_of(b))
    assert (merged == cms.sketch_of(whole)).all()


def test_cms_exact_in_sparse_regime():
    # far fewer tokens than W columns: collisions are unlikely enough that
    # most estimates are exact, and the top term is exact
    counts = {f"term{i}": 100 - i for i in range(50)}
    m = cms.sketch_of(counts)
    est = cms.estimate(m, ["term0"])
    assert est[0] == 100


def test_cms_distributed_matches_golden(ray_session):
    from agenticknowledgegraphconstructionsystem_ray import goldens

    got = sketch.cms_term_counts(SF)
    # independent sequential recompute over the same corpus
    want = goldens._seq_cms(SF)
    assert got.equals(want)
    assert (got["overcount"].to_numpy(zero_copy_only=False) >= 0).all()


class TestSkQuantiles:
    def test_matches_oracle_shape_and_sanity(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.pipelines.training import (
            SKQ_K,
            sk_quantiles,
        )

        out = sk_quantiles("/root/testdata/sf0.001").to_pydict()
        assert out["n_sample"][0] == min(SKQ_K, out["n_rows"][0])
        # quantile monotonicity on both the sketch and the exact path
        assert out["p50_est_c"][0] <= out["p90_est_c"][0] <= out["p99_est_c"][0]
        assert (
            out["p50_exact_c"][0]
            <= out["p90_exact_c"][0]
            <= out["p99_exact_c"][0]
        )
        # hash-rank sample is unbiased enough at K=256/n=1500 for a loose
        # band: estimate within 25% of exact at the median
        p50e, p50x = out["p50_est_c"][0], out["p50_exact_c"][0]
        assert abs(p50e - p50x) <= 0.25 * p50x

    def test_sample_deterministic_across_runs(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.pipelines.training import (
            sk_quantiles,
        )

        a = sk_quantiles("/root/testdata/sf0.001").to_pydict()
        b = sk_quantiles("/root/testdata/sf0.001").to_pydict()
        assert a == b


class TestJoinCardinality:
    def test_estimate_upper_bounds_exact(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.pipelines import training

        t = training.sk_join_cardinality("/root/testdata/sf0.001").to_pylist()[0]
        assert t["est_n"] >= t["exact_n"] > 0
        assert t["over_ppm"] == (t["est_n"] - t["exact_n"]) * 1_000_000 // t["exact_n"]

    def test_exact_matches_duckdb(self, ray_session):
        import duckdb

        from agenticknowledgegraphconstructionsystem_ray.pipelines import training

        sf = "/root/testdata/sf0.001"
        t = training.sk_join_cardinality(sf).to_pylist()[0]
        n = duckdb.connect().execute(
            f"SELECT COUNT(*) FROM read_parquet('{sf}/orders.parquet') o "
            f"JOIN read_parquet('{sf}/customer.parquet') c "
            "ON o.o_custkey = c.c_custkey"
        ).fetchone()[0]
        assert t["exact_n"] == n

    def test_cms_bucket_deterministic(self):
        from agenticknowledgegraphconstructionsystem_ray.pipelines.training import _jc_bucket

        assert _jc_bucket(0, "42") == _jc_bucket(0, "42")
        assert len(_jc_bucket(3, "x")) == 2
