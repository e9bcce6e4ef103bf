"""Scale utilities: salted two-level aggregation must equal a direct
groupby; driverless label propagation must equal UnionFind components."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def test_salted_aggregate_matches_direct_groupby(_ray):
    from ray.data.aggregate import Count, Max, Min, Sum

    from agenticknowledgegraphconstructionsystem_ray.stages.salted import (
        salted_aggregate,
    )

    rng = np.random.default_rng(3)
    # Zipf-ish skew: one hot key dominating
    keys = np.where(rng.random(20000) < 0.6, 0, rng.integers(1, 50, 20000))
    vals = rng.integers(-100, 100, 20000)
    ds = rd.from_arrow(
        pa.table(
            {"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())}
        )
    )
    salted = (
        salted_aggregate(
            ds, "k",
            {"n": ("v", "count"), "s": ("v", "sum"),
             "lo": ("v", "min"), "hi": ("v", "max")},
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    direct = (
        ds.groupby("k")
        .aggregate(
            Count(alias_name="n"), Sum("v", alias_name="s"),
            Min("v", alias_name="lo"), Max("v", alias_name="hi"),
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for c in ["k", "n", "s", "lo", "hi"]:
        assert (salted[c].astype("int64") == direct[c].astype("int64")).all(), c


def test_salted_count_counts_rows_with_nulls(_ray):
    """'count' must count ROWS like ray.data Count(), including rows whose
    value column is null (Arrow's hash count would skip them)."""
    from agenticknowledgegraphconstructionsystem_ray.stages.salted import (
        salted_aggregate,
    )

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 2, 2], pa.int64()),
                "v": pa.array([10, None, None, None, 5], pa.int64()),
            }
        )
    )
    out = (
        salted_aggregate(ds, "k", {"n": ("v", "count")})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [2, 3]


def test_driverless_label_propagation_matches_unionfind(_ray):
    from agenticknowledgegraphconstructionsystem_ray.stages.canonicalize import (
        label_propagation_components_driverless,
    )
    from agenticknowledgegraphconstructionsystem_ray.state.unionfind import (
        UnionFind,
    )

    rng = np.random.default_rng(11)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    # several chains + random extra edges + isolated self-edges
    for base in range(0, 120, 10):
        for i in range(base, base + 9):
            if rng.random() < 0.8:
                edges.append((nodes[i], nodes[i + 1]))
    for _ in range(20):
        a, b = rng.integers(0, 120, 2)
        edges.append((nodes[a], nodes[b]))

    uf = UnionFind()
    for a, b in edges:
        uf.add(a)
        uf.add(b)
        uf.union(a, b)
    expected = {}
    for _, members in uf.components().items():
        rep = min(members)
        for m in members:
            expected[m] = rep

    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in edges]),
                "b": pa.array([e[1] for e in edges]),
            }
        )
    )
    labels = label_propagation_components_driverless(ds)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == expected
