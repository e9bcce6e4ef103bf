"""Gate-boundary parity for the hybrid broadcast/shuffle fast paths.

pagerank / pagerank_weighted / hits pick a broadcast-rank BSP path under
PR_BROADCAST_NODES and a shuffle loop above it; kcore picks a broadcast
frontier filter under its removal-set cap. The two regimes must be
byte-identical on the same graph — the same three-regime proof the hot-map
edge-id application already has. These tests run each algorithm just
below the gate (broadcast) and with the gate forced off (force_shuffle /
broadcast_cap=0 / a monkeypatched cap), asserting exact equality."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from agenticknowledgegraphconstructionsystem_ray.pipelines import graphalgo


def _rand_graph(seed: int, n: int = 80, m: int = 500):
    rng = np.random.default_rng(seed)
    pairs = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(m)]
    edges = pa.table(
        {
            "subj_id": pa.array([p[0] for p in pairs], pa.int64()),
            "obj_id": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    nodes = pa.table({"entity_id": pa.array(list(range(n)), pa.int64())})
    return edges, nodes


def _as_lists(ds):
    df = ds.to_pandas()
    return {c: df[c].tolist() for c in df.columns}


def test_pagerank_broadcast_equals_shuffle(ray_session):
    edges, nodes = _rand_graph(3)
    fast = graphalgo.pagerank(rd.from_arrow(edges), rd.from_arrow(nodes))
    slow = graphalgo.pagerank(rd.from_arrow(edges), rd.from_arrow(nodes),
                              force_shuffle=True)
    assert _as_lists(fast) == _as_lists(slow)


def test_pagerank_gate_constant_is_live(ray_session, monkeypatch):
    """Shrinking the gate below the node count must route through the
    shuffle path and still produce identical output — protects the 2M
    constant from silent drift."""
    edges, nodes = _rand_graph(5)
    fast = graphalgo.pagerank(rd.from_arrow(edges), rd.from_arrow(nodes))
    monkeypatch.setattr(graphalgo, "PR_BROADCAST_NODES", 10)
    gated = graphalgo.pagerank(rd.from_arrow(edges), rd.from_arrow(nodes))
    assert _as_lists(fast) == _as_lists(gated)


def test_pagerank_personalized_broadcast_equals_shuffle(ray_session):
    edges, nodes = _rand_graph(7)
    fast = graphalgo.pagerank(rd.from_arrow(edges), rd.from_arrow(nodes),
                              seed_mod=3)
    slow = graphalgo.pagerank(rd.from_arrow(edges), rd.from_arrow(nodes),
                              seed_mod=3, force_shuffle=True)
    assert _as_lists(fast) == _as_lists(slow)


def test_pagerank_weighted_broadcast_equals_shuffle(ray_session):
    rng = np.random.default_rng(9)
    n = 60
    seen = {}
    for _ in range(400):
        k = (int(rng.integers(0, n)), int(rng.integers(0, n)))
        seen[k] = seen.get(k, 0) + int(rng.integers(1, 5))
    edges = pa.table(
        {
            "subj_id": pa.array([k[0] for k in seen], pa.int64()),
            "obj_id": pa.array([k[1] for k in seen], pa.int64()),
            "w": pa.array(list(seen.values()), pa.int64()),
        }
    )
    nodes = pa.table({"entity_id": pa.array(list(range(n)), pa.int64())})
    fast = graphalgo.pagerank_weighted(rd.from_arrow(edges),
                                       rd.from_arrow(nodes))
    slow = graphalgo.pagerank_weighted(rd.from_arrow(edges),
                                       rd.from_arrow(nodes),
                                       force_shuffle=True)
    assert _as_lists(fast) == _as_lists(slow)


def test_hits_broadcast_equals_shuffle(ray_session):
    edges, nodes = _rand_graph(13)
    fast = graphalgo.hits(rd.from_arrow(edges), rd.from_arrow(nodes))
    slow = graphalgo.hits(rd.from_arrow(edges), rd.from_arrow(nodes),
                          force_shuffle=True)
    assert _as_lists(fast) == _as_lists(slow)


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_broadcast_equals_shuffle(ray_session, k):
    edges, _ = _rand_graph(17, n=50, m=300)
    fast = graphalgo.kcore(rd.from_arrow(edges), k=k)
    slow = graphalgo.kcore(rd.from_arrow(edges), k=k, broadcast_cap=0)
    a, b = _as_lists(fast.sort("entity_id")), _as_lists(slow.sort("entity_id"))
    assert a == b
