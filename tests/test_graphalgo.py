"""Fixed-point PageRank (pipelines/graphalgo.py): hand-computed tiny graphs,
invariants, and distributed-vs-sequential-golden parity at sf0.001."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_pagerank
from agenticknowledgegraphconstructionsystem_ray.pipelines import graphalgo

SF = "/root/testdata/sf0.001"


def _nodes(ids):
    return pa.table({"entity_id": pa.array(ids, pa.int64())})


def _edges(pairs):
    return pa.table(
        {
            "subj_id": pa.array([p[0] for p in pairs], pa.int64()),
            "obj_id": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )


class TestSequentialKernel:
    def test_two_node_cycle_symmetric(self):
        t = _seq_pagerank(_nodes([0, 1]), _edges([(0, 1), (1, 0)]))
        ranks = dict(zip(t["entity_id"].to_pylist(), t["rank_fp"].to_pylist()))
        # symmetric cycle: equal ranks, full mass retained (no dangling)
        assert ranks[0] == ranks[1]

    def test_star_sink_dominates(self):
        # 1,2,3 all point at 0; 0 is dangling
        t = _seq_pagerank(_nodes([0, 1, 2, 3]), _edges([(1, 0), (2, 0), (3, 0)]))
        ranks = dict(zip(t["entity_id"].to_pylist(), t["rank_fp"].to_pylist()))
        assert ranks[0] > ranks[1] == ranks[2] == ranks[3]
        # spokes hold only the teleport base after round 1
        assert ranks[1] == graphalgo.PR_BASE

    def test_duplicate_edges_collapse(self):
        once = _seq_pagerank(_nodes([0, 1]), _edges([(0, 1)]))
        dup = _seq_pagerank(_nodes([0, 1]), _edges([(0, 1)] * 5))
        assert once.equals(dup)

    def test_unlinked_edges_ignored(self):
        base = _seq_pagerank(_nodes([0, 1]), _edges([(0, 1)]))
        noisy = _seq_pagerank(
            _nodes([0, 1]), _edges([(0, 1), (-1, 0), (1, -1)])
        )
        assert base.equals(noisy)

    def test_isolated_node_keeps_base(self):
        t = _seq_pagerank(_nodes([0, 1, 9]), _edges([(0, 1)]))
        ranks = dict(zip(t["entity_id"].to_pylist(), t["rank_fp"].to_pylist()))
        assert ranks[9] == graphalgo.PR_BASE


class TestDistributedParity:
    def test_matches_sequential_on_random_graph(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(11)
        n = 60
        pairs = [
            (int(rng.integers(0, n)), int(rng.integers(0, n)))
            for _ in range(400)
        ]
        nodes_t, edges_t = _nodes(list(range(n))), _edges(pairs)
        seq = _seq_pagerank(nodes_t, edges_t)
        dist = (
            graphalgo.pagerank(
                rd.from_arrow(edges_t), rd.from_arrow(nodes_t)
            )
            .to_pandas()
        )
        assert dist["entity_id"].tolist() == seq["entity_id"].to_pylist()
        assert dist["rank_fp"].tolist() == seq["rank_fp"].to_pylist()

    def test_kg_pagerank_matches_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray import goldens

        d = goldens.ensure_kg_golden(sf=0.001)
        ref = pq.read_table(os.path.join(d, "pagerank.parquet"))
        mine = graphalgo.kg_pagerank(SF).to_pandas()
        assert mine["entity_id"].tolist() == ref["entity_id"].to_pylist()
        assert mine["rank_fp"].tolist() == ref["rank_fp"].to_pylist()


class TestComponents:
    def test_kg_components_matches_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray import goldens

        d = goldens.ensure_kg_golden(sf=0.001)
        ref = pq.read_table(os.path.join(d, "components.parquet"))
        mine = graphalgo.kg_components(SF).to_pandas()
        assert mine["entity_id"].tolist() == ref["entity_id"].to_pylist()
        assert mine["component"].tolist() == ref["component"].to_pylist()
        # component invariants: label is a member id and the minimum of its
        # component
        grp = mine.groupby("component")["entity_id"].min()
        assert (grp.index == grp.values).all()
