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


class TestTriangles:
    def _count(self, pairs):
        t = graphalgo.triangles(rd.from_arrow(_edges(pairs)))
        return {k: t[k][0].as_py() for k in t.column_names}

    def test_k4_has_four_triangles(self, ray_session):
        # K4: all degrees tie at 3, so orientation falls back to id order;
        # out-degrees become 3,2,1,0 -> wedges C(3,2)+C(2,2) = 3+1 = 4,
        # and all 4 close (K4 has C(4,3) = 4 triangles).
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        out = self._count(k4)
        assert out == {"n_edges": 6, "n_wedges": 4, "n_triangles": 4}

    def test_triangle_plus_tail(self, ray_session):
        # triangle 0-1-2 plus tail 2-3: exactly one triangle
        out = self._count([(0, 1), (1, 2), (0, 2), (2, 3)])
        assert out["n_edges"] == 4
        assert out["n_triangles"] == 1

    def test_duplicate_and_reverse_edges_collapse(self, ray_session):
        out = self._count([(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2)])
        assert out["n_edges"] == 3
        assert out["n_triangles"] == 1

    def test_square_no_triangles(self, ray_session):
        # 4-cycle: all degrees 2, id-order orientation -> node0 out-degree 2
        # (to 1 and 3), others <= 1 -> exactly one wedge, and it never closes
        out = self._count([(0, 1), (1, 2), (2, 3), (3, 0)])
        assert out == {"n_edges": 4, "n_wedges": 1, "n_triangles": 0}

    def test_matches_bruteforce_on_random_graph(self, ray_session):
        import itertools
        import random

        rng = random.Random(7)
        nodes = list(range(30))
        pairs = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
                )
                if a != b
            }
        )
        eset = set(pairs)
        brute = sum(
            1
            for x, y, z in itertools.combinations(nodes, 3)
            if (x, y) in eset and (y, z) in eset and (x, z) in eset
        )
        out = self._count(pairs)
        assert out["n_edges"] == len(pairs)
        assert out["n_triangles"] == brute


class TestKCore:
    def _core(self, pairs, k, **kw):
        out = graphalgo.kcore(rd.from_arrow(_edges(pairs)), k=k, **kw)
        if isinstance(out, pa.Table):
            return dict(zip(out["entity_id"].to_pylist(),
                            out["core_deg"].to_pylist()))
        df = out.to_pandas()
        return dict(zip(df["entity_id"], df["core_deg"]))

    def test_triangle_with_tails_is_the_2core(self, ray_session):
        # triangle 0-1-2 with pendant chain 2-3-4: 2-core = the triangle
        out = self._core([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)], k=2)
        assert out == {0: 2, 1: 2, 2: 2}

    def test_chain_peels_to_empty(self, ray_session):
        # a path has no 2-core; peeling takes multiple cascading rounds
        out = self._core([(i, i + 1) for i in range(8)], k=2)
        assert out == {}

    def test_k4_is_its_own_3core(self, ray_session):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        assert self._core(k4, k=3) == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_bucketed_anti_join_path_matches_broadcast(self, ray_session):
        # broadcast_cap=0 forces every round through the distributed
        # coarse-bucket anti-join; results must be identical
        pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
        assert self._core(pairs, k=2, broadcast_cap=0) == self._core(
            pairs, k=2
        )

    def test_matches_bruteforce_on_random_graph(self, ray_session):
        import random

        rng = random.Random(13)
        nodes = list(range(40))
        pairs = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.choice(nodes), rng.choice(nodes)) for _ in range(180)
                )
                if a != b
            }
        )
        k = 5
        edges = set(pairs)
        while True:
            deg = {}
            for a, b in edges:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            low = {n for n, d in deg.items() if d < k}
            if not low:
                break
            edges = {e for e in edges
                     if e[0] not in low and e[1] not in low}
        want = deg if edges else {}
        assert self._core(pairs, k=k) == want

    def test_kg_kcore_matches_golden(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray import goldens

        d = goldens.ensure_kg_golden(sf=0.001)
        ref = pq.read_table(os.path.join(d, "kcore.parquet"))
        out = graphalgo.kg_kcore(SF)
        mine = out.to_pandas() if not isinstance(out, pa.Table) else out.to_pandas()
        assert mine["entity_id"].tolist() == ref["entity_id"].to_pylist()
        assert mine["core_deg"].tolist() == ref["core_deg"].to_pylist()


class TestBFS:
    def test_path_graph_distances(self, ray_session):
        # path 0-1-2-3-4 ... seeds: 0 only (seed_mod larger than max id)
        pairs = [(i, i + 1) for i in range(6)]
        got = graphalgo.bfs_hops(
            rd.from_arrow(_edges(pairs)),
            rd.from_arrow(_nodes(list(range(7)))),
            seed_mod=7,  # only node 0 qualifies
        ).to_pandas()
        assert dict(zip(got.entity_id, got.dist)) == {i: i for i in range(7)}

    def test_multi_seed_takes_nearest(self, ray_session):
        # path 0..8; seeds 0 and 8 -> dist is min(i, 8-i)
        pairs = [(i, i + 1) for i in range(8)]
        got = graphalgo.bfs_hops(
            rd.from_arrow(_edges(pairs)),
            rd.from_arrow(_nodes(list(range(9)))),
            seed_mod=8,  # nodes 0 and 8
        ).to_pandas()
        assert dict(zip(got.entity_id, got.dist)) == {
            i: min(i, 8 - i) for i in range(9)
        }

    def test_unreachable_nodes_omitted(self, ray_session):
        # component {0,1} with seed 0; component {5,6} has no seed
        got = graphalgo.bfs_hops(
            rd.from_arrow(_edges([(0, 1), (5, 6)])),
            rd.from_arrow(_nodes([0, 1, 5, 6])),
            seed_mod=4,  # only 0 qualifies
        ).to_pandas()
        assert dict(zip(got.entity_id, got.dist)) == {0: 0, 1: 1}

    def test_matches_sequential_on_random_graph(self, ray_session):
        import numpy as np

        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_bfs

        rng = np.random.default_rng(7)
        n = 120
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(400, 2))
            if a != b
        ]
        nodes_t, edges_t = _nodes(list(range(n))), _edges(pairs)
        got = graphalgo.bfs_hops(
            rd.from_arrow(edges_t), rd.from_arrow(nodes_t)
        ).to_pandas()
        want = _seq_bfs(nodes_t, edges_t).to_pandas()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


class TestJaccard:
    def test_square_graph(self, ray_session):
        # square 0-1-2-3-0: opposite corners share BOTH neighbors
        got = graphalgo.jaccard_pairs(
            rd.from_arrow(_edges([(0, 1), (1, 2), (2, 3), (3, 0)]))
        ).to_pandas()
        rows = {
            (a, b): (c, j)
            for a, b, c, j in zip(
                got.node_a, got.node_b, got.common, got.jaccard_ppm
            )
        }
        # (0,2) via centers 1 and 3; deg all 2 -> j = 2e6 // (2+2-2) = 1e6
        assert rows == {(0, 2): (2, 1_000_000), (1, 3): (2, 1_000_000)}

    def test_hub_center_excluded(self, ray_session):
        # star center 9 with many leaves: center degree > cap, so leaves
        # share no countable wedge
        leaves = list(range(graphalgo.JC_MAX_DEG + 5))
        got = graphalgo.jaccard_pairs(
            rd.from_arrow(_edges([(9000, x) for x in leaves]))
        ).to_pandas()
        assert len(got) == 0

    def test_min_common_floor(self, ray_session):
        # 0 and 2 share exactly one neighbor (1) -> below JC_MIN_COMMON=2
        got = graphalgo.jaccard_pairs(
            rd.from_arrow(_edges([(0, 1), (1, 2)]))
        ).to_pandas()
        assert len(got) == 0


class TestRandomWalks:
    def test_matches_sequential_on_random_graph(self, ray_session):
        import numpy as np

        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_walks

        rng = np.random.default_rng(11)
        n = 60
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(150, 2))
            if a != b
        ]
        nodes_t, edges_t = _nodes(list(range(n))), _edges(pairs)
        got = graphalgo.random_walks(
            rd.from_arrow(edges_t), rd.from_arrow(nodes_t)
        ).to_pandas()
        want = _seq_walks(nodes_t, edges_t).to_pandas()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_isolated_node_emits_only_step0(self, ray_session):
        got = graphalgo.random_walks(
            rd.from_arrow(_edges([(0, 1)])), rd.from_arrow(_nodes([0, 1, 7]))
        ).to_pandas()
        seven = got[got.start_id == 7]
        assert len(seven) == 1 and seven.iloc[0]["step"] == 0
        # the 0-1 component ping-pongs the full walk length
        assert len(got[got.start_id == 0]) == graphalgo.WALK_LEN + 1

    def test_walk_steps_are_adjacent(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(3)
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, 30, size=(60, 2))
            if a != b
        ]
        und = {(min(a, b), max(a, b)) for a, b in pairs}
        got = graphalgo.random_walks(
            rd.from_arrow(_edges(pairs)), rd.from_arrow(_nodes(list(range(30))))
        ).to_pandas()
        for _, w in got.groupby("start_id"):
            seq = w.sort_values("step")["node_id"].tolist()
            for a, b in zip(seq, seq[1:]):
                assert (min(a, b), max(a, b)) in und


class TestNegativeSampling:
    def test_counts_and_labels(self, ray_session):
        got = graphalgo.negative_samples(
            rd.from_arrow(_edges([(0, 1), (1, 2), (2, 0)])), n_nodes=10
        ).to_pandas()
        # 3 distinct pairs x (1 positive + NEG_K negatives)
        assert len(got) == 3 * (1 + graphalgo.NEG_K)
        pos = got[got.label == 1]
        assert set(zip(pos.src, pos.dst)) == {(0, 1), (1, 2), (0, 2)}
        assert (got[got.label == 0].k >= 0).all()
        assert got.dst.between(0, 9).all()

    def test_deterministic_mix(self, ray_session):
        a = graphalgo.negative_samples(
            rd.from_arrow(_edges([(3, 7), (7, 3), (3, 7)])), n_nodes=50
        ).to_pandas()
        # duplicate/reversed edges collapse to one pair
        assert len(a) == 1 + graphalgo.NEG_K
        negs = a[a.label == 0]
        want = [
            (3 * graphalgo.NEG_MIX_A + 7 * graphalgo.NEG_MIX_B
             + j * graphalgo.NEG_MIX_J) % 50
            for j in range(graphalgo.NEG_K)
        ]
        assert sorted(negs.dst) == sorted(want)


class TestHITS:
    def test_star_authority(self, ray_session):
        # 1,2,3 all point at 0: node 0 is the sole authority,
        # spokes are the (equal) hubs.
        got = graphalgo.hits(
            rd.from_arrow(_edges([(1, 0), (2, 0), (3, 0)])),
            rd.from_arrow(_nodes([0, 1, 2, 3])),
        ).to_pandas()
        by_id = got.set_index("entity_id")
        assert by_id.loc[0, "auth_fp"] == graphalgo.HITS_SCALE
        assert by_id.loc[0, "hub_fp"] == 0
        assert (
            by_id.loc[1, "hub_fp"]
            == by_id.loc[2, "hub_fp"]
            == by_id.loc[3, "hub_fp"]
            == graphalgo.HITS_SCALE
        )
        assert (by_id.loc[[1, 2, 3], "auth_fp"] == 0).all()

    def test_duplicate_edges_collapse(self, ray_session):
        once = graphalgo.hits(
            rd.from_arrow(_edges([(0, 1), (1, 2)])),
            rd.from_arrow(_nodes([0, 1, 2])),
        ).to_pandas()
        dup = graphalgo.hits(
            rd.from_arrow(_edges([(0, 1), (1, 2)] * 4)),
            rd.from_arrow(_nodes([0, 1, 2])),
        ).to_pandas()
        assert once.equals(dup)

    def test_matches_sequential_on_random_graph(self, ray_session):
        import numpy as np

        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_hits

        rng = np.random.default_rng(7)
        n = 50
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(180, 2))
            if a != b
        ]
        nodes_t, edges_t = _nodes(list(range(n))), _edges(pairs)
        got = graphalgo.hits(
            rd.from_arrow(edges_t), rd.from_arrow(nodes_t)
        ).to_pandas()
        want = _seq_hits(nodes_t, edges_t).to_pandas()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_unlinked_ids_ignored(self, ray_session):
        base = graphalgo.hits(
            rd.from_arrow(_edges([(0, 1), (1, 2)])),
            rd.from_arrow(_nodes([0, 1, 2])),
        ).to_pandas()
        noisy = graphalgo.hits(
            rd.from_arrow(_edges([(0, 1), (1, 2), (-1, 0), (1, -1)])),
            rd.from_arrow(_nodes([0, 1, 2])),
        ).to_pandas()
        assert base.equals(noisy)


class TestResourceAllocation:
    def test_two_wedges(self, ray_session):
        # 0 and 2 share centers 1 and 3, each center degree 2
        got = graphalgo.resource_allocation_pairs(
            rd.from_arrow(_edges([(0, 1), (1, 2), (0, 3), (3, 2)]))
        ).to_pandas()
        # the 4-cycle gives TWO pairs with 2 shared centers: (0,2) via
        # centers 1/3 and (1,3) via centers 0/2 — all centers degree 2
        assert list(got.itertuples(index=False, name=None)) == [
            (0, 2, 2, 2 * (graphalgo.RA_SCALE // 2)),
            (1, 3, 2, 2 * (graphalgo.RA_SCALE // 2)),
        ]

    def test_hub_center_excluded(self, ray_session):
        # center 99 connects RA_MAX_DEG+1 spokes (disjoint from 0/1/2):
        # contributes nothing; remaining centers give only common=1
        hub_edges = [
            (99, i) for i in range(100, 100 + graphalgo.RA_MAX_DEG + 1)
        ]
        got = graphalgo.resource_allocation_pairs(
            rd.from_arrow(_edges(hub_edges + [(0, 1), (1, 2)]))
        ).to_pandas()
        assert len(got) == 0

    def test_matches_duckdb_mirror(self, ray_session):
        import duckdb
        import numpy as np

        rng = np.random.default_rng(13)
        n = 40
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(160, 2))
            if a != b
        ]
        edges_t = _edges(pairs)
        got = graphalgo.resource_allocation_pairs(
            rd.from_arrow(edges_t)
        ).to_pandas()
        con = duckdb.connect()
        con.register("e", edges_t)
        want = con.execute(f"""
            WITH pairs AS (
                SELECT DISTINCT LEAST(subj_id, obj_id) AS a,
                                GREATEST(subj_id, obj_id) AS b
                FROM e WHERE subj_id >= 0 AND obj_id >= 0
                  AND subj_id <> obj_id
            ),
            sym AS (
                SELECT a AS src, b AS dst FROM pairs
                UNION ALL SELECT b, a FROM pairs
            ),
            deg AS (
                SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
                FROM sym GROUP BY src
            ),
            wed AS (
                SELECT s1.dst AS u, s2.dst AS v,
                       CAST({graphalgo.RA_SCALE} // dw.deg AS BIGINT) AS w
                FROM sym s1
                JOIN sym s2 ON s1.src = s2.src AND s1.dst < s2.dst
                JOIN deg dw ON dw.node = s1.src
                WHERE dw.deg <= {graphalgo.RA_MAX_DEG}
            )
            SELECT u AS node_a, v AS node_b,
                   CAST(COUNT(*) AS BIGINT) AS common,
                   CAST(SUM(w) AS BIGINT) AS ra_score
            FROM wed GROUP BY u, v
            HAVING COUNT(*) >= {graphalgo.RA_MIN_COMMON}
            ORDER BY ra_score DESC, node_a, node_b
            LIMIT {graphalgo.RA_TOP}
        """).df()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


class TestClusteringCoefficients:
    def test_triangle_graph_all_ones(self, ray_session):
        got = graphalgo.clustering_coefficients(
            rd.from_arrow(_edges([(0, 1), (1, 2), (2, 0)]))
        ).to_pandas()
        assert (got.cc_ppm == graphalgo.CC_SCALE).all()
        assert (got.tri_cnt == 1).all() and (got.deg == 2).all()
        assert sorted(got.entity_id) == [0, 1, 2]

    def test_path_graph_all_zero(self, ray_session):
        got = graphalgo.clustering_coefficients(
            rd.from_arrow(_edges([(0, 1), (1, 2), (2, 3)]))
        ).to_pandas()
        assert (got.cc_ppm == 0).all() and (got.tri_cnt == 0).all()

    def test_k4_complete(self, ray_session):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        got = graphalgo.clustering_coefficients(
            rd.from_arrow(_edges(k4))
        ).to_pandas()
        # K4: every node has deg 3, sits in 3 triangles, cc = 1
        assert (got.deg == 3).all()
        assert (got.tri_cnt == 3).all()
        assert (got.cc_ppm == graphalgo.CC_SCALE).all()

    def test_paw_graph_mixed(self, ray_session):
        # triangle 0-1-2 plus pendant 3 attached to 0
        got = graphalgo.clustering_coefficients(
            rd.from_arrow(_edges([(0, 1), (1, 2), (2, 0), (0, 3)]))
        ).to_pandas().set_index("entity_id")
        assert got.loc[0, "deg"] == 3 and got.loc[0, "tri_cnt"] == 1
        assert got.loc[0, "cc_ppm"] == 2 * graphalgo.CC_SCALE // 6
        assert got.loc[1, "cc_ppm"] == graphalgo.CC_SCALE
        assert got.loc[3, "cc_ppm"] == 0 and got.loc[3, "deg"] == 1

    def test_matches_bruteforce_on_random_graph(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(23)
        n = 40
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(200, 2))
            if a != b
        ]
        got = graphalgo.clustering_coefficients(
            rd.from_arrow(_edges(pairs)), top=n
        ).to_pandas()
        und = {(min(a, b), max(a, b)) for a, b in pairs}
        adj = {v: set() for v in range(n)}
        for a, b in und:
            adj[a].add(b)
            adj[b].add(a)
        rows = []
        for v in range(n):
            d = len(adj[v])
            if d == 0:
                continue  # isolated nodes excluded (no pair rows)
            nb = sorted(adj[v])
            tri = sum(
                1
                for i in range(d)
                for j in range(i + 1, d)
                if nb[j] in adj[nb[i]]
            )
            cc = (2 * tri * graphalgo.CC_SCALE) // (d * (d - 1)) if d >= 2 else 0
            rows.append((v, d, tri, cc))
        rows.sort(key=lambda r: (-r[3], r[0]))
        want = rows[: len(got)]
        assert list(got.itertuples(index=False, name=None)) == want


class TestWalkLift:
    @staticmethod
    def _seq_lift(walks_t, window=None):
        """Pure sequential recompute of walk_cooc_lift from a walks table."""
        from collections import Counter, defaultdict

        window = window or graphalgo.LIFT_WINDOW
        by_start = defaultdict(list)
        for s, st, nd in zip(
            walks_t["start_id"].to_pylist(),
            walks_t["step"].to_pylist(),
            walks_t["node_id"].to_pylist(),
        ):
            by_start[s].append((st, nd))
        cab, occ, total = Counter(), Counter(), 0
        for s, seq in by_start.items():
            seq = [nd for _, nd in sorted(seq)]
            for nd in seq:
                occ[nd] += 1
            for i in range(len(seq)):
                for d in range(1, window + 1):
                    if i + d >= len(seq):
                        break
                    a, b = seq[i], seq[i + d]
                    if a != b:
                        cab[(min(a, b), max(a, b))] += 1
                        total += 1
        rows = []
        for (a, b), c in sorted(cab.items()):
            lift = (graphalgo.LIFT_PPM * c * total) // (occ[a] * occ[b])
            rows.append((a, b, c, lift))
        return rows

    def test_matches_sequential_on_random_graph(self, ray_session):
        import numpy as np

        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_walks

        rng = np.random.default_rng(23)
        n = 50
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(120, 2))
            if a != b
        ]
        nodes_t, edges_t = _nodes(list(range(n))), _edges(pairs)
        walks = graphalgo.random_walks(
            rd.from_arrow(edges_t), rd.from_arrow(nodes_t)
        )
        got = graphalgo.walk_cooc_lift(walks).to_pandas()
        want = self._seq_lift(_seq_walks(nodes_t, edges_t))
        assert list(got.itertuples(index=False, name=None)) == want

    def test_path_graph_hand_computed(self, ray_session):
        # path 0-1-2: walks ping-pong; lift pairs only among path nodes,
        # every pair's nodes within window 2 of each other
        walks = graphalgo.random_walks(
            rd.from_arrow(_edges([(0, 1), (1, 2)])),
            rd.from_arrow(_nodes([0, 1, 2])),
        )
        got = graphalgo.walk_cooc_lift(walks).to_pandas()
        want = self._seq_lift(
            pa.table(
                {
                    "start_id": walks.to_pandas()["start_id"],
                    "step": walks.to_pandas()["step"],
                    "node_id": walks.to_pandas()["node_id"],
                }
            )
        )
        assert list(got.itertuples(index=False, name=None)) == want
        # adjacent path nodes must co-occur
        assert any((a, b) == (0, 1) for a, b, _, _ in want)


class TestHarmonicCentrality:
    def test_matches_sequential_on_random_graph(self, ray_session):
        import numpy as np

        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_harmonic

        rng = np.random.default_rng(7)
        n = 64
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(140, 2))
            if a != b
        ]
        nodes_t, edges_t = _nodes(list(range(n))), _edges(pairs)
        got = graphalgo.harmonic_centrality(
            rd.from_arrow(edges_t), rd.from_arrow(nodes_t)
        ).to_pandas()
        want = _seq_harmonic(nodes_t, edges_t).to_pandas()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_path_hand_computed(self, ray_session):
        # path 0-1-2-3: only seed is 0 (ids < 16); distances 1,2,3
        got = graphalgo.harmonic_centrality(
            rd.from_arrow(_edges([(0, 1), (1, 2), (2, 3)])),
            rd.from_arrow(_nodes([0, 1, 2, 3])),
        ).to_pandas()
        rows = {
            int(r.entity_id): (int(r.harmonic_ppm), int(r.n_seeds))
            for r in got.itertuples()
        }
        ppm = graphalgo.HC_PPM
        assert rows == {
            1: (ppm // 1, 1),
            2: (ppm // 2, 1),
            3: (ppm // 3, 1),
        }

    def test_cutoff_truncates(self, ray_session):
        # path of 7 nodes: node 6 is 6 hops from seed 0 -> beyond HC_MAX_D
        got = graphalgo.harmonic_centrality(
            rd.from_arrow(_edges([(i, i + 1) for i in range(6)])),
            rd.from_arrow(_nodes(list(range(7)))),
        ).to_pandas()
        ids = set(got["entity_id"].tolist())
        assert 6 not in ids and 5 not in ids
        assert {1, 2, 3, 4} <= ids


class TestNeighAgg:
    def test_matches_pandas_recompute(self, ray_session):
        import glob as _glob

        import pandas as pd

        from agenticknowledgegraphconstructionsystem_ray.pipelines import graphmetrics
        from agenticknowledgegraphconstructionsystem_ray.pipelines.kgqueries import (
            _ensure_run,
        )

        got = graphmetrics.kg_neigh_agg(SF).to_pandas()
        out = _ensure_run(SF)
        e = pq.read_table(
            sorted(_glob.glob(os.path.join(out, "edges", "**", "*.parquet"),
                              recursive=True)),
            columns=["subj_id", "obj_id"],
        ).to_pandas()
        n = pq.read_table(
            sorted(_glob.glob(os.path.join(out, "nodes", "*.parquet"))),
            columns=["entity_id", "mention_count"],
        ).to_pandas()
        e = e[(e.subj_id >= 0) & (e.obj_id >= 0) & (e.subj_id != e.obj_id)]
        a = e[["subj_id", "obj_id"]].to_numpy()
        a.sort(axis=1)
        pairs = pd.DataFrame(a, columns=["a", "b"]).drop_duplicates()
        sym = pd.concat([
            pairs.rename(columns={"a": "src", "b": "dst"}),
            pairs.rename(columns={"b": "src", "a": "dst"})[["src", "dst"]],
        ])
        mc = n.set_index("entity_id")["mention_count"]
        sym["mc"] = sym["dst"].map(mc).astype("int64")
        g = sym.groupby("src")["mc"].agg(["count", "sum", "max"])
        exp = {
            int(k): (int(r["count"]), int(r["sum"]), int(r["max"]))
            for k, r in g.iterrows()
        }
        assert len(got) == len(exp)
        for r in got.itertuples():
            c, s, m = exp[r.entity_id]
            assert (r.n_neigh, r.sum_nbr_mentions, r.max_nbr_mentions) == (c, s, m)
            assert r.avg_nbr_mentions_ppm == s * 1_000_000 // c


class TestBetweenness:
    def test_matches_sequential_on_random_graph(self, ray_session):
        import numpy as np

        from agenticknowledgegraphconstructionsystem_ray.goldens import _seq_betweenness

        rng = np.random.default_rng(11)
        n = 64
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(150, 2))
            if a != b
        ]
        nodes_t, edges_t = _nodes(list(range(n))), _edges(pairs)
        got = graphalgo.betweenness_centrality(
            rd.from_arrow(edges_t), rd.from_arrow(nodes_t)
        )
        assert got.equals(_seq_betweenness(nodes_t, edges_t))

    def test_path_hand_computed(self, ray_session):
        # path 0-1-2-3, seed 0: sigma == 1 everywhere, so
        # delta(2) = SCALE (from 3), delta(1) = SCALE + delta(2) = 2*SCALE
        got = graphalgo.betweenness_centrality(
            rd.from_arrow(_edges([(0, 1), (1, 2), (2, 3)])),
            rd.from_arrow(_nodes([0, 1, 2, 3])),
        ).to_pydict()
        s = graphalgo.BC_SCALE
        assert got == {
            "entity_id": [1, 2, 3],
            "bc_fp": [2 * s, s, 0],
            "n_seeds": [1, 1, 1],
        }

    def test_diamond_splits_paths(self, ray_session):
        # 0 -> {1,2} -> 3: two shortest paths; each middle node carries
        # sigma_v/sigma_w = 1/2 of the dependency: floor(S/2) each
        got = graphalgo.betweenness_centrality(
            rd.from_arrow(_edges([(0, 1), (0, 2), (1, 3), (2, 3)])),
            rd.from_arrow(_nodes([0, 1, 2, 3])),
        ).to_pydict()
        s = graphalgo.BC_SCALE
        rows = dict(zip(got["entity_id"], got["bc_fp"]))
        assert rows[1] == rows[2] == s // 2
        assert rows[3] == 0


class TestTruss:
    def test_clique_peel_hand_computed(self, ray_session):
        """Two 6-cliques sharing one edge, plus a pendant path. At k=5
        (support >= 3) each clique survives intact (every clique edge has
        support 4 inside its own clique; the shared edge gets 4+4=8), the
        path dies. Distributed result must equal the hand-derived edge
        set with in-truss support."""
        import itertools

        import ray.data as rd

        c1 = list(range(6))
        c2 = [4, 5, 10, 11, 12, 13]  # shares edge (4, 5) with c1
        edges = (
            list(itertools.combinations(c1, 2))
            + list(itertools.combinations(c2, 2))
            + [(13, 20), (20, 21)]  # pendant path, support 0
        )
        ds = rd.from_arrow(_edges(edges))
        out = pa.concat_tables(
            list(
                graphalgo.truss(ds, k=5)
                .iter_batches(batch_format="pyarrow", batch_size=None)
            )
        )
        got = {
            (a, b): s
            for a, b, s in zip(
                out["a"].to_pylist(), out["b"].to_pylist(),
                out["support"].to_pylist(),
            )
        }
        want_edges = set(
            tuple(sorted(e)) for e in itertools.combinations(c1, 2)
        ) | set(tuple(sorted(e)) for e in itertools.combinations(c2, 2))
        assert set(got) == want_edges
        # shared edge (4,5) sees both cliques' common neighbors
        assert got[(4, 5)] == 8
        # non-shared clique edges keep support 4; edges touching 4 or 5
        # (but not both) still only have their own clique's 4 commons
        for e, s in got.items():
            if e != (4, 5):
                assert s == 4, e

    def test_empty_result_keeps_schema(self, ray_session):
        import ray.data as rd

        # a triangle cannot survive k=5 (needs support >= 3)
        ds = rd.from_arrow(_edges([(0, 1), (1, 2), (0, 2)]))
        out = graphalgo.truss(ds, k=5)
        assert out.count() == 0
        assert out.schema().names == ["a", "b", "support"]
