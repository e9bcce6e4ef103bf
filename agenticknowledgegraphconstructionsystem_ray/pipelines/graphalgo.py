"""Distributed graph analytics over the materialized KG (node/edge parquet).

kg_pagerank: join-based PageRank over the canonical entity graph — the
standard iterative shape for a graph that does NOT fit one machine:

    adjacency (edge-partitioned, hash on subj)  x  rank vector (node table)
    -> inner hash join on subj -> per-edge contribution -> groupby(dst) sum
    -> add teleport base -> next rank vector

Every iteration is one hash join + one aggregate shuffle; the only
materialized state between iterations is the node-sized rank Dataset (the
iterative frontier, never the corpus). Nothing vocabulary- or edge-sized
touches the driver; the driver sees only the final top-k.

Determinism contract: FIXED-POINT INTEGER arithmetic (rank scaled by
``PR_SCALE``), floor division at every distribution step, a fixed iteration
count — so the distributed result is bit-identical to the sequential golden
(goldens._seq_pagerank) regardless of block layout, join order or summation
order (int64 addition is associative/commutative; float PageRank would not
survive reordered sums).

Semantics (documented, both implementations): directed graph = DISTINCT
(subj_id, obj_id) pairs of linked edges (ids >= 0); damping 0.85 as integer
85/100; dangling mass is dropped (leaks), rank starts at PR_SCALE per node;
after ``PR_ITERS`` rounds emit the top ``PR_TOP`` nodes by
(rank desc, entity_id asc).

Reference analog: the reference surfaces "top concepts" by mention_count
(`db_init.py:240-252`); PageRank is the same leaderboard computed from the
graph STRUCTURE instead of raw counts.

Scale note: TOTAL rank mass is bounded by n_nodes * PR_SCALE, and any single
rank by that same total (a star hub can absorb nearly all of it), so pick
PR_SCALE such that n_nodes * PR_SCALE * PR_DAMP_NUM stays inside int64:
PR_SCALE=1e9 is safe to ~1e8 nodes; drop to 1e6 for 1e11-node graphs.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..runtime import cluster_cpus

PR_SCALE = 10**9
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_BASE = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
PR_ITERS = 10
PR_TOP = 50


def _contrib_batch(t: pa.Table) -> pa.Table:
    """Per-edge contribution: (rank * d // 100) // out_degree, int64."""
    import numpy as np

    rank = t["rank"].combine_chunks().to_numpy(zero_copy_only=False)
    deg = t["deg"].combine_chunks().to_numpy(zero_copy_only=False)
    c = (rank * PR_DAMP_NUM // PR_DAMP_DEN) // deg
    return pa.table(
        {"node_id": t["obj_id"], "c": pa.array(c.astype("int64"), pa.int64())}
    )


def pagerank(edges: "rd.Dataset", nodes: "rd.Dataset",
             iters: int = PR_ITERS, top: int = PR_TOP) -> "rd.Dataset":
    """Fixed-point PageRank. ``edges``: (subj_id, obj_id) int64 rows (may
    repeat; deduped here). ``nodes``: (entity_id) int64, one row per node —
    isolated nodes keep the teleport base."""
    n_parts = max(8, cluster_cpus())

    pairs = (
        edges.groupby(["subj_id", "obj_id"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    deg = pairs.groupby("subj_id").aggregate(Count(alias_name="deg"))
    adj = pairs.join(
        deg, join_type="inner", num_partitions=n_parts, on=("subj_id",)
    ).materialize()  # edge-partitioned adjacency with out-degree, built once

    def base_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_id": t["entity_id"],
                "c": pa.array([0] * len(t), pa.int64()),
            }
        )

    zero = nodes.map_batches(base_rows, batch_format="pyarrow").materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_id": t["node_id"],
                "rank": pa.array([PR_SCALE] * len(t), pa.int64()),
            }
        )

    ranks = zero.map_batches(init_rank, batch_format="pyarrow").materialize()

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node_id": t["node_id"],
                "rank": pc.add(t["s"], PR_BASE),
            }
        )

    for _ in range(iters):
        contrib = adj.join(
            ranks, join_type="inner", num_partitions=n_parts,
            on=("subj_id",), right_on=("node_id",),
        ).map_batches(_contrib_batch, batch_format="pyarrow")
        ranks = (
            contrib.union(zero)
            .groupby("node_id")
            .aggregate(Sum("c", alias_name="s"))
            .map_batches(finish, batch_format="pyarrow")
        ).materialize()  # node-sized iterative state

    return (
        ranks.sort(["rank", "node_id"], descending=[True, False])
        .limit(top)
        .rename_columns({"node_id": "entity_id", "rank": "rank_fp"})
    )


def degree_stats(edges: "rd.Dataset", top: int = 20) -> "rd.Dataset":
    """Per-node in/out degree over the DISTINCT directed pair set, top
    ``top`` by (total desc, node asc). One distinct-pair groupby, then two
    tagged per-block count partials unioned into ONE final shuffle — no
    join: (node_id, out_p, in_p) partial rows sum componentwise."""
    pairs = (
        edges.groupby(["subj_id", "obj_id"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def tag_counts(t: pa.Table) -> pa.Table:
        import numpy as np

        subj = t["subj_id"].combine_chunks().to_numpy(zero_copy_only=False)
        obj = t["obj_id"].combine_chunks().to_numpy(zero_copy_only=False)
        s_ids, s_cnt = np.unique(subj, return_counts=True)
        o_ids, o_cnt = np.unique(obj, return_counts=True)
        node = np.concatenate([s_ids, o_ids])
        out_p = np.concatenate([s_cnt, np.zeros_like(o_cnt)])
        in_p = np.concatenate([np.zeros_like(s_cnt), o_cnt])
        return pa.table(
            {
                "node_id": pa.array(node.astype("int64"), pa.int64()),
                "out_p": pa.array(out_p.astype("int64"), pa.int64()),
                "in_p": pa.array(in_p.astype("int64"), pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "entity_id": t["node_id"],
                "out_deg": t["o"],
                "in_deg": t["i"],
                "total_deg": pc.add(t["o"], t["i"]),
            }
        )

    return (
        pairs.map_batches(tag_counts, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(Sum("out_p", alias_name="o"), Sum("in_p", alias_name="i"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["total_deg", "entity_id"], descending=[True, False])
        .limit(top)
    )


def kg_degree_stats(sf_dir: str):
    """Driver query: degree leaderboard over the pipeline's linked edges."""
    from .kgqueries import _ensure_run

    out = _ensure_run(sf_dir)
    edges = rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "edges/**/*.parquet"), recursive=True)),
        columns=["subj_id", "obj_id"],
    ).filter(expr="subj_id >= 0 and obj_id >= 0")
    return degree_stats(edges)


def kg_pagerank(sf_dir: str):
    """Driver query: PageRank top-50 over the pipeline's materialized KG."""
    from .kgqueries import _ensure_run

    out = _ensure_run(sf_dir)
    edges = rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "edges/**/*.parquet"), recursive=True)),
        columns=["subj_id", "obj_id"],
    ).filter(expr="subj_id >= 0 and obj_id >= 0")
    nodes = rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "nodes", "*.parquet"))),
        columns=["entity_id"],
    )
    return pagerank(edges, nodes)


def kg_components(sf_dir: str):
    """Driver query: weakly-connected components of the materialized KG
    entity graph via the fully driverless min-label propagation
    (stages/canonicalize.label_propagation_components_driverless — edge set
    AND per-round labels stay distributed). Node keys are 19-digit
    zero-padded ids so lexicographic min == numeric min; isolated entities
    enter as self-loops and form singleton components. Output:
    (entity_id, component) with component = smallest reachable entity_id —
    identical to a sequential union-find (golden-file oracle)."""
    from ..stages.canonicalize import label_propagation_components_driverless
    from .kgqueries import _ensure_run

    out = _ensure_run(sf_dir)

    def pad(col: pa.ChunkedArray) -> pa.ChunkedArray:
        import pyarrow.compute as pc

        return pc.utf8_lpad(pc.cast(col, pa.string()), 19, "0")

    edges = rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "edges/**/*.parquet"), recursive=True)),
        columns=["subj_id", "obj_id"],
    ).filter(expr="subj_id >= 0 and obj_id >= 0")
    nodes = rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "nodes", "*.parquet"))),
        columns=["entity_id"],
    )
    pairs = edges.map_batches(
        lambda t: pa.table(
            {"a": pad(t["subj_id"]), "b": pad(t["obj_id"])}
        ),
        batch_format="pyarrow",
    ).union(
        # self-loops make isolated nodes singleton components
        nodes.map_batches(
            lambda t: pa.table(
                {"a": pad(t["entity_id"]), "b": pad(t["entity_id"])}
            ),
            batch_format="pyarrow",
        )
    )
    labels = label_propagation_components_driverless(pairs)
    return labels.map_batches(
        lambda t: pa.table(
            {
                "entity_id": pa.compute.cast(t["node"], pa.int64()),
                "component": pa.compute.cast(t["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("entity_id")
