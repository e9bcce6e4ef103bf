"""Partition-quality metrics over the materialized KG entity graph.

Reference parity: the reference stores typed entities (concept types are a
closed enum — validation-agent.ts's type vocabulary; see SURVEY.md §2 M9)
but never measures how strongly the link structure follows the typing.
Newman modularity of the ent_type partition is that measure — the standard
"is this graph assortative by label?" statistic, computed here in EXACT
integer arithmetic so the distributed result is bit-identical to a
sequential mirror.

Definition: over the distinct undirected entity graph (self-loops dropped)
with m edges, for each type c with m_c within-type edges and total degree
d_c:  contrib(c) = m_c/m - (d_c / 2m)^2, Q = sum_c contrib(c). We emit
contrib_ppm(c) = floor((m_c * 4m - d_c^2) * 10^6 / (4 m^2)) — one integer
formula both sides compute identically (Python big ints here, HUGEINT in
the DuckDB oracle, so no int64 overflow at any scale).

Scale shape (100 TB): ONE distinct-pair dedup groupby (shared helper), TWO
coarse-bucket attach shuffles to type both endpoints (node-sized lookup,
never broadcast), then a per-block combiner that reduces each block to at
most |type-enum| rows before the final tiny groupby. The driver only ever
sees the |types|-row aggregate. The type dictionary itself IS tiny (closed
enum) and is the only thing collected.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from .graphalgo import (
    _attach_i64,
    _distinct_undirected_pairs,
    _kg_edges_ds,
)
from ..runtime import cluster_cpus

MOD_PPM = 10**6


def type_modularity(edges: "rd.Dataset", nodes_typed: "rd.Dataset"):
    """(ent_type, m_in, d_sum, contrib_ppm) sorted by ent_type.

    ``edges``: (subj_id, obj_id) int64 rows; ``nodes_typed``:
    (entity_id, ent_type) rows. Types present only on isolated nodes do
    not appear (they have no degree mass)."""
    import numpy as np

    n_groups = max(8, cluster_cpus())

    # closed-enum type dictionary: the one intentionally tiny collect
    type_rows = nodes_typed.groupby("ent_type").count().take_all()
    types = sorted(r["ent_type"] for r in type_rows)
    code_of = {t: i for i, t in enumerate(types)}

    def encode(t: pa.Table) -> pa.Table:
        codes = [code_of[v] for v in t["ent_type"].to_pylist()]
        return pa.table(
            {
                "entity_id": pa.compute.cast(t["entity_id"], pa.int64()),
                "tcode": pa.array(codes, pa.int64()),
            }
        )

    lut = nodes_typed.map_batches(encode, batch_format="pyarrow")
    pairs = _distinct_undirected_pairs(edges)
    typed = _attach_i64(
        _attach_i64(pairs, ["a", "b"], "a", lut, "entity_id", "tcode",
                    "ta", n_groups),
        ["a", "b", "ta"], "b", lut, "entity_id", "tcode", "tb", n_groups,
    )

    def combine(t: pa.Table) -> pa.Table:
        """Block combiner: reduce a block of typed pairs to per-type
        (m_in, d_sum) partials — at most |types| rows out per block."""
        ta = t["ta"].combine_chunks().to_numpy(zero_copy_only=False)
        tb = t["tb"].combine_chunks().to_numpy(zero_copy_only=False)
        k = len(types)
        d = np.bincount(ta, minlength=k) + np.bincount(tb, minlength=k)
        m_in = np.bincount(ta[ta == tb], minlength=k)
        keep = d > 0
        return pa.table(
            {
                "tcode": pa.array(np.flatnonzero(keep), pa.int64()),
                "m_in": pa.array(m_in[keep].astype(np.int64), pa.int64()),
                "d_sum": pa.array(d[keep].astype(np.int64), pa.int64()),
            }
        )

    agg = (
        typed.map_batches(combine, batch_format="pyarrow")
        .groupby("tcode")
        .aggregate(Sum("m_in"), Sum("d_sum"))
        .take_all()  # |types| rows — the intended tiny result
    )
    m = sum(int(r["sum(d_sum)"]) for r in agg) // 2
    rows = []
    for r in sorted(agg, key=lambda r: int(r["tcode"])):
        m_in = int(r["sum(m_in)"])
        d_sum = int(r["sum(d_sum)"])
        # Python big ints: exact at any scale. TRUNCATING division (not
        # floor) — DuckDB's HUGEINT // truncates toward zero and contribs
        # can be negative, so mirror that semantic exactly.
        num = (m_in * 4 * m - d_sum * d_sum) * MOD_PPM
        den = 4 * m * m
        contrib = num // den if num >= 0 else -((-num) // den)
        rows.append((types[int(r["tcode"])], m_in, d_sum, contrib))
    return pa.table(
        {
            "ent_type": pa.array([r[0] for r in rows], pa.string()),
            "m_in": pa.array([r[1] for r in rows], pa.int64()),
            "d_sum": pa.array([r[2] for r in rows], pa.int64()),
            "contrib_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def kg_modularity(sf_dir: str):
    """Driver query: ent_type-partition modularity decomposition of the
    materialized KG entity graph. Oracle: DuckDB HUGEINT mirror over the
    sequential golden nodes/edges parquet (goldens.kg_oracle_sql)."""
    import glob
    import os

    from .kgqueries import _ensure_run

    out = _ensure_run(sf_dir)
    edges = _kg_edges_ds(out)
    nodes_typed = rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "nodes", "*.parquet"))),
        columns=["entity_id", "ent_type"],
    )
    return type_modularity(edges, nodes_typed)


# ---------------------------------------------------------------------------
# degree assortativity
# ---------------------------------------------------------------------------
# Newman's degree assortativity r over the distinct undirected graph, in
# EXACT integer arithmetic: with M edges and per-edge endpoint degrees
# (x_e, y_e), let Se = sum x*y, Ss = sum (x+y), Sq = sum (x^2+y^2); then
#   r = (4*M*Se - Ss^2) / (2*M*Sq - Ss^2)
# (the standard formula cleared of fractions). We report r_ppm with the
# same truncating division as DuckDB; a zero denominator (every degree
# equal, e.g. a cycle) is reported as 0 by convention on both sides.
#
# Scale shape: degree table via one groupby over endpoint counts; two
# coarse-bucket attaches put (deg_a, deg_b) on each pair; a per-block
# combiner reduces each block to ONE partial (m, se, ss, sq) row, so the
# driver sees n_blocks rows. Sums are carried as Python big ints on the
# driver side of the final reduce (Sq grows like M * deg_max^2 — beyond
# int64 on extreme hub graphs, so the tiny final reduce must not be int64).


def degree_assortativity(edges: "rd.Dataset") -> pa.Table:
    """One row: (m, se, ss, sq, r_ppm) over the distinct undirected graph
    of ``edges`` ((subj_id, obj_id) int64 rows; self-loops dropped)."""
    import numpy as np

    from ray.data.aggregate import Count

    n_groups = max(8, cluster_cpus())
    pairs = _distinct_undirected_pairs(edges).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.concatenate([a, b]), pa.int64())}
        )

    deg = (
        pairs.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count())
    )

    def deg_i64(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "deg": pc.cast(t["count()"], pa.int64()),
            }
        )

    deg = deg.map_batches(deg_i64, batch_format="pyarrow")
    withx = _attach_i64(pairs, ["a", "b"], "a", deg, "node", "deg",
                        "x", n_groups)
    withxy = _attach_i64(withx, ["a", "b", "x"], "b", deg, "node", "deg",
                         "y", n_groups)

    def combine(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.schema(
                [("m", pa.int64()), ("se", pa.int64()),
                 ("ss", pa.int64()), ("sq", pa.int64())]
            ).empty_table()
        x = t["x"].combine_chunks().to_numpy(zero_copy_only=False)
        y = t["y"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "m": pa.array([t.num_rows], pa.int64()),
                "se": pa.array([int((x * y).sum())], pa.int64()),
                "ss": pa.array([int(x.sum() + y.sum())], pa.int64()),
                "sq": pa.array([int((x * x).sum() + (y * y).sum())],
                               pa.int64()),
            }
        )

    parts = withxy.map_batches(combine, batch_format="pyarrow").take_all()
    m = sum(int(p["m"]) for p in parts)
    se = sum(int(p["se"]) for p in parts)
    ss = sum(int(p["ss"]) for p in parts)
    sq = sum(int(p["sq"]) for p in parts)
    num = (4 * m * se - ss * ss) * MOD_PPM
    den = 2 * m * sq - ss * ss
    if den == 0:
        r = 0
    else:
        r = num // den if (num >= 0) == (den > 0) else -(abs(num) // abs(den))
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "se": pa.array([se], pa.int64()),
            "ss": pa.array([ss], pa.int64()),
            "sq": pa.array([sq], pa.int64()),
            "r_ppm": pa.array([r], pa.int64()),
        }
    )


def kg_assortativity(sf_dir: str):
    """Driver query: degree assortativity of the materialized KG entity
    graph. Oracle: DuckDB HUGEINT mirror over the golden edges parquet."""
    from .kgqueries import _ensure_run

    out = _ensure_run(sf_dir)
    return degree_assortativity(_kg_edges_ds(out))


# ---------------------------------------------------------------------------
# kg_type_matrix: directed type-pair edge counts — the schema-usage census
# over the materialized KG. Reference analog: the reference's closed
# ConceptType enum x relationship assignment (types.ts:64-79) surfaced as
# counts, i.e. "which kinds of things point at which kinds of things".
#
# Scale shape: both type lookups ride the coarse-bucket tag-union join
# (node-sized side never broadcast, same as type_modularity); a per-block
# |types|^2 bincount combiner reduces every block to at most |types|^2
# rows before the ONE tiny groupby; type names decode on the driver over
# a closed-enum-sized table.
# ---------------------------------------------------------------------------


def kg_type_matrix(sf_dir: str) -> pa.Table:
    """(type_a, type_b, n_edges) per directed linked edge, sorted. Oracle:
    SQL double join over the golden nodes/edges parquet."""
    import glob
    import os

    import numpy as np

    from ray.data.aggregate import Sum

    from .kgqueries import _ensure_run

    out = _ensure_run(sf_dir)
    n_groups = max(8, cluster_cpus())
    edges = _kg_edges_ds(out)
    nodes_typed = rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "nodes", "*.parquet"))),
        columns=["entity_id", "ent_type"],
    )
    type_rows = nodes_typed.groupby("ent_type").count().take_all()
    types = sorted(r["ent_type"] for r in type_rows)
    code_of = {t: i for i, t in enumerate(types)}
    k = len(types)

    def encode(t: pa.Table) -> pa.Table:
        codes = [code_of[v] for v in t["ent_type"].to_pylist()]
        return pa.table(
            {
                "entity_id": pa.compute.cast(t["entity_id"], pa.int64()),
                "tcode": pa.array(codes, pa.int64()),
            }
        )

    lut = nodes_typed.map_batches(encode, batch_format="pyarrow")

    def as_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["subj_id"], "b": t["obj_id"]})

    pairs = edges.map_batches(as_ab, batch_format="pyarrow")
    typed = _attach_i64(
        _attach_i64(pairs, ["a", "b"], "a", lut, "entity_id", "tcode",
                    "ta", n_groups),
        ["a", "b", "ta"], "b", lut, "entity_id", "tcode", "tb", n_groups,
    )

    def combine(t: pa.Table) -> pa.Table:
        ta = t["ta"].combine_chunks().to_numpy(zero_copy_only=False)
        tb = t["tb"].combine_chunks().to_numpy(zero_copy_only=False)
        flat = np.bincount(ta * k + tb, minlength=k * k)
        keep = np.flatnonzero(flat)
        return pa.table(
            {
                "cell": pa.array(keep.astype(np.int64), pa.int64()),
                "n_p": pa.array(flat[keep].astype(np.int64), pa.int64()),
            }
        )

    agg = (
        typed.map_batches(combine, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_p", alias_name="n_edges"))
    )
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_format="pyarrow", batch_size=None)]
    )
    cells = t["cell"].to_pylist()
    counts = t["n_edges"].to_pylist()
    rows = sorted(
        (types[c // k], types[c % k], int(n)) for c, n in zip(cells, counts)
    )
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_edges": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# kg_neigh_agg: neighborhood feature aggregation — the GNN data-prep shape
# (GraphSAGE, Hamilton et al. 2017: h_N(v) = AGG of neighbor features). For
# every entity the DISTINCT-neighbor count plus sum/max/mean of the
# neighbors' mention_count: the one-hop feature table a link-prediction or
# node-classification trainer consumes (kg_link_ra scores candidate pairs;
# this materializes per-NODE features).
#
# Scale shape: ONE distinct-pair dedup groupby (shared kernel), ONE
# coarse-bucket attach of the node feature (node table never broadcast),
# then per-block (src, n, sum, max) partials into a node-keyed groupby.
# Every shuffle row is ints.
# ---------------------------------------------------------------------------


def kg_neigh_agg(sf_dir: str) -> pa.Table:
    """(entity_id, n_neigh, sum_nbr_mentions, max_nbr_mentions,
    avg_nbr_mentions_ppm) over the distinct undirected linked graph,
    sorted by entity_id. Oracle: SQL over the golden nodes/edges."""
    import glob
    import os

    import numpy as np

    from ray.data.aggregate import Max

    from .graphalgo import _symmetrize_pairs
    from .kgqueries import _ensure_run

    out = _ensure_run(sf_dir)
    n_groups = max(8, cluster_cpus())
    edges = _kg_edges_ds(out).filter(expr="subj_id >= 0 and obj_id >= 0")
    lut = rd.read_parquet(
        sorted(glob.glob(os.path.join(out, "nodes", "*.parquet"))),
        columns=["entity_id", "mention_count"],
    ).map_batches(
        lambda t: pa.table(
            {
                "entity_id": pa.compute.cast(t["entity_id"], pa.int64()),
                "mc": pa.compute.cast(t["mention_count"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    sym = _symmetrize_pairs(_distinct_undirected_pairs(edges))
    feat = _attach_i64(
        sym, ["src", "dst"], "dst", lut, "entity_id", "mc", "mc", n_groups
    )

    def partial(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        mc = t["mc"].combine_chunks().to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, mc)
        mx = np.zeros(len(uniq), np.int64)
        np.maximum.at(mx, inv, mc)
        return pa.table(
            {
                "entity_id": pa.array(uniq.astype(np.int64), pa.int64()),
                "n_p": pa.array(n, pa.int64()),
                "s_p": pa.array(s, pa.int64()),
                "m_p": pa.array(mx, pa.int64()),
            }
        )

    agg = (
        feat.map_batches(partial, batch_format="pyarrow")
        .groupby("entity_id")
        .aggregate(
            Sum("n_p", alias_name="n_neigh"),
            Sum("s_p", alias_name="sum_nbr_mentions"),
            Max("m_p", alias_name="max_nbr_mentions"),
        )
        .sort("entity_id")
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_neigh"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["sum_nbr_mentions"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        avg = (s * 1_000_000) // n
        return t.append_column(
            "avg_nbr_mentions_ppm", pa.array(avg.astype(np.int64), pa.int64())
        )

    res = agg.map_batches(finish, batch_format="pyarrow")
    return pa.concat_tables(
        [b for b in res.iter_batches(batch_format="pyarrow", batch_size=None)]
    )
