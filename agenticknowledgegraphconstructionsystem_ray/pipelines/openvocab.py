"""Open-vocabulary phase B: nodes and id application without vocabulary-sized
driver state.

The default phase B (pipelines/kg.py) reduces the merged mention counts to a
driver DataFrame, runs union-find over ALL distinct surfaces and broadcasts
the full norm -> (entity_id, canonical) map. That is correct while the
vocabulary is dimension-bounded (a closed alias universe), but on real
web text ``norm_surface`` is open-vocabulary: distinct surfaces grow with the
corpus, and both the driver DataFrame and the broadcast map grow with them —
the scale killer the design doc warns about.

This module is the ``KGConfig(open_vocab=True)`` path:

- the merged counts stay a DATASET;
- only ALIAS-RELEVANT surfaces (alias keys + normalized canonical names —
  the only norms union-find can ever merge; everything else is a singleton
  by construction) are reduced to the driver for union-find. That subset is
  bounded by the alias dictionary, NOT the corpus;
- every other surface becomes a singleton node distributed (vectorized
  map_batches, no driver pass);
- entity ids (dense rank of sorted canonical name — same rule as the
  default path) are assigned distributed: sort, then per-block offsets from
  block row counts (driver sees one integer per block);
- edge id application is a hash JOIN of triples against the exploded
  (member_norm -> entity_id, canonical) mapping dataset instead of a
  broadcast dict.

Output parity with the default path (same nodes, same edges) is asserted by
tests/test_openvocab.py on the synthetic corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.textnorm import norm_surface
from ..stages.canonicalize import NODES_SCHEMA, component_rows


def alias_relevant_set(alias: dict[str, tuple[str, str]]) -> set[str]:
    """Surfaces union-find can involve: alias keys plus each canonical
    name's own normalized surface (union targets)."""
    return set(alias) | {norm_surface(v[0]) for v in alias.values()}


def build_nodes_openvocab(
    counts_ds: rd.Dataset, alias: dict[str, tuple[str, str]]
):
    """counts Dataset (norm_surface, mention_count, link_count,
    perfect_links, max_score, min_score) -> (materialized nodes Dataset with
    entity ids, mapping Dataset (member_norm, entity_id, canonical_name))."""
    relevant = pa.array(sorted(alias_relevant_set(alias)), pa.string())
    rel_ref = ray.put(relevant)

    class SplitRelevant:
        def __init__(self, ref, keep_relevant: bool) -> None:
            self.rel = ray.get(ref)
            self.keep = keep_relevant

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.is_valid(
                pc.index_in(t["norm_surface"], value_set=self.rel)
            )
            if not self.keep:
                mask = pc.invert(mask)
            return t.filter(mask)

    counts_ds = counts_ds.materialize()  # consumed twice (hit + miss split)
    hits_df = counts_ds.map_batches(
        SplitRelevant, fn_constructor_kwargs={"ref": rel_ref, "keep_relevant": True},
        batch_format="pyarrow", concurrency=(1, 4),
    ).to_pandas()  # bounded by |alias dict|, never by the corpus

    merged_rows = component_rows(hits_df, alias) if len(hits_df) else []
    merged_tbl = pa.Table.from_pydict(
        {
            "canonical_name": [r["canonical_name"] for r in merged_rows],
            "ent_type": [r["ent_type"] for r in merged_rows],
            "mention_count": [r["mention_count"] for r in merged_rows],
            "link_count": [r["link_count"] for r in merged_rows],
            "perfect_links": [r["perfect_links"] for r in merged_rows],
            "max_score": [r["max_score"] for r in merged_rows],
            "min_score": [r["min_score"] for r in merged_rows],
            "aliases": [r["aliases"] for r in merged_rows],
        },
        schema=pa.schema([f for f in NODES_SCHEMA if f.name != "entity_id"]),
    )

    def singleton_nodes(t: pa.Table) -> pa.Table:
        norms = t["norm_surface"]
        aliases = pa.ListArray.from_arrays(
            pa.array(np.arange(t.num_rows + 1, dtype=np.int32)),
            norms.combine_chunks(),
        )
        return pa.Table.from_arrays(
            [
                norms,
                pa.array(["concept"] * t.num_rows, pa.string()),
                pc.cast(t["mention_count"], pa.int64()),
                pc.cast(t["link_count"], pa.int64()),
                pc.cast(t["perfect_links"], pa.int64()),
                pc.cast(t["max_score"], pa.float64()),
                pc.cast(t["min_score"], pa.float64()),
                aliases,
            ],
            schema=pa.schema(
                [f for f in NODES_SCHEMA if f.name != "entity_id"]
            ),
        )

    singles_ds = counts_ds.map_batches(
        SplitRelevant, fn_constructor_kwargs={"ref": rel_ref, "keep_relevant": False},
        batch_format="pyarrow", concurrency=(1, 4),
    ).map_batches(singleton_nodes, batch_format="pyarrow")

    nodes_noid = singles_ds
    if merged_tbl.num_rows:
        nodes_noid = rd.from_arrow(merged_tbl).union(singles_ds)

    # dense-rank entity ids distributed: global sort by canonical name, then
    # per-block offsets (the driver receives ONE integer per block)
    sorted_nodes = nodes_noid.sort("canonical_name").materialize()
    refs = sorted_nodes.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def _with_ids(t: pa.Table, offset: int) -> pa.Table:
        if not t.num_rows:
            # empty sort partitions can lose their schema entirely
            return NODES_SCHEMA.empty_table()
        ids = pa.array(
            np.arange(offset, offset + t.num_rows, dtype=np.int64)
        )
        return pa.Table.from_arrays(
            [ids] + [t.column(f.name) for f in NODES_SCHEMA if f.name != "entity_id"],
            schema=NODES_SCHEMA,
        )

    sizes = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]) if sizes else []
    id_refs = [
        _with_ids.remote(r, int(off)) for r, off in zip(refs, offsets)
    ]
    nodes_ds = rd.from_arrow_refs(id_refs).materialize()

    # (member_norm -> entity_id, canonical) mapping for edge id application:
    # merged components contribute every member (incl. unseen canonical
    # norms, matching the default id_map); singletons map themselves. The
    # extra-members dict is bounded by the alias dictionary and broadcast.
    extra_members: dict[str, list[str]] = {}
    for r in merged_rows:
        seen = set(r["aliases"])
        extras = [m for m in r["_members"] if m not in seen]
        if extras:
            extra_members[r["canonical_name"]] = extras
    xm_ref = ray.put(extra_members)

    def explode_mapping(t: pa.Table) -> pa.Table:
        norms, ids, names = [], [], []
        xm = ray.get(xm_ref)
        for eid, canonical, aliases in zip(
            t["entity_id"].to_pylist(),
            t["canonical_name"].to_pylist(),
            t["aliases"].to_pylist(),
        ):
            for m in aliases:
                norms.append(m)
                ids.append(eid)
                names.append(canonical)
            for m in xm.get(canonical, ()):
                norms.append(m)
                ids.append(eid)
                names.append(canonical)
        return pa.table(
            {
                "member_norm": pa.array(norms, pa.string()),
                "entity_id": pa.array(ids, pa.int64()),
                "canonical_name": pa.array(names, pa.string()),
            }
        )

    mapping_ds = nodes_ds.map_batches(explode_mapping, batch_format="pyarrow")
    return nodes_ds, mapping_ds


def apply_ids_join(
    triples: rd.Dataset, mapping_ds: rd.Dataset, num_partitions: int
) -> rd.Dataset:
    """Join-based edge id application (no broadcast map): triples joined to
    the mapping dataset on subj_norm and obj_norm (left outer; unknown norms
    keep -1/norm like the broadcast path). Output columns match
    stages/canonicalize.ApplyEntityIds."""

    def ren(prefix: str):
        return mapping_ds.map_batches(
            lambda t, p=prefix: t.rename_columns(
                [f"{p}_norm", f"{p}_id", f"{p}_name"]
            ),
            batch_format="pyarrow",
        )

    j = triples.join(
        ren("ms"), join_type="left_outer", num_partitions=num_partitions,
        on=("subj_norm",), right_on=("ms_norm",),
    )
    j = j.join(
        ren("mo"), join_type="left_outer", num_partitions=num_partitions,
        on=("obj_norm",), right_on=("mo_norm",),
    )

    def finish(t: pa.Table) -> pa.Table:
        neg1 = pa.scalar(-1, pa.int64())
        return pa.Table.from_arrays(
            [
                pc.coalesce(pc.cast(t["ms_id"], pa.int64()), neg1),
                t["pred"].combine_chunks(),
                pc.coalesce(pc.cast(t["mo_id"], pa.int64()), neg1),
                pc.coalesce(t["ms_name"], t["subj_norm"]).combine_chunks(),
                pc.coalesce(t["mo_name"], t["obj_norm"]).combine_chunks(),
                t["url"].combine_chunks(),
                t["warc_ts"].combine_chunks(),
                t["confidence"].combine_chunks(),
                t["context"].combine_chunks(),
            ],
            names=[
                "subj_id", "pred", "obj_id", "subj", "obj",
                "url", "warc_ts", "confidence", "context",
            ],
        )

    return j.map_batches(finish, batch_format="pyarrow")
