"""Entity-linking actor-pool stage — broadcast alias dictionary.

Reference analog (SURVEY.md T3): the pipeline-level cached seminal paper
(``run-relationship-discovery.ts:32-47``) — a small side loaded ONCE and
reused for every comparison. Ray mapping: the alias dictionary is put in the
object store once on the driver (``ray.put``); every actor fetches it in
``__init__`` (one object-store read per actor, NOT per batch) and does a
vectorized dict lookup per batch. No shuffle.

Mentions get ``ent_type`` (closed enum, fallback "concept" per
``entity-extraction-agent.ts:221-240``) and a ``link_score`` (1.0 exact alias
hit, 0.0 unknown surface). Triple rows pass through unchanged.
"""

from __future__ import annotations

import pyarrow as pa


class EntityLinker:
    """``map_batches(EntityLinker, fn_constructor_kwargs={"alias_ref": ref},
    concurrency=N)`` where ``ref = ray.put(alias_dict)``.

    ``alias_dict``: norm_surface -> (canonical_name, ent_type).
    """

    def __init__(self, alias_ref=None, alias_dict=None) -> None:
        if alias_dict is None:
            import ray

            alias_dict = ray.get(alias_ref) if alias_ref is not None else {}
        self.alias = alias_dict

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        norms = batch.column("norm_surface").to_pylist()
        ent_types: list[str | None] = []
        link_scores: list[float | None] = []
        for kind, norm in zip(kinds, norms):
            if kind != "mention":
                ent_types.append(None)
                link_scores.append(None)
                continue
            hit = self.alias.get(norm)
            if hit is not None:
                ent_types.append(hit[1])
                link_scores.append(1.0)
            else:
                ent_types.append("concept")  # closed-enum fallback
                link_scores.append(0.0)

        idx = batch.schema.get_field_index("ent_type")
        out = batch.set_column(idx, "ent_type", pa.array(ent_types, pa.string()))
        if "link_score" in out.schema.names:
            i2 = out.schema.get_field_index("link_score")
            out = out.set_column(i2, "link_score", pa.array(link_scores, pa.float64()))
        else:
            out = out.append_column("link_score", pa.array(link_scores, pa.float64()))
        return out

