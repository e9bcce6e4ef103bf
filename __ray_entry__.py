"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: KG construction over the synthetic Common-Crawl
    corpus at sf0.001 — returns the final edges Dataset."""
    from agenticknowledgegraphconstructionsystem_ray.pipelines import kgqueries

    return kgqueries.kg_edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from agenticknowledgegraphconstructionsystem_ray.pipelines import (
        analytics,
        assembly,
        attribution,
        corpusstat,
        curate,
        fuzzy,
        gopher,
        graphalgo,
        graphmetrics,
        itemsets,
        kgqueries,
        mixture,
        pareto,
        scoring,
        temporal,
        training,
        webclean,
        weblinks,
    )

    q: dict[str, Callable[[str], Any]] = dict(analytics.QUERIES)
    q.update(fuzzy.QUERIES)
    q.update(training.QUERIES)
    q.update(mixture.QUERIES)
    q.update(temporal.QUERIES)
    q.update(scoring.QUERIES)
    q.update(assembly.QUERIES)
    q.update(webclean.QUERIES)
    q.update(corpusstat.QUERIES)
    q.update(gopher.QUERIES)
    q.update(curate.QUERIES)
    q.update(attribution.QUERIES)
    q.update(itemsets.QUERIES)
    q.update(pareto.QUERIES)
    q.update(
        {
            "kg_edges": kgqueries.kg_edges,
            "kg_nodes": kgqueries.kg_nodes,
            "kg_text": kgqueries.kg_text,
            "kg_mentions": kgqueries.kg_mentions,
            "kg_shared_entities": kgqueries.kg_shared_entities,
            "kg_shared_entities_dropcap": kgqueries.kg_shared_entities_dropcap,
            "kg_top_concepts": kgqueries.kg_top_concepts,
            "kg_relationship_summary": kgqueries.kg_relationship_summary,
            "kg_concept_summary": kgqueries.kg_concept_summary,
            "kg_docs_triples": kgqueries.kg_docs_triples,
            "kg_validation_issues": kgqueries.kg_validation_issues,
            "kg_lineage": kgqueries.kg_lineage,
            "kg_edge_history": kgqueries.kg_edge_history,
            "kg_growth": kgqueries.kg_growth,
            "kg_trending": kgqueries.kg_trending,
            "kg_search": kgqueries.kg_search,
            "kg_search_degenerate": kgqueries.kg_search_degenerate,
            "kg_search_indexed": kgqueries.kg_search_indexed,
            "kg_phrase_indexed": kgqueries.kg_phrase_indexed,
            "kg_search_indexed_degenerate":
                kgqueries.kg_search_indexed_degenerate,
            "kg_merge_nodes": kgqueries.kg_merge_nodes,
            "kg_merge_edges": kgqueries.kg_merge_edges,
            "kg_update_search": kgqueries.kg_update_search,
            "kg_improves_seminal": kgqueries.kg_improves_seminal,
            "kg_pages_no_edges": kgqueries.kg_pages_no_edges,
            "kg_pages_needing_edges": kgqueries.kg_pages_needing_edges,
            "kg_stats": kgqueries.kg_stats,
            "kg_conflicts": kgqueries.kg_conflicts,
            "kg_entity_history": kgqueries.kg_entity_history,
            "kg_diff": kgqueries.kg_diff,
            "kg_pagerank": graphalgo.kg_pagerank,
            "kg_ppr": graphalgo.kg_ppr,
            "kg_degree_stats": graphalgo.kg_degree_stats,
            "kg_components": graphalgo.kg_components,
            "kg_triangles": graphalgo.kg_triangles,
            "kg_kcore": graphalgo.kg_kcore,
            "kg_truss": graphalgo.kg_truss,
            "kg_bfs": graphalgo.kg_bfs,
            "kg_jaccard": graphalgo.kg_jaccard,
            "kg_walks": graphalgo.kg_walks,
            "kg_walk_lift": graphalgo.kg_walk_lift,
            "kg_harmonic": graphalgo.kg_harmonic,
            "kg_betweenness": graphalgo.kg_betweenness,
            "kg_negatives": graphalgo.kg_negatives,
            "kg_hits": graphalgo.kg_hits,
            "kg_link_ra": graphalgo.kg_link_ra,
            "kg_clustering": graphalgo.kg_clustering,
            "kg_modularity": graphmetrics.kg_modularity,
            "kg_type_matrix": graphmetrics.kg_type_matrix,
            "kg_neigh_agg": graphmetrics.kg_neigh_agg,
            "kg_assortativity": graphmetrics.kg_assortativity,
        }
    )
    q.update(weblinks.QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query. The KG pipeline
    queries (deterministic NER + union-find over synthesized pages) are not
    SQL-expressible over the input tables, so their oracle is a GOLDEN FILE:
    an independent sequential single-process recomputation of the expected
    output (goldens.py), written as parquet that the SQL reads with
    read_parquet. Generated here (idempotent, cached under /tmp) so the
    golden exists whichever side the driver evaluates first."""
    from agenticknowledgegraphconstructionsystem_ray import goldens
    from agenticknowledgegraphconstructionsystem_ray.pipelines import (
        analytics,
        assembly,
        attribution,
        corpusstat,
        curate,
        fuzzy,
        gopher,
        itemsets,
        mixture,
        pareto,
        scoring,
        temporal,
        training,
        webclean,
    )

    goldens.ensure_kg_golden()
    return {
        **analytics.ORACLE_SQL,
        **fuzzy.ORACLE_SQL,
        **training.ORACLE_SQL,
        **mixture.ORACLE_SQL,
        **temporal.ORACLE_SQL,
        **scoring.ORACLE_SQL,
        **assembly.ORACLE_SQL,
        **webclean.ORACLE_SQL,
        **corpusstat.ORACLE_SQL,
        **gopher.ORACLE_SQL,
        **curate.ORACLE_SQL,
        **attribution.ORACLE_SQL,
        **itemsets.ORACLE_SQL,
        **pareto.ORACLE_SQL,
        **goldens.kg_oracle_sql(),
    }
