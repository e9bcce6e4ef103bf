"""Canonicalization units: union-find merge, block combiner correctness."""

import pandas as pd
import pyarrow as pa

from agenticknowledgegraphconstructionsystem_ray.stages.canonicalize import (
    build_entity_table,
    partial_mention_counts,
)
from agenticknowledgegraphconstructionsystem_ray.state.unionfind import UnionFind


def test_unionfind_transitive():
    uf = UnionFind()
    uf.union("a", "b")
    uf.union("b", "c")
    uf.union("x", "y")
    comps = uf.components()
    assert sorted(map(tuple, comps.values())) == [("a", "b", "c"), ("x", "y")]


def test_partial_counts_match_naive():
    batch = pa.table(
        {
            "norm_surface": ["a", "b", "a", "a", "b"],
            "n_in_page": [2, 1, 3, 1, 4],
            "score": [0.4, 1.0, 0.8, 1.0, 0.6],
        }
    )
    out = partial_mention_counts(batch).to_pydict()
    d = {
        n: (m, l, p, mx, mn)
        for n, m, l, p, mx, mn in zip(
            out["norm_surface"], out["mentions_p"], out["links_p"],
            out["perfect_p"], out["max_score_p"], out["min_score_p"],
        )
    }
    assert d["a"] == (6, 3, 1, 1.0, 0.4)
    assert d["b"] == (5, 2, 1, 1.0, 0.6)


def _counts(rows):
    return pd.DataFrame(
        rows,
        columns=[
            "norm_surface", "mention_count", "link_count",
            "perfect_links", "max_score", "min_score",
        ],
    )


def test_alias_merge_transitive_chain():
    """long form <-> acronym <-> hyphenated all collapse to one entity."""
    alias = {
        "neural radiance fields": ("Neural Radiance Fields", "method"),
        "nrf0": ("Neural Radiance Fields", "method"),
        "neural-radiance-fields": ("Neural Radiance Fields", "method"),
    }
    counts = _counts(
        [
            ("neural radiance fields", 5, 3, 0, 0.8, 0.4),
            ("nrf0", 2, 2, 0, 0.6, 0.6),
            ("neural-radiance-fields", 1, 1, 0, 0.4, 0.4),
            ("unknown thing", 1, 1, 0, 0.4, 0.4),
        ]
    )
    nodes, id_map = build_entity_table(counts, alias)
    d = nodes.to_pydict()
    assert d["canonical_name"] == ["Neural Radiance Fields", "unknown thing"]
    assert d["mention_count"] == [8, 1]
    assert d["link_count"] == [6, 1]
    assert d["ent_type"] == ["method", "concept"]
    assert sorted(d["aliases"][0]) == [
        "neural radiance fields", "neural-radiance-fields", "nrf0",
    ]
    # id map covers every member norm and both entities get dense ids
    assert id_map["nrf0"] == (0, "Neural Radiance Fields")
    assert id_map["unknown thing"] == (1, "unknown thing")


def test_entity_ids_deterministic_by_name():
    alias = {}
    counts = _counts(
        [("zebra", 1, 1, 0, 0.4, 0.4), ("apple", 1, 1, 0, 0.4, 0.4)]
    )
    nodes, id_map = build_entity_table(counts, alias)
    assert nodes.to_pydict()["canonical_name"] == ["apple", "zebra"]
    assert id_map["apple"][0] == 0 and id_map["zebra"][0] == 1
