"""Synthetic corpus generator: determinism, schema, planted properties."""

import pyarrow as pa

from agenticknowledgegraphconstructionsystem_ray import synth
from agenticknowledgegraphconstructionsystem_ray.schema import PAGES


def test_deterministic():
    a = synth.generate_shard(2, 100, 150)
    b = synth.generate_shard(2, 100, 150)
    assert a.equals(b)


def test_schema_matches_input_hint():
    t = synth.generate_shard(0, 0, 10)
    assert t.schema.equals(PAGES)
    assert t.schema.field("warc_ts").type == pa.timestamp("us")
    assert t.schema.field("html").type == pa.binary()


def test_urls_unique_across_shards():
    a = synth.generate_shard(0, 0, 100)
    b = synth.generate_shard(1, 100, 200)
    urls = a.column("url").to_pylist() + b.column("url").to_pylist()
    assert len(urls) == len(set(urls))


def test_alias_ground_truth_consistent():
    alias = synth.alias_dict()
    ents = synth.entity_universe()
    # every alias resolves to its own entity's canonical name
    for e in ents:
        for al in e["aliases"]:
            from agenticknowledgegraphconstructionsystem_ray.functions.textnorm import (
                norm_surface,
            )

            assert alias[norm_surface(al)] == (e["canonical_name"], e["ent_type"])


def test_edge_case_pages_present():
    t = synth.generate_shard(0, 0, 200)
    htmls = t.column("html").to_pylist()
    assert any(b"<body></body>" in h for h in htmls)  # empty body (i%97)
    assert any(b"unclosed markup" in h for h in htmls)  # unclosed tags (i%83)
    langs = set(t.column("lang").to_pylist())
    assert "en" in langs and len(langs) > 1  # lang minority present
