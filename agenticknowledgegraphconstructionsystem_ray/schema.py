"""PyArrow schemas for every logical table (SURVEY.md §1.3).

Mapping from the reference's relational model (``/root/reference/db_init.py``):
- ``papers``          -> ``pages``    (input, shape fixed by BASELINE.json input_hint)
- ExtractedEntity     -> ``mentions``
- ``paper_relationships`` / triples -> ``triples`` / ``edges``
- ``concepts``        -> ``nodes``
- ``extraction_logs`` -> per-partition lineage manifests (state/manifest.py)
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),  # unique key; role of arxiv_id (db_init.py:22)
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("surface", pa.string()),
        ("norm_surface", pa.string()),
        ("ent_type", pa.string()),
        ("score", pa.float64()),  # relevance in [0,1] (db_init.py:86 CHECK)
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
        ("context", pa.string()),  # <=500 chars (entity-extraction-agent.ts:214)
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
    ]
)

EDGES = pa.schema(
    [
        ("subj_id", pa.int64()),
        ("pred", pa.string()),
        ("obj_id", pa.int64()),
        ("subj", pa.string()),  # canonical names carried for readability
        ("obj", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("confidence", pa.float64()),  # [0,1] (db_init.py:121 CHECK)
        ("context", pa.string()),
    ]
)

NODES = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("canonical_name", pa.string()),
        ("ent_type", pa.string()),
        ("mention_count", pa.int64()),  # grouped-count semantics (database.ts:102-110)
        ("aliases", pa.list_(pa.string())),
    ]
)

VALIDATION_ISSUES = pa.schema(
    [
        ("domain", pa.string()),  # "entity" | "relationship"
        ("key", pa.string()),  # entity canonical name or triple key
        ("severity", pa.string()),  # error | warning | info (types.ts:154-157)
        ("rule", pa.string()),
        ("message", pa.string()),
    ]
)
