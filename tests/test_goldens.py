"""The golden-file oracle (goldens.py: independent sequential recomputation)
must match the distributed pipeline's kg_* query outputs exactly — this is
the in-repo version of the driver's kg_* value comparison, run at sf0.001."""

import pytest

from agenticknowledgegraphconstructionsystem_ray.arrowcmp import canon as _canon
from agenticknowledgegraphconstructionsystem_ray.arrowcmp import to_arrow as _to_arrow


@pytest.fixture(scope="module")
def golden_dir(ray_session):
    from agenticknowledgegraphconstructionsystem_ray import goldens

    return goldens.ensure_kg_golden(sf=0.001)


@pytest.mark.parametrize(
    "query,artifact,columns",
    [
        ("kg_text", "text", None),
        ("kg_mentions", "mentions", None),
        ("kg_nodes", "nodes", None),
        ("kg_edges", "edges", None),
        ("kg_validation_issues", "issues", None),
    ],
)
def test_pipeline_matches_sequential_golden(golden_dir, query, artifact, columns):
    import os

    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import kgqueries

    mine = _canon(_to_arrow(getattr(kgqueries, query)("/root/testdata/sf0.001")))
    ref = _canon(pq.read_table(os.path.join(golden_dir, f"{artifact}.parquet")))
    assert mine.column_names == ref.column_names
    assert mine.num_rows == ref.num_rows
    for c in mine.column_names:
        assert mine[c].type == ref[c].type, f"{query}.{c}: dtype"
        assert mine[c].equals(ref[c]), f"{query}.{c}: values differ"


def test_kg_search_matches_sequential(golden_dir):
    """kg_search (AND-semantics BM25 + entity enrichment, the tsvector
    sample-query analog) vs an independent sequential recomputation over
    the golden text/mentions parquet at sf0.001."""
    import os
    import re

    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import kgqueries
    from agenticknowledgegraphconstructionsystem_ray.pipelines.kgqueries import (
        KG_SEARCH_K,
        KG_SEARCH_QUERY,
    )

    text = pq.read_table(os.path.join(golden_dir, "text.parquet"))
    tok_re = re.compile(r"[a-z0-9]+")
    toks = {
        u: tok_re.findall(s.lower())
        for u, s in zip(text["url"].to_pylist(), text["text"].to_pylist())
    }
    N = len(toks)
    T = sum(len(v) for v in toks.values())
    idf = {
        q: len(str((2 * N + 1) // (2 * sum(q in set(v) for v in toks.values()) + 1)))
        for q in KG_SEARCH_QUERY
    }
    scored = []
    for u, v in toks.items():
        dl = len(v)
        s = 0
        for q, w in idf.items():
            tf = v.count(q)
            if not tf:
                s = 0
                break
            s += w * (
                (1_000_000 * 22 * T * tf) // (10 * T * tf + 3 * T + 9 * dl * N)
            )
        if s > 0:
            scored.append((u, s))
    scored.sort(key=lambda r: (-r[1], r[0]))
    top = scored[:KG_SEARCH_K]

    ments = pq.read_table(os.path.join(golden_dir, "mentions.parquet"))
    n_ent, n_men = {}, {}
    for u, nip in zip(ments["url"].to_pylist(), ments["n_in_page"].to_pylist()):
        n_ent[u] = n_ent.get(u, 0) + 1
        n_men[u] = n_men.get(u, 0) + nip

    mine = kgqueries.kg_search("/root/testdata/sf0.001")
    assert mine.num_rows == len(top)
    got = list(
        zip(
            mine["url"].to_pylist(),
            mine["bm25_ppm"].to_pylist(),
            mine["n_entities"].to_pylist(),
            mine["n_mentions"].to_pylist(),
        )
    )
    want = [(u, s, n_ent.get(u, 0), n_men.get(u, 0)) for u, s in top]
    assert got == want


def test_kg_trending_matches_sequential(golden_dir):
    """kg_trending (per-hour top-k entity leaderboard) vs an independent
    pandas recomputation over the golden edges parquet at sf0.001."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import kgqueries

    e = pq.read_table(
        os.path.join(golden_dir, "edges.parquet"),
        columns=["subj_id", "obj_id", "warc_ts"],
    ).to_pandas()
    hour = (e["warc_ts"].astype("int64") // 3_600_000_000).to_numpy()
    both = pd.DataFrame(
        {
            "hour": list(hour) + list(hour),
            "entity_id": list(e["subj_id"]) + list(e["obj_id"]),
        }
    )
    both = both[both["entity_id"] >= 0]
    c = both.groupby(["hour", "entity_id"], sort=False).size().reset_index(
        name="n_edges"
    )
    c = c.sort_values(
        ["hour", "n_edges", "entity_id"], ascending=[True, False, True]
    )
    c["rank"] = c.groupby("hour").cumcount() + 1
    want = c[c["rank"] <= 5].reset_index(drop=True)

    got = kgqueries.kg_trending("/root/testdata/sf0.001").to_pandas()
    assert len(got) == len(want)
    for col in ("hour", "entity_id", "n_edges", "rank"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
    # every hour has a dense 1..k rank prefix
    for _, g in got.groupby("hour"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_kg_type_matrix_consistency(golden_dir):
    """kg_type_matrix totals must equal the linked-edge count, and every
    type must come from the node table (independent pandas recompute)."""
    import os

    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import graphmetrics

    got = graphmetrics.kg_type_matrix("/root/testdata/sf0.001").to_pandas()
    e = pq.read_table(
        os.path.join(golden_dir, "edges.parquet"),
        columns=["subj_id", "obj_id"],
    ).to_pandas()
    n = pq.read_table(
        os.path.join(golden_dir, "nodes.parquet"),
        columns=["entity_id", "ent_type"],
    ).to_pandas()
    linked = e[(e["subj_id"] >= 0) & (e["obj_id"] >= 0)]
    assert got["n_edges"].sum() == len(linked)
    tmap = dict(zip(n["entity_id"], n["ent_type"]))
    want = (
        linked.assign(
            type_a=linked["subj_id"].map(tmap), type_b=linked["obj_id"].map(tmap)
        )
        .groupby(["type_a", "type_b"], sort=True)
        .size()
        .reset_index(name="n_edges")
    )
    assert len(got) == len(want)
    assert (got["type_a"].to_numpy() == want["type_a"].to_numpy()).all()
    assert (got["type_b"].to_numpy() == want["type_b"].to_numpy()).all()
    assert (got["n_edges"].to_numpy() == want["n_edges"].to_numpy()).all()
