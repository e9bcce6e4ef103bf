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
