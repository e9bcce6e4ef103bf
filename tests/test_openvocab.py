"""The open-vocabulary phase B (KGConfig(open_vocab=True): alias-relevant
surfaces only to the driver, distributed singleton nodes, block-offset id
assignment, join-based edge id application) must produce the same graph as
the default driver-side path."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from agenticknowledgegraphconstructionsystem_ray import synth
from agenticknowledgegraphconstructionsystem_ray.pipelines import kg


def _read_dir(d, columns=None):
    return pq.read_table(
        sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)),
        columns=columns,
    )


@pytest.fixture(scope="module")
def pages(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ov_pages")
    synth.write_pages(str(d), 150, n_files=4)
    return str(d)


# Three open-vocab regimes, each asserted byte-identical to the default
# driver-side path: hot map covering every node (hot_total, zero tail),
# a tiny hot map forcing the hybrid head+tail split, and hot map disabled
# (pure distributed lookup join).
_VARIANTS = [
    ("openvocab", dict(open_vocab=True)),                     # hot_total
    ("openvocab_hybrid", dict(open_vocab=True, hot_map_cap=7)),
    ("openvocab_join", dict(open_vocab=True, hot_map_cap=0)),
]


@pytest.fixture(scope="module")
def outputs(pages, tmp_path_factory):
    outs = {}
    for name, kw in [("default", {})] + _VARIANTS:
        out = str(tmp_path_factory.mktemp(f"ov_{name}"))
        kg.run_pipeline(
            kg.KGConfig(pages_dir=pages, out_dir=out, chunk_files=2, **kw)
        )
        outs[name] = out
    return outs


@pytest.mark.parametrize("variant", [v[0] for v in _VARIANTS])
def test_openvocab_nodes_equal(outputs, variant):
    a = _read_dir(os.path.join(outputs["default"], "nodes"))
    b = _read_dir(os.path.join(outputs[variant], "nodes"))
    b = b.select(a.column_names)
    # row order: both are entity_id-dense; sort for a stable compare
    a = a.sort_by("entity_id")
    b = b.sort_by("entity_id")
    assert a.num_rows == b.num_rows
    for c in a.column_names:
        assert a[c].type == b[c].type, c
        assert a[c].combine_chunks().equals(b[c].combine_chunks()), c


@pytest.mark.parametrize("variant", [v[0] for v in _VARIANTS])
def test_openvocab_edges_equal(outputs, variant):
    a = _read_dir(os.path.join(outputs["default"], "edges"))
    b = _read_dir(os.path.join(outputs[variant], "edges"))
    b = b.select(a.column_names)
    assert a.num_rows == b.num_rows
    for c in a.column_names:
        assert a[c].combine_chunks().equals(b[c].combine_chunks()), c


@pytest.mark.parametrize("variant", [v[0] for v in _VARIANTS])
def test_openvocab_validation_summary_equal(outputs, variant):
    import json

    summaries = []
    for name in ("default", variant):
        with open(os.path.join(outputs[name], "validation-results.json")) as f:
            summaries.append(json.load(f)["summary"])
    assert summaries[0] == summaries[1]


def test_lookup_join_tiny_input_many_groups(ray_session):
    """The skew-safe lookup join must survive inputs far smaller than the
    coarse-group count (Dataset.join's empty hash partitions broke here)."""
    import pyarrow as pa
    import ray.data as rd

    from agenticknowledgegraphconstructionsystem_ray.pipelines.openvocab import (
        apply_ids_join,
    )

    triples = rd.from_arrow(
        pa.table(
            {
                "url": ["u1", "u2"],
                "warc_ts": pa.array([0, 0], pa.timestamp("us")),
                "subj": ["A", "B"],
                "subj_norm": ["a", "b"],
                "pred": ["uses", "uses"],
                "obj": ["C", "D"],
                "obj_norm": ["c", "x_unknown"],
                "confidence": [0.5, 0.6],
                "context": ["ctx1", "ctx2"],
            }
        )
    )
    mapping = rd.from_arrow(
        pa.table(
            {
                "member_norm": ["a", "b", "c"],
                "entity_id": pa.array([0, 1, 2], pa.int64()),
                "canonical_name": ["A", "B", "C"],
            }
        )
    )
    rows = {r["url"]: r for r in apply_ids_join(triples, mapping).take_all()}
    assert rows["u1"]["subj_id"] == 0 and rows["u1"]["obj_id"] == 2
    assert rows["u2"]["subj_id"] == 1 and rows["u2"]["obj_id"] == -1
    assert rows["u2"]["obj"] == "x_unknown"
