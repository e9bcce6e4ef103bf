"""Planted-cluster tests for the multimodal keep verdicts (mm_dhash_keep /
mm_video_keep): the near_dup_keep composition over image/video pair
sources must cluster planted duplicates and keep exactly the min-id
representative — the same planted pattern the text dedup tests use."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agenticknowledgegraphconstructionsystem_ray.pipelines import training
from agenticknowledgegraphconstructionsystem_ray.stages import multimodal


def _write_docs(d: str, rows: list[tuple[int, str]]) -> str:
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    return d


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    """Videos are doc_id % 3 == 2. Docs 2 and 5 share identical text AND
    n_chars -> byte-identical payloads -> every sampled frame shared;
    doc 8 is a distinct video; docs 0/1 are image/audio noise."""
    d = str(tmp_path_factory.mktemp("mm_keep_videos"))
    clone = "shared video payload " * 200  # ~17 chunks -> >= 2 frames
    other = "completely different footage " * 150
    return _write_docs(
        d,
        [(0, "img noise"), (1, "audio noise"), (2, clone), (5, clone),
         (8, other)],
    )


def test_video_planted_cluster(ray_session, video_dir):
    pairs = multimodal.video_near_dups(video_dir)
    plist = list(
        zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist())
    )
    assert (2, 5) in plist  # the planted clone pair
    assert all(p == (2, 5) for p in plist)  # and nothing else

    keep = pa.concat_tables(
        [
            b
            for b in training.mm_video_keep(video_dir).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ]
    )
    rows = {r["media_id"]: r for r in keep.to_pylist()}
    assert set(rows) == {2, 5, 8}  # video universe only
    assert rows[2]["keep"] is True and rows[2]["rep_id"] == 2
    assert rows[5]["keep"] is False and rows[5]["rep_id"] == 2
    assert rows[8]["keep"] is True and rows[8]["rep_id"] == 8


def test_image_keep_composition(ray_session, tmp_path):
    """The compose layer over a crafted pair table: components merge
    transitively, min-id wins, WAV rows (doc_id % 5 == 2) are outside the
    image universe."""
    d = _write_docs(
        str(tmp_path), [(i, f"doc {i}") for i in range(10)]
    )
    pairs = pa.table(
        {
            "id_a": pa.array([0, 5], pa.int64()),
            "id_b": pa.array([5, 6], pa.int64()),
        }
    )
    keep = pa.concat_tables(
        [
            b
            for b in training._mm_keep(
                d, pairs, predicate_mod=5, predicate_not=True
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ]
    )
    rows = {r["media_id"]: r for r in keep.to_pylist()}
    assert set(rows) == {0, 1, 3, 4, 5, 6, 8, 9}  # 2 and 7 are WAVs
    assert rows[0]["keep"] is True and rows[0]["rep_id"] == 0
    # transitive component {0, 5, 6} -> rep 0
    assert rows[5]["rep_id"] == 0 and rows[5]["keep"] is False
    assert rows[6]["rep_id"] == 0 and rows[6]["keep"] is False
    for i in (1, 3, 4, 8, 9):
        assert rows[i]["keep"] is True and rows[i]["rep_id"] == i
