"""Persisted ANN index (stages/annindex): build-once reuse, invalidation,
and bit-exactness of the stored artifacts vs the live kernels.

The layout-cache contract mirrors the SMB join and web-link table tests:
a second ensure is a no-op, a corrupted marker forces a rebuild, and a
changed source file (fingerprint mismatch) invalidates the artifact."""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from agenticknowledgegraphconstructionsystem_ray.stages import annindex, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_root():
    root = annindex.ensure_ann_index(SF)
    yield root


def test_reuse_is_noop(index_root):
    marker = os.path.join(index_root, "_DONE")
    before = os.stat(marker).st_mtime_ns
    again = annindex.ensure_ann_index(SF)
    assert again == index_root
    assert os.stat(marker).st_mtime_ns == before  # nothing rewritten


def test_marker_contract_and_fingerprint(index_root):
    with open(os.path.join(index_root, "_DONE")) as f:
        meta = json.load(f)
    assert meta["nlist"] == annindex.ANN_NLIST
    assert meta["m"] == similarity.PQ_M
    assert meta["src"][0].endswith("embeddings.parquet")
    assert meta["src"][1] == os.stat(meta["src"][0]).st_size


def test_corrupt_marker_forces_rebuild(index_root):
    marker = os.path.join(index_root, "_DONE")
    with open(marker) as f:
        good = f.read()
    try:
        with open(marker, "w") as f:
            f.write("{}")
        root = annindex.ensure_ann_index(SF)
        with open(os.path.join(root, "_DONE")) as f:
            assert json.load(f) == json.loads(good)  # rebuilt, same contract
    finally:
        pass  # rebuild restored a valid layout


def test_source_change_invalidates(tmp_path):
    # same basename trap: two different corpora whose sf_dir basenames
    # collide must not share a stale artifact (the fingerprint catches it)
    d = tmp_path / "corpus"
    d.mkdir()
    shutil.copy(os.path.join(SF, "embeddings.parquet"), d / "embeddings.parquet")
    root = annindex.ensure_ann_index(str(d))
    c1 = annindex.load_ivf_centroids(root)
    # rewrite the source with a subset -> different fingerprint
    t = pq.read_table(d / "embeddings.parquet")
    pq.write_table(t.slice(0, t.num_rows // 2), d / "embeddings.parquet")
    root2 = annindex.ensure_ann_index(str(d))
    with open(os.path.join(root2, "_DONE")) as f:
        meta = json.load(f)
    assert meta["src"][1] == os.stat(d / "embeddings.parquet").st_size
    c2 = annindex.load_ivf_centroids(root2)
    # the halved corpus trains different centroids (sample changed)
    assert c1.shape == c2.shape
    shutil.rmtree(root2, ignore_errors=True)


def test_stored_artifacts_match_live_kernels(index_root):
    """The bit-exactness proof: every stored column equals what the live
    per-call path would compute from the raw vectors."""
    src = pq.read_table(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    raw = np.asarray(src["embedding"].to_pylist(), np.float64)
    ids = src["vec_id"].to_numpy()

    coded_files = sorted(
        glob.glob(os.path.join(index_root, "coded", "**", "*.parquet"),
                  recursive=True)
    )
    coded = pq.read_table(coded_files)
    assert coded.num_rows == src.num_rows
    order = np.argsort(coded["vec_id"].to_numpy())
    by_src = {int(v): i for i, v in enumerate(ids)}
    sel = np.asarray(
        [by_src[int(v)] for v in coded["vec_id"].to_numpy()[order]]
    )

    # IVF buckets: argmax over the stored centroids on normalized rows
    cent = annindex.load_ivf_centroids(index_root)
    rn = raw[sel] / np.linalg.norm(raw[sel], axis=1, keepdims=True)
    want_bucket = np.argmax(rn @ cent.T, axis=1)
    got_bucket = coded["bucket"].to_numpy()[order]
    assert (got_bucket == want_bucket).all()

    # PQ codes: encode with the stored codebooks
    cents = annindex.load_pq_codebooks(index_root)
    want_codes = similarity.pq_encode(similarity.km_quantize(raw[sel]), cents)
    got_codes = np.asarray(coded["pq_code"].to_pylist(), np.int64)[order]
    assert (got_codes == want_codes).all()

    # LSH codes: seeded planes on the raw rows
    planes = similarity.lsh_planes(raw.shape[1])
    want_lsh = similarity.lsh_codes(raw[sel], planes)
    got_lsh = coded["lshb"].to_numpy()[order]
    assert (got_lsh == want_lsh).all()

    # embeddings round-trip exactly (float64 list column)
    got_emb = np.asarray(coded["embedding"].to_pylist(), np.float64)[order]
    assert (got_emb == raw[sel]).all()


def test_lshb_sorted_within_files(index_root):
    for f in sorted(
        glob.glob(os.path.join(index_root, "coded", "**", "*.parquet"),
                  recursive=True)
    ):
        lshb = pq.read_table(f, columns=["lshb"])["lshb"].to_numpy()
        assert (np.diff(lshb) >= 0).all(), f


class TestBpeArtifact:
    """Persisted BPE tokenizer artifact (scoring._ensure_bpe_merges):
    same layout-cache contract as the ANN index."""

    def test_reuse_and_invalidation(self, ray_session, tmp_path):
        import pyarrow.parquet as _pq

        from agenticknowledgegraphconstructionsystem_ray.pipelines import (
            scoring,
        )

        d = tmp_path / "corpus"
        d.mkdir()
        shutil.copy(
            os.path.join(SF, "documents.parquet"), d / "documents.parquet"
        )
        m1 = scoring._ensure_bpe_merges(str(d))
        marker = os.path.join(scoring.bpe_root(str(d)), "_DONE")
        before = os.stat(marker).st_mtime_ns
        m2 = scoring._ensure_bpe_merges(str(d))
        assert m1 == m2
        assert os.stat(marker).st_mtime_ns == before  # reuse is a no-op

        # source change -> fingerprint mismatch -> rebuild
        t = _pq.read_table(d / "documents.parquet")
        _pq.write_table(t.slice(0, t.num_rows // 2), d / "documents.parquet")
        m3 = scoring._ensure_bpe_merges(str(d))
        assert os.stat(marker).st_mtime_ns != before
        assert isinstance(m3, list) and m3  # retrained on the halved corpus
        shutil.rmtree(scoring.bpe_root(str(d)), ignore_errors=True)


def test_lsh_projection_matches_coded(index_root):
    """The lshproj/ secondary projection holds exactly the coded rows,
    partitioned by the code's top LSH_PREFIX_BITS bits."""
    coded = pq.read_table(
        sorted(glob.glob(os.path.join(index_root, "coded", "**", "*.parquet"),
                         recursive=True)),
        columns=["vec_id", "lshb"],
    )
    want = dict(zip(coded["vec_id"].to_pylist(), coded["lshb"].to_pylist()))
    seen = {}
    shift = similarity.LSH_BITS - annindex.LSH_PREFIX_BITS
    for d in sorted(glob.glob(os.path.join(index_root, "lshproj", "lshp=*"))):
        p = int(os.path.basename(d).split("=")[1])
        t = pq.read_table(
            sorted(glob.glob(os.path.join(d, "*.parquet"))),
            columns=["vec_id", "lshb"],
        )
        for v, b in zip(t["vec_id"].to_pylist(), t["lshb"].to_pylist()):
            assert b >> shift == p  # row lives in its own prefix partition
            seen[v] = b
    assert seen == want  # same rows, same codes, nothing lost or doubled


def test_incremental_equals_one_pass_frozen_coding(ray_session):
    """Frozen-quantizer equivalence: the incremental index's base + delta
    coded rows are bit-identical to coding the FULL corpus in one pass
    with the same (base-trained) quantizers — the contract that makes
    append-only increments sound (dd_minhash_incremental's proof shape)."""
    root, split = annindex.ensure_ann_index_incremental(SF)
    coded = pq.read_table(
        sorted(glob.glob(os.path.join(root, "coded_*", "**", "*.parquet"),
                         recursive=True)),
        columns=["vec_id", "pq_code", "bucket"],
    )
    src = pq.read_table(
        os.path.join(SF, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = src["vec_id"].to_numpy()
    raw = np.asarray(src["embedding"].to_pylist(), np.float64)
    assert coded.num_rows == len(ids)
    # base files hold only vec_id < split; delta files the rest
    base_ids = pq.read_table(
        sorted(glob.glob(os.path.join(root, "coded_base", "**", "*.parquet"),
                         recursive=True)),
        columns=["vec_id"],
    )["vec_id"].to_numpy()
    assert (base_ids < split).all() and len(base_ids) == split

    cent = annindex.load_ivf_centroids(root)
    cents = annindex.load_pq_codebooks(root)
    order = np.argsort(coded["vec_id"].to_numpy())
    by_src = {int(v): i for i, v in enumerate(ids)}
    sel = np.asarray(
        [by_src[int(v)] for v in coded["vec_id"].to_numpy()[order]]
    )
    rn = raw[sel] / np.linalg.norm(raw[sel], axis=1, keepdims=True)
    assert (
        coded["bucket"].to_numpy()[order]
        == np.argmax(rn @ cent.T, axis=1)
    ).all()
    want_codes = similarity.pq_encode(similarity.km_quantize(raw[sel]), cents)
    got_codes = np.asarray(coded["pq_code"].to_pylist(), np.int64)[order]
    assert (got_codes == want_codes).all()


def test_fts_index_reuse_and_stats(ray_session):
    """Persisted full-text index: reuse is a no-op; the sentinel bucket
    carries exact corpus stats (N docs, T tokens)."""
    import pyarrow.parquet as _pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import (
        kg,
        kgqueries,
    )
    from agenticknowledgegraphconstructionsystem_ray.pipelines.scoring import (
        _TOKEN_RE,
    )

    root = kgqueries._ensure_text_index(SF)
    marker = os.path.join(root, "_DONE")
    before = os.stat(marker).st_mtime_ns
    assert kgqueries._ensure_text_index(SF) == root
    assert os.stat(marker).st_mtime_ns == before  # reuse is a no-op

    sent = _pq.read_table(
        sorted(
            glob.glob(
                os.path.join(
                    root, "postings", f"bkt={kgqueries.FTS_BUCKETS}", "*.parquet"
                )
            )
        ),
        columns=["url", "dl"],
    )
    out = kgqueries._ensure_run(SF)
    want_n, want_t = 0, 0
    for b in kg.text_dataset(out, columns=["text"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for txt in b["text"].to_pylist():
            want_n += 1
            want_t += len(_TOKEN_RE.findall(txt.lower()))
    assert sent.num_rows == want_n
    assert sum(sent["dl"].to_pylist()) == want_t
