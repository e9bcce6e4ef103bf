"""Uniform cache-invalidation contract across ALL persisted artifacts.

Every /tmp layout (ANN, ANN-delta, BPE, SMB, link table, full-text index)
keys its cache root on the corpus basename / sf value — two different
corpora can collide on the root. The _DONE contract must therefore carry a
source fingerprint (sizes/mtimes) so a regenerated or swapped corpus at
the same root REBUILDS instead of silently serving stale results.
Reference analog: the ledger keyed by content identity
(db_init.py:150-159, agents/src/database.ts:66-81).

One parametrized test: build the artifact, regenerate the source in place
(same paths, new content), re-ensure, and assert the marker was rewritten
with a different contract — i.e. the artifact was rebuilt from the new
source, not served stale.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
TEST_SF = 0.00077  # unique sf so /tmp roots never collide with real runs


def _halve(path: str) -> None:
    """Rewrite a parquet file in place with its first half — same path,
    new content (size and mtime both change)."""
    t = pq.read_table(path)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), path)


def _marker_state(marker: str) -> tuple[dict, int]:
    with open(marker) as f:
        return json.load(f), os.stat(marker).st_mtime_ns


# ---------------------------------------------------------------------------
# corpus-dir-keyed artifacts: sf_dir holds the table files directly
# ---------------------------------------------------------------------------

def _ann_case(d: str):
    from agenticknowledgegraphconstructionsystem_ray.stages import annindex

    shutil.copy(os.path.join(SF, "embeddings.parquet"),
                os.path.join(d, "embeddings.parquet"))

    def build():
        root = annindex.ensure_ann_index(d)
        return os.path.join(root, "_DONE")

    def mutate():
        _halve(os.path.join(d, "embeddings.parquet"))

    def content(root):
        files = glob.glob(os.path.join(root, "coded", "**", "*.parquet"),
                          recursive=True)
        return sum(pq.read_table(f).num_rows for f in files)

    return build, mutate, content


def _ann_delta_case(d: str):
    from agenticknowledgegraphconstructionsystem_ray.stages import annindex

    shutil.copy(os.path.join(SF, "embeddings.parquet"),
                os.path.join(d, "embeddings.parquet"))

    def build():
        root, _split = annindex.ensure_ann_index_incremental(d)
        return os.path.join(root, "_DONE")

    def mutate():
        _halve(os.path.join(d, "embeddings.parquet"))

    def content(root):
        with open(os.path.join(root, "_DONE")) as f:
            return json.load(f)["split"]  # halved corpus -> halved split

    return build, mutate, content


def _bpe_case(d: str):
    from agenticknowledgegraphconstructionsystem_ray.pipelines import scoring

    shutil.copy(os.path.join(SF, "documents.parquet"),
                os.path.join(d, "documents.parquet"))

    def build():
        scoring._ensure_bpe_merges(d)
        return os.path.join(scoring.bpe_root(d), "_DONE")

    def mutate():
        _halve(os.path.join(d, "documents.parquet"))

    def content(root):
        return pq.read_table(
            os.path.join(root, "merges.parquet")
        )["n"].to_pylist()

    return build, mutate, content


def _smb_case(d: str):
    from agenticknowledgegraphconstructionsystem_ray.pipelines import training

    for t in ("orders", "lineitem"):
        shutil.copy(os.path.join(SF, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"))

    def build():
        root = training._smb_layout(d)
        return os.path.join(root, "_DONE")

    def mutate():
        _halve(os.path.join(d, "orders.parquet"))

    def content(root):
        files = glob.glob(os.path.join(root, "orders", "**", "*.parquet"),
                          recursive=True)
        return sum(pq.read_table(f).num_rows for f in files)

    return build, mutate, content


# ---------------------------------------------------------------------------
# sf-keyed artifacts: source is the synthetic pages corpus for sf_of(dir)
# ---------------------------------------------------------------------------

def _pages_fixture(tmp_path, monkeypatch):
    """A tiny controlled pages corpus wired in as THE corpus for TEST_SF,
    plus cleanup of every /tmp root keyed on that sf."""
    from agenticknowledgegraphconstructionsystem_ray import synth

    pages = str(tmp_path / "pages")
    synth.write_pages(pages, 40, n_files=2, seed=7)

    real_ensure = synth.ensure_pages

    def fake_ensure(sf: float, seed: int = 42, mult: int = 1) -> str:
        if abs(sf - TEST_SF) < 1e-9:
            return pages
        return real_ensure(sf, seed, mult)

    monkeypatch.setattr(synth, "ensure_pages", fake_ensure)
    sf_dir = str(tmp_path / f"sf{TEST_SF:g}")
    os.makedirs(sf_dir, exist_ok=True)
    return pages, sf_dir


def _regen_pages(pages: str) -> None:
    """Regenerate the corpus in place: same file names, new content."""
    from agenticknowledgegraphconstructionsystem_ray import synth

    synth.write_pages(pages, 40, n_files=2, seed=8)


@pytest.fixture()
def clean_sf_roots():
    roots = [
        f"/tmp/agkg_out/sf{TEST_SF:g}",
        f"/tmp/agkg_fts/sf{TEST_SF:g}",
        f"/tmp/agkg_weblinks/sf{TEST_SF:g}",
    ]
    for r in roots:
        shutil.rmtree(r, ignore_errors=True)
    yield
    for r in roots:
        shutil.rmtree(r, ignore_errors=True)


@pytest.mark.parametrize(
    "case", ["ann", "ann_delta", "bpe", "smb"],
)
def test_dir_keyed_artifact_invalidates_on_source_change(case, tmp_path):
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    build, mutate, content = {
        "ann": _ann_case,
        "ann_delta": _ann_delta_case,
        "bpe": _bpe_case,
        "smb": _smb_case,
    }[case](d)

    marker = build()
    before, mt_before = _marker_state(marker)
    c_before = content(os.path.dirname(marker))

    mutate()
    marker2 = build()
    after, mt_after = _marker_state(marker2)

    assert after != before, f"{case}: contract did not change with source"
    assert mt_after > mt_before, f"{case}: artifact not rebuilt"
    c_after = content(os.path.dirname(marker2))
    assert c_after != c_before, f"{case}: content still from old source"
    shutil.rmtree(os.path.dirname(marker2), ignore_errors=True)


def test_single_shard_regen_invalidates_only_its_chunk(tmp_path):
    """Chunk-granular invalidation: regenerating ONE pages shard must
    re-extract only the chunk that shard feeds — the other chunks'
    phase-A records are reused untouched (at 100 TB this is the
    difference between re-running the corpus and re-running one chunk) —
    while the final outputs equal a cold rebuild of the new corpus."""
    import pyarrow as pa

    from agenticknowledgegraphconstructionsystem_ray import synth
    from agenticknowledgegraphconstructionsystem_ray.pipelines import kg

    pages = str(tmp_path / "pages")
    synth.write_pages(pages, 240, n_files=6)
    out = str(tmp_path / "out")
    kg.ensure_complete(kg.KGConfig(pages_dir=pages, out_dir=out,
                                   chunk_files=2))  # 3 chunks of 2 files

    def chunk_mtimes():
        m = {}
        for f in glob.glob(os.path.join(
                out, "extracted/chunk=*/kind=page/*.parquet")):
            chunk = f.split("chunk=")[1].split("/")[0]
            m.setdefault(chunk, []).append(os.stat(f).st_mtime_ns)
        return {k: max(v) for k, v in m.items()}

    before = chunk_mtimes()
    assert len(before) == 3

    # regenerate shard #0 in place (chunk 0's first file): same name,
    # new content — swap two pages' html payloads
    f0 = sorted(glob.glob(os.path.join(pages, "*.parquet")))[0]
    t = pq.read_table(f0)
    htmls = t["html"].to_pylist()
    htmls[0], htmls[1] = htmls[1], htmls[0]
    pq.write_table(
        t.set_column(t.schema.get_field_index("html"), "html",
                     pa.array(htmls, pa.binary())), f0)

    kg.ensure_complete(kg.KGConfig(pages_dir=pages, out_dir=out,
                                   chunk_files=2))
    after = chunk_mtimes()
    changed = {k for k in after if after[k] != before[k]}
    assert len(changed) == 1, f"expected one chunk re-extracted: {changed}"

    # and the merged result equals a cold rebuild of the mutated corpus
    cold = str(tmp_path / "cold")
    kg.ensure_complete(kg.KGConfig(pages_dir=pages, out_dir=cold,
                                   chunk_files=2))
    e1 = pq.read_table(sorted(glob.glob(
        os.path.join(out, "edges/**/*.parquet"), recursive=True)))
    e2 = pq.read_table(sorted(glob.glob(
        os.path.join(cold, "edges/**/*.parquet"), recursive=True)))
    assert e1.equals(e2)


def test_minhash_band_index_invalidates_on_source_change(tmp_path):
    """The persisted LSH band index keys its dir on the corpus abspath;
    the marker tag must carry the source fingerprint so rewriting
    documents.parquet in place rebuilds the bands."""
    import hashlib

    from agenticknowledgegraphconstructionsystem_ray.stages import dedup

    d = str(tmp_path / "corpus")
    os.makedirs(d)
    shutil.copy(os.path.join(SF, "documents.parquet"),
                os.path.join(d, "documents.parquet"))
    tag = hashlib.md5(
        f"{os.path.abspath(d)}:documents:v{dedup.MH_INDEX_VERSION}".encode()
    ).hexdigest()[:16]
    index_dir = f"/tmp/agkg_mh_index/{tag}"
    shutil.rmtree(index_dir, ignore_errors=True)
    try:
        dedup.minhash_near_dups_incremental(d)
        marker = os.path.join(index_dir, "_INDEX_OK")
        before, mt_before = open(marker).read(), os.stat(marker).st_mtime_ns

        _halve(os.path.join(d, "documents.parquet"))
        dedup.minhash_near_dups_incremental(d)
        after, mt_after = open(marker).read(), os.stat(marker).st_mtime_ns
        assert after != before
        assert mt_after > mt_before
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def test_link_table_invalidates_on_regenerated_corpus(
    tmp_path, monkeypatch, clean_sf_roots
):
    from agenticknowledgegraphconstructionsystem_ray.pipelines import weblinks

    pages, sf_dir = _pages_fixture(tmp_path, monkeypatch)
    root = weblinks._ensure_link_tables(sf_dir)
    marker = os.path.join(root, "_DONE")
    before, mt_before = _marker_state(marker)

    _regen_pages(pages)
    root2 = weblinks._ensure_link_tables(sf_dir)
    after, mt_after = _marker_state(os.path.join(root2, "_DONE"))
    assert after != before
    assert mt_after > mt_before

    # content spot check: the rebuilt table matches a fresh scan of the
    # NEW pages (total link mass recomputed, not stale)
    files = glob.glob(os.path.join(root2, "links", "**", "*.parquet"),
                      recursive=True)
    total = sum(
        sum(x for x in pq.read_table(f)["n_links"].to_pylist())
        for f in files
    )
    assert total > 0


def test_fts_index_invalidates_on_regenerated_corpus(
    tmp_path, monkeypatch, clean_sf_roots
):
    """The full chain: regenerated pages -> kg run rebuilds (config
    fingerprint now carries sizes/mtimes) -> FTS index rebuilds (its
    contract fingerprints the run's extracted-text files)."""
    from agenticknowledgegraphconstructionsystem_ray.pipelines import kgqueries

    pages, sf_dir = _pages_fixture(tmp_path, monkeypatch)
    root = kgqueries._ensure_text_index(sf_dir)
    marker = os.path.join(root, "_DONE")
    before, mt_before = _marker_state(marker)

    _regen_pages(pages)
    root2 = kgqueries._ensure_text_index(sf_dir)
    after, mt_after = _marker_state(os.path.join(root2, "_DONE"))
    assert after != before
    assert mt_after > mt_before


def test_source_fingerprint_properties(tmp_path):
    """The shared identity primitive: stable under re-read, order-free
    over its inputs, sensitive to content/size/mtime change, and loud
    (not empty-valued) on a missing source."""
    from agenticknowledgegraphconstructionsystem_ray.state.artifacts import (
        source_fingerprint,
    )

    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    a.write_bytes(b"xxxx")
    b.write_bytes(b"yyyy")

    f1 = source_fingerprint(str(a), str(b))
    assert f1 == source_fingerprint(str(a), str(b))          # stable
    assert f1 == source_fingerprint(str(b), str(a))          # order-free
    assert f1 == source_fingerprint(str(tmp_path))           # dir == files

    os.utime(a, ns=(1, 1))                                   # mtime only
    f2 = source_fingerprint(str(a), str(b))
    assert f2 != f1

    a.write_bytes(b"xxxxz")                                  # size change
    assert source_fingerprint(str(a), str(b)) != f2

    with pytest.raises(FileNotFoundError):
        source_fingerprint(str(tmp_path / "missing.parquet"))
