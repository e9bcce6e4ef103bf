"""Prefix-filtered set-similarity join: planted-corpus exactness (the
candidate stage must be LOSSLESS, unlike MinHash) and kernel edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from agenticknowledgegraphconstructionsystem_ray.stages.setsim import (
    _prefix_len,
    doc_shingles,
    setsim_pairs,
)


def _brute_pairs(texts: dict[int, str]):
    out = []
    sh = {i: set(doc_shingles(t)) for i, t in texts.items()}
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            A, B = sh[a], sh[b]
            i = len(A & B)
            u = len(A | B)
            if u and 3 * i >= len(A) + len(B):
                out.append((a, b, i, u, (1_000_000 * i) // u))
    return out


def test_prefix_len_bounds():
    # t - ceil(t/2) + 1 for tau = 1/2
    assert [_prefix_len(t) for t in [1, 2, 3, 4, 5, 10]] == [1, 2, 2, 3, 3, 6]


def test_short_docs_have_no_shingles():
    assert doc_shingles("one two") == []
    assert doc_shingles("") == []
    assert doc_shingles("a b c") == ["a b c"]


def test_planted_corpus_exact(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog near the old barn"
    texts = {
        0: base,
        1: base + " tonight",                     # near-dup of 0
        2: base.replace("quick", "slow"),          # near-dup of 0
        3: "completely different words entirely here now",
        4: "tiny",                                 # < 3 tokens: no shingles
        5: base,                                   # exact dup of 0
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        )
    )
    got = setsim_pairs(ds)
    got_rows = list(
        zip(*(got[c].to_pylist() for c in ["doc_a", "doc_b", "n_inter", "n_union", "jac_ppm"]))
    )
    assert got_rows == _brute_pairs(texts)
    # sanity: the exact dup pair is present at jac 1.0
    assert (0, 5, len(set(doc_shingles(base))), len(set(doc_shingles(base))), 1_000_000) in got_rows


def test_random_corpus_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(vocab, size=int(rng.integers(3, 25))))
        for i in range(40)
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        )
    )
    got = setsim_pairs(ds)
    got_rows = list(
        zip(*(got[c].to_pylist() for c in ["doc_a", "doc_b", "n_inter", "n_union", "jac_ppm"]))
    )
    assert got_rows == _brute_pairs(texts)
