"""Unit tests for the skyline kernel: the vectorized sweep must match a
brute-force O(n^2) domination check on random data including ties and
exact-duplicate points, and the per-block combiner must be lossless (the
local skyline of any block contains every global-skyline point in it)."""

import numpy as np

from agenticknowledgegraphconstructionsystem_ray.pipelines.pareto import _skyline_np


def _brute(price, size):
    n = len(price)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (
                price[j] <= price[i]
                and size[j] >= size[i]
                and (price[j] < price[i] or size[j] > size[i])
            ):
                keep[i] = False
                break
    return keep


def test_skyline_matches_bruteforce_with_ties():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        # small value range -> many ties and exact duplicates
        price = rng.integers(0, 8, n).astype(np.int64)
        size = rng.integers(0, 8, n).astype(np.int64)
        got = _skyline_np(price, size)
        want = _brute(price, size)
        assert np.array_equal(got, want), f"trial {trial}"


def test_duplicates_all_survive():
    price = np.array([5, 5, 5], np.int64)
    size = np.array([3, 3, 3], np.int64)
    assert _skyline_np(price, size).all()


def test_block_combiner_is_lossless():
    rng = np.random.default_rng(11)
    price = rng.integers(0, 50, 200).astype(np.int64)
    size = rng.integers(0, 50, 200).astype(np.int64)
    global_keep = _brute(price, size)
    # split into 4 blocks; locally-dropped rows must never be globally kept
    for lo in range(0, 200, 50):
        sl = slice(lo, lo + 50)
        local = _skyline_np(price[sl], size[sl])
        assert not (global_keep[sl] & ~local).any()
