"""Bloom-filter semi-join: no false negatives, bounded false positives."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from agenticknowledgegraphconstructionsystem_ray.state.bloom import (
    BloomFilter,
    bloom_semi_join,
)


def test_no_false_negatives_bounded_false_positives():
    keys = [f"k{i}" for i in range(2000)]
    bf = BloomFilter.build(keys, fpr=0.01)
    assert all(k in bf for k in keys)  # never a false negative
    others = [f"x{i}" for i in range(5000)]
    fp = sum(1 for o in others if o in bf)
    assert fp / len(others) < 0.05  # ~1% target, generous bound


def test_deterministic():
    a = BloomFilter.build(["a", "b", "c"])
    b = BloomFilter.build(["a", "b", "c"])
    assert np.array_equal(a.bits, b.bits)


def test_bloom_semi_join_dataset(ray_session):
    ds = rd.from_arrow(
        pa.table({"k": [f"k{i}" for i in range(100)], "v": list(range(100))})
    )
    bf = BloomFilter.build([f"k{i}" for i in range(0, 100, 2)], fpr=0.001)
    ref = ray.put(bf)
    kept = bloom_semi_join(ds, "k", ref).to_pandas()
    wanted = {f"k{i}" for i in range(0, 100, 2)}
    assert wanted.issubset(set(kept["k"]))  # all true matches survive
    extras = set(kept["k"]) - wanted
    assert len(extras) <= 5  # fp-bounded


def test_partial_merge_equals_single_build():
    """Distributed-build algebra: OR-merged per-slice partials == one filter
    built from the union (the dd_bloom_decontaminate pattern)."""
    keys = [f"k{i}" for i in range(1000)]
    parts = [
        BloomFilter.build(keys[i::4], n_bits=1 << 14, n_hashes=4)
        for i in range(4)
    ]
    merged = BloomFilter.merge(parts)
    single = BloomFilter.build(keys, n_bits=1 << 14, n_hashes=4)
    assert np.array_equal(merged.bits, single.bits)
    assert merged.probe_many(keys).all()
    # idempotent: merging a partial twice changes nothing
    again = BloomFilter.merge(parts + [parts[0]])
    assert np.array_equal(again.bits, merged.bits)


def test_bulk_probe_matches_scalar_contains():
    keys = [f"k{i}" for i in range(200)]
    bf = BloomFilter.build(keys, fpr=0.01)
    probes = keys[:50] + [f"x{i}" for i in range(50)]
    bulk = bf.probe_many(probes)
    assert list(bulk) == [p in bf for p in probes]
