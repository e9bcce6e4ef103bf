"""Bloom filter for broadcast semi/anti-joins at scale.

The broadcast-keyset join pattern (guide: "Semi/anti join: broadcast the key
set (or a Bloom filter of it)") ships the exact key set when it fits; when
the key side is large, ship this fixed-size Bloom filter instead:
- semi-join via Bloom keeps all true matches plus ~fpr false positives
  (callers needing exactness follow with an exact check on the survivors);
- anti-join via Bloom drops all true matches plus ~fpr false negatives on
  the complement — only safe where approximate filtering is acceptable
  (e.g. pre-filtering before an exact join).

Deterministic (blake2b-derived hash positions), numpy bit array, cheap to
``ray.put``.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fpr: float = 0.01) -> None:
        capacity = max(1, capacity)
        self.n_bits = max(
            8, int(-capacity * math.log(fpr) / (math.log(2) ** 2))
        )
        self.n_hashes = max(1, round(self.n_bits / capacity * math.log(2)))
        self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    def _positions(self, key) -> np.ndarray:
        digest = hashlib.blake2b(str(key).encode(), digest_size=16).digest()
        h1 = int.from_bytes(digest[:8], "big")
        h2 = int.from_bytes(digest[8:], "big") | 1
        i = np.arange(self.n_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.n_bits)).astype(
                np.int64
            )

    def add(self, key) -> None:
        pos = self._positions(key)
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def __contains__(self, key) -> bool:
        pos = self._positions(key)
        return bool(np.all(self.bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)))

    @classmethod
    def build(cls, keys, fpr: float = 0.01) -> "BloomFilter":
        keys = list(keys)
        bf = cls(len(keys), fpr)
        for k in keys:
            bf.add(k)
        return bf


_WORKER_BLOOMS: dict = {}


def bloom_semi_join(ds, key_column: str, bloom_ref):
    """Approximate semi-join: keep rows whose key is (probably) in the
    broadcast Bloom filter. Exact follow-up is the caller's choice.

    The filter object is resolved from the object store ONCE per worker
    process and cached (same pattern as stages/triples.extract_records_batch)
    — never re-fetched per batch."""
    import pyarrow as pa

    def fil(t: pa.Table, _ref=bloom_ref) -> pa.Table:
        if hasattr(_ref, "hex"):
            bf = _WORKER_BLOOMS.get(_ref.hex())
            if bf is None:
                import ray

                bf = ray.get(_ref)
                _WORKER_BLOOMS[_ref.hex()] = bf
        else:
            bf = _ref
        mask = pa.array([k in bf for k in t[key_column].to_pylist()])
        return t.filter(mask)

    return ds.map_batches(fil, batch_format="pyarrow")
