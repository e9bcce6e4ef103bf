"""HyperLogLog sketch kernel (pure, deterministic, numpy-vectorized).

The approximate-distinct-count sketch a 100 TB pipeline uses where the exact
dedup-then-count (q10) would shuffle the full key set: per-block register
partials are tiny (REG_M bytes), merge is an elementwise max (commutative,
associative, idempotent — safe under Ray's arbitrary block order and task
retries), and the estimate is computed once at finalize.

Kernel contract (everything deterministic):
- hash: blake2b-64 of the utf-8 key (no process-seeded hashing);
- p = 12 -> m = 4096 registers, standard error ~1.04/sqrt(m) = 1.6 %;
- estimator: Flajolet et al. 2007 with the small-range LinearCounting
  correction (the large-range correction is unnecessary with 64-bit
  hashes). Float determinism: fixed-order numpy sum over the 4096
  registers, single math.log — identical in-container across runs, which
  is what the golden-file comparison requires.

Shared by the distributed stage (stages/sketch.py) AND the sequential
golden (goldens.py) — per NOTES.md invariant 1 the kernel is common while
the orchestration is recomputed independently.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

P = 12
REG_M = 1 << P  # 4096
_ALPHA = 0.7213 / (1.0 + 1.079 / REG_M)
_W_BITS = 64 - P


def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of utf-8 strings (blake2b digest head)."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(v.encode("utf-8"), digest_size=8).digest(), "big"
            )
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def _bit_length(w: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length (no float log2 — exact for all 64-bit
    values; floor(log2(2^k - 1)) rounds wrong in float64 for large k)."""
    bl = np.zeros(w.shape, np.int64)
    cur = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        t = cur >> np.uint64(s)
        has = t > 0
        bl += s * has
        cur = np.where(has, t, cur)
    return bl + (cur > 0)


def update_registers(reg: np.ndarray, h: np.ndarray) -> None:
    """Fold hashes into a register array in place. reg: uint8[REG_M]."""
    if not len(h):
        return
    idx = (h >> np.uint64(_W_BITS)).astype(np.int64)
    w = h & np.uint64((1 << _W_BITS) - 1)
    rho = (_W_BITS - _bit_length(w) + 1).astype(np.uint8)  # w==0 -> _W_BITS+1
    np.maximum.at(reg, idx, rho)


def sketch_of(values) -> np.ndarray:
    """One-shot: values -> uint8[REG_M] register array."""
    reg = np.zeros(REG_M, np.uint8)
    update_registers(reg, hash64(values))
    return reg


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(reg: np.ndarray) -> int:
    """Cardinality estimate (int). Deterministic: fixed-order sum."""
    powers = np.ldexp(1.0, -reg.astype(np.int64))  # exact 2^-r
    e = _ALPHA * REG_M * REG_M / float(powers.sum())
    if e <= 2.5 * REG_M:
        zeros = int((reg == 0).sum())
        if zeros:
            e = REG_M * math.log(REG_M / zeros)
    return int(e + 0.5)
