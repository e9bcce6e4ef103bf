"""Count-Min sketch kernel (pure, deterministic, numpy-vectorized).

The approximate point-frequency sketch a 100 TB pipeline uses where an
exact per-term count (q14) would shuffle the full open vocabulary: each
block folds its token counts into a fixed D x W int64 matrix (32 KiB), the
merge is elementwise addition (commutative + associative, the standard CMS
algebra — Ray's aggregate consumes each block partial exactly once), and a
point query reads min over D row cells, which can only OVERcount (Cormode &
Muthukrishnan 2005): est >= exact always, and
P[est > exact + eps * N] <= (1/2)^D with W = ceil(e / eps).

Kernel contract (everything deterministic):
- D = 4 rows, W = 1024 columns (eps ~ e/1024 = 0.27 % of total mass);
- row hash r of token t: blake2b-64 of ``f"{r}:{t}"`` mod W — no
  process-seeded hashing, so distributed and sequential builds agree
  bit-for-bit.

Shared by the distributed stage (stages/sketch.py) AND the sequential
golden (goldens.py) — per NOTES.md invariant 1 the kernel is common while
the orchestration is recomputed independently.
"""

from __future__ import annotations

import hashlib

import numpy as np

D = 4
W = 1024


def _row_hash(row: int, tokens: list[str]) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    f"{row}:{t}".encode("utf-8"), digest_size=8
                ).digest(),
                "big",
            )
            % W
            for t in tokens
        ),
        dtype=np.int64,
        count=len(tokens),
    )


def empty() -> np.ndarray:
    return np.zeros((D, W), np.int64)


def update(m: np.ndarray, tokens: list[str], counts: np.ndarray) -> None:
    """Fold (token, count) pairs into the matrix in place."""
    if not tokens:
        return
    c = np.asarray(counts, np.int64)
    for r in range(D):
        np.add.at(m[r], _row_hash(r, tokens), c)


def sketch_of(counts: dict[str, int]) -> np.ndarray:
    m = empty()
    toks = list(counts.keys())
    update(m, toks, np.fromiter(counts.values(), np.int64, len(toks)))
    return m


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def estimate(m: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point-query estimates: min over the D counters of each token."""
    if not tokens:
        return np.zeros(0, np.int64)
    ests = np.stack([m[r][_row_hash(r, tokens)] for r in range(D)])
    return ests.min(axis=0)
