"""P/R and throughput metrics (SURVEY.md §6 targets from BASELINE.json)."""

from __future__ import annotations


def precision_recall(
    emitted: set[tuple], golden: set[tuple]
) -> tuple[float, float, float]:
    """(precision, recall, f1) of emitted vs golden triple sets."""
    if not emitted and not golden:
        return 1.0, 1.0, 1.0
    tp = len(emitted & golden)
    p = tp / len(emitted) if emitted else 0.0
    r = tp / len(golden) if golden else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f1


def throughput(n_items: int, wall_s: float) -> float:
    return n_items / wall_s if wall_s > 0 else 0.0
