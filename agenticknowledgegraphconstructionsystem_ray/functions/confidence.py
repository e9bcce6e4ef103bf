"""The reference's deterministic base-confidence formula, bit-for-bit.

Source: ``/root/reference/agents/src/agents/relationship-discovery-agent.ts:43-60``
(``calculateBaseConfidence``): given the relevance scores of concepts shared
between two papers, weight by relevance band and clamp to [0.3, 0.85].

In this engine the "shared concepts" of a triple (subj, pred, obj) on page u
are the OTHER entities co-mentioned on u, with their per-page relevance
scores — same formula, web-page domain.
"""

from __future__ import annotations

from collections.abc import Iterable

# relationship-discovery-agent.ts:50-59 — the single source of truth for the
# band thresholds and weights; both the list form and the counts form below
# (and the O(1) per-triple path in stages/triples.py) use these.
HIGH_BAND = 0.7
MED_BAND = 0.5
LOW_BAND = 0.4
HIGH_WEIGHT = 0.15
MED_WEIGHT = 0.08
LOW_WEIGHT = 0.04
MIN_CONFIDENCE = 0.3
MAX_CONFIDENCE = 0.85


def confidence_from_band_counts(high: int, med: int, low: int, total: int) -> float:
    """The formula on pre-computed band counts (``total`` = number of shared
    concepts; 0 -> minimum confidence)."""
    if total <= 0:
        return MIN_CONFIDENCE
    score = high * HIGH_WEIGHT + med * MED_WEIGHT + low * LOW_WEIGHT
    return min(MAX_CONFIDENCE, max(MIN_CONFIDENCE, score))


def calculate_base_confidence(shared_relevances: Iterable[float]) -> float:
    """Bit-for-bit port of calculateBaseConfidence.

    - no shared concepts -> 0.3 (minimum confidence)
    - else 0.15*|high >= 0.7| + 0.08*|0.5 <= med < 0.7| + 0.04*|0.4 <= low < 0.5|
      clamped to [0.3, 0.85]
    """
    rels = list(shared_relevances)
    high = sum(1 for r in rels if r >= HIGH_BAND)
    med = sum(1 for r in rels if MED_BAND <= r < HIGH_BAND)
    low = sum(1 for r in rels if LOW_BAND <= r < MED_BAND)
    return confidence_from_band_counts(high, med, low, len(rels))
