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


def calculate_base_confidence(shared_relevances: Iterable[float]) -> float:
    """Bit-for-bit port of calculateBaseConfidence.

    - no shared concepts -> 0.3 (minimum confidence)
    - else 0.15*|high >= 0.7| + 0.08*|0.5 <= med < 0.7| + 0.04*|0.4 <= low < 0.5|
      clamped to [0.3, 0.85]
    """
    rels = list(shared_relevances)
    if not rels:
        return 0.3
    high = sum(1 for r in rels if r >= 0.7)
    med = sum(1 for r in rels if 0.5 <= r < 0.7)
    low = sum(1 for r in rels if 0.4 <= r < 0.5)
    score = high * 0.15 + med * 0.08 + low * 0.04
    return min(0.85, max(0.3, score))
