"""Entity/record cleaning + closed-enum normalization (pure kernels).

Ports the reference's cleaner semantics:
- ``cleanEntity`` (``entity-extraction-agent.ts:208-216``): trim; name <= 255
  chars; context <= 500 chars; clamp score to [0, 1].
- ``normalizeConceptType`` (``entity-extraction-agent.ts:221-240``): lowercase,
  membership test against the closed 7-value enum, fallback ``"concept"``.
- date normalization (``extract_and_populate.py:122-125``): ISO timestamp ->
  date via ``split('T')[0]``.
- CSV field cleaning (``fetch_citing_papers.py:73``).
"""

from __future__ import annotations

from .triples import CONCEPT_TYPES, CONTEXT_MAX_CHARS, NAME_MAX_CHARS

_CONCEPT_TYPE_SET = frozenset(CONCEPT_TYPES)


def clamp01(x: float) -> float:
    """``Math.max(0, Math.min(1, x))`` — entity-extraction-agent.ts:213."""
    return max(0.0, min(1.0, x))


def normalize_concept_type(t: str | None) -> str:
    """Closed-enum coercion with 'concept' fallback
    (entity-extraction-agent.ts:221-240)."""
    if t is None:
        return "concept"
    n = t.lower()
    return n if n in _CONCEPT_TYPE_SET else "concept"


def clean_entity(
    name: str, ent_type: str | None, description: str, score: float, context: str
) -> dict:
    """cleanEntity port (entity-extraction-agent.ts:208-216)."""
    return {
        "name": name.strip()[:NAME_MAX_CHARS],
        "type": normalize_concept_type(ent_type),
        "description": description.strip(),
        "relevance_score": clamp01(score),
        "context_snippet": context.strip()[:CONTEXT_MAX_CHARS],
    }


def iso_date(ts: str) -> str:
    """``"2023-08-04T17:59:59Z" -> "2023-08-04"`` — extract_and_populate.py:122-125."""
    return ts.split("T")[0]


def csv_clean(field: str) -> str:
    """``title.replace(',', ';').replace('\\n', ' ')`` — fetch_citing_papers.py:73."""
    return field.replace(",", ";").replace("\n", " ")
