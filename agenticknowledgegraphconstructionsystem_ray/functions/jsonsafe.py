"""Poison-tolerant JSON parsing (pure kernel).

Reference analog (M6, SURVEY.md §2.2): the LLM-JSON response parser strips
``` fences, parses, and on failure logs + returns an empty result — NEVER
crashes the pipeline (``entity-extraction-agent.ts:163-188``; same pattern
``relationship-discovery-agent.ts:275-335``). Malformed rows degrade to None
plus an error count, which the caller surfaces as a metric.
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"^```(?:json)?\s*|\s*```$", re.MULTILINE)


def strip_fences(s: str) -> str:
    """Remove markdown code fences (entity-extraction-agent.ts:169)."""
    return _FENCE_RE.sub("", s).strip()


_PARSE_FAILED = object()  # distinguishes a failure from a valid JSON null


def _parse(s: str | None):
    if not s:
        return None
    try:
        return json.loads(strip_fences(s))
    except (json.JSONDecodeError, TypeError, ValueError):
        return _PARSE_FAILED


def safe_parse_json(s: str | None):
    """Parse s (fence-stripped) -> object; None for empty input, a valid
    JSON null, OR any failure (use parse_many for an exact error count)."""
    out = _parse(s)
    return None if out is _PARSE_FAILED else out


def parse_many(values: list[str | None]) -> tuple[list, int]:
    """Batch parse -> (results with None for bad rows, error count). A valid
    JSON ``null`` is an empty-but-valid result, not an error."""
    out = []
    errors = 0
    for v in values:
        parsed = _parse(v)
        if parsed is _PARSE_FAILED:
            errors += 1
            parsed = None
        out.append(parsed)
    return out, errors
