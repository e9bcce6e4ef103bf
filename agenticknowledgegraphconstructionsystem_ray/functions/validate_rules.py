"""Rule-based validation — pure port of the reference's Agent #3 semantics.

Source: ``/root/reference/agents/src/agents/validation-agent.ts`` (entirely
deterministic, "No configuration needed", :25-29). Entity rules validate the
canonicalized ``nodes`` table; relationship rules validate the deduplicated
``edges``/triples table. Severities: error | warning | info
(``types.ts:154-157``). Validity = no 'error' issues (``:56,205``);
flag-for-review = confidence < 0.5 OR any warning (``:206-208``).

Pure functions over plain values so the Ray stage, the oracle and the unit
tests all share them.
"""

from __future__ import annotations

# Rule 1 blocklist — validation-agent.ts:69-74 (16 terms).
GENERIC_TERMS = frozenset(
    {
        "paper", "research", "method", "technique", "approach", "study",
        "experiment", "result", "conclusion", "abstract", "introduction",
        "related work", "future work", "dataset", "metric", "evaluation",
    }
)

# Rule 3 keyword map — validation-agent.ts:301-308, extended with the three
# extra predicates this engine's extractor emits (same keyword-consistency
# semantics).
TYPE_KEYWORDS: dict[str, list[str]] = {
    "improves_on": ["improve", "better", "faster", "enhance", "outperform", "superior"],
    "extends": ["extend", "add", "generalize", "expand", "augment", "additional"],
    "evaluates": ["evaluate", "compare", "benchmark", "test", "measure", "assess"],
    "builds_on": ["build", "based on", "foundation", "leverage", "adopt", "use"],
    "addresses": ["address", "solve", "fix", "tackle", "handle", "overcome"],
    "cites": ["cite", "mention", "reference", "related work", "discuss"],
    "uses": ["use", "apply", "employ", "utilize", "with"],
    "introduces": ["introduce", "propose", "present", "novel", "new"],
    "outperforms": ["outperform", "beat", "exceed", "surpass", "better"],
}

PLACEHOLDER_EXPLANATION = "not explicitly stated in abstract"  # :380


def _issue(severity: str, rule: str, message: str) -> dict:
    return {"severity": severity, "rule": rule, "message": message}


def validate_entity(
    name: str, mention_count: int, link_count: int, relevance_scores: list[float]
) -> list[dict]:
    """Entity rules E1-E4 (validation-agent.ts:69-176).

    ``link_count`` = number of distinct documents linked to the entity
    (reference: paper_concepts rows); ``relevance_scores`` = per-link scores.
    """
    issues: list[dict] = []
    lower = name.lower().strip()
    stripped = name.strip()

    # E1 generic terms -> error (:69-88)
    if lower in GENERIC_TERMS:
        issues.append(
            _issue("error", "no_generic_terms", f'"{name}" is too generic to be a useful concept')
        )
    # E2 name length (:93-117)
    if len(stripped) < 2:
        issues.append(
            _issue("error", "name_too_short", f'Concept name "{stripped}" is too short ({len(stripped)} chars)')
        )
    if len(stripped) > 100:
        issues.append(
            _issue("warning", "name_too_long", f"Concept name is suspiciously long ({len(stripped)} chars)")
        )
    # E3 relevance scores (:122-152)
    for score in relevance_scores:
        if score < 0 or score > 1:
            issues.append(
                _issue("error", "invalid_relevance_score", f"Relevance score {score} is outside valid range [0, 1]")
            )
        if score == 1.0 and mention_count == 1:
            issues.append(
                _issue("warning", "suspicious_perfect_score", "Relevance 1.0 but concept mentioned in only 1 document - may be overstated")
            )
    # E4 mention consistency (:157-176)
    if mention_count < link_count:
        issues.append(
            _issue("warning", "mention_count_mismatch", f"Mention count ({mention_count}) < document links ({link_count})")
        )
    return issues


def validate_relationship(
    subj_id: int,
    obj_id: int,
    pred: str | None,
    confidence: float,
    explanation: str,
) -> list[dict]:
    """Relationship rules R1-R5 (validation-agent.ts:224-389)."""
    issues: list[dict] = []

    # R1 self-reference -> error (:224-238)
    if subj_id == obj_id:
        issues.append(_issue("error", "self_reference", "Entity cannot have a relationship with itself"))
    # R2 confidence (:243-284)
    if confidence < 0 or confidence > 1:
        issues.append(_issue("error", "invalid_confidence", f"Confidence {confidence} is outside valid range [0, 1]"))
    if 0 <= confidence < 0.5:
        issues.append(_issue("warning", "low_confidence", f"Low confidence score ({confidence:.2f}) - recommend human review"))
    if 0 <= confidence < 0.3:
        issues.append(_issue("warning", "very_low_confidence", f"Very low confidence ({confidence:.2f}) - relationship may be spurious"))
    # R3 type<->explanation keyword consistency (:289-325)
    if pred:
        expl_lower = (explanation or "").lower()
        keywords = TYPE_KEYWORDS.get(pred)
        if keywords is not None and not any(k in expl_lower for k in keywords):
            issues.append(
                _issue("warning", "type_explanation_mismatch", f'Relationship type "{pred}" but explanation doesn\'t contain expected keywords')
            )
    # R4 null type (:330-355)
    if not pred:
        if confidence > 0.5:
            issues.append(
                _issue("warning", "null_type_high_confidence", f"Relationship type is null but confidence is {confidence:.2f}")
            )
        else:
            issues.append(
                _issue("info", "null_type_low_confidence", "No meaningful relationship found (null type, low confidence)")
            )
    # R5 explanation quality (:360-389)
    expl = (explanation or "").strip()
    if len(expl) < 20:
        issues.append(_issue("warning", "explanation_too_short", f"Explanation is very short ({len(expl)} chars)"))
    if not expl or expl.lower() == PLACEHOLDER_EXPLANATION:
        issues.append(_issue("warning", "explanation_missing", "Explanation is missing or placeholder text"))
    return issues


def is_valid(issues: list[dict]) -> bool:
    """No 'error' issues (validation-agent.ts:56,205)."""
    return not any(i["severity"] == "error" for i in issues)


def should_flag_for_review(confidence: float, issues: list[dict]) -> bool:
    """confidence < 0.5 OR any warning (validation-agent.ts:206-208)."""
    return confidence < 0.5 or any(i["severity"] == "warning" for i in issues)
