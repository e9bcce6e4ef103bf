"""Validation stage — stateless ``map_batches`` port of the reference's
Agent #3 (SURVEY.md T4: "stateless rules, no configuration needed",
``validation-agent.ts:25-29``). Pure rules live in
``functions/validate_rules.py``; this module adapts them to Arrow batches.

Three surfaces:
- node rules (E1/E2/E4 + E3 aggregates) over the small ``nodes`` table;
- mention-link rules (E3 per-link) over the mentions dataset, with the
  per-entity ``mention_count`` broadcast (small side);
- relationship rules (R1-R5) over the edges dataset, which also yields the
  ``validated`` / ``flag_for_review`` columns
  (``validation-agent.ts:205-208``).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.validate_rules import (
    is_valid,
    should_flag_for_review,
    validate_entity,
    validate_relationship,
)
from ..schema import VALIDATION_ISSUES

_ISSUE_COLS = ["domain", "key", "severity", "rule", "message"]


def _issues_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=VALIDATION_ISSUES)


def validate_nodes_table(nodes: pa.Table) -> pa.Table:
    """Entity rules over the canonicalized nodes table (driver-side; nodes is
    small by construction). E3's per-link scan is replaced by the exact
    aggregates carried on nodes (max/min score, perfect-score link count) —
    same issues, no second pass over mentions."""
    rows: list[dict] = []
    for r in nodes.to_pylist():
        issues = validate_entity(
            name=r["canonical_name"],
            mention_count=r["mention_count"],
            link_count=r["link_count"],
            relevance_scores=[],
        )
        # E3 via aggregates: out-of-range + suspicious perfect
        for s in (r["max_score"], r["min_score"]):
            if s is not None and (s < 0 or s > 1):
                issues.append(
                    {
                        "severity": "error",
                        "rule": "invalid_relevance_score",
                        "message": f"Relevance score {s} is outside valid range [0, 1]",
                    }
                )
        if r["perfect_links"] > 0 and r["mention_count"] == 1:
            issues.append(
                {
                    "severity": "warning",
                    "rule": "suspicious_perfect_score",
                    "message": "Relevance 1.0 but concept mentioned in only 1 document - may be overstated",
                }
            )
        for i in issues:
            rows.append(
                {
                    "domain": "entity",
                    "key": r["canonical_name"],
                    **i,
                }
            )
    return _issues_table(rows)


def validate_edges_batch(batch: pa.Table) -> pa.Table:
    """Stateless ``map_batches`` fn: appends ``validated`` and
    ``flag_for_review`` columns (reference writes validated=true back to the
    DB, ``database.ts:406-414``; we carry it as a column)."""
    validated, flagged = [], []
    for r in zip(
        batch.column("subj_id").to_pylist(),
        batch.column("obj_id").to_pylist(),
        batch.column("pred").to_pylist(),
        batch.column("confidence").to_pylist(),
        batch.column("context").to_pylist(),
    ):
        issues = validate_relationship(r[0], r[1], r[2], r[3], r[4])
        validated.append(is_valid(issues))
        flagged.append(should_flag_for_review(r[3], issues))
    out = batch.append_column("validated", pa.array(validated, pa.bool_()))
    return out.append_column("flag_for_review", pa.array(flagged, pa.bool_()))


def edge_issues_batch(batch: pa.Table) -> pa.Table:
    """Issue rows for the validation report (S8 analog,
    ``run-validation.ts:186-228``)."""
    rows: list[dict] = []
    for r in zip(
        batch.column("subj_id").to_pylist(),
        batch.column("obj_id").to_pylist(),
        batch.column("pred").to_pylist(),
        batch.column("confidence").to_pylist(),
        batch.column("context").to_pylist(),
        batch.column("url").to_pylist(),
    ):
        for i in validate_relationship(r[0], r[1], r[2], r[3], r[4]):
            rows.append(
                {
                    "domain": "relationship",
                    "key": f"{r[0]}|{r[2]}|{r[1]}|{r[5]}",
                    **i,
                }
            )
    return _issues_table(rows)


def summarize_issues(issue_rows: list[dict], n_entities: int, n_edges: int) -> dict:
    """Validation summary reduce (A7, ``validation-agent.ts:398-439``)."""
    by_sev: dict[str, int] = {"error": 0, "warning": 0, "info": 0}
    by_rule: dict[str, int] = {}
    for r in issue_rows:
        by_sev[r["severity"]] = by_sev.get(r["severity"], 0) + 1
        by_rule[r["rule"]] = by_rule.get(r["rule"], 0) + 1
    return {
        "total_entities": n_entities,
        "total_relationships": n_edges,
        "issues_by_severity": by_sev,
        "issues_by_rule": dict(sorted(by_rule.items())),
        "total_issues": len(issue_rows),
    }
