"""Validation stage — stateless ``map_batches`` port of the reference's
Agent #3 (SURVEY.md T4: "stateless rules, no configuration needed",
``validation-agent.ts:25-29``).

Two implementations of the relationship rules:
- the pure per-row functions in ``functions/validate_rules.py`` (bit-for-bit
  reference parity, unit-tested, used by the oracle);
- the VECTORIZED mask path here (pyarrow.compute kernels, no Python loop in
  the hot stage). ``tests/test_validate_vectorized.py`` asserts the two
  paths agree row-for-row, so the fast path inherits the parity guarantee.

Pipeline issue rows carry static per-rule messages (the rule id is the
payload); the reference's value-interpolated message strings are available
via the pure path when needed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.validate_rules import (
    PLACEHOLDER_EXPLANATION,
    TYPE_KEYWORDS,
    validate_entity,
)
from ..schema import VALIDATION_ISSUES

# rule -> (severity, static message)
EDGE_RULES: dict[str, tuple[str, str]] = {
    "self_reference": ("error", "Entity cannot have a relationship with itself"),
    "invalid_confidence": ("error", "Confidence is outside valid range [0, 1]"),
    "low_confidence": ("warning", "Low confidence score - recommend human review"),
    "very_low_confidence": ("warning", "Very low confidence - relationship may be spurious"),
    "type_explanation_mismatch": ("warning", "Relationship type keywords absent from explanation"),
    "null_type_high_confidence": ("warning", "Relationship type is null but confidence is high"),
    "null_type_low_confidence": ("info", "No meaningful relationship found (null type, low confidence)"),
    "explanation_too_short": ("warning", "Explanation is very short"),
    "explanation_missing": ("warning", "Explanation is missing or placeholder text"),
}


def _issues_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=VALIDATION_ISSUES)


def edge_rule_masks(batch: pa.Table) -> dict[str, pa.Array]:
    """Vectorized R1-R5 rule masks (validation-agent.ts:224-389 semantics)."""
    conf = pc.coalesce(batch["confidence"], pa.scalar(-1.0, pa.float64()))
    subj_id = batch["subj_id"]
    obj_id = batch["obj_id"]
    pred = batch["pred"]
    ctx = pc.coalesce(batch["context"], pa.scalar("", pa.string()))
    trimmed = pc.utf8_trim_whitespace(ctx)
    lower = pc.utf8_lower(ctx)
    lower_trimmed = pc.utf8_lower(trimmed)
    false = pa.scalar(False)

    pred_null = pc.coalesce(
        pc.or_(pc.is_null(pred), pc.equal(pred, "")), pa.scalar(True)
    )
    in01 = pc.and_(pc.greater_equal(conf, 0.0), pc.less_equal(conf, 1.0))

    masks: dict[str, pa.Array] = {}
    masks["self_reference"] = pc.equal(subj_id, obj_id)
    masks["invalid_confidence"] = pc.invert(in01)
    masks["low_confidence"] = pc.and_(pc.greater_equal(conf, 0.0), pc.less(conf, 0.5))
    masks["very_low_confidence"] = pc.and_(pc.greater_equal(conf, 0.0), pc.less(conf, 0.3))

    mismatch = pa.array([False] * batch.num_rows)
    for p, kws in TYPE_KEYWORDS.items():
        eq = pc.coalesce(pc.equal(pred, p), false)
        any_kw = pa.array([False] * batch.num_rows)
        for kw in kws:
            any_kw = pc.or_(any_kw, pc.match_substring(lower, kw))
        mismatch = pc.or_(mismatch, pc.and_(eq, pc.invert(any_kw)))
    masks["type_explanation_mismatch"] = mismatch

    masks["null_type_high_confidence"] = pc.and_(pred_null, pc.greater(conf, 0.5))
    masks["null_type_low_confidence"] = pc.and_(pred_null, pc.less_equal(conf, 0.5))
    masks["explanation_too_short"] = pc.less(pc.utf8_length(trimmed), 20)
    masks["explanation_missing"] = pc.or_(
        pc.equal(trimmed, ""), pc.equal(lower_trimmed, PLACEHOLDER_EXPLANATION)
    )
    return {k: pc.coalesce(v, false) for k, v in masks.items()}


def validate_edges_batch(batch: pa.Table) -> pa.Table:
    """Appends ``validated`` / ``flag_for_review`` columns (reference writes
    validated=true back to the DB, ``database.ts:406-414``). Also restores
    warc_ts to us precision (Ray's sort/agg may narrow it)."""
    m = edge_rule_masks(batch)
    error_any = pc.or_(m["self_reference"], m["invalid_confidence"])
    warning_any = None
    for rule, (sev, _) in EDGE_RULES.items():
        if sev != "warning":
            continue
        warning_any = m[rule] if warning_any is None else pc.or_(warning_any, m[rule])
    conf = pc.coalesce(batch["confidence"], pa.scalar(-1.0, pa.float64()))
    flag = pc.or_(pc.less(conf, 0.5), warning_any)

    out = batch
    i = out.schema.get_field_index("warc_ts")
    if i >= 0 and out.schema.field(i).type != pa.timestamp("us"):
        out = out.set_column(
            i, "warc_ts", pc.cast(out.column("warc_ts"), pa.timestamp("us"))
        )
    out = out.append_column("validated", pc.invert(error_any))
    return out.append_column("flag_for_review", flag)


def edge_issues_batch(batch: pa.Table) -> pa.Table:
    """Issue rows for the validation report (S8 analog,
    ``run-validation.ts:186-228``) — one row per (edge, triggered rule)."""
    m = edge_rule_masks(batch)
    key = pc.binary_join_element_wise(
        pc.cast(batch["subj_id"], pa.string()),
        pc.coalesce(batch["pred"], pa.scalar("", pa.string())),
        pc.cast(batch["obj_id"], pa.string()),
        batch["url"],
        "|",
    )
    chunks = []
    for rule, (sev, msg) in EDGE_RULES.items():
        keys = pc.filter(key, m[rule])
        n = len(keys)
        if not n:
            continue
        chunks.append(
            pa.Table.from_arrays(
                [
                    pa.array(["relationship"] * n, pa.string()),
                    keys,
                    pa.array([sev] * n, pa.string()),
                    pa.array([rule] * n, pa.string()),
                    pa.array([msg] * n, pa.string()),
                ],
                schema=VALIDATION_ISSUES,
            )
        )
    if not chunks:
        return _issues_table([])
    return pa.concat_tables(chunks)


def issue_count_batch(t: pa.Table) -> pa.Table:
    """Block-level (severity, rule) counts — combiner for the report summary."""
    t = t.select(["severity", "rule"]).append_column(
        "one", pa.array([1] * t.num_rows, pa.int64())
    )
    g = t.group_by(["severity", "rule"]).aggregate([("one", "sum")])
    return pa.Table.from_arrays(
        [
            g.column("severity"),
            g.column("rule"),
            pc.cast(g.column("one_sum"), pa.int64()),
        ],
        names=["severity", "rule", "n"],
    )


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
            rows.append({"domain": "entity", "key": r["canonical_name"], **i})
    return _issues_table(rows)


def summarize_issues(
    by_rule_sev: dict[tuple[str, str], int], n_entities: int, n_edges: int
) -> dict:
    """Validation summary reduce (A7, ``validation-agent.ts:398-439``) from
    pre-aggregated (severity, rule) counts."""
    by_sev: dict[str, int] = {"error": 0, "warning": 0, "info": 0}
    by_rule: dict[str, int] = {}
    for (sev, rule), n in by_rule_sev.items():
        by_sev[sev] = by_sev.get(sev, 0) + n
        by_rule[rule] = by_rule.get(rule, 0) + n
    return {
        "total_entities": n_entities,
        "total_relationships": n_edges,
        "issues_by_severity": by_sev,
        "issues_by_rule": dict(sorted(by_rule.items())),
        "total_issues": sum(by_rule.values()),
    }
