"""The vectorized edge-rule masks must agree row-for-row with the pure
reference-parity functions (functions/validate_rules.py)."""

import numpy as np
import pyarrow as pa

from agenticknowledgegraphconstructionsystem_ray.functions.validate_rules import (
    is_valid,
    should_flag_for_review,
    validate_relationship,
)
from agenticknowledgegraphconstructionsystem_ray.stages.validate import (
    EDGE_RULES,
    edge_rule_masks,
    validate_edges_batch,
)


def _random_batch(n=500, seed=3):
    rng = np.random.default_rng(seed)
    preds = [
        "improves_on", "extends", "evaluates", "builds_on", "addresses",
        "cites", "uses", "introduces", "outperforms", None,
    ]
    contexts = [
        "This work improves the baseline substantially and runs faster.",
        "short",
        "",
        "Not explicitly stated in abstract",
        "We extend and generalize the approach with additional modules.",
        "completely unrelated words that mention nothing of note here",
    ]
    subj = rng.integers(0, 50, n)
    obj = rng.integers(0, 50, n)
    conf = rng.choice([-0.5, 0.0, 0.25, 0.45, 0.5, 0.7, 1.0, 1.3], n)
    return pa.table(
        {
            "subj_id": pa.array(subj, pa.int64()),
            "obj_id": pa.array(obj, pa.int64()),
            "pred": pa.array([preds[i % len(preds)] for i in range(n)], pa.string()),
            "confidence": pa.array(conf, pa.float64()),
            "context": pa.array([contexts[i % len(contexts)] for i in range(n)], pa.string()),
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
        }
    )


def test_masks_match_pure_rules():
    batch = _random_batch()
    masks = {k: v.to_pylist() for k, v in edge_rule_masks(batch).items()}
    rows = batch.to_pylist()
    for i, r in enumerate(rows):
        issues = validate_relationship(
            r["subj_id"], r["obj_id"], r["pred"], r["confidence"], r["context"]
        )
        pure_rules = {x["rule"] for x in issues}
        vec_rules = {rule for rule in EDGE_RULES if masks[rule][i]}
        assert vec_rules == pure_rules, (i, r, vec_rules, pure_rules)


def test_validated_flag_match_pure():
    batch = _random_batch(seed=9)
    out = validate_edges_batch(batch).to_pylist()
    for r in out:
        issues = validate_relationship(
            r["subj_id"], r["obj_id"], r["pred"], r["confidence"], r["context"]
        )
        assert r["validated"] == is_valid(issues)
        assert r["flag_for_review"] == should_flag_for_review(r["confidence"], issues)
