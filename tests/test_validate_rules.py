"""Adversarial validation-rule fixtures (FIXTURES.md §6; rules from
validation-agent.ts)."""

from agenticknowledgegraphconstructionsystem_ray.functions.validate_rules import (
    is_valid,
    should_flag_for_review,
    validate_entity,
    validate_relationship,
)


def rules(issues):
    return sorted(i["rule"] for i in issues)


class TestEntityRules:
    def test_generic_term_error(self):
        issues = validate_entity("method", 5, 3, [])
        assert "no_generic_terms" in rules(issues)
        assert not is_valid(issues)

    def test_short_and_long_names(self):
        assert "name_too_short" in rules(validate_entity("x", 1, 1, []))
        assert "name_too_long" in rules(validate_entity("y" * 120, 1, 1, []))

    def test_score_out_of_range(self):
        issues = validate_entity("NeRF", 3, 2, [1.5, -0.2])
        assert rules(issues).count("invalid_relevance_score") == 2
        assert not is_valid(issues)

    def test_suspicious_perfect(self):
        issues = validate_entity("NeRF", 1, 1, [1.0])
        assert "suspicious_perfect_score" in rules(issues)
        assert is_valid(issues)  # warning only

    def test_mention_count_mismatch(self):
        issues = validate_entity("NeRF", 2, 5, [])
        assert "mention_count_mismatch" in rules(issues)

    def test_clean_entity_passes(self):
        assert validate_entity("Gaussian Splatting", 10, 4, [0.6, 0.8]) == []


class TestRelationshipRules:
    GOOD_EXPL = "This work improves the baseline substantially."

    def test_self_reference_error(self):
        issues = validate_relationship(7, 7, "improves_on", 0.8, self.GOOD_EXPL)
        assert "self_reference" in rules(issues)
        assert not is_valid(issues)

    def test_confidence_bands(self):
        assert "invalid_confidence" in rules(
            validate_relationship(1, 2, "improves_on", 1.2, self.GOOD_EXPL)
        )
        r45 = rules(validate_relationship(1, 2, "improves_on", 0.45, self.GOOD_EXPL))
        assert "low_confidence" in r45 and "very_low_confidence" not in r45
        r25 = rules(validate_relationship(1, 2, "improves_on", 0.25, self.GOOD_EXPL))
        assert "low_confidence" in r25 and "very_low_confidence" in r25

    def test_type_keyword_mismatch(self):
        issues = validate_relationship(
            1, 2, "improves_on", 0.8, "completely unrelated text here okay"
        )
        assert "type_explanation_mismatch" in rules(issues)

    def test_null_type(self):
        high = rules(validate_relationship(1, 2, None, 0.8, self.GOOD_EXPL))
        assert "null_type_high_confidence" in high
        low = rules(validate_relationship(1, 2, None, 0.2, self.GOOD_EXPL))
        assert "null_type_low_confidence" in low

    def test_explanation_quality(self):
        assert "explanation_too_short" in rules(
            validate_relationship(1, 2, "extends", 0.8, "adds stuff")
        )
        r = rules(
            validate_relationship(1, 2, "extends", 0.8, "Not explicitly stated in abstract")
        )
        assert "explanation_missing" in r

    def test_flag_for_review(self):
        issues = validate_relationship(1, 2, "improves_on", 0.45, self.GOOD_EXPL)
        assert should_flag_for_review(0.45, issues)
        clean = validate_relationship(1, 2, "improves_on", 0.9, self.GOOD_EXPL)
        assert not should_flag_for_review(0.9, clean)
