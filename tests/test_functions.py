"""Unit tests for the deterministic business-logic kernels (SURVEY.md §2.9)."""

import pytest

from agenticknowledgegraphconstructionsystem_ray.functions.cleaning import (
    clamp01,
    clean_entity,
    csv_clean,
    iso_date,
    normalize_concept_type,
)
from agenticknowledgegraphconstructionsystem_ray.functions.confidence import (
    calculate_base_confidence,
)
from agenticknowledgegraphconstructionsystem_ray.functions.textnorm import (
    norm_surface,
    split_sentences,
)
from agenticknowledgegraphconstructionsystem_ray.functions.triples import (
    extract_mentions_and_triples,
    mention_relevance,
)


class TestConfidence:
    """Bit-for-bit vs relationship-discovery-agent.ts:43-60."""

    def test_no_shared(self):
        assert calculate_base_confidence([]) == 0.3

    def test_weighted_bands(self):
        # 2 high (0.15 each) + 1 med (0.08) + 1 low (0.04) = 0.42
        assert calculate_base_confidence([0.9, 0.7, 0.5, 0.4]) == pytest.approx(0.42)

    def test_clamp_floor(self):
        # 1 low = 0.04 -> clamped up to 0.3
        assert calculate_base_confidence([0.45]) == 0.3

    def test_clamp_ceiling(self):
        assert calculate_base_confidence([0.9] * 10) == 0.85

    def test_band_edges(self):
        # 0.7 is high; 0.5 is med; 0.4 is low; 0.39 counts nothing
        assert calculate_base_confidence([0.39]) == 0.3
        assert calculate_base_confidence([0.7] * 3) == pytest.approx(0.45)


class TestCleaning:
    def test_clamp(self):
        assert clamp01(1.5) == 1.0
        assert clamp01(-0.2) == 0.0

    def test_type_normalization(self):
        assert normalize_concept_type("METHOD") == "method"
        assert normalize_concept_type("weird") == "concept"
        assert normalize_concept_type(None) == "concept"

    def test_clean_entity_truncation(self):
        e = clean_entity("x" * 300, "Dataset", " d ", 1.7, "c" * 600)
        assert len(e["name"]) == 255
        assert e["type"] == "dataset"
        assert e["relevance_score"] == 1.0
        assert len(e["context_snippet"]) == 500

    def test_iso_date(self):
        assert iso_date("2023-08-04T17:59:59Z") == "2023-08-04"

    def test_csv_clean(self):
        assert csv_clean("a,b\nc") == "a;b c"


class TestTextNorm:
    def test_norm_surface(self):
        assert norm_surface("  Neural   Radiance Fields! ") == "neural radiance fields"
        assert norm_surface("(NeRF)") == "nerf"

    def test_sentences(self):
        assert split_sentences("A b. C d! E?") == ["A b.", "C d!", "E?"]
        assert split_sentences("line one\nline two") == ["line one", "line two"]


class TestExtraction:
    def test_svo(self):
        _, tr = extract_mentions_and_triples("NeRF improves on Plenoxels.")
        assert [(t.subj, t.pred, t.obj) for t in tr] == [
            ("NeRF", "improves_on", "Plenoxels")
        ]

    def test_multiword_and_hyphen(self):
        m, tr = extract_mentions_and_triples(
            "Neural Radiance Fields extends Instant-NGP."
        )
        assert [(t.subj, t.pred, t.obj) for t in tr] == [
            ("Neural Radiance Fields", "extends", "Instant-NGP")
        ]

    def test_stopword_not_entity(self):
        m, tr = extract_mentions_and_triples("The system runs fast.")
        assert m == [] and tr == []

    def test_bare_number_not_entity(self):
        m, _ = extract_mentions_and_triples("In 2024 nothing happened.")
        assert m == []

    def test_no_pred_no_triple(self):
        _, tr = extract_mentions_and_triples("NeRF resembles Plenoxels.")
        assert tr == []

    def test_empty(self):
        assert extract_mentions_and_triples("") == ([], [])

    def test_relevance(self):
        assert mention_relevance(1) == pytest.approx(0.4)
        assert mention_relevance(4) == 1.0
        assert mention_relevance(100) == 1.0
