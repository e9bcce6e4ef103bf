"""Deterministic rule-based NER + SVO triple extraction (pure kernel).

Plays the role of the reference's LLM entity-extraction agent and
relationship-discovery agent
(``/root/reference/agents/src/agents/entity-extraction-agent.ts:30-79``,
``relationship-discovery-agent.ts:65-120``) with the closed predicate set
mirroring the reference's closed ``RelationshipType`` enum
(``agents/src/types.ts:73-79``). The LLM is replaced by a deterministic
pattern extractor ("spaCy/OpenIE-style" role per the north star) so that the
distributed pipeline can be verified exactly against a sequential oracle.

All functions are pure per-document; the stateful part (compiled patterns)
is held by the actor-pool stage in ``stages/triples.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from .textnorm import (
    CAP_STOPWORDS,
    is_entity_token,
    norm_surface,
    split_sentences,
    tokenize_with_spans,
)

# Closed predicate set. The 6 reference RelationshipTypes
# (types.ts:73-79: improves_on, extends, evaluates, builds_on, addresses,
# cites) plus three generic OpenIE verbs common in web text.
PREDICATE_PHRASES: dict[str, str] = {
    "improves on": "improves_on",
    "improves upon": "improves_on",
    "extends": "extends",
    "evaluates": "evaluates",
    "builds on": "builds_on",
    "builds upon": "builds_on",
    "addresses": "addresses",
    "cites": "cites",
    "uses": "uses",
    "introduces": "introduces",
    "outperforms": "outperforms",
}

MAX_PREDICATE_TOKENS = max(len(p.split()) for p in PREDICATE_PHRASES)

# Closed entity-type set — the reference's 7-value ConceptType enum
# (types.ts:64-71); out-of-enum types coerce to "concept"
# (entity-extraction-agent.ts:221-240).
CONCEPT_TYPES = (
    "method",
    "technique",
    "dataset",
    "metric",
    "concept",
    "architecture",
    "algorithm",
)

CONTEXT_MAX_CHARS = 500  # entity-extraction-agent.ts:214 (context -> <=500)
NAME_MAX_CHARS = 255  # entity-extraction-agent.ts:210 (name -> <=255)


@dataclass(frozen=True)
class Mention:
    surface: str
    norm: str
    start: int  # char offset within the document text
    end: int
    context: str  # containing sentence, truncated to CONTEXT_MAX_CHARS


@dataclass(frozen=True)
class RawTriple:
    subj: str  # surface form
    pred: str  # normalized predicate id
    obj: str  # surface form
    context: str


def _mention_runs(
    tokens: list[tuple[str, int, int]],
) -> list[tuple[int, int]]:
    """Maximal runs [i, j) of entity tokens forming candidate mentions.
    Capitalized stopwords ("The", "In", ...) BREAK runs — they are never part
    of a mention (reference analog: generic-terms + validity predicate,
    entity-extraction-agent.ts:193-203).

    Single pass; the entity-token test is inlined (first char uppercase or
    digit — semantics of textnorm.is_entity_token) for the hot path.
    """
    runs: list[tuple[int, int]] = []
    stop = CAP_STOPWORDS
    in_run = False
    start = 0
    for i, (tok, _, _) in enumerate(tokens):
        c = tok[0]
        is_ent = (c.isupper() or c.isdigit()) and tok not in stop
        if is_ent:
            if not in_run:
                start = i
                in_run = True
        elif in_run:
            runs.append((start, i))
            in_run = False
    if in_run:
        runs.append((start, len(tokens)))
    return runs


def _trim_run(
    tokens: list[tuple[str, int, int]], lo: int, hi: int
) -> tuple[int, int] | None:
    """Reject bare-number runs ("2024")."""
    if hi - lo == 1 and tokens[lo][0].isdigit():
        return None
    return lo, hi


def extract_mentions_and_triples(
    text: str,
) -> tuple[list[Mention], list[RawTriple]]:
    """Pure per-document extraction: sentence split -> entity-token runs ->
    predicate match between adjacent mentions.

    Deterministic, no cross-document state; shared by the Ray actor stage and
    the sequential oracle.
    """
    mentions: list[Mention] = []
    triples: list[RawTriple] = []
    if not text:
        return mentions, triples

    offset = 0
    for sent in split_sentences(text):
        # find the sentence's offset in the doc for stable char spans
        pos = text.find(sent, offset)
        if pos < 0:
            pos = offset
        offset = pos + len(sent)
        context = sent.strip()[:CONTEXT_MAX_CHARS]

        tokens = tokenize_with_spans(sent)
        runs = [
            trimmed
            for lo, hi in _mention_runs(tokens)
            if (trimmed := _trim_run(tokens, lo, hi)) is not None
        ]

        sent_mentions: list[Mention] = []
        for lo, hi in runs:
            start = tokens[lo][1]
            end = tokens[hi - 1][2]
            surface = sent[start:end][:NAME_MAX_CHARS]
            sent_mentions.append(
                Mention(
                    surface=surface,
                    norm=norm_surface(surface),
                    start=pos + start,
                    end=pos + end,
                    context=context,
                )
            )
        mentions.extend(sent_mentions)

        # SVO: adjacent mention pairs whose gap text is exactly a predicate
        for k in range(len(runs) - 1):
            lo1, hi1 = runs[k]
            lo2, hi2 = runs[k + 1]
            gap_tokens = [t[0].lower() for t in tokens[hi1:lo2]]
            if not gap_tokens or len(gap_tokens) > MAX_PREDICATE_TOKENS:
                continue
            phrase = " ".join(gap_tokens)
            pred = PREDICATE_PHRASES.get(phrase)
            if pred is None:
                continue
            triples.append(
                RawTriple(
                    subj=sent_mentions[k].surface,
                    pred=pred,
                    obj=sent_mentions[k + 1].surface,
                    context=context,
                )
            )
    return mentions, triples


def mention_relevance(count_in_doc: int) -> float:
    """Deterministic per-(doc, entity) relevance score in [0, 1]: more local
    mentions -> higher relevance, clamped like the reference cleaner
    (entity-extraction-agent.ts:213 ``Math.max(0, Math.min(1, score))``)."""
    return min(1.0, 0.2 + 0.2 * count_in_doc)
