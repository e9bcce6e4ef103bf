"""Byte-pair-encoding merge learning kernel (pure, deterministic).

The first stage of tokenizer training: iteratively merge the most frequent
adjacent symbol pair across the corpus (Sennrich et al. 2016). Like every
production BPE trainer, the iterative state is the WORD-FREQUENCY table,
not the corpus — one distributed counting pass reduces 10^12 documents to
a vocabulary-sized (word, count) table, and the merge loop runs over that
(capped to the top ``WORD_CAP`` words by (count desc, word), the standard
trainer trim).

Determinism contract: the best pair each round is max count with ties to
the LEXICOGRAPHICALLY SMALLEST (left, right) — no hash iteration order
anywhere, so distributed and sequential word counting feed identical
merge sequences.

Shared by the driver query (pipelines/scoring.py) AND the sequential
golden (goldens._seq_bpe) per NOTES.md invariant 1.
"""

from __future__ import annotations

WORD_CAP = 10_000
N_MERGES = 8


def learn_merges(
    word_counts: list[tuple[str, int]], k: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """``word_counts``: (word, count) pairs (any order; deduped words).
    Returns up to ``k`` merges as (left_symbol, right_symbol, pair_count),
    in learned order. Stops early when no adjacent pair remains."""
    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in word_counts if len(w) >= 2
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, rb), n = best
        merges.append((la, rb, n))
        fused = la + rb
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == la and syms[i + 1] == rb:
                    syms[i : i + 2] = [fused]
                else:
                    i += 1
    return merges


def cap_words(counts: dict[str, int], cap: int = WORD_CAP) -> list[tuple[str, int]]:
    """Top-``cap`` words by (count desc, word asc) — the trainer trim,
    identical on both the distributed and sequential sides."""
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenizer APPLICATION (stage 2): split ``word`` into characters and
    replay the learned merges in rank order — the standard BPE encode rule
    (each merge applied greedily left-to-right before the next rank).
    Deterministic; shared by the distributed scorer and the sequential
    golden per NOTES.md invariant 1."""
    syms = list(word)
    for a, b in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [a + b]
            else:
                i += 1
    return syms
