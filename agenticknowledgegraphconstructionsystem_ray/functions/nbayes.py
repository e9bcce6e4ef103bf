"""Hashing-trick multinomial Naive Bayes — pure kernels shared by the
distributed pipeline (pipelines/training.ml_nbayes) and the sequential
golden (goldens._seq_nbayes), per NOTES invariant 1.

The CCNet / fastText-style corpus classifier (Wenzek et al. 2020 train a
linear classifier to score web text; the reference's analog is the
deterministic rule validator, `agents/src/agents/validation-agent.ts` —
this is the TRAINED counterpart): multinomial NB over hashed token
features. Two design points make it scale- and determinism-correct:

- **Hashing trick**: tokens map to ``N_BUCKETS`` md5 buckets (the q58 DSIR
  convention), so the model is a FIXED-SIZE (classes x 256) integer count
  matrix regardless of vocabulary — broadcastable at any corpus size, and
  the training aggregation shuffles at most classes*257 distinct keys.
- **Exact integer argmax**: the usual float log-likelihood sum is replaced
  by exact big-integer cross-multiplication of the posterior fractions
  (Laplace-smoothed), so predictions are bit-identical at any parallelism
  and mirror-checkable by a sequential recompute. No float enters.

Scoring math (class c, doc with bucket multiset b_1..b_T):
    score(c) ∝ (n_docs_c + 1) * prod_i (cnt[c][b_i] + 1) / (tot_c + B)^T
(the shared (n_train + C) prior denominator cancels). argmax compares
score(c1) vs score(c2) via N_1 * D_2 > N_2 * D_1 with
N_c = (n_docs_c + 1) * prod(cnt+1), D_c = (tot_c + B)^T; ties break to the
lexicographically smaller class label.
"""

from __future__ import annotations

import hashlib
import re

N_BUCKETS = 256

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def doc_buckets(text: str, memo: dict[str, int] | None = None) -> list[int]:
    """Token -> md5 feature bucket (first hex byte, q58 convention), with
    an optional per-actor memo so md5 runs once per distinct term."""
    out = []
    memo = memo if memo is not None else {}
    for tok in _TOKEN_RE.findall(text.lower()):
        b = memo.get(tok)
        if b is None:
            b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:2], 16)
            memo[tok] = b
        out.append(b)
    return out


def predict_doc(
    buckets: list[int],
    classes: list[str],
    n_docs: dict[str, int],
    cnt: dict[tuple[str, int], int],
    tot: dict[str, int],
) -> str:
    """Exact-integer NB argmax; see module docstring. ``classes`` must be
    sorted so the tie-break is deterministic."""
    t_len = len(buckets)
    best_label = None
    best_n = best_d = 0
    for c in classes:
        n = n_docs.get(c, 0) + 1
        for b in buckets:
            n *= cnt.get((c, b), 0) + 1
        d = (tot.get(c, 0) + N_BUCKETS) ** t_len
        # first class, or strictly better posterior: n/d > best_n/best_d
        if best_label is None or n * best_d > best_n * d:
            best_label, best_n, best_d = c, n, d
    return best_label


def is_test_doc(doc_id: int) -> bool:
    """Deterministic ~25% test split — md5 last hex digit in 0-3, the
    q32_stable_split convention (partitioning/order independent)."""
    return hashlib.md5(str(doc_id).encode()).hexdigest()[-1] in "0123"
