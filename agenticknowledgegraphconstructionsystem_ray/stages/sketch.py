"""Distributed sketch aggregates (HyperLogLog approximate distinct count,
Count-Min approximate point frequency).

The scale path for COUNT(DISTINCT): q10's exact dedup-then-count shuffles
every distinct key; this stage ships ONE 4 KiB register array per (block,
group) instead — the classic sketch trade (1.6 % standard error at p=12).

Shape: map_batches combiner folds each block's keys into per-group register
partials (functions/hll.py kernel), then a groupby with a custom AggregateFn
whose merge is elementwise max — commutative/associative/idempotent, so
block order and task retries cannot change the result. The estimate is
computed once at finalize. Driver-verified against a sequential golden
(same kernel, independent single-pass orchestration — goldens.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFn

from ..functions import hll
from ..sources.tables import read_table


def _merge_bytes(a: bytes, b: bytes) -> bytes:
    return np.maximum(
        np.frombuffer(a, np.uint8), np.frombuffer(b, np.uint8)
    ).tobytes()


def _accumulate_regs(state: bytes, block: pa.Table) -> bytes:
    reg = np.frombuffer(state, np.uint8).copy()
    for partial in block["regs"].to_pylist():
        np.maximum(reg, np.frombuffer(partial, np.uint8), out=reg)
    return reg.tobytes()


def _hll_agg(alias: str) -> AggregateFn:
    return AggregateFn(
        init=lambda k: bytes(hll.REG_M),
        merge=_merge_bytes,
        accumulate_block=_accumulate_regs,
        finalize=lambda s: hll.estimate(np.frombuffer(s, np.uint8)),
        name=alias,
    )


def approx_distinct_users(sf_dir: str):
    """Approximate distinct user_id per event_type. Output:
    (event_type, n_users_est:int64)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("user_id", "distinct")])
        types, regs = [], []
        for et, users in zip(
            g["event_type"].to_pylist(), g["user_id_distinct"].to_pylist()
        ):
            types.append(et)
            regs.append(hll.sketch_of([str(u) for u in users]).tobytes())
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "regs": pa.array(regs, pa.binary()),
            }
        )

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(_hll_agg("n_users_est"))
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "event_type": t["event_type"],
                "n_users_est": pc.cast(t["n_users_est"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def approx_distinct_terms(sf_dir: str):
    """Approximate distinct token count over the whole documents corpus
    (open vocabulary — exactly where the exact variant's shuffle hurts).
    Output: one row (n_terms_est:int64)."""
    from .textstats import _TOKEN_RE  # THE token definition (q14/q27 family)

    def partial(t: pa.Table) -> pa.Table:
        toks: set[str] = set()
        for text in t["text"].to_pylist():
            toks.update(_TOKEN_RE.findall(text.lower()))
        return pa.table(
            {"regs": pa.array([hll.sketch_of(sorted(toks)).tobytes()], pa.binary())}
        )

    ds = read_table(sf_dir, "documents", columns=["text"])
    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        _hll_agg("n_terms_est")
    )
    return pa.table({"n_terms_est": pa.array([int(agg["n_terms_est"])], pa.int64())})


# ---------------------------------------------------------------------------
# Count-Min sketch: approximate term frequencies with soundness certificate
# ---------------------------------------------------------------------------

CMS_TOP = 32


def _cms_agg(alias: str) -> "AggregateFn":
    from ..functions import cms

    def acc(state: bytes, block: pa.Table) -> bytes:
        m = np.frombuffer(state, np.int64).copy()
        for partial in block["cms"].to_pylist():
            m += np.frombuffer(partial, np.int64)
        return m.tobytes()

    return AggregateFn(
        init=lambda k: cms.empty().tobytes(),
        merge=lambda a, b: (
            np.frombuffer(a, np.int64) + np.frombuffer(b, np.int64)
        ).tobytes(),
        accumulate_block=acc,
        finalize=lambda s: s,
        name=alias,
    )


def cms_term_counts(sf_dir: str) -> pa.Table:
    """Count-Min point-frequency estimates for the exact top-``CMS_TOP``
    terms, with the exact counts alongside as the soundness certificate
    (CMS can only OVERcount: n_est >= n_exact always). Output:
    (term, n_exact, n_est, overcount) sorted by (n_exact desc, term).

    Shape: one pass builds per-block 32 KiB CMS partials merged by a
    global elementwise-add AggregateFn (the only thing the driver holds is
    one D x W matrix); the exact top-k side is the q14 combiner ->
    groupby -> top-k. At an open 100 TB vocabulary the exact side bounds
    the shuffle to distinct (block, term) partials while the sketch side
    stays O(32 KiB) per block regardless of vocabulary size."""
    from ray.data.aggregate import Sum

    from ..functions import cms
    from .textstats import term_count_partial

    docs = read_table(sf_dir, "documents", columns=["text"])

    # ONE tokenize-and-count pass feeds BOTH sides: the exact top-k shuffle
    # consumes the (term, n_p) partials directly, and the CMS blob is folded
    # FROM those partials (CMS updates are linear in counts, so sketching
    # the partial rows equals sketching the raw stream)
    counts_ds = docs.map_batches(
        term_count_partial, batch_format="pyarrow"
    ).materialize()

    def cms_partial(t: pa.Table) -> pa.Table:
        m = cms.empty()
        cms.update(
            m,
            t["term"].to_pylist(),
            t["n_p"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        return pa.table({"cms": pa.array([m.tobytes()], pa.binary())})

    top = (
        counts_ds.groupby("term")
        .aggregate(Sum("n_p", alias_name="n_exact"))
        .sort(["n_exact", "term"], descending=[True, False])
        .limit(CMS_TOP)
        .to_pandas()  # CMS_TOP rows
    )
    blob = counts_ds.map_batches(cms_partial, batch_format="pyarrow").aggregate(
        _cms_agg("cms")
    )["cms"]
    m = np.frombuffer(blob, np.int64).reshape(cms.D, cms.W)
    terms = list(top["term"])
    est = cms.estimate(m, terms)
    exact = top["n_exact"].to_numpy(np.int64)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "n_exact": pa.array(exact, pa.int64()),
            "n_est": pa.array(est, pa.int64()),
            "overcount": pa.array(est - exact, pa.int64()),
        }
    )
