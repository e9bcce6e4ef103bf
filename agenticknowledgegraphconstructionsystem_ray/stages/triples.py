"""Actor-pool NER + triple-extraction stage.

Reference analog: the EntityExtractionAgent + RelationshipDiscoveryAgent pair
(``/root/reference/agents/src/agents/entity-extraction-agent.ts:30-79``,
``relationship-discovery-agent.ts:65-120``), re-expressed as ONE deterministic
actor-pool ``map_batches`` stage (SURVEY.md T1/T2): state (compiled patterns)
is built once per actor in ``__init__``; ``__call__`` processes an Arrow batch
of extracted pages.

Output is a single kind-tagged record table (``kind`` in {"mention",
"triple"}) so one extraction pass feeds both downstream tables; the writer
splits it with ``partition_cols=["kind"]``.

- "mention" rows are PER-(page, entity) aggregates — one row per distinct
  normalized surface per page, with ``n_in_page`` carrying the raw mention
  count. This is the combiner half of the canonicalization shuffle: the
  global ``mention_count`` groupby then runs over page-level partials instead
  of raw spans, which is what keeps Zipf-head entities from creating a
  hot-key shuffle (SURVEY.md §4.2 "skew").
- "triple" rows carry a deterministic confidence computed page-locally with
  the reference's base-confidence formula
  (``relationship-discovery-agent.ts:43-60``): the shared-concept set of a
  triple = the other entities co-mentioned on the page. No join needed.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.confidence import calculate_base_confidence
from ..functions.textnorm import norm_surface as _norm
from ..functions.triples import extract_mentions_and_triples, mention_relevance

RECORD_FIELDS = [
    ("kind", pa.string()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("surface", pa.string()),
    ("norm_surface", pa.string()),
    ("ent_type", pa.string()),
    ("score", pa.float64()),
    ("n_in_page", pa.int32()),
    ("span_start", pa.int32()),
    ("span_end", pa.int32()),
    ("context", pa.string()),
    ("subj", pa.string()),
    ("subj_norm", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_norm", pa.string()),
    ("confidence", pa.float64()),
]
RECORD_SCHEMA = pa.schema(RECORD_FIELDS)


class TripleExtractor:
    """Callable class for ``map_batches(TripleExtractor, concurrency=N)``.

    ``lang_allow``: optional language allowlist (e.g. ``{"en"}``) — the lang
    filter from the input schema; None processes every page.
    """

    def __init__(self, lang_allow: frozenset[str] | None = None) -> None:
        # Per-actor setup. The regexes used by the pure kernels are compiled
        # at module import (once per worker process); anything heavier (a
        # model) would be loaded here.
        self.lang_allow = lang_allow

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name, _ in RECORD_FIELDS}

        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()

        for url, ts, text, lang in zip(urls, tss, texts, langs):
            if self.lang_allow is not None and lang not in self.lang_allow:
                continue
            mentions, triples = extract_mentions_and_triples(text or "")

            # per-page aggregation: one row per distinct norm surface
            agg: dict[str, dict] = {}
            for m in mentions:
                slot = agg.get(m.norm)
                if slot is None:
                    agg[m.norm] = {
                        "surface": m.surface,
                        "n": 1,
                        "start": m.start,
                        "end": m.end,
                        "context": m.context,
                    }
                else:
                    slot["n"] += 1
            scores = {norm: mention_relevance(s["n"]) for norm, s in agg.items()}

            for norm in sorted(agg):
                s = agg[norm]
                _append(
                    cols, kind="mention", url=url, warc_ts=ts,
                    surface=s["surface"], norm_surface=norm, ent_type=None,
                    score=scores[norm], n_in_page=s["n"],
                    span_start=s["start"], span_end=s["end"],
                    context=s["context"],
                )
            for t in triples:
                sn, on = _norm(t.subj), _norm(t.obj)
                shared = [v for k, v in scores.items() if k not in (sn, on)]
                _append(
                    cols, kind="triple", url=url, warc_ts=ts,
                    subj=t.subj, subj_norm=sn, pred=t.pred,
                    obj=t.obj, obj_norm=on,
                    confidence=calculate_base_confidence(shared),
                    context=t.context,
                )

        return pa.Table.from_arrays(
            [pa.array(cols[name], typ) for name, typ in RECORD_FIELDS],
            schema=RECORD_SCHEMA,
        )


def _append(cols: dict[str, list], **values) -> None:
    for name in cols:
        cols[name].append(values.get(name))
