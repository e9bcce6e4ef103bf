"""Actor-pool NER + triple-extraction stage.

Reference analog: the EntityExtractionAgent + RelationshipDiscoveryAgent pair
(``/root/reference/agents/src/agents/entity-extraction-agent.ts:30-79``,
``relationship-discovery-agent.ts:65-120``), re-expressed as ONE deterministic
actor-pool ``map_batches`` stage (SURVEY.md T1/T2): state (compiled patterns)
is built once per actor in ``__init__``; ``__call__`` processes an Arrow batch
of extracted pages.

Output is a single kind-tagged record table (``kind`` in {"page", "mention",
"triple", "mcount"}) so ONE extraction pass feeds every downstream table;
the writer splits it with ``partition_cols=["chunk", "kind"]``:
- "page" rows carry the extracted text (the byte-identical artifact),
- "mention"/"triple" rows are the per-page extraction results,
- "mcount" rows are batch-level mention-count partials (see MCOUNT_COLUMNS).

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

from ..functions.confidence import (
    HIGH_BAND,
    LOW_BAND,
    MED_BAND,
    confidence_from_band_counts,
)
from ..functions.textnorm import norm_surface as _norm
from ..functions.triples import extract_mentions_and_triples, mention_relevance

RECORD_FIELDS = [
    ("kind", pa.string()),  # "page" (extracted text) | "mention" | "triple"
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("text", pa.string()),  # kind=page only: the byte-identical artifact
    ("lang", pa.string()),  # kind=page only
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
    ("link_score", pa.float64()),  # mention rows: 1.0 alias hit / 0.0 unknown
    ("chunk", pa.string()),  # lineage partition tag (resume unit)
]
RECORD_SCHEMA = pa.schema(RECORD_FIELDS)

# kind="mcount" rows are BATCH-level mention-count partials (the combiner
# half of the canonicalization shuffle, emitted at extraction time so phase B
# reads vocabulary-sized partials instead of re-scanning every mention row).
# They reuse existing record columns under this mapping:
MCOUNT_COLUMNS = {
    "norm_surface": "norm_surface",
    "n_in_page": "mentions_p",   # sum of in-page mention counts
    "span_start": "links_p",     # count of (page, entity) link rows
    "span_end": "perfect_p",     # count of links with score == 1.0
    "score": "max_score_p",
    "confidence": "min_score_p",
}


class TripleExtractor:
    """Callable class for ``map_batches(TripleExtractor, concurrency=N)``.

    ``lang_allow``: optional language allowlist (e.g. ``{"en"}``) — the lang
    filter from the input schema; None processes every page.

    ``alias_ref`` / ``alias_dict``: when provided, entity linking (the T3
    broadcast pattern — dict fetched from the object store once per actor)
    is FUSED into this stage: mention rows get ``ent_type`` (closed enum,
    'concept' fallback) and ``link_score`` inline, so the full record stream
    (including page text) is not re-serialized through a second pool. The
    standalone ``stages/linking.EntityLinker`` remains for modular use.
    """

    def __init__(
        self,
        lang_allow: frozenset[str] | None = None,
        alias_ref=None,
        alias_dict=None,
    ) -> None:
        # Per-actor setup. The regexes used by the pure kernels are compiled
        # at module import (once per worker process); anything heavier (a
        # model) would be loaded here.
        self.lang_allow = lang_allow
        if alias_dict is None and alias_ref is not None:
            import ray

            alias_dict = ray.get(alias_ref)
        self.alias = alias_dict

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        if "chunk" in batch.schema.names:
            chunks_col = batch.column("chunk").to_pylist()
        else:
            chunks_col = [""] * len(urls)

        # columnar builders — only the fields each kind actually carries are
        # built row-by-row; everything else becomes pa.nulls (no per-row
        # Python for absent columns)
        m_url, m_ts, m_chunk = [], [], []
        m_surface, m_norm, m_type, m_score = [], [], [], []
        m_n, m_start, m_end, m_context, m_link = [], [], [], [], []
        t_url, t_ts, t_chunk = [], [], []
        t_subj, t_snorm, t_pred, t_obj, t_onorm = [], [], [], [], []
        t_conf, t_context = [], []
        # batch-level mention-count partials (the canonicalization combiner,
        # emitted as kind="mcount" rows — see MCOUNT_COLUMNS)
        bcounts: dict[str, list] = {}

        for url, ts, text, lang, chunk in zip(urls, tss, texts, langs, chunks_col):
            # the page row (built vectorized below) carries the extracted
            # text for EVERY url; lang_allow only gates extraction
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

            # page-level relevance band counts (for O(1) per-triple
            # confidence — equivalent to the pure list formula)
            n_high = n_med = n_low = 0
            for v in scores.values():
                if v >= HIGH_BAND:
                    n_high += 1
                elif v >= MED_BAND:
                    n_med += 1
                elif v >= LOW_BAND:
                    n_low += 1
            n_total = len(scores)

            for norm in sorted(agg):
                s = agg[norm]
                score = scores[norm]
                ckey = (chunk, norm)  # per-chunk so resume reruns are exact
                slot = bcounts.get(ckey)
                if slot is None:
                    bcounts[ckey] = [s["n"], 1, int(score == 1.0), score, score]
                else:
                    slot[0] += s["n"]
                    slot[1] += 1
                    slot[2] += int(score == 1.0)
                    if score > slot[3]:
                        slot[3] = score
                    if score < slot[4]:
                        slot[4] = score
                if self.alias is not None:
                    hit = self.alias.get(norm)
                    ent_type = hit[1] if hit else "concept"
                    link_score = 1.0 if hit else 0.0
                else:
                    ent_type, link_score = None, None
                m_url.append(url)
                m_ts.append(ts)
                m_chunk.append(chunk)
                m_surface.append(s["surface"])
                m_norm.append(norm)
                m_type.append(ent_type)
                m_score.append(scores[norm])
                m_n.append(s["n"])
                m_start.append(s["start"])
                m_end.append(s["end"])
                m_context.append(s["context"])
                m_link.append(link_score)

            # Exact edge dedup AT SOURCE (reference D4 semantics:
            # UNIQUE(source, target, type) per source document,
            # db_init.py:128). The canonical entity key is fully determined
            # by the alias dict (a component = one canonical + its aliases;
            # distinct canonicals never merge), so deduplicating per page on
            # (canon(subj), pred, canon(obj)) here removes ALL global
            # duplicates by construction — url is part of the edge key and
            # each url is processed exactly once (assumption documented in
            # pipelines/kg.py; re-crawled duplicate urls need
            # cfg.global_edge_dedup). The dedup key uses the NORMALIZED
            # canonical so a raw mention of the canonical surface and a
            # mention of its alias collapse to the same key; the alias dict
            # must be canonicalized (values are fixed points — an alias's
            # canonical must not itself be an alias of something else),
            # which union-find would merge but this per-page key would not.
            # Keeps the lexicographically smallest
            # (confidence, context, subj, obj) representative.
            best: dict[tuple, tuple] = {}
            for t in triples:
                sn, on = _norm(t.subj), _norm(t.obj)
                canon_s = _norm(self.alias[sn][0]) if self.alias and sn in self.alias else sn
                canon_o = _norm(self.alias[on][0]) if self.alias and on in self.alias else on
                conf = self._confidence(scores, sn, on, n_high, n_med, n_low, n_total)
                key = (canon_s, t.pred, canon_o)
                cand = (conf, t.context, t.subj, sn, t.obj, on)
                if key not in best or cand < best[key]:
                    best[key] = cand
            for key in sorted(best):
                conf, context, subj, sn, obj, on = best[key]
                t_url.append(url)
                t_ts.append(ts)
                t_chunk.append(chunk)
                t_subj.append(subj)
                t_snorm.append(sn)
                t_pred.append(key[1])
                t_obj.append(obj)
                t_onorm.append(on)
                t_conf.append(conf)
                t_context.append(context)

        n_pages = len(urls)
        n_m = len(m_url)
        n_t = len(t_url)

        def nulls(n: int, typ) -> pa.Array:
            return pa.nulls(n, typ)

        page_tbl = pa.Table.from_arrays(
            [
                pa.array(["page"] * n_pages, pa.string()),
                batch.column("url"),
                batch.column("warc_ts"),
                pa.array(texts, pa.string()),
                pa.array(langs, pa.string()),
                nulls(n_pages, pa.string()),   # surface
                nulls(n_pages, pa.string()),   # norm_surface
                nulls(n_pages, pa.string()),   # ent_type
                nulls(n_pages, pa.float64()),  # score
                nulls(n_pages, pa.int32()),    # n_in_page
                nulls(n_pages, pa.int32()),    # span_start
                nulls(n_pages, pa.int32()),    # span_end
                nulls(n_pages, pa.string()),   # context
                nulls(n_pages, pa.string()),   # subj
                nulls(n_pages, pa.string()),   # subj_norm
                nulls(n_pages, pa.string()),   # pred
                nulls(n_pages, pa.string()),   # obj
                nulls(n_pages, pa.string()),   # obj_norm
                nulls(n_pages, pa.float64()),  # confidence
                nulls(n_pages, pa.float64()),  # link_score
                pa.array(chunks_col, pa.string()),
            ],
            schema=RECORD_SCHEMA,
        )
        mention_tbl = pa.Table.from_arrays(
            [
                pa.array(["mention"] * n_m, pa.string()),
                pa.array(m_url, pa.string()),
                pa.array(m_ts, pa.timestamp("us")),
                nulls(n_m, pa.string()),
                nulls(n_m, pa.string()),
                pa.array(m_surface, pa.string()),
                pa.array(m_norm, pa.string()),
                pa.array(m_type, pa.string()),
                pa.array(m_score, pa.float64()),
                pa.array(m_n, pa.int32()),
                pa.array(m_start, pa.int32()),
                pa.array(m_end, pa.int32()),
                pa.array(m_context, pa.string()),
                nulls(n_m, pa.string()),
                nulls(n_m, pa.string()),
                nulls(n_m, pa.string()),
                nulls(n_m, pa.string()),
                nulls(n_m, pa.string()),
                nulls(n_m, pa.float64()),
                pa.array(m_link, pa.float64()),
                pa.array(m_chunk, pa.string()),
            ],
            schema=RECORD_SCHEMA,
        )
        triple_tbl = pa.Table.from_arrays(
            [
                pa.array(["triple"] * n_t, pa.string()),
                pa.array(t_url, pa.string()),
                pa.array(t_ts, pa.timestamp("us")),
                nulls(n_t, pa.string()),
                nulls(n_t, pa.string()),
                nulls(n_t, pa.string()),
                nulls(n_t, pa.string()),
                nulls(n_t, pa.string()),
                nulls(n_t, pa.float64()),
                nulls(n_t, pa.int32()),
                nulls(n_t, pa.int32()),
                nulls(n_t, pa.int32()),
                pa.array(t_context, pa.string()),
                pa.array(t_subj, pa.string()),
                pa.array(t_snorm, pa.string()),
                pa.array(t_pred, pa.string()),
                pa.array(t_obj, pa.string()),
                pa.array(t_onorm, pa.string()),
                pa.array(t_conf, pa.float64()),
                nulls(n_t, pa.float64()),
                pa.array(t_chunk, pa.string()),
            ],
            schema=RECORD_SCHEMA,
        )
        c_keys = sorted(bcounts)
        n_c = len(c_keys)
        mcount_tbl = pa.Table.from_arrays(
            [
                pa.array(["mcount"] * n_c, pa.string()),
                nulls(n_c, pa.string()),       # url
                nulls(n_c, pa.timestamp("us")),
                nulls(n_c, pa.string()),       # text
                nulls(n_c, pa.string()),       # lang
                nulls(n_c, pa.string()),       # surface
                pa.array([k[1] for k in c_keys], pa.string()),
                nulls(n_c, pa.string()),       # ent_type
                pa.array([bcounts[k][3] for k in c_keys], pa.float64()),  # max
                pa.array([bcounts[k][0] for k in c_keys], pa.int32()),    # mentions
                pa.array([bcounts[k][1] for k in c_keys], pa.int32()),    # links
                pa.array([bcounts[k][2] for k in c_keys], pa.int32()),    # perfect
                nulls(n_c, pa.string()),       # context
                nulls(n_c, pa.string()),
                nulls(n_c, pa.string()),
                nulls(n_c, pa.string()),
                nulls(n_c, pa.string()),
                nulls(n_c, pa.string()),
                pa.array([bcounts[k][4] for k in c_keys], pa.float64()),  # min
                nulls(n_c, pa.float64()),
                pa.array([k[0] for k in c_keys], pa.string()),
            ],
            schema=RECORD_SCHEMA,
        )
        return pa.concat_tables([page_tbl, mention_tbl, triple_tbl, mcount_tbl])

    @staticmethod
    def _confidence(
        scores: dict[str, float], sn: str, on: str,
        n_high: int, n_med: int, n_low: int, n_total: int,
    ) -> float:
        """O(1) base confidence from page-level band counts — algebraically
        identical to calculate_base_confidence over the shared-score list
        (the oracle runs the list form; tests assert equality)."""
        h, m, low, total = n_high, n_med, n_low, n_total
        for norm in {sn, on}:
            v = scores.get(norm)
            if v is None:
                continue
            total -= 1
            if v >= HIGH_BAND:
                h -= 1
            elif v >= MED_BAND:
                m -= 1
            elif v >= LOW_BAND:
                low -= 1
        return confidence_from_band_counts(h, m, low, total)


# ---------------------------------------------------------------------------
# Warm-model stub extractors (bench probes, output-identical to
# TripleExtractor).
#
# The reference's extraction stage pays an expensive per-process setup —
# the Anthropic client + prompt assets built once per agent process
# (agents/src/agents/entity-extraction-agent.ts:16-25) — before its cheap
# per-item calls. These stubs reproduce that cost profile deterministically
# so `bench.py --warm-model` can MEASURE (not assert) that the actor-pool
# shape amortizes the load: `WarmModelExtractor` pays load_s once per actor
# in __init__ (the right shape), `PerBatchLoadExtractor` pays it on every
# batch (the shape extraction degrades to when model setup is left inside
# the map function). Both delegate to the production kernel, so outputs are
# bit-identical to TripleExtractor (tests/test_kg_pipeline.py asserts it).
# ---------------------------------------------------------------------------


class WarmModelExtractor(TripleExtractor):
    """TripleExtractor with a simulated expensive model load in __init__."""

    def __init__(self, load_s: float = 5.0, **kwargs) -> None:
        import time

        time.sleep(load_s)  # stands in for reading weights / building state
        super().__init__(**kwargs)


class PerBatchLoadExtractor(TripleExtractor):
    """The naive contrast: the same load cost re-paid on EVERY batch."""

    def __init__(self, load_s: float = 5.0, **kwargs) -> None:
        self.load_s = load_s
        super().__init__(**kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time

        time.sleep(self.load_s)
        return super().__call__(batch)


# ---------------------------------------------------------------------------
# Stateless-task variant of the extraction stage.
#
# The actor-pool form above is the right shape when per-worker state is
# EXPENSIVE to build (a warm transformer/spaCy model: minutes of load time
# amortized across batches). Our deterministic extractor's only state is the
# broadcast alias dict, which lives in the object store — so plain tasks,
# which reuse warm worker processes with zero actor-spawn cost and fully
# elastic parallelism, are faster (measured: 30-actor pool spends ~10s
# spawning at 32 CPUs). The per-worker-process cache below gives tasks the
# same fetch-once semantics an actor __init__ would.
# ---------------------------------------------------------------------------

_WORKER_EXTRACTORS: dict = {}


def extract_records_batch(
    batch: pa.Table, alias_ref=None, lang_allow: frozenset[str] | None = None
) -> pa.Table:
    """Stateless-task form of TripleExtractor (same output, same kernels).

    ``alias_ref`` is an ObjectRef; each worker process resolves it once from
    the local object store and caches the constructed extractor.
    """
    if alias_ref is not None and not hasattr(alias_ref, "hex"):
        # already a plain dict (runtime dereferenced it): construct fresh —
        # caching by id() could collide across runs after GC reuse
        return TripleExtractor(lang_allow=lang_allow, alias_dict=alias_ref)(batch)
    key = (alias_ref.hex() if alias_ref is not None else None, lang_allow)
    extractor = _WORKER_EXTRACTORS.get(key)
    if extractor is None:
        extractor = TripleExtractor(lang_allow=lang_allow, alias_ref=alias_ref)
        _WORKER_EXTRACTORS[key] = extractor
    return extractor(batch)
