"""agenticknowledgegraphconstructionsystem_ray — a Ray-Data-native knowledge-graph
construction engine.

From-scratch re-expression of the capabilities of
``seerapubhavyareddy/AgenticKnowledgeGraphConstructionSystem`` (see SURVEY.md):
document text extraction → entity/triple extraction → entity linking →
canonicalization (dedup + union-find merge) → typed-edge graph materialization →
rule-based validation → resumable incremental processing — built on
``ray.data.Dataset`` streaming pipelines over zero-copy Arrow batches.

The reference is a sequential, Postgres-mediated, LLM-per-row system; this engine
replaces the execution model with Ray Data (map_batches over Arrow, actor pools
for stateful stages, salted groupby shuffles, broadcast small sides) and replaces
the LLM extraction agents with deterministic pure-function extractors so every
stage is reproducible and verifiable against a sequential oracle.
"""

__version__ = "0.1.0"

# user-facing API surface (lazy heavy imports happen inside the modules)
from .pipelines.kg import (  # noqa: E402,F401
    KGConfig,
    ensure_complete,
    run_phase_a,
    run_phase_b,
    run_pipeline,
)
from .synth import alias_dict, ensure_pages, write_pages  # noqa: E402,F401

# reusable distributed building blocks (each has its own driver query +
# oracle; see COVERAGE.md):
from .functions.mediasniff import sniff as sniff_media  # noqa: E402,F401
from .stages.dedup import (  # noqa: E402,F401
    minhash_near_dups,
    near_dup_keep,
    simhash_near_dups,
)
from .stages.sketch import (  # noqa: E402,F401
    approx_distinct_terms,
    approx_distinct_users,
)
from .stages.similarity import brute_force_topk, ivf_topk  # noqa: E402,F401
from .stages.topk import grouped_topk  # noqa: E402,F401
