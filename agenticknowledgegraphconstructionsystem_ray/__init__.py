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
