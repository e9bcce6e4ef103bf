"""In-repo safety net for the driver's query-vs-SQL comparison: run a fast
subset of queries() against their oracle_sql() via DuckDB at sf0.001 and
require EXACT Arrow equality (schema dtypes + values). The driver's value-hash
is dtype-sensitive — e.g. DuckDB SUM(BIGINT) -> decimal128(38,0) vs Ray int64
fails it — so this test compares ``pyarrow.Table``s, never pandas objects."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from agenticknowledgegraphconstructionsystem_ray.arrowcmp import canon as _canon
from agenticknowledgegraphconstructionsystem_ray.arrowcmp import to_arrow as _to_arrow

SF = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "q01_pricing_summary",
    "q02_orders_by_status",
    "q03_global_counts",
    "q04_avg_orders_per_customer",
    "q05_top_parts",
    "q09_nation_customer_counts",
    "q11_conditional_counts",
    "q12_events_hourly",
    "q13_dedup_docs_exact",
    "q14_term_counts",
    "q15_doc_token_stats",
    "q18_docs_by_lang",
    "q21_orders_per_month",
    "q25_langid",
    "q26_quality",
    "q27_token_classes",
    "q28_events_props_json",
    "q29_top_events_per_type",
    "q30_user_sessions",
    "q32_stable_split",
    "q33_asof_join",
    "q34_range_join_bands",
    "q35_window_cumsum",
    "q36_grouped_quantiles",
    "q37_event_pivot",
    "q38_stratified_sample",
    "q39_watermark_window",
    "q40_orders_no_returns",
    "q41_tfidf_top_terms",
    "q42_inverted_index",
    "q43_doc_dev",
    "sk_heavy_hitters",
    "mm_decode_meta",
    "mm_sniff_meta",
    "dd_decontaminate",
    "q44_shard_assignment",
    "q45_pack_offsets",
    "q46_pack_sequences",
    "q47_quality_classifier",
    "q48_repetition",
    "dd_bloom_decontaminate",
    "q54_mirror_detection",
    "q55_hist_quantiles",
    "q56_corpus_sample",
    "q57_gopher_rules",
    "q59_mixture_sample",
    "q60_term_pmi",
    "q61_percentile_rank",
    "q62_funnel",
    "q63_snapshot_diff",
    "q64_kwic",
    "q65_doc_term_matrix",
    "q66_value_outliers",
    "q67_bloom_semijoin",
    "q68_event_pairs",
    "q69_rollup",
    "q71_overlap_matrix",
    "q72_source_quality",
    "q73_langid_confusion",
    "q74_threshold_sweep",
    "q83_event_transitions",
    "q84_user_paths",
    "q85_pareto_parts",
    "q86_setsim_join",
    "q87_bigram_surprisal",
    "q88_calibration_bins",
    "q89_bm25_topk",
    "q90_auc",
    "q91_dau_stickiness",
    "sk_kmv_users",
    "q92_sorted_neighborhood",
    "q93_fk_audit",
    "q94_sliding_distinct",
    "q95_price_band_selfjoin",
    "q96_anomaly_hours",
    "q97_gapfill_hours",
    "q98_busy_time",
    "q99_cube",
    "ta_drift",
    "q100_session_spans",
    "q101_weighted_median",
    "ta_curate",
    "sk_set_ops",
    "ta_bucketed_join",
    "ta_bucketed_topn",
    "ta_pruned_scan",
    "ta_global_shuffle",
    "ta_table_checksum",
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def con():
    from agenticknowledgegraphconstructionsystem_ray.sources.tables import (
        TESTDATA_TABLES,
    )

    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_duckdb(entrymod, con, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    mine = _canon(_to_arrow(fn(SF)))
    ref = _canon(con.execute(sql).arrow())
    assert mine.column_names == ref.column_names, f"{name}: column names"
    assert mine.num_rows == ref.num_rows, f"{name}: row count"
    for c in mine.column_names:
        a, b = mine[c], ref[c]
        assert a.type == b.type, f"{name}.{c}: dtype {a.type} vs {b.type}"
        assert a.equals(b), f"{name}.{c}: values differ"


def test_smb_layout_reused_and_invalidated(entrymod, ray_session):
    """The bucketed-join layout is built once (marker-guarded) and reused on
    repeat queries; a marker with a different bucketing contract forces a
    rebuild instead of being silently trusted."""
    import json
    import os
    import shutil

    from agenticknowledgegraphconstructionsystem_ray.pipelines import training

    root = training.smb_root(SF)
    shutil.rmtree(root, ignore_errors=True)

    first = _canon(_to_arrow(entrymod.queries()["ta_bucketed_join"](SF)))
    marker = os.path.join(root, "_DONE")
    assert os.path.exists(marker)
    mtime = os.path.getmtime(marker)

    second = _canon(_to_arrow(entrymod.queries()["ta_bucketed_join"](SF)))
    assert os.path.getmtime(marker) == mtime, "layout was rebuilt on reuse"
    assert first.equals(second)

    # contract mismatch (different bucket count) must trigger a rebuild
    with open(marker, "w") as f:
        json.dump({"buckets": training.SMB_BUCKETS + 1, "key": "orderkey"}, f)
    third = _canon(_to_arrow(entrymod.queries()["ta_bucketed_join"](SF)))
    with open(marker) as f:
        assert json.load(f)["buckets"] == training.SMB_BUCKETS
    assert first.equals(third)
