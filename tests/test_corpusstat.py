"""Corpus-structure operators: mirrors, histogram quantiles, global sample,
and the bloom decontamination scale path (must be bit-identical to exact)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from agenticknowledgegraphconstructionsystem_ray.pipelines import assembly, corpusstat

SF = "/root/testdata/sf0.001"


def test_mirror_detection_finds_planted_mirrors(ray_session):
    out = corpusstat.q54_mirror_detection(SF).to_pandas()
    docs = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pandas()

    # sequential recompute of the same augmented-corpus definition
    m = docs[docs.doc_id % corpusstat.MIRROR_MOD == 0].copy()
    m["doc_id"] += corpusstat.MIRROR_ID_OFFSET
    m["source"] = "mirror:" + m["source"]
    aug = pd.concat([docs, m], ignore_index=True)
    aug["content_key"] = [
        hashlib.md5(t.encode()).hexdigest() for t in aug["text"]
    ]
    g = aug.groupby("content_key").agg(
        n_docs=("doc_id", "size"),
        n_sources=("source", "nunique"),
        rep_doc=("doc_id", "min"),
    )
    want = g[g.n_sources >= 2].reset_index().sort_values("content_key")

    got = out.sort_values("content_key").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True), check_dtype=False
    )
    # every planted mirror pair must be represented
    assert len(got) >= 1
    assert (got.n_sources >= 2).all()


def test_hist_quantiles_match_sequential(ray_session):
    out = corpusstat.q55_hist_quantiles(SF)
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["lang", "n_chars"]).to_pandas()
    for _, row in out.iterrows():
        vals = np.sort(docs.loc[docs.lang == row["lang"], "n_chars"].to_numpy())
        n = len(vals)
        assert row["n_docs"] == n
        for a, b, name in corpusstat._QUANTILES:
            rank = corpusstat._rank_ceil(a, b, n)
            assert row[name] == vals[rank - 1], (row["lang"], name)


def test_rank_ceil_integer_exact():
    # 0.9*10 == 9.000000000000002 in float64; integer path must give 9
    assert corpusstat._rank_ceil(9, 10, 10) == 9
    assert corpusstat._rank_ceil(1, 2, 1) == 1
    assert corpusstat._rank_ceil(99, 100, 100) == 99
    assert corpusstat._rank_ceil(99, 100, 101) == 100


def test_corpus_sample_deterministic_and_correct(ray_session):
    a = corpusstat.q56_corpus_sample(SF)
    b = corpusstat.q56_corpus_sample(SF)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == corpusstat.SAMPLE_K
    # brute-force smallest-K check
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    keys = sorted(
        (hashlib.md5(f"s56:{i}".encode()).hexdigest(), i)
        for i in docs["doc_id"]
    )[: corpusstat.SAMPLE_K]
    assert list(a["doc_id"]) == [i for _, i in keys]
    assert list(a["rk"]) == list(range(corpusstat.SAMPLE_K))


def test_bloom_decontaminate_bit_identical_to_exact(ray_session):
    exact = assembly.dd_decontaminate(SF).to_pandas()
    bloom = assembly.dd_bloom_decontaminate(SF).to_pandas()
    pd.testing.assert_frame_equal(exact, bloom)
    # the corpus plants real contamination — the test must exercise hits
    assert exact["contaminated"].sum() > 0


def test_snapshot_diff_classes(ray_session):
    got = corpusstat.q63_snapshot_diff(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet", columns=["doc_id"]).to_pandas()
    ids = docs["doc_id"].to_numpy()
    want_removed = {int(i) for i in ids if i % corpusstat.DIFF_RM_MOD == 0}
    want_added = {
        int(i) + corpusstat.DIFF_ADD_OFFSET
        for i in ids
        if i % corpusstat.DIFF_ADD_MOD == 0
    }
    want_changed = {
        int(i)
        for i in ids
        if i % corpusstat.DIFF_RM_MOD != 0 and i % corpusstat.DIFF_CH_MOD == 0
    }
    by = {s: set(g["doc_id"]) for s, g in got.groupby("status")}
    assert by.get("removed", set()) == want_removed
    assert by.get("added", set()) == want_added
    assert by.get("changed", set()) == want_changed


def test_overlap_matrix_matches_bruteforce(ray_session):
    got = corpusstat.q71_overlap_matrix(SF).to_pandas()
    docs = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pandas()
    m = docs[docs.doc_id % corpusstat.MIRROR_MOD == 0].copy()
    m["doc_id"] += corpusstat.MIRROR_ID_OFFSET
    m["source"] = "mirror:" + m["source"]
    aug = pd.concat([docs, m], ignore_index=True)
    aug["k"] = [hashlib.md5(t.encode()).hexdigest() for t in aug["text"]]
    want: dict = {}
    for _, g in aug.groupby("k"):
        srcs = sorted(set(g["source"]))
        if not (2 <= len(srcs) <= corpusstat.OVL_MAX_SOURCES):
            continue
        for i, a in enumerate(srcs):
            for b in srcs[i + 1 :]:
                want[(a, b)] = want.get((a, b), 0) + 1
    have = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for _, r in got.iterrows()
    }
    assert have == want and len(have) > 0


class TestVocabGrowth:
    def test_conservation_and_monotonicity(self, ray_session):
        import duckdb

        from agenticknowledgegraphconstructionsystem_ray.pipelines import corpusstat

        sf = "/root/testdata/sf0.001"
        got = corpusstat.tx_vocab_growth(sf).to_pandas()
        assert (got["vocab_cum"].diff().dropna() >= 0).all()
        assert (got["tokens_cum"].diff().dropna() > 0).all()
        assert got["new_terms"].sum() == got["vocab_cum"].iloc[-1]
        assert got["n_tokens"].sum() == got["tokens_cum"].iloc[-1]
        con = duckdb.connect()
        n_terms, n_docs = con.execute(
            "SELECT COUNT(DISTINCT term), COUNT(DISTINCT doc_id) FROM ("
            "SELECT doc_id, unnest(list_filter(regexp_split_to_array("
            "lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term "
            f"FROM read_parquet('{sf}/documents.parquet'))"
        ).fetchone()
        assert got["vocab_cum"].iloc[-1] == n_terms
        assert got["n_docs"].sum() == n_docs


class TestTaProfile:
    def test_profile_matches_pandas(self, ray_session):
        import pyarrow.parquet as _pq

        from agenticknowledgegraphconstructionsystem_ray.pipelines.corpusstat import (
            PROFILE_INT_COLS,
            PROFILE_STR_COLS,
            ta_profile,
        )

        sf = "/root/testdata/sf0.001"
        got = {r["col"]: r for r in ta_profile(sf).to_pylist()}
        df = _pq.read_table(f"{sf}/documents.parquet").to_pandas()
        assert set(got) == set(PROFILE_INT_COLS) | set(PROFILE_STR_COLS)
        for c in PROFILE_INT_COLS:
            assert got[c]["n_rows"] == len(df)
            assert got[c]["n_null"] == int(df[c].isna().sum())
            assert got[c]["n_distinct"] == df[c].nunique()
            assert got[c]["min_i"] == int(df[c].min())
            assert got[c]["max_i"] == int(df[c].max())
            assert got[c]["min_s"] is None and got[c]["sum_len"] is None
        for c in PROFILE_STR_COLS:
            assert got[c]["n_distinct"] == df[c].nunique()
            assert got[c]["min_s"] == df[c].min()
            assert got[c]["max_s"] == df[c].max()
            assert got[c]["sum_len"] == int(df[c].str.len().sum())
            assert got[c]["min_i"] is None and got[c]["max_i"] is None
