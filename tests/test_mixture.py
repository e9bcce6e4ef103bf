"""Data-mixing operators: per-language token-budget sampling (q59) and
term co-occurrence PMI (q60) — verified against independent sequential
recomputes, including the budget-cutoff branch q59's parity run at full
budget does not exercise."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from agenticknowledgegraphconstructionsystem_ray.pipelines import mixture

SF = "/root/testdata/sf0.001"


def _seq_mixture(docs: pd.DataFrame, budget_of) -> pd.DataFrame:
    """Sequential fill: per lang, md5-key order, keep while cum_before <
    budget."""
    docs = docs.copy()
    docs["skey"] = [
        hashlib.md5(f"m59:{i}".encode()).hexdigest() for i in docs["doc_id"]
    ]
    kept = []
    for lang, g in docs.groupby("lang", sort=True):
        b = budget_of(lang)
        cum = 0
        for _, r in g.sort_values(["skey", "doc_id"]).iterrows():
            if cum >= b:
                break
            kept.append((int(r["doc_id"]), lang, int(r["n_chars"])))
            cum += int(r["n_chars"])
    out = pd.DataFrame(kept, columns=["doc_id", "lang", "n_chars"])
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def test_mixture_sample_cutoff_branch(ray_session, monkeypatch):
    """A budget tight enough that every language truncates exercises the
    bucket-histogram cutoff + in-bucket threshold resolution."""
    monkeypatch.setattr(mixture, "TOTAL_BUDGET", 8_000)
    got = mixture.q59_mixture_sample(SF).to_pandas().reset_index(drop=True)
    docs = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    want = _seq_mixture(docs, lambda lg: 8_000 * mixture.MIX_WEIGHTS.get(lg, 0) // 100)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # truncation actually happened for at least one language
    assert len(got) < len(docs)


def test_mixture_sample_exact_boundary(ray_session, monkeypatch):
    """Budget equal to the exact char sum of a language's first k docs keeps
    exactly those k docs (keep rule: cum_before < budget, no off-by-one)."""
    docs = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    docs["skey"] = [
        hashlib.md5(f"m59:{i}".encode()).hexdigest() for i in docs["doc_id"]
    ]
    lang = "en"
    g = docs[docs.lang == lang].sort_values(["skey", "doc_id"])
    k = 3
    boundary = int(g["n_chars"].head(k).sum())
    monkeypatch.setattr(mixture, "MIX_WEIGHTS", {lang: 100})
    monkeypatch.setattr(mixture, "TOTAL_BUDGET", boundary)
    got = mixture.q59_mixture_sample(SF).to_pandas()
    assert sorted(got["doc_id"]) == sorted(g["doc_id"].head(k))


def test_mixture_zero_weight_language_excluded(ray_session, monkeypatch):
    monkeypatch.setattr(mixture, "MIX_WEIGHTS", {"de": 100})
    monkeypatch.setattr(mixture, "TOTAL_BUDGET", 10**9)
    got = mixture.q59_mixture_sample(SF).to_pandas()
    assert set(got["lang"]) == {"de"}


def _seq_pmi(texts: list[str]) -> pd.DataFrame:
    from agenticknowledgegraphconstructionsystem_ray.stages.textstats import (
        _TOKEN_RE,
    )

    doc_terms = [set(_TOKEN_RE.findall(t.lower())) for t in texts]
    df: dict[str, int] = {}
    for ts in doc_terms:
        for t in ts:
            df[t] = df.get(t, 0) + 1
    vocab = sorted(df, key=lambda t: (-df[t], t))[: mixture.PMI_V]
    vset = set(vocab)
    n_docs = len(texts)
    pair_n: dict[tuple[str, str], int] = {}
    for ts in doc_terms:
        present = sorted(ts & vset)
        for a, b in itertools.combinations(present, 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    rows = [
        (a, b, n, n * n_docs * mixture.PMI_SCALE // (df[a] * df[b]))
        for (a, b), n in pair_n.items()
        if n >= mixture.PMI_MIN_PAIR
    ]
    out = pd.DataFrame(rows, columns=["term_a", "term_b", "n_pair", "pmi_ppm"])
    return out.sort_values(
        ["pmi_ppm", "term_a", "term_b"], ascending=[False, True, True]
    ).reset_index(drop=True)


def test_term_pmi_matches_sequential(ray_session):
    got = mixture.q60_term_pmi(SF).to_pandas().reset_index(drop=True)
    texts = pq.read_table(SF + "/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want = _seq_pmi(texts)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_term_pmi_formula_spot_check(ray_session):
    got = mixture.q60_term_pmi(SF).to_pandas()
    texts = pq.read_table(SF + "/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    from agenticknowledgegraphconstructionsystem_ray.stages.textstats import (
        _TOKEN_RE,
    )

    doc_terms = [set(_TOKEN_RE.findall(t.lower())) for t in texts]
    r = got.iloc[0]
    a, b = r["term_a"], r["term_b"]
    n_a = sum(a in ts for ts in doc_terms)
    n_b = sum(b in ts for ts in doc_terms)
    n_ab = sum(a in ts and b in ts for ts in doc_terms)
    assert int(r["n_pair"]) == n_ab
    assert int(r["pmi_ppm"]) == n_ab * len(texts) * mixture.PMI_SCALE // (
        n_a * n_b
    )


def test_percentile_rank_laws(ray_session):
    got = mixture.q61_percentile_rank(SF).to_pandas()
    docs = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    assert len(got) == len(docs)
    for lang, g in got.groupby("lang"):
        # ranks are a permutation of 0..n-1
        assert sorted(g["rk"]) == list(range(len(g)))
        # rank order agrees with (n_chars, doc_id) order
        ordered = g.sort_values("rk")
        assert (
            ordered[["n_chars", "doc_id"]].values.tolist()
            == g.sort_values(["n_chars", "doc_id"])[["n_chars", "doc_id"]]
            .values.tolist()
        )
        assert (g["pct"] == g["rk"] * 100 // len(g)).all()


class TestWeightedSample:
    def test_exactly_k_picks_and_proportionality(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.pipelines import mixture

        out = mixture.q80_weighted_sample("/root/testdata/sf0.001").to_pandas()
        assert out["n_picks"].sum() == mixture.WS_K
        assert (out["n_picks"] >= 1).all()
        # systematic sampling law: a doc's picks never exceed
        # ceil(w / stride) where stride = W // K (heavy docs absorb more)
        import pyarrow.parquet as pq

        W = (
            pq.read_table(
                "/root/testdata/sf0.001/documents.parquet",
                columns=["n_chars"],
            )["n_chars"]
            .to_pandas()
            .sum()
        )
        stride = W / mixture.WS_K
        assert (out["n_picks"] <= (out["w"] / stride) + 1).all()

    def test_bruteforce_parity(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from agenticknowledgegraphconstructionsystem_ray.pipelines import mixture

        w = [5, 1, 1, 50, 1, 10, 1, 1]  # one heavy doc absorbs several picks
        t = pa.table(
            {
                "doc_id": pa.array(range(len(w)), pa.int64()),
                "text": pa.array(["x"] * len(w), pa.string()),
                "lang": pa.array(["en"] * len(w)),
                "source": pa.array(["s"] * len(w)),
                "n_chars": pa.array(w, pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        k = 7
        out = (
            mixture.q80_weighted_sample(str(tmp_path), k=k)
            .to_pandas()
            .set_index("doc_id")
        )
        W = sum(w)
        cum = 0
        want: dict[int, int] = {}
        ths = [(j * W) // k for j in range(k)]
        for i, wi in enumerate(w):
            lo, cum = cum, cum + wi
            n = sum(1 for tth in ths if lo <= tth < cum)
            if n:
                want[i] = n
        assert dict(zip(out.index, out["n_picks"])) == want
