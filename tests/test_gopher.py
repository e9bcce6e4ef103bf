"""Gopher-rule quality battery and DSIR-shape importance weights."""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.parquet as pq

from agenticknowledgegraphconstructionsystem_ray.pipelines import gopher

SF = "/root/testdata/sf0.001"

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def test_gopher_batch_planted_cases():
    filler = " ".join(["words"] * 40)  # 40 five-char tokens
    docs = {
        # passes everything: 42 words, mean len >= 4, two stopwords, no syms
        "good": f"the and {filler}",
        # too short
        "short": "the and tiny text",
        # stopword floor fails (only one distinct stopword)
        "nostop": f"the {filler}",
        # mean word length below 4 (all 2-char tokens)
        "thin": "the and " + " ".join(["ab"] * 40),
        # symbol-heavy: > 0.5 symbols per word
        "symbols": f"the and {filler} " + "!@#$%^&*()" * 3,
    }
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    out = gopher._gopher_batch(t).to_pydict()
    by = {name: i for i, name in enumerate(docs)}
    assert out["keep"][by["good"]] == 1
    assert out["r_nwords"][by["short"]] == 0
    assert out["r_stop"][by["nostop"]] == 0
    assert out["r_wordlen"][by["thin"]] == 0
    assert out["r_symbol"][by["symbols"]] == 0
    # every failing doc fails overall
    for name in ("short", "nostop", "thin", "symbols"):
        assert out["keep"][by[name]] == 0


def test_gopher_rules_discriminate_on_corpus(ray_session):
    out = gopher.q57_gopher_rules(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet", columns=["doc_id"]).to_pandas()
    assert len(out) == len(docs)
    assert list(out["doc_id"]) == sorted(docs["doc_id"])
    # thresholds were picked to split the synthetic corpus — both sides present
    assert 0 < out["keep"].sum() < len(out)
    for rule in ("r_nwords", "r_wordlen", "r_stop"):
        assert 0 < out[rule].sum() < len(out), rule
    # verdict == conjunction of the flags
    conj = (
        out["r_nwords"] & out["r_wordlen"] & out["r_stop"] & out["r_symbol"]
    )
    assert (out["keep"] == conj).all()


def test_importance_weights_sequential_recompute(ray_session):
    out = gopher.q58_importance_weights(SF).to_pandas()
    docs = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pandas()

    def feat(tok: str) -> str:
        return hashlib.md5(tok.encode()).hexdigest()[:2]

    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    toks_by_doc = {}
    for r in docs.itertuples():
        toks = _TOKEN_RE.findall(r.text.lower())
        toks_by_doc[r.doc_id] = toks
        for tok in toks:
            f = feat(tok)
            raw[f] = raw.get(f, 0) + 1
            if r.lang == gopher.TARGET_LANG:
                tgt[f] = tgt.get(f, 0) + 1
    w = {f: tgt.get(f, 0) * gopher._W_SCALE // raw[f] for f in raw}

    got = out.set_index("doc_id")
    for doc_id, toks in toks_by_doc.items():
        assert got.loc[doc_id, "n_tokens"] == len(toks)
        assert got.loc[doc_id, "weight_ppm"] == sum(w[feat(t)] for t in toks)
    # english documents must score higher on average than non-english
    en = docs.lang == gopher.TARGET_LANG
    mean_en = out[en.values]["weight_ppm"].sum() / max(out[en.values]["n_tokens"].sum(), 1)
    mean_rest = out[~en.values]["weight_ppm"].sum() / max(out[~en.values]["n_tokens"].sum(), 1)
    assert mean_en > mean_rest


def test_source_quality_consistent_with_q57(ray_session):
    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import gopher

    sf = "/root/testdata/sf0.001"
    per_doc = gopher.q57_gopher_rules(sf).to_pandas()
    docs = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    merged = per_doc.merge(docs, on="doc_id")
    got = gopher.q72_source_quality(sf).to_pandas()
    for _, r in got.iterrows():
        g = merged[merged.source == r["source"]]
        assert r["n_docs"] == len(g)
        assert r["n_keep"] == g["keep"].sum()
        assert r["keep_ppm"] == g["keep"].sum() * 1_000_000 // len(g)
        assert r["mean_words_x100"] == g["n_words"].sum() * 100 // len(g)
