"""Unit tests for the corpus scoring/indexing operators (pipelines/scoring.py):
Misra-Gries sketch algebra, bounded-postings combiner, certificate fallback,
integer-exact grouped centering. The end-to-end SQL parity of q41-q43 and
sk_heavy_hitters is covered by test_oracle_parity.py."""

import collections

import numpy as np

from agenticknowledgegraphconstructionsystem_ray.arrowcmp import to_arrow
from agenticknowledgegraphconstructionsystem_ray.pipelines import scoring

SF = "/root/testdata/sf0.001"


class TestMisraGries:
    def test_small_stream_exact(self):
        # below capacity MG is exact counting
        counters: dict[str, int] = {}
        stream = ["a", "b", "a", "c", "a", "b"]
        for t in stream:
            scoring._mg_add(counters, t)
        assert counters == {"a": 3, "b": 2, "c": 1}

    def test_undercount_bound(self):
        # adversarial stream larger than capacity: MG guarantees
        # count(t) - n/C <= counter(t) <= count(t)
        rng = np.random.default_rng(7)
        zipf = rng.zipf(1.3, size=200_000)
        stream = [f"t{v}" for v in zipf]
        truth = collections.Counter(stream)
        counters: dict[str, int] = {}
        for t in stream:
            scoring._mg_add(counters, t)
        err = len(stream) // scoring.MG_CAPACITY
        assert len(counters) <= scoring.MG_CAPACITY
        for term, est in counters.items():
            assert est <= truth[term]
            assert est >= truth[term] - err
        # heavy terms must survive
        for term, n in truth.most_common(20):
            assert n <= err or term in counters

    def test_capacity_never_exceeded(self):
        counters: dict[str, int] = {}
        for i in range(scoring.MG_CAPACITY * 3):
            scoring._mg_add(counters, f"u{i}")
            assert len(counters) <= scoring.MG_CAPACITY


class TestHeavyHitters:
    def test_matches_exact_topk(self, ray_session):
        got = scoring.sk_heavy_hitters(SF)
        t = to_arrow(got)
        # independent exact recount
        import duckdb

        exact = duckdb.sql(
            scoring.ORACLE_SQL["sk_heavy_hitters"].replace(
                "documents", f"read_parquet('{SF}/documents.parquet')"
            )
        ).arrow()
        assert t.column("term").to_pylist() == exact.column("term").to_pylist()
        assert t.column("n").to_pylist() == exact.column("n").to_pylist()

    def test_fallback_on_failed_certificate(self, ray_session, monkeypatch):
        # force the certificate to fail: zero candidates allowed
        monkeypatch.setattr(scoring, "_HH_CANDIDATES", 1)
        got = scoring.sk_heavy_hitters(SF)
        t = to_arrow(got)
        # fallback path must still produce the exact top-20
        import duckdb

        exact = duckdb.sql(
            scoring.ORACLE_SQL["sk_heavy_hitters"].replace(
                "documents", f"read_parquet('{SF}/documents.parquet')"
            )
        ).arrow()
        assert t.column("term").to_pylist() == exact.column("term").to_pylist()


class TestInvertedIndex:
    def test_postings_bounded_and_sorted(self, ray_session):
        t = scoring.q42_inverted_index(SF).take_all()
        assert len(t) > 0
        for r in t:
            ids = [int(x) for x in r["postings"].split(",")]
            assert ids == sorted(ids)
            assert len(ids) <= scoring._POSTINGS_K
            assert len(ids) == min(r["df"], scoring._POSTINGS_K)

    def test_block_mink_is_global_mink(self):
        # the combiner's per-block min-k union reproduces the global min-k
        all_ids = list(range(100))
        rng = np.random.default_rng(3)
        rng.shuffle(all_ids)
        blocks = [all_ids[i::7] for i in range(7)]
        k = scoring._POSTINGS_K
        partial = [sorted(b)[:k] for b in blocks]
        merged = sorted({x for p in partial for x in p})[:k]
        assert merged == sorted(all_ids)[:k]


class TestDocDev:
    def test_dev_sums_to_zero_per_lang(self, ray_session):
        t = scoring.q43_doc_dev(SF).to_pandas()
        for _, g in t.groupby("lang"):
            assert int(g["dev"].sum()) == 0

    def test_integer_identity(self, ray_session):
        import pyarrow.parquet as pq

        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        ).to_pandas()
        t = scoring.q43_doc_dev(SF).to_pandas().set_index("doc_id")
        stats = docs.groupby("lang")["n_chars"].agg(["count", "sum"])
        for _, row in docs.sample(50, random_state=0).iterrows():
            n, s = stats.loc[row["lang"]]
            assert (
                t.loc[row["doc_id"], "dev"]
                == row["n_chars"] * int(n) - int(s)
            )


class TestTfidf:
    def test_topk_shape_and_df_consistency(self, ray_session):
        t = scoring.q41_tfidf_top_terms(SF).to_pandas()
        # at most 3 rows per doc
        assert t.groupby("doc_id").size().max() <= 3
        # df must be consistent per term across documents
        df_per_term = t.groupby("term")["df"].nunique()
        assert (df_per_term == 1).all()
        # tf >= 1, df >= 1
        assert (t["tf"] >= 1).all() and (t["df"] >= 1).all()


class TestLMSurprisal:
    def test_scores_monotone_in_rarity(self, ray_session):
        out = scoring.q49_lm_surprisal(SF).to_pandas()
        assert len(out) == 500
        assert (out["lm_score"] >= out["n_tokens"]).all()  # >= 1 digit/token
        # a doc's score per token is bounded by the OOV surprisal
        import duckdb

        total = duckdb.sql(
            f"""SELECT COUNT(*) FROM (SELECT unnest(list_filter(
            regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))
            FROM read_parquet('{SF}/documents.parquet'))"""
        ).fetchone()[0]
        oov = len(str(total)) + 1
        nz = out[out["n_tokens"] > 0]
        assert (nz["lm_score"] <= nz["n_tokens"] * oov).all()

    def test_vocab_rule_matches_definition(self, ray_session):
        # hand-recount at tiny scale: every token of doc 0 scored per the
        # digits10(total // count) rule over the exact top-V vocabulary
        import collections
        import re

        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        tokre = re.compile(r"[a-z0-9]+")
        cnt = collections.Counter(
            w for x in t["text"].to_pylist() for w in tokre.findall(x.lower())
        )
        total = sum(cnt.values())
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[: scoring._LM_VOCAB]
        w = {k: len(str(total // v)) for k, v in top}
        oov = len(str(total)) + 1
        doc0 = t["text"][0].as_py()
        expect = sum(w.get(tok, oov) for tok in tokre.findall(doc0.lower()))
        out = scoring.q49_lm_surprisal(SF).to_pandas().set_index("doc_id")
        assert out.loc[0, "lm_score"] == expect


class TestSourceCap:
    def test_cap_and_ordering(self, ray_session):
        out = scoring.q50_source_cap(SF).to_pandas()
        sizes = out.groupby("source").size()
        assert (sizes <= scoring._SOURCE_CAP).all()
        # kept docs per source are exactly the CAP longest (ties doc_id asc)
        import pyarrow.parquet as pq

        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ).to_pandas()
        for src, grp in docs.groupby("source"):
            want = grp.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            want = set(want.head(scoring._SOURCE_CAP)["doc_id"])
            got = set(out[out["source"] == src]["doc_id"])
            assert got == want


def test_kwic_positions_are_real_occurrences(ray_session):
    import pyarrow.parquet as pq

    got = scoring.q64_kwic(SF).to_pandas()
    docs = dict(
        zip(
            *pq.read_table(
                SF + "/documents.parquet", columns=["doc_id", "text"]
            ).to_pydict().values()
        )
    )
    assert len(got) > 0
    for _, r in got.iterrows():
        text = docs[r["doc_id"]].lower()
        assert text[r["pos"] - 1 : r["pos"] - 1 + len(r["term"])] == r["term"]
        # and it's the FIRST occurrence
        assert text.find(r["term"]) == r["pos"] - 1
    # per-term cap respected
    assert got.groupby("term").size().max() <= scoring.KWIC_PER_TERM


def test_doc_term_matrix_counts(ray_session):
    import re

    import pyarrow.parquet as pq

    got = scoring.q65_doc_term_matrix(SF).to_pandas()
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    token_re = re.compile(r"[a-z0-9]+")
    # rebuild the vocabulary exactly
    from collections import Counter

    total = Counter()
    per_doc = {}
    for did, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        c = Counter(token_re.findall(tx.lower()))
        per_doc[did] = c
        total.update(c)
    vocab = sorted(total, key=lambda k: (-total[k], k))[: scoring.DTM_V]
    tid = {t_: i for i, t_ in enumerate(vocab)}
    for _, r in got.head(200).iterrows():
        term = vocab[r["term_id"]]
        assert per_doc[r["doc_id"]][term] == r["n"]
    # every (doc, vocab-term with n>0) is present
    want_rows = sum(
        1 for did, c in per_doc.items() for k in c if k in tid
    )
    assert len(got) == want_rows


def test_bpe_first_merge_is_most_frequent_bigram(ray_session):
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.functions import bpe

    got = scoring.q70_bpe_merges(SF).to_pydict()
    texts = pq.read_table(SF + "/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    token_re = re.compile(r"[a-z0-9]+")
    wc = Counter(w for t in texts for w in token_re.findall(t.lower()))
    bigrams = Counter()
    for w, c in wc.items():
        for a, b in zip(w, w[1:]):
            bigrams[(a, b)] += c
    best = min(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (got["sym_a"][0], got["sym_b"][0]) == best[0]
    assert got["n"][0] == best[1]
    assert got["rank"] == list(range(len(got["rank"])))


def test_bpe_kernel_merge_application():
    from agenticknowledgegraphconstructionsystem_ray.functions import bpe

    # 'ab' dominates; then 'abc' forms from (ab, c)
    merges = bpe.learn_merges([("abc", 10), ("abd", 4), ("xy", 1)], k=2)
    assert merges[0] == ("a", "b", 14)
    assert merges[1] == ("ab", "c", 10)


class TestBpeEncode:
    def test_encode_word_replays_merges_in_order(self):
        from agenticknowledgegraphconstructionsystem_ray.functions.bpe import encode_word

        # rank order matters: ("a","b") first fuses ab, then ("ab","c")
        assert encode_word("abc", [("a", "b"), ("ab", "c")]) == ["abc"]
        # reversed ranks: ("ab","c") never matches raw chars, ("a","b") does
        assert encode_word("abc", [("ab", "c"), ("a", "b")]) == ["ab", "c"]
        # greedy left-to-right within one rank
        assert encode_word("aaa", [("a", "a")]) == ["aa", "a"]
        assert encode_word("x", []) == ["x"]

    def test_no_merges_means_char_count(self):
        from agenticknowledgegraphconstructionsystem_ray.functions.bpe import encode_word

        assert len(encode_word("hello", [])) == 5

    def test_corpus_encode_laws(self, ray_session):
        """n_words <= n_bpe_tokens <= total alnum chars; merges only shrink."""
        import pyarrow.parquet as pq
        import re

        from agenticknowledgegraphconstructionsystem_ray.pipelines import scoring

        sf = "/root/testdata/sf0.001"
        got = scoring.tx_bpe_encode(sf).to_pandas().set_index("doc_id")
        tok = re.compile(r"[a-z0-9]+")
        docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
        for _, r in docs.iterrows():
            ts = tok.findall(r["text"].lower())
            row = got.loc[r["doc_id"]]
            assert row["n_words"] == len(ts)
            assert row["n_words"] <= row["n_bpe_tokens"] <= sum(len(w) for w in ts)


class TestZlibRatio:
    def test_repetition_compresses_below_noise(self):
        import pyarrow as pa

        from agenticknowledgegraphconstructionsystem_ray.stages.textstats import zlib_ratio_batch

        rep = "spam ham " * 200
        # deterministic pseudo-noise (md5 hex chains) — incompressible-ish
        import hashlib

        chunks, h = [], b"seed"
        for _ in range(100):
            h = hashlib.md5(h).digest()
            chunks.append(h.hex())
        noise = " ".join(chunks)
        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([rep, noise], pa.string()),
            }
        )
        out = zlib_ratio_batch(t).to_pandas().set_index("doc_id")
        assert out.loc[0, "ratio_ppm"] < out.loc[1, "ratio_ppm"]
        assert out.loc[0, "n_bytes"] == len(rep.encode())

    def test_ratio_formula_exact(self):
        import pyarrow as pa
        import zlib

        from agenticknowledgegraphconstructionsystem_ray.stages import textstats

        s = "alpha beta gamma"
        t = pa.table({"doc_id": pa.array([7], pa.int64()), "text": [s]})
        out = textstats.zlib_ratio_batch(t)
        comp = zlib.compress(s.encode(), textstats.ZLIB_LEVEL)
        assert out["n_comp"][0].as_py() == len(comp)
        assert out["ratio_ppm"][0].as_py() == len(comp) * 1_000_000 // len(s.encode())


class TestFreqSpectrum:
    def test_conservation(self, ray_session):
        import duckdb

        from agenticknowledgegraphconstructionsystem_ray.pipelines import scoring

        sf = "/root/testdata/sf0.001"
        got = scoring.tx_freq_spectrum(sf).to_pandas()
        assert (got["f"] > 0).all() and (got["n_terms"] > 0).all()
        con = duckdb.connect()
        n_tok, n_terms = con.execute(
            "SELECT COUNT(*), COUNT(DISTINCT term) FROM ("
            "SELECT unnest(list_filter(regexp_split_to_array(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '')) AS term "
            f"FROM read_parquet('{sf}/documents.parquet'))"
        ).fetchone()
        assert int((got["f"] * got["n_terms"]).sum()) == n_tok
        assert int(got["n_terms"].sum()) == n_terms
