"""Text-analysis kernels: language-ID, quality buckets, fingerprints."""

import pyarrow as pa

from agenticknowledgegraphconstructionsystem_ray.stages import textstats


def test_langid_on_real_snippets():
    assert textstats.detect_lang("the cat and the dog ran to a tree in the park") == "en"
    assert textstats.detect_lang("der Hund und die Katze sind nicht zu Hause") == "de"
    assert textstats.detect_lang("le chat est dans les jardins pour la nuit") == "fr"
    assert textstats.detect_lang("el perro no es como los gatos pero come una manzana") == "es"
    assert textstats.detect_lang("zzz qqq xxx") == "unknown"
    assert textstats.detect_lang("") == "unknown"


def test_langid_tie_break_order():
    # 'est' hits fr ('est'); text with equal en and de evidence -> en wins
    assert textstats.detect_lang("the der") == "en"


def test_quality_buckets():
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat and a dog sat in the house with many friends "
                + "word " * 60,  # long, stopwords, little punct -> high
                "tiny text",  # <10 tokens -> low
                "words without stops qqq zzz vvv mmm nnn ppp rrr sss ttt uuu",  # no stopword -> low
            ],
        }
    )
    out = textstats.quality_batch(t).to_pydict()
    assert out["quality"] == ["high", "low", "low"]


def test_token_classes():
    t = pa.table({"doc_id": [1], "text": ["Abc 123 x9 !? ,"]})
    out = textstats.token_classes_batch(t).to_pydict()
    # lower: "abc 123 x9 !? ," -> words: abc, x; nums: 123, 9; symbols: !, ?, ,
    assert out["n_word_tokens"] == [2]
    assert out["n_num_tokens"] == [2]
    assert out["n_symbols"] == [3]


def test_fingerprint_deterministic_and_shift_stable():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    f1 = textstats.fingerprint(base)
    f2 = textstats.fingerprint(base)
    assert f1 == f2
    # identical content -> identical fingerprint; different content differs
    other = textstats.fingerprint("totally different words " * 10)
    assert f1 != other
    # appending a prefix keeps at least one interior fingerprint in common
    shifted = "prefix tokens here " + base
    m1 = textstats.fingerprint(base)[0]
    # compare full winnowing sets via the batch API
    t = pa.table({"doc_id": [1, 2], "text": [base, shifted]})
    out = textstats.fingerprint_batch(t).to_pydict()
    assert out["n_fps"][0] > 0 and out["n_fps"][1] > 0
    assert m1 == f1[0]


class TestWinnowPairs:
    def test_kernel_contains_min_and_sorted(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.textstats import (
            fingerprint,
            winnow_set,
        )

        txt = "the quick brown fox jumps over the lazy dog " * 5
        s = winnow_set(txt)
        assert s == sorted(s) and len(s) == len(set(s))
        assert fingerprint(txt) == (s[0], len(s))

    def test_planted_copy_detected(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from agenticknowledgegraphconstructionsystem_ray.stages.textstats import (
            winnow_pairs,
        )

        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3)
        other = ("one two three four five six seven eight nine ten eleven "
                 "twelve thirteen fourteen fifteen sixteen " * 3)
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([base, base + " phi chi psi", other]),
            }
        )
        got = winnow_pairs(rd.from_arrow(docs)).to_pylist()
        pairs = {(r["doc_a"], r["doc_b"]) for r in got}
        assert (1, 2) in pairs
        assert all(p in {(1, 2), (1, 3), (2, 3)} for p in pairs)
        assert (1, 3) not in pairs and (2, 3) not in pairs
