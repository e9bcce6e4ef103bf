"""Unit tests for the webtext cleaning operators (pipelines/webclean.py).
End-to-end SQL parity of q51/q52 is covered by tools/check_oracles.py and
the driver; these tests pin the kernel semantics on crafted inputs."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from agenticknowledgegraphconstructionsystem_ray.pipelines import webclean


def _redact_one(text: str) -> dict:
    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [text]})
    out = webclean.redact_batch(t)
    return {k: out[k][0].as_py() for k in out.column_names}


class TestRedact:
    def test_counts_and_masking(self):
        r = _redact_one(
            "mail a@b.com and c.d+x@e.org, see https://x.y/z?q=1 id 1234567"
        )
        assert r["n_emails"] == 2
        assert r["n_urls"] == 1
        assert r["n_nums"] == 1
        clean = "mail <EMAIL> and <EMAIL>, see <URL> id <NUM>"
        assert r["n_chars_clean"] == len(clean)

    def test_url_swallows_embedded_email_and_digits(self):
        # URL is redacted first and [^\s]+ runs to whitespace, so an email
        # or long digit run inside the URL is masked with it, not
        # double-counted afterwards.
        r = _redact_one("go https://x.y/a@b.com/1234567890 now")
        assert r["n_urls"] == 1
        assert r["n_emails"] == 0
        assert r["n_nums"] == 0

    def test_short_digit_runs_kept(self):
        r = _redact_one("version 12345 is fine but 123456 is an id")
        assert r["n_nums"] == 1

    def test_no_pii_passthrough(self):
        r = _redact_one("plain words only")
        assert (r["n_urls"], r["n_emails"], r["n_nums"]) == (0, 0, 0)
        assert r["n_chars_clean"] == len("plain words only")


class TestBoilerplate:
    def _run(self, texts):
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        ds = rd.from_arrow(t)
        # mirror q52's wiring on an in-memory dataset
        import math

        from ray.data.aggregate import Count

        thresh = max(2, math.ceil(webclean._REL_DF * ds.count()))
        freq_rows = (
            ds.map_batches(webclean._doc_grams, batch_format="pyarrow")
            .groupby("gram")
            .aggregate(Count(alias_name="df"))
            .filter(expr=f"df >= {thresh}")
            .take_all()
        )
        freq_ref = ray.put(frozenset(r["gram"] for r in freq_rows))
        out = (
            ds.map_batches(
                webclean._RemoveBoilerplate,
                fn_constructor_kwargs={"freq_ref": freq_ref},
                batch_format="pyarrow",
                concurrency=1,
            )
            .sort("doc_id")
            .to_pandas()
        )
        return out.set_index("doc_id")

    def test_frequent_gram_removed_everywhere(self, ray_session):
        boiler = "click here now"
        texts = [f"{boiler} unique{i} tail{i}" for i in range(10)]
        texts.append("totally different words altogether")
        out = self._run(texts)
        for i in range(10):
            assert out.loc[i, "n_removed"] == 3  # the planted 3-gram
            assert out.loc[i, "n_kept"] == 2
        assert out.loc[10, "n_removed"] == 0

    def test_overlapping_spans_unioned(self, ray_session):
        # "a b c" and "b c d" both frequent -> positions {0,1,2,3} covered
        # in "a b c d x": 4 removed, not 6.
        texts = [f"a b c d x{i}" for i in range(10)]
        out = self._run(texts)
        assert (out["n_removed"] == 4).all()
        assert (out["n_kept"] == 1).all()

    def test_short_docs_untouched(self, ray_session):
        texts = ["xx yy" for _ in range(5)] + [f"p q r s{i}" for i in range(5)]
        out = self._run(texts)
        assert (out.loc[:4, "n_removed"] == 0).all()


class TestDupSpans:
    def test_planted_duplicate_span(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        texts = [
            f"one two {span} three four",          # doc 0: dup at pos 2
            f"{span} five six seven eight",        # doc 1: dup at pos 0
            "nine ten eleven twelve thirteen fourteen fifteen sixteen",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["s"] * 3),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = (
            webclean.q53_dup_spans(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "n_dup_windows"] == 1
        assert out.loc[0, "n_covered"] == 8
        assert out.loc[0, "n_tokens"] == 12
        assert out.loc[1, "n_dup_windows"] == 1
        assert out.loc[1, "n_covered"] == 8
        assert out.loc[2, "n_dup_windows"] == 0
        assert out.loc[2, "n_covered"] == 0

    def test_overlap_union_interval_math(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        # doc 0 and doc 1 share a 9-token run -> two overlapping 8-windows
        # in each: coverage = 8 + min(1, 8) = 9, not 16
        run = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
        texts = [f"x {run} y", f"{run} z w"]
        t = pa.table(
            {
                "doc_id": pa.array(range(2), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 2),
                "source": pa.array(["s"] * 2),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = (
            webclean.q53_dup_spans(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
        )
        assert (out["n_dup_windows"] == 2).all()
        assert (out["n_covered"] == 9).all()


class TestSpanDedup:
    def _write(self, tmp_path, texts):
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        return str(tmp_path)

    def test_full_duplicate_comes_back_empty(self, ray_session, tmp_path):
        text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        out = (
            webclean.q78_span_dedup(self._write(tmp_path, [text, text]))
            .to_pandas()
            .set_index("doc_id")
        )
        # doc 0 keeps everything (first occurrence), doc 1 loses all spans
        assert out.loc[0, "n_kept"] == out.loc[0, "n_spans"] == 2
        assert out.loc[0, "text_dedup"] == text
        assert out.loc[1, "n_kept"] == 0
        assert out.loc[1, "text_dedup"] == ""

    def test_partial_overlap_keeps_unique_tail(self, ray_session, tmp_path):
        span = "a b c d e f g h"  # exactly one 8-token span
        out = (
            webclean.q78_span_dedup(
                self._write(
                    tmp_path, [f"{span} x y z", f"{span} p q r"]
                )
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "text_dedup"] == f"{span} x y z"
        # doc 1's first span is a duplicate; its 3-token tail survives
        assert out.loc[1, "n_spans"] == 2 and out.loc[1, "n_kept"] == 1
        assert out.loc[1, "text_dedup"] == "p q r"

    def test_within_doc_repeat_dropped(self, ray_session, tmp_path):
        span = "a b c d e f g h"
        out = (
            webclean.q78_span_dedup(self._write(tmp_path, [f"{span} {span}"]))
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "n_spans"] == 2 and out.loc[0, "n_kept"] == 1
        assert out.loc[0, "text_dedup"] == span

    def test_unique_docs_roundtrip_normalized_text(self, ray_session, tmp_path):
        texts = ["One two THREE four five six seven eight nine", "ten eleven"]
        out = (
            webclean.q78_span_dedup(self._write(tmp_path, texts))
            .to_pandas()
            .set_index("doc_id")
        )
        for i, tx in enumerate(texts):
            norm = " ".join(webclean._TOKEN_RE.findall(tx.lower()))
            assert out.loc[i, "text_dedup"] == norm
            assert out.loc[i, "n_kept"] == out.loc[i, "n_spans"]
