"""Invariant tests for the training-data assembly family
(pipelines/assembly.py). SQL parity of all five queries is covered by
test_oracle_parity.py; these tests check the semantic invariants the SQL
cannot see (planted contamination, packing coverage, shard partition laws)
plus the zero-token edge case on a crafted corpus."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agenticknowledgegraphconstructionsystem_ray.arrowcmp import to_arrow
from agenticknowledgegraphconstructionsystem_ray.pipelines import assembly

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Tiny crafted documents table: doc 0 is an eval doc (0 % 97 == 0);
    doc 1 repeats one of its 8-grams verbatim; doc 2 shares no 8-gram;
    doc 3 is shorter than 8 tokens; doc 4 is empty text."""
    d = tmp_path_factory.mktemp("assembly_planted")
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    eval_text,
                    # contains eval 8-gram "beta gamma ... iota" at offset 1
                    "x y beta gamma delta epsilon zeta eta theta iota z",
                    "one two three four five six seven eight nine ten",
                    "too short for grams",
                    "",
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 5, pa.string()),
            "source": pa.array(["src0"] * 5, pa.string()),
            "n_chars": pa.array([len(eval_text), 51, 48, 19, 0], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))
    return str(d)


class TestDecontaminate:
    def test_planted_contamination(self, ray_session, planted_dir):
        t = to_arrow(assembly.dd_decontaminate(planted_dir))
        rows = {
            r["doc_id"]: r for r in t.to_pylist()
        }
        # eval doc self-hits on every one of its 3 grams
        assert rows[0]["is_eval"] == 1 and rows[0]["n_hits"] == 3
        # doc 1 embeds exactly one eval 8-gram
        assert rows[1]["contaminated"] == 1 and rows[1]["n_hits"] == 1
        # disjoint and sub-8-token docs are clean
        assert rows[2]["n_hits"] == 0 and rows[2]["contaminated"] == 0
        assert rows[3]["n_hits"] == 0
        assert rows[4]["n_hits"] == 0

    def test_corpus_has_both_classes(self, ray_session):
        t = to_arrow(assembly.dd_decontaminate(SF))
        flags = set(t["contaminated"].to_pylist())
        evals = sum(t["is_eval"].to_pylist())
        assert evals >= 1
        # synthetic docs all exceed 8 tokens, so every eval doc self-hits
        for r in t.to_pylist():
            if r["is_eval"]:
                assert r["contaminated"] == 1
        assert flags <= {0, 1}


class TestPacking:
    def test_offsets_partition_token_stream(self, ray_session):
        t = to_arrow(assembly.q45_pack_offsets(SF)).sort_by("doc_id")
        n = np.array(t["n_tokens"].to_pylist())
        start = np.array(t["tok_start"].to_pylist())
        # concatenation law: each doc starts where the previous ended
        assert start[0] == 0
        assert np.array_equal(start[1:], (start + n)[:-1])
        first = np.array(t["seq_first"].to_pylist())
        last = np.array(t["seq_last"].to_pylist())
        S = assembly.SEQLEN
        pos = n > 0
        assert np.array_equal(first, start // S)
        assert np.array_equal(last[pos], (start[pos] + n[pos] - 1) // S)

    def test_sequences_cover_stream_exactly(self, ray_session):
        off = to_arrow(assembly.q45_pack_offsets(SF))
        total = sum(off["n_tokens"].to_pylist())
        seqs = to_arrow(assembly.q46_pack_sequences(SF)).sort_by("seq_id")
        ids = seqs["seq_id"].to_pylist()
        fills = seqs["n_tokens"].to_pylist()
        S = assembly.SEQLEN
        # contiguous ids, every token accounted for exactly once, all
        # sequences full except possibly the final one
        assert ids == list(range(len(ids)))
        assert sum(fills) == total
        assert all(f == S for f in fills[:-1])
        assert 0 < fills[-1] <= S

    def test_zero_token_doc(self, ray_session, planted_dir):
        t = to_arrow(assembly.q45_pack_offsets(planted_dir)).sort_by("doc_id")
        rows = {r["doc_id"]: r for r in t.to_pylist()}
        assert rows[4]["n_tokens"] == 0
        assert rows[4]["seq_first"] == rows[4]["seq_last"]
        # an empty doc occupies no positions: next start equals its start
        # (doc 4 is last, so its start is the total token count)
        assert rows[4]["tok_start"] == sum(
            r["n_tokens"] for r in rows.values()
        )


class TestShardAssignment:
    def test_partition_laws(self, ray_session):
        t = to_arrow(assembly.q44_shard_assignment(SF))
        by_shard: dict[int, list[int]] = {}
        for r in t.to_pylist():
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        total = 0
        for shard, poss in by_shard.items():
            assert 0 <= shard < assembly.NSHARDS
            # positions within a shard are exactly 0..count-1
            assert sorted(poss) == list(range(len(poss)))
            total += len(poss)
        assert total == t.num_rows

    def test_deterministic(self, ray_session):
        a = to_arrow(assembly.q44_shard_assignment(SF)).sort_by("doc_id")
        b = to_arrow(assembly.q44_shard_assignment(SF)).sort_by("doc_id")
        assert a.equals(b)


class TestRepetition:
    def test_planted_values(self, ray_session, planted_dir):
        t = to_arrow(assembly.q48_repetition(planted_dir)).sort_by("doc_id")
        rows = {r["doc_id"]: r for r in t.to_pylist()}
        # doc 0: 9 distinct bigrams, none repeated
        assert rows[0]["n_bigrams"] == 9 and rows[0]["n_dup_bigrams"] == 0
        assert rows[0]["rep_permille"] == 0
        # empty doc: zero bigrams, defined as 0 permille
        assert rows[4]["n_bigrams"] == 0 and rows[4]["rep_permille"] == 0

    def test_fully_repetitive_doc(self, ray_session, tmp_path):
        docs = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["spam spam spam spam spam"], pa.string()),
                "lang": pa.array(["en"], pa.string()),
                "source": pa.array(["src0"], pa.string()),
                "n_chars": pa.array([24], pa.int64()),
            }
        )
        pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
        t = to_arrow(assembly.q48_repetition(str(tmp_path)))
        r = t.to_pylist()[0]
        # 4 bigrams, 1 distinct -> 3 duplicates -> 750 permille
        assert r["n_bigrams"] == 4 and r["n_dup_bigrams"] == 3
        assert r["rep_permille"] == 750


class TestQualityClassifier:
    def test_scores_match_manual(self, ray_session, planted_dir):
        t = to_arrow(assembly.q47_quality_classifier(planted_dir)).sort_by(
            "doc_id"
        )
        from agenticknowledgegraphconstructionsystem_ray.pipelines.scoring import (
            _TOKEN_RE,
        )

        docs = pq.read_table(
            os.path.join(planted_dir, "documents.parquet")
        ).to_pylist()
        w = assembly.QUALITY_W
        for row, d in zip(t.to_pylist(), sorted(docs, key=lambda x: x["doc_id"])):
            ts = _TOKEN_RE.findall(d["text"].lower())
            feats = np.array(
                [
                    len(ts),
                    len(set(ts)),
                    len(d["text"]),
                    sum(1 for x in ts if len(x) >= 6),
                ],
                dtype=np.int64,
            )
            assert row["score"] == int(feats @ w)
            assert row["keep"] == int(
                row["score"] >= assembly.QUALITY_THRESHOLD
            )


class TestZOrder:
    def test_zorder_prunes_tighter_than_byid(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.pipelines import assembly

        got = assembly.ta_zorder("/root/testdata/sf0.01").to_pandas()
        z = got[got.layout == "zorder"]
        n = got[got.layout == "byid"]
        # same docs, same chunk count
        assert z["n_docs"].sum() == n["n_docs"].sum()
        assert len(z) == len(n)
        # the point of the layout: total pruning volume strictly shrinks
        assert z["vol"].sum() < n["vol"].sum()
        # envelopes are valid boxes within the bucket domain
        assert (got["min_x"] <= got["max_x"]).all()
        assert (got["min_y"] <= got["max_y"]).all()
        assert got["min_x"].min() >= 0 and got["max_y"].max() < 16
