"""Phase-16 operators: a-priori frequent term pairs, gear-CDC chunk dedup,
degree assortativity."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestCdcKernel:
    def test_spans_cover_and_bound(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.cdc import (
            CDC_MAX,
            chunk_spans,
        )

        rng = np.random.default_rng(3)
        data = bytes(rng.integers(32, 127, 5000, dtype=np.uint8))
        sp = chunk_spans(data)
        assert sum(n for _, n in sp) == len(data)
        # spans tile the input in order with no gaps
        pos = 0
        for off, n in sp:
            assert off == pos and n >= 1
            pos += n
        assert all(n <= CDC_MAX for _, n in sp)

    def test_shift_resistance(self):
        """CDC's reason to exist: an insertion near the start must leave
        most downstream chunk CONTENT unchanged (fixed-size chunking would
        re-align everything)."""
        from agenticknowledgegraphconstructionsystem_ray.stages.cdc import (
            chunk_spans,
        )

        rng = np.random.default_rng(7)
        data = bytes(rng.integers(32, 127, 3000, dtype=np.uint8))
        sp1 = chunk_spans(data)
        shifted = b"INSERTED PREFIX!" + data
        sp2 = chunk_spans(shifted)
        c1 = {data[o : o + n] for o, n in sp1}
        c2 = {shifted[o : o + n] for o, n in sp2}
        assert len(c1 & c2) >= len(c1) - 2

    def test_empty_and_tiny(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.cdc import (
            chunk_spans,
        )

        assert chunk_spans(b"") == []
        assert chunk_spans(b"ab") == [(0, 2)]

    def test_repetitive_data_degenerates_to_max(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.cdc import (
            CDC_MAX,
            chunk_spans,
        )

        sp = chunk_spans(b"ab" * 1000)
        assert all(n == CDC_MAX for _, n in sp[:-1])


class TestCdcPipeline:
    def _seq_mirror(self, sf_dir):
        from agenticknowledgegraphconstructionsystem_ray.stages.cdc import (
            doc_chunk_rows,
        )

        docs = pq.read_table(
            sf_dir + "/documents.parquet", columns=["doc_id", "text"]
        )
        rows = []
        for d, tx in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist()
        ):
            rows.extend(doc_chunk_rows(d, tx))
        first: dict[int, tuple[int, int]] = {}
        for h, d, off, ln in sorted(rows, key=lambda r: (r[1], r[2])):
            first.setdefault(h, (d, off))
        agg: dict[int, list[int]] = {}
        for h, d, off, ln in rows:
            dup = first[h] != (d, off)
            a = agg.setdefault(d, [0, 0, 0, 0])
            a[0] += 1
            a[1] += ln
            a[2] += int(dup)
            a[3] += ln * int(dup)
        return agg

    def test_matches_sequential_mirror(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.stages.cdc import (
            cdc_dedup_stats,
        )

        got = cdc_dedup_stats(SF).to_pandas().set_index("doc_id")
        want = self._seq_mirror(SF)
        assert set(got.index) == set(want)
        for d, (nc, nb, dc, db) in want.items():
            row = got.loc[d]
            assert (row["n_chunks"], row["n_bytes"],
                    row["dup_chunks"], row["dup_bytes"]) == (nc, nb, dc, db)
        # the synthetic corpus plants real duplicate content
        assert got["dup_chunks"].sum() > 0


class TestFrequentPairs:
    def test_hand_corpus(self, ray_session, tmp_path):
        from agenticknowledgegraphconstructionsystem_ray.pipelines.itemsets import (
            q82_frequent_pairs,
        )

        texts = (
            ["alpha beta gamma"] * 30
            + ["alpha beta"] * 30
            + ["delta epsilon"] * 5
            + ["zeta"] * 35
        )
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
        out = q82_frequent_pairs(str(tmp_path)).to_pandas()
        # n=100, minsup=5: frequent terms alpha(60) beta(60) gamma(30)
        # zeta(35) delta(5) epsilon(5); pairs >= 5:
        got = {
            (a, b): s
            for a, b, s in zip(out["term_a"], out["term_b"], out["support"])
        }
        assert got == {
            ("alpha", "beta"): 60,
            ("alpha", "gamma"): 30,
            ("beta", "gamma"): 30,
            ("delta", "epsilon"): 5,
        }

    def test_pair_support_never_exceeds_term_support(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.pipelines.itemsets import (
            q82_frequent_pairs,
            _doc_terms,
        )

        out = q82_frequent_pairs(SF).to_pandas()
        assert len(out) > 0
        docs = pq.read_table(SF + "/documents.parquet", columns=["text"])
        df: dict[str, int] = {}
        for tx in docs["text"].to_pylist():
            for term in _doc_terms(tx):
                df[term] = df.get(term, 0) + 1
        for a, b, s in zip(out["term_a"], out["term_b"], out["support"]):
            assert a < b
            assert s <= min(df[a], df[b])


class TestAssortativity:
    def test_star_graph_disassortative(self, ray_session):
        """A star is maximally degree-disassortative: r = -1."""
        import ray.data as rd

        from agenticknowledgegraphconstructionsystem_ray.pipelines.graphmetrics import (
            degree_assortativity,
        )

        edges = rd.from_arrow(
            pa.table(
                {
                    "subj_id": pa.array([0, 0, 0, 0], pa.int64()),
                    "obj_id": pa.array([1, 2, 3, 4], pa.int64()),
                }
            )
        )
        out = degree_assortativity(edges).to_pandas()
        assert out.loc[0, "m"] == 4
        assert out.loc[0, "r_ppm"] == -(10**6)

    def test_cycle_graph_r_undefined_zero(self, ray_session):
        """In a cycle every degree is 2 — zero variance, r denominator 0,
        reported as r_ppm = 0 by convention."""
        import ray.data as rd

        from agenticknowledgegraphconstructionsystem_ray.pipelines.graphmetrics import (
            degree_assortativity,
        )

        edges = rd.from_arrow(
            pa.table(
                {
                    "subj_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "obj_id": pa.array([1, 2, 3, 0], pa.int64()),
                }
            )
        )
        out = degree_assortativity(edges).to_pandas()
        assert out.loc[0, "r_ppm"] == 0

    def test_kg_value_matches_networkx_formula(self, ray_session):
        """Brute-force the exact integer formula over the KG's distinct
        undirected pairs and compare."""
        from agenticknowledgegraphconstructionsystem_ray.pipelines.graphalgo import (
            _kg_edges_ds,
        )
        from agenticknowledgegraphconstructionsystem_ray.pipelines.graphmetrics import (
            degree_assortativity,
            kg_assortativity,
        )
        from agenticknowledgegraphconstructionsystem_ray.pipelines.kgqueries import (
            _ensure_run,
        )

        out_dir = _ensure_run(SF)
        pairs = set()
        for b in _kg_edges_ds(out_dir).iter_batches(batch_format="pandas"):
            for s, o in zip(b["subj_id"], b["obj_id"]):
                if s != o:
                    pairs.add((min(s, o), max(s, o)))
        deg: dict[int, int] = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        M = len(pairs)
        se = sum(deg[a] * deg[b] for a, b in pairs)
        ss = sum(deg[a] + deg[b] for a, b in pairs)
        sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in pairs)
        num = (4 * M * se - ss * ss) * 10**6
        den = 2 * M * sq - ss * ss
        want = 0 if den == 0 else (
            num // den if num >= 0 else -((-num) // den)
        )
        got = kg_assortativity(SF).to_pandas()
        assert got.loc[0, "m"] == M
        assert got.loc[0, "r_ppm"] == want


class TestAnomalyHours:
    def test_planted_spike_is_the_only_flag(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from agenticknowledgegraphconstructionsystem_ray.pipelines.temporal import (
            q96_anomaly_hours,
        )

        t0 = dt.datetime(2024, 3, 1)
        rows = []
        eid = 0
        # type "a": 2 events in each of 30 hours, except hour 7 gets 40
        for h in range(30):
            for k in range(40 if h == 7 else 2):
                rows.append((eid, t0 + dt.timedelta(hours=h, minutes=k), "a"))
                eid += 1
        # type "b": perfectly uniform -> zero variance, nothing flagged
        for h in range(10):
            rows.append((eid, t0 + dt.timedelta(hours=h), "b"))
            eid += 1
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = q96_anomaly_hours(str(tmp_path)).to_pandas()
        assert len(got) == 1
        assert got.iloc[0]["event_type"] == "a"
        assert got.iloc[0]["n"] == 40
        assert got.iloc[0]["hour"] == t0 + dt.timedelta(hours=7)
