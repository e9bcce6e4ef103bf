"""Phase-15 operators: dHash image near-dup, last-touch attribution,
type-partition modularity."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# dHash kernel
# ---------------------------------------------------------------------------


class TestDHashKernel:
    def test_identical_images_same_hash(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.imagehash import (
            dhash64,
            hamming64,
        )

        g = (np.arange(20 * 30).reshape(20, 30) % 251).astype(np.int64)
        assert hamming64(dhash64(g), dhash64(g.copy())) == 0

    def test_constant_shift_invariance(self):
        """dHash compares adjacent cell means — adding a constant (no
        overflow involved: plain int64) must not change any bit."""
        from agenticknowledgegraphconstructionsystem_ray.stages.imagehash import (
            dhash64,
        )

        g = (np.arange(16 * 18).reshape(16, 18) * 7 % 200).astype(np.int64)
        assert dhash64(g) == dhash64(g + 1000)

    def test_local_edit_small_distance(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.imagehash import (
            dhash64,
            hamming64,
        )

        g = (np.arange(32 * 36).reshape(32, 36) % 256).astype(np.int64)
        g2 = g.copy()
        g2[:4, :4] += 100000  # one corner cell blasted
        d = hamming64(dhash64(g), dhash64(g2))
        assert 1 <= d <= 8

    def test_tiny_image_padding(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.imagehash import (
            dhash64,
        )

        g = np.array([[1, 2], [3, 4]], dtype=np.int64)
        assert isinstance(dhash64(g), int)  # no crash, deterministic
        assert dhash64(g) == dhash64(g)

    def test_bucket_pair_kernel_cap_deterministic(self):
        from agenticknowledgegraphconstructionsystem_ray.stages.imagehash import (
            pairs_from_bucket,
        )

        ids = [5, 3, 9, 1]
        hs = [0b1010, 0b1010, 0b1011, 0b0000]
        out = pairs_from_bucket(ids, hs, ham_max=1, cap=3)
        # cap=3 keeps smallest ids {1, 3, 5}; pairs checked among them
        assert out == [(3, 5, 0)]


class TestDHashPipeline:
    def _expected_hashes(self, doc_ids):
        from agenticknowledgegraphconstructionsystem_ray.stages.imagehash import (
            dhash64,
            to_gray_i64,
        )
        from agenticknowledgegraphconstructionsystem_ray.stages.multimodal import (
            synth_blocks,
            synth_gif_rgb,
            synth_pixels,
        )

        exp = {}
        for d in doc_ids:
            k = d % 5
            if k in (0, 1):
                arr = synth_pixels(d)
            elif k == 3:
                arr = synth_gif_rgb(d)
            elif k == 4:
                arr = synth_blocks(d)
            else:
                continue  # WAV
            exp[d] = dhash64(to_gray_i64(arr))
        return exp

    def test_features_match_formula_direct(self, ray_session):
        """encode -> REAL codec decode -> dHash must equal the dHash of the
        synthesis formula itself (proves codec inversion + hash parity)."""
        from agenticknowledgegraphconstructionsystem_ray.stages.imagehash import (
            dhash_features,
        )

        out = dhash_features(SF).to_pandas()
        ids = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_pylist()
        exp = self._expected_hashes(ids)
        got = dict(zip(out["media_id"], out["dhash"]))
        assert got == exp

    def test_pairs_match_sequential_mirror(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.stages.imagehash import (
            band_values,
            dhash_pairs,
            pairs_from_bucket,
        )

        ids = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_pylist()
        exp_h = self._expected_hashes(ids)
        buckets: dict[int, list[int]] = {}
        for mid in sorted(exp_h):
            for b, v in enumerate(band_values(exp_h[mid])):
                buckets.setdefault(b * 65536 + v, []).append(mid)
        want = {}
        for members in buckets.values():
            for a, b, d in pairs_from_bucket(
                members, [exp_h[m] for m in members]
            ):
                want[(a, b)] = d
        got = dhash_pairs(SF).to_pandas()
        got_d = {
            (a, b): d
            for a, b, d in zip(got["id_a"], got["id_b"], got["hamming"])
        }
        assert got_d == want
        assert all(a < b for a, b in got_d)
        assert all(d <= 6 for d in got_d.values())


# ---------------------------------------------------------------------------
# last-touch attribution
# ---------------------------------------------------------------------------


class TestAttribution:
    def _mk_events(self, tmp_path, rows):
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([float(r[4]) for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        return str(tmp_path)

    def test_hand_case(self, ray_session, tmp_path):
        import datetime as dt

        from agenticknowledgegraphconstructionsystem_ray.pipelines.attribution import (
            q81_attribution,
        )

        t0 = dt.datetime(2024, 1, 1)
        s = lambda sec: t0 + dt.timedelta(seconds=sec)
        rows = [
            # user 1: view -> click -> purchase  => click credited
            (1, s(0), 1, "view", 0.0),
            (2, s(1), 1, "click", 0.0),
            (3, s(2), 1, "purchase", 10.0),
            # user 2: purchase with no preceding touch => direct
            (4, s(0), 2, "purchase", 5.5),
            # user 2: then a view, then another purchase => view credited
            (5, s(1), 2, "view", 0.0),
            (6, s(2), 2, "purchase", 2.25),
            # user 3: tie-ts ordering by event_id: click(id 7) precedes
            # purchase(id 8) at the same ts
            (7, s(0), 3, "click", 0.0),
            (8, s(0), 3, "purchase", 1.0),
        ]
        sf = self._mk_events(tmp_path, rows)
        out = q81_attribution(sf).to_pandas().set_index("channel")
        assert out.loc["click", "n_conversions"] == 2
        assert out.loc["click", "revenue_c"] == 1000 + 100
        assert out.loc["direct", "n_conversions"] == 1
        assert out.loc["direct", "revenue_c"] == 550
        assert out.loc["view", "revenue_c"] == 225

    def test_parity_vs_pandas_bruteforce(self, ray_session):
        import pandas as pd

        from agenticknowledgegraphconstructionsystem_ray.pipelines.analytics import (
            cents_np,
        )
        from agenticknowledgegraphconstructionsystem_ray.pipelines.attribution import (
            q81_attribution,
        )

        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        rows = []
        for _, g in ev.groupby("user_id"):
            last_touch = None
            for r in g.itertuples():
                if r.event_type == "purchase":
                    rows.append(
                        (last_touch or "direct",
                         int(cents_np(np.array([r.value]))[0]))
                    )
                else:
                    last_touch = r.event_type
        want = (
            pd.DataFrame(rows, columns=["channel", "revenue_c"])
            .groupby("channel")
            .agg(n_conversions=("revenue_c", "size"),
                 revenue_c=("revenue_c", "sum"))
        )
        got = q81_attribution(SF).to_pandas().set_index("channel")
        assert got["n_conversions"].to_dict() == want["n_conversions"].to_dict()
        assert got["revenue_c"].to_dict() == want["revenue_c"].to_dict()


# ---------------------------------------------------------------------------
# type-partition modularity
# ---------------------------------------------------------------------------


class TestModularity:
    def test_hand_graph(self, ray_session):
        """Two typed clusters joined by one bridge edge: A={0,1,2} tri,
        B={3,4,5} tri, bridge 2-3. m=7. d_A = 2*3+... compute by hand."""
        import ray.data as rd

        from agenticknowledgegraphconstructionsystem_ray.pipelines.graphmetrics import (
            type_modularity,
        )

        edges = rd.from_arrow(
            pa.table(
                {
                    "subj_id": pa.array([0, 1, 2, 3, 4, 5, 2], pa.int64()),
                    "obj_id": pa.array([1, 2, 0, 4, 5, 3, 3], pa.int64()),
                }
            )
        )
        nodes = rd.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array(list(range(6)), pa.int64()),
                    "ent_type": pa.array(
                        ["A", "A", "A", "B", "B", "B"], pa.string()
                    ),
                }
            )
        )
        out = type_modularity(edges, nodes).to_pandas().set_index("ent_type")
        # m = 7; A: m_in=3, d=7 (deg 2,2,3); B: m_in=3, d=7
        assert out.loc["A", "m_in"] == 3 and out.loc["A", "d_sum"] == 7
        assert out.loc["B", "m_in"] == 3 and out.loc["B", "d_sum"] == 7
        m = 7
        want = ((3 * 4 * m - 49) * 10**6) // (4 * m * m)
        assert out.loc["A", "contrib_ppm"] == want
        assert out.loc["B", "contrib_ppm"] == want

    def test_duplicate_and_self_edges_ignored(self, ray_session):
        import ray.data as rd

        from agenticknowledgegraphconstructionsystem_ray.pipelines.graphmetrics import (
            type_modularity,
        )

        edges = rd.from_arrow(
            pa.table(
                {
                    "subj_id": pa.array([0, 1, 0, 0], pa.int64()),
                    "obj_id": pa.array([1, 0, 0, 1], pa.int64()),
                }
            )
        )
        nodes = rd.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array([0, 1], pa.int64()),
                    "ent_type": pa.array(["A", "A"], pa.string()),
                }
            )
        )
        out = type_modularity(edges, nodes).to_pandas()
        assert len(out) == 1
        assert out.loc[0, "m_in"] == 1 and out.loc[0, "d_sum"] == 2

    def test_kg_sum_laws(self, ray_session):
        from agenticknowledgegraphconstructionsystem_ray.pipelines.graphmetrics import (
            kg_modularity,
        )

        out = kg_modularity(SF).to_pandas()
        assert len(out) >= 1
        assert int(out["d_sum"].sum()) % 2 == 0
        m = int(out["d_sum"].sum()) // 2
        assert int(out["m_in"].sum()) <= m
        # Q in [-1, 1] scaled
        q = int(out["contrib_ppm"].sum())
        assert -(10**6) <= q <= 10**6
