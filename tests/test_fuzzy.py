"""Fuzzy record linkage (pipelines/fuzzy.py): exact-distance kernel laws,
blocking completeness vs brute force, and DuckDB levenshtein parity."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from agenticknowledgegraphconstructionsystem_ray.pipelines import fuzzy

SF = "/root/testdata/sf0.001"


class TestLevKernel:
    def test_exact_cases(self):
        assert fuzzy._lev_le1("abc", "abc") == 0
        assert fuzzy._lev_le1("abc", "abd") == 1    # substitution
        assert fuzzy._lev_le1("abc", "ab") == 1     # deletion
        assert fuzzy._lev_le1("abc", "xabc") == 1   # insertion
        assert fuzzy._lev_le1("abc", "axbc") == 1   # mid insertion
        assert fuzzy._lev_le1("", "a") == 1
        assert fuzzy._lev_le1("", "") == 0

    def test_rejects_distance_two(self):
        assert fuzzy._lev_le1("abc", "ade") is None   # two subs
        assert fuzzy._lev_le1("abc", "a") is None     # len diff 2
        assert fuzzy._lev_le1("abc", "cba") is None
        assert fuzzy._lev_le1("ab", "ba") is None     # transposition = 2

    def test_matches_full_dp_on_random_strings(self):
        def lev(a, b):
            d = np.arange(len(b) + 1)
            for i, ca in enumerate(a, 1):
                prev, d[0] = d[0], i
                for j, cb in enumerate(b, 1):
                    prev, d[j] = d[j], min(
                        d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                    )
            return d[len(b)]

        rng = np.random.default_rng(5)
        alpha = "abc"
        for _ in range(300):
            a = "".join(rng.choice(list(alpha), rng.integers(0, 6)))
            b = "".join(rng.choice(list(alpha), rng.integers(0, 6)))
            want = lev(a, b)
            got = fuzzy._lev_le1(a, b)
            assert got == (want if want <= 1 else None), (a, b)


class TestDeletionKeys:
    def test_keys_are_self_plus_deletions(self):
        t = pa.table(
            {"k": pa.array([7], pa.int64()), "n": pa.array(["abc"])}
        )
        out = fuzzy._deletion_keys(t, "k", "n")
        assert sorted(out["blk"].to_pylist()) == ["ab", "abc", "ac", "bc"]
        assert set(out["key"].to_pylist()) == {7}

    def test_empty_name_emits_self_only(self):
        t = pa.table({"k": pa.array([1], pa.int64()), "n": pa.array([""])})
        out = fuzzy._deletion_keys(t, "k", "n")
        assert out["blk"].to_pylist() == [""]


class TestFuzzySelfJoin:
    def _run(self, names):
        ds = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array(range(len(names)), pa.int64()),
                    "n": pa.array(names),
                }
            )
        )
        return fuzzy.fuzzy_self_join(ds, "k", "n").to_pandas()

    def test_hand_case(self, ray_session):
        got = self._run(["cat", "cap", "cart", "dog", "cat"])
        pairs = set(zip(got.key_a, got.key_b, got.dist))
        # cat~cap (sub), cat~cart (ins), cat==cat; cap~cart is distance 2
        assert pairs == {(0, 1, 1), (0, 2, 1), (0, 4, 0), (1, 4, 1), (2, 4, 1)}

    def test_completeness_vs_bruteforce_random_typos(self, ray_session):
        rng = np.random.default_rng(17)
        alpha = list("abcdef")
        base = [
            "".join(rng.choice(alpha, 8)) for _ in range(40)
        ]
        names = list(base)
        for s in base[:20]:            # plant substitutions / deletions
            i = int(rng.integers(0, len(s)))
            names.append(s[:i] + str(rng.integers(0, 3)) + s[i + 1:])
            names.append(s[:i] + s[i + 1:])
        got = self._run(names)
        got_pairs = set(zip(got.key_a, got.key_b))
        want = set()
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                if fuzzy._lev_le1(names[i], names[j]) is not None:
                    want.add((i, j))
        assert got_pairs == want

    def test_matches_duckdb_on_testdata(self, ray_session):
        got = fuzzy.q76_fuzzy_join(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{SF}/customer.parquet')"
        )
        want = con.execute(fuzzy.ORACLE_SQL["q76_fuzzy_join"]).df()
        assert len(got) > 0
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


class TestFuzzyClusters:
    def _run(self, names):
        ds = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array(range(len(names)), pa.int64()),
                    "n": pa.array(names),
                }
            )
        )
        df = fuzzy.fuzzy_clusters(ds, "k", "n").to_pandas()
        return dict(zip(df.name_key, df.cluster))

    def test_chain_transitivity(self, ray_session):
        # aaa ~ aab ~ abb chain (aaa vs abb is distance 2) -> one cluster
        got = self._run(["aaa", "aab", "abb", "zzz"])
        assert got == {0: 0, 1: 0, 2: 0, 3: 3}

    def test_identical_names_collapse_first(self, ray_session):
        # duplicates share the min-key representative before pairing
        got = self._run(["cat", "cat", "cap", "dog"])
        assert got == {0: 0, 2: 0, 3: 3}

    def test_matches_duckdb_on_testdata(self, ray_session):
        got = fuzzy.q77_fuzzy_clusters(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')"
        )
        want = con.execute(fuzzy.ORACLE_SQL["q77_fuzzy_clusters"]).df()
        assert len(got) > 1
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
        # invariant: every cluster label is a member and its own minimum
        grp = got.groupby("cluster")["name_key"].min()
        assert (grp.index == grp.values).all()
