"""Small-operator coverage: JSON safety (M6), url normalizer (M2), JSON/CSV
sources+sinks (S3/S6/S7), list-column ops (§2.8 array family)."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc

from agenticknowledgegraphconstructionsystem_ray.functions.jsonsafe import (
    parse_many,
    safe_parse_json,
    strip_fences,
)
from agenticknowledgegraphconstructionsystem_ray.functions.textnorm import norm_url


class TestJsonSafe:
    def test_fence_strip(self):
        assert strip_fences('```json\n{"a": 1}\n```') == '{"a": 1}'

    def test_parse_ok(self):
        assert safe_parse_json('{"a": 1}') == {"a": 1}
        assert safe_parse_json('```json\n{"a": 1}\n```') == {"a": 1}

    def test_poison_never_raises(self):
        assert safe_parse_json("{broken") is None
        assert safe_parse_json(None) is None
        assert safe_parse_json("") is None

    def test_error_counter(self):
        out, errors = parse_many(['{"k":1}', "{bad", None, '"x"'])
        assert out == [{"k": 1}, None, None, "x"]
        assert errors == 1  # only the parse failure counts, not None

    def test_valid_json_null_is_not_an_error(self):
        out, errors = parse_many(["null", "```json\nnull\n```", "{bad"])
        assert out == [None, None, None]
        assert errors == 1  # only the malformed row


class TestNormUrl:
    def test_scheme_www_slash(self):
        assert norm_url("https://www.Example.com/a/b/") == "example.com/a/b"
        assert norm_url("http://site.org") == "site.org"
        assert norm_url("site.org/p#frag") == "site.org/p"

    def test_case_only_host(self):
        assert norm_url("HTTPS://HOST.NET/Path") == "host.net/Path"


def test_json_roundtrip_sink_source(ray_session, tmp_path):
    """S7 (write_json) + S3 (read_json) round trip."""
    import ray.data as rd

    ds = rd.from_items([{"a": i, "b": f"x{i}"} for i in range(10)])
    out = str(tmp_path / "j")
    ds.write_json(out)
    back = rd.read_json(sorted(glob.glob(os.path.join(out, "*")))).to_pandas()
    assert sorted(back["a"].tolist()) == list(range(10))


def test_nodes_summary_csv(kg_out):
    """S6 CSV summary with M11 field cleaning."""
    out, _ = kg_out
    path = os.path.join(out, "nodes_summary.csv")
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "entity_id,canonical_name,ent_type,mention_count"
    assert len(lines) > 10
    # every line has exactly 3 commas (field cleaning guarantees no embedded)
    assert all(line.count(",") == 3 for line in lines)
    # sorted by mention_count desc
    counts = [int(line.rsplit(",", 1)[1]) for line in lines[1:]]
    assert counts == sorted(counts, reverse=True)


def test_list_column_ops(kg_out):
    """aliases list<string> column supports list kernels (array family:
    the reference's TEXT[] authors column + authors[:2] slicing)."""
    import pyarrow.parquet as pq

    out, _ = kg_out
    t = pq.read_table(os.path.join(out, "nodes", "part-00000.parquet"))
    aliases = t.column("aliases")
    assert pa.types.is_list(aliases.type)
    lengths = pc.list_value_length(aliases)
    assert pc.min(lengths).as_py() >= 1
    first_two = pc.list_slice(aliases, 0, 2)
    assert pc.max(pc.list_value_length(first_two)).as_py() <= 2


def test_grouped_topk_matches_bruteforce(ray_session):
    """Combiner pre-truncation must not change the per-group top-k result,
    whatever the block layout."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from agenticknowledgegraphconstructionsystem_ray.stages.topk import grouped_topk

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 7, size=n),
            "uid": np.arange(n),
            "score": rng.integers(0, 50, size=n),  # heavy ties on purpose
        }
    )
    ds = rd.from_pandas(df).repartition(13)  # force many blocks
    got = (
        grouped_topk(ds, "g", by=["score", "uid"], descending=[True, False], k=5)
        .to_pandas()
        .sort_values(["g", "score", "uid"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["score", "uid"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(5)
        .sort_values(["g", "score", "uid"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "uid", "score"]], want)


def test_funnel_depth_sequential_recompute(ray_session):
    """q62 funnel depth equals a per-user sequential scan."""
    import numpy as np
    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import temporal

    sf = "/root/testdata/sf0.001"
    got = temporal.q62_funnel(sf).to_pandas()
    ev = pq.read_table(
        sf + "/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"],
    ).to_pandas()
    for _, row in got.iterrows():
        g = ev[ev.user_id == row["user_id"]].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        t_prev, d = -(1 << 62), 0
        for stage in temporal.FUNNEL_STAGES:
            cand = ts[(et == stage) & (ts > t_prev)]
            if not len(cand):
                break
            t_prev, d = int(cand[0]), d + 1
        assert d == row["funnel_depth"], row["user_id"]


def test_value_outliers_are_top_percent(ray_session):
    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import temporal
    from agenticknowledgegraphconstructionsystem_ray.pipelines.analytics import (
        cents_np,
    )

    sf = "/root/testdata/sf0.001"
    got = temporal.q66_value_outliers(sf).to_pandas()
    ev = pq.read_table(
        sf + "/events.parquet", columns=["event_id", "event_type", "value"]
    ).to_pandas()
    ev["vc"] = cents_np(ev["value"])
    for et, g in ev.groupby("event_type"):
        n = len(g)
        vals = sorted(g["vc"])
        p99 = vals[(99 * n + 99) // 100 - 1]
        want = set(g[g.vc > p99]["event_id"])
        have = set(got[got.event_type == et]["event_id"])
        assert have == want, et
        assert len(have) <= max(1, n // 50)  # strictly-above-p99 is a thin tail


def test_bloom_semijoin_matches_exact_join(ray_session):
    """q67's bloom screen + exact verify equals a plain pandas semi-join."""
    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import assembly
    from agenticknowledgegraphconstructionsystem_ray.pipelines.analytics import (
        cents_np,
    )

    sf = "/root/testdata/sf0.001"
    got = assembly.q67_bloom_semijoin(sf).to_pydict()
    orders = pq.read_table(
        sf + "/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).to_pandas()
    li = pq.read_table(
        sf + "/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).to_pandas()
    urgent = set(orders[orders.o_orderpriority == assembly.URGENT]["o_orderkey"])
    hit = li[li.l_orderkey.isin(urgent)]
    assert got["n_items"][0] == len(hit)
    assert got["revenue_c"][0] == int(
        cents_np(hit["l_extendedprice"] * (1 - hit["l_discount"])).sum()
    )


def test_event_pairs_window_law(ray_session):
    """Every counted pair is reproducible by a brute-force scan."""
    import numpy as np
    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import temporal

    sf = "/root/testdata/sf0.001"
    got = temporal.q68_event_pairs(sf).to_pandas()
    ev = pq.read_table(
        sf + "/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"],
    ).to_pandas()
    counts: dict = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        hi = np.searchsorted(
            ts, ts + temporal.PAIR_WINDOW_S * 1_000_000, side="right"
        )
        for i in range(len(ts)):
            for j in range(i + 1, hi[i]):
                k = (et[i], et[j])
                counts[k] = counts.get(k, 0) + 1
    want = {
        (a, b): n for (a, b), n in counts.items()
    }
    have = {
        (r["type_a"], r["type_b"]): r["n_pairs"] for _, r in got.iterrows()
    }
    assert have == want


def test_rollup_levels_are_consistent(ray_session):
    from agenticknowledgegraphconstructionsystem_ray.pipelines import analytics

    out = analytics.q69_rollup("/root/testdata/sf0.001")
    detail = out[(out.o_orderstatus != "ALL") & (out.month_s != "ALL")]
    lvl1 = out[(out.o_orderstatus != "ALL") & (out.month_s == "ALL")]
    lvl0 = out[(out.o_orderstatus == "ALL")]
    assert len(lvl0) == 1
    assert lvl0.iloc[0]["n_orders"] == detail["n_orders"].sum()
    assert lvl0.iloc[0]["total_c"] == detail["total_c"].sum()
    for _, r in lvl1.iterrows():
        d = detail[detail.o_orderstatus == r["o_orderstatus"]]
        assert r["n_orders"] == d["n_orders"].sum()
        assert r["total_c"] == d["total_c"].sum()


def test_langid_confusion_sums_to_lang_counts(ray_session):
    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import training

    sf = "/root/testdata/sf0.001"
    got = training.q73_langid_confusion(sf).to_pandas()
    docs = pq.read_table(sf + "/documents.parquet", columns=["lang"]).to_pandas()
    want = docs.groupby("lang").size()
    have = got.groupby("lang")["n"].sum()
    assert dict(have) == dict(want)
    # and the matrix agrees with the per-doc detector output
    pred = training.q25_langid(sf).to_pandas()[["doc_id", "lang_detected"]]
    full = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas().merge(pred, on="doc_id")
    brute = full.groupby(["lang", "lang_detected"]).size()
    for _, r in got.iterrows():
        assert brute[(r["lang"], r["lang_detected"])] == r["n"]


def test_threshold_sweep_laws(ray_session):
    from agenticknowledgegraphconstructionsystem_ray.pipelines import assembly

    got = assembly.q74_threshold_sweep("/root/testdata/sf0.001").to_pandas()
    got = got.sort_values("thr")
    # positives (truth) constant across thresholds
    assert (got["tp"] + got["fn"]).nunique() == 1
    assert (got["fp"] + got["tn"]).nunique() == 1
    # predictions shrink as the threshold rises
    assert (got["tp"].diff().dropna() <= 0).all()
    assert (got["fp"].diff().dropna() <= 0).all()
    # ppm formulas
    for _, r in got.iterrows():
        pp = r["tp"] * 1_000_000 // (r["tp"] + r["fp"]) if r["tp"] + r["fp"] else 0
        rr = r["tp"] * 1_000_000 // (r["tp"] + r["fn"]) if r["tp"] + r["fn"] else 0
        assert r["precision_ppm"] == pp and r["recall_ppm"] == rr


def test_split_leakage_matches_bruteforce(ray_session):
    import hashlib

    from agenticknowledgegraphconstructionsystem_ray.pipelines import training
    from agenticknowledgegraphconstructionsystem_ray.stages.dedup import (
        minhash_near_dups,
    )

    sf = "/root/testdata/sf0.001"
    got = training.q75_split_leakage(sf).to_pydict()
    pairs = minhash_near_dups(sf)

    def is_test(i):
        return (
            hashlib.md5(str(i).encode()).hexdigest()[-1]
            in training.SPLIT_TEST_HEX
        )

    leak = sum(
        1
        for a, b in zip(
            pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()
        )
        if is_test(a) != is_test(b)
    )
    assert got["n_pairs"][0] == pairs.num_rows
    assert got["n_leaking"][0] == leak


def test_retention_cohorts_bruteforce(ray_session):
    """q79 equals a plain-pandas recomputation at sf0.001."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from agenticknowledgegraphconstructionsystem_ray.pipelines import temporal

    sf = "/root/testdata/sf0.001"
    got = temporal.q79_retention_cohorts(sf).to_pandas()
    ev = pq.read_table(sf + "/events.parquet", columns=["user_id", "ts"]).to_pandas()
    # Monday-start week floor
    wk = ev["ts"].dt.floor("D") - pd.to_timedelta(
        ev["ts"].dt.weekday, unit="D"
    )
    df = pd.DataFrame({"user_id": ev["user_id"], "week": wk}).drop_duplicates()
    first = df.groupby("user_id")["week"].min().rename("cw")
    j = df.join(first, on="user_id")
    j["week_offset"] = ((j["week"] - j["cw"]).dt.days // 7).astype(np.int64)
    want = (
        j.groupby(["cw", "week_offset"])["user_id"]
        .nunique()
        .rename("n_users")
        .reset_index()
        .rename(columns={"cw": "cohort_week"})
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    assert (got["cohort_week"] == want["cohort_week"]).all()
    assert (got["week_offset"].to_numpy() == want["week_offset"].to_numpy()).all()
    assert (got["n_users"].to_numpy() == want["n_users"].to_numpy()).all()


def test_retention_cohort_zero_offset_is_cohort_size(ray_session):
    """Every cohort's offset-0 row counts the whole cohort (each user is
    active in their own first week by construction)."""
    from agenticknowledgegraphconstructionsystem_ray.pipelines import temporal

    got = temporal.q79_retention_cohorts("/root/testdata/sf0.001").to_pandas()
    per_cohort = got.groupby("cohort_week")
    for _, g in per_cohort:
        zero = g.loc[g["week_offset"] == 0, "n_users"]
        assert len(zero) == 1
        assert (g["n_users"] <= zero.iloc[0]).all()
