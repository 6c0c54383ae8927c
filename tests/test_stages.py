import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from geospatial_learn_ray.sources.pages import read_pages
from geospatial_learn_ray.stages import agg, dedup, joins, scorer

SF_SMALL = "/root/testdata/sf0.001"


def _lineitem():
    return ray.data.read_parquet(f"{SF_SMALL}/lineitem.parquet")


def test_grouped_stats_matches_pandas():
    ds = _lineitem()
    out = agg.grouped_stats(ds, ["l_returnflag"], "l_quantity",
                            stats=("count", "sum", "mean", "min", "max", "std")).to_pandas()
    pdf = pq.read_table(f"{SF_SMALL}/lineitem.parquet").to_pandas()
    exp = pdf.groupby("l_returnflag")["l_quantity"].agg(["count", "sum", "mean", "min", "max", "std"])
    out = out.set_index("l_returnflag").sort_index()
    assert out["count"].tolist() == exp["count"].tolist()
    assert np.allclose(out["sum_l_quantity"], exp["sum"])
    assert np.allclose(out["mean_l_quantity"], exp["mean"])
    assert np.allclose(out["std_l_quantity"], exp["std"])


def test_grouped_holistic_median_skew():
    ds = _lineitem()
    out = agg.grouped_holistic(ds, "l_returnflag", "l_quantity", stats=("median", "skew", "mode")).to_pandas()
    pdf = pq.read_table(f"{SF_SMALL}/lineitem.parquet").to_pandas()
    for _, row in out.iterrows():
        v = pdf.loc[pdf.l_returnflag == row.l_returnflag, "l_quantity"].to_numpy()
        assert row["median_l_quantity"] == np.median(v)
        m, s = v.mean(), v.std(ddof=0)
        assert abs(row["skew_l_quantity"] - ((v - m) ** 3).mean() / s**3) < 1e-9


def test_salted_equals_unsalted():
    ds = read_pages(SF_SMALL).map_batches(
        lambda b: pd.DataFrame({"url": b["url"], "lang": b["lang"], "n": b["text"].str.len()}),
        batch_format="pandas",
    )
    plain = agg.grouped_stats(ds, "lang", "n", stats=("count", "mean"), round_to=6).to_pandas()
    salted = agg.salted_grouped_stats(
        ds, "lang", "n", salt_from="url", hot_keys=["en", "fr"], num_salts=8,
        stats=("count", "mean"), round_to=6,
    ).to_pandas()
    a = plain.sort_values("lang").reset_index(drop=True)
    b = salted.sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_value_counts_fractions():
    ds = ray.data.read_parquet(f"{SF_SMALL}/orders.parquet")
    out = agg.value_counts(ds, ["o_orderpriority"], "o_orderstatus").to_pandas()
    sums = out.groupby("o_orderpriority")["frac"].sum()
    assert np.allclose(sums, 1.0, atol=1e-5)
    pdf = pq.read_table(f"{SF_SMALL}/orders.parquet").to_pandas()
    exp = pdf.groupby(["o_orderpriority", "o_orderstatus"]).size()
    got = out.set_index(["o_orderpriority", "o_orderstatus"])["n"]
    assert got.sort_index().tolist() == exp.sort_index().tolist()


def test_dedup_keep_latest():
    pages = read_pages(SF_SMALL, with_dups=True)
    total = pages.count()
    deduped = dedup.dedup_keep_latest(pages).to_pandas()
    docs = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pandas()
    assert total == len(docs) + (docs.doc_id % 50 == 0).sum()
    assert len(deduped) == len(docs)
    assert deduped.url.is_unique
    # the kept copy of a duplicated url is the +1h one
    dup_doc = docs[docs.doc_id % 50 == 0].iloc[0]
    url = f"https://site-{dup_doc.doc_id % 1000}.example/{dup_doc.source}/{dup_doc.doc_id}"
    kept_ts = deduped.loc[deduped.url == url, "warc_ts"].iloc[0]
    base_ts = pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(dup_doc.doc_id) * 37)
    assert kept_ts == base_ts + pd.Timedelta(hours=1)


def test_dedup_exact_content():
    docs = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pandas()
    dup = docs.head(20).copy()
    dup["doc_id"] = dup["doc_id"] + 10_000
    ds = ray.data.from_pandas(pd.concat([docs, dup], ignore_index=True))
    out = dedup.dedup_exact_content(ds, "text", "doc_id").to_pandas()
    assert len(out) == len(docs)
    assert (out.doc_id < 10_000).all()  # min-id wins


def test_broadcast_join_inner_left_semi_anti():
    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": "abcd abcd abcd abcd".split()}))
    small = pd.DataFrame({"k2": [2, 3], "w": ["x", "y"]})
    inner = joins.broadcast_join(left, small, "k", "k2", how="inner").to_pandas()
    assert sorted(inner.k.tolist()) == [2, 3]
    semi = joins.broadcast_join(left, small, "k", "k2", how="semi").to_pandas()
    assert sorted(semi.k.tolist()) == [2, 3] and "w" not in semi.columns
    anti = joins.broadcast_join(left, small, "k", "k2", how="anti").to_pandas()
    assert sorted(anti.k.tolist()) == [1, 4]


def test_scorer_formula(tmp_path):
    path = scorer.train_linear_model(str(tmp_path / "m.json"))
    # keep the feature columns in the output so the formula is checked
    # row-aligned ((l_orderkey, l_linenumber) is NOT unique in the fixture)
    out = scorer.score_stage(_lineitem(), path).to_pandas()
    exp = (
        0.02 * out.l_quantity + 0.01 * out.l_extendedprice
        - 5.0 * out.l_discount + 3.0 * out.l_tax - 0.75
    )
    assert np.allclose(out.score, exp, atol=1e-6)
    assert set(out.pred.unique()) == {0, 1}
    assert (out.pred == (exp > 530.00005).astype(int)).all()


def test_rmse():
    ds = ray.data.from_pandas(pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [1.0, 4.0, 3.0]}))
    assert agg.rmse(ds, "a", "b") == round((2.0**2 / 3) ** 0.5, 4)


def test_interval_join_overlapping_and_disjoint_paths_match_brute_force():
    from geospatial_learn_ray.stages.joins import interval_join

    rng = np.random.default_rng(11)
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 30 * 86400, 500), unit="s")
    ev = pd.DataFrame({"event_id": np.arange(500, dtype=np.int64), "ts": ts})

    def brute(iv):
        rows = []
        for _, e in ev.iterrows():
            for _, i in iv.iterrows():
                if i.lo <= e.ts < i.hi:
                    rows.append((e.event_id, i.interval_id))
        return sorted(rows)

    base = pd.Timestamp("2024-01-01")
    overlapping = pd.DataFrame({
        "interval_id": np.arange(9, dtype=np.int64),
        "lo": [base + pd.Timedelta(days=3 * i) for i in range(9)],
        "hi": [base + pd.Timedelta(days=3 * i + 5) for i in range(9)],
    })
    disjoint = pd.DataFrame({
        "interval_id": np.arange(10, dtype=np.int64),
        "lo": [base + pd.Timedelta(days=3 * i) for i in range(10)],
        "hi": [base + pd.Timedelta(days=3 * i + 2) for i in range(10)],
    })
    for iv in (overlapping, disjoint):
        out = interval_join(ray.data.from_pandas(ev), iv).to_pandas()
        got = sorted(zip(out.event_id, out.interval_id))
        assert got == brute(iv)
    # a timestamp inside two overlapping windows emits two rows
    two = interval_join(
        ray.data.from_pandas(pd.DataFrame({"event_id": [1], "ts": [base + pd.Timedelta(days=4)]})),
        overlapping,
    ).to_pandas()
    assert sorted(two.interval_id.tolist()) == [0, 1]


def test_weighted_sample_block_invariant_and_weight_proportional():
    from geospatial_learn_ray.stages.sampling import weighted_sample

    # 20 heavy items (weight 10_000) among 2000 light ones (weight 1):
    # each heavy key is ~10^4 more likely than a light one; all 20 must
    # land in a k=40 sample (P(miss one) ~ (1 - 10^4/(10^4+eps))^... ~ 0)
    df = pd.DataFrame({
        "id": np.arange(2020, dtype=np.int64),
        "w": np.where(np.arange(2020) < 20, 10_000.0, 1.0),
    })
    out = weighted_sample(ray.data.from_pandas(df), "id", "w", k=40).to_pandas()
    assert len(out) == 40
    heavy = set(range(20))
    assert heavy <= set(out.id), sorted(heavy - set(out.id))
    # identical selection under any block structure (id-hash draws)
    out2 = weighted_sample(ray.data.from_pandas(df).repartition(17), "id", "w",
                           k=40).to_pandas()
    assert sorted(out.id) == sorted(out2.id)


def test_grouped_topk_matches_brute_force_and_block_invariant():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "key": rng.integers(0, 37, 3000).astype(np.int64),
        "val": rng.integers(0, 50, 3000).astype(np.float64),  # many ties
        "tb": np.arange(3000, dtype=np.int64),
    })
    out = agg.grouped_topk(ray.data.from_pandas(df).repartition(7),
                           "key", "val", k=4, tiebreak="tb").to_pandas()
    # brute force: stable sort (val desc, tb asc) then head(4) per key
    ref = (df.sort_values(["key", "val", "tb"], ascending=[True, False, True])
             .groupby("key").head(4))
    got = out.sort_values(["key", "rn"]).reset_index(drop=True)
    assert len(got) == len(ref)
    assert got[["key", "val", "tb"]].to_numpy().tolist() == \
        ref[["key", "val", "tb"]].to_numpy().tolist()
    assert (got.groupby("key").rn.min() == 1).all()
    assert (got.groupby("key").rn.max() == got.groupby("key").size()).all()
    # identical rows under a different block structure (partial top-k exact)
    out2 = agg.grouped_topk(ray.data.from_pandas(df).repartition(23),
                            "key", "val", k=4, tiebreak="tb").to_pandas()
    assert sorted(map(tuple, out2[["key", "val", "tb", "rn"]].to_numpy().tolist())) == \
        sorted(map(tuple, out[["key", "val", "tb", "rn"]].to_numpy().tolist()))


def test_tfidf_top_terms_matches_brute_force():
    from geospatial_learn_ray.stages.textstages import tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "apple banana apple cherry",
            "banana cherry cherry date",
            "apple apple apple egg",
            "date egg fig fig fig",
            "apple banana",
            "unique singleton words only here",
        ],
    })
    out = tfidf_top_terms(ray.data.from_pandas(docs).repartition(4),
                          k=3).to_pandas()
    # brute force
    rows = []
    n = len(docs)
    tf = {}
    for _, r in docs.iterrows():
        for t in r.text.split(" "):
            tf[(r.doc_id, t)] = tf.get((r.doc_id, t), 0) + 1
    dfreq = {}
    for (d, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    for (d, t), c in tf.items():
        s = np.float64(np.float32(c * np.log(n / np.float64(dfreq[t]))))
        rows.append((d, t, c, dfreq[t], s))
    ref = pd.DataFrame(rows, columns=["doc_id", "tok", "tf", "df", "tfidf"])
    ref = ref.sort_values(["doc_id", "tfidf", "tok"],
                          ascending=[True, False, True], kind="mergesort")
    ref = ref.groupby("doc_id").head(3)
    got = out.sort_values(["doc_id", "rn"]).reset_index(drop=True)
    assert got[["doc_id", "tok", "tf", "df", "tfidf"]].to_numpy().tolist() == \
        ref[["doc_id", "tok", "tf", "df", "tfidf"]].to_numpy().tolist()
    # block invariance
    out2 = tfidf_top_terms(ray.data.from_pandas(docs).repartition(2),
                           k=3).to_pandas()
    assert sorted(map(tuple, out2[["doc_id", "tok", "rn"]].to_numpy().tolist())) == \
        sorted(map(tuple, got[["doc_id", "tok", "rn"]].to_numpy().tolist()))


def test_host_stats_counts_and_distinct_langs():
    from geospatial_learn_ray.stages.textstages import host_stats

    pages = pd.DataFrame({
        "url": ["https://a.example/x/1", "https://a.example/y/2",
                "https://a.example/z/3", "https://b.example/x/4",
                "not-a-url"],
        "lang": ["en", "en", "de", "fr", "en"],
    })
    out = host_stats(ray.data.from_pandas(pages).repartition(3)).to_pandas()
    out = out.set_index("host")
    assert out.loc["a.example", "n_pages"] == 3
    assert out.loc["a.example", "n_langs"] == 2
    assert out.loc["b.example", "n_pages"] == 1 and out.loc["b.example", "n_langs"] == 1
    assert out.loc["", "n_pages"] == 1  # unparseable url -> empty-host bucket


def test_dhash_dedup_groups_identical_payloads():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from geospatial_learn_ray.stages.multimodal import (
        MAGIC, DHasher, dhash_dedup_stage)

    def glrm(payload: bytes) -> bytes:
        return MAGIC + (8).to_bytes(2, "little") + (8).to_bytes(2, "little") + b"\x03" + payload

    rows = pa.table({
        "media_id": pa.array(np.arange(5, dtype=np.int64)),
        "media": pa.array([
            glrm(bytes(range(70))),          # strictly increasing -> dhash 0
            glrm(bytes(range(70))),          # identical dup
            glrm(bytes(reversed(range(70)))),  # strictly decreasing -> all bits
            glrm(b"ab"),                      # short payload, zero-padded
            glrm(b""),                        # empty payload
        ], pa.binary()),
    })
    out = dhash_dedup_stage(ray.data.from_arrow(rows)).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert out.dhash[0] == out.dhash[1] == 0
    # hash-0 group = the two increasing payloads + the empty payload
    assert out.n_same[0] == 3 and out.n_same[1] == 3
    # decreasing bytes: every comparison true over the 61 real pairs; the
    # padded tail compares 0 > 0 = False -> bits 0..60 set... byte 61 is
    # payload[61]=8? payload len 70 -> first 65 bytes all real, decreasing
    # -> bits 0..63 all set -> dhash == -1 (all ones, signed)
    assert out.dhash[2] == -1
    assert out.n_same[2] == 1
    # 'ab': b'a'(97) < b'b'(98) -> bit0 clear; b'b' > pad 0 -> bit1 set
    assert out.dhash[3] == 2
    # empty payload: all zeros -> groups with the increasing payloads
    assert out.dhash[4] == 0 and out.n_same[4] == 3


def test_rollup_stats_levels_are_consistent():
    import numpy as np
    import pandas as pd
    import ray.data
    from geospatial_learn_ray.stages.agg import rollup_stats

    df = pd.DataFrame({
        "source": ["a", "a", "a", "b", "b"],
        "lang": ["en", "en", "fr", "en", "de"],
        "n_chars": [10, 20, 30, 40, 50],
    })
    out = rollup_stats(ray.data.from_pandas(df).repartition(3),
                       ["source", "lang"], "n_chars").to_pandas()
    fine = out[out.gid == 0]
    mid = out[out.gid == 1]
    top = out[out.gid == 2]
    assert len(fine) == 4 and len(mid) == 2 and len(top) == 1
    # the (a, en) leaf
    r = fine[(fine.source == "a") & (fine.lang == "en")].iloc[0]
    assert r["count"] == 2 and r.sum_n_chars == 30.0 and r.mean_n_chars == 15.0
    # level sums are conserved
    assert fine["count"].sum() == mid["count"].sum() == top["count"].iloc[0] == 5
    assert fine.sum_n_chars.sum() == top.sum_n_chars.iloc[0] == 150.0
    # superaggregate rows carry the sentinel
    assert (mid.lang == "(all)").all()
    assert (top.source == "(all)").all() and (top.lang == "(all)").all()


def test_grouped_trimmed_stats_matches_brute_force():
    import numpy as np
    import pandas as pd
    import ray

    from geospatial_learn_ray.stages import agg

    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 500),
        "x": np.round(rng.normal(100, 30, 500), 2),
    })
    # plant outliers that trimming must reject
    df.loc[:4, "x"] = 1e6

    out = agg.grouped_trimmed_stats(
        ray.data.from_pandas(df).repartition(9), "k", "x") \
        .to_pandas().set_index("k").sort_index()

    for k, g in df.groupby("k"):
        c = np.sort(np.floor(np.abs(g["x"].to_numpy() * 100) + 0.5).astype(np.int64)
                    * np.sign(g["x"].to_numpy()).astype(np.int64))
        n = len(c)
        t = n // 10
        kept = c[t:n - t]
        assert out.loc[k, "n"] == n and out.loc[k, "n_kept"] == len(kept)
        assert abs(out.loc[k, "trimmed_mean"] - kept.sum() / (len(kept) * 100)) < 1e-6
        ws = np.clip(c, kept[0], kept[-1]).sum()
        assert abs(out.loc[k, "winsor_mean"] - ws / (n * 100)) < 1e-6
        # outliers rejected: trimmed mean near 100, raw mean far above
        assert out.loc[k, "trimmed_mean"] < 200


def test_skyline2d_matches_bruteforce():
    import ray.data

    from geospatial_learn_ray.stages.agg import _skyline2d, skyline_2d

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "id": np.arange(400),
        # small integer domain -> plenty of exact ties in both coords
        "price": rng.randint(0, 25, 400).astype(np.float64),
        "date": rng.randint(0, 25, 400),
    })
    dominated = np.zeros(len(df), bool)
    p, d = df["price"].to_numpy(), df["date"].to_numpy()
    for i in range(len(df)):
        dominated[i] = bool(np.any(
            (p >= p[i]) & (d <= d[i]) & ((p > p[i]) | (d < d[i]))))
    brute = set(df.loc[~dominated, "id"])
    local = set(_skyline2d(df, "price", "date")["id"])
    assert local == brute
    for blocks in (1, 8):
        dist = set(skyline_2d(ray.data.from_pandas(df).repartition(blocks),
                              "price", "date", carry=["id"]).to_pandas()["id"])
        assert dist == brute


def test_ab_test_stats_matches_direct_computation():
    import ray.data

    from geospatial_learn_ray.functions.hashing import splitmix64
    from geospatial_learn_ray.stages.agg import ab_test_stats

    rng = np.random.RandomState(0)
    df = pd.DataFrame({"user_id": np.arange(2000) % 400,
                       "value": rng.gamma(2.0, 10.0, 2000).round(2)})
    for blocks in (1, 6):
        out = ab_test_stats(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas()
        assert len(out) == 1
        if blocks == 1:
            base = out
    pd.testing.assert_frame_equal(base, out)
    v = (splitmix64(df["user_id"].to_numpy(np.uint64)) % np.uint64(2)).astype(int)
    c = np.floor(np.abs(df["value"] * 100.0) + 0.5) * np.sign(df["value"])
    r = out.iloc[0]
    assert r["n_a"] == int((v == 0).sum()) and r["n_b"] == int((v == 1).sum())
    assert abs(r["mean_cents_a"] - c[v == 0].mean()) < 1e-6
    # Welch z close to scipy-free direct formula
    va = c[v == 0].var(ddof=1); vb = c[v == 1].var(ddof=1)
    zd = (c[v == 0].mean() - c[v == 1].mean()) / np.sqrt(
        va / (v == 0).sum() + vb / (v == 1).sum())
    assert abs(r["welch_z"] - zd) < 1e-6


def test_exact_median_matches_numpy_and_forces_refinement():
    import ray.data

    from geospatial_learn_ray.stages.agg import exact_median

    rng = np.random.RandomState(5)
    for n in (9999, 10000):
        v = rng.lognormal(3.0, 2.0, n)
        ds = ray.data.from_pandas(pd.DataFrame({"x": v})).repartition(6)
        # tiny pull_bound forces at least two histogram refinement rounds
        out = exact_median(ds, "x", n_bins=32, pull_bound=64).to_pandas()
        r = out.iloc[0]
        assert r["n"] == n
        assert r["median"] == np.median(v)
        s = np.sort(v)
        assert r["v_lo"] == s[(n + 1) // 2 - 1] and r["v_hi"] == s[(n + 2) // 2 - 1]


def test_exact_median_constant_column():
    import ray.data

    from geospatial_learn_ray.stages.agg import exact_median

    ds = ray.data.from_pandas(pd.DataFrame({"x": np.full(5000, 7.25)}))
    out = exact_median(ds, "x", n_bins=16, pull_bound=32).to_pandas()
    assert out.iloc[0]["median"] == 7.25


def test_scene_cut_detector_known_payload():
    import pyarrow as pa

    from geospatial_learn_ray.stages.multimodal import MAGIC, SceneCutDetector

    hdr = MAGIC + (16).to_bytes(2, "little") + (16).to_bytes(2, "little") + b"\x03"
    # frames: 32x'a', 32x'a', 32x'z' -> one cut after frame 1 (delta 32*25)
    payload = b"a" * 64 + b"z" * 32
    short = b"a" * 40  # only one full frame -> no cuts
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "media": pa.array([hdr + payload, hdr + short], pa.binary())})
    out = SceneCutDetector(threshold=100)(t).to_pandas()
    assert out.values.tolist() == [[1, 1, 32 * 25]]


def test_neyman_allocation_favors_high_variance_strata():
    import ray.data

    from geospatial_learn_ray.stages.sampling import neyman_allocation

    rng = np.random.RandomState(6)
    # equal sizes, very different spreads -> allocation follows sigma
    lo = rng.normal(500, 1.0, 2000).round(2)
    hi = rng.normal(500, 50.0, 2000).round(2)
    df = pd.DataFrame({
        "o_orderpriority": ["1-LOW"] * 2000 + ["2-HIGH"] * 2000,
        "o_totalprice": np.concatenate([lo, hi])})
    for blocks in (1, 5):
        out = neyman_allocation(
            ray.data.from_pandas(df).repartition(blocks)).to_pandas() \
            .set_index("o_orderpriority")
        assert out.loc["2-HIGH", "alloc"] > 20 * out.loc["1-LOW", "alloc"]
        assert abs(out["alloc"].sum() - 1000) <= 1  # rounding slack
        sd = df.groupby("o_orderpriority")["o_totalprice"].std(ddof=1) * 100
        assert np.allclose(out["sigma_cents"], sd[out.index], rtol=1e-6)
        if blocks == 1:
            base = out
    pd.testing.assert_frame_equal(base, out)


def test_loudness_meter_known_payload():
    import pyarrow as pa

    from geospatial_learn_ray.stages.multimodal import MAGIC, LoudnessMeter

    hdr = MAGIC + (16).to_bytes(2, "little") + (16).to_bytes(2, "little") + b"\x03"
    # frame 0: 32 bytes of 0x80 (dev 0) -> energy 0, peak 0, no clips
    # frame 1: 32 bytes of 0xFF (dev 127) -> energy 32*127^2, all clipped
    payload = b"\x80" * 32 + b"\xff" * 32
    short = b"\x80" * 40  # one full frame only
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "media": pa.array([hdr + payload, hdr + short], pa.binary())})
    out = LoudnessMeter(clip=120)(t).to_pandas()
    assert out.values.tolist() == [
        [1, 0, 0, 0, 0],
        [1, 1, 32 * 127 * 127, 127, 32],
        [2, 0, 0, 0, 0]]


def test_snap_points_matches_bruteforce_rational():
    from fractions import Fraction

    import numpy as np
    import pandas as pd
    import ray

    from geospatial_learn_ray.stages.cellindex import (
        _SNAP_LEN2, snap_points_pages, snap_segments)

    urls = pd.DataFrame({"url": [f"https://site-{i}.example/p{i}"
                                 for i in range(40)],
                         "text": ["x"] * 40})
    out = snap_points_pages(ray.data.from_pandas(urls)).to_pandas() \
        .set_index("url").sort_index()
    # brute-force with exact rationals (no common-denominator trick)
    from geospatial_learn_ray.stages.cellindex import add_geocode
    import pyarrow as pa
    g = add_geocode(pa.Table.from_pandas(urls))
    px = np.floor(g["lon"].to_numpy() * 10.0).astype(np.int64)
    py = np.floor(g["lat"].to_numpy() * 10.0).astype(np.int64)
    segs = snap_segments()
    for i, u in enumerate(urls["url"]):
        best = None
        for sid, ax, ay, bx, by, dx, dy in segs.tolist():
            rx, ry = int(px[i] - ax), int(py[i] - ay)
            tn = dx * rx + dy * ry
            if tn <= 0:
                d2 = Fraction(rx * rx + ry * ry)
            elif tn >= _SNAP_LEN2:
                d2 = Fraction((px[i] - bx) ** 2 + (py[i] - by) ** 2)
            else:
                c = dx * ry - dy * rx
                d2 = Fraction(c * c, _SNAP_LEN2)
            if best is None or d2 < best[0]:
                best = (d2, sid)
        row = out.loc[u]
        assert row["seg_id"] == best[1], u
        assert Fraction(int(row["d2_num"]), _SNAP_LEN2) == best[0], u
        assert 0 <= row["t_q20"] <= 1048576


def test_cube_stats_lattice_consistency():
    import numpy as np
    import ray.data

    from geospatial_learn_ray.stages.agg import cube_stats_orders

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"])
    out = cube_stats_orders(ds).to_pandas()
    assert sorted(out["gid"].unique()) == [0, 1, 2, 3]
    fine = out[out["gid"] == 0]
    top = out[out["gid"] == 3]
    assert len(top) == 1
    assert int(fine["count"].sum()) == int(top["count"].iloc[0])
    assert int(fine["sum_cents"].sum()) == int(top["sum_cents"].iloc[0])
    # each marginal re-aggregates the fine level exactly
    by_pr = fine.groupby("o_orderpriority")["sum_cents"].sum()
    m1 = out[out["gid"] == 1].set_index("o_orderpriority")["sum_cents"]
    assert (by_pr.sort_index() == m1.sort_index()).all()


def test_spectrogrammer_matches_per_row_reference():
    import numpy as np
    import pyarrow as pa

    from geospatial_learn_ray.stages.multimodal import (
        MAGIC, Spectrogrammer, _dft_basis)

    hdr = MAGIC + (16).to_bytes(2, "little") + (16).to_bytes(2, "little") + b"\x03"
    rng_bytes = bytes((i * 37 + 11) % 128 for i in range(256))
    short = bytes((i * 53) % 128 for i in range(70))  # 2 full frames
    t = pa.table({"media_id": pa.array([7, 8], pa.int64()),
                  "media": pa.array([hdr + rng_bytes, hdr + short],
                                    pa.binary())})
    out = Spectrogrammer()(t).to_pandas()
    assert (out[out.media_id == 7].frame.tolist() == list(range(8))
            and out[out.media_id == 8].frame.tolist() == [0, 1])
    C, S = _dft_basis()
    # per-row reference walk (pure python loops, independent of einsum)
    prev = None
    for fr in range(8):
        seg = np.frombuffer(rng_bytes[fr * 32:(fr + 1) * 32], np.uint8)
        dev = seg.astype(np.int64) - 128
        p = [int((dev * C[b]).sum()) ** 2 + int((dev * S[b]).sum()) ** 2
             for b in range(8)]
        row = out[(out.media_id == 7) & (out.frame == fr)].iloc[0]
        assert [row[f"p{b+1}"] for b in range(8)] == p
        assert row["peak_bin"] == int(np.argmax(p)) + 1
        if fr == 0:
            assert row["flux"] == 0 and row["is_onset"] == 0
        else:
            flux = sum(max(a - b, 0) for a, b in zip(p, prev))
            assert row["flux"] == flux
            assert row["is_onset"] == int(2 * flux > sum(prev))
        prev = p


def test_profile_lineitem_matches_pandas_reference():
    import numpy as np
    import pandas as pd

    from geospatial_learn_ray.functions.rounding import round_half_away
    from geospatial_learn_ray.stages.agg import profile_lineitem
    import ray.data

    df = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_quantity", "l_discount",
                                  "l_extendedprice", "l_returnflag",
                                  "l_linestatus", "l_shipdate"])
    out = profile_lineitem(ray.data.from_pandas(df)).to_pandas() \
        .set_index("col")
    assert (out["n"] == len(df)).all()
    assert (out["n_null"] == 0).all()
    cents = round_half_away(
        df["l_extendedprice"].to_numpy(np.float64) * 100.0, 0) \
        .astype(np.int64)
    assert out.loc["l_extendedprice", "n_distinct"] \
        == len(np.unique(cents))
    assert out.loc["l_extendedprice", "min_s"] == str(cents.min())
    assert out.loc["l_returnflag", "n_distinct"] \
        == df["l_returnflag"].nunique()
    assert out.loc["l_returnflag", "max_s"] == df["l_returnflag"].max()
    us = df["l_shipdate"].to_numpy("datetime64[us]").astype(np.int64)
    assert out.loc["l_shipdate", "min_s"] == str(us.min())


def test_dq_checks_planted_violations():
    import numpy as np
    import pandas as pd

    from geospatial_learn_ray.stages.agg import dq_checks_orders
    import ray.data

    orders = pd.DataFrame({
        "o_orderkey": [1, 1, 2, 3],                 # dup key -> 1 violation
        "o_custkey": [10, 10, 99, 11],              # 99 missing -> 1 ref
        "o_orderstatus": ["O", "F", "X", "P"],      # X -> 1 domain
        "o_totalprice": [-5.0, 60000.0, 10.0, 20.0],  # 1 pos + 1 cap
        "o_orderdate": pd.to_datetime(
            ["1995-06-01", "1996-02-01", "1997-01-01", "1998-01-01"]
        ).astype("datetime64[us]"),                  # 1 fresh
    })
    cust = pd.DataFrame({"c_custkey": [10, 11]})
    out = dq_checks_orders(ray.data.from_pandas(orders),
                           ray.data.from_pandas(cust), num_buckets=4) \
        .to_pandas().set_index("check")["n_violations"]
    assert out["unique_orderkey"] == 1
    assert out["ref_custkey"] == 1
    assert out["domain_status"] == 1
    assert out["positive_price"] == 1
    assert out["price_cap_50k"] == 1
    assert out["fresh_since_1996"] == 1
    assert out["not_null_custkey"] == 0


def test_ks_test_matches_scipy_free_reference():
    import numpy as np
    import pandas as pd

    from geospatial_learn_ray.stages.agg import ks_test_orders
    import ray.data

    rng_a = [10.0, 20.0, 30.0, 40.0]          # group a
    rng_b = [25.0, 35.0, 45.0, 55.0, 65.0]    # group b
    orders = pd.DataFrame({
        "o_orderpriority": ["1-URGENT"] * 4 + ["5-LOW"] * 5,
        "o_totalprice": rng_a + rng_b})
    out = ks_test_orders(ray.data.from_pandas(orders),
                         bucket_cents=1000).to_pandas().iloc[0]
    # scalar reference over pooled values
    pooled = sorted(set(rng_a + rng_b))
    na, nb = len(rng_a), len(rng_b)
    best = max(abs(sum(1 for x in rng_a if x <= v) * nb
                   - sum(1 for x in rng_b if x <= v) * na)
               for v in pooled)
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["d_scaled"] == best
    # D = 4/4 - 2/5 at v=40 -> scaled |4*5 - 2*4| = 12, permille 600
    assert out["d_scaled"] == 12 and out["v_cents"] == 4000
    assert out["ks_permille"] == 600


def test_mannwhitney_scalar_reference_with_ties():
    import numpy as np
    import pandas as pd

    from geospatial_learn_ray.stages.agg import mannwhitney_orders
    import ray.data

    a = [1.0, 2.0, 2.0, 5.0]
    b = [2.0, 3.0, 5.0, 7.0, 9.0]
    orders = pd.DataFrame({
        "o_orderpriority": ["1-URGENT"] * len(a) + ["5-LOW"] * len(b),
        "o_totalprice": a + b})
    out = mannwhitney_orders(ray.data.from_pandas(orders),
                             bucket_cents=250).to_pandas().iloc[0]
    # scalar tie-averaged ranks over the pooled sample
    pooled = sorted(a + b)
    ranks = {}
    for v in set(pooled):
        idx = [i + 1 for i, x in enumerate(pooled) if x == v]
        ranks[v] = sum(idx) / len(idx)
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2
    assert out["u2_a"] == int(2 * u_a)
    assert out["u2_a"] + out["u2_b"] == 2 * len(a) * len(b)
    # ties: one triple (2.0) and one pair (5.0) -> 24 + 6
    assert out["tie_term"] == (27 - 3) + (8 - 2)


def test_grouped_selection_parity_dual_path():
    """Scale path (grouped_selection histogram refinement) must be
    BIT-IDENTICAL to the raw-value exchange path of grouped_holistic,
    including even/odd group sizes, tiny groups, continuous floats,
    constant-value groups, and identical-value stall masses."""
    rng = np.random.default_rng(11)
    parts = []
    # continuous floats, mixed group sizes (odd, even, tiny)
    for g, n in [("a", 501), ("b", 500), ("c", 1), ("d", 2), ("e", 37)]:
        parts.append(pd.DataFrame({"g": g, "v": rng.random(n) * 1e4}))
    # constant-value group (lo == hi short-circuit)
    parts.append(pd.DataFrame({"g": "k", "v": np.full(64, 7.25)}))
    # identical-value mass around the median (stall guard path)
    parts.append(pd.DataFrame({"g": "s", "v": np.concatenate(
        [rng.random(100), np.full(300, 42.0), 100 + rng.random(100)])}))
    df = pd.concat(parts, ignore_index=True).sample(frac=1.0, random_state=3)
    ds = ray.data.from_pandas(df)

    raw = agg.grouped_holistic(ds, "g", "v", stats=("median", "percentile"),
                               percentile=95.0, scale_bound=None).to_pandas()
    sel = agg.grouped_selection(ds, "g", "v", stats=("median", "percentile"),
                                percentile=95.0, pull_bound=32).to_pandas()
    raw = raw.sort_values("g").reset_index(drop=True)
    sel = sel.sort_values("g").reset_index(drop=True)[raw.columns]
    for c in raw.columns:
        assert (raw[c].to_numpy() == sel[c].to_numpy()).all(), c
    # and the routed path (counted bound exceeded) picks the scale path
    routed = agg.grouped_holistic(ds, "g", "v", stats=("median", "percentile"),
                                  percentile=95.0, scale_bound=10).to_pandas()
    routed = routed.sort_values("g").reset_index(drop=True)[raw.columns]
    for c in raw.columns:
        assert (raw[c].to_numpy() == routed[c].to_numpy()).all(), c


def test_incremental_stats_equals_recompute():
    """Merging stored base partials with a delta batch must be
    bit-identical to recomputing grouped stats over base ∪ delta."""
    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["event_id", "event_type", "value"])
    base = ds.map_batches(lambda b: b[b["event_id"].to_numpy() % 10 != 0],
                          batch_format="pandas")
    delta = ds.map_batches(lambda b: b[b["event_id"].to_numpy() % 10 == 0],
                           batch_format="pandas")
    inc = agg.incremental_stats(base, delta, "event_type", "value").to_pandas()
    full = agg.grouped_stats(ds, "event_type", "value",
                             stats=("count", "sum", "mean", "min", "max"),
                             round_to=4).to_pandas()
    inc = inc.sort_values("event_type").reset_index(drop=True)
    full = full.sort_values("event_type").reset_index(drop=True)[inc.columns]
    for c in inc.columns:
        assert (inc[c].to_numpy() == full[c].to_numpy()).all(), c


def test_registry_guards_and_dispatch():
    import pytest

    from geospatial_learn_ray.functions import registry

    with pytest.raises(ValueError, match="already registered"):
        registry.register_udf("drop_empty_text", lambda b: b)
    with pytest.raises(KeyError, match="unregistered"):
        registry.apply_named(_lineitem(), ["nope"])
    with pytest.raises(ValueError, match="unknown stat"):
        registry.zonal_stats_by_name(_lineitem(), "l_returnflag",
                                     "l_quantity", "zigzag")
    # stat routing: decomposable -> grouped_stats, holistic -> holistic
    dec = registry.zonal_stats_by_name(
        _lineitem(), "l_returnflag", "l_quantity", "mean").to_pandas()
    hol = registry.zonal_stats_by_name(
        _lineitem(), "l_returnflag", "l_quantity", "median").to_pandas()
    assert "mean_l_quantity" in dec.columns
    assert "median_l_quantity" in hol.columns


def test_k_anonymity_audit_matches_pandas_reference():
    import pandas as pd

    from geospatial_learn_ray.stages.governance import k_anonymity_audit

    df = pd.read_parquet("/root/testdata/sf0.001/customer.parquet",
                         columns=["c_nationkey", "c_mktsegment", "c_acctbal"])
    df = pd.DataFrame({
        "c_nationkey": df["c_nationkey"].astype(np.int64),
        "c_mktsegment": df["c_mktsegment"],
        "bal_k": np.floor(df["c_acctbal"].to_numpy(np.float64) / 1000.0).astype(np.int64)})
    exp = (df.groupby(["c_nationkey", "c_mktsegment"])
           .agg(n=("bal_k", "size"), n_sensitive=("bal_k", "nunique"))
           .reset_index())
    for blocks in (1, 5):
        got = k_anonymity_audit(
            ray.data.from_pandas(df).repartition(blocks),
            ["c_nationkey", "c_mktsegment"], "bal_k", k=5, l=2).to_pandas()
        m = got.merge(exp, on=["c_nationkey", "c_mktsegment"],
                      suffixes=("", "_e"))
        assert len(m) == len(exp) == len(got)
        assert (m["n"] == m["n_e"]).all()
        assert (m["n_sensitive"] == m["n_sensitive_e"]).all()
        assert ((m["k_risk"] == 1) == (m["n"] < 5)).all()
        assert ((m["l_risk"] == 1) == (m["n_sensitive"] < 2)).all()
