import numpy as np
import pandas as pd
import ray.data

from geospatial_learn_ray.sources.pages import read_pages
from geospatial_learn_ray.stages.dedup import connected_components
from geospatial_learn_ray.stages.sketches import hll_distinct

SF_SMALL = "/root/testdata/sf0.001"


def _union_find_oracle(pairs: pd.DataFrame) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.id_a, pairs.id_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find():
    # chain 1-2-3, pair 10-11, triangle 20-21-22, singleton pair 30-31
    pairs = pd.DataFrame(
        {"id_a": [1, 2, 10, 20, 20, 21, 30], "id_b": [2, 3, 11, 21, 22, 22, 31],
         "est_jaccard": [1.0] * 7}
    )
    out = connected_components(ray.data.from_pandas(pairs)).to_pandas()
    got = dict(zip(out.node, out.component_id))
    exp = _union_find_oracle(pairs)
    assert got == exp
    assert got[3] == 1 and got[22] == 20 and got[31] == 30


def test_connected_components_long_chain():
    n = 15
    pairs = pd.DataFrame({"id_a": list(range(n)), "id_b": list(range(1, n + 1)), "v": [0.0] * n})
    out = connected_components(ray.data.from_pandas(pairs), max_rounds=30).to_pandas()
    assert set(out.component_id) == {0}  # one chain, min label 0 reaches the end


def test_connected_components_distributed_path():
    # driver_threshold=0 forces the bucketed-join propagation loop (no
    # driver union-find, no label-table broadcast); chain needs multiple
    # rounds and exercises the pointer-jump convergence
    n = 8
    chain = pd.DataFrame({"id_a": list(range(n)), "id_b": list(range(1, n + 1))})
    extra = pd.DataFrame({"id_a": [100, 200], "id_b": [101, 201]})
    pairs = pd.concat([chain, extra], ignore_index=True)
    out = connected_components(ray.data.from_pandas(pairs), driver_threshold=0).to_pandas()
    got = dict(zip(out.node, out.component_id))
    assert got == _union_find_oracle(pairs)


def test_hll_distinct_accuracy():
    pages = read_pages(SF_SMALL, with_dups=True, columns=["url"])
    est = hll_distinct(pages, "url", precision=12)
    exact = 500  # distinct urls (dups share urls)
    assert abs(est - exact) / exact < 0.05


def test_hll_merge_invariance():
    # estimate must not depend on how rows are batched (mergeability)
    df = pd.DataFrame({"k": [f"key-{i}" for i in range(2000)] * 3})
    e1 = hll_distinct(ray.data.from_pandas(df), "k")
    e2 = hll_distinct(ray.data.from_pandas(df).repartition(13), "k")
    assert abs(e1 - e2) < 1e-9
    assert abs(e1 - 2000) / 2000 < 0.05


def test_cms_never_undercounts_and_block_invariant():
    from geospatial_learn_ray.stages.sketches import cms_counts

    df = pd.DataFrame({"k": [str(i % 23) for i in range(2000)]})
    exact = df.k.value_counts()
    a = cms_counts(ray.data.from_pandas(df), "k", probes=[str(i) for i in range(30)])
    for _, r in a.iterrows():
        assert r.est_count >= exact.get(r.k, 0)  # CMS one-sided error
    # merge is a sum: any partitioning gives the identical sketch
    b = cms_counts(ray.data.from_pandas(df).repartition(13), "k",
                   probes=[str(i) for i in range(30)])
    assert a.est_count.tolist() == b.est_count.tolist()


def test_cms_exact_when_sparse():
    from geospatial_learn_ray.stages.sketches import cms_counts

    # 8 distinct keys in a 1024-wide, depth-4 sketch: collision probability
    # across ALL 4 rows is negligible -> estimates are exact
    df = pd.DataFrame({"k": [f"key{i % 8}" for i in range(800)]})
    out = cms_counts(ray.data.from_pandas(df), "k", probes=[f"key{i}" for i in range(8)])
    assert out.est_count.tolist() == [100] * 8


def test_bloom_no_false_negatives_and_block_invariant():
    from geospatial_learn_ray.stages.sketches import bloom_build, bloom_probe

    members = pd.DataFrame({"k": [f"m-{i}" for i in range(300)]})
    w1 = bloom_build(ray.data.from_pandas(members), "k", m_bits=2048, k=3)
    # OR-merge is commutative: bitmap independent of block structure
    w2 = bloom_build(ray.data.from_pandas(members).repartition(13), "k",
                     m_bits=2048, k=3)
    assert (w1 == w2).all()
    probe = pd.DataFrame({"k": [f"m-{i}" for i in range(300)]
                          + [f"x-{i}" for i in range(3000)]})
    out = bloom_probe(ray.data.from_pandas(probe), "k", w1,
                      m_bits=2048, k=3).to_pandas()
    kept = set(out.k)
    # every member passes (no false negatives)
    assert all(f"m-{i}" in kept for i in range(300))
    # false-positive rate near the theoretical (1-e^(-kn/m))^k ~ 4-5%
    fp = sum(1 for i in range(3000) if f"x-{i}" in kept) / 3000
    assert fp < 0.10


def test_hist_quantiles_within_bin_width_and_block_invariant():
    from geospatial_learn_ray.stages.sketches import hist_quantiles

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"g": np.repeat(["a", "b"], 5000),
                       "x": rng.uniform(0, 100000, 10000)})
    out = hist_quantiles(ray.data.from_pandas(df), "g", "x",
                         lo=0.0, width=64.0, nbins=2048).to_pandas()
    out2 = hist_quantiles(ray.data.from_pandas(df).repartition(13), "g", "x",
                          lo=0.0, width=64.0, nbins=2048).to_pandas()
    a = out.sort_values("g").reset_index(drop=True)
    b = out2.sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    for g, grp in df.groupby("g"):
        row = a[a.g == g].iloc[0]
        for q in (0.25, 0.5, 0.75, 0.99):
            exact = np.quantile(grp.x, q)
            assert abs(row[f"q{int(q * 100)}"] - exact) <= 64.0 + 1e-9, (g, q)


def test_bloom_empty_build_side_passes_nothing():
    from geospatial_learn_ray.stages.sketches import bloom_build, bloom_probe

    empty = pd.DataFrame({"k": pd.Series([], dtype="string")})
    w = bloom_build(ray.data.from_pandas(empty), "k", m_bits=2048, k=3)
    assert (w == 0).all()
    probe = pd.DataFrame({"k": [f"x-{i}" for i in range(100)]})
    out = bloom_probe(ray.data.from_pandas(probe), "k", w, m_bits=2048, k=3).to_pandas()
    assert len(out) == 0


def test_hll_cms_empty_inputs():
    from geospatial_learn_ray.stages.sketches import cms_counts, hll_distinct

    empty = pd.DataFrame({"k": pd.Series([], dtype="string")})
    assert hll_distinct(ray.data.from_pandas(empty), "k") == 0.0
    out = cms_counts(ray.data.from_pandas(empty), "k", probes=["a", "b"])
    assert out.est_count.tolist() == [0, 0]


def test_bloom_auto_bits_scales_with_build_side():
    from geospatial_learn_ray.stages.sketches import bloom_auto_bits

    assert bloom_auto_bits(0) == 64
    assert bloom_auto_bits(1) == 64
    assert bloom_auto_bits(302) == 4096          # next_pow2(8*302)
    assert bloom_auto_bits(3000) == 32768
    # the invariant a fixed m loses: bits/key never drops below the target
    for n in (10, 100, 1000, 10**6, 10**9):
        m = bloom_auto_bits(n)
        assert m >= 8 * n and m < 16 * n and m & (m - 1) == 0


def test_mg_exact_when_capacity_covers_distinct():
    from geospatial_learn_ray.stages.sketches import mg_heavy_hitters

    rng = np.random.default_rng(5)
    keys = rng.zipf(1.5, 5000).astype(np.int64) % 200
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(9)
    out = mg_heavy_hitters(ds, "k", capacity=1024, min_count=1)
    assert out.attrs["err"] == 0
    true = pd.Series(keys.astype(str)).value_counts()
    got = out.set_index("k")["est_count"]
    assert len(got) == len(true)
    assert (got.sort_index() == true.sort_index()).all()


def test_mg_bounds_in_approximate_regime():
    from geospatial_learn_ray.stages.sketches import mg_heavy_hitters

    rng = np.random.default_rng(6)
    # 5 planted heavies (1000 each) in a sea of 4000 distinct light keys
    keys = np.concatenate([np.repeat(np.arange(5), 1000),
                           5 + np.arange(4000)]).astype(np.int64)
    rng.shuffle(keys)
    n, cap = len(keys), 64
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(11)
    out = mg_heavy_hitters(ds, "k", capacity=cap, min_count=1)
    err = out.attrs["err"]
    assert 0 < err <= n // (cap + 1)
    true = pd.Series(keys.astype(str)).value_counts()
    got = out.set_index("k")["est_count"]
    # never overcounts; true <= est + err for every reported key
    for k, est in got.items():
        assert est <= true[k] <= est + err
    # every key with true > err must be reported (the 5 heavies qualify)
    for k in map(str, range(5)):
        assert k in got.index


def test_dedup_apply_keeps_canonical_and_singletons():
    from geospatial_learn_ray.stages.dedup import dedup_apply

    # corpus 0..19; groups {0,3,7}, {10,11}; the rest are singletons
    corpus = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                           "lang": ["en"] * 20})
    pairs = pd.DataFrame({"id_a": np.array([0, 3, 10], np.int64),
                          "id_b": np.array([3, 7, 11], np.int64)})
    out = dedup_apply(ray.data.from_pandas(corpus).repartition(5),
                      ray.data.from_pandas(pairs), id_col="doc_id").to_pandas()
    expect = set(range(20)) - {3, 7, 11}
    assert set(out.doc_id) == expect
    assert set(out.columns) == {"doc_id", "lang"}
    assert (out.lang == "en").all()  # payload columns survive intact
    # block invariance
    out2 = dedup_apply(ray.data.from_pandas(corpus).repartition(3),
                       ray.data.from_pandas(pairs), id_col="doc_id").to_pandas()
    assert set(out2.doc_id) == expect


def test_pagerank_distributed_matches_local_fixed_point():
    import numpy as np
    import pandas as pd
    import ray.data
    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.graph import pagerank_hosts

    pages = read_pages("/root/testdata/sf0.001", columns=["url"])
    a = pagerank_hosts(pages, iters=4).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    b = pagerank_hosts(pages, iters=4, local_bound=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    # integer fixed-point: the two paths must agree BIT-exactly
    assert a.equals(b[a.columns])
    # rank mass: bounded by the initial 2^30; dangling hosts (ids with no
    # pages) shed their mass each round, so only the teleport floor is a
    # guaranteed lower bound
    tot = a["r_q"].sum()
    n = len(a)
    assert ((15 * (1 << 30)) // (100 * n)) * n <= tot <= (1 << 30)
    assert int(a["r_q"].min()) >= (15 * (1 << 30)) // (100 * n)


def test_hll_grouped_accuracy_and_block_invariant():
    import numpy as np
    import pandas as pd
    import ray

    from geospatial_learn_ray.stages.sketches import hll_distinct_grouped

    rng = np.random.default_rng(11)
    frames = []
    truth = {}
    for g, n_distinct in (("a", 300), ("b", 2000), ("c", 17)):
        keys = np.array([f"{g}-key-{i}" for i in range(n_distinct)], object)
        draw = rng.integers(0, n_distinct, n_distinct * 3)
        frames.append(pd.DataFrame({"grp": g, "k": keys[draw]}))
        truth[g] = len(np.unique(draw))
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=0)

    out1 = hll_distinct_grouped(ray.data.from_pandas(df), "grp", "k") \
        .to_pandas().set_index("grp")["approx_distinct"]
    out2 = hll_distinct_grouped(ray.data.from_pandas(df).repartition(13),
                                "grp", "k").to_pandas() \
        .set_index("grp")["approx_distinct"]
    pd.testing.assert_series_equal(out1.sort_index(), out2.sort_index())
    for g, t in truth.items():
        assert abs(out1[g] - t) / t < 0.06, (g, out1[g], t)


def test_triangle_count_matches_dense_brute_force():
    import numpy as np
    import pandas as pd
    import ray

    from geospatial_learn_ray.stages.graph import host_edges, triangle_count_hosts

    urls = [f"https://site-{i % 37}.example/web/{i}" for i in range(400)]
    pages = ray.data.from_pandas(pd.DataFrame({"url": urls})).repartition(7)

    e = host_edges(pages).to_pandas()
    n = 1000
    A = np.zeros((n, n), np.int64)
    m = e["src"].to_numpy() != e["dst"].to_numpy()
    A[e["src"].to_numpy()[m], e["dst"].to_numpy()[m]] = 1
    A = np.maximum(A, A.T)
    expected_tri = int(np.trace(A @ A @ A) // 6)
    expected_edges = int(A.sum() // 2)

    out = triangle_count_hosts(pages).to_pandas().iloc[0]
    assert out["n_edges"] == expected_edges
    assert out["n_triangles"] == expected_tri
    assert out["n_wedges"] >= out["n_triangles"]


def test_kmv_accuracy_and_block_invariance():
    from geospatial_learn_ray.stages.sketches import kmv_distinct_grouped

    n = 4000
    df = pd.DataFrame({
        "g": np.where(np.arange(n) % 2 == 0, "a", "b"),
        # group a: 2000 rows over 1000 distinct; group b: 2000 over 2000
        "v": np.where(np.arange(n) % 2 == 0,
                      (np.arange(n) // 2) % 1000, 10_000 + np.arange(n)),
    })
    for blocks in (1, 7):
        out = kmv_distinct_grouped(
            ray.data.from_pandas(df).repartition(blocks), "g", "v",
            k=64).to_pandas().set_index("g")
        for g, truth in (("a", 1000), ("b", 2000)):
            est = out.loc[g, "est_distinct"]
            assert abs(est - truth) / truth < 0.35, (g, est)
        if blocks == 1:
            base = out
    pd.testing.assert_frame_equal(base.sort_index(), out.sort_index())


def test_kmv_small_group_exact():
    from geospatial_learn_ray.stages.sketches import kmv_distinct_grouped

    df = pd.DataFrame({"g": ["s"] * 50, "v": np.arange(50) % 7})
    out = kmv_distinct_grouped(ray.data.from_pandas(df), "g", "v",
                               k=32).to_pandas()
    assert out["n_mins"].tolist() == [7]
    assert out["est_distinct"].tolist() == [7.0]


def test_kmv_overlap_planted_intersection():
    from geospatial_learn_ray.stages.sketches import kmv_overlap_pairs

    # A = 0..1499, B = 1000..2499 -> |A∩B| = 500, |A∪B| = 2500
    a = pd.DataFrame({"g": "a", "v": np.arange(1500)})
    b = pd.DataFrame({"g": "b", "v": np.arange(1000, 2500)})
    df = pd.concat([a, b], ignore_index=True)
    for blocks in (1, 5):
        out = kmv_overlap_pairs(
            ray.data.from_pandas(df).repartition(blocks), "g", "v",
            k=128).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["type_a"], r["type_b"]) == ("a", "b")
        assert abs(r["est_union"] - 2500) / 2500 < 0.3
        assert abs(r["est_inter"] - 500) / 500 < 0.6
        if blocks == 1:
            base = out
    pd.testing.assert_frame_equal(base, out)


def test_ams_f2_accuracy_and_block_invariance():
    from geospatial_learn_ray.stages.sketches import ams_f2

    rng = np.random.RandomState(3)
    # skewed frequencies: F2 dominated by the head
    keys = np.concatenate([np.repeat(np.arange(10), 200),
                           rng.randint(1000, 3000, size=2000)])
    df = pd.DataFrame({"user_id": keys.astype(np.int64)})
    true_f2 = int((pd.Series(keys).value_counts() ** 2).sum())
    est1 = ams_f2(ray.data.from_pandas(df), "user_id").to_pandas()
    est2 = ams_f2(ray.data.from_pandas(df).repartition(7), "user_id").to_pandas()
    # mergeable: block structure must not change a single output value
    pd.testing.assert_frame_equal(
        est1.sort_values("est_id").reset_index(drop=True),
        est2.sort_values("est_id").reset_index(drop=True))
    f2 = est1["f2_est"].iloc[0]
    assert 0.2 * true_f2 < f2 < 5.0 * true_f2
    # E[Z^2] sanity: every estimator's Z^2 is nonnegative, z2 == z*z
    assert (est1["z2"] == est1["z"] ** 2).all()


def test_bloom_zone_prune_no_false_negatives_and_block_invariant():
    import numpy as np
    import pandas as pd
    import ray.data

    from geospatial_learn_ray.stages.sketches import bloom_zone_prune

    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame({"o_orderkey": np.arange(n, dtype=np.int64),
                       "o_custkey": rng.integers(0, 150, n).astype(np.int64)})
    outs = []
    for blocks in (1, 6):
        out = (bloom_zone_prune(ray.data.from_pandas(df).repartition(blocks),
                                zone_width=512)
               .to_pandas().sort_values("probe_key").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # Bloom contract: present => hit (no false negatives), fp >= 0
    assert (out["n_hit"] >= out["n_present"]).all()
    assert (out["n_false_pos"] >= 0).all()
    # exact membership cross-check for one probe
    zones_with_5 = set((df.loc[df["o_custkey"] == 5, "o_orderkey"] // 512).unique())
    assert out.set_index("probe_key").loc[5, "n_present"] == len(zones_with_5)
