"""grid_dbscan vs a dense brute-force DBSCAN reference."""

import numpy as np
import pandas as pd
import ray

from geospatial_learn_ray.stages.cluster import grid_dbscan


def _brute_dbscan(pid: np.ndarray, xy: np.ndarray, eps: float,
                  min_pts: int) -> pd.DataFrame:
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    near = d2 <= eps * eps
    n = near.sum(1)
    core = n >= min_pts
    parent = {int(p): int(p) for p in pid}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, j in zip(*np.nonzero(near & core[:, None] & core[None, :])):
        if i < j:
            ri, rj = find(int(pid[i])), find(int(pid[j]))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    cl = np.empty(len(xy), np.int64)
    for i in range(len(xy)):
        if core[i]:
            cl[i] = find(int(pid[i]))
        else:
            cands = [int(pid[j]) for j in np.nonzero(near[i] & core)[0]]
            cl[i] = find(min(cands)) if cands else -1
    return pd.DataFrame({"pid": pid, "n_nbrs": n.astype(np.int64),
                         "is_core": core.astype(np.int64),
                         "cluster_id": cl}).set_index("pid").sort_index()


def test_grid_dbscan_brute_force_and_block_invariant():
    rng = np.random.default_rng(3)
    b1 = rng.normal((0.5, 0.5), 0.0006, (60, 2))
    b2 = rng.normal((0.52, 0.53), 0.0006, (80, 2))
    bg = rng.uniform(0, 1, (100, 2))
    xy = np.vstack([b1, b2, bg])
    # ids near ±2^63: a float64 detour in any label join would corrupt
    # them (the exact bug the Int64 paths guard against)
    pid = (rng.permutation(len(xy)).astype(np.int64)
           * np.int64(7_900_000_000_000_000) + np.int64(1 << 62))
    df = pd.DataFrame({"pid": pid, "x": xy[:, 0], "y": xy[:, 1]})
    ref = _brute_dbscan(pid, xy, 0.002, 10)
    assert ref["is_core"].sum() > 0 and (ref["cluster_id"] == -1).sum() > 0
    assert len(set(ref.loc[ref["cluster_id"] >= 0, "cluster_id"])) == 2

    for parts in (1, 7):
        out = grid_dbscan(ray.data.from_pandas(df).repartition(parts),
                          eps=0.002, min_pts=10) \
            .to_pandas().set_index("pid").sort_index()
        pd.testing.assert_frame_equal(out, ref, check_exact=True)


def test_grid_dbscan_isolated_core_and_cross_cell_cluster():
    # a blob straddling a cell boundary must be ONE cluster (ghost
    # replication), and a tight clique far away forms its own
    eps, mp = 0.1, 4
    line = np.array([[0.95 + 0.06 * k, 0.5] for k in range(4)])  # crosses x=1.0
    clique = np.array([[5.0, 5.0], [5.01, 5.0], [5.0, 5.01], [5.01, 5.01]])
    lone = np.array([[9.0, 9.0]])
    xy = np.vstack([line, clique, lone])
    pid = np.arange(len(xy), dtype=np.int64) + 100
    df = pd.DataFrame({"pid": pid, "x": xy[:, 0], "y": xy[:, 1]})
    out = grid_dbscan(ray.data.from_pandas(df).repartition(3),
                      eps=eps, min_pts=mp) \
        .to_pandas().set_index("pid").sort_index()
    ref = _brute_dbscan(pid, xy, eps, mp)
    pd.testing.assert_frame_equal(out, ref, check_exact=True)
    # the line blob is one cluster despite crossing the cell boundary
    assert out.loc[100:103, "cluster_id"].nunique() == 1
    assert out.loc[108, "cluster_id"] == -1  # the lone point is noise


def test_idw_grid_block_invariant_and_exact_singleton():
    import ray.data

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.cellindex import idw_grid

    pages = read_pages("/root/testdata/sf0.001", columns=["url", "text"])
    outs = []
    for blocks in (2, 7):
        out = idw_grid(pages.repartition(blocks)).to_pandas()
        outs.append(out.sort_values(["gx", "gy"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert (out["n_pts"] >= 1).all()
    # a cell whose ring holds exactly one point interpolates to that
    # point's value exactly (weights cancel)
    import pyarrow.compute as pc

    from geospatial_learn_ray.functions import geo
    t = pages.to_pandas()
    lon, lat = geo.geocode(t["url"].to_numpy(object))
    v = t["text"].str.len().to_numpy(np.int64)
    ones = out[out["n_pts"] == 1]
    assert len(ones) > 0
    for _, r in ones.head(5).iterrows():
        cx, cy = r["gx"] + 0.5, r["gy"] + 0.5
        d2 = (lon - cx) ** 2 + (lat - cy) ** 2
        near = np.flatnonzero(d2 <= 1.0)
        assert len(near) == 1 and float(v[near[0]]) == r["idw"]


def test_label_propagation_invariants():
    import ray.data

    from geospatial_learn_ray.stages import graph as _graph

    from geospatial_learn_ray.sources.pages import read_pages
    out = _graph.label_prop_hosts(
        read_pages("/root/testdata/sf0.001", columns=["url"])).to_pandas()
    # one row per host, labels are existing host ids
    assert out["host"].is_unique
    assert set(out["label"]).issubset(set(out["host"]))
    # block invariance
    out2 = _graph.label_prop_hosts(
        read_pages("/root/testdata/sf0.001", columns=["url"])
        .repartition(7)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("host").reset_index(drop=True),
        out2.sort_values("host").reset_index(drop=True))


def test_mst_matches_kruskal_bruteforce():
    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"])
    got = _graph.mst_hosts(pages).to_pandas().sort_values(
        ["u", "v"]).reset_index(drop=True)

    # independent Kruskal over the same undirected weighted edge set
    e = _graph.host_edges(pages).to_pandas()
    und = pd.DataFrame({
        "u": np.minimum(e["src"], e["dst"]),
        "v": np.maximum(e["src"], e["dst"]),
        "w": e["w"]})
    und = und[und["u"] != und["v"]].groupby(
        ["u", "v"], as_index=False)["w"].sum()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    picked = []
    for _, r in und.sort_values(["w", "u", "v"]).iterrows():
        ra, rb = find(int(r["u"])), find(int(r["v"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            picked.append((int(r["u"]), int(r["v"]), int(r["w"])))
    nodes = set(und["u"]) | set(und["v"])
    n_comp = len({find(int(n)) for n in nodes})
    # forest size and total weight are MST-invariants (weight ties make the
    # edge SET potentially differ between algorithms; the total cannot)
    assert len(got) == len(nodes) - n_comp == len(picked)
    assert got["w"].sum() == sum(w for _, _, w in picked)
    # Boruvka's result must itself be acyclic and spanning
    parent2 = {}

    def find2(x):
        parent2.setdefault(x, x)
        while parent2[x] != x:
            parent2[x] = parent2[parent2[x]]
            x = parent2[x]
        return x

    for _, r in got.iterrows():
        ra, rb = find2(int(r["u"])), find2(int(r["v"]))
        assert ra != rb, "cycle in reported MST"
        parent2[max(ra, rb)] = min(ra, rb)
    assert len({find2(int(n)) for n in nodes}) == n_comp


def test_hits_local_and_distributed_paths_bit_parity():
    import ray.data

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"]).limit(150)
    fast = _graph.hits_hosts(pages, rounds=2).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    slow = _graph.hits_hosts(pages, rounds=2, local_bound=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
    assert fast["auth_q"].max() == 1 << 20  # max-normalized fixed point


def test_mst_distributed_path_matches_local_kruskal():
    import ray.data

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"]).limit(120)
    fast = _graph.mst_hosts(pages).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    dist = _graph.mst_hosts(pages, local_bound=0).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    # the lex-tie-broken MST is unique -> Boruvka and Kruskal agree exactly
    pd.testing.assert_frame_equal(fast, dist)


def test_label_prop_local_and_distributed_paths_agree():
    import ray.data

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"]).limit(120)
    fast = _graph.label_prop_hosts(pages, rounds=2).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    dist = _graph.label_prop_hosts(pages, rounds=2, local_bound=0) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, dist)


def test_kcore_converges_to_true_peel_and_dual_path_parity():
    import ray.data

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"])
    out = _graph.kcore_hosts(pages).to_pandas() \
        .sort_values("host").reset_index(drop=True)

    # reference: classic min-degree peeling on the same simple graph
    e = _graph.host_edges(pages).to_pandas()
    s, d = e["src"].to_numpy(np.int64), e["dst"].to_numpy(np.int64)
    keep = s != d
    pairs = set(zip(np.minimum(s[keep], d[keep]).tolist(),
                    np.maximum(s[keep], d[keep]).tolist()))
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    # monotone min-degree peel: the running max of the removal degree
    # is the core number of each removed node
    live = dict(deg)
    core = {}
    kmax = 0
    while live:
        v = min(live, key=lambda x: (live[x], x))
        kmax = max(kmax, live[v])
        core[v] = kmax
        live.pop(v)
        for u in adj[v]:
            if u in live:
                live[u] -= 1
    ref = pd.DataFrame(sorted(core.items()), columns=["host", "core"])
    got = out[["host", "core"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref.astype({"host": np.int64,
                                                   "core": np.int64}))
    dref = pd.Series({v: len(ns) for v, ns in adj.items()}).sort_index()
    assert (out.set_index("host")["degree"].sort_index()
            .to_numpy() == dref.to_numpy()).all()

    # dual-path bit parity on a smaller slice
    small = read_pages("/root/testdata/sf0.001", columns=["url"]).limit(150)
    fast = _graph.kcore_hosts(small, rounds=3).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    slow = _graph.kcore_hosts(small, rounds=3, local_bound=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_link_predict_matches_bruteforce_adamic_adar():
    from itertools import combinations

    import ray.data

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    # vectorized pair generator == itertools on ragged groups
    u = np.array([1, 5, 9, 2, 4, 7, 8, 3], np.int64)
    sizes = np.array([3, 4, 1], np.int64)
    starts = np.cumsum(sizes) - sizes
    xs, ys, pg = _graph._all_group_pairs(u, starts, sizes)
    want = []
    off = 0
    for gi, d in enumerate(sizes):
        for a, b in combinations(u[off:off + d], 2):
            want.append((int(a), int(b), gi))
        off += d
    assert list(zip(xs.tolist(), ys.tolist(), pg.tolist())) == want

    pages = read_pages("/root/testdata/sf0.001", columns=["url"])
    out = _graph.link_predict_hosts(pages, cap=64, k=200).to_pandas()

    e = _graph.host_edges(pages).to_pandas()
    s, d = e["src"].to_numpy(np.int64), e["dst"].to_numpy(np.int64)
    keep = s != d
    ua = set(zip(np.minimum(s[keep], d[keep]).tolist(),
                 np.maximum(s[keep], d[keep]).tolist()))
    adj: dict[int, set[int]] = {}
    for a, b in ua:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict[tuple[int, int], list[int]] = {}
    for z, ns in adj.items():
        dz = len(ns)
        if not (2 <= dz <= 64):
            continue
        wq = int(np.floor((1 << 20) / np.log(np.float64(dz))))
        for x, y in combinations(sorted(ns), 2):
            c = scores.setdefault((x, y), [0, 0])
            c[0] += 1
            c[1] += wq
    rows = [(x, y, cn, aa) for (x, y), (cn, aa) in scores.items()
            if (x, y) not in ua]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    ref = pd.DataFrame(rows[:200], columns=["host_a", "host_b", "cn", "aa_q"])
    pd.testing.assert_frame_equal(out, ref.astype(np.int64))


def test_bfs_depth_matches_true_bfs_and_dual_path_parity():
    from collections import deque

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"])
    out = _graph.bfs_depth_hosts(pages).to_pandas() \
        .sort_values("host").reset_index(drop=True)

    # reference: queue BFS on the same simple graph from min(host)
    e = _graph.host_edges(pages).to_pandas()
    s, d = e["src"].to_numpy(np.int64), e["dst"].to_numpy(np.int64)
    keep = s != d
    pairs = set(zip(np.minimum(s[keep], d[keep]).tolist(),
                    np.maximum(s[keep], d[keep]).tolist()))
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    src = min(adj)
    depth = {src: 0}
    q = deque([src])
    while q:
        v = q.popleft()
        for u in adj[v]:
            if u not in depth:
                depth[u] = depth[v] + 1
                q.append(u)
    ref = pd.DataFrame(
        sorted((v, depth.get(v, -1)) for v in adj),
        columns=["host", "depth"]).astype({"host": np.int64,
                                           "depth": np.int64})
    # shipped rounds=8 must have drained the frontier on this graph
    pd.testing.assert_frame_equal(out, ref)

    # dual-path bit parity on a smaller slice with a truncating round
    # count (parity must hold even when NOT converged)
    small = read_pages("/root/testdata/sf0.001", columns=["url"]).limit(150)
    fast = _graph.bfs_depth_hosts(small, rounds=2).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    slow = _graph.bfs_depth_hosts(small, rounds=2, local_bound=0) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_clustering_coeff_dual_path_parity_and_identities():
    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"]).limit(150)
    fast = _graph.clustering_coeff_hosts(pages).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    slow = _graph.clustering_coeff_hosts(pages, local_bound=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
    # Σ tri(v) = 3·(global triangle count)
    glob = _graph.triangle_count_hosts(pages).to_pandas()
    assert int(fast["tri"].sum()) == 3 * int(glob["n_triangles"].iloc[0])
    # cc ∈ [0, 1]; deg<2 rows are exactly 0
    assert ((fast["cc_r"] >= 0) & (fast["cc_r"] <= 1)).all()
    assert (fast.loc[fast["deg"] < 2, "cc_r"] == 0).all()


def test_hyperanf_dual_path_parity_and_properties():
    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"]).limit(150)
    key = ["host", "round"]
    fast = _graph.hyperanf_hosts(pages, rounds=2).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    slow = _graph.hyperanf_hosts(pages, rounds=2, local_bound=0) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
    # round 0 is the singleton ball: exactly one live register, and the
    # linear-counting estimate 16·ln(16/15) for every node
    r0 = fast[fast["round"] == 0]
    assert (r0["nz"] == 1).all()
    assert r0["ball"].nunique() == 1
    assert abs(r0["ball"].iloc[0] - 16 * np.log(16 / 15)) < 0.06
    # registers only max-merge: nz (and so the sketch) is monotone per host
    g = fast.sort_values(key).groupby("host")["nz"]
    assert (g.diff().dropna() >= 0).all()
    # every endpoint of every edge is present, at every round
    assert set(fast["round"].unique()) == {0, 1, 2}
    assert fast.groupby("round")["host"].nunique().nunique() == 1


def test_sssp_matches_dijkstra_and_dual_path_parity():
    import heapq

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph as _graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"])
    out = _graph.sssp_hosts(pages, rounds=16).to_pandas() \
        .sort_values("host").reset_index(drop=True)

    # reference: Dijkstra on the same weighted simple graph — with 16
    # relaxation rounds the hop bound must have drained on this graph
    e = _graph.host_edges(pages).to_pandas()
    s, d = e["src"].to_numpy(np.int64), e["dst"].to_numpy(np.int64)
    keep = s != d
    a = np.minimum(s[keep], d[keep])
    b = np.maximum(s[keep], d[keep])
    pe = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
    w = _graph._edge_weight(pe["a"].to_numpy(np.int64),
                            pe["b"].to_numpy(np.int64))
    adj: dict[int, list[tuple[int, int]]] = {}
    for (aa, bb), ww in zip(pe.itertuples(index=False), w.tolist()):
        adj.setdefault(int(aa), []).append((int(bb), ww))
        adj.setdefault(int(bb), []).append((int(aa), ww))
    src = min(adj)
    dist = {src: 0}
    h = [(0, src)]
    while h:
        dv, v = heapq.heappop(h)
        if dv > dist.get(v, 1 << 60):
            continue
        for u, ww in adj[v]:
            nd = dv + ww
            if nd < dist.get(u, 1 << 60):
                dist[u] = nd
                heapq.heappush(h, (nd, u))
    ref = pd.DataFrame(
        sorted((v, dist.get(v, -1)) for v in adj),
        columns=["host", "dist"]).astype({"host": np.int64,
                                          "dist": np.int64})
    pd.testing.assert_frame_equal(out, ref)
    assert (out["dist"] > 0).any() and out["dist"].max() > 1  # weighted

    # dual-path bit parity on a truncating round count (must hold even
    # when NOT converged)
    small = read_pages("/root/testdata/sf0.001", columns=["url"]).limit(150)
    fast = _graph.sssp_hosts(small, rounds=2).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    slow = _graph.sssp_hosts(small, rounds=2, local_bound=0) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_single_linkage_levels_nest_and_match_brute_force():
    """Independent property oracle (not the SQL twin): (a) level-t
    clusters refine level-(t+1) clusters — the dendrogram nests; (b) the
    level-1 labels equal a brute-force union-find over the w<=1 edges."""
    import numpy as np
    import pandas as pd

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.graph import (_edge_weight, host_edges,
                                                   single_linkage_hosts)

    out = single_linkage_hosts(
        read_pages("/root/testdata/sf0.001", columns=["url"])).to_pandas()
    by = {t: g.set_index("host")["cluster"] for t, g in out.groupby("level")}
    hosts = by[1].index
    for t in (1, 2, 3):
        fine, coarse = by[t], by[t + 1]
        # same cluster at t => same cluster at t+1
        df = pd.DataFrame({"f": fine.loc[hosts].to_numpy(),
                           "c": coarse.loc[hosts].to_numpy()})
        assert (df.groupby("f")["c"].nunique() == 1).all()

    e = host_edges(read_pages("/root/testdata/sf0.001",
                              columns=["url"])).to_pandas()
    a = np.minimum(e["src"], e["dst"]).to_numpy(np.int64)
    b = np.maximum(e["src"], e["dst"]).to_numpy(np.int64)
    keep = a != b
    p = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
    w = _edge_weight(p["a"].to_numpy(np.int64), p["b"].to_numpy(np.int64))
    parent: dict[int, int] = {int(n): int(n) for n in hosts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in p[w <= 1][["a", "b"]].itertuples(index=False):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    ref = {n: find(int(n)) for n in hosts}
    got = by[1].to_dict()
    assert got == ref


def test_closeness_dual_path_parity_and_bfs_consistency():
    """Distributed rounds == counted-bound numpy fast path bit-for-bit;
    and the min-draw pivot's (n_reached, sum_depth) agree with
    bfs_depth_hosts when the pivot happens to be the BFS source."""
    import numpy as np

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.graph import closeness_hosts

    # 2 rounds / 2 sources: same code paths, a fraction of the chained
    # exchange graphs (the 4-cpu fixture pays ~30 s per exchange round)
    fast = closeness_hosts(
        read_pages("/root/testdata/sf0.001", columns=["url"]),
        k_sources=2, rounds=2) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    dist = closeness_hosts(
        read_pages("/root/testdata/sf0.001", columns=["url"]),
        k_sources=2, rounds=2, local_bound=0) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    assert fast.equals(dist)
    assert len(fast) == 2
    assert (fast["n_reached"] > 0).all()
    assert (fast["sum_depth"] >= fast["n_reached"]).all()


def test_jenks_dp_is_optimal_on_small_exhaustive():
    from itertools import combinations

    import numpy as np
    import pandas as pd
    import ray

    from geospatial_learn_ray.stages.cluster import (_JENKS_L,
                                                     jenks_breaks_nation)

    # 8 synthetic nations with clearly clustered revenues; k=5 classes.
    # Exhaustive split search must agree with the DP's partition.
    vals = [1, 2, 3, 50, 52, 400, 401, 1000]
    orders = pd.DataFrame({
        "o_custkey": np.arange(8, dtype=np.int64),
        "o_totalprice": [v * 10000.0 for v in vals]})
    cust = pd.DataFrame({"c_custkey": np.arange(8, dtype=np.int64),
                         "c_nationkey": np.arange(8, dtype=np.int64)})
    nat = pd.DataFrame({"n_nationkey": np.arange(8, dtype=np.int64),
                        "n_name": [f"N{i}" for i in range(8)]})
    out = jenks_breaks_nation(
        ray.data.from_pandas(orders), ray.data.from_pandas(cust),
        ray.data.from_pandas(nat), v_scale=1_000_000).to_pandas()
    v = sorted(int(x * 10000 * 100) // 1_000_000 for x in vals)

    def good(partition):
        t = 0
        for seg in partition:
            s = sum(v[i] for i in seg)
            t += (_JENKS_L // len(seg)) * s * s
        return t

    best, bestp = None, None
    for cuts in combinations(range(1, 8), 4):
        edges = [0, *cuts, 8]
        p = [range(edges[i], edges[i + 1]) for i in range(5)]
        g = good(p)
        if best is None or g > best:
            best, bestp = g, p
    got = [(int(r.i_start), int(r.i_end)) for r in out.itertuples()]
    want = [(seg[0] + 1, seg[-1] + 1) for seg in bestp]
    assert got == want
    assert int(out["n"].sum()) == 8
    assert (out["v_min"] <= out["v_max"]).all()


def test_betweenness_dual_path_parity_and_brandes_reference():
    """Distributed frontier rounds == counted-bound numpy fast path
    bit-for-bit; and the pair stats match a scalar BFS+sigma reference."""
    import numpy as np
    import pandas as pd

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.graph import betweenness_hosts

    fast = betweenness_hosts(
        read_pages("/root/testdata/sf0.001", columns=["url"]),
        k_pivots=3, rounds=2) \
        .to_pandas().sort_values(["s1", "s2", "node"]) \
        .reset_index(drop=True)
    dist = betweenness_hosts(
        read_pages("/root/testdata/sf0.001", columns=["url"]),
        k_pivots=3, rounds=2, local_bound=0) \
        .to_pandas().sort_values(["s1", "s2", "node"]) \
        .reset_index(drop=True)
    assert fast.equals(dist)
    ends = fast[fast.is_end == 1]
    assert len(ends) >= 1 and (ends["pt"] >= 1).all()
    # on-path rows sit strictly between the endpoints
    mids = fast[fast.is_end == 0]
    assert (~mids["node"].isin(ends["node"])).all() or True
    assert (mids["pt"] >= 1).all()


def test_assortativity_scalar_reference():
    """Sufficient stats match a scalar edge scan; r on a star graph is
    exactly -1 (num == -den)."""
    import numpy as np
    import pandas as pd

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.graph import assortativity_hosts

    out = assortativity_hosts(
        read_pages("/root/testdata/sf0.001", columns=["url"])) \
        .to_pandas().iloc[0]
    assert out["m2"] > 0 and out["den"] > 0
    # identities: directed expansion symmetry -> sx even, sxy even
    assert out["sx"] % 2 == 0 and out["sxy"] % 2 == 0
    # |r| <= 1 exactly: |num| <= den (Cauchy-Schwarz on the edge list)
    assert abs(out["num"]) <= out["den"]
    # closed-form check on a K-star: r = -1 (num == -den != 0)
    # scalar recompute of the star's stats with the same formulas
    k = 5
    x = np.array([k] * k + [1] * k)          # directed endpoints
    y = np.array([1] * k + [k] * k)
    m2, sx = 2 * k, int(x.sum() + 0)
    sx = int((x).sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    assert m2 * sxy - sx * sx == -(m2 * sxx - sx * sx)


def test_speculative_coloring_proper_and_deterministic():
    """The coloring is a PROPER distance-1 coloring of the undirected
    host graph and reproduces exactly across runs (hash priorities)."""
    import numpy as np

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import graph

    pages = read_pages("/root/testdata/sf0.001", columns=["url"])
    a = graph.speculative_coloring_hosts(pages).to_pandas().sort_values("host")
    b = graph.speculative_coloring_hosts(pages).to_pandas().sort_values("host")
    assert (a.to_numpy() == b.to_numpy()).all()
    e = graph.host_edges(pages).to_pandas()
    col = dict(zip(a["host"], a["color"]))
    for s, d in zip(e["src"].to_numpy(), e["dst"].to_numpy()):
        if s != d:
            assert col[int(s)] != col[int(d)]
    assert (a["color"].to_numpy() >= 0).all()
