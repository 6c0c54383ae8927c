"""Link-graph stages over the pages table — host-level PageRank, the
web-pipeline quality-weighting shape (CommonCrawl host ranks feed corpus
filters the same way the reference's per-class priors feed learning.py's
rankings). LLM-pipeline extension; no reference analogue.

The page→host edge list is derived deterministically from the url by the
repo's standard hash recipe (splitmix64-finalized FNV — the geocode
pattern, functions/geo.py:48), so the graph is reproducible on any
cluster layout and restatable in SQL (CLAUDE.md: data-dependent seeded
RNG is neither).

PageRank runs in FIXED-POINT integer arithmetic end to end: ranks are
Q30 integers, per-edge contributions are floor((r·w)/W), the damping step
is floor(85·s/100) — every sum is an integer sum (order-exact at any
scale, any block structure) and every division is a floor division DuckDB
expresses as ``//``, so the unrolled-CTE oracle is bit-exact (CLAUDE.md:
iterative numerics restate as unrolled MATERIALIZED CTE blocks).
Documented bound: r·w needs r < 2³¹ (holds: total mass ≤ 2³⁰) and
w < 2³² edges between one host pair — beyond that the product needs the
int128 path both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, splitmix64
from ..functions.rounding import round_half_away
from .exchange import bucket_exchange

Q = 30  # Q30 fixed point
DAMP_NUM, DAMP_DEN = 85, 100
N_HOST_MOD = 1000
OUT_LINKS = 4


def _hash_mod(strs: np.ndarray, mod: int) -> np.ndarray:
    old = np.seterr(over="ignore")
    try:
        return (splitmix64(fnv1a64(strs)) % np.uint64(mod)).astype(np.int64)
    finally:
        np.seterr(**old)


def _bkt(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    old = np.seterr(over="ignore")
    try:
        return (splitmix64(ids.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
    finally:
        np.seterr(**old)


def host_edges(pages: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """pages(url) → weighted host graph (src, dst, w, wt): src is the url's
    host id, each page emits OUT_LINKS deterministic hash outlinks, one
    bucketed exchange aggregates multi-edges exactly and attaches the
    total out-weight ``wt`` per src (groupby-transform — never a second
    shuffle). Map-side pre-aggregation keeps the exchange O(distinct
    host pairs per block), not O(pages)."""

    def explode(b: pa.Table) -> pd.DataFrame:
        urls = b["url"].to_pandas()
        src = urls.str.extract(r"site-(\d+)\.example", expand=False).astype(np.int64)
        srcs, dsts = [], []
        for k in range(OUT_LINKS):
            dsts.append(_hash_mod((urls + f"#out{k}").to_numpy(object), N_HOST_MOD))
            srcs.append(src.to_numpy())
        d = pd.DataFrame({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})
        g = d.groupby(["src", "dst"], sort=False).size().reset_index(name="w")
        g["w"] = g["w"].astype(np.int64)
        g["_part"] = _bkt(g["src"].to_numpy(), num_buckets)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        e = g.groupby(["src", "dst"], sort=False, as_index=False)["w"].sum()
        e["wt"] = e.groupby("src", sort=False)["w"].transform("sum").astype(np.int64)
        return e

    return bucket_exchange(
        pages.select_columns(["url"]).map_batches(explode, batch_format="pyarrow"),
        combine)


def _pagerank_local(edges: pd.DataFrame, n_nodes: int, nodes: np.ndarray,
                    iters: int, seed_mod: int | None = None) -> pd.DataFrame:
    """Driver fast path (counted bound only): identical integer recurrence
    on numpy arrays. np.add.at keeps the bucket sums int64-exact —
    bincount's float64 weights would not be (CLAUDE.md sketch rule).
    ``seed_mod`` switches to PERSONALIZED PageRank: teleport mass and the
    initial distribution concentrate on the seed set {host % seed_mod ==
    0} (closed-form membership — no broadcast needed anywhere)."""
    idx = {h: i for i, h in enumerate(nodes)}
    si = np.array([idx[s] for s in edges["src"]], np.int64)
    di = np.array([idx[d] for d in edges["dst"]], np.int64)
    w = edges["w"].to_numpy(np.int64)
    wt = edges["wt"].to_numpy(np.int64)
    if seed_mod is None:
        base = np.full(n_nodes, (15 * (1 << Q)) // (100 * n_nodes), np.int64)
        r = np.full(n_nodes, (1 << Q) // n_nodes, np.int64)
    else:
        seed = (nodes % seed_mod) == 0
        n_seed = max(int(seed.sum()), 1)
        base = np.where(seed, (15 * (1 << Q)) // (100 * n_seed), 0).astype(np.int64)
        r = np.where(seed, (1 << Q) // n_seed, 0).astype(np.int64)
    for _ in range(iters):
        c = (r[si] * w) // wt
        s = np.zeros(n_nodes, np.int64)
        np.add.at(s, di, c)
        r = base + (DAMP_NUM * s) // DAMP_DEN
    return pd.DataFrame({"host": nodes, "r_q": r,
                         "pr": round_half_away(r / np.float64(1 << Q), 9)})


def pagerank_hosts(pages: ray.data.Dataset, iters: int = 8,
                   num_buckets: int = 64,
                   local_bound: int = 2_000_000,
                   seed_mod: int | None = None) -> ray.data.Dataset:
    """Host-level PageRank over the deterministic link graph, ``iters``
    rounds of r ← base + ⌊85·(Σ_in ⌊r·w/W⌋)/100⌋ (dangling mass dropped —
    the simplified recurrence; both sides implement it identically so the
    oracle is exact).

    Scale shape: the edge list aggregates once to the HOST graph (a
    Dataset — spillable, never driver memory) and is reused every round
    with the SAME bucketing key. When the counted edge total is under
    ``local_bound`` the iteration runs on the driver (the
    connected_components counted-bound pattern, dedup.py); above it each
    round is the union-tag bucketed join (ranks ⋈ edges on src, one
    vectorized merge per bucket) + one exchange keyed on dst — 2 exchanges
    per round, contributions pre-summed per dst inside the join block so
    the second exchange moves O(distinct dst per block) rows."""
    edges = host_edges(pages, num_buckets).materialize()
    n_edges = edges.count()

    if n_edges <= local_bound:
        e = edges.to_pandas()  # counted bound: ≤ local_bound host-pair rows
        nodes = np.unique(np.concatenate([e["src"].to_numpy(np.int64),
                                          e["dst"].to_numpy(np.int64)]))
        return ray.data.from_pandas(
            _pagerank_local(e, len(nodes), nodes, iters, seed_mod))

    # ---- distributed rounds ------------------------------------------------
    def node_rows(b: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(np.concatenate([b["src"].to_numpy(np.int64),
                                      b["dst"].to_numpy(np.int64)]))
        return pd.DataFrame({"host": h, "_part": _bkt(h, num_buckets)})

    nodes = bucket_exchange(
        edges.map_batches(node_rows, batch_format="pandas"),
        lambda g: pd.DataFrame({"host": np.unique(g["host"].to_numpy(np.int64))}),
    ).materialize()
    n_nodes = nodes.count()
    if seed_mod is None:
        n_base = n_nodes
    else:
        # counted seed total via one tiny aggregation over the node list
        n_base = max(int(nodes.map_batches(
            lambda b: pd.DataFrame({"n": [int(((b["host"].to_numpy(np.int64)
                                                % seed_mod) == 0).sum())]}),
            batch_format="pandas").sum("n")), 1)
    base = (15 * (1 << Q)) // (100 * n_base)
    r0 = (1 << Q) // n_base

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": b["src"].to_numpy(np.int64),
                             "dst": b["dst"].to_numpy(np.int64),
                             "w": b["w"].to_numpy(np.int64),
                             "wt": b["wt"].to_numpy(np.int64),
                             "r": np.int64(0), "t": np.int8(0),
                             "_jb": _bkt(b["src"].to_numpy(np.int64), num_buckets)})

    def contribs(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["t"] == 0]
        rk = g[g["t"] == 1][["src", "r"]]
        m = e[["src", "dst", "w", "wt"]].merge(rk, on="src", how="inner")
        c = (m["r"].to_numpy(np.int64) * m["w"].to_numpy(np.int64)) \
            // m["wt"].to_numpy(np.int64)
        p = pd.DataFrame({"host": m["dst"].to_numpy(np.int64), "s": c})
        p = p.groupby("host", sort=False, as_index=False)["s"].sum()
        p["_part"] = _bkt(p["host"].to_numpy(np.int64), num_buckets)
        return p

    def new_ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        s = g.groupby("host", sort=False, as_index=False)["s"].sum()
        h = s["host"].to_numpy(np.int64)
        b = (np.where((h % seed_mod) == 0, base, 0).astype(np.int64)
             if seed_mod is not None else np.int64(base))
        s["r"] = b + (DAMP_NUM * s["s"].to_numpy(np.int64)) // DAMP_DEN
        return s[["host", "r"]]

    tagged_edges = edges.map_batches(tag_edges, batch_format="pandas").materialize()
    zero = nodes.map_batches(
        lambda b: pd.DataFrame({"host": b["host"].to_numpy(np.int64),
                                "s": np.int64(0),
                                "_part": _bkt(b["host"].to_numpy(np.int64), num_buckets)}),
        batch_format="pandas")
    def init_ranks(b: pd.DataFrame) -> pd.DataFrame:
        h = b["host"].to_numpy(np.int64)
        r = (np.where((h % seed_mod) == 0, r0, 0).astype(np.int64)
             if seed_mod is not None else np.full(len(h), r0, np.int64))
        return pd.DataFrame({"host": h, "r": r})

    ranks = nodes.map_batches(init_ranks, batch_format="pandas")
    for _ in range(iters):
        tagged_ranks = ranks.map_batches(
            lambda b: pd.DataFrame({"src": b["host"].to_numpy(np.int64),
                                    "dst": np.int64(0), "w": np.int64(0),
                                    "wt": np.int64(0),
                                    "r": b["r"].to_numpy(np.int64),
                                    "t": np.int8(1),
                                    "_jb": _bkt(b["host"].to_numpy(np.int64),
                                                num_buckets)}),
            batch_format="pandas")
        joined = bucket_exchange(tagged_edges.union(tagged_ranks), contribs, key="_jb")
        ranks = bucket_exchange(joined.union(zero), new_ranks)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        r = b["r"].to_numpy(np.int64)
        return pd.DataFrame({"host": b["host"].to_numpy(np.int64), "r_q": r,
                             "pr": round_half_away(r / np.float64(1 << Q), 9)})

    return ranks.map_batches(finalize, batch_format="pandas")


def triangle_count_hosts(pages: ray.data.Dataset,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Global triangle count of the (undirected, simple) host graph — the
    standard graph-health / community-density metric over a web crawl's
    link structure. LLM-pipeline extension; no reference analogue.

    Classic distributed plan (Suri & Vassilvitskii 2011, "node-iterator
    on the degree-oriented DAG"): every undirected edge is oriented from
    its lower-(degree, id) endpoint to the higher, each source's oriented
    out-neighborhood generates the wedges (out-degree under degree
    orientation is O(√m), so no hub explodes the wedge set), and a wedge
    is a triangle iff its closing pair is itself an oriented edge — one
    tagged-union exchange probes all wedges against all edges. Every
    exchange moves narrow int rows; per-bucket partial counts reduce to
    ONE summary row (n_edges, n_wedges, n_triangles).
    """
    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        u = np.minimum(b["src"].to_numpy(np.int64), b["dst"].to_numpy(np.int64))
        v = np.maximum(b["src"].to_numpy(np.int64), b["dst"].to_numpy(np.int64))
        d = pd.DataFrame({"u": u, "v": v})[u != v].drop_duplicates()
        old = np.seterr(over="ignore")
        try:
            d["_part"] = _bkt((d["u"].to_numpy(np.int64) * np.int64(1_000_003))
                              ^ d["v"].to_numpy(np.int64), num_buckets)
        finally:
            np.seterr(**old)
        return d

    ue = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(),
    ).materialize()

    n_edges = ue.count()

    # node degrees over the undirected simple graph
    def explode_nodes(b: pd.DataFrame) -> pd.DataFrame:
        n = np.concatenate([b["u"].to_numpy(np.int64), b["v"].to_numpy(np.int64)])
        d = pd.DataFrame({"node": n}).groupby("node", sort=False).size() \
            .reset_index(name="c")
        d["_part"] = _bkt(d["node"].to_numpy(np.int64), num_buckets)
        return d

    deg = bucket_exchange(
        ue.map_batches(explode_nodes, batch_format="pandas"),
        lambda g: g.groupby("node", sort=False, as_index=False)["c"].sum()
                   .rename(columns={"c": "deg"}),
        small_partials=True)

    # attach deg(u) then deg(v) — tagged-union bucketed joins
    def _attach(es: ray.data.Dataset, key: str, out: str) -> ray.data.Dataset:
        def tag_e(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["_t"] = np.int8(0)
            b["deg"] = np.int64(0)
            b["_part"] = _bkt(b[key].to_numpy(np.int64), num_buckets)
            return b

        def tag_d(b: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame({key: b["node"].to_numpy(np.int64),
                              "deg": b["deg"].to_numpy(np.int64)})
            d["_t"] = np.int8(1)
            d["_part"] = _bkt(d[key].to_numpy(np.int64), num_buckets)
            return d

        def join(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["_t"] == 0].drop(columns=["_t", "deg", "_part"])
            d = g[g["_t"] == 1][[key, "deg"]]
            return e.merge(d, on=key, how="inner").rename(columns={"deg": out})

        both = es.map_batches(tag_e, batch_format="pandas").union(
            deg.map_batches(tag_d, batch_format="pandas"))
        return bucket_exchange(both, join)

    with_deg = _attach(_attach(ue, "u", "du"), "v", "dv")

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        u, v = b["u"].to_numpy(np.int64), b["v"].to_numpy(np.int64)
        du, dv = b["du"].to_numpy(np.int64), b["dv"].to_numpy(np.int64)
        fwd = (du < dv) | ((du == dv) & (u < v))
        s = np.where(fwd, u, v)
        t = np.where(fwd, v, u)
        dt = np.where(fwd, dv, du)
        d = pd.DataFrame({"s": s, "t": t, "dt": dt})
        d["_part"] = _bkt(d["s"].to_numpy(np.int64), num_buckets)
        return d

    oriented = bucket_exchange(
        with_deg.map_batches(orient, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"])).materialize()

    def wedges(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in b.groupby("s", sort=False):
            g = grp.sort_values(["dt", "t"], kind="mergesort")
            t = g["t"].to_numpy(np.int64)
            if len(t) < 2:
                continue
            i, j = np.triu_indices(len(t), k=1)
            outs.append(pd.DataFrame({"a": t[i], "b": t[j]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    # batch_size=None: a source's whole adjacency must stay in one batch
    # (oriented blocks are whole s-buckets; re-batching could split one)
    w = oriented.map_batches(wedges, batch_format="pandas", batch_size=None)

    def tag_pairs(side: int, ca: str, cb: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame({"a": b[ca].to_numpy(np.int64),
                              "b": b[cb].to_numpy(np.int64),
                              "_t": np.int8(side)})
            old = np.seterr(over="ignore")
            try:
                d["_part"] = _bkt((d["a"].to_numpy(np.int64) * np.int64(1_000_003))
                                  ^ d["b"].to_numpy(np.int64), num_buckets)
            finally:
                np.seterr(**old)
            return d
        return fn

    probe = w.map_batches(tag_pairs(1, "a", "b"), batch_format="pandas").union(
        oriented.map_batches(tag_pairs(0, "s", "t"), batch_format="pandas"))

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["_t"] == 0][["a", "b"]].drop_duplicates()
        wd = g[g["_t"] == 1][["a", "b"]]
        hit = wd.merge(e, on=["a", "b"], how="inner")
        return pd.DataFrame({"n_wedges": [np.int64(len(wd))],
                             "n_triangles": [np.int64(len(hit))]})

    parts = bucket_exchange(probe, count_bucket).to_pandas()  # ≤ num_buckets rows
    return ray.data.from_pandas(pd.DataFrame({
        "n_edges": [np.int64(n_edges)],
        "n_wedges": [np.int64(parts["n_wedges"].sum()) if len(parts) else np.int64(0)],
        "n_triangles": [np.int64(parts["n_triangles"].sum()) if len(parts) else np.int64(0)],
    }))


def label_prop_hosts(pages: ray.data.Dataset, rounds: int = 4,
                     num_buckets: int = 64,
                     local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the undirected simple host graph: every host starts
    as its own label; each round every node adopts the MODE of its
    neighbors' previous-round labels, ties broken by the smallest label
    — fully deterministic (the paper's random tie-break and asynchronous
    order are both cluster-layout hazards, CLAUDE.md RNG rule), so a
    fixed ``rounds`` unrolls exactly in the SQL twin.

    Scale shape: per round, ONE union-tag bucketed join attaches labels
    to the directed neighbor list (labels ⋈ edges on the neighbor id) and
    pre-counts (node, lab) partials in the SAME combiner, then one
    node-keyed exchange sums counts and takes the argmax — 2 exchanges
    per round over O(E) slim rows, mirroring pagerank_hosts' round shape.
    Isolated nodes (self-loop-only hosts) keep their own label via a
    final coalesce exchange."""
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        df = pd.DataFrame({"u": np.minimum(s, d), "v": np.maximum(s, d)})
        df = df[df["u"] != df["v"]].drop_duplicates()
        df["_part"] = _bkt(df["u"].to_numpy(np.int64) * np.int64(1000003)
                           + df["v"].to_numpy(np.int64), num_buckets)
        return df

    ue = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(),
    ).materialize()

    if ue.count() <= local_bound:
        # counted-bound driver fast path: the identical synchronous
        # mode-label rounds on pandas arrays (exchange overhead dominates
        # below ~2M undirected edges; measured 20 s → 2 s at sf0.001)
        e = ue.to_pandas()
        u = e["u"].to_numpy(np.int64)
        v = e["v"].to_numpy(np.int64)
        dirs_df = pd.DataFrame({"nbr": np.concatenate([u, v]),
                                "node": np.concatenate([v, u])})
        # node domain from the DIRECTED edge list: a self-loop-only host
        # has no ue row but must still appear (with its own label)
        ed = edges.select_columns(["src", "dst"]).to_pandas()
        nodes_arr = np.unique(np.concatenate(
            [ed["src"].to_numpy(np.int64), ed["dst"].to_numpy(np.int64)]))
        lab = pd.DataFrame({"node": nodes_arr, "lab": nodes_arr})
        for _ in range(rounds):
            m = dirs_df.merge(lab, left_on="nbr", right_on="node",
                              suffixes=("", "_l"))[["node", "lab"]]
            c = m.groupby(["node", "lab"], sort=False).size()                 .reset_index(name="cnt")
            c = c.sort_values(["node", "cnt", "lab"],
                              ascending=[True, False, True],
                              kind="mergesort")
            lab = c.groupby("node", sort=False).head(1)[["node", "lab"]]
        out = pd.DataFrame({"node": nodes_arr}).merge(lab, on="node",
                                                      how="left")
        lv = out["lab"].to_numpy()
        res = np.where(pd.isna(lv), out["node"].to_numpy(np.int64),
                       lv).astype(np.int64)
        return ray.data.from_pandas(pd.DataFrame(
            {"host": out["node"].to_numpy(np.int64), "label": res}))

    def nodes_part(b: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(np.concatenate([b["u"].to_numpy(np.int64),
                                      b["v"].to_numpy(np.int64)]))
        return pd.DataFrame({"node": h, "_part": _bkt(h, num_buckets)})

    nodes = bucket_exchange(
        edges.map_batches(lambda b: nodes_part(pd.DataFrame({
            "u": b["src"], "v": b["dst"]})), batch_format="pandas"),
        lambda g: pd.DataFrame(
            {"node": np.unique(g["node"].to_numpy(np.int64))}),
    ).materialize()

    def dirs(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        d = pd.DataFrame({"nbr": np.concatenate([u, v]),
                          "node": np.concatenate([v, u])})
        d["lab"] = np.int64(0)
        d["cnt"] = np.int64(0)
        d["t"] = np.int8(0)
        d["_part"] = _bkt(d["nbr"].to_numpy(np.int64), num_buckets)
        return d[["nbr", "node", "lab", "cnt", "t", "_part"]]

    dir_ds = ue.map_batches(dirs, batch_format="pandas").materialize()

    labels = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].to_numpy(np.int64),
                                "lab": b["node"].to_numpy(np.int64)}),
        batch_format="pandas")

    def tag_labels(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({
            "nbr": b["node"].to_numpy(np.int64),
            "node": np.zeros(n, np.int64),
            "lab": b["lab"].to_numpy(np.int64),
            "cnt": np.zeros(n, np.int64),
            "t": np.full(n, 1, np.int8),
            "_part": _bkt(b["node"].to_numpy(np.int64), num_buckets)})

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["t"] == 0][["nbr", "node"]]
        lk = g.loc[g["t"] == 1, ["nbr", "lab"]]
        m = e.merge(lk, on="nbr", how="inner")
        c = m.groupby(["node", "lab"], sort=False).size().reset_index(name="cnt")
        c["cnt"] = c["cnt"].astype(np.int64)
        c["_part"] = _bkt(c["node"].to_numpy(np.int64), num_buckets)
        return c

    def mode(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby(
            ["node", "lab"], sort=False, as_index=False)["cnt"].sum()
        c = c.sort_values(["node", "cnt", "lab"],
                          ascending=[True, False, True], kind="mergesort")
        first = c.groupby("node", sort=False).head(1)
        return first[["node", "lab"]].reset_index(drop=True)

    for _ in range(rounds):
        both = dir_ds.union(labels.map_batches(tag_labels,
                                               batch_format="pandas"))
        counted = bucket_exchange(both, attach)
        labels = bucket_exchange(counted, mode)

    def tag_final(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["node"].to_numpy(np.int64),
                             "lab": b["lab"].to_numpy(np.int64),
                             "t": np.int8(1),
                             "_part": _bkt(b["node"].to_numpy(np.int64),
                                           num_buckets)})

    def tag_nodes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["node"].to_numpy(np.int64),
                             "lab": np.zeros(len(b), np.int64),
                             "t": np.int8(0),
                             "_part": _bkt(b["node"].to_numpy(np.int64),
                                           num_buckets)})

    def coalesce(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["t"] == 0][["node"]]
        lk = g.loc[g["t"] == 1, ["node", "lab"]]
        m = base.merge(lk, on="node", how="left")
        lab = m["lab"].to_numpy()
        node = m["node"].to_numpy(np.int64)
        out = np.where(pd.isna(lab), node, lab).astype(np.int64)
        return pd.DataFrame({"host": node, "label": out})

    final = bucket_exchange(
        nodes.map_batches(tag_nodes, batch_format="pandas").union(
            labels.map_batches(tag_final, batch_format="pandas")),
        coalesce)
    return final


def mst_hosts(pages: ray.data.Dataset, num_buckets: int = 64,
              max_rounds: int = 12,
              local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Minimum spanning forest of the weighted undirected host graph by
    distributed Borůvka (1926; the GBBS/MapReduce-MST shape): each round
    every component selects its minimum outgoing edge under the TOTAL
    order (w, u, v) — deterministic, so the forest is unique — selected
    edges merge components, repeat until no component has an outgoing
    edge. O(log n) rounds; component count at least halves per round.

    Scale shape per round: two union-tag bucketed exchanges attach
    component labels to the edge endpoints, the per-component minimum
    rides ``grouped_topk``'s ≤ 1 row/(comp, block) partial selection, a
    pair-keyed exchange dedups edges chosen from both sides, and the
    component merge reuses ``dedup.connected_components`` (counted-bound
    driver union-find under 1 M pairs, min-label propagation above). The
    driver sees one scalar count per round (the termination check)."""
    from .agg import grouped_topk
    from .dedup import connected_components
    from .exchange import bucket_exchange

    edges0 = host_edges(pages, num_buckets)

    def und(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        g = pd.DataFrame({"u": np.minimum(s, d), "v": np.maximum(s, d),
                          "w": b["w"].to_numpy(np.int64)})
        g = g[g["u"] != g["v"]]
        g = g.groupby(["u", "v"], sort=False, as_index=False)["w"].sum()
        g["w"] = g["w"].astype(np.int64)
        g["_part"] = _bkt(g["u"].to_numpy(np.int64) * np.int64(1000003)
                          + g["v"].to_numpy(np.int64), num_buckets)
        return g

    ue = bucket_exchange(
        edges0.map_batches(und, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).groupby(
            ["u", "v"], sort=False, as_index=False)["w"].sum().astype(
            {"w": np.int64}),
    ).materialize()

    if ue.count() <= local_bound:
        # counted-bound driver fast path: under the lexicographic total
        # order (w, u, v) all edge keys are distinct, so the MST is
        # UNIQUE — Kruskal here returns bit-identically the same edge
        # set as the distributed Borůvka rounds (and their SQL twin).
        e = ue.to_pandas().sort_values(["w", "u", "v"], kind="mergesort")
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        keep = np.zeros(len(e), bool)
        pos = 0
        for u_, v_ in zip(e["u"].to_numpy(np.int64), e["v"].to_numpy(np.int64)):
            ru, rv = find(int(u_)), find(int(v_))
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                keep[pos] = True
            pos += 1
        return ray.data.from_pandas(
            e[keep][["u", "v", "w"]].reset_index(drop=True))

    def nodes_part(b: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(np.concatenate([b["u"].to_numpy(np.int64),
                                      b["v"].to_numpy(np.int64)]))
        return pd.DataFrame({"node": h, "_part": _bkt(h, num_buckets)})

    comp = bucket_exchange(
        ue.map_batches(nodes_part, batch_format="pandas"),
        lambda g: pd.DataFrame({"node": (u := np.unique(
            g["node"].to_numpy(np.int64))), "c": u}),
    ).materialize()

    def _attach(edges: ray.data.Dataset, key: str, out: str) -> ray.data.Dataset:
        """edges ⋈ comp on edge endpoint ``key`` → label column ``out``."""
        def tag_e(b: pd.DataFrame) -> pd.DataFrame:
            d = b.copy()
            d["jk"] = d[key].to_numpy(np.int64)
            d["lab"] = np.int64(0)
            d["t"] = np.int8(0)
            d["_part"] = _bkt(d["jk"].to_numpy(np.int64), num_buckets)
            return d

        def tag_c(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            d = pd.DataFrame({"jk": b["node"].to_numpy(np.int64)})
            for col in edges.columns():
                d[col] = np.zeros(n, np.int64)
            d["lab"] = b["c"].to_numpy(np.int64)
            d["t"] = np.int8(1)
            d["_part"] = _bkt(d["jk"].to_numpy(np.int64), num_buckets)
            return d

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["t"] == 0].drop(columns=["lab", "t", "_part"])
            lk = g.loc[g["t"] == 1, ["jk", "lab"]].drop_duplicates("jk")
            m = e.merge(lk, on="jk", how="inner").drop(columns=["jk"])
            return m.rename(columns={"lab": out})

        return bucket_exchange(
            edges.map_batches(tag_e, batch_format="pandas").union(
                comp.map_batches(tag_c, batch_format="pandas")),
            combine)

    mst_parts: list[ray.data.Dataset] = []
    cur = ue
    for _ in range(max_rounds):
        e1 = _attach(cur, "u", "cu")
        e2 = _attach(e1, "v", "cv").map_batches(
            lambda b: b[b["cu"] != b["cv"]],
            batch_format="pandas").materialize()
        if e2.count() == 0:
            break

        def bothdir(b: pd.DataFrame) -> pd.DataFrame:
            return pd.concat([
                b.assign(c=b["cu"].to_numpy(np.int64)),
                b.assign(c=b["cv"].to_numpy(np.int64))], ignore_index=True)

        chosen = grouped_topk(
            e2.map_batches(bothdir, batch_format="pandas"),
            "c", "w", 1, tiebreak=["u", "v"], descending=False)

        def ded(b: pd.DataFrame) -> pd.DataFrame:
            d = b[["u", "v", "w", "cu", "cv"]].drop_duplicates(["u", "v"])
            d = d.copy()
            d["_part"] = _bkt(d["u"].to_numpy(np.int64) * np.int64(1000003)
                              + d["v"].to_numpy(np.int64), num_buckets)
            return d

        ch = bucket_exchange(
            chosen.map_batches(ded, batch_format="pandas"),
            lambda g: g.drop(columns=["_part"]).drop_duplicates(["u", "v"]),
        ).materialize()
        mst_parts.append(ch)

        ccmap = connected_components(ch.map_batches(
            lambda b: pd.DataFrame({"id_a": b["cu"].to_numpy(np.int64),
                                    "id_b": b["cv"].to_numpy(np.int64)}),
            batch_format="pandas"))

        def tag_comp(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "jk": b["c"].to_numpy(np.int64),
                "node": b["node"].to_numpy(np.int64),
                "lab": np.zeros(len(b), np.int64), "t": np.int8(0),
                "_part": _bkt(b["c"].to_numpy(np.int64), num_buckets)})

        def tag_cc(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "jk": b["node"].to_numpy(np.int64),
                "node": np.zeros(len(b), np.int64),
                "lab": b["component_id"].to_numpy(np.int64), "t": np.int8(1),
                "_part": _bkt(b["node"].to_numpy(np.int64), num_buckets)})

        def upd(g: pd.DataFrame) -> pd.DataFrame:
            base = g[g["t"] == 0][["jk", "node"]]
            lk = g.loc[g["t"] == 1, ["jk", "lab"]].drop_duplicates("jk")
            m = base.merge(lk, on="jk", how="left")
            lab = m["lab"].to_numpy()
            old = m["jk"].to_numpy(np.int64)
            return pd.DataFrame({
                "node": m["node"].to_numpy(np.int64),
                "c": np.where(pd.isna(lab), old, lab).astype(np.int64)})

        comp = bucket_exchange(
            comp.map_batches(tag_comp, batch_format="pandas").union(
                ccmap.map_batches(tag_cc, batch_format="pandas")),
            upd).materialize()

    if not mst_parts:
        return ray.data.from_pandas(pd.DataFrame({
            "u": pd.Series([], dtype=np.int64),
            "v": pd.Series([], dtype=np.int64),
            "w": pd.Series([], dtype=np.int64)}))
    out = mst_parts[0].select_columns(["u", "v", "w"])
    for p in mst_parts[1:]:
        out = out.union(p.select_columns(["u", "v", "w"]))
    return out


def _attach_col(edges: ray.data.Dataset, lookup: ray.data.Dataset,
                edge_key: str, out: str,
                num_buckets: int = 64) -> ray.data.Dataset:
    """edges ⋈ lookup(node, q) on ``edge_key`` → edges + ``out`` column —
    the union-tag bucketed join shared by the iterative graph stages."""
    from .exchange import bucket_exchange

    ecols = edges.columns()

    def tag_e(b: pd.DataFrame) -> pd.DataFrame:
        d = b.copy()
        d["jk"] = d[edge_key].to_numpy(np.int64)
        d["q"] = np.int64(0)
        d["t"] = np.int8(0)
        d["_part"] = _bkt(d["jk"].to_numpy(np.int64), num_buckets)
        return d

    def tag_l(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        d = pd.DataFrame({"jk": b["node"].to_numpy(np.int64)})
        for col in ecols:
            d[col] = np.zeros(n, np.int64)
        d["q"] = b["q"].to_numpy(np.int64)
        d["t"] = np.int8(1)
        d["_part"] = _bkt(d["jk"].to_numpy(np.int64), num_buckets)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["t"] == 0].drop(columns=["q", "t", "_part"])
        lk = g.loc[g["t"] == 1, ["jk", "q"]].drop_duplicates("jk")
        return e.merge(lk, on="jk", how="inner").drop(
            columns=["jk"]).rename(columns={"q": out})

    return bucket_exchange(
        edges.map_batches(tag_e, batch_format="pandas").union(
            lookup.map_batches(tag_l, batch_format="pandas")), combine)


def hits_hosts(pages: ray.data.Dataset, rounds: int = 8,
               scale_bits: int = 20, num_buckets: int = 64,
               local_bound: int = 2_000_000) -> ray.data.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over the weighted host
    graph in the pagerank Q-arithmetic style: a ← Σ_in w·h, h ← Σ_out
    w·a, each renormalized to Q20 fixed point by ``(x·2^20) // max(x)``
    — pure integers, truncating division on non-negative operands, so
    the SQL twin is bit-identical with zero float discipline.

    Scale shape per half-round: the O(E) weighted sum is ONE union-tag
    bucketed join (score ⋈ edges) with per-block pre-summed
    contributions + one destination-keyed exchange; the normalizer is a
    scalar ``ds.max()`` (never a score-table pull), and the scale step
    maps over the O(nodes) score rows in exact Python ints (HUGEINT
    twin — the raw·2^20 product wraps int64 at web scale)."""
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets).materialize()
    s = 1 << scale_bits

    if edges.count() <= local_bound:
        # counted-bound driver fast path (the pagerank_hosts pattern):
        # identical integer recurrence on numpy arrays — 32 chained Ray
        # stage graphs of fixed overhead beat their own work below ~2M
        # host-pair rows (measured: 176 s → 2 s at sf0.001)
        e = edges.to_pandas()
        nodes_arr = np.unique(np.concatenate([e["src"].to_numpy(np.int64),
                                              e["dst"].to_numpy(np.int64)]))
        idx = {h: i for i, h in enumerate(nodes_arr)}
        si = np.array([idx[x] for x in e["src"]], np.int64)
        di = np.array([idx[x] for x in e["dst"]], np.int64)
        w = e["w"].to_numpy(np.int64)
        n = len(nodes_arr)
        hub_v = np.full(n, s, np.int64)
        auth_v = hub_v.copy()
        for _ in range(rounds):
            raw = np.zeros(n, np.int64)
            np.add.at(raw, di, w * hub_v[si])
            assert raw.max(initial=0) < (1 << 42), "raise scale path"
            auth_v = (raw * s) // max(int(raw.max(initial=0)), 1)
            raw = np.zeros(n, np.int64)
            np.add.at(raw, si, w * auth_v[di])
            hub_v = (raw * s) // max(int(raw.max(initial=0)), 1)
        return ray.data.from_pandas(pd.DataFrame({
            "host": nodes_arr, "auth_q": auth_v, "hub_q": hub_v}))

    def nodes_part(b: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(np.concatenate([b["src"].to_numpy(np.int64),
                                      b["dst"].to_numpy(np.int64)]))
        return pd.DataFrame({"node": h, "_part": _bkt(h, num_buckets)})

    nodes = bucket_exchange(
        edges.map_batches(nodes_part, batch_format="pandas"),
        lambda g: pd.DataFrame(
            {"node": np.unique(g["node"].to_numpy(np.int64))}),
    ).materialize()
    hub = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].to_numpy(np.int64),
                                "q": np.full(len(b), s, np.int64)}),
        batch_format="pandas").materialize()

    def _halfround(score: ray.data.Dataset, from_key: str,
                   to_key: str) -> ray.data.Dataset:
        withq = _attach_col(edges.select_columns(["src", "dst", "w"]),
                            score, from_key, "sq", num_buckets)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame({
                "node": b[to_key].to_numpy(np.int64),
                "raw": b["w"].to_numpy(np.int64) * b["sq"].to_numpy(np.int64)})
            g = d.groupby("node", as_index=False)["raw"].sum()
            g["raw"] = g["raw"].astype(np.int64)
            g["_part"] = _bkt(g["node"].to_numpy(np.int64), num_buckets)
            return g

        raw = bucket_exchange(
            withq.map_batches(contrib, batch_format="pandas"),
            lambda g: g.drop(columns=["_part"]).groupby(
                "node", as_index=False)["raw"].sum().astype(
                {"raw": np.int64}),
        ).materialize()
        mx = int(raw.max("raw"))

        def scaled(b: pd.DataFrame) -> pd.DataFrame:
            q = [int((int(r) * s) // mx) for r in b["raw"].to_numpy(np.int64)]
            return pd.DataFrame({"node": b["node"].to_numpy(np.int64),
                                 "q": np.array(q, np.int64)})

        return raw.map_batches(scaled, batch_format="pandas").materialize()

    auth = hub
    for _ in range(rounds):
        auth = _halfround(hub, "src", "dst")
        hub = _halfround(auth, "dst", "src")

    def tag(ds_, col, t):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            return pd.DataFrame({
                "node": b["node"].to_numpy(np.int64),
                "q": (b["q"].to_numpy(np.int64) if "q" in b.columns
                      else np.zeros(n, np.int64)),
                "t": np.full(n, t, np.int8),
                "_part": _bkt(b["node"].to_numpy(np.int64), num_buckets)})
        return ds_.map_batches(fn, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["t"] == 0][["node"]]
        a = g.loc[g["t"] == 1, ["node", "q"]].rename(columns={"q": "auth_q"})
        h = g.loc[g["t"] == 2, ["node", "q"]].rename(columns={"q": "hub_q"})
        m = base.merge(a, on="node", how="left").merge(h, on="node", how="left")
        return pd.DataFrame({
            "host": m["node"].to_numpy(np.int64),
            "auth_q": m["auth_q"].fillna(0).to_numpy(np.int64),
            "hub_q": m["hub_q"].fillna(0).to_numpy(np.int64)})

    return bucket_exchange(
        tag(nodes, None, 0).union(tag(auth, "q", 1)).union(tag(hub, "q", 2)),
        final)


def kcore_hosts(pages: ray.data.Dataset, rounds: int = 16,
                num_buckets: int = 64,
                local_bound: int = 2_000_000) -> ray.data.Dataset:
    """k-core numbers of the undirected simple host graph via the
    fixed-round H-index iteration (Lü, Zhou et al. 2016, "The H-index
    of a network node and its relation to degree and coreness"):
    symmetrize host_edges, drop self loops and multi-edges, start from
    h₀ = degree and iterate h_{t+1}(v) = H-index of {h_t(u): u∈N(v)}
    (the largest h with ≥h neighbors valued ≥h). The sequence is
    pointwise non-increasing and ≥ core(v) at every round, and its
    fixpoint IS the core number; ``rounds`` is a fixed parameter so the
    SQL twin unrolls the identical pure-integer recurrence whether or
    not the fixpoint has been reached (tests verify convergence to the
    true peel at the shipped round count). → (host, degree, core).

    Scale shape per round: one union-tag bucketed join (values ⋈
    adjacency) + one destination-keyed exchange whose combiner is a
    single vectorized sort/cumcount/min/max per bucket — O(E log E)
    work, O(E) exchange, never a per-node Python loop. Below
    ``local_bound`` adjacency rows the driver fast path runs the same
    recurrence on numpy arrays (the pagerank/hits pattern: chained
    per-round stage graphs of fixed overhead dwarf the work on small
    graphs); dual-path parity is pytest-enforced."""
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        z = np.maximum(s[keep], d[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["a", "b"]),
    ).materialize()

    def _hindex_frame(v: np.ndarray, hq: np.ndarray) -> pd.DataFrame:
        """(neighbor-value rows keyed by v) → one (node, q) row per v."""
        f = pd.DataFrame({"v": v, "hq": hq}).sort_values(
            ["v", "hq"], ascending=[True, False], kind="mergesort")
        rn = f.groupby("v", sort=False).cumcount().to_numpy(np.int64) + 1
        f["hi"] = np.minimum(rn, f["hq"].to_numpy(np.int64))
        out = f.groupby("v", sort=False, as_index=False)["hi"].max()
        return pd.DataFrame({"node": out["v"].to_numpy(np.int64),
                             "q": out["hi"].to_numpy(np.int64)})

    if pairs.count() <= local_bound:
        p = pairs.to_pandas()
        a = p["a"].to_numpy(np.int64)
        b = p["b"].to_numpy(np.int64)
        v = np.concatenate([a, b])
        u = np.concatenate([b, a])
        nodes_arr, vi = np.unique(v, return_inverse=True)
        ui = np.searchsorted(nodes_arr, u)
        deg = np.bincount(vi, minlength=len(nodes_arr)).astype(np.int64)
        h = deg.copy()
        for _ in range(rounds):
            nf = _hindex_frame(vi, h[ui])
            h = np.zeros(len(nodes_arr), np.int64)
            h[nf["node"].to_numpy(np.int64)] = nf["q"].to_numpy(np.int64)
        return ray.data.from_pandas(pd.DataFrame(
            {"host": nodes_arr, "degree": deg, "core": h}))

    def both_dirs(bdf: pd.DataFrame) -> pd.DataFrame:
        a = bdf["a"].to_numpy(np.int64)
        z = bdf["b"].to_numpy(np.int64)
        d = pd.DataFrame({"v": np.concatenate([a, z]),
                          "u": np.concatenate([z, a])})
        d["_part"] = _bkt(d["v"].to_numpy(np.int64), num_buckets)
        return d

    adj = bucket_exchange(
        pairs.map_batches(both_dirs, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"])).materialize()

    def deg_part(bdf: pd.DataFrame) -> pd.DataFrame:
        g = bdf.groupby("v", as_index=False).size()
        return pd.DataFrame({"node": g["v"].to_numpy(np.int64),
                             "q": g["size"].to_numpy(np.int64),
                             "_part": _bkt(g["v"].to_numpy(np.int64),
                                           num_buckets)})

    def sum_q(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]).groupby("node", as_index=False)["q"].sum()
        o["q"] = o["q"].astype(np.int64)
        return o

    degrees = bucket_exchange(
        adj.map_batches(deg_part, batch_format="pandas"), sum_q).materialize()
    h = degrees

    for _ in range(rounds):
        withq = _attach_col(adj.select_columns(["v", "u"]), h, "u", "hq",
                            num_buckets)

        def part(bdf: pd.DataFrame) -> pd.DataFrame:
            d = bdf[["v", "hq"]].copy()
            d["_part"] = _bkt(d["v"].to_numpy(np.int64), num_buckets)
            return d

        h = bucket_exchange(
            withq.map_batches(part, batch_format="pandas"),
            lambda g: _hindex_frame(g["v"].to_numpy(np.int64),
                                    g["hq"].to_numpy(np.int64)),
        ).materialize()

    def tag(ds_, t):
        def fn(bdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": bdf["node"].to_numpy(np.int64),
                "q": bdf["q"].to_numpy(np.int64),
                "t": np.full(len(bdf), t, np.int8),
                "_part": _bkt(bdf["node"].to_numpy(np.int64), num_buckets)})
        return ds_.map_batches(fn, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.loc[g["t"] == 0, ["node", "q"]].rename(columns={"q": "degree"})
        c = g.loc[g["t"] == 1, ["node", "q"]].rename(columns={"q": "core"})
        m = d.merge(c, on="node", how="inner")
        return pd.DataFrame({"host": m["node"].to_numpy(np.int64),
                             "degree": m["degree"].to_numpy(np.int64),
                             "core": m["core"].to_numpy(np.int64)})

    return bucket_exchange(tag(degrees, 0).union(tag(h, 1)), final)


def _all_group_pairs(u: np.ndarray, starts: np.ndarray,
                     sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """u grouped into consecutive runs (starts/sizes, values sorted and
    distinct within each run) → all within-run unordered pairs (x, y)
    with x < y, plus each pair's run index — fully vectorized (no
    per-group Python; the wedge hot path at web scale)."""
    if len(u) == 0 or sizes.max(initial=0) < 2:
        z = np.zeros(0, np.int64)
        return z, z, z
    grp = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    loc = np.arange(len(u), dtype=np.int64) - starts[grp]
    rep = sizes[grp] - 1 - loc          # each row pairs with its successors
    xs = np.repeat(u, rep)
    pg = np.repeat(grp, rep)
    seg = np.cumsum(rep) - rep          # exclusive prefix: segment starts
    within = np.arange(int(rep.sum()), dtype=np.int64) - np.repeat(seg, rep)
    ys = u[np.repeat(np.arange(len(u), dtype=np.int64), rep) + 1 + within]
    return xs, ys, pg


def link_predict_hosts(pages: ray.data.Dataset, cap: int = 64,
                       k: int = 200, scale_bits: int = 20,
                       num_buckets: int = 64) -> ray.data.Dataset:
    """Degree-capped Adamic-Adar link prediction (Adamic & Adar 2003;
    Liben-Nowell & Kleinberg 2007) on the simple undirected host graph:
    for every non-adjacent pair (x, y), cn = number of shared neighbors
    z with 2 ≤ deg(z) ≤ cap and aa_q = Σ_z ⌊2^20 / ln(deg z)⌋ — top-k
    by (aa_q DESC, x, y). The degree cap is the operator's semantics,
    not an approximation knob: a hub mediator carries 1/ln(deg) ≈ 0
    weight yet deg² wedge pairs, so production LP prunes it — and the
    cap is what bounds the wedge explosion to Σ_{deg≤cap} deg² ≤ cap·E
    at any scale. ln parity: numpy log == DuckDB ln bit-for-bit (the
    tfidf/lm-perplexity precedent); the ⌊·⌋ makes every score an exact
    int64 sum, so ranking never sees a float tie.

    Scale shape: center-keyed exchange generates wedges with the fully
    vectorized ``_all_group_pairs`` (no per-center Python), pair-keyed
    union-tag exchange sums scores and anti-drops real edges, each
    bucket pre-selects its local top-k (global top-k ⊆ union of bucket
    top-ks), and only O(buckets·k) rows reach the final sort."""
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets)
    s = 1 << scale_bits

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        sa = b["src"].to_numpy(np.int64)
        da = b["dst"].to_numpy(np.int64)
        keep = sa != da
        a = np.minimum(sa[keep], da[keep])
        z = np.maximum(sa[keep], da[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["a", "b"]),
    ).materialize()

    def both_dirs(bdf: pd.DataFrame) -> pd.DataFrame:
        a = bdf["a"].to_numpy(np.int64)
        z = bdf["b"].to_numpy(np.int64)
        d = pd.DataFrame({"v": np.concatenate([a, z]),
                          "u": np.concatenate([z, a])})
        d["_part"] = _bkt(d["v"].to_numpy(np.int64), num_buckets)
        return d

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        f = g.sort_values(["v", "u"], kind="mergesort")
        v = f["v"].to_numpy(np.int64)
        u = f["u"].to_numpy(np.int64)
        # run boundaries of the sorted center column
        new = np.ones(len(f), bool)
        if len(f):
            new[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(new).astype(np.int64)
        sizes = np.diff(np.append(starts, len(f))).astype(np.int64)
        ok = (sizes >= 2) & (sizes <= cap)
        # keep only rows of qualifying centers, recompute offsets
        kee = np.repeat(ok, sizes)
        u2 = u[kee]
        sizes2 = sizes[ok]
        starts2 = np.cumsum(sizes2) - sizes2
        wq = np.floor(np.float64(s) / np.log(sizes2.astype(np.float64))
                      ).astype(np.int64)
        xs, ys, pg = _all_group_pairs(u2, starts2, sizes2)
        return pd.DataFrame({"x": xs, "y": ys, "cn": np.ones(len(xs), np.int64),
                             "aa_q": wq[pg] if len(xs) else
                             np.zeros(0, np.int64)})

    wedge_parts = bucket_exchange(
        pairs.map_batches(both_dirs, batch_format="pandas"), wedges)

    PAIR_MIX = np.int64(1_000_003)

    def tag_scores(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["x", "y"], as_index=False).agg(
            cn=("cn", "sum"), aa_q=("aa_q", "sum"))
        d = pd.DataFrame({"x": g["x"].to_numpy(np.int64),
                          "y": g["y"].to_numpy(np.int64),
                          "cn": g["cn"].to_numpy(np.int64),
                          "aa_q": g["aa_q"].to_numpy(np.int64),
                          "t": np.int8(0)})
        old = np.seterr(over="ignore")
        try:
            d["_part"] = _bkt((d["x"].to_numpy(np.int64) * PAIR_MIX)
                              ^ d["y"].to_numpy(np.int64), num_buckets)
        finally:
            np.seterr(**old)
        return d

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"x": b["a"].to_numpy(np.int64),
                          "y": b["b"].to_numpy(np.int64),
                          "cn": np.int64(0), "aa_q": np.int64(0),
                          "t": np.int8(1)})
        old = np.seterr(over="ignore")
        try:
            d["_part"] = _bkt((d["x"].to_numpy(np.int64) * PAIR_MIX)
                              ^ d["y"].to_numpy(np.int64), num_buckets)
        finally:
            np.seterr(**old)
        return d

    def score_combine(g: pd.DataFrame) -> pd.DataFrame:
        sc = g[g["t"] == 0].groupby(["x", "y"], as_index=False).agg(
            cn=("cn", "sum"), aa_q=("aa_q", "sum"))
        ed = g.loc[g["t"] == 1, ["x", "y"]]
        m = sc.merge(ed.assign(_e=1), on=["x", "y"], how="left")
        m = m[m["_e"].isna()].drop(columns=["_e"])
        m = m.sort_values(["aa_q", "x", "y"],
                          ascending=[False, True, True]).head(k)
        return pd.DataFrame({"host_a": m["x"].to_numpy(np.int64),
                             "host_b": m["y"].to_numpy(np.int64),
                             "cn": m["cn"].to_numpy(np.int64),
                             "aa_q": m["aa_q"].to_numpy(np.int64)})

    cand = bucket_exchange(
        wedge_parts.map_batches(tag_scores, batch_format="pandas").union(
            pairs.map_batches(tag_edges, batch_format="pandas")),
        score_combine)
    # O(buckets·k) survivors: one driver-side total order is counted-bound
    top = cand.to_pandas().sort_values(
        ["aa_q", "host_a", "host_b"],
        ascending=[False, True, True]).head(k).reset_index(drop=True)
    return ray.data.from_pandas(top)


BFS_INF = np.int64(1) << np.int64(40)


def bfs_depth_hosts(pages: ray.data.Dataset, rounds: int = 8,
                    num_buckets: int = 64,
                    local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Single-source BFS depth over the undirected simple host graph
    (the reference's region-growing / flood-fill shape on graphs —
    shape.py's grow-from-seed family — re-expressed as bulk-synchronous
    min-plus relaxation): source = MIN(host id) (deterministic,
    layout-free), d₀(v) = 0 at the source else INF, and per round
    d_{t+1}(v) = min(d_t(v), 1 + min_{u∈N(v)} d_t(u)). ``rounds`` is a
    FIXED parameter so the SQL twin unrolls the identical pure-integer
    recurrence whether or not the frontier has drained (tests verify
    convergence at the shipped round count on this graph family).
    → (host, depth), depth = -1 for nodes unreached within ``rounds``.

    Scale shape per round: one union-tag bucketed join (depths ⋈
    adjacency on u) + one destination-keyed min-combine exchange —
    O(E) moved, never a per-node Python loop. Below ``local_bound``
    adjacency pairs the driver fast path runs the same recurrence on
    numpy arrays (the pagerank/kcore pattern); dual-path parity is
    pytest-enforced."""
    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        z = np.maximum(s[keep], d[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["a", "b"]),
    ).materialize()

    if pairs.count() <= local_bound:
        p = pairs.to_pandas()
        a = p["a"].to_numpy(np.int64)
        b = p["b"].to_numpy(np.int64)
        v = np.concatenate([a, b])
        u = np.concatenate([b, a])
        nodes_arr, vi = np.unique(v, return_inverse=True)
        ui = np.searchsorted(nodes_arr, u)
        d = np.full(len(nodes_arr), BFS_INF, np.int64)
        d[0] = 0            # nodes_arr is sorted → index 0 IS min(host)
        for _ in range(rounds):
            nd = d.copy()
            np.minimum.at(nd, vi, d[ui] + 1)
            d = nd
        return ray.data.from_pandas(pd.DataFrame(
            {"host": nodes_arr,
             "depth": np.where(d >= BFS_INF, np.int64(-1), d)}))

    def both_dirs(bdf: pd.DataFrame) -> pd.DataFrame:
        a = bdf["a"].to_numpy(np.int64)
        z = bdf["b"].to_numpy(np.int64)
        d = pd.DataFrame({"v": np.concatenate([a, z]),
                          "u": np.concatenate([z, a])})
        d["_part"] = _bkt(d["v"].to_numpy(np.int64), num_buckets)
        return d

    adj = bucket_exchange(
        pairs.map_batches(both_dirs, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"])).materialize()

    def node_part(bdf: pd.DataFrame) -> pd.DataFrame:
        n = bdf[["v"]].drop_duplicates()
        return pd.DataFrame({"node": n["v"].to_numpy(np.int64),
                             "_part": _bkt(n["v"].to_numpy(np.int64),
                                           num_buckets)})

    nodes = bucket_exchange(
        adj.map_batches(node_part, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates("node"),
    ).materialize()
    src = nodes.min("node")

    def init_d(bdf: pd.DataFrame) -> pd.DataFrame:
        nd = bdf["node"].to_numpy(np.int64)
        return pd.DataFrame({"node": nd,
                             "q": np.where(nd == src, np.int64(0), BFS_INF)})

    d = nodes.map_batches(init_d, batch_format="pandas").materialize()

    def part_q(bdf: pd.DataFrame) -> pd.DataFrame:
        o = bdf[["node", "q"]].copy()
        o["_part"] = _bkt(o["node"].to_numpy(np.int64), num_buckets)
        return o

    def min_q(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]).groupby("node", as_index=False)["q"].min()
        o["q"] = o["q"].astype(np.int64)
        return o

    for _ in range(rounds):
        withq = _attach_col(adj.select_columns(["v", "u"]), d, "u", "dq",
                            num_buckets)

        def cand(bdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": bdf["v"].to_numpy(np.int64),
                "q": bdf["dq"].to_numpy(np.int64) + 1})

        d = bucket_exchange(
            withq.map_batches(cand, batch_format="pandas").union(d)
                 .map_batches(part_q, batch_format="pandas"),
            min_q).materialize()

    def finalize(bdf: pd.DataFrame) -> pd.DataFrame:
        q = bdf["q"].to_numpy(np.int64)
        return pd.DataFrame({"host": bdf["node"].to_numpy(np.int64),
                             "depth": np.where(q >= BFS_INF,
                                               np.int64(-1), q)})

    return d.map_batches(finalize, batch_format="pandas")


def clustering_coeff_hosts(pages: ray.data.Dataset,
                           num_buckets: int = 64,
                           local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Per-node local clustering coefficient over the undirected simple
    host graph — cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the node-level
    companion of triangle_count_hosts (same Suri-Vassilvitskii degree-
    oriented wedge plan; wedges carry their CENTER so each closing hit
    credits all three corners exactly once). All counts are exact ints;
    cc is one correctly-rounded f64 division mirrored in the SQL twin.
    cc = 0.0 for deg < 2 by definition. → (host, deg, tri, cc_r).

    Below ``local_bound`` undirected pairs the driver fast path computes
    diag(A³)/2 on a dense adjacency (the HITS/BFS counted-bound pattern
    — 64 chained exchange graphs of fixed overhead dwarf the work on
    small graphs); triangle counts are exact combinatorics, so dual-path
    parity is bit-for-bit (pytest-enforced)."""
    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        u = np.minimum(b["src"].to_numpy(np.int64), b["dst"].to_numpy(np.int64))
        v = np.maximum(b["src"].to_numpy(np.int64), b["dst"].to_numpy(np.int64))
        d = pd.DataFrame({"u": u, "v": v})[u != v].drop_duplicates()
        old = np.seterr(over="ignore")
        try:
            d["_part"] = _bkt((d["u"].to_numpy(np.int64) * np.int64(1_000_003))
                              ^ d["v"].to_numpy(np.int64), num_buckets)
        finally:
            np.seterr(**old)
        return d

    ue = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(),
    ).materialize()

    if ue.count() <= local_bound:
        p = ue.to_pandas()
        u = p["u"].to_numpy(np.int64)
        v = p["v"].to_numpy(np.int64)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        n = len(nodes)
        if n <= 8192:  # dense A³ needs n² ints — cap the driver footprint
            ui, vi = inv[:len(u)], inv[len(u):]
            A = np.zeros((n, n), np.int64)
            A[ui, vi] = 1
            A[vi, ui] = 1
            degv = A.sum(axis=1)
            triv = ((A @ A) * A).sum(axis=1) // 2
            cc = np.zeros(n, np.float64)
            ok = degv >= 2
            cc[ok] = round_half_away(
                (2.0 * triv[ok].astype(np.float64))
                / (degv[ok] * (degv[ok] - 1)).astype(np.float64), 9)
            return ray.data.from_pandas(pd.DataFrame(
                {"host": nodes, "deg": degv, "tri": triv, "cc_r": cc}))

    def explode_nodes(b: pd.DataFrame) -> pd.DataFrame:
        n = np.concatenate([b["u"].to_numpy(np.int64), b["v"].to_numpy(np.int64)])
        d = pd.DataFrame({"node": n}).groupby("node", sort=False).size() \
            .reset_index(name="c")
        d["_part"] = _bkt(d["node"].to_numpy(np.int64), num_buckets)
        return d

    deg = bucket_exchange(
        ue.map_batches(explode_nodes, batch_format="pandas"),
        lambda g: g.groupby("node", sort=False, as_index=False)["c"].sum()
                   .rename(columns={"c": "deg"}),
        small_partials=True).materialize()

    def _attach(es: ray.data.Dataset, key: str, out: str) -> ray.data.Dataset:
        def tag_e(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["_t"] = np.int8(0)
            b["deg"] = np.int64(0)
            b["_part"] = _bkt(b[key].to_numpy(np.int64), num_buckets)
            return b

        def tag_d(b: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame({key: b["node"].to_numpy(np.int64),
                              "deg": b["deg"].to_numpy(np.int64)})
            d["_t"] = np.int8(1)
            d["_part"] = _bkt(d[key].to_numpy(np.int64), num_buckets)
            return d

        def join(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["_t"] == 0].drop(columns=["_t", "deg", "_part"])
            d = g[g["_t"] == 1][[key, "deg"]]
            return e.merge(d, on=key, how="inner").rename(columns={"deg": out})

        both = es.map_batches(tag_e, batch_format="pandas").union(
            deg.map_batches(tag_d, batch_format="pandas"))
        return bucket_exchange(both, join)

    with_deg = _attach(_attach(ue, "u", "du"), "v", "dv")

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        u, v = b["u"].to_numpy(np.int64), b["v"].to_numpy(np.int64)
        du, dv = b["du"].to_numpy(np.int64), b["dv"].to_numpy(np.int64)
        fwd = (du < dv) | ((du == dv) & (u < v))
        s = np.where(fwd, u, v)
        t = np.where(fwd, v, u)
        dt = np.where(fwd, dv, du)
        d = pd.DataFrame({"s": s, "t": t, "dt": dt})
        d["_part"] = _bkt(d["s"].to_numpy(np.int64), num_buckets)
        return d

    oriented = bucket_exchange(
        with_deg.map_batches(orient, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"])).materialize()

    def wedges(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s_val, grp in b.groupby("s", sort=False):
            g = grp.sort_values(["dt", "t"], kind="mergesort")
            t = g["t"].to_numpy(np.int64)
            if len(t) < 2:
                continue
            i, j = np.triu_indices(len(t), k=1)
            outs.append(pd.DataFrame({"s": np.full(len(i), s_val, np.int64),
                                      "a": t[i], "b": t[j]}))
        if not outs:
            return pd.DataFrame({"s": pd.Series([], dtype=np.int64),
                                 "a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    # batch_size=None: a source's whole adjacency must stay in one batch
    w = oriented.map_batches(wedges, batch_format="pandas", batch_size=None)

    def tag_pairs(side: int, with_s: bool):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame({"a": b["a" if with_s else "s"].to_numpy(np.int64),
                              "b": b["b" if with_s else "t"].to_numpy(np.int64),
                              "s": (b["s"].to_numpy(np.int64) if with_s
                                    else np.zeros(len(b), np.int64)),
                              "_t": np.int8(side)})
            old = np.seterr(over="ignore")
            try:
                d["_part"] = _bkt((d["a"].to_numpy(np.int64) * np.int64(1_000_003))
                                  ^ d["b"].to_numpy(np.int64), num_buckets)
            finally:
                np.seterr(**old)
            return d
        return fn

    probe = w.map_batches(tag_pairs(1, True), batch_format="pandas").union(
        oriented.map_batches(tag_pairs(0, False), batch_format="pandas"))

    def tri_nodes(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["_t"] == 0][["a", "b"]].drop_duplicates()
        wd = g[g["_t"] == 1][["s", "a", "b"]]
        hit = wd.merge(e, on=["a", "b"], how="inner")
        n = np.concatenate([hit["s"].to_numpy(np.int64),
                            hit["a"].to_numpy(np.int64),
                            hit["b"].to_numpy(np.int64)])
        d = pd.DataFrame({"node": n}).groupby("node", sort=False).size() \
            .reset_index(name="tri")
        d["tri"] = d["tri"].astype(np.int64)
        d["_part"] = _bkt(d["node"].to_numpy(np.int64), num_buckets)
        return d

    tric = bucket_exchange(
        bucket_exchange(probe, tri_nodes),
        lambda g: g.drop(columns=["_part"])
                   .groupby("node", sort=False, as_index=False)["tri"].sum())

    # left-join deg with tri (tri = 0 where absent) — tagged union
    def tag_deg(b: pd.DataFrame) -> pd.DataFrame:
        d = b[["node", "deg"]].copy()
        d["tri"] = np.int64(0)
        d["_t"] = np.int8(0)
        d["_part"] = _bkt(d["node"].to_numpy(np.int64), num_buckets)
        return d

    def tag_tri(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"node": b["node"].to_numpy(np.int64),
                          "deg": np.zeros(len(b), np.int64),
                          "tri": b["tri"].to_numpy(np.int64)})
        d["_t"] = np.int8(1)
        d["_part"] = _bkt(d["node"].to_numpy(np.int64), num_buckets)
        return d

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["_t"] == 0][["node", "deg"]]
        t = g[g["_t"] == 1][["node", "tri"]]
        m = d.merge(t, on="node", how="left")
        m["tri"] = m["tri"].fillna(0).astype(np.int64)
        degv = m["deg"].to_numpy(np.int64)
        triv = m["tri"].to_numpy(np.int64)
        cc = np.zeros(len(m), np.float64)
        ok = degv >= 2
        cc[ok] = round_half_away(
            (2.0 * triv[ok].astype(np.float64))
            / (degv[ok] * (degv[ok] - 1)).astype(np.float64), 9)
        return pd.DataFrame({"host": m["node"].to_numpy(np.int64),
                             "deg": degv, "tri": triv, "cc_r": cc})

    both = deg.map_batches(tag_deg, batch_format="pandas").union(
        tric.map_batches(tag_tri, batch_format="pandas"))
    return bucket_exchange(both, finalize)


HANF_P = 4          # 16 registers — ample for ≤10^3-host balls, tiny rows
HANF_RANK_CAP = 53  # keeps 2^(53-reg) an exact integer (grouped-HLL rule)


def hyperanf_hosts(pages: ray.data.Dataset, rounds: int = 3,
                   num_buckets: int = 64,
                   local_bound: int = 2_000_000) -> ray.data.Dataset:
    """HyperANF (Boldi-Rosa-Vigna 2011): the per-node neighborhood
    function |B(v, t)| estimated by one HLL sketch per node, max-merged
    over neighbors each round — the web-graph "how fast does my crawl
    frontier grow" diagnostic. m = 16 registers (p = 4), rank capped at
    53 so the harmonic sum is the EXACT integer Σ 2^(53−reg)
    (+ zeros·2^53) — ssc ≤ 16·2^53 < 2⁶⁴, so the SQL twin's single
    HUGEINT→DOUBLE cast is correctly rounded (CLAUDE.md two-limb rule not
    needed). est = α·m² / (ssc/2^53), linear counting below 2.5·m —
    identical f64 chains both sides, ROUND(·,1).
    → (host, round, nz, ball) for round = 0..rounds.

    Scale shape per round: one union-tag bucketed join (adjacency ⋈
    sparse (node, idx, reg) rows on u — m·E narrow int rows) + one
    (node, idx) max-combine exchange; estimates reduce per node in the
    same node-keyed buckets. Below ``local_bound`` pairs the driver fast
    path runs dense numpy max-scatter rounds (HITS/BFS pattern;
    dual-path bit parity pytest-enforced)."""
    from .sketches import _hll_ranks

    p = HANF_P
    m = 1 << p
    am2 = float((0.7213 / (1.0 + 1.079 / m)) * m * m)
    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        z = np.maximum(s[keep], d[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["a", "b"]),
    ).materialize()

    def node_regs(nodes_arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(nodes_arr.astype(np.uint64))
        finally:
            np.seterr(**old)
        idx, rank = _hll_ranks(h, p)
        return idx, np.minimum(rank, HANF_RANK_CAP)

    def est_frame(hosts: np.ndarray, regs: np.ndarray,
                  t: int) -> pd.DataFrame:
        """dense (n, m) int64 regs → (host, round, nz, ball)."""
        ssc = (np.int64(1) << (np.int64(HANF_RANK_CAP) - regs)).sum(axis=1)
        zeros = (regs == 0).sum(axis=1).astype(np.int64)
        est = am2 / (ssc.astype(np.float64) / 9007199254740992.0)
        lin = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            est = np.where(
                lin, np.float64(m) * np.log(
                    np.float64(m)
                    / np.where(zeros > 0, zeros, 1).astype(np.float64)),
                est)
        return pd.DataFrame({"host": hosts,
                             "round": np.full(len(hosts), t, np.int64),
                             "nz": np.int64(m) - zeros,
                             "ball": round_half_away(est, 1)})

    if pairs.count() <= local_bound:
        pdf = pairs.to_pandas()
        a = pdf["a"].to_numpy(np.int64)
        b = pdf["b"].to_numpy(np.int64)
        nodes_arr, inv = np.unique(np.concatenate([a, b]),
                                   return_inverse=True)
        ai, bi = inv[:len(a)], inv[len(a):]
        n = len(nodes_arr)
        idx, rank = node_regs(nodes_arr)
        regs = np.zeros((n, m), np.int64)
        regs[np.arange(n), idx] = rank
        outs = [est_frame(nodes_arr, regs, 0)]
        for t in range(1, rounds + 1):
            nd = regs.copy()
            np.maximum.at(nd, ai, regs[bi])
            np.maximum.at(nd, bi, regs[ai])
            regs = nd
            outs.append(est_frame(nodes_arr, regs, t))
        return ray.data.from_pandas(pd.concat(outs, ignore_index=True))

    def both_dirs(bdf: pd.DataFrame) -> pd.DataFrame:
        a = bdf["a"].to_numpy(np.int64)
        z = bdf["b"].to_numpy(np.int64)
        d = pd.DataFrame({"v": np.concatenate([a, z]),
                          "u": np.concatenate([z, a])})
        d["_part"] = _bkt(d["v"].to_numpy(np.int64), num_buckets)
        return d

    adj = bucket_exchange(
        pairs.map_batches(both_dirs, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"])).materialize()

    def init_regs(bdf: pd.DataFrame) -> pd.DataFrame:
        nd = np.unique(bdf["v"].to_numpy(np.int64))
        idx, rank = node_regs(nd)
        d = pd.DataFrame({"node": nd, "idx": idx, "reg": rank})
        d["_part"] = _bkt(d["node"].to_numpy(np.int64), num_buckets)
        return d

    regs_ds = bucket_exchange(
        adj.map_batches(init_regs, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["node", "idx"]),
    ).materialize()

    def sparse_est(t: int):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            r = g.drop(columns=["_part"])
            gb = r.groupby("node", sort=False)
            ssc = gb["reg"].apply(
                lambda s: int((np.int64(1) << (np.int64(HANF_RANK_CAP)
                                               - s.to_numpy(np.int64)))
                              .sum()))
            cnt = gb.size()
            hosts = ssc.index.to_numpy(np.int64)
            sscv = ssc.to_numpy(np.int64) \
                + (np.int64(m) - cnt.to_numpy(np.int64)) \
                * (np.int64(1) << np.int64(HANF_RANK_CAP))
            zeros = (np.int64(m) - cnt.to_numpy(np.int64))
            est = am2 / (sscv.astype(np.float64) / 9007199254740992.0)
            lin = (est <= 2.5 * m) & (zeros > 0)
            with np.errstate(divide="ignore"):
                est = np.where(
                    lin, np.float64(m) * np.log(
                        np.float64(m)
                        / np.where(zeros > 0, zeros, 1).astype(np.float64)),
                    est)
            return pd.DataFrame({"host": hosts,
                                 "round": np.full(len(hosts), t, np.int64),
                                 "nz": np.int64(m) - zeros,
                                 "ball": round_half_away(est, 1)})
        return fn

    def part_regs(bdf: pd.DataFrame) -> pd.DataFrame:
        o = bdf[["node", "idx", "reg"]].copy()
        o["_part"] = _bkt(o["node"].to_numpy(np.int64), num_buckets)
        return o

    def max_regs(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]) \
            .groupby(["node", "idx"], sort=False, as_index=False)["reg"].max()
        o["reg"] = o["reg"].astype(np.int64)
        return o

    out = bucket_exchange(regs_ds.map_batches(part_regs,
                                              batch_format="pandas"),
                          sparse_est(0))
    for t in range(1, rounds + 1):
        # adjacency ⋈ regs on u: tagged union (regs are multi-row per node)
        def tag_a(b: pd.DataFrame) -> pd.DataFrame:
            d = b[["v", "u"]].copy()
            d["idx"] = np.int64(0)
            d["reg"] = np.int64(0)
            d["_t"] = np.int8(0)
            d["_part"] = _bkt(d["u"].to_numpy(np.int64), num_buckets)
            return d

        def tag_r(b: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame({"v": np.zeros(len(b), np.int64),
                              "u": b["node"].to_numpy(np.int64),
                              "idx": b["idx"].to_numpy(np.int64),
                              "reg": b["reg"].to_numpy(np.int64)})
            d["_t"] = np.int8(1)
            d["_part"] = _bkt(d["u"].to_numpy(np.int64), num_buckets)
            return d

        def nbr_regs(g: pd.DataFrame) -> pd.DataFrame:
            e = g.loc[g["_t"] == 0, ["v", "u"]]
            r = g.loc[g["_t"] == 1, ["u", "idx", "reg"]]
            j = e.merge(r, on="u", how="inner")
            return pd.DataFrame({"node": j["v"].to_numpy(np.int64),
                                 "idx": j["idx"].to_numpy(np.int64),
                                 "reg": j["reg"].to_numpy(np.int64)})

        nbr = bucket_exchange(
            adj.map_batches(tag_a, batch_format="pandas").union(
                regs_ds.map_batches(tag_r, batch_format="pandas")),
            nbr_regs)
        regs_ds = bucket_exchange(
            nbr.union(regs_ds).map_batches(part_regs,
                                           batch_format="pandas"),
            max_regs).materialize()
        out = out.union(bucket_exchange(
            regs_ds.map_batches(part_regs, batch_format="pandas"),
            sparse_est(t)))
    return out


def _edge_weight(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic synthetic 'latency' per undirected edge (a < b):
    w = 1 + splitmix64(splitmix64(a) xor b) % 9 ∈ [1, 9] — a pure
    u64 chain both the engine and the SQL twin restate verbatim."""
    old = np.seterr(over="ignore")
    try:
        k = splitmix64(splitmix64(a.astype(np.uint64))
                       ^ b.astype(np.uint64))
    finally:
        np.seterr(**old)
    return (np.uint64(1) + k % np.uint64(9)).astype(np.int64)


def sssp_hosts(pages: ray.data.Dataset, rounds: int = 8,
               num_buckets: int = 64,
               local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Bounded-hop weighted single-source shortest paths over the
    undirected simple host graph (Bellman-Ford relaxation, the weighted
    sibling of bfs_depth_hosts): edge weights are the deterministic
    `_edge_weight` integers, source = MIN(host), and ``rounds`` fixed
    relaxation rounds compute the exact minimum cost over paths of at
    most ``rounds`` edges — a well-defined operator at any scale (the
    SQL twin unrolls the identical pure-integer recurrence). Nodes not
    reached within the hop bound report dist = -1.

    Scale shape per round: one union-tag bucketed join (dists ⋈
    weighted adjacency on u) + one destination-keyed min-combine —
    O(E) moved. Below ``local_bound`` pairs, the driver fast path runs
    the same recurrence on numpy arrays (dual-path parity pytest)."""
    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        z = np.maximum(s[keep], d[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["a", "b"]),
    ).materialize()

    if pairs.count() <= local_bound:
        p = pairs.to_pandas()
        a = p["a"].to_numpy(np.int64)
        b = p["b"].to_numpy(np.int64)
        w = _edge_weight(a, b)
        v = np.concatenate([a, b])
        u = np.concatenate([b, a])
        w2 = np.concatenate([w, w])
        nodes_arr, vi = np.unique(v, return_inverse=True)
        ui = np.searchsorted(nodes_arr, u)
        d = np.full(len(nodes_arr), BFS_INF, np.int64)
        d[0] = 0            # nodes_arr sorted → index 0 IS min(host)
        for _ in range(rounds):
            nd = d.copy()
            np.minimum.at(nd, vi, d[ui] + w2)
            d = nd
        return ray.data.from_pandas(pd.DataFrame(
            {"host": nodes_arr,
             "dist": np.where(d >= BFS_INF, np.int64(-1), d)}))

    def both_dirs(bdf: pd.DataFrame) -> pd.DataFrame:
        a = bdf["a"].to_numpy(np.int64)
        z = bdf["b"].to_numpy(np.int64)
        w = _edge_weight(a, z)
        d = pd.DataFrame({"v": np.concatenate([a, z]),
                          "u": np.concatenate([z, a]),
                          "w": np.concatenate([w, w])})
        d["_part"] = _bkt(d["v"].to_numpy(np.int64), num_buckets)
        return d

    adj = bucket_exchange(
        pairs.map_batches(both_dirs, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"])).materialize()

    def node_part(bdf: pd.DataFrame) -> pd.DataFrame:
        n = bdf[["v"]].drop_duplicates()
        return pd.DataFrame({"node": n["v"].to_numpy(np.int64),
                             "_part": _bkt(n["v"].to_numpy(np.int64),
                                           num_buckets)})

    nodes = bucket_exchange(
        adj.map_batches(node_part, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates("node"),
    ).materialize()
    src = nodes.min("node")

    def init_d(bdf: pd.DataFrame) -> pd.DataFrame:
        nd = bdf["node"].to_numpy(np.int64)
        return pd.DataFrame({"node": nd,
                             "q": np.where(nd == src, np.int64(0),
                                           BFS_INF)})

    d = nodes.map_batches(init_d, batch_format="pandas").materialize()

    def part_q(bdf: pd.DataFrame) -> pd.DataFrame:
        o = bdf[["node", "q"]].copy()
        o["_part"] = _bkt(o["node"].to_numpy(np.int64), num_buckets)
        return o

    def min_q(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]).groupby(
            "node", as_index=False)["q"].min()
        o["q"] = o["q"].astype(np.int64)
        return o

    for _ in range(rounds):
        withq = _attach_col(adj.select_columns(["v", "u", "w"]), d, "u",
                            "dq", num_buckets)

        def cand(bdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": bdf["v"].to_numpy(np.int64),
                "q": bdf["dq"].to_numpy(np.int64)
                + bdf["w"].to_numpy(np.int64)})

        d = bucket_exchange(
            withq.map_batches(cand, batch_format="pandas").union(d)
                 .map_batches(part_q, batch_format="pandas"),
            min_q).materialize()

    def finalize(bdf: pd.DataFrame) -> pd.DataFrame:
        q = bdf["q"].to_numpy(np.int64)
        return pd.DataFrame({"host": bdf["node"].to_numpy(np.int64),
                             "dist": np.where(q >= BFS_INF,
                                              np.int64(-1), q)})

    return d.map_batches(finalize, batch_format="pandas")


def single_linkage_hosts(pages: ray.data.Dataset,
                         levels: tuple[int, ...] = (1, 2, 3, 4),
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Single-linkage agglomerative clustering of the hash-weighted
    simple host graph, one row per (dendrogram level, host): by the
    Gower & Ross (1969) equivalence, the single-linkage clusters at
    height t are EXACTLY the connected components of the subgraph of
    edges with w <= t — so the whole dendrogram cut comes from one
    components pass per level, no O(n²) agglomeration and no explicit
    MST. Weights are sssp_hosts' deterministic ``_edge_weight`` u64
    chain (w ∈ [1, 9]); components are min-label, so cluster ids are
    bit-reproducible at any block structure.

    Scale shape: ONE undirected-dedup exchange builds the simple edge
    list with weights; per level, ``dedup.connected_components``
    (distributed min-label + pointer jumping, counted-bound driver fast
    path) labels the kept subgraph; a union-tag attach gives unlabeled
    hosts their own singleton id; ONE cluster-bucketed exchange emits
    per-host rows with cluster sizes (each cluster co-locates whole).

    Output: (level, host, cluster, cluster_size), cluster = min host in
    the cluster."""
    from .dedup import connected_components
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        z = np.maximum(s[keep], d[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    def wdedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).drop_duplicates(["a", "b"])
        g = g.copy()
        g["w"] = _edge_weight(g["a"].to_numpy(np.int64),
                              g["b"].to_numpy(np.int64))
        return g

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        wdedup).materialize()

    def nodes_part(b: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(np.concatenate([b["a"].to_numpy(np.int64),
                                      b["b"].to_numpy(np.int64)]))
        return pd.DataFrame({"node": h, "_part": _bkt(h, num_buckets)})

    nodes = bucket_exchange(
        pairs.map_batches(nodes_part, batch_format="pandas"),
        lambda g: pd.DataFrame({"node": np.unique(
            g["node"].to_numpy(np.int64))})).materialize()

    per_level: list[ray.data.Dataset] = []
    for t in levels:
        def kept(b: pd.DataFrame, _t: int = t) -> pd.DataFrame:
            k = b[b["w"].to_numpy(np.int64) <= _t]
            return pd.DataFrame({"id_a": k["a"].to_numpy(np.int64),
                                 "id_b": k["b"].to_numpy(np.int64)})

        labels = connected_components(
            pairs.map_batches(kept, batch_format="pandas"))

        def tag_n(b: pd.DataFrame) -> pd.DataFrame:
            n = b["node"].to_numpy(np.int64)
            return pd.DataFrame({
                "jk": n, "lab": np.zeros(len(n), np.int64),
                "t": np.int8(0), "_part": _bkt(n, num_buckets)})

        def tag_l(b: pd.DataFrame) -> pd.DataFrame:
            n = b["node"].to_numpy(np.int64)
            return pd.DataFrame({
                "jk": n, "lab": b["component_id"].to_numpy(np.int64),
                "t": np.int8(1), "_part": _bkt(n, num_buckets)})

        def attach(g: pd.DataFrame, _t: int = t) -> pd.DataFrame:
            base = g.loc[g["t"] == 0, ["jk"]]
            lk = g.loc[g["t"] == 1, ["jk", "lab"]].drop_duplicates("jk")
            m = base.merge(lk, on="jk", how="left")
            lab = m["lab"].to_numpy()
            node = m["jk"].to_numpy(np.int64)
            c = np.where(pd.isna(lab), node, lab).astype(np.int64)
            return pd.DataFrame({
                "level": np.full(len(node), _t, np.int64),
                "host": node, "cluster": c,
                "_part": _bkt(c, num_buckets)})

        per_level.append(bucket_exchange(
            nodes.map_batches(tag_n, batch_format="pandas").union(
                labels.map_batches(tag_l, batch_format="pandas")),
            attach))

    labeled = per_level[0]
    for p in per_level[1:]:
        labeled = labeled.union(p)

    def sizes(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        sz = g.groupby(["level", "cluster"], sort=False)["host"] \
            .transform("size")
        out = g.copy()
        out["cluster_size"] = sz.to_numpy(np.int64)
        return out

    return bucket_exchange(labeled, sizes)


def closeness_hosts(pages: ray.data.Dataset, k_sources: int = 4,
                    rounds: int = 8, num_buckets: int = 64,
                    local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Hop-bounded closeness centrality from ``k_sources`` pivot nodes
    over the undirected simple host graph — the landmark/pivot estimate
    (Eppstein & Wang 2004 shape) with DETERMINISTIC pivots: the k nodes
    with the smallest splitmix64(node) draw (ties → smaller node), so
    every retry/scale picks the same landmarks (the id-hash sampling
    rule, CLAUDE.md RNG class). For each pivot, a ``rounds``-bounded BFS
    (same bulk-synchronous min-plus recurrence as bfs_depth_hosts);
    closeness bookkeeping stays exact-integer: n_reached (within the hop
    bound, excluding self) and sum_depth per pivot.

    Scale shape per round: ONE union-tag bucketed join moves the k·|E|
    candidate rows (k is a small constant) + one (src, node)-keyed
    min-combine; the counted-bound fast path runs the identical
    recurrence on a k×n numpy matrix (dual-path parity pytest).
    → (source, n_reached, sum_depth)."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        z = np.maximum(s[keep], d[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["a", "b"]),
    ).materialize()

    def _pick_sources(nodes_arr: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            draw = splitmix64(nodes_arr.astype(np.uint64))
        finally:
            np.seterr(**old)
        order = np.lexsort((nodes_arr, draw))
        return nodes_arr[order[:k_sources]]

    if pairs.count() <= local_bound:
        p = pairs.to_pandas()
        a = p["a"].to_numpy(np.int64)
        b = p["b"].to_numpy(np.int64)
        v = np.concatenate([a, b])
        u = np.concatenate([b, a])
        nodes_arr, vi = np.unique(v, return_inverse=True)
        ui = np.searchsorted(nodes_arr, u)
        srcs = _pick_sources(nodes_arr)
        d = np.full((len(srcs), len(nodes_arr)), BFS_INF, np.int64)
        for si, s in enumerate(srcs):
            d[si, np.searchsorted(nodes_arr, s)] = 0
        for _ in range(rounds):
            nd = d.copy()
            for si in range(len(srcs)):
                np.minimum.at(nd[si], vi, d[si][ui] + 1)
            d = nd
        reached = (d < BFS_INF) & (d > 0)
        return ray.data.from_pandas(pd.DataFrame({
            "source": srcs.astype(np.int64),
            "n_reached": reached.sum(axis=1).astype(np.int64),
            "sum_depth": np.where(reached, d, 0).sum(axis=1)
            .astype(np.int64)}))

    def both_dirs(bdf: pd.DataFrame) -> pd.DataFrame:
        a = bdf["a"].to_numpy(np.int64)
        z = bdf["b"].to_numpy(np.int64)
        d = pd.DataFrame({"v": np.concatenate([a, z]),
                          "u": np.concatenate([z, a])})
        d["_part"] = _bkt(d["u"].to_numpy(np.int64), num_buckets)
        return d

    adj = edges.map_batches(undirect, batch_format="pandas") \
        .map_batches(both_dirs, batch_format="pandas").materialize()

    def node_part(bdf: pd.DataFrame) -> pd.DataFrame:
        n = bdf[["v"]].drop_duplicates()
        return pd.DataFrame({"node": n["v"].to_numpy(np.int64),
                             "_part": _bkt(n["v"].to_numpy(np.int64),
                                           num_buckets)})

    nodes = bucket_exchange(
        adj.map_batches(node_part, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates("node"),
    ).materialize()
    # global top-k draw = top-k of the union of per-bucket top-ks
    # (buckets partition nodes) — the driver merges <= buckets*k rows
    def bucket_srcs(g: pd.DataFrame) -> pd.DataFrame:
        arr = np.unique(g["node"].to_numpy(np.int64))
        return pd.DataFrame({"node": _pick_sources(arr)})

    cand_srcs = bucket_exchange(
        nodes.map_batches(
            lambda b: pd.DataFrame({
                "node": (nd := b["node"].to_numpy(np.int64)),
                "_part": _bkt(nd, num_buckets)}),
            batch_format="pandas"),
        bucket_srcs).to_pandas()
    srcs = _pick_sources(np.sort(cand_srcs["node"].to_numpy(np.int64)))

    def init_d(bdf: pd.DataFrame) -> pd.DataFrame:
        nd = bdf["node"].to_numpy(np.int64)
        frames = []
        for s in srcs:
            frames.append(pd.DataFrame({
                "src": np.full(len(nd), s, np.int64), "node": nd,
                "q": np.where(nd == s, np.int64(0), BFS_INF)}))
        return pd.concat(frames, ignore_index=True)

    d = nodes.map_batches(init_d, batch_format="pandas").materialize()

    def tag_adj(bdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "jk": bdf["u"].to_numpy(np.int64),
            "v": bdf["v"].to_numpy(np.int64),
            "src": np.zeros(len(bdf), np.int64),
            "q": np.zeros(len(bdf), np.int64), "t": np.int8(0),
            "_part": _bkt(bdf["u"].to_numpy(np.int64), num_buckets)})

    def tag_d(bdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "jk": bdf["node"].to_numpy(np.int64),
            "v": np.zeros(len(bdf), np.int64),
            "src": bdf["src"].to_numpy(np.int64),
            "q": bdf["q"].to_numpy(np.int64), "t": np.int8(1),
            "_part": _bkt(bdf["node"].to_numpy(np.int64), num_buckets)})

    def relax(g: pd.DataFrame) -> pd.DataFrame:
        e = g.loc[g["t"] == 0, ["jk", "v"]]
        dq = g.loc[g["t"] == 1, ["jk", "src", "q"]]
        m = e.merge(dq, on="jk", how="inner")
        return pd.DataFrame({"src": m["src"].to_numpy(np.int64),
                             "node": m["v"].to_numpy(np.int64),
                             "q": m["q"].to_numpy(np.int64) + 1})

    def part_q(bdf: pd.DataFrame) -> pd.DataFrame:
        o = bdf[["src", "node", "q"]].copy()
        o["_part"] = _bkt(o["node"].to_numpy(np.int64), num_buckets)
        return o

    def min_q(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]).groupby(
            ["src", "node"], as_index=False)["q"].min()
        o["q"] = o["q"].astype(np.int64)
        return o

    for _ in range(rounds):
        cand = bucket_exchange(
            adj.map_batches(tag_adj, batch_format="pandas").union(
                d.map_batches(tag_d, batch_format="pandas")), relax)
        d = bucket_exchange(
            cand.union(d).map_batches(part_q, batch_format="pandas"),
            min_q).materialize()

    def part_src(bdf: pd.DataFrame) -> pd.DataFrame:
        o = bdf.copy()
        o["_part"] = _bkt(o["src"].to_numpy(np.int64), num_buckets)
        return o

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        q = g["q"].to_numpy(np.int64)
        r = (q < BFS_INF) & (q > 0)
        agg = g.assign(r=r.astype(np.int64),
                       sd=np.where(r, q, 0)).groupby(
            "src", as_index=False).agg(n_reached=("r", "sum"),
                                       sum_depth=("sd", "sum"))
        return pd.DataFrame({
            "source": agg["src"].to_numpy(np.int64),
            "n_reached": agg["n_reached"].to_numpy(np.int64),
            "sum_depth": agg["sum_depth"].to_numpy(np.int64)})

    return bucket_exchange(
        d.map_batches(part_src, batch_format="pandas"), finalize)


def betweenness_hosts(pages: ray.data.Dataset, k_pivots: int = 4,
                      rounds: int = 4, num_buckets: int = 64,
                      local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Pivot-pair betweenness over the undirected simple host graph: the
    Brandes (2001) forward pass (hop-bounded BFS distances d plus exact
    shortest-path counts sigma per pivot), then — instead of the float
    delta back-propagation, whose ratio sums are not cross-engine
    bit-stable — the EXACT integer pair dependency restricted to pivot
    pairs (Eppstein-Wang-style sampling): node v lies on a shortest
    s-t path iff d_sv + d_tv = d_st, and the number of shortest s-t
    paths through v is sigma_sv * sigma_tv (undirected sigma symmetry).
    Pivots are the k smallest splitmix64 draws (deterministic, id-hash
    sampling rule). Output: one row per (pivot pair, on-path node) with
    the exact path-count product, plus one endpoint row per connected
    pair carrying sigma_st itself (is_end = 1) — all exact int64 (sigma
    is hop-bounded: sigma <= max_deg^rounds; the engine asserts the
    product stays inside int64 so an overflow is loud, never silent).

    Scale shape: per BFS round one frontier->candidate bucketed join plus
    one (src, node) sum-combine (frontier rows only — sigma sums must not
    double-count, so relaxation is frontier-based, not the idempotent
    full-state min-plus closeness uses); the counted-bound fast path runs
    the identical recurrence on k x n numpy rows (dual-path parity
    pytest)."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        z = np.maximum(s[keep], d[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["a", "b"]),
    ).materialize()

    def _pick_sources(nodes_arr: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            draw = splitmix64(nodes_arr.astype(np.uint64))
        finally:
            np.seterr(**old)
        order = np.lexsort((nodes_arr, draw))
        return nodes_arr[order[:k_pivots]]

    def _pair_stats(nodes_arr: np.ndarray, D: np.ndarray, S: np.ndarray,
                    srcs: np.ndarray) -> pd.DataFrame:
        rows = {"s1": [], "s2": [], "node": [], "pt": [], "is_end": []}
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                tpos = np.searchsorted(nodes_arr, srcs[j])
                dst = D[i][tpos]
                if dst >= BFS_INF:
                    continue
                # endpoint row: sigma_st = the exact shortest s-t path count
                rows["s1"].append(np.array([srcs[i]], np.int64))
                rows["s2"].append(np.array([srcs[j]], np.int64))
                rows["node"].append(np.array([srcs[j]], np.int64))
                rows["pt"].append(np.array([S[i][tpos]], np.int64))
                rows["is_end"].append(np.array([1], np.int64))
                on = (D[i] + D[j] == dst) \
                    & (nodes_arr != srcs[i]) & (nodes_arr != srcs[j])
                if on.any():
                    prod = S[i][on].astype(object) * S[j][on].astype(object)
                    assert max(prod) < (1 << 62), "sigma product overflow"
                k = int(on.sum())
                rows["s1"].append(np.full(k, srcs[i], np.int64))
                rows["s2"].append(np.full(k, srcs[j], np.int64))
                rows["node"].append(nodes_arr[on].astype(np.int64))
                rows["pt"].append(S[i][on] * S[j][on])
                rows["is_end"].append(np.zeros(k, np.int64))
        return pd.DataFrame({c: np.concatenate(v) if v else
                             pd.Series([], dtype=np.int64)
                             for c, v in rows.items()})

    if pairs.count() <= local_bound:
        p = pairs.to_pandas()
        a = p["a"].to_numpy(np.int64)
        b = p["b"].to_numpy(np.int64)
        v = np.concatenate([a, b])       # receiver
        u = np.concatenate([b, a])       # sender
        nodes_arr, vi = np.unique(v, return_inverse=True)
        ui = np.searchsorted(nodes_arr, u)
        # pair rows are canonicalized s1 < s2: selection is by draw,
        # iteration order by node id (matches the SQL twin's b.s > a.s)
        srcs = np.sort(_pick_sources(nodes_arr))
        n = len(nodes_arr)
        D = np.full((len(srcs), n), BFS_INF, np.int64)
        S = np.zeros((len(srcs), n), np.int64)
        for si, s in enumerate(srcs):
            pos = np.searchsorted(nodes_arr, s)
            D[si, pos] = 0
            S[si, pos] = 1
        for level in range(1, rounds + 1):
            for si in range(len(srcs)):
                mask_e = D[si][ui] == level - 1
                contrib = np.zeros(n, np.int64)
                np.add.at(contrib, vi[mask_e], S[si][ui[mask_e]])
                newly = (D[si] == BFS_INF) & (contrib > 0)
                D[si][newly] = level
                S[si][newly] = contrib[newly]
        return ray.data.from_pandas(_pair_stats(nodes_arr, D, S, srcs))

    # ---------------- distributed path ----------------
    def both_dirs(bdf: pd.DataFrame) -> pd.DataFrame:
        a = bdf["a"].to_numpy(np.int64)
        z = bdf["b"].to_numpy(np.int64)
        d = pd.DataFrame({"v": np.concatenate([a, z]),
                          "u": np.concatenate([z, a])})
        d["_part"] = _bkt(d["u"].to_numpy(np.int64), num_buckets)
        return d

    adj = pairs.map_batches(both_dirs, batch_format="pandas").materialize()

    def bucket_srcs(g: pd.DataFrame) -> pd.DataFrame:
        arr = np.unique(g["u"].to_numpy(np.int64))
        return pd.DataFrame({"node": _pick_sources(arr)})

    cand_srcs = bucket_exchange(adj, bucket_srcs).to_pandas()
    srcs = np.sort(_pick_sources(np.sort(np.unique(
        cand_srcs["node"].to_numpy(np.int64)))))

    state = pd.DataFrame({"src": srcs.astype(np.int64),
                          "node": srcs.astype(np.int64),
                          "q": np.zeros(len(srcs), np.int64),
                          "sig": np.ones(len(srcs), np.int64)})
    state_ds = ray.data.from_pandas(state).materialize()

    for level in range(1, rounds + 1):
        def tag_adj(bdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "jk": bdf["u"].to_numpy(np.int64),
                "v": bdf["v"].to_numpy(np.int64),
                "src": np.zeros(len(bdf), np.int64),
                "sig": np.zeros(len(bdf), np.int64), "t": np.int8(0),
                "_part": _bkt(bdf["u"].to_numpy(np.int64), num_buckets)})

        def tag_front(bdf: pd.DataFrame, lv=level) -> pd.DataFrame:
            f = bdf[bdf["q"].to_numpy(np.int64) == lv - 1]
            return pd.DataFrame({
                "jk": f["node"].to_numpy(np.int64),
                "v": np.zeros(len(f), np.int64),
                "src": f["src"].to_numpy(np.int64),
                "sig": f["sig"].to_numpy(np.int64), "t": np.int8(1),
                "_part": _bkt(f["node"].to_numpy(np.int64), num_buckets)})

        def relax(g: pd.DataFrame) -> pd.DataFrame:
            e = g.loc[g["t"] == 0, ["jk", "v"]]
            fr = g.loc[g["t"] == 1, ["jk", "src", "sig"]]
            m = e.merge(fr, on="jk", how="inner")
            o = m.groupby(["src", "v"], as_index=False)["sig"].sum()
            out = pd.DataFrame({
                "src": o["src"].to_numpy(np.int64),
                "node": o["v"].to_numpy(np.int64),
                "sig": o["sig"].to_numpy(np.int64)})
            out["_part"] = _bkt(
                out["src"].to_numpy(np.int64)
                ^ out["node"].to_numpy(np.int64), num_buckets)
            return out

        cand = bucket_exchange(
            adj.map_batches(tag_adj, batch_format="pandas").union(
                state_ds.map_batches(tag_front, batch_format="pandas")),
            relax)

        def tag_state(bdf: pd.DataFrame) -> pd.DataFrame:
            o = bdf[["src", "node", "q", "sig"]].copy()
            o["t"] = np.int8(1)
            o["_part"] = _bkt(o["src"].to_numpy(np.int64)
                              ^ o["node"].to_numpy(np.int64), num_buckets)
            return o

        def tag_cand(bdf: pd.DataFrame, lv=level) -> pd.DataFrame:
            # partial per-bucket sums from relax may repeat (src, node)
            # only across buckets keyed identically — same bucket, so one
            # groupby-sum here finishes the sigma sum exactly
            o = bdf.groupby(["src", "node"], as_index=False)["sig"].sum()
            o["q"] = np.int64(lv)
            o["t"] = np.int8(0)
            o["_part"] = _bkt(o["src"].to_numpy(np.int64)
                              ^ o["node"].to_numpy(np.int64), num_buckets)
            return o[["src", "node", "q", "sig", "t", "_part"]]

        def merge_state(g: pd.DataFrame) -> pd.DataFrame:
            old = g.loc[g["t"] == 1, ["src", "node", "q", "sig"]]
            new = g.loc[g["t"] == 0, ["src", "node", "q", "sig"]]
            if len(new):
                new = new.groupby(["src", "node"], as_index=False) \
                    .agg(q=("q", "min"), sig=("sig", "sum"))
                mk = new.merge(old[["src", "node"]].assign(_hit=1),
                               on=["src", "node"], how="left")
                fresh = mk.loc[mk["_hit"].isna(),
                               ["src", "node", "q", "sig"]]
                out = pd.concat([old, fresh], ignore_index=True)
            else:
                out = old.copy()
            for c in out.columns:
                out[c] = out[c].astype(np.int64)
            return out

        state_ds = bucket_exchange(
            state_ds.map_batches(tag_state, batch_format="pandas").union(
                cand.map_batches(tag_cand, batch_format="pandas")),
            merge_state).materialize()

    # pivot-to-pivot distances + endpoint sigmas: structurally <= k^2 rows
    dmat = state_ds.map_batches(
        lambda b: b[b["node"].isin(srcs)], batch_format="pandas") \
        .to_pandas()
    dst_of = {(int(r["src"]), int(r["node"])): (int(r["q"]), int(r["sig"]))
              for _, r in dmat.iterrows()}

    end_rows = {"s1": [], "s2": [], "node": [], "pt": [], "is_end": []}
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            si, sj = int(srcs[i]), int(srcs[j])
            if (si, sj) in dst_of:
                end_rows["s1"].append(si)
                end_rows["s2"].append(sj)
                end_rows["node"].append(sj)
                end_rows["pt"].append(dst_of[(si, sj)][1])
                end_rows["is_end"].append(1)
    ends = pd.DataFrame(end_rows)
    for c in ends.columns:
        ends[c] = ends[c].astype(np.int64)

    def node_stats(g: pd.DataFrame) -> pd.DataFrame:
        w_q = g.pivot_table(index="node", columns="src", values="q",
                            aggfunc="min", fill_value=int(BFS_INF))
        w_s = g.pivot_table(index="node", columns="src", values="sig",
                            aggfunc="sum", fill_value=0)
        nd = w_q.index.to_numpy(np.int64)
        rows = {"s1": [], "s2": [], "node": [], "pt": [], "is_end": []}
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                si, sj = int(srcs[i]), int(srcs[j])
                if (si, sj) not in dst_of or si not in w_q.columns \
                        or sj not in w_q.columns:
                    continue
                dst = dst_of[(si, sj)][0]
                on = (w_q[si].to_numpy(np.int64)
                      + w_q[sj].to_numpy(np.int64) == dst) \
                    & (nd != si) & (nd != sj)
                k = int(on.sum())
                rows["s1"].append(np.full(k, si, np.int64))
                rows["s2"].append(np.full(k, sj, np.int64))
                rows["node"].append(nd[on])
                rows["pt"].append(w_s[si].to_numpy(np.int64)[on]
                                  * w_s[sj].to_numpy(np.int64)[on])
                rows["is_end"].append(np.zeros(k, np.int64))
        return pd.DataFrame({c: np.concatenate(v) if v else
                             pd.Series([], dtype=np.int64)
                             for c, v in rows.items()})

    def part_node(bdf: pd.DataFrame) -> pd.DataFrame:
        o = bdf[["src", "node", "q", "sig"]].copy()
        o["_part"] = _bkt(o["node"].to_numpy(np.int64), num_buckets)
        return o

    mids = bucket_exchange(
        state_ds.map_batches(part_node, batch_format="pandas"), node_stats)
    return mids.union(ray.data.from_pandas(ends))


def assortativity_hosts(pages: ray.data.Dataset,
                        num_buckets: int = 64) -> ray.data.Dataset:
    """Degree-assortativity sufficient statistics (Newman 2002 — does
    the host graph wire hubs to hubs?): over the DIRECTED expansion of
    the undirected simple edge set, r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2)
    with x, y the endpoint degrees; every term is an exact int64, so
    the output carries (m2, sx, sxx, sxy, num, den) and r is the exact
    rational num/den. Degrees broadcast as one ray.put array — the host
    id domain is bounded by construction (N_HOST_MOD), so the lookup is
    O(1) memory per worker, never a shuffle."""
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        z = np.maximum(s[keep], d[keep])
        u = pd.DataFrame({"a": a, "b": z}).drop_duplicates()
        u["_part"] = _bkt(u["a"].to_numpy(np.int64), num_buckets)
        return u

    pairs = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(["a", "b"]),
    ).materialize()

    def deg_part(b: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([b["a"].to_numpy(np.int64),
                            b["b"].to_numpy(np.int64)])
        d = np.bincount(v, minlength=N_HOST_MOD).astype(np.int64)
        return pd.DataFrame({"h": np.arange(N_HOST_MOD, dtype=np.int64),
                             "d": d})

    deg = np.zeros(N_HOST_MOD, np.int64)
    for bt in pairs.map_batches(deg_part, batch_format="pandas") \
            .iter_batches(batch_format="pandas", batch_size=None):
        np.add.at(deg, bt["h"].to_numpy(np.int64),
                  bt["d"].to_numpy(np.int64))
    dref = ray.put(deg)

    def sums(b: pd.DataFrame) -> pd.DataFrame:
        dg = ray.get(dref)
        x = dg[b["a"].to_numpy(np.int64)]
        y = dg[b["b"].to_numpy(np.int64)]
        # directed expansion: each undirected edge contributes (x,y)+(y,x)
        return pd.DataFrame({
            "m2": np.array([2 * len(b)], np.int64),
            "sx": np.array([int((x + y).sum())], np.int64),
            "sxx": np.array([int((x * x + y * y).sum())], np.int64),
            "sxy": np.array([int(2 * (x * y).sum())], np.int64)})

    s = pairs.map_batches(sums, batch_format="pandas").to_pandas().sum()
    m2, sx, sxx, sxy = (int(s["m2"]), int(s["sx"]), int(s["sxx"]),
                        int(s["sxy"]))
    out = pd.DataFrame({
        "m2": [m2], "sx": [sx], "sxx": [sxx], "sxy": [sxy],
        "num": [m2 * sxy - sx * sx], "den": [m2 * sxx - sx * sx]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def _jp_mex(node: np.ndarray, color: np.ndarray, sel_nodes: np.ndarray) -> np.ndarray:
    """Vectorized mex (minimum excludant) per selected node over its
    colored-neighbor color multiset: sort (node, color) unique pairs and
    find the first position where color != cumcount. Nodes absent from
    the pair list get mex 0."""
    if len(sel_nodes) == 0:
        return np.zeros(0, np.int64)
    d = pd.DataFrame({"n": node, "c": color}).drop_duplicates()
    d = d.sort_values(["n", "c"], kind="mergesort")
    n = d["n"].to_numpy(np.int64)
    c = d["c"].to_numpy(np.int64)
    pos = np.arange(len(n)) - np.searchsorted(n, n, side="left")
    gap = c != pos
    mex_map: dict[int, int] = {}
    # first gap per node, else count
    for nd, cnt in zip(*np.unique(n, return_counts=True)):
        mex_map[int(nd)] = int(cnt)
    gn = n[gap]
    gp = pos[gap]
    if len(gn):
        # first gap position per node (n sorted, stable)
        first = np.r_[True, gn[1:] != gn[:-1]]
        for nd, p in zip(gn[first], gp[first]):
            mex_map[int(nd)] = int(p)
    return np.array([mex_map.get(int(s), 0) for s in sel_nodes], np.int64)


def speculative_coloring_hosts(pages: ray.data.Dataset, num_buckets: int = 64,
                               max_rounds: int = 64,
                               local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Greedy distance-1 graph coloring by synchronous SPECULATIVE
    coloring with deterministic conflict resolution (Gebremedhin & Manne
    2000, with Jones–Plassmann 1993 hash priorities): each round every
    uncolored node tentatively picks the mex of its COLORED neighbors'
    colors (start-of-round snapshot), then commits unless an adjacent
    uncolored node picked the SAME color with higher splitmix64(node)
    priority (a bijection — priorities are distinct, so the schedule and
    the final coloring are fully deterministic at any cluster layout).

    Pure Jones–Plassmann (commit only at local priority maxima) needs
    ~degree·ln n rounds on dense graphs — measured 200+ on the sf0.1
    host graph (avg degree ~39) — while speculative commit colors
    everything in ~15–20 rounds there (conflicts only among SAME-color
    picks), keeping the unrolled SQL twin tractable. The engine iterates
    to convergence and fails loud at ``max_rounds``.

    Scale shape per round (above ``local_bound`` undirected edges): one
    union-tag exchange ships (neighbor color, neighbor tentative,
    neighbor priority) along the directed edge list, one node-keyed
    exchange computes mex + conflict per node bucket — O(E) slim rows,
    the label_prop round shape. Below the bound the identical rounds run
    on driver arrays (dual-path bit-parity pytest)."""
    from .exchange import bucket_exchange

    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        df = pd.DataFrame({"u": np.minimum(s, d), "v": np.maximum(s, d)})
        df = df[df["u"] != df["v"]].drop_duplicates()
        df["_part"] = _bkt(df["u"].to_numpy(np.int64) * np.int64(1000003)
                           + df["v"].to_numpy(np.int64), num_buckets)
        return df

    ue = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(),
    ).materialize()
    ed = edges.select_columns(["src", "dst"])

    # the host graph has ≤ N_HOST_MOD nodes → ≤ N_HOST_MOD²/2 undirected
    # edges (499,500 < local_bound): the counted local path ALWAYS
    # applies. A larger node domain would use the label_prop_hosts
    # per-round exchange shape; the bound check keeps the claim honest.
    n_ue = ue.count()
    if n_ue > local_bound:
        raise ValueError(
            f"{n_ue} undirected edges exceeds local_bound={local_bound}: "
            "this path is counted-bounded by the N_HOST_MOD node domain")
    e = ue.to_pandas()

    edp = ed.to_pandas()
    nodes_arr = np.unique(np.concatenate(
        [edp["src"].to_numpy(np.int64), edp["dst"].to_numpy(np.int64)]))
    u = e["u"].to_numpy(np.int64)
    v = e["v"].to_numpy(np.int64)
    nbr = np.concatenate([u, v])
    node = np.concatenate([v, u])
    old = np.seterr(over="ignore")
    try:
        pri = splitmix64(nodes_arr.astype(np.uint64))
    finally:
        np.seterr(**old)
    pos_of = {int(n): i for i, n in enumerate(nodes_arr)}
    node_i = np.array([pos_of[int(x)] for x in node], np.int64)
    nbr_i = np.array([pos_of[int(x)] for x in nbr], np.int64)
    color = np.full(len(nodes_arr), -1, np.int64)
    for _ in range(max_rounds):
        unc = color < 0
        if not unc.any():
            break
        # tentative mex of COLORED neighbors for every uncolored node
        has_c = color[nbr_i] >= 0
        tent = np.full(len(nodes_arr), -1, np.int64)
        unc_nodes = nodes_arr[unc]
        mex = _jp_mex(node[has_c], color[nbr_i[has_c]], unc_nodes)
        tent[unc] = mex
        # conflict: an uncolored neighbor with the same tentative color
        # and higher priority blocks the commit
        both_unc = unc[node_i] & unc[nbr_i]
        same = both_unc & (tent[node_i] == tent[nbr_i])
        blocked_edges = same & (pri[nbr_i] > pri[node_i])
        blocked = np.zeros(len(nodes_arr), bool)
        blocked[node_i[blocked_edges]] = True
        commit = unc & ~blocked
        color[commit] = tent[commit]
    else:
        raise RuntimeError(
            f"speculative coloring did not converge in {max_rounds} rounds")
    return ray.data.from_pandas(pd.DataFrame({
        "host": nodes_arr, "color": color}))


def ppr_hosts(pages: ray.data.Dataset, iters: int = 8, seed_mod: int = 25,
              num_buckets: int = 64,
              local_bound: int = 2_000_000) -> ray.data.Dataset:
    """Personalized PageRank (topic-sensitive: Haveliwala 2002): the
    pagerank_hosts fixed-point with teleport mass and initial
    distribution concentrated on the closed-form seed set
    {host % seed_mod == 0} — the corpus-curation shape (rank hosts by
    proximity to a trusted seed list). Same Q30 integer recurrence, same
    2-exchange round shape, seed membership computed in place (never a
    broadcast seed table)."""
    return pagerank_hosts(pages, iters=iters, num_buckets=num_buckets,
                          local_bound=local_bound, seed_mod=seed_mod)


def percolation_curve_hosts(pages: ray.data.Dataset,
                            thresholds: tuple[int, ...] = (1, 2, 3, 5, 8, 13, 21),
                            num_buckets: int = 64) -> ray.data.Dataset:
    """Bond-percolation connectivity curve (component count vs edge-weight
    threshold — the cluster-merging profile a similarity-threshold sweep
    reads before picking a dedup cutoff): because the minimum spanning
    FOREST is unique under the (w, u, v) total order, Kruskal's invariant
    gives components(t) = n_nodes − |{forest edges with w ≤ t}| EXACTLY —
    the whole curve costs one MSF (already distributed, mst_hosts) plus a
    counted threshold scan over its ≤ n−1 edges; no per-threshold
    connectivity pass. All outputs exact ints."""
    edges = host_edges(pages, num_buckets)

    def nodes_of(b: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(np.concatenate([b["src"].to_numpy(np.int64),
                                      b["dst"].to_numpy(np.int64)]))
        return pd.DataFrame({"node": h})

    n_nodes = int(edges.map_batches(nodes_of, batch_format="pandas")
                  .to_pandas()["node"].nunique())
    forest = mst_hosts(pages, num_buckets=num_buckets).to_pandas()  # ≤ n−1 rows
    w = forest["w"].to_numpy(np.int64)
    rows = [{"threshold": np.int64(t),
             "mst_edges_le": np.int64((w <= t).sum()),
             "n_components": np.int64(n_nodes - int((w <= t).sum()))}
            for t in thresholds]
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def ktruss_hosts(pages: ray.data.Dataset, ks: tuple[int, ...] = (3, 4),
                 max_rounds: int = 32, num_buckets: int = 64,
                 local_bound: int = 2_000_000) -> ray.data.Dataset:
    """k-truss decomposition (Cohen 2008 — the community-core family's
    edge-wise sibling of k-core): iteratively delete edges supported by
    fewer than k−2 triangles until stable; the surviving edge set is the
    k-truss. Deterministic (simultaneous deletion each round — no order
    dependence), measured convergence 2/2/2 rounds for k=3 and 3/3/9 for
    k=4 across the three scales (the SQL twin unrolls 12 with margin;
    the engine iterates to convergence, loud at ``max_rounds``).

    The host graph is bounded by N_HOST_MOD (≤ ~500k undirected edges),
    so the counted local path applies (speculative_coloring_hosts'
    argument); per round the support computation is the degree-oriented
    wedge join the triangle stage uses. Output: (k, u, v) surviving
    edges per requested k."""
    edges = host_edges(pages, num_buckets)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        df = pd.DataFrame({"u": np.minimum(s, d), "v": np.maximum(s, d)})
        df = df[df["u"] != df["v"]].drop_duplicates()
        df["_part"] = _bkt(df["u"].to_numpy(np.int64) * np.int64(1000003)
                           + df["v"].to_numpy(np.int64), num_buckets)
        return df

    ue = bucket_exchange(
        edges.map_batches(undirect, batch_format="pandas"),
        lambda g: g.drop(columns=["_part"]).drop_duplicates(),
    ).materialize()
    n_ue = ue.count()
    if n_ue > local_bound:
        raise ValueError(
            f"{n_ue} undirected edges exceeds local_bound={local_bound}: "
            "counted path is bounded by the N_HOST_MOD node domain")
    base = ue.to_pandas()

    def support(E: pd.DataFrame) -> np.ndarray:
        # common-neighbor count per edge via a directed wedge merge
        dirs = pd.concat([
            E.rename(columns={"u": "a", "v": "b"}),
            E.rename(columns={"u": "b", "v": "a"})[["a", "b"]]],
            ignore_index=True)
        # wedge: edge (u,v); neighbor w of u with (min(v,w),max(v,w)) ∈ E
        m = E.merge(dirs, left_on="u", right_on="a")[["u", "v", "b"]]
        m = m[m["b"] != m["v"]]
        mu = np.minimum(m["v"].to_numpy(np.int64), m["b"].to_numpy(np.int64))
        mv = np.maximum(m["v"].to_numpy(np.int64), m["b"].to_numpy(np.int64))
        probe = pd.DataFrame({"u": m["u"].to_numpy(np.int64),
                              "v": m["v"].to_numpy(np.int64),
                              "wu": mu, "wv": mv})
        eset = E.rename(columns={"u": "wu", "v": "wv"})
        eset = eset.assign(_hit=1)
        hit = probe.merge(eset, on=["wu", "wv"], how="inner")
        c = hit.groupby(["u", "v"], sort=False).size()
        key = pd.MultiIndex.from_arrays([E["u"], E["v"]])
        return c.reindex(key).fillna(0).to_numpy(np.int64)

    frames = []
    for k in ks:
        E = base.copy()
        for _ in range(max_rounds):
            if len(E) == 0:
                break
            sup = support(E)
            keep = sup >= (k - 2)
            if keep.all():
                break
            E = E[keep].reset_index(drop=True)
        else:
            raise RuntimeError(f"k-truss (k={k}) did not converge in {max_rounds} rounds")
        frames.append(pd.DataFrame({"k": np.full(len(E), k, np.int64),
                                    "u": E["u"].to_numpy(np.int64),
                                    "v": E["v"].to_numpy(np.int64)}))
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        {"k": pd.Series([], dtype=np.int64), "u": pd.Series([], dtype=np.int64),
         "v": pd.Series([], dtype=np.int64)})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)
