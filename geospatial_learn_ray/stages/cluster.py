"""Distributed grid-DBSCAN over point sets.

DBSCAN (Ester et al. 1996) with the grid method: cells of side ``eps``
confine every eps-neighborhood to the 3×3 cell block around a point, so
neighbor counting and edge generation are per-cell local after ONE
bounded 9× replication of slim (id, x, y) rows — the classic
MR-DBSCAN / GridDBSCAN partitioning (He et al. 2011). No reference
analogue (geospatial-learn clusters rasters, not point sets); this is
the point-set counterpart of its segmentation family and the natural
companion of the hot-city-skewed geocoder (dense city blobs cluster,
the uniform background is noise).

Determinism (cluster-structure-invariant, unlike scan-order DBSCAN):
- core test: |N_eps(p)| ≥ min_pts, the count INCLUDING p itself
  (scikit-learn's convention);
- cluster ids: the component's MINIMUM core point id (min-label
  connected components over core-core eps-edges);
- border points attach to the component of the MIN-id core within eps
  (classic DBSCAN assigns to the first-discovered core — scan-order
  dependent; the min-id rule is the deterministic, partition-invariant
  choice and is documented as a deviation);
- noise: non-core with no core within eps → cluster_id = -1.

Scale shape: replication is 9× on 28-byte rows; per-cell work is a
chunked vectorized distance block (bounded memory at any cell
density); core-core edges of a dense blob are pruned map-side by the
``min_pts`` test before the component exchange; components run through
``dedup.connected_components`` (counted driver bound, else distributed
min-label with pointer jumping). A pathologically dense single cell
(≫10⁶ points) would need cell subdivision + per-cell salting — the
same mitigation as tile_agg's hot cells; documented, not needed at
city-blob densities.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import splitmix64
from .dedup import connected_components
from .exchange import bucket_exchange

_NBR = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _hash_bkt(v: np.ndarray, num_buckets: int) -> np.ndarray:
    old = np.seterr(over="ignore")
    try:
        return (splitmix64(v.astype(np.uint64))
                % np.uint64(num_buckets)).astype(np.int32)
    finally:
        np.seterr(**old)


def grid_dbscan(pts: ray.data.Dataset, id_col: str = "pid",
                x_col: str = "x", y_col: str = "y",
                eps: float = 0.002, min_pts: int = 10,
                num_buckets: int = 64) -> ray.data.Dataset:
    """(pid, x, y) points → (pid, n_nbrs, is_core, cluster_id)."""
    eps2 = eps * eps
    shift = np.int64(1 << 32)

    def _cells(x: np.ndarray, y: np.ndarray):
        return (np.floor(x / eps).astype(np.int64),
                np.floor(y / eps).astype(np.int64))

    def _replicate(b: pd.DataFrame, extra: list[str]) -> pd.DataFrame:
        x = b[x_col].to_numpy(np.float64)
        y = b[y_col].to_numpy(np.float64)
        cx, cy = _cells(x, y)
        cols = {id_col: b[id_col].to_numpy(np.int64), x_col: x, y_col: y}
        for c in extra:
            cols[c] = b[c].to_numpy(np.int64)
        frames = []
        for dx, dy in _NBR:
            f = pd.DataFrame(cols)
            f["ck"] = (cx + dx) * shift + (cy + dy)
            f["home"] = np.int8(1 if (dx == 0 and dy == 0) else 0)
            frames.append(f)
        d = pd.concat(frames, ignore_index=True)
        d["_bkt"] = _hash_bkt(d["ck"].to_numpy(np.int64), num_buckets)
        return d

    # --- pass 1: neighbor counts (core test) -------------------------------
    def count_nbrs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("ck", sort=False):
            home = grp[grp["home"] == 1]
            if not len(home):
                continue
            hx = home[x_col].to_numpy()
            hy = home[y_col].to_numpy()
            ax = grp[x_col].to_numpy()
            ay = grp[y_col].to_numpy()
            n = np.zeros(len(home), np.int64)
            for s in range(0, len(home), 512):  # bounded distance blocks
                d2 = ((hx[s:s + 512, None] - ax[None, :]) ** 2
                      + (hy[s:s + 512, None] - ay[None, :]) ** 2)
                n[s:s + 512] = (d2 <= eps2).sum(axis=1)
            outs.append(pd.DataFrame({
                id_col: home[id_col].to_numpy(np.int64),
                x_col: hx, y_col: hy, "n_nbrs": n}))
        if not outs:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 x_col: pd.Series([], dtype=np.float64),
                                 y_col: pd.Series([], dtype=np.float64),
                                 "n_nbrs": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    counts = bucket_exchange(
        pts.map_batches(lambda b: _replicate(b, []), batch_format="pandas"),
        count_nbrs, key="_bkt").materialize()

    # --- pass 2: core-core edges + border→min-core refs --------------------
    def add_core(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["is_core"] = (b["n_nbrs"].to_numpy(np.int64)
                        >= min_pts).astype(np.int64)
        return b

    flagged = counts.map_batches(add_core, batch_format="pandas")

    def edges_and_refs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("ck", sort=False):
            home = grp[grp["home"] == 1]
            if not len(home):
                continue
            cores = grp[grp["is_core"] == 1]
            cid = cores[id_col].to_numpy(np.int64)
            cx = cores[x_col].to_numpy()
            cy = cores[y_col].to_numpy()
            hid = home[id_col].to_numpy(np.int64)
            hx = home[x_col].to_numpy()
            hy = home[y_col].to_numpy()
            hcore = home["is_core"].to_numpy(np.int64) == 1
            for s in range(0, len(home), 512):
                d2 = ((hx[s:s + 512, None] - cx[None, :]) ** 2
                      + (hy[s:s + 512, None] - cy[None, :]) ** 2)
                near = d2 <= eps2
                # core-core edges, deduped by u < v (each pair appears in
                # both homes; one survives)
                hc = hcore[s:s + 512]
                ii, jj = np.nonzero(near[hc])
                u = hid[s:s + 512][hc][ii]
                v = cid[jj]
                keep = u < v
                if keep.any():
                    outs.append(pd.DataFrame({
                        "t": np.int8(0), "id_a": u[keep], "id_b": v[keep]}))
                # border refs: min core id within eps of a non-core home
                nb = near[~hc]
                if nb.size and nb.any():
                    bid = hid[s:s + 512][~hc]
                    big = np.iinfo(np.int64).max
                    ref = np.where(nb, cid[None, :], big).min(axis=1)
                    has = ref != big
                    if has.any():
                        outs.append(pd.DataFrame({
                            "t": np.int8(1), "id_a": bid[has],
                            "id_b": ref[has]}))
        if not outs:
            return pd.DataFrame({"t": pd.Series([], dtype=np.int8),
                                 "id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        out = pd.concat(outs, ignore_index=True)
        # a border's 9 cells may each emit a partial min → reduce here
        eb = out[out["t"] == 1]
        if len(eb):
            eb = eb.groupby("id_a", sort=False, as_index=False).min()
            out = pd.concat([out[out["t"] == 0], eb], ignore_index=True)
        return out

    er = bucket_exchange(
        flagged.map_batches(lambda b: _replicate(b, ["n_nbrs", "is_core"]),
                            batch_format="pandas"),
        edges_and_refs, key="_bkt").materialize()

    edges = er.map_batches(
        lambda b: b.loc[b["t"] == 0, ["id_a", "id_b"]],
        batch_format="pandas")
    labels = connected_components(edges, num_buckets=num_buckets)

    # --- resolve border refs through the component labels ------------------
    def tag(df_t: int, a: str, b: str):
        def fn(f: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame({"k": f[a].to_numpy(np.int64),
                              "v": f[b].to_numpy(np.int64),
                              "tt": np.int8(df_t)})
            d["_bkt"] = _hash_bkt(d["k"].to_numpy(np.int64), num_buckets)
            return d
        return fn

    borders = er.map_batches(lambda b: b[b["t"] == 1],
                             batch_format="pandas")
    # bucket by core id: label rows (k=node, v=comp) + ref rows (k=core,
    # v=border pid); unlabeled cores (isolated) default to themselves
    u1 = labels.map_batches(tag(0, "node", "component_id"),
                            batch_format="pandas").union(
        borders.map_batches(tag(1, "id_b", "id_a"), batch_format="pandas"))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # nullable Int64 end-to-end: a float64 detour would round 2^63-size
        # hash labels together (CLAUDE.md round-3 outer-join gotcha)
        lab = g[g["tt"] == 0].set_index("k")["v"].astype("Int64")
        refs = g[g["tt"] == 1]
        k = refs["k"].to_numpy(np.int64)
        got = lab.reindex(k)
        # isolated cores (never in an edge) label themselves
        comp = np.where(got.notna().to_numpy(),
                        got.fillna(0).to_numpy(np.int64), k)
        return pd.DataFrame({"pid_": refs["v"].to_numpy(np.int64),
                             "cluster": comp.astype(np.int64)})

    resolved = bucket_exchange(u1, resolve, key="_bkt")

    # --- final assembly keyed on pid ----------------------------------------
    def tag_pts(f: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"k": f[id_col].to_numpy(np.int64),
                          "v": f["n_nbrs"].to_numpy(np.int64),
                          "tt": np.int8(0)})
        d["_bkt"] = _hash_bkt(d["k"].to_numpy(np.int64), num_buckets)
        return d

    u2 = (flagged.map_batches(tag_pts, batch_format="pandas")
          .union(labels.map_batches(tag(1, "node", "component_id"),
                                    batch_format="pandas"))
          .union(resolved.map_batches(tag(2, "pid_", "cluster"),
                                      batch_format="pandas")))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["tt"] == 0].rename(columns={"k": id_col, "v": "n_nbrs"})
        # Int64, never float64: see resolve()
        comp = g[g["tt"] == 1].set_index("k")["v"].astype("Int64")
        bcl = g[g["tt"] == 2].set_index("k")["v"].astype("Int64")
        pid = base[id_col].to_numpy(np.int64)
        n = base["n_nbrs"].to_numpy(np.int64)
        is_core = (n >= min_pts).astype(np.int64)
        own = comp.reindex(pid)
        # isolated cores never enter an edge → their own pid is the label
        core_cl = np.where(own.notna().to_numpy(),
                           own.fillna(0).to_numpy(np.int64), pid)
        bord = bcl.reindex(pid)
        cl = np.where(is_core == 1, core_cl,
                      np.where(bord.notna().to_numpy(),
                               bord.fillna(0).to_numpy(np.int64),
                               np.int64(-1)))
        return pd.DataFrame({id_col: pid, "n_nbrs": n, "is_core": is_core,
                             "cluster_id": cl.astype(np.int64)})

    return bucket_exchange(u2, assemble, key="_bkt")


_JENKS_L = 26771144400  # lcm(1..25): (L // n)·S² is an exact integer ∀ n ≤ 25


def jenks_breaks_nation(orders: ray.data.Dataset,
                        customer: ray.data.Dataset,
                        nation: ray.data.Dataset, k_classes: int = 5,
                        v_scale: int = 1_000_000,
                        num_buckets: int = 64) -> ray.data.Dataset:
    """Jenks natural-breaks classification (Fisher 1958 / Jenks 1967 —
    the choropleth class-break optimizer every GIS package ships) over
    per-nation order revenue. The DP maximizes Σ_classes S_c²/n_c
    (equivalent to minimizing within-class squared deviation) in EXACT
    integer arithmetic: every term is (L // n_c)·S_c² with
    L = lcm(1..25), so Python bigints on the engine side and HUGEINT in
    the SQL twin agree bit-for-bit; values are revenue cents quantized
    by ``v_scale`` (floor — documented quantization, keeps S² inside
    HUGEINT at any sf). Ties in the argmax break toward the SMALLER
    split index on both sides.

    Scale shape: revenue aggregates distributively (cents partials per
    block → one custkey-bucketed join exchange → one nationkey reduce);
    the DP itself runs on the driver over ≤ 25 rows — bounded by the
    nation-key DOMAIN, not the data."""
    from ..functions.rounding import round_half_away

    def o_part(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0) \
            .astype(np.int64)
        d = pd.DataFrame({"c_custkey": b["o_custkey"].to_numpy(np.int64),
                          "cents": cents})
        d = d.groupby("c_custkey", sort=False, as_index=False).sum()
        d["t"] = np.int8(0)
        d["n_nationkey"] = np.int64(0)
        d["_part"] = (d["c_custkey"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return d

    def c_rows(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"c_custkey": b["c_custkey"].to_numpy(np.int64),
                          "cents": np.int64(0), "t": np.int8(1),
                          "n_nationkey":
                              b["c_nationkey"].to_numpy(np.int64)})
        d["_part"] = (d["c_custkey"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return d

    def join_nation(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["t"] == 0]
        c = g[g["t"] == 1][["c_custkey", "n_nationkey"]]
        m = o[["c_custkey", "cents"]].merge(c, on="c_custkey", how="inner")
        out = m.groupby("n_nationkey", sort=False, as_index=False)["cents"] \
            .sum()
        out["cents"] = out["cents"].astype(np.int64)
        return out

    per_nation = bucket_exchange(
        orders.map_batches(o_part, batch_format="pandas").union(
            customer.map_batches(c_rows, batch_format="pandas")),
        join_nation)

    def final_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["_part"]).groupby(
            "n_nationkey", sort=False, as_index=False)["cents"].sum()
        out["cents"] = out["cents"].astype(np.int64)
        return out

    def rekey(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_part"] = (b["n_nationkey"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return b

    rev = bucket_exchange(per_nation.map_batches(rekey,
                                                 batch_format="pandas"),
                          final_sum).to_pandas()  # ≤ 25 rows (key domain)
    names = nation.to_pandas()[["n_nationkey", "n_name"]]
    rev = rev.merge(names, on="n_nationkey", how="inner")
    rev["v"] = rev["cents"].to_numpy(np.int64) // v_scale
    rev = rev.sort_values(["v", "n_name"], kind="mergesort") \
        .reset_index(drop=True)
    v = [int(x) for x in rev["v"]]
    n = len(v)
    pref = [0]
    for x in v:
        pref.append(pref[-1] + x)

    def g_cost(i: int, j: int) -> int:        # 1-indexed inclusive
        nn = j - i + 1
        s = pref[j] - pref[i - 1]
        return (_JENKS_L // nn) * s * s

    NEG = None
    f = [[NEG] * (n + 1) for _ in range(k_classes + 1)]
    bi = [[0] * (n + 1) for _ in range(k_classes + 1)]
    for j in range(1, n + 1):
        f[1][j] = g_cost(1, j)
        bi[1][j] = 1
    for k in range(2, k_classes + 1):
        for j in range(k, n + 1):
            best, besti = None, 0
            for i in range(k, j + 1):
                val = f[k - 1][i - 1] + g_cost(i, j)
                if best is None or val > best:
                    best, besti = val, i
            f[k][j] = best
            bi[k][j] = besti
    # backtrack
    bounds = []
    j = n
    for k in range(k_classes, 0, -1):
        i = bi[k][j]
        bounds.append((k, i, j))
        j = i - 1
    bounds.reverse()
    rows = []
    for k, i, j in bounds:
        s = pref[j] - pref[i - 1]
        rows.append({"class_id": k, "i_start": i, "i_end": j,
                     "n": j - i + 1, "sum_v": s,
                     "v_min": v[i - 1], "v_max": v[j - 1]})
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)
