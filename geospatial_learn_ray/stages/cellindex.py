"""Geocode + discrete-global-grid cell encoding stages.

The Ray analogue of the reference's coordinate→pixel arithmetic
(shape.py:2589-2590 ``px=int((mx-rgt[0])/rgt[1])``) and meshgrid tiling
(shape.py:2412): stateless, vectorized ``map_batches`` over zero-copy Arrow
batches — numpy kernels from functions/geo.py, no Python per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions import _bs, geo

HEX_RES_RANGE = (5, 9)  # north_star: H3 res 5-9
S2_LEVEL = 12           # north_star: S2 cells (level 12 fixture)


def add_geocode(batch: pa.Table, skew: bool = True) -> pa.Table:
    """pages batch → + (lon, lat) via the deterministic hash geocoder."""
    lon, lat = geo.geocode(batch["url"], skew=skew)
    return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))


def add_cells(batch: pa.Table, hex_res: tuple[int, ...] = (5, 6, 7, 8, 9), s2_level: int = S2_LEVEL) -> pa.Table:
    """+ cell_h3_r{res} (hex index, uint64) per res and + cell_s2_l{level}."""
    lat = batch["lat"].to_numpy()
    lon = batch["lon"].to_numpy()
    for res in hex_res:
        batch = batch.append_column(f"cell_h3_r{res}", pa.array(geo.hex_latlng_to_cell(lat, lon, res)))
    batch = batch.append_column(f"cell_s2_l{s2_level}", pa.array(geo.s2_latlng_to_cell(lat, lon, s2_level)))
    return batch


def geocode_and_cells(ds: ray.data.Dataset, hex_res=(5, 6, 7, 8, 9), s2_level: int = S2_LEVEL, skew: bool = True) -> ray.data.Dataset:
    """Compose geocode + cell encode as one fused zero-copy Arrow stage."""

    def fn(batch: pa.Table) -> pa.Table:
        return add_cells(add_geocode(batch, skew=skew), hex_res, s2_level)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=_bs())


def geocode_and_geohash(ds: ray.data.Dataset, precision: int = 8,
                        prefix: int = 4, skew: bool = True) -> ray.data.Dataset:
    """Geocode + Niemeyer geohash encode as one fused zero-copy Arrow stage
    (the base32 sibling of geocode_and_cells): per page the full-precision
    cell plus its ``prefix``-char parent — geohash's defining property is
    that a left prefix IS the coarser cell, so the tiling groupby key is a
    substring, not a re-encode."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = add_geocode(batch, skew=skew)
        gh = geo.geohash_encode(batch["lat"].to_numpy(),
                                batch["lon"].to_numpy(), precision)
        batch = batch.append_column(f"gh{precision}", pa.array(gh))
        return batch.append_column(
            f"gh{prefix}", pa.array(gh.astype(f"U{prefix}")))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=_bs())


def nearest_city(ds: ray.data.Dataset, skew: bool = True) -> ray.data.Dataset:
    """Great-circle nearest-POI assignment: each page is geocoded and
    assigned to the closest of the five hot-city centers (the broadcast
    small-side spatial nearest join — POIs ride as constants, the corpus
    streams map-only, no shuffle; reference analogue: zonal_point's
    nearest-lookup family on a point layer instead of a raster). Distance
    is the haversine/atan2 form in km; ties (exact f64 equality of two
    distances) break to the smallest city index on both sides."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = add_geocode(batch, skew=skew)
        lat = batch["lat"].to_numpy()
        lon = batch["lon"].to_numpy()
        d = np.stack([geo.haversine_km(lat, lon, float(cy), float(cx))
                      for cx, cy in geo.HOT_CITIES])
        city = d.argmin(axis=0).astype(np.int64)  # first-min tiebreak
        dist = d[city, np.arange(len(lat))]
        from ..functions.rounding import round_half_away
        return (batch.append_column("city", pa.array(city))
                .append_column("dist_km", pa.array(round_half_away(
                    dist.astype(np.float32).astype(np.float64), 6))))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=_bs())


# axial one-ring deltas (pointy-top), packed as dq*2^27 + dr; index 0 = self
_HEX_RING1 = np.array(
    [0,
     (1 << 27) + 0, (1 << 27) - 1, -1,
     -(1 << 27) + 0, -(1 << 27) + 1, 1], np.int64)


def hex_kring_smooth(ds: ray.data.Dataset, res: int = 7,
                     text_col: str = "text",
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Focal (one-ring) smoothing on the hex lattice: per-cell page count
    and char mass, then each cell's mean over its 7-cell k=1 ring — the
    hex counterpart of the raster focal family (batch_gdaldem's windows),
    demonstrating that hex neighbors are ARITHMETIC on the packed axial
    id (cell + dq·2²⁷ + dr): no replication, no geometry — two slim
    bucketed exchanges, the second over a 7× explode of per-CELL rows
    (cells, not pages: the explode factor applies after aggregation).

    Output keeps only cells that have their own data (classic focal
    support); means are exact-integer ratios rounded half-away."""
    import pandas as pd

    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def _bkt_of(cell_i64: np.ndarray) -> np.ndarray:
        from ..functions.hashing import splitmix64
        old = np.seterr(over="ignore")
        try:
            return (splitmix64(cell_i64.astype(np.uint64))
                    % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def partial(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc
        lon, lat = geo.geocode(b["url"])
        cell = geo.hex_latlng_to_cell(lat, lon, res).view(np.int64)
        nch = pc.utf8_length(b[text_col]).to_numpy().astype(np.int64)
        d = (pd.DataFrame({"cell": cell, "n": np.int64(1), "s": nch})
             .groupby("cell", sort=False, as_index=False).sum())
        d["_bkt"] = _bkt_of(d["cell"].to_numpy(np.int64))
        return d

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("cell", sort=False, as_index=False)[["n", "s"]].sum()
        c = t["cell"].to_numpy(np.int64)
        frames = [pd.DataFrame({"tgt": c + d, "n": t["n"].to_numpy(np.int64),
                                "s": t["s"].to_numpy(np.int64),
                                "self": np.int8(1 if d == 0 else 0)})
                  for d in _HEX_RING1]
        out = pd.concat(frames, ignore_index=True)
        out["_bkt"] = _bkt_of(out["tgt"].to_numpy(np.int64))
        return out

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("tgt", sort=False).agg(
            ring_cells=("n", "size"), ring_pages=("n", "sum"),
            ring_chars=("s", "sum"), has_self=("self", "max"))
        own = g[g["self"] == 1].set_index("tgt")["n"]
        a["n_own"] = own.reindex(a.index).fillna(0).astype(np.int64)
        a = a[a["has_self"] == 1].reset_index()
        return pd.DataFrame({
            f"cell_h3_r{res}": a["tgt"].to_numpy(np.int64).view(np.uint64),
            "n_own": a["n_own"].to_numpy(np.int64),
            "ring_cells": a["ring_cells"].to_numpy(np.int64),
            "ring_pages": a["ring_pages"].to_numpy(np.int64),
            "mean_chars_ring": round_half_away(
                a["ring_chars"].to_numpy(np.float64)
                / a["ring_pages"].to_numpy(np.int64), 6),
        })

    parted = ds.map_batches(partial, batch_format="pyarrow")
    cells = bucket_exchange(parted, per_cell, key="_bkt",
                            small_partials=True)
    return bucket_exchange(cells, smooth, key="_bkt", small_partials=True)


def idw_grid(pages: ray.data.Dataset, url_col: str = "url",
             text_col: str = "text", cs: float = 1.0,
             num_buckets: int = 256) -> ray.data.Dataset:
    """Inverse-distance-weighted grid interpolation (Shepard 1968) of a
    per-page measurement (text length) onto a ``cs``-degree lon/lat grid:
    each cell center averages the points within radius R = cs, weighted
    by a quantized inverse-distance kernel.

    Scale shape: the kNN pattern — every point replicates to its 3×3
    cell ring map-side (complete for R = cs: a neighbor-of-neighbor
    center is ≥ 1.5·cs away), ONE bucketed exchange on the cell key
    co-locates each cell's candidate points, and the combiner is a
    vectorized distance filter + integer groupby. No driver pulls.

    Oracle exactness: weights are integers floor(1e6/(1+16·d²)+0.5) —
    d² is the identical f64 expression both sides (geocode lon/lat is
    exact hash arithmetic) — so Σw and Σw·v are order-exact integer
    sums and the final idw is one division of exact casts."""
    import pyarrow.compute as pc

    from ..functions import geo
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    def prep(b: pa.Table) -> pd.DataFrame:
        lon, lat = geo.geocode(b[url_col])
        v = pc.utf8_length(b[text_col]).to_numpy().astype(np.int64)
        cx = np.floor(lon / cs).astype(np.int64)
        cy = np.floor(lat / cs).astype(np.int64)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                parts.append(pd.DataFrame({
                    "gx": cx + dx, "gy": cy + dy,
                    "lon": lon, "lat": lat, "v": v}))
        d = pd.concat(parts, ignore_index=True)
        old = np.seterr(over="ignore")
        try:
            key = (d["gx"].to_numpy(np.int64) * 100003
                   + d["gy"].to_numpy(np.int64))
            d["_part"] = (splitmix64(key.astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        gx = g["gx"].to_numpy(np.int64)
        gy = g["gy"].to_numpy(np.int64)
        cxc = (gx.astype(np.float64) + 0.5) * cs
        cyc = (gy.astype(np.float64) + 0.5) * cs
        dx = g["lon"].to_numpy(np.float64) - cxc
        dy = g["lat"].to_numpy(np.float64) - cyc
        d2 = dx * dx + dy * dy
        keep = d2 <= cs * cs
        wq = np.floor(1e6 / (1.0 + d2[keep] * 16.0) + 0.5).astype(np.int64)
        sub = pd.DataFrame({"gx": gx[keep], "gy": gy[keep], "wq": wq,
                            "wv": wq * g["v"].to_numpy(np.int64)[keep]})
        out = sub.groupby(["gx", "gy"], as_index=False).agg(
            n_pts=("wq", "size"), sw=("wq", "sum"), swv=("wv", "sum"))
        out["n_pts"] = out["n_pts"].astype(np.int64)
        out["idw"] = (out["swv"].to_numpy(np.int64).astype(np.float64)
                      / out["sw"].to_numpy(np.int64).astype(np.float64))
        return out[["gx", "gy", "n_pts", "idw"]]

    return bucket_exchange(
        pages.select_columns([url_col, text_col]).map_batches(
            prep, batch_format="pyarrow"),
        combine)


QT_DEPTH = 8    # finest split level: 256x256 base cells
QT_PREFIX = 3   # subtree/bucket level: 4^3 = 64 bounded exchange keys
QT_CAP = 25     # split a cell while it holds more than this many points


def quadtree_cells(pages: ray.data.Dataset, url_col: str = "url",
                   cap: int = QT_CAP, max_depth: int = QT_DEPTH,
                   prefix: int = QT_PREFIX) -> ray.data.Dataset:
    """Adaptive quadtree partitioning of the geocoded pages — the
    skew-aware spatial partitioner: a cell splits into 4 while it holds
    more than ``cap`` points, so the hot-city cells (30% of rows in 5
    jitter boxes, geo.py:48) descend to ``max_depth`` while the sparse
    background stays shallow. Returns the NONEMPTY leaf inventory
    (depth, cx, cy, n_points) — the partition layout a 100 TB spatial
    join would bucket by instead of a fixed grid.

    Scale shape: the tree is CLOSED-FORM in the per-depth counts (a
    depth-d cell is a leaf iff its count ≤ cap — or d = max_depth —
    and every ancestor's count > cap), so no split iterations run:
    one map pass emits per-block (cx, cy, n) partials at max_depth
    (O(distinct cells/block) rows, never O(points)); a bounded
    4^prefix-row exchange gives the driver the subtree totals that
    decide depths ≤ prefix; ONE bucketed exchange keyed on the
    depth-``prefix`` cell co-locates each subtree, whose combiner
    rolls up counts and walks the ok-chain locally. The Zipf-hot
    subtree ships #blocks partial rows, not its point count."""
    from .exchange import bucket_exchange

    assert 0 < prefix < max_depth
    side = 1 << max_depth
    shift = max_depth - prefix
    pmask = (1 << prefix) - 1

    def cellify(b: pa.Table) -> pd.DataFrame:
        lon, lat = geo.geocode(b[url_col])
        cx = np.minimum(np.floor((lon + 180.0) / 360.0 * float(side)),
                        side - 1).astype(np.int64)
        cy = np.minimum(np.floor((lat + 90.0) / 180.0 * float(side)),
                        side - 1).astype(np.int64)
        d = pd.DataFrame({"cx": cx, "cy": cy}) \
            .groupby(["cx", "cy"], sort=False).size().reset_index(name="n")
        d["n"] = d["n"].astype(np.int64)
        d["_part"] = (((d["cx"].to_numpy(np.int64) >> shift) << prefix)
                      | (d["cy"].to_numpy(np.int64) >> shift)).astype(np.int32)
        return d

    partials = pages.select_columns([url_col]) \
        .map_batches(cellify, batch_format="pyarrow").materialize()

    # bounded driver pull: 4^prefix subtree totals decide depths 0..prefix
    def to_pref(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("_part", as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    def sum_pref(g: pd.DataFrame) -> pd.DataFrame:
        o = g.groupby("_part", as_index=False)["n"].sum()
        o["n"] = o["n"].astype(np.int64)
        return o

    pref = bucket_exchange(partials.map_batches(to_pref, batch_format="pandas"),
                           sum_pref, small_partials=True).to_pandas()
    lvl = pd.DataFrame({
        "cx": (pref["_part"].to_numpy(np.int64) >> prefix),
        "cy": (pref["_part"].to_numpy(np.int64) & pmask),
        "n": pref["n"].to_numpy(np.int64)})
    levels = {prefix: lvl}
    for d in range(prefix - 1, -1, -1):
        up = levels[d + 1].copy()
        up["cx"] //= 2
        up["cy"] //= 2
        levels[d] = up.groupby(["cx", "cy"], as_index=False)["n"].sum()

    shallow = []
    ok_prev = None  # (cx, cy) frame of ok cells at the previous depth
    go: set[int] = set()
    for d in range(0, prefix + 1):
        f = levels[d].copy()
        if d == 0:
            f["ok"] = True
        else:
            par = ok_prev.rename(columns={"cx": "pcx", "cy": "pcy"})
            f = f.merge(par, left_on=[f["cx"] // 2, f["cy"] // 2],
                        right_on=["pcx", "pcy"], how="left")
            f["ok"] = f["ok_split"].notna()
            f = f[["cx", "cy", "n", "ok"]]
        leaf = f["ok"] & (f["n"].to_numpy(np.int64) <= cap)
        sh = f.loc[leaf, ["cx", "cy", "n"]].copy()
        sh.insert(0, "depth", np.int64(d))
        shallow.append(sh)
        f["ok_split"] = f["ok"] & (f["n"].to_numpy(np.int64) > cap)
        ok_prev = f.loc[f["ok_split"], ["cx", "cy", "ok_split"]]
        if d == prefix:
            go = set(((f.loc[f["ok_split"], "cx"].to_numpy(np.int64) << prefix)
                      | f.loc[f["ok_split"], "cy"].to_numpy(np.int64)).tolist())

    def empty_leaves() -> pd.DataFrame:
        return pd.DataFrame({"depth": pd.Series([], dtype=np.int64),
                             "cx": pd.Series([], dtype=np.int64),
                             "cy": pd.Series([], dtype=np.int64),
                             "n_points": pd.Series([], dtype=np.int64)})

    go_f = frozenset(go)

    def deep(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for part, sub in g.groupby("_part", sort=False):
            if int(part) not in go_f:
                continue
            cur = sub.groupby(["cx", "cy"], as_index=False)["n"].sum()
            cur["n"] = cur["n"].astype(np.int64)
            lv = {max_depth: cur}
            for d in range(max_depth - 1, prefix, -1):
                up = lv[d + 1].copy()
                up["cx"] //= 2
                up["cy"] //= 2
                lv[d] = up.groupby(["cx", "cy"], as_index=False)["n"].sum()
            okf = None
            for d in range(prefix + 1, max_depth + 1):
                f = lv[d].copy()
                if d == prefix + 1:
                    f["ok"] = True  # subtree root is in go => it split
                else:
                    par = okf.rename(columns={"cx": "pcx", "cy": "pcy"})
                    f = f.merge(par, left_on=[f["cx"] // 2, f["cy"] // 2],
                                right_on=["pcx", "pcy"], how="left")
                    f["ok"] = f["ok_split"].notna()
                    f = f[["cx", "cy", "n", "ok"]]
                n_arr = f["n"].to_numpy(np.int64)
                leaf = f["ok"].to_numpy(bool) & ((n_arr <= cap)
                                                 | (d == max_depth))
                sh = f.loc[leaf, ["cx", "cy", "n"]].copy()
                sh.insert(0, "depth", np.int64(d))
                outs.append(sh)
                f["ok_split"] = f["ok"] & (n_arr > cap)
                okf = f.loc[f["ok_split"], ["cx", "cy", "ok_split"]]
        if not outs:
            return empty_leaves()
        o = pd.concat(outs, ignore_index=True)
        o = o.rename(columns={"n": "n_points"})
        return o.astype({"depth": np.int64, "cx": np.int64,
                         "cy": np.int64, "n_points": np.int64})

    deep_ds = bucket_exchange(partials, deep, small_partials=True)
    sh = pd.concat(shallow, ignore_index=True) if shallow else None
    if sh is None or not len(sh):
        return deep_ds
    sh = sh.rename(columns={"n": "n_points"}).astype(
        {"depth": np.int64, "cx": np.int64, "cy": np.int64,
         "n_points": np.int64})
    return deep_ds.union(ray.data.from_pandas(sh))


def kriging_grid(pages: ray.data.Dataset, url_col: str = "url",
                 text_col: str = "text", cs: float = 1.0,
                 num_buckets: int = 256) -> ray.data.Dataset:
    """Ordinary kriging (Krige 1951 / Matheron 1963) of the per-page
    measurement (text length) onto the ``cs``-degree grid — the
    geostatistical upgrade of `idw_grid`: at each cell center the 3
    nearest ring candidates (total order (d², url)) get weights from
    the 4×4 ordinary-kriging system with a linear variogram γ(d) = d,
    solved by Cramer with `sqlgen.kriging_cramer_texts` — the SAME
    fully parenthesized expressions are numpy-eval'd here and embedded
    in the SQL twin, so the f64 op order is identical by construction.
    λ sums to 1 (unbiasedness) up to fp — pytest checks a constant
    field reproduces exactly within 1e-9 before rounding.

    Scale shape: identical to idw_grid — map-side 3×3 ring replication
    (complete for the ring-local neighbor semantics documented here:
    neighbors are the 3 nearest WITHIN the ring, a bounded candidate
    set by construction), ONE cell-keyed exchange, vectorized
    per-bucket top-3 + closed-form solve. No iteration, no driver
    pulls; near-singular systems are clamped to ±1e6 (both sides) and
    det = 0 rows dropped (bit-identical det ⇒ identical filter)."""
    import pyarrow.compute as pc

    from ..functions import geo
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from ..functions.sqlgen import kriging_cramer_texts
    from .exchange import bucket_exchange

    det_t, w1_t, w2_t, w3_t = kriging_cramer_texts()

    def prep(b: pa.Table) -> pd.DataFrame:
        lon, lat = geo.geocode(b[url_col])
        v = pc.utf8_length(b[text_col]).to_numpy().astype(np.int64)
        urls = b[url_col].to_pandas().to_numpy(object)
        cx = np.floor(lon / cs).astype(np.int64)
        cy = np.floor(lat / cs).astype(np.int64)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                parts.append(pd.DataFrame({
                    "gx": cx + dx, "gy": cy + dy, "url": urls,
                    "lon": lon, "lat": lat, "v": v}))
        d = pd.concat(parts, ignore_index=True)
        old = np.seterr(over="ignore")
        try:
            key = (d["gx"].to_numpy(np.int64) * 100003
                   + d["gy"].to_numpy(np.int64))
            d["_part"] = (splitmix64(key.astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        gx = g["gx"].to_numpy(np.int64)
        gy = g["gy"].to_numpy(np.int64)
        cxc = (gx.astype(np.float64) + 0.5) * cs
        cyc = (gy.astype(np.float64) + 0.5) * cs
        dx = g["lon"].to_numpy(np.float64) - cxc
        dy = g["lat"].to_numpy(np.float64) - cyc
        d = pd.DataFrame({"gx": gx, "gy": gy, "url": g["url"],
                          "lon": g["lon"], "lat": g["lat"],
                          "v": g["v"].to_numpy(np.int64),
                          "d2": dx * dx + dy * dy})
        d = d.sort_values(["gx", "gy", "d2", "url"], kind="mergesort")
        grp = d.groupby(["gx", "gy"], sort=False)
        d["rk"] = grp.cumcount()
        nc = grp.size().rename("n_cand")
        top = d[d["rk"] < 3]
        wide = top.set_index(["gx", "gy", "rk"])[
            ["lon", "lat", "d2", "v"]].unstack("rk")
        wide.columns = [f"{c}{r + 1}" for c, r in wide.columns]
        wide = wide.join(nc)
        wide = wide[wide["n_cand"] >= 3].reset_index()
        if not len(wide):
            return pd.DataFrame({
                "gx": pd.Series([], dtype=np.int64),
                "gy": pd.Series([], dtype=np.int64),
                "n_cand": pd.Series([], dtype=np.int64),
                "krig_r": pd.Series([], dtype=np.float64)})
        x1 = wide["lon1"].to_numpy(np.float64)
        x2 = wide["lon2"].to_numpy(np.float64)
        x3 = wide["lon3"].to_numpy(np.float64)
        y1 = wide["lat1"].to_numpy(np.float64)
        y2 = wide["lat2"].to_numpy(np.float64)
        y3 = wide["lat3"].to_numpy(np.float64)
        env = {
            "g12": np.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)),
            "g13": np.sqrt((x1 - x3) * (x1 - x3) + (y1 - y3) * (y1 - y3)),
            "g23": np.sqrt((x2 - x3) * (x2 - x3) + (y2 - y3) * (y2 - y3)),
            "b1": np.sqrt(wide["d21"].to_numpy(np.float64)),
            "b2": np.sqrt(wide["d22"].to_numpy(np.float64)),
            "b3": np.sqrt(wide["d23"].to_numpy(np.float64)),
        }
        det = eval(det_t, {"__builtins__": {}}, env)  # noqa: S307 — generated text
        w1 = eval(w1_t, {"__builtins__": {}}, env)  # noqa: S307
        w2 = eval(w2_t, {"__builtins__": {}}, env)  # noqa: S307
        w3 = eval(w3_t, {"__builtins__": {}}, env)  # noqa: S307
        v1 = wide["v1"].to_numpy(np.float64)
        v2 = wide["v2"].to_numpy(np.float64)
        v3 = wide["v3"].to_numpy(np.float64)
        keep = det != 0.0
        est = ((w1 * v1 + w2 * v2) + w3 * v3)[keep] / det[keep]
        est = np.clip(est, -1e6, 1e6)
        return pd.DataFrame({
            "gx": wide["gx"].to_numpy(np.int64)[keep],
            "gy": wide["gy"].to_numpy(np.int64)[keep],
            "n_cand": wide["n_cand"].to_numpy(np.int64)[keep],
            "krig_r": round_half_away(est, 6)})

    parted = pages.select_columns([url_col, text_col]) \
        .map_batches(prep, batch_format="pyarrow")
    return bucket_exchange(parted, combine)


def kde_heat_grid(pages: ray.data.Dataset, url_col: str = "url",
                  cs: float = 4.0, radius: int = 3, sigma: float = 1.5,
                  scale: int = 64,
                  num_buckets: int = 256) -> ray.data.Dataset:
    """Kernel-density heat grid (Silverman 1986 binned KDE / the GIS
    'heatmap' operator) over geocoded pages: points bin to a ``cs``-degree
    lon/lat grid, and every cell scatters its count through a separable
    quantized Gaussian kernel K(di,dj) = q(di)·q(dj) with
    q(d) = floor(exp(-d²/2σ²)·scale + 0.5) — the kernel is a tiny
    INTEGER literal table shared verbatim with the SQL twin, so the
    density is an exact integer sum in any order. Cells within
    ``radius`` of mass appear even when empty (cnt = 0).

    Scale shape: per-block (cell, count) partials → cell-keyed exchange
    to exact counts → map-side (2r+1)² offset scatter → a second
    cell-keyed exchange sums contributions. O(cells·(2r+1)²) moved,
    never O(points); no driver pull."""
    from ..functions import geo
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    qk = np.floor(np.exp(-(np.arange(radius + 1, dtype=np.float64) ** 2)
                         / (2.0 * sigma * sigma)) * scale + 0.5
                  ).astype(np.int64)

    def _cell_part(gi: np.ndarray, gj: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            key = gi * np.int64(100003) + gj
            return (splitmix64(key.astype(np.uint64))
                    % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def prep(b: pa.Table) -> pd.DataFrame:
        lon, lat = geo.geocode(b[url_col])
        gi = np.floor((lon + 180.0) / cs).astype(np.int64)
        gj = np.floor((lat + 90.0) / cs).astype(np.int64)
        g = pd.DataFrame({"gi": gi, "gj": gj}).groupby(
            ["gi", "gj"], as_index=False).size().rename(
                columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        g["_part"] = _cell_part(g["gi"].to_numpy(np.int64),
                                g["gj"].to_numpy(np.int64))
        return g

    def scatter(g: pd.DataFrame) -> pd.DataFrame:
        cc = g.drop(columns=["_part"]).groupby(
            ["gi", "gj"], as_index=False)["c"].sum()
        gi = cc["gi"].to_numpy(np.int64)
        gj = cc["gj"].to_numpy(np.int64)
        c = cc["c"].to_numpy(np.int64)
        outs = []
        for di in range(-radius, radius + 1):
            for dj in range(-radius, radius + 1):
                w = int(qk[abs(di)]) * int(qk[abs(dj)])
                outs.append(pd.DataFrame({
                    "gi": gi + di, "gj": gj + dj,
                    "dq": w * c,
                    "c0": c if (di == 0 and dj == 0)
                    else np.zeros(len(c), np.int64)}))
        d = pd.concat(outs, ignore_index=True)
        d["_part"] = _cell_part(d["gi"].to_numpy(np.int64),
                                d["gj"].to_numpy(np.int64))
        return d

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["_part"]).groupby(
            ["gi", "gj"], as_index=False).agg(
                cnt=("c0", "sum"), dens_q=("dq", "sum"))
        out["cnt"] = out["cnt"].astype(np.int64)
        out["dens_q"] = out["dens_q"].astype(np.int64)
        return out

    counted = bucket_exchange(
        pages.select_columns([url_col]).map_batches(
            prep, batch_format="pyarrow"), scatter)
    return bucket_exchange(counted, finalize, small_partials=True)


def emerging_hotspots(pages: ray.data.Dataset, url_col: str = "url",
                      ts_col: str = "warc_ts", cs: float = 10.0,
                      num_buckets: int = 256) -> ray.data.Dataset:
    """Emerging-hot-spot analysis (the ArcGIS space-time-cube operator,
    Mann-Kendall flavor): pages bin to a ``cs``-degree cell × crawl HOUR
    cube, and each cell's hourly-count series gets the Mann-Kendall
    trend test — S over hour-ordered pairs, the classic value-tie
    variance correction, continuity-corrected z. Counts are exact
    integers; z is the identical divide→sqrt→divide chain both sides.
    Only observed hours enter a cell's series (documented semantics —
    zero-fill would need the global calendar joined per cell).

    Scale shape: per-block (cell, hour) count partials, ONE cell-keyed
    exchange; per-cell pair work is O(hours²) — bounded by the crawl
    calendar, not the corpus."""
    from ..functions import geo
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def prep(b: pa.Table) -> pd.DataFrame:
        lon, lat = geo.geocode(b[url_col])
        hour = (b[ts_col].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // 3_600_000_000)
        d = pd.DataFrame({
            "ci": np.floor((lon + 180.0) / cs).astype(np.int64),
            "cj": np.floor((lat + 90.0) / cs).astype(np.int64),
            "hour": hour})
        g = d.groupby(["ci", "cj", "hour"], as_index=False).size() \
            .rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            key = g["ci"].to_numpy(np.int64) * np.int64(100003) \
                + g["cj"].to_numpy(np.int64)
            g["_part"] = (splitmix64(key.astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        a = g.drop(columns=["_part"]).groupby(
            ["ci", "cj", "hour"], as_index=False)["cnt"].sum()
        a["cnt"] = a["cnt"].astype(np.int64)
        per = a.groupby(["ci", "cj"], as_index=False).agg(
            n_hours=("hour", "size"), total=("cnt", "sum"))
        ties = a.groupby(["ci", "cj", "cnt"], as_index=False).agg(
            c=("hour", "size"))
        c = ties["c"].to_numpy(np.int64)
        ties["tt"] = c * (c - 1) * (2 * c + 5)
        tt = ties.groupby(["ci", "cj"], as_index=False).agg(
            tt=("tt", "sum"))
        p = a.merge(a, on=["ci", "cj"], suffixes=("1", "2"))
        p = p[p["hour1"] < p["hour2"]]
        sgn = np.sign(p["cnt2"].to_numpy(np.int64)
                      - p["cnt1"].to_numpy(np.int64))
        s = (pd.DataFrame({"ci": p["ci"].to_numpy(np.int64),
                           "cj": p["cj"].to_numpy(np.int64), "s": sgn})
             .groupby(["ci", "cj"], as_index=False).agg(s=("s", "sum")))
        r = per.merge(tt, on=["ci", "cj"]).merge(
            s, on=["ci", "cj"], how="left")
        n = r["n_hours"].to_numpy(np.int64)
        sv = r["s"].fillna(0).to_numpy(np.int64)
        var18 = n * (n - 1) * (2 * n + 5) - r["tt"].to_numpy(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            sig = np.sqrt(var18.astype(np.float64) / 18.0)
            z = (sv - np.sign(sv)).astype(np.float64) / sig
        z = np.where((sv == 0) | (var18 <= 0), 0.0, z)
        return pd.DataFrame({
            "ci": r["ci"].to_numpy(np.int64),
            "cj": r["cj"].to_numpy(np.int64),
            "n_hours": n, "total": r["total"].to_numpy(np.int64),
            "s_stat": sv, "var18": var18,
            "mk_z_r": round_half_away(z, 6)})

    return bucket_exchange(
        pages.select_columns([url_col, ts_col]).map_batches(
            prep, batch_format="pyarrow"), combine)


def convex_hull_hosts(pages: ray.data.Dataset, url_col: str = "url",
                      num_buckets: int = 64,
                      max_per_host: int = 512) -> ray.data.Dataset:
    """Per-host convex hull membership over geocoded pages: a page is on
    the hull iff it is an EXTREME point — ∃ q ≠ p in the host with all
    r satisfying cross(q−p, r−p) ≥ 0 (a supporting line through p; the
    textbook extreme-point characterization; collinear boundary points
    count as on-hull — consistent on both sides). Coordinates are exact
    integer microdegrees, crosses exact int64, so the predicate is
    bit-free; single-point hosts are on-hull by definition.

    Scale shape: one host-keyed exchange; the per-host O(n³) predicate
    is asserted ≤ ``max_per_host`` points (the synthetic host fan-out is
    constant by construction — a real deployment would swap in a
    monotone-chain kernel per host)."""
    from ..functions import geo
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def prep(b: pa.Table) -> pd.DataFrame:
        lon, lat = geo.geocode(b[url_col])
        urls = b[url_col].to_pandas()
        host = urls.str.extract(r"site-(\d+)\.example", expand=False) \
            .astype(np.int64).to_numpy()
        d = pd.DataFrame({
            "url": urls.to_numpy(object), "host": host,
            "x": round_half_away(lon * 1e6, 0).astype(np.int64),
            "y": round_half_away(lat * 1e6, 0).astype(np.int64)})
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(host.astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        outs = []
        for h, t in g.groupby("host", sort=False):
            x = t["x"].to_numpy(np.int64)
            y = t["y"].to_numpy(np.int64)
            n = len(x)
            if n > max_per_host:
                raise ValueError(f"host {h} has {n} > {max_per_host} "
                                 "points; brute-force bound exceeded")
            if n == 1:
                flag = np.ones(1, np.int64)
            else:
                flag = np.zeros(n, np.int64)
                for p in range(n):
                    dxq = x - x[p]
                    dyq = y - y[p]
                    # cross[q, r] = (xq-xp)(yr-yp) - (yq-yp)(xr-xp)
                    cr = dxq[:, None] * dyq[None, :] \
                        - dyq[:, None] * dxq[None, :]
                    ok_q = (cr >= 0).all(axis=1)
                    ok_q[p] = False
                    flag[p] = np.int64(ok_q.any())
            o = t[["url", "host", "x", "y"]].copy()
            o["is_hull"] = flag
            outs.append(o)
        if not outs:
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "host": pd.Series([], dtype=np.int64),
                "x": pd.Series([], dtype=np.int64),
                "y": pd.Series([], dtype=np.int64),
                "is_hull": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    return bucket_exchange(
        pages.select_columns([url_col]).map_batches(
            prep, batch_format="pyarrow"), combine)


# 12 direction vectors of CONSTANT squared length 255^2 = 65025 (the
# Pythagorean 153-204-255 = 51*(3,4,5) family + axes): a shared |d|^2
# gives every point-to-segment distance the SAME denominator, so the
# cross-segment argmin is a pure int64 comparison (no rational compare).
_SNAP_DIRS = np.array(
    [(255, 0), (-255, 0), (0, 255), (0, -255),
     (153, 204), (153, -204), (-153, 204), (-153, -204),
     (204, 153), (204, -153), (-204, 153), (-204, -153)], np.int64)
_SNAP_LEN2 = 65025


def snap_segments(n_seg: int = 64, seed: int = 424242) -> np.ndarray:
    """Deterministic synthetic road network: ``n_seg`` segments with
    integer deci-degree endpoints — anchor from splitmix64 counter
    draws, direction from the constant-length _SNAP_DIRS set. Pure
    constants (seeded), inlined as VALUES literals in the SQL twin."""
    from ..functions.hashing import splitmix64

    k = np.arange(n_seg, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        ax = (splitmix64(np.uint64(seed) + 3 * k) % np.uint64(3000)
              ).astype(np.int64) - 1500
        ay = (splitmix64(np.uint64(seed) + 3 * k + np.uint64(1))
              % np.uint64(1300)).astype(np.int64) - 650
        di = (splitmix64(np.uint64(seed) + 3 * k + np.uint64(2))
              % np.uint64(len(_SNAP_DIRS))).astype(np.int64)
    finally:
        np.seterr(**old)
    d = _SNAP_DIRS[di]
    return np.column_stack([np.arange(n_seg, dtype=np.int64),
                            ax, ay, ax + d[:, 0], ay + d[:, 1],
                            d[:, 0], d[:, 1]])


def snap_points_pages(ds: ray.data.Dataset, n_seg: int = 64,
                      skew: bool = True) -> ray.data.Dataset:
    """Map matching: snap each geocoded page point to the nearest of
    ``n_seg`` synthetic road segments (projection onto the segment,
    clamped to its endpoints) — the GPS-trace snap every trajectory
    pipeline runs (reference analogue: the zonal_point nearest-lookup
    family; classic formulation e.g. Brakatsoulas et al. 2005, exact
    geometric predicates after integer snapping). Point coords quantize
    to deci-degrees (floor(lon*10) — identical FLOOR both sides);
    with the constant |d|^2 = 65025 direction set every candidate
    distance^2 is the exact int64 numerator over that ONE denominator
    (interior: cross^2; endpoint: e^2*65025), so nearest-segment argmin
    is integer comparison with ties to the smaller segment id. Emits
    d2_num (exact), t_q20 = floor(clamp(t)·2^20+0.5) (odd denominator
    65025 -> provably tie-free), and dist_deci_r = ROUND(SQRT(d2n)/255)
    (SQRT is numpy<->DuckDB bit-exact on ints < 2^53).

    Broadcast small side (the segment table is operator input), corpus
    streams map-only — no shuffle; the 64-way scan is a vectorized
    running-min, never a per-row loop."""
    segs = snap_segments(n_seg)
    from ..functions.rounding import round_half_away

    def fn(batch: pa.Table) -> pa.Table:
        batch = add_geocode(batch, skew=skew)
        px = np.floor(batch["lon"].to_numpy() * 10.0).astype(np.int64)
        py = np.floor(batch["lat"].to_numpy() * 10.0).astype(np.int64)
        best_key = np.full(len(px), np.iinfo(np.int64).max, np.int64)
        best_num = np.zeros(len(px), np.int64)
        best_t = np.zeros(len(px), np.int64)
        for sid, ax, ay, bx, by, dx, dy in segs:
            rx, ry = px - ax, py - ay
            tnum = dx * rx + dy * ry
            cross = dx * ry - dy * rx
            e_a = (rx * rx + ry * ry) * _SNAP_LEN2
            e_b = ((px - bx) ** 2 + (py - by) ** 2) * _SNAP_LEN2
            num = np.where(tnum <= 0, e_a,
                           np.where(tnum >= _SNAP_LEN2, e_b, cross * cross))
            key = num * n_seg + sid
            take = key < best_key
            best_key = np.where(take, key, best_key)
            best_num = np.where(take, num, best_num)
            best_t = np.where(take, np.clip(tnum, 0, _SNAP_LEN2), best_t)
        seg_id = best_key % n_seg
        t_q20 = np.floor(best_t.astype(np.float64) / _SNAP_LEN2
                         * 1048576.0 + 0.5).astype(np.int64)
        dist_r = round_half_away(
            np.sqrt(best_num.astype(np.float64)) / 255.0, 6)
        return pa.table({
            "url": batch["url"],
            "seg_id": pa.array(seg_id),
            "d2_num": pa.array(best_num),
            "t_q20": pa.array(t_q20),
            "dist_deci_r": pa.array(dist_r)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=_bs())


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 8 bits of each int64 so bit i lands at 2i (the
    classic Morton part1by1 mask ladder — identical literal masks in the
    SQL twin)."""
    v = v & 0xFF
    v = (v | (v << 4)) & 0x0F0F
    v = (v | (v << 2)) & 0x3333
    v = (v | (v << 1)) & 0x5555
    return v


def zorder_layout_pages(pages: ray.data.Dataset, grid: int = 256,
                        files_shift: int = 6,
                        bbox: tuple[float, float, float, float] =
                        (-10.0, 30.0, 40.0, 60.0),
                        num_buckets: int = 64) -> ray.data.Dataset:
    """Z-order (Morton) data-layout planner — the file-skipping layout
    step a lakehouse writer runs before clustering 100 TB by spatial
    key: geocode each page, bin to a ``grid``×``grid`` integer cell,
    interleave bits into a Morton key, and group rows into Z-contiguous
    'files' (``zkey >> files_shift`` — 1024 files at the defaults). Per
    file it reports the min/max cell ranges a format like Parquet would
    store as zone-map stats, whether a fixed ``bbox`` query could SKIP
    the file (range intersection on the stats), and the rows actually
    matching — so the emitted table directly exhibits the
    scan-pruning win (files_scanned ≪ files, hits ≈ scanned rows).
    Map-side partial aggregation per block, then one coarse bucketed
    exchange over file ids — no row-level shuffle of the dataset."""
    from ..functions.geo import geocode
    from .exchange import bucket_exchange

    lo_x, lo_y, hi_x, hi_y = bbox
    sx = grid / 360.0
    sy = grid / 180.0

    def part(b: pd.DataFrame) -> pd.DataFrame:
        lon, lat = geocode(b["url"].to_numpy(object))
        ix = np.minimum(np.floor((lon + 180.0) * sx), grid - 1) \
            .astype(np.int64)
        iy = np.minimum(np.floor((lat + 90.0) * sy), grid - 1) \
            .astype(np.int64)
        zkey = _part1by1(ix) | (_part1by1(iy) << 1)
        fid = zkey >> files_shift
        hit = ((lon >= lo_x) & (lon <= hi_x)
               & (lat >= lo_y) & (lat <= hi_y)).astype(np.int64)
        d = pd.DataFrame({"fid": fid, "ix": ix, "iy": iy, "hit": hit})
        agg = d.groupby("fid").agg(
            n_rows=("ix", "size"), min_ix=("ix", "min"),
            max_ix=("ix", "max"), min_iy=("iy", "min"),
            max_iy=("iy", "max"), n_hits=("hit", "sum")).reset_index()
        agg["_part"] = (agg["fid"].to_numpy(np.int64)
                        % num_buckets).astype(np.int32)
        return agg

    # bbox in cell space (identical expressions in the SQL twin)
    qlo_x = int(np.floor((lo_x + 180.0) * sx))
    qhi_x = int(np.floor((hi_x + 180.0) * sx))
    qlo_y = int(np.floor((lo_y + 90.0) * sy))
    qhi_y = int(np.floor((hi_y + 90.0) * sy))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["_part"]).groupby("fid").agg(
            n_rows=("n_rows", "sum"), min_ix=("min_ix", "min"),
            max_ix=("max_ix", "max"), min_iy=("min_iy", "min"),
            max_iy=("max_iy", "max"), n_hits=("n_hits", "sum")) \
            .reset_index()
        out["need_scan"] = ((out["max_ix"] >= qlo_x)
                            & (out["min_ix"] <= qhi_x)
                            & (out["max_iy"] >= qlo_y)
                            & (out["min_iy"] <= qhi_y)).astype(np.int64)
        for c in ("fid", "n_rows", "min_ix", "max_ix", "min_iy",
                  "max_iy", "n_hits"):
            out[c] = out[c].astype(np.int64)
        return out

    return bucket_exchange(pages.map_batches(part, batch_format="pandas"),
                           combine, small_partials=True)


def _hilbert_d(ix: np.ndarray, iy: np.ndarray, order: int) -> np.ndarray:
    """Hilbert curve distance of (ix, iy) on a 2^order grid — the
    classic iterative rotate-and-accumulate (Hamilton's convention, the
    Wikipedia xy2d), vectorized with one pass per bit level."""
    x = ix.astype(np.int64).copy()
    y = iy.astype(np.int64).copy()
    d = np.zeros(len(x), np.int64)
    s = np.int64(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = ry == 0
        xf = np.where(flip & (rx == 1), s - 1 - x, x)
        yf = np.where(flip & (rx == 1), s - 1 - y, y)
        x = np.where(flip, yf, x)
        y = np.where(flip, xf, y)
        s >>= 1
    return d


def hilbert_layout_pages(pages: ray.data.Dataset, grid: int = 256,
                         files_shift: int = 6,
                         bbox: tuple[float, float, float, float] =
                         (-10.0, 30.0, 40.0, 60.0),
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Hilbert-curve data-layout planner — the locality-optimal sibling
    of zorder_layout_pages (Hilbert keys have strictly better worst-case
    cell adjacency than Morton, which is why lakehouse writers offer
    both): identical geocode/bin/zone-map machinery, but rows cluster
    into files by the Hilbert distance (_hilbert_d — 8 unrolled bit
    levels, exact integers). Output schema matches zorder_layout_pages
    so the two plans compare file-for-file."""
    from ..functions.geo import geocode
    from .exchange import bucket_exchange

    order = int(np.log2(grid))
    lo_x, lo_y, hi_x, hi_y = bbox
    sx = grid / 360.0
    sy = grid / 180.0

    def part(b: pd.DataFrame) -> pd.DataFrame:
        lon, lat = geocode(b["url"].to_numpy(object))
        ix = np.minimum(np.floor((lon + 180.0) * sx), grid - 1) \
            .astype(np.int64)
        iy = np.minimum(np.floor((lat + 90.0) * sy), grid - 1) \
            .astype(np.int64)
        fid = _hilbert_d(ix, iy, order) >> files_shift
        hit = ((lon >= lo_x) & (lon <= hi_x)
               & (lat >= lo_y) & (lat <= hi_y)).astype(np.int64)
        d = pd.DataFrame({"fid": fid, "ix": ix, "iy": iy, "hit": hit})
        agg = d.groupby("fid").agg(
            n_rows=("ix", "size"), min_ix=("ix", "min"),
            max_ix=("ix", "max"), min_iy=("iy", "min"),
            max_iy=("iy", "max"), n_hits=("hit", "sum")).reset_index()
        agg["_part"] = (agg["fid"].to_numpy(np.int64)
                        % num_buckets).astype(np.int32)
        return agg

    qlo_x = int(np.floor((lo_x + 180.0) * sx))
    qhi_x = int(np.floor((hi_x + 180.0) * sx))
    qlo_y = int(np.floor((lo_y + 90.0) * sy))
    qhi_y = int(np.floor((hi_y + 90.0) * sy))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["_part"]).groupby("fid").agg(
            n_rows=("n_rows", "sum"), min_ix=("min_ix", "min"),
            max_ix=("max_ix", "max"), min_iy=("min_iy", "min"),
            max_iy=("max_iy", "max"), n_hits=("n_hits", "sum")) \
            .reset_index()
        out["need_scan"] = ((out["max_ix"] >= qlo_x)
                            & (out["min_ix"] <= qhi_x)
                            & (out["max_iy"] >= qlo_y)
                            & (out["min_iy"] <= qhi_y)).astype(np.int64)
        for c in ("fid", "n_rows", "min_ix", "max_ix", "min_iy",
                  "max_iy", "n_hits"):
            out[c] = out[c].astype(np.int64)
        return out

    return bucket_exchange(pages.map_batches(part, batch_format="pandas"),
                           combine, small_partials=True)


def hex_rollup_counts(ds: ray.data.Dataset, res_child: int = 9,
                      parents: tuple[int, ...] = (7, 5),
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Hierarchical hex-cell rollup (the H3 ``cellToParent`` aggregation
    pyramid a tile service precomputes): per-cell counts at the child
    resolution, then each coarser level derives from the PREVIOUS
    level's AGGREGATE rows — the parent of a cell derives from its
    EXACT dyadic axial coordinates (geo.hex_cell_to_parent_exact: the
    float re-encode ties on dyadic quarters where numpy and SQL round
    differently — caught by the strict oracle), applied map-side to cell
    rows (≤ #cells, never the point set) with one slim exchange per
    level. Output: (res, cell, n) rows for every level."""
    import pandas as pd

    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    def _bkt_of(cell_i64: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            return (splitmix64(cell_i64.astype(np.uint64))
                    % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)

    def child_partial(b: pa.Table) -> pd.DataFrame:
        lon, lat = geo.geocode(b["url"])
        cell = geo.hex_latlng_to_cell(lat, lon, res_child).view(np.int64)
        d = (pd.DataFrame({"cell": cell, "n": np.int64(1)})
             .groupby("cell", sort=False, as_index=False).sum())
        d["n"] = d["n"].astype(np.int64)
        d["_bkt"] = _bkt_of(d["cell"].to_numpy(np.int64))
        return d

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("cell", sort=False, as_index=False)["n"].sum()
        c["n"] = c["n"].astype(np.int64)
        return c

    level = bucket_exchange(
        ds.select_columns(["url"]).map_batches(child_partial, batch_format="pyarrow"),
        sum_cells, key="_bkt", small_partials=True)
    levels = {res_child: level}
    prev_res = res_child
    for pres in parents:
        def parent_partial(b: pd.DataFrame, pres=pres) -> pd.DataFrame:
            pc_ = geo.hex_cell_to_parent_exact(
                b["cell"].to_numpy(np.int64).view(np.uint64), pres).view(np.int64)
            d = pd.DataFrame({"cell": pc_, "n": b["n"].to_numpy(np.int64)})
            d = d.groupby("cell", sort=False, as_index=False).sum()
            d["n"] = d["n"].astype(np.int64)
            d["_bkt"] = _bkt_of(d["cell"].to_numpy(np.int64))
            return d

        level = bucket_exchange(
            levels[prev_res].map_batches(parent_partial, batch_format="pandas"),
            sum_cells, key="_bkt", small_partials=True)
        levels[pres] = level
        prev_res = pres

    tagged = []
    for r, lv in levels.items():
        def tag(b: pd.DataFrame, r=r) -> pd.DataFrame:
            return pd.DataFrame({"res": np.full(len(b), r, np.int64),
                                 "cell": b["cell"].to_numpy(np.int64),
                                 "n": b["n"].to_numpy(np.int64)})
        tagged.append(lv.map_batches(tag, batch_format="pandas"))
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out
