"""Raster (tiles-table) operators — the reference's block-loop functions as
vectorized per-tile ``map_batches`` stages over the tiles Dataset
(SURVEY.md §1.1: raster = one row per block window).

Covered reference ops:
- ``calc_ndvi`` (raster.py:1267) / ``rgb_ind`` (raster.py:1355) → per-tile
  band arithmetic (band 2 is a deterministic derived band, as stack_ras
  would band-concat a second raster);
- ``mask_raster`` / ``mask_raster_multi`` (raster.py:1031,1136) → rule
  masks with ==/</> predicates;
- ``temporal_comp`` / ``stat_comp`` (raster.py:2287,2410) → depth stats
  across two epochs zip-joined on the tile key;
- ``raster2points`` (raster.py:1607) → tile→pixel-rows explode;
- ``hist_match`` ECDF LUT (raster.py:2139) → global value-histogram two-
  pass: groupby(bin).count → broadcast LUT → apply;
- zonal tile stats: tile bbox × polygon bbox broadcast join → per-feature
  pixel stats (windowed-read actor pool holds the "open raster").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.geometry import PolygonIndex
from ..functions.rounding import round_half_away
from .exchange import bucket_exchange
from ..sources.tiles import tile_bounds, tile_pixels


def _add_tile_part(b: pa.Table, num_parts: int = 64) -> pa.Table:
    """Coarse reducer bucket of the tile key — one vectorized map_groups
    call per bucket instead of one Python call per tile (see stages/agg.py
    _add_part for why Ray's per-key reduce is avoided)."""
    part = ((b["tile_x"].to_numpy().astype(np.int64) * 31 + b["tile_y"].to_numpy()) % num_parts).astype(np.int32)
    return b.append_column("_part", pa.array(part))


def _pix(batch: pa.Table) -> np.ndarray:
    """tiles batch → [n_tiles, npix] float32 matrix (zero-copy list flatten)."""
    col = batch["band_values"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(batch), -1)


def ndvi_stage(ds: ray.data.Dataset, round_to: int = 6) -> ray.data.Dataset:
    """(band2-band1)/(band2+band1) per pixel; band2 = 1.5·band1 + 0.25
    (deterministic second "epoch"). Output: per-tile mean/min/max NDVI."""

    def fn(batch: pa.Table) -> pa.Table:
        b1 = _pix(batch).astype(np.float64)
        b2 = 1.5 * b1 + 0.25
        ndvi = (b2 - b1) / np.where(b2 + b1 == 0, 1.0, b2 + b1)
        return pa.table(
            {
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "ndvi_mean": pa.array(round_half_away(ndvi.mean(axis=1), round_to)),
                "ndvi_min": pa.array(round_half_away(ndvi.min(axis=1), round_to)),
                "ndvi_max": pa.array(round_half_away(ndvi.max(axis=1), round_to)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def mask_stage(ds: ray.data.Dataset, rule: str = "<", threshold: float = 0.5, outval: float = 0.0) -> ray.data.Dataset:
    """mask_raster_multi analogue: pixels failing the rule → outval; output
    keeps the masked tile + count of masked pixels per tile."""
    ops = {"<": np.less, ">": np.greater, "==": np.equal}
    op = ops[rule]

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        hit = op(px, threshold)
        masked = np.where(hit, outval, px).astype(np.float32)
        return pa.table(
            {
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "band_values": pa.array(list(masked), pa.list_(pa.float32())),
                "masked_count": pa.array(hit.sum(axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def temporal_comp(ds_epochs: list[ray.data.Dataset], stat: str = "mean") -> ray.data.Dataset:
    """Depth-wise stat across epochs (raster.py:2287): union the epoch tile
    datasets (each tagged), groupby tile key, nan-stat across the stack."""
    tagged = []
    for i, ds in enumerate(ds_epochs):
        # project to the common (tile key, pixels) schema — union requires it
        tagged.append(
            ds.map_batches(
                lambda b, i=i: b.select(["tile_x", "tile_y", "band_values"]).append_column(
                    "epoch", pa.array(np.full(len(b), i, np.int32))
                ),
                batch_format="pyarrow",
            )
        )
    stacked = tagged[0]
    for t in tagged[1:]:
        stacked = stacked.union(t)
    stacked = stacked.map_batches(_add_tile_part, batch_format="pyarrow")

    fn = {"mean": np.nanmean, "median": np.nanmedian, "max": np.nanmax, "min": np.nanmin, "std": np.nanstd}[stat]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"tile_x": [], "tile_y": [], "band_values": [], "n_epochs": []}
        for (tx, ty), tile_g in g.groupby(["tile_x", "tile_y"], sort=False):
            stack = np.stack([np.asarray(v, np.float64) for v in tile_g["band_values"]])
            rows["tile_x"].append(tx)
            rows["tile_y"].append(ty)
            rows["band_values"].append(fn(stack, axis=0).astype(np.float32))
            rows["n_epochs"].append(len(tile_g))
        return pd.DataFrame(rows)

    return bucket_exchange(stacked, per_part)


def raster2points(ds: ray.data.Dataset, stride: int = 16, nodata: float | None = None) -> ray.data.Dataset:
    """Tile → one row per (strided) pixel (raster.py:1607): flat_map-style
    explode in map_batches. ``stride`` bounds the output blowup; nodata
    pixels dropped like the reference's masked read."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch)
        n, npx = px.shape
        side = int(np.sqrt(npx))
        rows, cols, vals, txs, tys = [], [], [], [], []
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        rr, cc = np.meshgrid(np.arange(0, side, stride), np.arange(0, side, stride), indexing="ij")
        rr, cc = rr.ravel(), cc.ravel()
        for i in range(n):
            v = px[i].reshape(side, side)[rr, cc]
            keep = np.ones(len(v), bool) if nodata is None else v != nodata
            rows.append(rr[keep]); cols.append(cc[keep]); vals.append(v[keep])
            txs.append(np.full(int(keep.sum()), tx[i], np.int32)); tys.append(np.full(int(keep.sum()), ty[i], np.int32))
        return pa.table(
            {
                "tile_x": pa.array(np.concatenate(txs)), "tile_y": pa.array(np.concatenate(tys)),
                "row": pa.array(np.concatenate(rows).astype(np.int32)), "col": pa.array(np.concatenate(cols).astype(np.int32)),
                "value": pa.array(np.concatenate(vals)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def rgb_indices_stage(ds: ray.data.Dataset, round_to: int = 6) -> ray.data.Dataset:
    """rgb_ind / zonal_rgb_idx analogue (raster.py:1355; shape.py:1354-1410):
    three deterministic derived "bands" (R=band, G=1.2·band+0.1,
    B=0.8·band+0.3) → chromaticity + ExG/ExR/CIVE/GLI indices → per-tile
    means. Vectorized per batch, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        r = _pix(batch).astype(np.float64)
        g = 1.2 * r + 0.1
        b = 0.8 * r + 0.3
        tot = np.where(r + g + b == 0, 1.0, r + g + b)
        rr, gg, bb = r / tot, g / tot, b / tot

        def _safe(x):
            return np.where(x == 0, 1.0, x)

        # full _set_rgb_ind family (shape.py:1388-1410) on the chromaticity
        # bands: ExG/ExR/ExGR/CIVE/NDI/RGBVI/VARI/ARI/RGBI/GLI/TGL
        exg = 2 * gg - rr - bb
        exr = 1.4 * rr - gg
        idx = {
            "exg": exg,
            "exr": exr,
            "exgr": exg - exr,
            "cive": 0.441 * rr - 0.811 * gg + 0.385 * bb + 18.78745,
            "ndi": (gg - rr) / _safe(gg + rr),
            "rgbvi": ((gg * gg - bb) * rr) / _safe((gg * gg + bb) * rr),
            "vari": (gg - rr) / _safe(gg + rr) - bb,
            "ari": 1.0 / _safe(gg * rr),
            "rgbi": rr / _safe(gg),
            "gli": (2 * gg - rr - bb) / _safe(2 * gg + rr + bb),
            "tgl": (gg - 0.39) * (rr - 0.61) * bb,
        }
        cols = {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"]}
        for name, v in idx.items():
            # robustness clamp: near-zero chromaticity denominators blow
            # ratio indices to ~1e12, where 6-decimal rounding is no longer
            # representable (x·1e6 > 2^53) — clip keeps the stat meaningful
            v = np.clip(v, -1e6, 1e6)
            cols[f"{name}_mean"] = pa.array(round_half_away(v.mean(axis=1), round_to))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def combine_scene(ds_a: ray.data.Dataset, ds_b: ray.data.Dataset, fill_class: float = 0.0) -> ray.data.Dataset:
    """combine_scene analogue (raster.py:1466): zip two classification
    rasters on the tile key; where A == fill_class take B, else keep A.
    Tile-key groupby zip (the Ray form of aligned-window iteration)."""
    a = ds_a.map_batches(
        lambda b: b.select(["tile_x", "tile_y", "band_values"]).append_column("src", pa.array(np.zeros(len(b), np.int32))),
        batch_format="pyarrow",
    )
    b = ds_b.map_batches(
        lambda t: t.select(["tile_x", "tile_y", "band_values"]).append_column("src", pa.array(np.ones(len(t), np.int32))),
        batch_format="pyarrow",
    )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"tile_x": [], "tile_y": [], "band_values": []}
        for (tx, ty), tile_g in g.groupby(["tile_x", "tile_y"], sort=False):
            tile_g = tile_g.sort_values("src")
            va = np.asarray(tile_g["band_values"].iloc[0], np.float32)
            vb = np.asarray(tile_g["band_values"].iloc[-1], np.float32)
            rows["tile_x"].append(tx)
            rows["tile_y"].append(ty)
            rows["band_values"].append(np.where(va == fill_class, vb, va))
        return pd.DataFrame(rows)

    parted = a.union(b).map_batches(_add_tile_part, batch_format="pyarrow")
    return bucket_exchange(parted, merge_part)


def apply_lut_stage(ds: ray.data.Dataset, lut: dict[int, int], quant: float = 10.0) -> ray.data.Dataset:
    """utilities.apply_lut analogue (utilities.py:1451): quantize pixel →
    integer label, remap through a broadcast LUT (small dict → dense numpy
    array once per actor), per-tile counts of each output label."""
    max_key = max(lut) + 1
    dense = np.arange(max_key, dtype=np.int64)
    for k, v in lut.items():
        dense[k] = v
    ref = ray.put(dense)

    class Apply:
        def __init__(self, r):
            self.dense = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, batch: pa.Table) -> pa.Table:
            px = _pix(batch).astype(np.float64)
            labels = np.clip((px * quant).astype(np.int64), 0, len(self.dense) - 1)
            mapped = self.dense[labels]
            return pa.table(
                {
                    "tile_x": batch["tile_x"],
                    "tile_y": batch["tile_y"],
                    "n_label0": pa.array((mapped == 0).sum(axis=1).astype(np.int64)),
                    "n_label1": pa.array((mapped == 1).sum(axis=1).astype(np.int64)),
                    "n_other": pa.array((mapped > 1).sum(axis=1).astype(np.int64)),
                }
            )

    return ds.map_batches(Apply, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 4))


def geom2pixelbbox(polygons: pa.Table, grid_x: int, grid_y: int, tile_px: int) -> pd.DataFrame:
    """shape.geom2pixelbbox analogue (shape.py:725): polygon WKB → pixel
    bbox under the raster's georeferencing (coordinate→pixel arithmetic,
    shape.py:2589-2590). Driver-side (small polygon table)."""
    from ..functions.geometry import wkb_to_ring
    from ..sources.tiles import X0, X1, Y0, Y1

    px_w = (X1 - X0) / (grid_x * tile_px)
    px_h = (Y1 - Y0) / (grid_y * tile_px)
    rows = []
    for fid, wkb in zip(polygons["feature_id"].to_pylist(), polygons["geometry"].to_pylist()):
        ring = wkb_to_ring(wkb)
        rows.append(
            {
                "feature_id": fid,
                "px_min": int((ring[:, 0].min() - X0) / px_w),
                "px_max": int((ring[:, 0].max() - X0) / px_w),
                "py_min": int((ring[:, 1].min() - Y0) / px_h),
                "py_max": int((ring[:, 1].max() - Y0) / px_h),
            }
        )
    return pd.DataFrame(rows)


def hist_ecdf_lut(ds: ray.data.Dataset, bins: int = 256, lo: float = -2.5, hi: float = 2.5) -> np.ndarray:
    """Pass 1 of hist_match (raster.py:2139): global per-bin pixel counts
    via per-batch bincount partials + tiny driver combine → ECDF LUT."""

    def partial(batch: pa.Table) -> pa.Table:
        px = _pix(batch).ravel().astype(np.float64)
        idx = np.clip(((px - lo) / (hi - lo) * bins).astype(np.int64), 0, bins - 1)
        cnt = np.bincount(idx, minlength=bins)
        return pa.table({"bin": pa.array(np.arange(bins, dtype=np.int64)), "n": pa.array(cnt)})

    hist = ds.map_batches(partial, batch_format="pyarrow").groupby("bin").sum("n").to_pandas()
    hist = hist.sort_values("bin")
    counts = hist[[c for c in hist.columns if c != "bin"][0]].to_numpy(np.float64)
    return np.cumsum(counts) / counts.sum()


def apply_ecdf(ds: ray.data.Dataset, lut: np.ndarray, lo: float = -2.5, hi: float = 2.5) -> ray.data.Dataset:
    """Pass 2: broadcast LUT, per-tile quantile transform."""
    ref = ray.put(lut)

    class Apply:
        def __init__(self, r):
            self.lut = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, batch: pa.Table) -> pa.Table:
            px = _pix(batch).astype(np.float64)
            bins = len(self.lut)
            idx = np.clip(((px - lo) / (hi - lo) * bins).astype(np.int64), 0, bins - 1)
            out = self.lut[idx].astype(np.float32)
            return pa.table(
                {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
                 "band_values": pa.array(list(out), pa.list_(pa.float32()))}
            )

    return ds.map_batches(Apply, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 4))


def rasterize_fraction(ds: ray.data.Dataset, polygons: pa.Table, samples_per_side: int = 8) -> ray.data.Dataset:
    """raster.rasterize analogue (raster.py:1773): burn the polygon layer
    into the tile grid — per tile, the fraction of sample pixel centers
    covered by ≥1 polygon. Broadcast polygon index (STRtree role), exact
    PiP on the sample lattice, vectorized per batch."""
    from ..sources.tiles import tile_bounds

    ref = ray.put(polygons)

    class Burn:
        def __init__(self, r):
            t = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            self.index = PolygonIndex.from_wkb(t["feature_id"].to_numpy(), t["geometry"].to_pylist())

        def __call__(self, batch: pa.Table) -> pa.Table:
            tx = batch["tile_x"].to_numpy().astype(np.int64)
            ty = batch["tile_y"].to_numpy().astype(np.int64)
            minx, miny, maxx, maxy = tile_bounds(tx, ty)
            s = samples_per_side
            frac = np.arange(s) / s + 0.5 / s
            gx = minx[:, None, None] + (maxx - minx)[:, None, None] * frac[None, :, None]
            gy = miny[:, None, None] + (maxy - miny)[:, None, None] * frac[None, None, :]
            px = np.broadcast_to(gx, (len(tx), s, s)).ravel()
            py = np.broadcast_to(gy, (len(tx), s, s)).ravel()
            pt_idx, _ = self.index.query(px, py)
            covered = np.zeros(len(tx) * s * s, bool)
            covered[np.unique(pt_idx)] = True
            cov_frac = covered.reshape(len(tx), s * s).mean(axis=1)
            return pa.table(
                {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
                 "coverage": pa.array(round_half_away(cov_frac, 6))}
            )

    return ds.map_batches(Burn, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 8))


def point_raster_lookup(points: ray.data.Dataset, grid_x: int, grid_y: int, tile_px: int,
                        carry_cols: list[str]) -> ray.data.Dataset:
    """zonal_point analogue (shape.py:2525): point → pixel value lookup via
    coordinate→pixel arithmetic (shape.py:2589-2590) — no shuffle, each
    batch computes its own tile/pixel indices and regenerates the window
    closed-form (the windowed-read actor role on the synthetic raster)."""
    from ..sources.tiles import X0, X1, Y0, Y1, tile_pixels

    tile_w = (X1 - X0) / grid_x
    tile_h = (Y1 - Y0) / grid_y

    class Lookup:
        def __init__(self):
            self.cache: dict[tuple[int, int], np.ndarray] = {}  # open-raster window cache

        def window(self, txy: tuple[int, int]) -> np.ndarray:
            if txy not in self.cache:
                self.cache[txy] = tile_pixels(txy[0], txy[1], tile_px)
            return self.cache[txy]

        def __call__(self, batch: pa.Table) -> pa.Table:
            lon = batch["lon"].to_numpy()
            lat = batch["lat"].to_numpy()
            tx = np.clip(((lon - X0) / tile_w).astype(np.int64), 0, grid_x - 1)
            ty = np.clip(((lat - Y0) / tile_h).astype(np.int64), 0, grid_y - 1)
            px = np.clip(((lon - (X0 + tx * tile_w)) / tile_w * tile_px).astype(np.int64), 0, tile_px - 1)
            py = np.clip(((lat - (Y0 + ty * tile_h)) / tile_h * tile_px).astype(np.int64), 0, tile_px - 1)
            vals = np.empty(len(lon), np.float32)
            for key in set(zip(tx.tolist(), ty.tolist())):
                m = (tx == key[0]) & (ty == key[1])
                vals[m] = self.window(key)[py[m], px[m]]
            out = batch.select(carry_cols)
            return out.append_column("value", pa.array(round_half_away(vals.astype(np.float64), 6)))

    return points.map_batches(Lookup, batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)


def clip_tiles(ds: ray.data.Dataset, minx: float, miny: float, maxx: float, maxy: float) -> ray.data.Dataset:
    """clip_raster analogue (raster.py:1932): bbox predicate on tile bounds
    — the pruning filter that at 100 TB becomes a parquet row-group /
    partition pushdown on tile key ranges."""
    from ..sources.tiles import tile_bounds

    def fn(batch: pa.Table) -> pa.Table:
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        bx0, by0, bx1, by1 = tile_bounds(tx, ty)
        keep = (bx1 > minx) & (bx0 < maxx) & (by1 > miny) & (by0 < maxy)
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def fill_nodata_stage(ds: ray.data.Dataset, nodata: float = 0.0, iterations: int = 2) -> ray.data.Dataset:
    """fill_nodata analogue (raster.py:2051): per-tile neighbor-mean
    interpolation of nodata pixels (iterative 4-neighbor mean). Halo
    exchange across tile borders is documented as the scale path
    (k-ring-style neighbor duplication, cf. stages/knn.py); borders here
    fill from in-tile neighbors only."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n, npx = px.shape
        side = int(np.sqrt(npx))
        out = []
        filled_counts = np.zeros(n, np.int64)
        for i in range(n):
            img = px[i].reshape(side, side).copy()
            hole = img == nodata
            filled_counts[i] = int(hole.sum())
            for _ in range(iterations):
                if not hole.any():
                    break
                pad = np.pad(np.where(hole, np.nan, img), 1, constant_values=np.nan)
                with np.errstate(invalid="ignore"):
                    neigh = np.nanmean(
                        np.stack([pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:]]), axis=0
                    )
                fillable = hole & ~np.isnan(neigh)
                img[fillable] = neigh[fillable]
                hole &= ~fillable
            out.append(img.astype(np.float32).ravel())
        return pa.table(
            {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
             "band_values": pa.array(out, pa.list_(pa.float32())),
             "filled_count": pa.array(filled_counts)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _label_regions(img: np.ndarray) -> np.ndarray:
    """Min-label propagation over 4-neighbors within same value, with
    pointer jumping (labels <- labels[labels], the hook-and-contract step)
    so a serpentine region of path length L converges in O(log L) rounds,
    not O(L); loop runs to convergence with a side*side safety cap."""
    side = img.shape[0]
    labels = np.arange(side * side).reshape(side, side)
    for _ in range(side * side):
        prev = labels.copy()
        for shift, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
            nb = np.roll(labels, shift, axis=axis)
            same = np.roll(img, shift, axis=axis) == img
            if shift == 1:
                if axis == 0:
                    same[0, :] = False
                else:
                    same[:, 0] = False
            else:
                if axis == 0:
                    same[-1, :] = False
                else:
                    same[:, -1] = False
            labels = np.where(same, np.minimum(labels, nb), labels)
        flat = labels.ravel()
        for _ in range(2):  # pointer-jump: label -> label of its label
            flat = np.minimum(flat, flat[flat])
        labels = flat.reshape(side, side)
        if np.array_equal(labels, prev):
            break
    return labels


def polygonize_tiles(ds: ray.data.Dataset, quant: float = 4.0) -> ray.data.Dataset:
    """raster.polygonize analogue (raster.py:1526): connected regions of
    equal (quantized) value per tile → one row per region (label, pixel
    count, pixel bbox). Geometry output is polygonize_rings; cross-tile
    merges are polygonize_merge_count / polygonize_merge_geometry."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n, npx = px.shape
        side = int(np.sqrt(npx))
        rows = {"tile_x": [], "tile_y": [], "region_label": [], "region_value": [],
                "pixel_count": [], "row_min": [], "row_max": [], "col_min": [], "col_max": []}
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        rr, cc = np.divmod(np.arange(side * side), side)
        for i in range(n):
            img = np.floor(px[i].reshape(side, side) * quant)
            labels = _label_regions(img)
            flat = labels.ravel()
            # vectorized per-region stats: sort pixels by region, then one
            # reduceat per stat over contiguous runs (no per-region scans)
            order = np.argsort(flat, kind="stable")
            sorted_lab = flat[order]
            starts = np.flatnonzero(np.r_[True, sorted_lab[1:] != sorted_lab[:-1]])
            counts = np.diff(np.r_[starts, len(sorted_lab)])
            first_px = order[starts]
            rows["tile_x"].append(np.full(len(starts), tx[i], np.int64))
            rows["tile_y"].append(np.full(len(starts), ty[i], np.int64))
            rows["region_label"].append(sorted_lab[starts].astype(np.int64))
            rows["region_value"].append(img.ravel()[first_px] / quant)
            rows["pixel_count"].append(counts.astype(np.int64))
            rows["row_min"].append(np.minimum.reduceat(rr[order], starts))
            rows["row_max"].append(np.maximum.reduceat(rr[order], starts))
            rows["col_min"].append(np.minimum.reduceat(cc[order], starts))
            rows["col_max"].append(np.maximum.reduceat(cc[order], starts))
        if n == 0:
            return pa.table(
                {k: pa.array([], pa.float64() if k == "region_value" else pa.int64())
                 for k in rows}
            )
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def remove_small_objects_stage(ds: ray.data.Dataset, quant: float = 2.0,
                               tbin: int = 1, min_size: int = 6) -> ray.data.Dataset:
    """shape.thresh_seg's remove_small_objects morphology (shape.py:2270-
    2280, skimage.morphology.remove_small_objects with default
    connectivity=1 = 4-neighbors): threshold the quantized tile to a binary
    foreground mask (``floor(v*quant) >= tbin`` — exact integer compare),
    label 4-connected foreground components, drop components with area <
    ``min_size``. Emits the SURVIVING foreground-region inventory per tile
    (label, area, pixel bbox) — the cleaned mask's content, row-hashable
    against the CCL SQL oracle; composes upstream of polygonize /
    rasterize exactly where the reference calls it."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n, npx = px.shape
        side = int(np.sqrt(npx)) if n else 0
        rows = {"tile_x": [], "tile_y": [], "region_label": [], "pixel_count": [],
                "row_min": [], "row_max": [], "col_min": [], "col_max": []}
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        rr, cc = np.divmod(np.arange(npx), side if side else 1)
        for i in range(n):
            mask = (np.floor(px[i].reshape(side, side) * quant) >= tbin)
            labels = _label_regions(mask.astype(np.int64))
            flat = labels.ravel()
            fg = mask.ravel()
            order = np.argsort(flat, kind="stable")
            sorted_lab = flat[order]
            starts = np.flatnonzero(np.r_[True, sorted_lab[1:] != sorted_lab[:-1]])
            counts = np.diff(np.r_[starts, len(sorted_lab)])
            keep = fg[order[starts]] & (counts >= min_size)
            if not keep.any():
                continue
            rows["tile_x"].append(np.full(keep.sum(), tx[i], np.int64))
            rows["tile_y"].append(np.full(keep.sum(), ty[i], np.int64))
            rows["region_label"].append(sorted_lab[starts[keep]].astype(np.int64))
            rows["pixel_count"].append(counts[keep].astype(np.int64))
            rows["row_min"].append(np.minimum.reduceat(rr[order], starts)[keep])
            rows["row_max"].append(np.maximum.reduceat(rr[order], starts)[keep])
            rows["col_min"].append(np.minimum.reduceat(cc[order], starts)[keep])
            rows["col_max"].append(np.maximum.reduceat(cc[order], starts)[keep])
        if not rows["tile_x"]:
            return pa.table({k: pa.array([], pa.int64()) for k in rows})
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def texture_stats(ds: ray.data.Dataset, polygons: pa.Table, levels: int = 8,
                  lo: float = -2.5, hi: float = 2.5, round_to: int = 6) -> ray.data.Dataset:
    """shape.texture_stats analogue (shape.py:1566, graycomatrix
    shape.py:1697-1711): GLCM texture per polygon — contrast / homogeneity /
    energy / entropy of the horizontal co-occurrence matrix over the
    polygon's tile pixels (tile→feature via center PiP, like zonal stats).

    Vectorized: one batched ``np.bincount`` builds ALL tiles' GLCMs at once
    (pair codes offset by tile index); per-feature combine sums raw GLCM
    counts (decomposable!) then derives the props from the summed matrix —
    exactly the masked-region GLCM the reference computes, at tile
    granularity."""
    from ..sources.tiles import tile_bounds

    ref = ray.put(polygons)
    L = levels

    class TileGLCM:
        def __init__(self, r):
            t = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            self.index = PolygonIndex.from_wkb(t["feature_id"].to_numpy(), t["geometry"].to_pylist())

        def __call__(self, batch: pa.Table) -> pa.Table:
            tx = batch["tile_x"].to_numpy().astype(np.int64)
            ty = batch["tile_y"].to_numpy().astype(np.int64)
            minx, miny, maxx, maxy = tile_bounds(tx, ty)
            cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
            tidx, fids = self.index.query(cx, cy)
            if len(tidx) == 0:
                return pa.table({"feature_id": pa.array([], pa.int64()),
                                 "glcm": pa.array([], pa.list_(pa.int64()))})
            px = _pix(batch).astype(np.float64)[tidx]
            n, npx = px.shape
            side = int(np.sqrt(npx))
            q = np.clip(((px - lo) / (hi - lo) * L).astype(np.int64), 0, L - 1).reshape(n, side, side)
            a = q[:, :, :-1].reshape(n, -1)
            b = q[:, :, 1:].reshape(n, -1)
            # symmetric pairs, coded per tile, one global bincount
            code = np.arange(n)[:, None] * (L * L)
            flat = np.concatenate([(code + a * L + b).ravel(), (code + b * L + a).ravel()])
            counts = np.bincount(flat, minlength=n * L * L).reshape(n, L * L)
            return pa.table({"feature_id": pa.array(fids), "glcm": pa.array(list(counts), pa.list_(pa.int64()))})

    partials = ds.map_batches(TileGLCM, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 8))

    def add_partcol(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_part"] = (b["feature_id"].to_numpy(np.int64) % 64).astype(np.int32)
        return b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # full graycoprops set (shape.py:1697-1711): contrast, dissimilarity,
        # homogeneity, energy, correlation + entropy
        rows = {"feature_id": [], "contrast": [], "dissimilarity": [], "homogeneity": [],
                "energy": [], "correlation": [], "entropy": []}
        i_idx, j_idx = np.divmod(np.arange(L * L), L)
        for fid, fg in g.groupby("feature_id", sort=False):
            m = np.sum(np.stack(fg["glcm"].to_numpy()), axis=0).astype(np.float64)
            p = m / m.sum()
            contrast = float(((i_idx - j_idx) ** 2 * p).sum())
            dissim = float((np.abs(i_idx - j_idx) * p).sum())
            homog = float((p / (1.0 + np.abs(i_idx - j_idx))).sum())
            energy = float((p**2).sum())
            mu_i = float((i_idx * p).sum())
            mu_j = float((j_idx * p).sum())
            var_i = float(((i_idx - mu_i) ** 2 * p).sum())
            var_j = float(((j_idx - mu_j) ** 2 * p).sum())
            denom = np.sqrt(var_i * var_j)
            corr = float(((i_idx - mu_i) * (j_idx - mu_j) * p).sum() / denom) if denom > 0 else 1.0
            nz = p[p > 0]
            entropy = float(-(nz * np.log2(nz)).sum())
            rows["feature_id"].append(fid)
            rows["contrast"].append(round_half_away(contrast, round_to))
            rows["dissimilarity"].append(round_half_away(dissim, round_to))
            rows["homogeneity"].append(round_half_away(homog, round_to))
            rows["energy"].append(round_half_away(energy, round_to))
            rows["correlation"].append(round_half_away(corr, round_to))
            rows["entropy"].append(round_half_away(entropy, round_to))
        return pd.DataFrame(rows)

    return bucket_exchange(partials.map_batches(add_partcol, batch_format="pandas"), combine, small_partials=True)


def global_patch(tx: int, ty: int, tile_px: int, pad: int) -> np.ndarray:
    """(tile_px+2·pad)² float64 window around tile (tx, ty) regenerated from
    the global closed form with coordinate CLAMP at the raster border — the
    halo a focal op needs, including diagonal-neighbor corners. On a real
    raster this is the k-ring border-duplication exchange (cf. stages/knn.py);
    here every worker regenerates its halo exactly.

    Bit-parity note: sin/cos are evaluated per-scalar exactly as
    ``tile_pixels`` does, so interior values equal the stored raster and the
    SQL oracle's inlined literals."""
    from ..sources.tiles import GRID_X, GRID_Y

    rows = np.clip(np.arange(ty * tile_px - pad, (ty + 1) * tile_px + pad), 0, GRID_Y * tile_px - 1)
    cols = np.clip(np.arange(tx * tile_px - pad, (tx + 1) * tile_px + pad), 0, GRID_X * tile_px - 1)
    tr, wr = np.divmod(rows, tile_px)
    tc, wc = np.divmod(cols, tile_px)
    sin_c = np.array([np.sin(int(t) * 0.1) for t in tc])
    cos_r = np.array([np.cos(int(t) * 0.1) for t in tr])
    base = sin_c[None, :] + cos_r[:, None]
    grid = ((wr[:, None] * 31 + wc[None, :]) % 97) / 97.0
    return (base + grid).astype(np.float32).astype(np.float64)


# gdal hillshade defaults: azimuth 315°, altitude 45°, z-factor 1
_HS_AZ = float(np.radians(315.0))
_HS_ALT = float(np.radians(45.0))


def gdaldem_stage(ds: ray.data.Dataset, tile_px: int, prop: str = "slope",
                  round_to: int = 6) -> ray.data.Dataset:
    """batch_gdaldem analogue (raster.py:554, prop dispatch at 566:
    slope / aspect / hillshade) — focal ops with a 1-pixel halo
    (global_patch). Per-tile mean of the per-pixel derivative product:

    - slope:     sqrt(gx² + gy²) (central differences)
    - aspect:    degrees(atan2(gy, -gx)) mod 360
    - hillshade: 255·(sin(alt)·cos(s) + cos(alt)·sin(s)·cos(az − a)),
      clipped at 0, with s = atan(slope), a = aspect in radians
      (the published GDAL hillshade formula, defaults az=315° alt=45°).
    """
    if prop not in ("slope", "aspect", "hillshade"):
        raise ValueError(prop)
    colname = {"slope": "mean_slope", "aspect": "mean_aspect", "hillshade": "mean_hillshade"}[prop]
    deg = float(np.degrees(1.0))

    def fn(batch: pa.Table) -> pa.Table:
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        out = np.empty(len(tx), np.float64)
        for i in range(len(tx)):
            padded = global_patch(int(tx[i]), int(ty[i]), tile_px, 1)
            gx = (padded[1:-1, 2:] - padded[1:-1, :-2]) / 2.0
            gy = (padded[2:, 1:-1] - padded[:-2, 1:-1]) / 2.0
            if prop == "slope":
                # sqrt(gx²+gy²), not np.hypot: hypot's overflow-safe path
                # rounds differently from the SQL oracle's SQRT
                out[i] = np.sqrt(gx * gx + gy * gy).mean()
            elif prop == "aspect":
                asp = np.mod(np.arctan2(gy, -gx) * deg + 360.0, 360.0)
                out[i] = asp.mean()
            else:
                s = np.arctan(np.sqrt(gx * gx + gy * gy))
                a = np.arctan2(gy, -gx)
                hs = 255.0 * (np.sin(_HS_ALT) * np.cos(s)
                              + np.cos(_HS_ALT) * np.sin(s) * np.cos(_HS_AZ - a))
                out[i] = np.maximum(hs, 0.0).mean()
        return pa.table(
            {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
             colname: pa.array(round_half_away(out, round_to))}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def slope_stage(ds: ray.data.Dataset, tile_px: int, round_to: int = 6) -> ray.data.Dataset:
    """batch_gdaldem slope (see gdaldem_stage)."""
    return gdaldem_stage(ds, tile_px, prop="slope", round_to=round_to)


def quegan_stage(ds: ray.data.Dataset, tile_px: int, round_to: int = 6) -> ray.data.Dataset:
    """Quegan multi-temporal SAR filter analogue (raster.py:2219
    multi_temp_filter): per epoch a local spatial mean E_k (3×3 box, halo
    via global_patch), ratio r_k = I_k/E_k, cross-epoch mean ratio ρ, and
    filtered output E_k·ρ. Epoch 2 is the deterministic derived band
    1.5·I + 0.25 (the engine's stand-in for a second acquisition, cf.
    ndvi_stage). Output: per-tile mean of the filtered epoch-1 image."""

    def fn(batch: pa.Table) -> pa.Table:
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        out = np.empty(len(tx), np.float64)
        for i in range(len(tx)):
            w0 = global_patch(int(tx[i]), int(ty[i]), tile_px, 1)
            w1 = 1.5 * w0 + 0.25
            means = []
            ratios = []
            for w in (w0, w1):
                s = np.zeros((tile_px, tile_px))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        s = s + w[1 + dy : 1 + dy + tile_px, 1 + dx : 1 + dx + tile_px]
                e = s / 9.0
                c = w[1:-1, 1:-1]
                means.append(e)
                ratios.append(np.where(e == 0, 1.0, c / np.where(e == 0, 1.0, e)))
            rho = (ratios[0] + ratios[1]) / 2.0
            out[i] = (means[0] * rho).mean()
        return pa.table(
            {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
             "mean_filtered": pa.array(round_half_away(out, round_to))}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def temp_match(ds: ray.data.Dataset, polygons: pa.Table, grid_x: int, grid_y: int,
               round_to: int = 6) -> pd.DataFrame:
    """temp_match analogue (utilities.py:1110): each polygon's masked raster
    patch becomes a template, matched by zero-normalized cross-correlation
    against the whole raster; the reference returns full correlation maps,
    here reduced to the per-feature correlation PEAK.

    Distributed shape: the heavy pass is a per-tile mean aggregation over
    the tiles Dataset (the "gray image" at tile granularity — exact, sums
    of float32 in float64); the ZNCC of the tiny per-feature templates
    (≤4×4 tiles) over the 64×32 mean image is a driver-side finish, like
    the hist_match LUT combine. Pixel-granularity matching would use the
    same pattern with global_patch halos."""
    from ..sources.tiles import tile_bounds

    # pass 1 (distributed): per-tile means — exact (float32 sums in float64)
    def tile_mean(b: pa.Table) -> pa.Table:
        px = _pix(b).astype(np.float64)
        return pa.table({"tile_x": b["tile_x"], "tile_y": b["tile_y"],
                         "m": pa.array(px.mean(axis=1))})

    tm = ds.map_batches(tile_mean, batch_format="pyarrow").to_pandas()
    M = np.full((grid_y, grid_x), np.nan)
    M[tm["tile_y"].to_numpy(), tm["tile_x"].to_numpy()] = tm["m"].to_numpy()

    # tile centers → feature membership (same map as zonal_tile_stats)
    txg, tyg = np.meshgrid(np.arange(grid_x), np.arange(grid_y), indexing="ij")
    minx, miny, maxx, maxy = tile_bounds(txg.ravel().astype(np.int64), tyg.ravel().astype(np.int64))
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    index = PolygonIndex.from_wkb(polygons["feature_id"].to_numpy(), polygons["geometry"].to_pylist())
    pt_idx, fids = index.query(cx, cy)
    rows = []
    for fid in np.unique(fids):
        sel = pt_idx[fids == fid]
        ftx, fty = txg.ravel()[sel], tyg.ravel()[sel]
        tx0, ty0 = int(ftx.min()), int(fty.min())
        dx, dy = ftx - tx0, fty - ty0
        th, tw = int(dy.max()) + 1, int(dx.max()) + 1
        tvals = M[fty, ftx]
        n = len(tvals)
        st, stt = tvals.sum(), (tvals * tvals).sum()
        # all positions at once: (npos, ncells) gather, expanded ZNCC sums
        pys, pxs = np.meshgrid(np.arange(grid_y - th + 1), np.arange(grid_x - tw + 1), indexing="ij")
        pys, pxs = pys.ravel(), pxs.ravel()
        W = M[pys[:, None] + dy[None, :], pxs[:, None] + dx[None, :]]
        sw = W.sum(axis=1)
        sww = (W * W).sum(axis=1)
        swt = (W * tvals[None, :]).sum(axis=1)
        num = swt - sw * st / n
        den2 = (sww - sw * sw / n) * (stt - st * st / n)
        corr = np.where(den2 > 0, num / np.sqrt(np.where(den2 > 0, den2, 1.0)), 0.0)
        k = int(np.argmax(corr))  # first occurrence = smallest (py, px)
        rows.append({"feature_id": int(fid), "peak_tile_x": int(pxs[k]), "peak_tile_y": int(pys[k]),
                     "peak_corr": round_half_away(float(corr[k]), round_to)})
    return pd.DataFrame(rows)


def _region_node_ids(tx: np.ndarray, ty: np.ndarray, label: np.ndarray, side: int) -> np.ndarray:
    """Globally-unique int64 region node ids: (tile packed) * side² + the
    per-tile region label (min pixel flat index, unique within a tile)."""
    return (tx.astype(np.int64) * (1 << 21) + ty.astype(np.int64)) * (side * side) + label.astype(np.int64)


def _border_pairs(regions: ray.data.Dataset, side: int, num_buckets: int) -> ray.data.Dataset:
    """Cross-tile adjacency pairs for region rows carrying (tile key, label,
    value, pixel bbox): regions touching a tile border emit narrow border-
    segment rows keyed by the shared-border identity; a bucketed groupby
    joins the two sides with one vectorized merge per bucket (same-value +
    interval overlap ⇒ adjacency). Shared by the count and geometry merges."""
    from ..functions.hashing import splitmix64

    def border_rows(b: pd.DataFrame) -> pd.DataFrame:
        tx = b["tile_x"].to_numpy(np.int64)
        ty = b["tile_y"].to_numpy(np.int64)
        node = _region_node_ids(tx, ty, b["region_label"].to_numpy(np.int64), side)
        val = b["region_value"].to_numpy(np.float64)
        rmin = b["row_min"].to_numpy(np.int64)
        rmax = b["row_max"].to_numpy(np.int64)
        cmin = b["col_min"].to_numpy(np.int64)
        cmax = b["col_max"].to_numpy(np.int64)
        frames = []
        for mask, bx, by, orient, flag, lo, hi in (
            (cmax == side - 1, tx + 1, ty, 0, 0, rmin, rmax),   # right edge, A side
            (cmin == 0, tx, ty, 0, 1, rmin, rmax),              # left edge, B side
            (rmax == side - 1, tx, ty + 1, 1, 0, cmin, cmax),   # top edge
            (rmin == 0, tx, ty, 1, 1, cmin, cmax),              # bottom edge
        ):
            if mask.any():
                frames.append(pd.DataFrame({
                    "bx": bx[mask], "by": by[mask], "orient": orient, "flag": flag,
                    "region_value": val[mask], "node": node[mask],
                    "lo": lo[mask], "hi": hi[mask],
                }))
        if not frames:
            return pd.DataFrame({k: pd.Series([], dtype=np.int64) for k in
                                 ("bx", "by", "orient", "flag", "node", "lo", "hi")}).assign(
                region_value=pd.Series([], dtype=np.float64))
        return pd.concat(frames, ignore_index=True)

    def bucket_border(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        key = (b["bx"].to_numpy(np.int64) * 131071 + b["by"].to_numpy(np.int64) * 2 + b["orient"].to_numpy(np.int64))
        b["_bkt"] = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return b

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["flag"] == 0]
        bb = g[g["flag"] == 1]
        m = a.merge(bb, on=["bx", "by", "orient", "region_value"], suffixes=("_a", "_b"))
        m = m[(m["lo_a"] <= m["hi_b"]) & (m["hi_a"] >= m["lo_b"])]
        return pd.DataFrame({"id_a": m["node_a"].to_numpy(np.int64), "id_b": m["node_b"].to_numpy(np.int64)})

    narrow = regions.map_batches(
        lambda b: b[["tile_x", "tile_y", "region_label", "region_value",
                     "row_min", "row_max", "col_min", "col_max"]],
        batch_format="pandas",
    )
    return bucket_exchange(
        narrow.map_batches(border_rows, batch_format="pandas")
        .map_batches(bucket_border, batch_format="pandas"),
        pairs_per_bucket, key="_bkt",
    )


def polygonize_merge_count(regions: ray.data.Dataset, side: int,
                           num_buckets: int = 64) -> ray.data.Dataset:
    """Cross-tile region merge for polygonize (reference: cross-tile
    `raster.polygonize` semantics, raster.py:1526) — fully distributed:

    1. border-adjacency pairs: each region touching a tile border emits a
       narrow border-segment row keyed by the shared-border identity;
       a bucketed groupby joins the two sides with ONE vectorized merge
       per bucket (same-value + row/col-interval overlap ⇒ adjacency);
    2. components: ``dedup.connected_components`` (bucketed min-label
       propagation with pointer jumping — no driver materialization);
    3. totals: labels ⋈ region pixel counts (bucketed hash join; regions
       without a cross-tile neighbor keep their own node id), then a
       coarse-bucket sum per global region.

    Returns a Dataset of (global_region:int64, pixel_count:int64)."""
    from .dedup import connected_components

    pairs = _border_pairs(regions, side, num_buckets)
    comp = connected_components(pairs, num_buckets=num_buckets)
    return _aggregate_components(regions, comp, side, num_buckets, with_nreg=False)


def _aggregate_components(regions: ray.data.Dataset, comp: ray.data.Dataset, side: int,
                          num_buckets: int, with_nreg: bool) -> ray.data.Dataset:
    """Shared merge-totals step: component labels ⋈ region pixel counts
    (bucketed hash join on the node id; regions without an edge keep their
    own node id), pre-aggregated per bucket, then a coarse-bucket sum per
    global region. ``with_nreg`` adds the merged-region member count."""
    from ..functions.hashing import splitmix64

    aggs = {"pixel_count": "sum", "n_regions": "sum"} if with_nreg else {"pixel_count": "sum"}

    def region_nodes(b: pd.DataFrame) -> pd.DataFrame:
        node = _region_node_ids(b["tile_x"].to_numpy(np.int64), b["tile_y"].to_numpy(np.int64),
                                b["region_label"].to_numpy(np.int64), side)
        return pd.DataFrame({"k": node, "v": b["pixel_count"].to_numpy(np.int64), "t": np.int8(0)})

    def comp_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["node"].to_numpy(np.int64),
                             "v": b["component_id"].to_numpy(np.int64), "t": np.int8(1)})

    def bucket_k(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = (splitmix64(b["k"].to_numpy().astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return b

    def attach_component(g: pd.DataFrame) -> pd.DataFrame:
        reg = g[g["t"] == 0]
        lab = g[g["t"] == 1]
        m = reg.merge(lab[["k", "v"]].rename(columns={"v": "component"}), on="k", how="left")
        comp_id = m["component"].fillna(m["k"]).astype(np.int64)  # singletons keep own id
        # pre-aggregate within the bucket before the component shuffle
        out = pd.DataFrame({"global_region": comp_id, "pixel_count": m["v"].to_numpy(np.int64)})
        if with_nreg:
            out["n_regions"] = np.int64(1)
        return out.groupby("global_region", sort=False).agg(aggs).reset_index()

    def bucket_region(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = (splitmix64(b["global_region"].to_numpy().astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return b

    def sum_per_region(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("global_region", sort=False).agg(aggs).reset_index()

    tagged = regions.map_batches(region_nodes, batch_format="pandas").union(
        comp.map_batches(comp_rows, batch_format="pandas")
    ).map_batches(bucket_k, batch_format="pandas")
    partial = bucket_exchange(tagged, attach_component, key="_bkt")
    return bucket_exchange(partial.map_batches(bucket_region, batch_format="pandas"),
                           sum_per_region, key="_bkt")


def _loops_to_wkb(loops: list[np.ndarray], side: int, grid_x: int, grid_y: int) -> bytes:
    """Pixel-corner loops → georeferenced WKB POLYGON: outer ring = largest
    |signed area| loop first, remaining loops as interior rings."""
    from ..functions.geometry import rings_to_wkb
    from ..functions.tracing import loop_signed_area
    from ..sources.tiles import X0, X1, Y0, Y1

    px_w = (X1 - X0) / (grid_x * side)
    px_h = (Y1 - Y0) / (grid_y * side)
    order = np.argsort([-abs(loop_signed_area(lp)) for lp in loops], kind="stable")
    geo = []
    for i in order:
        lp = loops[i].astype(np.float64)
        geo.append(np.column_stack([X0 + lp[:, 0] * px_w, Y0 + lp[:, 1] * px_h]))
    return rings_to_wkb(geo)


def polygonize_rings(ds: ray.data.Dataset, quant: float = 4.0,
                     grid_x: int | None = None, grid_y: int | None = None) -> ray.data.Dataset:
    """polygonize with GEOMETRY output (raster.polygonize, raster.py:1526 —
    gdal.Polygonize emits exact pixel-edge polygons): per tile region, the
    directed boundary-edge multiset is traced into closed loops
    (functions/tracing.py) and serialized as a georeferenced WKB POLYGON
    (outer ring + holes). Rows also carry the inventory columns and the raw
    integer edge multiset, so ``polygonize_merge_geometry`` can dissolve
    shared tile borders by exact edge cancellation downstream.

    Invariant (Green's theorem, tested): the sum of signed loop areas of a
    region's boundary equals its pixel count."""
    from ..functions import tracing
    from ..sources.tiles import GRID_X, GRID_Y

    gx_n = grid_x if grid_x is not None else GRID_X
    gy_n = grid_y if grid_y is not None else GRID_Y

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n, npx = px.shape
        side = int(np.sqrt(npx))
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        rr, cc = np.divmod(np.arange(side * side), side)
        rows: dict[str, list] = {k: [] for k in (
            "tile_x", "tile_y", "region_label", "region_value", "pixel_count",
            "row_min", "row_max", "col_min", "col_max", "n_loops", "area_px",
            "geometry", "edges")}
        for i in range(n):
            img = np.floor(px[i].reshape(side, side) * quant)
            flat = _label_regions(img).ravel()
            order = np.argsort(flat, kind="stable")
            sorted_lab = flat[order]
            starts = np.flatnonzero(np.r_[True, sorted_lab[1:] != sorted_lab[:-1]])
            bounds = np.r_[starts, len(sorted_lab)]
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                cells = order[s0:s1]
                gr = rr[cells] + int(ty[i]) * side
                gc = cc[cells] + int(tx[i]) * side
                edges = tracing.region_edges(gr, gc)
                loops = tracing.chain_loops(edges)
                area = sum(tracing.loop_signed_area(lp) for lp in loops)
                rows["tile_x"].append(int(tx[i]))
                rows["tile_y"].append(int(ty[i]))
                rows["region_label"].append(int(sorted_lab[s0]))
                rows["region_value"].append(float(img.ravel()[cells[0]] / quant))
                rows["pixel_count"].append(int(s1 - s0))
                rows["row_min"].append(int(rr[cells].min()))
                rows["row_max"].append(int(rr[cells].max()))
                rows["col_min"].append(int(cc[cells].min()))
                rows["col_max"].append(int(cc[cells].max()))
                rows["n_loops"].append(len(loops))
                rows["area_px"].append(float(area))
                rows["geometry"].append(_loops_to_wkb(loops, side, gx_n, gy_n))
                rows["edges"].append(edges.astype(np.int32).tobytes())
        return pa.table(
            {
                **{k: pa.array(rows[k], pa.int64()) for k in
                   ("tile_x", "tile_y", "region_label", "pixel_count",
                    "row_min", "row_max", "col_min", "col_max", "n_loops")},
                "region_value": pa.array(rows["region_value"], pa.float64()),
                "area_px": pa.array(rows["area_px"], pa.float64()),
                "geometry": pa.array(rows["geometry"], pa.binary()),
                "edges": pa.array(rows["edges"], pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def polygonize_merge_geometry(rings: ray.data.Dataset, side: int,
                              num_buckets: int = 64,
                              grid_x: int | None = None, grid_y: int | None = None) -> ray.data.Dataset:
    """Cross-tile polygonize with dissolved GEOMETRY (the other half of
    raster.polygonize semantics): same distributed component machinery as
    polygonize_merge_count, but each merged region concatenates its member
    edge multisets, cancels the opposite-direction pairs on shared tile
    borders exactly (integer corners), and re-chains the remainder into the
    union's boundary loops → one WKB POLYGON per global region."""
    from ..functions import tracing
    from ..functions.hashing import splitmix64
    from ..sources.tiles import GRID_X, GRID_Y
    from .dedup import connected_components

    gx_n = grid_x if grid_x is not None else GRID_X
    gy_n = grid_y if grid_y is not None else GRID_Y
    pairs = _border_pairs(rings, side, num_buckets)
    comp = connected_components(pairs, num_buckets=num_buckets)

    def region_rows(b: pd.DataFrame) -> pd.DataFrame:
        node = _region_node_ids(b["tile_x"].to_numpy(np.int64), b["tile_y"].to_numpy(np.int64),
                                b["region_label"].to_numpy(np.int64), side)
        return pd.DataFrame({"k": node, "pc": b["pixel_count"].to_numpy(np.int64),
                             "edges": b["edges"], "t": np.int8(0)})

    def comp_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["node"].to_numpy(np.int64),
                             "pc": b["component_id"].to_numpy(np.int64),
                             "edges": b"", "t": np.int8(1)})

    def bucket_k(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = (splitmix64(b["k"].to_numpy().astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return b

    def attach_component(g: pd.DataFrame) -> pd.DataFrame:
        reg = g[g["t"] == 0]
        lab = g[g["t"] == 1][["k", "pc"]].rename(columns={"pc": "component"})
        m = reg.merge(lab, on="k", how="left")
        comp_id = m["component"].fillna(m["k"]).astype(np.int64)
        return pd.DataFrame({"global_region": comp_id, "pc": m["pc"].to_numpy(np.int64),
                             "edges": m["edges"]})

    def bucket_region(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = (splitmix64(b["global_region"].to_numpy().astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return b

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"global_region": [], "pixel_count": [], "n_loops": [], "area_px": [], "geometry": []}
        for gr_id, fg in g.groupby("global_region", sort=False):
            blobs = [e for e in fg["edges"] if len(e)]
            edges = (np.concatenate([np.frombuffer(e, np.int32).reshape(-1, 4) for e in blobs])
                     .astype(np.int64) if blobs else np.zeros((0, 4), np.int64))
            edges = tracing.cancel_opposite(edges)
            loops = tracing.chain_loops(edges)
            area = sum(tracing.loop_signed_area(lp) for lp in loops)
            rows["global_region"].append(int(gr_id))
            rows["pixel_count"].append(int(fg["pc"].sum()))
            rows["n_loops"].append(len(loops))
            rows["area_px"].append(float(area))
            rows["geometry"].append(_loops_to_wkb(loops, side, gx_n, gy_n) if loops else b"")
        return pd.DataFrame(rows)

    tagged = rings.map_batches(region_rows, batch_format="pandas").union(
        comp.map_batches(comp_rows, batch_format="pandas")
    ).map_batches(bucket_k, batch_format="pandas")
    merged = bucket_exchange(tagged, attach_component, key="_bkt")
    return bucket_exchange(merged.map_batches(bucket_region, batch_format="pandas"),
                           assemble, key="_bkt")


def reproject_points(ds: ray.data.Dataset, carry_cols: list[str]) -> ray.data.Dataset:
    """batchwarp analogue (raster.py:2591): vectorized equirectangular →
    Web-Mercator (EPSG:3857) reprojection of point rows — the coordinate
    transform kernel a warp applies per pixel, expressed per row."""
    R = 6378137.0

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = np.clip(batch["lat"].to_numpy(), -85.05112878, 85.05112878)
        x = np.radians(lon) * R
        y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * R
        out = batch.select(carry_cols)
        return out.append_column("merc_x", pa.array(round_half_away(x, 3))).append_column(
            "merc_y", pa.array(round_half_away(y, 3))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_UTM_A = 6378137.0
_UTM_F = 1.0 / 298.257223563
_UTM_N = _UTM_F / (2.0 - _UTM_F)
_UTM_K0 = 0.9996
_UTM_AA = _UTM_A / (1.0 + _UTM_N) * (1.0 + _UTM_N ** 2 / 4.0 + _UTM_N ** 4 / 64.0)
_UTM_A1 = _UTM_N / 2.0 - 2.0 * _UTM_N ** 2 / 3.0 + 5.0 * _UTM_N ** 3 / 16.0
_UTM_A2 = 13.0 * _UTM_N ** 2 / 48.0 - 3.0 * _UTM_N ** 3 / 5.0
_UTM_A3 = 61.0 * _UTM_N ** 3 / 240.0
_UTM_C1 = 2.0 * np.sqrt(_UTM_N) / (1.0 + _UTM_N)


def utm_forward(lon: np.ndarray, lat: np.ndarray):
    """WGS84 → UTM forward transform (Karney 2011 "Transverse Mercator
    with an accuracy of a few nanometers", the order-3 Krüger series —
    sub-mm over a UTM zone). Zone from longitude, southern-hemisphere
    false northing. sinh/cosh/atanh/asinh are spelled as exp/ln
    compositions so the SQL oracle evaluates the IDENTICAL float chain
    (CLAUDE.md: restate the expression, don't trust two libms to agree).
    """
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    zone = np.clip(np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1, 1, 60)
    lon0 = zone * 6.0 - 183.0
    la = lat * np.radians(1.0)
    lp = (lon - lon0) * np.radians(1.0)
    s = np.sin(la)
    ath = 0.5 * np.log((1.0 + s) / (1.0 - s)) - _UTM_C1 * 0.5 * np.log(
        (1.0 + _UTM_C1 * s) / (1.0 - _UTM_C1 * s))
    t = (np.exp(ath) - np.exp(-ath)) / 2.0
    cl = np.cos(lp)
    xi_p = np.arctan2(t, cl)
    w = np.sin(lp) / np.sqrt(t * t + cl * cl)
    eta_p = np.log(w + np.sqrt(w * w + 1.0))
    xi = xi_p
    eta = eta_p
    for j, aj in ((1, _UTM_A1), (2, _UTM_A2), (3, _UTM_A3)):
        e2j = np.exp(2.0 * j * eta_p)
        ch = (e2j + 1.0 / e2j) / 2.0
        sh = (e2j - 1.0 / e2j) / 2.0
        xi = xi + aj * np.sin(2.0 * j * xi_p) * ch
        eta = eta + aj * np.cos(2.0 * j * xi_p) * sh
    e = 500000.0 + _UTM_K0 * _UTM_AA * eta
    nn = _UTM_K0 * _UTM_AA * xi + np.where(lat < 0.0, 10000000.0, 0.0)
    return zone, e, nn


_UTM_B1 = _UTM_N / 2.0 - 2.0 * _UTM_N ** 2 / 3.0 + 37.0 * _UTM_N ** 3 / 96.0
_UTM_B2 = _UTM_N ** 2 / 48.0 + _UTM_N ** 3 / 15.0
_UTM_B3 = 17.0 * _UTM_N ** 3 / 480.0


def utm_inverse(zone: np.ndarray, e: np.ndarray, n: np.ndarray,
                south: np.ndarray, newton_iters: int = 8):
    """UTM → WGS84 inverse (Karney's reverse Krüger series, order-3 beta
    coefficients), the per-pixel kernel of the warp's inverse mapping
    (raster.py:2634 _quickwarp resamples target→source). The geodetic
    latitude solves tanh(atanh(s) − e·atanh(e·s)) = sin(χ) by a FIXED
    ``newton_iters`` Newton iterations (deterministic at any parallelism;
    quadratic convergence — machine precision by iteration 4)."""
    eta = (np.asarray(e, np.float64) - 500000.0) / (_UTM_K0 * _UTM_AA)
    xi = (np.asarray(n, np.float64) - np.where(south, 10000000.0, 0.0)) / (_UTM_K0 * _UTM_AA)
    xi_p = xi
    eta_p = eta
    for j, bj in ((1, _UTM_B1), (2, _UTM_B2), (3, _UTM_B3)):
        e2j = np.exp(2.0 * j * eta)
        ch = (e2j + 1.0 / e2j) / 2.0
        sh = (e2j - 1.0 / e2j) / 2.0
        xi_p = xi_p - bj * np.sin(2.0 * j * xi) * ch
        eta_p = eta_p - bj * np.cos(2.0 * j * xi) * sh
    e2 = np.exp(eta_p)
    sh_eta = (e2 - 1.0 / e2) / 2.0
    cos_xi = np.cos(xi_p)
    lam = np.arctan2(sh_eta, cos_xi)
    tp = np.sin(xi_p) / np.sqrt(sh_eta * sh_eta + cos_xi * cos_xi)
    sp = tp / np.sqrt(1.0 + tp * tp)  # sin of the conformal latitude
    s = sp.copy()
    c = _UTM_C1
    for _ in range(newton_iters):
        psi = 0.5 * np.log((1.0 + s) / (1.0 - s)) - c * 0.5 * np.log((1.0 + c * s) / (1.0 - c * s))
        ep = np.exp(psi)
        th = (ep - 1.0 / ep) / (ep + 1.0 / ep)
        deriv = (1.0 - th * th) * (1.0 / (1.0 - s * s) - c * c / (1.0 - c * c * s * s))
        s = np.clip(s - (th - sp) / deriv, -0.999999999, 0.999999999)
    lat = np.degrees(np.arcsin(s))
    lon = (np.asarray(zone, np.float64) * 6.0 - 183.0) + np.degrees(lam)
    return lon, lat


def reproject_points_utm(ds: ray.data.Dataset, carry_cols: list[str]) -> ray.data.Dataset:
    """batchwarp general-CRS analogue (raster.py:2591 / _quickwarp 2634):
    the reference's dominant target CRS is UTM (Sentinel/Landsat scenes);
    this is the per-point forward kernel a warp applies per pixel. Full
    float64 output; see ``utm_forward`` for the series and the oracle-
    parity float chain."""

    def fn(batch: pa.Table) -> pa.Table:
        zone, e, nn = utm_forward(batch["lon"].to_numpy(), batch["lat"].to_numpy())
        out = batch.select(carry_cols)
        return (out.append_column("utm_zone", pa.array(zone))
                   .append_column("utm_e", pa.array(e))
                   .append_column("utm_n", pa.array(nn)))

    return ds.map_batches(fn, batch_format="pyarrow")


def warp_target_spec(tile_px: int, zone: int, e0: float, n0: float, step: float,
                     out_w: int, out_h: int, south: bool = False) -> pd.DataFrame:
    """Inverse-map a CONSTANT UTM target grid to source pixel indices —
    the warp's target→source mapping table (bounded: out_w×out_h rows,
    data-independent). Pixel centers at (e0+(c+.5)·step, n0+(r+.5)·step)."""
    from ..sources.tiles import GRID_X, GRID_Y

    r, c = np.divmod(np.arange(out_h * out_w, dtype=np.int64), out_w)
    e = e0 + (c + 0.5) * step
    n = n0 + (r + 0.5) * step
    lon, lat = utm_inverse(np.full(len(r), zone, np.int64), e, n,
                           np.full(len(r), south, bool))
    gc = np.floor((lon + 180.0) / 360.0 * (GRID_X * tile_px)).astype(np.int64)
    gr = np.floor((lat + 80.0) / 160.0 * (GRID_Y * tile_px)).astype(np.int64)
    ok = (gc >= 0) & (gc < GRID_X * tile_px) & (gr >= 0) & (gr < GRID_Y * tile_px)
    tx, px_ = np.divmod(gc[ok], tile_px)
    ty, py_ = np.divmod(gr[ok], tile_px)
    return pd.DataFrame({"tgt_row": r[ok], "tgt_col": c[ok], "tile_x": tx,
                         "tile_y": ty, "py": py_, "px": px_,
                         "lon": lon[ok], "lat": lat[ok]})


def warp_tiles_utm(ds: ray.data.Dataset, tile_px: int, zone: int, e0: float,
                   n0: float, step: float, out_w: int, out_h: int,
                   south: bool = False) -> ray.data.Dataset:
    """batchwarp/_quickwarp analogue (raster.py:2591,2634) as a REAL warp:
    nearest-neighbor resample of the source mosaic onto a UTM target grid
    by inverse mapping (exactly gdalwarp's target→source shape). The
    target spec is a bounded constant — ``ray.put`` once, read per task —
    and the SOURCE tiles stream: each tile batch emits the target pixels
    it owns, so the stage scales with the source, never materializes the
    mosaic, and needs no shuffle. For target grids too large to
    broadcast, bucket the spec rows by source tile through the exchange
    instead (same broadcast-vs-bucket-join tradeoff as PiP)."""
    spec = warp_target_spec(tile_px, zone, e0, n0, step, out_w, out_h, south)
    by_tile = {
        (int(tx), int(ty)): (g["tgt_row"].to_numpy(), g["tgt_col"].to_numpy(),
                             (g["py"].to_numpy() * tile_px + g["px"].to_numpy()))
        for (tx, ty), g in spec.groupby(["tile_x", "tile_y"], sort=False)
    }
    ref = ray.put(by_tile)

    def fn(batch: pa.Table, r=ref) -> pd.DataFrame:
        lut = ray.get(r) if isinstance(r, ray.ObjectRef) else r
        px = _pix(batch)
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        rows, cols, vals = [], [], []
        for i in range(len(batch)):
            hit = lut.get((int(tx[i]), int(ty[i])))
            if hit is None:
                continue
            tr, tc, flat = hit
            rows.append(tr)
            cols.append(tc)
            vals.append(px[i][flat])
        if not rows:
            return pd.DataFrame({"tgt_row": pd.Series([], dtype=np.int64),
                                 "tgt_col": pd.Series([], dtype=np.int64),
                                 "value": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"tgt_row": np.concatenate(rows),
                             "tgt_col": np.concatenate(cols),
                             "value": np.concatenate(vals).astype(np.float64)})

    return ds.map_batches(fn, batch_format="pyarrow")


class WindowReader:
    """Windowed-read actor — the Ray analogue of holding one open GDAL
    dataset per worker and reading 256² windows on demand
    (raster.py:373-422). The "file" here is the closed-form synthetic
    raster; ``__call__`` materializes pixels for a batch of window specs."""

    def __init__(self, tile_px: int):
        self.tile_px = tile_px  # the open-dataset state

    def __call__(self, batch: pa.Table) -> pa.Table:
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        vals = [tile_pixels(int(x), int(y), self.tile_px).ravel() for x, y in zip(tx, ty)]
        return batch.append_column("band_values", pa.array(vals, pa.list_(pa.float32())))


def windowed_read(manifest: ray.data.Dataset, tile_px: int, concurrency=(1, 8)) -> ray.data.Dataset:
    return manifest.map_batches(
        WindowReader, fn_constructor_args=(tile_px,), batch_format="pyarrow",
        batch_size=128, concurrency=concurrency, num_cpus=1,
    )


def zonal_tile_stats(ds: ray.data.Dataset, polygons: pa.Table, grid_x: int, grid_y: int,
                     round_to: int = 6) -> ray.data.Dataset:
    """Raster↔vector: per-polygon stats over tile pixels whose tile bbox
    center-intersects the polygon (zonal_stats semantics at tile
    granularity, shape.py:837). Broadcast polygon index; per-batch emit
    (feature_id, tile partials) then combine per feature."""
    ref = ray.put(polygons)

    class TileZonal:
        def __init__(self, r):
            t = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            self.index = PolygonIndex.from_wkb(t["feature_id"].to_numpy(), t["geometry"].to_pylist())

        def __call__(self, batch: pa.Table) -> pa.Table:
            tx = batch["tile_x"].to_numpy().astype(np.int64)
            ty = batch["tile_y"].to_numpy().astype(np.int64)
            minx, miny, maxx, maxy = tile_bounds(tx, ty)
            cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
            tidx, fids = self.index.query(cx, cy)
            px = _pix(batch).astype(np.float64)
            sel = px[tidx]
            return pa.table(
                {
                    "feature_id": pa.array(fids),
                    "n": pa.array(np.full(len(tidx), sel.shape[1] if sel.size else 0, np.int64)),
                    "s": pa.array(sel.sum(axis=1) if sel.size else np.zeros(0)),
                    "mn": pa.array(sel.min(axis=1) if sel.size else np.zeros(0)),
                    "mx": pa.array(sel.max(axis=1) if sel.size else np.zeros(0)),
                }
            )

    partials = ds.map_batches(TileZonal, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 8))
    from ray.data.aggregate import Max, Min, Sum

    combined = partials.groupby("feature_id").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"),
        Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "feature_id": b["feature_id"],
                "pixel_count": b["n"].astype(np.int64),
                "mean_value": round_half_away((b["s"] / b["n"]).to_numpy(), round_to),
                "min_value": round_half_away(b["mn"].to_numpy(), round_to),
                "max_value": round_half_away(b["mx"].to_numpy(), round_to),
            }
        )

    return combined.map_batches(finalize, batch_format="pandas")


def otsu_zone_stage(ds: ray.data.Dataset, polygons: pa.Table, bins: int = 64,
                    lo: float = -2.0, hi: float = 3.0, round_to: int = 6) -> ray.data.Dataset:
    """shape.thresh_seg analogue (shape.py:2246, threshold_otsu at 2368):
    per-polygon-zone Otsu foreground/background threshold over the zone's
    tile pixels (tile→feature via center PiP, as zonal/texture stats).

    Partials are per-(feature, batch) histograms — decomposable, so the
    exchange moves ``bins`` counts per (feature, block), never pixels. The
    combine derives the Otsu argmax from the summed histogram with exact
    integer arithmetic: between-class variance at cut t is
    ``(s0*N - w0*S)^2 / (w0*(N-w0))`` with every product < 2^53, so the
    float64 score (and the argmax, ties broken to the smallest bin) is
    bit-reproducible — the SQL oracle computes the identical expression.

    The reference's remove_small_objects morphology is
    ``remove_small_objects_stage`` (this module), composing on the binary
    mask exactly where shape.py:2270-2280 applies it.
    """
    ref = ray.put(polygons)
    B = int(bins)
    span = hi - lo

    class TileZoneHist:
        def __init__(self, r):
            t = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            self.index = PolygonIndex.from_wkb(t["feature_id"].to_numpy(), t["geometry"].to_pylist())

        def __call__(self, batch: pa.Table) -> pa.Table:
            tx = batch["tile_x"].to_numpy().astype(np.int64)
            ty = batch["tile_y"].to_numpy().astype(np.int64)
            minx, miny, maxx, maxy = tile_bounds(tx, ty)
            cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
            tidx, fids = self.index.query(cx, cy)
            if len(tidx) == 0:
                return pa.table({"feature_id": pa.array([], pa.int64()),
                                 "hist": pa.array([], pa.list_(pa.int64()))})
            px = _pix(batch).astype(np.float64)[tidx]
            n = px.shape[0]
            q = np.clip(((px - lo) / span * B).astype(np.int64), 0, B - 1)
            code = np.arange(n)[:, None] * B + q
            counts = np.bincount(code.ravel(), minlength=n * B).reshape(n, B)
            # pre-sum per feature inside the batch (combiner): one row per fid
            order = np.argsort(fids, kind="stable")
            sfids = np.asarray(fids)[order]
            starts = np.flatnonzero(np.r_[True, sfids[1:] != sfids[:-1]])
            summed = np.add.reduceat(counts[order], starts, axis=0)
            return pa.table({"feature_id": pa.array(sfids[starts].astype(np.int64)),
                             "hist": pa.array(list(summed), pa.list_(pa.int64()))})

    partials = ds.map_batches(TileZoneHist, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 8))

    def add_partcol(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_part"] = (b["feature_id"].to_numpy(np.int64) % 64).astype(np.int32)
        return b

    idx = np.arange(B, dtype=np.int64)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"feature_id": [], "thresh_bin": [], "thresh_value": [],
                "n_pix": [], "fg_count": [], "fg_frac": []}
        for fid, fg_ in g.groupby("feature_id", sort=False):
            c = np.sum(np.stack(fg_["hist"].to_numpy()), axis=0).astype(np.int64)
            N = int(c.sum())
            S = int((idx * c).sum())
            w0 = np.cumsum(c)
            s0 = np.cumsum(idx * c)
            valid = (w0 > 0) & (w0 < N)
            num = (s0 * N - w0 * S).astype(np.float64)
            den = np.where(valid, w0 * (N - w0), 1).astype(np.float64)
            score = np.where(valid, num * num / den, -np.inf)
            t = int(np.argmax(score))
            fg = int(N - w0[t])
            rows["feature_id"].append(int(fid))
            rows["thresh_bin"].append(t)
            rows["thresh_value"].append(round_half_away(lo + (t + 1) * (span / B), round_to))
            rows["n_pix"].append(N)
            rows["fg_count"].append(fg)
            rows["fg_frac"].append(round_half_away(fg / N, round_to))
        out = pd.DataFrame(rows)
        for col in ("feature_id", "thresh_bin", "n_pix", "fg_count"):
            out[col] = out[col].astype(np.int64)
        return out

    return bucket_exchange(partials.map_batches(add_partcol, batch_format="pandas"), combine, small_partials=True)


def _patch_mask_q(tx: int, ty: int, tile_px: int, pad: int, levels: int,
                  lo: float, span: float) -> tuple[np.ndarray, np.ndarray]:
    """Quantized (tile_px+2·pad)² patch around tile (tx, ty) with a validity
    mask: entries outside the raster are 0/False (NOT clamped — local
    threshold windows shrink at the border, matching SQL ROWS BETWEEN)."""
    from ..sources.tiles import GRID_X, GRID_Y

    rows = np.arange(ty * tile_px - pad, (ty + 1) * tile_px + pad)
    cols = np.arange(tx * tile_px - pad, (tx + 1) * tile_px + pad)
    rmask = (rows >= 0) & (rows < GRID_Y * tile_px)
    cmask = (cols >= 0) & (cols < GRID_X * tile_px)
    rc = np.clip(rows, 0, GRID_Y * tile_px - 1)
    cc = np.clip(cols, 0, GRID_X * tile_px - 1)
    tr, wr = np.divmod(rc, tile_px)
    tc, wc = np.divmod(cc, tile_px)
    sin_c = np.array([np.sin(int(t) * 0.1) for t in tc])
    cos_r = np.array([np.cos(int(t) * 0.1) for t in tr])
    base = sin_c[None, :] + cos_r[:, None]
    grid = ((wr[:, None] * 31 + wc[None, :]) % 97) / 97.0
    vals = (base + grid).astype(np.float32).astype(np.float64)
    q = np.clip((vals - lo) / span * levels, 0, None).astype(np.int64)
    np.clip(q, 0, levels - 1, out=q)
    mask = rmask[:, None] & cmask[None, :]
    q[~mask] = 0
    return q, mask.astype(np.int64)


def _box2d(a: np.ndarray, w: int) -> np.ndarray:
    """Exact integer w×w box sum; input padded by w//2, output inner size."""
    c = np.zeros((a.shape[0] + 1, a.shape[1] + 1), np.int64)
    np.cumsum(np.cumsum(a, axis=0), axis=1, out=c[1:, 1:])
    return c[w:, w:] - c[:-w, w:] - c[w:, :-w] + c[:-w, :-w]


def local_thresh_stage(ds: ray.data.Dataset, tile_px: int, algo: str = "niblack",
                       window: int = 5, k: float | None = None, levels: int = 64,
                       lo: float = -2.0, hi: float = 3.0, round_to: int = 6) -> ray.data.Dataset:
    """shape.thresh_seg local-threshold variants (shape.py:2267 algo
    dispatch: threshold_niblack / threshold_sauvola at 2370-2372): per-pixel
    adaptive threshold over a w×w neighborhood of the QUANTIZED image
    (integer levels — box sums of q and q² stay exact integers, so the
    engine and the SQL oracle derive bit-identical m, s and thresholds).

    - niblack: T = m + k·s                      (k default −0.2)
    - sauvola: T = m·(1 + k·(s/R − 1)), R = levels/2   (k default 0.2)

    Windows SHRINK at the raster border (mask-weighted counts), the exact
    semantics of two separable SQL ``ROWS BETWEEN p PRECEDING AND p
    FOLLOWING`` passes — unlike gdaldem_stage's clamped halo. Output: one
    row per tile with the foreground pixel count (q > T) and mean threshold.
    """
    if algo == "niblack":
        kk = -0.2 if k is None else k
    elif algo == "sauvola":
        kk = 0.2 if k is None else k
    else:
        raise ValueError(algo)
    R = levels / 2.0
    pad = window // 2
    span = hi - lo
    colname = f"fg_count_{algo}"

    def fn(batch: pa.Table) -> pa.Table:
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        fg = np.empty(len(tx), np.int64)
        mt = np.empty(len(tx), np.float64)
        for i in range(len(tx)):
            q, m = _patch_mask_q(int(tx[i]), int(ty[i]), tile_px, pad, levels, lo, span)
            sv = _box2d(q, window)
            sq = _box2d(q * q, window)
            cnt = _box2d(m, window)
            mean = sv.astype(np.float64) / cnt.astype(np.float64)
            s = np.sqrt((sq * cnt - sv * sv).astype(np.float64)) / cnt.astype(np.float64)
            if algo == "niblack":
                T = mean + kk * s
            else:
                T = mean * (1.0 + kk * (s / R - 1.0))
            center = q[pad:q.shape[0] - pad, pad:q.shape[1] - pad] if pad else q
            fg[i] = int((center > T).sum())
            mt[i] = T.mean()
        return pa.table(
            {"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
             colname: pa.array(fg),
             "mean_thresh": pa.array(round_half_away(mt, round_to))}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def ragmerge_count(ds: ray.data.Dataset, side: int, quant: float = 2.0, thresh: float = 0.4,
                   wscale: float = 64.0, num_buckets: int = 64, grid_x: int | None = None,
                   grid_y: int | None = None) -> ray.data.Dataset:
    """utilities.ragmerge analogue (utilities.py:842: rag_boundary +
    merge_hierarchical), restated as skimage ``graph.cut_threshold``
    semantics (the flat-threshold RAG cut — deterministic and
    order-independent, where hierarchical merge is inherently sequential):

    1. regions = per-tile CCL labels of the quantized image (the
       polygonize segmentation);
    2. boundary weight between adjacent regions = MEAN of
       ``floor(|v_a − v_b|·wscale + 0.5)`` over their shared 4-neighbor
       boundary pixel pairs — the raw-value gradient (the reference's
       sobel edge map role), quantized to 1/wscale steps so per-pair sums
       stay exact integers and the SQL oracle bit-matches;
    3. edges with mean weight < thresh·wscale merge via the distributed
       ``dedup.connected_components`` (same-value cross-tile pairs have
       weight 0, so split-at-tile-border regions always re-merge).

    Each (region_a, region_b) boundary lies along exactly one tile (or one
    tile border, computed by the left/top tile regenerating + labeling its
    neighbor from the closed form — on a real raster this is a 1-tile halo
    read, cf. global_patch), so pair weights are FINAL after the map pass:
    the threshold filter runs map-side and only surviving (id_a, id_b)
    edges enter the exchange. Output: (global_region, pixel_count,
    n_regions) per merged region.
    """
    from .dedup import connected_components
    from ..sources.tiles import GRID_X, GRID_Y

    gx_lim = GRID_X if grid_x is None else grid_x
    gy_lim = GRID_Y if grid_y is None else grid_y

    def pairs_fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n, npx = px.shape
        assert npx == side * side
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        ua, va = [], []

        def emit(node_a, node_b, val_a, val_b):
            diff = node_a != node_b
            if not diff.any():
                return
            u = np.minimum(node_a[diff], node_b[diff])
            v = np.maximum(node_a[diff], node_b[diff])
            w = np.floor(np.abs(val_a[diff] - val_b[diff]) * wscale + 0.5).astype(np.int64)
            order = np.lexsort((v, u))
            u, v, w = u[order], v[order], w[order]
            new = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
            starts = np.flatnonzero(new)
            sw = np.add.reduceat(w, starts)
            cnt = np.diff(np.r_[starts, len(w)])
            keep = sw / cnt < thresh * wscale
            ua.append(u[starts][keep])
            va.append(v[starts][keep])

        for i in range(n):
            vals = px[i].reshape(side, side)
            img = np.floor(vals * quant)
            labels = _label_regions(img)
            node = _region_node_ids(tx[i : i + 1], ty[i : i + 1], np.int64(0), side)[0] + labels
            emit(node[:, :-1].ravel(), node[:, 1:].ravel(), vals[:, :-1].ravel(), vals[:, 1:].ravel())
            emit(node[:-1, :].ravel(), node[1:, :].ravel(), vals[:-1, :].ravel(), vals[1:, :].ravel())
            if tx[i] + 1 < gx_lim:
                vals_r = tile_pixels(int(tx[i]) + 1, int(ty[i]), side).astype(np.float64)
                node_r = _region_node_ids(tx[i : i + 1] + 1, ty[i : i + 1], np.int64(0), side)[0] + _label_regions(np.floor(vals_r * quant))
                emit(node[:, -1], node_r[:, 0], vals[:, -1], vals_r[:, 0])
            if ty[i] + 1 < gy_lim:
                vals_b = tile_pixels(int(tx[i]), int(ty[i]) + 1, side).astype(np.float64)
                node_b = _region_node_ids(tx[i : i + 1], ty[i : i + 1] + 1, np.int64(0), side)[0] + _label_regions(np.floor(vals_b * quant))
                emit(node[-1, :], node_b[0, :], vals[-1, :], vals_b[0, :])
        if not ua:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(ua)), "id_b": pa.array(np.concatenate(va))})

    regions = polygonize_tiles(ds, quant=quant)
    pairs = ds.map_batches(pairs_fn, batch_format="pyarrow")
    comp = connected_components(pairs, num_buckets=num_buckets)
    return _aggregate_components(regions, comp, side, num_buckets, with_nreg=True)


def ransac_lines_stage(ds: ray.data.Dataset, side: int, edge_thresh: float = 0.25,
                       trials: int = 64, residual: float = 1.0) -> ray.data.Dataset:
    """utilities.ransac_lines analogue (utilities.py:1559, _do_ransac at
    1504-1533): per-tile robust line fit on edge pixels.

    - canny edge mask → closed-form stand-in: squared gradient magnitude of
      within-tile clamped central differences > ``edge_thresh``;
    - RANSAC's random 2-point draws → DETERMINISTIC splitmix64 draws keyed
      by (tile, trial) over the ascending edge-point index list
      (data-dependent RNG is not oracle-able and varies with Ray block
      structure — the id-hash sampling pattern, cf. ivf_build_centroids);
    - inlier test: perpendicular distance ≤ residual, evaluated as the
      EXACT integer comparison cross² ≤ residual²·norm² on pixel coords;
    - best model: max inlier count, ties to the smallest trial index.

    Output per tile: edge count, best trial, its two support-point flat
    pixel indices, and the inlier count — all integers (strict oracle).
    """
    from ..functions.hashing import splitmix64

    r2 = residual * residual
    T = trials

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        cols = {"n_edge": np.empty(n_tiles, np.int64), "best_trial": np.empty(n_tiles, np.int64),
                "support_a": np.empty(n_tiles, np.int64), "support_b": np.empty(n_tiles, np.int64),
                "inliers": np.empty(n_tiles, np.int64)}
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            gx = np.empty_like(v)
            gx[:, 1:-1] = (v[:, 2:] - v[:, :-2]) / 2.0
            gx[:, 0] = (v[:, 1] - v[:, 0]) / 2.0
            gx[:, -1] = (v[:, -1] - v[:, -2]) / 2.0
            gy = np.empty_like(v)
            gy[1:-1, :] = (v[2:, :] - v[:-2, :]) / 2.0
            gy[0, :] = (v[1, :] - v[0, :]) / 2.0
            gy[-1, :] = (v[-1, :] - v[-2, :]) / 2.0
            idx = np.flatnonzero((gx * gx + gy * gy > edge_thresh).ravel())
            n = len(idx)
            if n < 2:
                cols["n_edge"][i] = n
                cols["best_trial"][i] = -1
                cols["support_a"][i] = -1
                cols["support_b"][i] = -1
                cols["inliers"][i] = 0
                continue
            ys, xs = np.divmod(idx, side)
            key = np.uint64((tx[i] * (1 << 21) + ty[i]) * 2 * T)
            k2 = np.arange(T, dtype=np.uint64) * np.uint64(2)
            h1 = (splitmix64(key + k2) % np.uint64(n)).astype(np.int64)
            h2r = (splitmix64(key + k2 + np.uint64(1)) % np.uint64(n - 1)).astype(np.int64)
            h2 = h2r + (h2r >= h1)
            x1, y1 = xs[h1], ys[h1]
            dx = xs[h2] - x1
            dy = ys[h2] - y1
            norm2 = dx * dx + dy * dy
            cross = dx[:, None] * (ys[None, :] - y1[:, None]) - dy[:, None] * (xs[None, :] - x1[:, None])
            inl = (cross * cross <= r2 * norm2[:, None]).sum(axis=1)
            best = int(np.argmax(inl))
            cols["n_edge"][i] = n
            cols["best_trial"][i] = best
            cols["support_a"][i] = idx[h1[best]]
            cols["support_b"][i] = idx[h2[best]]
            cols["inliers"][i] = inl[best]
        return pa.table({"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
                         **{k: pa.array(a) for k, a in cols.items()}})

    return ds.map_batches(fn, batch_format="pyarrow")


def hough_lines_stage(ds: ray.data.Dataset, side: int, edge_thresh: float = 0.1,
                      n_orient: int = 12) -> ray.data.Dataset:
    """utilities.houghseg analogue (utilities.py:112, Robb et al. 2020
    field-plot segmentation): per-tile Hough line peak over the
    gradient-magnitude edge mask (the canny stand-in shared with
    ransac_lines_stage). Accumulator over (orientation, rho) bins:
    rho = floor(x·cosθ + y·sinθ + 0.5) with θ_j = jπ/n_orient — cos/sin
    evaluated once in numpy and inlined as literals in the SQL oracle, so
    the bin codes are bit-identical. Peak = max votes, ties broken by
    (θ asc, rho asc). Output per tile: edge count, peak orientation bin,
    peak rho bin, votes — all integers (strict oracle)."""
    ang = np.pi * np.arange(n_orient) / n_orient
    cosv, sinv = np.cos(ang), np.sin(ang)
    rmax = int(np.ceil(side * np.sqrt(2.0))) + 1
    width = 2 * rmax + 1

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        out = {"n_edge": np.empty(n_tiles, np.int64), "peak_theta": np.empty(n_tiles, np.int64),
               "peak_rho": np.empty(n_tiles, np.int64), "votes": np.empty(n_tiles, np.int64)}
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            gx = np.empty_like(v)
            gx[:, 1:-1] = (v[:, 2:] - v[:, :-2]) / 2.0
            gx[:, 0] = (v[:, 1] - v[:, 0]) / 2.0
            gx[:, -1] = (v[:, -1] - v[:, -2]) / 2.0
            gy = np.empty_like(v)
            gy[1:-1, :] = (v[2:, :] - v[:-2, :]) / 2.0
            gy[0, :] = (v[1, :] - v[0, :]) / 2.0
            gy[-1, :] = (v[-1, :] - v[-2, :]) / 2.0
            idx = np.flatnonzero((gx * gx + gy * gy > edge_thresh).ravel())
            out["n_edge"][i] = len(idx)
            if len(idx) == 0:
                out["peak_theta"][i] = -1
                out["peak_rho"][i] = 0
                out["votes"][i] = 0
                continue
            ys, xs = np.divmod(idx, side)
            rho = np.floor(xs[None, :] * cosv[:, None] + ys[None, :] * sinv[:, None] + 0.5).astype(np.int64)
            code = np.arange(n_orient)[:, None] * width + (rho + rmax)
            votes = np.bincount(code.ravel(), minlength=n_orient * width)
            best = int(np.argmax(votes))  # first max = smallest (theta, rho)
            out["peak_theta"][i] = best // width
            out["peak_rho"][i] = best % width - rmax
            out["votes"][i] = votes[best]
        return pa.table({"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
                         **{k: pa.array(a) for k, a in out.items()}})

    return ds.map_batches(fn, batch_format="pyarrow")


def _cross_min(u: np.ndarray) -> np.ndarray:
    """3×3 cross-SE erosion with shrinking borders: min over the available
    {center, left, right, up, down} = min(row-min3, col-min3)."""
    r = u.copy()
    r[:, 1:] = np.minimum(r[:, 1:], u[:, :-1])
    r[:, :-1] = np.minimum(r[:, :-1], u[:, 1:])
    c = u.copy()
    c[1:, :] = np.minimum(c[1:, :], u[:-1, :])
    c[:-1, :] = np.minimum(c[:-1, :], u[1:, :])
    return np.minimum(r, c)


def _cross_max(u: np.ndarray) -> np.ndarray:
    r = u.copy()
    r[:, 1:] = np.maximum(r[:, 1:], u[:, :-1])
    r[:, :-1] = np.maximum(r[:, :-1], u[:, 1:])
    c = u.copy()
    c[1:, :] = np.maximum(c[1:, :], u[:-1, :])
    c[:-1, :] = np.maximum(c[:-1, :], u[1:, :])
    return np.maximum(r, c)


def ms_acwe_stage(ds: ray.data.Dataset, side: int, iterations: int = 5,
                  round_to: int = 6, lambda1: float = 1.0, lambda2: float = 1.0,
                  init: str = "circle", init_thresh: float = 0.5) -> ray.data.Dataset:
    """shape.ms_snake analogue (shape.py:2016: morphsnakes ACWE over a
    polygon init) and utilities.do_ac's morphological_chan_vese core
    (utilities.py:296/378: threshold or checkerboard init + λ1/λ2
    weights), as one deterministic pipeline form — fixed-iteration
    morphological Chan-Vese (ACWE, Márquez-Neila et al., PAMI 2014):

    - init: ``circle`` (2x − (side−1))² + (2y − (side−1))² ≤ (2·side/3)²
      (exact integer test), ``threshold`` v < init_thresh (do_ac's
      ``img < thresh``), or ``checkerboard`` (x//4 + y//4) % 2
      (checkerboard_level_set);
    - per iteration: region means c1/c2 (empty side → 0.0), level-set
      update u = [λ1·(v − c1)² < λ2·(v − c2)²], then ONE morphological
      smoothing pass — opening (dilate∘erode) on odd iterations, closing
      on even, with a 3×3 cross SE evaluated as min/max of the separable
      3-windows, shrinking at tile borders.

    Every mean is an exact-sum ratio and every mask update compares
    identical float64 expressions, so the unrolled SQL oracle
    bit-matches. The reference's GUI-driven per-polygon refinement loops
    (ms_toposnakes / shape.snake) stay out of scope; this is the batch
    ACWE core. Output per tile: final foreground count + rounded inside
    mean."""
    R2 = (2 * side // 3) ** 2

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        ys, xs = np.divmod(np.arange(side * side), side)
        if init == "circle":
            init_m = ((2 * xs - (side - 1)) ** 2 + (2 * ys - (side - 1)) ** 2 <= R2).reshape(side, side)
        elif init == "checkerboard":
            init_m = ((xs // 4 + ys // 4) % 2 == 1).reshape(side, side)
        elif init != "threshold":
            raise ValueError(init)
        fg = np.empty(n_tiles, np.int64)
        mean_in = np.empty(n_tiles, np.float64)
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            S = v.sum()
            npx_t = side * side
            u = (v < init_thresh).astype(np.float64) if init == "threshold" else init_m.astype(np.float64)
            for t in range(1, iterations + 1):
                n1 = u.sum()
                s1 = (v * u).sum()
                c1 = s1 / n1 if n1 > 0 else 0.0
                c2 = (S - s1) / (npx_t - n1) if n1 < npx_t else 0.0
                u = (lambda1 * ((v - c1) * (v - c1)) < lambda2 * ((v - c2) * (v - c2))).astype(np.float64)
                if t % 2 == 1:
                    u = _cross_max(_cross_min(u))
                else:
                    u = _cross_min(_cross_max(u))
            n1 = u.sum()
            s1 = (v * u).sum()
            fg[i] = int(n1)
            mean_in[i] = round_half_away(s1 / n1 if n1 > 0 else 0.0, round_to)
        return pa.table({"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
                         "fg_count": pa.array(fg), "mean_in": pa.array(mean_in)})

    return ds.map_batches(fn, batch_format="pyarrow")


def ms_gac_stage(ds: ray.data.Dataset, side: int, iterations: int = 5,
                 alpha: float = 8.0, theta: float = 0.3, balloon: int = 1,
                 round_to: int = 6) -> ray.data.Dataset:
    """ms_snake's ``algo="GAC"`` path (shape.py:2016/2070: morphsnakes
    geodesic active contours, Márquez-Neila et al. PAMI 2014) as its
    deterministic per-tile pipeline form:

    - stopping function g = 1/sqrt(1 + alpha·|∇v|²) from the shared
      clamped central differences (the inverse-gradient edge map; sigma=0
      — no gaussian wheel in this environment, documented deviation);
    - circle init (the ACWE one);
    - per iteration: balloon (cross-SE dilation for balloon>0, erosion
      for <0, applied where g > theta/|balloon|), image attachment
      u ← 1 where ∇u·∇g > 0 / 0 where < 0 (central diffs of u and g,
      same clamp), then the alternating opening/closing smoothing pass
      shared with ms_acwe_stage.

    Every comparison is between identical float64 expressions, so the
    unrolled SQL oracle bit-matches. Output: final foreground count +
    rounded mean stopping-function value inside the contour."""
    R2 = (2 * side // 3) ** 2
    thr = theta / abs(balloon) if balloon != 0 else np.inf

    def grad(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        gx = np.empty_like(a)
        gx[:, 1:-1] = (a[:, 2:] - a[:, :-2]) / 2.0
        gx[:, 0] = (a[:, 1] - a[:, 0]) / 2.0
        gx[:, -1] = (a[:, -1] - a[:, -2]) / 2.0
        gy = np.empty_like(a)
        gy[1:-1, :] = (a[2:, :] - a[:-2, :]) / 2.0
        gy[0, :] = (a[1, :] - a[0, :]) / 2.0
        gy[-1, :] = (a[-1, :] - a[-2, :]) / 2.0
        return gx, gy

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        ys, xs = np.divmod(np.arange(side * side), side)
        circ = ((2 * xs - (side - 1)) ** 2 + (2 * ys - (side - 1)) ** 2 <= R2).reshape(side, side)
        fg = np.empty(n_tiles, np.int64)
        mean_g = np.empty(n_tiles, np.float64)
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            vx, vy = grad(v)
            g = 1.0 / np.sqrt(1.0 + alpha * (vx * vx + vy * vy))
            dgx, dgy = grad(g)
            bmask = g > thr
            u = circ.astype(np.float64)
            for t in range(1, iterations + 1):
                if balloon > 0:
                    aux = _cross_max(u)
                elif balloon < 0:
                    aux = _cross_min(u)
                else:
                    aux = u
                u = np.where(bmask, aux, u)
                dux, duy = grad(u)
                dot = dux * dgx + duy * dgy
                u = np.where(dot > 0, 1.0, np.where(dot < 0, 0.0, u))
                if t % 2 == 1:
                    u = _cross_max(_cross_min(u))
                else:
                    u = _cross_min(_cross_max(u))
            n1 = u.sum()
            s1 = (g * u).sum()
            fg[i] = int(n1)
            mean_g[i] = round_half_away(s1 / n1 if n1 > 0 else 0.0, round_to)
        return pa.table({"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
                         "fg_count": pa.array(fg), "mean_g_in": pa.array(mean_g)})

    return ds.map_batches(fn, batch_format="pyarrow")


def multiband_gif_stage(ds: ray.data.Dataset, side: int, lo: float = -2.0,
                        hi: float = 3.0, delay_cs: int = 20) -> ray.data.Dataset:
    """multiband2gif analogue (raster.py:2665: bands → animated gif via
    imageio). Bands per tile are the engine's derived epochs (base,
    1.5·v + 0.25 — the quegan second acquisition — and 0.5·v − 0.1),
    quantized to 8-bit over [lo, hi] and encoded as an animated GIF89a by
    the in-repo pure-python LZW writer (functions/gifenc.py; round-trip
    tested — no codec wheel exists in this sandbox). Binary output →
    rows-only oracle, like the WKB queries."""
    from ..functions.gifenc import encode_gif

    span = hi - lo

    def q8(v: np.ndarray) -> np.ndarray:
        return np.clip((v - lo) / span * 256.0, 0, 255).astype(np.uint8)

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        gifs, lens = [], []
        for i in range(px.shape[0]):
            v = px[i].reshape(side, side)
            frames = [q8(v), q8(1.5 * v + 0.25), q8(0.5 * v - 0.1)]
            g = encode_gif(frames, delay_cs=delay_cs)
            gifs.append(g)
            lens.append(len(g))
        return pa.table({"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
                         "gif": pa.array(gifs, pa.binary()),
                         "gif_len": pa.array(np.array(lens, np.int64)),
                         "n_frames": pa.array(np.full(len(gifs), 3, np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256)


def snake_stage(ds: ray.data.Dataset, side: int, n_points: int = 40,
                iterations: int = 5, alpha: float = 0.1, beta: float = 0.01,
                kappa: float = 1.0, dt: float = 0.5, round_to: int = 6) -> ray.data.Dataset:
    """shape.snake analogue (shape.py:1734: skimage active_contour — the
    Kass et al. 1988 snake deforming a polygon on raster values), as its
    deterministic batch form: an EXPLICIT-Euler snake (the implicit
    pentadiagonal solve would need a dense matvec whose summation order
    can't be replicated in SQL; the explicit form keeps every update a
    fixed-order scalar expression, so the oracle is bit-exact):

    - init: circle of n points around the tile center, radius side/3
      (cos/sin literals shared with the oracle);
    - per iteration, per point: elasticity α·(p₋₁ − 2p + p₊₁), rigidity
      β·(p₋₂ − 4p₋₁ + 6p − 4p₊₁ + p₊₂) (closed-ring indices), image force
      κ·∇v bilinear-interpolated at the point from the clamped
      central-difference gradient grids, Euler step dt, coordinates
      clamped to the tile;
    - output: one row PER CONTROL POINT (tile, point_id, x, y rounded) —
      no cross-point reductions, so engine and SQL values are the same
      float64 expression chains end to end."""

    def grad2(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        gx = np.empty_like(a)
        gx[:, 1:-1] = (a[:, 2:] - a[:, :-2]) / 2.0
        gx[:, 0] = (a[:, 1] - a[:, 0]) / 2.0
        gx[:, -1] = (a[:, -1] - a[:, -2]) / 2.0
        gy = np.empty_like(a)
        gy[1:-1, :] = (a[2:, :] - a[:-2, :]) / 2.0
        gy[0, :] = (a[1, :] - a[0, :]) / 2.0
        gy[-1, :] = (a[-1, :] - a[-2, :]) / 2.0
        return gx, gy

    ang = 2.0 * np.pi * np.arange(n_points) / n_points
    cosv, sinv = np.cos(ang), np.sin(ang)
    c0 = (side - 1) / 2.0
    r0 = side / 3.0

    def bilin(g: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        x0 = np.minimum(np.floor(x), side - 2).astype(np.int64)
        y0 = np.minimum(np.floor(y), side - 2).astype(np.int64)
        tx = x - x0
        ty = y - y0
        return ((1.0 - ty) * ((1.0 - tx) * g[y0, x0] + tx * g[y0, x0 + 1])
                + ty * ((1.0 - tx) * g[y0 + 1, x0] + tx * g[y0 + 1, x0 + 1]))

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        txc = batch["tile_x"].to_numpy()
        tyc = batch["tile_y"].to_numpy()
        cols = {"tile_x": [], "tile_y": [], "point_id": [], "x": [], "y": []}
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            gx, gy = grad2(v)
            x = c0 + r0 * cosv
            y = c0 + r0 * sinv
            for _ in range(iterations):
                xm1, xp1 = np.roll(x, 1), np.roll(x, -1)
                xm2, xp2 = np.roll(x, 2), np.roll(x, -2)
                ym1, yp1 = np.roll(y, 1), np.roll(y, -1)
                ym2, yp2 = np.roll(y, 2), np.roll(y, -2)
                fx = bilin(gx, x, y)
                fy = bilin(gy, x, y)
                nx = x + dt * (alpha * (xm1 - 2.0 * x + xp1)
                               - beta * (xm2 - 4.0 * xm1 + 6.0 * x - 4.0 * xp1 + xp2)
                               + kappa * fx)
                ny = y + dt * (alpha * (ym1 - 2.0 * y + yp1)
                               - beta * (ym2 - 4.0 * ym1 + 6.0 * y - 4.0 * yp1 + yp2)
                               + kappa * fy)
                x = np.minimum(np.maximum(nx, 0.0), float(side - 1))
                y = np.minimum(np.maximum(ny, 0.0), float(side - 1))
            cols["tile_x"].append(np.full(n_points, txc[i], np.int64))
            cols["tile_y"].append(np.full(n_points, tyc[i], np.int64))
            cols["point_id"].append(np.arange(n_points, dtype=np.int64))
            cols["x"].append(round_half_away(x, round_to))
            cols["y"].append(round_half_away(y, round_to))
        return pa.table({k: pa.array(np.concatenate(vv)) for k, vv in cols.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def _simple_point_lut() -> np.ndarray:
    """256-entry lookup: neighborhood config (8 bits, offsets row-major
    around the center) → is the center a SIMPLE point (its flip preserves
    both object and background topology, (8,4)-connectivity: T8(object)=1
    and T4(background)=1, Bertrand's characterization). Brute-force over
    the 3×3 graph — computed once, inlined in the SQL oracle."""
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    lut = np.zeros(256, np.int64)
    for cfg in range(256):
        nb = {offs[k]: (cfg >> k) & 1 for k in range(8)}
        obj = [o for o, b in nb.items() if b]
        bg4 = [o for o in ((-1, 0), (0, -1), (0, 1), (1, 0)) if not nb[o]]
        # T8: 8-connected components of object neighbors
        seen: set = set()
        t8 = 0
        for o in obj:
            if o in seen:
                continue
            t8 += 1
            stack = [o]
            while stack:
                c = stack.pop()
                if c in seen:
                    continue
                seen.add(c)
                for d in obj:
                    if d not in seen and abs(d[0] - c[0]) <= 1 and abs(d[1] - c[1]) <= 1:
                        stack.append(d)
        # T4: 4-connected components (within the 8-neighborhood) of
        # background pixels, counting only components 4-adjacent to center
        bg = [o for o, b in nb.items() if not b]
        seen4: set = set()
        t4 = 0
        for o in bg4:
            if o in seen4:
                continue
            t4 += 1
            stack = [o]
            while stack:
                c = stack.pop()
                if c in seen4:
                    continue
                seen4.add(c)
                for d in bg:
                    if d not in seen4 and abs(d[0] - c[0]) + abs(d[1] - c[1]) == 1:
                        stack.append(d)
        lut[cfg] = 1 if (t8 == 1 and t4 == 1) else 0
    return lut


_SP_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _sp_nb_code(u: np.ndarray, side: int) -> np.ndarray:
    """8-bit neighborhood code per pixel (out-of-tile = background)."""
    p = np.zeros((side + 2, side + 2), np.int64)
    p[1:-1, 1:-1] = u.astype(np.int64)
    code = np.zeros((side, side), np.int64)
    for k, (dy, dx) in enumerate(_SP_OFFS):
        code |= p[1 + dy : side + 1 + dy, 1 + dx : side + 1 + dx] << k
    return code


def _toposnake_evolve(v: np.ndarray, side: int, iterations: int,
                      lut: np.ndarray, burn: np.ndarray | None = None) -> np.ndarray:
    """Per-tile topology-preserving ACWE evolution — the kernel shared by
    ``ms_toposnakes_stage`` (burn=None) and the composed
    ``ms_toposeg_stage`` (burn = Canny edge mask: after each iteration's
    four subfields the edge pixels are forced to background, the
    reference's ``bw[edge==1]=0`` per-iteration burn, utilities.py:694).
    Returns the final 0/1 float mask."""
    R2 = (2 * side // 3) ** 2
    ys, xs = np.divmod(np.arange(side * side), side)
    circ = ((2 * xs - (side - 1)) ** 2 + (2 * ys - (side - 1)) ** 2 <= R2).reshape(side, side)
    ry = (np.arange(side)[:, None] % 2) * np.ones((1, side), np.int64)
    rx = np.ones((side, 1), np.int64) * (np.arange(side)[None, :] % 2)
    S = v.sum()
    npx_t = side * side
    u = circ.astype(np.float64)
    for _ in range(iterations):
        n1 = u.sum()
        s1 = (v * u).sum()
        c1 = s1 / n1 if n1 > 0 else 0.0
        c2 = (S - s1) / (npx_t - n1) if n1 < npx_t else 0.0
        target = ((v - c1) * (v - c1) < (v - c2) * (v - c2)).astype(np.float64)
        for phy, phx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            simple = lut[_sp_nb_code(u, side)] == 1
            flip = (u != target) & simple & (ry == phy) & (rx == phx)
            u = np.where(flip, target, u)
        if burn is not None:
            u = np.where(burn, 0.0, u)
    return u


def ms_toposnakes_stage(ds: ray.data.Dataset, side: int, iterations: int = 5,
                        round_to: int = 6) -> ray.data.Dataset:
    """utilities.ms_toposnakes analogue (utilities.py:397: morphsnakes with
    a topology-preservation constraint): a topology-preserving ACWE.

    Per iteration the Chan-Vese target T = [(v−c1)² < (v−c2)²] is applied
    through FOUR checkerboard subfields ((py%2, px%2) phases): within a
    subfield no two pixels are 8-adjacent's... (they are not 4-adjacent and
    share no 3×3 neighborhood edge effects on each other's simplicity), so
    flipping every pixel that (a) disagrees with the target and (b) is a
    SIMPLE point of the current mask preserves the mask's topology — the
    subfield/P-simple-point technique of homotopic thinning (Bertrand).
    With the genus-0 circle init, the final mask provably remains one
    component with no holes (pytest-verified via flood fill).

    The simple-point test is a 256-entry neighborhood LUT (inlined as a
    VALUES table in the SQL oracle); out-of-tile neighbors read as
    background. Output: per-tile foreground count + rounded inside mean."""
    lut = _simple_point_lut()

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        fg = np.empty(n_tiles, np.int64)
        mean_in = np.empty(n_tiles, np.float64)
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            u = _toposnake_evolve(v, side, iterations, lut)
            n1 = u.sum()
            s1 = (v * u).sum()
            fg[i] = int(n1)
            mean_in[i] = round_half_away(s1 / n1 if n1 > 0 else 0.0, round_to)
        return pa.table({"tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
                         "fg_count": pa.array(fg), "mean_in": pa.array(mean_in)})

    return ds.map_batches(fn, batch_format="pyarrow")


def clahe_stage(ds: ray.data.Dataset, side: int, quant: float = 8.0,
                n_bins: int = 64, shift: int = 16, clip_mult: int = 2,
                levels: int = 64) -> ray.data.Dataset:
    """Contrast-limited adaptive histogram equalization (Pizer et al.
    1987), the tile being the CLAHE context region (true CLAHE's
    bilinear blending BETWEEN regions is the documented cross-tile halo
    seam): per tile an exact integer pipeline —

        bin b = floor(v·quant) + shift  (the fixture's value range maps
        into [0, n_bins)), histogram h[b], clip limit L = clip_mult ·
        npx // n_bins, excess = Σ max(h−L, 0) redistributed as
        excess // n_bins to every bin plus one unit to bins
        0..(excess %% n_bins)−1 (deterministic policy),
        cdf = cumsum, out = (cdf[b] − cdf_min) · (levels−1) //
        max(npx − cdf_min, 1)

    — no floats anywhere, so the SQL twin (window cumsum + rank) is
    bit-free. Output: per-pixel equalized level (exact int)."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy().astype(np.int64)
        tys = batch["tile_y"].to_numpy().astype(np.int64)
        Y, X = np.mgrid[0:side, 0:side]
        npx = side * side
        L = clip_mult * npx // n_bins
        cols: dict[str, list] = {k: [] for k in ("tile_x", "tile_y", "px", "py", "eq")}
        for i in range(pxm.shape[0]):
            b = (np.floor(pxm[i] * quant).astype(np.int64) + shift)
            b = np.clip(b, 0, n_bins - 1)
            h = np.bincount(b, minlength=n_bins).astype(np.int64)
            clipped = np.minimum(h, L)
            excess = int((h - clipped).clip(min=0).sum())
            clipped = clipped + excess // n_bins
            rem = excess % n_bins
            if rem:
                clipped[:rem] += 1
            cdf = np.cumsum(clipped)
            cdf_min = int(cdf[np.nonzero(clipped)[0][0]]) if clipped.any() else 0
            den = max(npx - cdf_min, 1)
            eq = ((cdf[b] - cdf_min) * (levels - 1)) // den
            cols["tile_x"].append(np.full(npx, txs[i]))
            cols["tile_y"].append(np.full(npx, tys[i]))
            cols["px"].append(X.ravel().astype(np.int64))
            cols["py"].append(Y.ravel().astype(np.int64))
            cols["eq"].append(eq.astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v) if v else np.zeros(0, np.int64))
                         for k, v in cols.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def integral_image_stage(ds: ray.data.Dataset, side: int,
                         quant: float = 2.0) -> ray.data.Dataset:
    """Per-tile integral image (summed-area table — Crow 1984, the
    primitive behind constant-time box filters and Viola-Jones features;
    the haar_tiles stage's dense cousin): S(x,y) = Σ_{i≤y,j≤x} q(i,j)
    over the quantized tile — exact int64 (side² values ≤ 2⁴⁰). One
    vectorized double cumsum per tile; the SQL twin is the double
    cumulative window SUM."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy().astype(np.int64)
        tys = batch["tile_y"].to_numpy().astype(np.int64)
        Y, X = np.mgrid[0:side, 0:side]
        cols: dict[str, list] = {k: [] for k in ("tile_x", "tile_y", "px", "py", "s")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            s = q.cumsum(axis=0).cumsum(axis=1)
            cols["tile_x"].append(np.full(side * side, txs[i]))
            cols["tile_y"].append(np.full(side * side, tys[i]))
            cols["px"].append(X.ravel().astype(np.int64))
            cols["py"].append(Y.ravel().astype(np.int64))
            cols["s"].append(s.ravel())
        return pa.table({k: pa.array(np.concatenate(v) if v else np.zeros(0, np.int64))
                         for k, v in cols.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


_CVA_OFF = (7, 13)  # second-scene grid phase offsets for the two bands


def cva_change_stage(ds: ray.data.Dataset, side: int, quant: float = 8.0,
                     thresh2: int = 9) -> ray.data.Dataset:
    """Change-vector analysis between two scenes (Malila 1980 — the
    classic bitemporal change detection the reference's multi-temporal
    family stops short of): band b of scene 2 regenerates from the
    closed form with grid phase offset ``_CVA_OFF[b]`` (on a real stack
    this is the second acquisition's band read); the change vector per
    pixel is (d₀, d₁) = quantized scene-2 minus scene-1 band values,
    magnitude² = d₀² + d₁² (exact int), changed = magnitude² ≥
    ``thresh2``, and the direction sector is the canny integer octant
    rule (cross-multiplication, no trig). Output per tile: changed-pixel
    count + per-sector counts (exact ints)."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy().astype(np.int64)
        tys = batch["tile_y"].to_numpy().astype(np.int64)
        px_idx = np.arange(side)
        grid_base = (px_idx[:, None] * 31 + px_idx[None, :])
        n_t = pxm.shape[0]
        out = {"tile_x": txs, "tile_y": tys,
               "n_changed": np.zeros(n_t, np.int64)}
        for s in range(8):
            out[f"sector_{s}"] = np.zeros(n_t, np.int64)
        for i in range(n_t):
            base = np.sin(txs[i] * 0.1) + np.cos(tys[i] * 0.1)
            a0 = pxm[i].reshape(side, side)
            d = []
            for b, off in enumerate(_CVA_OFF):
                g2 = ((grid_base + off) % 97) / 97.0
                scene2 = (base + g2).astype(np.float32).astype(np.float64)
                # band 0 of scene 1 is the tile itself; band 1 regenerates
                # with offset 0 phase shifted by the band index
                g1 = ((grid_base + (0 if b == 0 else 3)) % 97) / 97.0
                scene1 = (a0 if b == 0
                          else (base + g1).astype(np.float32).astype(np.float64))
                d.append(np.floor(scene2 * quant).astype(np.int64)
                         - np.floor(scene1 * quant).astype(np.int64))
            d0, d1 = d
            mag2 = d0 * d0 + d1 * d1
            ch = mag2 >= thresh2
            out["n_changed"][i] = int(ch.sum())
            # octant: 3 bits (d1 >= 0, d0 >= 0, |d1| > |d0|)
            sec = ((d1 >= 0).astype(np.int64) * 4
                   + (d0 >= 0).astype(np.int64) * 2
                   + (np.abs(d1) > np.abs(d0)).astype(np.int64))
            for s in range(8):
                out[f"sector_{s}"][i] = int((ch & (sec == s)).sum())
        return pa.table({k: pa.array(v) for k, v in out.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def colour_thresh_stage(ds: ray.data.Dataset,
                        lower: tuple[int, int, int] = (20, 40, 80),
                        upper: tuple[int, int, int] = (130, 255, 220)) -> ray.data.Dataset:
    """utilities.colour_thresh analogue (utilities.py:1642) — the COMPUTE
    core of the interactive HSV picker (cv2.cvtColor BGR2HSV + inRange),
    with the trackbar UI declared out (sandbox has no display; thresholds
    are explicit parameters). Bands derive as the rgb_indices family's
    closed forms, 8-bit quantized; HSV is OpenCV's 8-bit convention
    (H∈[0,179], S,V∈[0,255]) restated in EXACT integer arithmetic:

        V = max(R,G,B); δ = V − min
        S = ⌊(510·δ + V) / (2V)⌋            (round-half-up of 255·δ/V)
        H = ((⌊(60·x + 360·δ)/δ⌋ + base) mod 360) // 2,  x the segment
            numerator (G−B / B−R / R−G), base 0/120/240, first-match
            V==R → V==G → else   (all dividends positive, so floor and
            truncating division agree across engines)

    Output per tile: in-range pixel count + exact integer H/S/V sums of
    the in-range pixels (no float column — nothing to tie)."""
    hl, sl, vl = lower
    hu, su, vu = upper

    def fn(batch: pa.Table) -> pa.Table:
        base = _pix(batch).astype(np.float64)
        r8 = np.clip(np.floor((base + 2.0) * 40.0), 0, 255).astype(np.int64)
        g8 = np.clip(np.floor((1.2 * base + 0.1 + 2.0) * 40.0), 0, 255).astype(np.int64)
        b8 = np.clip(np.floor((0.8 * base + 0.3 + 2.0) * 40.0), 0, 255).astype(np.int64)
        V = np.maximum(np.maximum(r8, g8), b8)
        mn = np.minimum(np.minimum(r8, g8), b8)
        d = V - mn
        d_safe = np.maximum(d, 1)
        seg_x = np.where(V == r8, g8 - b8, np.where(V == g8, b8 - r8, r8 - g8))
        seg_base = np.where(V == r8, 0, np.where(V == g8, 120, 240))
        hdeg = ((60 * seg_x + 360 * d_safe) // d_safe + seg_base) % 360
        H = np.where(d == 0, 0, hdeg // 2)
        S = np.where(V > 0, (510 * d + np.maximum(V, 1)) // np.maximum(2 * V, 1), 0)
        m = ((H >= hl) & (H <= hu) & (S >= sl) & (S <= su)
             & (V >= vl) & (V <= vu))
        return pa.table({
            "tile_x": pc.cast(batch["tile_x"], pa.int64()),
            "tile_y": pc.cast(batch["tile_y"], pa.int64()),
            "n_in": pa.array(m.sum(axis=1).astype(np.int64)),
            "h_sum": pa.array(np.where(m, H, 0).sum(axis=1).astype(np.int64)),
            "s_sum": pa.array(np.where(m, S, 0).sum(axis=1).astype(np.int64)),
            "v_sum": pa.array(np.where(m, V, 0).sum(axis=1).astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def phasecong_stage(ds: ray.data.Dataset, side: int, quant: float = 8.0,
                    scale: int = 1_048_576) -> ray.data.Dataset:
    """utilities.do_phasecong analogue (utilities.py:1086: Kovesi phase
    congruency via phasepack) — per-tile quadrature-pair form:

    instead of the reference's whole-scene FFT log-Gabor bank (declared
    out through round 3), each orientation o ∈ {x, y} and scale s ∈ {1, 2}
    applies an INTEGER quadrature filter pair along the axis with zero
    padding — even [-1, 0, 2, 0, -1], odd [-1, -2, 0, 2, 1], scale 2 the
    2-dilated taps — on the quantized tile. Kovesi's measure then is

        E_o = sqrt((e1+e2)² + (o1+o2)²)        (local energy)
        A_o = sqrt(e1²+o1²) + sqrt(e2²+o2²)    (amplitude sum)
        PC  = (E_x + E_y) / ((A_x + A_y) + 1.0)

    All convolution sums are exact int64 and sqrt is IEEE-correctly
    rounded on both engines, so the one float chain is bit-identical; the
    output is floor(PC·2²⁰ + 0.5) (integer quantization — decimal ROUND
    of a rational ratio can tie). A true multi-tile spectral version
    would halo-pad and overlap-add per tile (the documented seam);
    per-tile zero padding is the fixture-faithful stand-in."""

    def conv1d(q: np.ndarray, taps: list[tuple[int, int]], axis: int) -> np.ndarray:
        out = np.zeros_like(q)
        for off, w in taps:
            sh = np.zeros_like(q)
            if off == 0:
                sh = q
            elif axis == 1:
                if off > 0:
                    sh[:, :-off] = q[:, off:]
                else:
                    sh[:, -off:] = q[:, :off]
            else:
                if off > 0:
                    sh[:-off, :] = q[off:, :]
                else:
                    sh[-off:, :] = q[:off, :]
            out = out + w * sh
        return out

    EV = [(-2, -1), (0, 2), (2, -1)]
    OD = [(-2, -1), (-1, -2), (1, 2), (2, 1)]
    EV2 = [(2 * o, w) for o, w in EV]
    OD2 = [(2 * o, w) for o, w in OD]

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy().astype(np.int64)
        tys = batch["tile_y"].to_numpy().astype(np.int64)
        Y, X = np.mgrid[0:side, 0:side]
        cols: dict[str, list] = {k: [] for k in ("tile_x", "tile_y", "px", "py", "pcq")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            num = np.zeros((side, side), np.float64)
            den = np.zeros((side, side), np.float64)
            for axis in (1, 0):
                e1 = conv1d(q, EV, axis).astype(np.float64)
                o1 = conv1d(q, OD, axis).astype(np.float64)
                e2 = conv1d(q, EV2, axis).astype(np.float64)
                o2 = conv1d(q, OD2, axis).astype(np.float64)
                num = num + np.sqrt((e1 + e2) ** 2 + (o1 + o2) ** 2)
                den = den + (np.sqrt(e1 * e1 + o1 * o1) + np.sqrt(e2 * e2 + o2 * o2))
            pc = num / (den + 1.0)
            pcq = np.floor(pc * scale + 0.5).astype(np.int64)
            cols["tile_x"].append(np.full(side * side, txs[i]))
            cols["tile_y"].append(np.full(side * side, tys[i]))
            cols["px"].append(X.ravel().astype(np.int64))
            cols["py"].append(Y.ravel().astype(np.int64))
            cols["pcq"].append(pcq.ravel())
        return pa.table({k: pa.array(np.concatenate(v) if v else np.zeros(0, np.int64))
                         for k, v in cols.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def ms_toposeg_stage(ds: ray.data.Dataset, side: int, iterations: int = 4,
                     quant: float = 8.0, lo2: int = 20_000, hi2: int = 40_000,
                     num_buckets: int = 64, grid_x: int | None = None,
                     grid_y: int | None = None) -> ray.data.Dataset:
    """utilities.ms_toposeg analogue (utilities.py:527) — the reference's
    ONE-CALL composed segmentation pipeline, chained end-to-end as a single
    streaming Ray pipeline (the segmentation counterpart of
    pipelines/corpus_prep.py):

        canny edge (``_canny_masks``, the exact canny_edges_stage kernel)
          → topology-preserving ACWE with per-iteration edge burn
            (``_toposnake_evolve(burn=edge)`` = the reference's
            ``bw[edge==1]=0`` inside the evolution loop, utilities.py:694)
          → per-tile CCL labels of the final foreground mask
          → cross-tile component merge (the left/top tile regenerates its
            right/bottom neighbor from the closed form — on a real raster
            a 1-tile halo read — and emits border pairs where BOTH sides
            are foreground; ragmerge_count's ownership rule)
          → per merged region (global_region, pixel_count, n_regions)
            via the distributed connected-components + bucketed totals.

    Every ingredient stage is individually conformance-green; this query
    checks the COMPOSITION (VERDICT r3 "Next round" #2). Map passes
    compute the mask twice (regions + pairs), matching ragmerge_count's
    two-pass shape; both run on balanced storage blocks before the only
    exchanges (component min-label rounds + bucketed totals)."""
    from .dedup import connected_components
    from ..sources.tiles import GRID_X, GRID_Y, tile_pixels

    gx_lim = GRID_X if grid_x is None else grid_x
    gy_lim = GRID_Y if grid_y is None else grid_y
    lut = _simple_point_lut()

    def tile_mask(v: np.ndarray) -> np.ndarray:
        q = np.floor(v * quant).astype(np.int64)
        edge, _, _ = _canny_masks(q, side, lo2, hi2)
        return _toposnake_evolve(v, side, iterations, lut, burn=edge)

    def regions_fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        out = {"tile_x": [], "tile_y": [], "region_label": [], "pixel_count": []}
        for i in range(px.shape[0]):
            u = tile_mask(px[i].reshape(side, side))
            labels = _label_regions(u.astype(np.int64))
            fg_labs = labels[u > 0]
            labs, counts = np.unique(fg_labs, return_counts=True)
            out["tile_x"].append(np.full(len(labs), tx[i], np.int64))
            out["tile_y"].append(np.full(len(labs), ty[i], np.int64))
            out["region_label"].append(labs.astype(np.int64))
            out["pixel_count"].append(counts.astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v) if v else np.zeros(0, np.int64))
                         for k, v in out.items()})

    def pairs_fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        ua, va = [], []

        def emit(node_a, node_b, fg_a, fg_b):
            both = fg_a & fg_b
            if not both.any():
                return
            u = np.minimum(node_a[both], node_b[both])
            v = np.maximum(node_a[both], node_b[both])
            uv = np.unique(np.stack([u, v], 1), axis=0)
            ua.append(uv[:, 0])
            va.append(uv[:, 1])

        for i in range(px.shape[0]):
            u_self = tile_mask(px[i].reshape(side, side))
            lab_self = _label_regions(u_self.astype(np.int64))
            node_self = _region_node_ids(tx[i : i + 1], ty[i : i + 1], np.int64(0), side)[0] + lab_self
            if tx[i] + 1 < gx_lim:
                v_r = tile_pixels(int(tx[i]) + 1, int(ty[i]), side).astype(np.float64)
                u_r = tile_mask(v_r)
                node_r = _region_node_ids(tx[i : i + 1] + 1, ty[i : i + 1], np.int64(0), side)[0] + _label_regions(u_r.astype(np.int64))
                emit(node_self[:, -1], node_r[:, 0], u_self[:, -1] > 0, u_r[:, 0] > 0)
            if ty[i] + 1 < gy_lim:
                v_b = tile_pixels(int(tx[i]), int(ty[i]) + 1, side).astype(np.float64)
                u_b = tile_mask(v_b)
                node_b = _region_node_ids(tx[i : i + 1], ty[i : i + 1] + 1, np.int64(0), side)[0] + _label_regions(u_b.astype(np.int64))
                emit(node_self[-1, :], node_b[0, :], u_self[-1, :] > 0, u_b[0, :] > 0)
        if not ua:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(ua)), "id_b": pa.array(np.concatenate(va))})

    regions = ds.map_batches(regions_fn, batch_format="pyarrow")
    pairs = ds.map_batches(pairs_fn, batch_format="pyarrow")
    comp = connected_components(pairs, num_buckets=num_buckets)
    return _aggregate_components(regions, comp, side, num_buckets, with_nreg=True)


def min_rect_stage(ds: ray.data.Dataset, side: int, thresh: float = 1.5) -> ray.data.Dataset:
    """utilities.min_bound_rectangle analogue (utilities.py:1285-1357): the
    minimum-area enclosing rectangle of each tile's foreground pixel set,
    computed HULL-FREE so the SQL twin stays a pair self-join:

    - rotating-calipers theorem: the optimal rectangle aligns with a
      convex-hull edge;
    - hull vertices are among the per-row / per-column extreme pixels
      (any hull vertex is the min- or max-x pixel of its row), so the
      reduced extreme set (≤ 4·side points) contains every hull edge as
      a point pair;
    - EVERY pair direction yields a valid enclosing rectangle, so the
      minimum over all reduced-set pair directions equals the hull-edge
      optimum — no hull construction on either side.

    Projections are exact int64 (proj = x·dx + y·dy, perp = y·dx − x·dy);
    the area (Δproj·Δperp)/(dx²+dy²) is one identical f64 division both
    sides. Degenerate tiles (<2 reduced points, collinear sets) emit 0."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        tx = batch["tile_x"].to_numpy().astype(np.int64)
        ty = batch["tile_y"].to_numpy().astype(np.int64)
        n_fg = np.zeros(n_tiles, np.int64)
        n_red = np.zeros(n_tiles, np.int64)
        area = np.zeros(n_tiles, np.float64)
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            ys, xs = np.nonzero(v >= thresh)
            n_fg[i] = len(xs)
            if len(xs) == 0:
                continue
            cand = set()
            for y in np.unique(ys):
                row = xs[ys == y]
                cand.add((int(row.min()), int(y))); cand.add((int(row.max()), int(y)))
            for x in np.unique(xs):
                col = ys[xs == x]
                cand.add((int(x), int(col.min()))); cand.add((int(x), int(col.max())))
            pts = np.asarray(sorted(cand), np.int64)
            R = len(pts)
            n_red[i] = R
            if R < 2:
                continue
            X, Y = pts[:, 0], pts[:, 1]
            DX = X[None, :] - X[:, None]
            DY = Y[None, :] - Y[:, None]
            den = DX * DX + DY * DY          # 0 on the diagonal
            proj = DX[:, :, None] * X[None, None, :] + DY[:, :, None] * Y[None, None, :]
            perp = DX[:, :, None] * Y[None, None, :] - DY[:, :, None] * X[None, None, :]
            num = (proj.max(axis=2) - proj.min(axis=2)) * (perp.max(axis=2) - perp.min(axis=2))
            valid = den > 0
            area[i] = float(np.min(num[valid].astype(np.float64) / den[valid].astype(np.float64)))
        from ..functions.rounding import round_half_away

        return pa.table({
            "tile_x": pa.array(tx), "tile_y": pa.array(ty),
            "n_fg": pa.array(n_fg), "n_red": pa.array(n_red),
            "min_rect_area": pa.array(round_half_away(area, 6)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def orientation_stage(ds: ray.data.Dataset, side: int, thresh: float = 1.5) -> ray.data.Dataset:
    """utilities.imangle analogue (utilities.py:1241-1282): principal
    orientation of each tile's foreground from image moments. The angle is
    0.5·atan2(2μ11, μ20−μ02); cross-engine atan2 is not bit-stable, so the
    stage emits the EXACT INTEGER atan2 arguments scaled by n²
    (inum = 2(n·Σxy − Σx·Σy), iden = (n·Σx² − (Σx)²) − (n·Σy² − (Σy)²))
    and pytest reconstructs/validates the angle against a dense reference."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        out = {k: np.zeros(n_tiles, np.int64) for k in ("n_fg", "inum", "iden")}
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            ys, xs = np.nonzero(v >= thresh)
            n = np.int64(len(xs))
            out["n_fg"][i] = n
            if n == 0:
                continue
            sx, sy = xs.sum(), ys.sum()
            out["inum"][i] = 2 * (n * (xs * ys).sum() - sx * sy)
            out["iden"][i] = (n * (xs * xs).sum() - sx * sx) - (n * (ys * ys).sum() - sy * sy)
        return pa.table({
            "tile_x": pa.array(batch["tile_x"].to_numpy().astype(np.int64)),
            "tile_y": pa.array(batch["tile_y"].to_numpy().astype(np.int64)),
            **{k: pa.array(val) for k, val in out.items()},
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# --- Lambert azimuthal equal-area (ETRS89-LAEA shape, EPSG:3035 params) -------

_LAEA_E = np.sqrt(2.0 * _UTM_F - _UTM_F * _UTM_F)  # first eccentricity
_LAEA_E2 = _LAEA_E * _LAEA_E
_LAEA_LAT0, _LAEA_LON0 = 52.0, 10.0
_LAEA_FE, _LAEA_FN = 4321000.0, 3210000.0


def _laea_q(s: np.ndarray) -> np.ndarray:
    """Snyder's authalic q(sinφ) — the identical float chain the SQL twin
    spells out."""
    return (1.0 - _LAEA_E2) * (
        s / (1.0 - _LAEA_E2 * s * s)
        - (1.0 / (2.0 * _LAEA_E)) * np.log((1.0 - _LAEA_E * s) / (1.0 + _LAEA_E * s)))


_LAEA_QP = float(_laea_q(np.float64(1.0)))
_LAEA_RQ = _UTM_A * np.sqrt(_LAEA_QP / 2.0)
_LAEA_SB1 = float(_laea_q(np.sin(np.radians(_LAEA_LAT0)))) / _LAEA_QP
_LAEA_CB1 = np.sqrt(1.0 - _LAEA_SB1 * _LAEA_SB1)
_LAEA_D = (_UTM_A * np.cos(np.radians(_LAEA_LAT0))
           / np.sqrt(1.0 - _LAEA_E2 * np.sin(np.radians(_LAEA_LAT0)) ** 2)
           / (_LAEA_RQ * _LAEA_CB1))


def laea_forward(lon: np.ndarray, lat: np.ndarray):
    """WGS84 → ellipsoidal Lambert azimuthal equal-area forward (Snyder
    1987 §24 / EPSG method 9820, EPSG:3035 parameters) — the second CRS
    kernel beside UTM for the batchwarp analogue (reference raster.py:2591;
    LAEA is the reference's continental-stats CRS). Same oracle recipe as
    utm_forward: every transcendental is one numpy call mirrored textually
    in SQL, constants inlined as repr literals. Defined for |lat| ≤ 89°
    away from the antipode of (52, 10) — the fixture's geocode range."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    la = lat * np.radians(1.0)
    dl = (lon - _LAEA_LON0) * np.radians(1.0)
    s = np.sin(la)
    q = _laea_q(s)
    sb = q / _LAEA_QP
    cb = np.sqrt(1.0 - sb * sb)
    cd = np.cos(dl)
    denom = 1.0 + _LAEA_SB1 * sb + _LAEA_CB1 * (cb * cd)
    bb = _LAEA_RQ * np.sqrt(2.0 / denom)
    x = _LAEA_FE + (bb * _LAEA_D) * (cb * np.sin(dl))
    y = _LAEA_FN + (bb / _LAEA_D) * (_LAEA_CB1 * sb - _LAEA_SB1 * (cb * cd))
    return x, y


def reproject_points_laea(ds: ray.data.Dataset, carry_cols: list[str]) -> ray.data.Dataset:
    """Per-point LAEA forward — map-side, no shuffle (see laea_forward)."""

    def fn(batch: pa.Table) -> pa.Table:
        x, y = laea_forward(batch["lon"].to_numpy(), batch["lat"].to_numpy())
        out = batch.select(carry_cols)
        return (out.append_column("laea_x", pa.array(x))
                   .append_column("laea_y", pa.array(y)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _canny_masks(q: np.ndarray, side: int, lo2: int, hi2: int):
    """Per-tile Canny kernel on the quantized int64 image → (final edge
    mask, g², strong mask). Factored from ``canny_edges_stage`` so the
    composed ``ms_toposeg_stage`` burns the IDENTICAL edge set."""
    big = np.iinfo(np.int64).max
    Y, X = np.mgrid[0:side, 0:side]
    rowsm = lambda a: (np.concatenate([a[:, :1], a[:, :-1]], 1)
                       + 2 * a + np.concatenate([a[:, 1:], a[:, -1:]], 1))
    colsm = lambda a: (np.concatenate([a[:1, :], a[:-1, :]], 0)
                       + 2 * a + np.concatenate([a[1:, :], a[-1:, :]], 0))
    rowdiff = lambda a: (np.concatenate([a[:, 1:], a[:, -1:]], 1)
                         - np.concatenate([a[:, :1], a[:, :-1]], 1))
    coldiff = lambda a: (np.concatenate([a[1:, :], a[-1:, :]], 0)
                         - np.concatenate([a[:1, :], a[:-1, :]], 0))
    s = colsm(rowsm(q))
    gx = colsm(rowdiff(s))
    gy = rowsm(coldiff(s))
    g2 = gx * gx + gy * gy
    ax, ay = np.abs(gx), np.abs(gy)
    sec = np.where(2 * ay <= ax, 0,
                   np.where(2 * ax <= ay, 1,
                            np.where(gx * gy > 0, 2, 3)))
    n1 = np.zeros_like(g2)
    n2 = np.zeros_like(g2)
    for k, (dx, dy) in enumerate(((1, 0), (0, 1), (1, 1), (1, -1))):
        m = sec == k
        for sign, tgt in ((1, n1), (-1, n2)):
            nx, ny = X + sign * dx, Y + sign * dy
            ok = (nx >= 0) & (nx < side) & (ny >= 0) & (ny < side) & m
            tgt[ok] = g2[ny[ok], nx[ok]]
    mask = (g2 > lo2) & (g2 >= n1) & (g2 >= n2)
    strong = mask & (g2 > hi2)
    lab = np.where(mask, Y * side + X, big)
    while True:
        new = lab.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                sh = np.full_like(lab, big)
                ys = slice(max(dy, 0), side + min(dy, 0))
                xs = slice(max(dx, 0), side + min(dx, 0))
                yd = slice(max(-dy, 0), side + min(-dy, 0))
                xd = slice(max(-dx, 0), side + min(-dx, 0))
                sh[yd, xd] = lab[ys, xs]
                new = np.minimum(new, sh)
        new = np.where(mask, new, big)
        if (new == lab).all():
            break
        lab = new
    keep = np.unique(lab[strong])
    final = mask & np.isin(lab, keep)
    return final, g2, strong


def canny_edges_stage(ds: ray.data.Dataset, side: int, quant: float = 8.0,
                      lo2: int = 20_000, hi2: int = 40_000) -> ray.data.Dataset:
    """Integer-exact Canny edge detector per tile (Canny 1986) — the REAL
    version of the gradient-magnitude "canny stand-in" that ransac/hough
    share (utilities.py:112 ``edge='canny'``; utilities.py:969 iter_ransac
    sigma edges). Every step is exact integer arithmetic on the quantized
    tile so the SQL twin value-hashes bit-for-bit:

    - 3×3 binomial smooth: two separable [1,2,1] passes with REPLICATE
      borders (COALESCE(LAG,·) in the twin), kept at ×16 integer scale;
    - Sobel: gx = colsmooth(rowdiff(s)), gy = rowsmooth(coldiff(s)) with
      the same replicate rule; g² = gx² + gy² (exact int64);
    - NMS: gradient direction quantized by the INTEGER sector rule
      (2|gy| ≤ |gx| → E/W; 2|gx| ≤ |gy| → N/S; else diagonal by
      sign(gx·gy) — documented deviation from atan2 sectoring: the rule
      is cross-multiplication-exact, no trig), survive if g² ≥ both
      neighbors along the sector (out-of-tile = 0, ties survive);
    - hysteresis: 8-connected components over survivors with g² > lo2;
      keep components containing a strong pixel (g² > hi2) — min-label
      CCL, the same fixpoint the twin unrolls (measured 16 rounds on the
      closed-form raster; the twin runs 20).

    Output: one row per final edge pixel (tile_x, tile_y, px, py, g2,
    strong) — the full edge SET is value-hashed, not a summary."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "g2", "strong")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            final, g2, strong = _canny_masks(q, side, lo2, hi2)
            fy, fx = np.nonzero(final)
            rows["tile_x"].append(np.full(len(fy), txs[i], np.int64))
            rows["tile_y"].append(np.full(len(fy), tys[i], np.int64))
            rows["px"].append(fx.astype(np.int64))
            rows["py"].append(fy.astype(np.int64))
            rows["g2"].append(g2[fy, fx])
            rows["strong"].append(strong[fy, fx].astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v) if v else
                                     np.zeros(0, np.int64))
                         for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def edt_proximity_stage(ds: ray.data.Dataset, side: int, quant: float = 2.0,
                        fg_thresh: int = 4) -> ray.data.Dataset:
    """Exact Euclidean distance transform per tile — the proximity raster
    the reference builds with scipy's distance_transform_edt inside both
    `shape.snake`'s buffer construction (shape.py:1928) and `thresh_seg`'s
    buf path (shape.py:2180-2182): distance from every pixel to the
    nearest foreground pixel (q = floor(vd·quant) ≥ fg_thresh). Computed
    in SQUARED integer units (dx² + dy² — exact at any size; the caller's
    `dist ≤ buf` threshold is `d2 ≤ buf²` in these units, so nothing is
    lost to a sqrt), brute-force-exact over the tile (side⁴ ≤ 65k ops —
    vectorized one matmul-shaped min per tile; a true multi-tile raster
    would halo like batch_gdaldem). Tiles with no foreground emit
    d2 = -1 (documented sentinel)."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        yf = Y.ravel().astype(np.int64)
        xf = X.ravel().astype(np.int64)
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "fg", "d2")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            fg = (q >= fg_thresh).ravel()
            if fg.any():
                dy = yf[:, None] - yf[None, fg]
                dx = xf[:, None] - xf[None, fg]
                d2 = (dy * dy + dx * dx).min(axis=1)
            else:
                d2 = np.full(side * side, -1, np.int64)
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(xf)
            rows["py"].append(yf)
            rows["fg"].append(fg.astype(np.int64))
            rows["d2"].append(d2)
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def skeletonize_stage(ds: ray.data.Dataset, side: int, quant: float = 2.0,
                      fg_thresh: int = 4,
                      rounds: int = 8) -> ray.data.Dataset:
    """Zhang-Suen thinning (Zhang & Suen 1984, CACM 27(3) — the
    `skimage.morphology.skeletonize` default) per tile: ``rounds`` full
    iterations of the two-subpass deletion rule over the quantized
    foreground (q = floor(vd·quant) ≥ fg_thresh), borders treated as
    background (tile-local semantics, like the ACWE/snake family;
    a multi-tile skeleton would need a per-round halo exchange).

    Neighborhood order (shared with the SQL twin — thinning is NOT
    rotation-invariant, the subpass conditions bake in compass
    directions): P2=N(py-1,px), P3=NE, P4=E(px+1), P5=SE, P6=S(py+1),
    P7=SW, P8=W(px-1), P9=NW. Deletions are simultaneous per subpass
    (mask computed from the frozen previous state). 8 rounds suffice for
    a 16-px tile: thinning erodes ≥1 px per side per round, and the SQL
    twin unrolls exactly the same 16 subpasses."""

    def _neighbors(p: np.ndarray):
        return (p[0:-2, 1:-1], p[0:-2, 2:], p[1:-1, 2:], p[2:, 2:],
                p[2:, 1:-1], p[2:, 0:-2], p[1:-1, 0:-2], p[0:-2, 0:-2])

    def _thin(img: np.ndarray) -> np.ndarray:
        for _ in range(rounds):
            for sub in (0, 1):
                p = np.pad(img, 1)
                p2, p3, p4, p5, p6, p7, p8, p9 = _neighbors(p)
                bsum = (p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9)
                seq = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
                a = np.zeros_like(img, np.int64)
                for i in range(8):
                    a += ((seq[i] == 0) & (seq[i + 1] == 1)).astype(np.int64)
                if sub == 0:
                    c1 = p2 * p4 * p6 == 0
                    c2 = p4 * p6 * p8 == 0
                else:
                    c1 = p2 * p4 * p8 == 0
                    c2 = p2 * p6 * p8 == 0
                kill = ((img == 1) & (bsum >= 2) & (bsum <= 6) & (a == 1)
                        & c1 & c2)
                img = img & ~kill
        return img

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        yf = Y.ravel().astype(np.int64)
        xf = X.ravel().astype(np.int64)
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "fg", "skel")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            img = (q >= fg_thresh).astype(np.int64)
            skel = _thin(img.copy())
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(xf)
            rows["py"].append(yf)
            rows["fg"].append(img.ravel())
            rows["skel"].append(skel.ravel().astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def viewshed_stage(ds: ray.data.Dataset, side: int, quant: float = 2.0,
                   obs_h: int = 2) -> ray.data.Dataset:
    """Per-tile viewshed (GRASS r.viewshed / Wang et al. 2000 R3 shape):
    an observer ``obs_h`` quantized units above the tile-center pixel
    sees pixel p iff no sampled point along the sightline subtends a
    larger vertical angle. INTEGER-EXACT throughout: elevations are the
    usual q = floor(vd·quant); the sightline is sampled at parameter
    k/n (n = Chebyshev distance, so along-line distance ∝ k) at the
    rounded-to-nearest cell (2·ox·n + 2·dx·k + n) // (2n) — pure integer
    arithmetic, ties round half-up on both sides; the angle comparison
    cross-multiplies to (e_k − e_o)·n ≤ (e_p − e_o)·k, so the SQL twin
    is bit-free of floats. Pixels with n ≤ 1 are trivially visible."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        c = side // 2
        Y, X = np.mgrid[0:side, 0:side]
        dx = X - c
        dy = Y - c
        n = np.maximum(np.abs(dx), np.abs(dy)).astype(np.int64)
        ns = np.maximum(n, 1)
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "n_steps",
                                  "q", "vis")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            eo2 = q[c, c] + obs_h
            vis = np.ones((side, side), bool)
            for k in range(1, int(n.max())):
                mask = k < n
                sx = (2 * c * ns + 2 * dx * k + ns) // (2 * ns)
                sy = (2 * c * ns + 2 * dy * k + ns) // (2 * ns)
                ek = q[sy, sx]
                bad = mask & ((ek - eo2) * n > (q - eo2) * k)
                vis &= ~bad
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(X.ravel().astype(np.int64))
            rows["py"].append(Y.ravel().astype(np.int64))
            rows["n_steps"].append(n.ravel())
            rows["q"].append(q.ravel())
            rows["vis"].append(vis.ravel().astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def tile_pyramid_stage(ds: ray.data.Dataset, side: int,
                       levels: int = 3) -> ray.data.Dataset:
    """Overview / pyramid build (gdaladdo's average-resampled levels —
    the reference's rasters carry overviews via gdal.BuildOverviews in
    its display paths): level L replaces each 2^L×2^L block with its
    mean. Purely map-side (one reshape-mean per level per tile), no
    shuffle — at 100 TB every tile downsamples independently and the
    pyramid streams out beside the base level.

    Exactness: sums of ≤ 4^L f32-valued f64 pixels are order-exact and
    the divisor 4^L is a power of two, so the means are bit-identical to
    the SQL GROUP BY px//2^L restatement with no rounding discipline."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "level", "px", "py",
                                  "mean_v")}
        for i in range(pxm.shape[0]):
            img = pxm[i].reshape(side, side)
            for lev in range(1, levels + 1):
                s = 1 << lev
                n = side // s
                m = img.reshape(n, s, n, s).sum(axis=(1, 3)) / float(s * s)
                Y, X = np.mgrid[0:n, 0:n]
                rows["tile_x"].append(np.full(n * n, txs[i], np.int64))
                rows["tile_y"].append(np.full(n * n, tys[i], np.int64))
                rows["level"].append(np.full(n * n, lev, np.int64))
                rows["px"].append(X.ravel().astype(np.int64))
                rows["py"].append(Y.ravel().astype(np.int64))
                rows["mean_v"].append(m.ravel())
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def contour_cells_stage(ds: ray.data.Dataset, side: int, quant: float = 2.0,
                        level: int = 4) -> ray.data.Dataset:
    """Marching-squares contour inventory (Lorensen & Cline's 2-D case
    table; gdal_contour's cell classification) at one quantized level:
    every 2×2 pixel cell gets its 4-bit case index from (q ≥ level) at
    (top-left, top-right, bottom-right, bottom-left) — bit 3..0 in that
    order — and cells actually crossed by the contour (case ∉ {0, 15})
    are emitted with the segment count (2 for the ambiguous saddle cases
    5/10, else 1). Midpoint rule: no interpolation, so the whole
    operator is integer comparisons — bit-free of floats like the
    viewshed. Map-only per tile; a cross-tile contour would stitch via
    the polygonize edge exchange."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        n = side - 1
        Y, X = np.mgrid[0:n, 0:n]
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "cx", "cy", "mcase",
                                  "n_segs")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            b = (q >= level).astype(np.int64)
            case = (b[:-1, :-1] * 8 + b[:-1, 1:] * 4
                    + b[1:, 1:] * 2 + b[1:, :-1])
            keep = (case != 0) & (case != 15)
            segs = np.where((case == 5) | (case == 10), 2, 1)
            m = keep.ravel()
            k = int(m.sum())
            rows["tile_x"].append(np.full(k, txs[i], np.int64))
            rows["tile_y"].append(np.full(k, tys[i], np.int64))
            rows["cx"].append(X.ravel()[m].astype(np.int64))
            rows["cy"].append(Y.ravel()[m].astype(np.int64))
            rows["mcase"].append(case.ravel()[m])
            rows["n_segs"].append(segs.ravel()[m].astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


D8_DIRS = ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1),
           (1, -1))  # E, SE, S, SW, W, NW, N, NE — the ESRI D8 order


def _d8_grid(q: np.ndarray, side: int) -> tuple[np.ndarray, np.ndarray]:
    """(side, side) integer elevations → (best_dir, best_drop) grids by the
    exact integer slope key drop²·(3−d²); ties break on D8_DIRS order,
    sinks are −1 (shared kernel of d8_directions_stage / flow_accum_stage)."""
    best_key = np.full((side, side), -1, np.int64)
    best_dir = np.full((side, side), -1, np.int64)
    best_drop = np.zeros((side, side), np.int64)
    for di, (dx, dy) in enumerate(D8_DIRS):
        nq = np.full((side, side), np.iinfo(np.int64).max, np.int64)
        ys0, ys1 = max(0, dy), side + min(0, dy)
        xs0, xs1 = max(0, dx), side + min(0, dx)
        nq[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx] = q[ys0:ys1, xs0:xs1]
        drop = q - nq
        valid = nq != np.iinfo(np.int64).max
        key = drop * drop * (3 - (dx * dx + dy * dy))
        better = valid & (drop > 0) & (key > best_key)
        best_key = np.where(better, key, best_key)
        best_drop = np.where(better, drop, best_drop)
        best_dir = np.where(better, di, best_dir)
    return best_dir, best_drop


def d8_directions_stage(ds: ray.data.Dataset, side: int,
                        quant: float = 2.0) -> ray.data.Dataset:
    """D8 steepest-descent flow direction per pixel (O'Callaghan & Mark
    1984 — the gdaldem/hydrology companion of the slope/aspect family):
    each pixel drains to the neighbor with the greatest drop/distance;
    diagonal √2 distances never materialize — slopes compare by the
    EXACT integer key drop²·(3−d²) (= 2·drop² cardinal, drop² diagonal),
    ties break on the fixed direction order. Outside-tile neighbors are
    not candidates (tile-local, like skeletonize); pixels with no
    positive drop are sinks (dir −1). Map-only, integer-exact."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "dir",
                                  "best_drop")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            best_dir, best_drop = _d8_grid(q, side)
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(X.ravel().astype(np.int64))
            rows["py"].append(Y.ravel().astype(np.int64))
            rows["dir"].append(best_dir.ravel())
            rows["best_drop"].append(best_drop.ravel())
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def flow_accum_stage(ds: ray.data.Dataset, side: int,
                     quant: float = 2.0) -> ray.data.Dataset:
    """D8 flow accumulation (O'Callaghan & Mark 1984; the hydrology stage
    downstream of d8_directions_stage): each pixel's accumulation is the
    number of pixels — including itself — whose steepest-descent drainage
    path passes through it. Flow only follows strictly positive drops, so
    the quantized elevation strictly decreases along every path: the D8
    pointer graph is a forest of in-trees rooted at sinks and one
    descending-elevation pass accumulates exactly (child counts land on
    the parent before the parent is visited). Map-only per tile,
    integer-exact; the SQL twin is a recursive reachability closure
    (every pixel contributes 1 to each node on its path)."""
    dxs = np.array([dx for dx, dy in D8_DIRS], np.int64)
    dys = np.array([dy for dx, dy in D8_DIRS], np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        Xf, Yf = X.ravel().astype(np.int64), Y.ravel().astype(np.int64)
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "acc")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            best_dir, _ = _d8_grid(q, side)
            fd = best_dir.ravel()
            has = fd >= 0
            sd = np.where(has, fd, 0)
            dst = np.where(has, (Yf + dys[sd]) * side + (Xf + dxs[sd]), -1)
            acc = np.ones(side * side, np.int64)
            # strictly descending elevation order; equal-q pixels never
            # flow into each other, so their relative order is irrelevant
            for idx in np.argsort(-q.ravel(), kind="stable"):
                j = dst[idx]
                if j >= 0:
                    acc[j] += acc[idx]
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(Xf)
            rows["py"].append(Yf)
            rows["acc"].append(acc)
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def haar_tiles_stage(ds: ray.data.Dataset, side: int, levels: int = 2,
                     quant: float = 2.0) -> ray.data.Dataset:
    """Unnormalized integer 2-D Haar decomposition per tile (the pyramid
    / texture-energy transform of the wavelet-compression family): on
    the quantized grid q = ⌊v·quant⌋, each level maps every 2×2 block
    (a b / c d) to ll = a+b+c+d, lh = (a+c)−(b+d), hl = (a+b)−(c+d),
    hh = a−b−c+d and recurses on ll — the lifting S-transform without
    the normalizing shifts, so every coefficient is an exact int64 and
    the SQL twin is two signed GROUP BY passes. → one row per
    (tile, level, block): (tile_x, tile_y, level, bx, by, ll, lh, hl,
    hh). Map-only; no shuffle at any scale."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "level", "bx", "by",
                                  "ll", "lh", "hl", "hh")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            ll = q
            for lev in range(1, levels + 1):
                a = ll[0::2, 0::2]
                b = ll[0::2, 1::2]
                c = ll[1::2, 0::2]
                d = ll[1::2, 1::2]
                nll = a + b + c + d
                lh = (a + c) - (b + d)
                hl = (a + b) - (c + d)
                hh = a - b - c + d
                h = nll.shape[0]
                By, Bx = np.mgrid[0:h, 0:h]
                n = h * h
                rows["tile_x"].append(np.full(n, txs[i], np.int64))
                rows["tile_y"].append(np.full(n, tys[i], np.int64))
                rows["level"].append(np.full(n, lev, np.int64))
                rows["bx"].append(Bx.ravel().astype(np.int64))
                rows["by"].append(By.ravel().astype(np.int64))
                rows["ll"].append(nll.ravel())
                rows["lh"].append(lh.ravel())
                rows["hl"].append(hl.ravel())
                rows["hh"].append(hh.ravel())
                ll = nll
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def watershed_basins_stage(ds: ray.data.Dataset, side: int,
                           quant: float = 2.0) -> ray.data.Dataset:
    """D8 watershed delineation (the basin companion of
    flow_accum_stage): every pixel is labeled by the sink its
    steepest-descent path terminates at (basin = sink_y·side + sink_x;
    sinks label themselves). Pointer-doubling resolves all paths in
    ⌈log₂ side²⌉ vectorized rounds per tile — never a per-pixel walk.
    Map-only, integer-exact; the SQL twin walks the same pointer chain
    recursively and keeps the step whose endpoint has no outgoing edge."""
    dxs = np.array([dx for dx, dy in D8_DIRS], np.int64)
    dys = np.array([dy for dx, dy in D8_DIRS], np.int64)
    n = side * side
    rounds = max(1, int(np.ceil(np.log2(n))))

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        Xf, Yf = X.ravel().astype(np.int64), Y.ravel().astype(np.int64)
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "basin")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            best_dir, _ = _d8_grid(q, side)
            fd = best_dir.ravel()
            has = fd >= 0
            sd = np.where(has, fd, 0)
            me = Yf * side + Xf
            nxt = np.where(has, (Yf + dys[sd]) * side + (Xf + dxs[sd]), me)
            for _ in range(rounds):
                nxt = nxt[nxt]
            rows["tile_x"].append(np.full(n, txs[i], np.int64))
            rows["tile_y"].append(np.full(n, tys[i], np.int64))
            rows["px"].append(Xf)
            rows["py"].append(Yf)
            rows["basin"].append(nxt)
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def focal_majority_stage(ds: ray.data.Dataset, side: int,
                         quant: float = 2.0) -> ray.data.Dataset:
    """3×3 focal majority (mode) filter on the quantized grid — the
    categorical-raster smoothing of the gdaldem/sieve family: each
    pixel takes the most frequent value in its shrink-at-border 3×3
    window; count ties break to the SMALLEST value (deterministic, the
    rule the SQL twin's QUALIFY restates). Vectorized per tile: the 9
    shifted layers sort columnwise and run lengths accumulate across
    the 9 rows — no per-pixel Python. Map-only, integer-exact."""
    SENT = np.int64(np.iinfo(np.int64).max)

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "mode_q",
                                  "mode_n")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            layers = np.full((9, side, side), SENT, np.int64)
            li = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ys0, ys1 = max(0, dy), side + min(0, dy)
                    xs0, xs1 = max(0, dx), side + min(0, dx)
                    layers[li, ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx] = \
                        q[ys0:ys1, xs0:xs1]
                    li += 1
            s = np.sort(layers, axis=0)
            cnt = np.ones_like(s)
            for r in range(1, 9):
                same = s[r] == s[r - 1]
                cnt[r] = np.where(same, cnt[r - 1] + 1, 1)
            best_n = np.zeros((side, side), np.int64)
            best_v = np.full((side, side), SENT, np.int64)
            for r in range(9):
                valid = s[r] != SENT
                # strict > keeps the FIRST (= smallest, rows ascend) value
                better = valid & (cnt[r] > best_n)
                best_n = np.where(better, cnt[r], best_n)
                best_v = np.where(better, s[r], best_v)
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(X.ravel().astype(np.int64))
            rows["py"].append(Y.ravel().astype(np.int64))
            rows["mode_q"].append(best_v.ravel())
            rows["mode_n"].append(best_n.ravel())
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def variogram_stage(ds: ray.data.Dataset, side: int, quant: float = 2.0,
                    max_lag: int = 8) -> ray.data.Dataset:
    """Empirical directional semivariogram per tile (the geostatistics
    companion of texture_stats — the reference's kriging-prep shape):
    for each lag h = 1..max_lag along each axis, the pair count and the
    exact integer Σ(q_i − q_{i+h})² over the quantized grid, plus
    γ(h) = ss / (2·n) rounded half-away-from-zero to 9 decimals (one
    correctly-rounded f64 division of exact <2⁵³ integers — bit-equal to
    the SQL twin's). Map-only, no shuffle; vectorized slicing per tile."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "axis", "lag",
                                  "n_pairs", "ss")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            for h in range(1, max_lag + 1):
                for ax, d in (("x", q[:, h:] - q[:, :-h]),
                              ("y", q[h:, :] - q[:-h, :])):
                    rows["tile_x"].append(int(txs[i]))
                    rows["tile_y"].append(int(tys[i]))
                    rows["axis"].append(ax)
                    rows["lag"].append(h)
                    rows["n_pairs"].append(int(d.size))
                    rows["ss"].append(int((d * d).sum()))
        t = pa.table({
            "tile_x": pa.array(rows["tile_x"], pa.int64()),
            "tile_y": pa.array(rows["tile_y"], pa.int64()),
            "axis": pa.array(rows["axis"], pa.string()),
            "lag": pa.array(rows["lag"], pa.int64()),
            "n_pairs": pa.array(rows["n_pairs"], pa.int64()),
            "ss": pa.array(rows["ss"], pa.int64()),
        })
        ssv = np.array(rows["ss"], np.float64)
        npv = np.array(rows["n_pairs"], np.float64)
        return t.append_column(
            "gamma_r", pa.array(round_half_away(ssv / (2.0 * npv), 9)))

    return ds.map_batches(fn, batch_format="pyarrow")


def moran_i_stage(ds: ray.data.Dataset, side: int,
                  quant: float = 2.0) -> ray.data.Dataset:
    """Global Moran's I per tile under rook contiguity — spatial
    autocorrelation of the quantized grid. Everything is scaled by
    N = side² so mean-centering stays integer: with S = Σq,
    num = Σ_i Σ_{j∈rook(i)} (N·q_i − S)(N·q_j − S),
    den = Σ_i (N·q_i − S)², W = directed rook pair count, and
    I = (N·num) / (W·den) — both products are exact < 2⁵³ integers, so
    the single f64 division is correctly rounded and bit-equal to the
    SQL twin. One row per tile; map-only."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        n = side * side
        w = 2 * (2 * side * (side - 1))  # directed rook pairs
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "n", "w_pairs",
                                  "num", "den")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            c = n * q - q.sum()           # N·q_i − S, exact int64
            num = 2 * (int((c[:, 1:] * c[:, :-1]).sum())
                       + int((c[1:, :] * c[:-1, :]).sum()))
            den = int((c * c).sum())
            rows["tile_x"].append(int(txs[i]))
            rows["tile_y"].append(int(tys[i]))
            rows["n"].append(n)
            rows["w_pairs"].append(w)
            rows["num"].append(num)
            rows["den"].append(den)
        t = pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})
        numv = np.array(rows["num"], np.float64) * np.float64(n)
        denv = np.array(rows["den"], np.float64) * np.float64(w)
        return t.append_column(
            "moran_r", pa.array(round_half_away(numv / denv, 9)))

    return ds.map_batches(fn, batch_format="pyarrow")


def getis_gi_stage(ds: ray.data.Dataset, side: int,
                   quant: float = 2.0) -> ray.data.Dataset:
    """Getis-Ord Gi* hot-spot z-score per pixel over the 3×3
    shrink-at-border window (self included). With N = side², S = Σq,
    S2 = Σq², wsum_i = window sum, n_i = window count:
      z_i = (N·wsum_i − S·n_i) /
            ( √(N·S2 − S²) · √((N·n_i − n_i²)/(N−1)) )
    (both num and denom of the classic Gi* scaled by N — N·s = √(N·S2−S²))
    Numerator and both sqrt arguments are exact integers (< 2⁵³), so
    each √ / × / ÷ is one correctly-rounded IEEE op mirrored verbatim
    in the SQL twin — bit-equal z, rounded half-away to 9. The window
    sum is 9 shifted adds per tile (separable would also work); no
    shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        n = side * side
        Y, X = np.mgrid[0:side, 0:side]
        out: dict[str, list] = {k: [] for k in
                                ("tile_x", "tile_y", "px", "py", "wsum",
                                 "n_w", "z_r")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            s = int(q.sum())
            s2 = int((q * q).sum())
            wsum = np.zeros((side, side), np.int64)
            n_w = np.zeros((side, side), np.int64)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ys0, ys1 = max(0, dy), side + min(0, dy)
                    xs0, xs1 = max(0, dx), side + min(0, dx)
                    wsum[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx] += \
                        q[ys0:ys1, xs0:xs1]
                    n_w[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx] += 1
            numer = (n * wsum - s * n_w).astype(np.float64)
            g = np.sqrt(np.float64(n * s2 - s * s))
            h = np.sqrt((n * n_w - n_w * n_w).astype(np.float64)
                        / np.float64(n - 1))
            z = numer / (g * h)
            out["tile_x"].append(np.full(n, txs[i], np.int64))
            out["tile_y"].append(np.full(n, tys[i], np.int64))
            out["px"].append(X.ravel().astype(np.int64))
            out["py"].append(Y.ravel().astype(np.int64))
            out["wsum"].append(wsum.ravel())
            out["n_w"].append(n_w.ravel())
            out["z_r"].append(round_half_away(z.ravel(), 9))
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in out.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


COST_INF = np.int64(1) << np.int64(40)


def cost_distance_stage(ds: ray.data.Dataset, side: int, quant: float = 2.0,
                        offset: int = 5,
                        rounds: int = 36) -> ray.data.Dataset:
    """Least-cost distance from the tile's (0,0) corner over the
    positive integer cost surface c = q + offset (entering a pixel costs
    that pixel's c) — the classic GIS cost-distance / least-cost-corridor
    operator, run as FIXED-round Bellman-Ford min-plus relaxation on the
    4-neighborhood so the SQL twin unrolls the identical pure-integer
    recurrence (bfs_depth pattern; measured convergence on this raster
    family is 31 rounds ≤ the shipped 36 — pytest-enforced against a
    run-to-convergence reference). Map-only, integer-exact."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        n = side * side
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "cost",
                                  "dist")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            c = q + offset
            d = np.full((side, side), COST_INF, np.int64)
            d[0, 0] = 0
            for _ in range(rounds):
                nb = np.full((4, side, side), COST_INF, np.int64)
                nb[0, :, 1:] = d[:, :-1]
                nb[1, :, :-1] = d[:, 1:]
                nb[2, 1:, :] = d[:-1, :]
                nb[3, :-1, :] = d[1:, :]
                d = np.minimum(d, nb.min(axis=0) + c)
            rows["tile_x"].append(np.full(n, txs[i], np.int64))
            rows["tile_y"].append(np.full(n, tys[i], np.int64))
            rows["px"].append(X.ravel().astype(np.int64))
            rows["py"].append(Y.ravel().astype(np.int64))
            rows["cost"].append(c.ravel())
            rows["dist"].append(d.ravel())
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


TERRAIN_DIRS = ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1),
                (0, -1), (1, -1))  # E, SE, S, SW, W, NW, N, NE


def terrain_indices_stage(ds: ray.data.Dataset, side: int,
                          quant: float = 2.0) -> ray.data.Dataset:
    """gdaldem TPI / TRI / roughness per pixel (Wilson et al. 2007;
    Riley et al. 1999 — the remaining third of the reference's
    batch_gdaldem prop dispatch, raster.py:554/566, next to the
    slope/aspect/hillshade stage) plus the 4-neighbour Laplacian.
    Integer-exact like the D8 family: q = floor(vd·quant); TPI is kept
    as its exact numerator pair (tpi_num = n_nbrs·q − Σ nbr, so
    TPI = tpi_num/n_nbrs without ever dividing), TRI = Σ|q − nbr|,
    roughness = max − min of the 3×3 window INCLUDING the center
    (gdaldem semantics), lap4 = 4q − (N+S+E+W) where all four cardinal
    neighbours are in-tile (0 at borders, n4 discloses the count).
    Tile-local neighbours only (border pixels see a shrunken window,
    like d8/skeletonize). Map-only, no shuffle."""
    i64max = np.iinfo(np.int64).max
    i64min = np.iinfo(np.int64).min

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "n_nbrs",
                                  "tpi_num", "tri", "rough", "lap4", "n4")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            cnt = np.zeros((side, side), np.int64)
            s = np.zeros((side, side), np.int64)
            sad = np.zeros((side, side), np.int64)
            mx = np.full((side, side), i64min, np.int64)
            mn = np.full((side, side), i64max, np.int64)
            c4 = np.zeros((side, side), np.int64)
            s4 = np.zeros((side, side), np.int64)
            for dx, dy in TERRAIN_DIRS:
                nq = np.full((side, side), i64max, np.int64)
                ys0, ys1 = max(0, dy), side + min(0, dy)
                xs0, xs1 = max(0, dx), side + min(0, dx)
                nq[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx] = q[ys0:ys1, xs0:xs1]
                valid = nq != i64max
                nz = np.where(valid, nq, 0)
                cnt += valid
                s += nz
                sad += np.where(valid, np.abs(q - nq), 0)
                mx = np.where(valid, np.maximum(mx, nq), mx)
                mn = np.where(valid, np.minimum(mn, nq), mn)
                if dx * dx + dy * dy == 1:
                    c4 += valid
                    s4 += nz
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(X.ravel().astype(np.int64))
            rows["py"].append(Y.ravel().astype(np.int64))
            rows["n_nbrs"].append(cnt.ravel())
            rows["tpi_num"].append((cnt * q - s).ravel())
            rows["tri"].append(sad.ravel())
            rows["rough"].append((np.maximum(mx, q) - np.minimum(mn, q)).ravel())
            rows["lap4"].append(np.where(c4 == 4, 4 * q - s4, 0).ravel())
            rows["n4"].append(c4.ravel())
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


LBP_DIRS: tuple[tuple[int, int], ...] = (
    (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1))


def curvature_stage(ds: ray.data.Dataset, side: int,
                    quant: float = 8.0) -> ray.data.Dataset:
    """Zevenbergen & Thorne (1987) profile / plan curvature per INTERIOR
    pixel — the second-derivative companion of the gdaldem family
    (slope/aspect/hillshade at raster.py:638, TPI/TRI above; reference
    batch_gdaldem raster.py:554). Exact-integer formulation on the
    quantized surface q = floor(vd*quant): with the 3x3 window
    z1..z9 (z5 center, px east, py south) define
      D4 = 2(z4+z6)-4z5, E4 = 2(z2+z8)-4z5, F4 = -z1+z3+z7-z9,
      G2 = z6-z4, H2 = z2-z8       (all exact int64), then
      profile = -(D4*G2^2 + E4*H2^2 + F4*G2*H2) / (2(G2^2+H2^2))
      plan    =  (D4*H2^2 + E4*G2^2 - F4*G2*H2) / (2(G2^2+H2^2))
    — numerator/denominator are exact products of small ints, the ONE
    f64 division is bit-identical to the SQL twin, so ROUND(.,9) can
    never tie-split. Flat cells (G2=H2=0) emit 0.0 by convention.
    Border pixels are excluded (no halo; tile-local like d8/terrain).
    Map-only, no shuffle; vectorized over the whole (tiles, y, x) cube."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        n = pxm.shape[0]
        q = np.floor(pxm.reshape(n, side, side) * quant).astype(np.int64)
        z5 = q[:, 1:-1, 1:-1]
        z1 = q[:, :-2, :-2];  z2 = q[:, :-2, 1:-1]; z3 = q[:, :-2, 2:]
        z4 = q[:, 1:-1, :-2]; z6 = q[:, 1:-1, 2:]
        z7 = q[:, 2:, :-2];   z8 = q[:, 2:, 1:-1];  z9 = q[:, 2:, 2:]
        D4 = 2 * (z4 + z6) - 4 * z5
        E4 = 2 * (z2 + z8) - 4 * z5
        F4 = -z1 + z3 + z7 - z9
        G2 = z6 - z4
        H2 = z2 - z8
        den = 2 * (G2 * G2 + H2 * H2)
        pn = -(D4 * G2 * G2 + E4 * H2 * H2 + F4 * G2 * H2)
        qn = D4 * H2 * H2 + E4 * G2 * G2 - F4 * G2 * H2
        with np.errstate(divide="ignore", invalid="ignore"):
            prof = np.where(den == 0, 0.0,
                            pn.astype(np.float64) / den.astype(np.float64))
            plan = np.where(den == 0, 0.0,
                            qn.astype(np.float64) / den.astype(np.float64))
        m = side - 2
        Y, X = np.mgrid[1:side - 1, 1:side - 1]
        from ..functions.rounding import round_half_away
        return pa.table({
            "tile_x": pa.array(np.repeat(
                batch["tile_x"].to_numpy().astype(np.int64), m * m)),
            "tile_y": pa.array(np.repeat(
                batch["tile_y"].to_numpy().astype(np.int64), m * m)),
            "px": pa.array(np.tile(X.ravel().astype(np.int64), n)),
            "py": pa.array(np.tile(Y.ravel().astype(np.int64), n)),
            "prof_r": pa.array(round_half_away(prof.reshape(n, -1), 9)
                               .ravel()),
            "plan_r": pa.array(round_half_away(plan.reshape(n, -1), 9)
                               .ravel()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def lbp_stage(ds: ray.data.Dataset, side: int) -> ray.data.Dataset:
    """Local binary pattern texture codes (Ojala et al. 2002, the P=8,
    R=1 integer variant) + per-tile code histogram — the rotation-naive
    texture descriptor next to the GLCM stats (raster.py:527; reference
    texture_stats shape.py). code = sum 2^k [vd(nbr_k) >= vd(center)]
    over LBP_DIRS order, INTERIOR pixels only; comparisons are on the
    exact f64-widened f32 pixel values, bit-identical in the SQL twin,
    so the whole operator is integer-exact. Emits nonzero histogram
    rows (tile_x, tile_y, code, cnt). Map-only, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        n = pxm.shape[0]
        v = pxm.reshape(n, side, side)
        c = v[:, 1:-1, 1:-1]
        code = np.zeros(c.shape, np.int64)
        for k, (dx, dy) in enumerate(LBP_DIRS):
            nb = v[:, 1 + dy:side - 1 + dy, 1 + dx:side - 1 + dx]
            code += (nb >= c).astype(np.int64) << k
        m = side - 2
        tx = np.repeat(batch["tile_x"].to_numpy().astype(np.int64), m * m)
        ty = np.repeat(batch["tile_y"].to_numpy().astype(np.int64), m * m)
        g = (pd.DataFrame({"tile_x": tx, "tile_y": ty,
                           "code": code.ravel()})
             .groupby(["tile_x", "tile_y", "code"], as_index=False)
             .size().rename(columns={"size": "cnt"}))
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(fn, batch_format="pyarrow")


def focal_median_stage(ds: ray.data.Dataset, side: int,
                       quant: float = 2.0) -> ray.data.Dataset:
    """3×3 focal (lower-)median filter on the quantized grid — the
    salt-and-pepper denoiser of the gdaldem/sieve family beside
    focal_majority_stage. Windows SHRINK at borders (9/6/4 values); the
    deterministic lower median ``sorted[(n-1)//2]`` avoids the even-count
    interpolation (DuckDB MEDIAN interpolates — the SQL twin instead
    indexes the sorted list, identical rule). Vectorized per tile: 9
    shifted sentinel layers, one columnwise sort, one take_along_axis —
    no per-pixel Python. Map-only, integer-exact."""
    SENT = np.int64(np.iinfo(np.int64).max)

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "med_q",
                                  "n_win")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            layers = np.full((9, side, side), SENT, np.int64)
            li = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ys0, ys1 = max(0, dy), side + min(0, dy)
                    xs0, xs1 = max(0, dx), side + min(0, dx)
                    layers[li, ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx] = \
                        q[ys0:ys1, xs0:xs1]
                    li += 1
            s = np.sort(layers, axis=0)
            cnt = (layers != SENT).sum(axis=0).astype(np.int64)
            med = np.take_along_axis(
                s, ((cnt - 1) // 2)[None, :, :], axis=0)[0]
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(X.ravel().astype(np.int64))
            rows["py"].append(Y.ravel().astype(np.int64))
            rows["med_q"].append(med.ravel())
            rows["n_win"].append(cnt.ravel())
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def harris_corners_stage(ds: ray.data.Dataset, side: int,
                         quant: float = 8.0) -> ray.data.Dataset:
    """Harris-Stephens corner response (1988) per tile, exact-integer
    formulation: integer Sobel gradients on the quantized grid
    q = ⌊vd·quant⌋, 3×3 unweighted structure-tensor box sums, and the
    ×20-scaled response ``r20 = 20·(Sxx·Syy − Sxy²) − (Sxx+Syy)²``
    (k = 1/20 — inside skimage's 0.04–0.06 default range, chosen so the
    response stays an exact int64; no Gaussian window, a documented
    deviation). A pixel is a corner iff r20 > 0 AND strictly greater
    than every AVAILABLE neighbor's response (border pixels of the
    valid region compare only in-range neighbors — the SQL twin's
    conditional-agg MAX sees the same set). Valid region: px, py ∈
    [2, side−3] (gradient + box each eat one ring). Map-only,
    no shuffle; vectorized over the tile cube."""
    NEG = np.int64(np.iinfo(np.int64).min // 4)

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        n = pxm.shape[0]
        q = np.floor(pxm.reshape(n, side, side) * quant).astype(np.int64)
        # Sobel on the interior (indices 1..side-2)
        c = q[:, 1:-1, :]
        ix = ((q[:, :-2, 2:] + 2 * q[:, 1:-1, 2:] + q[:, 2:, 2:])
              - (q[:, :-2, :-2] + 2 * q[:, 1:-1, :-2] + q[:, 2:, :-2]))
        iy = ((q[:, 2:, :-2] + 2 * q[:, 2:, 1:-1] + q[:, 2:, 2:])
              - (q[:, :-2, :-2] + 2 * q[:, :-2, 1:-1] + q[:, :-2, 2:]))
        del c
        xx, xy, yy = ix * ix, ix * iy, iy * iy
        # 3x3 box sums over the gradient grid -> valid px,py in [2, side-3]
        def box(a: np.ndarray) -> np.ndarray:
            return sum(a[:, dy:dy + side - 4, dx:dx + side - 4]
                       for dy in range(3) for dx in range(3))
        sxx, sxy, syy = box(xx), box(xy), box(yy)
        r20 = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) * (sxx + syy)
        m = side - 4
        # strict local max vs available neighbors: pad with -inf sentinel
        pad = np.full((n, m + 2, m + 2), NEG, np.int64)
        pad[:, 1:-1, 1:-1] = r20
        ismax = np.ones((n, m, m), bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                ismax &= r20 > pad[:, 1 + dy:1 + dy + m, 1 + dx:1 + dx + m]
        corner = (ismax & (r20 > 0)).astype(np.int64)
        Y, X = np.mgrid[2:side - 2, 2:side - 2]
        return pa.table({
            "tile_x": pa.array(np.repeat(
                batch["tile_x"].to_numpy().astype(np.int64), m * m)),
            "tile_y": pa.array(np.repeat(
                batch["tile_y"].to_numpy().astype(np.int64), m * m)),
            "px": pa.array(np.tile(X.ravel().astype(np.int64), n)),
            "py": pa.array(np.tile(Y.ravel().astype(np.int64), n)),
            "r20": pa.array(r20.reshape(n, -1).ravel()),
            "is_corner": pa.array(corner.reshape(n, -1).ravel()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def twi_stage(ds: ray.data.Dataset, side: int,
              quant: float = 2.0) -> ray.data.Dataset:
    """Topographic wetness index (Beven & Kirkby 1979) per pixel, the
    hydrology composite of d8_directions_stage + flow_accum_stage:
    TWI = ln(a / tan β) re-expressed on the 1/1024 integer log2 grid —
    ``twi_q = lq1024(acc) − lq1024(best_drop + 1)`` where acc is the D8
    accumulation (≥ 1, includes self) and best_drop the steepest
    quantized descent (0 at sinks; +1 keeps the operand ≥ 1). No
    transcendental touches the oracle (the SQL twin uses the identical
    powers-table lq1024); twi_q ∝ 1024·log2 of the wetness ratio.
    Map-only per tile; same D8 kernel and descending-elevation
    accumulation pass as flow_accum_stage."""
    from .textstages import _lq1024

    dxs = np.array([dx for dx, dy in D8_DIRS], np.int64)
    dys = np.array([dy for dx, dy in D8_DIRS], np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        Y, X = np.mgrid[0:side, 0:side]
        Xf, Yf = X.ravel().astype(np.int64), Y.ravel().astype(np.int64)
        rows: dict[str, list] = {k: [] for k in
                                 ("tile_x", "tile_y", "px", "py", "acc",
                                  "best_drop", "twi_q")}
        for i in range(pxm.shape[0]):
            q = np.floor(pxm[i].reshape(side, side) * quant).astype(np.int64)
            best_dir, best_drop = _d8_grid(q, side)
            fd = best_dir.ravel()
            has = fd >= 0
            sd = np.where(has, fd, 0)
            dst = np.where(has, (Yf + dys[sd]) * side + (Xf + dxs[sd]), -1)
            acc = np.ones(side * side, np.int64)
            for idx in np.argsort(-q.ravel(), kind="stable"):
                j = dst[idx]
                if j >= 0:
                    acc[j] += acc[idx]
            drop = best_drop.ravel()
            twi = _lq1024(acc) - _lq1024(drop + 1)
            rows["tile_x"].append(np.full(side * side, txs[i], np.int64))
            rows["tile_y"].append(np.full(side * side, tys[i], np.int64))
            rows["px"].append(Xf)
            rows["py"].append(Yf)
            rows["acc"].append(acc)
            rows["best_drop"].append(drop)
            rows["twi_q"].append(twi)
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def _circle_offsets(r: int) -> np.ndarray:
    """Integer annulus offsets for radius r: dx² + dy² ∈ [r²−r+1, r²+r]
    (symmetric ring around r², ~one pixel thick — both sides inline the
    identical list, so membership is never a float question)."""
    d = np.arange(-r, r + 1, dtype=np.int64)
    DX, DY = np.meshgrid(d, d)
    m = (DX * DX + DY * DY >= r * r - r + 1) & (DX * DX + DY * DY <= r * r + r)
    return np.stack([DX[m], DY[m]], axis=1)


def hough_circles_stage(ds: ray.data.Dataset, side: int,
                        edge_thresh: float = 0.1,
                        radii: tuple[int, ...] = (3, 4, 5)) -> ray.data.Dataset:
    """Circular Hough transform per tile (Duda & Hart 1972's circle
    variant; skimage.transform.hough_circle shape) over the shared
    gradient-magnitude edge mask of hough_lines_stage / ransac_lines:
    every edge pixel votes for candidate centers one integer annulus
    away (offset table per radius, inlined in the SQL twin as VALUES);
    centers clamp to in-tile coordinates. Peak per (tile, radius) =
    max votes, ties to (cx, cy) smallest. All-integer accumulator —
    strict oracle. Output: (tile_x, tile_y, r, peak_cx, peak_cy,
    votes, n_edge). Map-only, no shuffle."""
    offs = {r: _circle_offsets(r) for r in radii}

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n_tiles = px.shape[0]
        txs = batch["tile_x"].to_numpy().astype(np.int64)
        tys = batch["tile_y"].to_numpy().astype(np.int64)
        out: dict[str, list] = {k: [] for k in
                                ("tile_x", "tile_y", "r", "peak_cx",
                                 "peak_cy", "votes", "n_edge")}
        for i in range(n_tiles):
            v = px[i].reshape(side, side)
            gx = np.empty_like(v)
            gx[:, 1:-1] = (v[:, 2:] - v[:, :-2]) / 2.0
            gx[:, 0] = (v[:, 1] - v[:, 0]) / 2.0
            gx[:, -1] = (v[:, -1] - v[:, -2]) / 2.0
            gy = np.empty_like(v)
            gy[1:-1, :] = (v[2:, :] - v[:-2, :]) / 2.0
            gy[0, :] = (v[1, :] - v[0, :]) / 2.0
            gy[-1, :] = (v[-1, :] - v[-2, :]) / 2.0
            idx = np.flatnonzero((gx * gx + gy * gy > edge_thresh).ravel())
            ys, xs = np.divmod(idx, side)
            for r in radii:
                o = offs[r]
                cx = xs[:, None] - o[None, :, 0]
                cy = ys[:, None] - o[None, :, 1]
                ok = (cx >= 0) & (cx < side) & (cy >= 0) & (cy < side)
                code = (cy * side + cx)[ok]
                out["tile_x"].append(txs[i])
                out["tile_y"].append(tys[i])
                out["r"].append(r)
                out["n_edge"].append(len(idx))
                if len(code) == 0:
                    out["peak_cx"].append(-1)
                    out["peak_cy"].append(-1)
                    out["votes"].append(0)
                    continue
                votes = np.bincount(code, minlength=side * side)
                best = int(np.argmax(votes))  # first max = smallest (cy, cx)
                out["peak_cy"].append(best // side)
                out["peak_cx"].append(best % side)
                out["votes"].append(int(votes[best]))
        return pa.table({k: pa.array(np.asarray(vv, np.int64))
                         for k, vv in out.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def seam_carve_stage(ds: ray.data.Dataset, side: int,
                     quant: float = 2.0) -> ray.data.Dataset:
    """Vertical minimum-energy seam per tile (Avidan & Shamir 2007, the
    content-aware-resize primitive): energy is the exact integer L1
    gradient |q_right − q_left| + |q_down − q_up| of the quantized
    elevation (clamped borders — the COALESCE(LAG, q) twin), the DP is
    M[y,x] = E[y,x] + min(M[y−1, x−1..x+1]) with out-of-range = +INF,
    and the backtrack picks argmin of the last row then the minimal
    predecessor among x−1,x,x+1 per step — every tie broken toward the
    SMALLER x on both sides (np.argmin first-hit == ORDER BY m, px).
    Map-only over balanced tile blocks (no shuffle), fully vectorized
    across the batch's tiles; the SQL twin unrolls the DP as one
    LAG/LEAD window CTE per row and the backtrack as one argmin CTE per
    row. Emits one row per (tile, py): the seam column, its cumulative
    cost and its cell energy."""
    INF = np.int64(1) << 40

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        txs = batch["tile_x"].to_numpy()
        tys = batch["tile_y"].to_numpy()
        n = pxm.shape[0]
        q = np.floor(pxm.reshape(n, side, side) * quant).astype(np.int64)
        xs = np.arange(side)
        ys = np.arange(side)
        E = (np.abs(q[:, :, np.minimum(xs + 1, side - 1)]
                    - q[:, :, np.maximum(xs - 1, 0)])
             + np.abs(q[:, np.minimum(ys + 1, side - 1), :]
                      - q[:, np.maximum(ys - 1, 0), :]))
        M = np.empty_like(E)
        M[:, 0] = E[:, 0]
        for y in range(1, side):
            prev = M[:, y - 1]
            lp = np.concatenate([np.full((n, 1), INF), prev[:, :-1]], axis=1)
            rp = np.concatenate([prev[:, 1:], np.full((n, 1), INF)], axis=1)
            M[:, y] = E[:, y] + np.minimum(prev, np.minimum(lp, rp))
        seam = np.empty((n, side), np.int64)
        seam[:, side - 1] = np.argmin(M[:, side - 1], axis=1)
        rows_n = np.arange(n)
        for y in range(side - 2, -1, -1):
            x = seam[:, y + 1]
            cand = np.stack([x - 1, x, x + 1], axis=1)
            ok = (cand >= 0) & (cand < side)
            vals = np.where(ok, M[rows_n[:, None], y,
                                  np.clip(cand, 0, side - 1)], INF)
            seam[:, y] = cand[rows_n, np.argmin(vals, axis=1)]
        py = np.tile(ys, n)
        ti = np.repeat(rows_n, side)
        sx = seam.ravel()
        return pa.table({
            "tile_x": pa.array(txs[ti].astype(np.int64)),
            "tile_y": pa.array(tys[ti].astype(np.int64)),
            "py": pa.array(py.astype(np.int64)),
            "seam_x": pa.array(sx),
            "m_cum": pa.array(M[ti, py, sx]),
            "e_seam": pa.array(E[ti, py, sx]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# Crist & Cicone (1984) Landsat-TM tasseled-cap coefficients, scaled by
# 10^4 to exact integers (the published values have 4 decimals).
TC_BRIGHT = (3037, 2793, 4743, 5585, 5082, 1863)
TC_GREEN = (-2848, -2435, -5436, 7243, 840, -1800)
TC_WET = (1509, 1973, 3279, 3406, -7112, -4572)


def _tc_bands(qs: np.ndarray) -> list[np.ndarray]:
    """Six deterministic co-registered integer "TM bands" derived from the
    shifted quantized pixel qs >= 0 (the fixture raster is single-band, so
    the band stack is synthesized the same way rgb_indices_stage derives
    its RGB triple). All mods act on non-negative ints — numpy % and SQL %
    agree only there."""
    return [qs,
            2 * qs + 5,
            3 * qs + 7,
            (qs * qs) % 101,
            (5 * qs + 3) % 83,
            (7 * qs + 11) % 59]


def tasseled_cap_stage(ds: ray.data.Dataset, side: int,
                       quant: float = 64.0) -> ray.data.Dataset:
    """Tasseled-cap transform (Kauth & Thomas 1976; Crist & Cicone 1984 TM
    coefficients — the fixed linear band rotation every Landsat
    change-detection pipeline applies; geospatial-learn drives the same
    band math through raster.py's stack/calc helpers): pixels quantize to
    exact integers (floor(v*quant + 0.5), shifted non-negative), a 6-band
    stack is derived deterministically, and brightness / greenness /
    wetness are integer dot products with the published coefficients
    x 10^4. Per-tile output: pixel count, the three component sums, the
    brightness max and greenness min — all exact int64, map-only, no
    shuffle."""

    b_c = np.array(TC_BRIGHT, np.int64)
    g_c = np.array(TC_GREEN, np.int64)
    w_c = np.array(TC_WET, np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        qs = np.floor(pxm * quant + 0.5).astype(np.int64) + 128
        bands = _tc_bands(qs)
        bright = sum(c * b for c, b in zip(b_c, bands))
        green = sum(c * b for c, b in zip(g_c, bands))
        wet = sum(c * b for c, b in zip(w_c, bands))
        return pa.table({
            "tile_x": pa.array(batch["tile_x"].to_numpy().astype(np.int64)),
            "tile_y": pa.array(batch["tile_y"].to_numpy().astype(np.int64)),
            "n_px": pa.array(np.full(len(batch), qs.shape[1], np.int64)),
            "bright_sum": pa.array(bright.sum(axis=1)),
            "green_sum": pa.array(green.sum(axis=1)),
            "wet_sum": pa.array(wet.sum(axis=1)),
            "bright_max": pa.array(bright.max(axis=1)),
            "green_min": pa.array(green.min(axis=1)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def bilinear_resample_stage(ds: ray.data.Dataset, side: int,
                            quant: float = 64.0) -> ray.data.Dataset:
    """x2 bilinear upsample (gdal.Warp resampleAlg='bilinear' semantics —
    the resample the reference's batchwarp/_quickwarp family applies;
    raster.py:2591): source pixels quantize to exact integers and the
    upsampled pixels carry an exact x4 fixed-point scale, so
    out[2i,2j] = 4*q[i,j], out[2i,2j+1] = 2*(q[i,j]+q[i,j+1]),
    out[2i+1,2j] = 2*(q[i,j]+q[i+1,j]) and the odd/odd pixel is the
    4-neighbor sum; edges clamp (replicate border). To keep the checked
    surface dense without emitting 4x the pixels, the output is one row
    per (tile, output row): the exact row sum / min / max of the scaled
    upsampled values — every upsampled pixel contributes. Map-only,
    integer-exact, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        n = pxm.shape[0]
        q = (np.floor(pxm * quant + 0.5).astype(np.int64) + 128) \
            .reshape(n, side, side)
        jc = np.minimum(np.arange(side) + 1, side - 1)
        qr = q[:, :, jc]
        qd = q[:, jc, :]
        qdr = qd[:, :, jc]
        e1, e2 = 4 * q, 2 * (q + qr)                     # even output rows
        o1, o2 = 2 * (q + qd), q + qr + qd + qdr         # odd output rows
        txs = batch["tile_x"].to_numpy().astype(np.int64)
        tys = batch["tile_y"].to_numpy().astype(np.int64)
        oy = np.empty(2 * side, np.int64)
        oy[0::2] = 2 * np.arange(side)
        oy[1::2] = 2 * np.arange(side) + 1
        rs = np.empty((n, 2 * side), np.int64)
        rmin = np.empty((n, 2 * side), np.int64)
        rmax = np.empty((n, 2 * side), np.int64)
        rs[:, 0::2] = (e1 + e2).sum(axis=2)
        rs[:, 1::2] = (o1 + o2).sum(axis=2)
        rmin[:, 0::2] = np.minimum(e1, e2).min(axis=2)
        rmin[:, 1::2] = np.minimum(o1, o2).min(axis=2)
        rmax[:, 0::2] = np.maximum(e1, e2).max(axis=2)
        rmax[:, 1::2] = np.maximum(o1, o2).max(axis=2)
        return pa.table({
            "tile_x": pa.array(np.repeat(txs, 2 * side)),
            "tile_y": pa.array(np.repeat(tys, 2 * side)),
            "oy": pa.array(np.tile(oy, n)),
            "row_sum": pa.array(rs.ravel()),
            "row_min": pa.array(rmin.ravel()),
            "row_max": pa.array(rmax.ravel()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def sieve_stage(ds: ray.data.Dataset, side: int, quant: float = 2.0,
                min_size: int = 6) -> ray.data.Dataset:
    """gdal.SieveFilter analogue (the polygon-cleaning pass the reference
    runs before polygonize; GDAL sieve merges raster polygons below a
    pixel threshold into their largest-shared-border neighbor): per tile,
    quantized-value regions label by CCL (_label_regions — min-pixel-idx
    labels, same as polygonize), every region with area < ``min_size``
    merges into the adjacent region sharing the LONGEST border whose own
    area is >= min_size (ties -> smaller neighbor label; a small region
    with only small neighbors stays — one simultaneous pass over the
    ORIGINAL labeling, a documented deviation from GDAL's sequential
    cascade). Output: the surviving region inventory (label, class,
    merged area, how many regions were absorbed) — all exact integers.
    Map-only per tile, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        px = _pix(batch).astype(np.float64)
        n, npx = px.shape
        rows = {"tile_x": [], "tile_y": [], "region_label": [],
                "class_q": [], "area": [], "n_merged": []}
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        for i in range(n):
            img = np.floor(px[i].reshape(side, side) * quant) \
                .astype(np.int64)
            labels = _label_regions(img)
            flat = labels.ravel()
            labs, inv = np.unique(flat, return_inverse=True)
            area = np.bincount(inv).astype(np.int64)
            r = len(labs)
            lh_a = labels[:, :-1].ravel()
            lh_b = labels[:, 1:].ravel()
            lv_a = labels[:-1, :].ravel()
            lv_b = labels[1:, :].ravel()
            u = np.concatenate([lh_a, lh_b, lv_a, lv_b])
            v = np.concatenate([lh_b, lh_a, lv_b, lv_a])
            diff = u != v
            iu = np.searchsorted(labs, u[diff])
            iv = np.searchsorted(labs, v[diff])
            code = iu * r + iv
            ucode, w = np.unique(code, return_counts=True)
            iu, iv = ucode // r, ucode % r
            small = area < min_size
            cand = small[iu] & ~small[iv]
            cu, cv, cw = iu[cand], iv[cand], w[cand].astype(np.int64)
            tgt = np.arange(r)
            has_tgt = np.zeros(r, bool)
            if len(cu):
                order = np.lexsort((labs[cv], -cw, cu))
                firsts = np.flatnonzero(np.r_[True, cu[order][1:]
                                               != cu[order][:-1]])
                sel = order[firsts]
                tgt[cu[sel]] = cv[sel]
                has_tgt[cu[sel]] = True
            final = np.where(small & has_tgt, tgt, np.arange(r))
            area_after = np.zeros(r, np.int64)
            np.add.at(area_after, final, area)
            n_merged = np.bincount(final[small & has_tgt],
                                   minlength=r).astype(np.int64)
            surv = ~(small & has_tgt)
            k = int(surv.sum())
            rows["tile_x"].append(np.full(k, tx[i], np.int64))
            rows["tile_y"].append(np.full(k, ty[i], np.int64))
            rows["region_label"].append(labs[surv].astype(np.int64))
            rows["class_q"].append(img.ravel()[labs[surv]])
            rows["area"].append(area_after[surv])
            rows["n_merged"].append(n_merged[surv])
        if not rows["tile_x"]:
            return pa.table({k2: pa.array([], pa.int64()) for k2 in rows})
        return pa.table({k2: pa.array(np.concatenate(v2))
                         for k2, v2 in rows.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def brovey_pansharpen_stage(ds: ray.data.Dataset, side: int,
                            quant: float = 64.0,
                            ratio_scale: int = 1024) -> ray.data.Dataset:
    """Brovey-transform pansharpening (Gillespie et al. 1987; the ratio
    fusion every RGB+pan stack gets before visual products — the
    reference's stack_ras/rgb composites feed the same band math): three
    derived co-registered integer bands (the rgb_indices derivation) fuse
    with a synthetic pan band (their exact integer mean, scaled x3 to
    avoid division) as out_k = band_k * pan * ratio_scale // sum(bands)
    — floor division on exact integers, so every sharpened pixel is
    bit-reproducible. Per-tile output: the three sharpened band sums,
    min/max of the red channel, and the pixel count. Map-only."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        qs = np.floor(pxm * quant + 0.5).astype(np.int64) + 128
        r = qs
        g = 2 * qs + 5
        b = 3 * qs + 7
        tot = r + g + b                       # > 0 (qs >= 0 -> tot >= 12)
        pan3 = tot                             # 3*pan where pan = tot/3
        outs = [bb * pan3 * ratio_scale // (3 * tot) for bb in (r, g, b)]
        return pa.table({
            "tile_x": pa.array(batch["tile_x"].to_numpy()
                               .astype(np.int64)),
            "tile_y": pa.array(batch["tile_y"].to_numpy()
                               .astype(np.int64)),
            "n_px": pa.array(np.full(len(batch), qs.shape[1], np.int64)),
            "red_sum": pa.array(outs[0].sum(axis=1)),
            "green_sum": pa.array(outs[1].sum(axis=1)),
            "blue_sum": pa.array(outs[2].sum(axis=1)),
            "red_min": pa.array(outs[0].min(axis=1)),
            "red_max": pa.array(outs[0].max(axis=1)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _cross_min3d(a: np.ndarray) -> np.ndarray:
    """3x3 cross-SE erosion with border shrink (min over in-bounds
    center/left/right/up/down) — all contributions from the ORIGINAL
    array, accumulated in place."""
    r = a.copy()
    r[:, :, 1:] = np.minimum(r[:, :, 1:], a[:, :, :-1])
    r[:, :, :-1] = np.minimum(r[:, :, :-1], a[:, :, 1:])
    r[:, 1:, :] = np.minimum(r[:, 1:, :], a[:, :-1, :])
    r[:, :-1, :] = np.minimum(r[:, :-1, :], a[:, 1:, :])
    return r


def _cross_max3d(a: np.ndarray) -> np.ndarray:
    r = a.copy()
    r[:, :, 1:] = np.maximum(r[:, :, 1:], a[:, :, :-1])
    r[:, :, :-1] = np.maximum(r[:, :, :-1], a[:, :, 1:])
    r[:, 1:, :] = np.maximum(r[:, 1:, :], a[:, :-1, :])
    r[:, :-1, :] = np.maximum(r[:, :-1, :], a[:, 1:, :])
    return r


def tophat_stage(ds: ray.data.Dataset, side: int,
                 quant: float = 2.0) -> ray.data.Dataset:
    """Morphological top-hat transforms (Serra's white top-hat
    img - opening and black top-hat closing - img with the 3x3 cross SE
    — the small-feature extractors of the thresh_seg/morphology family;
    shape.py's skimage.morphology usage): exact integer pixels, erosion/
    dilation as in-bounds cross-neighborhood min/max (borders shrink —
    the separable-window semantics the SQL twin's ROWS BETWEEN windows
    produce), opening = dilate(erode), closing = erode(dilate). Per-tile
    output: sum / nonzero count / max of both top-hats. Map-only,
    integer-exact."""

    def fn(batch: pa.Table) -> pa.Table:
        pxm = _pix(batch).astype(np.float64)
        n = pxm.shape[0]
        q = np.floor(pxm * quant).astype(np.int64).reshape(n, side, side)
        opening = _cross_max3d(_cross_min3d(q))
        closing = _cross_min3d(_cross_max3d(q))
        wth = (q - opening).reshape(n, -1)
        bth = (closing - q).reshape(n, -1)
        return pa.table({
            "tile_x": pa.array(batch["tile_x"].to_numpy()
                               .astype(np.int64)),
            "tile_y": pa.array(batch["tile_y"].to_numpy()
                               .astype(np.int64)),
            "n_px": pa.array(np.full(n, side * side, np.int64)),
            "wth_sum": pa.array(wth.sum(axis=1)),
            "wth_nz": pa.array((wth > 0).sum(axis=1).astype(np.int64)),
            "wth_max": pa.array(wth.max(axis=1)),
            "bth_sum": pa.array(bth.sum(axis=1)),
            "bth_nz": pa.array((bth > 0).sum(axis=1).astype(np.int64)),
            "bth_max": pa.array(bth.max(axis=1)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
