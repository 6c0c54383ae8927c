"""Geocode + discrete-global-grid cell encoding stages.

The Ray analogue of the reference's coordinate→pixel arithmetic
(shape.py:2589-2590 ``px=int((mx-rgt[0])/rgt[1])``) and meshgrid tiling
(shape.py:2412): stateless, vectorized ``map_batches`` over zero-copy Arrow
batches — numpy kernels from functions/geo.py, no Python per row.
"""

from __future__ import annotations

import numpy as np
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
