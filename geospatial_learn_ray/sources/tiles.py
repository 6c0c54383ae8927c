"""Synthetic raster as a tiles table (SURVEY.md §1.1 "Ray/Arrow equivalent"
of a GDAL raster; FIXTURES.md §4): one row per block window, pixel payload
as list<float32>, georeferencing as explicit columns.

The closed-form pixel function (no RNG) lets every worker regenerate any
window deterministically — this is what makes the windowed-read actor pool
(stages/raster.py) a faithful stand-in for GDAL ``ReadAsArray`` windows
(raster.py:373-422) without a raster file format in the sandbox.

    value(px, py) = sin(tile_x*0.1) + cos(tile_y*0.1) + ((px*31 + py) % 97)/97
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

GRID_X, GRID_Y = 64, 32  # tiles over [-180,180]×[-80,80]
X0, X1, Y0, Y1 = -180.0, 180.0, -80.0, 80.0


def tile_pixels(tile_x: int, tile_y: int, tile_px: int) -> np.ndarray:
    """(tile_px, tile_px) float32 pixel block for one window — closed form."""
    px = np.arange(tile_px)
    base = np.sin(tile_x * 0.1) + np.cos(tile_y * 0.1)
    grid = ((px[:, None] * 31 + px[None, :]) % 97) / 97.0
    return (base + grid).astype(np.float32)


def tile_bounds(tile_x: np.ndarray, tile_y: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    w = (X1 - X0) / GRID_X
    h = (Y1 - Y0) / GRID_Y
    minx = X0 + tile_x * w
    miny = Y0 + tile_y * h
    return minx, miny, minx + w, miny + h


def read_tiles(tile_px: int = 64, grid_x: int = GRID_X, grid_y: int = GRID_Y, with_pixels: bool = True) -> ray.data.Dataset:
    """→ tiles Dataset (tile_x, tile_y, window struct, [band_values], crs,
    geotransform). ``with_pixels=False`` gives the window manifest only —
    the windowed-read actor pool materializes pixels lazily per batch, the
    Ray analogue of opening the raster once per worker and reading windows
    on demand."""
    n = grid_x * grid_y

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        tx = (ids % grid_x).astype(np.int32)
        ty = (ids // grid_x).astype(np.int32)
        cols: dict = {
            "tile_x": pa.array(tx, pa.int32()),
            "tile_y": pa.array(ty, pa.int32()),
            "window": pa.array(
                [
                    {"col_off": int(x) * tile_px, "row_off": int(y) * tile_px, "width": tile_px, "height": tile_px}
                    for x, y in zip(tx, ty)
                ]
            ),
            "crs": pa.array(["EPSG:4326"] * len(ids)),
        }
        if with_pixels:
            cols["band_values"] = pa.array(
                [tile_pixels(int(x), int(y), tile_px).ravel() for x, y in zip(tx, ty)],
                pa.list_(pa.float32()),
            )
        return pa.table(cols)

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow", batch_size=256)


def tiles_sql(tile_px: int = 32, grid_x: int = GRID_X, grid_y: int = GRID_Y) -> str:
    """DuckDB CTE chain regenerating the closed-form raster pixel-exactly —
    the oracle-side twin of ``tile_pixels`` (used by oracle_sql tile
    queries so tile operators get STRONG value-hash checks).

    Exactness argument: ``sin(tile_x*0.1)`` / ``cos(tile_y*0.1)`` are
    inlined as numpy-computed float64 literals (shortest round-trip repr →
    DuckDB parses the identical bits), the grid term is exact integer
    arithmetic divided by 97.0, and the final ``CAST(... AS FLOAT)`` is the
    same IEEE round-to-nearest as ``astype(float32)``. Per-tile sums of
    ≤ tile_px² float32 values in float64 are exact (24+log2(npx) ≤ 53
    mantissa bits), so downstream AVG/SUM match numpy bit-for-bit.

    Exposes CTEs: ``rast(tile_x, tile_y, py, px, v, vd)`` where ``v`` is
    the float32 pixel and ``vd`` its float64 widening; py is the row index
    (first axis of the pixel block), px the column.
    """
    # CAST AS DOUBLE: bare decimal literals parse as DECIMAL in DuckDB and
    # decimal-exact addition can differ from the engine's float64 adds in
    # near-tie ulps
    sx = ", ".join(f"({tx}, CAST({float(np.sin(tx * 0.1))!r} AS DOUBLE))" for tx in range(grid_x))
    sy = ", ".join(f"({ty}, CAST({float(np.cos(ty * 0.1))!r} AS DOUBLE))" for ty in range(grid_y))
    return (
        f"_tsx(tile_x, sv) AS (VALUES {sx}), "
        f"_tsy(tile_y, cv) AS (VALUES {sy}), "
        f"_tpix AS (SELECT r.range AS py, c.range AS px, "
        f"  ((r.range*31 + c.range) % 97)/97.0 AS g "
        f"  FROM range(0,{tile_px}) r, range(0,{tile_px}) c), "
        f"rast AS (SELECT CAST(tile_x AS INTEGER) AS tile_x, CAST(tile_y AS INTEGER) AS tile_y, "
        f"  py, px, CAST(sv + cv + g AS FLOAT) AS v, "
        f"  CAST(CAST(sv + cv + g AS FLOAT) AS DOUBLE) AS vd "
        f"  FROM _tsx CROSS JOIN _tsy CROSS JOIN _tpix)"
    )
