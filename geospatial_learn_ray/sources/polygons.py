"""Synthetic polygon layer — the broadcast small side of the PiP join
(FIXTURES.md §3). 200 features: a 20×10 grid of axis-aligned boxes over
[-180,180]×[-80,80], each shrunk 10% (gaps ⇒ some points join nothing);
every 7th polygon replaced by a non-convex L-shape to exercise exact PiP.

This plays the role of the reference's vector layer (OGR shapefile,
shape.py:837 zonal loop input); geometry is WKB binary per SURVEY.md §1.2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.geometry import box_ring, l_shape_ring, ring_to_wkb

N_COLS, N_ROWS = 20, 10
X0, X1, Y0, Y1 = -180.0, 180.0, -80.0, 80.0


def polygon_rings() -> tuple[np.ndarray, list[np.ndarray], list[str]]:
    """→ (feature_ids, rings, names). Pure closed-form, no RNG."""
    w = (X1 - X0) / N_COLS
    h = (Y1 - Y0) / N_ROWS
    ids, rings, names = [], [], []
    fid = 0
    for gy in range(N_ROWS):
        for gx in range(N_COLS):
            minx = X0 + gx * w + 0.05 * w
            maxx = X0 + (gx + 1) * w - 0.05 * w
            miny = Y0 + gy * h + 0.05 * h
            maxy = Y0 + (gy + 1) * h - 0.05 * h
            ring = l_shape_ring(minx, miny, maxx, maxy) if fid % 7 == 0 else box_ring(minx, miny, maxx, maxy)
            ids.append(fid)
            rings.append(ring)
            names.append(f"zone-{fid}")
            fid += 1
    return np.array(ids, np.int64), rings, names


def polygons_sql() -> str:
    """DuckDB CTE regenerating the polygon layer's closed form (the oracle
    twin of ``polygon_rings``): per feature the exact f64 bbox and the
    L-shape flag. Exposes ``polys(feature_id, pminx, pminy, pmaxx, pmaxy,
    is_l, pmx, pmy)`` — expression order matches ``polygon_rings`` so every
    coordinate is bit-identical."""
    # every literal CAST to DOUBLE: bare 18.0 literals parse as DECIMAL in
    # DuckDB, and decimal arithmetic diverges from the engine's float64
    # (it agreed only up to nearest-double coincidence, and leaks trailing
    # zeros through VARCHAR casts)
    return (
        "_pg AS (SELECT gy.range*20 + gx.range AS feature_id, "
        "  CAST(-180.0 AS DOUBLE) + gx.range*CAST(18.0 AS DOUBLE) + CAST(0.05 AS DOUBLE)*CAST(18.0 AS DOUBLE) AS pminx, "
        "  CAST(-180.0 AS DOUBLE) + (gx.range+1)*CAST(18.0 AS DOUBLE) - CAST(0.05 AS DOUBLE)*CAST(18.0 AS DOUBLE) AS pmaxx, "
        "  CAST(-80.0 AS DOUBLE) + gy.range*CAST(16.0 AS DOUBLE) + CAST(0.05 AS DOUBLE)*CAST(16.0 AS DOUBLE) AS pminy, "
        "  CAST(-80.0 AS DOUBLE) + (gy.range+1)*CAST(16.0 AS DOUBLE) - CAST(0.05 AS DOUBLE)*CAST(16.0 AS DOUBLE) AS pmaxy "
        "  FROM range(0,20) gx, range(0,10) gy), "
        "polys AS (SELECT *, feature_id % 7 = 0 AS is_l, "
        "  (pminx+pmaxx)/2.0 AS pmx, (pminy+pmaxy)/2.0 AS pmy FROM _pg)"
    )


def pip_sql(px: str, py: str) -> str:
    """SQL predicate: point (px, py) inside the ``polys`` row — the exact
    half-open semantics of the crossing-number test on these axis-parallel
    rings (box: [pminx,pmaxx)×[pminy,pmaxy); L-shape additionally excludes
    the upper-right quadrant [pmx,pmaxx)×[pmy,pmaxy))."""
    return (
        f"({px} >= pminx AND {py} >= pminy AND {py} < pmaxy AND "
        f"(CASE WHEN is_l AND {py} >= pmy THEN {px} < pmx ELSE {px} < pmaxx END))"
    )


def polygon_table() -> pa.Table:
    """WKB polygon table (feature_id:int64, name:string, geometry:binary)."""
    ids, rings, names = polygon_rings()
    return pa.table(
        {
            "feature_id": pa.array(ids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "geometry": pa.array([ring_to_wkb(r) for r in rings], pa.binary()),
        }
    )
