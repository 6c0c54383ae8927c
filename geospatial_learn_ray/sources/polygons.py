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
