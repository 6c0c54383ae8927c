"""Vectorized planar geometry on WKB polygon columns — no shapely.

The reference's geometry layer is OGR/shapely row-at-a-time
(shape.py:921-932 feature loops; shape_props dispatch shape.py:399-469;
PiP via per-feature rasterized masks shape.py:998-1010). Here geometry is

- stored as standard **WKB** binary columns (little-endian POLYGON, one
  outer ring, no holes — the subset our synthetic layers use),
- tested with an exact, vectorized **crossing-number point-in-polygon**
  (loop over polygon edges — small —, vectorized over points), replacing
  the reference's rasterize-per-feature join (SURVEY.md §2.4),
- prefiltered by a **bbox grid index** (our STRtree stand-in: shapely is
  not installable here; the index is built once per actor from a
  broadcast polygon table — SURVEY.md §2.3 "STRtree polygon index").

Geometry property formulas (area/perimeter/centroid/solidity/extent…)
mirror ``shape.shape_props`` (shape.py:315-469) via the shoelace formula
and bbox arithmetic instead of OGR.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POLYGON = 3


def ring_to_wkb(ring: np.ndarray) -> bytes:
    """(m, 2) float64 ring (closed or open) → little-endian WKB POLYGON."""
    ring = np.asarray(ring, np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    out = [struct.pack("<BII", 1, WKB_POLYGON, 1), struct.pack("<I", len(ring))]
    out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def rings_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Multiple closed (m, 2) rings → one little-endian WKB POLYGON (first
    ring outer, rest interior) — the polygonize geometry output format."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def wkb_to_ring(wkb: bytes) -> np.ndarray:
    """WKB POLYGON (single outer ring) → (m, 2) float64 closed ring."""
    byte_order, gtype, nrings = struct.unpack_from("<BII", wkb, 0)
    if byte_order != 1 or gtype != WKB_POLYGON or nrings < 1:
        raise ValueError(f"unsupported WKB (order={byte_order} type={gtype} rings={nrings})")
    (npts,) = struct.unpack_from("<I", wkb, 9)
    return np.frombuffer(wkb, dtype="<f8", count=npts * 2, offset=13).reshape(npts, 2).copy()


def box_ring(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    return np.array([(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)])


def l_shape_ring(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    """Non-convex L: the box minus its upper-right quadrant (exercises exact
    PiP beyond bbox tests — FIXTURES.md §3)."""
    mx = (minx + maxx) / 2.0
    my = (miny + maxy) / 2.0
    return np.array(
        [(minx, miny), (maxx, miny), (maxx, my), (mx, my), (mx, maxy), (minx, maxy), (minx, miny)]
    )


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Exact crossing-number test, vectorized over points (edges looped —
    rings here have ≤8 vertices). Boundary points follow the standard
    half-open rule (deterministic, matches the brute-force oracle)."""
    inside = np.zeros(len(px), dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for k in range(len(x0)):
        cond = (y0[k] > py) != (y1[k] > py)
        if not cond.any():
            continue
        xin = (x1[k] - x0[k]) * (py - y0[k]) / (y1[k] - y0[k]) + x0[k]
        inside ^= cond & (px < xin)
    return inside


class PolygonIndex:
    """Bbox grid index over a small broadcast polygon table (STRtree role).

    Built once per actor (``__init__`` of the PiP join stage) from the
    driver's ``ray.put`` polygon table; ``query`` returns exact
    (point_idx, feature_id) join pairs for a batch of points.
    """

    def __init__(self, feature_ids: np.ndarray, rings: list[np.ndarray], nx: int = 64, ny: int = 32):
        self.feature_ids = np.asarray(feature_ids, np.int64)
        self.rings = rings
        self.bbox = np.array(
            [(r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()) for r in rings]
        )
        self.x0, self.y0 = self.bbox[:, 0].min(), self.bbox[:, 1].min()
        self.x1, self.y1 = self.bbox[:, 2].max(), self.bbox[:, 3].max()
        self.nx, self.ny = nx, ny
        self.sx = (self.x1 - self.x0) / nx or 1.0
        self.sy = (self.y1 - self.y0) / ny or 1.0
        cells: dict[tuple[int, int], list[int]] = {}
        for p in range(len(rings)):
            gx0 = int(np.floor((self.bbox[p, 0] - self.x0) / self.sx))
            gy0 = int(np.floor((self.bbox[p, 1] - self.y0) / self.sy))
            gx1 = int(np.floor((self.bbox[p, 2] - self.x0) / self.sx))
            gy1 = int(np.floor((self.bbox[p, 3] - self.y0) / self.sy))
            for gx in range(max(gx0, 0), min(gx1, nx - 1) + 1):
                for gy in range(max(gy0, 0), min(gy1, ny - 1) + 1):
                    cells.setdefault((gx, gy), []).append(p)
        self.cells = {k: np.array(v, np.int64) for k, v in cells.items()}

    @classmethod
    def from_wkb(cls, feature_ids: np.ndarray, wkbs: list[bytes], **kw) -> "PolygonIndex":
        return cls(feature_ids, [wkb_to_ring(w) for w in wkbs], **kw)

    def candidate_polys(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Distinct polygon row indices whose grid cells are touched by any
        point of the batch (cheap prefilter before exact per-polygon tests)."""
        gx = np.clip(((px - self.x0) / self.sx).astype(np.int64), 0, self.nx - 1)
        gy = np.clip(((py - self.y0) / self.sy).astype(np.int64), 0, self.ny - 1)
        keys = set(zip(gx.tolist(), gy.tolist()))
        hits = [self.cells[k] for k in keys if k in self.cells]
        if not hits:
            return np.zeros(0, np.int64)
        return np.unique(np.concatenate(hits))

    def query(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Exact PiP join for a batch: → (point_idx, feature_id) pair arrays.
        Per candidate polygon: vectorized bbox mask then exact crossing test
        on the masked subset."""
        out_pt: list[np.ndarray] = []
        out_ft: list[np.ndarray] = []
        for p in self.candidate_polys(px, py):
            bx0, by0, bx1, by1 = self.bbox[p]
            m = (px >= bx0) & (px <= bx1) & (py >= by0) & (py <= by1)
            if not m.any():
                continue
            idx = np.nonzero(m)[0]
            hit = points_in_ring(px[idx], py[idx], self.rings[p])
            if hit.any():
                out_pt.append(idx[hit])
                out_ft.append(np.full(int(hit.sum()), self.feature_ids[p], np.int64))
        if not out_pt:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return np.concatenate(out_pt), np.concatenate(out_ft)


def ring_to_geojson(ring: np.ndarray, precision: int = 6) -> str:
    """WKB-ring → GeoJSON Polygon string (shape.shp2gj analogue,
    shape.py:54 / poly2dictlist shape.py:104). Deterministic float
    formatting via fixed precision."""
    import json

    coords = [[round(float(x), precision), round(float(y), precision)] for x, y in ring]
    return json.dumps({"type": "Polygon", "coordinates": [coords]}, separators=(",", ":"))


# --- per-polygon geometry properties (shape.shape_props analogue) ----------


def ring_props(ring: np.ndarray) -> dict[str, float]:
    """Area / perimeter / centroid / bbox extent ratio / convex-hull solidity
    for one closed ring (shoelace + Andrew hull), matching the property set
    of shape.shape_props (shape.py:399-469) in planar coordinates."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    xs, ys = np.roll(x, -1), np.roll(y, -1)
    cross = x * ys - xs * y
    area = 0.5 * float(cross.sum())
    signed = area
    area = abs(area)
    per = float(np.hypot(xs - x, ys - y).sum())
    if area > 0:
        cx = float(((x + xs) * cross).sum()) / (6.0 * signed)
        cy = float(((y + ys) * cross).sum()) / (6.0 * signed)
    else:  # degenerate
        cx, cy = float(x.mean()), float(y.mean())
    w = float(x.max() - x.min())
    h = float(y.max() - y.min())
    extent = area / (w * h) if w * h > 0 else 0.0
    hull = _convex_hull(np.column_stack([x, y]))
    hull_area = _poly_area(hull)
    solidity = area / hull_area if hull_area > 0 else 0.0
    return {
        "area": area,
        "perimeter": per,
        "centroid_x": cx,
        "centroid_y": cy,
        "bbox_w": w,
        "bbox_h": h,
        "extent": extent,
        "solidity": solidity,
    }


def _poly_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(float((x * np.roll(y, -1) - np.roll(x, -1) * y).sum()))


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain (public algorithm)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def buffer_ring(ring: np.ndarray, dist: float, quad_segs: int = 8) -> np.ndarray:
    """Positive buffer of a convex-or-L ring via Minkowski-style vertex
    offsetting on the convex hull (shape.buffer analogue, shape.py:2830):
    each hull vertex is expanded into an arc of ``quad_segs`` points at
    radius ``dist``; result is the convex hull of the arc cloud. Exact for
    convex input up to arc discretization; documented approximation for
    non-convex input (hull first)."""
    hull = _convex_hull(ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring)
    ang = np.linspace(0.0, 2.0 * np.pi, 4 * quad_segs, endpoint=False)
    cloud = (hull[:, None, :] + dist * np.column_stack([np.cos(ang), np.sin(ang)])[None, :, :]).reshape(-1, 2)
    out = _convex_hull(cloud)
    return np.vstack([out, out[:1]])
