import numpy as np

from geospatial_learn_ray.functions.geometry import (
    PolygonIndex,
    box_ring,
    buffer_ring,
    l_shape_ring,
    points_in_ring,
    ring_props,
    ring_to_wkb,
    wkb_to_ring,
)
from geospatial_learn_ray.sources.polygons import polygon_rings, polygon_table


def test_wkb_round_trip():
    ring = box_ring(-1, -2, 3, 4)
    back = wkb_to_ring(ring_to_wkb(ring))
    assert np.allclose(back, ring)


def test_points_in_box():
    ring = box_ring(0, 0, 10, 10)
    px = np.array([5.0, -1.0, 10.5, 0.001, 9.999])
    py = np.array([5.0, 5.0, 5.0, 0.001, 9.999])
    assert points_in_ring(px, py, ring).tolist() == [True, False, False, True, True]


def test_points_in_l_shape():
    ring = l_shape_ring(0, 0, 10, 10)  # box minus upper-right quadrant
    px = np.array([2.0, 8.0, 8.0, 2.0])
    py = np.array([2.0, 2.0, 8.0, 8.0])
    assert points_in_ring(px, py, ring).tolist() == [True, True, False, True]


def test_polygon_index_matches_bruteforce():
    ids, rings, _ = polygon_rings()
    index = PolygonIndex(ids, rings)
    rng = np.random.default_rng(42)
    px = rng.uniform(-180, 180, 5000)
    py = rng.uniform(-80, 80, 5000)
    pt_idx, fids = index.query(px, py)
    got = set(zip(pt_idx.tolist(), fids.tolist()))
    exp = set()
    for p, ring in enumerate(rings):
        hit = points_in_ring(px, py, ring)
        for i in np.nonzero(hit)[0]:
            exp.add((int(i), int(ids[p])))
    assert got == exp
    assert len(exp) > 1000  # grid covers most of the extent


def test_polygon_index_from_wkb_roundtrip():
    tbl = polygon_table()
    index = PolygonIndex.from_wkb(tbl["feature_id"].to_numpy(), tbl["geometry"].to_pylist())
    px = np.array([0.0])
    py = np.array([0.0])
    pt, f = index.query(px, py)
    assert len(pt) <= 1  # grid polygons don't overlap


def test_ring_props_box():
    p = ring_props(box_ring(0, 0, 4, 2))
    assert abs(p["area"] - 8.0) < 1e-9
    assert abs(p["perimeter"] - 12.0) < 1e-9
    assert abs(p["centroid_x"] - 2.0) < 1e-9
    assert abs(p["centroid_y"] - 1.0) < 1e-9
    assert abs(p["extent"] - 1.0) < 1e-9
    assert abs(p["solidity"] - 1.0) < 1e-9


def test_ring_props_l_shape():
    p = ring_props(l_shape_ring(0, 0, 4, 4))
    assert abs(p["area"] - 12.0) < 1e-9  # 16 - 4 (upper-right quadrant)
    assert p["solidity"] < 1.0  # non-convex
    assert abs(p["extent"] - 12.0 / 16.0) < 1e-9


def test_buffer_contains_original():
    ring = box_ring(0, 0, 2, 2)
    buf = buffer_ring(ring, 1.0)
    # all original vertices strictly inside the buffered ring
    assert points_in_ring(ring[:-1, 0], ring[:-1, 1], buf).all()
    pb = ring_props(buf)
    assert pb["area"] > 4.0
