"""Property-based tests (SURVEY.md §5): cell-encode round trips, PiP vs
brute force, dedup idempotence — hypothesis over the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_learn_ray.functions import geo
from geospatial_learn_ray.functions.geometry import (
    PolygonIndex,
    box_ring,
    l_shape_ring,
    points_in_ring,
    ring_to_wkb,
    wkb_to_ring,
)

coord = st.tuples(
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    st.floats(min_value=-79.9, max_value=79.9, allow_nan=False),
)


@settings(max_examples=50, deadline=None)
@given(st.lists(coord, min_size=1, max_size=30), st.integers(min_value=5, max_value=9))
def test_hex_cell_contains_its_point(pts, res):
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    c = geo.hex_latlng_to_cell(lat, lon, res)
    clat, clon = geo.hex_cell_to_latlng(c)
    # point within circumradius (= edge) of its cell center
    assert (np.hypot(lat - clat, lon - clon) <= geo._hex_edge(res) * 1.0001).all()
    # re-encoding the center gives the same cell
    assert (geo.hex_latlng_to_cell(clat, clon, res) == c).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(coord, min_size=1, max_size=30), st.integers(min_value=1, max_value=29))
def test_s2_parent_prefix_property(pts, level):
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    leaf = geo.s2_latlng_to_cell(lat, lon, 30)
    direct = geo.s2_latlng_to_cell(lat, lon, level)
    assert (geo.s2_parent(leaf, level) == direct).all()
    assert (geo.s2_level(direct) == level).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(coord, min_size=5, max_size=60),
    st.lists(
        st.tuples(
            st.floats(min_value=-170, max_value=150, allow_nan=False),
            st.floats(min_value=-70, max_value=50, allow_nan=False),
            st.floats(min_value=1.0, max_value=25.0, allow_nan=False),
            st.floats(min_value=1.0, max_value=25.0, allow_nan=False),
            st.booleans(),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_polygon_index_equals_bruteforce(pts, boxes):
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    rings = [
        (l_shape_ring if use_l else box_ring)(x, y, x + w, y + h)
        for (x, y, w, h, use_l) in boxes
    ]
    ids = np.arange(len(rings), dtype=np.int64)
    index = PolygonIndex(ids, rings)
    pt_idx, fids = index.query(lon, lat)
    got = set(zip(pt_idx.tolist(), fids.tolist()))
    exp = {
        (i, p)
        for p, ring in enumerate(rings)
        for i in np.nonzero(points_in_ring(lon, lat, ring))[0]
    }
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(st.lists(coord, min_size=3, max_size=10))
def test_wkb_round_trip_property(pts):
    ring = np.array(pts + pts[:1])
    back = wkb_to_ring(ring_to_wkb(ring))
    assert np.allclose(back, ring)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh ", min_size=0, max_size=40), min_size=1, max_size=20))
def test_geocode_pure_function_of_url(urls):
    import pyarrow as pa

    arr = pa.array(urls, pa.string())
    lon1, lat1 = geo.geocode(arr)
    lon2, lat2 = geo.geocode(arr)
    assert np.array_equal(lon1, lon2) and np.array_equal(lat1, lat2)
    # equal urls → equal coords, at any position
    for i, u in enumerate(urls):
        for j, v in enumerate(urls):
            if u == v:
                assert lon1[i] == lon1[j] and lat1[i] == lat1[j]
