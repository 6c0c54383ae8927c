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


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=5000))
def test_lzw_roundtrip_any_bytes(data):
    from geospatial_learn_ray.functions.gifenc import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=60), min_size=1, max_size=8))
def test_repetition_scores_match_naive(texts):
    import pandas as pd

    from geospatial_learn_ray.functions.textproc import repetition_scores

    out = repetition_scores(pd.Series(texts))
    for row, t in enumerate(texts):
        toks = t.split()
        assert out.n_tokens[row] == len(toks)
        for n, col_d, col_t in ((2, "dup_2gram_frac", "top_2gram_frac"),
                                (3, "dup_3gram_frac", "top_3gram_frac")):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if not grams:
                assert out[col_d][row] == 0.0 and out[col_t][row] == 0.0
                continue
            tot, dis = len(grams), len(set(grams))
            mx = max(grams.count(g) for g in set(grams))
            assert abs(out[col_d][row] - (tot - dis) / tot) < 1e-6
            assert abs(out[col_t][row] - mx / tot) < 1e-6


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=64))
def test_simple_point_lut_flip_preserves_euler_locally(vals, seed):
    # the LUT's defining property, checked directly: flipping a simple
    # center in a random 3x3 patch never changes the number of object
    # components or background components of the padded patch
    import numpy as np

    from geospatial_learn_ray.stages.raster import _SP_OFFS, _simple_point_lut

    lut = _simple_point_lut()
    rng = np.random.default_rng(seed)
    cfg = int(rng.integers(0, 256))
    for center in (0, 1):
        patch = np.zeros((5, 5), np.int64)
        patch[2, 2] = center
        for k, (dy, dx) in enumerate(_SP_OFFS):
            patch[2 + dy, 2 + dx] = (cfg >> k) & 1
        if lut[cfg] != 1:
            continue

        def comps(m, conn8):
            seen = np.zeros_like(m, bool)
            cnt = 0
            nb = ([(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
                  if conn8 else [(-1, 0), (0, -1), (0, 1), (1, 0)])
            for y in range(5):
                for x in range(5):
                    if m[y, x] and not seen[y, x]:
                        cnt += 1
                        stack = [(y, x)]
                        while stack:
                            cy, cx = stack.pop()
                            if seen[cy, cx]:
                                continue
                            seen[cy, cx] = True
                            for dy, dx in nb:
                                ny, nx = cy + dy, cx + dx
                                if 0 <= ny < 5 and 0 <= nx < 5 and m[ny, nx] and not seen[ny, nx]:
                                    stack.append((ny, nx))
            return cnt

        flipped = patch.copy()
        flipped[2, 2] = 1 - center
        assert comps(patch == 1, True) == comps(flipped == 1, True)
        assert comps(patch == 0, False) == comps(flipped == 0, False)
