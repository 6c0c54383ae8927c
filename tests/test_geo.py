import numpy as np
import pyarrow as pa

from geospatial_learn_ray.functions import geo


def _grid(n=500, seed=1):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-79, 79, n)
    lon = rng.uniform(-179, 179, n)
    return lat, lon


# --- S2 (canonical algorithm) ----------------------------------------------

def test_s2_level_and_parent_consistency():
    lat, lon = _grid()
    c30 = geo.s2_latlng_to_cell(lat, lon, 30)
    c12 = geo.s2_latlng_to_cell(lat, lon, 12)
    c5 = geo.s2_latlng_to_cell(lat, lon, 5)
    assert (geo.s2_level(c30) == 30).all()
    assert (geo.s2_level(c12) == 12).all()
    assert (geo.s2_parent(c30, 12) == c12).all()
    assert (geo.s2_parent(c30, 5) == c5).all()
    assert (geo.s2_parent(c12, 5) == c5).all()


def test_s2_known_region():
    # London lands in the 0x4876… region of the canonical S2 curve
    c = geo.s2_latlng_to_cell(np.array([51.5072]), np.array([-0.1276]), 12)
    assert hex(int(c[0])).startswith("0x4876")


def test_s2_locality():
    base = geo.s2_latlng_to_cell(np.array([40.0]), np.array([-70.0]), 10)
    near = geo.s2_latlng_to_cell(np.array([40.0001]), np.array([-70.0001]), 10)
    far = geo.s2_latlng_to_cell(np.array([-40.0]), np.array([70.0]), 10)
    assert base[0] == near[0]
    assert base[0] != far[0]


def test_s2_face_uv_roundtrip():
    # ValidFaceXYZtoUV and FaceUVtoXYZ are inverse maps (published tables,
    # s2coords.h). A sign error on any face — e.g. dividing by the negated
    # major component on faces 3-5 — breaks this on half the sphere.
    lat, lon = _grid(4000, seed=7)
    x, y, z = geo._s2_xyz(lat, lon)
    face, u, v = geo._s2_face_uv(x, y, z)
    assert set(np.unique(face).tolist()) == {0, 1, 2, 3, 4, 5}
    xr, yr, zr = geo._s2_face_uv_to_xyz(face, u, v)
    norm = np.sqrt(xr * xr + yr * yr + zr * zr)
    np.testing.assert_allclose(xr / norm, x, atol=1e-12)
    np.testing.assert_allclose(yr / norm, y, atol=1e-12)
    np.testing.assert_allclose(zr / norm, z, atol=1e-12)


def test_s2_negative_face_locality():
    # near-identical points on each negative-major face share the level-10
    # cell (catches u/v sign flips that scatter them across the face)
    # off-boundary base points (lat=0 / lon at a face center sit exactly on
    # an st=0.5 cell edge where any perturbation legitimately crosses)
    for lat0, lon0 in [(10.3, 179.2), (-7.6, -88.3), (-83.4, 10.7)]:
        base = geo.s2_latlng_to_cell(np.array([lat0]), np.array([lon0]), 10)
        near = geo.s2_latlng_to_cell(np.array([lat0 + 1e-4]), np.array([lon0 + 1e-4]), 10)
        assert base[0] == near[0]


def test_s2_all_faces_hit():
    lats = np.array([0.0, 0.0, 89.0, 0.0, 0.0, -89.0])
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    cells = geo.s2_latlng_to_cell(lats, lons, 1)
    faces = (np.asarray(cells) >> np.uint64(61)).astype(int)
    assert sorted(faces.tolist()) == [0, 1, 2, 3, 4, 5]


# --- hex cell index --------------------------------------------------------

def test_hex_center_reencodes_to_same_cell():
    lat, lon = _grid()
    for res in (5, 7, 9):
        c = geo.hex_latlng_to_cell(lat, lon, res)
        clat, clon = geo.hex_cell_to_latlng(c)
        assert (geo.hex_latlng_to_cell(clat, clon, res) == c).all()


def test_hex_cell_contains_point():
    # point is within one hex circumradius (= edge) of its cell center
    lat, lon = _grid()
    for res in (5, 9):
        c = geo.hex_latlng_to_cell(lat, lon, res)
        clat, clon = geo.hex_cell_to_latlng(c)
        d = np.hypot(lat - clat, lon - clon)
        assert (d <= geo._hex_edge(res) * 1.0001).all()


def test_hex_k_ring():
    c = geo.hex_latlng_to_cell(np.array([10.0]), np.array([20.0]), 7)
    r1 = geo.hex_k_ring(c, 1)
    assert r1.shape == (1, 7)
    assert r1[0, 0] == c[0]
    assert len(set(r1[0].tolist())) == 7
    r2 = geo.hex_k_ring(c, 2)
    assert r2.shape == (1, 19)
    # ring-1 cells' centers are ~sqrt(3)*edge apart from the home center
    clat, clon = geo.hex_cell_to_latlng(r1[0])
    d = np.hypot(clat - clat[0], clon - clon[0])[1:]
    expected = np.sqrt(3) * geo._hex_edge(7)
    assert np.allclose(d, expected, rtol=1e-6)


def test_hex_resolutions_nest_by_size():
    lat, lon = _grid(100)
    c5 = geo.hex_latlng_to_cell(lat, lon, 5)
    c9 = geo.hex_latlng_to_cell(lat, lon, 9)
    assert len(set(c9.tolist())) >= len(set(c5.tolist()))
    q, r, res = geo.hex_unpack(c5)
    assert (res == 5).all()


def test_hex_parent_near_child():
    lat, lon = _grid(100)
    c9 = geo.hex_latlng_to_cell(lat, lon, 9)
    p5 = geo.hex_cell_to_parent(c9, 5)
    plat, plon = geo.hex_cell_to_latlng(p5)
    clat, clon = geo.hex_cell_to_latlng(c9)
    d = np.hypot(plat - clat, plon - clon)
    assert (d <= geo._hex_edge(5) * 1.1).all()


# --- geocoder --------------------------------------------------------------

def test_geocode_bounds_and_determinism():
    urls = pa.array([f"https://site-{i}.example/s/{i}" for i in range(2000)])
    lon1, lat1 = geo.geocode(urls)
    lon2, lat2 = geo.geocode(urls)
    assert np.array_equal(lon1, lon2) and np.array_equal(lat1, lat2)
    assert lon1.min() >= -180 and lon1.max() <= 180
    assert lat1.min() >= -80.1 and lat1.max() <= 80.2


def test_geocode_skew_fixture():
    urls = pa.array([f"https://site-{i}.example/s/{i}" for i in range(20000)])
    lon, lat = geo.geocode(urls, skew=True)
    cells = geo.hex_latlng_to_cell(lat, lon, 7)
    _, counts = np.unique(cells, return_counts=True)
    top = np.sort(counts)[-6:].sum()
    assert top / len(urls) > 0.25  # hot cities hold ~30%


def test_geocode_no_skew_uniform():
    urls = pa.array([f"https://site-{i}.example/s/{i}" for i in range(20000)])
    lon, lat = geo.geocode(urls, skew=False)
    cells = geo.hex_latlng_to_cell(lat, lon, 5)
    _, counts = np.unique(cells, return_counts=True)
    assert counts.max() / len(urls) < 0.01


def _geohash_bisect_ref(lat: float, lon: float, precision: int) -> str:
    """Independent textbook bisection implementation (test-only)."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, out, even = 0, [], True
    nb = 0
    for _ in range(5 * precision):
        if even:
            mid = (lon_lo + lon_hi) / 2
            bit = lon >= mid
            lon_lo, lon_hi = (mid, lon_hi) if bit else (lon_lo, mid)
        else:
            mid = (lat_lo + lat_hi) / 2
            bit = lat >= mid
            lat_lo, lat_hi = (mid, lat_hi) if bit else (lat_lo, mid)
        bits = bits * 2 + int(bit)
        nb += 1
        if nb == 5:
            out.append(alpha[bits])
            bits, nb = 0, 0
        even = not even
    return "".join(out)


def test_geohash_known_vector_and_bisection_parity():
    # the canonical published example (Wikipedia / Niemeyer)
    got = geo.geohash_encode(np.array([57.64911]), np.array([10.40744]), 8)
    assert got[0] == "u4pruydq"
    rng = np.random.default_rng(5)
    lat = rng.uniform(-89.9, 89.9, 300)
    lon = rng.uniform(-179.9, 179.9, 300)
    enc = geo.geohash_encode(lat, lon, 8)
    for i in range(300):
        assert enc[i] == _geohash_bisect_ref(float(lat[i]), float(lon[i]), 8)


def test_geohash_prefix_is_parent_cell():
    rng = np.random.default_rng(6)
    lat = rng.uniform(-89.9, 89.9, 500)
    lon = rng.uniform(-179.9, 179.9, 500)
    g8 = geo.geohash_encode(lat, lon, 8)
    g4 = geo.geohash_encode(lat, lon, 4)
    assert (np.char.ljust(g8.astype("U4"), 4) == g4).all()
    # nearby points share long prefixes, antipodal points don't
    a = geo.geohash_encode(np.array([48.8584, 48.8585]), np.array([2.2945, 2.2946]), 8)
    assert a[0][:5] == a[1][:5]


def test_haversine_known_values_and_nearest_city():
    import pandas as pd
    import pyarrow as pa
    import ray

    from geospatial_learn_ray.stages.cellindex import nearest_city

    # published great-circle London->NYC ~= 5570.25 km (IUGG radius)
    d = geo.haversine_km(np.array([51.5072]), np.array([-0.1276]),
                         40.7128, -74.0060)
    assert abs(d[0] - 5570.25) < 0.5
    assert geo.haversine_km(np.array([12.3]), np.array([45.6]),
                            12.3, 45.6)[0] == 0.0
    # antipodal ~ pi*R
    d = geo.haversine_km(np.array([0.0]), np.array([0.0]), 0.0, 180.0)
    assert abs(d[0] - np.pi * 6371.0088) < 0.01

    urls = [f"https://site-{i}.example/s/{i}" for i in range(4000)]
    out = nearest_city(ray.data.from_arrow(
        pa.table({"url": pa.array(urls)})).repartition(5)).to_pandas()
    lon, lat = geo.geocode(pa.array(urls))
    hot = out["dist_km"].to_numpy() < 2.0
    # the hot 30% sit inside a 0.01-degree jitter box of their city
    assert 0.2 < hot.mean() < 0.4
    # hot pages' city assignment equals the geocoder's own hot-city draw
    from geospatial_learn_ray.functions.hashing import fnv1a64, splitmix64
    h = splitmix64(fnv1a64(pa.array(urls)))
    is_hot = (h % np.uint64(10)) < np.uint64(3)
    city = (h % np.uint64(5)).astype(np.int64)
    m = pd.Series(out["city"].to_numpy(), index=out["url"]).reindex(urls).to_numpy()
    assert (m[is_hot] == city[is_hot]).all()


def test_hex_kring_smooth_brute_force_and_block_invariant():
    import pandas as pd
    import pyarrow as pa
    import ray

    from geospatial_learn_ray.functions.rounding import round_half_away
    from geospatial_learn_ray.stages.cellindex import _HEX_RING1, hex_kring_smooth

    urls = [f"https://site-{i}.example/k/{i}" for i in range(3000)]
    texts = ["x" * (17 + (i * 13) % 211) for i in range(3000)]
    lon, lat = geo.geocode(pa.array(urls))
    cell = geo.hex_latlng_to_cell(lat, lon, 7).view(np.int64)
    nch = np.array([len(t) for t in texts], np.int64)
    agg = (pd.DataFrame({"cell": cell, "n": 1, "s": nch})
           .groupby("cell").agg(n=("n", "sum"), s=("s", "sum")))
    rows = []
    for c, r in agg.iterrows():
        rc = rp = rs = 0
        for d in _HEX_RING1:
            if c + d in agg.index:
                rc += 1
                rp += int(agg.loc[c + d, "n"])
                rs += int(agg.loc[c + d, "s"])
        rows.append((np.int64(c).view(np.uint64) if hasattr(np.int64(c), "view")
                     else c, int(r["n"]), rc, rp,
                     float(round_half_away(np.array([rs / rp]), 6)[0])))
    ref = pd.DataFrame(rows, columns=["cell_h3_r7", "n_own", "ring_cells",
                                      "ring_pages", "mean_chars_ring"])
    ref["cell_h3_r7"] = np.array([np.int64(c).astype(np.int64) for c in agg.index],
                                 np.int64).view(np.uint64)
    ref = ref.astype({"n_own": np.int64, "ring_cells": np.int64,
                      "ring_pages": np.int64}) \
        .sort_values("cell_h3_r7").reset_index(drop=True)
    # hot-city cells must actually have populated rings (the test bites)
    assert (ref["ring_cells"] > 1).any()

    t = pa.table({"url": pa.array(urls), "text": pa.array(texts)})
    for parts in (1, 6):
        out = hex_kring_smooth(ray.data.from_arrow(t).repartition(parts)) \
            .to_pandas().sort_values("cell_h3_r7").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ref, check_exact=True)


def test_quadtree_matches_bruteforce_and_properties():
    import collections

    import pandas as pd
    import ray.data

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.cellindex import (QT_CAP, QT_DEPTH,
                                                       quadtree_cells)

    pages = read_pages("/root/testdata/sf0.001", columns=["url"])
    out = quadtree_cells(pages).to_pandas() \
        .sort_values(["depth", "cx", "cy"]).reset_index(drop=True)

    urls = pages.to_pandas()["url"]
    lon, lat = geo.geocode(urls)
    side = 1 << QT_DEPTH
    cx = np.minimum(np.floor((lon + 180.0) / 360.0 * float(side)),
                    side - 1).astype(np.int64)
    cy = np.minimum(np.floor((lat + 90.0) / 180.0 * float(side)),
                    side - 1).astype(np.int64)
    cnt = {d: collections.Counter() for d in range(QT_DEPTH + 1)}
    for x, y in zip(cx, cy):
        for d in range(QT_DEPTH + 1):
            cnt[d][(x >> (QT_DEPTH - d), y >> (QT_DEPTH - d))] += 1
    leaves = []

    def walk(d, x, y):
        n = cnt[d].get((x, y), 0)
        if n == 0:
            return
        if n <= QT_CAP or d == QT_DEPTH:
            leaves.append((d, x, y, n))
            return
        for ddx in (0, 1):
            for ddy in (0, 1):
                walk(d + 1, 2 * x + ddx, 2 * y + ddy)

    walk(0, 0, 0)
    ref = pd.DataFrame(sorted(leaves),
                       columns=["depth", "cx", "cy", "n_points"]) \
        .astype(np.int64)
    pd.testing.assert_frame_equal(out, ref)

    # every point in exactly one leaf
    assert int(out["n_points"].sum()) == len(urls)
    # leaves are prefix-free: no leaf is an ancestor of another
    cells = set(zip(out["depth"], out["cx"], out["cy"]))
    for d, x, y in cells:
        for dd in range(d):
            assert (dd, x >> (d - dd), y >> (d - dd)) not in cells
    # the skew fixture forces hot-city cells to the max depth, over cap
    deepest = out[out["depth"] == QT_DEPTH]
    assert len(deepest) >= 3
    assert (deepest["n_points"] > QT_CAP).all()
    # block-structure invariance
    out2 = quadtree_cells(pages.repartition(7)).to_pandas() \
        .sort_values(["depth", "cx", "cy"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out2, ref)


def test_kriging_matches_independent_solver_and_is_unbiased():
    import pandas as pd
    import ray.data

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.cellindex import kriging_grid

    pages = read_pages("/root/testdata/sf0.001", columns=["url", "text"])
    out = kriging_grid(pages).to_pandas() \
        .sort_values(["gx", "gy"]).reset_index(drop=True)
    assert len(out) > 10

    # independent reference: same neighbor rule, np.linalg.solve (NOT the
    # shared Cramer texts) — catches a wrong system both twins could share
    pdf = pages.to_pandas()
    lon, lat = geo.geocode(pdf["url"])
    v = pdf["text"].str.len().to_numpy(np.int64)
    cx = np.floor(lon).astype(np.int64)
    cy = np.floor(lat).astype(np.int64)
    cand = {}
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for i in range(len(lon)):
                cand.setdefault((cx[i] + dx, cy[i] + dy), []).append(i)
    for _, row in out.sample(min(len(out), 12), random_state=7).iterrows():
        key = (row["gx"], row["gy"])
        idx = cand[key]
        assert len(idx) == row["n_cand"]
        cxc, cyc = key[0] + 0.5, key[1] + 0.5
        d2 = [(lon[i] - cxc) ** 2 + (lat[i] - cyc) ** 2 for i in idx]
        order = sorted(range(len(idx)),
                       key=lambda j: (d2[j], pdf["url"].iloc[idx[j]]))[:3]
        pts = [idx[j] for j in order]
        g = np.zeros((4, 4))
        for a in range(3):
            for b in range(3):
                g[a, b] = np.hypot(lon[pts[a]] - lon[pts[b]],
                                   lat[pts[a]] - lat[pts[b]])
            g[a, 3] = g[3, a] = 1.0
        rhs = np.array([np.hypot(lon[p] - cxc, lat[p] - cyc)
                        for p in pts] + [1.0])
        lam = np.linalg.solve(g, rhs)[:3]
        est = float(np.dot(lam, v[pts]))
        assert abs(est - row["krig_r"]) < 1e-5

    # unbiasedness (Σλ = 1): a constant field is reproduced exactly
    import pyarrow as _pa
    urls = pdf["url"].tolist()
    const = ray.data.from_arrow(_pa.table({
        "url": _pa.array(urls), "text": _pa.array(["x" * 100] * len(urls))}))
    cst = kriging_grid(const).to_pandas()
    assert np.allclose(cst["krig_r"], 100.0, atol=1e-5)

    # block-structure invariance
    out2 = kriging_grid(pages.repartition(7)).to_pandas() \
        .sort_values(["gx", "gy"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_zorder_part1by1_and_pruning_win():
    import numpy as np
    import ray

    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages.cellindex import (
        _part1by1, zorder_layout_pages)

    # bit-spread reference: every set bit of v lands at 2*i
    v = np.arange(256, dtype=np.int64)
    ref = np.zeros(256, np.int64)
    for i in range(8):
        ref |= ((v >> i) & 1) << (2 * i)
    assert (_part1by1(v) == ref).all()
    # interleave is a bijection on the 16-bit grid
    ix, iy = np.meshgrid(np.arange(64), np.arange(64))
    z = _part1by1(ix.ravel().astype(np.int64)) \
        | (_part1by1(iy.ravel().astype(np.int64)) << 1)
    assert len(np.unique(z)) == 64 * 64
    out = zorder_layout_pages(
        read_pages("/root/testdata/sf0.001", columns=["url"])).to_pandas()
    # zone-map pruning must lose no hits and skip a real fraction of files
    assert out.loc[out.need_scan == 0, "n_hits"].sum() == 0
    assert out["n_rows"].sum() == 500
    assert 0 < out["need_scan"].sum() < len(out)
    # Z-contiguous files bound cell ranges: a file spans <= 2^files_shift
    # Morton slots, so its ix/iy spreads stay inside one 8x8-ish window
    assert ((out.max_ix - out.min_ix) <= 15).all()
    assert ((out.max_iy - out.min_iy) <= 15).all()


def test_hilbert_distance_bijective_and_adjacent():
    """xy2d is a bijection onto [0, 4^order) and consecutive distances
    are grid-adjacent cells (THE Hilbert property Morton lacks)."""
    import numpy as np

    from geospatial_learn_ray.stages.cellindex import _hilbert_d

    order = 4
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = _hilbert_d(xs.ravel(), ys.ravel(), order)
    assert sorted(d.tolist()) == list(range(n * n))
    pos = np.empty((n * n, 2), np.int64)
    pos[d] = np.stack([xs.ravel(), ys.ravel()], axis=1)
    step = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert (step == 1).all()


def test_hex_parent_exact_properties():
    """Exact-dyadic parent: near-total agreement with the float
    re-encode (divergence only at dyadic rounding ties), correct res
    field, and the parent center is within one parent-cell diameter of
    the child center (the aperture containment contract — hexes do NOT
    nest, so parent-of-parent is legitimately path-dependent and the
    rollup always composes levels sequentially on both sides)."""
    rng = np.random.default_rng(5)
    lat = rng.uniform(-60, 60, 2000)
    lon = rng.uniform(-170, 170, 2000)
    c9 = geo.hex_latlng_to_cell(lat, lon, 9)
    p7 = geo.hex_cell_to_parent_exact(c9, 7)
    # q/4, r/4 land EXACTLY on .5 for ~25% of cells per axis: those are
    # genuine half-boundary ties where the float path's ulp noise picks
    # a side arbitrarily — agreement is high but far from total
    pf = geo.hex_cell_to_parent(c9, 7)
    assert (pf == p7).mean() > 0.85
    _, _, res = geo.hex_unpack(p7)
    assert (res == 7).all()
    cy, cx = geo.hex_cell_to_latlng(c9)
    py, px = geo.hex_cell_to_latlng(p7)
    d = np.hypot(px - cx, py - cy)
    assert (d <= 2.0 * geo._hex_edge(7)).all()
