import numpy as np

from geospatial_learn_ray.sources.polygons import polygon_table
from geospatial_learn_ray.sources.tiles import GRID_X, GRID_Y, read_tiles, tile_pixels
from geospatial_learn_ray.stages import raster

TPX = 16


def test_texture_stats_properties():
    out = raster.texture_stats(read_tiles(tile_px=TPX), polygon_table(), levels=8).to_pandas()
    assert len(out) == 200  # every polygon contains tile centers
    assert (out.energy > 0).all() and (out.energy <= 1).all()
    assert (out.entropy >= 0).all()
    assert (out.homogeneity > 0).all() and (out.homogeneity <= 1).all()
    assert (out.contrast >= 0).all()
    # determinism
    again = raster.texture_stats(read_tiles(tile_px=TPX), polygon_table(), levels=8).to_pandas()
    a = out.sort_values("feature_id").reset_index(drop=True)
    b = again.sort_values("feature_id").reset_index(drop=True)
    assert a.equals(b)


def test_texture_stats_uniform_image_limits():
    # a GLCM over a constant image: energy == 1, entropy == 0, contrast == 0
    # (direct kernel check on the combine math via a single-tile fixture)
    L = 8
    img = np.full((TPX, TPX), 3, np.int64)
    a = img[:, :-1].ravel()
    b = img[:, 1:].ravel()
    counts = np.bincount(a * L + b, minlength=L * L) * 2
    p = counts / counts.sum()
    i_idx, j_idx = np.divmod(np.arange(L * L), L)
    assert ((i_idx - j_idx) ** 2 * p).sum() == 0
    assert (p**2).sum() == 1.0


def test_slope_exact_across_tile_borders():
    out = raster.slope_stage(read_tiles(tile_px=TPX, with_pixels=False), tile_px=TPX).to_pandas()
    assert len(out) == GRID_X * GRID_Y
    # oracle: global mosaic gradient restricted to one interior tile
    tx, ty = 5, 7
    big = np.block(
        [[tile_pixels(tx + dx, ty + dy, TPX).astype(np.float64) for dx in (-1, 0, 1)] for dy in (-1, 0, 1)]
    )
    # interior window corresponding to tile (tx,ty): rows/cols TPX..2TPX
    gx = (big[:, 2:] - big[:, :-2]) / 2.0
    gy = (big[2:, :] - big[:-2, :]) / 2.0
    mag = np.hypot(gx[1:-1, :], gy[:, 1:-1])
    exp = mag[TPX - 1 : 2 * TPX - 1, TPX - 1 : 2 * TPX - 1].mean()
    got = out[(out.tile_x == tx) & (out.tile_y == ty)].mean_slope.iloc[0]
    assert abs(got - exp) < 1e-5


def test_polygonize_merge_conserves_pixels():
    small = raster.clip_tiles(read_tiles(tile_px=8), -180, -80, -150, -60)
    regions = raster.polygonize_tiles(small, quant=2.0)
    rdf = regions.to_pandas()
    merged = raster.polygonize_merge_count(regions, side=8).to_pandas()
    assert merged.pixel_count.sum() == rdf.pixel_count.sum()
    assert len(merged) <= len(rdf)  # merging can only reduce region count
    assert len(merged) < len(rdf)  # the clip window does contain cross-tile regions


def test_polygonize_merge_matches_driver_union_find():
    # oracle: the round-1 driver-side union-find, restated locally
    small = raster.clip_tiles(read_tiles(tile_px=8), -180, -80, -150, -60)
    regions = raster.polygonize_tiles(small, quant=2.0)
    df = regions.to_pandas().reset_index(drop=True)
    side = 8
    parent = np.arange(len(df))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    r2 = df[df.col_max == side - 1].reset_index().rename(columns={"index": "ridx"})
    l2 = df[df.col_min == 0].reset_index().rename(columns={"index": "lidx"})
    m = r2.merge(l2, on=["tile_y", "region_value"], suffixes=("_a", "_b"))
    m = m[(m.tile_x_b == m.tile_x_a + 1) & (m.row_min_a <= m.row_max_b) & (m.row_max_a >= m.row_min_b)]
    for a, b in zip(m.ridx, m.lidx):
        union(int(a), int(b))
    top = df[df.row_max == side - 1].reset_index().rename(columns={"index": "tidx"})
    bot = df[df.row_min == 0].reset_index().rename(columns={"index": "bidx"})
    mv = top.merge(bot, on=["tile_x", "region_value"], suffixes=("_a", "_b"))
    mv = mv[(mv.tile_y_b == mv.tile_y_a + 1) & (mv.col_min_a <= mv.col_max_b) & (mv.col_max_a >= mv.col_min_b)]
    for a, b in zip(mv.tidx, mv.bidx):
        union(int(a), int(b))
    roots = np.array([find(i) for i in range(len(df))])
    oracle = df.assign(g=roots).groupby("g")["pixel_count"].sum()

    merged = raster.polygonize_merge_count(regions, side=side).to_pandas()
    # same multiset of merged-region sizes (ids differ: node ids vs row idx)
    assert sorted(merged.pixel_count) == sorted(oracle)


def test_gdaldem_aspect_hillshade_ranges():
    asp = raster.gdaldem_stage(read_tiles(tile_px=TPX, with_pixels=False), TPX, prop="aspect").to_pandas()
    hs = raster.gdaldem_stage(read_tiles(tile_px=TPX, with_pixels=False), TPX, prop="hillshade").to_pandas()
    assert len(asp) == GRID_X * GRID_Y and len(hs) == GRID_X * GRID_Y
    assert (asp.mean_aspect >= 0).all() and (asp.mean_aspect < 360).all()
    assert (hs.mean_hillshade >= 0).all() and (hs.mean_hillshade <= 255).all()


def test_gdaldem_hillshade_flat_surface():
    # closed-form check of the hillshade kernel: zero gradient ⇒
    # hs = 255·sin(altitude) everywhere
    exp = 255.0 * np.sin(raster._HS_ALT)
    s = np.arctan(0.0)
    a = np.arctan2(0.0, -0.0)
    hs = 255.0 * (np.sin(raster._HS_ALT) * np.cos(s) + np.cos(raster._HS_ALT) * np.sin(s) * np.cos(raster._HS_AZ - a))
    assert abs(hs - exp) < 1e-12


def test_quegan_constant_image_is_identity():
    # on a locally constant image E == I, every ratio is 1, output == input —
    # kernel identity check mirroring the Quegan formulation
    w = np.full((TPX + 2, TPX + 2), 7.0)
    s = np.zeros((TPX, TPX))
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = s + w[1 + dy : 1 + dy + TPX, 1 + dx : 1 + dx + TPX]
    e = s / 9.0
    assert np.allclose(e, 7.0)
    r0 = np.where(e == 0, 1.0, w[1:-1, 1:-1] / e)
    assert np.allclose(e * r0, 7.0)


def test_quegan_stage_runs_and_is_deterministic():
    a = raster.quegan_stage(read_tiles(tile_px=TPX, with_pixels=False), TPX).to_pandas()
    b = raster.quegan_stage(read_tiles(tile_px=TPX, with_pixels=False), TPX).to_pandas()
    assert len(a) == GRID_X * GRID_Y
    key = ["tile_x", "tile_y"]
    assert a.sort_values(key).reset_index(drop=True).equals(b.sort_values(key).reset_index(drop=True))


def test_global_patch_matches_tile_pixels_interior():
    p = raster.global_patch(5, 7, TPX, 1)
    assert np.array_equal(p[1:-1, 1:-1], tile_pixels(5, 7, TPX).astype(np.float64))
    # halo columns come from the neighbor tiles
    assert np.array_equal(p[1:-1, 0], tile_pixels(4, 7, TPX)[:, -1].astype(np.float64))
    assert np.array_equal(p[0, 1:-1], tile_pixels(5, 6, TPX)[-1, :].astype(np.float64))


def test_temp_match_self_peak():
    # every polygon's template must peak (corr == 1) at its own location
    out = raster.temp_match(read_tiles(tile_px=TPX), polygon_table(), GRID_X, GRID_Y)
    assert len(out) == 200
    assert (out.peak_corr > 0.999999).all()
    # the peak position is the feature's own tile bbox origin: zone-0 starts at tile 0,0
    z0 = out[out.feature_id == 0].iloc[0]
    assert z0.peak_tile_x == 0 and z0.peak_tile_y == 0


def test_rgb_indices_full_family_present():
    out = raster.rgb_indices_stage(read_tiles(tile_px=TPX)).to_pandas()
    for c in ("exg", "exr", "exgr", "cive", "ndi", "rgbvi", "vari", "ari", "rgbi", "gli", "tgl"):
        assert f"{c}_mean" in out.columns
    assert (out.exgr_mean - (out.exg_mean - out.exr_mean)).abs().max() < 1e-4


def test_texture_correlation_bounds():
    out = raster.texture_stats(read_tiles(tile_px=TPX), polygon_table(), levels=8).to_pandas()
    assert "dissimilarity" in out.columns and "correlation" in out.columns
    assert (out.dissimilarity >= 0).all()
    assert (out.correlation >= -1.000001).all() and (out.correlation <= 1.000001).all()


def test_polygonize_rings_green_invariant():
    # Green's theorem: sum of signed loop areas == pixel count, per region
    small = raster.clip_tiles(read_tiles(tile_px=8), -180, -80, -150, -60)
    out = raster.polygonize_rings(small, quant=2.0).to_pandas()
    assert len(out) > 0
    assert (out.area_px == out.pixel_count).all()
    # rings are valid closed WKB polygons
    from geospatial_learn_ray.functions.geometry import wkb_to_ring
    for wkb in out.geometry.head(50):
        ring = wkb_to_ring(wkb)
        assert (ring[0] == ring[-1]).all() and len(ring) >= 5


def test_polygonize_merge_geometry_conserves_and_dissolves():
    small = raster.clip_tiles(read_tiles(tile_px=8), -180, -80, -150, -60)
    rings = raster.polygonize_rings(small, quant=2.0)
    rdf = rings.to_pandas()
    merged = raster.polygonize_merge_geometry(rings, side=8).to_pandas()
    # pixel conservation (matches the count-merge invariant)
    assert merged.pixel_count.sum() == rdf.pixel_count.sum()
    # Green invariant survives the cross-tile edge cancellation
    assert (merged.area_px == merged.pixel_count).all()
    # dissolving merged at least one cross-tile region (fewer rows than input)
    assert len(merged) < len(rdf)
    # merged geometry parses and the outer ring is closed
    from geospatial_learn_ray.functions.geometry import wkb_to_ring
    big = merged.sort_values("pixel_count").iloc[-1]
    ring = wkb_to_ring(big.geometry)
    assert (ring[0] == ring[-1]).all()


def test_polygonize_merge_geometry_matches_count_totals():
    small = raster.clip_tiles(read_tiles(tile_px=8), -180, -80, -150, -60)
    rings = raster.polygonize_rings(small, quant=2.0)
    regions = raster.polygonize_tiles(small, quant=2.0)
    a = raster.polygonize_merge_geometry(rings, side=8).to_pandas()
    b = raster.polygonize_merge_count(regions, side=8).to_pandas()
    am = a.sort_values("global_region").reset_index(drop=True)
    bm = b.sort_values("global_region").reset_index(drop=True)
    assert am.global_region.tolist() == bm.global_region.tolist()
    assert am.pixel_count.tolist() == bm.pixel_count.tolist()
