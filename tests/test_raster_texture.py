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
