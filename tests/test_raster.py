import numpy as np

from geospatial_learn_ray.sources.tiles import read_tiles, tile_pixels
from geospatial_learn_ray.stages import raster

TPX = 16  # small tiles keep the suite fast


def test_tile_pixels_closed_form():
    px = tile_pixels(3, 4, TPX)
    base = np.sin(0.3) + np.cos(0.4)
    assert px.shape == (TPX, TPX)
    assert abs(px[0, 0] - (base + 0.0)) < 1e-6
    assert abs(px[2, 5] - (base + ((2 * 31 + 5) % 97) / 97.0)) < 1e-6


def test_ndvi_matches_closed_form():
    out = raster.ndvi_stage(read_tiles(tile_px=TPX)).to_pandas()
    assert len(out) == 64 * 32
    row = out[(out.tile_x == 3) & (out.tile_y == 4)].iloc[0]
    b1 = tile_pixels(3, 4, TPX).astype(np.float64).ravel()
    b2 = 1.5 * b1 + 0.25
    ndvi = (b2 - b1) / (b2 + b1)
    assert abs(row.ndvi_mean - round(float(ndvi.mean()), 6)) < 2e-6
    assert abs(row.ndvi_min - round(float(ndvi.min()), 6)) < 2e-6


def test_mask_stage_counts():
    out = raster.mask_stage(read_tiles(tile_px=TPX), rule="<", threshold=0.5).to_pandas()
    row = out[(out.tile_x == 10) & (out.tile_y == 10)].iloc[0]
    px = tile_pixels(10, 10, TPX)
    assert row.masked_count == int((px < 0.5).sum())
    masked = np.asarray(row.band_values)
    assert (masked[px.ravel() < 0.5] == 0).all()


def test_raster2points_explode():
    out = raster.raster2points(read_tiles(tile_px=TPX), stride=8).to_pandas()
    assert len(out) == 64 * 32 * (TPX // 8) ** 2
    r = out[(out.tile_x == 3) & (out.tile_y == 4) & (out.row == 8) & (out.col == 0)].iloc[0]
    assert abs(r.value - tile_pixels(3, 4, TPX)[8, 0]) < 1e-6


def test_temporal_comp_mean():
    e0 = read_tiles(tile_px=TPX)
    e1 = raster.mask_stage(read_tiles(tile_px=TPX), rule="<", threshold=-10.0).drop_columns(["masked_count"])
    out = raster.temporal_comp([e0, e1], stat="mean").to_pandas()
    assert len(out) == 64 * 32
    assert (out.n_epochs == 2).all()
    row = out[(out.tile_x == 0) & (out.tile_y == 0)].iloc[0]
    exp = tile_pixels(0, 0, TPX).ravel()  # identical epochs → mean == value
    assert np.allclose(np.asarray(row.band_values), exp, atol=1e-6)


def test_windowed_read_equals_materialized():
    manifest = read_tiles(tile_px=TPX, with_pixels=False)
    lazy = raster.windowed_read(manifest, tile_px=TPX).to_pandas()
    eager = read_tiles(tile_px=TPX).to_pandas()
    lazy = lazy.sort_values(["tile_y", "tile_x"]).reset_index(drop=True)
    eager = eager.sort_values(["tile_y", "tile_x"]).reset_index(drop=True)
    for i in range(0, len(lazy), 500):
        assert np.array_equal(np.asarray(lazy.band_values[i]), np.asarray(eager.band_values[i]))


def test_hist_ecdf_monotone_and_applied():
    ds = read_tiles(tile_px=TPX)
    lut = raster.hist_ecdf_lut(ds, bins=64)
    assert len(lut) == 64
    assert (np.diff(lut) >= 0).all()
    assert abs(lut[-1] - 1.0) < 1e-9
    out = raster.apply_ecdf(read_tiles(tile_px=TPX), lut, ).to_pandas()
    vals = np.asarray(out.band_values.iloc[0])
    assert vals.min() >= 0.0 and vals.max() <= 1.0


def test_zonal_tile_stats_totals():
    from geospatial_learn_ray.sources.polygons import polygon_table
    from geospatial_learn_ray.sources.tiles import GRID_X, GRID_Y

    out = raster.zonal_tile_stats(read_tiles(tile_px=TPX), polygon_table(), GRID_X, GRID_Y).to_pandas()
    assert len(out) > 150  # most polygons contain tile centers
    assert (out.pixel_count % (TPX * TPX) == 0).all()
    assert (out.max_value >= out.mean_value).all() and (out.mean_value >= out.min_value).all()
