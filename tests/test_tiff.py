"""Bit-exact round-trip tests for the pure-Python GeoTIFF codec
(sources/tiff.py — the reference raster.py:287/373 array2raster /
raster2array format gap, VERDICT r4 "Next round" #2)."""
import struct

import numpy as np
import pytest
import ray.data

from geospatial_learn_ray.sources import tiff
from geospatial_learn_ray.sources.tiles import GRID_X, GRID_Y, read_tiles, tile_pixels


@pytest.mark.parametrize("dtype", ["u1", "u2", "u4", "i1", "i2", "i4", "f4", "f8"])
def test_roundtrip_bit_exact_per_dtype(tmp_path, dtype):
    rng = np.random.default_rng(7)
    dt = np.dtype(dtype)
    if dt.kind == "f":
        a = rng.normal(scale=1e3, size=(37, 23)).astype(dt)
    else:
        info = np.iinfo(dt)
        a = rng.integers(info.min, info.max, size=(37, 23), endpoint=True).astype(dt)
    p = str(tmp_path / f"t_{dtype}.tif")
    tiff.write_tiff(p, a, rows_per_strip=5)
    b, meta = tiff.read_tiff(p)
    assert b.dtype == dt
    assert np.array_equal(
        a.view(np.uint8 if dt.itemsize == 1 else f"u{dt.itemsize}"),
        b.view(np.uint8 if dt.itemsize == 1 else f"u{dt.itemsize}"))
    assert meta == {}


def test_roundtrip_multiband_and_georef(tmp_path):
    rng = np.random.default_rng(9)
    a = rng.normal(size=(16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "mb.tif")
    tiff.write_tiff(p, a, pixel_scale=(0.1, 0.2), origin=(-180.0, 80.0))
    b, meta = tiff.read_tiff(p)
    assert b.shape == (16, 16, 3)
    assert np.array_equal(a, b)
    assert meta["pixel_scale"] == (0.1, 0.2)
    assert meta["origin"] == (-180.0, 80.0)


def test_windowed_read_matches_slice(tmp_path):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 60000, size=(64, 48)).astype(np.uint16)
    p = str(tmp_path / "w.tif")
    tiff.write_tiff(p, a, rows_per_strip=7)
    w = tiff.read_tiff_window(p, 13, 5, 20, 30)
    assert np.array_equal(w, a[13:33, 5:35])
    # window not aligned to strips, reaching the last partial strip
    w2 = tiff.read_tiff_window(p, 60, 0, 4, 48)
    assert np.array_equal(w2, a[60:64])


def test_big_endian_read(tmp_path):
    # hand-build a minimal MM (big-endian) file: 2x3 uint16, one strip
    a = np.array([[1, 2, 3], [4, 65535, 6]], np.uint16)
    data = a.astype(">u2").tobytes()
    entries = [
        (256, 4, 1, struct.pack(">I", 3)),
        (257, 4, 1, struct.pack(">I", 2)),
        (258, 3, 1, struct.pack(">HH", 16, 0)),
        (259, 3, 1, struct.pack(">HH", 1, 0)),
        (273, 4, 1, struct.pack(">I", 8)),
        (277, 3, 1, struct.pack(">HH", 1, 0)),
        (278, 4, 1, struct.pack(">I", 2)),
        (279, 4, 1, struct.pack(">I", len(data))),
        (339, 3, 1, struct.pack(">HH", 1, 0)),
    ]
    ifd_off = 8 + len(data)
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off) + data
    buf += struct.pack(">H", len(entries))
    for tag, typ, cnt, v4 in entries:
        buf += struct.pack(">HHI", tag, typ, cnt) + v4
    buf += struct.pack(">I", 0)
    p = str(tmp_path / "be.tif")
    open(p, "wb").write(buf)
    b, _ = tiff.read_tiff(p)
    assert b.dtype == np.uint16
    assert np.array_equal(b, a)


def test_tiles_egress_ingest_roundtrip(tmp_path):
    out = str(tmp_path / "tiles")
    ds = read_tiles(tile_px=16, grid_x=4, grid_y=3)
    man = tiff.write_tiles_to_tiffs(ds, out, tile_px=16).to_pandas()
    assert len(man) == 12
    back = tiff.read_tiffs_to_tiles(out).to_pandas()
    assert len(back) == 12
    for _, row in back.iterrows():
        exp = tile_pixels(int(row["tile_x"]), int(row["tile_y"]), 16).ravel()
        assert np.array_equal(np.asarray(row["band_values"], np.float32), exp)


def test_tiles_egress_is_resumable(tmp_path):
    import os
    out = str(tmp_path / "tiles2")
    ds = read_tiles(tile_px=8, grid_x=2, grid_y=2)
    tiff.write_tiles_to_tiffs(ds, out, tile_px=8).materialize()
    mt1 = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    import time
    time.sleep(0.05)
    tiff.write_tiles_to_tiffs(ds, out, tile_px=8).materialize()
    mt2 = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    assert mt1 == mt2  # finished tiles skipped on re-run


def test_scene_windowed_read_matches_tiles(tmp_path):
    import os
    from geospatial_learn_ray.sources import tiff
    p = str(tmp_path / "scene.tif")
    tiff.write_scene_tiff(p, grid_x=4, grid_y=3, tile_px=16)
    back = tiff.read_scene_windows(p, grid_x=4, grid_y=3, tile_px=16).to_pandas()
    assert len(back) == 12
    for _, r in back.iterrows():
        exp = tile_pixels(int(r["tile_x"]), int(r["tile_y"]), 16).ravel()
        assert np.array_equal(np.asarray(r["band_values"], np.float32), exp)
