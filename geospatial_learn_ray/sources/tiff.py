"""Pure-Python GeoTIFF ingest/egress for the tiles table.

The reference reads and writes every raster through GDAL datasets
(reference raster.py:373 ``raster2array``, raster.py:287 ``array2raster``).
No GDAL wheel exists in this sandbox, so this module implements the
uncompressed baseline-TIFF subset those call sites actually produce —
striped, chunky (PlanarConfiguration=1), Compression=1 — as direct
struct parsing, plus the two GeoTIFF georeferencing tags GDAL emits for
a north-up affine (ModelPixelScale 33550, ModelTiepoint 33922) and a
minimal GeoKeyDirectory (34735).

Byte order: reads both ``II`` (little) and ``MM`` (big endian); writes
``II``. Sample types: u8/u16/u32, i8/i16/i32, f32/f64 via the
BitsPerSample × SampleFormat matrix; multi-band as SamplesPerPixel>1
interleaved. Values round-trip bit-exactly (pytest-verified per dtype).

Scale story (100 TB of scenes): a TIFF's strip directory is a byte-range
index — ``read_tiff_window`` seeks and reads ONLY the strips overlapping
a requested window, so the windowed ingest (``read_tiffs_to_tiles``)
never pulls a whole scene per task; egress (``write_tiles_to_tiffs``)
writes one file per tile row (partitioned, resumable — finished tiles
are skipped by size check), never one giant mosaic.
"""
from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .tiles import GRID_X, GRID_Y, X0, X1, Y1, tile_bounds

# tag ids
_IMAGE_WIDTH, _IMAGE_LENGTH = 256, 257
_BITS_PER_SAMPLE, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP = 273, 277, 278
_STRIP_BYTE_COUNTS, _PLANAR_CONFIG, _SAMPLE_FORMAT = 279, 284, 339
_MODEL_PIXEL_SCALE, _MODEL_TIEPOINT, _GEO_KEY_DIR = 33550, 33922, 34735

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}

# (sample_format, bits) -> numpy dtype char
_DTYPES = {
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}
_FMT_OF_KIND = {"u": 1, "i": 2, "f": 3}


def write_tiff(path: str, array: np.ndarray, *,
               pixel_scale: tuple[float, float] | None = None,
               origin: tuple[float, float] | None = None,
               rows_per_strip: int = 16) -> None:
    """Write ``array`` ((h, w) or (h, w, bands)) as an uncompressed
    striped little-endian (Geo)TIFF. ``pixel_scale=(sx, sy)`` and
    ``origin=(x0, y0)`` (top-left corner) emit the GDAL north-up georef
    tags; omit both for a plain TIFF."""
    a = np.ascontiguousarray(array)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    kind, bits = a.dtype.kind, a.dtype.itemsize * 8
    if (_FMT_OF_KIND.get(kind), bits) not in _DTYPES:
        raise ValueError(f"unsupported dtype {a.dtype}")
    fmt_code = _FMT_OF_KIND[kind]
    a = a.astype(a.dtype.newbyteorder("<"), copy=False)

    n_strips = (h + rows_per_strip - 1) // rows_per_strip
    row_bytes = w * spp * a.dtype.itemsize
    strips = [a[i * rows_per_strip:(i + 1) * rows_per_strip].tobytes()
              for i in range(n_strips)]
    counts = [len(s) for s in strips]
    offsets, off = [], 8
    for c in counts:
        offsets.append(off)
        off += c
    if off % 2:
        off += 1  # word-align the IFD
    ifd_off = off

    def entry(tag: int, typ: int, values) -> tuple[int, int, int, list]:
        return (tag, typ, len(values), list(values))

    entries = [
        entry(_IMAGE_WIDTH, 4, [w]),
        entry(_IMAGE_LENGTH, 4, [h]),
        entry(_BITS_PER_SAMPLE, 3, [bits] * spp),
        entry(_COMPRESSION, 3, [1]),
        entry(_PHOTOMETRIC, 3, [1]),
        entry(_STRIP_OFFSETS, 4, offsets),
        entry(_SAMPLES_PER_PIXEL, 3, [spp]),
        entry(_ROWS_PER_STRIP, 4, [rows_per_strip]),
        entry(_STRIP_BYTE_COUNTS, 4, counts),
        entry(_PLANAR_CONFIG, 3, [1]),
        entry(_SAMPLE_FORMAT, 3, [fmt_code] * spp),
    ]
    if pixel_scale is not None and origin is not None:
        entries.append(entry(_MODEL_PIXEL_SCALE, 12,
                             [float(pixel_scale[0]), float(pixel_scale[1]), 0.0]))
        entries.append(entry(_MODEL_TIEPOINT, 12,
                             [0.0, 0.0, 0.0, float(origin[0]), float(origin[1]), 0.0]))
        # minimal GeoKeyDirectory: version 1.1.0, 1 key:
        # GTModelTypeGeoKey(1024) = 2 (geographic lat/lon)
        entries.append(entry(_GEO_KEY_DIR, 3, [1, 1, 0, 1, 1024, 0, 1, 2]))
    entries.sort(key=lambda t: t[0])

    # lay out out-of-line value blocks after the IFD
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    extra = bytearray()
    packed = []
    for tag, typ, cnt, values in entries:
        size = _TYPE_SIZE[typ] * cnt
        payload = struct.pack(f"<{cnt}{_TYPE_FMT[typ]}", *values)
        if size <= 4:
            packed.append((tag, typ, cnt, payload.ljust(4, b"\0")))
        else:
            if (extra_off + len(extra)) % 2:
                extra += b"\0"
            packed.append((tag, typ, cnt,
                           struct.pack("<I", extra_off + len(extra))))
            extra += payload

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        for s in strips:
            f.write(s)
        if f.tell() % 2:
            f.write(b"\0")
        f.write(struct.pack("<H", len(packed)))
        for tag, typ, cnt, val4 in packed:
            f.write(struct.pack("<HHI", tag, typ, cnt) + val4)
        f.write(struct.pack("<I", 0))  # no next IFD
        f.write(bytes(extra))


def _read_ifd(f) -> tuple[str, dict[int, list]]:
    head = f.read(8)
    if head[:2] == b"II":
        bo = "<"
    elif head[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack(bo + "HI", head[2:])
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    f.seek(ifd_off)
    (n,) = struct.unpack(bo + "H", f.read(2))
    raw = [struct.unpack(bo + "HHI4s", f.read(12)) for _ in range(n)]
    tags: dict[int, list] = {}
    for tag, typ, cnt, val4 in raw:
        if typ not in _TYPE_FMT:
            continue  # ASCII / rational tags are not needed here
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            payload = val4[:size]
        else:
            (off,) = struct.unpack(bo + "I", val4)
            here = f.tell()
            f.seek(off)
            payload = f.read(size)
            f.seek(here)
        tags[tag] = list(struct.unpack(f"{bo}{cnt}{_TYPE_FMT[typ]}", payload))
    return bo, tags


def _geom(tags: dict[int, list]) -> tuple[int, int, int, int, int, np.dtype, dict]:
    w, h = tags[_IMAGE_WIDTH][0], tags[_IMAGE_LENGTH][0]
    spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    bits = tags.get(_BITS_PER_SAMPLE, [8] * spp)
    fmts = tags.get(_SAMPLE_FORMAT, [1] * spp)
    if len(set(bits)) != 1 or len(set(fmts)) != 1:
        raise ValueError("heterogeneous samples unsupported")
    if tags.get(_COMPRESSION, [1])[0] != 1:
        raise ValueError("only uncompressed TIFF supported")
    if tags.get(_PLANAR_CONFIG, [1])[0] != 1:
        raise ValueError("only chunky planar config supported")
    key = (fmts[0], bits[0])
    if key not in _DTYPES:
        raise ValueError(f"unsupported sample format {key}")
    rps = tags.get(_ROWS_PER_STRIP, [h])[0]
    meta = {}
    if _MODEL_PIXEL_SCALE in tags:
        meta["pixel_scale"] = tuple(tags[_MODEL_PIXEL_SCALE][:2])
    if _MODEL_TIEPOINT in tags:
        tp = tags[_MODEL_TIEPOINT]
        meta["origin"] = (tp[3], tp[4])
    return w, h, spp, bits[0], rps, np.dtype(_DTYPES[key]), meta


def read_tiff(path: str) -> tuple[np.ndarray, dict]:
    """Whole-raster read → ((h, w) or (h, w, bands) array, georef meta)."""
    with open(path, "rb") as f:
        bo, tags = _read_ifd(f)
        w, h, spp, bits, rps, dt, meta = _geom(tags)
        offs, cnts = tags[_STRIP_OFFSETS], tags[_STRIP_BYTE_COUNTS]
        buf = bytearray()
        for o, c in zip(offs, cnts):
            f.seek(o)
            buf += f.read(c)
    a = np.frombuffer(bytes(buf), dtype=dt.newbyteorder(bo)).astype(dt)
    a = a.reshape(h, w, spp)
    return (a[:, :, 0] if spp == 1 else a), meta


def read_tiff_window(path: str, row_off: int, col_off: int,
                     height: int, width: int) -> np.ndarray:
    """Windowed read: seeks only the strips covering rows
    [row_off, row_off+height) — the byte-range-pruned analogue of GDAL's
    ``ReadAsArray(col_off, row_off, w, h)`` (reference raster.py:400)."""
    with open(path, "rb") as f:
        bo, tags = _read_ifd(f)
        w, h, spp, bits, rps, dt, _ = _geom(tags)
        offs, cnts = tags[_STRIP_OFFSETS], tags[_STRIP_BYTE_COUNTS]
        s0, s1 = row_off // rps, (row_off + height - 1) // rps
        buf = bytearray()
        for si in range(s0, s1 + 1):
            f.seek(offs[si])
            buf += f.read(cnts[si])
    a = np.frombuffer(bytes(buf), dtype=dt.newbyteorder(bo)).astype(dt)
    a = a.reshape(-1, w, spp)
    r0 = row_off - s0 * rps
    win = a[r0:r0 + height, col_off:col_off + width]
    return win[:, :, 0] if spp == 1 else win


def write_tiles_to_tiffs(ds: ray.data.Dataset, out_dir: str,
                         tile_px: int = 32) -> ray.data.Dataset:
    """Egress: one GeoTIFF per tile row (``tile_{x}_{y}.tif``), georef
    from the tile's lon/lat bounds — partitioned, resumable output (a
    file already present with the expected byte size is skipped).
    Returns a manifest Dataset (tile_x, tile_y, path, nbytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(b: pd.DataFrame) -> pd.DataFrame:
        paths, sizes = [], []
        for _, row in b.iterrows():
            px = np.asarray(row["band_values"], np.float32).reshape(tile_px, tile_px)
            minx, miny, maxx, maxy = tile_bounds(
                np.array([row["tile_x"]]), np.array([row["tile_y"]]))
            path = os.path.join(out_dir, f"tile_{row['tile_x']}_{row['tile_y']}.tif")
            sx = (maxx[0] - minx[0]) / tile_px
            sy = (maxy[0] - miny[0]) / tile_px
            tmp = path + ".part"
            write_tiff(tmp, px, pixel_scale=(sx, sy), origin=(minx[0], maxy[0]))
            want = os.path.getsize(tmp)
            if os.path.exists(path) and os.path.getsize(path) == want:
                os.remove(tmp)  # resumable: finished tile, keep it
            else:
                os.replace(tmp, path)
            paths.append(path)
            sizes.append(want)
        return pd.DataFrame({
            "tile_x": b["tile_x"].to_numpy(np.int32),
            "tile_y": b["tile_y"].to_numpy(np.int32),
            "path": paths, "nbytes": np.asarray(sizes, np.int64)})

    return ds.map_batches(write_batch, batch_format="pandas")


def read_tiffs_to_tiles(in_dir: str) -> ray.data.Dataset:
    """Ingest: ``tile_{x}_{y}.tif`` files → the tiles-table schema
    (tile_x, tile_y, window, crs, band_values list<float32>). The file
    list is a driver-side manifest (names only); pixel bytes are read
    inside tasks, one window per file."""
    names = sorted(n for n in os.listdir(in_dir) if n.endswith(".tif"))

    def read_batch(b: pd.DataFrame) -> pa.Table:
        txs, tys, wins, vals = [], [], [], []
        for name in b["name"]:
            stem = name[:-4].split("_")
            tx, ty = int(stem[1]), int(stem[2])
            a, _meta = read_tiff(os.path.join(in_dir, name))
            txs.append(tx)
            tys.append(ty)
            wins.append({"col_off": tx * a.shape[1], "row_off": ty * a.shape[0],
                         "width": a.shape[1], "height": a.shape[0]})
            vals.append(a.astype(np.float32).ravel())
        return pa.table({
            "tile_x": pa.array(np.asarray(txs, np.int32), pa.int32()),
            "tile_y": pa.array(np.asarray(tys, np.int32), pa.int32()),
            "window": pa.array(wins),
            "crs": pa.array(["EPSG:4326"] * len(txs)),
            "band_values": pa.array(vals, pa.list_(pa.float32())),
        })

    return ray.data.from_items([{"name": n} for n in names]).map_batches(
        read_batch, batch_format="pandas")


def write_scene_tiff(path: str, grid_x: int = 32, grid_y: int = 16,
                     tile_px: int = 32) -> None:
    """Assemble the closed-form raster into ONE scene GeoTIFF
    (grid_y·tile_px rows × grid_x·tile_px cols) — the reference's
    whole-scene dataset that windowed readers then slice
    (raster.py:373 raster2array / its window reads)."""
    from .tiles import tile_pixels

    rows = []
    for ty in range(grid_y):
        rows.append(np.concatenate(
            [tile_pixels(tx, ty, tile_px) for tx in range(grid_x)], axis=1))
    scene = np.concatenate(rows, axis=0)
    w = (X1 - X0) / GRID_X * grid_x / (grid_x * tile_px)
    write_tiff(path, scene, pixel_scale=(w, w), origin=(X0, Y1),
               rows_per_strip=tile_px)


def read_scene_windows(path: str, grid_x: int = 32, grid_y: int = 16,
                       tile_px: int = 32) -> ray.data.Dataset:
    """Windowed ingest of one scene TIFF: the manifest is (tile_x,
    tile_y) window keys; each task seeks ONLY the strips covering its
    window (read_tiff_window) — no task ever reads the whole file, the
    byte-range model that scales to a directory of 100 GB scenes."""
    def read_batch(b: pd.DataFrame) -> pa.Table:
        txs, tys, vals = [], [], []
        for _, r in b.iterrows():
            tx, ty = int(r["tile_x"]), int(r["tile_y"])
            win = read_tiff_window(path, ty * tile_px, tx * tile_px,
                                   tile_px, tile_px)
            txs.append(tx)
            tys.append(ty)
            vals.append(win.astype(np.float32).ravel())
        return pa.table({
            "tile_x": pa.array(np.asarray(txs, np.int32), pa.int32()),
            "tile_y": pa.array(np.asarray(tys, np.int32), pa.int32()),
            "band_values": pa.array(vals, pa.list_(pa.float32())),
        })

    items = [{"tile_x": tx, "tile_y": ty}
             for ty in range(grid_y) for tx in range(grid_x)]
    return ray.data.from_items(items).map_batches(
        read_batch, batch_format="pandas")
