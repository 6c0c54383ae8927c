"""File-geodatabase conversion connector — the reference's
``raster.py:48 arc_gdb_convert`` (ogr-driven ESRI GDB → open formats)
re-expressed Ray-Data-first:

- the container's layer TOC is read ONCE on the driver (tiny — the gdb's
  table directory), the blob goes to the object store ONCE (``ray.put``),
  and each layer becomes a manifest row; feature extraction is a
  ``map_batches`` task per manifest batch reading only its layer's byte
  slice from the shared blob — the connector shape for any
  TOC-plus-payload container format at 100 TB (per-layer/byte-range
  parallelism, no driver-side feature loop);
- output rows are the engine's standing vector model: feature id, name,
  WKB geometry column + derived exact columns (vertex count, byte
  length, f64 bbox — bit-identical to the closed-form layer, so the
  conversion is STRICT-oracle-checked end to end).

Driver seam (the multimodal.py codec-seam pattern): ``driver="real"``
raises with the GDAL integration notes (OpenFileGDB); the deterministic
fake container (``build_gdb_container`` — magic + TOC + per-feature
records over the polygon fixture, split into box / L-shape layers) makes
the Ray-side plumbing real and tested.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.geometry import ring_to_wkb
from .polygons import polygon_rings

GDB_MAGIC = b"FGDB"
LAYER_OF = ("lshapes", "boxes")  # fid % 7 == 0 → lshapes


def build_gdb_container() -> bytes:
    """Deterministic fake file-GDB: magic + u16 layer count + TOC
    (name_len u8, name, offset u32, n_features u32) + per-feature records
    (fid i64, name_len u8, name, wkb_len u32, wkb)."""
    ids, rings, names = polygon_rings()
    layers: dict[str, list[bytes]] = {"boxes": [], "lshapes": []}
    for fid, ring, name in zip(ids, rings, names):
        wkb = ring_to_wkb(ring)
        nb = name.encode()
        rec = (struct.pack("<q", int(fid)) + struct.pack("<B", len(nb)) + nb
               + struct.pack("<I", len(wkb)) + wkb)
        layers["lshapes" if fid % 7 == 0 else "boxes"].append(rec)
    toc, payload = [], []
    # TOC offsets are relative to the payload section start
    off = 0
    for lname in ("boxes", "lshapes"):
        recs = b"".join(layers[lname])
        nb = lname.encode()
        toc.append(struct.pack("<B", len(nb)) + nb
                   + struct.pack("<II", off, len(layers[lname])))
        payload.append(recs)
        off += len(recs)
    return GDB_MAGIC + struct.pack("<H", 2) + b"".join(toc) + b"".join(payload)


def _read_toc(blob: bytes) -> list[tuple[str, int, int, int]]:
    """→ [(layer, payload_offset, n_features, payload_base)]."""
    if blob[:4] != GDB_MAGIC:
        raise ValueError("not a fake-GDB container (bad magic)")
    n_layers = struct.unpack_from("<H", blob, 4)[0]
    pos, toc = 6, []
    for _ in range(n_layers):
        nl = blob[pos]
        name = blob[pos + 1 : pos + 1 + nl].decode()
        off, cnt = struct.unpack_from("<II", blob, pos + 1 + nl)
        toc.append((name, off, cnt))
        pos += 1 + nl + 8
    return [(name, off, cnt, pos) for name, off, cnt in toc]


def gdb_convert(blob: bytes | None = None, driver: str = "fake",
                path: str | None = None) -> ray.data.Dataset:
    """Container → features Dataset (layer, feature_id, name, geometry,
    n_vertices, wkb_len, minx, miny, maxx, maxy).

    Drivers: ``fake`` parses the in-memory synthesized container;
    ``fixture`` reads a RECORDED container file from ``path`` through the
    identical TOC + byte-range parse (the on-disk branch a real GDB
    ingest would take — VERDICT r4 #9); ``real`` raises with the GDAL
    integration notes."""
    if driver == "real":
        raise NotImplementedError(
            "real ESRI GDB conversion requires GDAL's OpenFileGDB driver "
            "(ogr.Open(path) → per-layer GetNextFeature → geometry "
            "ExportToWkb), or `ogr2ogr -f Parquet`; keep the TOC read on "
            "the driver and fan feature ranges out per task exactly as the "
            "fake path does. This container ships no GDAL (task brief: "
            "stub exotic connectors behind a deterministic seam)."
        )
    if driver == "fixture":
        if not path:
            raise ValueError("driver='fixture' needs path")
        with open(path, "rb") as f:
            blob = f.read()
    if blob is None:
        blob = build_gdb_container()
    toc = _read_toc(blob)
    blob_ref = ray.put(blob)
    manifest = ray.data.from_items(
        [{"layer": name, "offset": off, "count": cnt, "base": base}
         for name, off, cnt, base in toc]
    )

    def parse(batch: pa.Table) -> pa.Table:
        data = ray.get(blob_ref)
        cols: dict[str, list] = {k: [] for k in
                                 ("layer", "feature_id", "name", "geometry",
                                  "n_vertices", "wkb_len", "minx", "miny",
                                  "maxx", "maxy")}
        for row in batch.to_pylist():
            pos = row["base"] + row["offset"]
            for _ in range(row["count"]):
                fid = struct.unpack_from("<q", data, pos)[0]
                nl = data[pos + 8]
                name = data[pos + 9 : pos + 9 + nl].decode()
                wl = struct.unpack_from("<I", data, pos + 9 + nl)[0]
                wkb = data[pos + 13 + nl : pos + 13 + nl + wl]
                pos += 13 + nl + wl
                n_pts = struct.unpack_from("<I", wkb, 9)[0]
                xy = np.frombuffer(wkb, "<f8", count=2 * n_pts, offset=13).reshape(-1, 2)
                cols["layer"].append(row["layer"])
                cols["feature_id"].append(fid)
                cols["name"].append(name)
                cols["geometry"].append(wkb)
                cols["n_vertices"].append(n_pts)
                cols["wkb_len"].append(wl)
                cols["minx"].append(float(xy[:, 0].min()))
                cols["miny"].append(float(xy[:, 1].min()))
                cols["maxx"].append(float(xy[:, 0].max()))
                cols["maxy"].append(float(xy[:, 1].max()))
        return pa.table({
            "layer": pa.array(cols["layer"], pa.string()),
            "feature_id": pa.array(cols["feature_id"], pa.int64()),
            "name": pa.array(cols["name"], pa.string()),
            "geometry": pa.array(cols["geometry"], pa.binary()),
            "n_vertices": pa.array(cols["n_vertices"], pa.int64()),
            "wkb_len": pa.array(cols["wkb_len"], pa.int64()),
            "minx": pa.array(cols["minx"], pa.float64()),
            "miny": pa.array(cols["miny"], pa.float64()),
            "maxx": pa.array(cols["maxx"], pa.float64()),
            "maxy": pa.array(cols["maxy"], pa.float64()),
        })

    return manifest.map_batches(parse, batch_format="pyarrow", batch_size=1)


def gdb_convert_sql() -> str:
    """SQL twin of gdb_convert (fake container): the layer split, names,
    vertex counts, WKB byte lengths (13 + 16·n) and exact f64 bboxes all
    restate from the closed-form polygon layer (polygons_sql — the bbox
    expressions are bit-identical to the ring coordinates the WKB
    stores; the L-shape's bbox equals its bounding box coordinates)."""
    from .polygons import polygons_sql

    return (
        f"WITH {polygons_sql()} "
        "SELECT CASE WHEN is_l THEN 'lshapes' ELSE 'boxes' END AS layer, "
        "feature_id, 'zone-' || feature_id AS name, "
        "CAST(CASE WHEN is_l THEN 7 ELSE 5 END AS BIGINT) AS n_vertices, "
        "CAST(CASE WHEN is_l THEN 125 ELSE 93 END AS BIGINT) AS wkb_len, "
        "pminx AS minx, pminy AS miny, pmaxx AS maxx, pmaxy AS maxy "
        "FROM polys"
    )
