"""Composed-equals-stagewise check for ms_toposeg_stage (VERDICT r3 #2):
the one-call composed pipeline must equal a stagewise reference built from
the INDEPENDENT stage outputs — edge masks reconstructed from
canny_edges_stage's emitted rows (the Ray stage, not the shared kernel),
snake evolution per tile, dense mosaic labeling, and a plain union-find
merge. Composition bugs (wrong burn timing, label/node mismatches,
cross-tile pair direction) would break this even though every single
stage is individually conformance-green."""

import numpy as np
import ray.data

from geospatial_learn_ray.sources.tiles import read_tiles, tile_pixels
from geospatial_learn_ray.stages import raster
from geospatial_learn_ray.stages.raster import (
    _label_regions,
    _region_node_ids,
    _simple_point_lut,
    _toposnake_evolve,
)

SIDE, GX, GY = 16, 4, 4
ITERS, QUANT, LO2, HI2 = 3, 8.0, 20_000, 40_000


def _clip(ds):
    # tx,ty <= 3: w=5.625, h=5 deg per tile
    return raster.clip_tiles(ds, -180.0, -80.0, -180.0 + GX * 5.625, -80.0 + GY * 5.0)


def _stagewise_reference():
    """canny_edges_stage (Ray output rows) -> per-tile edge masks; then a
    driver-side snake + label + union-find merge."""
    edges = _clip(read_tiles(tile_px=SIDE))
    edge_rows = raster.canny_edges_stage(edges, side=SIDE, quant=QUANT,
                                         lo2=LO2, hi2=HI2).to_pandas()
    masks = {}
    for (tx, ty), grp in edge_rows.groupby(["tile_x", "tile_y"]):
        m = np.zeros((SIDE, SIDE), bool)
        m[grp["py"].to_numpy(), grp["px"].to_numpy()] = True
        masks[(int(tx), int(ty))] = m

    lut = _simple_point_lut()
    labels, counts = {}, {}
    for ty in range(GY):
        for tx in range(GX):
            v = tile_pixels(tx, ty, SIDE).astype(np.float64)
            burn = masks.get((tx, ty), np.zeros((SIDE, SIDE), bool))
            u = _toposnake_evolve(v, SIDE, ITERS, lut, burn=burn)
            lab = _label_regions(u.astype(np.int64))
            node = _region_node_ids(np.array([tx]), np.array([ty]), np.int64(0), SIDE)[0] + lab
            node = np.where(u > 0, node, -1)
            labels[(tx, ty)] = node
            for nd, c in zip(*np.unique(node[node >= 0], return_counts=True)):
                counts[int(nd)] = int(c)

    parent = {n: n for n in counts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for ty in range(GY):
        for tx in range(GX):
            n_self = labels[(tx, ty)]
            if tx + 1 < GX:
                n_r = labels[(tx + 1, ty)]
                for a, b in zip(n_self[:, -1], n_r[:, 0]):
                    if a >= 0 and b >= 0:
                        union(int(a), int(b))
            if ty + 1 < GY:
                n_b = labels[(tx, ty + 1)]
                for a, b in zip(n_self[-1, :], n_b[0, :]):
                    if a >= 0 and b >= 0:
                        union(int(a), int(b))

    agg = {}
    for nd, c in counts.items():
        root = find(nd)
        pc, nr = agg.get(root, (0, 0))
        agg[root] = (pc + c, nr + 1)
    return agg


def test_ms_toposeg_composed_equals_stagewise():
    out = raster.ms_toposeg_stage(
        _clip(read_tiles(tile_px=SIDE)), side=SIDE, iterations=ITERS,
        quant=QUANT, lo2=LO2, hi2=HI2, grid_x=GX, grid_y=GY,
    ).to_pandas()
    got = {int(r.global_region): (int(r.pixel_count), int(r.n_regions))
           for r in out.itertuples()}
    exp = _stagewise_reference()
    assert got == exp
