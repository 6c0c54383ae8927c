import numpy as np

from geospatial_learn_ray.functions.geometry import PolygonIndex
from geospatial_learn_ray.functions.rounding import round_half_away
from geospatial_learn_ray.sources.polygons import polygon_table
from geospatial_learn_ray.sources.tiles import GRID_X, GRID_Y, read_tiles, tile_bounds, tile_pixels
from geospatial_learn_ray.stages import raster

TPX = 16
BINS = 64
LO, HI = -2.0, 3.0


def _otsu_naive(counts: np.ndarray) -> tuple[int, int]:
    """Reference Otsu by per-threshold loop (exact integer score)."""
    B = len(counts)
    N = int(counts.sum())
    S = int((np.arange(B) * counts).sum())
    best_t, best_score = 0, -np.inf
    w0 = s0 = 0
    for t in range(B):
        w0 += int(counts[t])
        s0 += t * int(counts[t])
        if w0 == 0 or w0 == N:
            continue
        num = float(s0 * N - w0 * S)
        score = num * num / float(w0 * (N - w0))
        if score > best_score:
            best_t, best_score = t, score
    return best_t, N - int(counts[: best_t + 1].sum())


def test_otsu_zone_matches_bruteforce():
    out = (
        raster.otsu_zone_stage(read_tiles(tile_px=TPX), polygon_table(), bins=BINS, lo=LO, hi=HI)
        .to_pandas()
        .sort_values("feature_id")
        .reset_index(drop=True)
    )
    assert len(out) == 200

    t = polygon_table()
    index = PolygonIndex.from_wkb(t["feature_id"].to_numpy(), t["geometry"].to_pylist())
    hists: dict[int, np.ndarray] = {}
    for ty in range(GRID_Y):
        for tx in range(GRID_X):
            minx, miny, maxx, maxy = tile_bounds(np.array([tx]), np.array([ty]))
            _, fids = index.query((minx + maxx) / 2, (miny + maxy) / 2)
            if len(fids) == 0:
                continue
            px = tile_pixels(tx, ty, TPX).astype(np.float64).ravel()
            q = np.clip(((px - LO) / (HI - LO) * BINS).astype(np.int64), 0, BINS - 1)
            h = np.bincount(q, minlength=BINS)
            for f in fids:
                hists[int(f)] = hists.get(int(f), np.zeros(BINS, np.int64)) + h

    for _, row in out.iterrows():
        c = hists[int(row.feature_id)]
        t_exp, fg_exp = _otsu_naive(c)
        assert int(row.thresh_bin) == t_exp
        assert int(row.n_pix) == int(c.sum())
        assert int(row.fg_count) == fg_exp
        assert row.fg_frac == round_half_away(fg_exp / c.sum(), 6)
        assert abs(row.thresh_value - (LO + (t_exp + 1) * (HI - LO) / BINS)) < 1e-9


def test_otsu_separates_planted_bimodal():
    # two well-separated modes: the cut must land strictly between them
    counts = np.zeros(BINS, np.int64)
    counts[3] = 10
    counts[50] = 10
    t, fg = _otsu_naive(counts)
    assert 3 <= t < 50
    assert fg == 10


def _dense_local_thresh(tpx: int, algo: str, window: int = 5, levels: int = 64):
    """Brute-force reference: full dense mosaic, per-pixel window loop-free
    via padded cumsum with explicit border shrink."""
    H, W = GRID_Y * tpx, GRID_X * tpx
    mos = np.block([[tile_pixels(tx, ty, tpx).astype(np.float64) for tx in range(GRID_X)] for ty in range(GRID_Y)])
    q = np.clip(((mos - LO) / (HI - LO) * levels).astype(np.int64), 0, levels - 1)
    p = window // 2
    fg = np.zeros((GRID_Y, GRID_X), np.int64)
    for gy in range(H):
        y0, y1 = max(0, gy - p), min(H, gy + p + 1)
        for gx in range(W):
            x0, x1 = max(0, gx - p), min(W, gx + p + 1)
            win = q[y0:y1, x0:x1]
            cnt = win.size
            sv = int(win.sum())
            sq = int((win * win).sum())
            m = sv / cnt
            s = np.sqrt(float(sq * cnt - sv * sv)) / cnt
            if algo == "niblack":
                t = m + -0.2 * s
            else:
                t = m * (1.0 + 0.2 * (s / (levels / 2.0) - 1.0))
            if q[gy, gx] > t:
                fg[gy // tpx, gx // tpx] += 1
    return fg


def test_local_thresh_matches_dense_bruteforce():
    # small grid keeps the O(pixels·window²) reference affordable: compare
    # a band of tiles on the raster border (shrinking windows) + interior
    tpx = 8
    for algo in ("niblack", "sauvola"):
        out = (
            raster.local_thresh_stage(
                read_tiles(tile_px=tpx, with_pixels=False), tpx, algo=algo
            )
            .to_pandas()
            .set_index(["tile_y", "tile_x"])
        )
        exp = _dense_local_thresh(tpx, algo)
        col = f"fg_count_{algo}"
        for ty, tx in [(0, 0), (0, 63), (31, 0), (31, 63), (5, 7), (16, 32)]:
            assert out.loc[(ty, tx), col] == exp[ty, tx], (algo, ty, tx)


def test_remove_small_objects_matches_dense_flood_fill():
    # dense reference: BFS 4-connected labeling of the binary mask per tile,
    # drop components with area < min_size (skimage remove_small_objects
    # semantics, connectivity=1)
    from collections import deque

    quant, tbin, min_size, tpx = 2.0, 1, 6, 16
    out = (
        raster.remove_small_objects_stage(
            raster.clip_tiles(read_tiles(tile_px=tpx), -180.0, -80.0, -90.0, 0.0),
            quant=quant, tbin=tbin, min_size=min_size,
        )
        .to_pandas()
        .sort_values(["tile_x", "tile_y", "region_label"])
        .reset_index(drop=True)
    )
    assert len(out) > 0 and (out.pixel_count >= min_size).all()
    for (tx, ty), g in list(out.groupby(["tile_x", "tile_y"]))[:12]:
        mask = np.floor(tile_pixels(tx, ty, tpx) * quant) >= tbin
        seen = np.zeros_like(mask, bool)
        comps = []
        for r in range(tpx):
            for c in range(tpx):
                if not mask[r, c] or seen[r, c]:
                    continue
                q = deque([(r, c)])
                seen[r, c] = True
                px = []
                while q:
                    rr, cc = q.popleft()
                    px.append((rr, cc))
                    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        nr, nc = rr + dr, cc + dc
                        if 0 <= nr < tpx and 0 <= nc < tpx and mask[nr, nc] and not seen[nr, nc]:
                            seen[nr, nc] = True
                            q.append((nr, nc))
                if len(px) >= min_size:
                    comps.append(px)
        # compare as multisets of (area, bbox) — labels are representation
        exp = sorted(
            (len(px), min(p[0] for p in px), max(p[0] for p in px),
             min(p[1] for p in px), max(p[1] for p in px))
            for px in comps
        )
        got = sorted(zip(g.pixel_count, g.row_min, g.row_max, g.col_min, g.col_max))
        assert got == exp, (tx, ty)
