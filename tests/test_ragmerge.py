import numpy as np

from geospatial_learn_ray.sources.tiles import read_tiles, tile_pixels
from geospatial_learn_ray.stages import raster
from geospatial_learn_ray.functions.rounding import round_half_away
from geospatial_learn_ray.stages.raster import _label_regions, _region_node_ids

SIDE, GX, GY = 16, 16, 16
QUANT, THRESH, WSCALE = 2.0, 0.4, 64.0


def _bruteforce_ragmerge():
    """Driver-side reference: dense mosaic labels, all 4-neighbor boundary
    pairs, mean-weight filter, plain union-find with min-root semantics."""
    labels = {}
    vals = {}
    counts = {}
    for ty in range(GY):
        for tx in range(GX):
            v = tile_pixels(tx, ty, SIDE).astype(np.float64)
            lab = _label_regions(np.floor(v * QUANT))
            node = _region_node_ids(np.array([tx]), np.array([ty]), np.int64(0), SIDE)[0] + lab
            labels[(tx, ty)] = node
            vals[(tx, ty)] = v
            for nd, c in zip(*np.unique(node, return_counts=True)):
                counts[int(nd)] = int(c)
    pairs: dict[tuple[int, int], tuple[int, int]] = {}

    def add(na, nb, va, vb):
        d = na != nb
        w = np.floor(np.abs(va[d] - vb[d]) * WSCALE + 0.5).astype(np.int64)
        for u, vv, ww in zip(na[d].ravel(), nb[d].ravel(), w.ravel()):
            k = (int(min(u, vv)), int(max(u, vv)))
            s, c = pairs.get(k, (0, 0))
            pairs[k] = (s + int(ww), c + 1)

    for (tx, ty), node in labels.items():
        v = vals[(tx, ty)]
        add(node[:, :-1], node[:, 1:], v[:, :-1], v[:, 1:])
        add(node[:-1, :], node[1:, :], v[:-1, :], v[1:, :])
        if (tx + 1, ty) in labels:
            add(node[:, -1], labels[(tx + 1, ty)][:, 0], v[:, -1], vals[(tx + 1, ty)][:, 0])
        if (tx, ty + 1) in labels:
            add(node[-1, :], labels[(tx, ty + 1)][0, :], v[-1, :], vals[(tx, ty + 1)][0, :])

    parent: dict[int, int] = {n: n for n in counts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (u, v), (s, c) in pairs.items():
        if s / c < THRESH * WSCALE:
            ru, rv = find(u), find(v)
            if ru != rv:
                lo, hi = min(ru, rv), max(ru, rv)
                parent[hi] = lo
    agg: dict[int, list[int]] = {}
    for n, c in counts.items():
        r = find(n)
        pc, nr = agg.get(r, (0, 0))
        agg[r] = (pc + c, nr + 1)
    return agg


def test_ragmerge_matches_bruteforce_unionfind():
    small = raster.clip_tiles(read_tiles(tile_px=SIDE), -180.0, -80.0, -90.0, 0.0)
    out = (
        raster.ragmerge_count(small, side=SIDE, quant=QUANT, thresh=THRESH, grid_x=GX, grid_y=GY)
        .to_pandas()
        .sort_values("global_region")
        .reset_index(drop=True)
    )
    exp = _bruteforce_ragmerge()
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        pc, nr = exp[int(row.global_region)]
        assert int(row.pixel_count) == pc
        assert int(row.n_regions) == nr
    # merging conserves pixels and regions
    assert out.pixel_count.sum() == GX * GY * SIDE * SIDE
    # the threshold is discriminating: real merging happened, but not into
    # one blob
    assert out.n_regions.max() > 1
    assert len(out) > 10


def test_ransac_lines_matches_bruteforce():
    from geospatial_learn_ray.functions.hashing import splitmix64

    small = raster.clip_tiles(read_tiles(tile_px=SIDE), -180.0, -80.0, -90.0, 0.0)
    out = (
        raster.ransac_lines_stage(small, side=SIDE, edge_thresh=0.1)
        .to_pandas()
        .set_index(["tile_y", "tile_x"])
    )
    assert len(out) == 256
    T = 64
    for tx, ty in [(0, 0), (7, 3), (15, 15)]:
        v = tile_pixels(tx, ty, SIDE).astype(np.float64)
        gx = np.empty_like(v)
        gx[:, 1:-1] = (v[:, 2:] - v[:, :-2]) / 2.0
        gx[:, 0] = (v[:, 1] - v[:, 0]) / 2.0
        gx[:, -1] = (v[:, -1] - v[:, -2]) / 2.0
        gy = np.empty_like(v)
        gy[1:-1, :] = (v[2:, :] - v[:-2, :]) / 2.0
        gy[0, :] = (v[1, :] - v[0, :]) / 2.0
        gy[-1, :] = (v[-1, :] - v[-2, :]) / 2.0
        idx = np.flatnonzero((gx * gx + gy * gy > 0.1).ravel())
        n = len(idx)
        ys, xs = np.divmod(idx, SIDE)
        best = (-1, -1, -1, -1)  # (count, -k never mind) track max with first-k tie
        for k in range(T):
            s1 = splitmix64(np.array([(tx * (1 << 21) + ty) * 2 * T + 2 * k], np.uint64))[0]
            s2 = splitmix64(np.array([(tx * (1 << 21) + ty) * 2 * T + 2 * k + 1], np.uint64))[0]
            i1 = int(s1 % np.uint64(n))  # NB: uint64 % python-int degrades to float64
            i2 = int(s2 % np.uint64(n - 1))
            if i2 >= i1:
                i2 += 1
            x1, y1, x2, y2 = xs[i1], ys[i1], xs[i2], ys[i2]
            dx, dy = x2 - x1, y2 - y1
            cross = dx * (ys - y1) - dy * (xs - x1)
            c = int((cross * cross <= dx * dx + dy * dy).sum())
            if c > best[0]:
                best = (c, k, int(idx[i1]), int(idx[i2]))
        row = out.loc[(ty, tx)]
        assert int(row.n_edge) == n
        assert int(row.inliers) == best[0]
        assert int(row.best_trial) == best[1]
        assert int(row.support_a) == best[2]
        assert int(row.support_b) == best[3]
        # both support points lie on the line: always inliers
        assert best[0] >= 2


def test_hough_lines_matches_bruteforce():
    small = raster.clip_tiles(read_tiles(tile_px=SIDE), -180.0, -80.0, -90.0, 0.0)
    out = (
        raster.hough_lines_stage(small, side=SIDE, edge_thresh=0.1)
        .to_pandas()
        .set_index(["tile_y", "tile_x"])
    )
    assert len(out) == 256
    n_orient = 12
    ang = np.pi * np.arange(n_orient) / n_orient
    for tx, ty in [(0, 0), (9, 12), (15, 15)]:
        v = tile_pixels(tx, ty, SIDE).astype(np.float64)
        gx = np.empty_like(v)
        gx[:, 1:-1] = (v[:, 2:] - v[:, :-2]) / 2.0
        gx[:, 0] = (v[:, 1] - v[:, 0]) / 2.0
        gx[:, -1] = (v[:, -1] - v[:, -2]) / 2.0
        gy = np.empty_like(v)
        gy[1:-1, :] = (v[2:, :] - v[:-2, :]) / 2.0
        gy[0, :] = (v[1, :] - v[0, :]) / 2.0
        gy[-1, :] = (v[-1, :] - v[-2, :]) / 2.0
        idx = np.flatnonzero((gx * gx + gy * gy > 0.1).ravel())
        ys, xs = np.divmod(idx, SIDE)
        votes: dict[tuple[int, int], int] = {}
        for j in range(n_orient):
            for x, y in zip(xs, ys):
                r = int(np.floor(x * np.cos(ang[j]) + y * np.sin(ang[j]) + 0.5))
                votes[(j, r)] = votes.get((j, r), 0) + 1
        (bj, br), bv = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        row = out.loc[(ty, tx)]
        assert int(row.n_edge) == len(idx)
        assert (int(row.peak_theta), int(row.peak_rho), int(row.votes)) == (bj, br, bv)
        # a line peak concentrates many collinear edge pixels
        assert bv >= max(3, len(idx) // SIDE)


def _acwe_reference(v: np.ndarray, iterations: int = 5):
    """Independent per-pixel loop reference for the morphological ACWE."""
    side = v.shape[0]
    R2 = (2 * side // 3) ** 2
    u = np.zeros_like(v)
    for y in range(side):
        for x in range(side):
            if (2 * x - (side - 1)) ** 2 + (2 * y - (side - 1)) ** 2 <= R2:
                u[y, x] = 1.0

    def morph(m, op):
        out = np.empty_like(m)
        for y in range(side):
            for x in range(side):
                vals = [m[y, x]]
                if x > 0:
                    vals.append(m[y, x - 1])
                if x < side - 1:
                    vals.append(m[y, x + 1])
                if y > 0:
                    vals.append(m[y - 1, x])
                if y < side - 1:
                    vals.append(m[y + 1, x])
                out[y, x] = op(vals)
        return out

    S = v.sum()
    npx = side * side
    for t in range(1, iterations + 1):
        n1 = u.sum()
        s1 = (v * u).sum()
        c1 = s1 / n1 if n1 > 0 else 0.0
        c2 = (S - s1) / (npx - n1) if n1 < npx else 0.0
        u = ((v - c1) ** 2 < (v - c2) ** 2).astype(np.float64)
        if t % 2 == 1:
            u = morph(morph(u, min), max)
        else:
            u = morph(morph(u, max), min)
    return u


def test_ms_acwe_matches_reference_and_segments_blob():
    small = raster.clip_tiles(read_tiles(tile_px=SIDE), -180.0, -80.0, -90.0, 0.0)
    out = (
        raster.ms_acwe_stage(small, side=SIDE, iterations=5)
        .to_pandas()
        .set_index(["tile_y", "tile_x"])
    )
    assert len(out) == 256
    for tx, ty in [(0, 0), (8, 8), (15, 3)]:
        v = tile_pixels(tx, ty, SIDE).astype(np.float64)
        u = _acwe_reference(v)
        row = out.loc[(ty, tx)]
        assert int(row.fg_count) == int(u.sum())
        # masks are non-degenerate on this fixture
        assert 0 < int(row.fg_count) < SIDE * SIDE

    # planted bimodal blob: ACWE converges onto the bright square
    v = np.zeros((SIDE, SIDE))
    v[4:12, 4:12] = 1.0
    u = _acwe_reference(v)
    inner = u[5:11, 5:11]
    assert inner.min() == 1.0  # blob interior is foreground
    assert u[0, 0] == 0.0 and u[-1, -1] == 0.0


def test_ms_gac_nondegenerate_and_deterministic():
    small = raster.clip_tiles(read_tiles(tile_px=SIDE), -180.0, -80.0, -90.0, 0.0)
    out = raster.ms_gac_stage(small, side=SIDE, iterations=5).to_pandas()
    assert len(out) == 256
    # the contour neither vanishes nor floods any tile
    assert (out.fg_count > 0).all() and (out.fg_count < SIDE * SIDE).all()
    # g is a stopping function in (0, 1]
    assert (out.mean_g_in > 0).all() and (out.mean_g_in <= 1.0).all()
    again = raster.ms_gac_stage(small, side=SIDE, iterations=5).to_pandas()
    a = out.sort_values(["tile_y", "tile_x"]).reset_index(drop=True)
    b = again.sort_values(["tile_y", "tile_x"]).reset_index(drop=True)
    assert a.equals(b)
    # balloon direction matters: a shrinking contour keeps fewer pixels
    shrink = raster.ms_gac_stage(small, side=SIDE, iterations=5, balloon=-1).to_pandas()
    assert shrink.fg_count.sum() < out.fg_count.sum()


def test_multiband_gif_roundtrip_bit_exact():
    from geospatial_learn_ray.functions.gifenc import decode_gif_frames

    small = raster.clip_tiles(read_tiles(tile_px=SIDE), -180.0, -80.0, -175.0, -75.0)
    out = raster.multiband_gif_stage(small, side=SIDE).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    frames = decode_gif_frames(bytes(row.gif))
    assert len(frames) == int(row.n_frames) == 3
    v = tile_pixels(int(row.tile_x), int(row.tile_y), SIDE).astype(np.float64)
    for got, band in zip(frames, (v, 1.5 * v + 0.25, 0.5 * v - 0.1)):
        exp = np.clip((band - -2.0) / 5.0 * 256.0, 0, 255).astype(np.uint8)
        assert np.array_equal(got, exp)
    assert int(row.gif_len) == len(bytes(row.gif))


def test_snake_matches_scalar_reference():
    side, n, iters = SIDE, 40, 5
    alpha, beta, kappa, dt = 0.1, 0.01, 1.0, 0.5
    small = raster.clip_tiles(read_tiles(tile_px=side), -180.0, -80.0, -90.0, 0.0)
    out = (
        raster.snake_stage(small, side=side)
        .to_pandas()
        .set_index(["tile_y", "tile_x", "point_id"])
        .sort_index()
    )
    assert len(out) == 256 * n

    def grad(a):
        gx = np.empty_like(a)
        gx[:, 1:-1] = (a[:, 2:] - a[:, :-2]) / 2.0
        gx[:, 0] = (a[:, 1] - a[:, 0]) / 2.0
        gx[:, -1] = (a[:, -1] - a[:, -2]) / 2.0
        gy = np.empty_like(a)
        gy[1:-1, :] = (a[2:, :] - a[:-2, :]) / 2.0
        gy[0, :] = (a[1, :] - a[0, :]) / 2.0
        gy[-1, :] = (a[-1, :] - a[-2, :]) / 2.0
        return gx, gy

    for tx, ty in [(2, 3), (14, 9)]:
        v = tile_pixels(tx, ty, side).astype(np.float64)
        gx, gy = grad(v)
        c0, r0 = (side - 1) / 2.0, side / 3.0
        x = [c0 + r0 * np.cos(2.0 * np.pi * i / n) for i in range(n)]
        y = [c0 + r0 * np.sin(2.0 * np.pi * i / n) for i in range(n)]
        for _ in range(iters):
            nx, ny = [], []
            for i in range(n):
                xf = min(int(np.floor(x[i])), side - 2)
                yf = min(int(np.floor(y[i])), side - 2)
                txf, tyf = x[i] - xf, y[i] - yf
                fx = ((1.0 - tyf) * ((1.0 - txf) * gx[yf, xf] + txf * gx[yf, xf + 1])
                      + tyf * ((1.0 - txf) * gx[yf + 1, xf] + txf * gx[yf + 1, xf + 1]))
                fy = ((1.0 - tyf) * ((1.0 - txf) * gy[yf, xf] + txf * gy[yf, xf + 1])
                      + tyf * ((1.0 - txf) * gy[yf + 1, xf] + txf * gy[yf + 1, xf + 1]))
                d2x = x[(i - 1) % n] - 2.0 * x[i] + x[(i + 1) % n]
                d4x = x[(i - 2) % n] - 4.0 * x[(i - 1) % n] + 6.0 * x[i] - 4.0 * x[(i + 1) % n] + x[(i + 2) % n]
                d2y = y[(i - 1) % n] - 2.0 * y[i] + y[(i + 1) % n]
                d4y = y[(i - 2) % n] - 4.0 * y[(i - 1) % n] + 6.0 * y[i] - 4.0 * y[(i + 1) % n] + y[(i + 2) % n]
                nx.append(min(max(x[i] + dt * (alpha * d2x - beta * d4x + kappa * fx), 0.0), float(side - 1)))
                ny.append(min(max(y[i] + dt * (alpha * d2y - beta * d4y + kappa * fy), 0.0), float(side - 1)))
            x, y = nx, ny
        moved = 0.0
        for i in range(n):
            row = out.loc[(ty, tx, i)]
            assert row.x == round_half_away(x[i], 6), (tx, ty, i)
            assert row.y == round_half_away(y[i], 6), (tx, ty, i)
            moved += abs(x[i] - (c0 + r0 * np.cos(2.0 * np.pi * i / n)))
        assert moved > 0.1  # the contour actually deformed


def _topo_reference_mask(tx, ty, side=SIDE, iterations=5):
    from geospatial_learn_ray.stages.raster import _SP_OFFS, _simple_point_lut

    lut = _simple_point_lut()
    v = tile_pixels(tx, ty, side).astype(np.float64)
    S, npx = v.sum(), side * side
    ys, xs = np.divmod(np.arange(side * side), side)
    R2 = (2 * side // 3) ** 2
    u = ((2 * xs - (side - 1)) ** 2 + (2 * ys - (side - 1)) ** 2 <= R2).reshape(side, side).astype(float)

    def code(u):
        p = np.zeros((side + 2, side + 2), np.int64)
        p[1:-1, 1:-1] = u.astype(np.int64)
        c = np.zeros((side, side), np.int64)
        for k, (dy, dx) in enumerate(_SP_OFFS):
            c |= p[1 + dy : side + 1 + dy, 1 + dx : side + 1 + dx] << k
        return c

    ry = np.arange(side)[:, None] % 2
    rx = np.arange(side)[None, :] % 2
    for _ in range(iterations):
        n1, s1 = u.sum(), (v * u).sum()
        c1 = s1 / n1 if n1 > 0 else 0.0
        c2 = (S - s1) / (npx - n1) if n1 < npx else 0.0
        tgt = ((v - c1) ** 2 < (v - c2) ** 2).astype(float)
        for phy, phx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            flip = (u != tgt) & (lut[code(u)] == 1) & (ry == phy) & (rx == phx)
            u = np.where(flip, tgt, u)
    return u


def _components(mask, conn8):
    """Number of connected components of True cells (flood fill)."""
    seen = np.zeros_like(mask, bool)
    n = 0
    H, W = mask.shape
    nbrs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)] if conn8 else [(-1, 0), (0, -1), (0, 1), (1, 0)]
    for y in range(H):
        for x in range(W):
            if mask[y, x] and not seen[y, x]:
                n += 1
                stack = [(y, x)]
                while stack:
                    cy, cx = stack.pop()
                    if seen[cy, cx]:
                        continue
                    seen[cy, cx] = True
                    for dy, dx in nbrs:
                        ny, nx = cy + dy, cx + dx
                        if 0 <= ny < H and 0 <= nx < W and mask[ny, nx] and not seen[ny, nx]:
                            stack.append((ny, nx))
    return n


def test_ms_toposnakes_preserves_topology():
    small = raster.clip_tiles(read_tiles(tile_px=SIDE), -180.0, -80.0, -90.0, 0.0)
    out = raster.ms_toposnakes_stage(small, side=SIDE, iterations=5).to_pandas().set_index(["tile_y", "tile_x"])
    assert len(out) == 256
    for tx, ty in [(0, 0), (7, 11), (15, 15)]:
        u = _topo_reference_mask(tx, ty)
        row = out.loc[(ty, tx)]
        assert int(row.fg_count) == int(u.sum())
        # genus-0 invariant: one 8-connected object component...
        assert _components(u > 0.5, conn8=True) == 1
        # ...and no holes: with the exterior padding frame (the LUT's
        # out-of-tile-is-background convention), the background is one
        # 4-connected component — any hole would be a second one
        padded = np.zeros((SIDE + 2, SIDE + 2))
        padded[1:-1, 1:-1] = u
        assert _components(padded < 0.5, conn8=False) == 1
        # the constraint binds: the unconstrained ACWE target has different
        # foreground than the topology-preserving result
        assert int(u.sum()) != 80  # it moved off the init circle
