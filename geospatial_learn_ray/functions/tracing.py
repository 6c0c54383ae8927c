"""Pixel-region boundary tracing → polygon rings (pure numpy).

The reference's ``raster.polygonize`` (raster.py:1526) delegates to
``gdal.Polygonize``, which emits one vector polygon per connected region of
equal value with exact pixel-edge boundaries. Here the same boundary is
built from first principles so it distributes:

- every region cell contributes its exposed sides as DIRECTED unit edges
  (region on the left under the fixed orientation below);
- the multiset of edges is Eulerian (in-degree == out-degree at every
  corner), so greedy walking always decomposes it into closed loops;
- by Green's theorem the SUM of signed loop areas equals the region's
  pixel count exactly — the conservation invariant the tests check;
- directed edges cancel pairwise across tile borders: two half-regions
  merged cross-tile drop their shared border edges and the union's outer
  boundary remains (stages/raster.polygonize_merge_geometry).

Coordinates are integer pixel corners (x = column, y = row) so
cancellation is exact; georeferencing to lon/lat happens only when
serializing to WKB.
"""

from __future__ import annotations

import numpy as np

# directed exposed sides, region-on-left, y growing downward:
#   top    (no cell above):  (c,   r)   → (c+1, r)
#   right  (none right):     (c+1, r)   → (c+1, r+1)
#   bottom (none below):     (c+1, r+1) → (c,   r+1)
#   left   (none left):      (c,   r+1) → (c,   r)


def region_edges(rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Region cells (row, col int arrays) → directed boundary edges
    [n, 4] int64 (x0, y0, x1, y1). Vectorized via sorted membership tests."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    key = rows * np.int64(1 << 32) + cols
    keyset = np.sort(key)

    def absent(dr: int, dc: int) -> np.ndarray:
        nk = (rows + dr) * np.int64(1 << 32) + (cols + dc)
        pos = np.searchsorted(keyset, nk)
        pos_c = np.clip(pos, 0, len(keyset) - 1)
        return ~(keyset[pos_c] == nk)

    out = []
    c, r = cols, rows
    m = absent(-1, 0)
    out.append(np.stack([c[m], r[m], c[m] + 1, r[m]], axis=1))
    m = absent(0, 1)
    out.append(np.stack([c[m] + 1, r[m], c[m] + 1, r[m] + 1], axis=1))
    m = absent(1, 0)
    out.append(np.stack([c[m] + 1, r[m] + 1, c[m], r[m] + 1], axis=1))
    m = absent(0, -1)
    out.append(np.stack([c[m], r[m] + 1, c[m], r[m]], axis=1))
    return np.concatenate(out, axis=0)


def cancel_opposite(edges: np.ndarray) -> np.ndarray:
    """Drop edge pairs that appear in both directions (interior borders
    after a cross-tile merge). Exact integer matching."""
    if len(edges) == 0:
        return edges
    fwd = edges
    rev = edges[:, [2, 3, 0, 1]]

    # unique code: 4 small non-negative ints → one int64 (coords < 2^16 here)
    def pack(e: np.ndarray) -> np.ndarray:
        return (((e[:, 0] << np.int64(48)) | (e[:, 1] << np.int64(32))) | (e[:, 2] << np.int64(16))) | e[:, 3]

    pf = pack(fwd)
    pr = pack(rev)
    order = np.argsort(pf, kind="stable")
    keep = np.ones(len(edges), bool)
    sorted_pf = pf[order]
    pos = np.searchsorted(sorted_pf, pr)
    pos_c = np.clip(pos, 0, len(sorted_pf) - 1)
    has_opp = sorted_pf[pos_c] == pr
    keep &= ~has_opp
    return edges[keep]


def chain_loops(edges: np.ndarray) -> list[np.ndarray]:
    """Directed edges → closed vertex loops [(m, 2) int64 (x, y), closed].
    Greedy walk with a deterministic choice at 4-valent corners (smallest
    packed edge first). The edge multiset is Eulerian, so every walk closes."""
    if len(edges) == 0:
        return []
    start = edges[:, 0] * np.int64(1 << 24) + edges[:, 1]
    order = np.lexsort((edges[:, 3], edges[:, 2], edges[:, 1], edges[:, 0]))
    edges = edges[order]
    start = start[order]
    # adjacency: for each start corner, the (sorted) list of outgoing edges
    used = np.zeros(len(edges), bool)
    starts_sorted = start  # already sorted by (x0, y0, ...) via lexsort
    loops: list[np.ndarray] = []
    for first in range(len(edges)):
        if used[first]:
            continue
        loop = [edges[first, :2].copy()]
        cur = first
        while True:
            used[cur] = True
            loop.append(edges[cur, 2:4].copy())
            nxt_key = edges[cur, 2] * np.int64(1 << 24) + edges[cur, 3]
            lo = np.searchsorted(starts_sorted, nxt_key, side="left")
            hi = np.searchsorted(starts_sorted, nxt_key, side="right")
            nxt = -1
            for cand in range(lo, hi):
                if not used[cand]:
                    nxt = cand
                    break
            if nxt < 0:
                break  # loop closed (back at an exhausted corner = start)
            cur = nxt
        loops.append(np.array(loop, np.int64))
    return loops


def loop_signed_area(loop: np.ndarray) -> float:
    """Shoelace signed area of a closed integer loop (exact for our sizes)."""
    x = loop[:-1, 0].astype(np.float64)
    y = loop[:-1, 1].astype(np.float64)
    xs = np.roll(x, -1)
    ys = np.roll(y, -1)
    return 0.5 * float((x * ys - xs * y).sum())
