"""Vectorized geo kernels: deterministic geocoder, hex cell index (H3-style),
and S2 cell ids — all pure numpy, no native geo libraries.

The reference's tiling op is ``shape.meshgrid`` (shape.py:2412): generate
grid cells over an extent, then assign rows by coordinate arithmetic
(point→pixel at shape.py:2589-2590). Here the same role is played by two
discrete global grids:

- ``hex_cell`` — an H3-STYLE hexagonal index: axial-coordinate hex binning
  on the plate-carrée plane, resolutions 0..15 (cell edge halves per
  resolution). The real Uber H3 C library is not installable in this
  environment; if an ``h3`` wheel is importable we use it, else this
  deterministic stand-in with the same API shape (latlng_to_cell /
  cell_to_latlng / k_ring / cell_to_parent). NOT bit-compatible with H3 —
  documented, deterministic, and hierarchical-by-center like H3's
  aperture-7 grid (hexes never strictly nest in H3 either).
- ``s2_cell`` — canonical S2 cell ids (quadratic projection + Hilbert
  curve, the published s2geometry algorithm), bit-compatible with the
  public S2 library for the level-30 leaf → any level via the lsb trick.

Geocoding: Common-Crawl pages carry no coordinates; the deterministic
geocoder derives (lon, lat) from ``fnv1a64(url)`` per FIXTURES.md §2, with
a Zipfian "hot city" cluster fixture (~30% of rows in 5 city centers) to
exercise salt-based skew mitigation in the cell aggregation stage.
"""

from __future__ import annotations

import numpy as np

from .hashing import fnv1a64, splitmix64

# ---------------------------------------------------------------------------
# Deterministic geocoder (FIXTURES.md §2, hash rule; skew fixture hash-based)
# ---------------------------------------------------------------------------

HOT_CITIES = np.array(
    [  # (lon, lat) fixed list — London, NYC, Tokyo, Sydney, São Paulo
        (-0.1276, 51.5072),
        (-74.0060, 40.7128),
        (139.6503, 35.6762),
        (151.2093, -33.8688),
        (-46.6333, -23.5505),
    ]
)


def geocode(urls, skew: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """url column → (lon, lat) float64 arrays. Pure hash arithmetic:

    - base draw: lon = (h(url) % 3_600_000)/1e4 - 180,
      lat = (h(url+'#lat') % 1_600_000)/1e4 - 80  (poles avoided)
    - skew fixture: rows with h(url) % 10 < 3 land in one of 5 hot city
      centers with ≤0.01° jitter, so a handful of cells hold ~30% of rows.

    h = splitmix64(fnv1a64(·)): the finalizer fixes FNV-1a's weak low-bit
    avalanche on near-identical sequential urls (the % 10 hot draw would
    otherwise be visibly biased).
    """
    h = splitmix64(fnv1a64(urls))
    hlat = splitmix64(fnv1a64(urls, salt=b"#lat"))
    lon = (h % np.uint64(3_600_000)).astype(np.float64) / 1e4 - 180.0
    lat = (hlat % np.uint64(1_600_000)).astype(np.float64) / 1e4 - 80.0
    if skew:
        hot = (h % np.uint64(10)) < np.uint64(3)
        city = (h % np.uint64(5)).astype(np.int64)
        jx = (hlat % np.uint64(1000)).astype(np.float64) / 1000.0 * 0.01
        jy = ((hlat >> np.uint64(10)) % np.uint64(1000)).astype(np.float64) / 1000.0 * 0.01
        lon = np.where(hot, HOT_CITIES[city, 0] + jx, lon)
        lat = np.where(hot, HOT_CITIES[city, 1] + jy, lat)
    return lon, lat


# ---------------------------------------------------------------------------
# Hex cell index (H3-style axial hex binning; vectorized)
# ---------------------------------------------------------------------------

_HEX_BASE_EDGE = 10.0  # degrees at resolution 0; halves per resolution
_OFF = np.int64(1 << 26)  # axial coordinate offset so packed q,r are >= 0
_SQRT3 = np.sqrt(3.0)

try:  # pragma: no cover - h3 wheel not present in this sandbox
    import h3 as _h3  # type: ignore

    HAVE_H3 = True
except ImportError:
    _h3 = None
    HAVE_H3 = False


def _hex_edge(res: int) -> float:
    return _HEX_BASE_EDGE / (2.0**res)


def hex_latlng_to_cell(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """(lat, lon) → uint64 hex cell id at resolution ``res`` (0..15).

    Pointy-top axial coordinates (Red Blob Games hex-grid math, public):
    fractional (q, r) from plane coords then exact cube rounding. Packed as
    ``(1<<63) | res<<54 | (q+OFF)<<27 | (r+OFF)``.
    """
    size = _hex_edge(res)
    x = np.asarray(lon, np.float64) / size
    y = np.asarray(lat, np.float64) / size
    qf = _SQRT3 / 3.0 * x - y / 3.0
    rf = 2.0 / 3.0 * y
    q, r = _cube_round(qf, rf)
    return _hex_pack(q, r, res)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _hex_pack(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    return (
        np.uint64(1 << 63)
        | (np.uint64(res) << np.uint64(54))
        | ((q + _OFF).astype(np.uint64) << np.uint64(27))
        | (r + _OFF).astype(np.uint64)
    )


def hex_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (q, r, res) int64 arrays."""
    cell = np.asarray(cell, np.uint64)
    res = ((cell >> np.uint64(54)) & np.uint64(0xF)).astype(np.int64)
    q = ((cell >> np.uint64(27)) & np.uint64((1 << 27) - 1)).astype(np.int64) - _OFF
    r = (cell & np.uint64((1 << 27) - 1)).astype(np.int64) - _OFF
    return q, r, res


def hex_cell_to_latlng(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell id → (lat, lon) of the hex center."""
    q, r, res = hex_unpack(cell)
    size = _HEX_BASE_EDGE / (2.0 ** res.astype(np.float64))
    x = size * _SQRT3 * (q + r / 2.0)
    y = size * 1.5 * r
    return y, x  # lat, lon


_AXIAL_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], np.int64)


def hex_ring_offsets(k: int) -> np.ndarray:
    """All axial offsets within hex distance k (the filled k-disk, including
    origin). 1 + 3k(k+1) offsets."""
    offs = [(0, 0)]  # origin first (callers rely on offset 0 = home cell)
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            if (dq, dr) != (0, 0):
                offs.append((dq, dr))
    return np.array(offs, np.int64)


def hex_k_ring(cell: np.ndarray, k: int = 1) -> np.ndarray:
    """cells [n] → neighbor disk [n, 1+3k(k+1)] (self included)."""
    q, r, res = hex_unpack(cell)
    offs = hex_ring_offsets(k)
    qq = q[:, None] + offs[None, :, 0]
    rr = r[:, None] + offs[None, :, 1]
    res0 = int(res[0]) if len(res) else 0
    return _hex_pack(qq, rr, res0)


def hex_cell_to_boundary(cell: np.ndarray) -> np.ndarray:
    """cell ids [n] → hex vertex rings [n, 7, 2] (lon, lat; closed).

    The meshgrid op (shape.meshgrid, shape.py:2412) generates grid-cell
    polygons over an extent; ours emits the exact hexagon boundary of each
    cell — pointy-top vertices at angles 30°+k·60° around the center."""
    q, r, res = hex_unpack(cell)
    size = _HEX_BASE_EDGE / (2.0 ** res.astype(np.float64))
    cx = size * _SQRT3 * (q + r / 2.0)
    cy = size * 1.5 * r
    ang = np.radians(30.0 + 60.0 * np.arange(6))
    vx = cx[:, None] + size[:, None] * np.cos(ang)[None, :]
    vy = cy[:, None] + size[:, None] * np.sin(ang)[None, :]
    ring = np.stack([vx, vy], axis=-1)
    return np.concatenate([ring, ring[:, :1, :]], axis=1)


def hex_cell_to_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Approximate parent: re-encode the child center at the coarser
    resolution (same containment contract as H3's aperture-7 rounding)."""
    lat, lon = hex_cell_to_latlng(cell)
    return hex_latlng_to_cell(lat, lon, parent_res)


def hex_cell_to_parent_exact(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Oracle-exact parent: the child center's parent axial coordinates
    are EXACTLY (q/2^k, r/2^k) for a k-resolution step (the float
    re-encode of ``hex_cell_to_parent`` recovers this up to ulps, but
    its near-tie roundings are engine-dependent — numpy rounds half-even,
    SQL ROUND half-away, and dyadic quarters DO tie). This form does the
    cube rounding on exact dyadic values with an explicit
    floor(x + 0.5) tie rule, bit-identical in any engine."""
    q, r, res = hex_unpack(cell)
    k = res - parent_res
    if (np.asarray(k) < 0).any():
        raise ValueError("parent_res must be coarser than the cell res")
    scale = np.power(2.0, np.asarray(k, np.float64))
    qf = q.astype(np.float64) / scale
    rf = r.astype(np.float64) / scale
    sf = -qf - rf
    q0 = np.floor(qf + 0.5)
    r0 = np.floor(rf + 0.5)
    s0 = np.floor(sf + 0.5)
    dq = np.abs(q0 - qf)
    dr = np.abs(r0 - rf)
    ds = np.abs(s0 - sf)
    fq = (dq > dr) & (dq > ds)
    fr = ~fq & (dr > ds)
    qi = np.where(fq, -r0 - s0, q0).astype(np.int64)
    ri = np.where(fr, -q0 - s0, r0).astype(np.int64)
    off = np.uint64(1 << 26)
    return ((np.uint64(1) << np.uint64(63))
            | (np.uint64(parent_res) << np.uint64(54))
            | ((qi.astype(np.uint64) + off) << np.uint64(27))
            | (ri.astype(np.uint64) + off))


# ---------------------------------------------------------------------------
# S2 cell ids — canonical algorithm (s2geometry.io), vectorized
# ---------------------------------------------------------------------------

_S2_LOOKUP_BITS = 4
_S2_SWAP = 1
_S2_INVERT = 2
_S2_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_S2_POS_TO_ORIENT = (_S2_SWAP, 0, 0, _S2_INVERT | _S2_SWAP)
_S2_MAX_LEVEL = 30
_S2_POS_BITS = 2 * _S2_MAX_LEVEL + 1


def _s2_build_lookup() -> np.ndarray:
    lookup_pos = np.zeros(1 << (2 * _S2_LOOKUP_BITS + 2), dtype=np.uint64)

    def init(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
        if level == _S2_LOOKUP_BITS:
            ij = (i << _S2_LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _S2_POS_TO_IJ[orient]
        for idx in range(4):
            init(level, i + (r[idx] >> 1), j + (r[idx] & 1), orig, pos + idx, orient ^ _S2_POS_TO_ORIENT[idx])

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    return lookup_pos


_S2_LOOKUP_POS = _s2_build_lookup()


def _s2_xyz(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    phi = np.radians(np.asarray(lat, np.float64))
    theta = np.radians(np.asarray(lon, np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _s2_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)  # negative axis → face+3
    # canonical face→(u,v) numerators and denominator (s2coords.h
    # ValidFaceXYZtoUV). The denominator is the SIGNED major component on
    # every face — on faces 3-5 the major axis is negative, so dividing by
    # the negated value would sign-flip u and v on half the sphere
    # (round-trip property test: test_geo.test_s2_face_uv_roundtrip).
    uvd = {
        0: (y, z, x),
        1: (-x, z, y),
        2: (-x, -y, z),
        3: (z, y, x),
        4: (z, -x, y),
        5: (-y, -x, z),
    }
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (un, vn, d) in uvd.items():
        m = face == f
        if m.any():
            u[m] = un[m] / d[m]
            v[m] = vn[m] / d[m]
    return face, u, v


def _s2_face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Inverse of ``_s2_face_uv`` (canonical FaceUVtoXYZ table, s2coords.h):
    face 0:(1,u,v) 1:(-u,1,v) 2:(-u,-v,1) 3:(-1,-v,-u) 4:(v,-1,-u) 5:(v,u,-1).
    Returns unnormalized (x, y, z); used by the round-trip property test."""
    one = np.ones_like(u)
    tbl = {
        0: (one, u, v),
        1: (-u, one, v),
        2: (-u, -v, one),
        3: (-one, -v, -u),
        4: (v, -one, -u),
        5: (v, u, -one),
    }
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (xf, yf, zf) in tbl.items():
        m = face == f
        if m.any():
            x[m], y[m], z[m] = xf[m], yf[m], zf[m]
    return x, y, z


def _s2_st(u: np.ndarray) -> np.ndarray:
    """Quadratic uv→st transform (the C++ library default)."""
    a = np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    b = np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0, 0.5 * a, 1.0 - 0.5 * b)


def s2_latlng_to_cell(lat: np.ndarray, lon: np.ndarray, level: int = 12) -> np.ndarray:
    """(lat, lon) → canonical S2 cell id (uint64) at ``level`` (0..30).

    face/uv/st per the published quadratic projection; ij→Hilbert position
    with the 4-bit lookup table; id = (face<<61 | pos<<1 | 1) snapped to
    ``level`` via the lsb trick. Vectorized: 8 table lookups per row.
    """
    x, y, z = _s2_xyz(lat, lon)
    face, u, v = _s2_face_uv(x, y, z)
    size = 1 << _S2_MAX_LEVEL
    i = np.clip((_s2_st(u) * size).astype(np.int64), 0, size - 1).astype(np.uint64)
    j = np.clip((_s2_st(v) * size).astype(np.int64), 0, size - 1).astype(np.uint64)
    face = face.astype(np.uint64)

    n = face << np.uint64(_S2_POS_BITS - 1)
    bits = face & np.uint64(_S2_SWAP)
    mask = np.uint64((1 << _S2_LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * _S2_LOOKUP_BITS)
        bits += ((i >> kk) & mask) << np.uint64(_S2_LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _S2_LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _S2_LOOKUP_BITS)
        bits &= np.uint64(_S2_SWAP | _S2_INVERT)
    old = np.seterr(over="ignore")
    try:
        leaf = n * np.uint64(2) + np.uint64(1)
        if level >= _S2_MAX_LEVEL:
            return leaf
        lsb = np.uint64(1) << np.uint64(2 * (_S2_MAX_LEVEL - level))
        return (leaf & ~(lsb - np.uint64(1))) | lsb
    finally:
        np.seterr(**old)


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Snap leaf-or-finer cell ids to ``level`` (standard lsb arithmetic)."""
    cell = np.asarray(cell, np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_S2_MAX_LEVEL - level))
    return (cell & ~(lsb - np.uint64(1))) | lsb


def s2_level(cell: np.ndarray) -> np.ndarray:
    """Level of each cell id (position of the lowest set bit)."""
    cell = np.asarray(cell, np.uint64)
    lsb = cell & (~cell + np.uint64(1))
    lvl = _S2_MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2).astype(np.int64)
    return lvl


# --- geohash (Niemeyer base32 cell index) -----------------------------------

_GEOHASH_ALPHABET = b"0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: np.ndarray, lon: np.ndarray,
                   precision: int = 8) -> np.ndarray:
    """Niemeyer geohash (the public base32 cell index): 5·precision bits,
    even bit positions (counting from the MSB) encode longitude, odd
    latitude. Computed as the closed-form quantization
    ``floor(((lon+180)/360)·2^nx)`` + one vectorized bit interleave —
    equal to the textbook bisection everywhere except exact cell-boundary
    floats, where THIS form is the specification (documented deviation;
    the float chain is mirrored verbatim by the SQL twin). Third public
    cell family beside the H3-style hex and S2 encoders above; reference
    analogue: the cell indexing in geodata_tools (same role, different
    public index)."""
    nbits = 5 * precision
    nx = (nbits + 1) // 2
    ny = nbits // 2
    x = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0
                 * float(1 << nx))
    y = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0
                 * float(1 << ny))
    x = np.clip(x, 0.0, float((1 << nx) - 1)).astype(np.uint64)
    y = np.clip(y, 0.0, float((1 << ny) - 1)).astype(np.uint64)
    code = np.zeros(len(x), np.uint64)
    one = np.uint64(1)
    for i in range(nx):
        code |= ((x >> np.uint64(nx - 1 - i)) & one) << np.uint64(nbits - 1 - 2 * i)
    for i in range(ny):
        code |= ((y >> np.uint64(ny - 1 - i)) & one) << np.uint64(nbits - 2 - 2 * i)
    alpha = np.frombuffer(_GEOHASH_ALPHABET, np.uint8)
    idx = np.empty((len(code), precision), np.uint8)
    for j in range(precision):
        idx[:, j] = alpha[((code >> np.uint64(5 * (precision - 1 - j)))
                           & np.uint64(31)).astype(np.int64)]
    return np.ascontiguousarray(idx).reshape(-1).view(f"S{precision}").astype(str)


# --- great-circle distance (haversine) ---------------------------------------

_RAD = 0.017453292519943295  # float64 of radians(1); inlined by the SQL twin
_2R_KM = 2.0 * 6371.0088     # IUGG mean Earth radius, doubled


def haversine_km(lat1: np.ndarray, lon1: np.ndarray,
                 lat2: float, lon2: float) -> np.ndarray:
    """Great-circle distance (km) from each point to a fixed (lat2, lon2),
    haversine form with the atan2 closing (asin is never called — atan2's
    numpy↔DuckDB bit-parity is proven by the UTM oracle family). Every op
    order mirrors the SQL twin verbatim; the (lat2, lon2)-dependent
    constants are plain Python floats so the twin inlines their reprs."""
    cos2 = float(np.cos(lat2 * _RAD))
    dphi = (lat2 - lat1) * _RAD / 2.0
    dlmb = (lon2 - lon1) * _RAD / 2.0
    sp = np.sin(dphi)
    sl = np.sin(dlmb)
    a = sp * sp + np.cos(lat1 * _RAD) * cos2 * (sl * sl)
    return _2R_KM * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
