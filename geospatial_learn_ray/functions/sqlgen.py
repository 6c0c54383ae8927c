"""SQL (DuckDB) restatements of the engine's deterministic hash / geocode /
cell-index closed forms — used ONLY by ``oracle_sql`` so the hash-derived
query family (train/test split, geocoding, hex cells, S2 cells) gets
STRONG driver value-hash checks instead of rows-only ones.

All 64-bit arithmetic runs in HUGEINT mod 2**64 via NATIVE HUGEINT bit
ops (``& (2^64-1)`` for the wrap, ``xor``, ``>>`` — measured ~20× faster
than ``% 2^64``, which DuckDB executes as int128 division; the mask form
made the bag-hash oracle in rf_oob_scan viable). Multiplies by 64-bit
constants are split (hi<<32 + lo) so no intermediate exceeds HUGEINT
range. The numpy twins are functions/hashing.py and functions/geo.py —
every expression here mirrors that code's operation order bit-for-bit.
"""

from __future__ import annotations

import numpy as np

M64 = 1 << 64
M32 = 1 << 32

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
SM_ADD = 0x9E3779B97F4A7C15
SM_M1 = 0xBF58476D1CE4E5B9
SM_M2 = 0x94D049BB133111EB


def u64_to_i64(x: str) -> str:
    """HUGEINT in [0,2^64) → the bit-identical signed BIGINT."""
    return f"CAST(({x}) - (CASE WHEN ({x}) >= {1 << 63} THEN {M64} ELSE 0 END) AS BIGINT)"


def i64_to_u64(x: str) -> str:
    return f"((CAST(({x}) AS HUGEINT) + {M64}) % {M64})"


def u64_xor(a: str, b: str) -> str:
    """xor of two HUGEINT values in [0,2^64) — HUGEINT-native (result
    stays in [0,2^64); no BIGINT round-trip needed)."""
    return f"xor(CAST(({a}) AS HUGEINT), CAST(({b}) AS HUGEINT))"


def u64_shr(x: str, k: int) -> str:
    return f"(({x}) >> {k})"


def u64_mul_const(x: str, c: int) -> str:
    """(x * c) mod 2^64 without HUGEINT overflow (c a 64-bit constant)."""
    hi, lo = c >> 32, c & (M32 - 1)
    if hi == 0:
        return f"((({x}) * {lo}) & {M64 - 1})"
    return f"((((({x}) * {lo}) & {M64 - 1}) + ((((({x}) & {M32 - 1}) * {hi}) & {M32 - 1}) << 32)) & {M64 - 1})"


def chain(base_sql: str, steps: list[tuple[str, str]]) -> str:
    """Nested SELECT chain: each step adds one computed column (keeps the
    generated SQL linear in the number of steps instead of exponential)."""
    q = base_sql
    for name, expr in steps:
        q = f"SELECT *, {expr} AS {name} FROM ({q})"
    return q


def splitmix64_steps(col: str, out: str, tag: str) -> list[tuple[str, str]]:
    """splitmix64 (hashing.py:69) as chain() steps; ``tag`` uniquifies the
    intermediate column names."""
    a = f"_sm_a_{tag}"
    b = f"_sm_b_{tag}"
    c = f"_sm_c_{tag}"
    return [
        (a, f"((CAST(({col}) AS HUGEINT) + {SM_ADD}) & {M64 - 1})"),
        (b, u64_mul_const(u64_xor(a, u64_shr(a, 30)), SM_M1)),
        (c, u64_mul_const(u64_xor(b, u64_shr(b, 27)), SM_M2)),
        (out, u64_xor(c, u64_shr(c, 31))),
    ]


def fnv1a64_expr(strexpr: str) -> str:
    """FNV-1a 64 of an ASCII string expression (hashing.py:50) as one
    list_reduce over character codes (urls/keys here are pure ASCII, so
    ascii() == the byte)."""
    codes = (
        f"list_transform(range(1, length({strexpr}) + 1), "
        f"i -> CAST(ascii(({strexpr})[i]) AS HUGEINT))"
    )
    # one FNV step: xor the low byte, then * prime mod 2^64
    hx = "(h - (h & 255) + xor(h & 255, c))"
    step = u64_mul_const(hx, FNV_PRIME)
    return (
        f"list_reduce(list_prepend(CAST({FNV_OFFSET} AS HUGEINT), {codes}), "
        f"(h, c) -> {step})"
    )


def geocode_steps(url_col: str = "url") -> list[tuple[str, str]]:
    """chain() steps adding (lon, lat) to a CTE with a ``url`` column —
    the SQL twin of geo.geocode (geo.py:48) including the hot-city skew."""
    hot_lon = "CASE " + " ".join(
        f"WHEN _city = {i} THEN {c[0]!r}" for i, c in enumerate(_HOT)
    ) + " END"
    hot_lat = "CASE " + " ".join(
        f"WHEN _city = {i} THEN {c[1]!r}" for i, c in enumerate(_HOT)
    ) + " END"
    return [
        ("_fh", fnv1a64_expr(url_col)),
        ("_fhl", fnv1a64_expr(f"({url_col} || '#lat')")),
        *splitmix64_steps("_fh", "_h", "h"),
        *splitmix64_steps("_fhl", "_hlat", "hl"),
        ("_lon0", "CAST(_h % 3600000 AS DOUBLE) / 1e4 - 180.0"),
        ("_lat0", "CAST(_hlat % 1600000 AS DOUBLE) / 1e4 - 80.0"),
        ("_hot", "(_h % 10) < 3"),
        ("_city", "CAST(_h % 5 AS BIGINT)"),
        ("_jx", "CAST(_hlat % 1000 AS DOUBLE) / 1000.0 * 0.01"),
        ("_jy", f"CAST({u64_shr('_hlat', 10)} % 1000 AS DOUBLE) / 1000.0 * 0.01"),
        ("lon", f"CASE WHEN _hot THEN ({hot_lon}) + _jx ELSE _lon0 END"),
        ("lat", f"CASE WHEN _hot THEN ({hot_lat}) + _jy ELSE _lat0 END"),
    ]


_HOT = [
    (-0.1276, 51.5072),
    (-74.0060, 40.7128),
    (139.6503, 35.6762),
    (151.2093, -33.8688),
    (-46.6333, -23.5505),
]


def hex_cell_steps(res: int, out: str, lat_col: str = "lat", lon_col: str = "lon") -> list[tuple[str, str]]:
    """chain() steps computing the hex cell id (geo.hex_latlng_to_cell,
    geo.py:95) at ``res``: axial coords, cube rounding, bit packing.
    DuckDB ROUND is half-away vs numpy's half-even — identical off exact
    .5 ties, which the irrational axial transform cannot hit."""
    size = 10.0 / (2.0 ** res)
    k1 = float(np.sqrt(3.0) / 3.0)
    t = f"r{res}"
    off = 1 << 26
    pack = (
        f"CAST(CAST({1 << 63} + {res} * {1 << 54} "
        f"+ (_q_{t} + {off}) * {1 << 27} + (_r_{t} + {off}) AS HUGEINT) AS UBIGINT)"
    )
    return [
        (f"_x_{t}", f"{lon_col} / {size!r}"),
        (f"_y_{t}", f"{lat_col} / {size!r}"),
        (f"_qf_{t}", f"{k1!r} * _x_{t} - _y_{t} / 3.0"),
        (f"_rf_{t}", f"2.0 / 3.0 * _y_{t}"),
        (f"_sf_{t}", f"-_qf_{t} - _rf_{t}"),
        (f"_q0_{t}", f"ROUND(_qf_{t})"),
        (f"_r0_{t}", f"ROUND(_rf_{t})"),
        (f"_s0_{t}", f"ROUND(_sf_{t})"),
        (f"_dq_{t}", f"ABS(_q0_{t} - _qf_{t})"),
        (f"_dr_{t}", f"ABS(_r0_{t} - _rf_{t})"),
        (f"_ds_{t}", f"ABS(_s0_{t} - _sf_{t})"),
        (f"_fq_{t}", f"(_dq_{t} > _dr_{t} AND _dq_{t} > _ds_{t})"),
        (f"_fr_{t}", f"(NOT _fq_{t} AND _dr_{t} > _ds_{t})"),
        (f"_q_{t}", f"CAST(CASE WHEN _fq_{t} THEN -_r0_{t} - _s0_{t} ELSE _q0_{t} END AS BIGINT)"),
        (f"_r_{t}", f"CAST(CASE WHEN _fr_{t} THEN -_q0_{t} - _s0_{t} ELSE _r0_{t} END AS BIGINT)"),
        (out, pack),
    ]


def s2_cell_steps(level: int, out: str, lat_col: str = "lat", lon_col: str = "lon") -> list[tuple[str, str]]:
    """chain() steps computing the canonical S2 cell id (geo.s2_latlng_to_cell,
    geo.py:303): xyz → face/uv (signed-denominator table) → quadratic st →
    30-bit ij → Hilbert position via 8 rounds against the 4096-entry lookup
    (joined as ``s2lut(k, v)`` — see s2_lookup_sql()).

    The only cross-engine risk is libm sin/cos/sqrt ulp drift moving a
    30-bit ij across an integer boundary (~1e-7 per row)."""
    deg = float(np.pi / 180.0)
    size = 1 << 30
    steps: list[tuple[str, str]] = [
        ("_phi", f"{lat_col} * {deg!r}"),
        ("_theta", f"{lon_col} * {deg!r}"),
        ("_cx", "COS(_phi) * COS(_theta)"),
        ("_cy", "COS(_phi) * SIN(_theta)"),
        ("_cz", "SIN(_phi)"),
        ("_face0", "CASE WHEN ABS(_cx) >= ABS(_cy) THEN (CASE WHEN ABS(_cx) >= ABS(_cz) THEN 0 ELSE 2 END) "
                   "ELSE (CASE WHEN ABS(_cy) >= ABS(_cz) THEN 1 ELSE 2 END) END"),
        ("_major", "CASE _face0 WHEN 0 THEN _cx WHEN 1 THEN _cy ELSE _cz END"),
        ("_face", "CASE WHEN _major < 0 THEN _face0 + 3 ELSE _face0 END"),
        ("_u", "CASE _face WHEN 0 THEN _cy/_cx WHEN 1 THEN -_cx/_cy WHEN 2 THEN -_cx/_cz "
               "WHEN 3 THEN _cz/_cx WHEN 4 THEN _cz/_cy ELSE -_cy/_cz END"),
        ("_v", "CASE _face WHEN 0 THEN _cz/_cx WHEN 1 THEN _cz/_cy WHEN 2 THEN -_cy/_cz "
               "WHEN 3 THEN _cy/_cx WHEN 4 THEN -_cx/_cy ELSE -_cx/_cz END"),
        ("_st_u", "CASE WHEN _u >= 0 THEN 0.5 * SQRT(GREATEST(1.0 + 3.0*_u, 0.0)) "
                  "ELSE 1.0 - 0.5 * SQRT(GREATEST(1.0 - 3.0*_u, 0.0)) END"),
        ("_st_v", "CASE WHEN _v >= 0 THEN 0.5 * SQRT(GREATEST(1.0 + 3.0*_v, 0.0)) "
                  "ELSE 1.0 - 0.5 * SQRT(GREATEST(1.0 - 3.0*_v, 0.0)) END"),
        ("_i", f"LEAST(GREATEST(CAST(TRUNC(_st_u * {size}) AS BIGINT), 0), {size - 1})"),
        ("_j", f"LEAST(GREATEST(CAST(TRUNC(_st_v * {size}) AS BIGINT), 0), {size - 1})"),
        ("_n_8", f"CAST(_face AS HUGEINT) * {1 << 60}"),
        ("_b_8", "_face % 2"),  # face & SWAP(=1)
    ]
    for k in range(7, -1, -1):
        kk = 4 * k
        prev = f"_b_{k + 1}"
        nprev = f"_n_{k + 1}"
        idx = (f"({prev} + ((_i // {1 << kk}) % 16) * 64 "
               f"+ ((_j // {1 << kk}) % 16) * 4)")
        steps.append((f"_lv_{k}", f"(SELECT v FROM s2lut WHERE s2lut.k = {idx})"))
        steps.append((f"_n_{k}", f"{nprev} + CAST(_lv_{k} // 4 AS HUGEINT) * {1 << (k * 8)}"))
        steps.append((f"_b_{k}", f"_lv_{k} % 4"))
    lsb = 1 << (2 * (30 - level))
    steps += [
        ("_leaf", "_n_0 * 2 + 1"),
        ("_floor", f"_leaf - _leaf % {lsb}"),
        (out, f"CAST(_floor + (CASE WHEN (_floor // {lsb}) % 2 = 0 THEN {lsb} ELSE 0 END) AS UBIGINT)"),
    ]
    return steps


def s2_lookup_sql() -> str:
    """The 4096-entry ij→Hilbert lookup (geo._s2_build_lookup) as a VALUES
    CTE ``s2lut(k, v)``."""
    from .geo import _S2_LOOKUP_POS

    vals = ", ".join(f"({i},{int(v)})" for i, v in enumerate(_S2_LOOKUP_POS))
    return f"s2lut(k, v) AS (VALUES {vals})"


def _det_text(M: list[list[str]]) -> str:
    """Fully parenthesized Laplace-expansion determinant text over symbol
    entries ('0'/'1' simplified away). The SAME string is Python-eval'd on
    numpy columns by the engine and embedded verbatim in the SQL twin, so
    both sides run the identical f64 op order (the rfe_rank recipe)."""
    n = len(M)
    if n == 1:
        return M[0][0]
    terms = []
    for j, e in enumerate(M[0]):
        if e == "0":
            continue
        minor = [row[:j] + row[j + 1:] for row in M[1:]]
        sub = _det_text(minor)
        if sub == "0":
            continue
        if e == "1":
            t = sub
        elif sub == "1":
            t = e
        else:
            t = f"({e} * {sub})"
        terms.append((j % 2, t))
    if not terms:
        return "0"
    expr = None
    for sgn, t in terms:
        if expr is None:
            expr = t if sgn == 0 else f"(- {t})"
        else:
            expr = f"({expr} - {t})" if sgn else f"({expr} + {t})"
    return expr


def kriging_cramer_texts() -> tuple[str, str, str, str]:
    """(det, w1, w2, w3) Cramer texts for the 3-point ordinary-kriging
    system [[0,g12,g13,1],[g12,0,g23,1],[g13,g23,0,1],[1,1,1,0]] λ = 
    [b1,b2,b3,1]: g are the pairwise neighbor variograms, b the
    center-to-neighbor ones. λ_j = w_j/det; estimate =
    (w1·v1 + w2·v2 + w3·v3)/det (one division, no per-λ rounding)."""
    A = [["0", "g12", "g13", "1"],
         ["g12", "0", "g23", "1"],
         ["g13", "g23", "0", "1"],
         ["1", "1", "1", "0"]]
    b = ["b1", "b2", "b3", "1"]
    out = [_det_text(A)]
    for j in range(3):
        Aj = [row[:] for row in A]
        for i in range(4):
            Aj[i][j] = b[i]
        out.append(_det_text(Aj))
    return tuple(out)
