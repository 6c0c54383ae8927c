"""Vectorized deterministic 64-bit hashing over Arrow string/binary columns.

No ``xxhash`` wheel exists in this environment, so the engine's canonical
string hash is FNV-1a 64 (public domain algorithm), vectorized with numpy
over a padded byte matrix: the per-row loop runs over *byte positions*
(≈ max string length iterations of O(n_rows) vector ops), never over rows.

All derived randomness in the engine (geocoding, salts, minhash seeds,
simhash bits, LSH hyperplanes) flows from these functions so that every
retry / resume / worker produces byte-identical outputs (SURVEY.md §7
"Determinism for resume/retry").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def _as_byte_matrix(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string/binary array (or list of str/bytes) → (padded uint8
    matrix [n, maxlen], lengths [n]). Zero-copy reads of the Arrow value
    buffer; the pad matrix is the only allocation."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        vals = list(arr)
        typ = pa.binary() if vals and isinstance(vals[0], (bytes, bytearray)) else pa.string()
        arr = pa.array(vals, type=typ)
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    else:
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] is not None else np.zeros(0, np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    if maxlen == 0:
        return np.zeros((len(arr), 0), np.uint8), lens
    idx = starts[:, None] + np.arange(maxlen)[None, :]
    np.clip(idx, 0, max(len(data) - 1, 0), out=idx)
    mat = data[idx] if len(data) else np.zeros((len(arr), maxlen), np.uint8)
    mat[np.arange(maxlen)[None, :] >= lens[:, None]] = 0
    return mat, lens


def fnv1a64(arr, salt: bytes = b"") -> np.ndarray:
    """FNV-1a 64-bit hash of each string/binary row; optional constant salt
    appended to every row (used e.g. for the independent latitude draw)."""
    mat, lens = _as_byte_matrix(arr)
    n, maxlen = mat.shape
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        for j in range(maxlen):
            active = j < lens
            hj = (h ^ mat[:, j].astype(np.uint64)) * FNV_PRIME
            h = np.where(active, hj, h)
        for b in salt:
            h = (h ^ np.uint64(b)) * FNV_PRIME
    finally:
        np.seterr(**old)
    return h


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain, Steele et al.) — mixes 64-bit
    integers; used to derive independent hash families from one base hash."""
    x = x.astype(np.uint64, copy=True)
    old = np.seterr(over="ignore")
    try:
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    finally:
        np.seterr(**old)
    return z


def hash_family(base: np.ndarray, k: int) -> np.ndarray:
    """k independent 64-bit hashes per input: ``splitmix64(base ^ seed_j)``.
    Returns shape (len(base), k)."""
    seeds = splitmix64(np.arange(1, k + 1, dtype=np.uint64))
    old = np.seterr(over="ignore")
    try:
        return splitmix64(base[:, None] ^ seeds[None, :])
    finally:
        np.seterr(**old)


def rolling_hashes(arr, window: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Polynomial (Rabin-Karp-style) rolling hash of every ``window``-byte
    substring of each row, vectorized across rows.

    Returns (H, valid): H is uint64 [n, L] where L = maxlen-window+1,
    valid[i, t] marks positions fully inside row i. Used for char-shingle
    minhash and winnowing fingerprints (Schleimer et al., SIGMOD'03).
    """
    mat, lens = _as_byte_matrix(arr)
    n, maxlen = mat.shape
    L = max(maxlen - window + 1, 0)
    if L == 0:
        return np.zeros((n, 0), np.uint64), np.zeros((n, 0), bool)
    base = np.uint64(1099511628211)
    H = np.zeros((n, L), dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        for k in range(window):
            H = H * base + mat[:, k : k + L].astype(np.uint64)
    finally:
        np.seterr(**old)
    valid = np.arange(L)[None, :] <= (lens - window)[:, None]
    return H, valid
