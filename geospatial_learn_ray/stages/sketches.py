"""Mergeable sketches — the optional extension noted in SURVEY.md §2.5
(the reference is all-exact; at 100 TB, distinct counts and quantiles want
mergeable summaries). Round 1 ships HyperLogLog (Flajolet et al. 2007):

- per-batch: one vectorized pass builds a register array (scatter-max of
  leading-zero counts, bucketed by the hash's top bits);
- merge: element-wise max of register arrays — one tiny final combine, the
  "emit one serialized sketch per batch" shape from the Ray guide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, splitmix64


def _hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
    # rank = leading zeros of the remaining 64-p bits, + 1
    lz = np.zeros(len(h), np.int64)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz = np.where(mask, lz + shift, lz)
        cur = np.where(mask, cur << np.uint64(shift), cur)
    rank = np.minimum(lz + 1, 64 - p + 1)
    regs = np.zeros(m, np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small cardinality
    return float(est)


def hll_distinct(ds: ray.data.Dataset, col: str, precision: int = 12,
                 num_buckets: int = 32) -> float:
    """Approximate distinct count of ``col``: per-batch register partials
    (one sketch row per batch), merged TWO-LEVEL — a bucketed exchange
    element-wise-maxes the per-batch sketches down to ≤ ``num_buckets``
    rows, and only those reach the driver. The old single-level pull was
    O(#batches) sketch rows — 4 KB × a million blocks at 100 TB; the
    merge is commutative max, so any bucket assignment is correct."""
    from .exchange import bucket_exchange

    old = np.seterr(over="ignore")
    try:
        def partial(b: pa.Table) -> pa.Table:
            c = b[col]
            if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
                c = pa.compute.cast(c, pa.string())
            h = splitmix64(fnv1a64(c))
            regs = _hll_registers(h, precision)
            # deterministic spread: bucket from the sketch content itself
            part = int(splitmix64(np.asarray([regs.view(np.uint8).sum()], np.uint64))[0]
                       % np.uint64(num_buckets))
            return pa.table({"regs": pa.array([regs], pa.list_(pa.int8())),
                             "_part": pa.array([part], pa.int32())})

        def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
            m = np.maximum.reduce([np.asarray(r, np.int8) for r in g["regs"]])
            return pd.DataFrame({"regs": [m]})

        sketches = bucket_exchange(
            ds.map_batches(partial, batch_format="pyarrow"), merge_bucket,
            small_partials=True,
        ).to_pandas()
    finally:
        np.seterr(**old)
    merged = np.maximum.reduce([np.asarray(r, np.int8) for r in sketches["regs"]])
    return _hll_estimate(merged)


# --- Count-Min sketch --------------------------------------------------------

def _cms_seeds(depth: int) -> np.ndarray:
    return splitmix64(np.arange(1, depth + 1).astype(np.uint64))


def _cms_index(keys, seeds: np.ndarray, width: int) -> np.ndarray:
    """depth × n cell indices for string keys (fnv1a64 → per-row xor seed →
    splitmix64 finalize → low bits; CLAUDE.md: never raw FNV low bits)."""
    h = splitmix64(fnv1a64(keys))
    old = np.seterr(over="ignore")
    try:
        return np.stack([
            (splitmix64(h ^ seeds[j]) % np.uint64(width)).astype(np.int64)
            for j in range(len(seeds))
        ])
    finally:
        np.seterr(**old)


def cms_counts(ds: ray.data.Dataset, col: str, probes: list, width: int = 1024,
               depth: int = 4, num_buckets: int = 32) -> pd.DataFrame:
    """Count-Min sketch point queries (Cormode & Muthukrishnan 2005): per-
    batch depth×width count matrices (vectorized bincount per row), merged
    two-level — a bucketed-exchange SUM collapses the per-batch partials to
    ≤ ``num_buckets`` matrices before the driver's final sum — then
    ``est = min_j M[j, h_j(key)]`` for each PROBE key. Estimates never
    undercount; overcount ≤ 2N/width with prob ≥ 1-2^-depth.

    Probes are an explicit bounded list (broadcast-sized by contract):
    data-dependent candidate generation (per-block top-k) would make the
    result depend on Ray's block structure — the cluster-reproducibility
    bug class the stratified sampler fixed in round 2."""
    from .exchange import bucket_exchange

    seeds = _cms_seeds(depth)

    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
            c = pa.compute.cast(c, pa.string())
        idx = _cms_index(c, seeds, width)
        M = np.zeros((depth, width), np.int64)
        for j in range(depth):
            M[j] = np.bincount(idx[j], minlength=width)
        flat = M.ravel()
        old = np.seterr(over="ignore")
        try:
            part = int(splitmix64(np.asarray([flat.sum()], np.int64).view(np.uint64))[0]
                       % np.uint64(num_buckets))
        finally:
            np.seterr(**old)
        return pa.table({"cnt": pa.array([flat], pa.list_(pa.int64())),
                         "_part": pa.array([part], pa.int32())})

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = np.sum([np.asarray(r, np.int64) for r in g["cnt"]], axis=0)
        return pd.DataFrame({"cnt": [m]})

    merged = bucket_exchange(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        merge_bucket, small_partials=True,
    ).to_pandas()
    M = np.sum([np.asarray(r, np.int64) for r in merged["cnt"]], axis=0).reshape(depth, width)
    pidx = _cms_index(np.asarray([str(p) for p in probes], object), seeds, width)
    est = M[np.arange(depth)[:, None], pidx].min(axis=0)
    return pd.DataFrame({col: probes, "est_count": est.astype(np.int64)})
