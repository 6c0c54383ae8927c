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
