"""Sampling / splitting — train_test_split analogue (learning.py:640-641).

The reference splits with sklearn's seeded row shuffle; at cluster scale a
row-position shuffle is not stable under repartitioning, so the engine
splits by KEY HASH: ``split = 'test' if splitmix64(fnv1a64(key) ^ seed)
% 10_000 < test_frac·10_000 else 'train'`` — deterministic per key on any
worker, any retry, any partitioning (SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, splitmix64


def train_test_split_by_key(
    ds: ray.data.Dataset, key: str, test_frac: float = 0.25, seed: int = 0
) -> ray.data.Dataset:
    """Adds a ``split`` column ('train'/'test'), hash-derived from ``key``."""
    cut = np.uint64(int(test_frac * 10_000))

    def fn(b: pa.Table) -> pa.Table:
        key_col = b[key]
        if not (pa.types.is_string(key_col.type) or pa.types.is_binary(key_col.type)):
            key_col = pa.compute.cast(key_col, pa.string())
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(fnv1a64(key_col) ^ splitmix64(np.full(len(b), seed + 1, np.uint64)))
        finally:
            np.seterr(**old)
        is_test = (h % np.uint64(10_000)) < cut
        split = np.where(is_test, "test", "train")
        return b.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
