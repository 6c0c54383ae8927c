"""Relational joins — broadcast hash join + semi/anti filters.

The reference has no hash joins (SURVEY.md §2.4) — its joins are spatial —
but the engine needs them for attribute-table workflows
(``classify_object``-style feature assembly) and for the oracle-checkable
star-schema queries. Topology:

- **small side broadcast**: ``ray.put`` the dimension table once; every
  worker builds an index in ``__init__``; fact batches stream through a
  vectorized pandas merge — no shuffle (SURVEY.md §4 "broadcast small
  sides"). Right for customer/nation/part-sized sides (≤ a few GB).
- **both sides large**: bucket both by ``hash(key) % B`` and join matching
  buckets (the pattern stages/dedup.py uses); not needed for the current
  query surface, documented as the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


class BroadcastJoiner:
    """Actor-pool callable: small side indexed once per actor."""

    def __init__(self, small_ref, left_key: str, right_key: str, how: str, suffix: str = "_r"):
        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.small = small.to_pandas() if isinstance(small, pa.Table) else small
        self.left_key = left_key
        self.right_key = right_key
        self.how = how
        self.suffix = suffix
        if how in ("semi", "anti"):
            self.keyset = set(self.small[right_key].tolist())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.how in ("semi", "anti"):
            mask = batch[self.left_key].isin(self.keyset)
            return batch[mask if self.how == "semi" else ~mask]
        return batch.merge(
            self.small, left_on=self.left_key, right_on=self.right_key,
            how=self.how, suffixes=("", self.suffix),
        )


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table | pd.DataFrame,
    left_key: str,
    right_key: str | None = None,
    how: str = "inner",
    concurrency=(1, 8),
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Map-side join of a streaming fact Dataset against a broadcast
    dimension table. ``how`` ∈ inner/left/semi/anti."""
    ref = ray.put(small)
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_args=(ref, left_key, right_key or left_key, how),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
