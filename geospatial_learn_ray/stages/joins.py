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


class IntervalJoiner:
    """Actor-pool range-join stage (the brief's 'range join' custom
    operator): the small interval table is broadcast (``ray.put`` once,
    fetched per actor in ``__init__``) and each streaming batch is stabbed
    vectorized — no shuffle touches the big side. Two plans, picked once
    at init: sorted NON-overlapping intervals stab with two searchsorted
    calls per batch (O(n log k)); overlapping intervals fall back to a
    chunked outer compare (O(n·k) but fully vectorized — k is
    broadcast-sized by contract)."""

    def __init__(self, iv_ref, ts_col: str, lo_col: str, hi_col: str,
                 id_col: str):
        iv = ray.get(iv_ref) if isinstance(iv_ref, ray.ObjectRef) else iv_ref
        iv = iv.to_pandas() if isinstance(iv, pa.Table) else iv
        iv = iv.sort_values(lo_col)
        self.ts_col, self.id_col = ts_col, id_col
        self.lo = iv[lo_col].to_numpy("datetime64[us]").view(np.int64)
        self.hi = iv[hi_col].to_numpy("datetime64[us]").view(np.int64)
        self.ids = iv[id_col].to_numpy()
        self.disjoint = bool((self.hi[:-1] <= self.lo[1:]).all())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch[self.ts_col].to_numpy("datetime64[us]").view(np.int64)
        if self.disjoint:
            # candidate = last interval with lo <= ts; match iff ts < its hi
            cand = np.searchsorted(self.lo, ts, side="right") - 1
            ok = (cand >= 0) & (ts < self.hi[np.maximum(cand, 0)])
            rows, ivs = np.flatnonzero(ok), cand[ok]
        else:
            hits = (ts[:, None] >= self.lo[None, :]) & (ts[:, None] < self.hi[None, :])
            rows, ivs = np.nonzero(hits)
        out = batch.iloc[rows].reset_index(drop=True)
        out[self.id_col] = self.ids[ivs]
        return out


def interval_join(
    ds: ray.data.Dataset,
    intervals: pd.DataFrame,
    ts_col: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    id_col: str = "interval_id",
    concurrency=(1, 8),
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Inner range join of a streaming Dataset against a broadcast interval
    table: every row matching ``lo <= ts < hi`` is emitted once per
    matching interval (overlaps produce multiple rows)."""
    ref = ray.put(intervals)
    return ds.map_batches(
        IntervalJoiner,
        fn_constructor_args=(ref, ts_col, lo_col, hi_col, id_col),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
