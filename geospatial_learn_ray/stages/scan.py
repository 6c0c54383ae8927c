"""Distributed prefix-scan primitives.

Ray Data has no scan operator; the classic two-level decomposition is
range buckets → per-bucket partial sums (small) → driver exclusive scan
over the K bucket totals (K rows, not O(dataset)) → broadcast offsets →
per-bucket vectorized cumsum. The driver step touches K values only, so
the pattern holds at any dataset size (K scales with cluster width, not
row count).

Used by ``pack_sequences`` — the training-data sequence-packing operator
(GPT-style concat-and-chunk: every document gets the sequence index and
intra-sequence offset its tokens land at when the corpus is concatenated
in doc_id order and split into fixed token budgets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .exchange import bucket_exchange


def _bucket_width(ds: ray.data.Dataset, key: str, num_ranges: int) -> int:
    hi = ds.max(key)
    if hi is None:  # empty input: any width works, the scan yields 0 rows
        return 1
    return max(1, (int(hi) + num_ranges) // num_ranges)


def exclusive_prefix_sum(ds: ray.data.Dataset, key: str, val: str,
                         num_ranges: int = 64,
                         checkpoint: bool = True) -> ray.data.Dataset:
    """Add ``prefix`` = sum of ``val`` over all rows with a smaller ``key``
    (exclusive running total in global ``key`` order; keys must be unique).

    Three input passes (key max → range totals → assign), so the input is
    checkpointed to Parquet once by default (the stages/knn.py pattern):
    a lazy upstream (e.g. corpus_prep's quality→dedup→sample chain) would
    otherwise re-execute per pass — measured 3× the whole corpus scan,
    20 s of a 27 s bench run — while a full ``materialize()`` would pin
    the projection in the object store for the stage's lifetime. Pass
    ``checkpoint=False`` when ``ds`` already reads from storage."""
    if checkpoint:
        import ray as _ray

        from ..state.scratch import scratch_dir

        ckpt = scratch_dir("graft_scan_")
        ds.write_parquet(ckpt)
        ds = _ray.data.read_parquet(ckpt)
    width = _bucket_width(ds, key, num_ranges)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        r = (b[key].to_numpy(np.int64) // width)
        return pd.DataFrame({"r": r, "s": b[val].to_numpy(np.int64)}).groupby("r", sort=False).sum().reset_index()

    totals = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("r")
        .sum("s")
        .to_pandas()
        .sort_values("r")
    )
    # driver-side exclusive scan over K range totals (K ≈ cluster width)
    offsets = dict(zip(totals["r"], np.cumsum(totals["sum(s)"].to_numpy(np.int64)) - totals["sum(s)"].to_numpy(np.int64)))
    ref = ray.put(offsets)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_rng"] = (b[key].to_numpy(np.int64) // width).astype(np.int32)
        return b

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        out_frames = []
        for r, fr in g.groupby("_rng", sort=False):
            fr = fr.sort_values(key)
            v = fr[val].to_numpy(np.int64)
            fr = fr.drop(columns=["_rng"]).copy()
            fr["prefix"] = np.cumsum(v) - v + np.int64(off[int(r)])
            out_frames.append(fr)
        return pd.concat(out_frames, ignore_index=True)

    return bucket_exchange(ds.map_batches(add_bucket, batch_format="pandas"), per_range, key="_rng")


def pack_sequences(ds: ray.data.Dataset, budget: int, key: str = "doc_id",
                   val: str = "n_tokens", num_ranges: int = 64) -> ray.data.Dataset:
    """Sequence packing for training corpora: concatenate documents in
    ``key`` order and split into fixed ``budget``-token sequences. Each doc
    gets ``seq_id`` = prefix // budget and ``offset_in_seq`` = prefix %
    budget (docs may straddle sequence boundaries — the standard
    concat-and-chunk semantics)."""
    pref = exclusive_prefix_sum(ds, key, val, num_ranges)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        p = b["prefix"].to_numpy(np.int64)
        b = b.copy()
        b["seq_id"] = p // budget
        b["offset_in_seq"] = p % budget
        return b

    return pref.map_batches(finish, batch_format="pandas")


_I64_MIN = np.int64(np.iinfo(np.int64).min)


def exclusive_prefix_max(ds: ray.data.Dataset, key: str, val: str,
                         num_ranges: int = 64) -> ray.data.Dataset:
    """Add ``prefix_max`` = max of ``val`` over all rows with a smaller
    ``key`` (exclusive running max in global ``key`` order; keys unique;
    identity = INT64_MIN for the first row). Same two-level shape as
    ``exclusive_prefix_sum`` — per-range partial maxes (K rows), driver
    scan over K values, one vectorized per-range pass behind a bucket
    exchange. The running-max is the event-time WATERMARK primitive."""
    width = _bucket_width(ds, key, num_ranges)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        r = (b[key].to_numpy(np.int64) // width)
        return (pd.DataFrame({"r": r, "m": b[val].to_numpy(np.int64)})
                .groupby("r", sort=False).max().reset_index())

    totals = (ds.map_batches(partials, batch_format="pandas")
              .groupby("r").max("m").to_pandas().sort_values("r"))
    m = totals["max(m)"].to_numpy(np.int64)
    # exclusive running max over the K sorted range maxes
    excl = np.concatenate([[_I64_MIN], np.maximum.accumulate(m)[:-1]])
    offsets = dict(zip(totals["r"].astype(int), excl))
    ref = ray.put(offsets)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_rng"] = (b[key].to_numpy(np.int64) // width).astype(np.int32)
        return b

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        out_frames = []
        for r, fr in g.groupby("_rng", sort=False):
            fr = fr.sort_values(key)
            v = fr[val].to_numpy(np.int64)
            run = np.maximum.accumulate(v)
            prev = np.concatenate([[_I64_MIN], run[:-1]])
            fr = fr.drop(columns=["_rng"]).copy()
            fr["prefix_max"] = np.maximum(prev, np.int64(off[int(r)]))
            out_frames.append(fr)
        return pd.concat(out_frames, ignore_index=True)

    return bucket_exchange(ds.map_batches(add_bucket, batch_format="pandas"),
                           per_range, key="_rng")


def compact_plan(ds: ray.data.Dataset, key_col: str, bytes_col: str,
                 target_bytes: int) -> ray.data.Dataset:
    """Lakehouse small-file compaction planner: assign every input unit
    (file / host shard) to a merge group so each group's total payload
    lands near ``target_bytes`` — the OPTIMIZE/rewrite planning step
    every table format (Iceberg/Delta-style maintenance) runs before
    compacting a long-tailed file population.

    Plan rule (deterministic, order-based bin packing): units sort by a
    stable int64 layout key, and group = exclusive-prefix-sum(bytes) //
    target — contiguous key ranges co-locate, every group except the
    last holds ≥ target − max_unit and < target + max_unit bytes. The
    prefix sum IS the engine's two-level distributed scan
    (exclusive_prefix_sum), so the plan never funnels the manifest
    through the driver. Emits (key, nbytes, grp)."""
    pre = exclusive_prefix_sum(ds, key_col, bytes_col, checkpoint=False)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["grp"] = (b["prefix"].to_numpy(np.int64)
                    // target_bytes).astype(np.int64)
        return b.drop(columns=["prefix"])

    return pre.map_batches(assign, batch_format="pandas")
