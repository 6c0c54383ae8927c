"""Change-data-capture between corpus snapshots.

``snapshot_diff`` classifies every document id as added / removed /
changed between two corpus versions (the recurring-crawl diff that
decides what to re-process downstream); unchanged ids are dropped.
LLM-pipeline extension; no reference analogue (nearest:
``incremental_dedup``'s store probe, which only answers "seen before").

Scale shape: content hashes are computed MAP-SIDE (fnv1a64 straight off
the Arrow string column), so the wide text column never crosses the
exchange — both sides ship narrow (id, hash, side) rows into ONE
bucketed exchange on hash(id), and the combiner does a vectorized outer
merge per bucket. Equality-by-hash keeps the two sides' predicate
identical to the SQL twin's under any input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, splitmix64
from .exchange import bucket_exchange


def snapshot_diff(v1: ray.data.Dataset, v2: ray.data.Dataset,
                  id_col: str = "doc_id", content_col: str = "text",
                  num_buckets: int = 64) -> ray.data.Dataset:
    def tag(side: int):
        def fn(b: pa.Table) -> pd.DataFrame:
            ids = b[id_col].to_numpy()
            h = fnv1a64(b[content_col]).view(np.int64)
            old = np.seterr(over="ignore")
            try:
                part = (splitmix64(ids.astype(np.uint64))
                        % np.uint64(num_buckets)).astype(np.int32)
            finally:
                np.seterr(**old)
            return pd.DataFrame({id_col: ids.astype(np.int64), "h": h,
                                 "_t": np.int8(side), "_part": part})
        return fn

    both = v1.select_columns([id_col, content_col]).map_batches(
        tag(0), batch_format="pyarrow").union(
        v2.select_columns([id_col, content_col]).map_batches(
            tag(1), batch_format="pyarrow"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["_t"] == 0][[id_col, "h"]].astype({"h": "Int64"})
        b = g[g["_t"] == 1][[id_col, "h"]].astype({"h": "Int64"})
        # Int64 (nullable), NOT float: an int64 hash does not survive a
        # NaN-induced float64 cast — two distinct hashes could collide
        m = a.merge(b, on=id_col, how="outer", suffixes=("_a", "_b"))
        ha, hb = m["h_a"], m["h_b"]
        change = np.where(ha.isna(), "added",
                          np.where(hb.isna(), "removed", "changed"))
        keep = ha.isna() | hb.isna() | (ha != hb).fillna(False)
        out = pd.DataFrame({id_col: m[id_col].to_numpy(np.int64),
                            "change": change})[keep.to_numpy()]
        return out.reset_index(drop=True)

    return bucket_exchange(both, combine)
