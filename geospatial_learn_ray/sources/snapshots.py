"""Corpus snapshot fixtures — two deterministic versions of the documents
table for change-data-capture (CDC) diffing, the recurring-crawl shape
(yesterday's corpus vs today's): a hash-selected tenth of documents is
REMOVED in v2, another tenth is CHANGED (text suffixed), another tenth
contributes an ADDED document (new id in a disjoint range). Everything
derives from splitmix64(doc_id), so both versions are reproducible at any
block structure and restatable in SQL (``snapshot_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import splitmix64

ADDED_OFFSET = 1_000_000_000


def read_snapshot(sf_dir: str, version: int) -> ray.data.Dataset:
    """(doc_id, text) for snapshot ``version`` ∈ {1, 2}."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    if version == 1:
        return ds

    def v2(b: pa.Table) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        text = b["text"].to_pandas().reset_index(drop=True)
        old = np.seterr(over="ignore")
        try:
            fate = (splitmix64(ids.astype(np.uint64)) % np.uint64(10)).astype(np.int64)
        finally:
            np.seterr(**old)
        keep = fate != 0  # fate 0: removed in v2
        changed = text.where(pd.Series(fate != 1), text + " [rev2]")
        base = pd.DataFrame({"doc_id": ids[keep].astype(np.int64),
                             "text": changed[keep].to_numpy(object)})
        add_src = fate == 2
        added = pd.DataFrame({
            "doc_id": (ids[add_src] + ADDED_OFFSET).astype(np.int64),
            "text": ("fresh crawl content for doc "
                     + pd.Series(ids[add_src]).astype(str)).to_numpy(object),
        })
        return pd.concat([base, added], ignore_index=True)

    return ds.map_batches(v2, batch_format="pyarrow")


def snapshot_sql(version: int) -> str:
    """CTE body (named ``v1`` / ``v2``) — the identical derivation."""
    from ..functions import sqlgen as _sg

    if version == 1:
        return "v1 AS (SELECT doc_id, text FROM documents)"
    hx = _sg.chain("SELECT doc_id, text FROM documents",
                   [*_sg.splitmix64_steps("CAST(doc_id AS HUGEINT)", "_h", "sn")])
    return (
        f"v2 AS (SELECT doc_id, CASE WHEN (_h % 10) = 1 "
        f"  THEN text || ' [rev2]' ELSE text END AS text "
        f"  FROM ({hx}) WHERE (_h % 10) <> 0 "
        f"UNION ALL SELECT doc_id + {ADDED_OFFSET} AS doc_id, "
        f"  'fresh crawl content for doc ' || CAST(doc_id AS VARCHAR) AS text "
        f"  FROM ({hx}) WHERE (_h % 10) = 2)"
    )
