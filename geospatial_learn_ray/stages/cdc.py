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


def scd2_history(snaps: list[ray.data.Dataset], id_col: str = "doc_id",
                 content_col: str = "text",
                 num_buckets: int = 64) -> ray.data.Dataset:
    """Slowly-changing-dimension type-2 history build over an ordered list
    of corpus snapshots: one output row per maximal run of consecutive
    snapshots in which a key is present with unchanged content —
    ``(key, content_hash, valid_from, valid_to, is_current)``. The
    kimball-style dimension-history shape for recurring crawls (each run
    is one "version" of the document; a deletion or content change closes
    the run).

    Scale shape: identical to ``snapshot_diff`` — map-side content
    hashing keeps the text column out of the exchange; all snapshots ship
    narrow (id, hash, snap) rows into ONE bucketed exchange on hash(id),
    and the combiner detects runs with a vectorized sorted scan (no
    per-key Python). Runs never span buckets because a key's rows all
    land in its bucket."""
    n_snaps = len(snaps)

    def tag(snap: int):
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
                                 "snap": np.full(len(ids), snap, np.int64),
                                 "_part": part})
        return fn

    both = snaps[0].select_columns([id_col, content_col]).map_batches(
        tag(1), batch_format="pyarrow")
    for i, s in enumerate(snaps[1:], start=2):
        both = both.union(s.select_columns([id_col, content_col]).map_batches(
            tag(i), batch_format="pyarrow"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "snap"], kind="mergesort")
        ids = g[id_col].to_numpy(np.int64)
        sn = g["snap"].to_numpy(np.int64)
        h = g["h"].to_numpy(np.int64)
        new = np.ones(len(g), bool)
        if len(g) > 1:
            new[1:] = ((ids[1:] != ids[:-1]) | (sn[1:] != sn[:-1] + 1)
                       | (h[1:] != h[:-1]))
        first = np.flatnonzero(new)
        last = np.r_[first[1:] - 1, len(g) - 1] if len(first) else first
        vt = sn[last]
        return pd.DataFrame({
            id_col: ids[first],
            "content_hash": h[first],
            "valid_from": sn[first],
            "valid_to": vt,
            "is_current": (vt == n_snaps).astype(np.int64),
        })

    return bucket_exchange(both, combine)


def golden_record_customers(orders: ray.data.Dataset,
                            num_buckets: int = 64) -> ray.data.Dataset:
    """Survivorship merge (the MDM 'golden record' step downstream of
    entity resolution): per customer, field-level survivorship rules
    over the transactional feed — latest-wins for status/priority
    (order date, ties to max order key), max for the exact-cent price,
    min for the first-seen date, plus the record count. One
    customer-keyed bucket exchange; every combine is a vectorized
    sort + groupby-last, never per-key Python."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(np.int64),
            "okey": b["o_orderkey"].to_numpy(np.int64),
            "status": b["o_orderstatus"],
            "priority": b["o_orderpriority"],
            "cents": cents,
            "date": b["o_orderdate"].to_numpy("datetime64[us]")
            .astype(np.int64)})
        g["_part"] = (g["o_custkey"] % num_buckets).astype(np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["o_custkey", "date", "okey"])
        agg = s.groupby("o_custkey", sort=False).agg(
            n_orders=("okey", "size"),
            latest_status=("status", "last"),
            latest_priority=("priority", "last"),
            max_cents=("cents", "max"),
            first_date=("date", "min")).reset_index()
        agg["n_orders"] = agg["n_orders"].astype(np.int64)
        agg["max_cents"] = agg["max_cents"].astype(np.int64)
        agg["first_date"] = agg["first_date"].to_numpy(np.int64).astype(
            "datetime64[us]")
        return agg

    return bucket_exchange(
        orders.map_batches(partial, batch_format="pandas"), combine)
