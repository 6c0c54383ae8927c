"""Event-stream fixtures over events.parquet.

The synthetic events table is perfectly time-ordered by ``event_id``
(arrival order == event-time order), so out-of-order / late-data
semantics have nothing to bite on. ``read_delayed_events`` derives a
deterministic EVENT-TIME perturbation — a hash-selected ~20 % of events
report an event time up to 15 minutes EARLIER than their arrival slot
(network-delayed sensors: the record arrives on time but describes the
past) — the standard late-data fixture, reproducible at any block
structure and restatable in SQL (``delayed_events_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import splitmix64

DELAY_MOD = np.uint64(5)            # 1-in-5 events delayed
DELAY_SPAN_US = np.uint64(900_000_000)  # 0..15 min


def read_delayed_events(sf_dir: str) -> ray.data.Dataset:
    """(event_id, arrival_us, etime_us): arrival = the fixture timestamp
    (monotone in event_id), event time = arrival − splitmix64-derived
    delay for the hash-selected fifth of events."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts"])

    def mess(b: pa.Table) -> pd.DataFrame:
        eid = b["event_id"].to_numpy()
        tus = b["ts"].to_pandas().to_numpy("datetime64[us]").astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(eid.astype(np.uint64))
        finally:
            np.seterr(**old)
        delayed = (h % DELAY_MOD) == 0
        delay = ((h >> np.uint64(3)) % DELAY_SPAN_US).astype(np.int64)
        etime = tus - np.where(delayed, delay, np.int64(0))
        return pd.DataFrame({"event_id": eid.astype(np.int64),
                             "arrival_us": tus, "etime_us": etime})

    return ds.map_batches(mess, batch_format="pyarrow")


def delayed_events_sql() -> str:
    """CTE body: the identical perturbation over the events view (named
    ``delayed`` — compose as ``WITH {delayed_events_sql()}, ...``)."""
    from ..functions import sqlgen as _sg

    hx = _sg.chain(
        "SELECT event_id, epoch_us(ts) AS arrival_us FROM events",
        [*_sg.splitmix64_steps("CAST(event_id AS HUGEINT)", "_h", "de")])
    return (
        f"delayed AS (SELECT event_id, arrival_us, "
        f"arrival_us - CASE WHEN (_h % {int(DELAY_MOD)}) = 0 "
        f"THEN CAST((_h >> 3) % {int(DELAY_SPAN_US)} AS BIGINT) "
        f"ELSE 0 END AS etime_us FROM ({hx}))"
    )
