"""Streaming-shaped operators over the ordered events log.

Ray Data has no event-time windows (SURVEY.md §2.9); stream semantics are
expressed as hash-partition-by-key + in-partition time ordering, exactly
as the guide's "treat the input as an ordered, partitioned log" pattern:

- ``sessionize`` — session windows (gap-based), the classic streaming
  windowing op, computed per key-bucket with one vectorized pandas pass;
- ``asof_join`` — for each left row, the most recent right row (same key,
  right.ts ≤ left.ts), via ``pd.merge_asof`` inside key-hash buckets —
  SURVEY.md §2.4's "as-of maps to sort + merge map_groups".

Ordering contract: (key, ts) pairs are unique in the events fixture; ties
on ts would resolve by the documented sort order (ts, then id desc for the
right side — matching the SQL oracle's ORDER BY ts DESC, id DESC LIMIT 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import splitmix64
from .exchange import bucket_exchange


def _bucket_by_key(ds: ray.data.Dataset, key: str, num_buckets: int = 64) -> ray.data.Dataset:
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = (splitmix64(b[key].to_numpy().astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
        return b

    return ds.map_batches(fn, batch_format="pandas")


def sessionize(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Gap-based session windows per key → one row per session
    (key, session_id 1-based, n_events, session_start, session_end)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        new_key = g[key].ne(g[key].shift())
        gap_break = (g[ts_col] - g[ts_col].shift()) > gap
        new_session = (new_key | gap_break).astype(np.int64)
        # cumsum restarts per key: global cumsum minus each key's offset
        csum = new_session.cumsum()
        key_base = csum.where(new_key).ffill() - 1
        g = g.assign(session_id=(csum - key_base).astype(np.int64))
        out = (
            g.groupby([key, "session_id"], sort=False)
            .agg(n_events=(ts_col, "count"), session_start=(ts_col, "min"), session_end=(ts_col, "max"))
            .reset_index()
        )
        return out

    return bucket_exchange(_bucket_by_key(ds, key, num_buckets), per_bucket, key="_bkt")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    right_id_col: str = "event_id",
    out_col: str = "asof_value",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """As-of join: per left row, the most recent right value at or before
    its timestamp for the same key (NULL if none). Both sides bucket on the
    key hash (co-partitioned), union with a side tag, and each bucket runs
    one ``pd.merge_asof`` — no global sort."""

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["_side"] = np.int32(side)
            return b

        return fn

    lt = _bucket_by_key(left.map_batches(tag(0), batch_format="pandas"), key, num_buckets)
    rt = _bucket_by_key(right.map_batches(tag(1), batch_format="pandas"), key, num_buckets)
    both = lt.union(rt)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0].drop(columns=["_side", "_bkt"])
        rg = g[g["_side"] == 1].drop(columns=["_side", "_bkt"])
        lg = lg.sort_values(ts_col, kind="mergesort")
        # ties on right ts resolve to max right_id (merge_asof takes the
        # last row in sort order) — matches the oracle's ORDER BY ... DESC
        rg = rg.sort_values([ts_col, right_id_col], kind="mergesort")
        merged = pd.merge_asof(
            lg,
            rg[[key, ts_col, value_col]].rename(columns={value_col: out_col}),
            on=ts_col,
            by=key,
            direction="backward",
        )
        return merged

    return bucket_exchange(both, per_bucket, key="_bkt")


def hopping_window(events: ray.data.Dataset, ts_col: str = "ts",
                   key_col: str = "event_type", value_col: str = "value",
                   window_hours: int = 2, hop_hours: int = 1) -> ray.data.Dataset:
    """Hopping-window aggregate (overlapping windows, the streaming
    counterpart of the tumbling `window_events` query): every event lands
    in ``window/hop`` windows, so the map side EXPLODES each event into
    its window starts (a bounded constant factor) and pre-aggregates
    before the exchange — the same partial-moments shape as
    grouped_stats, never a per-window shuffle of raw events."""
    from .agg import grouped_stats

    n_wins = window_hours // hop_hours

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        h = b[ts_col].dt.floor(f"{hop_hours}h")
        frames = [pd.DataFrame({
            key_col: b[key_col].to_numpy(object),
            "win_start": (h - pd.Timedelta(hours=k * hop_hours))
            .to_numpy("datetime64[us]"),
            value_col: b[value_col].to_numpy(np.float64),
        }) for k in range(n_wins)]
        return pd.concat(frames, ignore_index=True)

    exploded = events.select_columns([ts_col, key_col, value_col]).map_batches(
        explode, batch_format="pandas")
    return grouped_stats(exploded, [key_col, "win_start"], value_col,
                         stats=("count", "sum"), round_to=4)


def event_gaps(ds: ray.data.Dataset, key: str = "user_id",
               ts_col: str = "ts", num_buckets: int = 64) -> ray.data.Dataset:
    """Per-key inter-arrival gap statistics (n_events, and the count /
    sum / min / max / rounded mean of consecutive-event gaps in integer
    microseconds) — the stream-health aggregate behind rate limiting and
    bot detection. Streaming extension (SURVEY.md §2.9: the reference is
    purely batch); keys with a single event have no gaps and drop out
    (filter semantics, mirrored by HAVING COUNT(*) >= 2).

    Scale shape: one bucketed exchange on hash(key) moves narrow
    (key, ts) rows — like ``sessionize``, gaps need every event of a key
    co-located, so the exchange is O(dataset) and ``small_partials``
    stays False (exchange.py contract). The combiner is one vectorized
    sort + diff per bucket, grouped by REAL key. Gap sums are exact
    int64 microseconds — order-exact at any scale (never float seconds).

    Ties on ts need no tiebreak: the multiset of consecutive deltas of a
    sorted sequence is invariant to the ordering of equal timestamps."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        ks = g[key].to_numpy(np.int64)
        us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        same = np.zeros(len(g), bool)
        if len(g):
            same[1:] = ks[1:] == ks[:-1]
        d = np.empty(len(g), np.int64)
        if len(g):
            d[0] = 0
            d[1:] = us[1:] - us[:-1]
        f = pd.DataFrame({key: ks, "gap": d, "is_gap": same})
        agg = f.groupby(key, sort=False).agg(
            n_events=("gap", "size"),
            n_gaps=("is_gap", "sum"))
        gaps = f[f["is_gap"]].groupby(key, sort=False)["gap"].agg(
            sum_gap_us="sum", min_gap_us="min", max_gap_us="max")
        out = agg.join(gaps, how="inner").reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["n_gaps"] = out["n_gaps"].astype(np.int64)
        from ..functions.rounding import round_half_away
        out["mean_gap_us"] = round_half_away(
            out["sum_gap_us"].to_numpy(np.float64) / out["n_gaps"].to_numpy(np.int64), 6)
        return out

    narrow = ds.select_columns([key, ts_col])
    return bucket_exchange(_bucket_by_key(narrow, key, num_buckets),
                           per_bucket, key="_bkt")


def late_events(ds: ray.data.Dataset, order_col: str = "event_id",
                time_col: str = "etime_us",
                lateness_us: int = 300_000_000) -> ray.data.Dataset:
    """Event-time watermark / late-data tagging (the Beam/Flink
    allowed-lateness semantic, SURVEY.md §2.9): processing the log in
    ``order_col`` (arrival) order, the watermark before each record is
    (max event time seen so far) − ``lateness_us``; a record whose event
    time falls below it is LATE (a windowed aggregate would have already
    closed its window). Streaming extension; no reference analogue.

    Scale shape: the running max rides ``scan.exclusive_prefix_max`` —
    per-range partials, a driver scan over K range maxes (K ≈ cluster
    width, never O(rows)), one vectorized per-range pass. All arithmetic
    is exact int64 microseconds; the first record coalesces the empty
    watermark to its own event time (never late)."""
    from .scan import exclusive_prefix_max

    pm = exclusive_prefix_max(ds, order_col, time_col)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        et = b[time_col].to_numpy(np.int64)
        prev = b["prefix_max"].to_numpy(np.int64)
        pmax = np.where(prev == np.int64(np.iinfo(np.int64).min), et, prev)
        wm = pmax - np.int64(lateness_us)
        return pd.DataFrame({order_col: b[order_col].to_numpy(np.int64),
                             "watermark_us": wm,
                             "is_late": (et < wm).astype(np.int64)})

    return pm.map_batches(finish, batch_format="pandas")


def daily_user_accounting(ds: ray.data.Dataset, key: str = "user_id",
                          ts_col: str = "ts", num_buckets: int = 64,
                          day_bound: int = 100_000) -> ray.data.Dataset:
    """Per-day new / returning / cumulative user accounting — the growth
    dashboard every event log feeds (daily active users, first-seen
    cohorts, cumulative reach). Streaming-analytics extension
    (SURVEY.md §2.9); no reference analogue.

    Scale shape: exchange 1 co-locates each user's DISTINCT (user, day)
    pairs (locally pre-deduped per block, so a power user ships #blocks
    rows, not their event count) and tags each day with whether it is the
    user's first; exchange 2 sums per-day partials (new/active from
    exchange 1, raw event counts map-side from the events themselves).
    Only the per-DAY table reaches the driver for the cumulative scan —
    a COUNTED bound (≤ ``day_bound`` rows; a day span is a calendar,
    not a corpus)."""
    from .exchange import bucket_exchange

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            key: b[key].to_numpy(np.int64),
            "day": b[ts_col].to_numpy("datetime64[D]").astype(np.int64),
        }).drop_duplicates()
        d["_bkt"] = (splitmix64(d[key].to_numpy(np.int64).astype(np.uint64))
                     % np.uint64(num_buckets)).astype(np.int32)
        return d

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[key, "day"]].drop_duplicates()
        first = g.groupby(key, sort=False)["day"].transform("min")
        out = pd.DataFrame({"day": g["day"].to_numpy(np.int64),
                            "active": np.int64(1),
                            "new": (g["day"].to_numpy(np.int64)
                                    == first.to_numpy(np.int64)).astype(np.int64),
                            "n_ev": np.int64(0)})
        agg = out.groupby("day", sort=False, as_index=False).sum()
        agg["_bkt"] = (splitmix64(agg["day"].to_numpy(np.int64).astype(np.uint64))
                       % np.uint64(num_buckets)).astype(np.int32)
        return agg

    user_days = bucket_exchange(
        ds.select_columns([key, ts_col]).map_batches(pairs, batch_format="pandas"),
        per_user, key="_bkt")

    def ev_counts(b: pd.DataFrame) -> pd.DataFrame:
        d = (pd.DataFrame({"day": b[ts_col].to_numpy("datetime64[D]").astype(np.int64)})
             .groupby("day", sort=False).size().reset_index(name="n_ev"))
        d["active"] = np.int64(0)
        d["new"] = np.int64(0)
        d["n_ev"] = d["n_ev"].astype(np.int64)
        d["_bkt"] = (splitmix64(d["day"].to_numpy(np.int64).astype(np.uint64))
                     % np.uint64(num_buckets)).astype(np.int32)
        return d[["day", "active", "new", "n_ev", "_bkt"]]

    both = user_days.union(
        ds.select_columns([ts_col]).map_batches(ev_counts, batch_format="pandas"))

    per_day = bucket_exchange(
        both,
        lambda g: g.groupby("day", sort=False, as_index=False)
                   [["active", "new", "n_ev"]].sum(),
        key="_bkt", small_partials=True).materialize()

    n_days = per_day.count()
    if n_days > day_bound:
        raise ValueError(f"daily_user_accounting: {n_days} days exceeds the "
                         f"driver-pull bound ({day_bound})")
    t = per_day.to_pandas().sort_values("day").reset_index(drop=True)
    return ray.data.from_pandas(pd.DataFrame({
        "day": t["day"].to_numpy(np.int64).astype("datetime64[D]").astype(str),
        "n_events": t["n_ev"].to_numpy(np.int64),
        "active_users": t["active"].to_numpy(np.int64),
        "new_users": t["new"].to_numpy(np.int64),
        "returning_users": (t["active"] - t["new"]).to_numpy(np.int64),
        "cum_users": np.cumsum(t["new"].to_numpy(np.int64)),
    }))


def funnel_conversion(ds: ray.data.Dataset, key: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      step_a: str = "signup", step_b: str = "purchase",
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Two-step funnel per key: the first ``step_a`` event, the first
    ``step_b`` event at or after it, a conversion flag and the
    time-to-convert in exact integer microseconds — the product-analytics
    query every event log answers (signup → purchase). Streaming-analytics
    extension (SURVEY.md §2.9); no reference analogue. Keys that never
    reach ``step_a`` drop out (filter semantics).

    Scale shape: the map filters to the two step types (~60 % of rows
    never leave the block here) and pre-reduces per block — one min-a row
    per key, distinct b rows (min-b-after-a is not block-decomposable
    without a, so b candidates ship; they are a funnel step, not the
    firehose). One key-hash exchange, then a fully vectorized
    merge + filter + groupby-min per bucket."""

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        et = b[type_col].to_numpy(object)
        m = (et == step_a) | (et == step_b)
        d = pd.DataFrame({
            key: b[key].to_numpy(np.int64)[m],
            "tus": b[ts_col].to_numpy("datetime64[us]").astype(np.int64)[m],
            "is_a": (et[m] == step_a).astype(np.int8),
        })
        a = (d[d["is_a"] == 1].groupby(key, sort=False, as_index=False)["tus"]
             .min().assign(is_a=np.int8(1)))
        bb = d[d["is_a"] == 0].drop_duplicates()
        out = pd.concat([a[[key, "tus", "is_a"]], bb], ignore_index=True)
        out["_bkt"] = (splitmix64(out[key].to_numpy(np.int64).astype(np.uint64))
                       % np.uint64(num_buckets)).astype(np.int32)
        return out

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        a0 = g[g["is_a"] == 1].groupby(key, sort=False)["tus"].min().rename("signup_us")
        bc = g[g["is_a"] == 0][[key, "tus"]].merge(a0, on=key)
        b0 = (bc[bc["tus"] >= bc["signup_us"]]
              .groupby(key, sort=False)["tus"].min().rename("purchase_us"))
        out = a0.to_frame().join(b0, how="left").reset_index()
        conv = out["purchase_us"].notna().to_numpy()
        p = out["purchase_us"].fillna(-1).to_numpy(np.int64)
        s = out["signup_us"].to_numpy(np.int64)
        return pd.DataFrame({key: out[key].to_numpy(np.int64),
                             "signup_us": s,
                             "purchase_us": np.where(conv, p, np.int64(-1)),
                             "converted": conv.astype(np.int64),
                             "ttc_us": np.where(conv, p - s, np.int64(-1))})

    narrow = ds.select_columns([key, ts_col, type_col])
    return bucket_exchange(narrow.map_batches(prep, batch_format="pandas"),
                           per_user, key="_bkt")


def cohort_retention(ds: ray.data.Dataset, key: str = "user_id",
                     ts_col: str = "ts",
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Cohort retention matrix: users grouped by first-seen day (their
    cohort), counted at every day-offset they come back, plus the
    retention rate against the cohort's own size — the classic growth
    triangle every event log feeds. Streaming-analytics extension
    (SURVEY.md §2.9); no reference analogue.

    Scale shape: exchange 1 (user hash) co-locates each user's DISTINCT
    (user, day) pairs (locally pre-deduped per block, so a power user
    ships #blocks rows, not their event count) and reduces them straight
    to (cohort, offset, n) partials pre-aggregated per bucket; exchange 2
    (cohort hash) sums partials and derives the rate against the
    cohort's offset-0 row — whole cohorts co-locate, so no third pass.
    Output is O(days²) rows regardless of corpus size.

    The rate is a ratio of exact small integers rounded half-away to 6
    (matches SQL ROUND on the reachable dyadic ties, e.g. odd/128)."""
    from ..functions.rounding import round_half_away

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            key: b[key].to_numpy(np.int64),
            "day": b[ts_col].to_numpy("datetime64[D]").astype(np.int64),
        }).drop_duplicates()
        d["_bkt"] = (splitmix64(d[key].to_numpy(np.int64).astype(np.uint64))
                     % np.uint64(num_buckets)).astype(np.int32)
        return d

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[key, "day"]].drop_duplicates()
        first = g.groupby(key, sort=False)["day"].transform("min")
        part = (pd.DataFrame({"cohort": first.to_numpy(np.int64),
                              "offset_days": g["day"].to_numpy(np.int64)
                              - first.to_numpy(np.int64)})
                .groupby(["cohort", "offset_days"], sort=False)
                .size().reset_index(name="n_users"))
        part["n_users"] = part["n_users"].astype(np.int64)
        part["_bkt"] = (splitmix64(part["cohort"].to_numpy(np.int64)
                                   .astype(np.uint64))
                        % np.uint64(num_buckets)).astype(np.int32)
        return part

    def per_cohort(g: pd.DataFrame) -> pd.DataFrame:
        t = (g.groupby(["cohort", "offset_days"], sort=False, as_index=False)
             ["n_users"].sum())
        size = (t[t["offset_days"] == 0].set_index("cohort")["n_users"]
                .reindex(t["cohort"]).to_numpy(np.int64))
        return pd.DataFrame({
            "cohort": t["cohort"].to_numpy(np.int64)
            .astype("datetime64[D]").astype(str),
            "offset_days": t["offset_days"].to_numpy(np.int64),
            "n_users": t["n_users"].to_numpy(np.int64),
            "retention": round_half_away(
                t["n_users"].to_numpy(np.float64) / size, 6),
        })

    days = bucket_exchange(
        ds.select_columns([key, ts_col]).map_batches(pairs,
                                                     batch_format="pandas"),
        per_user, key="_bkt")
    return bucket_exchange(days, per_cohort, key="_bkt",
                           small_partials=True)


def burst_detect(ds: ray.data.Dataset, key: str = "user_id",
                 ts_col: str = "ts", num_buckets: int = 64,
                 rate_factor: int = 10, min_count: int = 5) -> ray.data.Dataset:
    """Per-key hourly burst detection: flag every hour where a key's event
    count is at least ``rate_factor``× its own calendar-mean hourly rate
    (and ≥ ``min_count`` absolute) — the rate-limiter / bot-burst rule
    every event firehose runs. Streaming-analytics extension (SURVEY.md
    §2.9); no reference analogue.

    The rule is EXACT integer arithmetic end-to-end:
    ``c·H ≥ rate_factor·S AND c ≥ min_count`` where c = events this hour,
    S = the key's total events, H = the global hour span — no float mean
    or variance crosses an engine/SQL boundary (and c·H stays far inside
    int64 at any realistic scale: c ≤ 1e9 events/hour, H ≤ 1e5 hours).

    Scale shape: per-block (key, hour) pre-aggregation (a firehose key
    ships #blocks partials, not its event count), ONE key-hash exchange
    whose combiner sums per-hour counts and the per-key total together;
    H is a 2-number global reduce broadcast as a literal."""

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        d = (pd.DataFrame({
            key: b[key].to_numpy(np.int64),
            "hour": b[ts_col].to_numpy("datetime64[us]").astype(np.int64)
            // 3_600_000_000,
        }).groupby([key, "hour"], sort=False).size().reset_index(name="c"))
        d["c"] = d["c"].astype(np.int64)
        d["_bkt"] = (splitmix64(d[key].to_numpy(np.int64).astype(np.uint64))
                     % np.uint64(num_buckets)).astype(np.int32)
        return d

    # materialized ONCE: the partials are the narrow (key, hour, c) table
    # (O(distinct pairs), spillable), read again by the exchange below —
    # not a recompute of the storage scan
    parted = ds.select_columns([key, ts_col]).map_batches(
        prep, batch_format="pandas").materialize()

    # global hour span: a 2-number aggregate over the slim partials
    bounds = parted.aggregate(ray.data.aggregate.Min("hour"),
                              ray.data.aggregate.Max("hour"))
    H = np.int64(bounds["max(hour)"] - bounds["min(hour)"] + 1)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby([key, "hour"], sort=False, as_index=False)["c"].sum()
        S = t.groupby(key, sort=False)["c"].transform("sum").to_numpy(np.int64)
        c = t["c"].to_numpy(np.int64)
        burst = (c * H >= np.int64(rate_factor) * S) & (c >= min_count)
        return pd.DataFrame({key: t[key].to_numpy(np.int64)[burst],
                             "hour": t["hour"].to_numpy(np.int64)[burst],
                             "n_events": c[burst],
                             "total_events": S[burst],
                             "hour_span": np.full(int(burst.sum()), H,
                                                  np.int64)})

    return bucket_exchange(parted, per_key, key="_bkt")


def debounce_events(ds: ray.data.Dataset, window_s: int = 300) -> ray.data.Dataset:
    """Idempotent event de-duplication (debounce): keep the FIRST event
    per (user, event_type) in each tumbling ``window_s`` window — the
    at-least-once-delivery cleanup every event pipeline runs before
    aggregation. Deterministic under any block structure: "first" is
    (min event-time, min event_id) per key-window, selected with
    ``grouped_topk``'s per-block partial top-1 (a hot user ships one row
    per block per window, never its full event list)."""
    from .agg import grouped_topk

    win_us = window_s * 1_000_000

    def prep(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].to_numpy().astype("datetime64[us]")
        us = ts.astype(np.int64)
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype(np.int64),
            "event_type": b["event_type"].to_pandas().to_numpy(object),
            "win": us // win_us,
            "event_id": b["event_id"].to_numpy().astype(np.int64),
            "ts": ts,
            "ts_us": us,
        })

    return grouped_topk(
        ds.select_columns(["user_id", "event_type", "event_id", "ts"])
        .map_batches(prep, batch_format="pyarrow"),
        ["user_id", "event_type", "win"], "ts_us", 1,
        tiebreak="event_id", descending=False)


def event_transitions(ds: ray.data.Dataset,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """First-order Markov transition counts over each user's time-ordered
    event sequence (the behavioral n-gram: session-flow modeling), with
    row-normalized probabilities. Exchange 1 co-locates each user's
    narrow (user, ts, event_id, type) rows and emits per-bucket
    PRE-AGGREGATED (from, to, cnt) partials from one vectorized sorted
    scan; exchange 2 keys on hash(from) so a source type's full row
    co-locates — the normalizing row total is a groupby-transform, never
    a third shuffle. Ties in ts break on event_id (total order)."""
    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def prep(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype(np.int64),
            "et": b["event_type"].to_pandas().to_numpy(object),
            "u": ts,
            "event_id": b["event_id"].to_numpy().astype(np.int64)})
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(d["user_id"].to_numpy().astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "u", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        et = g["et"].to_numpy(object)
        same = uid[1:] == uid[:-1]
        c = (pd.DataFrame({"a": et[:-1][same], "b": et[1:][same]})
             .groupby(["a", "b"], sort=False).size().reset_index(name="cnt"))
        c["cnt"] = c["cnt"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            c["_part"] = (splitmix64(fnv1a64(c["a"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return c

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby(["a", "b"], sort=False,
                                              as_index=False)["cnt"].sum()
        tot = c.groupby("a", sort=False)["cnt"].transform("sum")
        return pd.DataFrame({
            "from_type": c["a"].to_numpy(object),
            "to_type": c["b"].to_numpy(object),
            "n": c["cnt"].to_numpy(np.int64),
            "frac": c["cnt"].to_numpy(np.int64).astype(np.float64)
            / tot.to_numpy(np.int64).astype(np.float64)})

    parted = ds.select_columns(
        ["user_id", "event_type", "event_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return bucket_exchange(bucket_exchange(parted, pairs), finalize,
                           small_partials=True)


def cusum_hourly(ds: ray.data.Dataset, num_buckets: int = 32,
                 hour_bound: int = 200_000) -> ray.data.Dataset:
    """CUSUM change-point statistic over the global hourly event-rate
    series (Page 1954), INTEGER-exact via the prefix closed form: the
    recursion S_t = max(0, S_{t-1} + d_t) equals P_t − min_{s≤t} P_s for
    prefix sums P of the deviations d_t = T·c_t − N (scaled by the hour
    count so the mean is never a float). Alarm where S > N/4.

    Scale shape: per-block (hour, count) partials, one hour-keyed
    exchange to exact totals; only the per-HOUR table reaches the driver
    (counted ≤ ``hour_bound`` — an hour span is a calendar, not a
    corpus; the daily_users rule), where the scan is one numpy pass over
    Python-int-safe values."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        hr = (b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
              // 3_600_000_000)
        g = (pd.DataFrame({"hour": hr}).groupby("hour", as_index=False)
             .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(g["hour"].to_numpy().astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    hourly = bucket_exchange(
        ds.select_columns(["ts"]).map_batches(partial, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby(
            "hour", as_index=False)["c"].sum().astype({"c": np.int64}),
        small_partials=True).to_pandas()
    if len(hourly) > hour_bound:
        raise ValueError(f"hour span {len(hourly)} exceeds bound {hour_bound}")
    h0, h1 = int(hourly["hour"].min()), int(hourly["hour"].max())
    full = pd.DataFrame({"hour": np.arange(h0, h1 + 1, dtype=np.int64)})
    full = full.merge(hourly, on="hour", how="left")
    c = full["c"].fillna(0).to_numpy(np.int64)
    t = len(c)
    n = int(c.sum())
    d = t * c - n
    p = np.cumsum(d)
    s = p - np.minimum.accumulate(p)
    thr = n // 4
    return ray.data.from_pandas(pd.DataFrame({
        "hour": full["hour"].to_numpy(np.int64),
        "c": c,
        "cusum": s,
        "alarm": (s > thr).astype(np.int64)}))


def interval_coverage(ds: ray.data.Dataset, key: str = "user_id",
                      ts_col: str = "ts", val_col: str = "value",
                      base_s: int = 60,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Per-key merged-interval coverage (gaps-and-islands): each event
    opens the interval [ts, ts + dur) with dur = (⌊|value|·10 + 0.5⌋ +
    base_s) seconds; overlapping/touching intervals per key merge into
    islands and the output is (key, n_events, n_islands, covered_us,
    max_island_us) — the session-coverage / uptime semantic behind SLA
    accounting. Streaming extension (SURVEY.md §2.9).

    Scale shape: one bucketed exchange on hash(key) of narrow
    (key, start, end) int64-µs rows; the combiner is a single vectorized
    sort + per-key running-max pass per bucket (no Python per-group
    loop). All arithmetic is exact int64 microseconds, so sums are
    order-exact at any scale. Island detection is tie-safe: rows sort by
    (key, start, end) and a row starts a new island iff start > running
    max end of all prior rows of the key — equal starts can never open
    an island regardless of tie order (prev end ≥ prev start = start)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ks = g[key].to_numpy(np.int64)
        s = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        dur = (np.floor(np.abs(g[val_col].to_numpy(np.float64)) * 10.0
                        + 0.5).astype(np.int64) + np.int64(base_s))
        e = s + dur * np.int64(1_000_000)
        f = pd.DataFrame({key: ks, "s": s, "e": e}).sort_values(
            [key, "s", "e"], kind="mergesort")
        ks = f[key].to_numpy(np.int64)
        s = f["s"].to_numpy(np.int64)
        e = f["e"].to_numpy(np.int64)
        new_key = np.zeros(len(f), bool)
        if len(f):
            new_key[0] = True
            new_key[1:] = ks[1:] != ks[:-1]
        # segmented running max of e within key (vectorized C path)
        run = pd.Series(e).groupby(ks, sort=False).cummax().to_numpy(np.int64)
        prev_run = np.empty(len(f), np.int64)
        if len(f):
            prev_run[0] = np.iinfo(np.int64).min
            prev_run[1:] = run[:-1]
        new_island = new_key | (s > prev_run)
        island_id = np.cumsum(new_island)
        isl = pd.DataFrame({key: ks, "iid": island_id, "s": s, "e": e})
        islands = isl.groupby("iid", sort=False).agg(
            k=(key, "first"), s0=("s", "min"), e1=("e", "max"),
            n=("s", "size"))
        islands["len_us"] = islands["e1"] - islands["s0"]
        out = islands.groupby("k", sort=False).agg(
            n_events=("n", "sum"), n_islands=("n", "size"),
            covered_us=("len_us", "sum"), max_island_us=("len_us", "max"))
        out = out.reset_index().rename(columns={"k": key})
        for c in ("n_events", "n_islands", "covered_us", "max_island_us"):
            out[c] = out[c].astype(np.int64)
        return out

    narrow = ds.select_columns([key, ts_col, val_col])
    return bucket_exchange(_bucket_by_key(narrow, key, num_buckets),
                           per_bucket, key="_bkt")


def acf_daily_orders(orders: ray.data.Dataset, max_lag: int = 7,
                     day_bound: int = 200_000) -> ray.data.Dataset:
    """Autocorrelation of the global DAILY order-count series at lags
    1..``max_lag`` (Box & Jenkins): r_L = Σ yₜ·yₜ₊L / Σ yₜ², computed on
    the mean-free INTEGER series y_t = n·x_t − Σx (the n² scale cancels
    in the ratio, so the mean never becomes a float — the cusum_hourly
    trick). Missing days inside [min_day, max_day] count as x=0.

    Scale shape: per-block (day, count) partials, one day-keyed exchange
    to exact totals; only the per-DAY table reaches the driver (counted
    ≤ ``day_bound`` — a day span is a calendar, not a corpus), where
    num/den are exact Python-int reductions (no int64 wrap at any sf)
    and each r_L is ONE correctly-rounded f64 division, identical to
    the SQL twin's CAST/CAST divide."""
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        g = (pd.DataFrame({"day": day}).groupby("day", as_index=False)
             .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(g["day"].to_numpy().astype(np.uint64))
                          % np.uint64(32)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    daily = bucket_exchange(
        orders.select_columns(["o_orderdate"]).map_batches(
            partial, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby(
            "day", as_index=False)["c"].sum().astype({"c": np.int64}),
        small_partials=True).to_pandas()
    if len(daily) > day_bound:
        raise ValueError(f"day span {len(daily)} exceeds bound {day_bound}")
    d0, d1 = int(daily["day"].min()), int(daily["day"].max())
    full = pd.DataFrame({"day": np.arange(d0, d1 + 1, dtype=np.int64)})
    full = full.merge(daily, on="day", how="left")
    x = [int(v) for v in full["c"].fillna(0).to_numpy(np.int64)]
    n, sx = len(x), sum(x)
    y = [n * v - sx for v in x]
    den = sum(v * v for v in y)
    rows = []
    for lag in range(1, max_lag + 1):
        num = sum(y[t] * y[t + lag] for t in range(n - lag))
        assert abs(num) < 2 ** 63 and den < 2 ** 63, "limb-split needed"
        r = 0.0 if den == 0 else np.float64(num) / np.float64(den)
        rows.append({"lag": lag, "n_terms": max(n - lag, 0),
                     "acf_r": round_half_away(float(r), 6)})
    out = pd.DataFrame(rows)
    out["lag"] = out["lag"].astype(np.int64)
    out["n_terms"] = out["n_terms"].astype(np.int64)
    return ray.data.from_pandas(out)


def mad_outliers_events(events: ray.data.Dataset,
                        num_buckets: int = 16) -> ray.data.Dataset:
    """Robust outlier flags on the hourly event-rate series per event
    type (Hampel filter family, Leys et al. 2013): a present-hour count
    is an outlier when |c − median| > 3·MAD. INTEGER-exact end to end
    via the doubled-median trick: m2 = lo+hi of the sorted counts
    (= 2·median), dev2 = |2c − m2| (= 2·deviation), mad4 = lo+hi of the
    sorted dev2 (= 4·MAD), and the flag is the pure-integer comparison
    2·dev2 > 3·mad4 — no float ever forms, so the SQL twin is bit-free.

    Scale shape: per-block (type, hour) count partials (O(types·hours)
    per block, never O(events)), ONE type-keyed exchange; each type's
    combiner work is bounded by its calendar hour span, and the
    medians are the explicit two-middle order statistics."""
    from ..functions.hashing import fnv1a64, splitmix64
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        hr = (b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
              // 3_600_000_000)
        g = (pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "hour": hr})
             .groupby(["event_type", "hour"], as_index=False)
             .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["event_type"].to_numpy()))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby(["event_type", "hour"], as_index=False)["c"].sum()
             .astype({"c": np.int64, "hour": np.int64}))
        outs = []
        for et, t in c.groupby("event_type", sort=False):
            cs = np.sort(t["c"].to_numpy(np.int64))
            n = len(cs)
            m2 = int(cs[(n - 1) // 2]) + int(cs[n // 2])
            dev2 = np.abs(2 * t["c"].to_numpy(np.int64) - m2)
            ds_ = np.sort(dev2)
            mad4 = int(ds_[(n - 1) // 2]) + int(ds_[n // 2])
            outs.append(pd.DataFrame({
                "event_type": et, "hour": t["hour"].to_numpy(np.int64),
                "c": t["c"].to_numpy(np.int64),
                "m2": np.int64(m2), "dev2": dev2.astype(np.int64),
                "mad4": np.int64(mad4),
                "is_outlier": (2 * dev2 > 3 * mad4).astype(np.int64)}))
        if not outs:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "hour": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
                "m2": pd.Series([], dtype=np.int64),
                "dev2": pd.Series([], dtype=np.int64),
                "mad4": pd.Series([], dtype=np.int64),
                "is_outlier": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    return bucket_exchange(
        events.select_columns(["event_type", "ts"]).map_batches(
            partial, batch_format="pyarrow"),
        combine, small_partials=True)


def seasonal_decomp_orders(orders: ray.data.Dataset,
                           day_bound: int = 200_000) -> ray.data.Dataset:
    """Classical additive seasonal decomposition of the global daily
    order-count series (Macaulay 1931 / the 'decompose' textbook method):
    trend = centered 7-day moving average, seasonal = per-phase median of
    the detrended series, residual = remainder. INTEGER-exact end to end
    via scaled units (cusum/MAD recipe): trend7 = Σ window counts (7×),
    det7 = 7·x − trend7 (7×), seas14 = two-middle doubled median of det7
    per day-of-week phase (14×), resid14 = 14·x − 2·trend7 − seas14.
    Only interior days (full 7-day window) are emitted. The convenience
    ratios are ONE division of exact integers each; denominators 7/14
    cannot tie at the 6th decimal (terminating cases are dyadic-exact).

    Scale shape: per-block (day, count) partials, one day-keyed exchange;
    the per-day table is a counted driver pull (≤ ``day_bound`` — a
    calendar, not a corpus), where the decomposition is O(days)."""
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        g = (pd.DataFrame({"day": day}).groupby("day", as_index=False)
             .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(g["day"].to_numpy().astype(np.uint64))
                          % np.uint64(32)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    daily = bucket_exchange(
        orders.select_columns(["o_orderdate"]).map_batches(
            partial, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby(
            "day", as_index=False)["c"].sum().astype({"c": np.int64}),
        small_partials=True).to_pandas()
    if len(daily) > day_bound:
        raise ValueError(f"day span {len(daily)} exceeds bound {day_bound}")
    d0, d1 = int(daily["day"].min()), int(daily["day"].max())
    full = pd.DataFrame({"day": np.arange(d0, d1 + 1, dtype=np.int64)})
    full = full.merge(daily, on="day", how="left")
    x = full["c"].fillna(0).to_numpy(np.int64)
    day = full["day"].to_numpy(np.int64)
    n = len(x)
    if n < 7:
        return ray.data.from_pandas(pd.DataFrame({
            "day": pd.Series([], dtype=np.int64),
            "n_orders": pd.Series([], dtype=np.int64),
            "dow": pd.Series([], dtype=np.int64),
            "trend7": pd.Series([], dtype=np.int64),
            "seas14": pd.Series([], dtype=np.int64),
            "resid14": pd.Series([], dtype=np.int64),
            "trend_r": pd.Series([], dtype=np.float64),
            "seas_r": pd.Series([], dtype=np.float64),
            "resid_r": pd.Series([], dtype=np.float64)}))
    cs = np.concatenate([[0], np.cumsum(x)])
    trend7 = (cs[7:] - cs[:-7]).astype(np.int64)  # t = 3 .. n-4
    xi = x[3:n - 3]
    di = day[3:n - 3]
    det7 = 7 * xi - trend7
    dow = di % 7
    seas14 = np.zeros(7, np.int64)
    for d in range(7):
        v = np.sort(det7[dow == d])
        m = len(v)
        if m:
            seas14[d] = v[(m - 1) // 2] + v[m // 2]
    s14 = seas14[dow]
    resid14 = 14 * xi - 2 * trend7 - s14
    out = pd.DataFrame({
        "day": di, "n_orders": xi, "dow": dow.astype(np.int64),
        "trend7": trend7, "seas14": s14, "resid14": resid14,
        "trend_r": round_half_away(
            trend7.astype(np.float64) / np.float64(7.0), 6),
        "seas_r": round_half_away(
            s14.astype(np.float64) / np.float64(14.0), 6),
        "resid_r": round_half_away(
            resid14.astype(np.float64) / np.float64(14.0), 6)})
    return ray.data.from_pandas(out)


def simplify_trajectories(events: ray.data.Dataset,
                          tol_udeg: int = 20_000_000,
                          max_depth: int = 24,
                          num_buckets: int = 64) -> ray.data.Dataset:
    """Douglas-Peucker polyline simplification (Douglas & Peucker 1973)
    of per-user 'GPS ping' trajectories: each event gets an integer
    microdegree position derived from splitmix64(event_id) (pure-integer
    geocode — no float ever forms), the trajectory is the user's events
    in (ts, event_id) order, and DP keeps a point iff it is an endpoint
    or a split point of the recursion. All distance tests are exact
    integer comparisons: a candidate k beats others on |cross(AB, AP)|
    (squares are monotone; ties → min k) and a segment splits iff
    cross² > tol²·|AB|² (degenerate A=B segments compare |AP|² > tol²).
    The keep-set is evaluation-order independent, so the engine's DFS
    recursion equals the SQL twin's ``max_depth`` unrolled BFS rounds —
    the engine RAISES if any trajectory's split tree exceeds that depth.

    Scale shape: one user-keyed exchange; per-user work is the classic
    O(n·depth) DP with numpy argmax per segment and O(1) Python-int
    exact split tests (cross² needs int128)."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    XOR_C = np.uint64(0x9E3779B97F4A7C15)

    def prep(b: pa.Table) -> pd.DataFrame:
        eid = b["event_id"].to_numpy()
        old = np.seterr(over="ignore")
        try:
            h1 = splitmix64(eid.astype(np.uint64))
            h2 = splitmix64(h1 ^ XOR_C)
        finally:
            np.seterr(**old)
        lat = (h1 % np.uint64(180_000_001)).astype(np.int64) - 90_000_000
        lon = (h2 % np.uint64(360_000_001)).astype(np.int64) - 180_000_000
        u = b["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "u": u,
            "ts": b["ts"].to_numpy().astype("datetime64[us]")
                  .astype(np.int64),
            "eid": eid.astype(np.int64),
            "x": lon, "y": lat,
            "_part": (u % num_buckets).astype(np.int32)})

    tol2 = int(tol_udeg) ** 2

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]) \
             .sort_values(["u", "ts", "eid"], kind="mergesort")
        us, idxs, xs, ys = [], [], [], []
        for u, t in g.groupby("u", sort=False):
            x = t["x"].to_numpy(np.int64)
            y = t["y"].to_numpy(np.int64)
            n = len(x)
            keep = {0, n - 1}
            # iterative DFS over (i, j, depth); identical keep-set to BFS
            stack = [(0, n - 1, 1)]
            while stack:
                i, j, d = stack.pop()
                if j <= i + 1:
                    continue
                ax, ay, bx, by = x[i], y[i], x[j], y[j]
                kx = x[i + 1:j]
                ky = y[i + 1:j]
                dx = int(bx) - int(ax)
                dy = int(by) - int(ay)
                len2 = dx * dx + dy * dy
                if len2 == 0:
                    m = (kx - ax) ** 2 + (ky - ay) ** 2
                    kbest = int(np.argmax(m))
                    split = int(m[kbest]) > tol2
                else:
                    cross = np.abs(dx * (ky - np.int64(ay))
                                   - dy * (kx - np.int64(ax)))
                    kbest = int(np.argmax(cross))
                    split = int(cross[kbest]) ** 2 > tol2 * len2
                if split:
                    if d > max_depth:
                        # the SQL twin unrolls exactly max_depth rounds
                        raise ValueError(
                            f"DP split tree deeper than {max_depth}")
                    k = i + 1 + kbest
                    keep.add(k)
                    stack.append((i, k, d + 1))
                    stack.append((k, j, d + 1))
            ks = sorted(keep)
            us.extend([u] * len(ks))
            idxs.extend(k + 1 for k in ks)  # 1-based rank, SQL ROW_NUMBER
            xs.extend(int(x[k]) for k in ks)
            ys.extend(int(y[k]) for k in ks)
        return pd.DataFrame({
            "user_id": pd.Series(us, dtype=np.int64),
            "idx": pd.Series(idxs, dtype=np.int64),
            "lon_udeg": pd.Series(xs, dtype=np.int64),
            "lat_udeg": pd.Series(ys, dtype=np.int64)})

    return bucket_exchange(
        events.select_columns(["event_id", "ts", "user_id"]).map_batches(
            prep, batch_format="pyarrow"), combine)


def assoc_rules_events(events: ray.data.Dataset, min_support: int = 2,
                       num_buckets: int = 64) -> ray.data.Dataset:
    """Pairwise association rules X→Y over per-user event-type baskets
    (Agrawal-Srikant Apriori at itemset size 2 — the market-basket
    classic): support counts are exact integers, confidence is ONE
    division (n_xy/n_x) and lift is the fixed two-product chain
    (n_xy·N)/(n_x·n_y) mirrored by the SQL twin. Rules below
    ``min_support`` co-occurring users are pruned.

    Scale shape: per-block distinct (user, type) partials, one
    user-keyed exchange builds each basket exactly and emits its ≤ T²
    ordered pairs plus tagged singleton/user-count rows; the final
    single-bucket exchange reduces a bounded T²-row table."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def prep(b: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame({
            "u": b["user_id"].to_numpy().astype(np.int64),
            "t": b["event_type"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        d["_part"] = (d["u"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return d

    def baskets(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop(columns=["_part"]).drop_duplicates(["u", "t"])
        # pairs within each user's basket (x != y, both directions)
        m = d.merge(d, on="u")
        m = m[m["t_x"] != m["t_y"]]
        pc_ = m.groupby(["t_x", "t_y"], as_index=False).size() \
            .rename(columns={"size": "c", "t_x": "x", "t_y": "y"})
        sc = d.groupby("t", as_index=False).size() \
            .rename(columns={"size": "c", "t": "x"})
        sc["y"] = ""          # tag: singleton rows
        un = pd.DataFrame({"x": [""], "y": [""],
                           "c": [d["u"].nunique()]})  # tag: user count
        out = pd.concat([pc_, sc[["x", "y", "c"]], un], ignore_index=True)
        out["c"] = out["c"].astype(np.int64)
        out["_part"] = np.zeros(len(out), np.int32)
        return out

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_part"]).groupby(
            ["x", "y"], as_index=False)["c"].sum()
        n = np.float64(int(t.loc[(t["x"] == "") & (t["y"] == ""),
                                 "c"].sum()))
        singles = t[(t["y"] == "") & (t["x"] != "")] \
            .set_index("x")["c"]
        pairs = t[(t["x"] != "") & (t["y"] != "")].copy()
        pairs = pairs[pairs["c"] >= min_support]
        cx = np.asarray([int(singles[v]) for v in pairs["x"]], np.int64)
        cy = np.asarray([int(singles[v]) for v in pairs["y"]], np.int64)
        cxy = pairs["c"].to_numpy(np.int64)
        conf = cxy.astype(np.float64) / cx.astype(np.float64)
        lift = (cxy.astype(np.float64) * n) \
            / (cx.astype(np.float64) * cy.astype(np.float64))
        return pd.DataFrame({
            "x": pairs["x"].to_numpy(object),
            "y": pairs["y"].to_numpy(object),
            "n_xy": cxy, "n_x": cx, "n_y": cy,
            "conf_r": round_half_away(conf, 6),
            "lift_r": round_half_away(lift, 6)})

    ex1 = bucket_exchange(
        events.select_columns(["user_id", "event_type"]).map_batches(
            prep, batch_format="pyarrow"), baskets)
    return bucket_exchange(ex1, finalize, small_partials=True)


def markov_stationary_events(ds: ray.data.Dataset, iters: int = 16,
                             num_buckets: int = 64) -> ray.data.Dataset:
    """Stationary distribution of the first-order event-type Markov
    chain (power iteration on the row-normalized transition counts) in
    pure Q30 fixed-point integers — the pagerank recurrence without
    teleport: π_{t+1}(b) = Σ_a (π_t(a)·C(a,b)) // tot(a), floor
    division both sides, ``iters`` fixed rounds (exact recurrence, so
    parity holds whether or not the chain has mixed). Sink-state mass
    (types never followed) drains deterministically on both sides.

    Scale shape: the transition matrix is BOUNDED at T² rows by
    construction — the event_transitions exchanges reduce it exactly,
    the driver pulls ≤ T² rows (counted bound) and iterates a T-vector
    locally."""
    q30 = np.int64(1) << np.int64(30)
    tr = event_transitions(ds, num_buckets).to_pandas()  # ≤ T² rows
    states = np.sort(np.unique(np.concatenate(
        [tr["from_type"].to_numpy(object), tr["to_type"].to_numpy(object)])))
    sidx = {s: i for i, s in enumerate(states)}
    S = len(states)
    a = np.asarray([sidx[v] for v in tr["from_type"]], np.int64)
    b = np.asarray([sidx[v] for v in tr["to_type"]], np.int64)
    c = tr["n"].to_numpy(np.int64)
    tot = np.zeros(S, np.int64)
    np.add.at(tot, a, c)
    assert int(c.max() if len(c) else 0) < (1 << 32), "limb-split needed"
    pi = np.full(S, int(q30) // max(S, 1), np.int64)
    for _ in range(iters):
        contrib = (pi[a] * c) // tot[a]
        nxt = np.zeros(S, np.int64)
        np.add.at(nxt, b, contrib)
        pi = nxt
    from ..functions.rounding import round_half_away
    return ray.data.from_pandas(pd.DataFrame({
        "event_type": states,
        "pi_q": pi,
        "pi_r": round_half_away(pi.astype(np.float64)
                                / np.float64(q30), 9)}))


def twap_events(events: ray.data.Dataset,
                num_buckets: int = 64) -> ray.data.Dataset:
    """Time-weighted average value per (event_type, day) — the TWAP /
    interval-weighted mean of streaming finance: each observation is
    held until the next same-day observation of its type, so
    TWAP = Σ q·dt / Σ dt with q = exact integer cents and dt exact µs.
    Both sums are bounded integers at ANY scale (Σ dt ≤ 86 400·10⁶ per
    group by construction), and the TWAP is one division. The last
    observation of each (type, day) has no holding interval and is
    dropped — both sides.

    Scale shape: one (type, day)-keyed exchange of narrow quantized
    rows; per-group work is a vectorized sorted diff."""
    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def prep(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame({
            "et": b["event_type"].to_numpy(zero_copy_only=False),
            "day": ts // 86_400_000_000,
            "u": ts,
            "event_id": b["event_id"].to_numpy().astype(np.int64),
            "q": round_half_away(
                b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
            ).astype(np.int64)})
        old = np.seterr(over="ignore")
        try:
            key = splitmix64(fnv1a64(d["et"].to_numpy(object))
                             ^ d["day"].to_numpy(np.int64).astype(np.uint64))
            d["_part"] = (key % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).sort_values(
            ["et", "day", "u", "event_id"], kind="mergesort")
        et = g["et"].to_numpy(object)
        day = g["day"].to_numpy(np.int64)
        u = g["u"].to_numpy(np.int64)
        q = g["q"].to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        if len(g) > 1:
            same[:-1] = (et[:-1] == et[1:]) & (day[:-1] == day[1:])
        dt = np.zeros(len(g), np.int64)
        dt[:-1] = u[1:] - u[:-1]
        k = same
        d = pd.DataFrame({"et": et[k], "day": day[k],
                          "dt": dt[k], "wq": q[k] * dt[k]})
        o = d.groupby(["et", "day"], as_index=False).agg(
            n_obs=("dt", "size"), sum_dt=("dt", "sum"),
            sum_wq=("wq", "sum"))
        for c in ["n_obs", "sum_dt", "sum_wq"]:
            o[c] = o[c].astype(np.int64)
        o["twap_r"] = round_half_away(
            (o["sum_wq"].to_numpy(np.int64).astype(np.float64)
             / o["sum_dt"].to_numpy(np.int64).astype(np.float64)) / 100.0,
            6)
        return o.rename(columns={"et": "event_type"})

    return bucket_exchange(
        events.select_columns(["event_id", "ts", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow"), combine)


def rolling_zscore_events(events: ray.data.Dataset, window: int = 8,
                          thresh_sq: int = 9,
                          num_buckets: int = 64) -> ray.data.Dataset:
    """Per-user rolling z-score anomaly flags over the event value
    series (trailing control chart): each event with a FULL window of
    the ``window`` prior values is flagged when |x − μ| > 3σ over that
    window. INTEGER-exact via the scaled identity

        (w·x − S)² > thresh_sq · (w·S2 − S²)

    (both sides multiplied by w²·σ²'s denominator; q = exact cents) —
    no float ever forms, so SQL parity is bit-free. Only full-window
    rows are emitted.

    Scale shape: one user-keyed exchange; per-user work is a cumsum
    rolling scan."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange
    from ..functions.rounding import round_half_away

    def prep(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype(np.int64),
            "u": ts,
            "event_id": b["event_id"].to_numpy().astype(np.int64),
            "q": round_half_away(
                b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
            ).astype(np.int64)})
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(d["user_id"].to_numpy()
                                     .astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    w = int(window)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).sort_values(
            ["user_id", "u", "event_id"], kind="mergesort")
        outs = []
        for uid, t in g.groupby("user_id", sort=False):
            q = t["q"].to_numpy(np.int64)
            n = len(q)
            if n <= w:
                continue
            cs = np.concatenate([[0], np.cumsum(q)])
            cs2 = np.concatenate([[0], np.cumsum(q * q)])
            S = cs[w:n] - cs[:n - w]          # trailing w sums for i>=w
            S2 = cs2[w:n] - cs2[:n - w]
            x = q[w:]
            lhs = (w * x - S) ** 2
            rhs = thresh_sq * (w * S2 - S * S)
            outs.append(pd.DataFrame({
                "event_id": t["event_id"].to_numpy(np.int64)[w:],
                "user_id": np.full(n - w, uid, np.int64),
                "q": x, "win_s": S, "win_s2": S2,
                "is_anom": (lhs > rhs).astype(np.int64)}))
        if not outs:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "q": pd.Series([], dtype=np.int64),
                "win_s": pd.Series([], dtype=np.int64),
                "win_s2": pd.Series([], dtype=np.int64),
                "is_anom": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    return bucket_exchange(
        events.select_columns(["event_id", "ts", "user_id", "value"])
        .map_batches(prep, batch_format="pyarrow"), combine)


def capped_balance_users(events: ray.data.Dataset,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Per-user running balance floored at zero (the inventory /
    prepaid-credit recurrence b_t = max(0, b_{t−1} + δ_t)), computed in
    CLOSED FORM instead of a sequential scan: with P_t the signed prefix
    sum, b_t = P_t − min(0, min_{k≤t} P_k) — the clamp only ever binds
    at the running minimum, so one cumulative MIN window replaces the
    recurrence (exact integers; SQL twin uses the same identity).
    δ = +cents for 'purchase' events, −cents otherwise.

    Scale shape: one user-keyed exchange, vectorized cumsum/cummin per
    user."""
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def prep(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        q = round_half_away(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        d = pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype(np.int64),
            "u": ts,
            "event_id": b["event_id"].to_numpy().astype(np.int64),
            "delta": np.where(et == "purchase", q, -q)})
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(d["user_id"].to_numpy()
                                     .astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).sort_values(
            ["user_id", "u", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        dl = g["delta"].to_numpy(np.int64)
        gb = pd.DataFrame({"u": uid, "d": dl}).groupby("u", sort=False)
        P = gb["d"].cumsum().to_numpy(np.int64)
        runmin = pd.DataFrame({"u": uid, "p": P}).groupby(
            "u", sort=False)["p"].cummin().to_numpy(np.int64)
        bal = P - np.minimum(runmin, 0)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid, "delta": dl, "prefix": P,
            "balance": bal})

    return bucket_exchange(
        events.select_columns(["event_id", "ts", "user_id",
                               "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow"), combine)


def ewma_daily_orders(orders: ray.data.Dataset, n_lags: int = 30,
                      day_bound: int = 200_000) -> ray.data.Dataset:
    """Windowed EWMA of the global DAILY order-count series with
    alpha = 1/2 capped at ``n_lags`` lags (the model-monitoring smooth
    next to acf_daily_orders): s_d = sum_{k=0..L-1} x_{d-k} * 2^-(k+1),
    missing days inside the span count 0 and days before the span do
    not contribute (truncated-window convention — documented so the
    SQL twin states the same sum). Every term is count * 2^-(k+1),
    an exact dyadic with mantissa span <= log2(max_count) + L bits,
    so for max_count < 2^22 the per-day sum is EXACT in any summation
    order — no float-order hazard crosses the oracle.

    Scale shape: per-block (day, count) partials through one day-keyed
    exchange (acf pattern); only the per-DAY table reaches the driver
    (counted <= ``day_bound`` — a day span is a calendar, not a
    corpus), where the window convolution is one vectorized pass."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        g = (pd.DataFrame({"day": day}).groupby("day", as_index=False)
             .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(g["day"].to_numpy().astype(np.uint64))
                          % np.uint64(32)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    daily = bucket_exchange(
        orders.select_columns(["o_orderdate"]).map_batches(
            partial, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby(
            "day", as_index=False)["c"].sum().astype({"c": np.int64}),
        small_partials=True).to_pandas()
    if len(daily) > day_bound:
        raise ValueError(f"day span {len(daily)} exceeds bound {day_bound}")
    d0, d1 = int(daily["day"].min()), int(daily["day"].max())
    full = pd.DataFrame({"day": np.arange(d0, d1 + 1, dtype=np.int64)})
    full = full.merge(daily, on="day", how="left")
    x = full["c"].fillna(0).to_numpy(np.int64)
    assert int(x.max()) < 2 ** 22, "dyadic-exactness bound exceeded"
    xf = x.astype(np.float64)
    s = np.zeros(len(xf), np.float64)
    for k in range(n_lags):          # L fixed small: L exact shifted adds
        w = 2.0 ** -(k + 1)
        s[k:] += xf[:len(xf) - k if k else None] * w
    return ray.data.from_pandas(pd.DataFrame({
        "day": full["day"].to_numpy(np.int64),
        "cnt": x, "ewma": s}))


def survival_gaps_users(events: ray.data.Dataset, num_buckets: int = 64,
                        step_bound: int = 1_000_000) -> ray.data.Dataset:
    """Kaplan-Meier risk table (Kaplan & Meier 1958) over user
    inter-event gaps in whole MINUTES — the churn / return-time survival
    screen: each consecutive-event gap is an observed EVENT duration,
    and each user's open tail (corpus max ts − last event) is a
    CENSORED duration (a user's next return hasn't happened yet).
    Emits one row per distinct duration with >= 1 event:
      t_min   — duration (minutes, floor),
      d       — events at exactly t,
      n       — at-risk count (observations with duration >= t),
      factor_q20 — floor((n−d)/n * 2^20 + 0.5): the KM step factor on a
    2^20 integer grid. Tie-freeness: (n−d)/n = k/n with n < 2^21, so
    k*2^20/n + 1/2 can never be an integer (the odd-half would need
    v2(n) > 21) — the quantization is provably stable, and the survival
    curve is the reader's cumulative product of factors.

    Scale shape: gaps need per-user co-location → ONE O(dataset)
    bucketed exchange of narrow (user, ts) rows (event_gaps shape,
    small_partials False); per-bucket combiners emit (dur, is_event)
    COUNT partials, a second tiny exchange sums them, and only the
    distinct-duration histogram reaches the driver (counted <=
    ``step_bound``) for the suffix-sum finalize."""
    mx = events.select_columns(["ts"]).map_batches(
        lambda b: pd.DataFrame({"m": [int(
            b["ts"].to_numpy().astype("datetime64[us]")
            .astype(np.int64).max())]}),
        batch_format="pyarrow").to_pandas()
    max_us = int(mx["m"].max())

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ks = g["user_id"].to_numpy(np.int64)
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        last = np.zeros(len(g), bool)
        if len(g):
            last[:-1] = ks[1:] != ks[:-1]
            last[-1] = True
        gap = np.empty(len(g), np.int64)
        if len(g):
            gap[:-1] = us[1:] - us[:-1]
        gap[last] = max_us - us[last]        # censored open tail
        f = pd.DataFrame({"dur": gap // 60_000_000,
                          "ev": (~last).astype(np.int64)})
        h = f.groupby(["dur", "ev"], as_index=False).size().rename(
            columns={"size": "c"})
        h["c"] = h["c"].astype(np.int64)
        h["_part"] = (h["dur"].to_numpy(np.int64) % 16).astype(np.int32)
        return h

    hist = bucket_exchange(
        bucket_exchange(
            _bucket_by_key(events.select_columns(["user_id", "ts"]),
                           "user_id", num_buckets),
            per_bucket, key="_bkt"),
        lambda g: g.drop(columns=["_part"]).groupby(
            ["dur", "ev"], as_index=False)["c"].sum().astype({"c": np.int64}),
        small_partials=True).to_pandas()
    if len(hist) > step_bound:
        raise ValueError(f"distinct durations {len(hist)} > {step_bound}")
    hist = hist.sort_values("dur", kind="mergesort")
    durs = np.unique(hist["dur"].to_numpy(np.int64))
    tot = hist.groupby("dur")["c"].sum().reindex(durs, fill_value=0) \
        .to_numpy(np.int64)
    d = hist[hist["ev"] == 1].groupby("dur")["c"].sum() \
        .reindex(durs, fill_value=0).to_numpy(np.int64)
    n = tot[::-1].cumsum()[::-1]             # suffix sum: at-risk counts
    assert int(n.max()) < 2 ** 21, "factor_q20 tie-freeness bound"
    keep = d > 0
    nk, dk = n[keep], d[keep]
    fq = np.floor((nk - dk).astype(np.float64) / nk.astype(np.float64)
                  * 1048576.0 + 0.5).astype(np.int64)
    return ray.data.from_pandas(pd.DataFrame({
        "t_min": durs[keep], "d": dk, "n": nk, "factor_q20": fq}))


def bootstrap_ci_orders(orders: ray.data.Dataset, n_boot: int = 200,
                        day_bound: int = 200_000) -> ray.data.Dataset:
    """Deterministic bootstrap of mean DAILY revenue (Efron 1979, with
    splitmix64 counter draws instead of an RNG stream — the id-hash
    sampling rule from CLAUDE round-2: reproducible across any cluster
    or block structure): replicate b resamples the D-day revenue series
    with replacement via idx = splitmix64(b*D + i) mod D, i = 0..D-1,
    and emits its mean in exact integer cents — the empirical quantiles
    of the ``n_boot`` means are the CI. Missing days inside the span
    count as 0 revenue. Every replicate sum is exact int64 (cents), the
    ONE division per replicate is bit-identical to the SQL twin.

    Scale shape: per-day cent sums through one day-keyed exchange
    (acf pattern); only the day table (counted <= ``day_bound``) and
    the fixed n_boot x D draw grid touch the driver."""
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        v = b["o_totalprice"].to_numpy().astype(np.float64)
        cents = (np.floor(np.abs(v) * 100.0 + 0.5)
                 * np.sign(v)).astype(np.int64)
        g = pd.DataFrame({"day": day, "cents": cents}).groupby(
            "day", as_index=False)["cents"].sum()
        g["cents"] = g["cents"].astype(np.int64)
        g["_part"] = (g["day"].to_numpy(np.int64) % 32).astype(np.int32)
        return g

    daily = bucket_exchange(
        orders.select_columns(["o_orderdate", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby(
            "day", as_index=False)["cents"].sum()
        .astype({"cents": np.int64}),
        small_partials=True).to_pandas()
    if len(daily) > day_bound:
        raise ValueError(f"day span {len(daily)} exceeds bound {day_bound}")
    d0, d1 = int(daily["day"].min()), int(daily["day"].max())
    spine = pd.DataFrame({"day": np.arange(d0, d1 + 1, dtype=np.int64)})
    spine = spine.merge(daily, on="day", how="left")
    cents = spine["cents"].fillna(0).to_numpy(np.int64)
    D = len(cents)
    ctr = np.arange(n_boot * D, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        idx = (splitmix64(ctr) % np.uint64(D)).astype(np.int64)
    finally:
        np.seterr(**old)
    sums = cents[idx].reshape(n_boot, D).sum(axis=1)
    mean_r = round_half_away(
        sums.astype(np.float64) / np.float64(D), 6)
    return ray.data.from_pandas(pd.DataFrame({
        "b": np.arange(n_boot, dtype=np.int64),
        "n_days": np.full(n_boot, D, np.int64),
        "sum_cents": sums.astype(np.int64),
        "mean_cents_r": mean_r}))


def changepoint_daily_orders(orders: ray.data.Dataset,
                             day_bound: int = 200_000) -> ray.data.Dataset:
    """Single change-point detection on the global DAILY order-count
    series (binary segmentation step 1, Scott & Knott / CUSUM-SSE
    form): the boundary day i (left block = days <= i) minimizing the
    two-segment SSE, equivalently maximizing the exact integer gain
    pair (S_L^2*n_R + S_R^2*n_L, n_L*n_R), ranked by its ONE raw f64
    division with smaller-day tiebreak — the gbm_stumps gain_f recipe.
    Emits the full scan trace: one row per candidate boundary with the
    exact prefix aggregates, gain_f, and is_best.

    Scale shape: per-block (day, count) partials + one tiny exchange
    (acf pattern); the scan touches only the day table (counted <=
    ``day_bound``)."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        g = (pd.DataFrame({"day": day}).groupby("day", as_index=False)
             .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(g["day"].to_numpy().astype(np.uint64))
                          % np.uint64(32)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    daily = bucket_exchange(
        orders.select_columns(["o_orderdate"]).map_batches(
            partial, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby(
            "day", as_index=False)["c"].sum().astype({"c": np.int64}),
        small_partials=True).to_pandas()
    if len(daily) > day_bound:
        raise ValueError(f"day span {len(daily)} exceeds bound {day_bound}")
    d0, d1 = int(daily["day"].min()), int(daily["day"].max())
    spine = pd.DataFrame({"day": np.arange(d0, d1 + 1, dtype=np.int64)})
    spine = spine.merge(daily, on="day", how="left")
    x = spine["c"].fillna(0).to_numpy(np.int64)
    nt, st = len(x), int(x.sum())
    rows = []
    n_l = s_l = 0
    best = None
    for i, v in enumerate(x[:-1]):        # boundary after day index i
        n_l += 1
        s_l += int(v)
        n_r, s_r = nt - n_l, st - s_l
        gnum = s_l * s_l * n_r + s_r * s_r * n_l
        gden = n_l * n_r
        assert gnum < 2 ** 105
        fd = float(gnum) / float(gden)
        day = int(spine["day"].iloc[i])
        rows.append([day, n_l, s_l, n_r, s_r, fd])
        if best is None or fd > best[1]:
            best = (day, fd)
    out = pd.DataFrame(rows, columns=["day", "n_l", "s_l", "n_r", "s_r",
                                      "gain_f"])
    for c in ("day", "n_l", "s_l", "n_r", "s_r"):
        out[c] = out[c].astype(np.int64)
    out["is_best"] = (out["day"] == best[0]).astype(np.int64)
    return ray.data.from_pandas(out)


def traj_intersections_users(events: ray.data.Dataset,
                             num_buckets: int = 64) -> ray.data.Dataset:
    """Per-user trajectory self-intersection count — the sweep/quality
    metric of the GPS-track family (same synthetic microdegree pings and
    (ts, event_id) ordering as simplify_trajectories): for every pair of
    NON-ADJACENT segments (j ≥ i+2), count PROPER crossings via the four
    exact-integer orientation tests (o1·o2 < 0 AND o3·o4 < 0 — collinear
    touches deliberately don't count, so no epsilon exists anywhere).
    Coordinates are ±1.8e8 microdegrees: every cross product is
    ≤ 2.6e17, exact in int64 on both sides.

    Scale shape: one user-keyed exchange (narrow int rows); the combiner
    vectorizes all O(n²) segment pairs per user with one triu broadcast
    — no per-pair Python. Output: (user_id, n_points, n_segments,
    n_crossings)."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    XOR_C = np.uint64(0x9E3779B97F4A7C15)

    def prep(b: pa.Table) -> pd.DataFrame:
        eid = b["event_id"].to_numpy()
        old = np.seterr(over="ignore")
        try:
            h1 = splitmix64(eid.astype(np.uint64))
            h2 = splitmix64(h1 ^ XOR_C)
        finally:
            np.seterr(**old)
        lat = (h1 % np.uint64(180_000_001)).astype(np.int64) - 90_000_000
        lon = (h2 % np.uint64(360_000_001)).astype(np.int64) - 180_000_000
        u = b["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "u": u,
            "ts": b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            "eid": eid.astype(np.int64), "x": lon, "y": lat,
            "_part": (u % num_buckets).astype(np.int32)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]) \
             .sort_values(["u", "ts", "eid"], kind="mergesort")
        out = {"user_id": [], "n_points": [], "n_segments": [],
               "n_crossings": []}
        for u, t in g.groupby("u", sort=False):
            x = t["x"].to_numpy(np.int64)
            y = t["y"].to_numpy(np.int64)
            n = len(x)
            nseg = max(n - 1, 0)
            cnt = 0
            if nseg >= 3:
                ax, ay = x[:-1], y[:-1]
                bx, by = x[1:], y[1:]
                ii, jj = np.triu_indices(nseg, k=2)
                a1x, a1y = ax[ii], ay[ii]
                b1x, b1y = bx[ii], by[ii]
                c1x, c1y = ax[jj], ay[jj]
                d1x, d1y = bx[jj], by[jj]
                r1x, r1y = b1x - a1x, b1y - a1y
                r2x, r2y = d1x - c1x, d1y - c1y
                o1 = r1x * (c1y - a1y) - r1y * (c1x - a1x)
                o2 = r1x * (d1y - a1y) - r1y * (d1x - a1x)
                o3 = r2x * (a1y - c1y) - r2y * (a1x - c1x)
                o4 = r2x * (b1y - c1y) - r2y * (b1x - c1x)
                proper = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) \
                    & (((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0)))
                cnt = int(proper.sum())
            out["user_id"].append(int(u))
            out["n_points"].append(n)
            out["n_segments"].append(nseg)
            out["n_crossings"].append(cnt)
        return pd.DataFrame({k: np.asarray(v, np.int64)
                             for k, v in out.items()})

    parted = events.select_columns(["user_id", "ts", "event_id"]) \
        .map_batches(prep, batch_format="pyarrow")
    return bucket_exchange(parted, combine)


def attribution_events(ds: ray.data.Dataset, horizon_days: int = 7,
                       touch_types: tuple[str, ...] = ("click", "view"),
                       conv_type: str = "purchase",
                       num_buckets: int = 64) -> ray.data.Dataset:
    """First/last-touch attribution (the standard marketing-analytics
    join every conversion pipeline runs): for each ``conv_type`` event,
    the first and last ``touch_types`` event of the same user inside
    [ts − horizon, ts) plus the touch count — ties on equal timestamps
    break by event_id on both ends, exactly the SQL twin's
    FIRST/LAST(... ORDER BY ts, event_id). One user-bucketed exchange;
    inside each bucket the window lookups are TWO ``pd.merge_asof``
    passes (backward at ts−1µs for the last touch, forward at
    ts−horizon for the first) plus a per-user running touch counter —
    all C-vectorized, no per-user Python loop, no row explosion (the
    SQL LEFT JOIN materializes every (purchase, touch) pair; the
    engine never does). Purchases with no in-window touch report
    n_touches = 0 and ids −1."""
    from ..functions.rounding import round_half_away

    usec = np.int64(horizon_days) * 86_400_000_000

    def part(b: pd.DataFrame) -> pd.DataFrame:
        old = np.seterr(over="ignore")
        try:
            uh = splitmix64(b["user_id"].to_numpy(np.int64).astype(np.uint64))
        finally:
            np.seterr(**old)
        keep = b["event_type"].isin(list(touch_types) + [conv_type])
        b = b.loc[keep, ["event_id", "ts", "user_id", "event_type",
                         "value"]].copy()
        b["_part"] = (uh[keep.to_numpy()] % np.uint64(num_buckets)) \
            .astype(np.int32)
        return b

    def attrib(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        g = g.assign(_ts=ts).sort_values(["_ts", "event_id"],
                                         kind="mergesort")
        t = g[g["event_type"].isin(touch_types)].copy()
        p = g[g["event_type"] == conv_type].copy()
        if not len(p):
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "cents": pd.Series([], dtype=np.int64),
                "n_touches": pd.Series([], dtype=np.int64),
                "first_touch_id": pd.Series([], dtype=np.int64),
                "last_touch_id": pd.Series([], dtype=np.int64)})
        t["_seq"] = t.groupby("user_id", sort=False).cumcount() \
            .to_numpy(np.int64)
        tt = t[["_ts", "user_id", "event_id", "_seq"]]
        pb = p[["_ts", "user_id", "event_id"]].copy()
        pb["_bk"] = pb["_ts"] - 1
        pf = pb.copy()
        pf["_fw"] = pb["_ts"] - usec
        last = pd.merge_asof(
            pb.sort_values("_bk", kind="mergesort"), tt,
            left_on="_bk", right_on="_ts", by="user_id",
            direction="backward", suffixes=("", "_t"))
        first = pd.merge_asof(
            pf.sort_values("_fw", kind="mergesort"), tt,
            left_on="_fw", right_on="_ts", by="user_id",
            direction="forward", suffixes=("", "_t"))
        last = last.set_index("event_id")
        first = first.set_index("event_id")
        pid = p["event_id"].to_numpy(np.int64)
        s_last = last["_seq"].reindex(pid)
        s_first = first["_seq"].reindex(pid)
        n = (s_last - s_first + 1).fillna(0).to_numpy(np.int64)
        n = np.maximum(n, 0)
        has = n > 0
        fid = np.where(has, first["event_id_t"].reindex(pid)
                       .fillna(-1).to_numpy(np.int64), -1)
        lid = np.where(has, last["event_id_t"].reindex(pid)
                       .fillna(-1).to_numpy(np.int64), -1)
        cents = round_half_away(p["value"].to_numpy(np.float64) * 100.0,
                                0).astype(np.int64)
        return pd.DataFrame({
            "event_id": pid, "user_id": p["user_id"].to_numpy(np.int64),
            "cents": cents, "n_touches": np.where(has, n, 0),
            "first_touch_id": fid, "last_touch_id": lid})

    return bucket_exchange(ds.map_batches(part, batch_format="pandas"),
                           attrib)


_FUNNEL_CODES = {"signup": "s", "click": "c", "error": "e",
                 "view": "v", "purchase": "p"}


def regex_funnel_events(ds: ray.data.Dataset,
                        num_buckets: int = 64) -> ray.data.Dataset:
    """MATCH_RECOGNIZE-lite sequence-pattern matching (the SQL:2016 row
    pattern engine, restated as regexes over per-user event-code strings
    — the standard trick for funnel mining on an engine without a native
    pattern operator): each user's events collapse to a code string in
    (ts, event_id) order, then compiled regexes count non-overlapping
    matches of the view->purchase funnel (``v+p``) and the error-recovery
    pattern (``e+[cv]``); the longest consecutive view run comes from a
    vectorized run-length scan of the same sorted frame (no per-row
    Python). One user-keyed exchange co-locates each user's narrow rows;
    all downstream work is per-bucket vectorized pandas."""
    import re

    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    pat_funnel = re.compile("v+p")
    pat_retry = re.compile("e+[cv]")

    def prep(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype(np.int64),
            "code": b["event_type"].to_pandas().map(_FUNNEL_CODES)
            .to_numpy(object),
            "u": ts,
            "event_id": b["event_id"].to_numpy().astype(np.int64)})
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(d["user_id"].to_numpy()
                                     .astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "u", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        code = g["code"].to_numpy(object)
        seq = pd.Series(code, index=uid).groupby(level=0, sort=True) \
            .agg("".join)
        n_funnel = seq.str.count(pat_funnel)
        n_retry = seq.str.count(pat_retry)
        # longest view run: run-length encode the sorted (user, code) scan
        isv = code == "v"
        newrun = np.empty(len(g), bool)
        newrun[0] = True
        newrun[1:] = (uid[1:] != uid[:-1]) | (code[1:] != code[:-1])
        rid = np.cumsum(newrun)
        rl = pd.Series(np.ones(len(g), np.int64)).groupby(rid).transform(
            "size").to_numpy(np.int64)
        vrun = pd.Series(np.where(isv, rl, 0), index=uid) \
            .groupby(level=0, sort=True).max()
        return pd.DataFrame({
            "user_id": seq.index.to_numpy(np.int64),
            "n_events": seq.str.len().to_numpy(np.int64),
            "n_funnel": n_funnel.to_numpy(np.int64),
            "n_retry": n_retry.to_numpy(np.int64),
            "max_view_run": vrun.reindex(seq.index).to_numpy(np.int64)})

    return bucket_exchange(ds.map_batches(prep, batch_format="pyarrow"),
                           per_user)


def json_props_events(ds: ray.data.Dataset,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Semi-structured property extraction (the JSON-parsing map every
    event pipeline runs on its props blob): pull the integer ``k`` field
    with one compiled regex (vectorized str.extract — engine and twin
    share the exact pattern so malformed rows fail identically to NULL),
    then aggregate per event type: rows, parse failures, sum / min / max
    of k, and the exact distinct k count. Distinct counting rides the
    same (type, k)-keyed exchange as the counts — no second pass over
    the raw rows."""
    from .exchange import bucket_exchange
    from ..functions.hashing import fnv1a64, splitmix64

    def prep(b: pa.Table) -> pd.DataFrame:
        props = b["props"].to_pandas()
        k = props.str.extract(r'"k": (-?\d+)', expand=False)
        ok = k.notna()
        kv = pd.Series(np.where(ok, k.fillna("0"), "0")).astype(np.int64)
        d = pd.DataFrame({
            "et": b["event_type"].to_pandas().to_numpy(object),
            "k": kv,
            "ok": ok.to_numpy().astype(np.int64)})
        g = d.groupby(["et", "k", "ok"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["et"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).groupby(
            ["et", "k", "ok"], as_index=False)["n"].sum()
        okg = g[g["ok"] == 1]
        out = g.groupby("et", as_index=False).agg(n_rows=("n", "sum"))
        fails = g[g["ok"] == 0].groupby("et", as_index=False) \
            .agg(n_bad=("n", "sum"))
        st = okg.assign(kw=okg["k"] * okg["n"]).groupby(
            "et", as_index=False).agg(
            sum_k=("kw", "sum"), min_k=("k", "min"), max_k=("k", "max"),
            nd_k=("k", "size"))
        out = out.merge(fails, on="et", how="left") \
            .merge(st, on="et", how="left")
        out["n_bad"] = out["n_bad"].fillna(0)
        for c in ("n_rows", "n_bad", "sum_k", "min_k", "max_k", "nd_k"):
            out[c] = out[c].fillna(0).astype(np.int64)
        return out

    return bucket_exchange(ds.map_batches(prep, batch_format="pyarrow"),
                           combine)


def hopping_distinct_users(events: ray.data.Dataset, ts_col: str = "ts",
                           user_col: str = "user_id",
                           window_hours: int = 2, hop_hours: int = 1,
                           num_buckets: int = 64) -> ray.data.Dataset:
    """Distinct users per hopping window — the COUNT(DISTINCT) streaming
    aggregate (hopping_window counts events; distinctness can't
    pre-aggregate as a sum): the map side explodes each event into its
    ``window/hop`` windows and emits DISTINCT (win_start, user) pairs
    per batch, so a hot user contributes ≤ #blocks × n_wins rows instead
    of per-event rows; one window-keyed exchange dedups globally and
    counts. Exact — the HLL variant (hll_users_by_type) is the sketch
    path when the per-window user set itself is the scale problem."""
    from .exchange import bucket_exchange
    from ..functions.hashing import splitmix64

    n_wins = window_hours // hop_hours

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        h = b[ts_col].dt.floor(f"{hop_hours}h")
        frames = [pd.DataFrame({
            "win_start": (h - pd.Timedelta(hours=k * hop_hours))
            .to_numpy("datetime64[us]"),
            user_col: b[user_col].to_numpy(np.int64),
        }) for k in range(n_wins)]
        d = pd.concat(frames, ignore_index=True).drop_duplicates()
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(
                d["win_start"].to_numpy("datetime64[us]").view(np.int64)
                .astype(np.uint64))
                % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.drop(columns=["_part"]).drop_duplicates()
             .groupby("win_start", sort=False).size().rename("n_users")
             .reset_index())
        c["n_users"] = c["n_users"].astype(np.int64)
        c["win_start"] = c["win_start"].to_numpy("datetime64[us]")
        return c

    return bucket_exchange(
        events.select_columns([ts_col, user_col]).map_batches(
            explode, batch_format="pandas"),
        count_distinct)


def bearing_octants(events: ray.data.Dataset,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Per-user movement bearing histogram over the integer 'GPS ping'
    trajectories (the simplify_trajectories position derivation): each
    consecutive step in (ts, event_id) order yields an exact integer
    displacement (dx, dy), binned by the canny octant rule ((dy ≥ 0)·4 +
    (dx ≥ 0)·2 + (|dy| > |dx|)) — cross-multiplication-exact, no atan2
    (transcendental parity rule). One user-keyed exchange; per-bucket
    vectorized LAG scan. Output: (user_id, sector, n_steps)."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    XOR_C = np.uint64(0x9E3779B97F4A7C15)

    def prep(b: pa.Table) -> pd.DataFrame:
        eid = b["event_id"].to_numpy()
        old = np.seterr(over="ignore")
        try:
            h1 = splitmix64(eid.astype(np.uint64))
            h2 = splitmix64(h1 ^ XOR_C)
            part = (splitmix64(b["user_id"].to_numpy().astype(np.uint64))
                    % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        # the simplify_trajectories integer-microdegree derivation, verbatim
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype(np.int64),
            "ts": b["ts"].to_numpy().astype("datetime64[us]"),
            "event_id": eid.astype(np.int64),
            "x": (h2 % np.uint64(360_000_001)).astype(np.int64) - 180_000_000,
            "y": (h1 % np.uint64(180_000_001)).astype(np.int64) - 90_000_000,
            "_part": part})

    def octants(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        same = np.r_[False, u[1:] == u[:-1]]
        dx = np.r_[0, x[1:] - x[:-1]][same]
        dy = np.r_[0, y[1:] - y[:-1]][same]
        uu = u[same]
        sec = ((dy >= 0).astype(np.int64) * 4
               + (dx >= 0).astype(np.int64) * 2
               + (np.abs(dy) > np.abs(dx)).astype(np.int64))
        out = pd.DataFrame({"user_id": uu, "sector": sec})
        c = out.groupby(["user_id", "sector"], sort=False).size() \
               .rename("n_steps").reset_index()
        c["n_steps"] = c["n_steps"].astype(np.int64)
        return c

    return bucket_exchange(
        events.select_columns(["event_id", "ts", "user_id"]).map_batches(
            prep, batch_format="pyarrow"),
        octants)


def ucb_replay_events(events: ray.data.Dataset,
                      num_buckets: int = 32) -> ray.data.Dataset:
    """Off-policy bandit evaluation by UCB1 replay (Auer et al. 2002
    policy; Li et al. 2011 replay estimator): arms are event types,
    rounds are DAYS; each round the policy picks the arm maximizing
    mean + sqrt(2·ln t / n) over the REPLAYED stats, and only that
    day's logged events of the chosen arm update the stats (unseen arms
    first, smallest arm index). The distributed part is the (day, arm)
    aggregate (counted: days × arms rows through one exchange); the
    replay recursion is driver-side over that counted table — and the
    SQL twin unrolls the same ≤31 rounds with the ln(t) literals inlined
    from ONE Python computation (ln is not cross-engine bit-exact;
    sqrt of an identical operand is). Values are exact cents; the UCB
    comparison is a bit-identical f64 chain. Output per round:
    (day_idx, arm, n_after, s_after)."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy("datetime64[us]").view(np.int64)
               // 86_400_000_000)
        c = round_half_away(b["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        d = pd.DataFrame({"day": day, "arm": b["event_type"].to_numpy(object),
                          "n": np.int64(1), "s": c})
        g = d.groupby(["day", "arm"], sort=False, as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        g["s"] = g["s"].astype(np.int64)
        g["_part"] = (g["day"].to_numpy(np.int64) % num_buckets).astype(np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["day", "arm"], sort=False, as_index=False)[["n", "s"]].sum()
        c["n"] = c["n"].astype(np.int64)
        c["s"] = c["s"].astype(np.int64)
        return c

    tbl = bucket_exchange(
        events.select_columns(["ts", "event_type", "value"]).map_batches(
            partial, batch_format="pandas"),
        combine, small_partials=True).to_pandas()  # ≤ days×arms counted rows

    days = np.sort(tbl["day"].unique())
    arms = sorted(tbl["arm"].unique())
    log = {(int(r.day), r.arm): (int(r.n), int(r.s)) for r in tbl.itertuples()}
    n = {a: 0 for a in arms}
    s = {a: 0 for a in arms}
    rows = []
    for t, day in enumerate(days, start=1):
        unseen = [a for a in arms if n[a] == 0]
        if unseen:
            pick = unseen[0]
        else:
            lnt = np.float64(np.log(np.float64(t)))  # literal-inlined in SQL
            best = None
            for a in arms:
                ucb = (np.float64(s[a]) / np.float64(n[a])
                       + np.sqrt(np.float64(2.0) * lnt / np.float64(n[a])))
                if best is None or ucb > best[0]:
                    best = (ucb, a)
            pick = best[1]
        dn, dsum = log.get((int(day), pick), (0, 0))
        n[pick] += dn
        s[pick] += dsum
        rows.append({"day_idx": np.int64(t), "arm": pick,
                     "n_after": np.int64(n[pick]), "s_after": np.int64(s[pick])})
    out = pd.DataFrame(rows)
    out["day_idx"] = out["day_idx"].astype(np.int64)
    out["n_after"] = out["n_after"].astype(np.int64)
    out["s_after"] = out["s_after"].astype(np.int64)
    return ray.data.from_pandas(out)


def dtw_pairs_users(events: ray.data.Dataset, n_users: int = 8,
                    max_len: int = 12,
                    driver_bound: int = 100_000) -> ray.data.Dataset:
    """Dynamic-time-warping distance between user trajectories (the
    classic O(n·m) alignment DP; Sakoe & Chiba 1978) for every pair of
    the first ``n_users`` users, trajectories truncated to ``max_len``
    pings — the similarity kernel trajectory clustering builds on.

    Positions are the dp_simplify integer-microdegree geocode; cost is
    the exact int64 L1 distance, so the whole DP is integer and the SQL
    twin unrolls it as anti-diagonal wavefront CTEs (dp cells with
    i+j = k depend only on wavefronts k−1 and k−2).

    The pair set is COUNTED (n_users·max_len rows after per-user
    truncation): the filtered pull is asserted under ``driver_bound``
    rows before it happens — at gazetteer scale the same DP runs inside
    a pair-keyed ``map_groups`` over a co-located pair exchange (the
    fuzzy_name_pairs shape); this operator takes the counted path
    because its pair set is fixed by construction."""
    from ..functions.hashing import splitmix64

    XOR_C = np.uint64(0x9E3779B97F4A7C15)
    filt = events.filter(expr=f"user_id < {n_users}")
    n_rows = filt.count()
    assert n_rows <= driver_bound, (n_rows, driver_bound)
    df = filt.to_pandas()
    eid = df["event_id"].to_numpy().astype(np.int64)
    old = np.seterr(over="ignore")
    try:
        h1 = splitmix64(eid.astype(np.uint64))
        h2 = splitmix64(h1 ^ XOR_C)
    finally:
        np.seterr(**old)
    df = pd.DataFrame({
        "u": df["user_id"].to_numpy(np.int64),
        "ts": df["ts"].to_numpy("datetime64[us]").astype(np.int64),
        "eid": eid,
        "x": (h2 % np.uint64(360_000_001)).astype(np.int64) - 180_000_000,
        "y": (h1 % np.uint64(180_000_001)).astype(np.int64) - 90_000_000,
    }).sort_values(["u", "ts", "eid"])
    trajs = {int(u): g[["x", "y"]].to_numpy(np.int64)[:max_len]
             for u, g in df.groupby("u", sort=True)}

    def dtw(A: np.ndarray, B: np.ndarray) -> int:
        n, m = len(A), len(B)
        INF = 1 << 62
        dp = np.full((n + 1, m + 1), INF, np.int64)
        dp[0, 0] = 0
        cost = (np.abs(A[:, None, 0] - B[None, :, 0])
                + np.abs(A[:, None, 1] - B[None, :, 1]))
        for i in range(1, n + 1):
            dp[i, 1:] = cost[i - 1]  # filled below with the running min
            run = np.minimum(dp[i - 1, 1:], dp[i - 1, :-1])
            for j in range(1, m + 1):
                dp[i, j] = cost[i - 1, j - 1] + min(
                    int(run[j - 1]), int(dp[i, j - 1]))
        return int(dp[n, m])

    rows = []
    us = sorted(trajs)
    for a in range(len(us)):
        for b in range(a + 1, len(us)):
            A, B = trajs[us[a]], trajs[us[b]]
            rows.append({"u1": us[a], "u2": us[b],
                         "n1": len(A), "n2": len(B),
                         "dtw": dtw(A, B)})
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def interval_schedule_users(events: ray.data.Dataset, cap: int = 24,
                            num_buckets: int = 64) -> ray.data.Dataset:
    """Activity-selection (greedy interval scheduling, the classic
    exchange-argument optimum): per user, the maximum number of
    non-overlapping event intervals — interval = [ts, ts + dur) with
    dur = (event_id % 7 + 1) minutes (deterministic integer payload),
    considering each user's first ``cap`` intervals by (end, start)
    order so the SQL twin's greedy unroll is bounded by ``cap`` rounds.

    Greedy-by-earliest-end is optimal and, on end ties, every choice
    shares the same next ``last_end`` — so the pick COUNT is
    deterministic without a tie rule. One user-keyed bucket exchange;
    the per-user greedy scan is the sequential part (O(cap) per user),
    run inside the combiner."""
    from .exchange import bucket_exchange

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy(np.int64)
        s = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        dur = (eid % 7 + 1) * 60_000_000
        u = b["user_id"].to_numpy(np.int64)
        return pd.DataFrame({"u": u, "s": s, "e": s + dur,
                             "_part": (u % num_buckets).astype(np.int32)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for u, fr in g.sort_values(["u", "e", "s"]).groupby("u", sort=False):
            iv = fr[["s", "e"]].to_numpy(np.int64)[:cap]
            last_end = -(1 << 62)
            n = 0
            for s, e in iv:  # sequential by definition (greedy chain)
                if s >= last_end:
                    n += 1
                    last_end = e
            rows.append({"u": int(u), "n_scheduled": n,
                         "n_intervals": len(iv)})
        out = pd.DataFrame(rows)
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    return bucket_exchange(
        events.map_batches(prep, batch_format="pandas"), combine)
