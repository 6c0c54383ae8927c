"""Grouped aggregation engine — zonal_stats / tile aggregation, Ray-first.

Reference semantics: ``shape.zonal_stats`` stat dispatch (shape.py:1023-1068
mean/min/max/median/std/sum/count/var/skew/kurt/mode), ``zonal_stats_all``
(shape.py:1323), ``zonal_frac`` grouped value-counts (shape.py:1092),
``temporal_comp``/``stat_comp`` depth stats (raster.py:2287,2410), RMSE
(learning.py:1828).

Scale design (SURVEY.md §4 "skew"):

- **Partial pre-aggregation (combiner).** Every decomposable stat is
  computed from per-batch moment partials (n, Σx, Σx², min, max) emitted by
  a vectorized ``map_batches`` groupby — the all-to-all shuffle then moves
  one row per (key, input-block), not one per input row. A Zipf-hot cell
  contributes ≤ #blocks partial rows instead of millions of raw rows.
- **Salting.** For the explicit two-level variant the partial key is
  ``(key, salt)`` with ``salt = hash(url) % S`` on detected hot keys, then
  a second tiny ``groupby(key)`` combines the salted partials. Hot keys are
  detected by a cheap sampled count pre-pass (``detect_hot_keys``).
- **Holistic stats** (exact median/mode/percentile) need raw values in one
  place → ``groupby.map_groups``; mode is decomposed into two groupbys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions import _bs
from ..functions.hashing import fnv1a64, splitmix64
from ..functions.rounding import round_half_away
from .exchange import bucket_exchange

DECOMPOSABLE = ("count", "sum", "mean", "min", "max", "std", "var")

NUM_PARTS = 64  # coarse reducer buckets for high-cardinality keys


def _add_part(b: pd.DataFrame, keys: list[str], num_parts: int = NUM_PARTS) -> pd.DataFrame:
    """Deterministic reducer-bucket column from the group key columns.

    Ray's built-in ``groupby().aggregate()`` reduces one Python iteration
    per distinct key — pathological at 10⁵+ cells. The engine instead
    shuffles on a COARSE ``_part`` (64 buckets) and combines each bucket
    with one vectorized pandas groupby (same trick as stages/dedup.py)."""
    h = np.zeros(len(b), np.uint64)
    old = np.seterr(over="ignore")
    try:
        for k in keys:
            col = b[k]
            if pd.api.types.is_integer_dtype(col) or pd.api.types.is_unsigned_integer_dtype(col):
                hk = splitmix64(col.to_numpy().astype(np.uint64, copy=False))
            elif pd.api.types.is_datetime64_any_dtype(col):
                hk = splitmix64(col.to_numpy("datetime64[us]").view(np.int64).astype(np.uint64))
            else:
                hk = fnv1a64(col.astype(str).to_numpy())
            h = splitmix64(h ^ hk)
    finally:
        np.seterr(**old)
    b = b.copy()
    b["_part"] = (h % np.uint64(num_parts)).astype(np.int32)
    return b


def _partial_moments(keys: list[str], value_col: str):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[keys + [value_col]].copy()
        b["_v2"] = b[value_col].astype(np.float64) ** 2
        g = b.groupby(keys, sort=False, observed=True)
        out = g.agg(
            n=(value_col, "count"),
            s=(value_col, "sum"),
            mn=(value_col, "min"),
            mx=(value_col, "max"),
            s2=("_v2", "sum"),
        )
        return out.reset_index()

    return fn


def grouped_stats(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    value_col: str,
    stats: tuple[str, ...] = ("count", "sum", "mean", "min", "max", "std"),
    round_to: int | None = None,
) -> ray.data.Dataset:
    """Decomposable grouped stats with per-batch partial pre-aggregation.

    Output columns: keys + ``{stat}_{value_col}`` (count → ``count``).
    ``std``/``var`` are the sample (ddof=1) definitions, matching SQL
    STDDEV/VARIANCE; ``round_to`` rounds float outputs so the DuckDB oracle
    hash matches bit-for-bit after identical rounding.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    unknown = set(stats) - set(DECOMPOSABLE)
    if unknown:
        raise ValueError(f"non-decomposable stats {unknown}; use grouped_holistic")
    partials = ds.map_batches(_partial_moments(keys, value_col), batch_format="pandas", batch_size=_bs())
    parted = partials.map_batches(lambda b: _add_part(b, keys), batch_format="pandas")

    def combine_and_finalize(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(keys, sort=False, observed=True).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"), mn=("mn", "min"), mx=("mx", "max")
        ).reset_index()
        n = c["n"].astype(np.float64)
        out = c[keys].copy()
        var = ((c["s2"] - c["s"] ** 2 / n) / (n - 1)).clip(lower=0.0)
        vals = {
            "count": c["n"].astype(np.int64),
            "sum": c["s"],
            "mean": c["s"] / n,
            "min": c["mn"],
            "max": c["mx"],
            "std": np.sqrt(var),
            "var": var,
        }
        for st in stats:
            name = "count" if st == "count" else f"{st}_{value_col}"
            col = vals[st]
            if round_to is not None and st != "count":
                col = round_half_away(col, round_to)
            out[name] = col
        return out

    return bucket_exchange(parted, combine_and_finalize, small_partials=True)


def grouped_stats_multi(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    value_stats: dict[str, tuple[str, ...]],
    round_to: int | None = None,
) -> ray.data.Dataset:
    """zonal_stats_all analogue (shape.py:1323): ALL stats × ALL value
    columns in ONE grouped pass (the reference loops whole-raster passes per
    stat×band; here one partial-moment emission covers every column)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    cols = list(value_stats)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[keys + cols].copy()
        aggs: dict[str, tuple[str, str]] = {}
        for c in cols:
            b[f"_{c}_v2"] = b[c].astype(np.float64) ** 2
            aggs[f"{c}__n"] = (c, "count")
            aggs[f"{c}__s"] = (c, "sum")
            aggs[f"{c}__mn"] = (c, "min")
            aggs[f"{c}__mx"] = (c, "max")
            aggs[f"{c}__s2"] = (f"_{c}_v2", "sum")
        return b.groupby(keys, sort=False, observed=True).agg(**aggs).reset_index()

    parted = ds.map_batches(partial, batch_format="pandas", batch_size=_bs()).map_batches(
        lambda b: _add_part(b, keys), batch_format="pandas"
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        aggs = {}
        for c in cols:
            for suf, how in (("n", "sum"), ("s", "sum"), ("s2", "sum"), ("mn", "min"), ("mx", "max")):
                aggs[f"{c}__{suf}"] = (f"{c}__{suf}", how)
        cg = g.groupby(keys, sort=False, observed=True).agg(**aggs).reset_index()
        out = cg[keys].copy()
        for c, stats in value_stats.items():
            n = cg[f"{c}__n"].astype(np.float64)
            var = ((cg[f"{c}__s2"] - cg[f"{c}__s"] ** 2 / n) / (n - 1)).clip(lower=0.0)
            vals = {
                "count": cg[f"{c}__n"].astype(np.int64),
                "sum": cg[f"{c}__s"],
                "mean": cg[f"{c}__s"] / n,
                "min": cg[f"{c}__mn"],
                "max": cg[f"{c}__mx"],
                "std": np.sqrt(var),
                "var": var,
            }
            for st in stats:
                name = f"count_{c}" if st == "count" else f"{st}_{c}"
                col = vals[st]
                if round_to is not None and st != "count":
                    col = round_half_away(col, round_to)
                out[name] = col
        return out

    return bucket_exchange(parted, combine)


def grouped_holistic(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    value_col: str,
    stats: tuple[str, ...] = ("median",),
    percentile: float = 95.0,
    round_to: int | None = None,
    scale_bound: int | None = 4_000_000,
) -> ray.data.Dataset:
    """Exact holistic stats (median / percentile / skew / kurt / mode): raw
    rows hash-shuffle on a coarse ``_part`` bucket of the key; within each
    bucket one vectorized per-batch pandas groupby computes every group's
    stat (numpy loops only inside pandas C kernels, never per group in
    Python).

    Scale path (VERDICT r3 wrong #3): when the counted input exceeds
    ``scale_bound`` rows AND every requested stat is selection-based
    (median / percentile), the computation routes through
    ``grouped_selection`` — the grouped form of ``exact_median``'s
    iterative histogram refinement — which moves only counted (tid, bin,
    cnt) partials per pass instead of exchanging O(dataset) raw values.
    Both paths are BIT-IDENTICAL (dual-path parity pytest): the selection
    path replicates pandas' exact float expressions (even-n median =
    (a+b)/2; quantile = v[i] + (v[i+1]-v[i])·frac with pos = q·(n−1)).
    skew/kurt/mode requests keep the raw-value exchange (``scale_bound=
    None`` also forces it)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if (scale_bound is not None
            and set(stats) <= {"median", "percentile"}
            and ds.count() > scale_bound):
        return grouped_selection(ds, keys, value_col, stats=stats,
                                 percentile=percentile, round_to=round_to)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False, observed=True)[value_col]
        out = gb.size().rename("_n").reset_index()[keys]
        for st in stats:
            if st == "median":
                col = gb.median().to_numpy()
            elif st == "percentile":
                col = gb.quantile(percentile / 100.0).to_numpy()
            elif st == "mode":
                col = gb.apply(lambda v: float(v.mode().iloc[0])).to_numpy()
            elif st == "skew":  # population (ddof=0) central-moment skewness
                m = gb.transform("mean")
                sd = gb.transform("std", ddof=0)
                z = ((g[value_col] - m) / sd.where(sd > 0, np.inf)) ** 3
                col = z.groupby([g[k] for k in keys], observed=True, sort=False).mean().to_numpy()
            elif st == "kurt":  # population excess kurtosis
                m = gb.transform("mean")
                sd = gb.transform("std", ddof=0)
                z = ((g[value_col] - m) / sd.where(sd > 0, np.inf)) ** 4
                col = z.groupby([g[k] for k in keys], observed=True, sort=False).mean().to_numpy() - 3.0
            else:
                raise ValueError(st)
            out[f"{st}_{value_col}"] = round_half_away(col, round_to) if round_to is not None else col
        return out

    parted = ds.map_batches(lambda b: _add_part(b, keys), batch_format="pandas")
    # small_partials stays False: this exchange moves O(dataset) RAW value
    # rows (holistic stats can't pre-aggregate) — coalescing them serializes
    # ~100 MB block merges (exchange.py contract; ADVICE round 2).
    return bucket_exchange(parted, per_part)


def grouped_selection(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    value_col: str,
    stats: tuple[str, ...] = ("median",),
    percentile: float = 95.0,
    round_to: int | None = None,
    n_bins: int = 1024,
    pull_bound: int = 65536,
    num_buckets: int = 32,
    group_bound: int = 1_000_000,
) -> ray.data.Dataset:
    """Grouped EXACT median/percentile by iterative histogram refinement —
    the scale path of ``grouped_holistic`` (``exact_median`` generalized
    to per-group order statistics). No pass exchanges raw values until the
    final counted pull:

    1. one pass computes per-group (n, min, max) as pre-aggregated
       partials (≤ #groups driver rows; > ``group_bound`` groups refuses
       loudly — the per-group state is driver-held);
    2. each group's needed 0-based order-statistic ranks (≤ 4: two for
       the median, two for the percentile) become independent *targets*
       (tid, lo, hi, rank_off, k); every refinement round is one
       streaming pass emitting ≤ active_targets × ``n_bins`` counted
       (tid, bin, cnt) rows through a bucketed exchange, after which each
       target narrows to the single bin containing its rank;
    3. when every target's candidate count is ≤ ``pull_bound`` (counted),
       one final pass emits the in-range values; a per-target combiner
       ``np.partition`` selects the order statistic, so the driver pull
       is ONE row per target.

    log_{n_bins}(n_group / pull_bound) rounds: 2 passes cover 10¹¹-row
    groups. The input is consumed 3–4 times — callers stream from storage
    (parquet projections), not from an expensive lazy chain.

    Float parity: selected values are exact dataset floats; the final
    median/percentile expressions replicate pandas' groupby kernels
    bit-for-bit (probe-verified): even-n median = (a+b)/2, quantile =
    v[i] + (v[i+1]−v[i])·frac with pos = q·(n−1), frac = pos − int(pos).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not set(stats) <= {"median", "percentile"}:
        raise ValueError(f"grouped_selection handles median/percentile only, got {stats}")
    q = percentile / 100.0

    # ---- pass 0: per-group n / min / max (pre-aggregated partials) ----
    def p0_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b[keys + [value_col]].groupby(keys, sort=False, observed=True)[value_col]
        out = g.agg(n="count", lo="min", hi="max").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    def p0_combine(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False, observed=True)
        out = gb.agg(n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    groups = bucket_exchange(
        ds.map_batches(p0_partial, batch_format="pandas")
          .map_batches(lambda b: _add_part(b, keys), batch_format="pandas"),
        p0_combine, small_partials=True,
    ).to_pandas().drop(columns=["_part"], errors="ignore")
    if len(groups) > group_bound:
        raise ValueError(
            f"grouped_selection over {len(groups)} groups exceeds "
            f"group_bound={group_bound}; per-group driver state is bounded "
            "— raise the bound explicitly or use hist_quantiles")
    groups = groups.reset_index(drop=True)
    n_arr = groups["n"].to_numpy(np.int64)
    lo0 = groups["lo"].to_numpy(np.float64)
    hi0 = groups["hi"].to_numpy(np.float64)

    # ---- target ranks per group (0-based) ----
    # median: (n-1)//2 and n//2 (equal when n odd); percentile: idx and
    # idx+1 when frac>0 — pandas group_quantile's exact index arithmetic.
    want: dict[int, set[int]] = {gi: set() for gi in range(len(groups))}
    pos_arr = q * (n_arr - 1).astype(np.float64)
    idx_arr = pos_arr.astype(np.int64)
    frac_arr = pos_arr - idx_arr
    for gi in range(len(groups)):
        n = int(n_arr[gi])
        if "median" in stats:
            want[gi].update(((n - 1) // 2, n // 2))
        if "percentile" in stats:
            want[gi].add(int(idx_arr[gi]))
            if frac_arr[gi] > 0.0:
                want[gi].add(int(idx_arr[gi]) + 1)

    # state per target
    t_gi, t_k = [], []
    for gi, ks in want.items():
        for k in sorted(ks):
            t_gi.append(gi)
            t_k.append(k)
    st = pd.DataFrame({
        "_tid": np.arange(len(t_gi), dtype=np.int64),
        "_gi": np.array(t_gi, np.int64),
        "_k": np.array(t_k, np.int64),
    })
    st["_lo"] = lo0[st["_gi"]]
    st["_hi"] = hi0[st["_gi"]]
    st["_rank_off"] = np.int64(0)
    st["_cand"] = n_arr[st["_gi"]]
    st["_val"] = np.nan
    st["_done"] = st["_lo"] == st["_hi"]          # constant group: no pull
    st.loc[st["_done"], "_val"] = st.loc[st["_done"], "_lo"]
    key_of_gi = groups[keys]

    def _state_table(active: pd.DataFrame) -> pd.DataFrame:
        s = key_of_gi.iloc[active["_gi"].to_numpy()].reset_index(drop=True)
        s["_tid"] = active["_tid"].to_numpy()
        s["_lo"] = active["_lo"].to_numpy()
        s["_hi"] = active["_hi"].to_numpy()
        s["_part"] = (active["_tid"].to_numpy() % num_buckets).astype(np.int32)
        return s

    # ---- refinement rounds ----
    while True:
        active = st[~st["_done"] & (st["_cand"] > pull_bound) & (st["_hi"] > st["_lo"])]
        if len(active) == 0:
            break
        s_tbl = _state_table(active)

        def hist_partial(b: pd.DataFrame, s_tbl=s_tbl) -> pd.DataFrame:
            m = b[keys + [value_col]].merge(s_tbl, on=keys, how="inner")
            v = m[value_col].to_numpy(np.float64)
            lo = m["_lo"].to_numpy(np.float64)
            hi = m["_hi"].to_numpy(np.float64)
            sel = (v >= lo) & (v <= hi)
            if not sel.any():
                return pd.DataFrame({"_tid": pd.Series([], dtype=np.int64),
                                     "bin": pd.Series([], dtype=np.int64),
                                     "cnt": pd.Series([], dtype=np.int64),
                                     "_part": pd.Series([], dtype=np.int32)})
            v, lo, hi = v[sel], lo[sel], hi[sel]
            width_ok = hi > lo
            bins = np.zeros(len(v), np.int64)
            bins[width_ok] = np.clip(
                ((v[width_ok] - lo[width_ok]) / (hi[width_ok] - lo[width_ok]) * n_bins)
                .astype(np.int64), 0, n_bins - 1)
            out = pd.DataFrame({"_tid": m["_tid"].to_numpy()[sel], "bin": bins})
            out = out.groupby(["_tid", "bin"], sort=False).size().rename("cnt").reset_index()
            out["cnt"] = out["cnt"].astype(np.int64)
            out["_part"] = (out["_tid"].to_numpy() % num_buckets).astype(np.int32)
            return out

        def hist_combine(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(["_tid", "bin"], sort=False, as_index=False)["cnt"].sum()
            out["cnt"] = out["cnt"].astype(np.int64)
            return out

        h = bucket_exchange(
            ds.map_batches(hist_partial, batch_format="pandas"),
            hist_combine, small_partials=True,
        ).to_pandas()  # ≤ active_targets × n_bins counted rows

        progressed = False
        # _tid == row position in st by construction: positional .at
        # updates keep this loop O(targets), not O(targets²)
        h_by_tid = dict(tuple(h.groupby("_tid", sort=False)))
        for _, row in active.iterrows():
            tid = int(row["_tid"])
            ht = h_by_tid[tid].sort_values("bin")
            bins = ht["bin"].to_numpy(np.int64)
            cnts = ht["cnt"].to_numpy(np.int64)
            cum = int(row["_rank_off"]) + np.cumsum(cnts)
            k1 = int(row["_k"]) + 1  # 1-based rank
            i = int(np.searchsorted(cum, k1))
            lo, hi = float(row["_lo"]), float(row["_hi"])
            width = (hi - lo) / n_bins
            new_lo = lo + bins[i] * width
            new_hi = min(lo + (bins[i] + 1) * width, hi)
            st.at[tid, "_rank_off"] = int(row["_rank_off"] + cnts[:i].sum())
            st.at[tid, "_cand"] = int(cnts[i])
            if new_lo == lo and new_hi == hi:
                # identical-value mass stalls the shrink — pull as-is
                st.at[tid, "_cand"] = min(int(cnts[i]), pull_bound)
            else:
                st.at[tid, "_lo"] = new_lo
                st.at[tid, "_hi"] = new_hi
                progressed = True
        if not progressed:
            break

    # collapsed ranges need no pull: every in-range value equals lo
    collapsed = ~st["_done"] & (st["_hi"] == st["_lo"])
    st.loc[collapsed, "_val"] = st.loc[collapsed, "_lo"]
    st.loc[collapsed, "_done"] = True

    # ---- final pull: per-target combiner selection, 1 driver row/target --
    pending = st[~st["_done"]]
    if len(pending) > 0:
        s_tbl = _state_table(pending)
        sel_idx = (pending["_k"] - pending["_rank_off"]).astype(np.int64)
        sel_of_tid = dict(zip(pending["_tid"].astype(int), (int(x) for x in sel_idx)))

        def pull_partial(b: pd.DataFrame, s_tbl=s_tbl) -> pd.DataFrame:
            m = b[keys + [value_col]].merge(s_tbl, on=keys, how="inner")
            v = m[value_col].to_numpy(np.float64)
            sel = (v >= m["_lo"].to_numpy(np.float64)) & (v <= m["_hi"].to_numpy(np.float64))
            return pd.DataFrame({"_tid": m["_tid"].to_numpy()[sel],
                                 "_v": v[sel],
                                 "_part": m["_part"].to_numpy()[sel]})

        def select_combine(g: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for tid, grp in g.groupby("_tid", sort=False):
                vals = grp["_v"].to_numpy(np.float64)
                j = sel_of_tid[int(tid)]
                rows.append({"_tid": int(tid), "_val": float(np.partition(vals, j)[j])})
            out = pd.DataFrame(rows)
            out["_tid"] = out["_tid"].astype(np.int64)
            return out

        picked = bucket_exchange(
            ds.map_batches(pull_partial, batch_format="pandas"),
            select_combine, small_partials=True,
        ).to_pandas()
        vals = dict(zip(picked["_tid"].astype(int), picked["_val"]))
        for tid, v in vals.items():
            st.at[tid, "_val"] = v

    # ---- assemble: pandas-identical float expressions per stat ----
    val_of = {}
    for _, row in st.iterrows():
        val_of[(int(row["_gi"]), int(row["_k"]))] = float(row["_val"])
    out = key_of_gi.copy().reset_index(drop=True)
    for stt in stats:
        col = np.empty(len(groups), np.float64)
        for gi in range(len(groups)):
            n = int(n_arr[gi])
            if stt == "median":
                a = val_of[(gi, (n - 1) // 2)]
                b = val_of[(gi, n // 2)]
                col[gi] = a if (n % 2) else (a + b) / 2.0
            else:
                i0 = int(idx_arr[gi])
                frac = float(frac_arr[gi])
                a = val_of[(gi, i0)]
                col[gi] = a if frac == 0.0 else a + (val_of[(gi, i0 + 1)] - a) * frac
        out[f"{stt}_{value_col}"] = round_half_away(col, round_to) if round_to is not None else col
    return ray.data.from_pandas(out)


def value_counts(ds: ray.data.Dataset, keys: list[str] | str, value_col: str) -> ray.data.Dataset:
    """zonal_frac analogue (shape.py:1092): per-key distinct-value counts +
    fraction of the key's rows. Two groupbys, both over pre-combined
    partials — no raw-row skew."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    both = keys + [value_col]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(both, sort=False, observed=True).size().rename("n").reset_index()

    # _part derives from the KEY columns only, so every (key, value) partial
    # of one key lands in the same bucket → fractions computable in-bucket
    parted = ds.map_batches(partial, batch_format="pandas").map_batches(
        lambda b: _add_part(b, keys), batch_format="pandas"
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(both, sort=False, observed=True)["n"].sum().reset_index()
        totals = c.groupby(keys, sort=False, observed=True)["n"].transform("sum")
        c["frac"] = round_half_away(c["n"] / totals, 6)
        return c

    return bucket_exchange(parted, combine, small_partials=True)


def detect_hot_keys(ds: ray.data.Dataset, key: str, sample_frac: float = 0.05, top_k: int = 32, seed: int = 7) -> list:
    """Cheap sampled count pre-pass → the top-k candidate hot keys (the
    measured, not assumed, salt set — SURVEY.md §7 'What's hard')."""
    sample = ds.select_columns([key]).random_sample(sample_frac, seed=seed)
    counts = sample.groupby(key).count().sort("count()", descending=True).limit(top_k)
    df = counts.to_pandas()
    cnt_col = [c for c in df.columns if c != key][0]
    med = max(float(df[cnt_col].median()), 1.0)
    return df[df[cnt_col] > 4 * med][key].tolist()


def salted_grouped_stats(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    salt_from: str,
    hot_keys: list,
    num_salts: int = 16,
    stats: tuple[str, ...] = ("count", "mean"),
    round_to: int | None = None,
) -> ray.data.Dataset:
    """Explicit two-level salted aggregation: hot keys get
    ``salt = fnv1a64(salt_from) % num_salts`` so their partial rows spread
    over ``num_salts`` reducers; level 2 recombines moments per key."""
    from ..functions.hashing import fnv1a64

    hot = set(hot_keys)

    def add_salt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        salt = (fnv1a64(b[salt_from].to_numpy()) % np.uint64(num_salts)).astype(np.int64)
        b["_salt"] = np.where(b[key].isin(hot), salt, 0)
        return b

    salted = ds.map_batches(add_salt, batch_format="pandas")
    # level 1: shuffle keyed on (key, salt) buckets — a hot key's partials
    # spread across num_salts reducers instead of one
    lvl1 = salted.map_batches(_partial_moments([key, "_salt"], value_col), batch_format="pandas")
    l1p = lvl1.map_batches(lambda b: _add_part(b, [key, "_salt"]), batch_format="pandas")

    def combine_salted(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby([key, "_salt"], sort=False, observed=True)
            .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            .reset_index()
        )

    lvl2 = bucket_exchange(l1p, combine_salted, small_partials=True)
    # level 2: tiny recombine per key (≤ num_salts rows per key)
    l2p = lvl2.map_batches(lambda b: _add_part(b, [key]), batch_format="pandas")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(key, sort=False, observed=True).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"), mn=("mn", "min"), mx=("mx", "max")
        ).reset_index()
        n = c["n"].astype(np.float64)
        out = c[[key]].copy()
        var = ((c["s2"] - c["s"] ** 2 / n) / (n - 1)).clip(lower=0.0)
        vals = {
            "count": c["n"].astype(np.int64),
            "sum": c["s"],
            "mean": c["s"] / n,
            "min": c["mn"],
            "max": c["mx"],
            "std": np.sqrt(var),
            "var": var,
        }
        for st in stats:
            name = "count" if st == "count" else f"{st}_{value_col}"
            col = vals[st]
            if round_to is not None and st != "count":
                col = round_half_away(col, round_to)
            out[name] = col
        return out

    return bucket_exchange(l2p, finalize, small_partials=True)


def grouped_topk(ds: ray.data.Dataset, keys: list[str] | str, value_col: str,
                 k: int, tiebreak: list[str] | str, descending: bool = True,
                 rank_col: str | None = "rn",
                 num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Per-group top-k rows — the per-key generalization of the reference's
    global feature-ranking sort (learning.py:1073 ``fimp.sort_values``; web
    pipelines need the grouped form: top pages per host, newest crawls per
    domain, best orders per customer).

    Exact and shuffle-slim: each input block first reduces to ≤ k rows per
    key it contains (one vectorized sort + ``cumcount`` mask, no Python
    loop), so the exchange moves ≤ k rows per (key, block) instead of each
    group's full payload — a Zipf-hot key ships k × #blocks rows, never
    millions. The combiner re-applies the identical selection per REAL key
    (hash path delivers several whole buckets per block).

    ``tiebreak`` column(s) must make the per-group order total — otherwise
    membership at the k boundary depends on block structure. ``rank_col``
    (default ``rn``) emits the 1-based rank, matching SQL
    ``row_number() OVER (PARTITION BY keys ORDER BY value, tiebreak)``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    tiebreak = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)
    order_cols = keys + [value_col] + tiebreak
    ascending = [True] * len(keys) + [not descending] + [True] * len(tiebreak)

    def select(b: pd.DataFrame, final: bool) -> pd.DataFrame:
        b = b.sort_values(order_cols, ascending=ascending, kind="mergesort")
        rn = b.groupby(keys, sort=False, observed=True).cumcount().to_numpy()
        b = b[rn < k].copy()
        if final:
            b = b.drop(columns=["_part"])
            if rank_col is not None:
                b[rank_col] = (rn[rn < k] + 1).astype(np.int64)
        return b

    parted = ds.map_batches(lambda b: _add_part(select(b, False), keys, num_parts),
                            batch_format="pandas", batch_size=None)
    return bucket_exchange(parted, lambda b: select(b, True), small_partials=True)


def rmse(ds: ray.data.Dataset, col_a: str, col_b: str, round_to: int = 4) -> float:
    """Global RMSE of two columns (learning.rmse_vector_lyr, learning.py:1828)
    as a partial+final aggregate — one tiny driver-side combine."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = (b[col_a].to_numpy(np.float64) - b[col_b].to_numpy(np.float64)) ** 2
        return pd.DataFrame({"n": [len(d)], "s": [float(d.sum())]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return round_half_away(float(np.sqrt(parts["s"].sum() / parts["n"].sum())), round_to)


def rollup_stats(ds: ray.data.Dataset, keys: list[str], value_col: str,
                 round_to: int = 4, sentinel: str = "(all)",
                 num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """ROLLUP grouping-sets aggregate in ONE pass (the dashboard rollup:
    (k1, k2), (k1), () levels with count/sum/mean each) — SQL's
    GROUP BY ROLLUP re-expressed as map-side per-set partials: every block
    computes its partial moments for ALL levels at once (pre-aggregated —
    the exchange moves ≤ Σ|set cardinalities| rows per block, never raw
    rows × levels), one coarse exchange combines. Coarser levels are NOT
    recomputed from raw data — they're the same partials re-keyed.
    Superaggregate rows carry ``sentinel`` in the rolled-up key columns
    (documented: real key values must not equal it) and ``gid`` = number
    of rolled-up keys, matching the SQL twin's GROUPING bitmask mapping."""
    sets = [keys[:i] for i in range(len(keys), -1, -1)]  # fine → coarse

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(np.float64)
        frames = []
        for gid, ks in enumerate(sets):
            if ks:
                g = b.groupby(ks, sort=False, observed=True)[value_col] \
                    .agg(n="size", s="sum").reset_index()
            else:
                g = pd.DataFrame({"n": [len(b)], "s": [float(v.sum())]})
            for k in keys:
                if k not in ks:
                    g[k] = sentinel
            g["gid"] = np.int64(gid)
            g["n"] = g["n"].astype(np.int64)
            frames.append(g[keys + ["gid", "n", "s"]])
        out = pd.concat(frames, ignore_index=True)
        return _add_part(out, keys + ["gid"], num_parts)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        c = g.groupby(keys + ["gid"], sort=False, observed=True, as_index=False) \
            .agg(n=("n", "sum"), s=("s", "sum"))
        out = c[keys + ["gid"]].copy()
        out["count"] = c["n"].astype(np.int64)
        out[f"sum_{value_col}"] = round_half_away(c["s"], round_to)
        out[f"mean_{value_col}"] = round_half_away(
            c["s"].to_numpy(np.float64) / c["n"].to_numpy(np.float64), round_to)
        return out

    from .exchange import bucket_exchange

    return bucket_exchange(ds.select_columns(keys + [value_col]).map_batches(
        partial, batch_format="pandas"), combine, small_partials=True)


def grouped_trimmed_stats(ds: ray.data.Dataset, keys: list[str] | str,
                          value_col: str, trim_frac_denom: int = 10,
                          num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Robust per-group stats: the 10 %-trimmed mean (drop the lowest and
    highest n//10 values by rank) and the winsorized mean (clamp to the
    trim boundaries) — the outlier-resistant aggregates a data-quality
    dashboard wants next to zonal_stats' moments (reference analogue: the
    stat dispatch in shape.py:1023's ``stat=`` family).

    Exactness: values are converted to integer CENTS map-side
    (round_half_away(x·100) — CLAUDE.md: raw float sums of
    non-representable decimals are order-dependent at scale), so every
    sum is an exact int64 in any order; ties at the trim boundary are
    harmless because equal values are interchangeable in both the kept
    multiset and the clamp. Holistic shape: raw (key, cents) rows
    hash-shuffle on the coarse ``_part`` bucket (small_partials stays
    False — exchange.py contract), one vectorized pass per real group."""
    from ..functions.rounding import round_half_away as _rha

    keys = [keys] if isinstance(keys, str) else list(keys)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        out = b[keys].copy()
        out["c"] = _rha(b[value_col].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        return _add_part(out, keys, num_parts)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, grp in g.groupby(keys, sort=False, observed=True):
            c = np.sort(grp["c"].to_numpy(np.int64))
            n = len(c)
            t = n // trim_frac_denom
            m = n - 2 * t
            if m <= 0:
                continue
            kept = c[t:n - t]
            lo, hi = kept[0], kept[-1]
            tsum = int(kept.sum())
            wsum = int(np.clip(c, lo, hi).sum())
            kv = kv if isinstance(kv, tuple) else (kv,)
            rows.append((*kv, np.int64(n), np.int64(m),
                         _rha(np.float64(tsum) / (m * 100), 6),
                         _rha(np.float64(wsum) / (n * 100), 6)))
        return pd.DataFrame(rows, columns=[*keys, "n", "n_kept",
                                           "trimmed_mean", "winsor_mean"])

    parted = ds.map_batches(prep, batch_format="pandas")
    return bucket_exchange(parted, per_part)


def _skyline2d(df: pd.DataFrame, max_col: str, min_col: str) -> pd.DataFrame:
    """Exact 2-D skyline of ``df`` (maximize max_col, minimize min_col),
    vectorized: survive iff (a) min_col equals the group minimum within
    its max_col value and (b) min_col is strictly below every strictly-
    better max_col group's minimum. Ties in both coordinates all
    survive (neither strictly dominates)."""
    if df.empty:
        return df
    d = df.sort_values([max_col, min_col], ascending=[False, True],
                       kind="mergesort")
    mx = d[max_col].to_numpy()
    mn = d[min_col].to_numpy()
    # group minimum = first value per max_col group (sorted asc inside)
    new_grp = np.ones(len(d), bool)
    new_grp[1:] = mx[1:] != mx[:-1]
    gmin = mn[new_grp][np.cumsum(new_grp) - 1]
    # running min of gmin over strictly-better groups
    grp_first_mn = mn[new_grp]
    prior = np.empty(len(grp_first_mn), grp_first_mn.dtype)
    if len(grp_first_mn):
        prior[0] = grp_first_mn[0]  # sentinel: top group has no better
        np.minimum.accumulate(grp_first_mn[:-1], out=prior[1:])
    prior_row = prior[np.cumsum(new_grp) - 1]
    first_grp = np.cumsum(new_grp) == 1
    keep = (mn == gmin) & (first_grp | (mn < prior_row))
    return d[keep]


def skyline_2d(ds: ray.data.Dataset, max_col: str, min_col: str,
               carry: list[str]) -> ray.data.Dataset:
    """Distributed exact 2-D Pareto skyline (Börzsönyi et al. 2001):
    per-block LOCAL skylines first — the local skyline of a block always
    contains every global-skyline point in it, and on non-adversarial
    data prunes each block to O(log block) candidates — then ONE
    single-bucket exchange computes the final skyline over the pruned
    union with the same vectorized scan. Nothing reaches the driver."""
    from .exchange import bucket_exchange

    cols = [*carry, max_col, min_col]

    def local(b: pd.DataFrame) -> pd.DataFrame:
        out = _skyline2d(b[cols], max_col, min_col).copy()
        out["_part"] = np.zeros(len(out), np.int32)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return _skyline2d(g.drop(columns=["_part"]), max_col,
                          min_col).reset_index(drop=True)

    return bucket_exchange(
        ds.select_columns(cols).map_batches(local, batch_format="pandas"),
        final, small_partials=True)


def ab_test_stats(ds: ray.data.Dataset, user_col: str = "user_id",
                  value_col: str = "value") -> ray.data.Dataset:
    """Hash-randomized A/B experiment readout: users split 50/50 by
    ``splitmix64(user_id) % 2`` (deterministic assignment — the id-hash
    sampling rule, reproducible at any cluster size), per-variant
    mean of the event value and the Welch z-statistic.

    Exactness: values become integer cents map-side (round_half_away —
    the only rounding that matches SQL ROUND, CLAUDE.md), per-block
    int64 partial Σc and Σc² ride ONE single-bucket exchange (2 rows per
    block), and the combiner totals them in arbitrary-precision Python
    ints (the HUGEINT-sum twin: int64 would wrap at ~100 TB of cents²).
    Every output float is a fixed expression over those exact integers
    mirrored token-for-token in SQL (divisions and SQRT are IEEE
    correctly-rounded on both engines)."""
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        u = b[user_col].to_numpy()
        old = np.seterr(over="ignore")
        try:
            variant = (splitmix64(u.astype(np.uint64))
                       % np.uint64(2)).astype(np.int64)
        finally:
            np.seterr(**old)
        c = round_half_away(
            np.asarray(b[value_col].to_pandas(), np.float64) * 100.0,
            0).astype(np.int64)
        d = pd.DataFrame({"variant": variant, "c": c, "c2": c * c})
        g = d.groupby("variant", as_index=False).agg(
            n=("c", "size"), s1=("c", "sum"), s2=("c2", "sum"))
        g["n"] = g["n"].astype(np.int64)
        g["_part"] = np.zeros(len(g), np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        tot = {}
        for v, sub in g.groupby("variant"):
            tot[int(v)] = (int(sub["n"].sum()),
                           sum(int(x) for x in sub["s1"]),
                           sum(int(x) for x in sub["s2"]))
        na, s1a, s2a = tot.get(0, (0, 0, 0))
        nb, s1b, s2b = tot.get(1, (0, 0, 0))
        fa, fb = np.float64(na), np.float64(nb)
        mean_a = np.float64(s1a) / fa
        mean_b = np.float64(s1b) / fb
        va = (np.float64(s2a) - np.float64(s1a) * np.float64(s1a) / fa) \
            / np.float64(na - 1)
        vb = (np.float64(s2b) - np.float64(s1b) * np.float64(s1b) / fb) \
            / np.float64(nb - 1)
        z = (mean_a - mean_b) / np.sqrt(va / fa + vb / fb)
        return pd.DataFrame({
            "n_a": np.array([na], np.int64),
            "n_b": np.array([nb], np.int64),
            "mean_cents_a": [float(mean_a)],
            "mean_cents_b": [float(mean_b)],
            "welch_z": [float(z)],
        })

    return bucket_exchange(
        ds.select_columns([user_col, value_col]).map_batches(
            partial, batch_format="pyarrow"),
        combine, small_partials=True)


def exact_median(ds: ray.data.Dataset, col: str, n_bins: int = 1024,
                 pull_bound: int = 65536,
                 num_buckets: int = 32) -> ray.data.Dataset:
    """EXACT global median by iterative histogram refinement (the
    distributed selection algorithm: Blum et al. medians-of-medians'
    streaming cousin) — the scale path where ``grouped_holistic`` /
    ``ds.sort`` would move O(dataset) values: each refinement round is
    one streaming pass emitting ≤ ``n_bins`` counted rows through a
    bucketed exchange, the driver narrows the value range containing
    ranks ⌈n/2⌉ and ⌈(n+1)/2⌉, and only when the candidate count drops
    under ``pull_bound`` (counted — the dedup.py bound pattern) are raw
    values pulled and selected. log_{n_bins}(n / pull_bound) rounds:
    2 passes cover 10¹¹ rows.

    The median float is (v_lo + v_hi)/2 written EXPLICITLY on both sides
    (DuckDB's quantile_cont interpolates a + (b−a)·f, which can differ
    by an ulp — the oracle twin selects both order statistics by
    row_number and applies the identical (a+b)/2)."""
    from .exchange import bucket_exchange
    from ..functions.hashing import splitmix64

    n = ds.count()
    if n == 0:
        raise ValueError("exact_median of an empty dataset")
    k1 = (n + 1) // 2
    k2 = (n + 2) // 2

    lo, hi = None, None  # candidate value range (inclusive)
    rank_off = 0         # count of values strictly below lo

    def _hist(lo_v, hi_v):
        def partial(b: pa.Table) -> pd.DataFrame:
            v = np.asarray(b[col].to_pandas(), np.float64)
            v = v[(v >= lo_v) & (v <= hi_v)]
            if hi_v > lo_v:
                idx = np.clip(((v - lo_v) / (hi_v - lo_v) * n_bins)
                              .astype(np.int64), 0, n_bins - 1)
            else:
                idx = np.zeros(len(v), np.int64)
            cnt = np.bincount(idx, minlength=n_bins).astype(np.int64)
            nz = np.flatnonzero(cnt)
            old = np.seterr(over="ignore")
            try:
                part = (splitmix64(nz.astype(np.uint64))
                        % np.uint64(num_buckets)).astype(np.int32)
            finally:
                np.seterr(**old)
            return pd.DataFrame({"bin": nz, "cnt": cnt[nz], "_part": part})

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            out = g.drop(columns=["_part"]).groupby(
                "bin", as_index=False, sort=False)["cnt"].sum()
            out["cnt"] = out["cnt"].astype(np.int64)
            return out

        return bucket_exchange(
            ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
            combine, small_partials=True).to_pandas()  # ≤ n_bins counted rows

    # initialize range from a min/max pass
    mm = ds.select_columns([col])
    lo = mm.min(col)
    hi = mm.max(col)
    cand = n

    while cand > pull_bound and hi > lo:
        h = _hist(lo, hi).sort_values("bin")
        bins = h["bin"].to_numpy(np.int64)
        cnts = h["cnt"].to_numpy(np.int64)
        cum = rank_off + np.cumsum(cnts)
        # first bin where cumulative rank reaches k1, last needed for k2
        i1 = int(np.searchsorted(cum, k1))
        i2 = int(np.searchsorted(cum, k2))
        width = (hi - lo) / n_bins
        new_lo = lo + bins[i1] * width
        new_hi = lo + (bins[i2] + 1) * width if i2 + 1 <= n_bins else hi
        rank_off = int(rank_off + cnts[:i1].sum())
        cand = int(cnts[i1:i2 + 1].sum())
        # guard: identical-value mass can stall the shrink — fall through
        if new_lo == lo and min(new_hi, hi) == hi:
            break
        lo, hi = new_lo, min(new_hi, hi)

    if hi == lo:  # all candidates share one value — no pull needed
        v1 = v2 = lo
    else:
        def pull(b: pa.Table) -> pd.DataFrame:
            v = np.asarray(b[col].to_pandas(), np.float64)
            return pd.DataFrame({col: v[(v >= lo) & (v <= hi)]})

        vals = np.sort(np.asarray(
            ds.select_columns([col]).map_batches(
                pull, batch_format="pyarrow").to_pandas()[col], np.float64))
        v1 = vals[k1 - rank_off - 1]
        v2 = vals[k2 - rank_off - 1]
    return ray.data.from_pandas(pd.DataFrame({
        "n": np.array([n], np.int64),
        "v_lo": [float(v1)], "v_hi": [float(v2)],
        "median": [float((v1 + v2) / 2.0)],
    }))


def pivot_counts(ds: ray.data.Dataset, key: str, col: str,
                 type_bound: int = 1024,
                 num_buckets: int = 64) -> ray.data.Dataset:
    """Crosstab / PIVOT: one row per ``key`` with a count column per
    distinct ``col`` value plus a total — the wide activity-matrix shape
    (user × event-type). The column set is discovered with a COUNTED
    distinct pull (pivot output schemas are driver-defined by nature; a
    data-dependent unbounded column set is refused loudly), then counts
    pre-aggregate per block and ONE key-hash exchange pivots each bucket
    with a vectorized unstack. Missing cells are 0 (typed int64)."""
    from ..functions.hashing import fnv1a64, splitmix64

    cats = sorted(str(v) for v in ds.unique(col))
    if len(cats) > type_bound:
        raise ValueError(
            f"pivot over {len(cats)} distinct {col!r} values exceeds "
            f"type_bound={type_bound}; a wider pivot needs an explicit bound")

    def partial(b: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame({key: b[key].to_numpy(),
                          col: b[col].to_pandas().to_numpy(object)})
        g = d.groupby([key, col], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(g[key].to_numpy().astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby(
            [key, col], sort=False, as_index=False)["n"].sum()
        wide = c.pivot_table(index=key, columns=col, values="n",
                             aggfunc="sum", fill_value=0)
        out = pd.DataFrame({key: wide.index.to_numpy()})
        tot = np.zeros(len(wide), np.int64)
        for cat in cats:
            v = (wide[cat].to_numpy(np.int64) if cat in wide.columns
                 else np.zeros(len(wide), np.int64))
            out[f"n_{cat}"] = v
            tot += v
        out["n_total"] = tot
        return out

    return bucket_exchange(
        ds.select_columns([key, col]).map_batches(partial,
                                                  batch_format="pyarrow"),
        pivot, small_partials=True)


def gini_by_nation(orders: ray.data.Dataset, customer: ray.data.Dataset,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Per-nation Gini coefficient of per-customer revenue (Lorenz-curve
    concentration; Gini 1912 via the rank covariance identity):

        G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x),   x sorted ascending.

    Customers with no orders count as zero-revenue rows (LEFT-join
    semantics). Revenue is exact integer cents so every sum is
    order-free; ties in x are rank-order-invariant (equal x makes
    Σ i·x depend only on the tied ranks' total), and the (cents, ck)
    sort both sides makes ranks identical anyway.

    Scale shape: orders pre-reduce per block, then ONE custkey-bucketed
    exchange merges revenue with the customer dimension rows riding the
    same exchange (tagged union — no broadcast of an O(dataset) table);
    a second nation-keyed exchange computes the sorted integer moments.
    Σ i·x is computed in int64 with a guarded promotion to Python ints
    when n·max(x)·n approaches 2^62 (per-nation arrays only)."""

    def rev_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        g = pd.DataFrame({"ck": b["o_custkey"].to_numpy(np.int64),
                          "cents": cents}) \
            .groupby("ck", as_index=False)["cents"].sum()
        g["cents"] = g["cents"].astype(np.int64)
        g["nation"] = np.int64(-1)
        g["_part"] = (g["ck"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return g[["ck", "nation", "cents", "_part"]]

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ck": b["c_custkey"].to_numpy(np.int64),
            "nation": b["c_nationkey"].to_numpy(np.int64),
            "cents": np.zeros(len(b), np.int64),
            "_part": (b["c_custkey"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)})

    uni = orders.select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(rev_partial, batch_format="pandas") \
        .union(customer.select_columns(["c_custkey", "c_nationkey"])
               .map_batches(cust_rows, batch_format="pandas"))

    def attach_nation(g: pd.DataFrame) -> pd.DataFrame:
        m = g.drop(columns=["_part"]).groupby("ck", as_index=False).agg(
            nation=("nation", "max"), cents=("cents", "sum"))
        m = m[m["nation"] >= 0].copy()  # drop orders with no dim row
        m["cents"] = m["cents"].astype(np.int64)
        m["nation"] = m["nation"].astype(np.int64)
        m["_part"] = (m["nation"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return m

    def gini(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        nks, ns, ss, gs = [], [], [], []
        for nk, t in g.sort_values(["nation", "cents", "ck"],
                                   kind="mergesort").groupby(
                                       "nation", sort=False):
            x = t["cents"].to_numpy(np.int64)
            n = len(x)
            s = int(x.sum())
            if n and int(x.max() if n else 0) * n * n < (1 << 62):
                w = int(np.dot(np.arange(1, n + 1, dtype=np.int64), x))
            else:  # exact Python-int fallback for extreme magnitudes
                w = sum(i * int(v) for i, v in enumerate(x, 1))
            num = 2 * w - (n + 1) * s
            gv = (np.float64(num) / np.float64(n * s)) if s else 0.0
            nks.append(nk)
            ns.append(n)
            ss.append(s)
            gs.append(gv)
        return pd.DataFrame({
            "n_nationkey": pd.Series(nks, dtype=np.int64),
            "n_cust": pd.Series(ns, dtype=np.int64),
            "sum_cents": pd.Series(ss, dtype=np.int64),
            "gini_r": round_half_away(
                pd.Series(gs, dtype=np.float64).to_numpy(), 9)})

    return bucket_exchange(bucket_exchange(uni, attach_nation), gini,
                           small_partials=True)


def benford_digits(orders: ray.data.Dataset,
                   col: str = "o_totalprice") -> ray.data.Dataset:
    """Benford first-significant-digit analysis (Newcomb 1881, Benford
    1938 — the classic forensic-accounting screen) of order totals in
    exact integer cents: per digit d ∈ 1..9 the observed count, the
    Benford expectation n·log10(1+1/d) and the observed/expected ratio.
    The nine log10 constants are Python-computed f64 literals inlined
    into the SQL twin verbatim; each output float is one short chain
    (multiply, then divide) in the same op order both sides. The first
    digit comes from the decimal STRING of the cents integer — exact on
    both sides (no float log10 near power-of-ten boundaries).

    Scale shape: per-block 9-bin bincount partials, one single-bucket
    exchange (9 rows) finalizes."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    p = np.log10(1.0 + 1.0 / np.arange(1, 10, dtype=np.float64))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b[col].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        first = pd.Series(cents).astype(str).str[0].astype(int) \
            .to_numpy(np.int64)
        cnt = np.bincount(first, minlength=10)[1:10]
        return pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64),
                             "obs": cnt.astype(np.int64),
                             "_part": np.zeros(9, np.int32)})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]).groupby(
            "digit", as_index=False)["obs"].sum()
        o["obs"] = o["obs"].astype(np.int64)
        n = np.float64(np.int64(o["obs"].sum()))
        pe = p[o["digit"].to_numpy(np.int64) - 1]
        exp = n * pe
        o["exp_r"] = round_half_away(exp, 6)
        o["dev_r"] = round_half_away(
            o["obs"].to_numpy(np.int64).astype(np.float64) / exp, 6)
        return o

    return bucket_exchange(
        orders.select_columns([col]).map_batches(
            partial, batch_format="pandas"),
        finalize, small_partials=True)


def rfm_customers(orders: ray.data.Dataset,
                  num_buckets: int = 64) -> ray.data.Dataset:
    """RFM (recency / frequency / monetary) quintile segmentation of
    customers (Hughes 1994 — the classic CRM scoring): per customer the
    last order day, order count and exact revenue cents, each ranked
    globally and cut into quintiles by the explicit integer formula
    tile = rank0·5 // n + 1 (ties broken on custkey — deterministic on
    both sides; NOT SQL NTILE, whose unequal-group convention differs).
    rfm_code = 100·R + 10·F + M; tile 5 = most recent / most frequent /
    highest spend.

    Scale shape: one custkey exchange for the metrics, then three
    distributed rank scans (scan.exclusive_prefix_sum over a composite
    (metric, ck) key — per-range partials + a K-row driver scan, never
    a global sort materialization). Composite keys assert
    metric·2^22 + ck < 2^63."""
    from .exchange import bucket_exchange
    from .scan import exclusive_prefix_sum

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        g = pd.DataFrame({"ck": b["o_custkey"].to_numpy(np.int64),
                          "day": day, "cents": cents}) \
            .groupby("ck", as_index=False).agg(
                last_day=("day", "max"), n_orders=("day", "size"),
                cents=("cents", "sum"))
        for c in ["last_day", "n_orders", "cents"]:
            g[c] = g[c].astype(np.int64)
        g["_part"] = (g["ck"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]).groupby("ck", as_index=False).agg(
            last_day=("last_day", "max"), n_orders=("n_orders", "sum"),
            cents=("cents", "sum"))
        for c in ["last_day", "n_orders", "cents"]:
            o[c] = o[c].astype(np.int64)
        o["one"] = np.ones(len(o), np.int64)
        return o

    m = bucket_exchange(
        orders.select_columns(["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pandas"), combine).materialize()
    n = m.count()

    def keyed(col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            v = b[col].to_numpy(np.int64)
            ck = b["ck"].to_numpy(np.int64)
            assert (ck < (1 << 22)).all() and \
                (v < (1 << 40)).all(), "composite rank key overflow"
            b["_rk"] = v * np.int64(1 << 22) + ck
            return b
        return fn

    out = m
    for col, tile in (("last_day", "r_tile"), ("n_orders", "f_tile"),
                      ("cents", "m_tile")):
        out = exclusive_prefix_sum(
            out.map_batches(keyed(col), batch_format="pandas"),
            "_rk", "one", num_ranges=num_buckets)

        def cut(b: pd.DataFrame, _t=tile) -> pd.DataFrame:
            b = b.copy()
            b[_t] = (b["prefix"].to_numpy(np.int64) * 5 // n + 1) \
                .astype(np.int64)
            return b.drop(columns=["prefix", "_rk"])

        out = out.map_batches(cut, batch_format="pandas")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop(columns=["one"]).copy()
        b["rfm_code"] = (100 * b["r_tile"] + 10 * b["f_tile"]
                         + b["m_tile"]).astype(np.int64)
        return b.rename(columns={"ck": "o_custkey"})

    return out.map_batches(finish, batch_format="pandas")


def psi_drift_orders(orders: ray.data.Dataset,
                     n_bins: int = 10) -> ray.data.Dataset:
    """Population stability index (the model-monitoring drift screen)
    of order value between the first and second half of the order-date
    span: ``n_bins`` equal-width cent bins over [0, max], split at
    mid = (min_day + max_day + 1)//2, and per bin the PSI term
    (p_a − p_b)·ln(p_a/p_b) — the ln argument is ONE division of exact
    integer products (n_ai·n_b)/(n_bi·n_a), so the whole term is a
    fixed 4-op f64 chain mirrored in SQL. Bins empty on either side
    emit term 0.0 (the ε-free convention); the total PSI is the exact
    sum of the emitted per-bin terms — left to the reader so no
    order-dependent float sum crosses the oracle.

    Scale shape: one scalar pre-pass (min/max day, max cents — 1 row
    per block), then per-block (bin, side) bincount partials and a
    single-bucket finalize of 2·n_bins rows."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def scal(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        return pd.DataFrame({"d0": [int(day.min())], "d1": [int(day.max())],
                             "mc": [int(cents.max())]})

    sc = orders.map_batches(scal, batch_format="pandas").to_pandas()
    d0, d1, mc = int(sc["d0"].min()), int(sc["d1"].max()), int(sc["mc"].max())
    mid = (d0 + d1 + 1) // 2

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        bn = np.minimum(n_bins - 1, cents * n_bins // (mc + 1))
        side = (day >= mid).astype(np.int64)
        g = pd.DataFrame({"bin": bn, "side": side}).groupby(
            ["bin", "side"], as_index=False).size().rename(
                columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        g["_part"] = np.zeros(len(g), np.int32)
        return g

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_part"]).groupby(
            ["bin", "side"], as_index=False)["c"].sum()
        na = np.zeros(n_bins, np.int64)
        nb = np.zeros(n_bins, np.int64)
        a = t[t["side"] == 0]
        bb = t[t["side"] == 1]
        na[a["bin"].to_numpy(np.int64)] = a["c"].to_numpy(np.int64)
        nb[bb["bin"].to_numpy(np.int64)] = bb["c"].to_numpy(np.int64)
        ta, tb = int(na.sum()), int(nb.sum())
        term = np.zeros(n_bins, np.float64)
        ok = (na > 0) & (nb > 0)
        pa_ = na[ok].astype(np.float64) / np.float64(ta)
        pb_ = nb[ok].astype(np.float64) / np.float64(tb)
        arg = (na[ok] * tb).astype(np.float64) \
            / (nb[ok] * ta).astype(np.float64)
        term[ok] = (pa_ - pb_) * np.log(arg)
        return pd.DataFrame({
            "bin": np.arange(n_bins, dtype=np.int64),
            "n_a": na, "n_b": nb,
            "psi_term_r": round_half_away(term, 6)})

    return bucket_exchange(
        orders.select_columns(["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pandas"),
        finalize, small_partials=True)


def cube_stats_orders(orders: ray.data.Dataset,
                      num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """GROUP BY CUBE (o_orderpriority, year) over order totals — the full
    2^k grouping-sets lattice beside ``rollup_stats``'s linear ROLLUP
    (reference analogue: the multi-level summaries shape.py's zonal stat
    dispatch produces one call per level; the engine does ALL levels in
    one pass). gid follows SQL's GROUPING(pr, yr) bitmask (pr = high bit);
    rolled-up keys carry typed sentinels ('(all)' / -1).

    Exactness: totals become integer cents map-side (round_half_away —
    raw float sums are order-dependent at scale), so every SUM is exact
    int64 in any order and the ONE f64 division for the mean is
    bit-identical to the SQL twin. Scale shape: per-block partials for
    all 4 sets at once (pre-aggregated), one coarse exchange."""
    sets = [(True, True), (True, False), (False, True), (False, False)]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "pr": b["o_orderpriority"].to_numpy(object),
            "yr": b["o_orderdate"].dt.year.to_numpy(np.int64),
            "cents": round_half_away(
                b["o_totalprice"].to_numpy(np.float64) * 100.0, 0
            ).astype(np.int64)})
        frames = []
        for use_pr, use_yr in sets:
            ks = [k for k, u in (("pr", use_pr), ("yr", use_yr)) if u]
            if ks:
                g = d.groupby(ks, sort=False, observed=True)["cents"] \
                    .agg(n="size", s="sum").reset_index()
            else:
                g = pd.DataFrame({"n": [len(d)],
                                  "s": [int(d["cents"].sum())]})
            if not use_pr:
                g["pr"] = "(all)"
            if not use_yr:
                g["yr"] = np.int64(-1)
            g["gid"] = np.int64((0 if use_pr else 2) + (0 if use_yr else 1))
            g["n"] = g["n"].astype(np.int64)
            g["s"] = g["s"].astype(np.int64)
            frames.append(g[["pr", "yr", "gid", "n", "s"]])
        out = pd.concat(frames, ignore_index=True)
        return _add_part(out, ["pr", "yr", "gid"], num_parts)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby(
            ["pr", "yr", "gid"], sort=False, observed=True,
            as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
        return pd.DataFrame({
            "o_orderpriority": c["pr"].to_numpy(object),
            "o_year": c["yr"].to_numpy(np.int64),
            "gid": c["gid"].to_numpy(np.int64),
            "count": c["n"].to_numpy(np.int64),
            "sum_cents": c["s"].to_numpy(np.int64),
            "mean_f": c["s"].to_numpy(np.float64)
            / (100.0 * c["n"].to_numpy(np.float64))})

    return bucket_exchange(
        orders.select_columns(["o_orderdate", "o_orderpriority",
                               "o_totalprice"])
        .map_batches(partial, batch_format="pandas"),
        combine, small_partials=True)


PROFILE_SPEC = (("l_quantity", "cents"), ("l_discount", "cents"),
                ("l_extendedprice", "cents"), ("l_returnflag", "str"),
                ("l_linestatus", "str"), ("l_shipdate", "micros"))


def profile_lineitem(ds: ray.data.Dataset,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Column-profiling operator (the deequ/describe data-quality surface
    every ingestion pipeline runs first: per-column row count, null
    count, EXACT distinct count, min/max): every value canonicalizes to
    an exact string key — integer cents for the decimal columns (the
    CLAUDE.md order-exact recipe), epoch microseconds for timestamps,
    the string itself otherwise — so distinct counting needs no hashing
    and min/max stringify identically in both engines. Counts/min/max
    ride one tiny per-batch partial (one row per column per batch);
    distinct counting pre-dedups per batch then counts uniques through
    one value-keyed exchange. Output: (col, n, n_null, n_distinct,
    min_s, max_s)."""
    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.rounding import round_half_away

    def canon(b: pd.DataFrame, col: str, kind: str) -> pd.Series:
        s = b[col]
        if kind == "cents":
            return pd.Series(round_half_away(
                s.to_numpy(np.float64) * 100.0, 0).astype(np.int64)) \
                .map(str)
        if kind == "micros":
            return pd.Series(s.to_numpy("datetime64[us]")
                             .astype(np.int64)).map(str)
        return s.astype(object).reset_index(drop=True)

    def stat_part(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for col, kind in PROFILE_SPEC:
            c = canon(b, col, kind)
            nn = int(b[col].isna().sum())
            if kind == "str":
                mn, mx = (c.min(), c.max()) if len(c) else ("", "")
            else:
                iv = c.map(int)
                mn, mx = ((str(iv.min()), str(iv.max()))
                          if len(c) else ("", ""))
            rows.append({"col": col, "n": len(b), "n_null": nn,
                         "min_s": mn, "max_s": mx})
        d = pd.DataFrame(rows)
        for c2 in ("n", "n_null"):
            d[c2] = d[c2].astype(np.int64)
        d["_part"] = np.zeros(len(d), np.int32)
        return d

    def stat_merge(g: pd.DataFrame) -> pd.DataFrame:
        def mm(s, kind, f):
            if kind == "str":
                return f(s)
            return str(f(s.map(int)))

        out = []
        for col, kind in PROFILE_SPEC:
            gg = g[g["col"] == col]
            out.append({
                "col": col, "n": int(gg["n"].sum()),
                "n_null": int(gg["n_null"].sum()),
                "min_s": mm(gg["min_s"], kind, lambda s: s.min()),
                "max_s": mm(gg["max_s"], kind, lambda s: s.max())})
        d = pd.DataFrame(out)
        for c2 in ("n", "n_null"):
            d[c2] = d[c2].astype(np.int64)
        return d

    stats = bucket_exchange(
        ds.map_batches(stat_part, batch_format="pandas"), stat_merge)

    def dist_part(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col, kind in PROFILE_SPEC:
            u = canon(b, col, kind).drop_duplicates()
            frames.append(pd.DataFrame({
                "col": np.full(len(u), col, object),
                "key": u.to_numpy(object)}))
        d = pd.concat(frames, ignore_index=True)
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(fnv1a64(
                (d["col"] + "\x1f" + d["key"]).to_numpy(object)))
                % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def dist_merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).drop_duplicates() \
            .groupby("col", as_index=False).size() \
            .rename(columns={"size": "nd"})
        c["nd"] = c["nd"].astype(np.int64)
        return c

    dist = bucket_exchange(
        ds.map_batches(dist_part, batch_format="pandas"), dist_merge) \
        .to_pandas().groupby("col", as_index=False)["nd"].sum()

    st = stats.to_pandas().merge(dist, on="col", how="left")
    st["n_distinct"] = st["nd"].fillna(0).astype(np.int64)
    return ray.data.from_pandas(
        st[["col", "n", "n_null", "n_distinct", "min_s", "max_s"]])


DQ_CHECKS = ("not_null_custkey", "unique_orderkey", "positive_price",
             "domain_status", "ref_custkey", "price_cap_50k",
             "fresh_since_1996")


def dq_checks_orders(orders: ray.data.Dataset,
                     customer: ray.data.Dataset,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Data-quality verification suite (the deequ/great-expectations
    check battery every ingestion gate runs; companion to
    profile_lineitem): completeness, key uniqueness, range, domain,
    referential integrity, plus two deliberately tight screens (a price
    cap and a freshness floor) so the violation path is exercised on
    clean data. Row-local checks ride one per-batch partial; uniqueness
    counts key multiplicity through one key-hash exchange; referential
    integrity broadcasts the (small-side) customer key array once via
    ray.put. Output: (check, n_rows, n_violations) — exact integers."""
    from ..functions.hashing import splitmix64

    ck = ray.put(np.unique(np.concatenate(
        [b["c_custkey"].to_numpy()
         for b in customer.select_columns(["c_custkey"])
         .iter_batches(batch_format="pandas", batch_size=65536)]
        or [np.array([], np.int64)])))

    FRESH = np.datetime64("1996-01-01", "us")

    def row_part(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ck)
        n = len(b)
        viol = {
            "not_null_custkey": int(b["o_custkey"].isna().sum()),
            "positive_price":
                int((b["o_totalprice"].to_numpy(np.float64) <= 0).sum()),
            "domain_status":
                int((~b["o_orderstatus"].isin(["O", "F", "P"])).sum()),
            "ref_custkey":
                int((~np.isin(b["o_custkey"].to_numpy(np.int64),
                              keys)).sum()),
            "price_cap_50k":
                int((b["o_totalprice"].to_numpy(np.float64)
                     > 50000.0).sum()),
            "fresh_since_1996":
                int((b["o_orderdate"].to_numpy("datetime64[us]")
                     < FRESH).sum()),
        }
        d = pd.DataFrame({"check": list(viol), "n_rows": n,
                          "n_violations": list(viol.values())})
        for c in ("n_rows", "n_violations"):
            d[c] = d[c].astype(np.int64)
        d["_part"] = np.zeros(len(d), np.int32)
        return d

    def row_merge(g: pd.DataFrame) -> pd.DataFrame:
        o = g.drop(columns=["_part"]).groupby("check", as_index=False) \
            .sum()
        for c in ("n_rows", "n_violations"):
            o[c] = o[c].astype(np.int64)
        return o

    rowchecks = bucket_exchange(
        orders.map_batches(row_part, batch_format="pandas"), row_merge)

    def key_part(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy(np.int64)
        u, c = np.unique(k, return_counts=True)
        d = pd.DataFrame({"k": u, "c": c.astype(np.int64)})
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(u.astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    def key_merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop(columns=["_part"]).groupby("k", as_index=False)[
            "c"].sum()
        return pd.DataFrame({
            "n": np.array([int(s["c"].sum())], np.int64),
            "nk": np.array([len(s)], np.int64)})

    km = bucket_exchange(
        orders.select_columns(["o_orderkey"])
        .map_batches(key_part, batch_format="pandas"),
        key_merge).to_pandas()
    n_total = int(km["n"].sum())
    uniq = pd.DataFrame({
        "check": ["unique_orderkey"],
        "n_rows": np.array([n_total], np.int64),
        "n_violations": np.array([n_total - int(km["nk"].sum())],
                                 np.int64)})
    return rowchecks.union(ray.data.from_pandas(uniq))


def ks_test_orders(orders: ray.data.Dataset, grp_a: str = "1-URGENT",
                   grp_b: str = "5-LOW",
                   bucket_cents: int = 1 << 20) -> ray.data.Dataset:
    """Exact two-sample Kolmogorov-Smirnov statistic (the distribution
    drift test an A/B or data-shift monitor runs): D = sup_x |F_a - F_b|
    over the pooled right-continuous ECDFs, carried as the EXACT integer
    D*n_a*n_b = max_v |cum_a(v)*n_b - cum_b(v)*n_a| on integer-cents
    values. Scale shape: a tiny count pass fixes (n_a, n_b); then one
    range-partitioned exchange (fixed-width cents buckets — ordered
    buckets ARE the scan ranges, the pack_sequences two-level-scan
    recipe): each bucket reduces to its (max, min, argmin-v) of the
    LOCAL cumulative difference — the global offset enters as a per-
    bucket constant, so the driver finishes from <= n_buckets rows.
    Output: n_a, n_b, d_scaled, v_cents (smallest value attaining D),
    ks_permille."""
    from ..functions.rounding import round_half_away

    def cnt_part(b: pd.DataFrame) -> pd.DataFrame:
        pr = b["o_orderpriority"]
        return pd.DataFrame({
            "na": np.array([int((pr == grp_a).sum())], np.int64),
            "nb": np.array([int((pr == grp_b).sum())], np.int64)})

    tot = orders.map_batches(cnt_part, batch_format="pandas").to_pandas()
    n_a, n_b = int(tot["na"].sum()), int(tot["nb"].sum())

    def part(b: pd.DataFrame) -> pd.DataFrame:
        pr = b["o_orderpriority"]
        sel = pr.isin([grp_a, grp_b])
        cents = round_half_away(
            b.loc[sel, "o_totalprice"].to_numpy(np.float64) * 100.0, 0) \
            .astype(np.int64)
        isa = (pr[sel] == grp_a).to_numpy()
        d = pd.DataFrame({"cents": cents,
                          "ca": isa.astype(np.int64),
                          "cb": (~isa).astype(np.int64)})
        g = d.groupby("cents", as_index=False).sum()
        for c in ("ca", "cb"):
            g[c] = g[c].astype(np.int64)
        g["_part"] = (g["cents"].to_numpy(np.int64)
                      // bucket_cents).astype(np.int32)
        return g

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid, gg in g.groupby("_part", sort=True):
            gg = gg.groupby("cents", as_index=False)[["ca", "cb"]].sum() \
                .sort_values("cents", kind="mergesort")
            la = gg["ca"].to_numpy(np.int64).cumsum()
            lb = gg["cb"].to_numpy(np.int64).cumsum()
            diff = la * n_b - lb * n_a
            imax = int(np.argmax(diff))
            imin = int(np.argmin(diff))
            out.append({"pid": int(pid),
                        "ta": int(la[-1]), "tb": int(lb[-1]),
                        "dmax": int(diff[imax]),
                        "vmax": int(gg["cents"].iloc[imax]),
                        "dmin": int(diff[imin]),
                        "vmin": int(gg["cents"].iloc[imin])})
        o = pd.DataFrame(out)
        for c in o.columns:
            o[c] = o[c].astype(np.int64)
        return o

    bs = bucket_exchange(
        orders.select_columns(["o_orderpriority", "o_totalprice"])
        .map_batches(part, batch_format="pandas"),
        bucket_stats).to_pandas().sort_values("pid")
    off_a = np.concatenate([[0], bs["ta"].to_numpy(np.int64)
                            .cumsum()[:-1]])
    off_b = np.concatenate([[0], bs["tb"].to_numpy(np.int64)
                            .cumsum()[:-1]])
    C = off_a * n_b - off_b * n_a
    best_d, best_v = -1, -1
    for i in range(len(bs)):
        for dv, vv in ((abs(C[i] + bs["dmax"].iloc[i]),
                        bs["vmax"].iloc[i]),
                       (abs(C[i] + bs["dmin"].iloc[i]),
                        bs["vmin"].iloc[i])):
            if dv > best_d or (dv == best_d and vv < best_v):
                best_d, best_v = int(dv), int(vv)
    out = pd.DataFrame({
        "n_a": [n_a], "n_b": [n_b], "d_scaled": [best_d],
        "v_cents": [best_v],
        "ks_permille": [best_d * 1000 // max(n_a * n_b, 1)]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def mannwhitney_orders(orders: ray.data.Dataset, grp_a: str = "1-URGENT",
                       grp_b: str = "5-LOW",
                       bucket_cents: int = 1 << 20) -> ray.data.Dataset:
    """Exact Mann-Whitney U (the rank-sum alternative to the t-test a
    metrics pipeline runs on skewed value distributions): tie-averaged
    ranks double to exact integers (2*avgrank(v) = 2*cum_before(v) +
    t(v) + 1), so 2*R_a and both U statistics are exact int64. Same
    range-partitioned two-level scan as ks_test_orders: each ordered
    cents bucket emits its local rank-sum piece plus totals; the global
    offset enters linearly (2*off*ta), so the driver finishes from
    <= n_buckets rows. Output: n_a, n_b, u2_a, u2_b, tie_term
    (sum of t^3 - t, the variance correction)."""
    from ..functions.rounding import round_half_away

    def part(b: pd.DataFrame) -> pd.DataFrame:
        pr = b["o_orderpriority"]
        sel = pr.isin([grp_a, grp_b])
        cents = round_half_away(
            b.loc[sel, "o_totalprice"].to_numpy(np.float64) * 100.0, 0) \
            .astype(np.int64)
        isa = (pr[sel] == grp_a).to_numpy()
        d = pd.DataFrame({"cents": cents,
                          "ca": isa.astype(np.int64),
                          "cb": (~isa).astype(np.int64)})
        g = d.groupby("cents", as_index=False).sum()
        for c in ("ca", "cb"):
            g[c] = g[c].astype(np.int64)
        g["_part"] = (g["cents"].to_numpy(np.int64)
                      // bucket_cents).astype(np.int32)
        return g

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid, gg in g.groupby("_part", sort=True):
            gg = gg.groupby("cents", as_index=False)[["ca", "cb"]].sum() \
                .sort_values("cents", kind="mergesort")
            ca = gg["ca"].to_numpy(np.int64)
            cb = gg["cb"].to_numpy(np.int64)
            t = ca + cb
            before = np.concatenate([[0], t.cumsum()[:-1]])
            local = int((ca * (2 * before + t + 1)).sum())
            out.append({"pid": int(pid), "ta": int(ca.sum()),
                        "tb": int(cb.sum()), "local2r": local,
                        "tie": int((t ** 3 - t).sum())})
        o = pd.DataFrame(out)
        for c in o.columns:
            o[c] = o[c].astype(np.int64)
        return o

    bs = bucket_exchange(
        orders.select_columns(["o_orderpriority", "o_totalprice"])
        .map_batches(part, batch_format="pandas"),
        bucket_stats).to_pandas().sort_values("pid")
    tot = (bs["ta"] + bs["tb"]).to_numpy(np.int64)
    off = np.concatenate([[0], tot.cumsum()[:-1]])
    r2a = int((bs["local2r"].to_numpy(np.int64)
               + 2 * off * bs["ta"].to_numpy(np.int64)).sum())
    n_a, n_b = int(bs["ta"].sum()), int(bs["tb"].sum())
    u2a = r2a - n_a * (n_a + 1)
    out = pd.DataFrame({
        "n_a": [n_a], "n_b": [n_b], "u2_a": [u2a],
        "u2_b": [2 * n_a * n_b - u2a],
        "tie_term": [int(bs["tie"].sum())]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def zonemap_stats(ds: ray.data.Dataset, key_col: str, value_col: str,
                  zone_width: int = 256, pred_lo: int = 45, pred_hi: int = 50,
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Zone-map (min/max data-skipping index) builder + pruning audit —
    the storage-layout primitive behind parquet row-group skipping that
    a 100 TB read plan depends on: zones are fixed ``key_col`` ranges
    (zone = key // zone_width — layout-deterministic, independent of Ray
    block structure), each carrying exact integer (count, min, max) of
    ``value_col``; the audit reports, for the range predicate
    [pred_lo, pred_hi], whether the whole zone is prunable (max < lo or
    min > hi — the standard zone-map disjointness test).

    Per-batch partials pre-aggregate to one row per (zone, block) before
    the only exchange; the output is one row per zone."""
    from ..functions.hashing import splitmix64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        z = (b[key_col].to_numpy(np.int64) // zone_width)
        v = b[value_col].to_numpy(np.float64).astype(np.int64)
        g = pd.DataFrame({"zone": z, "v": v}).groupby("zone", sort=False)["v"]
        out = g.agg(n_rows="count", v_min="min", v_max="max").reset_index()
        for c in ("n_rows", "v_min", "v_max"):
            out[c] = out[c].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            out["_part"] = (splitmix64(out["zone"].to_numpy().astype(np.uint64))
                            % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("zone", sort=False).agg(
            n_rows=("n_rows", "sum"), v_min=("v_min", "min"),
            v_max=("v_max", "max")).reset_index()
        for col in ("n_rows", "v_min", "v_max"):
            c[col] = c[col].astype(np.int64)
        c["prunable"] = ((c["v_max"] < pred_lo) | (c["v_min"] > pred_hi)).astype(np.int64)
        return c

    return bucket_exchange(
        ds.select_columns([key_col, value_col]).map_batches(partial, batch_format="pandas"),
        combine, small_partials=True)


def incremental_stats(base: ray.data.Dataset, delta: ray.data.Dataset,
                      keys: list[str] | str, value_col: str,
                      stats: tuple[str, ...] = ("count", "sum", "mean", "min", "max"),
                      round_to: int | None = 4) -> ray.data.Dataset:
    """Incremental view maintenance for decomposable grouped stats: the
    BASE's per-key moment partials are combined ONCE into a stored-state
    table (the shape a nightly job checkpoints to Parquet), then a delta
    batch merges by UNIONING its per-batch partials with that state
    through one exchange — the base data is never rescanned. The merged
    result is bit-identical to recomputing over base ∪ delta because
    every stat is a function of (n, Σx, Σx², min, max) and integer /
    exact-operand sums are associative (the engine's standing partial
    discipline); the oracle states exactly that equivalence."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    unknown = set(stats) - set(DECOMPOSABLE)
    if unknown:
        raise ValueError(f"non-decomposable stats {unknown}")

    def combine_state(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(keys, sort=False, observed=True).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"),
            mn=("mn", "min"), mx=("mx", "max")).reset_index()
        c["n"] = c["n"].astype(np.int64)
        return c

    base_state = bucket_exchange(
        base.map_batches(_partial_moments(keys, value_col), batch_format="pandas")
            .map_batches(lambda b: _add_part(b, keys), batch_format="pandas"),
        combine_state, small_partials=True).materialize()  # the "stored" state

    delta_partials = delta.map_batches(
        _partial_moments(keys, value_col), batch_format="pandas")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(keys, sort=False, observed=True).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"),
            mn=("mn", "min"), mx=("mx", "max")).reset_index()
        n = c["n"].astype(np.float64)
        out = c[keys].copy()
        vals = {
            "count": c["n"].astype(np.int64),
            "sum": c["s"],
            "mean": c["s"] / n,
            "min": c["mn"],
            "max": c["mx"],
        }
        for st in stats:
            name = "count" if st == "count" else f"{st}_{value_col}"
            col = vals[st]
            if round_to is not None and st != "count":
                col = round_half_away(col, round_to)
            out[name] = col
        return out

    merged = base_state.union(delta_partials).map_batches(
        lambda b: _add_part(b, keys), batch_format="pandas")
    return bucket_exchange(merged, finalize, small_partials=True)


def rle_runs_audit(ds: ray.data.Dataset, key_col: str, cols: list[str],
                   bucket_width: int = 4096,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """RLE layout audit — the storage-planning stat behind "should this
    table be sorted on key_col?": for each audited column, the number of
    value RUNS in ``key_col`` order (what parquet RLE/dictionary pages
    compress to). Distributed two-level scan (the KS-test shape): rows
    bucket by contiguous key range, ONE vectorized sort per bucket
    counts interior runs and captures the bucket's first/last values,
    and the driver stitches ≤ #buckets boundary rows (runs_total =
    Σ interior − Σ[boundary values equal]). ``key_col`` must be unique
    (a total order — run counts under ties are ill-defined)."""
    from ..functions.hashing import splitmix64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_rng"] = (b[key_col].to_numpy(np.int64) // bucket_width)
        old = np.seterr(over="ignore")
        try:
            b["_part"] = (splitmix64(b["_rng"].to_numpy().astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return b

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rng, fr in g.groupby("_rng", sort=False):
            fr = fr.sort_values(key_col, kind="mergesort")
            for c in cols:
                v = fr[c].to_numpy()
                runs = int(1 + (v[1:] != v[:-1]).sum()) if len(v) else 0
                rows.append({"_rng": np.int64(rng), "col": c,
                             "runs": np.int64(runs),
                             "n": np.int64(len(v)),
                             "first": str(v[0]) if len(v) else "",
                             "last": str(v[-1]) if len(v) else ""})
        return pd.DataFrame(rows)

    parts = bucket_exchange(
        ds.select_columns([key_col] + cols).map_batches(partial, batch_format="pandas"),
        per_range).to_pandas()  # ≤ #ranges × #cols rows (counted)
    out_rows = []
    for c in cols:
        pc_ = parts[parts["col"] == c].sort_values("_rng")
        joins = int((pc_["last"].to_numpy(object)[:-1]
                     == pc_["first"].to_numpy(object)[1:]).sum())
        out_rows.append({"col": c,
                         "n_rows": np.int64(pc_["n"].sum()),
                         "n_runs": np.int64(pc_["runs"].sum() - joins)})
    out = pd.DataFrame(out_rows)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_runs"] = out["n_runs"].astype(np.int64)
    return ray.data.from_pandas(out)


def spearman_lineitem(ds: ray.data.Dataset,
                      num_buckets: int = 16) -> ray.data.Dataset:
    """Spearman rank correlation between quantity and discount —
    Pearson on tie-averaged ranks, computed EXACTLY: both columns are
    small-domain integers (quantity 1..50, discount cents 0..10), so
    the doubled average rank of value v is dr(v) = 2·#less + #eq + 1
    from a tiny value histogram (the mannwhitney doubled-rank trick —
    no per-row rank shuffle at any scale), ranks map per row from the
    broadcast histogram, and the correlation's five sufficient sums are
    exact int64. The final ρ is one f64 chain over single-cast exact
    integers (identical both engines); output ·2²⁰-quantized plus the
    raw sums."""
    from ..functions.rounding import round_half_away  # noqa: F401 (doc parity)

    def vals(b: pd.DataFrame) -> pd.DataFrame:
        q = b["l_quantity"].to_numpy(np.float64).astype(np.int64)
        d = round_half_away(b["l_discount"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        out = pd.DataFrame({"q": q, "d": d})
        g = out.groupby(["q", "d"], sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["_part"] = (g["q"].to_numpy(np.int64) % num_buckets).astype(np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["q", "d"], sort=False, as_index=False)["n"].sum()
        c["n"] = c["n"].astype(np.int64)
        return c

    jt = bucket_exchange(
        ds.select_columns(["l_quantity", "l_discount"]).map_batches(
            vals, batch_format="pandas"),
        combine, small_partials=True).to_pandas()  # ≤ 50×11 counted rows

    def doubled_ranks(counts: pd.Series) -> dict[int, int]:
        vs = np.sort(counts.index.to_numpy(np.int64))
        cs = counts.loc[vs].to_numpy(np.int64)
        less = np.concatenate([[0], np.cumsum(cs)[:-1]])
        return {int(v): int(2 * l + c + 1)
                for v, l, c in zip(vs, less, cs)}

    n = int(jt["n"].sum())
    drq = doubled_ranks(jt.groupby("q")["n"].sum())
    drd = doubled_ranks(jt.groupby("d")["n"].sum())
    x = jt["q"].map(drq).to_numpy(np.int64)
    y = jt["d"].map(drd).to_numpy(np.int64)
    w = jt["n"].to_numpy(np.int64)
    sx = int((x * w).sum()); sy = int((y * w).sum())
    sxy = int((x * y * w).sum())
    sx2 = int((x * x * w).sum()); sy2 = int((y * y * w).sum())
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = np.sqrt((float(n) * float(sx2) - float(sx) * float(sx))
                  * (float(n) * float(sy2) - float(sy) * float(sy)))
    rho = num / den if den > 0 else 0.0
    out = pd.DataFrame({
        "n": [np.int64(n)], "sxy": [np.int64(sxy)],
        "sx2": [np.int64(sx2)], "sy2": [np.int64(sy2)],
        "rho_q": [np.int64(np.floor(rho * 1048576.0 + 0.5))]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


CUPED_CUTOFF = "2024-01-15 00:00:00"


def cuped_events(ds: ray.data.Dataset, cutoff: str = CUPED_CUTOFF,
                 num_buckets: int = 32) -> ray.data.Dataset:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM
    2013 — the pre-period covariate adjustment every experimentation
    platform applies): per user, x = pre-cutoff value cents and
    y = post-cutoff cents; θ = cov(x,y)/var(x) pooled over users;
    each hash variant's adjusted mean is ȳ_v − θ·(x̄_v − x̄). Two-level
    exact shape: block partials per (user, period) → one user-keyed
    exchange whose combiner totals users AND pre-aggregates the
    per-bucket sufficient sums (n, Σx, Σy, Σxy, Σx², per-variant n/Σx/Σy
    as arbitrary-precision ints) → ≤ buckets driver rows. Outputs are
    fixed f64 expressions over exact integers, ·2²⁰-quantized."""
    from ..functions.hashing import splitmix64
    from ..functions.rounding import round_half_away

    cut = pd.Timestamp(cutoff).to_datetime64()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy(np.int64)
        pre = b["ts"].to_numpy("datetime64[us]") < cut
        c = round_half_away(b["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        d = pd.DataFrame({"u": u, "x": np.where(pre, c, 0),
                          "y": np.where(pre, 0, c)})
        g = d.groupby("u", sort=False, as_index=False).sum()
        for col in ("x", "y"):
            g[col] = g[col].astype(np.int64)
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(g["u"].to_numpy().astype(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("u", sort=False, as_index=False)[["x", "y"]].sum()
        u = t["u"].to_numpy(np.int64)
        old = np.seterr(over="ignore")
        try:
            var = (splitmix64(u.astype(np.uint64)) % np.uint64(2)).astype(np.int64)
        finally:
            np.seterr(**old)
        x = [int(v) for v in t["x"]]
        y = [int(v) for v in t["y"]]
        rows = {"n": len(t), "sx": sum(x), "sy": sum(y),
                "sxy": sum(a * b for a, b in zip(x, y)),
                "sx2": sum(a * a for a in x)}
        for v in (0, 1):
            m = var == v
            rows[f"n{v}"] = int(m.sum())
            rows[f"sx{v}"] = sum(a for a, mm in zip(x, m) if mm)
            rows[f"sy{v}"] = sum(a for a, mm in zip(y, m) if mm)
        return pd.DataFrame({k: [v] for k, v in rows.items()})

    parts = bucket_exchange(
        ds.select_columns(["user_id", "ts", "value"]).map_batches(
            partial, batch_format="pandas"),
        combine, small_partials=True).to_pandas()
    tot = {c: int(parts[c].sum()) for c in parts.columns if c != "_part"}
    n, sx, sy, sxy, sx2 = (tot["n"], tot["sx"], tot["sy"], tot["sxy"], tot["sx2"])
    theta = ((np.float64(n) * np.float64(sxy) - np.float64(sx) * np.float64(sy))
             / (np.float64(n) * np.float64(sx2) - np.float64(sx) * np.float64(sx)))
    mean_x_all = np.float64(sx) / np.float64(n)

    def adj(v: int) -> np.float64:
        nv = np.float64(tot[f"n{v}"])
        return (np.float64(tot[f"sy{v}"]) / nv
                - theta * (np.float64(tot[f"sx{v}"]) / nv - mean_x_all))

    out = pd.DataFrame({
        "n_users": [np.int64(n)],
        "n_0": [np.int64(tot["n0"])], "n_1": [np.int64(tot["n1"])],
        "theta_q": [np.int64(np.floor(theta * 1048576.0 + 0.5))],
        "adj_diff_q": [np.int64(np.floor((adj(0) - adj(1)) * 1048576.0 + 0.5))]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def emd_drift_orders(orders: ray.data.Dataset,
                     n_bins: int = 10) -> ray.data.Dataset:
    """1-D Wasserstein-1 (earth-mover) distance between the first- and
    second-half order-value distributions — the drift measure PSI can't
    give (PSI ignores WHERE mass moved; W1 weights by bin distance).
    Same bins and date split as psi_drift_orders.

    Exactness: on the bin-index metric, W1 · n_a · n_b = Σ_k
    |CumA_k·n_b − CumB_k·n_a| over the first n_bins−1 dense bins — an
    exact int64 here (counts ≤ ~10⁶ per side at bench scales; a 100 TB
    deployment promotes the products to the >>26/&mask limb pattern).
    Output: one row (n_a, n_b, w1_scaled)."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def scal(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        return pd.DataFrame({"d0": [int(day.min())], "d1": [int(day.max())],
                             "mc": [int(cents.max())]})

    sc = orders.map_batches(scal, batch_format="pandas").to_pandas()
    d0, d1, mc = int(sc["d0"].min()), int(sc["d1"].max()), int(sc["mc"].max())
    mid = (d0 + d1 + 1) // 2

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        bn = np.minimum(n_bins - 1, cents * n_bins // (mc + 1))
        side = (day >= mid).astype(np.int64)
        g = pd.DataFrame({"bin": bn, "side": side}).groupby(
            ["bin", "side"], as_index=False).size().rename(
                columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        g["_part"] = np.zeros(len(g), np.int32)
        return g

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["bin", "side"], as_index=False)["c"].sum()
        ca = np.zeros(n_bins, np.int64)
        cb = np.zeros(n_bins, np.int64)
        for _, r in s.iterrows():  # ≤ 2·n_bins rows
            (ca if r["side"] == 0 else cb)[int(r["bin"])] = int(r["c"])
        na, nb = int(ca.sum()), int(cb.sum())
        cum_a = np.cumsum(ca)[:-1]
        cum_b = np.cumsum(cb)[:-1]
        w1 = int(np.abs(cum_a * nb - cum_b * na).sum())
        return pd.DataFrame({"n_a": [np.int64(na)], "n_b": [np.int64(nb)],
                             "w1_scaled": [np.int64(w1)]})

    return bucket_exchange(
        orders.map_batches(partial, batch_format="pandas"), finalize,
        small_partials=True)
