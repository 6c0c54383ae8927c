"""Mergeable sketches — the optional extension noted in SURVEY.md §2.5
(the reference is all-exact; at 100 TB, distinct counts and quantiles want
mergeable summaries). Round 1 ships HyperLogLog (Flajolet et al. 2007):

- per-batch: one vectorized pass builds a register array (scatter-max of
  leading-zero counts, bucketed by the hash's top bits);
- merge: element-wise max of register arrays — one tiny final combine, the
  "emit one serialized sketch per batch" shape from the Ray guide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, splitmix64


def _hll_ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash — shared by the global and grouped
    HLL paths."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
    # rank = leading zeros of the remaining 64-p bits, + 1
    lz = np.zeros(len(h), np.int64)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz = np.where(mask, lz + shift, lz)
        cur = np.where(mask, cur << np.uint64(shift), cur)
    rank = np.minimum(lz + 1, 64 - p + 1)
    return idx, rank


def _hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    idx, rank = _hll_ranks(h, p)
    regs = np.zeros(m, np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small cardinality
    return float(est)


def hll_distinct(ds: ray.data.Dataset, col: str, precision: int = 12,
                 num_buckets: int = 32) -> float:
    """Approximate distinct count of ``col``: per-batch register partials
    (one sketch row per batch), merged TWO-LEVEL — a bucketed exchange
    element-wise-maxes the per-batch sketches down to ≤ ``num_buckets``
    rows, and only those reach the driver. The old single-level pull was
    O(#batches) sketch rows — 4 KB × a million blocks at 100 TB; the
    merge is commutative max, so any bucket assignment is correct."""
    from .exchange import bucket_exchange

    old = np.seterr(over="ignore")
    try:
        def partial(b: pa.Table) -> pa.Table:
            c = b[col]
            if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
                c = pa.compute.cast(c, pa.string())
            h = splitmix64(fnv1a64(c))
            regs = _hll_registers(h, precision)
            # deterministic spread: bucket from the sketch content itself
            part = int(splitmix64(np.asarray([regs.view(np.uint8).sum()], np.uint64))[0]
                       % np.uint64(num_buckets))
            return pa.table({"regs": pa.array([regs], pa.list_(pa.int8())),
                             "_part": pa.array([part], pa.int32())})

        def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
            m = np.maximum.reduce([np.asarray(r, np.int8) for r in g["regs"]])
            return pd.DataFrame({"regs": [m]})

        sketches = bucket_exchange(
            ds.map_batches(partial, batch_format="pyarrow"), merge_bucket,
            small_partials=True,
        ).to_pandas()
    finally:
        np.seterr(**old)
    if sketches.empty:  # empty input: zero registers -> linear-counting 0
        return 0.0
    merged = np.maximum.reduce([np.asarray(r, np.int8) for r in sketches["regs"]])
    return _hll_estimate(merged)


# --- Count-Min sketch --------------------------------------------------------

def _cms_seeds(depth: int) -> np.ndarray:
    return splitmix64(np.arange(1, depth + 1).astype(np.uint64))


def _cms_index(keys, seeds: np.ndarray, width: int) -> np.ndarray:
    """depth × n cell indices for string keys (fnv1a64 → per-row xor seed →
    splitmix64 finalize → low bits; CLAUDE.md: never raw FNV low bits)."""
    h = splitmix64(fnv1a64(keys))
    old = np.seterr(over="ignore")
    try:
        return np.stack([
            (splitmix64(h ^ seeds[j]) % np.uint64(width)).astype(np.int64)
            for j in range(len(seeds))
        ])
    finally:
        np.seterr(**old)


def cms_counts(ds: ray.data.Dataset, col: str, probes: list, width: int = 1024,
               depth: int = 4, num_buckets: int = 32) -> pd.DataFrame:
    """Count-Min sketch point queries (Cormode & Muthukrishnan 2005): per-
    batch depth×width count matrices (vectorized bincount per row), merged
    two-level — a bucketed-exchange SUM collapses the per-batch partials to
    ≤ ``num_buckets`` matrices before the driver's final sum — then
    ``est = min_j M[j, h_j(key)]`` for each PROBE key. Estimates never
    undercount; overcount ≤ 2N/width with prob ≥ 1-2^-depth.

    Probes are an explicit bounded list (broadcast-sized by contract):
    data-dependent candidate generation (per-block top-k) would make the
    result depend on Ray's block structure — the cluster-reproducibility
    bug class the stratified sampler fixed in round 2."""
    from .exchange import bucket_exchange

    seeds = _cms_seeds(depth)

    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
            c = pa.compute.cast(c, pa.string())
        idx = _cms_index(c, seeds, width)
        M = np.zeros((depth, width), np.int64)
        for j in range(depth):
            M[j] = np.bincount(idx[j], minlength=width)
        flat = M.ravel()
        old = np.seterr(over="ignore")
        try:
            part = int(splitmix64(np.asarray([flat.sum()], np.int64).view(np.uint64))[0]
                       % np.uint64(num_buckets))
        finally:
            np.seterr(**old)
        return pa.table({"cnt": pa.array([flat], pa.list_(pa.int64())),
                         "_part": pa.array([part], pa.int32())})

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = np.sum([np.asarray(r, np.int64) for r in g["cnt"]], axis=0)
        return pd.DataFrame({"cnt": [m]})

    merged = bucket_exchange(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        merge_bucket, small_partials=True,
    ).to_pandas()
    if merged.empty:  # empty input: all-zero counts
        merged = pd.DataFrame({"cnt": [np.zeros(depth * width, np.int64)]})
    M = np.sum([np.asarray(r, np.int64) for r in merged["cnt"]], axis=0).reshape(depth, width)
    pidx = _cms_index(np.asarray([str(p) for p in probes], object), seeds, width)
    est = M[np.arange(depth)[:, None], pidx].min(axis=0)
    return pd.DataFrame({col: probes, "est_count": est.astype(np.int64)})


# --- Bloom filter semi-join ---------------------------------------------------

def bloom_auto_bits(n_keys: int, bits_per_key: int = 8) -> int:
    """Size the bitmap from a COUNTED build side: the smallest power of two
    ≥ bits_per_key × n_keys (min 64).  A fixed m saturates as the build
    side grows (at 8× the keys of its design point the filter passes ~all
    probes); deriving m from a count keeps the FP rate flat at any scale.
    Integer loop on purpose — the SQL twin picks MIN(p ≥ b·n) from a
    powers-of-two VALUES list, and a float CEIL(LOG2(...)) on either side
    could land a ulp across an integer boundary at large n."""
    m = 64
    target = bits_per_key * max(int(n_keys), 1)
    while m < target:
        m <<= 1
    return m


def bloom_build(ds: ray.data.Dataset, col: str, m_bits: int = 2048,
                k: int = 3, num_buckets: int = 32) -> np.ndarray:
    """Build a Bloom filter (Bloom 1970) over ``col``: per-batch bitmap
    partials (vectorized scatter-OR of the k cell positions), merged
    TWO-LEVEL exactly like ``hll_distinct`` — a bucketed exchange ORs the
    per-batch bitmaps down to ≤ ``num_buckets`` rows, only those reach the
    driver.  Returns the packed ``m_bits/64``-word uint64 bitmap.

    The position chain is the CMS chain (``_cms_index``): splitmix64(
    fnv1a64(key)) xor seed_j → splitmix64 → low bits — the double finalize
    keeps sequential keys unbiased (CLAUDE.md round-1 finding).  m_bits
    must be a power of two so the SQL twin can mask instead of mod."""
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    seeds = _cms_seeds(k)
    nwords = m_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
            c = pa.compute.cast(c, pa.string())
        pos = _cms_index(c, seeds, m_bits).ravel()
        w = np.zeros(nwords, np.uint64)
        np.bitwise_or.at(w, pos >> 6,
                         np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
        old = np.seterr(over="ignore")
        try:
            part = int(splitmix64(np.asarray([w.sum()], np.uint64))[0]
                       % np.uint64(num_buckets))
        finally:
            np.seterr(**old)
        return pa.table({"bits": pa.array([w.view(np.int64)], pa.list_(pa.int64())),
                         "_part": pa.array([part], pa.int32())})

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = np.bitwise_or.reduce([np.asarray(r, np.int64) for r in g["bits"]])
        return pd.DataFrame({"bits": [m]})

    from .exchange import bucket_exchange

    merged = bucket_exchange(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        merge_bucket, small_partials=True,
    ).to_pandas()
    if merged.empty:  # empty build side: a valid all-zeros filter (nothing passes)
        return np.zeros(nwords, np.uint64)
    return np.bitwise_or.reduce(
        [np.asarray(r, np.int64) for r in merged["bits"]]
    ).view(np.uint64)


def bloom_probe(ds: ray.data.Dataset, col: str, words: np.ndarray,
                m_bits: int, k: int = 3) -> ray.data.Dataset:
    """Filter ``ds`` to the rows whose ``col`` the Bloom filter MAY contain
    (true members + a deterministic false-positive set — never a false
    negative).  This is the shuffle-free semi-join pre-filter: the build
    side's bitmap is broadcast (captured here — at 2 KB it ships with the
    task spec; ``ray.put`` the array and pass the ref for multi-MB filters)
    and the probe side streams through a stateless vectorized map_batches,
    so a join whose build side has millions of keys costs the big side no
    exchange at all; survivors (a few %) go on to the exact join."""
    seeds = _cms_seeds(k)
    w = np.ascontiguousarray(words, np.uint64)

    def fil(b: pa.Table) -> pa.Table:
        c = b[col]
        if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
            c = pa.compute.cast(c, pa.string())
        pos = _cms_index(c, seeds, m_bits)
        hit = (w[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        return b.filter(pa.array(hit.astype(bool).all(axis=0)))

    return ds.map_batches(fil, batch_format="pyarrow")


# --- Histogram quantile sketch ------------------------------------------------

def hist_quantiles(ds: ray.data.Dataset, group_col: str, col: str,
                   lo: float = 0.0, width: float = 64.0, nbins: int = 2048,
                   qs: tuple = (0.25, 0.5, 0.75, 0.99)) -> ray.data.Dataset:
    """Approximate grouped quantiles from a fixed-bin histogram sketch —
    the mergeable alternative to ``grouped_holistic``'s exact O(dataset)
    value exchange: per-batch (group, bin, cnt) partials (one vectorized
    groupby), a coarse bucketed exchange SUMs them (≤ groups×nbins small
    rows move), and the quantile finalizes INSIDE the combiner from the
    cumulative counts with linear within-bin interpolation
    (est = lo + bin·width + width·(q·N − cum_before)/cnt_bin — the textbook
    grouped-histogram estimator).  Error ≤ width/2 per estimate; all
    arithmetic is integer counts + one identical f64 chain, so the DuckDB
    twin (window SUM + QUALIFY first-bin pick) is bit-exact."""
    from .agg import _add_part
    from .exchange import bucket_exchange
    from ..functions.rounding import round_half_away

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[col].to_numpy(np.float64)
        bins = np.clip(np.floor((x - lo) / width), 0, nbins - 1).astype(np.int64)
        out = pd.DataFrame({group_col: b[group_col].to_numpy(), "bin": bins})
        return (out.groupby([group_col, "bin"], sort=False, observed=True)
                   .size().rename("cnt").reset_index())

    parted = ds.map_batches(partial, batch_format="pandas").map_batches(
        lambda b: _add_part(b, [group_col]), batch_format="pandas"
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_col, sort=False, observed=True):
            c = grp.groupby("bin", observed=True)["cnt"].sum().sort_index()
            bins = c.index.to_numpy(np.int64)
            counts = c.to_numpy(np.int64)
            cum = np.cumsum(counts)
            n = cum[-1]
            row = {group_col: key}
            for q in qs:
                t = q * float(n)
                i = int(np.searchsorted(cum, t, side="left"))
                cprev = float(cum[i] - counts[i])
                est = lo + float(bins[i]) * width + width * (t - cprev) / float(counts[i])
                row[f"q{int(round(q * 100))}"] = round_half_away(est, 6)
            rows.append(row)
        return pd.DataFrame(rows)

    return bucket_exchange(parted, combine, small_partials=True)


# --- Misra-Gries frequent items ----------------------------------------------

def _mg_cap(counts: pd.Series, capacity: int) -> tuple[pd.Series, int]:
    """Cap a key→count summary at ``capacity`` counters (Misra & Gries 1982
    merge step, Agarwal et al. 2012 'Mergeable Summaries' Lemma 1): subtract
    the (capacity+1)-th largest count from every counter and drop the
    non-positive ones. Returns (capped summary, amount subtracted)."""
    if len(counts) <= capacity:
        return counts, 0
    sub = int(np.partition(counts.to_numpy(np.int64), -(capacity + 1))[-(capacity + 1)])
    kept = counts - sub
    return kept[kept > 0], sub


def mg_heavy_hitters(ds: ray.data.Dataset, col: str, capacity: int = 4096,
                     min_count: int = 1, num_buckets: int = 32) -> pd.DataFrame:
    """Frequent-items summary (Misra & Gries 1982; mergeable form: Agarwal
    et al., PODS 2012) — the candidate-GENERATING complement of
    ``cms_counts`` (CMS answers point queries for a known probe list; MG
    surfaces the heavy keys themselves with a deterministic error bound).

    Shape: per-batch exact ``value_counts`` capped to ``capacity`` counters
    (vectorized; one np.partition for the eviction threshold), two-level
    merge exactly like ``cms_counts`` — a bucketed exchange sums+caps the
    per-batch summaries down to ≤ ``num_buckets`` rows-of-summaries, the
    driver merges those. Every level keeps ≤ capacity counters, so the
    exchange moves ≤ capacity × #blocks tiny (key, cnt) rows and the driver
    pull is ≤ capacity × num_buckets regardless of dataset size.

    Guarantees (any merge tree): ``est ≤ true ≤ est + err`` where the
    returned scalar ``err`` ≤ N/(capacity+1), and every key with
    ``true > err`` is present. When ``capacity ≥`` the column's distinct
    count nothing is ever evicted → err = 0 and counts are EXACT (the
    strict-oracle regime; the approximate regime's exact VALUES — unlike
    its bounds — depend on block structure, same caveat the CMS docstring
    makes about per-block candidate generation).

    Returns a pandas DataFrame (col, est_count) for keys with
    ``est_count ≥ min_count``, plus ``.attrs['err']`` = the global bound.
    """
    from .exchange import bucket_exchange

    def partial(b: pa.Table) -> pd.DataFrame:
        c = b[col]
        if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
            c = pa.compute.cast(c, pa.string())
        vc = c.to_pandas().value_counts()  # exact per-batch counts
        capped, sub = _mg_cap(vc, capacity)
        n_evicted = len(vc) - len(capped)
        old = np.seterr(over="ignore")
        try:
            part = int(splitmix64(fnv1a64(np.asarray(
                [f"{len(capped)}:{int(capped.sum()) if len(capped) else 0}"], object)))[0]
                % np.uint64(num_buckets))
        finally:
            np.seterr(**old)
        out = pd.DataFrame({"k": capped.index.astype(str), "cnt": capped.to_numpy(np.int64),
                            "is_err": False})
        # one bookkeeping row per summary carries the accumulated error
        # bound (the scalar subtracted from every counter at each cap)
        out = pd.concat([out, pd.DataFrame({"k": [""], "cnt": [sub], "is_err": [True]})],
                        ignore_index=True)
        out["_part"] = np.int32(part)
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        err = int(g.loc[g["is_err"], "cnt"].sum())
        kv = g[~g["is_err"]].groupby("k", sort=False)["cnt"].sum()
        capped, sub = _mg_cap(kv, capacity)
        out = pd.DataFrame({"k": capped.index, "cnt": capped.to_numpy(np.int64),
                            "is_err": False})
        return pd.concat([out, pd.DataFrame({"k": [""], "cnt": [err + sub],
                                             "is_err": [True]})], ignore_index=True)

    merged = bucket_exchange(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        merge_bucket, small_partials=True,
    ).to_pandas()
    if merged.empty:
        merged = pd.DataFrame({"k": pd.Series([], dtype=str),
                               "cnt": pd.Series([], dtype=np.int64),
                               "is_err": pd.Series([], dtype=bool)})
    err = int(merged.loc[merged["is_err"], "cnt"].sum())
    kv = merged[~merged["is_err"]].groupby("k", sort=False)["cnt"].sum()
    final, sub = _mg_cap(kv, capacity)
    err += sub
    final = final[final >= min_count]
    out = pd.DataFrame({col: final.index.astype(str), "est_count": final.to_numpy(np.int64)})
    out = out.sort_values(["est_count", col], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    out.attrs["err"] = err
    return out


def hll_distinct_grouped(ds: ray.data.Dataset, group_col: str, col: str,
                         precision: int = 12,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """Approximate distinct count of ``col`` PER GROUP — the grouped form
    of ``hll_distinct`` (distinct users per event type, distinct URLs per
    host): the sketch that replaces an exact COUNT(DISTINCT) all-to-all
    at corpus scale.

    Scale shape: per batch, one vectorized pass reduces to SPARSE
    (group, idx, reg) partial rows (≤ groups × m per block, pre-maxed),
    ONE bucketed exchange on hash(group) max-merges them, and the
    combiner estimates per real group — no dense m-length register
    vector ever ships, and the driver sees nothing.

    Oracle parity: the register content is deterministic (the proven
    splitmix64∘fnv1a64 + LOG2-floor rank twin of ``hll_distinct_urls``);
    the harmonic sum is computed EXACTLY as the integer
    Σ 2^(53−reg) + (m − n_present)·2^53 (Python ints / HUGEINT — the
    global sketch's float Σ 2^−reg is order-dependent at the ulp level,
    masked there by ROUND(·,1); with many groups that dice-roll
    multiplies, so the grouped path is exact by construction), then ONE
    identical f64 chain both sides."""
    from ..functions.hashing import fnv1a64
    from .exchange import bucket_exchange

    m = 1 << precision
    old = np.seterr(over="ignore")
    try:
        def partial(b: pa.Table) -> pd.DataFrame:
            c = b[col]
            if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
                c = pa.compute.cast(c, pa.string())
            h = splitmix64(fnv1a64(c))
            idx, rank = _hll_ranks(h, precision)
            grp = b[group_col].to_pandas().to_numpy()
            g = (pd.DataFrame({group_col: grp, "idx": idx, "rank": rank})
                 .groupby([group_col, "idx"], sort=False)["rank"].max()
                 .reset_index(name="reg"))
            gk = g[group_col].to_numpy()
            if gk.dtype == object or str(gk.dtype).startswith("str"):
                gh = splitmix64(fnv1a64(gk.astype(object)))
            else:
                gh = splitmix64(gk.astype(np.uint64))
            g["_part"] = (gh % np.uint64(num_buckets)).astype(np.int32)
            return g
    finally:
        np.seterr(**old)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        r = (g.groupby([group_col, "idx"], sort=False)["reg"].max()
             .reset_index())
        alpha = 0.7213 / (1.0 + 1.079 / m)
        rows = []
        for grp, sub in r.groupby(group_col, sort=False):
            regs = sub["reg"].to_numpy(np.int64)
            n = len(regs)
            ssc = int((np.ones(n, dtype=object) << (53 - regs)).sum()) \
                + (m - n) * (1 << 53)
            zeros = m - n
            ssf = float(ssc) / 9007199254740992.0
            est = alpha * m * m / ssf
            if est <= 2.5 * m and zeros > 0:
                est = m * np.log(float(m) / zeros)
            rows.append((grp, float(est)))
        out = pd.DataFrame(rows, columns=[group_col, "approx_distinct"])
        from ..functions.rounding import round_half_away
        out["approx_distinct"] = round_half_away(
            out["approx_distinct"].to_numpy(np.float64), 1)
        return out

    parted = ds.select_columns([group_col, col]).map_batches(
        partial, batch_format="pyarrow")
    return bucket_exchange(parted, combine, small_partials=True)


# --- KMV (k-minimum-values) distinct sketch ---------------------------------

def kmv_distinct_grouped(ds: ray.data.Dataset, group_col: str, col: str,
                         k: int = 32, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-group KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002;
    the mergeable "k minimum hash values" summary): per batch, hash the
    values and keep the k smallest DISTINCT hashes per group; one bucketed
    exchange unions the per-batch bottom-k sets and re-takes the bottom-k
    (the global bottom-k of a union is always contained in the union of
    per-part bottom-k's, so the two-level merge is exact). Estimate:
    ``(k-1) * 2^64 / kth_min`` — every term is an exactly-representable
    f64 (k-1 times a power of two; uint64→f64 casts are correctly
    rounded), so the oracle twin recomputes it bit-identically.

    Groups with fewer than k distinct values report their EXACT count
    (standard KMV small-set convention) — same CASE on the SQL side.

    Scale shape: per-batch partials are ≤ k rows per (group, block); the
    exchange moves O(groups × blocks × k) tiny rows and nothing reaches
    the driver. Complements the HLL register sketch above: KMV additionally
    supports set-operation estimates (see ``kmv_overlap_pairs``)."""
    from .exchange import bucket_exchange

    def _bottom_k(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates([group_col, "h"])
        d = d.sort_values("h", kind="mergesort")
        return d.groupby(group_col, sort=False).head(k)

    old = np.seterr(over="ignore")
    try:
        def partial(b: pa.Table) -> pd.DataFrame:
            c = b[col]
            if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
                c = pa.compute.cast(c, pa.string())
            h = splitmix64(fnv1a64(c))
            d = _bottom_k(pd.DataFrame({
                group_col: b[group_col].to_pandas().to_numpy(), "h": h}))
            gk = d[group_col].to_numpy()
            gh = (splitmix64(fnv1a64(gk.astype(object)))
                  if gk.dtype == object else splitmix64(gk.astype(np.uint64)))
            d = d.copy()
            d["_part"] = (gh % np.uint64(num_buckets)).astype(np.int32)
            return d
    finally:
        np.seterr(**old)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        top = _bottom_k(g.drop(columns=["_part"]))
        a = top.groupby(group_col, as_index=False, sort=False).agg(
            n_mins=("h", "size"), kth=("h", "max"))
        n = a["n_mins"].to_numpy(np.int64)
        kth = a["kth"].to_numpy(np.uint64)
        with np.errstate(divide="ignore"):
            est = np.where(
                n < k, n.astype(np.float64),
                (np.float64(k - 1) * 18446744073709551616.0)
                / kth.astype(np.float64))
        return pd.DataFrame({
            group_col: a[group_col].to_numpy(),
            "n_mins": n,
            "kth_hash": kth.view(np.int64),
            "est_distinct": est,
        })

    parted = ds.select_columns([group_col, col]).map_batches(
        partial, batch_format="pyarrow")
    return bucket_exchange(parted, combine, small_partials=True)


def kmv_overlap_pairs(ds: ray.data.Dataset, group_col: str, col: str,
                      k: int = 32, num_buckets: int = 32) -> ray.data.Dataset:
    """KMV set-operation estimates for every unordered pair of groups:
    |A ∪ B| and |A ∩ B| from the groups' bottom-k sketches alone (Beyer
    et al. 2007 — the classic KMV union/intersection estimator). The
    bottom-k of A ∪ B is computable exactly from bottom-k(A) ∪ bottom-k(B);
    the intersection estimate is (common minima / n_u) · est_union.

    Two exchanges: (1) the same per-group bottom-k merge as
    ``kmv_distinct_grouped`` but emitting the sketch ROWS, (2) a
    single-bucket combine over the ≤ groups×k sketch rows that forms the
    pairwise estimates — nothing data-sized ever reaches the driver and
    the pair combine sees only sketches (at 100 TB the full per-group
    member sets never exist anywhere).

    Float discipline for the oracle twin: est_union is the exact-operand
    division used by ``kmv_distinct_grouped``; est_inter is
    (common / n_u) * est_union with the same left-to-right association
    in SQL."""
    from .exchange import bucket_exchange

    def _bottom_k(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates([group_col, "h"])
        d = d.sort_values("h", kind="mergesort")
        return d.groupby(group_col, sort=False).head(k)

    old = np.seterr(over="ignore")
    try:
        def partial(b: pa.Table) -> pd.DataFrame:
            c = b[col]
            if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
                c = pa.compute.cast(c, pa.string())
            h = splitmix64(fnv1a64(c))
            d = _bottom_k(pd.DataFrame({
                group_col: b[group_col].to_pandas().to_numpy(), "h": h}))
            gk = d[group_col].to_numpy()
            gh = (splitmix64(fnv1a64(gk.astype(object)))
                  if gk.dtype == object else splitmix64(gk.astype(np.uint64)))
            d = d.copy()
            d["_part"] = (gh % np.uint64(num_buckets)).astype(np.int32)
            return d
    finally:
        np.seterr(**old)

    def combine_rows(g: pd.DataFrame) -> pd.DataFrame:
        top = _bottom_k(g.drop(columns=["_part"])).copy()
        top["_part"] = np.zeros(len(top), np.int32)
        return top[[group_col, "h", "_part"]]

    sketch_rows = bucket_exchange(
        ds.select_columns([group_col, col]).map_batches(
            partial, batch_format="pyarrow"),
        combine_rows, small_partials=True)

    def pairwise(g: pd.DataFrame) -> pd.DataFrame:
        sets = {t: np.sort(sub["h"].to_numpy(np.uint64))
                for t, sub in g.groupby(group_col, sort=True)}
        names = sorted(sets)
        rows = []
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                u = np.union1d(sets[a], sets[b])
                m = u[:k]
                n_u = len(m)
                kth = np.uint64(m[-1])
                if n_u < k:
                    est_union = np.float64(n_u)
                else:
                    est_union = (np.float64(k - 1) * 18446744073709551616.0
                                 ) / np.float64(kth)
                common = int((np.isin(m, sets[a]) & np.isin(m, sets[b])).sum())
                est_inter = (np.float64(common) / np.float64(n_u)) * est_union
                rows.append((a, b, np.int64(n_u), np.int64(common),
                             float(est_union), float(est_inter)))
        return pd.DataFrame(
            rows, columns=["type_a", "type_b", "n_mins", "n_common_mins",
                           "est_union", "est_inter"])

    return bucket_exchange(sketch_rows, pairwise, small_partials=True)


def ams_f2(ds: ray.data.Dataset, col: str, k: int = 16, group: int = 4,
           num_buckets: int = 16) -> ray.data.Dataset:
    """AMS second-frequency-moment (F2 = Σ f(x)²) sketch (Alon, Matias &
    Szegedy 1996): k sign estimators Z_j = Σ_rows s_j(x) with s_j ∈ {±1}
    drawn from the CMS hash chain (fnv1a64 → xor seed_j → splitmix64 →
    low bit; CLAUDE.md: never raw FNV low bits), estimate = median of
    means of Z_j² over k/group groups. E[Z²] = F2 exactly; the sketch is
    mergeable (Z sums), so per-batch partials collapse through ONE
    estimator-keyed exchange and the driver sees exactly k rows.

    Exactness: Z, Z² and the group sums S_g are integers; with
    group = 4 the final estimate (loS + hiS)/8 is a dyadic division —
    bit-exact f64 both sides. Worst-case S_g < group·n² needs n < 2³¹
    rows for int64; beyond that, limb-split the Z² sums (neyman
    pattern)."""
    from .exchange import bucket_exchange

    assert k % group == 0 and (2 * group) & (2 * group - 1) == 0
    seeds = _cms_seeds(k)

    def partial(b: pa.Table) -> pd.DataFrame:
        c = b[col]
        if not (pa.types.is_string(c.type) or pa.types.is_binary(c.type)):
            c = pa.compute.cast(c, pa.string())
        h = splitmix64(fnv1a64(c))
        old = np.seterr(over="ignore")
        try:
            z = np.array([
                int(np.where((splitmix64(h ^ seeds[j])
                              & np.uint64(1)) == 1, 1, -1).sum())
                for j in range(k)], np.int64)
        finally:
            np.seterr(**old)
        return pd.DataFrame({"j": np.arange(k, dtype=np.int64), "z": z,
                             "_part": (np.arange(k) % num_buckets)
                             .astype(np.int32)})

    merged = bucket_exchange(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        lambda g: g.drop(columns=["_part"]).groupby("j", as_index=False)
        ["z"].sum().astype({"z": np.int64}),
        small_partials=True).to_pandas()  # exactly k rows — counted bound
    full = pd.DataFrame({"j": np.arange(k, dtype=np.int64)})
    full = full.merge(merged, on="j", how="left")
    z = [int(v) for v in full["z"].fillna(0).to_numpy(np.int64)]
    sg = sorted(sum(z[j] * z[j] for j in range(g * group, (g + 1) * group))
                for g in range(k // group))
    n = len(sg)
    m2 = sg[(n - 1) // 2] + sg[n // 2]
    assert m2 < 2 ** 63, "limb-split needed"
    f2 = float(np.float64(m2) / np.float64(2 * group))
    out = pd.DataFrame({"est_id": np.arange(k, dtype=np.int64),
                        "z": np.asarray(z, np.int64)})
    out["z2"] = out["z"] * out["z"]
    out["f2_est"] = np.float64(f2)
    return ray.data.from_pandas(out)


def bloom_zone_prune(orders: ray.data.Dataset, zone_width: int = 4096,
                     m_bits: int = 4096, k: int = 3, n_probes: int = 20,
                     num_buckets: int = 32) -> ray.data.Dataset:
    """Per-zone Bloom pruning audit — the point-lookup leg of the
    storage-pruning family (zonemap = range predicates, learned index =
    positions, Bloom = membership): per o_orderkey zone, a Bloom over
    the zone's o_custkey values decides which zones a point lookup must
    scan; the audit compares Bloom hits against exact membership per
    probe (false positives are the filter's deterministic contract —
    misses are PROVEN skips).

    Scale shape: probe POSITIONS are ≤ n_probes·k constants, so batches
    emit only distinct (zone, probe-position-covered) and (zone,
    probe-key-present) partial rows — never the m-bit bitmaps, never
    non-probe positions; one zone-keyed exchange, output n_probes rows."""
    from .exchange import bucket_exchange

    seeds = _cms_seeds(k)
    probe_keys = np.arange(n_probes, dtype=np.int64)
    P = _cms_index(np.array([str(x) for x in probe_keys], object),
                   seeds, m_bits)  # [k, n_probes]
    probe_pos = np.unique(P.ravel())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        zone = (b["o_orderkey"].to_numpy(np.int64) // zone_width)
        keys = b["o_custkey"].to_numpy(np.int64)
        pos = _cms_index(np.array([str(x) for x in keys], object),
                         seeds, m_bits)  # [k, n]
        frames = []
        for j in range(k):
            sel = np.isin(pos[j], probe_pos)
            if sel.any():
                frames.append(pd.DataFrame({
                    "zone": zone[sel], "val": pos[j][sel],
                    "is_key": np.int64(0)}))
        km = np.isin(keys, probe_keys)
        if km.any():
            frames.append(pd.DataFrame({"zone": zone[km], "val": keys[km],
                                        "is_key": np.int64(1)}))
        if not frames:
            return pd.DataFrame({"zone": pd.Series([], dtype=np.int64),
                                 "val": pd.Series([], dtype=np.int64),
                                 "is_key": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        out = pd.concat(frames, ignore_index=True).drop_duplicates()
        out["_part"] = (out["zone"] % num_buckets).astype(np.int32)
        return out

    # total zone count needs every zone, including ones with no probe
    # overlap: a second tiny partial (distinct zones per batch)
    def zone_partial(b: pd.DataFrame) -> pd.DataFrame:
        z = np.unique(b["o_orderkey"].to_numpy(np.int64) // zone_width)
        return pd.DataFrame({"zone": z, "_part": np.int32(0)})

    def zone_combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_zones": [np.int64(g["zone"].nunique())]})

    n_zones = int(bucket_exchange(
        orders.map_batches(zone_partial, batch_format="pandas"),
        zone_combine, small_partials=True).to_pandas()["n_zones"].iloc[0])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for zone, fr in g.groupby("zone", sort=False):
            posset = set(fr.loc[fr["is_key"] == 0, "val"].tolist())
            keyset = set(fr.loc[fr["is_key"] == 1, "val"].tolist())
            for q in range(n_probes):
                hit = all(int(P[j, q]) in posset for j in range(k))
                present = int(probe_keys[q]) in keyset
                if hit or present:
                    rows.append({"probe_key": int(probe_keys[q]),
                                 "hit": int(hit), "present": int(present)})
        if not rows:
            return pd.DataFrame({"probe_key": pd.Series([], dtype=np.int64),
                                 "hit": pd.Series([], dtype=np.int64),
                                 "present": pd.Series([], dtype=np.int64)})
        out = pd.DataFrame(rows)
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    per_zone = bucket_exchange(
        orders.map_batches(partial, batch_format="pandas"), combine)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("probe_key", as_index=False).agg(
            n_hit=("hit", "sum"), n_present=("present", "sum"))
        s["_part"] = np.int32(0)
        return s

    def final_combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop(columns=["_part"]).groupby(
            "probe_key", as_index=False).sum()
        full = pd.DataFrame({"probe_key": np.arange(len(probe_keys),
                                                    dtype=np.int64)})
        s = full.merge(s, on="probe_key", how="left").fillna(0)
        out = pd.DataFrame({
            "probe_key": s["probe_key"].astype(np.int64),
            "n_zones": np.full(len(s), n_zones, np.int64),
            "n_hit": s["n_hit"].astype(np.int64),
            "n_present": s["n_present"].astype(np.int64)})
        out["n_false_pos"] = (out["n_hit"] - out["n_present"]).astype(np.int64)
        return out

    return bucket_exchange(per_zone.map_batches(final, batch_format="pandas"),
                           final_combine, small_partials=True)
