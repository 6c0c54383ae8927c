"""Sampling / splitting — train_test_split analogue (learning.py:640-641).

The reference splits with sklearn's seeded row shuffle; at cluster scale a
row-position shuffle is not stable under repartitioning, so the engine
splits by KEY HASH: ``split = 'test' if splitmix64(fnv1a64(key) ^ seed)
% 10_000 < test_frac·10_000 else 'train'`` — deterministic per key on any
worker, any retry, any partitioning (SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, splitmix64


def train_test_split_by_key(
    ds: ray.data.Dataset, key: str, test_frac: float = 0.25, seed: int = 0
) -> ray.data.Dataset:
    """Adds a ``split`` column ('train'/'test'), hash-derived from ``key``."""
    cut = np.uint64(int(test_frac * 10_000))

    def fn(b: pa.Table) -> pa.Table:
        key_col = b[key]
        if not (pa.types.is_string(key_col.type) or pa.types.is_binary(key_col.type)):
            key_col = pa.compute.cast(key_col, pa.string())
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(fnv1a64(key_col) ^ splitmix64(np.full(len(b), seed + 1, np.uint64)))
        finally:
            np.seterr(**old)
        is_test = (h % np.uint64(10_000)) < cut
        split = np.where(is_test, "test", "train")
        return b.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: ray.data.Dataset, key_col: str, weight_col: str, k: int = 50,
    seed: int = 0,
) -> ray.data.Dataset:
    """Distributed weighted sampling without replacement (Efraimidis &
    Spirakis 2006): each row draws ``u ∈ (0,1]`` from an ID-HASH (the
    block-structure-invariant draw class — stratified_sample's round-2
    fix), scores ``skey = ln(u)/w`` (the monotone twin of ``u^(1/w)``),
    and the sample is the global top-k by ``skey``.  P(row selected) ∝
    weight, deterministic on any partitioning, any retry, any cluster.

    Per-batch argpartition bounds the exchange to ≤ k rows per block;
    the global sort runs over those k·#blocks partials only.  ``key_col``
    must be unique (duplicate keys draw identical u — a boundary tie
    would make top-k order-dependent).  Oracle note: LN is the one
    cross-engine libm call; a ulp flip at the k-th boundary has
    probability ~n·ulp/gap ≈ 1e-10 (same accepted class as the S2
    oracle's sin/cos note)."""
    kn = int(k)
    sm_seed = splitmix64(np.asarray([seed + 1], np.uint64))[0]

    def partial(b: pa.Table) -> pa.Table:
        kc = b[key_col]
        if not (pa.types.is_string(kc.type) or pa.types.is_binary(kc.type)):
            kc = pa.compute.cast(kc, pa.string())
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(fnv1a64(kc) ^ sm_seed)
        finally:
            np.seterr(**old)
        u = (h.astype(np.float64) + 1.0) / 2.0 ** 64  # (0, 1]
        w = np.asarray(b[weight_col].to_numpy(), np.float64)
        skey = np.log(u) / w
        if len(skey) > kn:
            idx = np.argpartition(-skey, kn - 1)[:kn]
        else:
            idx = np.arange(len(skey))
        return pa.table({
            key_col: b[key_col].take(pa.array(idx, pa.int64())),
            weight_col: b[weight_col].take(pa.array(idx, pa.int64())),
            "skey": pa.array(skey[idx]),
        })

    return ds.map_batches(partial, batch_format="pyarrow").sort(
        "skey", descending=True).limit(kn)


def corpus_shuffle_order(docs: ray.data.Dataset,
                         id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic global shuffle ORDER for training output: rank every
    doc by splitmix64(doc_id) — the finalizer is a BIJECTION on uint64, so
    distinct ids give distinct keys (no tiebreak needed) and the order is
    reproducible on any cluster at any block structure, unlike
    random_shuffle. The global rank rides the two-level distributed scan
    (exclusive_prefix_sum with val=1): per-range counts → driver scan of
    ≤ #ranges totals → per-range vectorized cumsum. A writer consuming
    this sorts only within ranges (the ranges ARE hash-ordered)."""
    import numpy as np
    import pandas as pd

    from ..functions.hashing import splitmix64
    from .scan import exclusive_prefix_sum

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        hk = splitmix64(b[id_col].to_numpy().astype(np.uint64)).view(np.int64)
        return pd.DataFrame({id_col: b[id_col].to_numpy(np.int64),
                             "hkey": hk, "one": np.int64(1)})

    pref = exclusive_prefix_sum(
        docs.select_columns([id_col]).map_batches(add_key, batch_format="pandas"),
        "hkey", "one")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: b[id_col].to_numpy(np.int64),
                             "hkey": b["hkey"].to_numpy(np.int64),
                             "shuffle_rank": b["prefix"].to_numpy(np.int64) + 1})

    return pref.map_batches(finish, batch_format="pandas")


def neyman_allocation(orders: ray.data.Dataset, total_sample: int = 1000,
                      num_buckets: int = 8) -> ray.data.Dataset:
    """Neyman optimal stratified-sample allocation (Neyman 1934): the
    budget splits across strata proportionally to N_h·σ_h — the
    variance-minimizing design for a stratified mean estimate (here:
    order priority strata over the exact-cents total price).

    Exactness: moments are integer cents (order-exact sums through one
    tiny exchange); σ_h = SQRT of an exact-cast expression (IEEE-correct
    both engines); the normalizing Σ N_h·σ_h is an ORDERED cumulative
    (window sum in stratum order = the same left-associative chain as
    the engine's sorted loop — a bare SQL SUM() has unspecified order)."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        sq = cents * cents
        # two-limb second moment: a block's raw sum of cents-squared wraps
        # int64 above ~10^4 rows of 10^7-cent orders (caught at sf0.1)
        d = pd.DataFrame({"st": b["o_orderpriority"].to_numpy(object),
                          "n": np.ones(len(b), np.int64),
                          "s1": cents,
                          "s2_hi": sq >> 26, "s2_lo": sq & ((1 << 26) - 1)})
        g = d.groupby("st", as_index=False).sum()
        g["_part"] = np.zeros(len(g), np.int32)
        return g

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby("st", as_index=False).sum()
        c = c.sort_values("st", kind="mergesort").reset_index(drop=True)
        n = c["n"].to_numpy(np.int64)
        s1 = np.array([int(x) for x in c["s1"]], object)
        s2 = np.array([(int(h) << 26) + int(lo)
                       for h, lo in zip(c["s2_hi"], c["s2_lo"])], object)
        nf = n.astype(np.float64)
        s1f = np.array([np.float64(x) for x in s1])
        s2f = np.array([np.float64(x) for x in s2])
        sig = np.sqrt((s2f - s1f * s1f / nf) / (nf - 1.0))
        w = nf * sig
        # ordered left-associative running total (mirrors the SQL window)
        cum = np.empty(len(w))
        acc = np.float64(0.0)
        for i, x in enumerate(w):
            acc = acc + x
            cum[i] = acc
        total = cum[-1]
        alloc = round_half_away(w / total * np.float64(total_sample), 0)
        return pd.DataFrame({
            "o_orderpriority": c["st"].to_numpy(object),
            "n": n,
            "sigma_cents": sig,
            "alloc": alloc.astype(np.int64)})

    return bucket_exchange(
        orders.select_columns(["o_orderpriority", "o_totalprice"])
        .map_batches(partial, batch_format="pandas"),
        finalize, small_partials=True)
