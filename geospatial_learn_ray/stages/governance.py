"""Privacy / release-governance audits over distributed tables.

A 100 TB corpus engine that redacts PII (textstages.pii_redact) also
needs the RELEASE-side audits: k-anonymity (Sweeney 2002 — every
quasi-identifier combination must cover ≥ k records) and l-diversity
(Machanavalli et al. 2007 — each QI group must carry ≥ l distinct
sensitive values). Both are grouped counts, so they distribute as the
engine's standard shape: per-batch (QI, sensitive) count partials →
ONE coarse-bucket exchange → one vectorized combine per bucket. The
sensitive values themselves never leave the workers ungrouped; only
(QI, sensitive-bucket, count) rows move.

Scale note: the exchange key is the QI tuple hash bucket; output is
O(distinct QI groups), and the at-risk report is a filter over that,
never a row-level pull.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import fnv1a64, splitmix64
from .exchange import bucket_exchange


def k_anonymity_audit(ds: ray.data.Dataset, qi_cols: list[str],
                      sensitive_col: str, k: int = 5, l: int = 2,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Per-QI-group audit: n (k-anonymity), n_sensitive distinct
    (l-diversity), and the at-risk flags. ``sensitive_col`` must already
    be a bucketed/categorical column (callers bucket continuous values
    first so distinct-counting is exact and engine-identical)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(qi_cols + [sensitive_col], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        key = g[qi_cols[0]].astype(str)
        for c in qi_cols[1:]:
            key = key + "|" + g[c].astype(str)
        h = splitmix64(fnv1a64(key.to_numpy(object)))
        g["_part"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(qi_cols + [sensitive_col], sort=False,
                       as_index=False)["n"].sum())
        out = (s.groupby(qi_cols, sort=False)
               .agg(n=("n", "sum"), n_sensitive=(sensitive_col, "nunique"))
               .reset_index())
        out["n"] = out["n"].astype(np.int64)
        out["n_sensitive"] = out["n_sensitive"].astype(np.int64)
        out["k_risk"] = (out["n"] < k).astype(np.int64)
        out["l_risk"] = (out["n_sensitive"] < l).astype(np.int64)
        return out

    return bucket_exchange(
        ds.map_batches(partial, batch_format="pandas"), combine,
        small_partials=True)


def dp_noisy_counts(ds: ray.data.Dataset, key_col: str, seed: int = 2024,
                    bound: int = 5, num_buckets: int = 64) -> ray.data.Dataset:
    """Differential-privacy-SHAPED count release: exact grouped counts
    (sensitivity-1 query) plus a bounded integer noise draw per key.

    SEAM NOTE (the multimodal-codec pattern): real ε-DP requires noise
    drawn from a source the analyst cannot predict; this sandbox keeps
    every pipeline deterministic/oracle-checkable, so the draw here is
    the seeded two-sided uniform splitmix64(fnv(key) ^ splitmix64(seed))
    % (2·bound+1) − bound. Swapping in numpy's Laplace sampler changes
    ONE line in ``noise_of`` and nothing in the distributed plan: counts
    pre-aggregate per batch, one coarse exchange combines, noise applies
    to the O(distinct keys) output — never to row-level data."""
    from .exchange import bucket_exchange

    sd = splitmix64(np.asarray([seed], np.uint64))[0]

    def noise_of(keys: np.ndarray) -> np.ndarray:
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(fnv1a64(keys.astype(object)) ^ sd)
        finally:
            np.seterr(**old)
        return (h % np.uint64(2 * bound + 1)).astype(np.int64) - bound

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key_col, sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        h = splitmix64(fnv1a64(g[key_col].to_numpy(object)))
        g["_part"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key_col, sort=False, as_index=False)["n"].sum()
        s["n"] = s["n"].astype(np.int64)
        noise = noise_of(s[key_col].to_numpy())
        s["released"] = np.maximum(s["n"] + noise, 0).astype(np.int64)
        return s

    return bucket_exchange(
        ds.map_batches(partial, batch_format="pandas"), combine,
        small_partials=True)
