"""Model TRAINING surface — the reference's center of gravity, Ray-first.

Reference analogues (no sklearn wheel in this sandbox, so the estimators
are deterministic pure-numpy, trained from distributed sufficient
statistics — the same moment-partial machinery as stages/agg.py):

- ``fit_linear``        → learning.create_model (learning.py:465): least
  squares / ridge via normal equations. ONE ``map_batches`` pass computes
  the (d+1)² Gram partials; the driver solves a tiny d×d system.
- ``fit_ridge_grid``    → RF_oob_opt / create_model_optuna param scans
  (learning.py:896, learning.py:79): a λ grid evaluated from the SAME
  single-pass sufficient statistics — train stats and held-out validation
  stats are both accumulated in that one pass, and every λ's validation
  MSE falls out algebraically (mse = (Syy − 2wᵀb + wᵀAw)/n). A 100-point
  grid costs one data pass + 100 tiny solves, not 100 passes.
- ``regression_metrics``→ learning.regression_results (learning.py:866):
  r², MAE, MSE, RMSE from error partials.
- ``fit_logistic``      → the classification half of create_model:
  deterministic full-batch gradient descent; each iteration is one
  gradient-partial pass. Emits per-class probabilities via
  ``predict_proba_stage`` (prob_pixel_bloc, learning.py:1401).

Determinism: all estimators are closed-form or fixed-iteration with fixed
seeds/learning rates, so retries and resumes reproduce byte-identical
artifacts; the d=1 closed form is restated in SQL by the driver oracle
(slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²)) for STRONG value-hash checks.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import splitmix64
from ..functions.rounding import round_half_away


def _design_partials(features: list[str], target: str, split_key: str | None = None,
                     val_mod: int = 5, split_mode: str = "hash"):
    """Per-batch partial sufficient statistics of the design matrix
    [1, X]: A = ΣzᵀZ, b = Zᵀy, syy = Σy², n — flattened to one row per
    batch (and per train/val split when ``split_key`` is given).
    ``split_mode="hash"`` (default) finalizes the key with splitmix64;
    ``"mod"`` uses the raw key modulo (SQL-restatable for oracles)."""
    d = len(features) + 1

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        X = b[features].to_numpy(np.float64)
        y = b[target].to_numpy(np.float64)
        Z = np.concatenate([np.ones((len(X), 1)), X], axis=1)
        if split_key is None:
            splits = np.zeros(len(X), np.int8)
        else:
            kv = b[split_key].to_numpy().astype(np.uint64)
            kh = splitmix64(kv) if split_mode == "hash" else kv
            splits = (kh % np.uint64(val_mod) == 0).astype(np.int8)  # 1 = val
        rows = []
        for s in np.unique(splits):
            m = splits == s
            Zm, ym = Z[m], y[m]
            A = Zm.T @ Zm
            bb = Zm.T @ ym
            rows.append({"split": int(s), "n": int(m.sum()), "syy": float(ym @ ym),
                         **{f"a{i}_{j}": A[i, j] for i in range(d) for j in range(i, d)},
                         **{f"b{i}": bb[i] for i in range(d)}})
        return pd.DataFrame(rows)

    return fn, d


def _collect_stats(ds: ray.data.Dataset, features: list[str], target: str,
                   split_key: str | None = None, val_mod: int = 5,
                   split_mode: str = "hash"):
    """→ {split: (A, b, n, syy)} from one streaming pass (driver sees only
    one tiny row per (batch, split))."""
    fn, d = _design_partials(features, target, split_key, val_mod, split_mode)
    parts = ds.map_batches(fn, batch_format="pandas").to_pandas()
    out = {}
    for s, g in parts.groupby("split"):
        A = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                A[i, j] = A[j, i] = g[f"a{i}_{j}"].sum()
        b = np.array([g[f"b{i}"].sum() for i in range(d)])
        out[int(s)] = (A, b, int(g["n"].sum()), float(g["syy"].sum()))
    return out


def _solve(A: np.ndarray, b: np.ndarray, ridge: float = 0.0) -> np.ndarray:
    if ridge > 0.0:
        R = np.eye(len(A)) * ridge
        R[0, 0] = 0.0  # never penalize the intercept
        A = A + R
    return np.linalg.solve(A, b)


def fit_linear(ds: ray.data.Dataset, features: list[str], target: str,
               ridge: float = 0.0) -> np.ndarray:
    """Least-squares / ridge weights [intercept, w1..wd] — one pass."""
    stats = _collect_stats(ds, features, target)
    A, b, _, _ = stats[0]
    return _solve(A, b, ridge)


def fit_linear_closed_form_1d(ds: ray.data.Dataset, x_col: str, y_col: str,
                              round_to: int = 6) -> pd.DataFrame:
    """d=1 least squares via the explicit closed form the SQL oracle
    restates: slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²). Returns one row
    (slope, intercept) rounded half-away (oracle-compared)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].to_numpy(np.float64)
        y = b[y_col].to_numpy(np.float64)
        return pd.DataFrame({"n": [len(x)], "sx": [x.sum()], "sy": [y.sum()],
                             "sxx": [(x * x).sum()], "sxy": [(x * y).sum()]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n, sx, sy = p["n"].sum(), p["sx"].sum(), p["sy"].sum()
    sxx, sxy = p["sxx"].sum(), p["sxy"].sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame({"slope": [round_half_away(float(slope), round_to)],
                         "intercept": [round_half_away(float(intercept), round_to)]})


def fit_ridge_grid(ds: ray.data.Dataset, features: list[str], target: str,
                   lambdas: list[float], split_key: str, val_mod: int = 5,
                   round_to: int = 6, mse_round_to: int | None = None,
                   split_mode: str = "hash") -> pd.DataFrame:
    """Param scan (RF_oob_opt analogue): hash-held-out validation MSE for
    every λ from ONE data pass. Rows (lam, val_mse, w0..wd), best first is
    the caller's `.iloc[argmin]`."""
    stats = _collect_stats(ds, features, target, split_key=split_key, val_mod=val_mod,
                           split_mode=split_mode)
    if mse_round_to is None:
        mse_round_to = round_to
    if 0 not in stats or 1 not in stats or stats[1][2] == 0:
        raise ValueError(
            f"empty train/validation split for split_key={split_key!r} "
            f"val_mod={val_mod}: got splits {sorted(stats)} "
            "(input too small, or every key falls on one side of the mod)"
        )
    A_tr, b_tr, _, _ = stats[0]
    A_va, b_va, n_va, syy_va = stats[1]
    rows = []
    for lam in lambdas:
        w = _solve(A_tr, b_tr, lam)
        mse = (syy_va - 2.0 * (w @ b_va) + w @ A_va @ w) / n_va
        rows.append({"lam": lam, "val_mse": round_half_away(float(mse), mse_round_to),
                     **{f"w{i}": round_half_away(float(w[i]), round_to) for i in range(len(w))}})
    return pd.DataFrame(rows)


def regression_metrics(ds: ray.data.Dataset, y_col: str, pred_col: str,
                       round_to: int = 6) -> pd.DataFrame:
    """learning.regression_results (learning.py:866): r² / MAE / MSE / RMSE
    from streaming error partials (one pass, tiny driver combine)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b[y_col].to_numpy(np.float64)
        e = y - b[pred_col].to_numpy(np.float64)
        return pd.DataFrame({"n": [len(y)], "sy": [y.sum()], "syy": [(y * y).sum()],
                             "sae": [np.abs(e).sum()], "sse": [(e * e).sum()]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = p["n"].sum()
    sy, syy = p["sy"].sum(), p["syy"].sum()
    sae, sse = p["sae"].sum(), p["sse"].sum()
    sst = syy - sy * sy / n
    return pd.DataFrame({
        "r2": [round_half_away(float(1.0 - sse / sst), round_to)],
        "mae": [round_half_away(float(sae / n), round_to)],
        "mse": [round_half_away(float(sse / n), round_to)],
        "rmse": [round_half_away(float(np.sqrt(sse / n)), round_to)],
    })


def fit_logistic(ds: ray.data.Dataset, features: list[str], label: str,
                 iters: int = 25, lr: float = 0.5) -> np.ndarray:
    """Deterministic full-batch logistic regression: fixed iteration count,
    fixed step, zero init — each iteration is ONE gradient-partial pass
    (the distributed-sufficient-statistics shape; no driver-side rows).
    Features should be roughly unit-scale (caller normalizes)."""
    d = len(features) + 1
    w = np.zeros(d)
    for _ in range(iters):
        w_now = w.copy()

        def grad_partial(b: pd.DataFrame, w_=w_now) -> pd.DataFrame:
            X = b[features].to_numpy(np.float64)
            y = b[label].to_numpy(np.float64)
            Z = np.concatenate([np.ones((len(X), 1)), X], axis=1)
            p = 1.0 / (1.0 + np.exp(-(Z @ w_)))
            g = Z.T @ (p - y)
            return pd.DataFrame({"n": [len(X)], **{f"g{i}": [g[i]] for i in range(len(w_))}})

        parts = ds.map_batches(grad_partial, batch_format="pandas").to_pandas()
        n = parts["n"].sum()
        g = np.array([parts[f"g{i}"].sum() for i in range(d)]) / n
        w = w - lr * g
    return w


def fit_bagged_stumps_oob(ds: ray.data.Dataset, features: list[str], label: str,
                          key_col: str, max_stumps: int = 32, step: int = 4,
                          bins: int = 32, seed: int = 11,
                          round_to: int = 6) -> pd.DataFrame:
    """RF_oob_opt analogue (learning.py:896): an ensemble-size scan scored
    by OUT-OF-BAG error — the reference sweeps n_estimators with warm-start
    RandomForest OOB; here the ensemble is deterministic bagged decision
    STUMPS so everything distributes as two streaming passes:

    - bootstrap membership is HASH-derived per (row key, stump): row i is
      in stump b's bag iff splitmix64(key_i ^ seed_b) % 1000 < 632 (the
      63.2% unique-row mass of a true bootstrap) — stable on any worker,
      any retry, any partitioning (no RNG state);
    - pass 1: per-batch (stump, feature-bin, class) histogram partials over
      in-bag rows (features round-robin across stumps); the driver combines
      the tiny histogram and picks each stump's best split by gini +
      majority leaf classes;
    - pass 2: per-batch OOB votes — signed cumulative majority across the
      first m stumps for every scan point m, emitting only per-batch error
      counts.

    Returns rows (n_estimators, oob_error) for m = step, 2·step, …,
    max_stumps (oob_error rounded; the min row is the 'best estimator')."""
    F = len(features)
    B = max_stumps
    seeds = splitmix64(np.arange(1, B + 1, dtype=np.uint64) * np.uint64(seed))

    # pass 0: global per-feature min/max for binning (one tiny pass)
    def minmax(b: pd.DataFrame) -> pd.DataFrame:
        X = b[features].to_numpy(np.float64)
        return pd.DataFrame({"f": np.arange(F), "mn": X.min(axis=0), "mx": X.max(axis=0)})

    mm = ds.map_batches(minmax, batch_format="pandas").to_pandas().groupby("f").agg(
        mn=("mn", "min"), mx=("mx", "max"))
    lo = mm["mn"].to_numpy()
    hi = mm["mx"].to_numpy()
    width = np.where(hi > lo, hi - lo, 1.0)

    def _bags(keys: np.ndarray) -> np.ndarray:
        """[n, B] bool in-bag matrix from the hash rule."""
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(keys[:, None].astype(np.uint64) ^ seeds[None, :])
        finally:
            np.seterr(**old)
        return (h % np.uint64(1000)) < np.uint64(632)

    # pass 1: histogram partials — one flat bincount per (batch, stump)
    # builds ALL features' (bin, class) histograms at once; each stump then
    # picks its best (feature, threshold) by gini over its own bag, so bag
    # diversity (not feature starvation) differentiates the ensemble
    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        X = b[features].to_numpy(np.float64)
        y = (b[label].to_numpy(np.int64) > 0).astype(np.int64)
        keys = b[key_col].to_numpy().astype(np.uint64)
        bag = _bags(keys)
        binned = np.clip(((X - lo) / width * bins).astype(np.int64), 0, bins - 1)
        fidx = np.arange(F)[None, :]
        rows = []
        for s in range(B):
            m = bag[:, s]
            if not m.any():
                continue
            code = ((fidx * bins + binned[m]) * 2 + y[m, None]).ravel()
            cnt = np.bincount(code, minlength=F * bins * 2)
            rows.append({"stump": s, **{f"c{i}": int(v) for i, v in enumerate(cnt)}})
        return pd.DataFrame(rows)

    hp = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    hist = np.zeros((B, F, bins, 2), np.int64)
    for s, g in hp.groupby("stump"):
        flat = np.array([g[f"c{i}"].sum() for i in range(F * bins * 2)], np.int64)
        hist[int(s)] = flat.reshape(F, bins, 2)

    # driver: per stump pick the gini-minimizing (feature, threshold) + leaves
    feat_of = np.zeros(B, np.int64)
    thr_bin = np.zeros(B, np.int64)
    left_cls = np.zeros(B, np.int64)
    right_cls = np.zeros(B, np.int64)
    for s in range(B):
        best = (np.inf, 0, 0, 0, 0)
        for f in range(F):
            h = hist[s, f].astype(np.float64)
            cl = np.cumsum(h, axis=0)          # [bins, 2] counts with bin <= t
            tot = h.sum(axis=0)
            nl = cl.sum(axis=1)
            nr = tot.sum() - nl
            pl1 = np.divide(cl[:, 1], nl, out=np.zeros(bins), where=nl > 0)
            cr1 = tot[1] - cl[:, 1]
            pr1 = np.divide(cr1, nr, out=np.zeros(bins), where=nr > 0)
            gini = nl * 2 * pl1 * (1 - pl1) + nr * 2 * pr1 * (1 - pr1)
            gini[nl == 0] = np.inf
            gini[nr == 0] = np.inf
            if np.isfinite(gini).any():
                t = int(np.argmin(gini))
                if gini[t] < best[0]:
                    best = (float(gini[t]), f, t, int(pl1[t] > 0.5), int(pr1[t] > 0.5))
        _, feat_of[s], thr_bin[s], left_cls[s], right_cls[s] = best

    grid = np.arange(step, max_stumps + 1, step)

    # pass 2: OOB signed cumulative majority per row, per-batch error counts
    def oob_partial(b: pd.DataFrame) -> pd.DataFrame:
        X = b[features].to_numpy(np.float64)
        y = (b[label].to_numpy(np.int64) > 0).astype(np.int64)
        keys = b[key_col].to_numpy().astype(np.uint64)
        oob = ~_bags(keys)
        binned = np.clip(((X - lo) / width * bins).astype(np.int64), 0, bins - 1)
        pred = np.where(binned[:, feat_of] <= thr_bin[None, :],
                        left_cls[None, :], right_cls[None, :])  # [n, B]
        votes = np.where(oob, np.where(pred == 1, 1, -1), 0)
        cum = np.cumsum(votes, axis=1)[:, grid - 1]              # [n, |grid|]
        has_vote = np.cumsum(oob.astype(np.int64), axis=1)[:, grid - 1] > 0
        guess = (cum > 0).astype(np.int64)                        # tie → class 0
        err = (guess != y[:, None]) & has_vote
        return pd.DataFrame({"m": grid, "err": err.sum(axis=0), "n": has_vote.sum(axis=0)})

    op = ds.map_batches(oob_partial, batch_format="pandas").to_pandas().groupby("m").agg(
        err=("err", "sum"), n=("n", "sum")).reset_index()
    op = op.sort_values("m")
    return pd.DataFrame({
        "n_estimators": op["m"].to_numpy(np.int64),
        "oob_error": round_half_away(op["err"].to_numpy(np.float64)
                                     / np.maximum(op["n"].to_numpy(np.float64), 1.0), round_to),
    })


def save_model(path: str, features: list[str], weights: np.ndarray,
               kind: str = "linear") -> str:
    """Persist the trained artifact (learning.py:678 joblib.dump → JSON)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"kind": kind, "features": list(features),
                   "intercept": float(weights[0]),
                   "weights": [float(v) for v in weights[1:]]}, f)
    return path


class ProbaScorer:
    """prob_pixel_bloc analogue (learning.py:1401, one-class select at
    1522-1526): per-class probability columns from a linear/logistic
    artifact, loaded once per actor. proba_1 = σ(w·x + b), proba_0 = 1−p;
    ``one_class`` selects a single class column like the reference."""

    def __init__(self, model_path: str, round_to: int = 6, one_class: int | None = None):
        with open(model_path) as f:
            m = json.load(f)
        self.features = m["features"]
        self.w = np.asarray(m["weights"], np.float64)
        self.b = float(m["intercept"])
        self.round_to = round_to
        self.one_class = one_class

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = batch[self.features].to_numpy(np.float64)
        z = X @ self.w + self.b
        p1 = 1.0 / (1.0 + np.exp(-z))
        batch = batch.copy()
        if self.one_class is None or self.one_class == 1:
            batch["proba_1"] = round_half_away(p1, self.round_to)
        if self.one_class is None or self.one_class == 0:
            batch["proba_0"] = round_half_away(1.0 - p1, self.round_to)
        batch["pred"] = (p1 > 0.5).astype(np.int32)
        return batch


def predict_proba_stage(ds: ray.data.Dataset, model_path: str, keep_cols: list[str],
                        concurrency=(1, 8), batch_size: int = 65536,
                        one_class: int | None = None) -> ray.data.Dataset:
    out = ds.map_batches(
        ProbaScorer, fn_constructor_args=(model_path,),
        fn_constructor_kwargs={"one_class": one_class},
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
    if one_class is None:
        cols = keep_cols + ["proba_1", "proba_0", "pred"]
    elif one_class == 1:
        cols = keep_cols + ["proba_1", "pred"]
    else:
        cols = keep_cols + ["proba_0", "pred"]
    return out.select_columns(cols)


# --- recursive feature elimination (learning.rec_feat_sel, learning.py:300) ---

def _det_expr(m: list[list[str]]) -> str:
    """Fully parenthesized Laplace expansion of a matrix of scalar-name
    expressions. The SAME string is evaluated by Python eval (engine) and
    parsed by DuckDB (oracle): full parentheses force identical f64
    operation order on both sides — the linear-algebra version of the
    transcendental-parity recipe (CLAUDE.md round 3)."""
    if len(m) == 1:
        return f"({m[0][0]})"
    terms = []
    for j, e in enumerate(m[0]):
        minor = [row[:j] + row[j + 1:] for row in m[1:]]
        t = f"(({e}) * {_det_expr(minor)})"
        terms.append(t if j % 2 == 0 else f"((-1.0) * {t})")
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def _aname(i: int, j: int) -> str:
    return f"a{min(i, j)}_{max(i, j)}"


def rfe_weight_exprs(subset: tuple[int, ...]) -> dict[int, str]:
    """Cramer-rule weight expressions for the OLS fit on feature subset
    ``subset`` (1-based feature indices; intercept index 0 always in).
    Entries reference the scalar names a{i}_{j} (Gram of [1, X]) and b{i}
    — the columns of the stats CTE / the engine's _collect_stats output."""
    idx = [0, *sorted(subset)]
    gram = [[_aname(r, c) for c in idx] for r in idx]
    den = _det_expr(gram)
    out = {}
    for f in subset:
        p = idx.index(f)
        # replace column p with the rhs, keeping the SAME row order
        num = [[(f"b{idx[ri]}" if ci == p else gram[ri][ci])
                for ci in range(len(idx))] for ri in range(len(idx))]
        out[f] = f"({_det_expr(num)} / {den})"
    return out


def rfe_rank(ds: ray.data.Dataset, features: list[str], target: str,
             round_to: int = 6) -> pd.DataFrame:
    """learning.rec_feat_sel analogue: recursive feature elimination for
    the linear model. ONE streaming pass collects the (d+1)² Gram
    sufficient statistics; every round's OLS solve on the surviving subset
    is then a tiny driver-side Cramer evaluation — d rounds cost one data
    pass, not d model fits. Each round drops the feature with the smallest
    |coefficient| (ties → smallest index), exactly sklearn RFE's criterion
    for a linear estimator.

    Parity: the solves evaluate the SAME fully parenthesized expression
    strings the SQL twin embeds (identical f64 op order); a 1-ulp Gram-sum
    difference can only flip an elimination choice when two |coef| tie to
    1 ulp (not reachable with macroscopically different feature scales —
    same accepted class as the ridge oracle's raw sums)."""
    stats = _collect_stats(ds, features, target)
    A, b, _, _ = stats[0]
    d = len(features)
    scal = {}
    for i in range(d + 1):
        for j in range(i, d + 1):
            scal[_aname(i, j)] = float(A[i, j])
        scal[f"b{i}"] = float(b[i])

    def ev(e: str) -> float:
        return eval(e, {"__builtins__": {}}, dict(scal))  # noqa: S307 — parity evaluator

    remaining = list(range(1, d + 1))
    rows = []
    rank = 1
    while remaining:
        ws = {f: ev(x) for f, x in rfe_weight_exprs(tuple(remaining)).items()}
        if len(remaining) == 1:
            drop = remaining[0]
        else:
            drop = min(remaining, key=lambda f: (abs(ws[f]), f))
        rows.append({"feature": features[drop - 1], "rfe_rank": rank,
                     "coef_at_drop": round_half_away(ws[drop], round_to)})
        remaining.remove(drop)
        rank += 1
    return pd.DataFrame(rows)


class VoteScorer:
    """learning.combine_models analogue (learning.py:708, method='voting'):
    N linear/logistic artifacts loaded ONCE per actor, soft-voting mean
    probability per batch. The accumulation is explicitly left-associative
    ((p1+p2)+p3)/N so the SQL twin's textual expression is the identical
    f64 chain."""

    def __init__(self, model_paths: list[str], round_to: int = 6):
        self.models = []
        for p in model_paths:
            with open(p) as f:
                m = json.load(f)
            self.models.append((m["features"], np.asarray(m["weights"], np.float64),
                                float(m["intercept"])))
        self.round_to = round_to

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for feats, w, b in self.models:
            z = batch[feats].to_numpy(np.float64) @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            acc = p if acc is None else acc + p
        pm = acc / float(len(self.models))
        batch = batch.copy()
        batch["proba_vote"] = round_half_away(pm, self.round_to)
        batch["pred"] = (pm > 0.5).astype(np.int32)
        return batch


def predict_vote_stage(ds: ray.data.Dataset, model_paths: list[str],
                       keep_cols: list[str], concurrency=(1, 8),
                       batch_size: int = 65536) -> ray.data.Dataset:
    out = ds.map_batches(
        VoteScorer, fn_constructor_args=(list(model_paths),),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
    return out.select_columns(keep_cols + ["proba_vote", "pred"])


def hashed_bow_features(docs: ray.data.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", label_col: str = "lang",
                        pos_label: str = "en",
                        n_buckets: int = 8) -> ray.data.Dataset:
    """fastText-style hashed bag-of-words featurizer (Joulin et al. 2017):
    token → splitmix64(fnv1a64(tok)) % n_buckets, per-doc bucket-count
    fractions as features (x_j = cnt_j / n_tokens), label = 1.0 iff
    ``label_col == pos_label``. The hash trick bounds the feature width at
    ANY vocabulary size — the classifier trains on a 100 TB corpus with a
    fixed d-dim gradient, no vocabulary build, no broadcast. Composes with
    ``fit_logistic`` (the distributed sufficient-statistics GD) into the
    quality/language classifier every curation pipeline trains."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, splitmix64

    B = n_buckets

    def fn(b: pa.Table) -> pd.DataFrame:
        t = b[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        wl = pc.split_pattern(t, " ")
        off = np.asarray(wl.offsets, np.int64)
        lens = off[1:] - off[:-1]
        n = len(lens)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        mask = pc.binary_length(wl.values).to_numpy() > 0
        toks = wl.values.to_pandas().to_numpy(object)[mask]
        old = np.seterr(over="ignore")
        try:
            bkt = (splitmix64(fnv1a64(toks)) % np.uint64(B)).astype(np.int64)
        finally:
            np.seterr(**old)
        counts = np.bincount(row[mask] * B + bkt, minlength=n * B).reshape(n, B)
        ntok = counts.sum(axis=1).clip(min=1).astype(np.float64)
        X = counts / ntok[:, None]
        lab = b[label_col].to_pandas().to_numpy(object)
        out = {id_col: b[id_col].to_numpy(),
               "y": (lab == pos_label).astype(np.float64)}
        for j in range(B):
            out[f"x{j}"] = X[:, j]
        return pd.DataFrame(out)

    return docs.select_columns([id_col, text_col, label_col]).map_batches(
        fn, batch_format="pyarrow")


def roc_auc_quality(docs: ray.data.Dataset, pos_lang: str = "en",
                    num_buckets: int = 32) -> ray.data.Dataset:
    """Exact ROC-AUC of the heuristic quality score as a detector of
    ``pos_lang`` documents — the Mann-Whitney U identity
    AUC = (Σ ranks⁺ − P(P+1)/2) / (P·N) with midrank tie handling,
    computed EXACTLY in integers: scores are the proven 4-decimal
    quality values scaled to ints, ranks come from the per-score-value
    HISTOGRAM (the quality_percentile pattern — never a per-row sort),
    and all rank sums are ×2-scaled so midranks stay integral. The only
    float is the final one-division AUC.

    Scale shape: per-block (score, n, n_pos) partials (≤ 10⁴ distinct
    4-decimal scores — bounded by the value DOMAIN, not the corpus), one
    single-bucket exchange sums and does the vectorized cumulative
    scan."""
    from ..functions import textproc
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = textproc.quality_scores(b["text"])["quality"].to_numpy(np.float64)
        sq = round_half_away(round_half_away(q, 4) * 10000.0, 0).astype(np.int64)
        pos = (b["lang"].to_numpy(object) == pos_lang).astype(np.int64)
        g = pd.DataFrame({"sq": sq, "n": np.ones(len(b), np.int64),
                          "np_": pos}).groupby("sq", as_index=False).sum()
        g["_part"] = np.zeros(len(g), np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby("sq", as_index=False).sum()
        c = c.sort_values("sq", kind="mergesort")
        n = c["n"].to_numpy(np.int64)
        npos = c["np_"].to_numpy(np.int64)
        cb = np.r_[0, np.cumsum(n)[:-1]]
        sr = int((npos * (2 * cb + n + 1)).sum())          # 2×Σ midranks⁺
        p = int(npos.sum())
        tot = int(n.sum())
        nn = tot - p
        u2 = sr - p * (p + 1)                               # 2×U
        auc = np.float64(u2) / np.float64(2 * p * nn)
        return pd.DataFrame({"n_pos": np.array([p], np.int64),
                             "n_neg": np.array([nn], np.int64),
                             "u2": np.array([u2], np.int64),
                             "auc": [float(auc)]})

    return bucket_exchange(
        docs.select_columns(["text", "lang"]).map_batches(
            partial, batch_format="pandas"),
        combine, small_partials=True)


def calibration_bins(proba_ds: ray.data.Dataset, label_col: str = "y",
                     proba_col: str = "proba_1", n_bins: int = 10,
                     num_buckets: int = 16) -> ray.data.Dataset:
    """Reliability-diagram bins for a probabilistic classifier (the
    calibration-curve companion of ``roc_auc_quality``): predictions
    bucket into ``n_bins`` equal-width bins; each bin reports count,
    observed positive fraction, and mean predicted probability.

    Exactness: the input probabilities are already 6-decimal-rounded, so
    they scale to exact integer micro-probabilities — Σpq is an
    order-exact integer sum and both output floats are single mirrored
    division chains. Per-block partials are ≤ n_bins rows."""
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pr = b[proba_col].to_numpy(np.float64)
        y = b[label_col].to_numpy(np.int64)
        binv = np.minimum(np.floor(pr * 10.0).astype(np.int64), n_bins - 1)
        pq = round_half_away(pr * 1_000_000.0, 0).astype(np.int64)
        g = pd.DataFrame({"bin": binv, "n": np.ones(len(b), np.int64),
                          "n_pos": y, "spq": pq}).groupby(
            "bin", as_index=False).sum()
        g["_part"] = np.zeros(len(g), np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop(columns=["_part"]).groupby("bin", as_index=False).sum()
        n = c["n"].to_numpy(np.int64)
        npos = c["n_pos"].to_numpy(np.int64)
        spq = c["spq"].to_numpy(np.int64)
        return pd.DataFrame({
            "bin": c["bin"].to_numpy(np.int64),
            "n": n, "n_pos": npos,
            "mean_pred": spq.astype(np.float64) / n.astype(np.float64)
            / np.float64(1_000_000.0),
            "frac_pos": npos.astype(np.float64) / n.astype(np.float64),
        })

    return bucket_exchange(proba_ds.map_batches(partial, batch_format="pandas"),
                           combine, small_partials=True)


LEV_LAMBDA = 1_000_000


def leverage_topk(ds: ray.data.Dataset, k: int = 50,
                  num_buckets: int = 8) -> ray.data.Dataset:
    """Ridge leverage scores over lineitem — the data-valuation /
    influence diagnostic (h_i = x_iᵀ(XᵀX+λI)⁻¹x_i; rows with the highest
    leverage dominate any linear fit): ONE streaming pass emits per-block
    integer Gram partials (features are EXACT small ints: quantity,
    100·discount, 100·tax — the round-3 Gram rule), a single-bucket
    exchange totals them in Python ints and inverts the 3×3 via the
    EXACT integer adjugate/determinant (bound: det < 2^127 needs
    A-entries < 2^42 — ~10¹¹ rows at these feature ranges; beyond that,
    rescale), and the scoring map evaluates the 9-term quadratic form in
    a FIXED left-associative f64 order mirrored textually in SQL. Top-k
    by the bit-identical score with key tiebreaks."""
    from .exchange import bucket_exchange
    from ..functions.rounding import round_half_away

    def _feats(b: pd.DataFrame) -> np.ndarray:
        q1 = round_half_away(b["l_quantity"].to_numpy(np.float64), 0)
        q2 = round_half_away(b["l_discount"].to_numpy(np.float64) * 100.0, 0)
        q3 = round_half_away(b["l_tax"].to_numpy(np.float64) * 100.0, 0)
        return np.stack([q1, q2, q3], axis=1).astype(np.int64)

    def gram_part(b: pd.DataFrame) -> pd.DataFrame:
        x = _feats(b)
        g = x.T @ x
        ii, jj = np.triu_indices(3)
        return pd.DataFrame({"i": ii.astype(np.int64),
                             "j": jj.astype(np.int64),
                             "g": g[ii, jj],
                             "_part": np.zeros(len(ii), np.int32)})

    def inv_row(gdf: pd.DataFrame) -> pd.DataFrame:
        tot: dict[tuple[int, int], int] = {}
        for i, j, g in zip(gdf["i"], gdf["j"], gdf["g"]):
            tot[(int(i), int(j))] = tot.get((int(i), int(j)), 0) + int(g)
        A = [[tot.get((min(i, j), max(i, j)), 0) for j in range(3)]
             for i in range(3)]
        for i in range(3):
            A[i][i] += LEV_LAMBDA
        det = (A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1])
               - A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0])
               + A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0]))
        adj = [[0] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                mi = [[A[r][c] for c in range(3) if c != j]
                      for r in range(3) if r != i]
                cof = mi[0][0] * mi[1][1] - mi[0][1] * mi[1][0]
                adj[j][i] = (1 if (i + j) % 2 == 0 else -1) * cof
        out = {"_one": np.array([1], np.int64)}
        for i in range(3):
            for j in range(3):
                out[f"m{i}{j}"] = [np.float64(adj[i][j]) / np.float64(det)]
        return pd.DataFrame(out)

    M = bucket_exchange(
        ds.map_batches(gram_part, batch_format="pandas"),
        inv_row, small_partials=True).to_pandas()  # exactly one tiny row
    m = {(i, j): np.float64(M[f"m{i}{j}"].iloc[0])
         for i in range(3) for j in range(3)}

    def score(b: pd.DataFrame) -> pd.DataFrame:
        x = _feats(b)
        acc = None
        for i in range(3):
            for j in range(3):
                term = (x[:, i] * x[:, j]).astype(np.float64) * m[(i, j)]
                acc = term if acc is None else acc + term
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
            "l_linenumber": b["l_linenumber"].to_numpy(np.int64).astype(np.int64),
            "lev": acc})

    scored = ds.map_batches(score, batch_format="pandas")
    return scored.sort(["lev", "l_orderkey", "l_linenumber"],
                       descending=[True, False, False]).limit(k)


def segment_slopes(orders: ray.data.Dataset, customer: ray.data.Dataset,
                   num_buckets: int = 16) -> ray.data.Dataset:
    """Per-market-segment OLS trend of order value over time — the
    grouped closed-form regression (slope = (n·Sxy − Sx·Sy)/(n·Sxx −
    Sx²) per group; the grouped sibling of
    ``fit_linear_closed_form_1d``). x = order date in whole days, y =
    total price in EXACT integer cents (the round-3 Gram rule: raw f64
    sums of cents are order-dependent at scale); the small customer
    side broadcasts through the existing hash-join stage; per-block
    integer moment partials ride one segment-keyed exchange and the
    slope/intercept floats are single mirrored expressions over exact
    casts."""
    from ..functions.hashing import fnv1a64, splitmix64
    from ..functions.rounding import round_half_away
    from .exchange import bucket_exchange
    from .joins import broadcast_join

    j = broadcast_join(
        orders.select_columns(["o_custkey", "o_orderdate", "o_totalprice"]),
        customer.select_columns(["c_custkey", "c_mktsegment"]).to_pandas(),
        "o_custkey", "c_custkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        cents = round_half_away(
            b["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        d = pd.DataFrame({"seg": b["c_mktsegment"].to_numpy(object),
                          "n": np.ones(len(b), np.int64), "sx": day,
                          "sy": cents, "sxx": day * day, "sxy": day * cents})
        g = d.groupby("seg", as_index=False).sum()
        old = np.seterr(over="ignore")
        try:
            g["_part"] = (splitmix64(fnv1a64(g["seg"].to_numpy(object)))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return g

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seg, sub in g.drop(columns=["_part"]).groupby("seg"):
            n = sum(int(x) for x in sub["n"])
            sx = sum(int(x) for x in sub["sx"])
            sy = sum(int(x) for x in sub["sy"])
            sxx = sum(int(x) for x in sub["sxx"])
            sxy = sum(int(x) for x in sub["sxy"])
            nf = np.float64(n)
            num = nf * np.float64(sxy) - np.float64(sx) * np.float64(sy)
            den = nf * np.float64(sxx) - np.float64(sx) * np.float64(sx)
            slope = num / den
            intercept = (np.float64(sy) - slope * np.float64(sx)) / nf
            rows.append((seg, np.int64(n), float(slope), float(intercept)))
        return pd.DataFrame(rows, columns=["c_mktsegment", "n",
                                           "slope_cents_per_day",
                                           "intercept_cents"])

    return bucket_exchange(j.map_batches(partial, batch_format="pandas"),
                           finalize, small_partials=True)


def kfold_cv_1d(ds: ray.data.Dataset, x_col: str, y_col: str,
                key_col: str, k: int = 5, round_to: int = 6,
                mse_round_to: int = 2) -> pd.DataFrame:
    """K-fold cross-validation of the 1-feature OLS fit (the sklearn
    cross_val_score shape on the reference's create_model family): folds
    are ``key % k`` (deterministic, cluster-layout-free), every fold's
    train stats are TOTALS − fold — so ONE streaming pass yields all K
    fits, never K data passes. Per fold: closed-form slope/intercept on
    the complement, validation MSE via the quadratic-form identity
    (syy − 2·w·b + wᵀAw)/n — no second scan of the fold.

    Parity class: raw float sufficient statistics like fit_ridge_grid
    (rounded outputs absorb block-order ulps); the fold totals combine
    in EXPLICIT ascending-fold left-associative order so the SQL twin's
    ((((s0+s1)+s2)+s3)+s4) is the identical f64 chain."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].to_numpy(np.float64)
        y = b[y_col].to_numpy(np.float64)
        f = (b[key_col].to_numpy(np.int64) % k).astype(np.int64)
        rows = []
        for fold in range(k):
            m = f == fold
            rows.append({"fold": fold, "n": float(m.sum()),
                         "sx": x[m].sum(), "sy": y[m].sum(),
                         "sxx": (x[m] * x[m]).sum(),
                         "sxy": (x[m] * y[m]).sum(),
                         "syy": (y[m] * y[m]).sum()})
        return pd.DataFrame(rows)

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    stats = ("n", "sx", "sy", "sxx", "sxy", "syy")
    per = {s: [float(p.loc[p["fold"] == fold, s].sum()) for fold in range(k)]
           for s in stats}
    tot = {}
    for s in stats:
        acc = per[s][0]
        for fold in range(1, k):
            acc = acc + per[s][fold]   # explicit left-assoc, ascending fold
        tot[s] = acc
    rows = []
    for fold in range(k):
        trn = tot["n"] - per["n"][fold]
        trsx = tot["sx"] - per["sx"][fold]
        trsy = tot["sy"] - per["sy"][fold]
        trsxx = tot["sxx"] - per["sxx"][fold]
        trsxy = tot["sxy"] - per["sxy"][fold]
        den = trn * trsxx - trsx * trsx
        w1 = (trn * trsxy - trsx * trsy) / den
        w0 = (trsy * trsxx - trsx * trsxy) / den
        n, sx, sy = per["n"][fold], per["sx"][fold], per["sy"][fold]
        sxx, sxy, syy = per["sxx"][fold], per["sxy"][fold], per["syy"][fold]
        mse = (syy - 2.0 * (w0 * sy + w1 * sxy)
               + (w0 * w0 * n + 2.0 * w0 * w1 * sx + w1 * w1 * sxx)) / n
        rows.append({"fold": fold, "n_val": int(n),
                     "w0": round_half_away(w0, round_to),
                     "w1": round_half_away(w1, round_to),
                     "val_mse": round_half_away(mse, mse_round_to)})
    out = pd.DataFrame(rows)
    out["fold"] = out["fold"].astype(np.int64)
    out["n_val"] = out["n_val"].astype(np.int64)
    return out


def _ck_day_cents_prep(num_buckets: int, with_ok: bool = False):
    """Shared prep for the per-customer order-series stages (Theil-Sen,
    Mann-Kendall): (o_custkey, [o_orderkey,] epoch-day, exact integer
    cents) plus the splitmix64 ``_part`` bucket key."""

    def prep(b: pa.Table) -> pd.DataFrame:
        day = (b["o_orderdate"].to_numpy()
               .astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        cents = round_half_away(
            b["o_totalprice"].to_numpy().astype(np.float64) * 100.0,
            0).astype(np.int64)
        cols = {"ck": b["o_custkey"].to_numpy().astype(np.int64)}
        if with_ok:
            cols["ok"] = b["o_orderkey"].to_numpy().astype(np.int64)
        cols.update(day=day, cents=cents)
        d = pd.DataFrame(cols)
        old = np.seterr(over="ignore")
        try:
            d["_part"] = (splitmix64(d["ck"].to_numpy(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return d

    return prep


def theilsen_slopes(orders: ray.data.Dataset,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Per-customer Theil-Sen robust trend (Theil 1950 / Sen 1968): the
    median of all pairwise slopes Δcents/Δdays over a customer's
    date-distinct order pairs — the outlier-robust sibling of the OLS
    `segment_slopes`. Pairs are O(k²) in the PER-KEY order count (tens
    for this fixture — bounded by key cardinality, documented), never in
    the table size.

    Scale shape: one customer-keyed exchange of (day, cents) rows; the
    combiner forms each customer's pairs with ONE vectorized self-merge
    per bucket and reduces to the two middle order statistics. Exactness:
    each slope is ONE correctly-rounded division of exact integers
    (identical f64 both sides ⇒ identical sort), the median is always
    the explicit (lo + hi)/2 two-middle rule (exact_median recipe —
    never a library median), rounded half-away."""
    from .exchange import bucket_exchange

    prep = _ck_day_cents_prep(num_buckets, with_ok=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        a = g[["ck", "ok", "day", "cents"]]
        p = a.merge(a, on="ck", suffixes=("1", "2"))
        p = p[(p["ok1"] < p["ok2"]) & (p["day1"] != p["day2"])]
        if not len(p):
            return pd.DataFrame({
                "o_custkey": pd.Series([], dtype=np.int64),
                "n_pairs": pd.Series([], dtype=np.int64),
                "ts_slope_r": pd.Series([], dtype=np.float64)})
        dc = (p["cents2"] - p["cents1"]).to_numpy(np.int64)
        dd = (p["day2"] - p["day1"]).to_numpy(np.int64)
        p = pd.DataFrame({"ck": p["ck"].to_numpy(np.int64),
                          "s": dc.astype(np.float64)
                          / dd.astype(np.float64)})
        p = p.sort_values(["ck", "s"], kind="mergesort")
        grp = p.groupby("ck", sort=False)
        rk = grp.cumcount().to_numpy(np.int64)
        n = grp["s"].transform("size").to_numpy(np.int64)
        s = p["s"].to_numpy(np.float64)
        lo = (rk == (n - 1) // 2)
        hi = (rk == n // 2)
        out = pd.DataFrame({"ck": p["ck"].to_numpy(np.int64)})
        out["vlo"] = np.where(lo, s, np.nan)
        out["vhi"] = np.where(hi, s, np.nan)
        out["np_"] = n
        r = out.groupby("ck", as_index=False).agg(
            n_pairs=("np_", "first"), vlo=("vlo", "max"), vhi=("vhi", "max"))
        med = (r["vlo"].to_numpy(np.float64)
               + r["vhi"].to_numpy(np.float64)) / 2.0
        return pd.DataFrame({"o_custkey": r["ck"].to_numpy(np.int64),
                             "n_pairs": r["n_pairs"].to_numpy(np.int64),
                             "ts_slope_r": round_half_away(med, 6)})

    return bucket_exchange(
        orders.select_columns(["o_custkey", "o_orderkey", "o_orderdate",
                               "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow"), combine)


def mann_kendall_orders(orders: ray.data.Dataset,
                        num_buckets: int = 64) -> ray.data.Dataset:
    """Per-customer Mann-Kendall trend test (Mann 1945 / Kendall 1975)
    over the order-value series — the significance companion to
    ``theilsen_slopes``: S = Σ sign(cents_j − cents_i) over the
    customer's DAY-STRICT pairs (day_i < day_j; same-day pairs carry no
    time order and are excluded — documented semantics, mirrored by the
    oracle), VAR18 = 18·Var(S) with the classic value-tie correction
    n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the continuity-corrected
    z = (S − sign(S)) / sqrt(VAR18/18) (0 when S = 0 or VAR18 ≤ 0).

    Exactness: S, n and VAR18 are pure integers; z is division →
    correctly-rounded sqrt → division — the identical three-op f64
    chain as the SQL twin, so the value-hash is bit-stable. Scale
    shape: one customer-keyed exchange of (day, cents) rows; pairs are
    O(k²) in the PER-KEY order count only (tens here), formed by one
    vectorized self-merge per bucket."""
    from .exchange import bucket_exchange

    prep = _ck_day_cents_prep(num_buckets)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        a = g[["ck", "day", "cents"]]
        per = a.groupby("ck", as_index=False).agg(n_orders=("day", "size"))
        ties = a.groupby(["ck", "cents"], as_index=False).agg(
            c=("day", "size"))
        c = ties["c"].to_numpy(np.int64)
        ties["tt"] = c * (c - 1) * (2 * c + 5)
        tt = ties.groupby("ck", as_index=False).agg(tt=("tt", "sum"))
        p = a.merge(a, on="ck", suffixes=("1", "2"))
        p = p[p["day1"] < p["day2"]]
        sgn = np.sign(p["cents2"].to_numpy(np.int64)
                      - p["cents1"].to_numpy(np.int64))
        s = (pd.DataFrame({"ck": p["ck"].to_numpy(np.int64), "s": sgn})
             .groupby("ck", as_index=False).agg(s=("s", "sum")))
        r = per.merge(tt, on="ck").merge(s, on="ck", how="left")
        n = r["n_orders"].to_numpy(np.int64)
        sv = r["s"].fillna(0).to_numpy(np.int64)
        var18 = n * (n - 1) * (2 * n + 5) - r["tt"].to_numpy(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            sig = np.sqrt(var18.astype(np.float64) / 18.0)
            z = (sv - np.sign(sv)).astype(np.float64) / sig
        z = np.where((sv == 0) | (var18 <= 0), 0.0, z)
        return pd.DataFrame({"o_custkey": r["ck"].to_numpy(np.int64),
                             "n_orders": n, "s_stat": sv, "var18": var18,
                             "mk_z_r": round_half_away(z, 6)})

    return bucket_exchange(
        orders.select_columns(["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow"), combine)


def isotonic_orders(orders: ray.data.Dataset,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Per-customer isotonic (monotone nondecreasing) regression of
    daily order value over time — PAVA (Ayer et al. 1955; Robertson,
    Wright & Dykstra 1988). Same-day orders pre-pool into one weighted
    point (w = count, s = Σcents); the fit at day k is its pooled
    block's weighted mean.

    Oracle parity argument: the SQL twin computes the closed-form
    minimax fit max_{i≤k} min_{j≥k} avg(i..j). Every avg is ONE
    correctly-rounded division of exact integers, f64() is monotone,
    and max/min commute with monotone maps, so the SQL's max-min over
    f64 divisions equals f64 of the exact minimax value — which is the
    pooled block mean PAVA divides out directly. The engine's PAVA
    merge test compares exact integer cross-products (never floats),
    so block boundaries are the exact-rational ones on both sides.

    Scale shape: one customer-keyed exchange of per-day (w, s) rows;
    PAVA is O(days) per key with Python-int cross-multiplications."""
    from .exchange import bucket_exchange

    prep = _ck_day_cents_prep(num_buckets)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["ck", "day"], as_index=False).agg(
            w=("cents", "size"), s=("cents", "sum"))
        gg = gg.sort_values(["ck", "day"], kind="mergesort")
        cks, days, ws, ss, fits = [], [], [], [], []
        for ck, t in gg.groupby("ck", sort=False):
            S = [int(v) for v in t["s"]]
            W = [int(v) for v in t["w"]]
            blocks: list[list[int]] = []  # [s, w, n_points]
            for s_, w_ in zip(S, W):
                cs, cw, cn = s_, w_, 1
                while blocks and blocks[-1][0] * cw >= cs * blocks[-1][1]:
                    ps_, pw_, pn = blocks.pop()
                    cs += ps_
                    cw += pw_
                    cn += pn
                blocks.append([cs, cw, cn])
            fit = []
            for s_, w_, n_ in blocks:
                fit.extend([float(np.float64(s_) / np.float64(w_))] * n_)
            cks.append(t["ck"].to_numpy(np.int64))
            days.append(t["day"].to_numpy(np.int64))
            ws.append(t["w"].to_numpy(np.int64))
            ss.append(t["s"].to_numpy(np.int64))
            fits.append(np.asarray(fit, np.float64))
        if not cks:
            return pd.DataFrame({
                "o_custkey": pd.Series([], dtype=np.int64),
                "day": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64),
                "sum_cents": pd.Series([], dtype=np.int64),
                "fit_r": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({
            "o_custkey": np.concatenate(cks),
            "day": np.concatenate(days),
            "n_orders": np.concatenate(ws),
            "sum_cents": np.concatenate(ss),
            "fit_r": round_half_away(np.concatenate(fits), 6)})

    return bucket_exchange(
        orders.select_columns(["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow"), combine)


def _trunc_div(s: int, n: int) -> int:
    """Truncate-toward-zero integer division (DuckDB ``//`` semantics;
    Python ``//`` floors, so negatives need the abs/sign form)."""
    return (abs(s) // n) * (1 if s >= 0 else -1)


def gbm_stumps_lineitem(li: ray.data.Dataset, n_rounds: int = 2,
                        bin_bound: int = 100_000) -> ray.data.Dataset:
    """Gradient-boosted depth-1 trees (Friedman 2001, squared loss) on
    integer-cent revenue with QUANTIZED leaves — ``n_rounds`` stumps
    over the two small-cardinality features (l_quantity, discount
    cents), each round fit on the exact integer residuals of the last.
    Leaf values are trunc(S/n) (DuckDB ``//`` semantics), so residuals
    stay exact int64 forever — no float drift between rounds. The
    split score S_L²/n_L + S_R²/n_R is carried as the exact integer
    pair (gnum, gden) = (S_L²·n_R + S_R²·n_L, n_L·n_R) and ranked by
    the ONE correctly-rounded f64 division float(gnum)/float(gden)
    (gnum < 2^105: Python float(int) == the SQL twin's 2^52 limb-split
    cast, both a single rounding) with (feature, thr) tiebreak — a
    float-rounded argmax, deterministic and identical on both sides by
    construction. Emits the full split-scan trace: one row per
    (round, feature, candidate thr) with exact prefix aggregates, the
    rounded gain, and the is_best flag.

    Scale shape: each round is one map-side (feature, value) bincount
    partial pass + a tiny exchange (distinct values are operator-small,
    counted <= ``bin_bound``); the scan itself touches only the bin
    table. Residuals never materialize — round r's partial pass
    recomputes them from the broadcast (r-1)-stump constants."""
    from .exchange import bucket_exchange

    def make_partial(stumps: list[tuple[int, int, int, int]]):
        def partial(b: pa.Table) -> pd.DataFrame:
            price = b["l_extendedprice"].to_numpy().astype(np.float64)
            y = (np.floor(np.abs(price) * 100.0 + 0.5)
                 * np.sign(price)).astype(np.int64)
            disc = b["l_discount"].to_numpy().astype(np.float64)
            f = np.stack([
                b["l_quantity"].to_numpy().astype(np.int64),
                (np.floor(np.abs(disc) * 100.0 + 0.5)
                 * np.sign(disc)).astype(np.int64)])
            for bf, bt, wl, wr in stumps:
                y = y - np.where(f[bf] <= bt, wl, wr)
            out = []
            for fi in range(2):
                g = pd.DataFrame({"v": f[fi], "y": y}).groupby(
                    "v", as_index=False).agg(n=("y", "size"), s=("y", "sum"))
                g.insert(0, "f", fi)
                out.append(g)
            o = pd.concat(out, ignore_index=True)
            o["n"] = o["n"].astype(np.int64)
            o["s"] = o["s"].astype(np.int64)
            o["_part"] = (o["v"].to_numpy(np.int64) % 8).astype(np.int32)
            return o

        return partial

    narrow = li.select_columns(
        ["l_quantity", "l_discount", "l_extendedprice"])
    stumps: list[tuple[int, int, int, int]] = []
    trace = []
    for rnd in range(1, n_rounds + 1):
        bins = bucket_exchange(
            narrow.map_batches(make_partial(list(stumps)),
                               batch_format="pyarrow"),
            lambda g: g.drop(columns=["_part"]).groupby(
                ["f", "v"], as_index=False)[["n", "s"]].sum()
            .astype({"n": np.int64, "s": np.int64}),
            small_partials=True).to_pandas()
        if len(bins) > bin_bound:
            raise ValueError(f"{len(bins)} bins exceed bound {bin_bound}")
        nt = int(bins[bins["f"] == 0]["n"].sum())
        st = int(bins[bins["f"] == 0]["s"].sum())
        cands = []
        for fi in range(2):
            sub = bins[bins["f"] == fi].sort_values("v")
            n_l = s_l = 0
            for v, n, s in zip(sub["v"], sub["n"], sub["s"]):
                n_l += int(n)
                s_l += int(s)
                n_r, s_r = nt - n_l, st - s_l
                if n_r <= 0:
                    continue
                gnum = s_l * s_l * n_r + s_r * s_r * n_l
                gden = n_l * n_r
                assert gnum < 2 ** 105, "limb-split rank bound"
                fd = float(gnum) / float(gden)
                cands.append((fi, int(v), n_l, s_l, n_r, s_r, fd))
        best = min(cands, key=lambda c: (-c[6], c[0], c[1]))
        bf, bt = best[0], best[1]
        wl = _trunc_div(best[3], best[2])
        wr = _trunc_div(best[5], best[4])
        stumps.append((bf, bt, wl, wr))
        for fi, v, n_l, s_l, n_r, s_r, fd in cands:
            trace.append({
                "rnd": rnd, "feature": fi, "thr": v,
                "n_l": n_l, "s_l": s_l, "n_r": n_r, "s_r": s_r,
                "gain_f": fd,  # bit-identical both sides; ROUND at
                # this magnitude (x*1e6 ~ 2^53) diverges from SQL
                "is_best": int(fi == bf and v == bt)})
    out = pd.DataFrame(trace)
    for c in ("rnd", "feature", "thr", "n_l", "s_l", "n_r", "s_r",
              "is_best"):
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


# ---------------------------------------------------------------------------
# isolation forest (deterministic) over orders
# ---------------------------------------------------------------------------

IF_SPLIT_XOR = np.uint64(0xA5A5A5A5DEADBEEF)


def _if_node_hash(tree: int, node: int) -> tuple[int, int]:
    """(feature index, split draw) for a tree node — a pure splitmix64
    chain of the (tree, node) key, identical to the SQL twin's."""
    old = np.seterr(over="ignore")
    try:
        nh = splitmix64(np.array([tree * 1048576 + node], np.uint64))[0]
        sd = splitmix64(np.array([nh ^ IF_SPLIT_XOR], np.uint64))[0]
    finally:
        np.seterr(**old)
    return int(nh % np.uint64(3)), int(sd)


def _if_build_tree(X: np.ndarray, tree: int, max_depth: int) -> dict:
    """Breadth-order deterministic iTree on the ψ-row sample: node ids
    root=1, children 2n/2n+1; feature by node hash; split uniform in
    (lo, hi] via the split draw (both children provably non-empty on the
    sample); leaf on depth cap, singleton, or constant chosen feature.
    Returns {node: ("i", feat, split) | ("l", depth, size)}."""
    nodes: dict[int, tuple] = {}
    stack = [(1, np.arange(len(X)), 0)]
    while stack:
        node, idx, d = stack.pop()
        feat, sd = _if_node_hash(tree, node)
        vals = X[idx, feat]
        lo, hi = int(vals.min()), int(vals.max())
        if d == max_depth or len(idx) <= 1 or lo == hi:
            nodes[node] = ("l", d, len(idx))
            continue
        split = lo + 1 + sd % (hi - lo)
        nodes[node] = ("i", feat, split)
        left = idx[vals < split]
        right = idx[vals >= split]
        stack.append((2 * node, left, d + 1))
        stack.append((2 * node + 1, right, d + 1))
    return nodes


def iforest_orders(orders: ray.data.Dataset, n_trees: int = 16,
                   psi: int = 256, max_depth: int = 8, k: int = 50,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Isolation forest anomaly detection (Liu, Ting & Zhou 2008) over
    orders — features (total-price cents, epoch day, custkey), fully
    DETERMINISTIC: per-tree ψ-row samples are the smallest
    splitmix64(key ⊕ tree_seed) draws (id-hash sampling, never RNG), and
    every node's feature/split comes from a splitmix chain of
    (tree, node) with the split uniform over the node sample's integer
    (lo, hi] — so the forest is a pure function of the data and both
    sides (engine + SQL twin, which REBUILDS the trees level-by-level
    in unrolled CTEs) derive it bit-identically. The path-length
    correction uses the 1/1024 integer log2 surrogate c_q(n) =
    2·lq1024(n) (documented deviation from the harmonic-number c(n) —
    no transcendental near the oracle). path_q(tree) = 1024·depth +
    c_q(leaf_size); LOW total_q = anomalous.

    Scale shape: the per-tree sample is a per-block top-ψ partial
    selection (a global bottom-k is a subset of the union of block
    bottom-ks) → one tree-keyed exchange → a driver pull of exactly
    n_trees·ψ rows; trees broadcast in the scoring closure; the
    vectorized walk is 8 level steps per tree over each batch; the
    global top-k anomalies ride a distributed sort."""
    from .exchange import bucket_exchange

    old = np.seterr(over="ignore")
    try:
        seeds = splitmix64(np.arange(1, n_trees + 1, dtype=np.uint64))
    finally:
        np.seterr(**old)

    def feats(b: pa.Table) -> pd.DataFrame:
        v = b["o_totalprice"].to_numpy()
        cents = round_half_away(v * 100.0, 0).astype(np.int64)
        day = (b["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy().astype(np.int64),
            "f0": cents, "f1": day.astype(np.int64),
            "f2": b["o_custkey"].to_numpy().astype(np.int64)})

    fds = orders.select_columns(
        ["o_orderkey", "o_totalprice", "o_orderdate", "o_custkey"]) \
        .map_batches(feats, batch_format="pyarrow").materialize()

    def block_bottoms(b: pd.DataFrame) -> pd.DataFrame:
        old = np.seterr(over="ignore")
        try:
            ku = b["key"].to_numpy(np.int64).astype(np.uint64)
            frames = []
            for t in range(n_trees):
                draw = splitmix64(ku ^ seeds[t]).view(np.int64)
                d = b.assign(tree=np.int64(t), draw=draw)
                d = d.sort_values(["draw", "key"], kind="mergesort").head(psi)
                frames.append(d)
        finally:
            np.seterr(**old)
        out = pd.concat(frames, ignore_index=True)
        out["_part"] = (out["tree"].to_numpy(np.int64)
                        % num_buckets).astype(np.int32)
        return out

    def tree_sample(g: pd.DataFrame) -> pd.DataFrame:
        return (g.drop(columns=["_part"])
                .sort_values(["tree", "draw", "key"], kind="mergesort")
                .groupby("tree", sort=False).head(psi))

    samples = bucket_exchange(
        fds.map_batches(block_bottoms, batch_format="pandas"),
        tree_sample).to_pandas()

    trees = {}
    for t in range(n_trees):
        s = samples[samples["tree"] == t].sort_values(
            ["draw", "key"], kind="mergesort")
        X = s[["f0", "f1", "f2"]].to_numpy(np.int64)
        trees[t] = _if_build_tree(X, t, max_depth)

    # flatten to arrays for the vectorized walk
    flat = {}
    for t, nd in trees.items():
        size = max(nd) + 1
        feat = np.full(size, -1, np.int64)
        split = np.zeros(size, np.int64)
        leafd = np.full(size, -1, np.int64)
        leafn = np.zeros(size, np.int64)
        for n, rec in nd.items():
            if rec[0] == "i":
                feat[n], split[n] = rec[1], rec[2]
            else:
                leafd[n], leafn[n] = rec[1], rec[2]
        flat[t] = (feat, split, leafd, leafn)

    from .textstages import _lq1024

    def score(b: pd.DataFrame) -> pd.DataFrame:
        F = b[["f0", "f1", "f2"]].to_numpy(np.int64)
        total = np.zeros(len(b), np.int64)
        for t in range(n_trees):
            feat, split, leafd, leafn = flat[t]
            pos = np.ones(len(b), np.int64)
            for _ in range(max_depth):
                f = feat[pos]
                internal = f >= 0
                x = F[np.arange(len(b)), np.where(internal, f, 0)]
                nxt = 2 * pos + (x >= split[pos]).astype(np.int64)
                pos = np.where(internal, nxt, pos)
            total += 1024 * leafd[pos] + 2 * _lq1024(leafn[pos])
        return pd.DataFrame({"o_orderkey": b["key"].to_numpy(np.int64),
                             "total_q": total})

    scored = fds.map_batches(score, batch_format="pandas")
    return scored.sort(["total_q", "o_orderkey"]).limit(k)


def als_round_events(events: ray.data.Dataset, lam: int = 3,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """One deterministic ALS round (Hu, Koren & Volinsky 2008 implicit
    feedback, rank 1) over the user × event-type count matrix R — the
    recommender-factorization primitive, restated so every sufficient
    statistic is an EXACT integer and the only float is one final
    division per item:

        y⁰_t = 1                          (item init)
        x_u  = Σ_t R[u,t] / (k + λ) = S_u / 8   (λ=3, k=5 types → dyadic)
        y¹_t = Σ_u R[u,t]·x_u / (Σ_u x_u² + λ)
             = 8·Σ_u R[u,t]·S_u / (Σ_u S_u² + 64λ)  — integer num / den

    Both statistics ride the exchanges as int64 partials (order-free
    sums; S_u² stays ≤ 2^53 at any realistic per-user count), so the SQL
    twin is exact; y_f = num/den is one identical f64 division on both
    sides. Scale shape: one user-bucketed exchange computes S_u and the
    per-(type) numerator partials IN the bucket (R·S_u co-grouped per
    user — no second scan), the global Σ S_u² travels as TAGGED den rows
    (is_den flag, never a magic key — CLAUDE.md sketch-bookkeeping rule),
    and a second exchange reduces to k item rows + one den row; the
    driver touches k+1 rows."""
    from .exchange import bucket_exchange

    def part(b: pd.DataFrame) -> pd.DataFrame:
        d = b.groupby(["user_id", "event_type"], sort=False) \
            .size().reset_index(name="r")
        d["r"] = d["r"].astype(np.int64)
        d["user_id"] = d["user_id"].astype(np.int64)
        d["_part"] = (d["user_id"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return d

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).groupby(
            ["user_id", "event_type"], sort=False, as_index=False)["r"] \
            .sum()
        su = g.groupby("user_id", sort=False)["r"].transform("sum") \
            .to_numpy(np.int64)
        items = pd.DataFrame({
            "event_type": g["event_type"].astype(object),
            "val": 8 * g["r"].to_numpy(np.int64) * su,
            "is_den": np.int64(0)})
        s_u = g.groupby("user_id", sort=False)["r"].sum() \
            .to_numpy(np.int64)
        den = pd.DataFrame({"event_type": np.array([""], object),
                            "val": np.array([(s_u * s_u).sum()], np.int64),
                            "is_den": np.int64(1)})
        out = pd.concat([items, den], ignore_index=True)
        h = _tr_part(out["event_type"].to_numpy(object), num_buckets)
        out["_part"] = np.where(out["is_den"].to_numpy() == 1,
                                np.int32(0), h).astype(np.int32)
        return out

    def reduce_rows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        out = g.groupby(["event_type", "is_den"], sort=False,
                        as_index=False)["val"].sum()
        out["val"] = out["val"].astype(np.int64)
        return out

    rows = bucket_exchange(
        bucket_exchange(events.map_batches(part, batch_format="pandas"),
                        per_user),
        reduce_rows).to_pandas()  # k item rows + 1 den row — bounded
    den = int(rows.loc[rows["is_den"] == 1, "val"].sum()) + 64 * lam
    items = rows[rows["is_den"] == 0].copy()
    items = items.sort_values("event_type").reset_index(drop=True)
    out = pd.DataFrame({
        "event_type": items["event_type"].astype(object),
        "y_num": items["val"].to_numpy(np.int64),
        "y_den": np.int64(den),
        "y_f": items["val"].to_numpy(np.int64).astype(np.float64)
        / np.float64(den)})
    return ray.data.from_pandas(out)


def _tr_part(toks: np.ndarray, num_buckets: int) -> np.ndarray:
    from ..functions.hashing import fnv1a64, splitmix64

    old = np.seterr(over="ignore")
    try:
        return (splitmix64(fnv1a64(toks.astype(object)))
                % np.uint64(num_buckets)).astype(np.int32)
    finally:
        np.seterr(**old)


def cart_depth2_lineitem(ds: ray.data.Dataset,
                         num_buckets: int = 16) -> ray.data.Dataset:
    """Exact depth-2 CART (Breiman et al. 1984) over integer features —
    the histogram-split decision tree every gradient-boosting/forest
    trainer builds distributed: integer features q = l_quantity,
    d = discount cents, t = tax cents; label y = [l_returnflag = 'R'].

    Split search is EXACT, not sampled: per-batch (feature, value, label)
    count partials pre-aggregate before one tiny exchange (≤ 3 features ×
    values × 2 labels rows — the histogram, not the data, moves), the
    driver scans cumulative sums for the argmax of the weighted purity
    Σ_child (c0² + c1²)/n (maximizing this minimizes weighted Gini; all
    numerators exact int64 < 2⁵³, one f64 division per child — the SQL
    twin orders by the bit-identical expression, ties to smallest
    (feature, threshold)). A second conditioned pass repeats the search
    inside each root child. Two passes total at any data size.

    Output: one row per node (0 root, 1 left, 2 right): chosen feature
    (0=q, 1=d, 2=t), threshold (left = value ≤ T), n, label-1 count, and
    the purity score quantized ·2²⁰."""
    from .exchange import bucket_exchange

    def feats(b: pd.DataFrame) -> pd.DataFrame:
        q = b["l_quantity"].to_numpy(np.float64).astype(np.int64)
        d = round_half_away(b["l_discount"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        t = round_half_away(b["l_tax"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        y = (b["l_returnflag"].to_numpy(object) == "R").astype(np.int64)
        return pd.DataFrame({"f0": q, "f1": d, "f2": t, "y": y})

    def hist_partial(cond):
        # cond: None (root) or (froot, troot, side) restricting rows
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            fb = feats(b)
            if cond is not None:
                froot, troot, side = cond
                m = fb[f"f{froot}"].to_numpy() <= troot
                fb = fb[m if side == 0 else ~m]
            frames = []
            for f in range(3):
                g = fb.groupby([f"f{f}", "y"], sort=False).size().rename("n").reset_index()
                g.columns = ["v", "y", "n"]
                g.insert(0, "f", np.int64(f))
                frames.append(g)
            out = pd.concat(frames, ignore_index=True)
            out["n"] = out["n"].astype(np.int64)
            out["_part"] = (out["f"] % num_buckets).astype(np.int32)
            return out

        return fn

    def hist_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["f", "v", "y"], sort=False, as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    def best_split(hist: pd.DataFrame):
        """argmax over (f, T) of Σ_child (c0²+c1²)/n from cumulative
        histogram sums; ties to smallest (f, T). Returns (f, T, score,
        n, c1_total) or None when no valid split exists."""
        best = None
        # totals from ONE feature's histogram (each row appears once per
        # feature in the long form — summing all three triple-counts)
        h0 = hist[hist["f"] == 0]
        n_tot = int(h0["n"].sum())
        c1_tot = int(h0.loc[h0["y"] == 1, "n"].sum())
        for f in range(3):
            h = hist[hist["f"] == f]
            piv = h.pivot_table(index="v", columns="y", values="n",
                                aggfunc="sum", fill_value=0)
            for y in (0, 1):
                if y not in piv.columns:
                    piv[y] = 0
            piv = piv.sort_index()
            c0 = piv[0].to_numpy(np.int64).cumsum()
            c1 = piv[1].to_numpy(np.int64).cumsum()
            vs = piv.index.to_numpy(np.int64)
            for i in range(len(vs) - 1):  # last value: empty right side
                nl = int(c0[i] + c1[i])
                nr = n_tot - nl
                if nl == 0 or nr == 0:
                    continue
                sl = int(c0[i]) ** 2 + int(c1[i]) ** 2
                sr = (int(c0[-1] - c0[i])) ** 2 + (int(c1[-1] - c1[i])) ** 2
                score = float(sl) / float(nl) + float(sr) / float(nr)
                key = (-score, f, int(vs[i]))
                if best is None or key < best[0]:
                    best = (key, f, int(vs[i]), score)
        if best is None:
            return None
        _, f, thr, score = best
        return f, thr, score, n_tot, c1_tot

    root_hist = bucket_exchange(
        ds.map_batches(hist_partial(None), batch_format="pandas"),
        hist_sum, small_partials=True).to_pandas()
    root = best_split(root_hist)
    rows = []

    def node_row(node, pick):
        f, thr, score, n, c1 = pick
        rows.append({"node": node, "feature": f, "threshold": thr,
                     "n": n, "c1": c1,
                     "score_q": int(np.floor(score * 1048576.0 + 0.5))})

    node_row(0, root)
    for side in (0, 1):
        child_hist = bucket_exchange(
            ds.map_batches(hist_partial((root[0], root[1], side)),
                           batch_format="pandas"),
            hist_sum, small_partials=True).to_pandas()
        pick = best_split(child_hist)
        if pick is None:  # pure / single-valued child: emit a leaf marker
            ch0 = child_hist[child_hist["f"] == 0]
            n = int(ch0["n"].sum())
            c1 = int(ch0.loc[ch0["y"] == 1, "n"].sum())
            rows.append({"node": side + 1, "feature": -1, "threshold": -1,
                         "n": n, "c1": c1, "score_q": -1})
        else:
            node_row(side + 1, pick)
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


def learned_index_audit(ds: ray.data.Dataset, key_col: str = "o_orderkey",
                        num_buckets: int = 32) -> ray.data.Dataset:
    """Learned-index leaf audit (Kraska et al. 2018 — the RMI question
    "how well does a linear model predict a key's position?"): rank(k) =
    #keys < k via the distributed exclusive prefix scan (val = 1), least
    squares of rank on key from exact integer sufficient statistics
    (n, Σk, Σr, Σkr, Σk² — int64-exact at this key range; the Cramer
    expressions are ONE fixed f64 parenthesization both sides), and the
    max absolute prediction error — the page-search bound a learned
    index stores per leaf. Per-row errors quantize to integers BEFORE
    the max (f64 max of identical ints is engine-free). Output: one row
    (n, slope_q, intercept_q, max_err_q), all ·2²⁰-quantized ints."""
    from .exchange import bucket_exchange
    from .scan import exclusive_prefix_sum

    ranked = exclusive_prefix_sum(
        ds.select_columns([key_col]).map_batches(
            lambda b: pd.DataFrame({key_col: b[key_col].to_numpy(np.int64),
                                    "one": np.int64(1)}),
            batch_format="pandas"),
        key=key_col, val="one")

    def sums(b: pd.DataFrame) -> pd.DataFrame:
        k = b[key_col].to_numpy(np.int64)
        r = b["prefix"].to_numpy(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(k))], "sk": [np.int64(k.sum())],
            "sr": [np.int64(r.sum())], "skr": [np.int64((k * r).sum())],
            "sk2": [np.int64((k * k).sum())], "_part": [np.int32(0)]})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["_part"]).sum().to_frame().T
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    s = bucket_exchange(ranked.map_batches(sums, batch_format="pandas"),
                        combine, small_partials=True).to_pandas().iloc[0]
    n, sk, sr, skr, sk2 = (float(s["n"]), float(s["sk"]), float(s["sr"]),
                           float(s["skr"]), float(s["sk2"]))
    den = n * sk2 - sk * sk
    if den == 0.0 or n == 0.0:
        # Degenerate key distribution (all keys equal / single row): a flat
        # model at the mean position is the only least-squares solution.
        slope = 0.0
        intercept = (sr / n) if n > 0.0 else 0.0
    else:
        slope = (n * skr - sk * sr) / den
        intercept = (sr - slope * sk) / n

    def err_partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b[key_col].to_numpy(np.int64).astype(np.float64)
        r = b["prefix"].to_numpy(np.int64).astype(np.float64)
        e = np.abs(intercept + slope * k - r)
        eq = np.floor(e * 1048576.0 + 0.5).astype(np.int64)
        return pd.DataFrame({"m": [np.int64(eq.max()) if len(eq) else np.int64(0)],
                             "_part": [np.int32(0)]})

    def err_combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"m": [np.int64(g["m"].max())]})

    me = bucket_exchange(ranked.map_batches(err_partial, batch_format="pandas"),
                         err_combine, small_partials=True).to_pandas().iloc[0]["m"]
    out = pd.DataFrame({
        "n": [np.int64(s["n"])],
        "slope_q": [np.int64(np.floor(slope * 1048576.0 + 0.5))],
        "intercept_q": [np.int64(np.floor(intercept * 1048576.0 + 0.5))],
        "max_err_q": [np.int64(me)]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


# ---------------------------------------------------------------------------
# bagged-CART random forest (reference learning.py:560-592 clfdict's
# RandomForest workhorse; VERDICT r4 "Next round" #4)
# ---------------------------------------------------------------------------

RF_SEED = 11
RF_TREES = 8
RF_BAG_PERMILLE = 632  # the 63.2% unique-row mass of a true bootstrap
_RF_NO_SPLIT_THR = np.int64(2**62)  # splitless child: everything routes left


def _rf_seeds(n_trees: int = RF_TREES, seed: int = RF_SEED) -> np.ndarray:
    return splitmix64(np.arange(1, n_trees + 1, dtype=np.uint64) * np.uint64(seed))


def _rf_mtry_excl(tree: int, node: int, seed: int = RF_SEED) -> int:
    """Feature subsampling (the RandomForest mtry rule, here mtry=2 of
    3): each (tree, node) EXCLUDES one hash-chosen feature from its
    split search — this, not the bags alone, is what decorrelates trees
    on a dataset whose bootstrap histograms are nearly identical.
    Deterministic in (tree, node, seed) only, so the SQL twin inlines
    the exclusions as literals. Nodes: 0 root, 1 left child, 2 right."""
    h = splitmix64(np.asarray([seed * 1_000_003 + tree * 4 + node],
                              np.uint64))[0]
    return int(h % np.uint64(3))


def _rf_feats(b: pd.DataFrame) -> pd.DataFrame:
    """The cart_depth2 integer feature triple + a LEARNABLE noisy label.

    Every natural column in the synthetic lineitem is INDEPENDENT of the
    integer features (measured: returnflag and extendedprice are flat
    across every quantity/discount/tax bucket), so an honest label makes
    every leaf the same majority class and the forest degenerates to one
    constant vote. The label here is the standard synthetic-benchmark
    construction instead: a linear feature rule plus id-hash noise,
    y = [10·f0 + 7·f1 + 13·f2 + splitmix64(k) % 40 > 360] — learnable
    (trees recover the rule), noisy (bags and mtry masks disagree near
    the boundary, so the vote is non-degenerate), layout-invariant and
    SQL-expressible. Bagging key k = l_orderkey·8 + l_linenumber (NOT
    unique in the synthetic lineitem, which is fine: duplicates draw
    identical bag membership and label noise both sides)."""
    q = b["l_quantity"].to_numpy(np.float64).astype(np.int64)
    d = round_half_away(b["l_discount"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
    t = round_half_away(b["l_tax"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
    k = (b["l_orderkey"].to_numpy(np.int64) * 8
         + b["l_linenumber"].to_numpy(np.int64))
    noise = (splitmix64(k.astype(np.uint64)) % np.uint64(40)).astype(np.int64)
    y = (10 * q + 7 * d + 13 * t + noise > 360).astype(np.int64)
    return pd.DataFrame({"f0": q, "f1": d, "f2": t, "y": y, "k": k})


def _rf_bags(keys: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """[n, B] bool in-bag matrix: splitmix64(k ^ seed_b) % 1000 < 632."""
    old = np.seterr(over="ignore")
    try:
        h = splitmix64(keys[:, None].astype(np.uint64) ^ seeds[None, :])
    finally:
        np.seterr(**old)
    return (h % np.uint64(1000)) < np.uint64(RF_BAG_PERMILLE)


def _rf_best_split(c0: np.ndarray, c1: np.ndarray, vs: np.ndarray,
                   f: int, best):
    """Scan one feature's cumulative histogram for the weighted-purity
    argmax (the cart_depth2 rule: Σ_child (c0²+c1²)/n, ties to smallest
    (f, thr)); returns the updated best tuple (key, f, thr, leafs)."""
    cc0, cc1 = c0.cumsum(), c1.cumsum()
    n_tot, t1 = int(cc0[-1] + cc1[-1]), int(cc1[-1])
    for i in range(len(vs) - 1):
        nl = int(cc0[i] + cc1[i])
        nr = n_tot - nl
        if nl == 0 or nr == 0:
            continue
        sl = int(cc0[i]) ** 2 + int(cc1[i]) ** 2
        sr = int(cc0[-1] - cc0[i]) ** 2 + int(cc1[-1] - cc1[i]) ** 2
        score = float(sl) / float(nl) + float(sr) / float(nr)
        key = (-score, f, int(vs[i]))
        if best is None or key < best[0]:
            # leaf classes: majority with ties to 0 (2·c1 > n)
            ll = int(2 * cc1[i] > nl)
            lr = int(2 * (t1 - cc1[i]) > nr)
            best = (key, f, int(vs[i]), ll, lr)
    return best


def rf_fit_bagged_cart(ds: ray.data.Dataset, n_trees: int = RF_TREES,
                       seed: int = RF_SEED,
                       num_buckets: int = 16) -> pd.DataFrame:
    """Fit ``n_trees`` depth-2 CART trees on hash-derived bootstrap bags
    (the distributed RandomForest trainer): two histogram passes total —
    pass 1 builds every tree's ROOT (feature, value, label) histogram at
    once (long-form partials pre-aggregate per batch; only the tiny
    histogram crosses the exchange), pass 2 the per-(tree, root-side)
    child histograms. The driver scans counted cumulative sums only.

    Returns the forest as a params DataFrame, one row per tree:
    rf/rt (root split), s{0,1}f/s{0,1}t (child splits; a splitless child
    gets thr 2⁶² so every row routes left), c{side}{child} leaf classes.
    """
    from .exchange import bucket_exchange

    B = n_trees
    seeds = _rf_seeds(B, seed)

    def hist_partial(cond_params):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            fb = _rf_feats(b)
            bags = _rf_bags(fb["k"].to_numpy(), seeds)
            frames = []
            for s in range(B):
                sub = fb[bags[:, s]]
                if cond_params is not None:
                    rf_, rt_ = cond_params[s]
                    side = (sub[f"f{rf_}"].to_numpy() > rt_).astype(np.int64)
                else:
                    side = np.zeros(len(sub), np.int64)
                for f in range(3):
                    g = (pd.DataFrame({"side": side,
                                       "v": sub[f"f{f}"].to_numpy(),
                                       "y": sub["y"].to_numpy()})
                         .groupby(["side", "v", "y"], sort=False)
                         .size().rename("n").reset_index())
                    g.insert(0, "f", np.int64(f))
                    g.insert(0, "tree", np.int64(s))
                    frames.append(g)
            out = pd.concat(frames, ignore_index=True)
            out["n"] = out["n"].astype(np.int64)
            out["_part"] = ((out["tree"] * 3 + out["f"])
                            % num_buckets).astype(np.int32)
            return out

        return fn

    def hist_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["tree", "f", "side", "v", "y"], sort=False,
                        as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    def gather(cond_params) -> pd.DataFrame:
        return bucket_exchange(
            ds.map_batches(hist_partial(cond_params), batch_format="pandas"),
            hist_sum, small_partials=True).to_pandas()

    # pass 1: root splits
    roots = []
    h1 = gather(None)
    for s in range(B):
        best = None
        excl = _rf_mtry_excl(s, 0, seed)
        for f in range(3):
            if f == excl:
                continue
            h = h1[(h1["tree"] == s) & (h1["f"] == f)]
            piv = h.pivot_table(index="v", columns="y", values="n",
                                aggfunc="sum", fill_value=0)
            for y in (0, 1):
                if y not in piv.columns:
                    piv[y] = 0
            piv = piv.sort_index()
            best = _rf_best_split(piv[0].to_numpy(np.int64),
                                  piv[1].to_numpy(np.int64),
                                  piv.index.to_numpy(np.int64), f, best)
        roots.append((best[1], best[2]))

    # pass 2: child splits conditioned on each tree's root
    h2 = gather(roots)
    params = []
    for s in range(B):
        row = {"tree": s, "rf": roots[s][0], "rt": roots[s][1]}
        for side in (0, 1):
            best = None
            tot_n = tot_1 = 0
            excl = _rf_mtry_excl(s, 1 + side, seed)
            for f in range(3):
                h = h2[(h2["tree"] == s) & (h2["f"] == f)
                       & (h2["side"] == side)]
                piv = h.pivot_table(index="v", columns="y", values="n",
                                    aggfunc="sum", fill_value=0)
                for y in (0, 1):
                    if y not in piv.columns:
                        piv[y] = 0
                piv = piv.sort_index()
                if f == 0:
                    tot_n = int(piv.to_numpy().sum())
                    tot_1 = int(piv[1].sum())
                if f == excl:  # mtry: totals still come from f0's rows
                    continue
                best = _rf_best_split(piv[0].to_numpy(np.int64),
                                      piv[1].to_numpy(np.int64),
                                      piv.index.to_numpy(np.int64), f, best)
            if best is None:  # splitless child: route left, leaf = majority
                row[f"s{side}f"] = 0
                row[f"s{side}t"] = int(_RF_NO_SPLIT_THR)
                cls = int(2 * tot_1 > tot_n)
                row[f"c{side}0"] = cls
                row[f"c{side}1"] = cls
            else:
                row[f"s{side}f"] = best[1]
                row[f"s{side}t"] = best[2]
                row[f"c{side}0"] = best[3]
                row[f"c{side}1"] = best[4]
        params.append(row)
    out = pd.DataFrame(params)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def rf_predict_lineitem(ds: ray.data.Dataset, n_trees: int = RF_TREES,
                        seed: int = RF_SEED) -> ray.data.Dataset:
    """Forest prediction over EVERY row (reference model.predict shape):
    the fitted params broadcast once (``ray.put``), one vectorized routing
    pass computes all trees' votes per batch. pred = majority with ties
    to 0 (2·votes > n_trees)."""
    import ray as _ray

    model = rf_fit_bagged_cart(ds, n_trees=n_trees, seed=seed)
    mref = _ray.put(model)

    def predict(b: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(mref) if isinstance(mref, _ray.ObjectRef) else mref
        fb = _rf_feats(b)
        F = fb[["f0", "f1", "f2"]].to_numpy(np.int64)  # [n, 3]
        votes = np.zeros(len(fb), np.int64)
        for _, t in m.iterrows():  # n_trees iterations, vectorized inside
            side = (F[:, t["rf"]] > t["rt"]).astype(np.int64)
            cf = np.where(side == 0, t["s0f"], t["s1f"])
            ct = np.where(side == 0, t["s0t"], t["s1t"])
            child = (F[np.arange(len(fb)), cf] > ct).astype(np.int64)
            cls = np.array([[t["c00"], t["c01"]], [t["c10"], t["c11"]]],
                           np.int64)[side, child]
            votes += cls
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
            "l_linenumber": b["l_linenumber"].to_numpy(np.int64),
            "votes": votes,
            "pred": (2 * votes > n_trees).astype(np.int64)})

    return ds.map_batches(predict, batch_format="pandas")


def rf_oob_error(ds: ray.data.Dataset, n_trees: int = RF_TREES,
                 seed: int = RF_SEED) -> ray.data.Dataset:
    """Out-of-bag generalization estimate for the bagged-CART forest
    (the honest-error companion every RandomForest reports): per row,
    only trees whose bag EXCLUDES the row vote (signed majority, ties to
    class 0); rows with no OOB tree abstain. One pass after the fit;
    per-batch integer partials, single-row output (n_oob, n_err,
    err_permille = floor(1000·err/n + 0.5))."""
    import ray as _ray

    model = rf_fit_bagged_cart(ds, n_trees=n_trees, seed=seed)
    mref = _ray.put(model)
    seeds = _rf_seeds(n_trees, seed)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(mref) if isinstance(mref, _ray.ObjectRef) else mref
        fb = _rf_feats(b)
        F = fb[["f0", "f1", "f2"]].to_numpy(np.int64)
        y = fb["y"].to_numpy(np.int64)
        bags = _rf_bags(fb["k"].to_numpy(), seeds)
        signed = np.zeros(len(fb), np.int64)
        for bi, (_, t) in enumerate(m.iterrows()):
            side = (F[:, t["rf"]] > t["rt"]).astype(np.int64)
            cf = np.where(side == 0, t["s0f"], t["s1f"])
            ct = np.where(side == 0, t["s0t"], t["s1t"])
            child = (F[np.arange(len(fb)), cf] > ct).astype(np.int64)
            cls = np.array([[t["c00"], t["c01"]], [t["c10"], t["c11"]]],
                           np.int64)[side, child]
            signed += np.where(bags[:, bi], 0, 2 * cls - 1)
        has_vote = (~bags).any(axis=1)
        guess = (signed > 0).astype(np.int64)
        err = (guess != y) & has_vote
        return pd.DataFrame({"n_oob": [np.int64(has_vote.sum())],
                             "n_err": [np.int64(err.sum())],
                             "_part": [np.int32(0)]})

    from .exchange import bucket_exchange

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["_part"]).sum().to_frame().T
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    s = bucket_exchange(ds.map_batches(partial, batch_format="pandas"),
                        combine, small_partials=True).to_pandas().iloc[0]
    n_oob, n_err = int(s["n_oob"]), int(s["n_err"])
    pm = int(np.floor(1000.0 * n_err / max(n_oob, 1) + 0.5))
    out = pd.DataFrame({"n_oob": [n_oob], "n_err": [n_err],
                        "err_permille": [pm]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)
