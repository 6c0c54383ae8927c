"""Model-scoring actor pool — classify_pixel_bloc / classify_object, Ray-first.

Reference semantics: load a pickled model ONCE (learning.py:1325-1328),
then predict per 256² block (learning.py:1362-1395) or per attribute table
(learning.py:1541). The reference's per-tile-file variant reloads the model
per file (learning.py:1232) — the actor pool fixes that by construction:
the artifact is loaded in ``__init__`` (once per actor), batches stream
through ``__call__``.

The model artifact here is a deterministic linear scorer persisted as JSON
(no sklearn wheel in this sandbox): ``score = Σ wᵢ·xᵢ + b``, class =
``score > threshold``. Deterministic ⇒ the DuckDB oracle restates the exact
formula, giving the scorer stage a STRONG value-hash conformance check —
the same contract a pickled RF would get via golden outputs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data

from ..functions.rounding import round_half_away

# weights chosen so the score of 2-decimal inputs is an EXACT 4-decimal
# value: both engines then round identically (no half-boundary ulp flips)
DEFAULT_FEATURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
DEFAULT_WEIGHTS = (0.02, 0.01, -5.0, 3.0)
DEFAULT_BIAS = -0.75
DEFAULT_THRESHOLD = 530.00005  # never equals a 4-decimal score → no > ties


def train_linear_model(path: str, features=DEFAULT_FEATURES, weights=DEFAULT_WEIGHTS,
                       bias: float = DEFAULT_BIAS, threshold: float = DEFAULT_THRESHOLD) -> str:
    """``learning.create_model`` analogue: persist the model artifact
    (learning.py:678 joblib.dump → JSON here). Fixed closed-form weights
    keep outputs exactly reproducible across retries and vs the oracle."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"features": list(features), "weights": list(weights), "bias": bias, "threshold": threshold}, f)
    return path


class LinearScorer:
    """Actor-pool callable: artifact loaded once per actor (``__init__``),
    vectorized numpy dot per batch (``__call__``)."""

    def __init__(self, model_path: str):
        with open(model_path) as f:
            m = json.load(f)
        self.features = m["features"]
        self.w = np.asarray(m["weights"], np.float64)
        self.b = float(m["bias"])
        self.t = float(m["threshold"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = batch[self.features].to_numpy(np.float64)
        score = X @ self.w + self.b
        batch = batch.copy()
        batch["score"] = round_half_away(score, 6)
        batch["pred"] = (score > self.t).astype(np.int32)
        return batch


def score_stage(ds: ray.data.Dataset, model_path: str, concurrency=(1, 8), batch_size: int = 65536,
                keep_cols: list[str] | None = None) -> ray.data.Dataset:
    out = ds.map_batches(
        LinearScorer,
        fn_constructor_args=(model_path,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    if keep_cols:
        out = out.select_columns(keep_cols + ["score", "pred"])
    return out


def sql_for_scorer(table_expr: str, id_cols: str, features=DEFAULT_FEATURES, weights=DEFAULT_WEIGHTS,
                   bias: float = DEFAULT_BIAS, threshold: float = DEFAULT_THRESHOLD) -> str:
    """The oracle restatement of the scorer (same formula, same rounding)."""
    linear = " + ".join(f"{w!r} * {f}" for f, w in zip(features, weights))
    expr = f"{linear} + {bias!r}"
    return (
        f"SELECT {id_cols}, ROUND({expr}, 6) AS score, "
        f"CASE WHEN ({expr}) > {threshold!r} THEN 1 ELSE 0 END AS pred FROM {table_expr}"
    )


class SemsegCNN:
    """Actor-pool callable for the CNN semantic-segmentation forward
    (reference convnet.py:431 ``semseg_pred`` / convutils.py:559
    ``pad_predict``): the network weights materialize ONCE per actor in
    ``__init__`` (the model-checkpoint-load shape — here from the fixed
    integer constants in functions/convnet.py), and ``__call__`` runs the
    fully vectorized integer forward over a whole batch of tile windows.

    Emits one row per tile: per-class pixel counts + the exact int64 sum
    of winning logits — the aggregate the strict SQL twin value-hashes
    (oraclesql._semseg_cnn_sql)."""

    def __init__(self, side: int):
        from ..functions import convnet

        self.side = side
        self.forward = convnet.forward
        self.n_classes = convnet.N_CLASSES

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            z = pd.Series([], dtype=np.int64)
            return pd.DataFrame({"tile_x": z, "tile_y": z, "n_c0": z,
                                 "n_c1": z, "n_c2": z, "win_logit_sum": z})
        V = np.stack(b["band_values"].to_numpy()).reshape(
            len(b), self.side, self.side)
        pred, win = self.forward(V)
        flat = pred.reshape(len(b), -1)
        counts = [(flat == k).sum(axis=1).astype(np.int64)
                  for k in range(self.n_classes)]
        return pd.DataFrame({
            "tile_x": b["tile_x"].to_numpy(np.int64),
            "tile_y": b["tile_y"].to_numpy(np.int64),
            "n_c0": counts[0], "n_c1": counts[1], "n_c2": counts[2],
            "win_logit_sum": win.reshape(len(b), -1).sum(axis=1).astype(np.int64)})


def semseg_cnn_stage(ds: ray.data.Dataset, side: int = 16,
                     concurrency=(1, 8), batch_size: int | None = None) -> ray.data.Dataset:
    """Per-tile CNN segmentation over the tiles table — map-only (each
    window forward is independent; zero-pad borders), actor pool sized
    min-1 so the 4-CPU test fixture never deadlocks."""
    return ds.map_batches(
        SemsegCNN, fn_constructor_args=(side,), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)
