"""Text stages over the pages/documents tables — actor pools with compiled
state (regexes / marker lists built once per actor, SURVEY.md §2.3), batch
bodies vectorized in functions/textproc.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions import _bs, textproc
from ..functions.rounding import round_half_away


class TextExtractor:
    """HTML→text actor (regexes compiled once per actor in textproc module
    import; per-batch loop is per-document regex work — irreducible).
    Output keeps ``url`` + extracted ``text`` (byte-identity contract)."""

    def __init__(self, keep_cols: tuple[str, ...] = ("url",)):
        self.keep_cols = list(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = textproc.extract_text_series(batch["html"])
        out = batch.select(self.keep_cols)
        return out.append_column("text", pa.array(texts, pa.string()))


def extract_stage(ds: ray.data.Dataset, keep_cols=("url",), batch_size: int | None = None) -> ray.data.Dataset:
    """pages(html) → (keep_cols, text). Drops the wide ``html`` binary column
    immediately after extraction so downstream shuffles move narrow rows
    (SURVEY.md §7 'Wide binary rows').

    STATELESS task pool, not an actor pool: the only "state" is
    module-level compiled regexes, which every worker process has after
    import — a task pool elastically uses all cores immediately, while a
    (1, N) actor pool ramps up slowly and serializes the hot stage. Actor
    pools are reserved for genuinely loaded state (model artifacts, polygon
    indexes — see stages/scorer.py, stages/pip_join.py)."""
    cols = list(keep_cols)

    def fn(batch: pa.Table) -> pa.Table:
        texts = textproc.extract_text_series(batch["html"])
        out = batch.select(cols)
        return out.append_column("text", pa.array(texts, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size or _bs())


def token_count_stage(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = textproc.token_counts(b["text"])
        out.insert(0, id_col, b[id_col].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


def quality_stage(ds: ray.data.Dataset, id_col: str = "doc_id", round_to: int = 4) -> ray.data.Dataset:
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = textproc.quality_scores(b["text"])
        for c in ("punct_ratio", "stop_ratio", "mean_tok_len", "quality"):
            out[c] = round_half_away(out[c], round_to)
        out.insert(0, id_col, b[id_col].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


def lang_id_stage(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: b[id_col].to_numpy(), "lang_pred": textproc.lang_id(b["text"]).to_numpy()})

    return ds.map_batches(fn, batch_format="pandas")


def fingerprint_stage(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Winnowing rolling-hash fingerprints (doc_fingerprint operator)."""

    def fn(b: pa.Table) -> pa.Table:
        fp, cnt = textproc.winnow_fingerprints(b["text"])
        return pa.table({id_col: b[id_col], "fingerprint": pa.array(fp), "n_fingerprints": pa.array(cnt)})

    return ds.map_batches(fn, batch_format="pyarrow")

def repetition_stage(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Gopher repetition quality filters (Rae et al. 2021 §A1.1) per doc —
    see functions/textproc.repetition_scores."""
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = textproc.repetition_scores(b["text"])
        out.insert(0, id_col, b[id_col].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")
