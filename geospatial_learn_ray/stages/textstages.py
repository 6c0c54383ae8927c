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

def decontaminate_stage(ds: ray.data.Dataset, id_col: str = "doc_id",
                        eval_mod: int = 100, n: int = 8) -> ray.data.Dataset:
    """Benchmark decontamination (the GPT-3 appx-C / Gopher n-gram overlap
    check): flag training documents sharing any word ``n``-gram with the
    held-out eval split (here the deterministic ``doc_id % eval_mod == 0``
    slice — id-hash style, reproducible at any cluster size).

    The eval side is SMALL by construction, so its distinct-gram set is
    collected once and broadcast via ``ray.put`` (the map-side broadcast
    join pattern — no shuffle); training batches probe it with a
    vectorized ``Series.isin``. Output per training doc: distinct n-gram
    count, overlapping-gram count, contaminated flag (ints)."""
    import ray as _ray

    eval_ds = ds.filter(lambda r: r[id_col] % eval_mod == 0)

    def eval_grams(b: pd.DataFrame) -> pd.DataFrame:
        f = textproc.word_ngrams_frame(b["text"].reset_index(drop=True), n)
        return pd.DataFrame({"gram": f["gram"].drop_duplicates()})

    ev = set()
    for batch in eval_ds.map_batches(eval_grams, batch_format="pandas").iter_batches(batch_format="pandas"):
        ev.update(batch["gram"])
    ref = _ray.put(frozenset(ev))

    class Probe:
        def __init__(self, r):
            self.ev = _ray.get(r) if isinstance(r, _ray.ObjectRef) else r

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            train = b[b[id_col] % eval_mod != 0].reset_index(drop=True)
            f = textproc.word_ngrams_frame(train["text"], n).drop_duplicates()
            hit = f["gram"].isin(self.ev)
            ng = f.groupby("row").size()
            nc = f[hit].groupby("row").size()
            idx = np.arange(len(train))
            ngv = ng.reindex(idx).fillna(0).astype(np.int64)
            ncv = nc.reindex(idx).fillna(0).astype(np.int64)
            return pd.DataFrame({
                id_col: train[id_col].to_numpy(),
                "n_grams": ngv.to_numpy(),
                "n_contaminated": ncv.to_numpy(),
                "contaminated": (ncv > 0).astype(np.int64).to_numpy(),
            })

    return ds.map_batches(Probe, fn_constructor_args=(ref,), batch_format="pandas", concurrency=(1, 8))

def stratified_sample_stage(ds: ray.data.Dataset, rates: dict[str, float],
                            stratum_col: str = "lang", id_col: str = "doc_id",
                            default_rate: float = 1.0, denom: int = 1_000_000) -> ray.data.Dataset:
    """Deterministic stratified sampling (training-data mixing weights):
    keep a row iff splitmix64(id) % denom < rate[stratum]·denom — the
    id-hash draw is reproducible at any cluster size / block structure
    (unlike seeded RNG, CLAUDE.md) and restates exactly in SQL. Integer
    thresholds are fixed once per stratum, so there are no float-compare
    edges."""
    from ..functions.hashing import splitmix64

    thr = {k: int(round(r * denom)) for k, r in rates.items()}
    dthr = int(round(default_rate * denom))

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        draw = splitmix64(b[id_col].to_numpy().astype(np.uint64)) % np.uint64(denom)
        cut = b[stratum_col].map(thr).fillna(dthr).astype(np.int64).to_numpy()
        return b[draw.astype(np.int64) < cut]

    return ds.map_batches(fn, batch_format="pandas")
