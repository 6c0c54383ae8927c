"""Composed corpus-preparation pipeline — the end-to-end text analogue of
the flagship raster pipeline: quality filter → exact dedup → language-mix
sampling → sequence packing, each stage the already-oracled operator, the
COMPOSITION itself value-hash-checked end to end (`corpus_prep_docs`).

Scale shape is inherited from the stages: the quality filter is map-side,
dedup is one content-hash exchange, sampling is map-side id-hash draws,
packing is the two-level distributed scan. Nothing materializes between
stages — one streaming plan end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions import textproc
from ..functions.rounding import round_half_away
from ..stages.dedup import dedup_exact_content
from ..stages.scan import pack_sequences
from ..stages.textstages import stratified_sample_stage


def corpus_prep(docs: ray.data.Dataset, rates: dict[str, float],
                quality_min: float = 0.5, budget: int = 2048,
                id_col: str = "doc_id", text_col: str = "text",
                lang_col: str = "lang") -> ray.data.Dataset:
    """documents → packed training assignments (doc_id, lang, n_tokens,
    prefix, seq_id, offset_in_seq) for the quality-passing, deduplicated,
    mix-sampled survivor set, concatenated in doc_id order."""

    def qual_filter(b: pd.DataFrame) -> pd.DataFrame:
        q = round_half_away(
            textproc.quality_scores(b[text_col])["quality"].to_numpy(np.float64), 4)
        return b[q >= quality_min]

    survivors = docs.select_columns([id_col, text_col, lang_col]).map_batches(
        qual_filter, batch_format="pandas")
    deduped = dedup_exact_content(survivors, content_col=text_col, id_col=id_col)
    sampled = stratified_sample_stage(deduped, rates, stratum_col=lang_col,
                                      id_col=id_col)

    def tokens(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            lang_col: b[lang_col].to_numpy(object),
            "n_tokens": b[text_col].str.count(r"\S+").astype("int64").to_numpy(),
        })

    with_tokens = sampled.map_batches(tokens, batch_format="pandas")
    return pack_sequences(with_tokens, budget=budget, key=id_col, val="n_tokens")
