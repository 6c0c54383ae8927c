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


def run_corpus_prep(sf_dir: str, out_dir: str, rates: dict[str, float],
                    quality_min: float = 0.5, budget: int = 2048,
                    num_shards: int = 16) -> dict[str, int]:
    """Resumable execution of the corpus-prep pipeline — the LLM-side
    twin of pipelines/flagship.run_flagship: two checkpointed stages
    with per-shard lineage manifests, so a failed run recomputes only
    unfinished shards.

    Stage 1 ("survivors"): quality filter → exact dedup → mix sample,
    sharded by fnv(doc_id) — all doc-keyed, so shard-aligned resume
    skips the COMPUTE for finished shards. Stage 2 ("packed"): the
    sequence-packing scan re-keys globally (a prefix is ordered across
    shards), so its checkpoint is all-or-nothing per fingerprint, then
    shards by doc_id for the resumable write."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from ..state.manifest import (assign_shard, fingerprint_of, run_resumable_stage)

    fp = fingerprint_of("corpus-prep-v1", sf_dir, str(sorted(rates.items())),
                        str(quality_min), str(budget))
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    docs = assign_shard(docs.map_batches(
        lambda b: b.append_column("doc_key", pc.cast(b["doc_id"], pa.string())),
        batch_format="pyarrow"), "doc_key", num_shards)
    docs = docs.drop_columns(["doc_key"])

    def survivors_fn(ds):
        def qual_filter(b: pd.DataFrame) -> pd.DataFrame:
            q = round_half_away(
                textproc.quality_scores(b["text"])["quality"].to_numpy(np.float64), 4)
            return b[q >= quality_min]

        surv = ds.map_batches(qual_filter, batch_format="pandas")
        deduped = dedup_exact_content(surv, content_col="text", id_col="doc_id")
        return stratified_sample_stage(deduped, rates, stratum_col="lang",
                                       id_col="doc_id")

    survivors = run_resumable_stage(docs, survivors_fn, out_dir,
                                    "survivors", fp, num_shards)

    def pack_fn(ds):
        def tokens(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "lang": b["lang"].to_numpy(object),
                "n_tokens": b["text"].str.count(r"\S+").astype("int64").to_numpy(),
            })

        packed = pack_sequences(ds.map_batches(tokens, batch_format="pandas"),
                                budget=budget, key="doc_id", val="n_tokens")

        def reshard(b: pa.Table) -> pa.Table:
            shard = (b["doc_id"].to_numpy().astype(np.uint64)
                     % np.uint64(num_shards)).astype(np.int32)
            return b.append_column("shard", pa.array(shard))

        return packed.map_batches(reshard, batch_format="pyarrow")

    packed = run_resumable_stage(survivors.drop_columns(["shard"]), pack_fn,
                                 out_dir, "packed", fp, num_shards,
                                 input_sharded=False)
    return {"survivors": survivors.count(), "packed": packed.count()}
