"""The flagship spatial-join + tiling pipeline (north_star).

    pages (url, warc_ts, html, text, lang)
      → dedup keep-latest per url                       (hash shuffle: url)
      → extract text from html (byte-identity contract) (actor pool)
      → geocode + H3/S2 cell encode                     (stateless, zero-copy)
      → STRtree-role broadcast point-in-polygon join    (map-side, no shuffle)
      → cell-keyed tile aggregation (salt-mitigated)    (hash shuffle: cell)
      → Parquet checkpoints + per-partition lineage manifests (resumable)

Resume granularity: ``shard = fnv1a64(url) % NUM_SHARDS`` is assigned AT
THE SOURCE and carried through every url-keyed stage, so a resumed run
skips the *compute* (dedup/extract/geocode/join) for finished shards, not
just the write — the dedup groupby key (url) is shard-aligned by
construction. The cell-keyed aggregation re-keys rows across shards, so
its checkpoint shards by ``cell % NUM_SHARDS`` downstream of the agg.

The wide ``html`` column is projected away immediately after extraction so
shuffles move narrow rows (SURVEY.md §7 "Wide binary rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_pages
from ..sources.polygons import polygon_table
from ..stages.agg import grouped_stats, salted_grouped_stats
from ..stages.cellindex import geocode_and_cells
from ..stages.dedup import dedup_keep_latest
from ..stages.pip_join import pip_join
from ..stages.textstages import extract_stage
from ..state.manifest import assign_shard, fingerprint_of, read_stage, run_resumable_stage

NUM_SHARDS = 16
CELL_COL = "cell_h3_r7"
HEX_RES = (5, 7, 9)


def located_dataset(sf_dir: str, with_dups: bool = True, repeat: int = 1,
                    pages: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """pages → dedup → extract → geocode/cells → narrow located rows
    (url, lang, n_chars, cell columns, lon, lat, shard). Lazy.

    ``pages`` overrides the synthetic derivation with a real pages Dataset
    (e.g. ``ray.data.read_parquet`` of a materialized pages table — the
    100 TB-shaped input; bench.py uses this so the timed pipeline starts
    at the storage read, like production, not at synthetic generation)."""
    if pages is None:
        pages = read_pages(sf_dir, with_dups=with_dups, repeat=repeat)
    pages = assign_shard(pages, "url", NUM_SHARDS)
    return _locate(pages)


def _locate(pages: ray.data.Dataset) -> ray.data.Dataset:
    # Extract BEFORE the dedup shuffle: the heavy per-byte work runs on the
    # balanced storage-read blocks (the groupby's range partitions on the
    # coarse bucket key are lumpy → stragglers if compute is fused after
    # them), and the wide ``html`` column is projected away before ANY
    # shuffle — the dedup exchange moves (url, ts, text-length) rows only.
    # Keep-latest keeps the latest row's text; duplicate replicas of a url
    # carry identical html so extract-first changes no output.
    extracted = extract_stage(pages, keep_cols=("url", "warc_ts", "lang", "shard"))

    def add_len(b: pa.Table) -> pa.Table:
        b = b.append_column("n_chars", pc.cast(pc.utf8_length(b["text"]), pa.int64()))
        return b.drop_columns(["text"])

    narrow = extracted.map_batches(add_len, batch_format="pyarrow")
    deduped = dedup_keep_latest(narrow, key="url", ts_col="warc_ts").drop_columns(["warc_ts"])
    return geocode_and_cells(deduped, hex_res=HEX_RES)


def flagship_dataset(sf_dir: str, with_dups: bool = True, repeat: int = 1,
                     pages: ray.data.Dataset | None = None) -> dict[str, ray.data.Dataset]:
    """Lazy heads without checkpointing (used by bench / entry smoke)."""
    located = located_dataset(sf_dir, with_dups, repeat=repeat, pages=pages)
    join_rows = pip_join(located, polygon_table(), carry_cols=["url", CELL_COL, "shard"], mode="inner")
    tile_agg = grouped_stats(located, CELL_COL, "n_chars", stats=("count", "mean", "min", "max"), round_to=6)
    return {"located": located, "join_rows": join_rows, "tile_agg": tile_agg}


def detect_hot_cells(sf_dir: str, res: int = 7, sample_frac: float = 0.05,
                     top_k: int = 16, factor: float = 4.0, seed: int = 7) -> list[int]:
    """Measured (not assumed) hot-cell set for salt-based skew mitigation
    (SURVEY.md §7): a CHEAP pre-pass — urls only, no extraction — samples
    the geocoded cell distribution and returns cells whose sampled count
    exceeds ``factor``× the top-k median. The Zipfian hot-city cells of the
    skew fixture (~30% of rows in a handful of cells) light up here."""
    import pandas as pd

    from geospatial_learn_ray.stages.exchange import bucket_exchange

    sample = read_pages(sf_dir, columns=["url"]).random_sample(sample_frac, seed=seed)
    col = f"cell_h3_r{res}"
    cells = geocode_and_cells(sample, hex_res=(res,)).select_columns([col])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        return b.value_counts().rename("n").reset_index()

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_part"] = (b[col].to_numpy().astype(np.uint64) % np.uint64(64)).astype(np.int32)
        return b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # per-bucket total + local top-k: the global top-k is a subset of
        # the per-bucket top-ks, so the driver pull is <= 64*top_k rows
        # (the old path pulled every per-BLOCK partial - O(#blocks*cells))
        c = g.groupby(col, sort=False)["n"].sum().reset_index()
        return c.sort_values("n", ascending=False, kind="mergesort").head(top_k)

    counts = bucket_exchange(
        cells.map_batches(count, batch_format="pandas")
        .map_batches(add_part, batch_format="pandas"),
        combine, small_partials=True,
    ).to_pandas()
    counts = counts.set_index(col)["n"].sort_values(ascending=False).head(top_k)
    med = max(float(counts.median()), 1.0)
    return [int(c) for c, n in counts.items() if n > factor * med]


def run_flagship(sf_dir: str, out_dir: str, with_dups: bool = True) -> dict[str, int]:
    """Execute with resumable checkpoints + lineage manifests."""
    fp = fingerprint_of("flagship-v1", sf_dir, str(with_dups))

    # stage 1: located rows — expensive front half, url-sharded at source,
    # resume skips dedup/extract/geocode for finished shards entirely.
    pages = assign_shard(read_pages(sf_dir, with_dups=with_dups), "url", NUM_SHARDS)
    located = run_resumable_stage(pages, _locate, out_dir, "located", fp, NUM_SHARDS)

    # stage 2: PiP join rows (map-side, url-sharded, input = stage-1 parquet)
    join_rows = run_resumable_stage(
        located,
        lambda ds: pip_join(ds, polygon_table(), carry_cols=["url", CELL_COL, "shard"], mode="inner"),
        out_dir,
        "join_rows",
        fp,
        NUM_SHARDS,
    )

    # stage 3: cell-keyed tile aggregation — re-keys across url shards, so
    # the checkpoint shards by cell afterwards (all-or-nothing compute).
    # Skew mitigation is EXPLICIT here (north_star): hot cells measured by a
    # cheap sampled pre-pass, their rows salted across num_salts reducers.
    hot_cells = detect_hot_cells(sf_dir)

    def agg_fn(ds: ray.data.Dataset) -> ray.data.Dataset:
        agg = salted_grouped_stats(
            ds, CELL_COL, "n_chars", salt_from="url", hot_keys=hot_cells,
            num_salts=16, stats=("count", "mean", "min", "max"), round_to=6,
        )

        def cell_shard(b: pa.Table) -> pa.Table:
            shard = (b[CELL_COL].to_numpy() % np.uint64(NUM_SHARDS)).astype(np.int32)
            return b.append_column("shard", pa.array(shard))

        return agg.map_batches(cell_shard, batch_format="pyarrow")

    tile_agg = run_resumable_stage(
        located.drop_columns(["shard"]), agg_fn, out_dir, "tile_agg", fp, NUM_SHARDS,
        input_sharded=False,
    )
    return {
        "located": located.count(),
        "join_rows": join_rows.count(),
        "tile_agg": tile_agg.count(),
    }
