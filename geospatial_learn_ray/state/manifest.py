"""Per-partition lineage manifests + resumable Parquet checkpoints.

The reference's only checkpointing is "each stage writes a file" with
in-place updates that corrupt on partial failure (gdal.GA_Update
raster.py:1079; ogr.Open(inShp,1) shape.py:897). Here (SURVEY.md §4
"checkpoint/resume") every checkpointed stage writes:

    out/<stage>/shard=<k>/part-*.parquet      (hive-partitioned by shard)
    out/<stage>/_manifest/shard-<k>.json      (lineage record per partition)

A manifest row records: stage, shard, rows, input fingerprint, wall time,
engine version. Resume = rerun the pipeline with the input filtered to
shards whose manifest is missing or fingerprint-stale; finished shards are
read back from Parquet untouched. Writes are atomic per stage-run: data
lands in a tmp dir and shard dirs are renamed into place before manifests
are written (manifest-last ⇒ a crash mid-write is invisible to resume).

Shards are hash-derived from a stable key column (``assign_shard``), so
the same row always lands in the same shard on any worker/retry — the
determinism that makes skip-finished-partitions sound.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions import _bs
from ..functions.hashing import fnv1a64

MANIFEST_DIR = "_manifest"


def assign_shard(ds: ray.data.Dataset, key_col: str, num_shards: int, shard_col: str = "shard") -> ray.data.Dataset:
    """Stable shard id = fnv1a64(key) % num_shards as an int32 column."""

    def fn(batch: pa.Table) -> pa.Table:
        key = batch[key_col]
        if not (pa.types.is_string(key.type) or pa.types.is_binary(key.type) or pa.types.is_large_string(key.type)):
            key = pa.compute.cast(key, pa.string())
        shard = (fnv1a64(key) % np.uint64(num_shards)).astype(np.int32)
        return batch.append_column(shard_col, pa.array(shard))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=_bs())


def _stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def completed_shards(out_dir: str, stage: str, fingerprint: str) -> set[int]:
    """Shards with a manifest whose fingerprint matches the current inputs."""
    mdir = os.path.join(_stage_dir(out_dir, stage), MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue  # torn manifest → shard recomputes
        if m.get("fingerprint") == fingerprint:
            done.add(int(m["shard"]))
    return done


def checkpoint_stage(
    ds: ray.data.Dataset,
    out_dir: str,
    stage: str,
    fingerprint: str,
    shard_col: str = "shard",
    covered_shards: list[int] | None = None,
) -> None:
    """Write ``ds`` as a resumable checkpoint: tmp-dir write → per-shard
    rename → manifest-last. ``ds`` must carry ``shard_col``.

    ``covered_shards``: every shard this run is responsible for. A covered
    shard that produced zero rows gets (a) any stale ``shard=K`` data dir
    from a previous fingerprint DELETED (its rows must not leak into the
    resumed result) and (b) a rows=0 manifest so it stops recomputing."""
    stage_dir = _stage_dir(out_dir, stage)
    mdir = os.path.join(stage_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(out_dir, f".tmp-{stage}-{uuid.uuid4().hex[:8]}")
    t0 = time.monotonic()
    # keep the shard value inside the row data too (hive partition values
    # come back as strings on some readers; the explicit column is typed)
    ds.write_parquet(tmp, partition_cols=[shard_col])
    wall = time.monotonic() - t0
    rows_by_shard: dict[int, int] = {}
    # a zero-row stage writes NO tmp dir at all — every covered shard
    # then manifests as rows=0 below (and stale dirs purge), instead of
    # crashing the checkpoint (found by the corpus-prep strict-gate test)
    if not os.path.isdir(tmp):
        os.makedirs(tmp, exist_ok=True)
    for entry in sorted(os.listdir(tmp)):
        if not entry.startswith(f"{shard_col}="):
            continue
        shard = int(entry.split("=", 1)[1])
        src = os.path.join(tmp, entry)
        dst = os.path.join(stage_dir, entry)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.replace(src, dst)
        n = 0
        import pyarrow.parquet as pq

        for f in os.listdir(dst):
            if f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(dst, f)).num_rows
        rows_by_shard[shard] = n
    shutil.rmtree(tmp, ignore_errors=True)
    for shard in covered_shards or ():
        if shard not in rows_by_shard:
            stale = os.path.join(stage_dir, f"{shard_col}={shard}")
            if os.path.isdir(stale):
                shutil.rmtree(stale)
            rows_by_shard[shard] = 0
    for shard, n in rows_by_shard.items():
        rec = {
            "stage": stage,
            "shard": shard,
            "rows": n,
            "fingerprint": fingerprint,
            "wall_s_stage_total": round(wall, 3),
            "engine": "geospatial_learn_ray-0.1",
        }
        path = os.path.join(mdir, f"shard-{shard}.json")
        tmp_path = path + ".tmp"
        with open(tmp_path, "w") as f:
            json.dump(rec, f)
        os.replace(tmp_path, path)


def read_stage(out_dir: str, stage: str, shard_col: str = "shard") -> ray.data.Dataset:
    """Read a checkpointed stage back. The hive ``shard=K`` path segments
    restore the shard column; ``_manifest`` JSONs are excluded by the
    extension filter. A stage whose every shard wrote ZERO rows has no
    Parquet files to carry its schema — reading it back raises; callers
    producing possibly-empty stages should gate on the manifests' row
    totals first. The partition column is typed explicitly and cast
    back to the int32 that ``assign_shard`` produces — hive inference
    alone yields *string*, which broke the typed shard filter on the
    heal path of ``run_resumable_stage``."""
    from ray.data.datasource.partitioning import Partitioning

    stage_dir = _stage_dir(out_dir, stage)
    ds = ray.data.read_parquet(
        stage_dir,
        file_extensions=["parquet"],
        partitioning=Partitioning("hive", field_types={shard_col: int}),
    )

    def _retype(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index(shard_col)
        return b.set_column(i, shard_col, pa.compute.cast(b[shard_col], pa.int32()))

    return ds.map_batches(_retype, batch_format="pyarrow", zero_copy_batch=True, batch_size=_bs())


def run_resumable_stage(
    input_ds: ray.data.Dataset,
    build_fn,
    out_dir: str,
    stage: str,
    fingerprint: str,
    num_shards: int,
    shard_col: str = "shard",
    input_sharded: bool = True,
) -> ray.data.Dataset:
    """The resume driver: compute only shards without a fresh manifest.

    With ``input_sharded=True`` the input carries ``shard_col`` aligned with
    the output sharding (row-wise / key-aligned stages): finished shards are
    filtered out BEFORE build_fn, skipping their compute. With
    ``input_sharded=False`` (re-keying stages, e.g. a global groupby whose
    output sharding differs from the input's), any missing shard forces a
    full recompute — partial input would corrupt the aggregate.
    Returns the full stage read back from Parquet (finished + new shards).
    """
    done = completed_shards(out_dir, stage, fingerprint)
    missing = [s for s in range(num_shards) if s not in done]
    if missing and not input_sharded:
        out = build_fn(input_ds)
        checkpoint_stage(out, out_dir, stage, fingerprint, shard_col=shard_col,
                         covered_shards=list(range(num_shards)))
        return read_stage(out_dir, stage)
    if missing:
        if done:
            keep = sorted(set(missing))
            filtered = input_ds.map_batches(
                # value_set follows the column's actual type so the filter
                # survives any upstream retyping of the shard column
                lambda b: b.filter(pa.compute.is_in(
                    b[shard_col], value_set=pa.array(keep, pa.int32()).cast(b[shard_col].type))),
                batch_format="pyarrow",
            )
        else:
            filtered = input_ds
        out = build_fn(filtered)
        # every not-done shard is in ``missing``, so covering it here both
        # purges fingerprint-stale dirs and manifests zero-row shards
        checkpoint_stage(out, out_dir, stage, fingerprint, shard_col=shard_col,
                         covered_shards=missing)
    return read_stage(out_dir, stage)


def fingerprint_of(*parts: str) -> str:
    """Stable hex fingerprint of stage name + params + input identity."""
    h = fnv1a64(pa.array(["|".join(parts)]))[0]
    return f"{int(h):016x}"
