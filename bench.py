"""Benchmark driver — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <headline seconds>, "unit": "sec",
     "queries": {...per-pipeline seconds + docs_per_sec...},
     "sf": ..., "num_cpus": N}

``--scaling`` runs the headline pipeline in two fresh processes
(RAY_GRAFT_CPUS=8 and 32) on the same input and reports both throughputs
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
REPEAT = int(os.environ.get("GRAFT_PAGE_REPEAT", "40"))


def run_benchmarks() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from geospatial_learn_ray.pipelines.flagship import CELL_COL, flagship_dataset, located_dataset
    from geospatial_learn_ray.stages import agg, dedup, knn

    queries: dict[str, float] = {}

    # warm the page cache (untimed): one pass over the base table
    rd.read_parquet(f"{SF_DIR}/documents.parquet").count()
    n_docs = rd.read_parquet(f"{SF_DIR}/documents.parquet").count()
    n_pages = n_docs * REPEAT

    # headline: flagship spatial-join + tiling, end-to-end streaming
    t0 = time.monotonic()
    heads = flagship_dataset(SF_DIR, with_dups=True, repeat=REPEAT)
    join_count = heads["join_rows"].count()
    headline = time.monotonic() - t0
    queries["flagship_join_sec"] = round(headline, 3)
    queries["flagship_join_rows"] = join_count
    queries["docs_per_sec"] = round(n_pages / headline, 1)

    t0 = time.monotonic()
    agg_count = flagship_dataset(SF_DIR, with_dups=True, repeat=REPEAT)["tile_agg"].count()
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


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    tp_lo = r_lo["queries"]["docs_per_sec"]
    tp_hi = r_hi["queries"]["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (num_cpus 8 → 32, fresh processes, same input)",
        "docs_per_sec_8": tp_lo,
        "docs_per_sec_32": tp_hi,
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
