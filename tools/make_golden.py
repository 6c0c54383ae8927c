"""Generate the committed golden fixtures (FIXTURES.md §7) at sf0.01 via a
pure-Python reference-semantics path — numpy/pandas only, NO Ray, and
brute-force geometry (every polygon tested against every point, no index)
so the goldens are independent of the engine's execution strategy.

    golden/join_rows.parquet    (url, feature_id)        PiP join rows
    golden/tile_agg.parquet     (cell_h3_r7, doc_count, mean_n_chars)
    golden/text_hashes.parquet  (url, sha256(text))      byte-identity

Run once: python tools/make_golden.py   (idempotent, deterministic)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geospatial_learn_ray.functions import geo  # noqa: E402
from geospatial_learn_ray.functions.geometry import points_in_ring  # noqa: E402
from geospatial_learn_ray.functions.rounding import round_half_away  # noqa: E402
from geospatial_learn_ray.sources.polygons import polygon_rings  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    url = (
        "https://site-" + (docs.doc_id % 1000).astype(str) + ".example/"
        + docs.source + "/" + docs.doc_id.astype(str)
    )

    # byte-identity goldens: sha256 of the exact text bytes per url
    sha = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in docs.text]
    pq.write_table(
        pa.table({"url": pa.array(url), "sha256_text": pa.array(sha)}),
        f"{OUT}/text_hashes.parquet",
    )

    # geocode + cells (same deterministic kernels; golden freezes the values)
    lon, lat = geo.geocode(pa.array(url))
    cell7 = geo.hex_latlng_to_cell(lat, lon, 7)

    # brute-force PiP: every polygon × every point, no index
    ids, rings, _ = polygon_rings()
    rows_url, rows_fid = [], []
    for p, ring in enumerate(rings):
        hit = points_in_ring(lon, lat, ring)
        for i in np.nonzero(hit)[0]:
            rows_url.append(url.iloc[i])
            rows_fid.append(int(ids[p]))
    join = pa.table({"url": pa.array(rows_url), "feature_id": pa.array(rows_fid, pa.int64())})
    pq.write_table(join, f"{OUT}/join_rows.parquet")

    # tile aggregation golden (pandas groupby)
    df = pd.DataFrame({"cell_h3_r7": cell7, "n_chars": docs.text.str.len().astype("int64")})
    agg = df.groupby("cell_h3_r7").agg(doc_count=("n_chars", "count"), mean_n_chars=("n_chars", "mean")).reset_index()
    agg["mean_n_chars"] = round_half_away(agg["mean_n_chars"], 6)
    pq.write_table(pa.Table.from_pandas(agg, preserve_index=False), f"{OUT}/tile_agg.parquet")
    print(f"golden: {len(sha)} text hashes, {len(rows_url)} join rows, {len(agg)} cells → {OUT}")


if __name__ == "__main__":
    main()
