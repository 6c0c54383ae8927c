"""Conformance against the committed golden Parquet fixtures (north_star:
identical join output rows, identical tile assignments, byte-identical
extracted text per url — FIXTURES.md §7). The goldens were produced by the
pure-Python brute-force path in tools/make_golden.py at sf0.01; here the
full Ray pipeline must reproduce them exactly."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from geospatial_learn_ray.pipelines.flagship import flagship_dataset
from geospatial_learn_ray.sources.pages import read_pages
from geospatial_learn_ray.stages.textstages import extract_stage

SF = "/root/testdata/sf0.01"
GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def test_extracted_text_bytes_match_golden():
    extracted = extract_stage(read_pages(SF), keep_cols=("url",)).to_pandas()
    golden = pq.read_table(f"{GOLDEN}/text_hashes.parquet").to_pandas()
    got = {
        u: hashlib.sha256(t.encode("utf-8")).hexdigest()
        for u, t in zip(extracted.url, extracted.text)
    }
    exp = dict(zip(golden.url, golden.sha256_text))
    assert got == exp  # byte-identical per url


def test_join_rows_match_golden():
    join = flagship_dataset(SF, with_dups=False)["join_rows"].to_pandas()
    golden = pq.read_table(f"{GOLDEN}/join_rows.parquet").to_pandas()
    got = set(zip(join.url, join.feature_id))
    exp = set(zip(golden.url, golden.feature_id))
    assert got == exp


def test_tile_agg_matches_golden():
    agg = flagship_dataset(SF, with_dups=False)["tile_agg"].to_pandas()
    golden = pq.read_table(f"{GOLDEN}/tile_agg.parquet").to_pandas()
    a = agg.rename(columns={"count": "doc_count"}).set_index("cell_h3_r7").sort_index()
    g = golden.set_index("cell_h3_r7").sort_index()
    assert a.index.tolist() == g.index.tolist()  # identical tile assignments
    assert a["doc_count"].tolist() == g["doc_count"].tolist()
    assert np.allclose(a["mean_n_chars"], g["mean_n_chars"], atol=2e-6)
