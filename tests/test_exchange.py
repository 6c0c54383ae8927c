"""bucket_exchange parity: the hash-shuffle plan must produce byte-identical
results to the sort-based plan for every combiner shape (the fn contract:
group by real keys internally, tolerate several buckets per block)."""

import numpy as np
import pandas as pd
import pytest
import ray.data
from ray.data.context import DataContext, ShuffleStrategy

from geospatial_learn_ray.stages import agg, dedup


@pytest.fixture()
def hash_shuffle():
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    yield
    ctx.shuffle_strategy = prev


def _lineitem():
    return ray.data.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                                 columns=["l_returnflag", "l_linestatus", "l_quantity"])


def test_grouped_stats_hash_equals_sort(hash_shuffle):
    ctx = DataContext.get_current()
    a = agg.grouped_stats(_lineitem(), ["l_returnflag", "l_linestatus"], "l_quantity",
                          round_to=4).to_pandas()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    b = agg.grouped_stats(_lineitem(), ["l_returnflag", "l_linestatus"], "l_quantity",
                          round_to=4).to_pandas()
    key = ["l_returnflag", "l_linestatus"]
    am = a.sort_values(key).reset_index(drop=True)
    bm = b.sort_values(key).reset_index(drop=True)
    assert am.equals(bm)


def test_dedup_keep_latest_hash_equals_sort(hash_shuffle):
    from geospatial_learn_ray.sources.pages import read_pages

    ctx = DataContext.get_current()
    a = dedup.dedup_keep_latest(
        read_pages("/root/testdata/sf0.001", with_dups=True, columns=["url", "warc_ts", "lang"])
    ).to_pandas()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    b = dedup.dedup_keep_latest(
        read_pages("/root/testdata/sf0.001", with_dups=True, columns=["url", "warc_ts", "lang"])
    ).to_pandas()
    am = a.sort_values("url").reset_index(drop=True)
    bm = b.sort_values("url").reset_index(drop=True)
    assert am.equals(bm)


def test_minhash_pairs_hash_equals_sort(hash_shuffle):
    ctx = DataContext.get_current()
    docs = lambda: ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                         columns=["doc_id", "text"])
    a = dedup.minhash_dedup_pairs(docs(), threshold=0.5).to_pandas()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    b = dedup.minhash_dedup_pairs(docs(), threshold=0.5).to_pandas()
    key = ["id_a", "id_b"]
    am = a.sort_values(key).reset_index(drop=True)
    bm = b.sort_values(key).reset_index(drop=True)
    assert am.equals(bm)
