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


def test_hash_buckets_intact_detector(hash_shuffle):
    from geospatial_learn_ray.stages.exchange import _hash_buckets_intact

    # repartition(keys=) at fixture scale: every bucket in exactly one block
    df = pd.DataFrame({"_part": np.arange(1000) % 7, "v": np.arange(1000)})
    rep = ray.data.from_pandas(df).repartition(4, keys=["_part"]).materialize()
    assert _hash_buckets_intact(rep, "_part")
    # a hand-built SPLIT bucket (value 3 in two blocks) must be detected
    split = ray.data.from_pandas([
        pd.DataFrame({"_part": [1, 2, 3], "v": [0, 1, 2]}),
        pd.DataFrame({"_part": [3, 4], "v": [3, 4]}),
    ]).materialize()
    assert not _hash_buckets_intact(split, "_part")


def test_hash_path_raises_on_split_bucket(hash_shuffle, monkeypatch):
    # force the detector to report a split: the exchange must refuse to
    # produce silently-wrong output (a groupby fallback under the hash
    # context would spawn the full aggregator fleet — fail loud instead)
    from geospatial_learn_ray.stages import exchange as ex

    monkeypatch.setattr(ex, "_hash_buckets_intact", lambda rep, key: False)
    df = pd.DataFrame({"_part": np.arange(200) % 5, "k": np.arange(200) % 20,
                       "v": np.arange(200, dtype=np.float64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False)["v"].sum().reset_index()

    with pytest.raises(ValueError, match="split a '_part' bucket"):
        ex.bucket_exchange(ray.data.from_pandas(df), combine)
