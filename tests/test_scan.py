import numpy as np
import pandas as pd
import ray

from geospatial_learn_ray.stages import scan


def test_exclusive_prefix_sum_matches_driver_cumsum():
    rng = np.random.default_rng(7)
    n = 5000
    ids = rng.permutation(n).astype(np.int64)  # keys arrive unordered
    vals = rng.integers(0, 300, n).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"k": ids, "v": vals})).repartition(13)
    out = scan.exclusive_prefix_sum(ds, "k", "v", num_ranges=16).to_pandas().sort_values("k")
    order = np.argsort(ids)
    exp = np.cumsum(vals[order]) - vals[order]
    assert np.array_equal(out["prefix"].to_numpy(), exp)


def test_pack_sequences_budget_semantics():
    df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                       "n_tokens": np.full(10, 700, np.int64)})
    out = (
        scan.pack_sequences(ray.data.from_pandas(df), budget=1000, num_ranges=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc i starts at 700*i; seq boundaries every 1000 tokens
    assert list(out.prefix) == [700 * i for i in range(10)]
    assert list(out.seq_id) == [700 * i // 1000 for i in range(10)]
    assert list(out.offset_in_seq) == [700 * i % 1000 for i in range(10)]


def test_corpus_shuffle_order_is_a_permutation_and_layout_invariant():
    import numpy as np
    import pandas as pd
    import ray.data
    from geospatial_learn_ray.stages.sampling import corpus_shuffle_order

    docs = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
    a = corpus_shuffle_order(ray.data.from_pandas(docs).repartition(5)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert sorted(a.shuffle_rank) == list(range(1, 201))  # a permutation
    # rank follows the signed hkey order exactly
    by_rank = a.sort_values("shuffle_rank")
    assert by_rank.hkey.is_monotonic_increasing
    # not the identity order (it's a shuffle)
    assert a.shuffle_rank.tolist() != list(range(1, 201))
    b = corpus_shuffle_order(ray.data.from_pandas(docs).repartition(11)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_compact_plan_groups_near_target_and_layout_invariant():
    import pandas as pd

    from geospatial_learn_ray.stages.scan import compact_plan

    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "nb": rng.integers(100, 5000, n).astype(np.int64)})
    target = 20_000
    outs = []
    for blocks in (1, 7):
        out = compact_plan(ray.data.from_pandas(df).repartition(blocks),
                           "k", "nb", target).to_pandas()
        outs.append(out.sort_values("k").reset_index(drop=True)[["k", "nb", "grp"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # groups are contiguous in key order and sized near the target
    assert (out.sort_values("k")["grp"].diff().dropna() >= 0).all()
    sizes = out.groupby("grp")["nb"].sum()
    assert (sizes.iloc[:-1] >= target - 5000).all()
    assert (sizes <= target + 5000).all()
