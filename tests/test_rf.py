"""Bagged-CART random forest (train.rf_fit_bagged_cart /
rf_predict_lineitem — reference learning.py clfdict RandomForest).

The key evidence is BIT PARITY between the distributed two-pass
histogram fit and a local single-process reference implementation
(same bag rule, same split rule) — the dual-path discipline CLAUDE.md
prescribes for every counted-bound/driver fast path."""
import numpy as np
import pandas as pd
import ray.data

from geospatial_learn_ray.functions.hashing import splitmix64
from geospatial_learn_ray.stages import train

SF = "/root/testdata/sf0.001"
COLS = ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_tax"]


def _local_reference_fit(df: pd.DataFrame, n_trees=8, seed=11) -> pd.DataFrame:
    fb = train._rf_feats(df)
    F = fb[["f0", "f1", "f2"]].to_numpy(np.int64)
    y = fb["y"].to_numpy(np.int64)
    bags = train._rf_bags(fb["k"].to_numpy(), train._rf_seeds(n_trees, seed))

    def best_split(mask, excl):
        best = None
        for f in range(3):
            if f == excl:
                continue
            vs, inv = np.unique(F[mask, f], return_inverse=True)
            c0 = np.bincount(inv[y[mask] == 0], minlength=len(vs)).astype(np.int64)
            c1 = np.bincount(inv[y[mask] == 1], minlength=len(vs)).astype(np.int64)
            # recompute c0/c1 aligned: bincount over inv where y==0 needs same inv subset
            c0 = np.zeros(len(vs), np.int64)
            c1 = np.zeros(len(vs), np.int64)
            np.add.at(c0, inv[y[mask] == 0], 1)
            np.add.at(c1, inv[y[mask] == 1], 1)
            best = train._rf_best_split(c0, c1, vs, f, best)
        return best

    rows = []
    for b in range(n_trees):
        m = bags[:, b]
        root = best_split(m, train._rf_mtry_excl(b, 0, seed))
        rf_, rt_ = root[1], root[2]
        row = {"tree": b, "rf": rf_, "rt": rt_}
        side = (F[:, rf_] > rt_).astype(np.int64)
        for s in (0, 1):
            ms = m & (side == s)
            ch = best_split(ms, train._rf_mtry_excl(b, 1 + s, seed))
            if ch is None:
                row[f"s{s}f"] = 0
                row[f"s{s}t"] = int(train._RF_NO_SPLIT_THR)
                cls = int(2 * y[ms].sum() > ms.sum())
                row[f"c{s}0"] = row[f"c{s}1"] = cls
            else:
                row[f"s{s}f"], row[f"s{s}t"] = ch[1], ch[2]
                row[f"c{s}0"], row[f"c{s}1"] = ch[3], ch[4]
        rows.append(row)
    out = pd.DataFrame(rows)
    return out.astype(np.int64)


def test_distributed_fit_bit_matches_local_reference():
    df = pd.read_parquet(f"{SF}/lineitem.parquet", columns=COLS)
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=COLS)
    got = train.rf_fit_bagged_cart(ds)
    exp = _local_reference_fit(df)
    pd.testing.assert_frame_equal(
        got.sort_values("tree").reset_index(drop=True),
        exp.sort_values("tree").reset_index(drop=True))


def test_fit_is_block_layout_invariant():
    ds1 = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=COLS)
    ds2 = ds1.repartition(7)
    p1 = train.rf_fit_bagged_cart(ds1)
    p2 = train.rf_fit_bagged_cart(ds2)
    pd.testing.assert_frame_equal(p1, p2)


def test_predict_votes_bounded_and_majority_rule():
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=COLS)
    out = train.rf_predict_lineitem(ds).to_pandas()
    assert len(out) == 6000
    assert out["votes"].between(0, 8).all()
    assert ((out["pred"] == 1) == (2 * out["votes"] > 8)).all()
    # trees disagree somewhere (a forest, not 8 clones)
    assert out["votes"].nunique() > 2
