"""functions/convnet.py — the integer CNN forward behind
scorer.semseg_cnn_stage (reference convnet.py:431 semseg_pred)."""
import numpy as np
import ray.data

from geospatial_learn_ray.functions import convnet
from geospatial_learn_ray.sources.tiles import read_tiles
from geospatial_learn_ray.stages import raster, scorer


def test_conv3x3_matches_naive_loop():
    rng = np.random.default_rng(21)
    x = rng.integers(-50, 50, size=(2, 9, 7)).astype(np.int64)
    w = rng.integers(-3, 4, size=(3, 3)).astype(np.int64)
    got = convnet.conv3x3(x, w)
    p = np.zeros((2, 11, 9), np.int64)
    p[:, 1:-1, 1:-1] = x
    exp = np.zeros_like(x)
    for n in range(2):
        for i in range(9):
            for j in range(7):
                exp[n, i, j] = (w * p[n, i:i + 3, j:j + 3]).sum()
    assert np.array_equal(got, exp)


def test_forward_all_classes_present_and_int():
    from geospatial_learn_ray.sources.tiles import tile_pixels
    tiles = np.stack([tile_pixels(tx, ty, 16)
                      for ty in range(16) for tx in range(16)])
    pred, win = convnet.forward(tiles)
    assert pred.dtype == np.int64 and win.dtype == np.int64
    assert set(np.unique(pred)) == {0, 1, 2}


def test_stage_matches_direct_forward():
    small = raster.clip_tiles(read_tiles(tile_px=16), -180.0, -80.0, -157.5, -40.0)
    out = scorer.semseg_cnn_stage(small, side=16).to_pandas()
    assert len(out) == 4 * 8
    from geospatial_learn_ray.sources.tiles import tile_pixels
    for _, r in out.iterrows():
        pred, win = convnet.forward(
            tile_pixels(int(r["tile_x"]), int(r["tile_y"]), 16)[None])
        assert (pred == 0).sum() == r["n_c0"]
        assert (pred == 1).sum() == r["n_c1"]
        assert (pred == 2).sum() == r["n_c2"]
        assert win.sum() == r["win_logit_sum"]
        assert r[["n_c0", "n_c1", "n_c2"]].sum() == 256
