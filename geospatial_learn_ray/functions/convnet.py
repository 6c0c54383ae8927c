"""Integer-weight convolutional forward pass for semantic segmentation.

Closes the reference's CNN-predict surface (convnet.py:431 ``semseg_pred``,
convutils.py:559 ``pad_predict``) without torch: a small fixed-weight
network — conv3x3(1→2) → ReLU → conv3x3(2→2) → ReLU → 1×1 head (2→3
classes) → per-pixel argmax — whose arithmetic is ENTIRELY int64 over
quantized pixels, so the distributed forward has a bit-exact DuckDB twin
(the canny/phasecong integer-conv recipe, oraclesql._semseg_cnn_sql).

Zero padding at tile borders (each tile predicts independently — the
per-window analogue of pad_predict's pad-to-tile-multiple + per-tile
forward). Argmax ties resolve to the SMALLEST class index, matching both
``np.argmax`` and the SQL CASE chain.

Weights are fixed module constants shared verbatim by the numpy forward
and the SQL generator — a stand-in for a trained checkpoint loaded once
per actor (stages/scorer.SemsegCNN does the loading-in-__init__ shape).
"""
from __future__ import annotations

import numpy as np

QUANT = 8.0  # q = floor(vd * QUANT) — same quantizer as the canny twin

# conv1: 1 in-channel → 2 out-channels (Sobel-y / Sobel-x initializations)
W1 = (((1, 2, 1), (0, 0, 0), (-1, -2, -1)),
      ((1, 0, -1), (2, 0, -2), (1, 0, -1)))
B1 = (4, -2)
# conv2: 2 → 2 (Laplacian+box / diagonal+sharpen mixes)
W2 = ((((0, 1, 0), (1, -4, 1), (0, 1, 0)),
       ((1, 1, 1), (1, 1, 1), (1, 1, 1))),
      (((2, 0, -2), (0, 1, 0), (-2, 0, 2)),
       ((0, -1, 0), (-1, 5, -1), (0, -1, 0))))
B2 = (8, -5)
# 1×1 head: 2 → 3 classes
WH = ((1, -1), (-1, 2), (2, 1))
BH = (50, 0, -150)

N_CLASSES = 3


def conv3x3(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Zero-padded 'same' 3×3 convolution over a (n, h, w) int64 stack —
    nine shifted adds, no Python per-pixel loop."""
    n, h, wd = x.shape
    p = np.zeros((n, h + 2, wd + 2), np.int64)
    p[:, 1:-1, 1:-1] = x
    out = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            if w[dy, dx]:
                out += int(w[dy, dx]) * p[:, dy:dy + h, dx:dx + wd]
    return out


def forward(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, side, side) float32/float64 pixels → (pred classes int64,
    winning logit int64), both (n, side, side)."""
    q = np.floor(pixels.astype(np.float64) * QUANT).astype(np.int64)
    w1, w2 = np.asarray(W1, np.int64), np.asarray(W2, np.int64)
    a1 = [np.maximum(conv3x3(q, w1[c]) + B1[c], 0) for c in range(2)]
    a2 = [np.maximum(sum(conv3x3(a1[i], w2[c, i]) for i in range(2)) + B2[c], 0)
          for c in range(2)]
    logits = np.stack([WH[k][0] * a2[0] + WH[k][1] * a2[1] + BH[k]
                       for k in range(N_CLASSES)], axis=-1)
    pred = np.argmax(logits, axis=-1)  # first max — smallest class on tie
    win = np.take_along_axis(logits, pred[..., None], axis=-1)[..., 0]
    return pred.astype(np.int64), win.astype(np.int64)
