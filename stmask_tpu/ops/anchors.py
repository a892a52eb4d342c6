"""Kernel-shaped anchor (prior) generation — the "FCA" anchors.

The reference generates priors whose (w, h) equal the prediction-head kernel
shape in units of feature cells — 3x3, 3x5, 5x3 — so each anchor is spatially
calibrated to its conv kernel (reference
``layers/modules/prediction_head_FC.py:224-247``).  Iteration order must match
the head's channel-concat order: position-major (row j, col i), then aspect
ratio (bank), then scale.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..config import STMaskConfig


def make_priors(conv_h: int, conv_w: int,
                aspect_ratios: Sequence[Tuple[int, int]],
                scales: Sequence[float]) -> np.ndarray:
    """Priors for one FPN level, [conv_h * conv_w * A, 4] in [cx, cy, w, h].

    Mirrors reference prediction_head_FC.py:224-247: ``ar = (kh, kw)``;
    ``ratio = scale / scales[0]``; ``w = ratio * kw / conv_w``;
    ``h = ratio * kh / conv_h``.
    """
    jj, ii = np.meshgrid(np.arange(conv_h), np.arange(conv_w), indexing='ij')
    x = (ii.reshape(-1) + 0.5) / conv_w          # [hw]
    y = (jj.reshape(-1) + 0.5) / conv_h

    whs = []
    for (arh, arw) in aspect_ratios:
        for scale in scales:
            ratio = scale / scales[0]
            whs.append((ratio * arw / conv_w, ratio * arh / conv_h))
    whs = np.asarray(whs, dtype=np.float32)      # [A, 2]

    a = whs.shape[0]
    hw = x.shape[0]
    out = np.empty((hw, a, 4), dtype=np.float32)
    out[:, :, 0] = x[:, None]
    out[:, :, 1] = y[:, None]
    out[:, :, 2] = whs[None, :, 0]
    out[:, :, 3] = whs[None, :, 1]
    return out.reshape(hw * a, 4)


def all_priors(cfg: STMaskConfig) -> np.ndarray:
    """Concatenated priors over all FPN levels, [num_priors, 4].

    Computed once at trace time (host numpy) and closed over as a constant in
    jitted programs — the reference rebuilds them per forward pass with a
    cache (``STMask.py:16``); on TPU they are a compile-time constant.
    """
    per_level = []
    for lvl, (fh, fw) in enumerate(cfg.feature_shapes()):
        if cfg.head_type == 'legacy':
            # YOLACT aspect-ratio anchors for the legacy single-kernel head
            # (reference prediction_head.py make_priors semantics)
            from ..models.legacy_head import make_yolact_priors
            per_level.append(make_yolact_priors(
                fh, fw, aspect_ratios=(1.0, 0.5, 2.0),
                scales=tuple(cfg.pred_scales[lvl]),
                max_size=max(cfg.pad_w, cfg.pad_h)))
        else:
            per_level.append(make_priors(fh, fw, cfg.head_kernel_sizes,
                                         cfg.pred_scales[lvl]))
    return np.concatenate(per_level, axis=0)
