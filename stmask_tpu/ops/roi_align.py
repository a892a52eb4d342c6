"""RoIAlign as a vmapped bilinear gather.

Replaces ``mmcv.ops.roi_align`` used by the TF branch's
``bbox_feat_extractor`` (reference
``layers/modules/track_to_segment_head.py:65-88``; 7x7 pool over the
concatenated correlation features).  Semantics follow mmcv's
``aligned=True`` (half-pixel offset).  One deliberate deviation for TPU
static shapes: mmcv's ``sampling_ratio=0`` picks a per-RoI adaptive sample
count; we use a fixed ``sampling_ratio`` grid (default 2), which is the
common detectron2 setting and keeps every shape static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import bilinear_sample_block


def roi_align(features: jax.Array, boxes: jax.Array, pool_size: int = 7,
              sampling_ratio: int = 2) -> jax.Array:
    """Crop-and-resize box regions from a feature map.

    Args:
      features: [H, W, C] (single image; vmap for batches).
      boxes: [N, 4] *unnormalized* (x1, y1, x2, y2) in feature coords —
        matching the corrected reference behavior (README.md:9: boxes must be
        unnormalized before roi_align).
      pool_size: output spatial size P.
    Returns:
      [N, P, P, C].
    """
    s = sampling_ratio

    def one_box(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bin_w = (x2 - x1) / pool_size
        bin_h = (y2 - y1) / pool_size
        # sample grid: for output bin i, samples at
        # y1 - 0.5 + (i + (t + 0.5)/s) * bin_h   (aligned=True half-pixel)
        ii = jnp.arange(pool_size, dtype=jnp.float32)
        tt = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        ys = y1 - 0.5 + (ii[:, None] + tt[None, :]) * bin_h   # [P, s]
        xs = x1 - 0.5 + (ii[:, None] + tt[None, :]) * bin_w
        ys = ys.reshape(-1)                                   # [P*s]
        xs = xs.reshape(-1)
        grid_y = jnp.broadcast_to(ys[:, None], (pool_size * s, pool_size * s))
        grid_x = jnp.broadcast_to(xs[None, :], (pool_size * s, pool_size * s))
        vals = bilinear_sample_block(features, grid_y, grid_x)  # [P*s,P*s,C]
        c = vals.shape[-1]
        vals = vals.reshape(pool_size, s, pool_size, s, c)
        return jnp.mean(vals, axis=(1, 3))                    # [P, P, C]

    return jax.vmap(one_box)(boxes)
