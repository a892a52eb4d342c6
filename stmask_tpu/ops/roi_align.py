"""RoIAlign as two dense separable-weight matmuls (MXU, gather-free).

Replaces ``mmcv.ops.roi_align`` used by the TF branch's
``bbox_feat_extractor`` (reference
``layers/modules/track_to_segment_head.py:65-88``; 7x7 pool over the
concatenated correlation features).  Semantics follow mmcv's
``aligned=True`` (half-pixel offset).  One deliberate deviation for TPU
static shapes: mmcv's ``sampling_ratio=0`` picks a per-RoI adaptive sample
count; we use a fixed ``sampling_ratio`` grid (default 2), which is the
common detectron2 setting and keeps every shape static.

Why matmuls and not a gather: each RoI's sample grid is separable
(``ys x xs`` outer product), so the bilinear pool factorizes exactly as
``out[n] = Wy[n] @ F @ Wx[n]^T`` with ``Wy[n, i, y] = mean_t max(0,
1 - |ys[n, i, t] - y|)`` (the bin average folded in).  The gather
formulation profiled at 4.9 ms/frame on TPU v5e — XLA serialized the
6272-point gather into a scalar ``while`` loop — while the dense form is
~0.4 GFLOP of MXU work.  Out-of-bounds samples get all-zero weight rows,
reproducing the CUDA kernels' zero-padding border exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pooled_weights(lo: jax.Array, bin_sz: jax.Array, pool_size: int,
                    sampling_ratio: int, size: int) -> jax.Array:
    """[P, size] bilinear weights, bin-averaged over the sample grid.

    Row i holds mean_t over the ``sampling_ratio`` samples of bin i of
    ``max(0, 1 - |coord(i, t) - arange(size)|)`` with
    ``coord(i, t) = lo - 0.5 + (i + (t + 0.5)/s) * bin_sz``
    (mmcv aligned=True half-pixel grid).
    """
    s = sampling_ratio
    ii = jnp.arange(pool_size, dtype=jnp.float32)
    tt = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    coords = lo - 0.5 + (ii[:, None] + tt[None, :]) * bin_sz     # [P, s]
    grid = jnp.arange(size, dtype=jnp.float32)                   # [size]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))
    return jnp.mean(w, axis=1)                                   # [P, size]


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
    h, w, _ = features.shape
    p = pool_size

    def weights(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        wy = _pooled_weights(y1, (y2 - y1) / p, p, sampling_ratio, h)
        wx = _pooled_weights(x1, (x2 - x1) / p, p, sampling_ratio, w)
        return wy, wx

    wy, wx = jax.vmap(weights)(boxes)            # [N, P, H], [N, P, W]
    wy = wy.astype(features.dtype)
    wx = wx.astype(features.dtype)
    # out[n] = Wy[n] @ F @ Wx[n]^T, fp32 accumulation on the MXU
    t = jnp.einsum('nph,hwc->npwc', wy, features,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum('nqw,npwc->npqc', wx, t,
                     preferred_element_type=jnp.float32)
    return out.astype(features.dtype)
