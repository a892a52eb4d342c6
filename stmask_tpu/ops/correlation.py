"""Cross-frame local correlation (cost volume) for the temporal-fusion branch.

Replaces the reference's CUDA ``spatial_correlation_sampler`` dependency
(reference ``layers/modules/track_to_segment_head.py:40-62``): kernel_size=1,
stride=1, padding=0, patch_size=11 — i.e. for every spatial site, the dot
product over channels between frame-1 features and frame-2 features displaced
by (dy, dx) ∈ [-5, 5]^2, zero outside the image; output channel index is
``(dy+5)*patch + (dx+5)``; normalized by the channel count and passed through
leaky-relu(0.1).

XLA formulation: pad frame 2, take the 121 shifted views, and batch the
channel contraction — each displacement is an elementwise multiply-reduce the
compiler fuses; no gather needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def correlate(x1: jax.Array, x2: jax.Array, patch_size: int = 11,
              apply_activation: bool = True,
              use_pallas: bool | str = False) -> jax.Array:
    """Local correlation of two NHWC feature maps.

    Args:
      x1, x2: [B, H, W, C].
      use_pallas: True / 'auto' routes to the fused Pallas TPU kernel
        (inference path only — the XLA formulation below is the
        differentiable reference used in training).
    Returns:
      [B, H, W, patch_size**2] cost volume (leaky-relu'd, /C normalized).
    """
    if use_pallas == 'auto':
        use_pallas = jax.default_backend() == 'tpu'
    if use_pallas:
        from ..kernels.correlation_pallas import correlate_pallas
        return correlate_pallas(x1, x2, patch_size, apply_activation)
    b, h, w, c = x1.shape
    r = (patch_size - 1) // 2
    x2p = jnp.pad(x2, ((0, 0), (r, r), (r, r), (0, 0)))

    outs = []
    for dy in range(patch_size):
        for dx in range(patch_size):
            shifted = jax.lax.dynamic_slice(
                x2p, (0, dy, dx, 0), (b, h, w, c))
            outs.append(jnp.sum(x1 * shifted, axis=-1))
    out = jnp.stack(outs, axis=-1) / c
    if apply_activation:
        out = jax.nn.leaky_relu(out, 0.1)
    return out
