"""Bilinear sampling primitives shared by deformable conv and RoIAlign.

Pure-JAX gather formulation: zero-padded out-of-bounds semantics matching the
CUDA kernels the reference relies on (DCNv2 / mmcv deform_conv / roi_align).
Gathers are row-gathers on a [H*W, C] view, which XLA lowers to dynamic-gather
on TPU; the Pallas kernels in ``stmask_tpu.kernels`` replace the hot paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample ``img`` [H, W, C] at float coords (ys, xs) [...]; returns
    [..., C].  Out-of-bounds reads contribute zero (matching the deformable
    conv / roi_align CUDA border handling)."""
    h, w, c = img.shape
    out_shape = ys.shape

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = img.reshape(h * w, c)

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0)
        vals = vals.reshape(out_shape + (c,))
        return vals * (wgt * valid)[..., None]

    out = (corner(y0i, x0i, wy0 * wx0)
           + corner(y0i, x0i + 1, wy0 * wx1)
           + corner(y0i + 1, x0i, wy1 * wx0)
           + corner(y0i + 1, x0i + 1, wy1 * wx1))
    return out
