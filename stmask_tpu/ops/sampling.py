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


def bilinear_sample_block(img: jax.Array, ys: jax.Array,
                          xs: jax.Array) -> jax.Array:
    """Same contract as :func:`bilinear_sample`, one gather instead of four.

    Fetches the 2x2 corner neighborhood per sample as a single
    ``lax.gather`` with slice_sizes (2, 2, C) — 4x fewer random HBM
    accesses, each twice as long (the profiled bottleneck of the XLA
    deformable conv).  Border clamping + distance weights
    ``max(0, 1 - |p - fetched_row|)`` reproduce zero-padding semantics
    exactly: clamped fetches get zero weight.
    """
    h, w, c = img.shape
    out_shape = ys.shape
    ys_f = ys.reshape(-1)
    xs_f = xs.reshape(-1)
    n = ys_f.shape[0]

    sh, sw = min(2, h), min(2, w)      # degenerate 1-pixel dims supported
    y0 = jnp.clip(jnp.floor(ys_f), 0, max(h - sh, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs_f), 0, max(w - sw, 0)).astype(jnp.int32)
    starts = jnp.stack([y0, x0], axis=-1)                    # [N, 2]

    blocks = jax.lax.gather(
        img, starts,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(sh, sw, c),
        mode=jax.lax.GatherScatterMode.CLIP)                 # [N, sh, sw, C]

    f32 = jnp.float32
    yy = y0[:, None].astype(f32) + jnp.arange(sh, dtype=f32)[None, :]
    xx = x0[:, None].astype(f32) + jnp.arange(sw, dtype=f32)[None, :]
    wy = jnp.clip(1.0 - jnp.abs(ys_f[:, None].astype(f32) - yy), 0, 1)
    wx = jnp.clip(1.0 - jnp.abs(xs_f[:, None].astype(f32) - xx), 0, 1)
    wgt = (wy[:, :, None] * wx[:, None, :]).astype(img.dtype)  # [N, 2, 2]
    out = jnp.sum(blocks * wgt[..., None], axis=(1, 2))        # [N, C]
    return out.reshape(out_shape + (c,))
