"""Pallas TPU kernel: window-clamped deformable conv, fused in VMEM.

The eval-path DCN forward (``ops.deform_conv.deform_conv2d``) is the top
per-frame cost (~0.9 ms of ~4.6 ms): XLA lowers the bilinear gather to
per-element dynamic slices and materializes the [Ho, Wo, K, C] gathered
tensor in HBM before the matmul.  This kernel instead evaluates the
window-clamped dense-shift formulation (see ``deform_conv2d_window``)
entirely in VMEM: the padded input is loaded once, every (tap, shift)
term is a static slice x hat-weight multiply-add on the VPU accumulated
through a VMEM scratch (value-form SSA chains would blow the Mosaic live
set past 100 MB), and each tap's modulated gather feeds the MXU
immediately ([Ho*Wo, C] @ [C, Cout] accumulated in fp32) — nothing but
the [Ho, Wo, Cout] result returns to HBM.

Strides: Mosaic has no strided vector loads, so the input arrives
pre-reshaped to parity sub-grids [H/s, s, W/s, s, C] and every strided
window becomes a unit-stride slice of one parity plane (s=1 is the
degenerate single-parity case of the same layout).

Semantics match ``deform_conv2d`` whenever every offset lies within
``[-radius, radius]``; offsets are clamped outside (the same documented
deviation as the training fast path).  Feature maps of all seven DCN
convs in the R50/R101 backbones fit whole in VMEM (<= ~4 MB bf16).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dcn_window_kernel(xp_ref, off_ref, mask_ref, w_ref, b_ref, out_ref,
                       g_ref, acc_ref, *,
                       kh, kw, ho, wo, cin, cout, stride, dilation, radius):
    n_win = 2 * radius + 2

    def window(row0, col0):
        # xp_ref is [H/s, s, W/s, s, C]: parity plane + unit-stride slice
        return xp_ref[row0 // stride:row0 // stride + ho,
                      row0 % stride,
                      col0 // stride:col0 // stride + wo,
                      col0 % stride, :]

    def hat(d, u):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d - u))

    acc_ref[:] = jnp.zeros((ho * wo, cout), jnp.float32)
    for t in range(kh * kw):
        i, j = t // kw, t % kw
        dy = off_ref[:, :, 2 * t].astype(jnp.float32)
        dx = off_ref[:, :, 2 * t + 1].astype(jnp.float32)
        g_ref[:] = jnp.zeros((ho, wo, cin), jnp.float32)
        for u in range(n_win):
            row0 = i * dilation + u
            hy = hat(dy, u - radius)
            for v in range(n_win):
                col0 = j * dilation + v
                hw = (hy * hat(dx, v - radius))[..., None]
                g_ref[:] = g_ref[:] + hw * window(row0, col0).astype(
                    jnp.float32)
        g = g_ref[:] * mask_ref[:, :, t].astype(jnp.float32)[..., None]
        acc_ref[:] = acc_ref[:] + jnp.dot(
            g.reshape(ho * wo, cin).astype(w_ref.dtype), w_ref[t],
            preferred_element_type=jnp.float32)
    out = acc_ref[:] + b_ref[:].astype(jnp.float32)
    out_ref[:] = out.reshape(ho, wo, cout).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('stride', 'dilation', 'radius',
                                    'interpret'))
def deform_conv2d_window_pallas(x: jax.Array,
                                offset: jax.Array,
                                weight: jax.Array,
                                mask: jax.Array,
                                bias: Optional[jax.Array] = None,
                                stride: int = 1,
                                dilation: int = 1,
                                radius: int = 2,
                                interpret: bool = False) -> jax.Array:
    """Window-clamped modulated deformable conv, one fused VMEM kernel.

    Args match ``ops.deform_conv.deform_conv2d_window`` (NHWC input
    [B, H, W, Cin], offsets [B, Ho, Wo, 2K] (dy, dx)-interleaved, HWIO
    weight, modulation mask [B, Ho, Wo, K]).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    _, ho, wo, _ = offset.shape
    pad_h = (kh - 1) // 2 * dilation
    pad_w = (kw - 1) // 2 * dilation
    r = int(radius)
    n_win = 2 * r + 2
    s = max(stride, 1)

    offc = jnp.clip(offset, -r, r)
    # pad so every (tap base + window corner) is a valid slice of its
    # parity sub-grid, and so the parity reshape divides evenly
    top, left = pad_h + r, pad_w + r
    need_h = ho * s + (kh - 1) * dilation + n_win - 1
    need_w = wo * s + (kw - 1) * dilation + n_win - 1
    bot = max(0, need_h - (top + h))
    right = max(0, need_w - (left + w))
    bot += (-(top + h + bot)) % s
    right += (-(left + w + right)) % s
    xp = jnp.pad(x, ((0, 0), (top, bot), (left, right), (0, 0)))
    hin, win = xp.shape[1], xp.shape[2]
    xp5 = xp.reshape(b, hin // s, s, win // s, s, cin)

    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    w2 = weight.reshape(k, cin, cout)

    kern = functools.partial(
        _dcn_window_kernel, kh=kh, kw=kw, ho=ho, wo=wo, cin=cin, cout=cout,
        stride=s, dilation=dilation, radius=r)

    def one(xp_i, off_i, mask_i):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((hin // s, s, win // s, s, cin),
                             lambda: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ho, wo, 2 * k), lambda: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ho, wo, k), lambda: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, cin, cout), lambda: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout,), lambda: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ho, wo, cout), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ho, wo, cout), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((ho, wo, cin), jnp.float32),
                pltpu.VMEM((ho * wo, cout), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xp_i, off_i, mask_i, w2, bias)

    return jax.vmap(one)(xp5, offc, mask)
