"""Shared NN building blocks (flax.linen, NHWC).

Includes the ``make_net`` DSL equivalent (reference
``layers/modules/make_net.py:5-57``): a layer-spec list of
``(channels, ksize, kwargs)`` where negative ksize means deconv and
``None`` channels means bilinear upsample; every layer is followed by ReLU
(optionally except the last).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize matching ``F.interpolate(align_corners=False)``."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method='bilinear')


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with stored statistics.

    The reference freezes backbone BN during STMask training
    (``train.py:115-118`` sets freeze_bn for small per-GPU batches;
    ``STMask.py:196-203``), and inference always uses running stats, so a
    frozen affine-normalization is the faithful (and XLA-fusable) form.
    Stats live in params so checkpoint conversion is a flat mapping —
    the optimizer masks them out (``train_step._bn_freeze_labels``); with
    ``freeze_bn=False`` only scale/bias train (a learnable affine norm —
    batch statistics are never computed, the one documented deviation
    from live BatchNorm).
    """
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.param('mean', nn.initializers.zeros, (self.features,))
        var = self.param('var', nn.initializers.ones, (self.features,))
        # fold in fp32 regardless of compute dtype, then cast to x.dtype
        f32 = jnp.float32
        inv = (scale.astype(f32) * jax.lax.rsqrt(var.astype(f32) + self.eps))
        shift = bias.astype(f32) - mean.astype(f32) * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class MakeNet(nn.Module):
    """Sequential net from a make_net-style spec.

    spec entries: (channels, ksize, pad) with ksize>0 conv, ksize<0 &
    channels None bilinear x|ksize| upsample, ksize<0 & channels deconv.
    """
    spec: Tuple[Tuple[Optional[int], int, int], ...]
    include_last_relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = len(self.spec)
        for i, (ch, k, pad) in enumerate(self.spec):
            if k > 0:
                x = nn.Conv(ch, (k, k), padding=pad, name=f'conv{i}')(x)
            elif ch is None:
                b, h, w, c = x.shape
                x = resize_bilinear(x, (h * -k, w * -k))
            else:
                x = nn.ConvTranspose(ch, (-k, -k), strides=(-k, -k),
                                     name=f'deconv{i}')(x)
            if i < n - 1 or self.include_last_relu:
                x = nn.relu(x)
        return x
