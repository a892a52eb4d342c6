"""ResNet-50/101 backbone with interval deformable-conv stages (NHWC, flax).

Mirrors the reference backbone (``backbone.py:8-186``): bottleneck stacks
where ``use_dcn`` swaps the 3x3 conv2 for modulated deformable conv v2 with a
zero-initialized offset-mask conv (``backbone.py:20-26``), applied to the
last ``dcn_layers[s]`` blocks of each stage at ``dcn_interval``
(``backbone.py:124-131``).  The deformable conv itself is the TPU op in
``stmask_tpu.ops.deform_conv`` (offset bilinear gather + one MXU matmul).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import BackboneConfig
from ..ops.deform_conv import (dcn_v2_offsets, deform_conv2d,
                               deform_conv2d_window)
from .layers import FrozenBatchNorm


class DCNConv(nn.Module):
    """Modulated deformable conv v2 (kernel 3x3) as in CharlesShang DCNv2.

    ``window_radius > 0`` selects the window-clamped dense-shift formulation
    (``deform_conv2d_window``) whose adjoint contains no scatter — the
    training fast path; 0 selects the exact unclamped gather.  (A fused
    VMEM Pallas eval kernel for the window path was built and benchmarked
    across four structures in rounds 2-3 and removed: XLA's exact gather
    is faster — see PARITY.md "DCN forward: measured to a decision".)"""
    features: int
    stride: int = 1
    dilation: int = 1
    window_radius: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = 9
        # offset+mask predictor: zero-init so training starts as a plain conv
        conv_out = nn.Conv(3 * k, (3, 3), strides=self.stride,
                           padding=self.dilation,
                           kernel_dilation=self.dilation,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name='conv_offset_mask')(x)
        offset, mask = dcn_v2_offsets(conv_out, k)
        # observability hook (no-op unless 'intermediates' is mutable):
        # scripts/dcn_clip_rate.py measures how often |offset| exceeds the
        # training window radius (VERDICT r4 #2)
        self.sow('intermediates', 'dcn_offsets', offset)
        weight = self.param(
            'kernel', nn.initializers.he_normal(), (3, 3, x.shape[-1],
                                                    self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        if self.window_radius > 0:
            return deform_conv2d_window(
                x, offset, weight, mask=mask, bias=bias, stride=self.stride,
                dilation=self.dilation, radius=self.window_radius)
        return deform_conv2d(x, offset, weight, mask=mask, bias=bias,
                             stride=self.stride, dilation=self.dilation)


class Bottleneck(nn.Module):
    """ResNet bottleneck (reference backbone.py:8-58), expansion 4."""
    planes: int
    stride: int = 1
    use_dcn: bool = False
    has_downsample: bool = False
    dilation: int = 1
    dcn_window_radius: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name='conv1')(x)
        out = FrozenBatchNorm(self.planes, name='bn1')(out)
        out = nn.relu(out)

        if self.use_dcn:
            out = DCNConv(self.planes, stride=self.stride,
                          dilation=self.dilation,
                          window_radius=self.dcn_window_radius,
                          name='conv2')(out)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                          padding=self.dilation,
                          kernel_dilation=self.dilation,
                          use_bias=False, name='conv2')(out)
        out = FrozenBatchNorm(self.planes, name='bn2')(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name='conv3')(out)
        out = FrozenBatchNorm(self.planes * 4, name='bn3')(out)

        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, name='downsample_conv')(x)
            residual = FrozenBatchNorm(self.planes * 4,
                                       name='downsample_bn')(residual)
        return nn.relu(out + residual)


def _dcn_flags(blocks: int, dcn_layers: int, dcn_interval: int) -> List[bool]:
    """Which blocks of a stage use DCN (reference backbone.py:124-131)."""
    flags = [dcn_layers >= blocks]
    for i in range(1, blocks):
        flags.append(((i + dcn_layers) >= blocks) and (i % dcn_interval == 0))
    return flags


class ResNetBackbone(nn.Module):
    """Returns (C2, C3, C4, C5) feature maps."""
    cfg: BackboneConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, ...]:
        c = self.cfg
        # training always takes the scatter-free window path; eval opts in
        # via dcn_window_eval (parameters are identical either way —
        # default False: the exact gather is both parity-exact AND the
        # fastest measured eval formulation, see PARITY.md)
        radius = c.dcn_window_radius if (train or c.dcn_window_eval) else 0
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name='conv1')(x)
        x = FrozenBatchNorm(64, name='bn1')(x)
        x = nn.relu(x)
        # maxpool k=3 s=2 p=1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        in_ch = 64
        strides = (1, 2, 2, 2)
        for s, blocks in enumerate(c.layers):
            flags = _dcn_flags(blocks, c.dcn_layers[s], c.dcn_interval)
            for b in range(blocks):
                stride = strides[s] if b == 0 else 1
                has_ds = (b == 0) and (stride != 1 or in_ch != planes * 4)
                x = Bottleneck(planes, stride=stride, use_dcn=flags[b],
                               has_downsample=has_ds,
                               dcn_window_radius=radius,
                               name=f'layer{s}_{b}')(x)
                in_ch = planes * 4
            outs.append(x)
            planes *= 2
        return tuple(outs)

    @property
    def channels(self) -> Tuple[int, ...]:
        return (256, 512, 1024, 2048)
