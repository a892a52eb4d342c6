"""Alternative backbones: ResNet-GN, DarkNet53, VGG16.

Completes the reference backbone family (``backbone.py:188-239`` GN variant
with GroupNorm layers, ``backbone.py:271-337`` DarkNet53,
``backbone.py:339-460`` VGG16 with the SSD 'reducedfc' tail) so every
``backbone_base`` preset (``datasets/config.py:262-338``) has a TPU
equivalent.  All NHWC flax.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import BackboneConfig
from .backbone import _dcn_flags
from .layers import FrozenBatchNorm


class GNBottleneck(nn.Module):
    """ResNet bottleneck with GroupNorm (reference ResNetBackboneGN)."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name='conv1')(x)
        out = nn.GroupNorm(self.num_groups, name='gn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name='conv2')(out)
        out = nn.GroupNorm(self.num_groups, name='gn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name='conv3')(out)
        out = nn.GroupNorm(self.num_groups, name='gn3')(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=self.stride, use_bias=False,
                               name='downsample_conv')(x)
            residual = nn.GroupNorm(self.num_groups,
                                    name='downsample_gn')(residual)
        return nn.relu(out + residual)


class ResNetBackboneGN(nn.Module):
    cfg: BackboneConfig
    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, ...]:
        del train  # no DCN variants in the GN backbone
        c = self.cfg
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name='conv1')(x)
        x = nn.GroupNorm(self.num_groups, name='gn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        planes = 64
        in_ch = 64
        strides = (1, 2, 2, 2)
        for s, blocks in enumerate(c.layers):
            for b in range(blocks):
                stride = strides[s] if b == 0 else 1
                has_ds = (b == 0) and (stride != 1 or in_ch != planes * 4)
                x = GNBottleneck(planes, stride=stride, has_downsample=has_ds,
                                 num_groups=self.num_groups,
                                 name=f'layer{s}_{b}')(x)
                in_ch = planes * 4
            outs.append(x)
            planes *= 2
        return tuple(outs)


class DarkBlock(nn.Module):
    """DarkNet residual block: 1x1 squeeze + 3x3 expand."""
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(self.channels // 2, (1, 1), use_bias=False,
                    name='conv1')(x)
        y = FrozenBatchNorm(self.channels // 2, name='bn1')(y)
        y = jax.nn.leaky_relu(y, 0.1)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name='conv2')(y)
        y = FrozenBatchNorm(self.channels, name='bn2')(y)
        y = jax.nn.leaky_relu(y, 0.1)
        return x + y


class DarkNetBackbone(nn.Module):
    """DarkNet-53 (reference backbone.py:271-337); returns per-stage outs."""
    layers: Tuple[int, ...] = (1, 2, 8, 8, 4)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, ...]:
        del train
        def conv_bn(x, ch, k, s, name):
            x = nn.Conv(ch, (k, k), strides=s, padding=(k - 1) // 2,
                        use_bias=False, name=f'{name}_conv')(x)
            x = FrozenBatchNorm(ch, name=f'{name}_bn')(x)
            return jax.nn.leaky_relu(x, 0.1)

        x = conv_bn(x, 32, 3, 1, 'stem')
        outs = []
        ch = 32
        for s, blocks in enumerate(self.layers):
            ch *= 2
            x = conv_bn(x, ch, 3, 2, f'down{s}')
            for b in range(blocks):
                x = DarkBlock(ch, name=f'layer{s}_{b}')(x)
            outs.append(x)
        return tuple(outs)


class VGGBackbone(nn.Module):
    """VGG16 with the SSD 'reducedfc' tail (reference backbone.py:339-460):
    conv stages with maxpools, the last pool 3x3 stride 1, then dilated
    conv6 (1024, dilation 6) + conv7 (1024, 1x1)."""
    arch: Tuple[Tuple[int, ...], ...] = (
        (64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
        (512, 512, 512))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, ...]:
        del train
        outs = []
        idx = 0
        for s, stage in enumerate(self.arch):
            if s > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ch in stage:
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1,
                                    name=f'conv{idx}')(x))
                idx += 1
            outs.append(x)
        # SSD tail: pool3x3 s1 + dilated fc6 + fc7 (named to avoid clashing
        # with the stage convs' running index)
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=6,
                            name='conv_fc6')(x))
        x = nn.relu(nn.Conv(1024, (1, 1), name='conv_fc7')(x))
        outs.append(x)
        return tuple(outs)


def construct_backbone(cfg: BackboneConfig) -> nn.Module:
    """Backbone dispatch keyed on the preset name (reference
    ``backbone.py:462`` ``construct_backbone``)."""
    from .backbone import ResNetBackbone
    name = cfg.name.lower()
    if 'darknet' in name:
        return DarkNetBackbone(name='backbone')
    if 'vgg' in name:
        return VGGBackbone(name='backbone')
    if 'gn' in name:
        return ResNetBackboneGN(cfg, name='backbone')
    return ResNetBackbone(cfg, name='backbone')
