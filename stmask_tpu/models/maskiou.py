"""FastMaskIoUNet: optional mask re-scoring subnet.

Reference ``layers/modules/FastMaskIoUNet.py:22-33`` (inspired by Mask
Scoring R-CNN): a small convnet over the full-size soft mask followed by
global max pooling, predicting per-class mask IoU.  Off by default
(``use_maskiou=False`` in all STMask configs) but part of the component
surface.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastMaskIoUNet(nn.Module):
    num_classes: int                     # includes background
    # (channels, ksize, stride) conv stack before the classifier 1x1
    net_spec: Tuple[Tuple[int, int, int], ...] = (
        (8, 3, 2), (16, 3, 2), (32, 3, 2), (64, 3, 2), (128, 3, 2))

    @nn.compact
    def __call__(self, masks: jax.Array) -> jax.Array:
        """masks: [N, H, W, 1] soft masks -> [N, num_classes-1] IoU preds."""
        x = masks
        for i, (ch, k, s) in enumerate(self.net_spec):
            x = nn.relu(nn.Conv(ch, (k, k), strides=s, padding=(k - 1) // 2,
                                name=f'conv{i}')(x))
        x = nn.relu(nn.Conv(self.num_classes - 1, (1, 1),
                            name='classifier')(x))
        return jnp.max(x, axis=(1, 2))   # global max pool
