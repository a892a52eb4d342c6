"""Legacy single-kernel YOLACT prediction module.

Kept for compatibility with YOLACT-style configs (the reference retains
``layers/modules/prediction_head.py:15-239`` alongside the FC head; STMask
itself uses the multi-kernel FCA head).  One 3x3 bank, aspect-ratio x scale
anchors per position, optional extra head net.
"""

from __future__ import annotations

from itertools import product
from math import sqrt
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def make_yolact_priors(conv_h: int, conv_w: int,
                       aspect_ratios: Sequence[float],
                       scales: Sequence[float],
                       max_size: int = 550,
                       use_pixel_scales: bool = True,
                       use_square_anchors: bool = False) -> np.ndarray:
    """Scalar-aspect-ratio priors (reference prediction_head.py make_priors
    semantics for YOLACT configs)."""
    data = []
    for j, i in product(range(conv_h), range(conv_w)):
        x = (i + 0.5) / conv_w
        y = (j + 0.5) / conv_h
        for ar in aspect_ratios:
            for scale in scales:
                a = sqrt(ar)
                if use_pixel_scales:
                    w = scale * a / max_size
                    h = scale / a / max_size
                else:
                    w = scale * a / conv_w
                    h = scale / a / conv_h
                if use_square_anchors:
                    h = w
                data.append((x, y, w, h))
    return np.asarray(data, np.float32)


class PredictionModule(nn.Module):
    """Single-kernel YOLACT head (box, class, mask coeff)."""
    num_classes: int
    mask_dim: int = 32
    num_priors: int = 3
    extra_head_channels: int = 256
    conf_bias_init: object = None    # focal-loss pi init (STMask.py:180-184)

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        b, h, w, _ = x.shape
        x = nn.relu(nn.Conv(self.extra_head_channels, (3, 3), padding=1,
                            name='upfeature')(x))
        bbox = nn.Conv(self.num_priors * 4, (3, 3), padding=1,
                       name='bbox_layer')(x)
        conf = nn.Conv(self.num_priors * self.num_classes, (3, 3),
                       padding=1,
                       bias_init=(self.conf_bias_init
                                  or nn.initializers.zeros),
                       name='conf_layer')(x)
        mask = nn.Conv(self.num_priors * self.mask_dim, (3, 3), padding=1,
                       name='mask_layer')(x)
        # coefficients stay raw: tanh is applied downstream by
        # generate_mask / the mask losses (same contract as the FC head)
        return {
            'loc': bbox.reshape(b, -1, 4),
            'conf': conf.reshape(b, -1, self.num_classes),
            'mask_coeff': mask.reshape(b, -1, self.mask_dim),
        }
