"""Feature Pyramid Network P3-P7 (reference ``layers/modules/FPN.py:22-108``).

Top-down pathway with 1x1 laterals, bilinear upsampling to the lateral's
spatial size, 3x3 (relu'd) prediction convs, and two stride-2 conv
downsamples producing P6/P7 (``use_conv_downsample=True`` in all STMask
configs, reference ``datasets/config.py:647-651``).
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax

from ..config import FPNConfig
from .layers import resize_bilinear


class FPN(nn.Module):
    cfg: FPNConfig
    num_in: int = 3

    @nn.compact
    def __call__(self, convouts: Sequence[jax.Array]) -> List[jax.Array]:
        c = self.cfg
        n = len(convouts)
        pad = 1 if c.pad else 0

        # top-down accumulation; lat layer i applies to convouts[n-1-i]
        # (reference stores laterals reversed, FPN.py:43-46)
        out: List[jax.Array] = [None] * n
        x = None
        for i in range(n):
            j = n - 1 - i
            lat = nn.Conv(c.num_features, (1, 1), name=f'lat_{i}')(
                convouts[j])
            if x is not None:
                x = resize_bilinear(x, convouts[j].shape[1:3]) + lat
            else:
                x = lat
            out[j] = x

        for i in range(n):
            j = n - 1 - i
            y = nn.Conv(c.num_features, (3, 3), padding=pad,
                        name=f'pred_{i}')(out[j])
            if c.relu_pred_layers:
                y = nn.relu(y)
            out[j] = y

        if c.use_conv_downsample:
            for d in range(c.num_downsample):
                y = nn.Conv(c.num_features, (3, 3), strides=2, padding=1,
                            name=f'downsample_{d}')(out[-1])
                if c.relu_downsample_layers:
                    y = nn.relu(y)
                out.append(y)
        else:
            for _ in range(c.num_downsample):
                out.append(nn.max_pool(out[-1], (1, 1), strides=(2, 2)))

        return out
