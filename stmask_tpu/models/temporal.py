"""Temporal-fusion net: regresses frame-to-frame box shifts + coeff deltas.

Reference ``layers/modules/track_to_segment_head.py:10-37`` (TemporalNet):
three 3x3 convs (corr_channels -> 512 -> 512 -> 1024) + 7x7 average pool +
two FC heads emitting a 4-d box shift and a ``mask_proto_n``-d coefficient
shift.  Input is the RoIAligned concat of [correlation | T2S_ref | T2S_next]
(reference ``layers/functions/TF_utils.py:30-36``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TemporalNet(nn.Module):
    mask_proto_n: int = 32

    @nn.compact
    def __call__(self, x: jax.Array):
        """x: [N, 7, 7, corr_channels] -> (box_shift [N, 4],
        coeff_shift [N, mask_proto_n])."""
        x = nn.relu(nn.Conv(512, (3, 3), padding=1, name='conv1')(x))
        x = nn.relu(nn.Conv(512, (3, 3), padding=1, name='conv2')(x))
        x = nn.relu(nn.Conv(1024, (3, 3), padding=1, name='conv3')(x))
        x = jnp.mean(x, axis=(1, 2))          # 7x7 avg pool, stride 1 == mean
        x_reg = nn.Dense(4, name='fc')(x)
        x_coeff = nn.Dense(self.mask_proto_n, name='fc_coeff')(x)
        return x_reg, x_coeff
