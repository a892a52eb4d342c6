"""FCA multi-kernel prediction head + FCB deformable feature alignment.

Re-design of reference ``layers/modules/prediction_head_FC.py:13-247`` and
``layers/modules/Featurealign.py:6-74``.  One flax module is *applied* to
every FPN level (the reference builds five modules that alias the first's
parameters — ``STMask.py:88-100`` with ``share_prediction_module=True``);
true functional sharing replaces the parent-aliasing hack.

Per head bank k in {3x3, 3x5, 5x3} (the kernel-shaped FCA anchors), the head
emits: centerness (tanh), box regression (4), class scores, a 128-d L2
normalized tracking embedding, and 32 mask coefficients.  FCB (when enabled)
aligns the classification features with a deformable conv whose offsets come
from the detached box regression — predicted by a 1x1 conv (``ada``) or
derived analytically from the box deltas (``ali``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import STMaskConfig
from ..ops.deform_conv import deform_conv2d, deform_conv2d_window


def _ali_offsets(shape: jax.Array, ks: Tuple[int, int]) -> jax.Array:
    """Analytic FCB offsets from box deltas (reference Featurealign.py:46-69).

    Args:
      shape: [B, H, W, 4] detached box regression (dx, dy, dw, dh).
    Returns:
      [B, H, W, 2*kh*kw] offsets, (dy, dx) interleaved per tap, row-major.
    """
    ks_h, ks_w = ks
    k = ks_h * ks_w
    v0, v1 = 0.1, 0.2
    dx = shape[..., 0] * v0 * ks_w                       # [B, H, W]
    dy = shape[..., 1] * v0 * ks_h
    dw = jnp.exp(shape[..., 2] * v1) - 1.0
    dh = jnp.exp(shape[..., 3] * v1) - 1.0

    # integer tap grid offsets: rows in [-(kh//2)+?] — reference uses
    # arange(-ks//2+1, ks//2+1) which for odd k is [-(k-1)/2 .. (k-1)/2]
    ry = jnp.arange(-(ks_h // 2), ks_h // 2 + 1, dtype=jnp.float32)
    rx = jnp.arange(-(ks_w // 2), ks_w // 2 + 1, dtype=jnp.float32)
    grid_y = jnp.repeat(ry, ks_w)                        # [k] row-major
    grid_x = jnp.tile(rx, ks_h)

    off_y = dy[..., None] + dh[..., None] * grid_y       # [B, H, W, k]
    off_x = dx[..., None] + dw[..., None] * grid_x
    return jnp.stack([off_y, off_x], axis=-1).reshape(
        shape.shape[:-1] + (2 * k,))


def _focal_conf_bias_init(cfg: STMaskConfig, n_scales: int):
    """Focal-loss conf bias init: background starts near-certain
    (+log((1-pi)/pi)), classes near-zero probability (-log((1-pi)/pi)).

    DELIBERATE DEVIATION from reference STMask.py:181-184 (documented in
    PARITY.md): the reference concatenates ``data0.repeat(num_priors)``
    followed by ``data1.repeat((num_classes-1)*num_priors)`` — under its
    prior-major/class-minor channel layout that fills the first
    ``num_priors`` *channels* (prior 0's classes 0..C-1) with the
    background bias instead of each prior's background channel, i.e. the
    reference init itself misses the RetinaNet intent for priors > 0.
    Here each prior's class-0 channel gets the background bias under the
    scale-major/class-minor layout — the intent-correct RetinaNet init.
    Only affects from-scratch focal-loss training (checkpoint loads
    overwrite it)."""
    pi = cfg.focal_loss_init_pi
    import numpy as np
    b0 = float(np.log((1.0 - pi) / pi))
    bias = np.full((n_scales, cfg.num_classes), -b0, np.float32)
    bias[:, 0] = b0

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(bias.reshape(shape), dtype)
    return init


class FeatureAlign(nn.Module):
    """FCB: deformable alignment driven by the box branch
    (reference Featurealign.py).

    ``train=True`` with ``window_radius > 0`` routes the deformable conv
    through the window-clamped dense-shift formulation
    (``deform_conv2d_window``, scatter-free custom-VJP adjoint) — the
    exact gather's AD transpose is a scatter-add that XLA:TPU serializes
    into while-loops (measured: the _ada train step is ~70x the flagship
    through the exact path).  Eval always takes the exact gather."""
    out_channels: int
    kernel_size: Tuple[int, int]
    use_pred_offset: bool = True     # ada=True, ali=False
    bias_init: Optional[object] = None   # final-conv bias init override
    window_radius: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, shape: jax.Array,
                 train: bool = False) -> jax.Array:
        ks_h, ks_w = self.kernel_size
        k = ks_h * ks_w
        shape = jax.lax.stop_gradient(shape)
        if self.use_pred_offset:
            offset = nn.Conv(2 * k, (1, 1), use_bias=False,
                             kernel_init=nn.initializers.zeros,
                             name='conv_offset')(shape)
        else:
            offset = _ali_offsets(shape, self.kernel_size)
        # observability hook (scripts/dcn_clip_rate.py): fraction of
        # |offset| above the training window radius
        self.sow('intermediates', 'fcb_offsets', offset)

        in_ch = x.shape[-1]
        weight = self.param('adaption_kernel',
                            nn.initializers.normal(0.01),
                            (ks_h, ks_w, in_ch, in_ch))
        if train and self.window_radius > 0:
            aligned = deform_conv2d_window(x, offset, weight,
                                           radius=self.window_radius)
        else:
            aligned = deform_conv2d(x, offset, weight)
        x = nn.relu(aligned)
        pad = ((ks_h - 1) // 2, (ks_w - 1) // 2)
        return nn.Conv(self.out_channels, (ks_h, ks_w), padding=pad,
                       bias_init=self.bias_init or nn.initializers.zeros,
                       name='conv')(x)


class PredictionHead(nn.Module):
    """Shared FCA head applied per FPN level."""
    cfg: STMaskConfig

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Dict[str, jax.Array]:
        c = self.cfg
        b, h, w, _ = x.shape
        n_scales = len(c.pred_scales[0])

        # upfeature (extra_head_net): conv 3x3 256 + relu
        x = nn.relu(nn.Conv(c.extra_head_net_channels, (3, 3), padding=1,
                            name='upfeature')(x))
        t2s_feat = x

        def extra(branch: str, n_layers: int, inp: jax.Array) -> jax.Array:
            y = inp
            for i in range(n_layers):
                y = nn.relu(nn.Conv(y.shape[-1], (3, 3), padding=1,
                                    name=f'{branch}_extra_{i}')(y))
            return y

        conf_x = extra('conf', c.extra_layers[0], x)
        bbox_x = extra('bbox', c.extra_layers[1], x)
        track_x = extra('track', c.extra_layers[2], x)
        mask_x = extra('mask', c.extra_layers[3], x)

        bbox_banks, conf_banks, center_banks = [], [], []
        track_banks, maskc_banks = [], []
        for k_idx, (kh, kw) in enumerate(c.head_kernel_sizes):
            pad = ((kh - 1) // 2, (kw - 1) // 2)

            bbox_cur = nn.Conv(n_scales * 4, (kh, kw), padding=pad,
                               name=f'bbox_layer_{k_idx}')(bbox_x)
            bbox_banks.append(bbox_cur)

            if c.train_centerness:
                cent = nn.Conv(n_scales, (kh, kw), padding=pad,
                               name=f'centerness_layer_{k_idx}')(bbox_x)
                center_banks.append(cent)

            conf_bias = (_focal_conf_bias_init(c, n_scales)
                         if c.use_sigmoid_focal_loss else None)
            if c.use_dcn_class:
                conf_cur = FeatureAlign(
                    n_scales * c.num_classes, (kh, kw),
                    use_pred_offset=c.use_pred_offset,
                    bias_init=conf_bias,
                    window_radius=c.fcb_window_radius,
                    name=f'conf_align_{k_idx}')(conf_x, bbox_cur,
                                                train=train)
            else:
                conf_cur = nn.Conv(n_scales * c.num_classes, (kh, kw),
                                   padding=pad,
                                   bias_init=(conf_bias
                                              or nn.initializers.zeros),
                                   name=f'conf_layer_{k_idx}')(conf_x)
            conf_banks.append(conf_cur)

            if c.use_dcn_track:
                track_cur = FeatureAlign(
                    n_scales * c.embed_dim, (kh, kw),
                    use_pred_offset=c.use_pred_offset,
                    window_radius=c.fcb_window_radius,
                    name=f'track_align_{k_idx}')(track_x, bbox_cur,
                                                 train=train)
            else:
                track_cur = nn.Conv(n_scales * c.embed_dim, (kh, kw),
                                    padding=pad,
                                    name=f'track_layer_{k_idx}')(track_x)
            track_banks.append(track_cur)

            if c.use_dcn_mask:
                mask_cur = FeatureAlign(
                    n_scales * c.mask_proto_n, (kh, kw),
                    use_pred_offset=c.use_pred_offset,
                    window_radius=c.fcb_window_radius,
                    name=f'mask_align_{k_idx}')(mask_x, bbox_cur,
                                                train=train)
            else:
                mask_cur = nn.Conv(n_scales * c.mask_proto_n, (kh, kw),
                                   padding=pad,
                                   name=f'mask_layer_{k_idx}')(mask_x)
            maskc_banks.append(mask_cur)

        # Anchor interleave: per spatial position, banks are contiguous, then
        # scales (reference cats bank outputs channel-last then views to
        # [B, h*w*banks*scales, dim], prediction_head_FC.py:185-195).
        def interleave(banks, dim):
            banks = [bk.reshape(b, h * w, n_scales, dim) for bk in banks]
            y = jnp.stack(banks, axis=2)       # [B, hw, banks, scales, dim]
            return y.reshape(b, -1, dim)

        out = {
            'loc': interleave(bbox_banks, 4),
            'conf': interleave(conf_banks, c.num_classes),
            'mask_coeff': interleave(maskc_banks, c.mask_proto_n),
            'T2S_feat': t2s_feat,
        }
        if c.train_centerness:
            # Reference quirk kept for checkpoint parity: centerness banks
            # are concatenated along H (bank-major anchor order), NOT
            # position-interleaved like every other branch
            # (prediction_head_FC.py:160 permutes then :189 cats dim=1).
            # Training and inference pair it with anchors by flat index
            # consistently, so the layout is learned.
            cent = jnp.concatenate(center_banks, axis=1)     # [B, banks*H, W, s]
            out['centerness'] = jnp.tanh(cent.reshape(b, -1, 1))
        if c.train_track:
            track = interleave(track_banks, c.embed_dim)
            norm = jnp.linalg.norm(track, axis=-1, keepdims=True)
            out['track'] = track / jnp.maximum(norm, 1e-12)
        return out
