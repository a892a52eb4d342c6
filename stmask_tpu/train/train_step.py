"""The compiled data-parallel training step.

Replaces the reference's single-process ``nn.DataParallel`` training loop
(``train.py:153-175`` CustomDataParallel scatter/gather + loss-mean at
``train.py:310``) with a ``jax.jit``-compiled step over a device mesh: the
batch is sharded along its leading axis, XLA inserts the gradient
all-reduce over ICI, and the non-finite-loss step skip
(``train.py:314-316``) is a masked update inside the same program.

SGD with momentum + weight decay matches ``train.py:213``
(SGD(momentum=0.9, weight_decay=cfg.decay)).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import STMaskConfig
from ..models.stmask import STMask
from ..ops.anchors import all_priors
from .losses import compute_losses
from .schedule import learning_rate


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _bn_freeze_labels(cfg: STMaskConfig, params):
    """'frozen' for FrozenBatchNorm stats (mean/var — NEVER trainable; they
    are running statistics stored as params only for flat checkpoint
    mapping) and, under ``cfg.freeze_bn``, also for BN scale/bias
    (reference STMask.freeze_bn, STMask.py:196-203: ``module.eval()`` +
    ``requires_grad=False`` on every BatchNorm2d)."""
    def label(path, _):
        names = [str(getattr(k, 'key', k)) for k in path]
        in_bn = any(n in ('bn1', 'bn2', 'bn3') or n.endswith('_bn')
                    for n in names)
        if in_bn and names[-1] in ('mean', 'var'):
            return 'frozen'
        if in_bn and cfg.freeze_bn and names[-1] in ('scale', 'bias'):
            return 'frozen'
        return 'train'
    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg: STMaskConfig) -> optax.GradientTransformation:
    def lr_fn(step):
        return learning_rate(cfg, step)
    base = optax.chain(
        optax.add_decayed_weights(cfg.decay),
        optax.sgd(learning_rate=lr_fn, momentum=cfg.momentum),
    )
    # NOTE: without this mask, SGD happily "trains" the frozen-BN running
    # statistics through their gradients — and a variance pushed below
    # -eps makes rsqrt(var+eps) NaN with perfectly finite params.
    return optax.multi_transform(
        {'train': base, 'frozen': optax.set_to_zero()},
        lambda params: _bn_freeze_labels(cfg, params))


def build_train_step(cfg: STMaskConfig, model: STMask,
                     remat: bool = False, compute_dtype=None):
    """Returns (train_step, init_state_fn).

    train_step(state, batch) -> (state, metrics); batch:
      images [B, 2, H, W, 3] normalized;
      boxes [B, 2, G, 4]; labels/ids/valid [B, 2, G];
      masks_proto [B, 2, G, Hp, Wp] uint8.

    remat: rematerialize the forward pass (jax.checkpoint) — trades FLOPs
    for activation memory to fit larger per-chip batches.
    compute_dtype: e.g. jnp.bfloat16 — mixed-precision forward/backward for
    the conv stack; master params, losses, and the optimizer stay fp32
    (prediction tensors are cast back before the losses).
    """
    priors = jnp.asarray(all_priors(cfg))
    tx = make_optimizer(cfg)

    def forward(params, images):
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if x.dtype == jnp.float32 else x, params)
            images = images.astype(compute_dtype)
        preds = model.apply(params, images, train=True)
        if compute_dtype is not None:
            preds = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if x.dtype == compute_dtype else x, preds)
        return preds

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch):
        images = batch['images']
        b = images.shape[0]
        preds = forward(params, images)

        def flatten(x):
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        gt = {
            'boxes': flatten(batch['boxes']),
            'labels': flatten(batch['labels']),
            'ids': flatten(batch['ids']),
            'valid': flatten(batch['valid']),
            'masks_proto': flatten(batch['masks_proto']),
        }
        if 'masks_p3' in batch:
            gt['masks_p3'] = flatten(batch['masks_p3'])
        if 'crowd_boxes' in batch:
            gt['crowd_boxes'] = flatten(batch['crowd_boxes'])
            gt['crowd_valid'] = flatten(batch['crowd_valid'])

        def temporal_net_fn(x):
            return model.apply(params, x, method=STMask.temporal_shift)

        maskiou_fn = None
        if cfg.use_maskiou:
            def maskiou_fn(x):
                return model.apply(params, x, method=STMask.maskiou)

        losses = compute_losses(cfg, preds, gt, priors, temporal_net_fn,
                                maskiou_fn=maskiou_fn)
        total = sum(losses.values())
        return total, losses

    @jax.jit
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)

        # frozen leaves (BN stats / frozen affine) never update — zero
        # their grads up front so the clip threshold, the logged 'gnorm',
        # and the finite-check all reflect *trainable* dynamics only
        labels = _bn_freeze_labels(cfg, grads)
        grads = jax.tree_util.tree_map(
            lambda g, l: g if l == 'train' else jnp.zeros_like(g),
            grads, labels)

        # skip the update when the loss OR any gradient is non-finite
        # (extends reference train.py:314-316 — a finite loss with an
        # inf/nan gradient would silently wreck the weights in one step)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(total) & jnp.isfinite(gnorm)
        if cfg.grad_clip_norm > 0:
            # one outlier step (saturation spikes) can otherwise move the
            # heads by orders of magnitude and destabilize the whole run
            scale = jnp.minimum(1.0, cfg.grad_clip_norm
                                / jnp.maximum(gnorm, 1e-12))
        else:
            scale = 1.0
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g * scale, jnp.zeros_like(g)),
            grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params)
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_opt, state.opt_state)

        metrics = dict(losses)
        metrics['total'] = total
        metrics['gnorm'] = gnorm
        metrics['lr'] = learning_rate(cfg, state.step)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    def init_state(params) -> TrainState:
        return TrainState(params, tx.init(params),
                          jnp.zeros((), jnp.int32))

    return train_step, init_state
