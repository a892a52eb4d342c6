"""LR schedule: linear warmup + step decay, with batch-size autoscaling.

Mirrors reference ``train.py:88-96`` (autoscale: the reference checks
``batch_size*2 != 8`` and scales by ``batch_size*2/8`` — i.e. the
published lr/iteration recipe's baseline is 4 clips = 8 FRAMES per step;
the losses are per-frame means, so lr scales linearly with batch as in
the standard recipe) and ``train.py:294-302``
(warmup from ``lr_warmup_init`` over ``lr_warmup_until`` iters; gamma
step decay at ``lr_steps``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..config import STMaskConfig


def autoscale(cfg: STMaskConfig, batch_size: int) -> STMaskConfig:
    """Scale lr/max_iter/lr_steps for a non-default batch size in CLIPS
    (reference train.py:88-96: ``factor = batch_size*2 / 8`` with 2 frames
    per clip — recipe baseline 4 clips/8 frames)."""
    factor = batch_size * 2 / 8.0
    if factor == 1.0:
        return cfg
    return cfg.replace(
        lr=cfg.lr * factor,
        max_iter=int(cfg.max_iter / factor),
        lr_steps=tuple(int(s / factor) for s in cfg.lr_steps),
    )


def learning_rate(cfg: STMaskConfig, step) -> jnp.ndarray:
    step = jnp.asarray(step, jnp.float32)
    warm = cfg.lr_warmup_until
    lr0 = cfg.lr
    if warm > 0:
        lr = (cfg.lr - cfg.lr_warmup_init) * (step / warm) \
            + cfg.lr_warmup_init
        lr = jnp.where(step < warm, lr, lr0)
    else:
        lr = jnp.full_like(step, lr0)
    for s in cfg.lr_steps:
        lr = jnp.where(step >= s, lr * cfg.gamma, lr)
    return lr
