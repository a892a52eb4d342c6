"""Bisect detect_frame inside single jitted programs (deltas are real)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stmask_tpu.config import get_config
from stmask_tpu.ops.anchors import all_priors
from stmask_tpu.ops.boxes import decode, jaccard
from stmask_tpu.ops.nms import NEG_INF


def timeit(fn, *args, n=100):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    cfg = get_config('STMask_plus_resnet50')
    p = cfg.num_priors
    rng = np.random.RandomState(0)
    priors = jnp.asarray(all_priors(cfg))
    loc = jnp.asarray(rng.randn(p, 4).astype(np.float32))
    conf = jnp.asarray(rng.rand(p, cfg.num_classes).astype(np.float32))
    cent = jnp.asarray(rng.rand(p).astype(np.float32))
    coeff = jnp.asarray(rng.randn(p, 32).astype(np.float32))
    track = jnp.asarray(rng.randn(p, 128).astype(np.float32))

    @jax.jit
    def stage_a(loc, conf, cent):
        boxes = decode(loc, priors)
        fg = conf[:, 1:]
        conf_max = jnp.max(fg, -1)
        classes = jnp.argmax(fg, -1)
        return boxes.sum() + conf_max.sum() + classes.sum()

    @jax.jit
    def stage_b(loc, conf, cent):
        boxes = decode(loc, priors)
        fg = conf[:, 1:]
        conf_max = jnp.max(fg, -1)
        classes = jnp.argmax(fg, -1)
        scores = jnp.where(conf_max > 0.05, conf_max * cent, NEG_INF)
        top, idx = jax.lax.top_k(scores, 200)
        return top.sum() + idx.sum() + boxes.sum() + classes.sum()

    @jax.jit
    def stage_c(loc, conf, cent):
        boxes = decode(loc, priors)
        fg = conf[:, 1:]
        conf_max = jnp.max(fg, -1)
        classes = jnp.argmax(fg, -1)
        scores = jnp.where(conf_max > 0.05, conf_max * cent, NEG_INF)
        top, idx = jax.lax.top_k(scores, 200)
        bk = boxes[idx]
        iou = jnp.triu(jaccard(bk, bk), k=1)
        valid = (jnp.max(iou, 0) <= 0.5) & (top > NEG_INF / 2)
        return valid.sum() + top.sum() + classes.sum()

    @jax.jit
    def stage_d(loc, conf, cent):
        boxes = decode(loc, priors)
        fg = conf[:, 1:]
        conf_max = jnp.max(fg, -1)
        classes = jnp.argmax(fg, -1).astype(jnp.int32)
        scores = jnp.where(conf_max > 0.05, conf_max * cent, NEG_INF)
        top, idx = jax.lax.top_k(scores, 200)
        bk = boxes[idx]
        iou = jnp.triu(jaccard(bk, bk), k=1)
        valid = (jnp.max(iou, 0) <= 0.5) & (top > NEG_INF / 2)
        surv = jnp.where(valid, top, NEG_INF)
        top2, ti = jax.lax.top_k(surv, 100)
        idx2 = idx[ti]
        return (boxes[idx2].sum() + coeff[idx2].sum() + track[idx2].sum()
                + classes[idx2].sum() + top2.sum())

    print('A decode+max     :', timeit(stage_a, loc, conf, cent))
    print('B +topk          :', timeit(stage_b, loc, conf, cent))
    print('C +iou/suppress  :', timeit(stage_c, loc, conf, cent))
    print('D +compact+gather:', timeit(stage_d, loc, conf, cent))


if __name__ == '__main__':
    main()
