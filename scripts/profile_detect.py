"""Micro-profile of the detect/NMS path on TPU."""

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
from stmask_tpu.ops.nms import cc_fast_nms


def timeit(fn, *args, n=50):
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

    dec = jax.jit(lambda l: decode(l, priors))
    print('decode      :', timeit(dec, loc))

    cmax = jax.jit(lambda c: (jnp.max(c[:, 1:], -1),
                              jnp.argmax(c[:, 1:], -1)))
    print('conf max    :', timeit(cmax, conf))

    topk = jax.jit(lambda s: jax.lax.top_k(s, 200))
    print('top_k 200   :', timeit(topk, cent))

    boxes = dec(loc)

    nms = jax.jit(lambda b, s: cc_fast_nms(b, s, 0.5, 200))
    scores = jnp.asarray(rng.rand(p).astype(np.float32))
    print('cc_fast_nms :', timeit(nms, boxes, scores))

    gath = jax.jit(lambda idx: (coeff[idx], track[idx], boxes[idx]))
    idx = jnp.asarray(rng.randint(0, p, 200))
    print('gathers     :', timeit(gath, idx))

    iou = jax.jit(lambda b: jaccard(b, b))
    b200 = boxes[:200]
    print('iou 200x200 :', timeit(iou, b200))


if __name__ == '__main__':
    main()
