"""Break down per-frame time: forward / detect / shift / track."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stmask_tpu.config import get_config
from stmask_tpu.inference import build_video_step
from stmask_tpu.inference.candidates import detect_frame
from stmask_tpu.inference.tracker import (candidate_shift, init_state,
                                          track_step_tf)
from stmask_tpu.models import STMask
from stmask_tpu.ops.anchors import all_priors


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    cfg = get_config('STMask_plus_resnet50')
    model = STMask(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(rng, x0, train=False)
    priors = jnp.asarray(all_priors(cfg))

    frame = jnp.asarray(np.random.RandomState(0)
                        .randn(cfg.pad_h, cfg.pad_w, 3).astype(np.float32))

    fwd = jax.jit(lambda p, x: model.apply(p, x[None], train=False))

    @jax.jit
    def fwd_detect(p, x):
        preds = fwd(p, x)
        fp = {k: preds[k][0] for k in
              ('loc', 'conf', 'mask_coeff', 'track', 'centerness')}
        return detect_frame(cfg, fp, priors)

    print('forward only      :', timeit(fwd, params, frame), 'ms')
    print('forward + detect  :', timeit(fwd_detect, params, frame), 'ms')

    video_step, make_state = build_video_step(cfg, model)
    state = make_state()
    state, out = video_step(params, state, frame, jnp.asarray(True))
    state, out = video_step(params, state, frame, jnp.asarray(False))

    def full(p, s, x):
        return video_step(p, s, x, jnp.asarray(False))

    print('full video step   :', timeit(full, params, state, frame), 'ms')

    # isolated candidate shift
    def tnet(x):
        return model.apply(params, x, method=STMask.temporal_shift)

    preds = fwd(params, frame)

    @jax.jit
    def shift_only(s):
        return candidate_shift(cfg, tnet, s, preds['fpn_feat'][0],
                               preds['T2S_feat'][0], preds['proto'][0])

    print('candidate shift   :', timeit(shift_only, state), 'ms')


if __name__ == '__main__':
    main()
