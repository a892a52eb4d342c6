"""Benchmark: streaming video-inference FPS on one chip.

Measures the full jitted per-frame step (forward + decode + NMS + temporal
shift + tracking) of the flagship config (STMask_plus_resnet50 = R50-DCN-FPN
+ FCA + TF) at the reference input size 360x640 (padded 384x640), matching
the reference benchmark protocol (``eval.py --benchmark``; baseline 29.3 FPS
on a RTX 2080 Ti, README.md:102).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 29.3
WARMUP = 5
FRAMES = 50


def main():
    from stmask_tpu.config import get_config
    from stmask_tpu.inference import build_video_step, cast_params
    from stmask_tpu.models import STMask

    cfg = get_config('STMask_plus_resnet50')
    model = STMask(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(rng, x0, train=False)
    # production serving dtype: bf16 convs, fp32 decode/NMS/tracking
    params = cast_params(params, jnp.bfloat16)

    video_step, make_state = build_video_step(cfg, model)
    state = make_state(feat_dtype=jnp.bfloat16)

    frames = [jnp.asarray(np.random.RandomState(i)
                          .randn(cfg.pad_h, cfg.pad_w, 3).astype(np.float32))
              for i in range(8)]

    # warmup / compile
    for i in range(WARMUP):
        state, out = video_step(params, state, frames[i % len(frames)],
                                jnp.asarray(i == 0))
    jax.block_until_ready(out.box)

    t0 = time.perf_counter()
    for i in range(FRAMES):
        state, out = video_step(params, state, frames[i % len(frames)],
                                jnp.asarray(False))
    jax.block_until_ready(out.box)
    dt = time.perf_counter() - t0

    fps = FRAMES / dt
    print(json.dumps({
        'metric': 'ytvis2019_stream_fps_per_chip_r50dcn_fca_tf_360x640',
        'value': round(fps, 2),
        'unit': 'frames/s',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
