"""Capture a jax.profiler trace of the video step and print top ops."""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from stmask_tpu.config import get_config
    from stmask_tpu.inference import build_video_step, cast_params
    from stmask_tpu.models import STMask

    cfg = get_config('STMask_plus_resnet50')
    model = STMask(cfg)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=False)
    params = cast_params(params, jnp.bfloat16)
    video_step, make_state = build_video_step(cfg, model)
    state = make_state(feat_dtype=jnp.bfloat16)
    frame = jnp.asarray(np.random.RandomState(0)
                        .randn(cfg.pad_h, cfg.pad_w, 3).astype(np.float32))
    for i in range(3):
        state, out = video_step(params, state, frame, jnp.asarray(i == 0))
    float(jnp.sum(out.box))        # true sync (see CLAUDE.md)

    trace_dir = '/tmp/stmask_trace'
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            state, out = video_step(params, state, frame,
                                    jnp.asarray(False))
        float(jnp.sum(out.box))    # true sync inside the trace region

    # parse the trace: accumulate device op durations
    files = glob.glob(trace_dir + '/**/*.trace.json.gz', recursive=True)
    if not files:
        print('no trace file found under', trace_dir)
        return
    with gzip.open(sorted(files)[-1], 'rt') as f:
        trace = json.load(f)
    durs = {}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') == 'X' and 'dur' in ev:
            name = ev.get('name', '?')
            pid = ev.get('pid', 0)
            durs.setdefault((name), 0)
            durs[name] += ev['dur']
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
    for name, d in top:
        print(f'{d/1000:10.3f} ms  {name[:110]}')


if __name__ == '__main__':
    main()
