"""Capture a jax.profiler trace of the video step and print top ops.

``--chunked`` traces the chunked multi-stream scan program instead —
the exact program bench.py's headline metric runs (``--streams N``,
``--chunk K``); default traces the single-frame sequential program.
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _print_top_device_ops(trace_dir, n_frames):
    files = glob.glob(trace_dir + '/**/*.trace.json.gz', recursive=True)
    if not files:
        print('no trace file found under', trace_dir)
        return
    with gzip.open(sorted(files)[-1], 'rt') as f:
        trace = json.load(f)
    durs = {}
    counts = {}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') == 'X' and 'dur' in ev:
            name = ev.get('name', '?')
            durs.setdefault(name, 0)
            counts.setdefault(name, 0)
            durs[name] += ev['dur']
            counts[name] += 1
    total = sum(durs.values())
    print(f'total device-op time {total/1000:.3f} ms '
          f'({total/1000/max(n_frames,1):.4f} ms/frame)')
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
    cum = 0
    for i, (name, d) in enumerate(top):
        cum += d
        print(f'{i+1:3d} {d/1000:10.3f} ms {100*d/max(total,1):5.1f}% '
              f'cum {100*cum/max(total,1):5.1f}% x{counts[name]:<5d} '
              f'{d/1000/n_frames:8.4f} ms/frame  {name[:90]}')


def main():
    from stmask_tpu.config import get_config
    from stmask_tpu.inference import build_video_step, cast_params
    from stmask_tpu.inference.pipeline import build_video_step_batched
    from stmask_tpu.models import STMask

    ap = argparse.ArgumentParser()
    ap.add_argument('--chunked', action='store_true',
                    help='trace the batched chunk-scan program (what '
                         'bench.py measures) instead of the single-frame '
                         'sequential program')
    ap.add_argument('--streams', type=int, default=8)
    ap.add_argument('--chunk', type=int, default=10)
    ap.add_argument('--config', default='STMask_plus_resnet50',
                    help='preset to profile (e.g. STMask_plus_resnet50_ada '
                         'to see the FCB deformable-alignment cost)')
    args = ap.parse_args()

    cfg = get_config(args.config)
    model = STMask(cfg)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=False)
    params = cast_params(params, jnp.bfloat16)
    rng = np.random.RandomState(0)

    if args.chunked:
        b, k = args.streams, args.chunk
        # same program as bench.py's _measure_streams (fp32 frames, no
        # uint8 path) so the compile cache is hit
        video_chunk, make_states = build_video_step_batched(
            cfg, model, n_videos=b, chunk_size=k)
        states = make_states(feat_dtype=jnp.bfloat16)
        frames = jnp.asarray(rng.randn(
            k, b, cfg.pad_h, cfg.pad_w, 3).astype(np.float32))
        first = jnp.zeros((k, b), bool).at[0].set(True)
        nofirst = jnp.zeros((k, b), bool)
        states, out = video_chunk(params, states, frames, first)
        for _ in range(2):
            states, out = video_chunk(params, states, frames, nofirst)
        float(jnp.sum(out.box))    # true sync (see CLAUDE.md)
        n_dispatch, n_frames = 4, 4 * k * b

        def run():
            sts = states
            for _ in range(n_dispatch):
                sts, o = video_chunk(params, sts, frames, nofirst)
            float(jnp.sum(o.box))
    else:
        video_step, make_state = build_video_step(cfg, model)
        state = make_state(feat_dtype=jnp.bfloat16)
        frame = jnp.asarray(rng.randn(cfg.pad_h, cfg.pad_w, 3)
                            .astype(np.float32))
        for i in range(3):
            state, out = video_step(params, state, frame,
                                    jnp.asarray(i == 0))
        float(jnp.sum(out.box))    # true sync (see CLAUDE.md)
        n_frames = 10

        def run():
            st = state
            for _ in range(n_frames):
                st, o = video_step(params, st, frame, jnp.asarray(False))
            float(jnp.sum(o.box))  # true sync inside the trace region

    trace_dir = '/tmp/stmask_trace'
    with jax.profiler.trace(trace_dir):
        run()

    print(f'({n_frames} frames traced; per-op totals below)')
    _print_top_device_ops(trace_dir, n_frames)


if __name__ == '__main__':
    main()
