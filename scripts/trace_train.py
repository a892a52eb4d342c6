"""Per-op device profile of the training step.

Builds the EXACT program ``scripts/bench_train.py`` measures (same config
values, same batch construction — any config delta would change baked-in
HLO constants and miss the persistent compile cache), runs it under
``jax.profiler.trace``, and prints a per-fusion cost table aggregated over
3 steps.  ``--bf16`` traces the mixed-precision variant.
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch_size', type=int, default=4)
    p.add_argument('--bf16', action='store_true')
    p.add_argument('--config', default='STMask_plus_resnet50')
    p.add_argument('--top', type=int, default=40)
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (functional check without '
                        'the TPU tunnel; env vars alone are unreliable '
                        'here — see CLAUDE.md)')
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from stmask_tpu.config import get_config
    from stmask_tpu.models import STMask
    from stmask_tpu.train import build_train_step

    cfg = get_config(args.config)
    model = STMask(cfg)
    b = args.batch_size
    g = cfg.max_gt_per_frame
    hp, wp = cfg.pad_h // 4, cfg.pad_w // 4
    rng = np.random.RandomState(0)

    x0 = jnp.zeros((1, 2, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=True)
    train_step, init_state = build_train_step(
        cfg, model, compute_dtype=jnp.bfloat16 if args.bf16 else None)
    state = init_state(params)

    # identical batch construction to scripts/bench_train.py
    boxes = np.zeros((b, 2, g, 4), np.float32)
    labels = np.zeros((b, 2, g), np.int32)
    ids = np.zeros((b, 2, g), np.int32)
    valid = np.zeros((b, 2, g), bool)
    masks = np.zeros((b, 2, g, hp, wp), np.uint8)
    for i in range(b):
        for f in range(2):
            boxes[i, f, 0] = [0.2, 0.2, 0.6, 0.7]
            labels[i, f, 0] = 1 + i % (cfg.num_classes - 1)
            ids[i, f, 0] = i + 1
            valid[i, f, 0] = True
            masks[i, f, 0, hp // 5:7 * hp // 10, wp // 5:6 * wp // 10] = 1
    batch = {
        'images': jnp.asarray(
            rng.randn(b, 2, cfg.pad_h, cfg.pad_w, 3).astype(np.float32)),
        'boxes': jnp.asarray(boxes), 'labels': jnp.asarray(labels),
        'ids': jnp.asarray(ids), 'valid': jnp.asarray(valid),
        'masks_proto': jnp.asarray(masks),
    }

    # warm up / compile; sync via value fetch (block_until_ready is a
    # no-op under the remote-tunnel client — see CLAUDE.md)
    state, metrics = train_step(state, batch)
    float(metrics['total'])
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = train_step(state, batch)
    float(metrics['total'])
    print(f'step time: {(time.perf_counter() - t0) / 3 * 1000:.0f} ms '
          f'(batch={b}, {"bf16" if args.bf16 else "fp32"})')

    trace_dir = '/tmp/train_trace'
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, metrics = train_step(state, batch)
        float(metrics['total'])

    files = glob.glob(trace_dir + '/**/*.trace.json.gz', recursive=True)
    with gzip.open(sorted(files)[-1], 'rt') as f:
        trace = json.load(f)
    rows = {}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') == 'X' and 'dur' in ev and ev.get('pid') == 3:
            name = ev.get('name', '?')
            if name.startswith('jit_'):
                continue
            ea = ev.get('args', {})
            src = ea.get('source', '?').split('/')[-1]
            key = (re.sub(r'\.\d+$', '', name), src)
            rows.setdefault(key, [0, 0])
            rows[key][0] += ev['dur']
            rows[key][1] += 1
    total = sum(v[0] for v in rows.values())
    print(f'total {total / 3000:.1f} ms/step')
    for (name, src), (d, n) in sorted(rows.items(),
                                      key=lambda kv: -kv[1][0])[:args.top]:
        print(f'{d / 3000:9.2f} ms/step n={n:5d} {name[:35]:35s} {src[:45]}')


if __name__ == '__main__':
    main()
