"""Trace the training step (reuses the overfit-sanity compiled program)."""

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stmask_tpu.config import get_config
from stmask_tpu.data import ClipLoader, YTVISDataset
from stmask_tpu.models import STMask
from stmask_tpu.train import build_train_step

cfg = get_config('STMask_plus_resnet50').replace(
    lr=2e-3, lr_warmup_until=100, lr_steps=(10 ** 9,), max_iter=400)
ds = YTVISDataset('/tmp/overfit_sanity/train.json',
                  '/tmp/overfit_sanity/imgs')
loader = ClipLoader(cfg, ds, batch_size=4, num_workers=8)
batch = next(iter(loader.epoch(0)))
batch = jax.tree_util.tree_map(jnp.asarray, batch)

model = STMask(cfg)
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 2, cfg.pad_h, cfg.pad_w, 3)), train=True)
train_step, init_state = build_train_step(cfg, model)
state = init_state(params)
state, metrics = train_step(state, batch)
jax.block_until_ready(metrics['total'])
import time
t0 = time.perf_counter()
for _ in range(3):
    state, metrics = train_step(state, batch)
jax.block_until_ready(metrics['total'])
print(f'step time: {(time.perf_counter() - t0) / 3 * 1000:.0f} ms')

trace_dir = '/tmp/train_trace'
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics['total'])

files = glob.glob(trace_dir + '/**/*.trace.json.gz', recursive=True)
with gzip.open(sorted(files)[-1], 'rt') as f:
    trace = json.load(f)
rows = {}
for ev in trace.get('traceEvents', []):
    if ev.get('ph') == 'X' and 'dur' in ev and ev.get('pid') == 3:
        name = ev.get('name', '?')
        if name.startswith('jit_'):
            continue
        args = ev.get('args', {})
        src = args.get('source', '?').split('/')[-1]
        key = (re.sub(r'\.\d+$', '', name), src)
        rows.setdefault(key, [0, 0])
        rows[key][0] += ev['dur']
        rows[key][1] += 1
total = sum(v[0] for v in rows.values())
print(f'total {total / 3000:.1f} ms/step')
for (name, src), (d, n) in sorted(rows.items(), key=lambda kv: -kv[1][0])[:30]:
    print(f'{d / 3000:9.2f} ms/step n={n:5d} {name[:30]:30s} {src[:45]}')
