"""MFU / roofline accounting for the two headline programs (SURVEY §6).

Reports, from ``compiled.cost_analysis()`` (measured, not estimated):
  * the benchmarked eval chunk (bench.py protocol: N=8 lockstep streams,
    10-frame scan, bf16 params) — FLOPs/frame, achieved TFLOP/s, % of
    v5e bf16 peak, bytes accessed, achieved GB/s vs HBM peak, and the
    arithmetic-intensity verdict (compute- vs memory-bound);
  * the batch-4 train step (scripts/bench_train.py construction, fp32 and
    bf16) — same columns.

The programs are constructed with EXACTLY the same config values and
shapes as bench.py / bench_train.py so they hit the persistent compile
cache (CLAUDE.md: keep program HLO stable).

Peak numbers (TPU v5e / "TPU v5 lite"): 197 TFLOP/s bf16, 819 GB/s HBM.
Ridge point = 197e12 / 819e9 ≈ 240 FLOP/byte: programs whose arithmetic
intensity is below that are HBM-bandwidth-bound at best.

Timing syncs via a value fetch (block_until_ready is a no-op under the
axon tunnel client — see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAKS = {
    # device_kind prefix -> (bf16 TFLOP/s, HBM GB/s)
    'TPU v5 lite': (197.0, 819.0),
    'TPU v5e': (197.0, 819.0),
    'TPU v5p': (459.0, 2765.0),
    'TPU v4': (275.0, 1228.0),
}


def peak_for(device) -> tuple:
    kind = getattr(device, 'device_kind', '')
    for prefix, peaks in PEAKS.items():
        if kind.startswith(prefix):
            return peaks
    return (197.0, 819.0)  # default to v5e


def _cost(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {'flops': float(ca.get('flops', 0.0)),
            'bytes': float(ca.get('bytes accessed', 0.0))}


def report(name: str, cost: dict, sec_per_call: float, peaks: tuple,
           frames_per_call: int | None = None) -> dict:
    tflops = cost['flops'] / sec_per_call / 1e12
    gbs = cost['bytes'] / sec_per_call / 1e9
    ai = cost['flops'] / max(cost['bytes'], 1.0)
    ridge = peaks[0] * 1e12 / (peaks[1] * 1e9)
    row = {
        'program': name,
        'ms_per_call': round(sec_per_call * 1e3, 2),
        'gflops_per_call': round(cost['flops'] / 1e9, 1),
        'achieved_tflops': round(tflops, 2),
        'mfu_pct': round(100.0 * tflops / peaks[0], 2),
        'bytes_per_call_mb': round(cost['bytes'] / 1e6, 1),
        'achieved_gbs': round(gbs, 1),
        'hbm_pct': round(100.0 * gbs / peaks[1], 2),
        'arith_intensity': round(ai, 1),
        'ridge_flop_per_byte': round(ridge, 1),
        'bound': 'compute' if ai >= ridge else 'memory',
    }
    if frames_per_call:
        row['gflops_per_frame'] = round(cost['flops'] / frames_per_call
                                        / 1e9, 1)
    return row


def eval_program(repeats: int) -> dict:
    import jax
    import jax.numpy as jnp
    from stmask_tpu.config import get_config
    from stmask_tpu.inference import build_video_step_batched, cast_params
    from stmask_tpu.models import STMask

    n_videos, chunk = 8, 10          # bench.py headline configuration
    cfg = get_config('STMask_plus_resnet50')
    model = STMask(cfg)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = cast_params(model.init(jax.random.PRNGKey(0), x0, train=False),
                         jnp.bfloat16)
    video_chunk, make_states = build_video_step_batched(cfg, model,
                                                        n_videos, chunk)
    states = make_states(feat_dtype=jnp.bfloat16)
    frames = jnp.asarray(np.random.RandomState(0)
                         .randn(chunk, n_videos, cfg.pad_h, cfg.pad_w, 3)
                         .astype(np.float32))
    not_first = jnp.zeros((chunk, n_videos), bool)

    compiled = video_chunk.lower(params, states, frames,
                                 not_first).compile()
    cost = _cost(compiled)

    for _ in range(3):
        states, out = compiled(params, states, frames, not_first)
    float(jnp.sum(out.box))
    times = []
    n_calls = 20
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            states, out = compiled(params, states, frames, not_first)
        float(jnp.sum(out.box))
        times.append((time.perf_counter() - t0) / n_calls)
    times.sort()
    return report(f'eval chunk (N={n_videos} streams x {chunk} frames, '
                  'bf16)', cost, times[len(times) // 2],
                  peak_for(jax.devices()[0]),
                  frames_per_call=n_videos * chunk)


def train_program(bf16: bool, repeats: int,
                  assume_ms: float | None = None,
                  batch_size: int = 4) -> dict:
    import jax
    import jax.numpy as jnp
    from stmask_tpu.config import get_config
    from stmask_tpu.models import STMask
    from stmask_tpu.train import build_train_step

    cfg = get_config('STMask_plus_resnet50')
    model = STMask(cfg)
    b, g = batch_size, cfg.max_gt_per_frame
    hp, wp = cfg.pad_h // 4, cfg.pad_w // 4
    rng = np.random.RandomState(0)

    x0 = jnp.zeros((1, 2, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=True)
    train_step, init_state = build_train_step(
        cfg, model, compute_dtype=jnp.bfloat16 if bf16 else None)
    state = init_state(params)

    # identical batch construction to scripts/bench_train.py (cache hit)
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

    compiled = train_step.lower(state, batch).compile()
    cost = _cost(compiled)

    if assume_ms is not None:
        # FLOPs/bytes from THIS compile (any backend), wall from a prior
        # measured TPU run (e.g. scripts/bench_train.py) — lets the row be
        # produced without a ~35 min cold TPU train compile.  cost_analysis
        # runs on backend-optimized HLO, so CPU-derived FLOPs can deviate
        # slightly from the TPU compile's; label the row accordingly.
        row = report(
            f'train step (batch={b}, {"bf16" if bf16 else "fp32"})',
            cost, assume_ms / 1e3, PEAKS['TPU v5e'])
        row['timing_source'] = 'assumed_ms (prior measured TPU run)'
        return row

    state, metrics = compiled(state, batch)
    float(metrics['total'])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(3):
            state, metrics = compiled(state, batch)
        float(metrics['total'])
        times.append((time.perf_counter() - t0) / 3)
    times.sort()
    return report(f'train step (batch={b}, {"bf16" if bf16 else "fp32"})',
                  cost, times[len(times) // 2],
                  peak_for(jax.devices()[0]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--repeats', type=int, default=5)
    p.add_argument('--skip_train', action='store_true',
                   help='eval program only (train compile is ~35 min '
                        'cold through the remote tunnel)')
    p.add_argument('--skip_eval', action='store_true')
    p.add_argument('--assume_train_ms', type=float, nargs=2, default=None,
                   metavar=('FP32_MS', 'BF16_MS'),
                   help='skip train timing; report MFU from cost_analysis '
                        'of THIS compile (works on CPU) at the given '
                        'measured TPU ms/step (bench_train.py numbers)')
    p.add_argument('--train_precision', default='both',
                   choices=['both', 'fp32', 'bf16'],
                   help='which train-step precision(s) to report — bf16 '
                        'alone skips the fp32 compile (each is ~35 min '
                        'cold on TPU; pick the one the compile cache '
                        'already holds)')
    p.add_argument('--batch_size', type=int, default=4,
                   help='train-step batch (clips) — matches the '
                        'bench_train.py program of the same size, so a '
                        'prior bench run leaves the compile cache warm')
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (for --assume_train_ms '
                        'FLOPs extraction without a TPU compile); uses '
                        'its own compile-cache dir so it never contends '
                        'with TPU work (CLAUDE.md one-at-a-time rule)')
    args = p.parse_args()

    import jax
    if args.cpu:
        # env vars alone are unreliable under this machine's
        # sitecustomize — the config update is what sticks (CLAUDE.md).
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax_stmask_cpu'))
    dev = jax.devices()[0]
    peaks = peak_for(dev)
    print(f'device: {dev.device_kind} — peaks used: {peaks[0]} bf16 '
          f'TFLOP/s, {peaks[1]} GB/s HBM', flush=True)

    rows = []
    if not args.skip_eval:
        rows.append(eval_program(args.repeats))
        print(json.dumps(rows[-1]), flush=True)
    if not args.skip_train:
        for i, bf16 in enumerate((False, True)):
            if args.train_precision != 'both' and \
                    bf16 != (args.train_precision == 'bf16'):
                continue
            assume = args.assume_train_ms[i] if args.assume_train_ms else None
            rows.append(train_program(bf16, args.repeats, assume_ms=assume,
                                      batch_size=args.batch_size))
            print(json.dumps(rows[-1]), flush=True)

    print('\nprogram | ms/call | GFLOP/call | TFLOP/s | MFU% | GB/s | '
          'HBM% | FLOP/B | bound')
    for r in rows:
        print(f"{r['program']} | {r['ms_per_call']} | "
              f"{r['gflops_per_call']} | {r['achieved_tflops']} | "
              f"{r['mfu_pct']} | {r['achieved_gbs']} | {r['hbm_pct']} | "
              f"{r['arith_intensity']} | {r['bound']}")


if __name__ == '__main__':
    main()
