"""Benchmark the DCN forward formulations on the real TPU.

Compares, per backbone DCN site of STMask_plus_resnet50 at 384x640
(reference backbone.py:20-26 DCNv2; SURVEY 'north-star kernel'):
  * conv     — plain lax.conv, the MXU floor for the site
  * exact    — ops.deform_conv.deform_conv2d (XLA bilinear gather)
  * window   — ops.deform_conv.deform_conv2d_window (XLA dense shifts)

Prints per-site and total device times (median of slope-timed repeats)
and a max |diff| between the two DCN formulations (differs when offsets
exceed the window radius — the documented clamp).

This script decided the fate of the fused VMEM Pallas window kernel
(round-3): across four kernel structures (full 324-term unroll,
grid-over-taps + fori_loop, 9 chained single-tap calls, single-call
grid-over-taps with pre-shifted static-slice inputs) the best measured
1.363 ms total vs the XLA exact gather's 1.264 ms (window 1.422 ms,
conv floor 0.092 ms) in bf16 — so the kernel was removed and the exact
gather stays the eval path.  Full numbers in PARITY.md.

Usage: python scripts/bench_dcn.py [--dtype bf16|f32] [--repeats 5]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, '.')

import numpy as np


# (h, w, cin, stride) of every DCN conv2 in STMask_plus_resnet50 @ 384x640
# (layers (3,4,6,3), dcn_layers (0,4,6,3), dcn_interval 2 -> 7 sites)
SITES = [
    ('s2b0', 96, 160, 128, 2),
    ('s2b2', 48, 80, 128, 1),
    ('s3b0', 48, 80, 256, 2),
    ('s3b2', 24, 40, 256, 1),
    ('s3b4', 24, 40, 256, 1),
    ('s4b0', 24, 40, 512, 2),
    ('s4b2', 12, 20, 512, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    ap.add_argument('--repeats', type=int, default=30)
    ap.add_argument('--chain', type=int, default=50,
                    help='applications chained per dispatch')
    ap.add_argument('--radius', type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stmask_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_window

    dt = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    print(f'device={jax.devices()[0]} dtype={args.dtype}', flush=True)

    R = args.chain
    # Timing through the remote tunnel: `block_until_ready` does NOT
    # actually block under the axon client (measured: a 1000-conv chain
    # "completes" in 23us); only a value fetch (`float(...)`) syncs, and
    # a synced call costs ~30ms RTT + device time.  So: chain R ops in a
    # fori_loop (the loop-carried scalar stops CSE; `jnp.mean(o)` keeps
    # the WHOLE op live — a corner slice lets XLA slice-push/DCE it),
    # fetch-sync, and report the SLOPE between chains of R and 3R —
    # which cancels the RTT and every other constant per-call cost.

    def timeit(fn, x, *a):
        def make(r):
            @jax.jit
            def many(x, *a):
                def body(_, acc):
                    o = fn(x * (1.0 + acc).astype(x.dtype), *a)
                    return acc + jnp.mean(o).astype(jnp.float32) * 1e-30
                return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
            return many

        many1, many3 = make(R), make(3 * R)
        float(many1(x, *a))                  # compile
        float(many3(x, *a))
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(many1(x, *a))
            t1 = time.perf_counter()
            float(many3(x, *a))
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) * 1e3 / (2 * R))
        return statistics.median(ts), min(ts)

    rng = np.random.RandomState(0)
    totals = {'conv': 0.0, 'exact': 0.0, 'window': 0.0}
    max_diff = 0.0
    for name, h, w, cin, stride in SITES:
        ho, wo = h // stride, w // stride
        k = 9
        x = jnp.asarray(rng.randn(1, h, w, cin), dt)
        off = jnp.asarray(np.clip(rng.randn(1, ho, wo, 2 * k) * 1.0,
                                  -args.radius, args.radius), dt)
        m = jnp.asarray(rng.rand(1, ho, wo, k), dt)
        wt = jnp.asarray(rng.randn(3, 3, cin, cin) * 0.05, dt)
        bias = jnp.asarray(rng.randn(cin) * 0.1, dt)

        import functools
        f_exact = jax.jit(functools.partial(deform_conv2d, stride=stride))
        f_win = jax.jit(functools.partial(deform_conv2d_window,
                                          stride=stride,
                                          radius=args.radius))
        # plain-conv control: same shapes through lax.conv — the MXU
        # floor for the site and a check on the harness's own overhead
        def f_conv(xx, o_, w_, m_, b_):
            return jax.lax.conv_general_dilated(
                xx, w_, (stride, stride), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b_

        t0 = time.perf_counter()
        row = {}
        row['conv'] = timeit(f_conv, x, off, wt, m, bias)
        row['exact'] = timeit(
            lambda xx, o_, w_, m_, b_: f_exact(xx, o_, w_, mask=m_,
                                               bias=b_), x, off, wt, m, bias)
        row['window'] = timeit(
            lambda xx, o_, w_, m_, b_: f_win(xx, o_, w_, mask=m_,
                                             bias=b_), x, off, wt, m, bias)
        compile_s = time.perf_counter() - t0

        d = np.abs(np.asarray(f_exact(x, off, wt, mask=m, bias=bias),
                           np.float32)
                   - np.asarray(f_win(x, off, wt, mask=m, bias=bias),
                                np.float32)).max()
        max_diff = max(max_diff, float(d))
        for kk in totals:
            totals[kk] += row[kk][0]
        print(f'{name:5s} [{ho:3d}x{wo:3d}x{cin:3d} s{stride}] '
              + ' '.join(f'{kk}={row[kk][0]:7.3f}ms' for kk in totals)
              + f' | exact-vs-window maxdiff={float(d):.4f}'
              + f' (wall incl compile {compile_s:.0f}s)', flush=True)

    print('totals: ' + ' '.join(f'{kk}={v:7.3f}ms'
                                for kk, v in totals.items()))
    print(f'max |exact - window| across sites: {max_diff:.5f}')


if __name__ == '__main__':
    main()
