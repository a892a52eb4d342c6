"""Export a trained STMask model to a self-contained serving artifact.

AOT-compiles the per-frame video-inference step (or the lockstep-batched
variant) to StableHLO via ``jax.export`` with the weights baked in, and
writes a single ``.stmask`` zip that a serving host can load with nothing
but jax installed (``stmask_tpu.export.load_exported``).

Examples::

    # flagship single-stream step, current backend, bf16 weights
    python scripts/export_model.py --config STMask_plus_resnet50 \
        --trained_model weights/ckpt --bf16 --out model.stmask

    # 8-stream lockstep serving program, 10-frame chunks
    python scripts/export_model.py --config STMask_plus_resnet50 \
        --trained_model weights/ckpt --batched 8 --chunk 10 \
        --out model_b8.stmask
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--config', default=None)
    p.add_argument('--trained_model', default=None,
                   help='orbax checkpoint dir or torch .pth (optional: '
                        'random init without it, for pipeline smoke tests)')
    p.add_argument('--out', required=True, help='output .stmask path')
    p.add_argument('--batched', type=int, default=0,
                   help='export the N-stream lockstep program (0 = '
                        'single-stream per-frame step)')
    p.add_argument('--chunk', type=int, default=1,
                   help='frames per dispatch for --batched (lax.scan)')
    p.add_argument('--bf16', action='store_true',
                   help='bake bf16-cast weights (MXU-native inference)')
    p.add_argument('--float_input', action='store_true',
                   help='take normalized padded float frames instead of '
                        'the default resized-uint8 + on-device normalize')
    p.add_argument('--platforms', nargs='+', default=None,
                   help='lowering platforms (default: current backend); '
                        'e.g. --platforms tpu cpu')
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend')
    p.add_argument('--bench', type=int, default=0, metavar='PASSES',
                   help='after writing, reload the artifact and time '
                        'PASSES passes of ~200 frames each (median '
                        'artifact FPS — proves the serving artifact '
                        'matches the live pipeline throughput)')
    # reused by eval.load_model
    p.add_argument('--nms', default=None)
    p.add_argument('--nms_as_miou', action='store_true')
    p.add_argument('--img_w', type=int, default=None,
                   help='override input width (e.g. small smoke exports)')
    p.add_argument('--img_h', type=int, default=None)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from eval import load_model
    from stmask_tpu.export import export_video_step, save_exported
    from stmask_tpu.inference import cast_params

    cfg, model, params = load_model(args)
    if args.bf16:
        import jax.numpy as jnp
        params = cast_params(params, jnp.bfloat16)

    exported, meta = export_video_step(
        cfg, model, params,
        platforms=tuple(args.platforms) if args.platforms else None,
        batched=args.batched, chunk_size=args.chunk,
        uint8_input=not args.float_input)
    save_exported(exported, meta, args.out)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f'wrote {args.out} ({size_mb:.1f} MB): config={meta["config"]} '
          f'platforms={meta["platforms"]} batched={meta["batched"]} '
          f'chunk={meta["chunk_size"]} frame={meta["frame_shape"]} '
          f'{meta["frame_dtype"]}')

    if args.bench > 0:
        bench_artifact(args.out, args.bench)
    elif args.bench < 0:
        p.error(f'--bench must be >= 1, got {args.bench}')


def bench_artifact(path: str, repeats: int, target_frames: int = 200):
    """Reload ``path`` on the serving-host code path (``load_exported``,
    no model code) and time it with true value-fetch syncs (see bench.py
    ``_drain`` — ``block_until_ready`` is a no-op under the axon tunnel).
    Prints one JSON line with median/min/max artifact FPS, directly
    comparable to ``bench.py``'s live-pipeline numbers."""
    import json
    import time

    import jax.numpy as jnp
    import numpy as np

    from stmask_tpu.export import load_exported

    step, meta = load_exported(path)
    state = step.init_state()
    rng = np.random.RandomState(0)
    shape, dtype = meta['frame_shape'], np.dtype(meta['frame_dtype'])
    frames = jnp.asarray(
        rng.randint(0, 256, shape).astype(dtype) if dtype == np.uint8
        else rng.randn(*shape).astype(dtype))
    batched = int(meta['batched'])
    frames_per_call = ((meta['chunk_size'] * batched) if batched else 1)
    if batched:
        first = jnp.zeros((meta['chunk_size'], batched), bool)
        first_start = first.at[0].set(True)
    else:
        first = jnp.asarray(False)
        first_start = jnp.asarray(True)
    n_calls = max(1, target_frames // frames_per_call)

    # Video-start reset on the first warmup call (mirrors bench.py):
    # without it the tracker runs from an all-zero bank and, with bf16
    # weights, tracked outputs can degenerate.
    state, out = step(state, frames, first_start)
    for _ in range(2):  # compile + warmup
        state, out = step(state, frames, first)
    float(jnp.sum(out.box))

    fps = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, out = step(state, frames, first)
        float(jnp.sum(out.box))
        fps.append(n_calls * frames_per_call
                   / (time.perf_counter() - t0))
    fps.sort()
    print(json.dumps({
        'metric': 'serving_artifact_fps',
        'artifact': path, 'batched': batched,
        'chunk': meta['chunk_size'], 'repeats': repeats,
        'value': round(fps[len(fps) // 2], 2),
        'min': round(fps[0], 2), 'max': round(fps[-1], 2),
        'unit': 'frames/s'}))


if __name__ == '__main__':
    main()
