"""Training-step throughput benchmark (single chip, synthetic batch)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--steps', type=int, default=20)
    p.add_argument('--config', default='STMask_plus_resnet50')
    p.add_argument("--remat", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--pipeline", action="store_true",
                   help="also measure wall-clock through the real host "
                        "input pipeline (JPEG decode + loader + prefetch)")
    args = p.parse_args()

    import jax
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
    import jax.numpy as _jnp
    train_step, init_state = build_train_step(
        cfg, model, remat=args.remat,
        compute_dtype=_jnp.bfloat16 if args.bf16 else None)
    state = init_state(params)

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

    # NOTE: the final sync must be a value FETCH — under the remote-tunnel
    # client block_until_ready returns without waiting for execution
    state, metrics = train_step(state, batch)
    float(metrics['total'])
    # guard AFTER compile (contention during compile is harmless), BEFORE
    # the timed loop — this host has one CPU and a competing python
    # process inflates dispatch time ~10% (PARITY.md round-4 table)
    from stmask_tpu.utils.hostguard import wait_for_quiet_host
    guard = wait_for_quiet_host(max_wait_s=600.0)
    if guard.get('competitors'):
        print(f'# CONTENDED: {guard}')
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_step(state, batch)
    float(metrics['total'])
    dt = (time.perf_counter() - t0) / args.steps
    print(f'batch={b} device step={dt * 1000:.1f} ms '
          f'-> {b / dt:.1f} clips/s ({2 * b / dt:.1f} frames/s) '
          f'loss={float(metrics["total"]):.3f}')

    if args.pipeline:
        # wall-clock through the REAL host input pipeline (on-disk JPEG
        # decode -> ClipLoader -> Prefetcher -> deferred-metrics loop,
        # exactly the train.py structure) vs the device-only step above
        from overfit_sanity import make_dataset
        from stmask_tpu.data import ClipLoader, Prefetcher, YTVISDataset
        from stmask_tpu.data.transforms import (train_base_transform,
                                                unpack_masks_device)

        root = '/tmp/stmask_bench_train_ds'
        ann = os.path.join(root, 'train.json')
        if not os.path.exists(ann):
            make_dataset(root, n_videos=8, n_frames=16, h=360, w=640)
        ds = YTVISDataset(ann, os.path.join(root, 'imgs'),
                          has_annotations=True)
        # uint8 upload + device normalize/pad — the train.py input path
        loader = ClipLoader(cfg, ds, batch_size=b, num_workers=16,
                            image_u8=True)
        base_transform = train_base_transform(cfg)
        unpack_masks = unpack_masks_device()

        def batches():
            epoch = 0
            while True:
                yield from loader.epoch(epoch)
                epoch += 1

        def put(bt):
            bt = jax.tree_util.tree_map(jnp.asarray, bt)
            bt['images'] = base_transform(bt['images'])
            bt['masks_proto'] = unpack_masks(
                bt['masks_proto'])[..., :cfg.pad_w // 4]
            return bt

        it = iter(Prefetcher(batches(), put_fn=put))
        state2 = init_state(params)
        state2, m = train_step(state2, next(it))   # compile with real batch
        float(m['total'])
        pending = None
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state2, m = train_step(state2, next(it))
            if pending is not None:
                _ = {k: float(v) for k, v in pending.items()}
            pending = m
        float(m['total'])
        wall = (time.perf_counter() - t0) / args.steps
        print(f'batch={b} pipeline wall={wall * 1000:.1f} ms '
              f'(device {dt * 1000:.1f} ms, host overhead '
              f'{(wall - dt) * 1000:+.1f} ms = {(wall / dt - 1) * 100:.0f}%)')


if __name__ == '__main__':
    main()
