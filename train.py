#!/usr/bin/env python
"""Training driver — the TPU-native analog of the reference ``train.py``.

Same public surface (config by name, batch-size autoscaling, warmup + step
decay, periodic/interrupt checkpoints, in-train validation, JSON-lines
logging) but one compiled data-parallel step over a device mesh instead of
``nn.DataParallel`` (reference ``train.py:153-175,263-380``).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='stmask-tpu training')
    p.add_argument('--config', default='STMask_plus_resnet50',
                   help='config preset name (see stmask_tpu.config.REGISTRY)')
    p.add_argument('--batch_size', type=int, default=8)
    p.add_argument('--resume', default=None,
                   help='checkpoint path, or "latest"/"interrupt"')
    p.add_argument('--init_weights', default=None,
                   help='torch .pth (COCO YOLACT++) or orbax dir to '
                        'partially initialize from')
    p.add_argument('--ann_file', default=None)
    p.add_argument('--img_prefix', default=None)
    p.add_argument('--save_folder', default='weights/')
    p.add_argument('--log_folder', default='logs/')
    p.add_argument('--save_interval', type=int, default=10000)
    p.add_argument('--keep_latest', type=int, default=0)
    p.add_argument('--validation_epoch', type=int, default=2)
    p.add_argument('--valid_ann_file', default=None)
    p.add_argument('--valid_img_prefix', default=None)
    p.add_argument('--valid_max_videos', type=int, default=20)
    p.add_argument('--num_workers', type=int, default=8)
    p.add_argument('--max_iter', type=int, default=None)
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--no_autoscale', action='store_true')
    p.add_argument('--img_w', type=int, default=None,
                   help='override input width (debug/small-scale runs)')
    p.add_argument('--img_h', type=int, default=None)
    p.add_argument('--vis_every', type=int, default=0,
                   help='every N steps write train/gt overlay PNGs of the '
                        'current batch (reference display_train_output)')
    p.add_argument('--vis_dir', default='results/train_vis')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stmask_tpu.config import get_config
    from stmask_tpu.data import ClipLoader, Prefetcher, YTVISDataset
    from stmask_tpu.models import STMask
    from stmask_tpu.parallel import make_mesh, replicate, shard_batch
    from stmask_tpu.train import autoscale, build_train_step
    from stmask_tpu.train.checkpoint import (CheckpointManager,
                                             InterruptSaver)
    from stmask_tpu.utils.logger import Log, MovingAverage

    cfg = get_config(args.config)
    if not args.no_autoscale:
        cfg = autoscale(cfg, args.batch_size)
    if args.lr is not None:
        cfg = cfg.replace(lr=args.lr)
    if args.max_iter is not None:
        cfg = cfg.replace(max_iter=args.max_iter)
    if args.img_w is not None:
        cfg = cfg.replace(img_w=args.img_w)
    if args.img_h is not None:
        cfg = cfg.replace(img_h=args.img_h)

    if args.ann_file is None or args.img_prefix is None:
        print('No --ann_file/--img_prefix given; nothing to train on.',
              file=sys.stderr)
        return 2

    dataset = YTVISDataset(args.ann_file, args.img_prefix)
    loader = ClipLoader(cfg, dataset, args.batch_size,
                        num_workers=args.num_workers,
                        num_shards=jax.process_count(),
                        shard_id=jax.process_index(),
                        image_u8=True)
    from stmask_tpu.data.transforms import (train_base_transform,
                                            unpack_masks_device)
    base_transform = train_base_transform(cfg)
    unpack_masks = unpack_masks_device()

    model = STMask(cfg)
    x0 = jnp.zeros((1, 2, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=True)

    if args.init_weights and args.init_weights.endswith('.pth'):
        from stmask_tpu.convert import load_torch_checkpoint, merge_params
        converted = load_torch_checkpoint(args.init_weights)
        params = merge_params(params, converted['params'])
        params = {'params': params['params']} if 'params' in params \
            else params

    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)

    ckpt = CheckpointManager(args.save_folder, cfg.name,
                             keep_latest=args.keep_latest)
    start_iter = 0
    if args.resume:
        path = {'latest': ckpt.get_latest(),
                'interrupt': ckpt.get_interrupt()}.get(args.resume,
                                                       args.resume)
        if path:
            from stmask_tpu.train.checkpoint import parse_ckpt_name
            state = ckpt.restore(path, state)
            parsed = parse_ckpt_name(path)
            if parsed:
                start_iter = parsed[2]
            print(f'Resumed from {path} at iteration {start_iter}')

    # data-parallel mesh over the largest device count dividing the batch
    if jax.process_count() > 1:
        # multi-process: every process's devices MUST participate (the
        # mesh cannot be shrunk to a subset of hosts), and each host's
        # LOCAL batch is laid out over its local devices by
        # make_array_from_process_local_data — so the per-process batch
        # must divide the local device count.
        n_local = len(jax.local_devices())
        if args.batch_size % n_local:
            print(f'--batch_size {args.batch_size} (per process) must be '
                  f'divisible by the {n_local} local devices in a '
                  f'{jax.process_count()}-process run', file=sys.stderr)
            return 2
        mesh = make_mesh()
    else:
        n_dev = len(jax.devices())
        while args.batch_size % n_dev:
            n_dev -= 1
        mesh = make_mesh(n_dev)
        if n_dev < len(jax.devices()):
            print(f'batch {args.batch_size} not divisible by '
                  f'{len(jax.devices())} devices; using {n_dev}')
    state = replicate(mesh, state)

    log = Log(cfg.name, args.log_folder,
              session_data={'args': vars(args), 'config': cfg.name})
    loss_avgs = {}
    time_avg = MovingAverage()

    iteration = start_iter
    epoch_size = max(1, len(loader.index) // args.batch_size)
    num_epochs = (cfg.max_iter + epoch_size - 1) // epoch_size

    pending_delayed = sorted(cfg.delayed_settings)

    with InterruptSaver(ckpt) as saver:
        def apply_delayed():
            """Delayed config changes at their exact iteration (reference
            train.py:278-291, incl. the loss-average reset).  The step
            program is rebuilt — a mid-epoch recompile, exactly when the
            reference mutates its global cfg.  The loader keeps the old
            cfg until the next epoch (the reference's forked DataLoader
            workers never see mid-epoch changes either)."""
            nonlocal cfg, train_step
            changed = False
            while pending_delayed and iteration >= pending_delayed[0][0]:
                _, changes = pending_delayed.pop(0)
                cfg = cfg.replace(**dict(changes))
                print('Applying delayed settings:', dict(changes))
                changed = True
            if changed:
                train_step, _ = build_train_step(cfg, model)
                for avg in loss_avgs.values():
                    avg.reset()

        for epoch in range(num_epochs):
            if (epoch + 1) * epoch_size < iteration:
                continue
            apply_delayed()     # catch up after a resume
            def put(b):
                """Upload uint8 frames + bit-packed masks, then
                normalize/pad + unpack on device — runs in the prefetch
                thread so transfer + prep overlap the in-flight step.
                Leaves stay host numpy until shard_batch uploads them
                directly with the target sharding (a jnp.asarray here
                would add an extra device copy — and in multi-process
                mode a full device->host->device round trip)."""
                b = shard_batch(mesh, b)
                b['images'] = base_transform(b['images'])
                b['masks_proto'] = unpack_masks(
                    b['masks_proto'])[..., :cfg.pad_w // 4]
                return b

            batches = Prefetcher(loader.epoch(epoch), put_fn=put)
            def consume(pending_metrics):
                """Materialize + log the PREVIOUS step's metrics: the
                blocking float() of step N runs after step N+1 is already
                dispatched, so host logging/decoding overlaps device
                compute instead of serializing with it (the round-2
                0.15-0.25 s/step host gap)."""
                metrics, m_epoch, m_iter = pending_metrics
                metrics = {k: float(v) for k, v in metrics.items()}
                for k, v in metrics.items():
                    loss_avgs.setdefault(k, MovingAverage(100)).append(v)
                if m_iter % 10 == 0:
                    eta = (cfg.max_iter - m_iter) * time_avg.get_avg()
                    msg = ' '.join(f'{k}: {loss_avgs[k].get_avg():.3f}'
                                   for k in sorted(loss_avgs))
                    print(f'[{m_epoch:3d}] {m_iter:7d} | {msg} | '
                          f'ETA: {eta / 3600:.2f}h')
                log.log('train', data=metrics, epoch=m_epoch, iter=m_iter)

            pending_metrics = None
            t0 = time.perf_counter()
            for batch in batches:
                if iteration >= cfg.max_iter:
                    break
                if pending_delayed and iteration >= pending_delayed[0][0]:
                    # materialize the last pre-change step's metrics BEFORE
                    # apply_delayed resets the loss averages (reference
                    # train.py:278-291: the reset starts a clean window)
                    if pending_metrics is not None:
                        consume(pending_metrics)
                        pending_metrics = None
                    apply_delayed()
                state, metrics = train_step(state, batch)
                iteration += 1
                saver.update(state, epoch, iteration)
                if pending_metrics is not None:
                    consume(pending_metrics)
                pending_metrics = (metrics, epoch, iteration)
                time_avg.append(time.perf_counter() - t0)
                t0 = time.perf_counter()

                if iteration % args.save_interval == 0 and iteration > 0:
                    print('Saving state, iter:', iteration)
                    ckpt.save(state, epoch, iteration)

                if args.vis_every > 0 and iteration % args.vis_every == 0:
                    from stmask_tpu.utils.visualization import \
                        save_train_output
                    save_train_output(cfg, model, state.params, batch,
                                      args.vis_dir, epoch, iteration)
            if pending_metrics is not None:
                consume(pending_metrics)
            if iteration >= cfg.max_iter:
                break

            # in-train validation mAP on the valid_sub split
            # (reference train.py:366-378 -> eval.validation)
            if (args.valid_ann_file and args.validation_epoch > 0
                    and (epoch + 1) % args.validation_epoch == 0):
                import eval as eval_script
                eval_args = eval_script.parse_args([
                    '--ann_file', args.valid_ann_file,
                    '--img_prefix',
                    args.valid_img_prefix or args.img_prefix,
                    '--eval_metrics',
                    '--max_videos', str(args.valid_max_videos),
                    '--mask_det_file',
                    os.path.join(args.save_folder, 'valid_results.json')])
                stats = eval_script.evaluate_dataset_batched(
                    eval_args, cfg, model, state.params)
                if stats:
                    log.log('validation', data=stats, epoch=epoch,
                            iter=iteration)

    ckpt.save(state, num_epochs, iteration)
    return 0


if __name__ == '__main__':
    sys.exit(main())
