#!/usr/bin/env python
"""Evaluation driver — the TPU-native analog of the reference ``eval.py``.

Modes (mirroring the reference flag surface, ``eval.py:39-134``):
  * dataset eval -> YTVIS-format JSON (+ optional metrics vs gt);
  * ``--benchmark``: FPS with warm-up exclusion and a per-stage table;
  * ``--metrics_only``: score an existing results JSON;
  * single video / image folder via ``--video_dir``.

The per-frame compute is ONE jitted program (see
``stmask_tpu/inference/pipeline.py``); videos stream sequentially, and
multi-chip eval shards whole videos across processes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='stmask-tpu evaluation')
    p.add_argument('--config', default=None)
    p.add_argument('--trained_model', default=None,
                   help='orbax dir or torch .pth checkpoint')
    p.add_argument('--ann_file', default=None)
    p.add_argument('--img_prefix', default=None)
    p.add_argument('--mask_det_file', default='results/results.json')
    p.add_argument('--benchmark', action='store_true')
    p.add_argument('--metrics_only', action='store_true')
    p.add_argument('--eval_metrics', action='store_true',
                   help='score results against --ann_file annotations')
    p.add_argument('--max_videos', type=int, default=-1)
    p.add_argument('--score_threshold', type=float, default=0.0)
    p.add_argument('--video_dir', default=None,
                   help='directory of frames for a single video')
    p.add_argument('--display', action='store_true',
                   help='write detection overlays to --display_dir')
    p.add_argument('--display_lincomb', action='store_true',
                   help='with --display, also write the prototype '
                        'linear-combination breakdown of the top detection '
                        '(reference eval.py:91, output_utils.py:168)')
    p.add_argument('--display_fpn_outs', action='store_true',
                   help='with --display, also write channel-activation '
                        'grids of each FPN level (reference eval.py:65, '
                        'output_utils.py:225-244)')
    p.add_argument('--display_dir', default='results/display')
    p.add_argument('--batch_videos', type=int, default=8,
                   help='video streams stepped in lockstep (throughput)')
    p.add_argument('--chunk_frames', type=int, default=4,
                   help='frames per device dispatch')
    p.add_argument('--sequential', action='store_true',
                   help='one-video-at-a-time eval (debug / latency mode)')
    p.add_argument('--bf16', action='store_true', default=True)
    p.add_argument('--fp32', dest='bf16', action='store_false')
    p.add_argument('--coco', action='store_true',
                   help='image-level COCO eval (images as 1-frame videos)')
    p.add_argument('--nms', default=None,
                   choices=['cc', 'per_class', 'greedy'],
                   help="NMS family: 'cc' = cross-class fast NMS (mAP), "
                        "'per_class' = fast NMS (mAP*), 'greedy' = exact "
                        "sequential Cython-parity NMS")
    p.add_argument('--nms_as_miou', action='store_true',
                   help='blend box IoU with mask IoU in cc NMS '
                        '(reference detection.py:154-158)')
    p.add_argument('--tensorboard_dir', default=None,
                   help='with --metrics_only, also write the metrics as '
                        'TensorBoard scalars (reference eval.py:850-852)')
    p.add_argument('--time_device', action='store_true',
                   help='block on every dispatch to report pure device FPS '
                        '(disables host-IO overlap; benchmark use)')
    p.add_argument('--img_w', type=int, default=None,
                   help='override input width (debug/small-scale runs)')
    p.add_argument('--img_h', type=int, default=None)
    return p.parse_args(argv)


def load_model(args):
    import jax
    import jax.numpy as jnp
    from stmask_tpu.config import (config_from_checkpoint_name, get_config)
    from stmask_tpu.models import STMask

    cfg = None
    if args.config:
        cfg = get_config(args.config)
    elif args.trained_model:
        cfg = config_from_checkpoint_name(args.trained_model)
    if cfg is None:
        cfg = get_config('STMask_plus_resnet50')
        print(f'No config resolved; defaulting to {cfg.name}')
    if getattr(args, 'nms', None):
        cfg = cfg.replace(eval_nms_method=args.nms)
    if getattr(args, 'nms_as_miou', False):
        cfg = cfg.replace(nms_as_miou=True)
    if getattr(args, 'img_w', None):
        cfg = cfg.replace(img_w=args.img_w)
    if getattr(args, 'img_h', None):
        cfg = cfg.replace(img_h=args.img_h)

    model = STMask(cfg)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=False)

    if args.trained_model:
        if args.trained_model.endswith('.pth'):
            from stmask_tpu.convert import (load_torch_checkpoint,
                                            merge_params)
            converted = load_torch_checkpoint(args.trained_model)
            params = merge_params(params, converted['params'])
        else:
            import orbax.checkpoint as ocp
            params = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.trained_model), params)
    return cfg, model, params


def _write_display(args, cfg, pre, out, vid, f):
    """Render one frame's tracked detections to PNG (for --display and the
    web viewer)."""
    import cv2
    import numpy as np
    from stmask_tpu.utils.visualization import (draw_detections,
                                                undo_image_transformation)
    os.makedirs(args.display_dir, exist_ok=True)
    keep = np.asarray(out.keep)
    img_h, img_w = pre['img_shape']
    im = np.asarray(pre['image'])
    if im.dtype == np.uint8:        # uint8 upload path: already RGB uint8
        img = im[:img_h, :img_w]
    else:
        img = undo_image_transformation(im, img_h, img_w)
    idx = np.nonzero(keep)[0]
    pad_h, pad_w = pre['pad_shape']
    boxes = np.asarray(out.box)[idx] * [pad_w, pad_h, pad_w, pad_h]
    masks = np.asarray(out.mask)[idx]
    masks_up = np.stack([
        cv2.resize(m.astype(np.float32), (img_w, img_h)) > 0.5
        for m in masks]) if len(idx) else None
    over = draw_detections(img, boxes, np.asarray(out.cls)[idx],
                           np.asarray(out.score)[idx], masks_up,
                           np.asarray(out.obj_id)[idx], cfg.classes)
    cv2.imwrite(os.path.join(args.display_dir, f'{vid:05d}_{f:04d}.png'),
                cv2.cvtColor(over, cv2.COLOR_RGB2BGR))


def _write_lincomb(args, dbg, vid, f):
    """Prototype linear-combination breakdown of the top detection
    (reference --display_lincomb, output_utils.py:168)."""
    import cv2
    import numpy as np
    from stmask_tpu.utils.visualization import display_lincomb
    valid = np.asarray(dbg['det_valid'])
    if not valid.any():
        return
    top = int(np.nonzero(valid)[0][0])
    coeff = np.tanh(np.asarray(dbg['mask_coeff'], np.float32)[top])
    grids = display_lincomb(np.asarray(dbg['proto'], np.float32), coeff)
    out_dir = os.path.join(args.display_dir, 'proto')
    os.makedirs(out_dir, exist_ok=True)
    for name, g in grids.items():
        gmin, gmax = float(g.min()), float(g.max())
        img = ((g - gmin) / max(gmax - gmin, 1e-6) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir,
                                 f'{vid:05d}_{f:04d}_{name}.png'), img)


def _write_fpn_outs(args, dbg, vid, f):
    """Channel-activation grids of each FPN level (reference
    --display_fpn_outs, output_utils.py:225-244)."""
    import cv2
    import numpy as np
    from stmask_tpu.utils.visualization import display_fpn_outs
    grids = display_fpn_outs([np.asarray(x, np.float32)
                              for x in dbg['fpn_outs']])
    out_dir = os.path.join(args.display_dir, 'fpn')
    os.makedirs(out_dir, exist_ok=True)
    for name, g in grids.items():
        gmin, gmax = float(g.min()), float(g.max())
        img = ((g - gmin) / max(gmax - gmin, 1e-6) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir,
                                 f'{vid:05d}_{f:04d}_{name}.png'), img)


def _fetch_kept(outs):
    """Device FrameOutput (leading dims [...] + track axis T) -> host dict
    of the small fields plus ONLY the kept detections' masks.

    The mask tensor is [..., T, Hp, Wp] at full track capacity — pulling it
    to host wholesale moves GBs per chunk through the (possibly remote)
    device link and was the e2e bottleneck; instead gather the kept slots
    on device (one dispatch) and transfer just those.
    Returns (small: field->np.ndarray, keep_idx: tuple of index arrays,
    kept_masks: [N, Hp, Wp] float32 aligned with keep_idx order).
    """
    import jax.numpy as jnp
    import numpy as np
    small = {f: np.asarray(getattr(outs, f))
             for f in outs._fields if f != 'mask'}
    keep_idx = np.nonzero(small['keep'])
    n = keep_idx[0].size
    if n:
        # pad the gather to a power-of-two bucket: the compiled program is
        # shaped by N, and an unpadded gather would recompile per distinct
        # keep count
        n_pad = 1 << (n - 1).bit_length()
        idxs = tuple(jnp.asarray(np.concatenate(
            [i, np.zeros(n_pad - n, i.dtype)])) for i in keep_idx)
        kept = np.asarray(outs.mask[idxs])[:n]
    else:
        kept = np.zeros((0,) + tuple(outs.mask.shape[-2:]), np.float32)
    return small, keep_idx, kept


def _compact_frame(small, keep_idx, kept_masks, lead=()):
    """Per-frame compacted FrameOutput (keep all-True) for postprocess:
    ``lead`` selects the (step, lane) of batched outputs, () = sequential."""
    import numpy as np
    from stmask_tpu.inference.tracker import FrameOutput
    if keep_idx[0].size:
        sel = np.ones(keep_idx[0].shape, bool)
        for axis, want in enumerate(lead):
            sel &= keep_idx[axis] == want
    else:
        sel = np.zeros(0, bool)
    slots = keep_idx[-1][sel]
    pick = lambda f: small[f][lead][slots]  # noqa: E731
    return FrameOutput(box=pick('box'), score=pick('score'),
                       cls=pick('cls'), mask=kept_masks[sel],
                       obj_id=pick('obj_id'),
                       keep=np.ones(len(slots), bool))


def evaluate_dataset_batched(args, cfg, model, params):
    """Throughput eval: B lockstep video streams x K-frame chunks.

    Results are identical to sequential eval (tracking state is per-lane);
    a lane picks up the next video as soon as its current one ends, with
    ``is_first`` resetting the tracker mid-chunk.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor
    from stmask_tpu.data import YTVISDataset, load_image_rgb
    from stmask_tpu.data.transforms import preprocess_frame_u8
    from stmask_tpu.inference import (build_video_step_batched, cast_params,
                                      postprocess_frame,
                                      results2json_videoseg)

    b = args.batch_videos
    k = args.chunk_frames
    if getattr(args, 'coco', False):
        from stmask_tpu.data.coco import COCOAsVideos, COCODataset
        dataset = COCOAsVideos(COCODataset(
            args.ann_file, args.img_prefix,
            has_annotations=args.eval_metrics))
    else:
        dataset = YTVISDataset(args.ann_file, args.img_prefix,
                               has_annotations=args.eval_metrics)
    if args.bf16:
        params = cast_params(params, jnp.bfloat16)
    # uint8 upload + on-device normalize/pad: 4x less host->device traffic
    video_chunk, make_states = build_video_step_batched(cfg, model, b, k,
                                                        uint8_input=True)
    states = make_states(
        feat_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    vids = dataset.video_ids()
    vids = vids[jax.process_index()::jax.process_count()]
    if args.max_videos > 0:
        vids = vids[:args.max_videos]
    queue = list(vids)
    lanes = [None] * b          # (vid, next_frame, n_frames) or None
    pool = ThreadPoolExecutor(16)

    def next_chunk():
        """Assemble [K, B] uint8 frames + flags + metas; None = inactive."""
        frames = np.zeros((k, b, cfg.img_h, cfg.img_w, 3), np.uint8)
        first = np.zeros((k, b), bool)
        metas = [[None] * b for _ in range(k)]
        jobs = {}
        any_active = False
        for step in range(k):
            for lane in range(b):
                if lanes[lane] is None or lanes[lane][1] >= lanes[lane][2]:
                    if queue:
                        vid = queue.pop(0)
                        lanes[lane] = [vid, 0, dataset.num_frames(vid)]
                    else:
                        lanes[lane] = None
                        continue
                vid, f, nf = lanes[lane]
                jobs[(step, lane)] = pool.submit(
                    load_image_rgb, dataset.frame_path(vid, f))
                first[step, lane] = f == 0
                metas[step][lane] = {'video_id': vid, 'frame_id': f}
                lanes[lane][1] += 1
                any_active = True
        for (step, lane), fut in jobs.items():
            pre = preprocess_frame_u8(cfg, fut.result())
            frames[step, lane] = pre['image']
            metas[step][lane].update(img_shape=pre['img_shape'],
                                     pad_shape=pre['pad_shape'])
        if not any_active:
            return None
        # start the host->device copy now — next_chunk runs while the
        # previous dispatch is still computing, so the upload overlaps it
        return jax.device_put(frames), jnp.asarray(first), metas

    # compile outside the timed region (cold TPU compiles dominate).
    # NOTE: video_chunk donates its state arg, so keep the returned states
    # (every video's first frame carries is_first=True, which resets the
    # per-lane tracker, so the warmup leaves no trace in results).
    states, warm = video_chunk(
        params, states,
        jnp.zeros((k, b, cfg.img_h, cfg.img_w, 3), jnp.uint8),
        jnp.zeros((k, b), bool))
    # true sync: through the remote-tunnel client block_until_ready
    # returns before execution finishes; only a value fetch waits
    float(jnp.sum(warm.box))

    def drain(outs, metas):
        """Fetch one chunk's kept outputs and postprocess (threads: cv2 and
        the C++ RLE codec release the GIL)."""
        small, keep_idx, kept_masks = _fetch_kept(outs)
        todo = []
        for step in range(k):
            for lane in range(b):
                meta = metas[step][lane]
                if meta is None:
                    continue
                todo.append((_compact_frame(small, keep_idx, kept_masks,
                                            lead=(step, lane)), meta))
        per_frame.extend(pool.map(
            lambda fm: postprocess_frame(
                cfg, fm[0], fm[1], score_threshold=args.score_threshold),
            todo))
        return len(todo)

    # Pipeline with depth 2: the (latency-heavy, on remote-attached
    # devices) output fetch of chunk N overlaps the upload + compute of
    # chunk N+1 — dispatches never wait on host postprocessing.
    from collections import deque
    t0 = time.perf_counter()
    n_frames = 0
    device_s = 0.0
    per_frame = []
    pending = deque()
    chunk = next_chunk()
    while chunk is not None or pending:
        if chunk is not None and (len(pending) < 2 or args.time_device):
            frames, first, metas = chunk
            td = time.perf_counter()
            states, outs = video_chunk(params, states, frames, first)
            if args.time_device:
                # value fetch = the only real sync through the tunnel;
                # includes one ~30ms round-trip per chunk, so device_fps
                # is a k*b-frame-amortized conservative bound
                float(jnp.sum(outs.box))
                device_s += time.perf_counter() - td
            pending.append((outs, metas))
            chunk = next_chunk()      # overlap host IO with device compute
            if chunk is not None and len(pending) < 2:
                continue
        n_frames += drain(*pending.popleft())

    dt = time.perf_counter() - t0
    fps = {'e2e_fps': n_frames / dt, 'n_frames': n_frames}
    print(f'{n_frames} frames in {dt:.1f}s = {n_frames / dt:.1f} FPS/chip '
          '(end-to-end: decode + preprocess + device + postprocess)')
    if args.time_device and device_s > 0:
        # device dispatches count k*b lanes even when some are inactive
        # at the tail; steady-state chips process k*b frames per dispatch
        fps['device_fps'] = n_frames / device_s
        print(f'device-only: {device_s:.1f}s = {fps["device_fps"]:.1f} FPS')

    # group by video for the JSON writer (it expects video-contiguous order)
    per_frame.sort(key=lambda r: (r['video_id'], r['frame_id']))
    json_results = results2json_videoseg(per_frame, args.mask_det_file)
    print(f'wrote {len(json_results)} tracks to {args.mask_det_file}')
    if args.eval_metrics:
        from stmask_tpu.utils.ytvis_eval import evaluate_ytvis
        if getattr(args, 'coco', False):
            gt = dataset.to_ytvis_gt()
        else:
            with open(args.ann_file) as fh:
                gt = json.load(fh)
        stats = evaluate_ytvis(gt, json_results)
        print(json.dumps(stats, indent=2))
        return dict(stats, **fps)
    return fps


def evaluate_dataset(args, cfg, model, params):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stmask_tpu.data import YTVISDataset, load_image_rgb
    from stmask_tpu.data.transforms import preprocess_frame_u8
    from stmask_tpu.inference import (build_video_step, postprocess_frame,
                                      results2json_videoseg)
    from stmask_tpu.utils.logger import StageTimer

    dataset = YTVISDataset(args.ann_file, args.img_prefix,
                           has_annotations=args.eval_metrics)
    debug = args.display and args.display_lincomb
    debug_fpn = args.display and args.display_fpn_outs
    # uint8 upload + on-device normalize/pad — same transfer regime as the
    # batched driver (commit 19cd398), so --benchmark/--display measure it
    video_step, make_state = build_video_step(cfg, model, debug=debug,
                                              uint8_input=True,
                                              debug_fpn=debug_fpn)

    timer = StageTimer()
    results = []
    vids = dataset.video_ids()
    # shard whole videos across processes (tracking is per-video sequential)
    vids = vids[jax.process_index()::jax.process_count()]
    if args.max_videos > 0:
        vids = vids[:args.max_videos]

    n_frames = 0
    t_start = None
    for vi, vid in enumerate(vids):
        state = make_state()
        nf = dataset.num_frames(vid)
        for f in range(nf):
            with timer.env('load'):
                img = load_image_rgb(dataset.frame_path(vid, f))
                pre = preprocess_frame_u8(cfg, img)
                frame = jnp.asarray(pre['image'])
            with timer.env('step'):
                if debug or debug_fpn:
                    state, out, dbg = video_step(params, state, frame,
                                                 jnp.asarray(f == 0))
                else:
                    state, out = video_step(params, state, frame,
                                            jnp.asarray(f == 0))
            with timer.env('postprocess'):
                # kept-only mask transfer (full bank stays on device)
                out = _compact_frame(*_fetch_kept(out))
                meta = {'video_id': vid, 'frame_id': f,
                        'img_shape': pre['img_shape'],
                        'pad_shape': pre['pad_shape']}
                results.append(postprocess_frame(
                    cfg, out, meta, score_threshold=args.score_threshold))
            if args.display:
                _write_display(args, cfg, pre, out, vid, f)
                if debug:
                    _write_lincomb(args, dbg, vid, f)
                if debug_fpn:
                    _write_fpn_outs(args, dbg, vid, f)
            n_frames += 1
            if args.benchmark and n_frames == 5:
                t_start = time.perf_counter()   # exclude warmup
        print(f'video {vi + 1}/{len(vids)} ({nf} frames) done')
        if args.benchmark and n_frames >= 300:
            break

    if args.benchmark and t_start is not None:
        fps = (n_frames - 5) / (time.perf_counter() - t_start)
        timer.print_stats()
        print(f'FPS: {fps:.2f}')
        return

    out_file = args.mask_det_file
    json_results = results2json_videoseg(results, out_file)
    print(f'wrote {len(json_results)} tracks to {out_file}')

    if args.eval_metrics:
        from stmask_tpu.utils.ytvis_eval import evaluate_ytvis
        with open(args.ann_file) as fh:
            gt = json.load(fh)
        stats = evaluate_ytvis(gt, json_results)
        print(json.dumps(stats, indent=2))
        return stats


def evaluate_video_dir(args, cfg, model, params):
    """Single-video mode: a directory of frames -> overlays + JSON
    (reference evaluate_single / evalimages, eval.py:703-755)."""
    import glob as globmod
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stmask_tpu.data import load_image_rgb
    from stmask_tpu.data.transforms import preprocess_frame_u8
    from stmask_tpu.inference import (build_video_step, postprocess_frame,
                                      results2json_videoseg)

    frames = sorted(sum((globmod.glob(os.path.join(args.video_dir, ext))
                         for ext in ('*.jpg', '*.jpeg', '*.png')), []))
    if not frames:
        print('no frames found in', args.video_dir)
        return
    video_step, make_state = build_video_step(cfg, model, uint8_input=True)
    state = make_state()
    results = []
    for f, path in enumerate(frames):
        img = load_image_rgb(path)
        pre = preprocess_frame_u8(cfg, img)
        state, out = video_step(params, state, jnp.asarray(pre['image']),
                                jnp.asarray(f == 0))
        out = _compact_frame(*_fetch_kept(out))
        meta = {'video_id': 0, 'frame_id': f,
                'img_shape': pre['img_shape'],
                'pad_shape': pre['pad_shape']}
        results.append(postprocess_frame(cfg, out, meta,
                                         args.score_threshold))
        if args.display:
            _write_display(args, cfg, pre, out, 0, f)
    results2json_videoseg(results, args.mask_det_file)
    print(f'processed {len(frames)} frames -> {args.mask_det_file}')


def main(argv=None):
    args = parse_args(argv)

    if args.metrics_only:
        from stmask_tpu.utils.ytvis_eval import evaluate_ytvis
        stats = evaluate_ytvis(args.ann_file, args.mask_det_file)
        print(json.dumps(stats, indent=2))
        if args.tensorboard_dir:
            # reference eval.py:850-852 (only_calc_metrics -> SummaryWriter)
            try:
                from torch.utils.tensorboard import SummaryWriter
            except ImportError:
                print('tensorboard not available; skipping scalar export',
                      file=sys.stderr)
            else:
                writer = SummaryWriter(log_dir=args.tensorboard_dir,
                                       filename_suffix='VIS')
                for name, value in stats.items():
                    writer.add_scalar(f'valid_metrics/{name}', value, 1)
                writer.close()
        return 0

    if args.video_dir is not None:
        cfg, model, params = load_model(args)
        evaluate_video_dir(args, cfg, model, params)
        return 0

    if args.ann_file is None:
        print('need --ann_file (and --img_prefix) for dataset eval',
              file=sys.stderr)
        return 2

    cfg, model, params = load_model(args)
    if args.sequential or args.benchmark or args.display:
        evaluate_dataset(args, cfg, model, params)
    else:
        evaluate_dataset_batched(args, cfg, model, params)
    return 0


if __name__ == '__main__':
    sys.exit(main())
