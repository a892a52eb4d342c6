"""Benchmark: streaming video-inference FPS on one chip.

Measures the full jitted per-frame step (forward + decode + NMS + temporal
shift + tracking) of the flagship config (STMask_plus_resnet50 = R50-DCN-FPN
+ FCA + TF) at the reference input size 360x640 (padded 384x640), matching
the reference benchmark protocol (``eval.py --benchmark``; baseline 29.3 FPS
on a RTX 2080 Ti, README.md:102).

``--e2e`` instead benchmarks the full batched eval driver on an on-disk
synthetic JPEG video set — decode + preprocess + device + postprocess + RLE
(what the reference's ``eval.py --benchmark`` walltime actually covered).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 29.3
WARMUP = 5
FRAMES = 200


CHUNK = 10      # frames per dispatch (lax.scan)
N_VIDEOS = 1    # independent video streams stepped in lockstep


def main():
    from stmask_tpu.config import get_config
    from stmask_tpu.inference import build_video_step_batched, cast_params
    from stmask_tpu.models import STMask

    cfg = get_config('STMask_plus_resnet50')
    model = STMask(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(rng, x0, train=False)
    # production serving dtype: bf16 convs, fp32 decode/NMS/tracking
    params = cast_params(params, jnp.bfloat16)

    # Dataset-eval throughput layout: tracking is sequential per video but
    # videos are independent, so N_VIDEOS streams run in lockstep and the
    # metric is aggregate frames/s per chip (results identical to
    # sequential eval).
    video_chunk, make_states = build_video_step_batched(cfg, model,
                                                        N_VIDEOS, CHUNK)
    states = make_states(feat_dtype=jnp.bfloat16)

    frames = jnp.asarray(np.random.RandomState(0)
                         .randn(CHUNK, N_VIDEOS, cfg.pad_h, cfg.pad_w, 3)
                         .astype(np.float32))
    first = jnp.zeros((CHUNK, N_VIDEOS), bool).at[0].set(True)
    not_first = jnp.zeros((CHUNK, N_VIDEOS), bool)

    # warmup / compile
    for i in range(WARMUP):
        states, out = video_chunk(params, states, frames,
                                  first if i == 0 else not_first)
    jax.block_until_ready(out.box)

    n_chunks = max(1, FRAMES // CHUNK)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        states, out = video_chunk(params, states, frames, not_first)
    jax.block_until_ready(out.box)
    dt = time.perf_counter() - t0

    fps = n_chunks * CHUNK * N_VIDEOS / dt
    print(json.dumps({
        'metric': 'ytvis2019_stream_fps_per_chip_r50dcn_fca_tf_360x640',
        'value': round(fps, 2),
        'unit': 'frames/s',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


def main_e2e(batch_videos: int, chunk_frames: int = 10,
             n_videos: int = 16, n_frames: int = 32,
             trained_model: str | None = None):
    """End-to-end eval-driver FPS on an on-disk synthetic video set
    (JPEG decode -> preprocess -> device step -> postprocess -> RLE).

    Pass ``trained_model`` (e.g. the checkpoint from
    ``scripts/overfit_sanity.py --save_ckpt``) for realistic per-frame
    detection counts — random weights keep dozens of junk tracks per frame
    and overstate the postprocess/transfer cost.
    """
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'scripts'))
    import eval as eval_script
    from overfit_sanity import make_dataset

    root = f'/tmp/stmask_bench_videos_{n_videos}x{n_frames}'
    ann_file = os.path.join(root, 'train.json')
    if not os.path.exists(ann_file):
        make_dataset(root, n_videos=n_videos, n_frames=n_frames,
                     h=360, w=640)
    argv = [
        '--ann_file', ann_file, '--img_prefix', os.path.join(root, 'imgs'),
        '--batch_videos', str(batch_videos),
        '--chunk_frames', str(chunk_frames),
        '--mask_det_file', '/tmp/stmask_bench_results.json']
    if trained_model:
        argv += ['--trained_model', trained_model,
                 '--config', 'STMask_plus_resnet50']
    args = eval_script.parse_args(argv)
    cfg, model, params = eval_script.load_model(args)
    stats = eval_script.evaluate_dataset_batched(args, cfg, model, params)
    fps = stats['e2e_fps']
    print(json.dumps({
        'metric': f'ytvis2019_e2e_fps_per_chip_b{batch_videos}_360x640',
        'value': round(fps, 2),
        'unit': 'frames/s',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--e2e', action='store_true',
                   help='benchmark the batched eval driver end-to-end '
                        '(host IO included) instead of the device step')
    p.add_argument('--batch_videos', type=int, default=8)
    p.add_argument('--trained_model', default=None,
                   help='checkpoint for --e2e (realistic detection counts)')
    a = p.parse_args()
    if a.e2e:
        main_e2e(a.batch_videos, trained_model=a.trained_model)
    else:
        main()
