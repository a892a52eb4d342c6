#!/usr/bin/env python
"""Turnkey real-data mAP parity runbook.

One command between "the released checkpoint + YTVIS data arrive" and
"a parity number against BASELINE.md":

    python scripts/parity_run.py \
        --pth STMask_plus_resnet50.pth \
        --ann_file .../valid.json --img_prefix .../valid/JPEGImages

It (1) converts / loads the checkpoint (torch ``.pth`` via
``stmask_tpu/convert.py`` or an orbax dir), (2) runs the batched eval
driver twice — cross-class fast NMS (the reference's mAP protocol) and
per-class fast NMS (mAP*) — writing both results JSONs, (3) if the
annotation file has annotations, scores both with the self-contained
YTVIS evaluator, and (4) prints a table diffed against the BASELINE.md
row for the config (reference protocol: README.md:95-107 — mAP = cc
fast NMS, mAP* = per-class fast NMS; load path STMask.py:127-188).

Note: the official YTVIS2019 `valid` split has no public annotations —
point --ann_file at a held-out annotated split (e.g. train_sub/valid_sub)
or submit the written JSONs to the eval server.  Dry-runnable end-to-end
on the synthetic overfit set:

    python scripts/overfit_sanity.py --steps 400 --save_ckpt /tmp/ck
    python scripts/parity_run.py --trained_model /tmp/ck --dryrun
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BASELINE.md rows keyed by config name: (mask mAP [cc], mAP* [per-class])
BASELINE_ROWS = {
    'STMask_plus_resnet50': (32.6, 33.4),
    'STMask_plus_resnet50_ali': (None, 32.1),
    'STMask_plus_resnet50_ada': (32.8, 33.0),
    'STMask_plus_base': (36.0, 36.3),
    'STMask_plus_base_ali': (36.3, 37.1),
    'STMask_plus_base_ada': (36.8, 37.9),
    'STMask_plus_resnet50_YTVIS2021': (None, 30.6),
    'STMask_plus_resnet50_ada_YTVIS2021': (None, 31.1),
    'STMask_plus_base_YTVIS2021': (None, 33.7),
    'STMask_plus_base_ada_YTVIS2021': (None, 34.6),
    'STMask_plus_resnet50_OVIS': (None, 15.4),
    'STMask_plus_resnet50_ada_OVIS': (None, 15.4),
    'STMask_plus_base_OVIS': (None, 17.3),
    'STMask_plus_base_ada_OVIS': (None, 15.8),
}


def run_eval(args, nms, out_json):
    import eval as eval_script
    argv = ['--ann_file', args.ann_file, '--img_prefix', args.img_prefix,
            '--mask_det_file', out_json, '--nms', nms,
            '--batch_videos', str(args.batch_videos)]
    if args.trained_model:
        argv += ['--trained_model', args.trained_model]
    if args.config:
        argv += ['--config', args.config]
    if args.max_videos > 0:
        argv += ['--max_videos', str(args.max_videos)]
    if args.eval_metrics:
        argv += ['--eval_metrics']
    if args.fp32:
        argv += ['--fp32']
    if args.img_w:
        argv += ['--img_w', str(args.img_w)]
    if args.img_h:
        argv += ['--img_h', str(args.img_h)]
    ea = eval_script.parse_args(argv)
    cfg, model, params = eval_script.load_model(ea)
    stats = eval_script.evaluate_dataset_batched(ea, cfg, model, params)
    return cfg, (stats or {})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pth', default=None,
                    help='released torch checkpoint (.pth); converted on '
                         'the fly, config inferred from the filename')
    ap.add_argument('--trained_model', default=None,
                    help='alternative: orbax checkpoint dir')
    ap.add_argument('--config', default=None)
    ap.add_argument('--ann_file', default=None)
    ap.add_argument('--img_prefix', default=None)
    ap.add_argument('--out_dir', default='results/parity')
    ap.add_argument('--max_videos', type=int, default=-1)
    ap.add_argument('--batch_videos', type=int, default=8)
    ap.add_argument('--fp32', action='store_true',
                    help='fp32 forward (default bf16; use for strictest '
                         'numerical parity runs)')
    ap.add_argument('--no_metrics', dest='eval_metrics',
                    action='store_false', default=True,
                    help="only write the results JSONs (e.g. for the "
                         "YTVIS eval server's unannotated valid split)")
    ap.add_argument('--with_greedy', action='store_true',
                    help='add a third pass with exact sequential greedy '
                         'NMS (Cython-parity semantics) — the strictest '
                         'suppression protocol; no published baseline '
                         'column, reported for completeness')
    ap.add_argument('--dryrun', action='store_true',
                    help='run on the synthetic overfit dataset (no real '
                         'data needed; exercises the whole runbook)')
    ap.add_argument('--img_w', type=int, default=None,
                    help='input-size override (small-scale dryruns)')
    ap.add_argument('--img_h', type=int, default=None)
    args = ap.parse_args()

    if args.pth:
        args.trained_model = args.pth

    if args.dryrun and not args.ann_file:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from overfit_sanity import make_dataset
        h, w = args.img_h or 360, args.img_w or 640
        root = f'/tmp/stmask_parity_dryrun_{h}x{w}'
        if not os.path.exists(os.path.join(root, 'train.json')):
            make_dataset(root, n_videos=4, n_frames=8, h=h, w=w)
        args.ann_file = os.path.join(root, 'train.json')
        args.img_prefix = os.path.join(root, 'imgs')
    if not args.ann_file or not args.img_prefix:
        print('need --ann_file and --img_prefix (or --dryrun)',
              file=sys.stderr)
        return 2

    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    cfg = None
    passes = [('mAP', 'cc'), ('mAP*', 'per_class')]
    if args.with_greedy:
        passes.append(('mAP(g)', 'greedy'))
    for label, nms in passes:
        out_json = os.path.join(args.out_dir, f'results_{nms}.json')
        print(f'=== eval with {nms} fast NMS -> {out_json}', flush=True)
        cfg, stats = run_eval(args, nms, out_json)
        rows.append((label, nms, out_json,
                     stats.get('mAP', stats.get('AP'))))

    base = BASELINE_ROWS.get(cfg.name if cfg else '', (None, None))
    base = tuple(base) + (None,) * (len(rows) - len(base))
    print()
    print(f'config: {cfg.name}')
    print(f'{"metric":8s} {"nms":10s} {"measured":>9s} {"baseline":>9s} '
          f'{"diff":>7s}  results')
    summary = {}
    for (label, nms, out_json, measured), expect in zip(rows, base):
        m = f'{100 * measured:.1f}' if measured is not None else 'n/a'
        b = f'{expect:.1f}' if expect is not None else 'n/a'
        d = (f'{100 * measured - expect:+.1f}'
             if measured is not None and expect is not None else '')
        print(f'{label:8s} {nms:10s} {m:>9s} {b:>9s} {d:>7s}  {out_json}')
        summary[label] = {
            # both in mAP percentage points (the BASELINE.md unit)
            'measured': None if measured is None else round(
                100 * measured, 2),
            'baseline': expect, 'nms': nms, 'results': out_json}
    with open(os.path.join(args.out_dir, 'parity_summary.json'), 'w') as fh:
        json.dump({'config': cfg.name, 'rows': summary}, fh, indent=2)
    print(f"summary -> {os.path.join(args.out_dir, 'parity_summary.json')}")
    return 0


if __name__ == '__main__':
    sys.exit(main())
