"""Measure the training-time DCN window-clamp clip rate (VERDICT r4 #2).

The training path clamps backbone DCN offsets to ±dcn_window_radius cells
(``deform_conv2d_window``; the reference's DCNv2 is unclamped,
``/root/reference/backbone.py:20-26``), while eval uses the exact gather.
This script quantifies the train/eval geometry gap: per DCN site, the
fraction of offset components with |offset| > radius, plus max and p99.

Round-5 update: FCB FeatureAlign now ALSO trains through the window
formulation (``cfg.fcb_window_radius``, default 3 — the exact gather's
scatter adjoint cost ~70x, see PARITY.md); this script therefore reports
both the backbone ``dcn_offsets`` sites (vs ``dcn_window_radius``) and
the FCB ``fcb_offsets`` sites (vs ``fcb_window_radius``).

Weight sources:
  --ckpt <orbax dir>   trained params (overfit_sanity.py --save_ckpt)
  --mirror             converted random torch-mirror weights (a torch init)
  (neither)            flax init (zero offsets — sanity floor)

Inputs are real frames from the synthetic overfit dataset (the data the
checkpoints were trained on).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='STMask_plus_resnet50')
    p.add_argument('--ckpt', default=None)
    p.add_argument('--mirror', action='store_true')
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--batches', type=int, default=2)
    p.add_argument('--data', default='/tmp/overfit_sanity',
                   help='overfit dataset root (created if missing)')
    args = p.parse_args()

    if args.cpu:
        import jax as _jax
        _jax.config.update('jax_platforms', 'cpu')

    import jax
    import jax.numpy as jnp
    from stmask_tpu.config import get_config
    from stmask_tpu.data import ClipLoader, YTVISDataset
    from stmask_tpu.models import STMask

    cfg = get_config(args.config)
    radius = cfg.backbone.dcn_window_radius
    model = STMask(cfg)
    x0 = jnp.zeros((1, 2, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=True)

    source = 'init'
    if args.ckpt:
        import orbax.checkpoint as ocp
        # overfit_sanity --save_ckpt stores the full variables dict
        # (with the 'params' wrapper)
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.ckpt), params)
        source = args.ckpt
    elif args.mirror:
        import torch
        from stmask_tpu.convert import convert_state_dict, merge_params
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), 'tests'))
        from torch_mirror import TSTMask, NaiveDCNv2
        torch.manual_seed(0)
        kw = dict(dcn_layers=(0, 4, 6, 3), dcn_interval=2)
        if 'base' in args.config:
            kw = dict(layers=(3, 4, 23, 3), dcn_layers=(0, 4, 23, 3),
                      dcn_interval=3)
        t = TSTMask(num_classes=cfg.num_classes, **kw)
        # torch-style random init for the offset predictor (the reference
        # zero-inits it; randomize to probe a worst-case torch init)
        for m in t.modules():
            if isinstance(m, NaiveDCNv2):
                with torch.no_grad():
                    m.conv_offset_mask.weight.normal_(std=0.01)
                    m.conv_offset_mask.bias.normal_(std=0.5)
        params = merge_params(params,
                              convert_state_dict(t.mirror_state_dict())[
                                  'params'])
        source = 'torch-mirror-random'

    ann = os.path.join(args.data, 'train.json')
    if not os.path.exists(ann):
        from overfit_sanity import make_dataset
        make_dataset(args.data)
    ds = YTVISDataset(ann, os.path.join(args.data, 'imgs'))
    loader = ClipLoader(cfg, ds, batch_size=2, num_workers=4)

    @jax.jit
    def capture(params, images):
        b, nf, h, w, _ = images.shape
        _, inter = model.apply(params, images, train=True,
                               mutable=['intermediates'])
        return inter

    stats = {}
    n_done = 0
    for batch in loader.epoch(0):
        if n_done >= args.batches:
            break
        inter = capture(params, jnp.asarray(batch['images']))
        flat = jax.tree_util.tree_leaves_with_path(inter)
        for path, leaf in flat:
            names = [str(getattr(k, 'key', k)) for k in path]
            if 'dcn_offsets' in names:
                site = '/'.join(n for n in names
                                if n.startswith('layer') or n == 'conv2')
                r_site = radius
            elif 'fcb_offsets' in names:
                site = '/'.join(n for n in names if '_align_' in n)
                r_site = cfg.fcb_window_radius
            else:
                continue
            off = np.abs(np.asarray(leaf, np.float32))
            s = stats.setdefault(site, {'n': 0, 'clipped': 0,
                                        'max': 0.0, 'vals': [],
                                        'radius': r_site})
            s['n'] += off.size
            s['clipped'] += int((off > r_site).sum())
            s['max'] = max(s['max'], float(off.max()))
            s['vals'].append(np.percentile(off, 99))
        n_done += 1

    rows = []
    print(f'# config={args.config} radius={radius} source={source}')
    print(f'{"site":28s} {"clip%":>8s} {"max|off|":>9s} {"p99":>7s}')
    for site in sorted(stats):
        s = stats[site]
        rate = 100.0 * s['clipped'] / max(s['n'], 1)
        p99 = float(np.mean(s['vals']))
        print(f'{site:28s} {rate:8.4f} {s["max"]:9.3f} {p99:7.3f}')
        rows.append({'site': site, 'clip_pct': round(rate, 4),
                     'max_abs': round(s['max'], 3),
                     'p99': round(p99, 3),
                     'radius': s['radius']})
    worst = max((r['clip_pct'] for r in rows), default=0.0)
    print(json.dumps({'config': args.config, 'radius': radius,
                      'source': source, 'worst_clip_pct': worst,
                      'sites': rows}))


if __name__ == '__main__':
    main()
