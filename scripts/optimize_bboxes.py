"""Optimize anchor scales/shapes for best-anchor IoU (scipy minimize).

Equivalent of reference ``scripts/optimize_bboxes.py``: directly optimize
the per-level (kh, kw) anchor shapes to maximize mean best IoU against the
training boxes.

Usage: python scripts/optimize_bboxes.py --ann_file ... [--config ...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cluster_bbox_sizes import collect_boxes, load_whs  # noqa: E402,F401


def mean_best_iou(whs, anchors):
    inter = (np.minimum(whs[:, None, 0], anchors[None, :, 0])
             * np.minimum(whs[:, None, 1], anchors[None, :, 1]))
    union = (whs[:, 0] * whs[:, 1])[:, None] \
        + (anchors[:, 0] * anchors[:, 1])[None, :] - inter
    return (inter / np.maximum(union, 1e-12)).max(1).mean()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ann_file', default=None)
    p.add_argument('--box_file', default=None,
                   help='normalized-wh pickle from augment_bbox.py '
                        '(or [w,h,x,y,bw,bh] rows from save_bboxes.py)')
    p.add_argument('--config', default='STMask_plus_resnet50')
    args = p.parse_args()

    from scipy.optimize import minimize
    from stmask_tpu.config import get_config
    from stmask_tpu.ops.anchors import all_priors

    cfg = get_config(args.config)
    whs = load_whs(args)
    cur = all_priors(cfg)[:, 2:]
    # dedupe anchor shapes
    anchors0 = np.unique(np.round(cur, 5), axis=0)
    print(f'current: {len(anchors0)} unique shapes, '
          f'mean best IoU {mean_best_iou(whs, anchors0):.4f}')

    x0 = np.log(anchors0.reshape(-1))
    res = minimize(lambda x: -mean_best_iou(whs, np.exp(x).reshape(-1, 2)),
                   x0, method='Nelder-Mead',
                   options={'maxiter': 2000, 'xatol': 1e-4})
    best = np.exp(res.x).reshape(-1, 2)
    print(f'optimized mean best IoU {mean_best_iou(whs, best):.4f}')
    for wh in best[np.argsort(best.prod(1))]:
        print(f'  w={wh[0]:.4f} h={wh[1]:.4f}')


if __name__ == '__main__':
    main()
