"""Measure anchor recall of a config's priors against a dataset's gt boxes.

Equivalent of reference ``scripts/bbox_recall.py``: what fraction of gt
boxes have at least one prior above the positive IoU threshold.

Usage: python scripts/bbox_recall.py --ann_file ... --config STMask_plus_resnet50
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cluster_bbox_sizes import collect_boxes  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ann_file', required=True)
    p.add_argument('--config', default='STMask_plus_resnet50')
    p.add_argument('--thresh', type=float, default=0.5)
    args = p.parse_args()

    from stmask_tpu.config import get_config
    from stmask_tpu.ops.anchors import all_priors

    cfg = get_config(args.config)
    priors = all_priors(cfg)                       # [P, 4] cxcywh
    pw, ph = priors[:, 2], priors[:, 3]

    whs = collect_boxes(args.ann_file)             # [N, 2] normalized
    # size-only IoU (location-aligned best case, like the reference script)
    inter = (np.minimum(whs[:, None, 0], pw[None, :])
             * np.minimum(whs[:, None, 1], ph[None, :]))
    union = (whs[:, 0] * whs[:, 1])[:, None] + (pw * ph)[None, :] - inter
    iou = inter / np.maximum(union, 1e-12)
    best = iou.max(1)
    print(f'{len(whs)} gt boxes, {len(priors)} priors')
    for t in (0.3, 0.5, 0.7):
        print(f'recall@{t}: {(best >= t).mean():.4f}')
    print(f'mean best IoU: {best.mean():.4f}')


if __name__ == '__main__':
    main()
