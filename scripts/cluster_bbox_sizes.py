"""Offline anchor design: k-means over training box sizes.

Equivalent of reference ``scripts/cluster_bbox_sizes.py``: cluster gt box
(w, h) (normalized) to propose anchor scales/shapes for the FCA head.

Usage: python scripts/cluster_bbox_sizes.py --ann_file .../train.json -k 9
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_boxes(ann_file):
    with open(ann_file) as f:
        data = json.load(f)
    sizes = {v['id']: (v['height'], v['width']) for v in data['videos']} \
        if 'videos' in data else \
        {im['id']: (im['height'], im['width']) for im in data['images']}
    whs = []
    for ann in data.get('annotations', []):
        key = ann.get('video_id', ann.get('image_id'))
        h, w = sizes[key]
        bboxes = ann.get('bboxes') or [ann.get('bbox')]
        for bb in bboxes:
            if bb is None:
                continue
            whs.append((bb[2] / w, bb[3] / h))
    return np.asarray(whs, np.float64)


def load_whs(args):
    """Box (w, h) source: --ann_file json, or --box_file pickle (either the
    normalized xyxy output of augment_bbox.py or save_bboxes.py rows)."""
    if args.box_file:
        import pickle
        with open(args.box_file, 'rb') as f:
            rows = np.asarray(pickle.load(f), np.float64)
        if rows.shape[1] == 4:        # augmented normalized xyxy
            return np.stack([rows[:, 2] - rows[:, 0],
                             rows[:, 3] - rows[:, 1]], axis=1)
        return np.stack([rows[:, 4] / rows[:, 0],
                         rows[:, 5] / rows[:, 1]], axis=1)
    if not args.ann_file:
        raise SystemExit('need --ann_file or --box_file')
    return collect_boxes(args.ann_file)


def kmeans_iou(whs, k, iters=100, seed=0):
    """k-means with 1 - IoU distance (standard YOLO anchor clustering)."""
    rng = np.random.RandomState(seed)
    centers = whs[rng.choice(len(whs), k, replace=False)]

    def iou(whs, centers):
        inter = (np.minimum(whs[:, None, 0], centers[None, :, 0])
                 * np.minimum(whs[:, None, 1], centers[None, :, 1]))
        union = (whs[:, None, 0] * whs[:, None, 1]
                 + centers[None, :, 0] * centers[None, :, 1] - inter)
        return inter / np.maximum(union, 1e-12)

    for _ in range(iters):
        assign = np.argmax(iou(whs, centers), axis=1)
        new = np.stack([whs[assign == i].mean(0) if np.any(assign == i)
                        else centers[i] for i in range(k)])
        if np.allclose(new, centers):
            break
        centers = new
    mean_iou = iou(whs, centers).max(1).mean()
    return centers, mean_iou


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ann_file', default=None)
    p.add_argument('--box_file', default=None,
                   help='normalized-wh pickle from augment_bbox.py '
                        '(or [w,h,x,y,bw,bh] rows from save_bboxes.py)')
    p.add_argument('-k', type=int, default=9)
    args = p.parse_args()
    whs = load_whs(args)
    print(f'{len(whs)} boxes')
    centers, mean_iou = kmeans_iou(whs, args.k)
    order = np.argsort(centers.prod(1))
    print(f'mean best-anchor IoU: {mean_iou:.4f}')
    for wh in centers[order]:
        ar = wh[0] / wh[1]
        print(f'  w={wh[0]:.4f} h={wh[1]:.4f} area={np.sqrt(wh.prod()):.4f} '
              f'ar={ar:.3f}')


if __name__ == '__main__':
    main()
