"""Simulate the training augmentation pipeline on saved boxes.

Equivalent of reference ``scripts/augment_bbox.py``: push every saved box
through the geometric part of the SSD augmentation chain (Expand ->
RandomSampleCrop -> RandomMirror -> Resize -> ToPercentCoords) WITHOUT
touching pixels, producing the normalized box distribution the anchors
actually see during training — input for ``cluster_bbox_sizes.py`` /
``optimize_bboxes.py`` via their ``--box_file`` option.

Usage:
  python scripts/augment_bbox.py --box_file weights/bboxes.pkl \
      --out weights/bboxes_aug.pkl [--img_size 550] [--seed 0]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (min_iou, max_iou) crop modes of the SSD chain; None = keep whole image
SAMPLE_OPTIONS = (None, (0.1, None), (0.3, None), (0.7, None), (0.9, None),
                  (None, None))


def _iou_one(boxes, rect):
    ix = (np.minimum(boxes[:, 2], rect[2]) - np.maximum(boxes[:, 0], rect[0]))
    iy = (np.minimum(boxes[:, 3], rect[3]) - np.maximum(boxes[:, 1], rect[1]))
    inter = np.clip(ix, 0, None) * np.clip(iy, 0, None)
    area_a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    area_b = (rect[2] - rect[0]) * (rect[3] - rect[1])
    return inter / np.maximum(area_a + area_b - inter, 1e-12)


def random_sample_crop(h, w, boxes, rng):
    """Geometric RandomSampleCrop (reference augment_bbox.py / SSD):
    pick a crop window whose IoU with the boxes satisfies the sampled mode
    and that contains at least one box center; clip kept boxes to it."""
    while True:
        mode = SAMPLE_OPTIONS[rng.randint(len(SAMPLE_OPTIONS))]
        if mode is None:
            return h, w, boxes
        min_iou = mode[0] if mode[0] is not None else -np.inf
        max_iou = mode[1] if mode[1] is not None else np.inf
        for _ in range(50):
            cw = rng.uniform(0.3 * w, w)
            ch = rng.uniform(0.3 * h, h)
            if ch / cw < 0.5 or ch / cw > 2:
                continue
            left = rng.uniform(0, w - cw)
            top = rng.uniform(0, h - ch)
            rect = np.array([int(left), int(top),
                             int(left + cw), int(top + ch)], np.float32)
            overlap = _iou_one(boxes, rect)
            if overlap.min() < min_iou and max_iou < overlap.max():
                continue
            centers = (boxes[:, :2] + boxes[:, 2:]) / 2
            keep = ((rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1])
                    & (rect[2] > centers[:, 0]) & (rect[3] > centers[:, 1]))
            if not keep.any():
                continue
            kept = boxes[keep].copy()
            kept[:, :2] = np.maximum(kept[:, :2], rect[:2]) - rect[:2]
            kept[:, 2:] = np.minimum(kept[:, 2:], rect[2:]) - rect[:2]
            return ch, cw, kept


def augment_row(row, img_size, rng):
    """One ``[img_w, img_h, x, y, w, h]`` row -> normalized xyxy boxes
    after Expand/Crop/Mirror/Resize (may keep 0 or 1 boxes)."""
    w, h = float(row[0]), float(row[1])
    boxes = np.array([row[2:]], np.float32)
    boxes[:, 2:] += boxes[:, :2]                        # to point form

    ratio = rng.uniform(1, 4)                           # Expand
    left = rng.uniform(0, w * ratio - w)
    top = rng.uniform(0, h * ratio - h)
    boxes[:, 0::2] += int(left)
    boxes[:, 1::2] += int(top)
    h, w = h * ratio, w * ratio

    h, w, boxes = random_sample_crop(h, w, boxes, rng)

    if rng.randint(2):                                  # RandomMirror
        boxes[:, 0::2] = w - boxes[:, 2::-2]

    boxes[:, 0::2] *= img_size / w                      # Resize
    boxes[:, 1::2] *= img_size / h
    return boxes / img_size                             # ToPercentCoords


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--box_file', default='weights/bboxes.pkl')
    p.add_argument('--out', default='weights/bboxes_aug.pkl')
    p.add_argument('--img_size', type=int, default=550)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    with open(args.box_file, 'rb') as f:
        rows = pickle.load(f)
    rng = np.random.RandomState(args.seed)
    out = []
    for i, row in enumerate(rows):
        out.append(augment_row(row, args.img_size, rng))
        if i % 50000 == 0:
            print(f'Current idx: {i}')
    out = np.concatenate(out, axis=0)
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'wb') as f:
        pickle.dump(out, f)
    print(f'saved {len(out)} augmented boxes to {args.out}')


if __name__ == '__main__':
    main()
