"""Dump every training bbox (with its image size) to a pickle.

Equivalent of reference ``scripts/save_bboxes.py``: rows of
``[img_w, img_h, x, y, w, h]`` (COCO xywh), consumed by
``augment_bbox.py`` and the anchor-design scripts. Works on both COCO
image jsons and YTVIS video jsons (every frame's box becomes a row).

Usage: python scripts/save_bboxes.py --ann_file ... --out weights/bboxes.pkl
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_rows(ann_file):
    with open(ann_file) as f:
        data = json.load(f)
    rows = []
    if 'videos' in data:
        sizes = {v['id']: (v['width'], v['height']) for v in data['videos']}
        for ann in data.get('annotations', []):
            w, h = sizes[ann['video_id']]
            for bb in ann.get('bboxes') or []:
                if bb is not None:
                    rows.append([w, h] + list(bb))
    else:
        sizes = {im['id']: (im['width'], im['height'])
                 for im in data['images']}
        for ann in data.get('annotations', []):
            if 'bbox' in ann:
                w, h = sizes[ann['image_id']]
                rows.append([w, h] + list(ann['bbox']))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ann_file', required=True)
    p.add_argument('--out', default='weights/bboxes.pkl')
    args = p.parse_args()
    rows = collect_rows(args.ann_file)
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'wb') as f:
        pickle.dump(rows, f)
    print(f'saved {len(rows)} boxes to {args.out}')


if __name__ == '__main__':
    main()
