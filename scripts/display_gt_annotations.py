"""Render ground-truth annotation overlays for every frame of a YTVIS set.

Equivalent of reference ``layers/display_gt_annotations.py:13``
(display_gt_ann/display_masks): decode each annotation's mask
(RLE or polygons), alpha-blend per-object colors, draw boxes + class names,
and save one PNG per frame.

Usage:
  python scripts/display_gt_annotations.py --ann_file .../valid.json \
      --img_prefix .../JPEGImages --out_dir results/gt_anno [--max_videos N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ann_file', required=True)
    p.add_argument('--img_prefix', required=True)
    p.add_argument('--out_dir', default='results/gt_anno')
    p.add_argument('--max_videos', type=int, default=-1)
    p.add_argument('--mask_alpha', type=float, default=0.45)
    p.add_argument('--config', default='STMask_plus_resnet50',
                   help='config supplying the class-name table')
    args = p.parse_args()

    import cv2

    from stmask_tpu.config import get_config
    from stmask_tpu.data import YTVISDataset, load_image_rgb
    from stmask_tpu.utils.visualization import draw_detections

    cfg = get_config(args.config)
    dataset = YTVISDataset(args.ann_file, args.img_prefix,
                           has_annotations=True)
    os.makedirs(args.out_dir, exist_ok=True)

    vids = dataset.video_ids()
    if args.max_videos > 0:
        vids = vids[:args.max_videos]
    for vid in vids:
        for f in range(dataset.num_frames(vid)):
            img = load_image_rgb(dataset.frame_path(vid, f))
            ann = dataset.frame_annots(vid, f)
            over = draw_detections(
                img, ann.boxes, ann.labels, None,
                masks=ann.masks.astype(bool) if len(ann.masks) else None,
                obj_ids=ann.ids,
                class_names=cfg.classes, mask_alpha=args.mask_alpha)
            cv2.imwrite(os.path.join(args.out_dir, f'{vid:05d}_{f:04d}.png'),
                        cv2.cvtColor(over, cv2.COLOR_RGB2BGR))
        print(f'video {vid}: {dataset.num_frames(vid)} frames rendered')


if __name__ == '__main__':
    main()
