"""Prototype-expressiveness analysis: how well can the model's prototypes
linearly reconstruct the gt masks?

Equivalent of reference ``scripts/compute_masks.py``: least-squares fit of
coefficients x in ``proto @ x ~= gt`` per object, report the best-achievable
mask IoU (an upper bound on lincomb mask quality for this image), optionally
writing gt-vs-approximation overlays.

Usage:
  python scripts/compute_masks.py --ann_file ... --img_prefix ... \
      [--config STMask_plus_resnet50] [--trained_model ckpt] \
      [--frames 8] [--out_dir results/proto_fit]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit_protos(proto: np.ndarray, gt_masks: np.ndarray):
    """proto [h, w, k], gt_masks [n, h, w] -> (approx [n, h, w] bool,
    ious [n]): least-squares coefficients then 0.5-binarized IoU."""
    h, w, k = proto.shape
    a = proto.reshape(-1, k).astype(np.float64)
    b = gt_masks.reshape(len(gt_masks), -1).T.astype(np.float64)
    x = np.linalg.lstsq(a, b, rcond=None)[0]           # [k, n]
    approx = (a @ x > 0.5).T.reshape(gt_masks.shape)   # [n, h, w]
    gt = gt_masks > 0.5
    inter = (approx & gt).sum(axis=(1, 2))
    union = (approx | gt).sum(axis=(1, 2))
    return approx, inter / np.maximum(union, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ann_file', required=True)
    p.add_argument('--img_prefix', required=True)
    p.add_argument('--config', default='STMask_plus_resnet50')
    p.add_argument('--trained_model', default=None)
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--out_dir', default=None,
                   help='write gt/approx overlay PNGs here')
    p.add_argument('--img_w', type=int, default=None,
                   help='override input width (debug/small-scale runs)')
    p.add_argument('--img_h', type=int, default=None)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()

    if args.cpu:
        import jax as _jax
        _jax.config.update('jax_platforms', 'cpu')

    import jax
    import jax.numpy as jnp

    import eval as eval_script
    from stmask_tpu.data import YTVISDataset, load_image_rgb
    from stmask_tpu.data.transforms import preprocess_frame

    cfg, model, params = eval_script.load_model(args)
    dataset = YTVISDataset(args.ann_file, args.img_prefix,
                           has_annotations=True)

    @jax.jit
    def proto_of(frame):
        preds = model.apply(params, frame[None], train=False)
        return preds['proto'][0]

    done = 0
    all_ious = []
    for vid in dataset.video_ids():
        for f in range(dataset.num_frames(vid)):
            if done >= args.frames:
                break
            annots = dataset.frame_annots(vid, f)
            if not len(annots.boxes):
                continue
            pre = preprocess_frame(cfg, load_image_rgb(
                dataset.frame_path(vid, f)), annots)
            proto = np.asarray(proto_of(jnp.asarray(pre['image'])),
                               np.float32)
            approx, ious = fit_protos(proto, pre['masks_proto'])
            all_ious.extend(ious.tolist())
            print(f'video {vid} frame {f}: best-fit IoUs '
                  f'{sorted((ious * 100).astype(int).tolist(), reverse=True)}')
            if args.out_dir:
                import cv2
                os.makedirs(args.out_dir, exist_ok=True)
                grid = np.concatenate([
                    np.concatenate(list(pre['masks_proto'].astype(
                        np.float32)), axis=1),
                    np.concatenate(list(approx.astype(np.float32)), axis=1),
                ], axis=0)
                cv2.imwrite(os.path.join(args.out_dir,
                                         f'{vid:05d}_{f:04d}.png'),
                            (grid * 255).astype(np.uint8))
            done += 1
        if done >= args.frames:
            break
    if all_ious:
        print(f'mean best-fit IoU over {len(all_ious)} objects: '
              f'{np.mean(all_ious):.3f}')


if __name__ == '__main__':
    main()
