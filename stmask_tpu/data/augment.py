"""Extra training augmentations (host-side numpy).

Equivalent of reference ``datasets/extra_aug.py``: photometric distortion
(brightness / contrast / HSV saturation+hue / channel swap), Expand
(zoom-out with mean fill, resized back), and IoU-constrained RandomCrop —
applied jointly to image, boxes, labels, masks, and ids.  Off by default
(the STMask dataset presets leave ``extra_aug`` None), but available for
the COCO-style image training path.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _pairwise_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


class PhotoMetricDistortion:
    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, img, boxes, labels, masks, ids, rng=None):
        rng = rng or np.random
        img = img.astype(np.float32)
        if rng.randint(2):
            img = img + rng.uniform(-self.brightness_delta,
                                    self.brightness_delta)
        mode = rng.randint(2)
        if mode == 1 and rng.randint(2):
            img = img * rng.uniform(*self.contrast_range)

        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_RGB2HSV).astype(np.float32)
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(*self.saturation_range)
        if rng.randint(2):
            # cv2 hue range is [0, 180)
            hsv[..., 0] += rng.uniform(-self.hue_delta, self.hue_delta) / 2
            hsv[..., 0] = np.mod(hsv[..., 0], 180)
        hsv[..., 1:] = np.clip(hsv[..., 1:], 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8),
                           cv2.COLOR_HSV2RGB).astype(np.float32)

        if mode == 0 and rng.randint(2):
            img = img * rng.uniform(*self.contrast_range)
        if rng.randint(2):
            img = img[..., rng.permutation(3)]
        return img, boxes, labels, masks, ids


class Expand:
    def __init__(self, mean=(123.675, 116.28, 103.53),
                 ratio_range=(1, 4)):
        self.mean = mean
        self.ratio_range = ratio_range

    def __call__(self, img, boxes, labels, masks, ids, rng=None):
        rng = rng or np.random
        if rng.randint(2):
            return img, boxes, labels, masks, ids
        h, w, c = img.shape
        ratio = rng.uniform(*self.ratio_range)
        eh, ew = int(h * ratio), int(w * ratio)
        canvas = np.full((eh, ew, c), self.mean, img.dtype)
        left = int(rng.uniform(0, ew - w))
        top = int(rng.uniform(0, eh - h))
        canvas[top:top + h, left:left + w] = img
        img = cv2.resize(canvas, (w, h), interpolation=cv2.INTER_NEAREST)
        boxes = np.rint((boxes + np.tile((left, top), 2)) / ratio) \
            .astype(boxes.dtype)
        new_masks = []
        for m in masks:
            cm = np.zeros((eh, ew), m.dtype)
            cm[top:top + h, left:left + w] = m
            new_masks.append(cv2.resize(cm, (w, h),
                                        interpolation=cv2.INTER_NEAREST))
        out_masks = np.stack(new_masks) if new_masks else masks
        return img, boxes, labels, out_masks, ids


class RandomCrop:
    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                 min_crop_size=0.3):
        self.sample_mode = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size

    def __call__(self, img, boxes, labels, masks, ids, rng=None):
        rng = rng or np.random
        h, w, _ = img.shape
        for _ in range(50):
            mode = self.sample_mode[rng.randint(len(self.sample_mode))]
            if mode == 1:
                return img, boxes, labels, masks, ids
            min_iou = mode
            for _ in range(50):
                new_w = rng.uniform(self.min_crop_size * w, w)
                new_h = rng.uniform(self.min_crop_size * h, h)
                if not (0.5 <= new_h / new_w <= 2):
                    continue
                left = rng.uniform(w - new_w)
                top = rng.uniform(h - new_h)
                patch = np.asarray([int(left), int(top), int(left + new_w),
                                    int(top + new_h)])
                overlaps = _pairwise_iou(patch[None].astype(np.float32),
                                         boxes)[0]
                if overlaps.size and overlaps.min() < min_iou:
                    continue
                center = (boxes[:, :2] + boxes[:, 2:]) / 2
                keep = ((center[:, 0] > patch[0]) & (center[:, 1] > patch[1])
                        & (center[:, 0] < patch[2])
                        & (center[:, 1] < patch[3]))
                if not keep.any():
                    continue
                boxes = boxes[keep].copy()
                labels = labels[keep]
                masks = np.asarray(masks)[keep]
                ids = np.asarray(ids)[keep]

                img_crop = np.zeros_like(img)
                img_crop[patch[1]:patch[3], patch[0]:patch[2]] = \
                    img[patch[1]:patch[3], patch[0]:patch[2]]
                boxes[:, 2:] = boxes[:, 2:].clip(max=patch[2:])
                boxes[:, :2] = boxes[:, :2].clip(min=patch[:2])
                boxes -= np.tile(patch[:2], 2)
                masks_crop = np.zeros_like(masks)
                masks_crop[:, patch[1]:patch[3], patch[0]:patch[2]] = \
                    masks[:, patch[1]:patch[3], patch[0]:patch[2]]
                return img_crop, boxes, labels, masks_crop, ids
        return img, boxes, labels, masks, ids


class ExtraAugmentation:
    def __init__(self, photo_metric_distortion=None, expand=None,
                 random_crop=None):
        self.transforms = []
        if photo_metric_distortion is not None:
            self.transforms.append(
                PhotoMetricDistortion(**photo_metric_distortion))
        if expand is not None:
            self.transforms.append(Expand(**expand))
        if random_crop is not None:
            self.transforms.append(RandomCrop(**random_crop))

    def __call__(self, img, boxes, labels, masks, ids, rng=None):
        img = img.astype(np.float32)
        for t in self.transforms:
            img, boxes, labels, masks, ids = t(img, boxes, labels, masks,
                                               ids, rng=rng)
        return img, boxes, labels, masks, ids
