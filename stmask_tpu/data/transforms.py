"""Image/box/mask preprocessing matching the reference transform chain.

Reference ``datasets/transforms.py``: resize to (640, 360) without keeping
aspect ratio, normalize RGB with MEANS/STD, optional horizontal flip,
pad to a multiple of 32 (-> 384x640), boxes scaled + clipped to img_shape +
normalized by *pad_shape*, masks nearest-resized + flipped + padded.

Additionally produces the prototype-resolution gt masks the TPU loss
consumes (pad/4, binarized).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..config import MEANS, STD, STMaskConfig
from .ytvis import FrameAnnots


def resize_image(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    return cv2.resize(img, size_wh, interpolation=cv2.INTER_LINEAR)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32 normalized."""
    return (img.astype(np.float32) - np.asarray(MEANS, np.float32)) \
        / np.asarray(STD, np.float32)


def preprocess_frame(cfg: STMaskConfig, img_rgb: np.ndarray,
                     annots: Optional[FrameAnnots] = None,
                     flip: bool = False, image_u8: bool = False) -> Dict:
    """One frame -> normalized padded image + padded-normalized targets.

    Returns dict with:
      image [pad_h, pad_w, 3] float32 — or, with ``image_u8=True``, the
      resized+flipped uint8 [img_h, img_w, 3] frame (normalize + pad
      happen ON DEVICE via :func:`train_base_transform`; 4x less
      host->device traffic, the same split as the eval drivers);
      and if annots given: boxes [n,4] normalized to pad shape, labels, ids,
      masks_proto [n, pad_h/4, pad_w/4] uint8, masks_img [n, img_h, img_w].
    """
    ow, oh = img_rgb.shape[1], img_rgb.shape[0]
    iw, ih = cfg.img_w, cfg.img_h
    pw, ph = cfg.pad_w, cfg.pad_h

    img = resize_image(img_rgb, (iw, ih))
    if image_u8:
        if flip:
            img = img[:, ::-1]
        # augmented frames arrive float: round+clip to uint8 (<=0.5 LSB
        # quantization; out-of-[0,255] photometric excursions clip — a
        # documented deviation, PARITY.md "uint8 train upload")
        if img.dtype != np.uint8:
            img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
        out = {'image': np.ascontiguousarray(img),
               'img_shape': (ih, iw), 'pad_shape': (ph, pw)}
    else:
        img = normalize_image(img)
        if flip:
            img = img[:, ::-1]
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[:ih, :iw] = img
        out = {'image': padded,
               'img_shape': (ih, iw), 'pad_shape': (ph, pw)}
    if annots is None:
        return out

    w_scale, h_scale = iw / ow, ih / oh

    def tf_boxes(b):
        b = b * np.asarray([w_scale, h_scale, w_scale, h_scale], np.float32)
        if flip:
            # bbox_flip (transforms.py:49-61)
            x1 = iw - b[:, 2] - 1
            x2 = iw - b[:, 0] - 1
            b = np.stack([x1, b[:, 1], x2, b[:, 3]], axis=1)
        b = b.copy()
        b[:, 0::2] = np.clip(b[:, 0::2], 0, iw) / pw
        b[:, 1::2] = np.clip(b[:, 1::2], 0, ih) / ph
        return b.astype(np.float32)

    boxes = tf_boxes(annots.boxes)
    crowd = getattr(annots, 'crowd_boxes', None)
    crowd = (tf_boxes(crowd.reshape(-1, 4)) if crowd is not None
             and len(crowd) else np.zeros((0, 4), np.float32))

    hp, wp = ph // 4, pw // 4
    n = annots.masks.shape[0]
    masks_proto = np.zeros((n, hp, wp), np.uint8)
    for i in range(n):
        m = cv2.resize(annots.masks[i], (iw, ih),
                       interpolation=cv2.INTER_NEAREST)
        if flip:
            m = m[:, ::-1]
        mp = np.zeros((ph, pw), np.uint8)
        mp[:ih, :iw] = m
        # downsample to prototype resolution, binarize > 0.5
        mp_small = cv2.resize(mp.astype(np.float32), (wp, hp),
                              interpolation=cv2.INTER_LINEAR)
        masks_proto[i] = (mp_small > 0.5).astype(np.uint8)

    out.update(boxes=boxes.astype(np.float32), labels=annots.labels,
               ids=annots.ids, masks_proto=masks_proto, crowd_boxes=crowd)
    return out


def preprocess_frame_u8(cfg: STMaskConfig, img_rgb: np.ndarray) -> Dict:
    """Eval-path host preprocessing that stops at uint8: cv2 resize to
    (img_w, img_h) only — normalization + padding happen ON DEVICE
    (``build_video_step_batched(uint8_input=True)``), so each frame ships
    ~0.66MB of uint8 instead of ~2.95MB of padded float32 over the
    host→device link (the e2e eval bottleneck on remote-attached devices;
    the reference's FastBaseTransform made the same host/device split,
    ``utils/augmentations.py:619``)."""
    return {'image': resize_image(img_rgb, (cfg.img_w, cfg.img_h)),
            'img_shape': (cfg.img_h, cfg.img_w),
            'pad_shape': (cfg.pad_h, cfg.pad_w)}


def fast_base_transform(cfg: STMaskConfig):
    """Device-side resize + normalize + pad (the production input path —
    reference ``utils/augmentations.py:619`` FastBaseTransform runs the same
    on GPU).  Returns a jittable fn: uint8 RGB [H0, W0, 3] -> normalized
    padded float32 [pad_h, pad_w, 3].  Ships only ~0.7MB of uint8 per
    360x640 frame over PCIe instead of 2.9MB of float32.
    """
    import jax
    import jax.numpy as jnp

    ih, iw = cfg.img_h, cfg.img_w
    normalize_pad = normalize_pad_device(cfg)

    @jax.jit
    def transform(img_u8: 'jax.Array') -> 'jax.Array':
        x = img_u8.astype(jnp.float32)
        x = jax.image.resize(x, (ih, iw, 3), method='bilinear')
        return normalize_pad(x)

    return transform


def normalize_pad_device(cfg: STMaskConfig):
    """THE device-side normalize + zero-pad, shared by every upload path
    (training batches, sequential + batched eval, FastBaseTransform):
    uint8/float [..., img_h, img_w, 3] -> float32 [..., pad_h, pad_w, 3].
    Traceable, not jitted — compose it inside larger programs."""
    import jax.numpy as jnp

    mean = jnp.asarray(MEANS, jnp.float32)
    std = jnp.asarray(STD, jnp.float32)
    ih, iw, ph, pw = cfg.img_h, cfg.img_w, cfg.pad_h, cfg.pad_w

    def transform(img: 'jax.Array') -> 'jax.Array':
        x = (img.astype(jnp.float32) - mean) / std
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ph - ih), (0, pw - iw), (0, 0)]
        return jnp.pad(x, pad)

    return transform


def train_base_transform(cfg: STMaskConfig):
    """Device-side normalize + pad for TRAINING batches shipped as uint8.

    Returns a jitted fn: uint8 [..., img_h, img_w, 3] ->
    float32 [..., pad_h, pad_w, 3].  A separate tiny program from the
    train step, so flipping the upload format does not recompile the big
    program; elementwise-identical to host normalization for uint8
    sources.  Cuts the per-step host->device image payload 4x+ (fp32
    padded -> uint8 unpadded) — the train-loop bottleneck on
    remote-attached devices (bench_train --pipeline).
    """
    import jax

    return jax.jit(normalize_pad_device(cfg))


def unpack_masks_device():
    """Device-side inverse of ``np.packbits(masks, axis=-1)`` for the
    binary proto-resolution gt masks: uint8 [..., W/8] -> uint8 [..., W].
    Ships 8x fewer mask bytes per train batch (with the big-endian bit
    order numpy uses)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def unpack(packed: 'jax.Array') -> 'jax.Array':
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)   # MSB first
        bits = (packed[..., None] >> shifts) & jnp.uint8(1)
        return bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))

    return unpack


def pad_gt(cfg: STMaskConfig, frame: Dict) -> Dict:
    """Pad per-frame targets to ``max_gt_per_frame`` static capacity."""
    g = cfg.max_gt_per_frame
    hp, wp = cfg.pad_h // 4, cfg.pad_w // 4
    n = min(len(frame['labels']), g)
    boxes = np.zeros((g, 4), np.float32)
    labels = np.zeros((g,), np.int32)
    ids = np.zeros((g,), np.int32)
    valid = np.zeros((g,), bool)
    masks = np.zeros((g, hp, wp), np.uint8)
    boxes[:n] = frame['boxes'][:n]
    labels[:n] = frame['labels'][:n]
    ids[:n] = frame['ids'][:n]
    valid[:n] = True
    masks[:n] = frame['masks_proto'][:n]
    gc = cfg.crowd_capacity
    crowd = np.zeros((gc, 4), np.float32)
    crowd_valid = np.zeros((gc,), bool)
    cb = frame.get('crowd_boxes')
    if cb is not None and len(cb):
        nc = min(len(cb), gc)
        crowd[:nc] = cb[:nc]
        crowd_valid[:nc] = True
    return {'image': frame['image'], 'boxes': boxes, 'labels': labels,
            'ids': ids, 'valid': valid, 'masks_proto': masks,
            'crowd_boxes': crowd, 'crowd_valid': crowd_valid}
