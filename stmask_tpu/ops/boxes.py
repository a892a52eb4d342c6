"""Box geometry in pure JAX (static shapes, jit/vmap friendly).

Functional re-design of the reference ``layers/box_utils.py``: identical math
(SSD variance encode/decode at ``box_utils.py:199-283``, vectorized crop at
``box_utils.py:340-364``, pairwise DIoU penalty at ``box_utils.py:450-470``)
but with no in-place mutation and no data-dependent shapes, so everything can
run under ``jax.jit`` on TPU and ``vmap`` over batch/track dimensions.

Conventions: point-form boxes are [x1, y1, x2, y2]; priors are [cx, cy, w, h];
all normalized to [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# SSD encode/decode variances (reference box_utils.py:223,274).
VARIANCES = (0.1, 0.2)


def point_form(boxes: jax.Array) -> jax.Array:
    """[cx, cy, w, h] -> [x1, y1, x2, y2] (reference box_utils.py:11-21)."""
    return jnp.concatenate([boxes[..., :2] - boxes[..., 2:] / 2,
                            boxes[..., :2] + boxes[..., 2:] / 2], axis=-1)


def center_size(boxes: jax.Array) -> jax.Array:
    """[x1, y1, x2, y2] -> [cx, cy, w, h] (reference box_utils.py:24-34)."""
    return jnp.concatenate([(boxes[..., 2:] + boxes[..., :2]) / 2,
                            boxes[..., 2:] - boxes[..., :2]], axis=-1)


def intersect(box_a: jax.Array, box_b: jax.Array) -> jax.Array:
    """Pairwise intersection area, [..., A, 4] x [..., B, 4] -> [..., A, B]
    (reference box_utils.py:36-57)."""
    max_xy = jnp.minimum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    min_xy = jnp.maximum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    inter = jnp.clip(max_xy - min_xy, 0.0)
    return inter[..., 0] * inter[..., 1]


def area(boxes: jax.Array) -> jax.Array:
    return ((boxes[..., 2] - boxes[..., 0])
            * (boxes[..., 3] - boxes[..., 1]))


def jaccard(box_a: jax.Array, box_b: jax.Array,
            iscrowd: bool = False) -> jax.Array:
    """Pairwise IoU, [..., A, 4] x [..., B, 4] -> [..., A, B]
    (reference box_utils.py:60-88)."""
    inter = intersect(box_a, box_b)
    area_a = area(box_a)[..., :, None]
    area_b = area(box_b)[..., None, :]
    union = area_a + area_b - inter
    denom = area_a if iscrowd else union
    return jnp.where(denom > 0, inter / jnp.where(denom > 0, denom, 1.0), 0.0)


def elemwise_box_iou(box_a: jax.Array, box_b: jax.Array) -> jax.Array:
    """IoU of aligned box pairs, [N, 4] x [N, 4] -> [N]."""
    max_xy = jnp.minimum(box_a[..., 2:], box_b[..., 2:])
    min_xy = jnp.maximum(box_a[..., :2], box_b[..., :2])
    inter = jnp.clip(max_xy - min_xy, 0.0)
    inter = inter[..., 0] * inter[..., 1]
    union = area(box_a) + area(box_b) - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def encode(matched: jax.Array, priors: jax.Array) -> jax.Array:
    """Encode point-form gt against [cx,cy,w,h] priors with SSD variances;
    ``encode(decode(x, p), p) == x`` (reference box_utils.py:199-235)."""
    v0, v1 = VARIANCES
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (v0 * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(jnp.maximum(g_wh, 1e-12)) / v1
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(loc: jax.Array, priors: jax.Array) -> jax.Array:
    """Decode network regression to point form (reference
    box_utils.py:237-283)."""
    v0, v1 = VARIANCES
    centers = priors[..., :2] + loc[..., :2] * v0 * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * v1)
    return jnp.concatenate([centers - wh / 2, centers + wh / 2], axis=-1)


def sanitize_coordinates(x1: jax.Array, x2: jax.Array, img_size: int,
                         padding: int = 0):
    """Scale to absolute, order, clamp (reference box_utils.py:297-316;
    the ``cast=False`` float path)."""
    x1 = x1 * img_size
    x2 = x2 * img_size
    lo = jnp.minimum(x1, x2)
    hi = jnp.maximum(x1, x2)
    lo = jnp.clip(lo - padding, 0)
    hi = jnp.clip(hi + padding, None, img_size)
    return lo, hi


def sanitize_coordinates_hw(box: jax.Array, h: int, w: int) -> jax.Array:
    """Unnormalize [..., 4] boxes to (h, w) feature coords (reference
    box_utils.py:319-337); used by the TF bbox_feat_extractor."""
    x1, x2 = sanitize_coordinates(box[..., 0], box[..., 2], w)
    y1, y2 = sanitize_coordinates(box[..., 1], box[..., 3], h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def crop(masks: jax.Array, boxes: jax.Array, padding: int = 1):
    """Zero mask pixels outside each box (reference box_utils.py:340-364).

    Args:
      masks: [h, w, n]; boxes: [n, 4] normalized point form.
    Returns:
      (crop_mask, cropped_masks), both [h, w, n].
    """
    h, w, n = masks.shape
    x1, x2 = sanitize_coordinates(boxes[:, 0], boxes[:, 2], w, padding)
    y1, y2 = sanitize_coordinates(boxes[:, 1], boxes[:, 3], h, padding)

    rows = jnp.arange(w, dtype=masks.dtype)[None, :, None]
    cols = jnp.arange(h, dtype=masks.dtype)[:, None, None]
    crop_mask = ((rows >= x1[None, None, :]) & (rows < x2[None, None, :]) &
                 (cols >= y1[None, None, :]) & (cols < y2[None, None, :]))
    crop_mask = crop_mask.astype(masks.dtype)
    return crop_mask, masks * crop_mask


def mask_iou(mask1: jax.Array, mask2: jax.Array) -> jax.Array:
    """Pairwise IoU of binary masks [n1, h, w] x [n2, h, w] -> [n1, n2]
    (reference box_utils.py:435-447).  The flattened intersection is a
    matmul, which maps straight onto the MXU."""
    n1 = mask1.shape[0]
    n2 = mask2.shape[0]
    m1 = mask1.reshape(n1, -1)
    m2 = mask2.reshape(n2, -1)
    inter = jnp.dot(m1, m2.T, preferred_element_type=jnp.float32)
    a1 = jnp.sum(m1, axis=1)[:, None]
    a2 = jnp.sum(m2, axis=1)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def diou_distance(det_bbox: jax.Array, prev_det_bbox: jax.Array) -> jax.Array:
    """Pairwise DIoU center-distance penalty d^2/c^2, [n, 4] x [m, 4] -> [n, m]
    (reference box_utils.py:450-470)."""
    x_pair_min = jnp.minimum(
        jnp.minimum(det_bbox[:, None, 0], det_bbox[:, None, 2]),
        jnp.minimum(prev_det_bbox[None, :, 0], prev_det_bbox[None, :, 2]))
    x_pair_max = jnp.maximum(
        jnp.maximum(det_bbox[:, None, 0], det_bbox[:, None, 2]),
        jnp.maximum(prev_det_bbox[None, :, 0], prev_det_bbox[None, :, 2]))
    y_pair_min = jnp.minimum(
        jnp.minimum(det_bbox[:, None, 1], det_bbox[:, None, 3]),
        jnp.minimum(prev_det_bbox[None, :, 1], prev_det_bbox[None, :, 3]))
    y_pair_max = jnp.maximum(
        jnp.maximum(det_bbox[:, None, 1], det_bbox[:, None, 3]),
        jnp.maximum(prev_det_bbox[None, :, 1], prev_det_bbox[None, :, 3]))
    c2 = (x_pair_max - x_pair_min) ** 2 + (y_pair_max - y_pair_min) ** 2

    det_c = (det_bbox[:, :2] + det_bbox[:, 2:]) / 2
    prev_c = (prev_det_bbox[:, :2] + prev_det_bbox[:, 2:]) / 2
    d2 = jnp.sum((det_c[:, None, :] - prev_c[None, :, :]) ** 2, axis=2)
    return jnp.where(c2 > 0, d2 / jnp.where(c2 > 0, c2, 1.0), 0.0)


def elemwise_diou(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """DIoU = IoU - d^2/c^2 for aligned pairs [N, 4] -> [N] (reference
    multibox_loss.py:227-245 get_DIoU)."""
    iou = elemwise_box_iou(pred, gt)
    x_min = jnp.minimum(jnp.minimum(pred[..., 0], pred[..., 2]),
                        jnp.minimum(gt[..., 0], gt[..., 2]))
    x_max = jnp.maximum(jnp.maximum(pred[..., 0], pred[..., 2]),
                        jnp.maximum(gt[..., 0], gt[..., 2]))
    y_min = jnp.minimum(jnp.minimum(pred[..., 1], pred[..., 3]),
                        jnp.minimum(gt[..., 1], gt[..., 3]))
    y_max = jnp.maximum(jnp.maximum(pred[..., 1], pred[..., 3]),
                        jnp.maximum(gt[..., 1], gt[..., 3]))
    c2 = (x_max - x_min) ** 2 + (y_max - y_min) ** 2
    pc = (pred[..., :2] + pred[..., 2:]) / 2
    gc = (gt[..., :2] + gt[..., 2:]) / 2
    d2 = jnp.sum((pc - gc) ** 2, axis=-1)
    return iou - jnp.where(c2 > 0, d2 / jnp.where(c2 > 0, c2, 1.0), 0.0)
