"""Static-shape NMS family: cc-fast-NMS, per-class fast-NMS, exact greedy NMS.

Re-design of reference ``layers/functions/detection.py:139-312``.  The
reference filters with boolean masks (dynamic shapes); on TPU everything is
fixed-capacity: invalid slots carry score ``-inf`` and a ``valid`` mask rides
along instead of shrinking arrays.  The upper-triangular IoU-matrix trick is
already matrix-form (MXU/VPU friendly); exact greedy NMS (the reference's
Cython ``traditional_nms`` path, ``detection.py:265-312``) is a sequential
``fori_loop`` for per-class mAP* parity mode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import jaccard

NEG_INF = -1e10


def _top_k_padded(scores: jax.Array, k: int):
    """``lax.top_k`` clamped to the axis size and padded back to ``k``
    (padded scores NEG_INF, indices 0) so callers keep static shapes even
    when fewer than ``k`` candidates exist."""
    n = scores.shape[-1]
    kk = min(k, n)
    vals, idx = jax.lax.top_k(scores, kk)
    if kk < k:
        pad = [(0, 0)] * (vals.ndim - 1) + [(0, k - kk)]
        vals = jnp.pad(vals, pad, constant_values=NEG_INF)
        idx = jnp.pad(idx, pad)
    return vals, idx


class NMSResult(NamedTuple):
    idx: jax.Array      # [K] indices into the input boxes (score-sorted)
    valid: jax.Array    # [K] bool — survived threshold + suppression
    scores: jax.Array   # [K] sorted scores


def cc_fast_nms(boxes: jax.Array, scores: jax.Array,
                iou_threshold: float = 0.5, top_k: int = 200,
                mask_fn=None) -> NMSResult:
    """Cross-class fast NMS (reference detection.py:139-187).

    Args:
      boxes: [P, 4] decoded point-form boxes.
      scores: [P] combined scores (max-class prob x centerness); entries that
        failed the confidence pre-filter must already be ``NEG_INF``.
      mask_fn: optional callback ``idx [K] -> [K, Hm, Wm]`` binarized
        instance masks of the top-k candidates; when given, suppression uses
        the blended ``0.5 * (box_iou + mask_iou)`` (``nms_as_miou``,
        reference detection.py:154-158).  A callback so masks are only ever
        assembled for the K survivors, not all P priors.
    Returns top_k score-sorted candidates with a survival mask.
    """
    top_scores, idx = _top_k_padded(scores, top_k)
    boxes_k = boxes[idx]
    iou = jaccard(boxes_k, boxes_k)                    # [K, K]
    if mask_fn is not None:
        m = mask_fn(idx).reshape(top_k, -1)
        miou = mask_iou_matrix(m)
        iou = 0.5 * (iou + miou)
    iou = jnp.triu(iou, k=1)
    iou_max = jnp.max(iou, axis=0)
    valid = (iou_max <= iou_threshold) & (top_scores > NEG_INF / 2)
    return NMSResult(idx, valid, top_scores)


def mask_iou_matrix(flat_masks: jax.Array) -> jax.Array:
    """Pairwise mask IoU of [N, H*W] binarized masks (one MXU matmul,
    reference box_utils.py:435-447)."""
    inter = flat_masks @ flat_masks.T                         # [N, N]
    area = jnp.sum(flat_masks, axis=1)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


class ClassNMSResult(NamedTuple):
    idx: jax.Array      # [D] indices into input priors
    classes: jax.Array  # [D] 1-based class ids
    scores: jax.Array   # [D]
    valid: jax.Array    # [D]


def fast_nms(boxes: jax.Array, scores_c: jax.Array,
             iou_threshold: float = 0.5, top_k: int = 200,
             conf_thresh: float = 0.05,
             max_dets: int = 100) -> ClassNMSResult:
    """Per-class fast NMS (reference detection.py:211-263), used for mAP*.

    Args:
      boxes: [P, 4]; scores_c: [C-1, P] per-class scores (background removed).
    """
    num_fg = scores_c.shape[0]
    top_scores, idx = _top_k_padded(scores_c, top_k)     # [C-1, K]
    boxes_k = boxes[idx.reshape(-1)].reshape(num_fg, top_k, 4)
    iou = jaccard(boxes_k, boxes_k)                      # [C-1, K, K]
    iou = jnp.triu(iou, k=1)
    iou_max = jnp.max(iou, axis=1)                       # [C-1, K]
    keep = (iou_max <= iou_threshold) & (top_scores > conf_thresh)

    flat_scores = jnp.where(keep, top_scores, NEG_INF).reshape(-1)
    flat_idx = idx.reshape(-1)
    cls_ids = jnp.repeat(jnp.arange(num_fg, dtype=jnp.int32), top_k)

    best_scores, order = _top_k_padded(flat_scores, max_dets)
    return ClassNMSResult(flat_idx[order],
                          cls_ids[order] + 1,
                          best_scores,
                          best_scores > NEG_INF / 2)


def greedy_nms_mask(boxes: jax.Array, valid: jax.Array,
                    iou_threshold: float = 0.5,
                    iou: jax.Array | None = None) -> jax.Array:
    """Exact sequential greedy NMS over *score-sorted* boxes.

    Parity mode for the reference's Cython NMS (``utils/cython_nms.pyx``,
    used via detection.py:265-312).  Returns a bool keep mask; a box is
    suppressed only by an earlier *kept* box.  ``iou`` overrides the
    pairwise-overlap matrix (e.g. the Cython +1-pixel area convention).
    """
    k = boxes.shape[0]
    if iou is None:
        iou = jaccard(boxes, boxes)
    arange = jnp.arange(k)

    def body(i, suppressed):
        newly = (iou[i] > iou_threshold) & (arange > i)
        return jnp.where(suppressed[i], suppressed, suppressed | newly)

    suppressed = jax.lax.fori_loop(0, k, body, ~valid)
    return ~suppressed & valid


def _plus_one_iou(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU with the Cython NMS convention: pixel boxes, areas
    ``(x2 - x1 + 1) * (y2 - y1 + 1)`` (utils/cython_nms.pyx:31,67-70)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    iw = jnp.maximum(0.0, ix2 - ix1 + 1.0)
    ih = jnp.maximum(0.0, iy2 - iy1 + 1.0)
    inter = iw * ih
    return inter / (area[:, None] + area[None, :] - inter)


def greedy_nms_per_class(boxes: jax.Array, scores_c: jax.Array,
                         iou_threshold: float = 0.5,
                         conf_thresh: float = 0.05,
                         top_k: int = 200,
                         max_dets: int = 100,
                         scale: float = 640.0) -> ClassNMSResult:
    """Exact per-class greedy NMS (reference ``traditional_nms``,
    detection.py:265-312): Cython greedy semantics per class — including the
    ``boxes * cfg.max_size`` scaling and +1-pixel areas — then a global
    score sort capped at ``max_dets``.

    Args:
      boxes: [P, 4] normalized point-form; scores_c: [C-1, P].
    """
    num_fg = scores_c.shape[0]
    masked = jnp.where(scores_c > conf_thresh, scores_c, NEG_INF)
    top_scores, idx = _top_k_padded(masked, top_k)       # [C-1, K]
    boxes_k = boxes[idx.reshape(-1)].reshape(num_fg, top_k, 4) * scale

    def per_class(bx, sc):
        keep = greedy_nms_mask(bx, sc > NEG_INF / 2, iou_threshold,
                               iou=_plus_one_iou(bx))
        return keep

    keep = jax.vmap(per_class)(boxes_k, top_scores)      # [C-1, K]
    flat_scores = jnp.where(keep, top_scores, NEG_INF).reshape(-1)
    flat_idx = idx.reshape(-1)
    cls_ids = jnp.repeat(jnp.arange(num_fg, dtype=jnp.int32), top_k)

    best_scores, order = _top_k_padded(flat_scores, max_dets)
    return ClassNMSResult(flat_idx[order],
                          cls_ids[order] + 1,
                          best_scores,
                          best_scores > NEG_INF / 2)
