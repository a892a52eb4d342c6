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


class NMSResult(NamedTuple):
    idx: jax.Array      # [K] indices into the input boxes (score-sorted)
    valid: jax.Array    # [K] bool — survived threshold + suppression
    scores: jax.Array   # [K] sorted scores


def cc_fast_nms(boxes: jax.Array, scores: jax.Array,
                iou_threshold: float = 0.5, top_k: int = 200,
                second_mask: jax.Array | None = None) -> NMSResult:
    """Cross-class fast NMS (reference detection.py:139-187).

    Args:
      boxes: [P, 4] decoded point-form boxes.
      scores: [P] combined scores (max-class prob x centerness); entries that
        failed the confidence pre-filter must already be ``NEG_INF``.
    Returns top_k score-sorted candidates with a survival mask.
    """
    top_scores, idx = jax.lax.top_k(scores, top_k)
    boxes_k = boxes[idx]
    iou = jaccard(boxes_k, boxes_k)                    # [K, K]
    iou = jnp.triu(iou, k=1)
    iou_max = jnp.max(iou, axis=0)
    valid = (iou_max <= iou_threshold) & (top_scores > NEG_INF / 2)
    return NMSResult(idx, valid, top_scores)


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
    top_scores, idx = jax.lax.top_k(scores_c, top_k)     # [C-1, K]
    boxes_k = boxes[idx.reshape(-1)].reshape(num_fg, top_k, 4)
    iou = jaccard(boxes_k, boxes_k)                      # [C-1, K, K]
    iou = jnp.triu(iou, k=1)
    iou_max = jnp.max(iou, axis=1)                       # [C-1, K]
    keep = (iou_max <= iou_threshold) & (top_scores > conf_thresh)

    flat_scores = jnp.where(keep, top_scores, NEG_INF).reshape(-1)
    flat_idx = idx.reshape(-1)
    cls_ids = jnp.repeat(jnp.arange(num_fg, dtype=jnp.int32), top_k)

    best_scores, order = jax.lax.top_k(flat_scores, max_dets)
    return ClassNMSResult(flat_idx[order],
                          cls_ids[order] + 1,
                          best_scores,
                          best_scores > NEG_INF / 2)


def greedy_nms_mask(boxes: jax.Array, valid: jax.Array,
                    iou_threshold: float = 0.5) -> jax.Array:
    """Exact sequential greedy NMS over *score-sorted* boxes.

    Parity mode for the reference's Cython NMS (``utils/cython_nms.pyx``,
    used via detection.py:265-312).  Returns a bool keep mask; a box is
    suppressed only by an earlier *kept* box.
    """
    k = boxes.shape[0]
    iou = jaccard(boxes, boxes)
    arange = jnp.arange(k)

    def body(i, suppressed):
        newly = (iou[i] > iou_threshold) & (arange > i)
        return jnp.where(suppressed[i], suppressed, suppressed | newly)

    suppressed = jax.lax.fori_loop(0, k, body, ~valid)
    return ~suppressed & valid
