"""Per-frame candidate generation + NMS with fixed capacities.

Combines the reference's ``generate_candidate`` (conf pre-filter + decode,
``layers/functions/TF_utils.py:54-82``) and ``Detect_TF``'s cc-fast-NMS
(``layers/functions/detection_TF.py:56-83``, same math as
``detection.py:139-187``) into one static-shape function: instead of boolean
filtering, invalid priors get ``-inf`` scores and top-k selection yields a
sorted, fixed-size candidate set with a validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import STMaskConfig
from ..ops.boxes import decode
from ..ops.masks import generate_mask
from ..ops.nms import (NEG_INF, cc_fast_nms, fast_nms, greedy_nms_per_class)


class Detections(NamedTuple):
    """Fixed-capacity per-frame detections, score-sorted."""
    box: jax.Array         # [D, 4] point form, normalized
    score: jax.Array       # [D] max-class prob x centerness
    cls: jax.Array         # [D] 1-based class id
    mask_coeff: jax.Array  # [D, 32] raw coefficients
    track: jax.Array       # [D, E] L2-normalized embedding
    centerness: jax.Array  # [D]
    valid: jax.Array       # [D] bool


def rescore_maskiou(cfg: STMaskConfig, maskiou_fn, det: Detections,
                    proto: jax.Array) -> Detections:
    """Mask re-scoring via FastMaskIoUNet (Mask Scoring R-CNN style;
    reference eval.py:291,467 — commented out of the reference main path,
    available here behind ``use_maskiou`` + ``rescore_mask``/``rescore_bbox``):
    each detection's score is multiplied by the predicted mask IoU of its
    class."""
    soft = generate_mask(proto, det.mask_coeff, det.box)      # [D, Hp, Wp]
    iou_p = maskiou_fn(soft[..., None])                       # [D, C-1]
    lbl = jnp.maximum(det.cls - 1, 0)
    per = jnp.take_along_axis(iou_p, lbl[:, None], axis=1)[:, 0]
    new_score = jnp.where(det.valid, det.score * per, det.score)
    return det._replace(score=new_score)


def detect_frame(cfg: STMaskConfig, preds: dict, priors: jax.Array,
                 proto: jax.Array | None = None) -> Detections:
    """Decode + threshold + NMS for one frame.

    The NMS family is picked by ``cfg.eval_nms_method``:
      * ``'cc'`` — cross-class fast NMS over score x centerness (the mAP
        column; reference detection.py:139-187), optionally with
        mask-IoU-blended suppression (``cfg.nms_as_miou``,
        detection.py:154-158 — needs ``proto``);
      * ``'per_class'`` — per-class fast NMS on raw class scores (the mAP*
        column; detection.py:211-263);
      * ``'greedy'`` — exact sequential per-class NMS with Cython +1-pixel
        area semantics (detection.py:265-312).

    Args:
      preds: model eval outputs for a single frame (batch dim stripped):
        loc [P, 4], conf [P, C] softmaxed, mask_coeff [P, 32],
        track [P, E], centerness [P, 1].
      proto: [Hp, Wp, 32] prototypes (only used for nms_as_miou).
    """
    loc = preds['loc']
    conf = preds['conf']
    boxes = decode(loc, priors)                                # [P, 4]

    fg = conf[:, 1:]                                           # [P, C-1]
    conf_max = jnp.max(fg, axis=-1)
    classes = jnp.argmax(fg, axis=-1).astype(jnp.int32) + 1
    centerness = preds['centerness'][:, 0]
    d = min(cfg.det_capacity, cfg.nms_top_k)
    method = cfg.eval_nms_method

    if method in ('per_class', 'greedy'):
        # mAP* family: per-class scores.  TF models run Detect_TF.fast_nms,
        # which weights the per-class scores by centerness BEFORE the
        # sort / suppression / second threshold and reports the weighted
        # score (reference detection_TF.py:140-143) — unlike the non-TF
        # detection.py:211 fast_nms, which takes raw scores.  greedy (the
        # Cython traditional_nms path) exists only in detection.py and
        # always takes raw scores.
        weighted = (method == 'per_class' and cfg.temporal_fusion_module
                    and cfg.train_centerness)
        scores_c = (fg * centerness[:, None]).T if weighted else fg.T
        if method == 'per_class':
            res = fast_nms(boxes, scores_c, cfg.nms_thresh, cfg.nms_top_k,
                           conf_thresh=cfg.nms_conf_thresh, max_dets=d)
        else:
            res = greedy_nms_per_class(
                boxes, scores_c, cfg.nms_thresh, cfg.nms_conf_thresh,
                cfg.nms_top_k, max_dets=d,
                scale=float(max(cfg.pad_w, cfg.pad_h)))
        idx = res.idx
        return Detections(
            box=boxes[idx],
            score=res.scores,
            cls=res.classes,
            mask_coeff=preds['mask_coeff'][idx],
            track=preds['track'][idx],
            centerness=centerness[idx],
            valid=res.valid,
        )

    # conf pre-filter (TF_utils.py:71) then score-sorted NMS over
    # score x centerness (detection_TF cc_fast_nms)
    passed = conf_max > cfg.eval_conf_thresh
    nms_scores = jnp.where(passed, conf_max * centerness, NEG_INF)
    mask_fn = None
    if cfg.nms_as_miou and proto is not None:
        def mask_fn(idx):
            soft = generate_mask(proto, preds['mask_coeff'][idx],
                                 boxes[idx])
            return (soft > 0.5).astype(jnp.float32)
    res = cc_fast_nms(boxes, nms_scores, cfg.nms_thresh, cfg.nms_top_k,
                      mask_fn=mask_fn)

    # compact the NMS survivors into det_capacity slots (score-sorted);
    # >det_capacity survivors at 0.05 conf never occurs in practice and the
    # reference caps final detections at max_num_detections=100 anyway
    surv_scores = jnp.where(res.valid, res.scores, NEG_INF)
    top_s, top_i = jax.lax.top_k(surv_scores, d)
    idx = res.idx[top_i]
    return Detections(
        box=boxes[idx],
        score=top_s,
        cls=classes[idx],
        mask_coeff=preds['mask_coeff'][idx],
        track=preds['track'][idx],
        centerness=centerness[idx],
        valid=top_s > NEG_INF / 2,
    )
