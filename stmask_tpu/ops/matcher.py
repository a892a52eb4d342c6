"""Anchor-to-gt matching with STMask's three refinements, fully vectorized.

The reference matcher (``layers/box_utils.py:119-197``) is a per-image Python
routine with dynamic shapes; training calls it in a host loop over the batch
(``multibox_loss.py:138-143``).  Here it is a pure function over a *padded* gt
set (``gt_valid`` marks real rows) so it can be ``vmap``-ed over the batch and
compiled once.  The three nonstandard refinements are kept exactly:

  1. multi-instance anchor veto (``box_utils.py:150-151``);
  2. classification-score-adjusted thresholds (``box_utils.py:154-161``) —
     note these make the effective thresholds data-dependent;
  3. forced best-anchor-per-gt greedy loop (``box_utils.py:166-184``) as a
     ``lax.fori_loop`` over the padded gt dimension, with a validity guard so
     padded rows never claim an anchor.

Label conventions (``box_utils.py:186-191``): conf_t > 0 positive class id,
0 background, -1 neutral; ids_t is the gt instance id (0 for non-positive).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .boxes import encode, jaccard, point_form


class MatchResult(NamedTuple):
    loc_t: jax.Array    # [P, 4] encoded regression targets
    conf_t: jax.Array   # [P] int32: class id, 0 = background, -1 = neutral
    idx_t: jax.Array    # [P] int32: index of matched gt row
    ids_t: jax.Array    # [P] int32: matched gt instance id (0 if not pos)
    pos_thresh: jax.Array  # [] effective (cla-adjusted) positive threshold


def match(pos_thresh: float, neg_thresh: float,
          gt_boxes: jax.Array, gt_labels: jax.Array, gt_ids: jax.Array,
          gt_valid: jax.Array, priors: jax.Array, conf_data: jax.Array,
          crowd_boxes: Optional[jax.Array] = None,
          crowd_valid: Optional[jax.Array] = None,
          crowd_iou_threshold: float = 0.7) -> MatchResult:
    """Match priors to (padded) ground truth for one frame.

    Args:
      gt_boxes: [G, 4] point form, zero rows where ~gt_valid.
      gt_labels: [G] int class ids (1..C-1).
      gt_ids: [G] int instance ids (>0).
      gt_valid: [G] bool.
      priors: [P, 4] cxcywh.
      conf_data: [P, C] raw class logits of this frame.
      crowd_boxes / crowd_valid: optional [Gc, 4] / [Gc] crowd regions; any
        *negative* anchor with crowd IoA above ``crowd_iou_threshold``
        becomes neutral (reference multibox_loss.py crowd handling).
    """
    num_gt = gt_boxes.shape[0]
    decoded_priors = point_form(priors)

    overlaps = jaccard(gt_boxes, decoded_priors)                 # [G, P]
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

    best_truth_overlap = jnp.max(overlaps, axis=0)               # [P]
    best_truth_idx = jnp.argmax(overlaps, axis=0)                # [P]

    # (1) veto anchors that contain >1 instance with near-positive IoU
    multi_instance = jnp.sum(
        (overlaps > pos_thresh - 0.1) & gt_valid[:, None], axis=0) > 1
    best_truth_overlap = jnp.where(
        multi_instance, (pos_thresh + neg_thresh) / 2, best_truth_overlap)

    # (2) classification-score threshold adjustment
    keep_cla = best_truth_overlap > pos_thresh
    labels_for_prior = gt_labels[best_truth_idx]                 # [P]
    logz = jax.nn.logsumexp(conf_data, axis=-1)                  # [P]
    ce = logz - jnp.take_along_axis(
        conf_data, labels_for_prior[:, None], axis=-1)[:, 0]
    # 2/(1+exp(ce)) written as 2*sigmoid(-ce): same value, but no exp
    # overflow (and no NaN in the backward) for large cross-entropies
    cla_score = 2.0 * jax.nn.sigmoid(-ce)                        # in [0, 1]
    best_truth_overlap = jnp.where(
        keep_cla, best_truth_overlap + cla_score, best_truth_overlap)
    n_keep = jnp.sum(keep_cla)
    cla_thresh = jnp.where(
        n_keep > 0,
        jnp.sum(jnp.where(keep_cla, cla_score, 0.0)) / jnp.maximum(n_keep, 1),
        0.0)
    pos_t = pos_thresh + cla_thresh
    neg_t = neg_thresh + cla_thresh

    # (3) force the best anchor for every (valid) gt, greedily by overlap
    def body(_, state):
        ov, bto, bti = state
        best_prior_overlap = jnp.max(ov, axis=1)                 # [G]
        j = jnp.argmax(best_prior_overlap)                       # best gt
        i = jnp.argmax(ov[j])                                    # its anchor
        valid = best_prior_overlap[j] >= 0.0                     # skip padding
        ov = jnp.where(valid, ov.at[:, i].set(-1.0).at[j, :].set(-1.0), ov)
        bto = jnp.where(valid, bto.at[i].set(2.0), bto)
        bti = jnp.where(valid, bti.at[i].set(j), bti)
        return ov, bto, bti

    _, best_truth_overlap, best_truth_idx = jax.lax.fori_loop(
        0, num_gt, body, (overlaps, best_truth_overlap, best_truth_idx))

    matches = gt_boxes[best_truth_idx]                           # [P, 4]
    conf = gt_labels[best_truth_idx].astype(jnp.int32)
    conf = jnp.where(best_truth_overlap < pos_t, -1, conf)
    conf = jnp.where(best_truth_overlap < neg_t, 0, conf)
    ids = gt_ids[best_truth_idx].astype(jnp.int32)
    ids = jnp.where(best_truth_overlap < pos_t, 0, ids)

    if crowd_boxes is not None:
        # IoA of each prior against crowd regions (iscrowd puts crowd in b)
        ioa = jaccard(decoded_priors, crowd_boxes, iscrowd=True)  # [P, Gc]
        if crowd_valid is not None:
            ioa = jnp.where(crowd_valid[None, :], ioa, 0.0)
        in_crowd = jnp.max(ioa, axis=1) > crowd_iou_threshold
        conf = jnp.where((conf <= 0) & in_crowd, -1, conf)

    loc = encode(matches, priors)
    return MatchResult(loc, conf, best_truth_idx.astype(jnp.int32), ids,
                       pos_t)
