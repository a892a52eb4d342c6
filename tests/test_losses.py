"""Behavioral unit tests for the loss components (tiny synthetic priors)."""

import numpy as np
import jax
import jax.numpy as jnp

from stmask_tpu.config import get_config
from stmask_tpu.ops import boxes as B
from stmask_tpu.ops.anchors import make_priors
from stmask_tpu.train import losses as L

CFG = get_config('STMask_plus_resnet50').replace(
    max_gt_per_frame=4, masks_to_train=8)

P = make_priors(8, 8, [(3, 3)], [24.0])   # 64 priors
NP_ = P.shape[0]
F = 2
G = 4
HP = WP = 16


def _gt(rng):
    gt_boxes = np.zeros((F, G, 4), np.float32)
    gt_labels = np.zeros((F, G), np.int32)
    gt_ids = np.zeros((F, G), np.int32)
    gt_valid = np.zeros((F, G), bool)
    masks = np.zeros((F, G, HP, WP), np.uint8)
    for f in range(F):
        gt_boxes[f, 0] = [0.1, 0.1, 0.5, 0.6]
        gt_labels[f, 0] = 3
        gt_ids[f, 0] = 7
        gt_valid[f, 0] = True
        masks[f, 0, 2:9, 2:8] = 1
    return {'boxes': jnp.asarray(gt_boxes),
            'labels': jnp.asarray(gt_labels),
            'ids': jnp.asarray(gt_ids),
            'valid': jnp.asarray(gt_valid),
            'masks_proto': jnp.asarray(masks)}


def _preds(rng, loc=None):
    conf = rng.randn(F, NP_, CFG.num_classes).astype(np.float32)
    preds = {
        'loc': jnp.asarray(loc if loc is not None
                           else rng.randn(F, NP_, 4).astype(np.float32)
                           * 0.1),
        'conf': jnp.asarray(conf),
        'centerness': jnp.asarray(
            np.tanh(rng.randn(F, NP_, 1)).astype(np.float32)),
        'mask_coeff': jnp.asarray(
            rng.randn(F, NP_, 32).astype(np.float32) * 0.1),
        'track': jnp.asarray(rng.randn(F, NP_, 8).astype(np.float32)),
        'proto': jnp.asarray(
            np.abs(rng.randn(F, HP, WP, 32)).astype(np.float32)),
    }
    return preds


def test_box_loss_zero_at_perfect_prediction():
    rng = np.random.RandomState(0)
    gt = _gt(rng)
    priors = jnp.asarray(P)
    # perfect loc: encode gt box against every prior
    enc = B.encode(jnp.broadcast_to(gt['boxes'][:, 0:1], (F, NP_, 4)),
                   priors[None])
    preds = _preds(rng, loc=np.asarray(enc))
    t = L.match_batch(CFG, priors, preds, gt)
    loss = float(L.box_loss(CFG, priors, preds, t))
    assert loss < 1e-3   # DIoU == 1 for exact boxes


def test_ohem_conf_loss_positive_and_finite():
    rng = np.random.RandomState(1)
    gt = _gt(rng)
    priors = jnp.asarray(P)
    preds = _preds(rng)
    t = L.match_batch(CFG, priors, preds, gt)
    loss = float(L.ohem_conf_loss(CFG, preds, t))
    assert np.isfinite(loss) and loss > 0


def test_track_loss_prefers_consistent_embeddings():
    rng = np.random.RandomState(2)
    gt = _gt(rng)
    priors = jnp.asarray(P)
    preds = _preds(rng)
    t = L.match_batch(CFG, priors, preds, gt)

    # consistent: all positives (same instance) share one unit embedding
    e = np.zeros((F, NP_, 8), np.float32)
    e[..., 0] = 1.0
    good = dict(preds)
    good['track'] = jnp.asarray(e)
    # inconsistent: positives get orthogonal embeddings per frame
    e2 = np.zeros((F, NP_, 8), np.float32)
    e2[0, :, 0] = 1.0
    e2[1, :, 1] = 1.0
    bad = dict(preds)
    bad['track'] = jnp.asarray(e2)
    lg = float(L.track_loss(CFG, good, t))
    lb = float(L.track_loss(CFG, bad, t))
    assert lg < lb


def test_mask_loss_decreases_with_better_masks():
    rng = np.random.RandomState(3)
    gt = _gt(rng)
    priors = jnp.asarray(P)
    # proto channel 0 = exact gt mask; coeff selecting it => good mask
    proto = np.full((F, HP, WP, 32), -6.0, np.float32)
    proto[..., 0] = np.asarray(gt['masks_proto'][:, 0] * 12.0 - 6.0)
    preds = _preds(rng)
    preds['proto'] = jnp.asarray(np.maximum(proto, 0))
    good = dict(preds)
    co = np.zeros((F, NP_, 32), np.float32)
    co[..., 0] = 4.0
    good['mask_coeff'] = jnp.asarray(co)
    bad = dict(preds)
    bad['mask_coeff'] = jnp.asarray(-co)

    t = L.match_batch(CFG, priors, preds, gt)
    lg = float(L.lincomb_mask_loss(CFG, priors, good, t, gt['masks_proto']))
    lb = float(L.lincomb_mask_loss(CFG, priors, bad, t, gt['masks_proto']))
    assert lg < lb


def test_focal_loss_finite():
    rng = np.random.RandomState(4)
    gt = _gt(rng)
    priors = jnp.asarray(P)
    preds = _preds(rng)
    t = L.match_batch(CFG, priors, preds, gt)
    loss = float(L.focal_conf_sigmoid_loss(CFG, preds, t))
    assert np.isfinite(loss) and loss > 0


def test_semantic_segmentation_loss():
    rng = np.random.RandomState(5)
    gt = _gt(rng)
    segm = jnp.asarray(rng.randn(F, HP, WP,
                                 CFG.num_classes - 1).astype(np.float32))
    loss = float(L.semantic_segmentation_loss(
        CFG, segm, gt['masks_proto'], gt['labels'], gt['valid']))
    assert np.isfinite(loss) and loss > 0


def test_coeff_diversity_loss_runs():
    rng = np.random.RandomState(6)
    gt = _gt(rng)
    priors = jnp.asarray(P)
    preds = _preds(rng)
    t = L.match_batch(CFG, priors, preds, gt)
    loss = float(L.coeff_diversity_loss(CFG, preds, t))
    assert np.isfinite(loss)
