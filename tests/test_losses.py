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


def test_focal_conf_softmax_dead_code_parity():
    """focal_conf_loss is reference-dead-code parity (defined at
    multibox_loss.py:459, never dispatched at :195-200): assert (1) it is
    NOT reachable through compute_losses under any focal flag, and (2) the
    function itself computes a finite positive value with the documented
    OHEM-selection semantics, so it stays correct if ever wired."""
    rng = np.random.RandomState(12)
    gt = _gt(rng)
    preds = _preds(rng)
    priors = jnp.asarray(P)
    t = L.match_batch(CFG, priors, preds, gt)

    loss = float(L.focal_conf_loss(CFG, preds, t))
    assert np.isfinite(loss) and loss > 0

    # dispatch check: sigmoid flag routes to the sigmoid variant, default
    # routes to OHEM — the softmax focal value appears under neither
    got_default = float(L.compute_losses(CFG, preds, gt, priors)['C'])
    cfg_sig = CFG.replace(use_sigmoid_focal_loss=True)
    got_sig = float(L.compute_losses(cfg_sig, preds, gt, priors)['C'])
    f = preds['conf'].shape[0]
    assert got_default == float(L.ohem_conf_loss(CFG, preds, t)) / f
    assert got_sig == float(L.focal_conf_sigmoid_loss(cfg_sig, preds, t)) / f
    assert not np.isclose(loss / f, got_default) \
        and not np.isclose(loss / f, got_sig)


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


def test_coeff_diversity_prefers_similar_same_instance_coeffs():
    """'D' semantics (multibox_loss.py:519-542): same-instance coefficients
    aligned within a clip should score lower than anti-aligned ones."""
    rng = np.random.RandomState(7)
    gt = _gt(rng)
    priors = jnp.asarray(P)
    preds = _preds(rng)
    t = L.match_batch(CFG, priors, preds, gt)

    co = np.zeros((F, NP_, 32), np.float32)
    co[..., 0] = 1.0                       # all positives identical
    good = dict(preds)
    good['mask_coeff'] = jnp.asarray(co)
    co2 = co.copy()
    co2[1] = 0.0
    co2[1, :, 1] = 1.0                     # frame 2 orthogonal to frame 1
    bad = dict(preds)
    bad['mask_coeff'] = jnp.asarray(co2)
    lg = float(L.coeff_diversity_loss(CFG, good, t))
    lb = float(L.coeff_diversity_loss(CFG, bad, t))
    assert np.isfinite(lg) and np.isfinite(lb) and lg < lb


def test_proto_loss_l1_and_disj():
    """'P' knob (multibox_loss.py:188-192 + hardcoded constants :46-49)."""
    rng = np.random.RandomState(8)
    preds = _preds(rng)
    cfg_l1 = CFG.replace(mask_proto_loss='l1')
    got = float(L.proto_loss(cfg_l1, preds))
    want = float(np.mean(np.abs(np.asarray(preds['proto'])))
                 / (20 * 20 / 70 / 70) * 0.1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    cfg_dj = CFG.replace(mask_proto_loss='disj')
    assert np.isfinite(float(L.proto_loss(cfg_dj, preds)))


def test_maskiou_direct_loss_zero_at_perfect_mask():
    """'MIoU' (multibox_loss.py:618-626): binarized pred == gt -> IoU 1 ->
    loss 0; a wrong mask gives a positive loss. Also: no gradient flows
    (reference .gt(0.5) detach quirk)."""
    rng = np.random.RandomState(9)
    gt = _gt(rng)
    priors = jnp.asarray(P)
    proto = np.full((F, HP, WP, 32), -20.0, np.float32)
    proto[..., 0] = np.asarray(gt['masks_proto'][:, 0] * 40.0 - 20.0)
    preds = _preds(rng)
    preds['proto'] = jnp.asarray(proto)
    co = np.zeros((F, NP_, 32), np.float32)
    co[..., 0] = 1.0
    good = dict(preds, mask_coeff=jnp.asarray(co))
    bad = dict(preds, mask_coeff=jnp.asarray(-co))
    # perfect loc so the crop box covers the gt
    enc = B.encode(jnp.broadcast_to(gt['boxes'][:, 0:1], (F, NP_, 4)),
                   priors[None])
    good['loc'] = bad['loc'] = jnp.asarray(enc)
    t = L.match_batch(CFG, priors, good, gt)
    lg = float(L.maskiou_direct_loss(CFG, priors, good, t,
                                     gt['masks_proto']))
    lb = float(L.maskiou_direct_loss(CFG, priors, bad, t,
                                     gt['masks_proto']))
    assert lg < 0.35 * CFG.maskiou_alpha      # near-perfect IoU
    assert lb > lg
    # detached: zero gradient wrt coefficients
    g = jax.grad(lambda c: L.maskiou_direct_loss(
        CFG, priors, dict(good, mask_coeff=c), t, gt['masks_proto']))(
            good['mask_coeff'])
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_dormant_knobs_dispatch_through_compute_losses():
    """VERDICT r3 #6: every reference loss key producible by some config —
    D/P/MIoU appear in compute_losses output iff their flags are on."""
    rng = np.random.RandomState(10)
    gt = _gt(rng)
    preds = _preds(rng)
    priors = jnp.asarray(P)

    off = L.compute_losses(CFG, preds, gt, priors)
    assert not {'D', 'P', 'MIoU'} & set(off)

    cfg_on = CFG.replace(mask_proto_coeff_diversity_loss=True,
                         mask_proto_loss='l1', use_maskiou_loss=True)
    on = L.compute_losses(cfg_on, preds, gt, priors)
    assert {'D', 'P', 'MIoU'} <= set(on)
    for k in ('D', 'P', 'MIoU'):
        assert np.isfinite(float(on[k])), k


def test_ohem_and_centerness_match_reference_torch_at_batch8():
    """VERDICT #6: the reference's OHEM conf + centerness normalization
    (multibox_loss.py:428-457 — per-image pos weights, neg_weights
    1/num_neg*ratio*F, sum / (ratio+1), NO /F) reproduced in torch from
    scratch must equal ours bit-for-bit on identical random logits/targets
    at batch 8 (F=16 frames)."""
    import pytest
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(42)
    f, p, c = 16, 120, CFG.num_classes
    conf = rng.randn(f, p, c).astype(np.float32)
    # targets: ~5 positives/frame, a few neutrals, rest background
    conf_t = np.zeros((f, p), np.int32)
    for i in range(f):
        pos_idx = rng.choice(p, 5, replace=False)
        conf_t[i, pos_idx] = rng.randint(1, c, 5)
        neu = rng.choice(np.setdiff1d(np.arange(p), pos_idx), 3,
                         replace=False)
        conf_t[i, neu] = -1

    # ---- reference computation in torch (from the written equations) ----
    tc = torch.from_numpy(conf).reshape(-1, c)
    tt = torch.from_numpy(conf_t).reshape(-1).long()
    pos = tt > 0
    neu = tt < 0
    loss_c = torch.logsumexp(tc, dim=-1) - tc[:, 0]
    loss_c[pos] = 0
    loss_c[neu] = 0
    num_pos = int(pos.sum())
    ratio = CFG.ohem_negpos_ratio
    num_neg = min(ratio * num_pos, f * p - 1)
    _, idx = loss_c.sort(descending=True)
    neg = torch.zeros_like(tt, dtype=torch.bool)
    neg[idx[:num_neg]] = True
    neg[pos] = False
    neg[neu] = False
    # per-frame pos weights
    posw = torch.zeros(f * p)
    for i in range(f):
        sl = slice(i * p, (i + 1) * p)
        n_i = int((tt[sl] > 0).sum())
        posw[sl][tt[sl] > 0] = 1.0 / max(n_i, 1)
    negw = torch.zeros(f * p)
    negw[neg] = 1.0 / max(int(neg.sum()), 1) * ratio * f
    w = torch.where(pos, posw, negw)
    ce = torch.nn.functional.cross_entropy(
        tc, tt.clamp(min=0), reduction='none')
    ce = torch.where(pos | neg, ce, torch.zeros(()))
    ref_c = CFG.conf_alpha * float((w * ce).sum()) / (ratio + 1)

    # ---- ours ----
    pos_np = conf_t > 0
    n_pos = pos_np.sum(1, keepdims=True)
    pos_w = pos_np.astype(np.float32) / np.maximum(n_pos, 1)
    t = L.MatchedTargets(
        loc_t=jnp.zeros((f, p, 4)), conf_t=jnp.asarray(conf_t),
        idx_t=jnp.zeros((f, p), jnp.int32),
        ids_t=jnp.zeros((f, p), jnp.int32),
        gt_box_t=jnp.zeros((f, p, 4)), pos=jnp.asarray(pos_np),
        pos_w=jnp.asarray(pos_w))
    got_c = float(L.ohem_conf_loss(CFG, {'conf': jnp.asarray(conf)}, t))
    np.testing.assert_allclose(got_c, ref_c, rtol=2e-5)

    # ---- centerness: same sum-with-pos-weights, no /F ----
    centerness = np.tanh(rng.randn(f, p, 1)).astype(np.float32)
    loc = (rng.randn(f, p, 4) * 0.1).astype(np.float32)
    priors_f = np.tile(P[:1], (p, 1)).astype(np.float32)
    gt_box = np.tile(np.asarray([[0.2, 0.2, 0.7, 0.8]], np.float32),
                     (f, p, 1))
    t2 = t._replace(gt_box_t=jnp.asarray(gt_box))
    got_cn = float(L.centerness_loss(
        CFG, jnp.asarray(priors_f),
        {'loc': jnp.asarray(loc), 'centerness': jnp.asarray(centerness)},
        t2))
    # reference: center_alpha * sum(pos_w * smooth_l1(centerness, DIoU))
    diou = np.asarray(B.elemwise_diou(
        B.decode(jnp.asarray(loc), jnp.asarray(priors_f)[None]),
        jnp.asarray(gt_box)))
    d = np.abs(centerness[..., 0] - diou)
    sl1 = np.where(d < 1, 0.5 * d * d, d - 0.5)
    ref_cn = CFG.center_alpha * float((pos_w * sl1).sum())
    np.testing.assert_allclose(got_cn, ref_cn, rtol=2e-5)


def test_losses_scale_linearly_with_frames():
    """The sum normalization means doubling the batch doubles C/B/M/center
    (which the reference's lr-per-batch autoscaling assumes)."""
    rng = np.random.RandomState(0)
    gt = _gt(rng)
    preds = _preds(rng)
    pj = jnp.asarray(P)
    t1 = L.match_batch(CFG, pj, preds, gt)

    gt2 = {k: jnp.concatenate([v, v]) for k, v in gt.items()}
    preds2 = {k: jnp.concatenate([v, v]) for k, v in preds.items()}
    t2 = L.match_batch(CFG, pj, preds2, gt2)

    for fn, args1, args2 in [
        (L.box_loss, (CFG, pj, preds, t1), (CFG, pj, preds2, t2)),
        (L.ohem_conf_loss, (CFG, preds, t1), (CFG, preds2, t2)),
        (L.centerness_loss, (CFG, pj, preds, t1), (CFG, pj, preds2, t2)),
        (L.lincomb_mask_loss, (CFG, pj, preds, t1, gt['masks_proto']),
         (CFG, pj, preds2, t2, gt2['masks_proto'])),
    ]:
        a = float(fn(*args1))
        b = float(fn(*args2))
        np.testing.assert_allclose(b, 2 * a, rtol=1e-4,
                                   err_msg=fn.__name__)


def test_compute_losses_global_frame_division():
    """Reference multibox_loss.py:214: the multibox-group losses are
    divided by the flattened frame count (so duplicating the batch leaves
    them unchanged — per-frame means), while T (multibox_loss.py:113,
    internally /sum-of-pair-weights) and B_shift/M_shift (:107-111,
    internally /clips) are attached after that division and must NOT be
    divided again.  Found-by-audit regression test for the round-5 fix."""
    rng = np.random.RandomState(11)
    gt = _gt(rng)
    preds = _preds(rng)
    pj = jnp.asarray(P)

    l1 = L.compute_losses(CFG, preds, gt, pj)
    gt2 = {k: jnp.concatenate([v, v]) for k, v in gt.items()}
    preds2 = {k: jnp.concatenate([v, v]) for k, v in preds.items()}
    l2 = L.compute_losses(CFG, preds2, gt2, pj)

    # per-frame means: invariant under batch duplication
    for k in ('BIoU', 'C', 'center', 'M'):
        np.testing.assert_allclose(float(l2[k]), float(l1[k]), rtol=1e-4,
                                   err_msg=k)
    # T is pairwise over ALL positives in the flattened batch (reference
    # multibox_loss.py:328-351) — duplicating the batch creates new
    # cross-copy pairs, so it is NOT duplication-invariant; just assert it
    # was not divided by F (it must be unchanged by the global division).
    t1 = L.match_batch(CFG, pj, preds, gt)
    raw_t = float(L.track_loss(CFG, preds, t1))
    np.testing.assert_allclose(float(l1['T']), raw_t, rtol=1e-6)
    # and the raw component functions stay reference-scale frame SUMS
    raw = float(L.box_loss(CFG, pj, preds, t1))
    np.testing.assert_allclose(float(l1['BIoU']), raw / F, rtol=1e-6)


def test_crowd_neutralizes_negative_anchor_end_to_end():
    """VERDICT #7: a negative anchor overlapping an iscrowd region (IoA >
    crowd_iou_threshold) must become neutral (conf_t == -1) when crowds are
    plumbed through match_batch via the gt dict."""
    rng = np.random.RandomState(1)
    gt = dict(_gt(rng))
    preds = _preds(rng)
    pj = jnp.asarray(P)

    # crowd region covering a far corner where no gt lives
    gc = 3
    crowd = np.zeros((F, gc, 4), np.float32)
    crowd_valid = np.zeros((F, gc), bool)
    crowd[:, 0] = [0.55, 0.55, 1.0, 1.0]
    crowd_valid[:, 0] = True
    gt['crowd_boxes'] = jnp.asarray(crowd)
    gt['crowd_valid'] = jnp.asarray(crowd_valid)

    t_with = L.match_batch(CFG, pj, preds, gt)
    gt_no = {k: v for k, v in gt.items()
             if k not in ('crowd_boxes', 'crowd_valid')}
    t_without = L.match_batch(CFG, pj, preds, gt_no)

    ct_w = np.asarray(t_with.conf_t)
    ct_wo = np.asarray(t_without.conf_t)
    # anchors whose IoA with the crowd exceeds the threshold
    from stmask_tpu.ops.boxes import jaccard, point_form
    pf = point_form(pj)
    ioa = np.asarray(jaccard(pf, jnp.asarray(crowd[0, :1]),
                             iscrowd=True))[:, 0]
    inside = ioa > CFG.crowd_iou_threshold
    changed = inside & (ct_wo[0] == 0)
    assert changed.any(), 'fixture broken: no negative anchor in crowd'
    assert np.all(ct_w[0][changed] == -1), \
        'crowd-overlapping negatives must be neutral'
    # positives unaffected
    pos = ct_wo[0] > 0
    np.testing.assert_array_equal(ct_w[0][pos], ct_wo[0][pos])


def test_loader_emits_crowd_keys(tmp_path):
    """The YTVIS loader routes iscrowd annotations into padded crowd_boxes/
    crowd_valid batch keys (never as trainable gt)."""
    import json as _json
    import cv2
    from stmask_tpu.data import ClipLoader, YTVISDataset
    vid_dir = tmp_path / 'v'
    vid_dir.mkdir()
    for f in range(2):
        cv2.imwrite(str(vid_dir / f'{f}.jpg'),
                    np.zeros((90, 160, 3), np.uint8))
    ann = {
        'videos': [{'id': 1, 'height': 90, 'width': 160,
                    'file_names': ['v/0.jpg', 'v/1.jpg']}],
        'categories': [{'id': 1, 'name': 'thing'}],
        'annotations': [
            {'id': 1, 'video_id': 1, 'category_id': 1,
             'bboxes': [[10, 10, 50, 40]] * 2,
             'segmentations': [None] * 2, 'iscrowd': 0},
            {'id': 2, 'video_id': 1, 'category_id': 1,
             'bboxes': [[100, 50, 50, 30]] * 2,
             'segmentations': [None] * 2, 'iscrowd': 1},
        ],
    }
    # give the non-crowd annotation a real mask so train_index includes it
    ann['annotations'][0]['segmentations'] = [
        {'size': [90, 160], 'counts': None}, None]
    # simpler: polygon masks
    ann['annotations'][0]['segmentations'] = [
        [[10, 10, 60, 10, 60, 50, 10, 50]]] * 2
    af = tmp_path / 'ann.json'
    af.write_text(_json.dumps(ann))

    cfg = CFG.replace(img_w=128, img_h=96)
    ds = YTVISDataset(str(af), str(tmp_path))
    loader = ClipLoader(cfg, ds, batch_size=1, num_workers=1)
    batch = next(iter(loader.epoch(0)))
    assert batch['crowd_boxes'].shape == (1, 2, cfg.crowd_capacity, 4)
    assert batch['crowd_valid'][0, 0, 0]           # the crowd region
    assert not batch['crowd_valid'][0, 0, 1:].any()
    # the crowd is not in the trainable gt
    assert batch['valid'][0, 0].sum() == 1
