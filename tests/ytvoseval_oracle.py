"""Test-only oracle: the cocoeval/ytvoseval accumulation algorithm.

pycocotools is not installed in this environment, so this reimplements the
official evaluator's *structure* from scratch (per-(video,category)
``evaluateImg`` producing dtm/gtm match matrices, then a global
``accumulate`` with 101-point interpolated precision) as an independent
cross-check for ``stmask_tpu.utils.ytvis_eval``.  Mask IoU is
spatio-temporal (sum of per-frame intersections / unions over the track,
crowd gt using the det-area union), as in the youtubevos cocoapi.

This file is deliberately organized like pycocotools.cocoeval (state
matrices, -1 sentinels, per-threshold loops) rather than like the
production evaluator, so index/ordering bugs in either implementation
surface as disagreements.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from stmask_tpu.utils import rle as rle_util

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
REC_THRS = np.linspace(0.0, 1.0, 101)


def track_iou(dt_segm, gt_segm, iscrowd):
    n = max(len(dt_segm), len(gt_segm))
    i_sum = 0.0
    u_sum = 0.0
    for f in range(n):
        d = dt_segm[f] if f < len(dt_segm) else None
        g = gt_segm[f] if f < len(gt_segm) else None
        if d is None and g is None:
            continue
        if d is None:
            if not iscrowd:
                u_sum += rle_util.area(g)
            continue
        if g is None:
            u_sum += rle_util.area(d)
            continue
        md = rle_util.decode(d).astype(bool)
        mg = rle_util.decode(g).astype(bool)
        i_sum += np.logical_and(md, mg).sum()
        u_sum += md.sum() if iscrowd else np.logical_or(md, mg).sum()
    return i_sum / u_sum if u_sum > 0 else 0.0


def evaluate_vid(gts, dts, max_dets):
    """cocoeval.evaluateImg for one (video, category): returns dict with
    dtMatches [T, D], gtIgnore [G], dtIgnore [T, D], dtScores [D]."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    gt_ig = np.asarray([int(g.get('iscrowd', 0)) for g in gts])
    gtind = np.argsort(gt_ig, kind='mergesort')     # non-ignored first
    gts = [gts[i] for i in gtind]
    gt_ig = gt_ig[gtind]
    dtind = np.argsort([-d['score'] for d in dts], kind='mergesort')
    dts = [dts[i] for i in dtind][:max_dets]

    ious = np.zeros((len(dts), len(gts)))
    for dind, d in enumerate(dts):
        for gind, g in enumerate(gts):
            ious[dind, gind] = track_iou(d['segmentations'],
                                         g['segmentations'],
                                         bool(gt_ig[gind]))

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min([t, 1 - 1e-10])
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0 and not gt_ig[gind]:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = 1
            gtm[tind, m] = 1
    return {
        'dtMatches': dtm,
        'dtIgnore': dt_ig,
        'gtIgnore': gt_ig,
        'dtScores': np.asarray([d['score'] for d in dts]),
    }


def evaluate(gt_json, dt_json, max_dets=100):
    """cocoeval.accumulate over all (video, category) cells; returns
    dict(mAP, AP50, AP75, AR)."""
    gt_by = defaultdict(list)
    for a in gt_json.get('annotations', []):
        gt_by[(a['video_id'], a['category_id'])].append(a)
    dt_by = defaultdict(list)
    for d in dt_json:
        dt_by[(d['video_id'], d['category_id'])].append(d)
    vid_ids = [v['id'] for v in gt_json['videos']]
    cat_ids = sorted({a['category_id']
                      for a in gt_json.get('annotations', [])
                      if not a.get('iscrowd', 0)})

    T = len(IOU_THRS)
    R = len(REC_THRS)
    precision = -np.ones((T, R, len(cat_ids)))
    recall = -np.ones((T, len(cat_ids)))
    for k, cat in enumerate(cat_ids):
        evals = [evaluate_vid(gt_by.get((v, cat), []),
                              dt_by.get((v, cat), []), max_dets)
                 for v in vid_ids]
        evals = [e for e in evals if e is not None]
        if not evals:
            continue
        dt_scores = np.concatenate([e['dtScores'] for e in evals])
        inds = np.argsort(-dt_scores, kind='mergesort')
        dtm = np.concatenate([e['dtMatches'] for e in evals],
                             axis=1)[:, inds]
        dt_ig = np.concatenate([e['dtIgnore'] for e in evals],
                               axis=1)[:, inds]
        gt_ig = np.concatenate([e['gtIgnore'] for e in evals])
        npig = int((gt_ig == 0).sum())
        if npig == 0:
            continue
        tps = np.logical_and(dtm, np.logical_not(dt_ig))
        fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
        tp_sum = np.cumsum(tps, axis=1).astype(float)
        fp_sum = np.cumsum(fps, axis=1).astype(float)
        for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            q = np.zeros(R)
            recall[t, k] = rc[-1] if nd else 0
            pr = pr.tolist()
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds_r = np.searchsorted(rc, REC_THRS, side='left')
            for ri, pi in enumerate(inds_r):
                if pi < nd:
                    q[ri] = pr[pi]
            precision[t, :, k] = q

    def _summ(prec_slice):
        valid = prec_slice[prec_slice > -1]
        return float(valid.mean()) if valid.size else 0.0

    rec_valid = recall[recall > -1]
    return {
        'mAP': _summ(precision),
        'AP50': _summ(precision[0]),
        'AP75': _summ(precision[IOU_THRS.tolist().index(0.75)]),
        'AR': float(rec_valid.mean()) if rec_valid.size else 0.0,
    }
