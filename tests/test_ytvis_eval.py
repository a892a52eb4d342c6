"""Self-contained YTVIS track-mAP evaluator sanity tests."""

import numpy as np

from stmask_tpu.utils import rle
from stmask_tpu.utils.ytvis_eval import evaluate_ytvis, _track_iou


def _mask(y0, x0, h=64, w=64, size=16):
    m = np.zeros((h, w), np.uint8)
    m[y0:y0 + size, x0:x0 + size] = 1
    return rle.encode(m)


def _gt(n_videos=2, n_frames=3):
    videos = [{'id': v, 'file_names': [f'{f}.jpg' for f in range(n_frames)],
               'height': 64, 'width': 64} for v in range(1, n_videos + 1)]
    annotations = []
    aid = 1
    for v in range(1, n_videos + 1):
        for obj in range(2):
            segs = [_mask(8 * f, 20 * obj + 4 * f) for f in range(n_frames)]
            annotations.append({'id': aid, 'video_id': v,
                                'category_id': obj + 1,
                                'segmentations': segs})
            aid += 1
    return {'videos': videos, 'annotations': annotations,
            'categories': [{'id': 1, 'name': 'a'}, {'id': 2, 'name': 'b'}]}


def test_track_iou_identity():
    t = [_mask(0, 0), _mask(8, 8)]
    assert _track_iou(t, t) == 1.0
    # disjoint
    t2 = [_mask(40, 40), _mask(40, 40)]
    assert _track_iou(t, t2) == 0.0
    # missing frame counts as union-only
    t3 = [t[0], None]
    iou = _track_iou(t, t3)
    assert 0 < iou < 1


def test_perfect_predictions_give_map_1():
    gt = _gt()
    dt = [{'video_id': a['video_id'], 'score': 0.9,
           'category_id': a['category_id'],
           'segmentations': a['segmentations']}
          for a in gt['annotations']]
    stats = evaluate_ytvis(gt, dt)
    assert stats['mAP'] > 0.99
    assert stats['AP50'] > 0.99


def test_wrong_category_scores_zero():
    gt = _gt()
    dt = [{'video_id': a['video_id'], 'score': 0.9,
           'category_id': 3 - a['category_id'],   # swap categories
           'segmentations': a['segmentations']}
          for a in gt['annotations']]
    stats = evaluate_ytvis(gt, dt)
    assert stats['mAP'] < 0.05


def test_half_detected():
    gt = _gt()
    dt = [{'video_id': a['video_id'], 'score': 0.9,
           'category_id': a['category_id'],
           'segmentations': a['segmentations']}
          for a in gt['annotations'] if a['category_id'] == 1]
    stats = evaluate_ytvis(gt, dt)
    # category 1 perfect, category 2 zero -> mAP ~0.5
    assert 0.4 < stats['mAP'] < 0.6


def test_empty_predictions():
    gt = _gt()
    stats = evaluate_ytvis(gt, [])
    assert stats['mAP'] == 0.0
