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


# ---- cross-check against the vendored cocoeval/ytvoseval oracle ----

def _rle_box(h, w, y1, y2, x1, x2):
    import numpy as np
    from stmask_tpu.utils import rle as rle_util
    m = np.zeros((h, w), np.uint8)
    m[y1:y2, x1:x2] = 1
    return rle_util.encode(m)


def _oracle_fixture():
    """Multi-video, multi-category fixture with crowds, duplicates, score
    interleavings, missing frames, and an undetected gt."""
    import numpy as np
    h, w = 32, 48
    gt = {
        'videos': [{'id': 1, 'height': h, 'width': w,
                    'file_names': ['a', 'b']},
                   {'id': 2, 'height': h, 'width': w,
                    'file_names': ['a', 'b', 'c']}],
        'categories': [{'id': 1, 'name': 'x'}, {'id': 2, 'name': 'y'}],
        'annotations': [
            {'id': 1, 'video_id': 1, 'category_id': 1,
             'segmentations': [_rle_box(h, w, 2, 12, 2, 14),
                               _rle_box(h, w, 3, 13, 3, 15)]},
            {'id': 2, 'video_id': 1, 'category_id': 2,
             'segmentations': [_rle_box(h, w, 18, 30, 20, 40), None]},
            # crowd region overlapping nothing in particular
            {'id': 3, 'video_id': 1, 'category_id': 1, 'iscrowd': 1,
             'segmentations': [_rle_box(h, w, 0, 32, 30, 48), None]},
            {'id': 4, 'video_id': 2, 'category_id': 1,
             'segmentations': [None, _rle_box(h, w, 5, 15, 5, 17),
                               _rle_box(h, w, 6, 16, 6, 18)]},
            # never detected
            {'id': 5, 'video_id': 2, 'category_id': 2,
             'segmentations': [_rle_box(h, w, 20, 30, 2, 12)] * 3},
        ],
    }
    dt = [
        # good match for gt 1
        {'video_id': 1, 'category_id': 1, 'score': 0.9,
         'segmentations': [_rle_box(h, w, 2, 12, 2, 14),
                           _rle_box(h, w, 3, 13, 3, 15)]},
        # duplicate of it, lower score -> FP at high thresholds
        {'video_id': 1, 'category_id': 1, 'score': 0.6,
         'segmentations': [_rle_box(h, w, 2, 13, 2, 15),
                           _rle_box(h, w, 3, 14, 3, 16)]},
        # det fully inside the crowd region -> ignored, not FP; score
        # interleaves between the two true positives so that (without the
        # crowd) it would dent the precision envelope
        {'video_id': 1, 'category_id': 1, 'score': 0.87,
         'segmentations': [_rle_box(h, w, 10, 20, 35, 45), None]},
        # partial match for gt 2 (IoU ~ 0.5-0.7)
        {'video_id': 1, 'category_id': 2, 'score': 0.8,
         'segmentations': [_rle_box(h, w, 18, 30, 24, 40), None]},
        # good match for gt 4, one frame missing
        {'video_id': 2, 'category_id': 1, 'score': 0.85,
         'segmentations': [None, _rle_box(h, w, 5, 15, 5, 17), None]},
        # background junk
        {'video_id': 2, 'category_id': 1, 'score': 0.3,
         'segmentations': [_rle_box(h, w, 25, 31, 40, 47)] * 3},
    ]
    return gt, dt


def test_evaluator_matches_cocoeval_oracle():
    """VERDICT #9: identical mAP/AP50/AP75/AR vs an independently structured
    cocoeval/ytvoseval implementation on a fixture with crowds."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    from ytvoseval_oracle import evaluate as oracle_eval
    from stmask_tpu.utils.ytvis_eval import evaluate_ytvis

    gt, dt = _oracle_fixture()
    ours = evaluate_ytvis(gt, dt)
    ref = oracle_eval(gt, dt)
    for k in ('mAP', 'AP50', 'AP75', 'AR'):
        np.testing.assert_allclose(ours[k], ref[k], atol=1e-9, err_msg=k)
    # sanity: the fixture is discriminative (not all-zero / all-one)
    assert 0.05 < ours['mAP'] < 0.95
    assert ours['AP50'] > ours['mAP']


def test_evaluator_crowd_absorbs_detection():
    """A detection inside a crowd region must not count as FP (its removal
    must not change AP), but a real FP must lower AP."""
    import copy
    from stmask_tpu.utils.ytvis_eval import evaluate_ytvis
    gt, dt = _oracle_fixture()
    with_crowd_det = evaluate_ytvis(gt, dt)
    no_crowd_det = evaluate_ytvis(
        gt, [d for d in dt
             if not (d['video_id'] == 1 and d['score'] == 0.87)])
    assert with_crowd_det['mAP'] == no_crowd_det['mAP']

    # same detection, crowd ann removed -> now a genuine FP -> AP drops
    gt2 = copy.deepcopy(gt)
    gt2['annotations'] = [a for a in gt2['annotations'] if a['id'] != 3]
    as_fp = evaluate_ytvis(gt2, dt)
    assert as_fp['mAP'] < with_crowd_det['mAP']
