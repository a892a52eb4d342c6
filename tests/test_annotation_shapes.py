"""Real-annotation-shape robustness (VERDICT r4 #8): one YTVIS-format
fixture carrying every segmentation/bbox shape real data has — polygon
lists, compressed RLE strings, uncompressed count lists, per-frame nulls,
iscrowd regions, missing bboxes (box from mask), bbox-only frames — driven
through YTVISDataset -> ClipLoader -> train_step AND the eval driver ->
results JSON + metrics, so first contact with real data cannot fail on
parsing.  Matches reference ytvos.py:376-448 annotation handling.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stmask_tpu.config import get_config
from stmask_tpu.data import ClipLoader, YTVISDataset
from stmask_tpu.utils import rle as rle_util

H, W = 96, 160
NF = 4


def _rect_mask(x1, y1, x2, y2):
    m = np.zeros((H, W), np.uint8)
    m[y1:y2, x1:x2] = 1
    return m


def _counts_list(mask):
    """Uncompressed RLE counts (list of ints, Fortran order) — the
    cocoapi 'uncompressed RLE' annotation shape."""
    return {'size': [H, W],
            'counts': [int(c) for c in rle_util.mask_to_counts(mask)]}


def _poly(x1, y1, x2, y2):
    return [[float(x1), float(y1), float(x2), float(y1),
             float(x2), float(y2), float(x1), float(y2)]]


@pytest.fixture(scope='module')
def fixture_dir(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('annshapes')
    img_dir = root / 'imgs' / 'v01'
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = []
    for f in range(NF):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        cv2.imwrite(str(img_dir / f'{f:02d}.jpg'), img)
        names.append(f'v01/{f:02d}.jpg')

    r1 = [20, 10, 70, 60]    # instance 1 geometry (static)
    r2 = [80, 30, 140, 80]   # instance 2
    m1 = _rect_mask(*r1)
    m2 = _rect_mask(*r2)

    ann = {
        'videos': [{'id': 1, 'file_names': names, 'height': H, 'width': W}],
        'categories': [{'id': 1, 'name': 'a'}, {'id': 2, 'name': 'b'}],
        'annotations': [
            # 1: polygons, with a per-frame null in frame 2
            {'id': 1, 'video_id': 1, 'category_id': 1, 'iscrowd': 0,
             'segmentations': [_poly(*r1), _poly(*r1), None, _poly(*r1)],
             'bboxes': [[r1[0], r1[1], r1[2] - r1[0], r1[3] - r1[1]]] * NF},
            # 2: compressed RLE strings, NO bboxes key (box from mask)
            {'id': 2, 'video_id': 1, 'category_id': 2,
             'segmentations': [rle_util.encode(m2)] * NF},
            # 3: uncompressed count lists, bboxes with a None frame
            {'id': 3, 'video_id': 1, 'category_id': 1, 'iscrowd': 0,
             'segmentations': [_counts_list(m1)] * NF,
             'bboxes': [[r1[0], r1[1], r1[2] - r1[0], r1[3] - r1[1]],
                        None,
                        [r1[0], r1[1], r1[2] - r1[0], r1[3] - r1[1]],
                        None]},
            # 4: crowd region, bbox-only (segmentations all None)
            {'id': 4, 'video_id': 1, 'category_id': 1, 'iscrowd': 1,
             'segmentations': [None] * NF,
             'bboxes': [[0, 0, 40, 30]] * NF},
        ],
    }
    af = root / 'ann.json'
    af.write_text(json.dumps(ann))
    return str(af), str(root / 'imgs')


def test_parser_handles_every_shape(fixture_dir):
    ann_file, img_prefix = fixture_dir
    ds = YTVISDataset(ann_file, img_prefix)
    fa = ds.frame_annots(1, 0)
    # 3 trainable instances + 1 crowd region
    assert fa.boxes.shape[0] == 3
    assert fa.crowd_boxes.shape == (1, 4)
    # polygon mask ~= rect mask (fillPoly boundary within 2px)
    assert abs(int(fa.masks[0].sum()) - 50 * 50) < 2 * (50 + 50) + 4
    # compressed RLE round-trips exactly; box derived from the mask
    np.testing.assert_array_equal(fa.masks[1], _rect_mask(80, 30, 140, 80))
    np.testing.assert_allclose(fa.boxes[1], [80, 30, 140, 80])
    # uncompressed counts decode exactly
    np.testing.assert_array_equal(fa.masks[2], _rect_mask(20, 10, 70, 60))

    # frame 1: annotation 3 has a None bbox -> box from mask
    fa1 = ds.frame_annots(1, 1)
    row3 = list(fa1.ids).index(3)
    np.testing.assert_allclose(fa1.boxes[row3], [20, 10, 70, 60])

    # frame 2: annotation 1's segmentation is null but bbox present ->
    # kept with an empty mask (reference keeps bbox-only frames)
    fa2 = ds.frame_annots(1, 2)
    assert 1 in list(fa2.ids)
    row1 = list(fa2.ids).index(1)
    assert fa2.masks[row1].sum() == 0


@pytest.mark.slow
def test_fixture_through_train_step_and_eval(fixture_dir):
    ann_file, img_prefix = fixture_dir
    cfg = get_config('STMask_plus_resnet50').replace(
        img_w=128, img_h=96, max_gt_per_frame=6, track_capacity=16)
    ds = YTVISDataset(ann_file, img_prefix)
    loader = ClipLoader(cfg, ds, batch_size=2, num_workers=2)
    batch = next(iter(loader.epoch(0)))
    assert batch['crowd_boxes'].shape[2] == cfg.crowd_capacity
    assert batch['valid'].any()

    from stmask_tpu.models import STMask
    from stmask_tpu.train import build_train_step
    model = STMask(cfg)
    x0 = jnp.zeros((1, 2, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=True)
    train_step, init_state = build_train_step(cfg, model)
    state = init_state(params)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics['total'])), dict(
        (k, float(v)) for k, v in metrics.items())

    # eval driver end-to-end over the same annotation file: streaming
    # eval -> results2json -> metrics (evaluator parses the same gt JSON)
    import importlib
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    eval_script = importlib.import_module('eval')
    out_file = os.path.join(os.path.dirname(ann_file), 'results.json')
    eval_args = eval_script.parse_args([
        '--ann_file', ann_file, '--img_prefix', img_prefix,
        '--eval_metrics', '--mask_det_file', out_file])
    stats = eval_script.evaluate_dataset_batched(eval_args, cfg, model,
                                                 state.params)
    assert stats is not None and 'mAP' in stats
    assert os.path.exists(out_file)
    json.load(open(out_file))
