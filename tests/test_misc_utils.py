import numpy as np
import jax.numpy as jnp
import pytest

from stmask_tpu.config import get_config
from stmask_tpu.inference.candidates import Detections
from stmask_tpu.inference.tracker import merge_candidates
from stmask_tpu.utils.logger import MovingAverage, ProgressBar
from stmask_tpu.utils.visualization import (correlation_patch_map,
                                            draw_detections, proto_grid,
                                            undo_image_transformation)

CFG = get_config('STMask_plus_resnet50')


def _dets(n_valid, d=4, score0=0.9):
    box = np.zeros((d, 4), np.float32)
    box[:, 2:] = 0.1
    score = np.full((d,), -1e10, np.float32)
    score[:n_valid] = np.linspace(score0, 0.5, n_valid)
    valid = np.zeros((d,), bool)
    valid[:n_valid] = True
    return Detections(
        jnp.asarray(box), jnp.asarray(score),
        jnp.zeros((d,), jnp.int32), jnp.zeros((d, 32)),
        jnp.zeros((d, 8)), jnp.zeros((d,)), jnp.asarray(valid))


def test_merge_candidates_keeps_top_by_score():
    a = _dets(2, score0=0.9)
    b = _dets(3, score0=0.95)
    merged = merge_candidates(a, b)
    assert merged.score.shape == (4,)
    s = np.asarray(merged.score)
    assert np.all(np.diff(s) <= 0)          # sorted desc
    assert np.asarray(merged.valid).sum() == 4  # 5 valid in, capacity 4
    assert s[0] == pytest.approx(0.95)


def test_fast_base_transform_matches_host():
    from stmask_tpu.data.transforms import (fast_base_transform,
                                            preprocess_frame)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (180, 320, 3), np.uint8)
    dev = np.asarray(fast_base_transform(CFG)(jnp.asarray(img)))
    host = preprocess_frame(CFG, img)['image']
    assert dev.shape == host.shape
    # same normalization; resize kernels differ slightly (cv2 vs XLA)
    valid = host[:CFG.img_h, :CFG.img_w]
    np.testing.assert_allclose(dev[:CFG.img_h, :CFG.img_w], valid,
                               atol=0.35)
    # padding zeroed
    assert np.abs(dev[CFG.img_h:]).max() == 0


def test_moving_average_rejects_nonfinite():
    ma = MovingAverage(3)
    ma.append(1.0)
    ma.append(float('nan'))
    ma.append(float('inf'))
    ma.append(3.0)
    assert len(ma) == 2
    assert ma.get_avg() == pytest.approx(2.0)


def test_progress_bar():
    pb = ProgressBar(length=10, max_val=100)
    assert len(pb.get_bar(0)) == 10
    assert pb.get_bar(100).count('█') == 10
    assert pb.get_bar(50).count('█') == 5


def test_visualization_smoke():
    img = np.zeros((60, 80, 3), np.uint8)
    boxes = np.asarray([[10, 10, 40, 40]], np.float32)
    masks = np.zeros((1, 60, 80), bool)
    masks[0, 12:38, 12:38] = True
    out = draw_detections(img, boxes, np.asarray([1]), np.asarray([0.8]),
                          masks, np.asarray([0]), CFG.classes)
    assert out.shape == img.shape and out.sum() > 0

    grid = proto_grid(np.random.RandomState(0).rand(8, 8, 32))
    assert grid.shape == (4 * 8, 8 * 8)

    cm = correlation_patch_map(
        np.random.RandomState(0).rand(6, 6, 121).astype(np.float32), 3, 3)
    assert cm.shape == (11, 11)

    norm = np.zeros((CFG.pad_h, CFG.pad_w, 3), np.float32)
    rgb = undo_image_transformation(norm, CFG.img_h, CFG.img_w)
    assert rgb.shape == (CFG.img_h, CFG.img_w, 3)
    assert rgb.dtype == np.uint8


def test_compute_masks_lstsq_fit():
    """scripts/compute_masks.py: prototypes that span the gt reconstruct it
    with IoU 1; an orthogonal gt fits poorly."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'scripts'))
    from compute_masks import fit_protos

    rng = np.random.RandomState(0)
    h, w, k = 24, 32, 8
    proto = rng.rand(h, w, k).astype(np.float32)
    gt0 = np.zeros((h, w), np.float32)
    gt0[4:12, 6:20] = 1
    proto[..., 3] = gt0                      # gt0 in the span
    gt1 = np.zeros((h, w), np.float32)
    gt1[15:22, 2:9] = 1                      # arbitrary second object
    approx, ious = fit_protos(proto, np.stack([gt0, gt1]))
    assert approx.shape == (2, h, w)
    assert ious[0] > 0.99
    assert 0 <= ious[1] <= 1


def test_config_from_checkpoint_name_longest_prefix():
    """Filename -> config inference (reference eval.py:773-778): the
    longest registry prefix must win even with an extension and iteration
    suffix — 'STMask_plus_base_ada.pth' must NOT fall back to the shorter
    'STMask_plus_base' (pre-fix bug: the unstripped '.pth' broke the last
    part)."""
    from stmask_tpu.config import config_from_checkpoint_name as infer
    assert infer('/w/STMask_plus_base_ada.pth').name == 'STMask_plus_base_ada'
    assert infer('STMask_plus_base_ali_54_100000.pth').name == \
        'STMask_plus_base_ali'
    assert infer('STMask_plus_base.pth').name == 'STMask_plus_base'
    assert infer('STMask_plus_resnet50.pth').name == 'STMask_plus_resnet50'
    assert infer('unrelated_model.pth') is None
