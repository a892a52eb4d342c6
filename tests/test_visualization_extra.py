"""Debug-surface coverage: display_lincomb, train-output renderer, bbox
scripts (reference layers/train_output_utils.py, output_utils.py:168,
scripts/save_bboxes.py, scripts/augment_bbox.py)."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))

from stmask_tpu.config import get_config
from stmask_tpu.utils.visualization import (display_lincomb,
                                            render_train_output)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_display_lincomb_shapes_and_final_mask():
    rng = np.random.RandomState(0)
    proto = rng.rand(16, 24, 32).astype(np.float32)
    coeff = np.tanh(rng.randn(32).astype(np.float32))
    out = display_lincomb(proto, coeff, grid=(8, 4))
    assert out['proto_grid'].shape == (16 * 8, 24 * 4)
    assert out['running_grid'].shape == (16 * 8, 24 * 4)
    np.testing.assert_allclose(
        out['mask'], 1 / (1 + np.exp(-(proto @ coeff))), atol=1e-6)
    # last running tile is the binarized full combination
    last = out['running_grid'][-16:, -24:]
    np.testing.assert_array_equal(last, out['mask'] > 0.5)


def test_render_train_output_panes():
    cv2 = pytest.importorskip('cv2')  # noqa: F841
    cfg = get_config('STMask_plus_resnet50')
    rng = np.random.RandomState(1)
    h, w, p, k, g = 96, 128, 12, 32, 4
    image = rng.randn(h, w, 3).astype(np.float32)
    priors = np.stack([rng.uniform(0.2, 0.8, p), rng.uniform(0.2, 0.8, p),
                       rng.uniform(0.1, 0.3, p), rng.uniform(0.1, 0.3, p)],
                      axis=1).astype(np.float32)
    frame_preds = {
        'loc': rng.randn(p, 4).astype(np.float32) * 0.1,
        'conf': rng.randn(p, cfg.num_classes).astype(np.float32),
        'mask_coeff': rng.randn(p, k).astype(np.float32),
        'proto': rng.rand(24, 32, k).astype(np.float32),
    }
    conf_t = np.zeros(p, np.int32)
    conf_t[[1, 5]] = [3, 7]
    gt = {'boxes': rng.uniform(0.1, 0.5, (g, 4)).astype(np.float32),
          'labels': np.array([3, 7, 1, 2], np.int32),
          'valid': np.array([1, 1, 0, 0], bool),
          'ids': np.array([1, 2, 0, 0], np.int32),
          'masks_proto': (rng.rand(g, 24, 32) > 0.5).astype(np.uint8)}
    gt['boxes'][:, 2:] += 0.4
    panes = render_train_output(cfg, image, priors, frame_preds, conf_t, gt)
    assert panes['train'].shape == (h, w, 3)
    assert panes['gt'].shape == (h, w, 3)
    assert panes['train'].dtype == np.uint8
    # no positives -> still renders
    panes0 = render_train_output(cfg, image, priors, frame_preds,
                                 np.zeros(p, np.int32), gt)
    assert panes0['train'].shape == (h, w, 3)


def _tiny_coco_json(path):
    data = {
        'images': [{'id': 1, 'width': 100, 'height': 80},
                   {'id': 2, 'width': 200, 'height': 160}],
        'annotations': [
            {'id': 1, 'image_id': 1, 'category_id': 1,
             'bbox': [10, 10, 30, 20]},
            {'id': 2, 'image_id': 2, 'category_id': 2,
             'bbox': [50, 40, 60, 80]},
        ],
        'categories': [{'id': 1}, {'id': 2}]}
    with open(path, 'w') as f:
        json.dump(data, f)


def test_save_and_augment_bbox_scripts(tmp_path):
    ann = tmp_path / 'ann.json'
    _tiny_coco_json(str(ann))
    box_pkl = tmp_path / 'bboxes.pkl'
    aug_pkl = tmp_path / 'bboxes_aug.pkl'

    from save_bboxes import collect_rows
    rows = collect_rows(str(ann))
    assert rows == [[100, 80, 10, 10, 30, 20], [200, 160, 50, 40, 60, 80]]
    with open(box_pkl, 'wb') as f:
        pickle.dump(rows, f)

    from augment_bbox import augment_row
    rng = np.random.RandomState(0)
    out = np.concatenate([augment_row(r, 550, rng) for r in rows * 20])
    assert out.shape[1] == 4
    # int-truncated crop rects can exceed the window by <1px (reference
    # augment_bbox.py quirk, kept): allow 2px/550 slack
    assert (out >= -2 / 550).all() and (out <= 1 + 2 / 550).all()
    assert (out[:, 2:] >= out[:, :2] - 1e-6).all()
    with open(aug_pkl, 'wb') as f:
        pickle.dump(out, f)

    # the anchor scripts consume either pickle format
    from cluster_bbox_sizes import load_whs

    class A:
        box_file = str(aug_pkl)
        ann_file = None
    whs = load_whs(A())
    assert whs.shape == (len(out), 2) and (whs > 0).all()
    A.box_file = str(box_pkl)
    whs2 = load_whs(A())
    np.testing.assert_allclose(whs2, [[0.3, 0.25], [0.3, 0.5]])


def test_ytvis_collect_rows():
    import tempfile
    from save_bboxes import collect_rows
    data = {'videos': [{'id': 1, 'width': 100, 'height': 80}],
            'annotations': [{'id': 1, 'video_id': 1, 'category_id': 1,
                             'bboxes': [[1, 2, 3, 4], None, [5, 6, 7, 8]]}]}
    with tempfile.NamedTemporaryFile('w', suffix='.json',
                                     delete=False) as f:
        json.dump(data, f)
        path = f.name
    rows = collect_rows(path)
    os.unlink(path)
    assert rows == [[100, 80, 1, 2, 3, 4], [100, 80, 5, 6, 7, 8]]


def test_save_train_output_e2e(tmp_path):
    """train.py --vis_every hook: forward + match + render + write PNGs."""
    pytest.importorskip('cv2')
    import jax
    from stmask_tpu.models import STMask
    from stmask_tpu.utils.visualization import save_train_output
    from test_train_step import TINY, _synthetic_batch

    model = STMask(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, 2, TINY.pad_h, TINY.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=True)
    batch = _synthetic_batch(TINY)
    save_train_output(TINY, model, params, batch, str(tmp_path), 0, 1)
    files = sorted(os.listdir(tmp_path))
    assert files == ['0_1_0_gt.png', '0_1_0_gt_ref.png', '0_1_0_train.png']


def test_metrics_only_tensorboard(tmp_path):
    pytest.importorskip('torch.utils.tensorboard')
    gt = {'videos': [{'id': 1, 'width': 10, 'height': 10,
                      'file_names': ['a.jpg']}],
          'annotations': [], 'categories': [{'id': 1}]}
    ann = tmp_path / 'gt.json'
    ann.write_text(json.dumps(gt))
    det = tmp_path / 'det.json'
    det.write_text('[]')
    tb = tmp_path / 'tb'
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'eval.py'), '--metrics_only',
         '--ann_file', str(ann), '--mask_det_file', str(det),
         '--tensorboard_dir', str(tb)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr
    assert any(f.startswith('events') for f in os.listdir(tb))


def test_eval_display_lincomb_cli(tmp_path):
    """eval.py --sequential --display --display_lincomb end-to-end: overlay
    PNGs and prototype-grid PNGs written from the debug video step."""
    pytest.importorskip('cv2')
    import numpy as np

    cv2 = __import__('cv2')
    from stmask_tpu.utils import rle as rle_util

    img_dir = tmp_path / 'imgs' / 'v1'
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    h, w = 96, 128
    names, segs, bboxes = [], [], []
    for f in range(2):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        img[20:60, 30:80] = (250, 50, 50)
        name = f'v1/f{f}.jpg'
        cv2.imwrite(str(tmp_path / 'imgs' / name), img)
        names.append(name)
        m = np.zeros((h, w), np.uint8)
        m[20:60, 30:80] = 1
        segs.append(rle_util.encode(m))
        bboxes.append([30, 20, 50, 40])
    ann = {'videos': [{'id': 1, 'file_names': names, 'height': h,
                       'width': w}],
           'annotations': [{'id': 1, 'video_id': 1, 'category_id': 1,
                            'segmentations': segs, 'bboxes': bboxes}],
           'categories': [{'id': 1, 'name': 'a'}]}
    (tmp_path / 'ann.json').write_text(json.dumps(ann))

    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'eval.py'),
         '--config', 'STMask_plus_resnet50', '--img_w', '128',
         '--img_h', '96', '--sequential', '--display', '--display_lincomb',
         '--display_fpn_outs',
         '--ann_file', str(tmp_path / 'ann.json'),
         '--img_prefix', str(tmp_path / 'imgs'),
         '--display_dir', str(tmp_path / 'disp'),
         '--mask_det_file', str(tmp_path / 'res.json')],
        # Cold CPU compile of the debug video step is minutes; under a
        # contended machine it blew a 1500 s budget once (round-4 suite run
        # concurrent with TPU benchmarks). The subprocess now shares the
        # suite's persistent CPU compile cache, so only the first-ever run
        # pays the compile at all.
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2700)
    assert r.returncode == 0, r.stderr[-2000:]
    files = os.listdir(tmp_path / 'disp')
    assert '00001_0000.png' in files and '00001_0001.png' in files
    # proto grids appear when any detection was kept (random weights may
    # keep none on a given frame — require the directory to exist)
    assert (tmp_path / 'res.json').exists()
    # FPN channel grids are written unconditionally per frame
    fpn_files = os.listdir(tmp_path / 'disp' / 'fpn')
    for lvl in ('P3', 'P4', 'P5', 'P6', 'P7'):
        assert f'00001_0000_{lvl}.png' in fpn_files


def test_display_fpn_outs_grids():
    import numpy as np
    from stmask_tpu.utils.visualization import display_fpn_outs
    feats = [np.random.RandomState(i).randn(8 // (1 << i) + 1,
                                            12 // (1 << i) + 1,
                                            24).astype(np.float32)
             for i in range(2)]
    grids = display_fpn_outs(feats, grid=(4, 4))
    assert set(grids) == {'P3', 'P4'}
    h, w, _ = feats[0].shape
    assert grids['P3'].shape == (h * 4, w * 4)
    # first tile is channel 0 verbatim (reference tiles raw activations)
    np.testing.assert_allclose(grids['P3'][:h, :w], feats[0][..., 0])
