"""Wiring tests for the previously dormant components: backbone dispatch
(GN / DarkNet / VGG), legacy YOLACT head, FastMaskIoUNet loss + rescoring,
and the class-existence head."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stmask_tpu.config import get_config
from stmask_tpu.models import STMask


def _tiny(name, **kw):
    return get_config(name).replace(img_w=128, img_h=96, max_gt_per_frame=4,
                                    masks_to_train=8, **kw)


@pytest.mark.parametrize('name', ['STMask_resnet50_gn', 'STMask_darknet53',
                                  'STMask_vgg16'])
def test_alt_backbone_forward(name):
    cfg = _tiny(name)
    model = STMask(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(1), x, train=False)
    out = model.apply(params, x, train=False)
    assert out['loc'].shape[1] == out['conf'].shape[1]
    assert out['conf'].shape[-1] == cfg.num_classes
    assert np.all(np.isfinite(np.asarray(out['loc'])))
    # the dispatch actually picked a different module tree
    top = set(params['params']['backbone'].keys())
    if name == 'STMask_resnet50_gn':
        assert 'gn1' in top
    elif name == 'STMask_darknet53':
        assert any(k.startswith('stem') for k in top)
    else:
        assert 'conv_fc6' in top


def _gt_batch(cfg, b=1):
    g = cfg.max_gt_per_frame
    hp, wp = cfg.pad_h // 4, cfg.pad_w // 4
    boxes = np.zeros((b, 2, g, 4), np.float32)
    labels = np.zeros((b, 2, g), np.int32)
    ids = np.zeros((b, 2, g), np.int32)
    valid = np.zeros((b, 2, g), bool)
    masks = np.zeros((b, 2, g, hp, wp), np.uint8)
    boxes[:, :, 0] = [0.2, 0.2, 0.6, 0.7]
    labels[:, :, 0] = 1
    ids[:, :, 0] = 1
    valid[:, :, 0] = True
    masks[:, :, 0, hp // 4:3 * hp // 4, wp // 4:3 * wp // 4] = 1
    return {
        'images': np.random.RandomState(0).randn(
            b, 2, cfg.pad_h, cfg.pad_w, 3).astype(np.float32),
        'boxes': boxes, 'labels': labels, 'ids': ids, 'valid': valid,
        'masks_proto': masks,
    }


def _run_one_step(cfg):
    from stmask_tpu.train import build_train_step
    model = STMask(cfg)
    x = jnp.zeros((1, 2, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=True)
    train_step, init_state = build_train_step(cfg, model)
    batch = jax.tree_util.tree_map(jnp.asarray, _gt_batch(cfg))
    state, metrics = train_step(init_state(params), batch)
    return params, metrics


def test_legacy_head_train_and_eval():
    cfg = _tiny('YOLACT_legacy_resnet50')
    params, metrics = _run_one_step(cfg)
    # YOLACT loss surface: smooth-L1 box, OHEM conf, lincomb mask — no
    # centerness/track/TF losses
    assert set(metrics) >= {'B', 'C', 'M'}
    assert not {'center', 'T', 'B_shift'} & set(metrics)
    assert np.isfinite(float(metrics['total']))
    # eval path synthesizes neutral centerness/track and NMS runs
    from stmask_tpu.inference.pipeline import build_video_step
    model = STMask(cfg)
    step, mk_state = build_video_step(cfg, model)
    frame = jnp.zeros((cfg.pad_h, cfg.pad_w, 3))
    st, out = step(params, mk_state(), frame, jnp.asarray(True))
    assert out.box.shape[-1] == 4


def test_maskiou_loss_wired():
    cfg = _tiny('STMask_resnet50', use_maskiou=True)
    params, metrics = _run_one_step(cfg)
    assert 'I' in metrics
    assert np.isfinite(float(metrics['I']))
    assert 'maskiou_net' in params['params']


def test_class_existence_loss_wired():
    cfg = _tiny('STMask_resnet50', use_class_existence_loss=True)
    params, metrics = _run_one_step(cfg)
    assert 'E' in metrics
    assert np.isfinite(float(metrics['E']))
    assert float(metrics['E']) > 0
    assert 'class_existence_fc' in params['params']


def test_maskiou_rescoring_changes_scores():
    cfg = _tiny('STMask_resnet50', use_maskiou=True, rescore_mask=True)
    from stmask_tpu.inference.candidates import (Detections,
                                                 rescore_maskiou)
    model = STMask(cfg)
    x = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    d = 4
    det = Detections(
        box=jnp.tile(jnp.asarray([[0.2, 0.2, 0.8, 0.8]]), (d, 1)),
        score=jnp.full((d,), 0.9),
        cls=jnp.ones((d,), jnp.int32),
        mask_coeff=jax.random.normal(jax.random.PRNGKey(2), (d, 32)),
        track=jnp.zeros((d, cfg.embed_dim)),
        centerness=jnp.ones((d,)),
        valid=jnp.asarray([True, True, False, False]),
    )
    proto = jax.random.uniform(jax.random.PRNGKey(3),
                               (cfg.pad_h // 4, cfg.pad_w // 4, 32))

    def maskiou_fn(m):
        return model.apply(params, m, method=STMask.maskiou)

    out = rescore_maskiou(cfg, maskiou_fn, det, proto)
    s = np.asarray(out.score)
    assert np.all(s[:2] <= 0.9 + 1e-6)       # multiplied by iou in [0, ~)
    np.testing.assert_allclose(s[2:], 0.9)   # invalid slots untouched
