"""End-to-end: jitted video step over a synthetic 3-frame clip -> YTVIS JSON.

The minimum end-to-end slice of SURVEY.md §7.2 step 3: model forward +
NMS + tracking + postprocess + results JSON, all shapes static.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stmask_tpu.config import get_config
from stmask_tpu.inference import (build_video_step, postprocess_frame,
                                  results2json_videoseg)
from stmask_tpu.models import STMask

TINY = get_config('STMask_plus_resnet50').replace(
    img_w=128, img_h=96, track_capacity=16)


@pytest.fixture(scope='module')
def model_and_params():
    model = STMask(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, TINY.pad_h, TINY.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, params


def test_video_step_and_json(model_and_params):
    model, params = model_and_params
    video_step, make_state = build_video_step(TINY, model)

    state = make_state()
    results = []
    rng = np.random.RandomState(0)
    for frame_id in range(3):
        frame = jnp.asarray(rng.randn(TINY.pad_h, TINY.pad_w, 3)
                            .astype(np.float32))
        state, out = video_step(params, state, frame,
                                jnp.asarray(frame_id == 0))
        assert out.box.shape == (TINY.track_capacity, 4)
        assert out.mask.shape == (TINY.track_capacity, TINY.pad_h // 4,
                                  TINY.pad_w // 4)
        meta = {'video_id': 1, 'frame_id': frame_id,
                'img_shape': (TINY.img_h, TINY.img_w),
                'pad_shape': (TINY.pad_h, TINY.pad_w),
                'is_first': frame_id == 0}
        results.append(postprocess_frame(TINY, out, meta))

    json_results = results2json_videoseg(results)
    # schema check (even if the random model found nothing)
    for r in json_results:
        assert set(r) == {'video_id', 'score', 'category_id',
                          'segmentations'}
        assert len(r['segmentations']) == 3
        for s in r['segmentations']:
            if s is not None:
                assert set(s) == {'size', 'counts'}
                assert s['size'] == [TINY.img_h, TINY.img_w]
    # serializable
    json.dumps(json_results)


def test_video_step_debug_outputs(model_and_params):
    """debug=True surfaces proto + det coefficients (--display_lincomb)."""
    model, params = model_and_params
    video_step, make_state = build_video_step(TINY, model, debug=True)
    state = make_state()
    frame = jnp.zeros((TINY.pad_h, TINY.pad_w, 3))
    state, out, dbg = video_step(params, state, frame, jnp.asarray(True))
    assert dbg['proto'].shape == (TINY.pad_h // 4, TINY.pad_w // 4, 32)
    assert dbg['mask_coeff'].shape[1] == 32
    assert dbg['det_valid'].dtype == bool

    from stmask_tpu.utils.visualization import display_lincomb
    grids = display_lincomb(np.asarray(dbg['proto'], np.float32),
                            np.tanh(np.asarray(dbg['mask_coeff'][0])))
    assert grids['mask'].shape == (TINY.pad_h // 4, TINY.pad_w // 4)


def test_video_step_state_carries(model_and_params):
    model, params = model_and_params
    video_step, make_state = build_video_step(TINY, model)
    state = make_state()
    frame = jnp.zeros((TINY.pad_h, TINY.pad_w, 3))
    s1, _ = video_step(params, state, frame, jnp.asarray(True))
    # fpn features stored for the next frame's correlation
    assert np.asarray(jnp.abs(s1.fpn_feat)).sum() >= 0  # finite
    assert np.all(np.isfinite(np.asarray(s1.fpn_feat)))


def test_video_step_uint8_matches_fp32(model_and_params):
    """uint8 upload + on-device normalize/pad (the sequential eval driver's
    transfer regime) is numerically identical to host preprocessing."""
    from stmask_tpu.data.transforms import preprocess_frame, \
        preprocess_frame_u8
    model, params = model_and_params
    vs_f, ms_f = build_video_step(TINY, model)
    vs_u, ms_u = build_video_step(TINY, model, uint8_input=True)

    img = np.random.RandomState(3).randint(
        0, 255, (TINY.img_h, TINY.img_w, 3), np.uint8)
    pre_f = preprocess_frame(TINY, img)
    pre_u = preprocess_frame_u8(TINY, img)
    _, o_f = vs_f(params, ms_f(), jnp.asarray(pre_f['image']),
                  jnp.asarray(True))
    _, o_u = vs_u(params, ms_u(), jnp.asarray(pre_u['image']),
                  jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(o_f.box), np.asarray(o_u.box),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_f.score),
                               np.asarray(o_u.score), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(o_f.keep),
                                  np.asarray(o_u.keep))
