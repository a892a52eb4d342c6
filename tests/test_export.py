"""AOT export (jax.export / StableHLO serving artifact): exported programs
match the live pipeline exactly and round-trip through the on-disk zip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stmask_tpu.config import get_config
from stmask_tpu.export import (export_video_step, load_exported,
                               save_exported)
from stmask_tpu.inference import build_video_step, build_video_step_batched
from stmask_tpu.models import STMask

TINY = get_config('STMask_plus_resnet50').replace(
    img_w=128, img_h=96, track_capacity=16, shift_capacity=8)


@pytest.fixture(scope='module')
def setup():
    model = STMask(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, TINY.pad_h, TINY.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, params


def test_export_single_stream_roundtrip(setup, tmp_path):
    model, params = setup
    exported, meta = export_video_step(TINY, model, params,
                                       uint8_input=True)
    path = str(tmp_path / 'model.stmask')
    save_exported(exported, meta, path)
    step, meta2 = load_exported(path)
    assert meta2['config'] == TINY.name
    assert meta2['frame_shape'] == [TINY.img_h, TINY.img_w, 3]

    # drive 3 frames through the artifact and the live pipeline
    video_step, make_state = build_video_step(TINY, model,
                                              uint8_input=True)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (3, TINY.img_h, TINY.img_w, 3),
                         dtype=np.uint8)
    st_live, st_art = make_state(), step.init_state()
    for k in range(3):
        first = jnp.asarray(k == 0)
        fr = jnp.asarray(frames[k])
        st_live, out_live = video_step(params, st_live, fr, first)
        st_art, out_art = step(st_art, fr, first)
        np.testing.assert_array_equal(np.asarray(out_live.keep),
                                      np.asarray(out_art.keep))
        np.testing.assert_allclose(np.asarray(out_live.box),
                                   np.asarray(out_art.box),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_live.mask),
                                   np.asarray(out_art.mask),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out_live.obj_id),
                                      np.asarray(out_art.obj_id))


def test_export_batched(setup, tmp_path):
    model, params = setup
    b, k = 2, 3
    exported, meta = export_video_step(TINY, model, params, batched=b,
                                       chunk_size=k, uint8_input=True)
    path = str(tmp_path / 'model_b.stmask')
    save_exported(exported, meta, path)
    step, meta2 = load_exported(path)
    assert meta2['batched'] == b and meta2['chunk_size'] == k

    video_chunk, make_states = build_video_step_batched(
        TINY, model, n_videos=b, chunk_size=k, uint8_input=True)
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (k, b, TINY.img_h, TINY.img_w, 3),
                         dtype=np.uint8)
    is_first = np.zeros((k, b), bool)
    is_first[0] = True

    _, out_live = video_chunk(params, make_states(), jnp.asarray(frames),
                              jnp.asarray(is_first))
    _, out_art = step(step.init_state(), jnp.asarray(frames),
                      jnp.asarray(is_first))
    np.testing.assert_array_equal(np.asarray(out_live.keep),
                                  np.asarray(out_art.keep))
    np.testing.assert_allclose(np.asarray(out_live.score),
                               np.asarray(out_art.score),
                               rtol=1e-5, atol=1e-6)
