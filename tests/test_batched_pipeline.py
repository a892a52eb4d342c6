"""Batched multi-video inference: lockstep streams produce the same results
as independent sequential runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stmask_tpu.config import get_config
from stmask_tpu.inference import (build_video_step, build_video_step_batched)
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


def test_batched_matches_sequential(setup):
    model, params = setup
    b, k = 2, 3
    rng = np.random.RandomState(0)
    frames = rng.randn(k, b, TINY.pad_h, TINY.pad_w, 3).astype(np.float32)
    is_first = np.zeros((k, b), bool)
    is_first[0] = True

    video_chunk, make_states = build_video_step_batched(TINY, model, b, k)
    states = make_states()
    states, outs = video_chunk(params, states, jnp.asarray(frames),
                               jnp.asarray(is_first))

    video_step, make_state = build_video_step(TINY, model)
    for vi in range(b):
        st = make_state()
        for f in range(k):
            st, out = video_step(params, st, jnp.asarray(frames[f, vi]),
                                 jnp.asarray(f == 0))
        np.testing.assert_allclose(np.asarray(outs.box)[k - 1, vi],
                                   np.asarray(out.box), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(outs.keep)[k - 1, vi],
                                      np.asarray(out.keep))
        np.testing.assert_array_equal(np.asarray(outs.obj_id)[k - 1, vi],
                                      np.asarray(out.obj_id))
