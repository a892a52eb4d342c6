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


def test_uint8_input_matches_host_normalize(setup):
    """uint8 upload + on-device normalize/pad == host float path."""
    from stmask_tpu.config import MEANS, STD

    model, params = setup
    b, k = 2, 2
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (k, b, TINY.img_h, TINY.img_w, 3), np.uint8)

    host = np.zeros((k, b, TINY.pad_h, TINY.pad_w, 3), np.float32)
    host[:, :, :TINY.img_h, :TINY.img_w] = \
        (u8.astype(np.float32) - MEANS) / STD
    is_first = np.zeros((k, b), bool)
    is_first[0] = True

    chunk_f, make_f = build_video_step_batched(TINY, model, b, k)
    sf, outs_f = chunk_f(params, make_f(), jnp.asarray(host),
                         jnp.asarray(is_first))

    chunk_u, make_u = build_video_step_batched(TINY, model, b, k,
                                               uint8_input=True)
    su, outs_u = chunk_u(params, make_u(), jnp.asarray(u8),
                         jnp.asarray(is_first))

    np.testing.assert_array_equal(np.asarray(outs_f.keep),
                                  np.asarray(outs_u.keep))
    np.testing.assert_allclose(np.asarray(outs_f.box),
                               np.asarray(outs_u.box), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs_f.score),
                               np.asarray(outs_u.score), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs_f.mask),
                               np.asarray(outs_u.mask), atol=1e-5)


def test_lane_sharded_eval_matches_single_device(setup):
    """Multi-chip EVAL: video lanes sharded over an 8-device mesh produce
    bit-identical YTVIS JSON to the same lanes on one device (SURVEY §5.8
    'video-level sharding'; reference analog eval.py:495-500 eval
    DataParallel)."""
    import json
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import eval as eval_script
    from jax.sharding import NamedSharding, PartitionSpec as P
    from stmask_tpu.inference import postprocess_frame, results2json_videoseg
    from stmask_tpu.parallel import make_mesh, replicate

    model, params = setup
    b, k = 8, 2
    assert len(jax.devices()) >= b
    rng = np.random.RandomState(2)
    frames = rng.randn(k, b, TINY.pad_h, TINY.pad_w, 3).astype(np.float32)
    first = np.zeros((k, b), bool)
    first[0] = True

    video_chunk, make_states = build_video_step_batched(TINY, model, b, k)
    mesh = make_mesh(b)

    def run(shard):
        states = make_states()
        fr, fi, pr = jnp.asarray(frames), jnp.asarray(first), params
        if shard:
            lane0 = NamedSharding(mesh, P('data'))
            lane1 = NamedSharding(mesh, P(None, 'data'))
            states = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, lane0), states)
            fr = jax.device_put(fr, lane1)
            fi = jax.device_put(fi, lane1)
            pr = replicate(mesh, params)
        states, outs = video_chunk(pr, states, fr, fi)
        if shard:   # lanes really are distributed across the mesh
            assert len(outs.box.sharding.device_set) == b
        small, keep_idx, kept = eval_script._fetch_kept(outs)
        res = []
        for lane in range(b):
            for step in range(k):
                out = eval_script._compact_frame(small, keep_idx, kept,
                                                 lead=(step, lane))
                res.append(postprocess_frame(
                    TINY, out, {'video_id': lane, 'frame_id': step,
                                'img_shape': (TINY.img_h, TINY.img_w),
                                'pad_shape': (TINY.pad_h, TINY.pad_w)}))
        return results2json_videoseg(res)

    single = run(False)
    sharded = run(True)
    # canonicalize float reprs: per-example math matches across shardings
    # up to ulps (scores within 2e-7); RLE strings must match exactly
    from __graft_entry__ import _round_floats
    assert json.dumps(_round_floats(single), sort_keys=True) == \
        json.dumps(_round_floats(sharded), sort_keys=True)
