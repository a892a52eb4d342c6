"""eval.py kept-only mask transfer: _fetch_kept/_compact_frame must give
results identical to pulling the full track bank to host."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import eval as eval_mod
from stmask_tpu.config import get_config
from stmask_tpu.inference.postprocess import postprocess_frame
from stmask_tpu.inference.tracker import FrameOutput

CFG = get_config('STMask_plus_resnet50').replace(img_w=128, img_h=96)


def _random_outs(rng, lead, t=16, hp=24, wp=32):
    shape = lead + (t,)
    keep = rng.rand(*shape) < 0.3
    return FrameOutput(
        box=jnp.asarray(np.sort(rng.rand(*shape, 4).astype(np.float32),
                                axis=-1)[..., [0, 1, 2, 3]]),
        score=jnp.asarray(rng.rand(*shape).astype(np.float32)),
        cls=jnp.asarray(rng.randint(1, 5, shape)),
        mask=jnp.asarray(rng.rand(*shape, hp, wp).astype(np.float32)),
        obj_id=jnp.asarray(rng.randint(1, 100, shape)),
        keep=jnp.asarray(keep))


def _meta(vid=1, f=0):
    return {'video_id': vid, 'frame_id': f, 'img_shape': (96, 128),
            'pad_shape': (96, 128)}


def test_fetch_kept_matches_full_transfer_batched():
    rng = np.random.RandomState(0)
    k, b = 3, 2
    outs = _random_outs(rng, (k, b))
    small, keep_idx, kept = eval_mod._fetch_kept(outs)
    full = {f: np.asarray(getattr(outs, f)) for f in outs._fields}
    for step in range(k):
        for lane in range(b):
            fo = eval_mod._compact_frame(small, keep_idx, kept,
                                         lead=(step, lane))
            ref = FrameOutput(**{f: full[f][step, lane]
                                 for f in outs._fields})
            got = postprocess_frame(CFG, fo, _meta(1, step))
            want = postprocess_frame(CFG, ref, _meta(1, step))
            assert set(got) == set(want)
            for key in want:
                if key in ('video_id', 'frame_id'):
                    continue
                np.testing.assert_allclose(got[key]['bbox'],
                                           want[key]['bbox'])
                assert got[key]['segm'] == want[key]['segm']
                assert got[key]['score'] == want[key]['score']
                assert got[key]['label'] == want[key]['label']


def test_fetch_kept_sequential_and_empty():
    rng = np.random.RandomState(1)
    out = _random_outs(rng, ())
    fo = eval_mod._compact_frame(*eval_mod._fetch_kept(out))
    ref = FrameOutput(*[np.asarray(getattr(out, f))
                        for f in out._fields])
    got = postprocess_frame(CFG, fo, _meta())
    want = postprocess_frame(CFG, ref, _meta())
    assert {k for k in got if k not in ('video_id', 'frame_id')} == \
        {k for k in want if k not in ('video_id', 'frame_id')}

    # no keeps at all
    empty = out._replace(keep=jnp.zeros_like(out.keep))
    fo0 = eval_mod._compact_frame(*eval_mod._fetch_kept(empty))
    assert fo0.mask.shape[0] == 0
    res = postprocess_frame(CFG, fo0, _meta())
    assert set(res) == {'video_id', 'frame_id'}
