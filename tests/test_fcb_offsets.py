"""FCB 'ali' analytic offsets vs an independent numpy replication of the
reference formula (Featurealign.py:46-69)."""

import numpy as np
import jax.numpy as jnp

from stmask_tpu.models.heads import _ali_offsets


def _np_ali_offsets(shape_nchw, ks_h, ks_w):
    """Direct transcription of the reference math (torch semantics),
    producing [B, 2*k, H, W] with (dy, dx) interleaved per tap."""
    bs, _, h, w = shape_nchw.shape
    v0, v1 = 0.1, 0.2
    k = ks_h * ks_w
    dxy = shape_nchw[:, :2].reshape(bs, 2, -1) * v0            # [B, 2, hw]
    dx = np.repeat((dxy[:, 0] * ks_w)[:, None, :], k, axis=1)  # [B, k, hw]
    dy = np.repeat((dxy[:, 1] * ks_h)[:, None, :], k, axis=1)
    dwh = np.exp(shape_nchw[:, 2:].reshape(bs, 2, -1) * v1) - 1

    dh_r = np.arange(-(ks_h // 2) + 1 - (1 if ks_h % 2 == 0 else 0),
                     ks_h // 2 + 1, dtype=np.float32)
    # odd kernels: [-(k-1)/2 .. (k-1)/2]
    dh_r = np.arange(ks_h, dtype=np.float32) - (ks_h - 1) / 2 \
        if ks_h % 2 else dh_r
    dh_r = np.repeat(dh_r.reshape(-1, 1), ks_w, axis=1).reshape(-1)  # [k]
    dh = dwh[:, 1][:, None, :] * dh_r.reshape(1, -1, 1)        # [B, k, hw]
    dw_r = np.tile(np.arange(ks_w, dtype=np.float32) - (ks_w - 1) / 2,
                   ks_h)
    dw = dwh[:, 0][:, None, :] * dw_r.reshape(1, -1, 1)

    off = np.stack([dy + dh, dx + dw], axis=1)                 # [B, 2, k, hw]
    off = np.transpose(off, (0, 2, 1, 3)).reshape(bs, 2 * k, h, w)
    return off


def test_ali_offsets_match_reference_formula():
    rng = np.random.RandomState(0)
    for ks in [(3, 3), (3, 5), (5, 3)]:
        shape_nchw = rng.randn(2, 4, 6, 8).astype(np.float32)
        ref = _np_ali_offsets(shape_nchw, *ks)                 # [B, 2k, H, W]
        shape_nhwc = np.transpose(shape_nchw, (0, 2, 3, 1))
        got = np.asarray(_ali_offsets(jnp.asarray(shape_nhwc), ks))
        got_nchw = np.transpose(got, (0, 3, 1, 2))
        np.testing.assert_allclose(got_nchw, ref, atol=1e-5,
                                   err_msg=str(ks))
