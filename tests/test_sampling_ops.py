import numpy as np
import jax
import jax.numpy as jnp

from stmask_tpu.ops.sampling import bilinear_sample, bilinear_sample_block
from stmask_tpu.ops.deform_conv import deform_conv2d, dcn_v2_offsets
from stmask_tpu.ops.correlation import correlate
from stmask_tpu.ops.roi_align import roi_align


def test_bilinear_sample_exact_at_integers():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(6, 7, 3).astype(np.float32))
    ys = jnp.asarray([[0.0, 2.0], [5.0, 3.0]])
    xs = jnp.asarray([[0.0, 4.0], [6.0, 1.0]])
    out = np.asarray(bilinear_sample(img, ys, xs))
    np.testing.assert_allclose(out[0, 0], np.asarray(img)[0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], np.asarray(img)[2, 4], atol=1e-6)
    np.testing.assert_allclose(out[1, 0], np.asarray(img)[5, 6], atol=1e-6)


def test_bilinear_sample_interpolates():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    out = np.asarray(bilinear_sample(img, jnp.asarray([1.5]),
                                     jnp.asarray([1.5])))
    # average of img[1,1], img[1,2], img[2,1], img[2,2] = (5+6+9+10)/4
    np.testing.assert_allclose(out[0, 0], 7.5, atol=1e-6)


def test_bilinear_sample_out_of_bounds_zero():
    img = jnp.ones((4, 4, 2))
    out = np.asarray(bilinear_sample(img, jnp.asarray([-2.0, 10.0]),
                                     jnp.asarray([1.0, 1.0])))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_bilinear_sample_block_matches_reference():
    # the single-gather block formulation must match the 4-corner one
    # everywhere, including borders and far out-of-bounds
    rng = np.random.RandomState(9)
    img = jnp.asarray(rng.randn(7, 9, 4).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-3, 10, (5, 6)).astype(np.float32))
    xs = jnp.asarray(rng.uniform(-3, 12, (5, 6)).astype(np.float32))
    ref = np.asarray(bilinear_sample(img, ys, xs))
    got = np.asarray(bilinear_sample_block(img, ys, xs))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # exact integer positions
    ys2 = jnp.asarray([[0.0, 6.0], [3.0, 5.0]])
    xs2 = jnp.asarray([[0.0, 8.0], [4.0, 2.0]])
    ref2 = np.asarray(bilinear_sample(img, ys2, xs2))
    got2 = np.asarray(bilinear_sample_block(img, ys2, xs2))
    np.testing.assert_allclose(got2, ref2, atol=1e-6)


def _np_conv2d_same(x, w, stride=1):
    """naive NHWC conv with 'same' padding for the zero-offset parity check."""
    b, h, wdt, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    ho = (h - 1) // stride + 1
    wo = (wdt - 1) // stride + 1
    out = np.zeros((b, ho, wo, cout), np.float32)
    for i in range(ho):
        for j in range(wo):
            patch = xp[:, i * stride:i * stride + kh,
                       j * stride:j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3],
                                                           [0, 1, 2]))
    return out


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 9, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    off = np.zeros((2, 8, 9, 18), np.float32)
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w)))
    ref = _np_conv2d_same(x, w)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_deform_conv_zero_offset_stride2():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)
    off = np.zeros((1, 4, 4, 18), np.float32)
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w), stride=2))
    ref = _np_conv2d_same(x, w, stride=2)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_deform_conv_rectangular_kernel():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    w = rng.randn(3, 5, 2, 4).astype(np.float32)
    off = np.zeros((1, 6, 6, 30), np.float32)
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w)))
    ref = _np_conv2d_same(x, w)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_deform_conv_integer_offset_shifts():
    # a (dy=0, dx=1) offset on a 1x1 kernel samples the right neighbor
    rng = np.random.RandomState(4)
    x = rng.randn(1, 5, 5, 2).astype(np.float32)
    w = np.eye(2, dtype=np.float32).reshape(1, 1, 2, 2)
    off = np.zeros((1, 5, 5, 2), np.float32)
    off[..., 1] = 1.0  # dx = 1
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(w)))
    np.testing.assert_allclose(out[0, :, :-1], x[0, :, 1:], atol=1e-5)
    np.testing.assert_allclose(out[0, :, -1], 0.0, atol=1e-5)  # border zero


def test_deform_conv_modulation_scales():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 4, 3).astype(np.float32)
    w = rng.randn(1, 1, 3, 3).astype(np.float32)
    off = np.zeros((1, 4, 4, 2), np.float32)
    mask_half = np.full((1, 4, 4, 1), 0.5, np.float32)
    out_full = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                        jnp.asarray(w)))
    out_half = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                        jnp.asarray(w),
                                        mask=jnp.asarray(mask_half)))
    np.testing.assert_allclose(out_half, 0.5 * out_full, atol=1e-5)


def test_dcn_v2_offset_split_layout():
    # CharlesShang CUDA kernel semantics: the (o1||o2) concat (= first 2K
    # channels of conv_offset_mask) is read (dy, dx)-interleaved per tap —
    # channel 2t = dy_t, 2t+1 = dx_t.  No permutation.
    conv_out = np.zeros((1, 2, 2, 27), np.float32)
    conv_out[..., 0] = 3.0      # dy of tap 0
    conv_out[..., 1] = 5.0      # dx of tap 0
    conv_out[..., 16] = 7.0     # dy of tap 8
    off, m = dcn_v2_offsets(jnp.asarray(conv_out), 9)
    assert off.shape == (1, 2, 2, 18)
    np.testing.assert_allclose(np.asarray(off)[0, 0, 0, 0], 3.0)
    np.testing.assert_allclose(np.asarray(off)[0, 0, 0, 1], 5.0)
    np.testing.assert_allclose(np.asarray(off)[0, 0, 0, 16], 7.0)
    np.testing.assert_allclose(np.asarray(m), 0.5)  # sigmoid(0)


def test_deform_conv_matches_naive_torch_cuda_indexing():
    """Ground truth for the offset-channel layout: a naive torch modulated
    deform conv implementing the CUDA kernels' exact indexing (channel
    2t=dy_t, 2t+1=dx_t over the concatenated offset tensor) must agree with
    deform_conv2d + dcn_v2_offsets on random nonzero offsets."""
    import pytest
    torch = pytest.importorskip('torch')
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_mirror import NaiveDCNv2

    rng = np.random.RandomState(3)
    b, h, w, cin, cout = 2, 9, 11, 6, 5
    x = rng.randn(b, cin, h, w).astype(np.float32)

    torch.manual_seed(0)
    mod = NaiveDCNv2(cin, cout, 3)
    with torch.no_grad():
        mod.conv_offset_mask.weight.mul_(0.3)
        mod.conv_offset_mask.bias.copy_(
            torch.from_numpy(rng.randn(27).astype(np.float32) * 0.7))
        mod.bias.copy_(torch.from_numpy(rng.randn(cout).astype(np.float32)))
        ref = mod(torch.from_numpy(x)).numpy()

    # same weights through the jax op (NCHW->NHWC, OIHW->HWIO)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    om_w = jnp.asarray(
        mod.conv_offset_mask.weight.detach().numpy().transpose(2, 3, 1, 0))
    om_b = jnp.asarray(mod.conv_offset_mask.bias.detach().numpy())
    conv_out = jax.lax.conv_general_dilated(
        xj, om_w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + om_b
    off, m = dcn_v2_offsets(conv_out, 9)
    wj = jnp.asarray(mod.weight.detach().numpy().transpose(2, 3, 1, 0))
    bj = jnp.asarray(mod.bias.detach().numpy())
    out = deform_conv2d(xj, off, wj, mask=m, bias=bj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5)


def _np_correlate(x1, x2, patch):
    b, h, w, c = x1.shape
    r = (patch - 1) // 2
    x2p = np.pad(x2, ((0, 0), (r, r), (r, r), (0, 0)))
    out = np.zeros((b, h, w, patch * patch), np.float32)
    for dy in range(patch):
        for dx in range(patch):
            shifted = x2p[:, dy:dy + h, dx:dx + w, :]
            out[..., dy * patch + dx] = (x1 * shifted).sum(-1)
    out = out / c
    return np.where(out > 0, out, 0.1 * out)


def test_correlate_matches_numpy():
    rng = np.random.RandomState(6)
    x1 = rng.randn(2, 6, 7, 8).astype(np.float32)
    x2 = rng.randn(2, 6, 7, 8).astype(np.float32)
    out = np.asarray(correlate(jnp.asarray(x1), jnp.asarray(x2), 5))
    ref = _np_correlate(x1, x2, 5)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_correlate_identity_peak():
    # identical frames: zero-displacement channel should dominate
    rng = np.random.RandomState(7)
    x = rng.randn(1, 8, 8, 16).astype(np.float32)
    out = np.asarray(correlate(jnp.asarray(x), jnp.asarray(x), 11,
                               apply_activation=False))
    center = 5 * 11 + 5
    interior = out[0, 5:-5, 5:-5]  # away from zero-padding effects
    assert np.all(interior[..., center][..., None]
                  >= interior - 1e-5)


def test_roi_align_constant_map():
    feat = jnp.ones((16, 16, 3)) * 2.5
    rois = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
    out = np.asarray(roi_align(feat, rois, pool_size=7))
    assert out.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(out, 2.5, atol=1e-5)


def test_roi_align_gradient_map():
    # linear ramp in x: pooled values should increase along x and be exact
    h = w = 16
    ramp = np.broadcast_to(np.arange(w, dtype=np.float32), (h, w))[..., None]
    rois = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = np.asarray(roi_align(jnp.asarray(ramp), rois, pool_size=4))[0, 0, :, 0]
    # bin centers at x = 4 - 0.5 + (i + 0.5) * 2 -> 4.5, 6.5, 8.5, 10.5
    np.testing.assert_allclose(out, [4.5, 6.5, 8.5, 10.5], atol=1e-5)


def _roi_align_gather_ref(features, boxes, pool_size=7, sampling_ratio=2):
    """The original per-sample gather formulation (replaced in round 3 by
    the separable dense-matmul form after the gather profiled as a
    serialized 4.9 ms/frame while-loop on TPU) — kept here as the oracle."""
    s = sampling_ratio

    def one_box(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bin_w = (x2 - x1) / pool_size
        bin_h = (y2 - y1) / pool_size
        ii = jnp.arange(pool_size, dtype=jnp.float32)
        tt = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        ys = (y1 - 0.5 + (ii[:, None] + tt[None, :]) * bin_h).reshape(-1)
        xs = (x1 - 0.5 + (ii[:, None] + tt[None, :]) * bin_w).reshape(-1)
        n = pool_size * s
        vals = bilinear_sample(features, jnp.broadcast_to(ys[:, None],
                                                          (n, n)),
                               jnp.broadcast_to(xs[None, :], (n, n)))
        vals = vals.reshape(pool_size, s, pool_size, s, -1)
        return jnp.mean(vals, axis=(1, 3))

    return jax.vmap(one_box)(boxes)


def test_roi_align_matches_gather_oracle():
    """Separable-matmul RoIAlign vs the per-sample gather, random boxes
    incl. partially and fully out-of-bounds (zero-padding border)."""
    import jax
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(24, 40, 9).astype(np.float32))
    boxes = jnp.asarray(np.stack([
        rng.uniform(-8, 32, 16), rng.uniform(-8, 20, 16),
        rng.uniform(0, 56, 16), rng.uniform(0, 36, 16)], axis=1)
        .astype(np.float32))
    boxes = boxes.at[:, 2].max(boxes[:, 0] + 0.5)
    boxes = boxes.at[:, 3].max(boxes[:, 1] + 0.5)
    got = np.asarray(roi_align(feat, boxes))
    ref = np.asarray(_roi_align_gather_ref(feat, boxes))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_roi_align_gradients_flow():
    """The dense form is differentiable through features and boxes with a
    scatter-free adjoint (used by the B_shift/M_shift train losses)."""
    import jax
    feat = jnp.asarray(np.random.RandomState(0)
                       .randn(12, 16, 4).astype(np.float32))
    boxes = jnp.asarray([[1.0, 2.0, 9.0, 10.0], [0.5, 0.5, 4.0, 6.0]])
    g = jax.grad(lambda f, b: jnp.sum(roi_align(f, b) ** 2),
                 argnums=(0, 1))(feat, boxes)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()
    assert float(jnp.abs(g[0]).sum()) > 0 and float(jnp.abs(g[1]).sum()) > 0


# ---- window-clamped dense formulation (training fast path) ----

def _rand_case(rng, b=2, h=9, w=10, cin=4, cout=5, kh=3, kw=3, scale=1.5):
    k = kh * kw
    x = rng.randn(b, h, w, cin).astype(np.float32)
    wt = rng.randn(kh, kw, cin, cout).astype(np.float32)
    off = (rng.randn(b, h, w, 2 * k) * scale).astype(np.float32)
    m = rng.rand(b, h, w, k).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    return x, off, wt, m, bias


def test_deform_conv_window_matches_exact_in_range():
    from stmask_tpu.ops.deform_conv import deform_conv2d_window
    rng = np.random.RandomState(7)
    x, off, wt, m, bias = _rand_case(rng, scale=1.5)
    off = np.clip(off, -2, 2)  # inside the window: formulations must agree
    args = [jnp.asarray(a) for a in (x, off, wt)]
    exact = deform_conv2d(*args, mask=jnp.asarray(m), bias=jnp.asarray(bias))
    win = deform_conv2d_window(*args, mask=jnp.asarray(m),
                               bias=jnp.asarray(bias), radius=2)
    np.testing.assert_allclose(np.asarray(win), np.asarray(exact), atol=1e-4)


def test_deform_conv_window_stride_dilation_rect():
    from stmask_tpu.ops.deform_conv import deform_conv2d_window
    rng = np.random.RandomState(8)
    # rectangular 3x5 kernel, v1 (no mask)
    x = rng.randn(1, 8, 12, 3).astype(np.float32)
    wt = rng.randn(3, 5, 3, 4).astype(np.float32)
    off = np.clip(rng.randn(1, 8, 12, 30) * 1.2, -2, 2).astype(np.float32)
    exact = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wt))
    win = deform_conv2d_window(jnp.asarray(x), jnp.asarray(off),
                               jnp.asarray(wt), radius=2)
    np.testing.assert_allclose(np.asarray(win), np.asarray(exact), atol=1e-4)
    # stride 2 + dilation 2
    off2 = np.clip(rng.randn(1, 4, 6, 18), -1, 1).astype(np.float32)
    wt2 = rng.randn(3, 3, 3, 4).astype(np.float32)
    exact2 = deform_conv2d(jnp.asarray(x), jnp.asarray(off2),
                           jnp.asarray(wt2), stride=2, dilation=2)
    win2 = deform_conv2d_window(jnp.asarray(x), jnp.asarray(off2),
                                jnp.asarray(wt2), stride=2, dilation=2,
                                radius=1)
    np.testing.assert_allclose(np.asarray(win2), np.asarray(exact2),
                               atol=1e-4)


def test_deform_conv_window_clamps_large_offsets():
    from stmask_tpu.ops.deform_conv import deform_conv2d_window
    rng = np.random.RandomState(9)
    x, off, wt, m, bias = _rand_case(rng, scale=5.0)  # many out of range
    clipped = np.clip(off, -2, 2)
    a = deform_conv2d_window(jnp.asarray(x), jnp.asarray(off),
                             jnp.asarray(wt), radius=2)
    b = deform_conv2d(jnp.asarray(x), jnp.asarray(clipped), jnp.asarray(wt))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_deform_conv_window_gradients_match_exact():
    from stmask_tpu.ops.deform_conv import deform_conv2d_window
    rng = np.random.RandomState(10)
    x, off, wt, m, _ = _rand_case(rng, b=1, h=6, w=7, cin=3, cout=2)
    # keep offsets strictly inside the clamp so grads are comparable
    off = np.clip(off, -1.6, 1.6)

    def loss_exact(x_, off_, wt_, m_):
        return jnp.sum(deform_conv2d(x_, off_, wt_, mask=m_) ** 2)

    def loss_win(x_, off_, wt_, m_):
        return jnp.sum(
            deform_conv2d_window(x_, off_, wt_, mask=m_, radius=2) ** 2)

    args = tuple(jnp.asarray(a) for a in (x, off, wt, m))
    g_exact = jax.grad(loss_exact, argnums=(0, 1, 2, 3))(*args)
    g_win = jax.grad(loss_win, argnums=(0, 1, 2, 3))(*args)
    for ge, gw, name in zip(g_exact, g_win, ('x', 'offset', 'weight',
                                             'mask')):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(ge),
                                   atol=2e-3, err_msg=name)


def test_deform_conv_window_backward_has_no_scatter_loop():
    """The point of the window formulation: the train-time adjoint must not
    contain a while-loop (XLA's serialized scatter-add fallback)."""
    from stmask_tpu.ops.deform_conv import deform_conv2d_window
    rng = np.random.RandomState(11)
    x, off, wt, m, _ = _rand_case(rng)

    def loss(x_, off_, wt_, m_):
        return jnp.sum(
            deform_conv2d_window(x_, off_, wt_, mask=m_, radius=2) ** 2)

    hlo = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))).lower(
        *[jnp.asarray(a) for a in (x, off, wt, m)]).as_text()
    assert 'while' not in hlo, 'window adjoint lowered to a while loop'
    assert 'scatter' not in hlo, 'window adjoint lowered to scatter'


def test_deform_conv_window_custom_adjoint_matches_ad():
    """The hand-written VJP (O(1)-pad col2im, ``custom_adjoint=True``) must
    produce the same gradients as plain jax AD through the identical
    forward — across stride, dilation, rectangular kernels, and offsets at
    the clip boundary."""
    from stmask_tpu.ops.deform_conv import deform_conv2d_window
    rng = np.random.RandomState(12)
    cases = [
        dict(kh=3, kw=3, stride=1, dilation=1, radius=2, masked=True),
        dict(kh=3, kw=3, stride=2, dilation=1, radius=2, masked=True),
        dict(kh=3, kw=5, stride=1, dilation=1, radius=2, masked=False),
        dict(kh=3, kw=3, stride=2, dilation=2, radius=1, masked=False),
    ]
    for cs in cases:
        kh, kw, s = cs['kh'], cs['kw'], cs['stride']
        k = kh * kw
        h, w, cin, cout, b = 9, 11, 3, 4, 2
        ho, wo = (h + s - 1) // s, (w + s - 1) // s
        x = rng.randn(b, h, w, cin).astype(np.float32)
        wt = rng.randn(kh, kw, cin, cout).astype(np.float32)
        # scale 4.0: many offsets beyond the clip range, exercising the
        # zero-grad clip boundary through both paths identically
        off = (rng.randn(b, ho, wo, 2 * k) * 4.0).astype(np.float32)
        m = rng.rand(b, ho, wo, k).astype(np.float32) if cs['masked'] \
            else None

        def loss(custom):
            def f(*a):
                m_ = a[3] if cs['masked'] else None
                return jnp.sum(deform_conv2d_window(
                    a[0], a[1], a[2], mask=m_, stride=s,
                    dilation=cs['dilation'], radius=cs['radius'],
                    custom_adjoint=custom) ** 2)
            return f

        args = [jnp.asarray(a) for a in (x, off, wt)]
        if cs['masked']:
            args.append(jnp.asarray(m))
        argnums = tuple(range(len(args)))
        g_ad = jax.grad(loss(False), argnums=argnums)(*args)
        g_cu = jax.grad(loss(True), argnums=argnums)(*args)
        for ga, gc, name in zip(g_ad, g_cu, ('x', 'offset', 'weight',
                                             'mask')):
            np.testing.assert_allclose(
                np.asarray(gc), np.asarray(ga), atol=1e-4,
                err_msg=f'{name} ({cs})')


def test_deform_conv_window_custom_adjoint_pad_count():
    """The point of the custom VJP: the adjoint must contain O(1) pads —
    not one full-size transpose-pad per distinct window shift (64 for
    3x3/r=2; they were 28% of the bf16 batch-4 train step)."""
    from stmask_tpu.ops.deform_conv import deform_conv2d_window
    rng = np.random.RandomState(13)
    x, off, wt, m, _ = _rand_case(rng)

    def loss(custom):
        def f(x_, off_, wt_, m_):
            return jnp.sum(deform_conv2d_window(
                x_, off_, wt_, mask=m_, radius=2,
                custom_adjoint=custom) ** 2)
        return f

    args = [jnp.asarray(a) for a in (x, off, wt, m)]
    n_pad = {}
    for custom in (False, True):
        hlo = jax.jit(jax.grad(loss(custom), argnums=(0, 1, 2, 3))).lower(
            *args).as_text()
        assert 'while' not in hlo and 'scatter' not in hlo
        n_pad[custom] = hlo.count('stablehlo.pad')
    assert n_pad[False] >= 64, \
        f'plain AD should pad per shift, saw {n_pad[False]}'
    assert n_pad[True] <= 12, \
        f'custom adjoint should have O(1) pads, saw {n_pad[True]}'
