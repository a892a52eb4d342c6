"""Pallas kernel parity vs the pure-JAX reference ops (interpret mode on
CPU; compiled on real TPU via STMASK_TEST_TPU=1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stmask_tpu.ops.correlation import correlate


def _interpret_mode():
    return jax.devices()[0].platform != 'tpu'


def test_correlate_pallas_matches_reference():
    from jax.experimental.pallas import tpu as pltpu
    from stmask_tpu.kernels.correlation_pallas import correlate_pallas

    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(2, 8, 10, 16).astype(np.float32))
    x2 = jnp.asarray(rng.randn(2, 8, 10, 16).astype(np.float32))

    ref = correlate(x1, x2, patch_size=5)
    if _interpret_mode():
        with pltpu.force_tpu_interpret_mode():
            got = correlate_pallas(x1, x2, patch_size=5)
    else:
        got = correlate_pallas(x1, x2, patch_size=5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_correlate_pallas_full_size():
    from jax.experimental.pallas import tpu as pltpu
    from stmask_tpu.kernels.correlation_pallas import correlate_pallas

    rng = np.random.RandomState(1)
    x1 = jnp.asarray(rng.randn(1, 24, 40, 64).astype(np.float32))
    x2 = jnp.asarray(rng.randn(1, 24, 40, 64).astype(np.float32))
    ref = correlate(x1, x2, patch_size=11)
    if _interpret_mode():
        with pltpu.force_tpu_interpret_mode():
            got = correlate_pallas(x1, x2, patch_size=11)
    else:
        got = correlate_pallas(x1, x2, patch_size=11)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


class TestDCNWindowPallas:
    """Fused VMEM window-DCN kernel vs the exact gather formulation
    (interpret mode on CPU; the real-TPU path is opt-in via
    cfg.backbone.dcn_pallas_eval)."""

    @pytest.mark.parametrize('stride,dil,h,w', [(1, 1, 10, 12),
                                                (2, 1, 12, 14),
                                                (1, 2, 12, 12)])
    def test_matches_exact_gather_in_window(self, stride, dil, h, w):
        from stmask_tpu.kernels.dcn_pallas import deform_conv2d_window_pallas
        from stmask_tpu.ops.deform_conv import deform_conv2d

        rng = np.random.RandomState(0)
        kh = kw = 3
        k = kh * kw
        cin, cout = 8, 16
        ho = (h + 2 * dil - ((kh - 1) * dil + 1)) // stride + 1
        wo = (w + 2 * dil - ((kw - 1) * dil + 1)) // stride + 1
        x = rng.randn(2, h, w, cin).astype(np.float32)
        off = np.clip(rng.randn(2, ho, wo, 2 * k) * 1.2,
                      -2, 2).astype(np.float32)
        m = rng.rand(2, ho, wo, k).astype(np.float32)
        wt = rng.randn(kh, kw, cin, cout).astype(np.float32) * 0.1
        bias = rng.randn(cout).astype(np.float32)
        ref = deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                            jnp.asarray(wt), mask=jnp.asarray(m),
                            bias=jnp.asarray(bias), stride=stride,
                            dilation=dil)
        got = deform_conv2d_window_pallas(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(wt),
            jnp.asarray(m), jnp.asarray(bias), stride=stride,
            dilation=dil, radius=2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_clamps_out_of_window_offsets(self):
        from stmask_tpu.kernels.dcn_pallas import deform_conv2d_window_pallas
        from stmask_tpu.ops.deform_conv import deform_conv2d_window

        rng = np.random.RandomState(1)
        k = 9
        x = rng.randn(1, 8, 9, 4).astype(np.float32)
        off = (rng.randn(1, 8, 9, 2 * k) * 5).astype(np.float32)  # > radius
        m = rng.rand(1, 8, 9, k).astype(np.float32)
        wt = rng.randn(3, 3, 4, 6).astype(np.float32)
        ref = deform_conv2d_window(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(wt), mask=jnp.asarray(m),
                                   radius=2)
        got = deform_conv2d_window_pallas(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(wt),
            jnp.asarray(m), radius=2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)
