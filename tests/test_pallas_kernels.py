"""Pallas kernel parity vs the pure-JAX reference ops (interpret mode on
CPU; compiled on real TPU via STMASK_TEST_TPU=1)."""

import numpy as np
import jax
import jax.numpy as jnp
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
