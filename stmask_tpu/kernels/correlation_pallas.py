"""Pallas TPU kernel: cross-frame local correlation (cost volume).

Replaces the XLA formulation in ``ops.correlation`` on TPU: one kernel
keeps both feature maps in VMEM and emits the full 121-channel cost volume
without materializing 121 shifted intermediates in HBM.  Grid is over the
batch; each program computes [H, W, patch^2] for one image.

Feature maps at the TF level are small (P4: 24x40x256 ~ 1MB fp32), so whole
images fit VMEM comfortably (~16MB/core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(x1_ref, x2p_ref, out_ref, *, h, w, c, patch):
    x1 = x1_ref[0]                       # [H, W, C]
    inv_c = 1.0 / c
    for dy in range(patch):
        for dx in range(patch):
            shifted = x2p_ref[0, dy:dy + h, dx:dx + w, :]
            prod = (x1 * shifted).astype(jnp.float32)
            out_ref[0, :, :, dy * patch + dx] = \
                jnp.sum(prod, axis=-1) * inv_c


@functools.partial(jax.jit, static_argnames=('patch_size',
                                             'apply_activation'))
def correlate_pallas(x1: jax.Array, x2: jax.Array, patch_size: int = 11,
                     apply_activation: bool = True) -> jax.Array:
    """Drop-in for ``ops.correlation.correlate`` on TPU."""
    b, h, w, c = x1.shape
    r = (patch_size - 1) // 2
    x2p = jnp.pad(x2, ((0, 0), (r, r), (r, r), (0, 0)))
    hp, wp = h + 2 * r, w + 2 * r

    out = pl.pallas_call(
        functools.partial(_corr_kernel, h=h, w=w, c=c, patch=patch_size),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, patch_size * patch_size),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, patch_size * patch_size),
                                       jnp.float32),
    )(x1, x2p)
    if apply_activation:
        out = jax.nn.leaky_relu(out, 0.1)
    return out
