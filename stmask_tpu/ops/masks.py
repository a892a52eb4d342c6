"""Lincomb mask assembly: ``proto @ coeff.T`` + box crop.

Re-design of reference ``layers/mask_utils.py:111-128``: the prototype
linear-combination is a single [H*W, 32] x [32, N] matmul (MXU-friendly),
followed by sigmoid and the vectorized box-crop window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import crop


def coeff_activation(coeff: jax.Array, kind: str = 'tanh') -> jax.Array:
    if kind == 'tanh':
        return jnp.tanh(coeff)
    if kind == 'none':
        return coeff
    raise ValueError(kind)


def generate_mask(proto: jax.Array, mask_coeff: jax.Array,
                  bbox: jax.Array | None = None,
                  apply_coeff_activation: bool = True) -> jax.Array:
    """Assemble instance masks from prototypes.

    Args:
      proto: [h, w, k] prototype masks (already through proto activation).
      mask_coeff: [n, k] raw coefficients (tanh applied here, matching
        reference mask_utils.py:112).
      bbox: optional [n, 4] normalized point-form boxes for cropping.
    Returns:
      [n, h, w] soft masks in [0, 1].
    """
    if apply_coeff_activation:
        mask_coeff = jnp.tanh(mask_coeff)
    h, w, k = proto.shape
    flat = proto.reshape(h * w, k)
    masks = jnp.dot(flat, mask_coeff.T,
                    preferred_element_type=jnp.float32).reshape(h, w, -1)
    masks = jax.nn.sigmoid(masks)
    if bbox is not None:
        _, masks = crop(masks, bbox)
    return jnp.transpose(masks, (2, 0, 1))
