"""Deformable convolution v1/v2 for TPU.

Replaces the two CUDA dependencies of the reference:
  * DCNv2 (modulated; backbone bottleneck conv2 — reference ``backbone.py:20-26``,
    CharlesShang/DCNv2 build),
  * ``mmcv.ops.DeformConv2d`` (v1, externally supplied offsets, rectangular
    3x5/5x3 kernels — reference ``layers/modules/Featurealign.py:27-31``).

Formulation: per kernel tap k, bilinear-gather the input at
``p + p_k + Δp_k`` (optionally scaled by a modulation mask m_k), stack the K
gathered maps, and contract against the [K*Cin, Cout] weight with one matmul —
the gather feeds the MXU instead of an im2col loop.  Offset channel layout
matches torch: ``(dy, dx)`` interleaved per tap, taps row-major over (kh, kw)
(reference ``Featurealign.py:67-69`` builds exactly this layout).

This is the pure-JAX (XLA gather) path; a fused Pallas kernel can swap in
underneath without changing the interface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .sampling import bilinear_sample_block


def deform_conv2d(x: jax.Array,
                  offset: jax.Array,
                  weight: jax.Array,
                  mask: Optional[jax.Array] = None,
                  bias: Optional[jax.Array] = None,
                  stride: int = 1,
                  dilation: int = 1) -> jax.Array:
    """Deformable conv (v2 when ``mask`` is given, else v1).

    Args:
      x: [B, H, W, Cin].
      offset: [B, Ho, Wo, 2*K] with (dy, dx) interleaved per tap.
      weight: [kh, kw, Cin, Cout] (HWIO).
      mask: optional [B, Ho, Wo, K] modulation (already sigmoid-ed).
      stride / dilation: ints (symmetric); padding is the usual
        ``(k-1)//2 * dilation`` "same" padding of the reference convs.
    Returns:
      [B, Ho, Wo, Cout].
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    _, ho, wo, _ = offset.shape

    pad_h = (kh - 1) // 2 * dilation
    pad_w = (kw - 1) // 2 * dilation

    # base sampling grid per output position and tap
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - pad_h
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - pad_w
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation
    base_y = oy[:, None, None, None] + ky[None, None, :, None]   # [Ho,1,kh,1]
    base_x = ox[None, :, None, None] + kx[None, None, None, :]   # [1,Wo,1,kw]
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(ho, wo, k)

    off = offset.reshape(b, ho, wo, k, 2)
    ys = base_y[None] + off[..., 0]                              # [B,Ho,Wo,K]
    xs = base_x[None] + off[..., 1]

    def sample_one(img, ys_i, xs_i, mask_i):
        vals = bilinear_sample_block(img, ys_i, xs_i)            # [Ho,Wo,K,C]
        if mask_i is not None:
            vals = vals * mask_i[..., None]
        return vals

    if mask is not None:
        vals = jax.vmap(sample_one, in_axes=(0, 0, 0, 0))(x, ys, xs, mask)
    else:
        vals = jax.vmap(lambda i, y_, x_: sample_one(i, y_, x_, None))(
            x, ys, xs)

    vals = vals.reshape(b, ho, wo, k * cin)
    out = jnp.dot(vals, weight.reshape(k * cin, cout),
                  preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def deform_conv2d_window(x: jax.Array,
                         offset: jax.Array,
                         weight: jax.Array,
                         mask: Optional[jax.Array] = None,
                         bias: Optional[jax.Array] = None,
                         stride: int = 1,
                         dilation: int = 1,
                         radius: int = 2) -> jax.Array:
    """Window-clamped deformable conv: dense static-shift formulation.

    Offsets are clamped to ``[-radius, radius]`` cells, which turns the
    bilinear gather into a weighted sum over the ``(2*radius+2)**2`` integer
    shifts of the window — every term a static ``lax.slice`` of the padded
    input times an elementwise hat weight ``max(0, 1 - |d - u|)``.  Both the
    forward and (crucially) the autodiff adjoint are then fully vectorized
    VPU code: the adjoint of a static slice is a static pad, so the training
    backward never lowers to XLA's serialized scatter-add while-loop (the
    3.3 s/step bottleneck of the gather formulation at batch 4).

    Semantics are identical to :func:`deform_conv2d` whenever every offset
    lies within ``[-radius, radius]`` (hat weights reproduce zero-padded
    bilinear exactly); offsets outside are clipped — the documented TPU
    deviation for training (reference DCNv2 is unclamped).

    Args match :func:`deform_conv2d`; ``radius`` >= 1.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    _, ho, wo, _ = offset.shape
    pad_h = (kh - 1) // 2 * dilation
    pad_w = (kw - 1) // 2 * dilation
    r = int(radius)
    n_win = 2 * r + 2

    # NOTE on adjoint cleanliness: weights are sliced per tap with
    # ``lax.slice_in_dim`` (transpose = static pad) rather than gathered
    # from a stacked [..,K,U] tensor (transpose = scatter-add).
    offc = jnp.clip(offset, -r, r).astype(jnp.float32)   # [B,ho,wo,2K]

    # pad so every (tap base + window corner) is a valid static slice
    top = pad_h + r
    left = pad_w + r
    bot = max(0, (ho - 1) * stride - pad_h + (kh - 1) * dilation + r + 1
              - (h - 1))
    right = max(0, (wo - 1) * stride - pad_w + (kw - 1) * dilation + r + 1
                - (w - 1))
    xp = jnp.pad(x, ((0, 0), (top, bot), (left, right), (0, 0)))

    def hat(d, u):
        # zero-padded bilinear corner weight for integer corner u
        return jnp.maximum(0.0, 1.0 - jnp.abs(d - u)).astype(x.dtype)

    # Hoist the distinct static slices: the absolute shift
    # ``row0 = i*dil + ui`` collides across (tap, corner) pairs whenever
    # ``dilation < n_win`` (always, for the 3x3 dil=1 backbone DCNs), so a
    # 3x3 kernel with r=2 has only 8x8 distinct shifts behind its 9x36
    # terms.  Sharing one ``lax.slice`` per distinct shift matters for the
    # ADJOINT, not the forward (XLA CSEs identical forward slices anyway):
    # jax AD emits one transpose-pad per slice *equation in the jaxpr*, and
    # each pad writes a full [B,H,W,Cin] tensor to HBM.  With per-term
    # slices that was 324 pads per DCN layer = 61% of the whole bf16
    # batch-4 train step (229 ms/step, profiled round 4); with shared
    # slices every user's cotangent is accumulated elementwise before ONE
    # pad per distinct shift (64/layer) — see PARITY.md round-4 train
    # roofline for the before/after.
    slices = {}

    def xs_at(row0, col0):
        if (row0, col0) not in slices:
            slices[(row0, col0)] = jax.lax.slice(
                xp, (0, row0, col0, 0),
                (b, row0 + (ho - 1) * stride + 1,
                 col0 + (wo - 1) * stride + 1, cin),
                (1, stride, stride, 1))
        return slices[(row0, col0)]

    vals = []
    for t in range(k):
        i, j = t // kw, t % kw
        dy = jax.lax.slice_in_dim(offc, 2 * t, 2 * t + 1, axis=3)
        dx = jax.lax.slice_in_dim(offc, 2 * t + 1, 2 * t + 2, axis=3)
        m_t = (jax.lax.slice_in_dim(mask, t, t + 1, axis=3)
               if mask is not None else None)
        acc = jnp.zeros((b, ho, wo, cin), x.dtype)
        for ui in range(n_win):
            # slice start: oy*stride - pad_h + i*dil + (ui - r) + top
            #            = oy*stride + i*dil + ui
            row0 = i * dilation + ui
            inner = jnp.zeros((b, ho, wo, cin), x.dtype)
            for vi in range(n_win):
                col0 = j * dilation + vi
                inner = inner + hat(dx, vi - r) * xs_at(row0, col0)
            acc = acc + hat(dy, ui - r) * inner
        if m_t is not None:
            acc = acc * m_t.astype(x.dtype)
        vals.append(acc)

    vals = jnp.stack(vals, axis=3).reshape(b, ho, wo, k * cin)
    out = jnp.dot(vals, weight.reshape(k * cin, cout),
                  preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def dcn_v2_offsets(conv_out: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Split a DCNv2 ``conv_offset_mask`` output [B,H,W,3K] into
    (offset [B,H,W,2K], mask [B,H,W,K]).

    Channel semantics match the CharlesShang DCNv2 CUDA kernel exactly:
    ``DCN.forward`` chunks the 3K conv output into (o1, o2, mask) and
    concatenates (o1, o2) back — an identity on the first 2K channels —
    and ``modulated_deformable_im2col`` then reads that tensor
    *(dy, dx)-interleaved per tap* (``data_offset_h_ptr = 2*(i*kw+j)``,
    ``data_offset_w_ptr = 2*(i*kw+j)+1``).  So the first 2K channels ARE
    the interleaved offsets; no permutation is applied (a dy-block/dx-block
    reinterpretation here would scramble imported checkpoints)."""
    off = conv_out[..., :2 * k]
    m = jax.nn.sigmoid(conv_out[..., 2 * k:])
    return off, m
