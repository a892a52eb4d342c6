"""The compiled video-inference program.

The reference eval loop crosses the host/device boundary every frame
(reference ``eval.py:597-648``: upload, forward, NMS, python tracking loop,
``.cpu()`` postprocess).  Here the whole per-frame step — forward pass,
decode, NMS, temporal shift, tracking — is ONE jitted function:

    video_step(params, state, frame, is_first) -> (state, FrameOutput)

so a video is a host-driven scan with only the final per-frame outputs
(fixed-capacity boxes/masks) leaving the device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import STMaskConfig
from ..models.stmask import STMask
from ..ops.anchors import all_priors
from .candidates import Detections, detect_frame, rescore_maskiou
from .tracker import (FrameOutput, TrackState, init_state, track_step_simple,
                      track_step_tf)


def _make_step_fn(cfg: STMaskConfig, model: STMask, priors: jax.Array,
                  debug: bool = False, debug_fpn: bool = False):
    def step_fn(params, state: TrackState, frame: jax.Array,
                is_first: jax.Array) -> Tuple[TrackState, FrameOutput]:
        # compute in the parameter dtype (bf16 params -> bf16 convs)
        param_dtype = jax.tree_util.tree_leaves(params)[0].dtype
        preds = model.apply(params, frame[None].astype(param_dtype),
                            train=False, return_fpn_outs=debug_fpn)
        frame_preds = {
            'loc': preds['loc'][0],
            'conf': preds['conf'][0],
            'mask_coeff': preds['mask_coeff'][0],
            'track': preds['track'][0],
            'centerness': preds['centerness'][0],
        }
        proto = preds['proto'][0]
        det = detect_frame(cfg, frame_preds, priors, proto=proto)
        if cfg.use_maskiou and (cfg.rescore_mask or cfg.rescore_bbox):
            det = rescore_maskiou(
                cfg, lambda m: model.apply(params, m, method=STMask.maskiou),
                det, proto)

        if cfg.temporal_fusion_module:
            def temporal_net_fn(x):
                return model.apply(params, x, method=STMask.temporal_shift)

            fpn_feat = preds['fpn_feat'][0]
            t2s_feat = preds['T2S_feat'][0]
            state, out = track_step_tf(cfg, temporal_net_fn, state, det,
                                       proto, fpn_feat, t2s_feat, is_first)
        else:
            state, out = track_step_simple(cfg, state, det, proto, is_first)
        if debug or debug_fpn:
            # pre-tracking NMS detections, for display_lincomb etc.
            dbg = {'proto': proto,
                   'mask_coeff': det.mask_coeff,
                   'det_valid': det.valid}
            if debug_fpn:
                dbg['fpn_outs'] = tuple(f[0] for f in preds['fpn_outs'])
            return state, out, dbg
        return state, out

    return step_fn


def build_video_step(cfg: STMaskConfig, model: STMask, debug: bool = False,
                     uint8_input: bool = False, debug_fpn: bool = False):
    """Returns (video_step, make_init_state).

    video_step(params, state, frame[H, W, 3], is_first) is jitted; frame is
    the already normalized padded image — or, with ``uint8_input=True``,
    a resized uint8 [img_h, img_w, 3] frame normalized + padded ON DEVICE
    (4x less host->device traffic; same regime as the batched driver).
    ``debug=True`` additionally returns {'proto', 'mask_coeff',
    'det_valid'} of the pre-tracking detections (the ``--display_lincomb``
    surface).
    """
    priors = jnp.asarray(all_priors(cfg))
    step_fn = _make_step_fn(cfg, model, priors, debug=debug,
                            debug_fpn=debug_fpn)
    if uint8_input:
        from ..data.transforms import normalize_pad_device
        normalize_pad = normalize_pad_device(cfg)

        def outer(params, state, frame, is_first):
            return step_fn(params, state, normalize_pad(frame), is_first)
    else:
        outer = step_fn
    video_step = jax.jit(outer, donate_argnums=(1,))

    def make_init_state(feat_dtype=jnp.float32) -> TrackState:
        feat_shape = cfg.feature_shapes()[cfg.correlation_selected_layer]
        proto_shape = (cfg.pad_h // 4, cfg.pad_w // 4)
        return init_state(cfg, feat_shape, proto_shape,
                          cfg.fpn.num_features, cfg.embed_dim,
                          feat_dtype=feat_dtype)

    return video_step, make_init_state


def build_video_step_batched(cfg: STMaskConfig, model: STMask,
                             n_videos: int, chunk_size: int = 4,
                             uint8_input: bool = False):
    """Step ``n_videos`` independent video streams in lockstep.

    Tracking is sequential *within* a video (reference ``track_TF.py:43``
    supports only batch 1), but across videos it is embarrassingly
    parallel: the natural TPU serving/eval layout batches B per-video
    tracker states through one compiled step, amortizing per-dispatch
    host cost and improving device utilization (measured +7% aggregate
    FPS at B=8 over B=1, PARITY.md round-3 findings). Combined with a
    ``chunk_size``-frame ``lax.scan``.

    Returns (video_chunk, make_init_states):
      video_chunk(params, states, frames [K, B, H, W, 3], is_first [K, B])
        -> (states, FrameOutput with leading [K, B])
      where ``states`` is a TrackState pytree with a leading [B] axis.

    ``uint8_input=True`` takes frames as uint8 [K, B, img_h, img_w, 3]
    (resized but NOT normalized/padded) and normalizes + pads on device —
    4x less host->device traffic, numerically identical to host
    normalization (same fp32 elementwise ops).
    """
    priors = jnp.asarray(all_priors(cfg))
    from ..data.transforms import normalize_pad_device
    normalize_pad = normalize_pad_device(cfg)

    def batched_step(params, states, frames, is_first):
        param_dtype = jax.tree_util.tree_leaves(params)[0].dtype
        preds = model.apply(params, frames.astype(param_dtype),
                            train=False)

        def det_one(loc, conf, coeff, track, cent, proto):
            return detect_frame(cfg, {'loc': loc, 'conf': conf,
                                      'mask_coeff': coeff, 'track': track,
                                      'centerness': cent}, priors,
                                proto=proto)

        dets = jax.vmap(det_one)(preds['loc'], preds['conf'],
                                 preds['mask_coeff'], preds['track'],
                                 preds['centerness'], preds['proto'])
        if cfg.use_maskiou and (cfg.rescore_mask or cfg.rescore_bbox):
            def rescore_one(det, proto):
                return rescore_maskiou(
                    cfg,
                    lambda m: model.apply(params, m, method=STMask.maskiou),
                    det, proto)
            dets = jax.vmap(rescore_one)(dets, preds['proto'])

        def temporal_net_fn(x):
            return model.apply(params, x, method=STMask.temporal_shift)

        def track_one(state, det, proto, fpn_feat, t2s_feat, first):
            return track_step_tf(cfg, temporal_net_fn, state, det, proto,
                                 fpn_feat, t2s_feat, first)

        if cfg.temporal_fusion_module:
            return jax.vmap(track_one)(states, dets, preds['proto'],
                                       preds['fpn_feat'],
                                       preds['T2S_feat'], is_first)
        return jax.vmap(lambda s, d, p, f: track_step_simple(cfg, s, d, p,
                                                             f))(
            states, dets, preds['proto'], is_first)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def video_chunk(params, states, frames, is_first):
        if uint8_input:
            frames = normalize_pad(frames)

        def body(sts, inp):
            fr, first = inp
            return batched_step(params, sts, fr, first)

        return jax.lax.scan(body, states, (frames, is_first))

    def make_init_states(feat_dtype=jnp.float32):
        feat_shape = cfg.feature_shapes()[cfg.correlation_selected_layer]
        proto_shape = (cfg.pad_h // 4, cfg.pad_w // 4)
        one = init_state(cfg, feat_shape, proto_shape,
                         cfg.fpn.num_features, cfg.embed_dim,
                         feat_dtype=feat_dtype)
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_videos,) + x.shape).copy(),
            one)

    return video_chunk, make_init_states


def build_video_scan(cfg: STMaskConfig, model: STMask, chunk_size: int = 8):
    """Chunked streaming: ONE dispatch per ``chunk_size`` frames via
    ``lax.scan`` — amortizes host dispatch and keeps the whole per-video
    tracking recurrence on device (SURVEY §5.7's streaming-scan design).

    ``is_first`` flags ride along per frame, so a chunk may span video
    boundaries (the tracker state resets mid-scan).

    Returns (video_chunk, make_init_state):
      video_chunk(params, state, frames [K, H, W, 3], is_first [K])
        -> (state, FrameOutput with leading K axis)
    """
    priors = jnp.asarray(all_priors(cfg))
    step_fn = _make_step_fn(cfg, model, priors)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def video_chunk(params, state: TrackState, frames: jax.Array,
                    is_first: jax.Array):
        def body(st, inp):
            frame, first = inp
            st, out = step_fn(params, st, frame, first)
            return st, out

        return jax.lax.scan(body, state, (frames, is_first))

    def make_init_state(feat_dtype=jnp.float32) -> TrackState:
        feat_shape = cfg.feature_shapes()[cfg.correlation_selected_layer]
        proto_shape = (cfg.pad_h // 4, cfg.pad_w // 4)
        return init_state(cfg, feat_shape, proto_shape,
                          cfg.fpn.num_features, cfg.embed_dim,
                          feat_dtype=feat_dtype)

    return video_chunk, make_init_state


def cast_params(params, dtype=jnp.bfloat16):
    """Cast float params to a compute dtype (bf16 inference: MXU-native and
    half the HBM traffic; decode-side heads are cast back to fp32 inside the
    model)."""
    import jax.numpy as _jnp

    def cast(x):
        if hasattr(x, 'dtype') and x.dtype == _jnp.float32:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params)
