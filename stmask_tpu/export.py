"""AOT model export for deployment (``jax.export`` / StableHLO).

The reference has no deployment artifact — serving means dragging the
whole PyTorch repo along.  Here the compiled per-frame video step (or the
lockstep-batched variant) is exported ahead-of-time to a self-contained
StableHLO artifact that a serving host can load and run with nothing but
``jax`` installed — no model code, no config registry, no weights file
(weights are baked in as constants).  Multi-platform lowering lets one
artifact target both ``tpu`` and ``cpu``.

Artifact format: a zip with ``meta.json`` (config name, shapes, dtypes,
framework version) and ``fn.bin`` (``jax.export.Exported.serialize()``).

Usage::

    from stmask_tpu.export import export_video_step, save_exported
    exported, meta = export_video_step(cfg, model, params)
    save_exported(exported, meta, 'model.stmask')

    # on the serving host
    from stmask_tpu.export import load_exported
    step, meta = load_exported('model.stmask')
    state = step.init_state()                      # fresh per-video state
    state, out = step(state, frame, is_first)

CLI: ``scripts/export_model.py``.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from .config import STMaskConfig
from .inference.candidates import Detections
from .inference.tracker import FrameOutput, TrackState

__version__ = '1'

# NamedTuple pytrees crossing the export boundary must have registered
# serializations (idempotent-guarded: jax raises on double registration).
_REGISTERED = False


def _register_pytrees() -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    jexport.register_namedtuple_serialization(
        TrackState, serialized_name='stmask_tpu.TrackState')
    jexport.register_namedtuple_serialization(
        FrameOutput, serialized_name='stmask_tpu.FrameOutput')
    jexport.register_namedtuple_serialization(
        Detections, serialized_name='stmask_tpu.Detections')
    _REGISTERED = True


def export_video_step(cfg: STMaskConfig, model, params,
                      platforms: Optional[Tuple[str, ...]] = None,
                      batched: int = 0, chunk_size: int = 1,
                      uint8_input: bool = True,
                      ) -> Tuple[jexport.Exported, Dict[str, Any]]:
    """Export the per-frame inference step with ``params`` baked in.

    The exported callable is ``fn(state, frames, is_first) -> (state,
    FrameOutput)`` — params are constants inside the StableHLO module, so
    the artifact is self-contained.  ``batched=N`` exports the lockstep
    N-stream ``chunk_size``-frame program instead (leading axes [K, N]);
    ``batched=0`` exports the single-stream single-frame step.

    ``uint8_input`` exports the production transfer regime: resized uint8
    [img_h, img_w, 3] frames, normalize + pad on device.

    ``platforms`` defaults to the current backend; pass e.g.
    ``('tpu', 'cpu')`` for a multi-platform artifact (note: kernel
    dispatch decisions like ``use_pallas='auto'`` are made at trace time
    from the *current* backend, so cross-lowering exports the current
    backend's formulation for every platform).
    """
    _register_pytrees()
    from .inference.pipeline import (build_video_step,
                                     build_video_step_batched)

    if batched:
        video_chunk, make_states = build_video_step_batched(
            cfg, model, n_videos=batched, chunk_size=chunk_size,
            uint8_input=uint8_input)
        state0 = make_states()
        if uint8_input:
            frame_shape = (chunk_size, batched, cfg.img_h, cfg.img_w, 3)
            frame_dtype = jnp.uint8
        else:
            frame_shape = (chunk_size, batched, cfg.pad_h, cfg.pad_w, 3)
            frame_dtype = jnp.float32
        first_shape = (chunk_size, batched)
        step = lambda st, fr, first: video_chunk(params, st, fr, first)
    else:
        video_step, make_state = build_video_step(
            cfg, model, uint8_input=uint8_input)
        state0 = make_state()
        if uint8_input:
            frame_shape = (cfg.img_h, cfg.img_w, 3)
            frame_dtype = jnp.uint8
        else:
            frame_shape = (cfg.pad_h, cfg.pad_w, 3)
            frame_dtype = jnp.float32
        first_shape = ()
        step = lambda st, fr, first: video_step(params, st, fr, first)

    if platforms is None:
        platforms = (jexport.default_export_platform(),)
    # params are a closure constant -> baked into the module
    fn = jax.jit(step)
    args = (state0,
            jax.ShapeDtypeStruct(frame_shape, frame_dtype),
            jax.ShapeDtypeStruct(first_shape, jnp.bool_))
    exported = jexport.export(fn, platforms=list(platforms))(*args)

    state_meta = jax.tree_util.tree_map(
        lambda x: [list(x.shape), str(x.dtype)], state0)._asdict()
    meta = {
        'format_version': __version__,
        'config': cfg.name,
        'platforms': list(platforms),
        'batched': batched,
        'chunk_size': chunk_size,
        'uint8_input': uint8_input,
        'frame_shape': list(frame_shape),
        'frame_dtype': str(jnp.dtype(frame_dtype)),
        'param_dtype': str(jax.tree_util.tree_leaves(params)[0].dtype),
        'img_shape': [cfg.img_h, cfg.img_w],
        'pad_shape': [cfg.pad_h, cfg.pad_w],
        'track_capacity': cfg.track_capacity,
        'state': state_meta,
    }
    return exported, meta


def save_exported(exported: jexport.Exported, meta: Dict[str, Any],
                  path: str) -> None:
    """Write the artifact zip: ``meta.json`` + ``fn.bin``."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w', zipfile.ZIP_DEFLATED) as z:
        z.writestr('meta.json', json.dumps(meta, indent=1))
        z.writestr('fn.bin', exported.serialize())
    with open(path, 'wb') as f:
        f.write(buf.getvalue())


class ExportedStep:
    """A loaded serving artifact: ``step(state, frames, is_first)`` plus
    ``init_state()`` reconstructing the zero tracker state from metadata
    (no model code or config needed on the serving host)."""

    def __init__(self, exported: jexport.Exported, meta: Dict[str, Any]):
        self._exported = exported
        self.meta = meta
        self._call = jax.jit(exported.call)

    def __call__(self, state, frames, is_first):
        return self._call(state, frames, is_first)

    def init_state(self) -> TrackState:
        fields = self.meta['state']
        return TrackState(**{
            k: jnp.zeros(tuple(shape), dtype=jnp.dtype(dt))
            for k, (shape, dt) in fields.items()})


def load_exported(path: str) -> Tuple[ExportedStep, Dict[str, Any]]:
    _register_pytrees()
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read('meta.json'))
        exported = jexport.deserialize(bytearray(z.read('fn.bin')))
    if meta.get('format_version') != __version__:
        raise ValueError(
            f'artifact format {meta.get("format_version")!r} != '
            f'supported {__version__!r}')
    return ExportedStep(exported, meta), meta
