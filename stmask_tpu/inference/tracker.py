"""Fixed-capacity video instance tracker (TF and simple variants).

Re-design of the reference's stateful per-video trackers:
  * ``Track_TF`` (``layers/functions/track_TF.py:50-181``): previous tracks
    are *shifted* to the current frame by the TemporalNet (CandidateShift,
    ``TF_utils.py:12-51``), then matched against new detections with a mixed
    score (embedding cosine + mask IoU + box IoU + label consistency,
    ``TF_utils.py:99-120``), greedily with per-track best-score conflict
    resolution.
  * ``Track`` (``layers/functions/track.py:56-180``): no shift; memory update
    gated by a mask-overlap test.

TPU re-design: the reference grows its track memory without bound
(``track_TF.py:137-139``); here the state is a fixed bank of
``track_capacity`` slots with a validity mask and a monotonically increasing
global id counter.  Slots whose track can never be output again (score
decayed below the output threshold AND age beyond the output window) are
recycled for new tracks — a deviation from the reference only in the rare
case where a long-dead track would have been re-matched.

The greedy, order-dependent id assignment (``track_TF.py:132-156``) becomes a
``lax.fori_loop`` over score-sorted detections with masked dynamic updates —
bitwise-identical assignment order to the reference for valid detections.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import STMaskConfig
from ..ops.boxes import center_size, decode, jaccard, mask_iou, sanitize_coordinates_hw
from ..ops.correlation import correlate
from ..ops.masks import generate_mask
from ..ops.roi_align import roi_align
from .candidates import Detections

NEG = -1e10


class TrackState(NamedTuple):
    """Per-video persistent state (all fixed capacity T)."""
    box: jax.Array          # [T, 4]
    score: jax.Array        # [T]
    cls: jax.Array          # [T] int32
    mask_coeff: jax.Array   # [T, 32]
    track: jax.Array        # [T, E]
    centerness: jax.Array   # [T]
    mask: jax.Array         # [T, Hp, Wp] soft masks on current frame
    age: jax.Array          # [T] int32 frames since last detection
    valid: jax.Array        # [T] bool slot in use
    obj_id: jax.Array       # [T] int32 global instance id (0-based)
    next_id: jax.Array      # [] int32
    # previous-frame features for the temporal shift
    fpn_feat: jax.Array     # [H4, W4, C]
    t2s_feat: jax.Array     # [H4, W4, C]


def init_state(cfg: STMaskConfig, feat_shape: Tuple[int, int],
               proto_shape: Tuple[int, int], feat_ch: int = 256,
               embed_dim: int | None = None,
               feat_dtype=jnp.float32) -> TrackState:
    t = cfg.track_capacity
    e = embed_dim or cfg.embed_dim
    hp, wp = proto_shape
    h4, w4 = feat_shape
    return TrackState(
        box=jnp.zeros((t, 4)), score=jnp.zeros((t,)),
        cls=jnp.zeros((t,), jnp.int32),
        mask_coeff=jnp.zeros((t, cfg.mask_proto_n)),
        track=jnp.zeros((t, e)), centerness=jnp.zeros((t,)),
        mask=jnp.zeros((t, hp, wp)), age=jnp.zeros((t,), jnp.int32),
        valid=jnp.zeros((t,), bool), obj_id=jnp.zeros((t,), jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
        fpn_feat=jnp.zeros((h4, w4, feat_ch), feat_dtype),
        t2s_feat=jnp.zeros((h4, w4, feat_ch), feat_dtype))


def candidate_shift(cfg: STMaskConfig, temporal_net_fn, state: TrackState,
                    cur_fpn_feat: jax.Array, cur_t2s_feat: jax.Array,
                    cur_proto: jax.Array) -> TrackState:
    """Shift track boxes/coeffs/masks to the current frame
    (reference TF_utils.py:12-51 CandidateShift).

    TPU adaptation: the TemporalNet runs only on the first
    ``shift_capacity`` *active* slots (valid and still output-eligible) —
    the reference shifts its entire ever-growing candidate bank, but dead
    tracks only matter if re-matched, where the detection refreshes them
    anyway.  Score decay / aging still apply to every slot.
    """
    h4, w4, _ = cur_fpn_feat.shape
    x_corr = correlate(state.fpn_feat[None], cur_fpn_feat[None],
                       patch_size=cfg.correlation_patch_size)[0]
    concat = jax.nn.relu(jnp.concatenate(
        [x_corr, state.t2s_feat, cur_t2s_feat], axis=-1))

    s_cap = min(cfg.shift_capacity, cfg.track_capacity)
    active = state.valid & ~((state.score <= cfg.eval_conf_thresh)
                             & (state.age > cfg.max_tracked_mask_age))
    _, sel = jax.lax.top_k(active.astype(jnp.float32), s_cap)
    sel_valid = active[sel]                                       # [S]

    boxes_sel = state.box[sel]
    boxes_feat = sanitize_coordinates_hw(boxes_sel, h4, w4)
    pooled = roi_align(concat, boxes_feat, pool_size=7)           # [S,7,7,C]
    loc_shift, coeff_shift = temporal_net_fn(pooled)              # [S,4],[S,32]

    box_shift_sel = decode(loc_shift, center_size(boxes_sel))
    coeff_sel = state.mask_coeff[sel] + coeff_shift

    pred = jnp.reshape(sel_valid, (-1, 1))
    box = state.box.at[sel].set(jnp.where(pred, box_shift_sel, boxes_sel))
    coeff = state.mask_coeff.at[sel].set(
        jnp.where(pred, coeff_sel, state.mask_coeff[sel]))
    masks = generate_mask(cur_proto, coeff, box)                  # [T,Hp,Wp]
    return state._replace(
        box=box,
        score=state.score * cfg.score_decay,
        mask_coeff=coeff,
        mask=masks,
        age=state.age + 1)


def _comp_scores(cfg: STMaskConfig, det: Detections, det_masks: jax.Array,
                 state: TrackState) -> jax.Array:
    """Mixed matching score matrix [D, T+1]; column 0 is the new-object
    dummy (reference TF_utils.py:99-120 compute_comp_scores)."""
    cos = det.track @ state.track.T                              # [D, T]
    cos = jnp.concatenate([jnp.zeros((cos.shape[0], 1)), cos], axis=1)
    cos = (cos + 1.0) / 2.0

    bbox_ious = jaccard(det.box, state.box)                      # [D, T]
    prev_masks = (state.mask > 0.5).astype(jnp.float32)
    mask_ious = mask_iou(det_masks, prev_masks)                  # [D, T]
    label_delta = (state.cls[None, :] == det.cls[:, None]).astype(jnp.float32)

    dummy = jnp.full((cos.shape[0], 1), cfg.bbox_dummy_iou)
    bbox_ious = jnp.concatenate([dummy, bbox_ious], axis=1)
    mask_ious = jnp.concatenate([dummy, mask_ious], axis=1)
    label_delta = jnp.concatenate(
        [jnp.ones((cos.shape[0], 1)), label_delta], axis=1)

    c = cfg.match_coeff
    comp = (cos + c[0] * det.score[:, None] + c[1] * mask_ious
            + c[2] * bbox_ious + c[3] * label_delta)
    # invalid track slots can never be matched
    col_valid = jnp.concatenate([jnp.ones((1,), bool), state.valid])
    return jnp.where(col_valid[None, :], comp, NEG)


def _free_slots(cfg: STMaskConfig, state: TrackState) -> jax.Array:
    """Slots reusable for new tracks: unused, or permanently un-outputtable."""
    dead = (state.score <= cfg.eval_conf_thresh) & \
           (state.age > cfg.max_tracked_mask_age)
    return ~state.valid | dead


def _cond_write(arr: jax.Array, slot, row, cond) -> jax.Array:
    """Write one row at a dynamic slot, predicated: O(row) work, never a
    full-array select (the naive where-blend would stream the whole track
    bank — including [T, Hp, Wp] masks — per detection)."""
    old = arr[slot]
    new = jnp.where(jnp.reshape(cond, (1,) * jnp.ndim(row)), row, old)
    return arr.at[slot].set(new)


def assign_ids(cfg: STMaskConfig, det: Detections, det_masks: jax.Array,
               state: TrackState) -> TrackState:
    """Greedy detection->track assignment with conflict resolution
    (reference track_TF.py:125-156), as a fori_loop over detections with
    row-predicated dynamic writes."""
    comp = _comp_scores(cfg, det, det_masks, state)              # [D, T+1]
    match_ids = jnp.argmax(comp, axis=1)                         # [D]
    d = det.box.shape[0]
    t = state.box.shape[0]

    def write_det(st: TrackState, slot, i, cond) -> TrackState:
        return st._replace(
            box=_cond_write(st.box, slot, det.box[i], cond),
            score=_cond_write(st.score, slot, det.score[i], cond),
            cls=_cond_write(st.cls, slot, det.cls[i], cond),
            mask_coeff=_cond_write(st.mask_coeff, slot, det.mask_coeff[i],
                                   cond),
            track=_cond_write(st.track, slot, det.track[i], cond),
            centerness=_cond_write(st.centerness, slot, det.centerness[i],
                                   cond),
            mask=_cond_write(st.mask, slot, det_masks[i], cond),
            age=_cond_write(st.age, slot, jnp.int32(0), cond),
            valid=_cond_write(st.valid, slot, jnp.bool_(True), cond),
        )

    def body(i, carry):
        st, best_score, free = carry
        mid = match_ids[i]
        is_valid = det.valid[i]
        is_new = is_valid & (mid == 0)
        is_match = is_valid & (mid > 0)

        # new object -> first free slot (prefer never-used ones)
        slot_new = jnp.argmax(free.astype(jnp.int32)
                              + (free & ~st.valid).astype(jnp.int32))
        cond_new = is_new & jnp.any(free)

        # existing object -> overwrite if this det scores higher
        slot_m = jnp.maximum(mid - 1, 0)
        cond_m = is_match & (det.score[i] > best_score[slot_m])

        st = write_det(st, slot_new, i, cond_new)
        st = st._replace(
            obj_id=_cond_write(st.obj_id, slot_new, st.next_id, cond_new),
            next_id=jnp.where(cond_new, st.next_id + 1, st.next_id))
        free = free.at[slot_new].set(jnp.where(cond_new, False,
                                               free[slot_new]))

        st = write_det(st, slot_m, i, cond_m)
        best_score = best_score.at[slot_m].set(
            jnp.where(cond_m, det.score[i], best_score[slot_m]))
        return st, best_score, free

    free0 = _free_slots(cfg, state)
    best0 = jnp.full((t,), -1.0)
    state, _, _ = jax.lax.fori_loop(0, d, body, (state, best0, free0))
    return state


class FrameOutput(NamedTuple):
    """Per-frame tracked detections (fixed capacity T, masked by keep)."""
    box: jax.Array       # [T, 4] normalized point form
    score: jax.Array     # [T]
    cls: jax.Array       # [T]
    mask: jax.Array      # [T, Hp, Wp] soft masks at proto resolution
    obj_id: jax.Array    # [T]
    keep: jax.Array      # [T] bool


def track_step_tf(cfg: STMaskConfig, temporal_net_fn, state: TrackState,
                  det: Detections, cur_proto: jax.Array,
                  cur_fpn_feat: jax.Array, cur_t2s_feat: jax.Array,
                  is_first: jax.Array) -> Tuple[TrackState, FrameOutput]:
    """One frame of Track_TF (reference track_TF.py:50-181).

    All branches are computed and blended with ``where`` — under jit this is
    one fused program; the state reset on ``is_first`` zeroes the bank.
    """
    # reset on the first frame of a video
    empty = init_state(cfg, cur_fpn_feat.shape[:2], cur_proto.shape[:2],
                       cur_fpn_feat.shape[-1], state.track.shape[-1],
                       cur_fpn_feat.dtype)
    state = jax.tree_util.tree_map(
        lambda e, s: jnp.where(
            jnp.reshape(is_first, (1,) * e.ndim), e, s), empty, state)

    # shift previous tracks onto this frame (no-op on empty state)
    shifted = candidate_shift(cfg, temporal_net_fn, state, cur_fpn_feat,
                              cur_t2s_feat, cur_proto)
    has_prev = jnp.any(state.valid)
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(jnp.reshape(has_prev, (1,) * a.ndim), a, b),
        shifted, state)

    # current-frame detection masks
    det_masks_soft = generate_mask(cur_proto, det.mask_coeff, det.box)
    det_masks = (det_masks_soft > 0.5).astype(jnp.float32)

    # greedy matching / new-track allocation; detections that carry a soft
    # mask into the bank use the *soft* mask (reference stores
    # candidate['mask'] = det_masks_soft)
    det_for_bank = det
    state = assign_ids(cfg, det_for_bank, det_masks_soft, state)

    # output keep conditions (reference track_TF.py:158-165)
    mask_area = jnp.sum(state.mask > 0.5, axis=(1, 2))
    keep = ((state.age <= cfg.max_tracked_mask_age)
            & (mask_area > 1)
            & (state.score > cfg.eval_conf_thresh)
            & state.valid)

    out = FrameOutput(box=state.box, score=state.score, cls=state.cls,
                      mask=state.mask, obj_id=state.obj_id, keep=keep)

    state = state._replace(fpn_feat=cur_fpn_feat, t2s_feat=cur_t2s_feat)
    return state, out


def track_step_simple(cfg: STMaskConfig, state: TrackState, det: Detections,
                      cur_proto: jax.Array,
                      is_first: jax.Array) -> Tuple[TrackState, FrameOutput]:
    """One frame of the no-TF tracker (reference track.py:56-180).

    Differences from TF: no shift (state boxes/masks stay from their last
    detection), memory update additionally gated by a mask-overlap test
    (``(mask_ious[idx] > 0.3).sum() < 2``, track.py:162), and the output is
    the current *detections* (with assigned ids), not the track bank.
    """
    empty = init_state(cfg, state.fpn_feat.shape[:2], cur_proto.shape[:2],
                       state.fpn_feat.shape[-1], state.track.shape[-1])
    state = jax.tree_util.tree_map(
        lambda e, s: jnp.where(jnp.reshape(is_first, (1,) * e.ndim), e, s),
        empty, state)

    det_masks_soft = generate_mask(cur_proto, det.mask_coeff, det.box)
    det_masks = (det_masks_soft > 0.5).astype(jnp.float32)

    comp = _comp_scores(cfg, det, det_masks, state)
    match_ids = jnp.argmax(comp, axis=1)
    d = det.box.shape[0]
    t = state.box.shape[0]

    # mask-overlap gate for memory update: det overlaps >=2 prev masks
    prev_masks = (state.mask > 0.5).astype(jnp.float32)
    mious = mask_iou(det_masks, prev_masks)
    mious = jnp.where(state.valid[None, :], mious, 0.0)
    overlap_many = jnp.sum(mious > 0.3, axis=1) >= 2            # [D]

    def write_det(st, slot, i, cond):
        return st._replace(
            box=_cond_write(st.box, slot, det.box[i], cond),
            score=_cond_write(st.score, slot, det.score[i], cond),
            cls=_cond_write(st.cls, slot, det.cls[i], cond),
            mask_coeff=_cond_write(st.mask_coeff, slot, det.mask_coeff[i],
                                   cond),
            track=_cond_write(st.track, slot, det.track[i], cond),
            centerness=_cond_write(st.centerness, slot, det.centerness[i],
                                   cond),
            mask=_cond_write(st.mask, slot, det_masks[i], cond),
            age=_cond_write(st.age, slot, jnp.int32(0), cond),
            valid=_cond_write(st.valid, slot, jnp.bool_(True), cond))

    def body(i, carry):
        st, best_score, free, det_ids = carry
        mid = match_ids[i]
        is_valid = det.valid[i]
        is_new = is_valid & (mid == 0)
        is_match = is_valid & (mid > 0)

        slot_new = jnp.argmax(free.astype(jnp.int32)
                              + (free & ~st.valid).astype(jnp.int32))
        cond_new = is_new & jnp.any(free)
        st = write_det(st, slot_new, i, cond_new)
        st = st._replace(
            obj_id=_cond_write(st.obj_id, slot_new, st.next_id, cond_new),
            next_id=jnp.where(cond_new, st.next_id + 1, st.next_id))
        det_ids = det_ids.at[i].set(
            jnp.where(cond_new, st.obj_id[slot_new], det_ids[i]))
        free = free.at[slot_new].set(jnp.where(cond_new, False,
                                               free[slot_new]))

        slot_m = jnp.maximum(mid - 1, 0)
        better = is_match & (det.score[i] > best_score[slot_m])
        # displace the previous best det for this track (its id -> -1)
        prev_mask = better & (det_ids == st.obj_id[slot_m])
        det_ids = jnp.where(prev_mask, -1, det_ids)
        det_ids = det_ids.at[i].set(
            jnp.where(better, st.obj_id[slot_m], det_ids[i]))
        # memory update additionally gated by the mask-overlap test
        do_update = better & ~overlap_many[i]
        saved_id = st.obj_id[slot_m]
        st = write_det(st, slot_m, i, do_update)
        st = st._replace(
            obj_id=_cond_write(st.obj_id, slot_m, saved_id, do_update))
        best_score = best_score.at[slot_m].set(
            jnp.where(better, det.score[i], best_score[slot_m]))
        return st, best_score, free, det_ids

    free0 = _free_slots(cfg, state)
    best0 = jnp.full((t,), -1.0)
    ids0 = jnp.full((d,), -1, jnp.int32)
    state, _, _, det_ids = jax.lax.fori_loop(
        0, d, body, (state, best0, free0, ids0))

    keep = det.valid & (det_ids >= 0)
    out = FrameOutput(box=det.box, score=det.score, cls=det.cls,
                      mask=det_masks_soft, obj_id=det_ids, keep=keep)
    return state, out
