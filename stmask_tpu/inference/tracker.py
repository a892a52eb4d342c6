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

The greedy, order-dependent id assignment (``track_TF.py:132-156``) is
resolved in closed form (``resolve_assignment``): the sequential
strictly-greater replacement rule converges to the earliest-index per-track
score argmax, so the whole loop becomes a handful of segment-max/scatter
ops — no sequential iteration on device, identical results.
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
                       patch_size=cfg.correlation_patch_size,
                       use_pallas='auto')[0]
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


def merge_candidates(cand: Detections,
                     shifted: Detections) -> Detections:
    """Merge current detections with shifted reference candidates into one
    fixed-capacity, score-sorted set (reference TF_utils.py:85-96
    merge_candidates).

    Parity with reference DEAD CODE: the reference exports this from
    ``layers/functions/__init__.py:5`` but never calls it from its main
    eval path (``track_TF.py`` does not use it); it is kept here, unit-
    tested, for the same multi-clip evaluation variants — deliberately
    unwired, exactly like the reference."""
    import jax.numpy as jnp

    def cat(a, b):
        return jnp.concatenate([a, b], axis=0)

    scores = cat(jnp.where(cand.valid, cand.score, -jnp.inf),
                 jnp.where(shifted.valid, shifted.score, -jnp.inf))
    d = cand.score.shape[0]
    top, idx = jax.lax.top_k(scores, d)
    return Detections(
        box=cat(cand.box, shifted.box)[idx],
        score=top,
        cls=cat(cand.cls, shifted.cls)[idx],
        mask_coeff=cat(cand.mask_coeff, shifted.mask_coeff)[idx],
        track=cat(cand.track, shifted.track)[idx],
        centerness=cat(cand.centerness, shifted.centerness)[idx],
        valid=jnp.isfinite(top))


class Assignment(NamedTuple):
    """Vectorized resolution of the greedy det->track assignment."""
    # matched updates
    has_winner: jax.Array   # [T] slot receives a matched detection
    winner_src: jax.Array   # [T] det index feeding the slot (clamped)
    # new-track allocations
    alloc_slot: jax.Array   # [D] slot each det would allocate (clamped)
    can_alloc: jax.Array    # [D] det actually allocates a new track
    new_rank: jax.Array     # [D] rank among allocating dets
    det_slot: jax.Array     # [D] slot of this det's track (-1 if none)
    num_new: jax.Array      # [] number of allocated tracks


def resolve_assignment(cfg: STMaskConfig, match_ids: jax.Array,
                       det_valid: jax.Array, det_scores: jax.Array,
                       state: TrackState) -> Assignment:
    """Closed-form equivalent of the reference's sequential greedy loop
    (track_TF.py:132-156 / track.py:137-171).

    The sequential rule replaces a track's detection only on a strictly
    higher score, so for ANY iteration order it converges to the
    earliest-index detection attaining the per-track score maximum;
    displaced dets get no id and never allocate.  New-track slots follow
    cumulative rank over the free-slot priority order.  All bulk vector
    ops — no sequential loop.
    """
    d = match_ids.shape[0]
    t = state.valid.shape[0]
    det_idx = jnp.arange(d)
    big = d + 1

    is_match = det_valid & (match_ids > 0)
    slot_of_det = jnp.where(is_match, match_ids - 1, 0)
    best = jnp.full((t,), -jnp.inf).at[slot_of_det].max(
        jnp.where(is_match, det_scores, -jnp.inf))
    is_best = is_match & (det_scores == best[slot_of_det])
    key = jnp.where(is_best, det_idx, big)
    winner = jnp.full((t,), big, jnp.int32).at[slot_of_det].min(
        key.astype(jnp.int32))
    has_winner = winner < big
    winner_src = jnp.minimum(winner, d - 1)

    # new-track allocation: free slots ordered (never-used first, then
    # recyclable), excluding slots just refreshed by a match
    is_new = det_valid & (match_ids == 0)
    free = _free_slots(cfg, state) & ~has_winner
    prio = free.astype(jnp.int32) + (free & ~state.valid).astype(jnp.int32)
    slot_order = jnp.argsort(-prio, stable=True)        # [T] best first
    num_free = jnp.sum(free)
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1     # [D]
    rank = jnp.where(is_new, rank, 0)
    alloc_slot = slot_order[jnp.minimum(rank, t - 1)]
    can_alloc = is_new & (rank < num_free)

    det_slot = jnp.where(can_alloc, alloc_slot, -1)
    det_is_winner = is_match & (winner[slot_of_det] == det_idx)
    det_slot = jnp.where(det_is_winner, slot_of_det, det_slot)
    return Assignment(has_winner, winner_src, alloc_slot, can_alloc,
                      jnp.where(is_new, rank, 0), det_slot,
                      jnp.sum(can_alloc))


def _apply_assignment(state: TrackState, det: Detections,
                      det_masks: jax.Array, asn: Assignment,
                      update_winners: jax.Array) -> TrackState:
    """Bulk-apply matched refreshes + new-track writes.

    update_winners: [T] mask — which winning slots actually copy det
    features (TF mode: all winners; simple mode: gated by mask overlap).
    """
    uw = update_winners
    t = state.valid.shape[0]
    # non-allocating dets scatter out of bounds -> dropped (no collision
    # with real slots)
    safe_slot = jnp.where(asn.can_alloc, asn.alloc_slot, t)

    def upd(field_state, field_det, reset=None):
        gathered = field_det[asn.winner_src]
        cond = uw.reshape((-1,) + (1,) * (field_state.ndim - 1))
        out = jnp.where(cond, gathered, field_state)
        # scatter new-track rows (distinct slots per allocating det)
        return out.at[safe_slot].set(field_det, mode='drop')

    new_age = jnp.where(uw, 0, state.age)
    new_age = new_age.at[safe_slot].set(0, mode='drop')
    new_valid = state.valid.at[safe_slot].set(True, mode='drop')
    new_ids = state.obj_id.at[safe_slot].set(
        state.next_id + asn.new_rank, mode='drop')
    return state._replace(
        box=upd(state.box, det.box),
        score=upd(state.score, det.score),
        cls=upd(state.cls, det.cls),
        mask_coeff=upd(state.mask_coeff, det.mask_coeff),
        track=upd(state.track, det.track),
        centerness=upd(state.centerness, det.centerness),
        mask=upd(state.mask, det_masks),
        age=new_age, valid=new_valid, obj_id=new_ids,
        next_id=state.next_id + asn.num_new)


def assign_ids(cfg: STMaskConfig, det: Detections, det_masks_match: jax.Array,
               det_masks_bank: jax.Array, state: TrackState) -> TrackState:
    """Greedy detection->track assignment with conflict resolution
    (reference track_TF.py:125-156), fully vectorized.

    The det mask plays two distinct roles in the reference and they are NOT
    the same tensor: match scoring uses the *binarized* mask
    (``det_masks_soft.gt(0.5)``, track_TF.py:83, consumed by ``mask_iou`` at
    :111) while the bank stores the *soft* mask
    (``candidate['mask'] = det_masks_soft``, track_TF.py:82).  Pass them
    separately — ``det_masks_match`` feeds ``_comp_scores``,
    ``det_masks_bank`` is what matched/allocated slots copy.
    """
    comp = _comp_scores(cfg, det, det_masks_match, state)        # [D, T+1]
    match_ids = jnp.argmax(comp, axis=1)                         # [D]
    asn = resolve_assignment(cfg, match_ids, det.valid, det.score, state)
    return _apply_assignment(state, det, det_masks_bank, asn, asn.has_winner)


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

    # current-frame detection masks: binarized for match scoring
    # (track_TF.py:83,111), soft for the bank (track_TF.py:82)
    det_masks_soft = generate_mask(cur_proto, det.mask_coeff, det.box)
    det_masks = (det_masks_soft > 0.5).astype(jnp.float32)
    state = assign_ids(cfg, det, det_masks, det_masks_soft, state)

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

    # mask-overlap gate for memory update: det overlaps >=2 prev masks
    prev_masks = (state.mask > 0.5).astype(jnp.float32)
    mious = mask_iou(det_masks, prev_masks)
    mious = jnp.where(state.valid[None, :], mious, 0.0)
    overlap_many = jnp.sum(mious > 0.3, axis=1) >= 2            # [D]

    asn = resolve_assignment(cfg, match_ids, det.valid, det.score, state)
    # track ids BEFORE the update (matched slots keep their id)
    det_ids = jnp.where(asn.det_slot >= 0,
                        state.obj_id[jnp.maximum(asn.det_slot, 0)], -1)
    det_ids = jnp.where(asn.can_alloc,
                        state.next_id + asn.new_rank, det_ids)
    update_winners = asn.has_winner & ~overlap_many[asn.winner_src]
    state = _apply_assignment(state, det, det_masks, asn, update_winners)

    keep = det.valid & (det_ids >= 0)
    # the reference's simple tracker outputs the BINARIZED masks
    # (track.py:90-91 ``detection['mask'] = det_masks``), unlike Track_TF
    # which carries soft masks through the bank
    out = FrameOutput(box=det.box, score=det.score, cls=det.cls,
                      mask=det_masks, obj_id=det_ids, keep=keep)
    return state, out
