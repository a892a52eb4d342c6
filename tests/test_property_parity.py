"""Randomized property tests for the two closed-form parity claims
(VERDICT r4 #5, SURVEY §7.3 risks #2 and #3).

(a) ``resolve_assignment`` + slot bookkeeping vs a straight Python port of
    the reference's sequential greedy id-assignment loop
    (track_TF.py:132-156): >=1000 random frames including exact score
    ties, full banks, empty detections, and interleaved invalid dets.
(b) ``greedy_nms_mask`` with the Cython +1-pixel IoU vs a numpy greedy
    loop implementing utils/cython_nms.pyx:31,67-70 semantics.

Failures reproduce as seeds (the trial index is the seed).
"""

import numpy as np
import jax
import jax.numpy as jnp

from stmask_tpu.config import get_config
from stmask_tpu.inference import tracker as TRK
from stmask_tpu.ops.nms import _plus_one_iou, greedy_nms_mask

CFG = get_config('STMask_plus_resnet50').replace(track_capacity=12)
T = CFG.track_capacity
D = 8


# ------------------------- (a) greedy id assignment -------------------------

def reference_assign(match_ids, det_valid, det_scores, n_prev):
    """Python port of the reference loop (track_TF.py:132-156): iterate
    dets in index order; match_id==0 appends a new object; match_id>0
    claims slot (match_id-1) only on a STRICTLY greater det score,
    displacing the previous claimant (which gets nothing and does not
    re-allocate)."""
    det_out = {}                       # det idx -> ('slot', s) | ('new', r)
    best_score = [-1.0] * n_prev
    best_idx = [-1] * n_prev
    new_rank = 0
    for idx in range(len(match_ids)):
        if not det_valid[idx]:
            continue
        m = int(match_ids[idx])
        if m == 0:
            det_out[idx] = ('new', new_rank)
            new_rank += 1
        else:
            s = m - 1
            if det_scores[idx] > best_score[s]:
                if best_idx[s] != -1:
                    det_out[best_idx[s]] = None      # displaced
                det_out[idx] = ('slot', s)
                best_score[s] = float(det_scores[idx])
                best_idx[s] = idx
            else:
                det_out[idx] = None
    return det_out, best_idx, new_rank


def _mk_state(n_prev):
    state = TRK.init_state(CFG, (4, 4), (8, 8), feat_ch=8, embed_dim=8)
    valid = np.zeros(T, bool)
    valid[:n_prev] = True
    # alive (not recyclable): score above thresh, age 0
    return state._replace(valid=jnp.asarray(valid),
                          score=jnp.asarray(
                              np.where(valid, 0.9, 0.0).astype(np.float32)),
                          age=jnp.zeros(T, jnp.int32))


@jax.jit
def _resolve(match_ids, det_valid, det_scores, state):
    return TRK.resolve_assignment(CFG, match_ids, det_valid, det_scores,
                                  state)


def test_resolve_assignment_fuzz_vs_reference_loop():
    rng_master = np.random.RandomState(1234)
    n_ties = 0
    n_full = 0
    for trial in range(1200):
        rng = np.random.RandomState(trial)
        n_prev = rng.randint(0, T + 1)          # includes full banks
        det_valid = rng.rand(D) < (0.0 if trial % 97 == 0 else 0.8)
        match_ids = np.zeros(D, np.int64)
        if n_prev > 0:
            match_ids = rng.randint(0, n_prev + 1, D)
        else:
            match_ids = np.zeros(D, np.int64)
        # discrete scores force exact ties
        det_scores = rng.choice([0.1, 0.3, 0.5, 0.5, 0.7, 0.9], D)
        det_scores = det_scores.astype(np.float32)

        ref_out, ref_best, ref_new = reference_assign(
            match_ids, det_valid, det_scores, n_prev)
        state = _mk_state(n_prev)
        asn = _resolve(jnp.asarray(match_ids, jnp.int32),
                       jnp.asarray(det_valid),
                       jnp.asarray(det_scores), state)
        has_winner = np.asarray(asn.has_winner)
        winner_src = np.asarray(asn.winner_src)
        can_alloc = np.asarray(asn.can_alloc)
        det_slot = np.asarray(asn.det_slot)
        num_free = T - n_prev                    # state has no dead slots

        # per-slot winners identical to the sequential loop
        for s in range(n_prev):
            if ref_best[s] == -1:
                assert not has_winner[s], (trial, s)
            else:
                assert has_winner[s], (trial, s)
                assert winner_src[s] == ref_best[s], (trial, s)
        assert not has_winner[n_prev:].any(), trial

        # allocations: same dets in the same order, truncated at capacity
        # (the documented fixed-capacity deviation)
        for idx in range(D):
            out = ref_out.get(idx, 'absent')
            if out == 'absent':                  # invalid det
                assert not can_alloc[idx], (trial, idx)
                assert det_slot[idx] == -1, (trial, idx)
            elif out is None:                    # displaced / outscored
                assert not can_alloc[idx], (trial, idx)
                assert det_slot[idx] == -1, (trial, idx)
            elif out[0] == 'slot':
                assert det_slot[idx] == out[1], (trial, idx)
            else:                                # ('new', r)
                r = out[1]
                if r < num_free:
                    assert can_alloc[idx], (trial, idx)
                    assert np.asarray(asn.new_rank)[idx] == r, (trial, idx)
                    assert det_slot[idx] >= n_prev, (trial, idx)
                else:
                    assert not can_alloc[idx], (trial, idx)
        if len(set(det_scores[det_valid & (match_ids > 0)])) < \
                int((det_valid & (match_ids > 0)).sum()):
            n_ties += 1
        if n_prev == T:
            n_full += 1
    # the fuzz actually hit the interesting regimes
    assert n_ties > 100, n_ties
    assert n_full > 30, n_full


# ------------------------------ (b) greedy NMS ------------------------------

def np_plus_one_greedy(boxes, thresh):
    """Numpy port of utils/cython_nms.pyx: score-sorted greedy suppress
    with +1-pixel areas."""
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    suppressed = np.zeros(n, bool)
    for i in range(n):
        if suppressed[i]:
            continue
        ix1 = np.maximum(x1[i], x1[i + 1:])
        iy1 = np.maximum(y1[i], y1[i + 1:])
        ix2 = np.minimum(x2[i], x2[i + 1:])
        iy2 = np.minimum(y2[i], y2[i + 1:])
        w = np.maximum(0.0, ix2 - ix1 + 1)
        h = np.maximum(0.0, iy2 - iy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[i + 1:] - inter)
        suppressed[i + 1:] |= iou > thresh
    return ~suppressed


K = 24


@jax.jit
def _greedy(boxes, valid):
    return greedy_nms_mask(boxes, valid, 0.5, iou=_plus_one_iou(boxes))


def test_greedy_nms_fuzz_vs_numpy_loop():
    for trial in range(1200):
        rng = np.random.RandomState(trial)
        # integer pixel coords in a small range force duplicate boxes and
        # exact threshold ties
        x1 = rng.randint(0, 30, K).astype(np.float32)
        y1 = rng.randint(0, 20, K).astype(np.float32)
        w = rng.randint(1, 25, K).astype(np.float32)
        h = rng.randint(1, 18, K).astype(np.float32)
        boxes = np.stack([x1, y1, x1 + w, y1 + h], axis=1)
        valid = rng.rand(K) < 0.9

        keep_j = np.asarray(_greedy(jnp.asarray(boxes), jnp.asarray(valid)))

        # numpy loop over the valid subset only
        vidx = np.nonzero(valid)[0]
        keep_np_sub = np_plus_one_greedy(boxes[vidx], 0.5)
        keep_np = np.zeros(K, bool)
        keep_np[vidx] = keep_np_sub
        np.testing.assert_array_equal(keep_j, keep_np, err_msg=str(trial))
