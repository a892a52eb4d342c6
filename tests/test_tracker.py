import numpy as np
import jax
import jax.numpy as jnp

from stmask_tpu.config import get_config
from stmask_tpu.inference.candidates import Detections
from stmask_tpu.inference.tracker import (init_state, track_step_simple,
                                          track_step_tf)

CFG = get_config('STMask_plus_resnet50').replace(track_capacity=8)

HP, WP = 16, 16
H4, W4, C4 = 8, 8, 16
D = 4
E = CFG.embed_dim


def _proto():
    # channel 0 constant 1 -> coeff [5, 0...] gives a solid (cropped) mask
    p = np.zeros((HP, WP, 32), np.float32)
    p[..., 0] = 1.0
    return jnp.asarray(p)


def _det(boxes, embeds_idx, scores, classes):
    n = len(boxes)
    box = np.zeros((D, 4), np.float32)
    score = np.zeros((D,), np.float32)
    cls = np.zeros((D,), np.int32)
    coeff = np.zeros((D, 32), np.float32)
    track = np.zeros((D, E), np.float32)
    center = np.zeros((D,), np.float32)
    valid = np.zeros((D,), bool)
    for i in range(n):
        box[i] = boxes[i]
        score[i] = scores[i]
        cls[i] = classes[i]
        coeff[i, 0] = 5.0
        track[i, embeds_idx[i]] = 1.0
        center[i] = 1.0
        valid[i] = True
    return Detections(*(jnp.asarray(a) for a in
                        (box, score, cls, coeff, track, center, valid)))


def _tnet(x):
    n = x.shape[0]
    return jnp.zeros((n, 4)), jnp.zeros((n, 32))


def _feat(seed=0):
    return jnp.asarray(np.random.RandomState(seed)
                       .randn(H4, W4, C4).astype(np.float32))


def test_tf_track_ids_consistent_across_frames():
    state = init_state(CFG, (H4, W4), (HP, WP), C4, E)
    f = _feat()

    # frame 1: two objects
    det1 = _det([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]],
                [0, 1], [0.9, 0.8], [3, 5])
    state, out1 = track_step_tf(CFG, _tnet, state, det1, _proto(), f, f,
                                jnp.asarray(True))
    keep1 = np.asarray(out1.keep)
    ids1 = np.asarray(out1.obj_id)[keep1]
    cls1 = np.asarray(out1.cls)[keep1]
    assert keep1.sum() == 2
    assert set(ids1.tolist()) == {0, 1}
    id_of_cls3 = ids1[cls1 == 3][0]
    id_of_cls5 = ids1[cls1 == 5][0]

    # frame 2: same objects, swapped det order, slightly moved
    det2 = _det([[0.62, 0.6, 0.92, 0.9], [0.12, 0.1, 0.42, 0.4]],
                [1, 0], [0.85, 0.88], [5, 3])
    state, out2 = track_step_tf(CFG, _tnet, state, det2, _proto(), f, f,
                                jnp.asarray(False))
    keep2 = np.asarray(out2.keep)
    ids2 = np.asarray(out2.obj_id)[keep2]
    cls2 = np.asarray(out2.cls)[keep2]
    assert keep2.sum() == 2
    assert ids2[cls2 == 3][0] == id_of_cls3
    assert ids2[cls2 == 5][0] == id_of_cls5

    # frame 3: no detections -> pure propagation with score decay
    det3 = _det([], [], [], [])
    state, out3 = track_step_tf(CFG, _tnet, state, det3, _proto(), f, f,
                                jnp.asarray(False))
    keep3 = np.asarray(out3.keep)
    assert keep3.sum() == 2
    s2 = np.sort(np.asarray(out2.score)[keep2])
    s3 = np.sort(np.asarray(out3.score)[keep3])
    np.testing.assert_allclose(s3, s2 * CFG.score_decay, atol=1e-5)
    age3 = np.asarray(state.age)[np.asarray(state.valid)]
    assert np.all(age3 == 1)


def test_tf_track_is_first_resets():
    state = init_state(CFG, (H4, W4), (HP, WP), C4, E)
    f = _feat()
    det1 = _det([[0.1, 0.1, 0.4, 0.4]], [0], [0.9], [2])
    state, _ = track_step_tf(CFG, _tnet, state, det1, _proto(), f, f,
                             jnp.asarray(True))
    # new video: id counter resets
    state, out = track_step_tf(CFG, _tnet, state, det1, _proto(), f, f,
                               jnp.asarray(True))
    ids = np.asarray(out.obj_id)[np.asarray(out.keep)]
    assert ids.tolist() == [0]
    assert int(state.next_id) == 1


def test_tf_track_conflict_resolution():
    # two detections matching the same track: higher det score wins the id
    state = init_state(CFG, (H4, W4), (HP, WP), C4, E)
    f = _feat()
    det1 = _det([[0.1, 0.1, 0.5, 0.5]], [0], [0.9], [2])
    state, _ = track_step_tf(CFG, _tnet, state, det1, _proto(), f, f,
                             jnp.asarray(True))
    # both dets have embedding 0 and overlap the track heavily
    det2 = _det([[0.1, 0.1, 0.5, 0.5], [0.12, 0.12, 0.52, 0.52]],
                [0, 0], [0.6, 0.7], [2, 2])
    state, out = track_step_tf(CFG, _tnet, state, det2, _proto(), f, f,
                               jnp.asarray(False))
    keep = np.asarray(out.keep)
    # dets are score-sorted in real NMS output; here det order is [0.6, 0.7]
    # -> the later, higher-scoring det displaces the first
    boxes = np.asarray(out.box)[keep]
    assert keep.sum() == 1
    np.testing.assert_allclose(boxes[0], [0.12, 0.12, 0.52, 0.52], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.score)[keep][0], 0.7, atol=1e-5)


def test_simple_track_outputs_detections():
    state = init_state(CFG, (H4, W4), (HP, WP), C4, E)
    det1 = _det([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]],
                [0, 1], [0.9, 0.8], [3, 5])
    state, out1 = track_step_simple(CFG, state, det1, _proto(),
                                    jnp.asarray(True))
    keep1 = np.asarray(out1.keep)
    assert keep1.sum() == 2
    assert set(np.asarray(out1.obj_id)[keep1].tolist()) == {0, 1}

    det2 = _det([[0.6, 0.6, 0.9, 0.9]], [1], [0.7], [5])
    state, out2 = track_step_simple(CFG, state, det2, _proto(),
                                    jnp.asarray(False))
    keep2 = np.asarray(out2.keep)
    assert keep2.sum() == 1
    assert np.asarray(out2.obj_id)[keep2][0] == 1


def test_tf_match_scores_use_binarized_det_masks():
    """Parity: match-score mask IoU uses BINARIZED det masks while the bank
    stores the soft mask (reference track_TF.py:83,111 vs :82).

    The frame-2 detection's soft mask has a small >0.5 core identical to
    track A's mask plus a large 0.45 sub-threshold halo covering track B's
    mask.  Binary-mask IoU (reference) matches A decisively; soft-mask IoU
    flips the match to B.
    """
    core = (slice(0, 2), slice(0, 4))      # 8 px
    halo = (slice(8, 16), slice(0, 16))    # 128 px
    proto = np.zeros((HP, WP, 32), np.float32)
    proto[..., 1] = -8.0
    proto[core[0], core[1], 1] = 8.0       # track A mask = core
    proto[..., 2] = -8.0
    proto[halo[0], halo[1], 2] = 8.0       # track B mask = halo
    proto[..., 3] = -8.0                   # det mask: core ~1, halo ~0.45
    proto[halo[0], halo[1], 3] = -0.2
    proto[core[0], core[1], 3] = 8.0
    proto = jnp.asarray(proto)

    def det_ch(chans, scores, classes):
        n = len(chans)
        box = np.zeros((D, 4), np.float32)
        score = np.zeros((D,), np.float32)
        cls = np.zeros((D,), np.int32)
        coeff = np.zeros((D, 32), np.float32)
        track = np.zeros((D, E), np.float32)
        center = np.zeros((D,), np.float32)
        valid = np.zeros((D,), bool)
        for i in range(n):
            box[i] = [0.0, 0.0, 1.0, 1.0]  # identical boxes: bbox IoU ties
            score[i] = scores[i]
            cls[i] = classes[i]
            coeff[i, chans[i]] = 8.0
            track[i, 0] = 1.0              # identical embeddings: cosine ties
            center[i] = 1.0
            valid[i] = True
        return Detections(*(jnp.asarray(a) for a in
                            (box, score, cls, coeff, track, center, valid)))

    state = init_state(CFG, (H4, W4), (HP, WP), C4, E)
    f = _feat()
    state, out1 = track_step_tf(CFG, _tnet, state, det_ch([1, 2], [0.9, 0.8],
                                                          [3, 5]),
                                proto, f, f, jnp.asarray(True))
    ids1 = np.asarray(out1.obj_id)[np.asarray(out1.keep)]
    cls1 = np.asarray(out1.cls)[np.asarray(out1.keep)]
    assert set(ids1.tolist()) == {0, 1}
    id_a = int(ids1[cls1 == 3][0])

    state, _ = track_step_tf(CFG, _tnet, state, det_ch([3], [0.9], [7]),
                             proto, f, f, jnp.asarray(False))
    sv = np.asarray(state.valid)
    scls = np.asarray(state.cls)
    matched = sv & (scls == 7)
    assert matched.sum() == 1, "det should refresh exactly one track"
    assert int(np.asarray(state.obj_id)[matched][0]) == id_a, (
        "binary-mask IoU must match track A (core); a match to track B "
        "means soft masks leaked into the comp-score mask IoU")
    # the bank must still store the SOFT det mask (track_TF.py:82): the
    # 0.45 halo is present in the stored mask
    stored = np.asarray(state.mask)[matched][0]
    assert np.all(np.abs(stored[8:, :] - 0.45) < 0.01)
