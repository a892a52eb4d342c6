import numpy as np
import jax.numpy as jnp

from stmask_tpu.ops import boxes as B
from stmask_tpu.ops.anchors import make_priors, all_priors
from stmask_tpu.ops.matcher import match
from stmask_tpu.ops.nms import cc_fast_nms, fast_nms, greedy_nms_mask, NEG_INF
from stmask_tpu.config import get_config


def _padded_gt(boxes, labels, ids, cap=8):
    g = len(labels)
    gb = np.zeros((cap, 4), np.float32)
    gl = np.zeros((cap,), np.int32)
    gi = np.zeros((cap,), np.int32)
    gv = np.zeros((cap,), bool)
    gb[:g] = boxes
    gl[:g] = labels
    gi[:g] = ids
    gv[:g] = True
    return map(jnp.asarray, (gb, gl, gi, gv))


def test_priors_shape_and_order():
    p = make_priors(2, 3, [(3, 3), (3, 5), (5, 3)], [24.0])
    assert p.shape == (2 * 3 * 3, 4)
    # first position center
    np.testing.assert_allclose(p[0, :2], [0.5 / 3, 0.5 / 2])
    # anchor 0 at position 0: (w, h) = (3/3, 3/2)
    np.testing.assert_allclose(p[0, 2:], [1.0, 1.5])
    # anchor 1: kernel (3, 5) -> w = 5/3, h = 3/2
    np.testing.assert_allclose(p[1, 2:], [5 / 3, 1.5])
    # second anchor group starts at position (j=0, i=1)
    np.testing.assert_allclose(p[3, :2], [1.5 / 3, 0.5 / 2])


def test_all_priors_count():
    cfg = get_config('STMask_plus_resnet50')
    p = all_priors(cfg)
    # 384x640 input: P3..P7 = 48x80,24x40,12x20,6x10,3x5 with 3 anchors
    expected = 3 * (48 * 80 + 24 * 40 + 12 * 20 + 6 * 10 + 3 * 5)
    assert p.shape == (expected, 4)
    assert cfg.num_priors == expected


def test_match_every_gt_gets_anchor():
    # matcher invariant (reference box_utils.py:166-184): every valid gt is
    # force-assigned at least one positive anchor.
    rng = np.random.RandomState(0)
    priors = make_priors(8, 8, [(3, 3)], [24.0])
    gt = np.asarray([[0.1, 0.1, 0.3, 0.3],
                     [0.6, 0.6, 0.9, 0.9]], np.float32)
    gb, gl, gi, gv = _padded_gt(gt, [3, 5], [1, 2])
    conf = jnp.asarray(rng.randn(priors.shape[0], 41).astype(np.float32))
    res = match(0.5, 0.4, gb, gl, gi, gv, jnp.asarray(priors), conf)
    conf_t = np.asarray(res.conf_t)
    idx_t = np.asarray(res.idx_t)
    pos = conf_t > 0
    assert pos.sum() >= 2
    matched_gts = set(idx_t[pos].tolist())
    assert {0, 1} <= matched_gts
    # labels of positives must be the matched gt's label
    for p_i in np.where(pos)[0]:
        assert conf_t[p_i] == [3, 5][idx_t[p_i]]
    # ids of positives
    ids_t = np.asarray(res.ids_t)
    for p_i in np.where(pos)[0]:
        assert ids_t[p_i] == [1, 2][idx_t[p_i]]


def test_match_padded_gt_never_matched():
    rng = np.random.RandomState(1)
    priors = make_priors(8, 8, [(3, 3)], [24.0])
    gt = np.asarray([[0.1, 0.1, 0.4, 0.4]], np.float32)
    gb, gl, gi, gv = _padded_gt(gt, [2], [7])
    conf = jnp.asarray(rng.randn(priors.shape[0], 41).astype(np.float32))
    res = match(0.5, 0.4, gb, gl, gi, gv, jnp.asarray(priors), conf)
    pos = np.asarray(res.conf_t) > 0
    assert np.all(np.asarray(res.idx_t)[pos] == 0)
    assert set(np.asarray(res.conf_t)[pos].tolist()) == {2}


def test_match_loc_targets_decode_back():
    rng = np.random.RandomState(2)
    priors = make_priors(16, 16, [(3, 3)], [24.0])
    gt = np.asarray([[0.2, 0.2, 0.5, 0.6]], np.float32)
    gb, gl, gi, gv = _padded_gt(gt, [1], [1])
    conf = jnp.asarray(rng.randn(priors.shape[0], 41).astype(np.float32))
    res = match(0.5, 0.4, gb, gl, gi, gv, jnp.asarray(priors), conf)
    pos = np.asarray(res.conf_t) > 0
    dec = np.asarray(B.decode(res.loc_t, jnp.asarray(priors)))
    np.testing.assert_allclose(dec[pos], np.tile(gt, (pos.sum(), 1)),
                               atol=1e-4)


def _np_cc_nms(boxes, scores, thr, top_k):
    order = np.argsort(-scores, kind='stable')[:top_k]
    keep = []
    for oi, i in enumerate(order):
        if scores[i] <= NEG_INF / 2:
            continue
        ok = True
        for j in order[:oi]:
            if scores[j] <= NEG_INF / 2:
                continue
            # suppressed by ANY higher-scoring box (fast-NMS semantics:
            # suppressors need not be kept themselves)
            a, b = boxes[i], boxes[j]
            ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
            iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
            inter = ix * iy
            ua = ((a[2] - a[0]) * (a[3] - a[1])
                  + (b[2] - b[0]) * (b[3] - b[1]) - inter)
            if inter / ua > thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def test_cc_fast_nms_matches_numpy():
    rng = np.random.RandomState(3)
    n = 40
    xy = rng.uniform(0, 0.7, (n, 2))
    wh = rng.uniform(0.1, 0.3, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    res = cc_fast_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      iou_threshold=0.5, top_k=n)
    got = set(np.asarray(res.idx)[np.asarray(res.valid)].tolist())
    want = set(_np_cc_nms(boxes, scores, 0.5, n))
    assert got == want


def test_fast_nms_shapes_and_threshold():
    rng = np.random.RandomState(4)
    n, c = 64, 5
    xy = rng.uniform(0, 0.7, (n, 2))
    wh = rng.uniform(0.1, 0.3, (n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 0.2, (c, n)).astype(np.float32))
    res = fast_nms(boxes, scores, conf_thresh=0.15, top_k=32, max_dets=10)
    assert res.idx.shape == (10,)
    v = np.asarray(res.valid)
    s = np.asarray(res.scores)
    assert np.all(s[v] > 0.15)
    # classes are 1-based
    assert np.all(np.asarray(res.classes)[v] >= 1)


def test_greedy_nms_exact():
    boxes = np.asarray([
        [0.0, 0.0, 0.4, 0.4],    # A (highest)
        [0.05, 0.05, 0.45, 0.45],  # B overlaps A -> suppressed
        [0.06, 0.06, 0.46, 0.46],  # C overlaps B heavily, A less
        [0.7, 0.7, 0.9, 0.9],    # D separate
    ], np.float32)
    # greedy: A kept, B suppressed by A; C: vs A iou < 0.5 -> kept
    valid = jnp.ones(4, bool)
    keep = np.asarray(greedy_nms_mask(jnp.asarray(boxes), valid, 0.5))
    iou_ac = np.asarray(B.jaccard(jnp.asarray(boxes[None, 0]),
                                  jnp.asarray(boxes[None, 2])))[0, 0]
    expected_c = iou_ac <= 0.5
    assert keep[0] and not keep[1] and keep[3]
    assert keep[2] == expected_c
