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


# ---- eval NMS-family wiring (mAP vs mAP* paths) ----

def _multiclass_fixture():
    """Two overlapping objects of different classes + one duplicate box.

    Under cc NMS the cross-class duplicate suppresses the weaker class;
    under per-class NMS both classes survive — so per_class must keep >= as
    many detections (the reference's mAP vs mAP* distinction)."""
    import numpy as np
    boxes = np.array([
        [0.10, 0.10, 0.40, 0.40],   # object A, class 1
        [0.12, 0.11, 0.41, 0.42],   # same region, class 2 (high overlap)
        [0.60, 0.55, 0.90, 0.92],   # object B, class 2
    ], np.float32)
    # per-class fg scores [C-1=3, P=3]
    scores = np.array([
        [0.90, 0.10, 0.05],
        [0.20, 0.85, 0.80],
        [0.02, 0.02, 0.03],
    ], np.float32)
    return boxes, scores


def test_per_class_keeps_cross_class_duplicates():
    import jax.numpy as jnp
    from stmask_tpu.ops.nms import cc_fast_nms, fast_nms, NEG_INF
    boxes, scores = _multiclass_fixture()
    bj = jnp.asarray(boxes)
    # cc: one score per prior (max over classes)
    cc_scores = jnp.asarray(scores.max(0))
    cc = cc_fast_nms(bj, cc_scores, 0.5, top_k=3)
    n_cc = int(np.sum(np.asarray(cc.valid)))
    pc = fast_nms(bj, jnp.asarray(scores), 0.5, top_k=3, conf_thresh=0.05,
                  max_dets=8)
    n_pc = int(np.sum(np.asarray(pc.valid)))
    assert n_cc == 2          # duplicate suppressed cross-class
    assert n_pc == 3          # kept per class
    assert n_pc >= n_cc
    kept_classes = sorted(np.asarray(pc.classes)[np.asarray(pc.valid)])
    assert kept_classes == [1, 2, 2]


def test_greedy_per_class_matches_fast_on_separated_boxes():
    import jax.numpy as jnp
    from stmask_tpu.ops.nms import fast_nms, greedy_nms_per_class
    boxes, scores = _multiclass_fixture()
    f = fast_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, top_k=3,
                 conf_thresh=0.05, max_dets=8)
    g = greedy_nms_per_class(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                             conf_thresh=0.05, top_k=3, max_dets=8,
                             scale=640.0)
    fv, gv = np.asarray(f.valid), np.asarray(g.valid)
    assert int(fv.sum()) == int(gv.sum())
    np.testing.assert_array_equal(np.asarray(f.idx)[fv],
                                  np.asarray(g.idx)[gv])
    np.testing.assert_array_equal(np.asarray(f.classes)[fv],
                                  np.asarray(g.classes)[gv])


def test_greedy_per_class_sequential_semantics():
    """Chain A-B-C where B overlaps both: greedy keeps C (B was suppressed
    by A, so C survives); fast-NMS suppresses C too (B still kills it)."""
    import jax.numpy as jnp
    from stmask_tpu.ops.nms import fast_nms, greedy_nms_per_class
    # iou(A,B) = iou(B,C) = 0.25/0.75 = 1/3 > 0.3; iou(A,C) ~ 0
    boxes = np.array([
        [0.0, 0.0, 0.50, 1.0],
        [0.25, 0.0, 0.75, 1.0],
        [0.50, 0.0, 1.00, 1.0],
    ], np.float32)
    scores = np.array([[0.9, 0.8, 0.7]], np.float32)
    f = fast_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3, top_k=3,
                 conf_thresh=0.05, max_dets=4)
    g = greedy_nms_per_class(jnp.asarray(boxes), jnp.asarray(scores), 0.3,
                             conf_thresh=0.05, top_k=3, max_dets=4,
                             scale=640.0)
    assert int(np.asarray(f.valid).sum()) == 1   # fast: B kills C too
    assert int(np.asarray(g.valid).sum()) == 2   # greedy: A keeps, B out,
    kept = sorted(np.asarray(g.idx)[np.asarray(g.valid)])
    assert kept == [0, 2]                        # ...C back in


def test_detect_frame_nms_method_dispatch():
    """detect_frame honors cfg.eval_nms_method and the per-class path
    yields >= as many valid detections on a multi-class fixture."""
    import jax.numpy as jnp
    from stmask_tpu.config import get_config
    from stmask_tpu.inference.candidates import detect_frame
    from stmask_tpu.ops.boxes import encode

    cfg = get_config('STMask_resnet50').replace(img_w=128, img_h=96)
    boxes, scores = _multiclass_fixture()
    p = 40
    priors = np.tile(np.array([[0.5, 0.5, 0.5, 0.5]], np.float32), (p, 1))
    conf = np.zeros((p, cfg.num_classes), np.float32)
    conf[:, 0] = 1.0
    loc = np.zeros((p, 4), np.float32)
    for i in range(3):
        loc[i] = np.asarray(encode(jnp.asarray(boxes[i:i + 1]),
                                   jnp.asarray(priors[i:i + 1])))[0]
        conf[i, 0] = 0.0
        conf[i, 1:4] = scores[:, i]
    preds = {
        'loc': jnp.asarray(loc), 'conf': jnp.asarray(conf),
        'mask_coeff': jnp.zeros((p, 32)),
        'track': jnp.ones((p, cfg.embed_dim)) / np.sqrt(cfg.embed_dim),
        'centerness': jnp.ones((p, 1)),
    }
    det_cc = detect_frame(cfg, preds, jnp.asarray(priors))
    det_pc = detect_frame(cfg.replace(eval_nms_method='per_class'), preds,
                          jnp.asarray(priors))
    det_gr = detect_frame(cfg.replace(eval_nms_method='greedy'), preds,
                          jnp.asarray(priors))
    n_cc = int(np.asarray(det_cc.valid).sum())
    n_pc = int(np.asarray(det_pc.valid).sum())
    n_gr = int(np.asarray(det_gr.valid).sum())
    assert n_cc == 2 and n_pc == 3 and n_gr == 3
    assert n_pc >= n_cc


def test_cc_nms_as_miou_blending():
    """Identical boxes but disjoint masks: plain cc suppresses the second,
    miou-blended NMS keeps it (blended overlap 0.5*(1+0) = 0.5 <= thresh)."""
    import jax.numpy as jnp
    from stmask_tpu.ops.nms import cc_fast_nms
    boxes = jnp.asarray(np.array([[0.1, 0.1, 0.9, 0.9],
                                  [0.1, 0.1, 0.9, 0.9]], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.8], np.float32))
    masks = np.zeros((2, 8, 8), np.float32)
    masks[0, :, :4] = 1.0
    masks[1, :, 4:] = 1.0
    plain = cc_fast_nms(boxes, scores, 0.5, top_k=2)
    blended = cc_fast_nms(boxes, scores, 0.5, top_k=2,
                          mask_fn=lambda idx: jnp.asarray(masks)[idx])
    assert int(np.asarray(plain.valid).sum()) == 1
    assert int(np.asarray(blended.valid).sum()) == 2


def test_per_class_weights_centerness_for_tf():
    """Detect_TF.fast_nms (the mAP* path for TF models) weights per-class
    scores by centerness BEFORE sort/suppression (detection_TF.py:140-143):
    a high-raw-score low-centerness box must LOSE to an overlapping
    high-centerness one.  Non-TF models use detection.py fast_nms on raw
    scores, where the raw winner suppresses instead."""
    import jax.numpy as jnp
    from stmask_tpu.config import get_config
    from stmask_tpu.inference.candidates import detect_frame
    from stmask_tpu.ops.boxes import encode

    cfg = get_config('STMask_plus_resnet50').replace(
        img_w=128, img_h=96, eval_nms_method='per_class')
    assert cfg.temporal_fusion_module and cfg.train_centerness
    p = 40
    priors = np.tile(np.array([[0.5, 0.5, 0.5, 0.5]], np.float32), (p, 1))
    boxes = np.array([
        [0.10, 0.10, 0.40, 0.40],   # A: raw 0.9, centerness 0.1 -> 0.09
        [0.11, 0.10, 0.41, 0.41],   # B: raw 0.6, centerness 0.9 -> 0.54
    ], np.float32)
    conf = np.zeros((p, cfg.num_classes), np.float32)
    conf[:, 0] = 1.0
    cent = np.ones((p, 1), np.float32)
    loc = np.zeros((p, 4), np.float32)
    for i, (raw, c) in enumerate(((0.9, 0.1), (0.6, 0.9))):
        import jax.numpy as _j
        loc[i] = np.asarray(encode(_j.asarray(boxes[i:i + 1]),
                                   _j.asarray(priors[i:i + 1])))[0]
        conf[i, 0] = 1.0 - raw
        conf[i, 1] = raw
        cent[i, 0] = c
    preds = {
        'loc': jnp.asarray(loc), 'conf': jnp.asarray(conf),
        'mask_coeff': jnp.zeros((p, 32)),
        'track': jnp.ones((p, cfg.embed_dim)) / np.sqrt(cfg.embed_dim),
        'centerness': jnp.asarray(cent),
    }
    det = detect_frame(cfg, preds, jnp.asarray(priors))
    v = np.asarray(det.valid)
    assert int(v.sum()) == 1
    k = int(np.nonzero(v)[0][0])
    # the weighted winner is B (0.54); its reported score is the weighted one
    np.testing.assert_allclose(np.asarray(det.box)[k], boxes[1], atol=1e-5)
    np.testing.assert_allclose(float(np.asarray(det.score)[k]), 0.54,
                               atol=1e-5)

    # non-TF semantics: raw winner A suppresses B
    det_raw = detect_frame(cfg.replace(temporal_fusion_module=False),
                           preds, jnp.asarray(priors))
    v2 = np.asarray(det_raw.valid)
    assert int(v2.sum()) == 1
    k2 = int(np.nonzero(v2)[0][0])
    np.testing.assert_allclose(np.asarray(det_raw.box)[k2], boxes[0],
                               atol=1e-5)
    np.testing.assert_allclose(float(np.asarray(det_raw.score)[k2]), 0.9,
                               atol=1e-5)
