import numpy as np
import jax.numpy as jnp
import pytest

from stmask_tpu.ops import boxes as B


def random_boxes(n, rng):
    xy1 = rng.uniform(0, 0.8, (n, 2))
    wh = rng.uniform(0.05, 0.2, (n, 2))
    return np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)


def test_point_center_roundtrip():
    rng = np.random.RandomState(0)
    b = random_boxes(16, rng)
    back = np.asarray(B.point_form(B.center_size(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, atol=1e-6)


def test_encode_decode_roundtrip():
    # encode(decode(x, p), p) = x (reference box_utils.py:203)
    rng = np.random.RandomState(1)
    priors = np.concatenate([rng.uniform(0.2, 0.8, (32, 2)),
                             rng.uniform(0.05, 0.3, (32, 2))],
                            axis=1).astype(np.float32)
    loc = rng.uniform(-1, 1, (32, 4)).astype(np.float32)
    dec = B.decode(jnp.asarray(loc), jnp.asarray(priors))
    enc = B.encode(dec, jnp.asarray(priors))
    np.testing.assert_allclose(np.asarray(enc), loc, atol=1e-3)


def test_jaccard_golden():
    a = jnp.asarray([[0.0, 0.0, 0.5, 0.5]])
    b = jnp.asarray([[0.0, 0.0, 0.5, 0.5],
                     [0.25, 0.25, 0.75, 0.75],
                     [0.5, 0.5, 1.0, 1.0]])
    iou = np.asarray(B.jaccard(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 0.0625 / 0.4375, 0.0], atol=1e-6)


def test_jaccard_batched_matches_loop():
    rng = np.random.RandomState(2)
    a = np.stack([random_boxes(5, rng) for _ in range(3)])
    b = np.stack([random_boxes(7, rng) for _ in range(3)])
    batched = np.asarray(B.jaccard(jnp.asarray(a), jnp.asarray(b)))
    for i in range(3):
        single = np.asarray(B.jaccard(jnp.asarray(a[i]), jnp.asarray(b[i])))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_crop_zeroes_outside_box():
    masks = jnp.ones((16, 16, 2))
    bxs = jnp.asarray([[0.25, 0.25, 0.75, 0.75],
                       [0.0, 0.0, 1.0, 1.0]])
    _, cropped = B.crop(masks, bxs, padding=0)
    c = np.asarray(cropped)
    # pixels well inside box kept, well outside zeroed
    assert c[8, 8, 0] == 1.0
    assert c[0, 0, 0] == 0.0
    assert c[1, 1, 1] == 1.0


def test_mask_iou():
    m1 = np.zeros((1, 8, 8), np.float32)
    m1[0, :4, :4] = 1
    m2 = np.zeros((2, 8, 8), np.float32)
    m2[0, :4, :4] = 1
    m2[1, 2:6, :4] = 1
    iou = np.asarray(B.mask_iou(jnp.asarray(m1), jnp.asarray(m2)))
    np.testing.assert_allclose(iou[0], [1.0, 8.0 / 24.0], atol=1e-6)


def test_elemwise_diou_bounds():
    rng = np.random.RandomState(3)
    a = jnp.asarray(random_boxes(10, rng))
    b = jnp.asarray(random_boxes(10, rng))
    d = np.asarray(B.elemwise_diou(a, b))
    assert np.all(d <= 1.0) and np.all(d >= -1.0)
    same = np.asarray(B.elemwise_diou(a, a))
    np.testing.assert_allclose(same, 1.0, atol=1e-6)


def test_sanitize_coordinates_orders_and_clamps():
    x1 = jnp.asarray([0.9, -0.1])
    x2 = jnp.asarray([0.1, 0.5])
    lo, hi = B.sanitize_coordinates(x1, x2, 100, padding=0)
    np.testing.assert_allclose(np.asarray(lo), [10.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hi), [90.0, 50.0], atol=1e-5)
