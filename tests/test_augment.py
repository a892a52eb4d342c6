import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from stmask_tpu.data.augment import (Expand, ExtraAugmentation,
                                     PhotoMetricDistortion, RandomCrop)


def _sample(rng):
    img = rng.randint(0, 255, (60, 80, 3)).astype(np.float32)
    boxes = np.asarray([[10, 10, 40, 40], [50, 20, 75, 55]], np.float32)
    labels = np.asarray([1, 2], np.int32)
    masks = np.zeros((2, 60, 80), np.uint8)
    masks[0, 10:40, 10:40] = 1
    masks[1, 20:55, 50:75] = 1
    ids = np.asarray([1, 2], np.int32)
    return img, boxes, labels, masks, ids


def test_photometric_preserves_geometry():
    rng = np.random.RandomState(0)
    img, boxes, labels, masks, ids = _sample(rng)
    out = PhotoMetricDistortion()(img, boxes, labels, masks, ids, rng=rng)
    img2, boxes2, labels2, masks2, ids2 = out
    assert img2.shape == img.shape
    np.testing.assert_array_equal(boxes2, boxes)
    np.testing.assert_array_equal(masks2, masks)


def test_expand_keeps_boxes_on_objects():
    rng = np.random.RandomState(3)  # seed where expand triggers
    for _ in range(10):
        img, boxes, labels, masks, ids = _sample(rng)
        img2, boxes2, labels2, masks2, ids2 = Expand()(
            img, boxes, labels, masks, ids, rng=rng)
        assert img2.shape == img.shape
        # boxes stay within the image
        assert np.all(boxes2[:, 0] >= 0) and np.all(boxes2[:, 2] <= 80)
        # mask stays roughly inside its box
        for m, b in zip(masks2, boxes2):
            ys, xs = np.nonzero(m)
            if xs.size:
                assert xs.min() >= b[0] - 3 and xs.max() <= b[2] + 3


def _assert_boxes_match_masks(boxes, masks, tol=3):
    """Each box must still bound its (cropped) mask — catches box/mask
    coordinate-frame mismatches."""
    for m, b in zip(masks, boxes):
        ys, xs = np.nonzero(m)
        if xs.size:
            assert xs.min() >= b[0] - tol and xs.max() <= b[2] + tol
            assert ys.min() >= b[1] - tol and ys.max() <= b[3] + tol


def test_random_crop_keeps_valid_annotations():
    rng = np.random.RandomState(1)
    for _ in range(10):
        img, boxes, labels, masks, ids = _sample(rng)
        img2, boxes2, labels2, masks2, ids2 = RandomCrop()(
            img, boxes, labels, masks, ids, rng=rng)
        assert len(boxes2) == len(labels2) == len(masks2) == len(ids2)
        assert len(boxes2) >= 1
        assert np.all(boxes2[:, 2] > boxes2[:, 0])
        assert np.all(boxes2[:, 3] > boxes2[:, 1])
        # image and masks crop together with the boxes
        assert img2.shape[:2] == masks2.shape[1:]
        assert np.all(boxes2[:, 2] <= img2.shape[1])
        assert np.all(boxes2[:, 3] <= img2.shape[0])
        _assert_boxes_match_masks(boxes2, masks2)


def test_extra_augmentation_chain():
    rng = np.random.RandomState(2)
    img, boxes, labels, masks, ids = _sample(rng)
    aug = ExtraAugmentation(
        photo_metric_distortion={},
        expand={'ratio_range': (1, 2)},
        random_crop={'min_ious': (0.3, 0.5), 'min_crop_size': 0.5})
    out = aug(img, boxes, labels, masks, ids, rng=rng)
    assert len(out) == 5
    assert out[0].shape[:2] == out[3].shape[1:]
    _assert_boxes_match_masks(out[1], out[3])


def test_random_sample_crop_ssd():
    from stmask_tpu.data.augment import RandomSampleCrop
    rng = np.random.RandomState(4)
    for _ in range(20):
        img, boxes, labels, masks, ids = _sample(rng)
        img2, boxes2, labels2, masks2, ids2 = RandomSampleCrop()(
            img, boxes, labels, masks, ids, rng=rng)
        assert len(boxes2) >= 1
        assert img2.shape[:2] == masks2.shape[1:]
        assert np.all(boxes2[:, :2] >= 0)
        assert np.all(boxes2[:, 2] <= img2.shape[1])
        assert np.all(boxes2[:, 3] <= img2.shape[0])
        _assert_boxes_match_masks(boxes2, masks2)


def test_random_mirror_and_flip():
    from stmask_tpu.data.augment import RandomFlip, RandomMirror
    img, boxes, labels, masks, ids = _sample(np.random.RandomState(0))

    class AlwaysFlip:
        def randint(self, n):
            return 1
    out = RandomMirror()(img, boxes, labels, masks, ids, rng=AlwaysFlip())
    np.testing.assert_array_equal(out[0], img[:, ::-1])
    _assert_boxes_match_masks(out[1], out[3], tol=1)
    out = RandomFlip()(img, boxes, labels, masks, ids, rng=AlwaysFlip())
    np.testing.assert_array_equal(out[0], img[::-1])
    _assert_boxes_match_masks(out[1], out[3], tol=1)


def test_ssd_augmentation_chain():
    from stmask_tpu.data.augment import SSDAugmentation
    rng = np.random.RandomState(5)
    for _ in range(10):
        img, boxes, labels, masks, ids = _sample(rng)
        out = SSDAugmentation()(img, boxes, labels, masks, ids, rng=rng)
        img2, boxes2, labels2, masks2, ids2 = out
        assert len(boxes2) >= 1
        assert img2.shape[:2] == masks2.shape[1:]
        _assert_boxes_match_masks(boxes2, masks2)
