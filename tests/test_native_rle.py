"""Native C++ RLE codec parity with the pure-NumPy reference path."""

import subprocess
import sys

import numpy as np
import pytest

from stmask_tpu.utils import rle


@pytest.fixture(scope='module')
def native():
    if rle._NATIVE is None:
        pytest.skip('native library not built')
    return rle._NATIVE


def test_native_loaded(native):
    assert native is not None


def test_native_matches_python(native):
    rng = np.random.RandomState(0)
    for shape in [(360, 640), (37, 53), (1, 1), (8, 8)]:
        m = (rng.rand(*shape) > 0.6).astype(np.uint8)
        enc_native = rle.encode(m)
        enc_py = {'size': list(shape),
                  'counts': rle.counts_to_string(rle.mask_to_counts(m))}
        assert enc_native['counts'] == enc_py['counts']
        np.testing.assert_array_equal(rle.decode(enc_native), m)


def test_native_structured_roundtrip(native):
    m = np.zeros((360, 640), np.uint8)
    m[50:200, 100:400] = 1
    m[250:300, 500:600] = 1
    enc = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(enc), m)
