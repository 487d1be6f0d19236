"""Two-phase Pallas tile labeling vs scipy (interpreter mode on CPU)."""

import numpy as np
import pytest
from scipy import ndimage

from lecturemath_tpu.ops.cc_label import compact_labels
from lecturemath_tpu.ops.cc_label_pallas import label_components_tiled


def check_matches_scipy(binary, tile):
    labels = label_components_tiled(binary, tile=tile, interpret=True)
    ours, n_ours = compact_labels(labels)
    ref, n_ref = ndimage.label(binary)
    assert n_ours == n_ref
    np.testing.assert_array_equal(ours, ref)


def test_random_blobs_cross_tile():
    rng = np.random.default_rng(0)
    img = (rng.random((96, 128)) < 0.25).astype(np.uint8)
    img = ndimage.binary_dilation(img).astype(np.uint8)
    check_matches_scipy(img, tile=(32, 32))


def test_snake_across_many_tiles():
    img = np.zeros((64, 64), dtype=np.uint8)
    for row in range(0, 64, 8):
        img[row, :] = 1
        if (row // 8) % 2 == 0:
            img[row:row + 9, -1] = 1
        else:
            img[row:row + 9, 0] = 1
    check_matches_scipy(img, tile=(16, 16))


def test_uneven_tiling():
    rng = np.random.default_rng(1)
    img = (rng.random((50, 70)) < 0.3).astype(np.uint8)
    check_matches_scipy(img, tile=(32, 32))  # 50, 70 not tile multiples


def test_single_tile_case():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[2:8, 2:8] = 1
    img[12:18, 12:18] = 1
    check_matches_scipy(img, tile=(64, 64))


def test_empty():
    img = np.zeros((32, 32), dtype=np.uint8)
    labels = label_components_tiled(img, tile=(16, 16), interpret=True)
    assert labels.max() == 0
