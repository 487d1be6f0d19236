"""Parity of CLAHE / combine / motion-stats / classical binarizers vs the
reference implementations (compiled C kernel + reference Python)."""

import ctypes

import numpy as np
import pytest

from lecturemath_tpu.ops.clahe import (clahe, clahe_batch, clahe_host,
                                       combine_board_content)
from lecturemath_tpu.ops.frame_diff import motion_stats
from lecturemath_tpu.ops import classical

from oracle import ensure_oracle, ORACLE_DIR


@pytest.fixture(scope="module")
def c_lib():
    ensure_oracle()
    return ctypes.CDLL(f"{ORACLE_DIR}/accessmath_lib.so")


def c_adapthisteq(lib, gray, slope, grid_x, grid_y):
    h, w = gray.shape
    result = np.zeros_like(gray)
    lib.adapthisteq.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.adapthisteq(gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    w, h, slope, grid_x, grid_y,
                    result.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return result


@pytest.mark.parametrize("shape,grid", [((64, 64), (8, 8)), ((37, 53), (5, 7))])
def test_clahe_host_exact_vs_c(c_lib, shape, grid):
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, shape, dtype=np.uint8)
    grid_x, grid_y = grid
    ours = clahe_host(gray, 0.04, grid_x, grid_y)
    ref = c_adapthisteq(c_lib, gray, 0.04, grid_x, grid_y)
    np.testing.assert_array_equal(ours, ref)


def test_clahe_device_vs_c(c_lib):
    # float32 CDF accumulation may differ by one gray level on a few pixels
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    ours = np.asarray(clahe(gray, 0.04, 8, 8))
    ref = c_adapthisteq(c_lib, gray, 0.04, 8, 8)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_clahe_no_slope(c_lib):
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    ours = clahe_host(gray, 0.0, 4, 4)
    ref = c_adapthisteq(c_lib, gray, 0.0, 4, 4)
    np.testing.assert_array_equal(ours, ref)


def test_clahe_batch():
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 256, (3, 32, 32), dtype=np.uint8)
    out = np.asarray(clahe_batch(batch, 0.04, 4, 4))
    for k in range(3):
        np.testing.assert_array_equal(out[k], np.asarray(clahe(batch[k], 0.04, 4, 4)))


def test_combine_matches_c(c_lib):
    rng = np.random.default_rng(3)
    board = (rng.random((40, 50)) > 0.5).astype(np.uint8) * 255
    equalized = rng.integers(0, 256, (40, 50), dtype=np.uint8)

    ours = np.asarray(combine_board_content(board, equalized, 128))

    ref = np.zeros_like(equalized)
    c_lib.combine_results.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint8,
        ctypes.POINTER(ctypes.c_uint8)]
    c_lib.combine_results(board.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          equalized.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          50, 40, 128,
                          ref.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    np.testing.assert_array_equal(ours, ref)


def test_motion_stats_matches_c(c_lib):
    rng = np.random.default_rng(4)
    frame = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    last = frame.copy()
    last[10:20, 15:30] = rng.integers(0, 256, (10, 15, 3), dtype=np.uint8)

    stats = motion_stats(frame, last, threshold=15, jump_cells=1)

    boundaries = np.zeros(4)
    avg = np.zeros(2)
    dev = np.zeros(2)
    c_lib.speaker_detection_handle_frame.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    c_lib.speaker_detection_handle_frame.restype = ctypes.c_int32
    total = c_lib.speaker_detection_handle_frame(
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        last.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        60, 40, 3, 15, 1,
        boundaries.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        avg.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dev.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    assert int(stats.total_changes) == total
    np.testing.assert_allclose(np.asarray(stats.bbox), boundaries)
    np.testing.assert_allclose(np.asarray(stats.centroid), avg, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats.deviation), dev, rtol=1e-4)


def test_background_subtraction_vs_reference():
    ensure_oracle()
    from AccessMath.preprocessing.content.binarizer import Binarizer

    rng = np.random.default_rng(5)
    image = np.full((60, 80), 220, dtype=np.uint8)
    image[20:30, 20:60] = 40  # dark stroke
    image = np.clip(image.astype(int) + rng.normal(0, 3, image.shape), 0,
                    255).astype(np.uint8)

    ours = classical.background_subtraction_binarize(image)
    theirs = Binarizer.backgroundSubtractionBinarization(image)
    np.testing.assert_array_equal(ours, theirs)
    assert ours[25, 40] == 255  # stroke detected as ink


def test_subtraction_k_vs_reference():
    ensure_oracle()
    from AccessMath.preprocessing.content.binarizer import Binarizer

    rng = np.random.default_rng(6)
    image = np.full((80, 80), 200, dtype=np.uint8)
    image[30:40, 10:70] = 60
    image = np.clip(image.astype(int) + rng.normal(0, 2, image.shape), 0,
                    255).astype(np.uint8)

    ours = classical.subtraction_k_binarize(image)
    theirs = Binarizer.bgSubtractionKBinarization(image)
    np.testing.assert_array_equal(ours, theirs)


def test_filter_small_ccs():
    binary = np.zeros((30, 30), dtype=np.uint8)
    binary[2:12, 2:12] = 255    # 100 px
    binary[20, 20:23] = 255     # 3 px -> removed at min 5
    out = classical.filter_small_ccs(binary, 5)
    assert out[5, 5] == 255
    assert out[20, 21] == 0


@pytest.mark.parametrize("seed", range(5))
def test_classical_methods_fuzz_vs_reference(seed):
    """All four classical binarization methods on randomized
    whiteboard/chalkboard-style images — bit-exact vs the reference
    Binarizer (fixed-input tests cover one image each; this sweeps
    backgrounds, stroke contrasts, and noise levels)."""
    ensure_oracle()
    from AccessMath.preprocessing.content.binarizer import Binarizer

    rng = np.random.default_rng(100 + seed)
    height, width = int(rng.integers(40, 120)), int(rng.integers(60, 160))
    background = int(rng.integers(150, 240))
    image = np.full((height, width), background, dtype=np.uint8)
    for _ in range(int(rng.integers(1, 6))):   # random strokes
        y = int(rng.integers(0, height - 8))
        x = int(rng.integers(0, width - 12))
        image[y:y + int(rng.integers(3, 9)),
              x:x + int(rng.integers(5, 13))] = int(rng.integers(10, 90))
    image = np.clip(image.astype(int)
                    + rng.normal(0, rng.uniform(1, 4), image.shape),
                    0, 255).astype(np.uint8)
    rgb = np.stack([image] * 3, axis=-1)

    np.testing.assert_array_equal(
        classical.background_subtraction_binarize(image),
        Binarizer.backgroundSubtractionBinarization(image))
    np.testing.assert_array_equal(
        classical.subtraction_k_binarize(image),
        Binarizer.bgSubtractionKBinarization(image))
    dark = 255 - image                          # chalkboard polarity
    np.testing.assert_array_equal(
        classical.subtraction_k_binarize(dark, dark_background=True),
        Binarizer.bgSubtractionKBinarization(dark, dark_background=True))
    ours_chalk = classical.chalkboard_binarize(dark)
    theirs_chalk = Binarizer.chalkboardBinarization(dark)
    np.testing.assert_array_equal(ours_chalk, theirs_chalk)
    ours_edge = classical.edge_based_region_binarize(rgb)
    theirs_edge = Binarizer.edgeBasedRegionBinarization(rgb)
    np.testing.assert_array_equal(ours_edge, theirs_edge)


@pytest.mark.parametrize("seed", range(6))
def test_clahe_host_fuzz_vs_c(c_lib, seed):
    """Random shapes, grids, slopes, and intensity distributions — the
    host CLAHE stays bit-exact vs the reference's compiled C, including
    non-divisible tile geometry and saturated/narrow histograms."""
    rng = np.random.default_rng(200 + seed)
    h, w = int(rng.integers(20, 150)), int(rng.integers(20, 150))
    grid_x = int(rng.integers(2, 11))
    grid_y = int(rng.integers(2, 11))
    slope = float(rng.choice([0.0, 0.01, 0.04, 0.1, 0.5]))
    flavor = seed % 3
    if flavor == 0:      # uniform noise
        gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    elif flavor == 1:    # narrow whiteboard-like band + strokes
        gray = np.clip(rng.normal(215, 8, (h, w)), 0, 255).astype(np.uint8)
        gray[h // 3:h // 2, w // 4:w // 2] = 35
    else:                # saturated extremes
        gray = np.where(rng.random((h, w)) < 0.5, 0, 255).astype(np.uint8)
    ours = clahe_host(gray, slope, grid_x, grid_y)
    ref = c_adapthisteq(c_lib, gray, slope, grid_x, grid_y)
    np.testing.assert_array_equal(ours, ref)
