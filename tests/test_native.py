"""Native C++ kernel parity vs the scipy/numpy reference paths."""

import numpy as np
import pytest
from scipy import ndimage

from lecturemath_tpu import native
from lecturemath_tpu.data.cc import CC, extract_ccs, render_ccs
from lecturemath_tpu.ops.overlap import candidate_pairs, pairwise_overlap

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def blobs(seed, h=80, w=100, density=0.25):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w)) < density).astype(np.uint8)
    return ndimage.binary_dilation(img).astype(np.uint8) * 255


def test_label_and_stats_matches_scipy():
    for seed in range(3):
        binary = blobs(seed)
        labels, stats, _ = native.label_and_stats(binary)
        ref_labels, n_ref = ndimage.label(binary)
        assert len(stats) == n_ref
        np.testing.assert_array_equal(labels, ref_labels)

        slices = ndimage.find_objects(ref_labels, n_ref)
        counts = np.bincount(ref_labels.ravel(), minlength=n_ref + 1)
        for cc_id, (sy, sx) in enumerate(slices):
            np.testing.assert_array_equal(
                stats[cc_id],
                [sx.start, sx.stop - 1, sy.start, sy.stop - 1,
                 counts[cc_id + 1]])


def test_label_with_ages():
    binary = np.zeros((20, 20), dtype=np.uint8)
    binary[2:8, 2:8] = 255
    binary[12:18, 12:18] = 255
    ages = np.zeros((20, 20), dtype=np.float32)
    ages[2:8, 2:8] = 5.0
    ages[4, 4] = 2.0
    ages[12:18, 12:18] = 9.0
    _, stats, min_ages = native.label_and_stats(binary, ages)
    assert len(stats) == 2
    assert min_ages[0] == 2.0
    assert min_ages[1] == 9.0


def test_extract_ccs_native_matches_scipy_path():
    binary = blobs(7)
    ages = np.random.default_rng(1).random(binary.shape).astype(np.float32)
    fast = extract_ccs(binary, ages, use_native=True)
    slow = extract_ccs(binary, ages, use_native=False)
    assert len(fast) == len(slow)
    for a, b in zip(fast, slow):
        assert (a.min_x, a.max_x, a.min_y, a.max_y, a.size) == \
            (b.min_x, b.max_x, b.min_y, b.max_y, b.size)
        assert a.start_time == pytest.approx(b.start_time)
        np.testing.assert_array_equal(a.img, b.img)


def test_batch_overlap_matches_python():
    ccs_a = extract_ccs(blobs(10), filter_small=False)
    ccs_b = extract_ccs(blobs(11), filter_small=False)
    pairs = candidate_pairs(ccs_a, ccs_b)
    fast = pairwise_overlap(ccs_a, ccs_b, pairs, use_native=True)
    slow = pairwise_overlap(ccs_a, ccs_b, pairs, use_native=False)
    np.testing.assert_array_equal(fast, slow)


def test_render_masks():
    binary = blobs(12)
    ccs = extract_ccs(binary, filter_small=False)
    packed = native.PackedMasks(ccs)
    fast = native.render_masks(packed, *binary.shape)
    slow = render_ccs(ccs, *binary.shape)
    np.testing.assert_array_equal(fast, slow)
