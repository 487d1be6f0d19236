import numpy as np

from lecturemath_tpu.data.cc import (CC, extract_ccs, merge_ccs, bbox_array,
                                     bbox_intersections, render_ccs)
from lecturemath_tpu.ops.overlap import (candidate_pairs, pairwise_overlap,
                                         pairwise_recall_precision,
                                         self_candidate_pairs)


def make_frame():
    frame = np.zeros((64, 64), dtype=np.uint8)
    frame[5:15, 5:15] = 255      # 100 px block
    frame[30:40, 30:33] = 255    # 30 px bar
    frame[50:52, 50:60] = 255    # 20 px strip
    frame[0, 0] = 255            # 1 px noise (filtered)
    return frame


def test_extract_ccs_features():
    ccs = extract_ccs(make_frame())
    assert len(ccs) == 3  # noise pixel filtered at 20px threshold
    sizes = sorted(cc.size for cc in ccs)
    assert sizes == [20, 30, 100]

    big = max(ccs, key=lambda c: c.size)
    assert (big.min_x, big.max_x, big.min_y, big.max_y) == (5, 14, 5, 14)
    assert big.img.shape == (10, 10)
    assert big.img.dtype == np.uint8
    assert big.img.max() == 255


def test_extract_unfiltered():
    ccs = extract_ccs(make_frame(), filter_small=False)
    assert len(ccs) == 4


def test_overlap_recall_precision():
    a = CC(0, 0, 9, 0, 9, 100, np.full((10, 10), 255, np.uint8))
    b = CC(1, 5, 14, 0, 9, 100, np.full((10, 10), 255, np.uint8))
    recall, precision = a.overlap_recall_precision(b)
    assert recall == 0.5 and precision == 0.5

    c = CC(2, 20, 29, 20, 29, 100, np.full((10, 10), 255, np.uint8))
    assert a.overlap_recall_precision(c) == (0.0, 0.0)
    assert a.overlap_area(b) == 50
    assert a.overlap_iou(b) == 50 / 150


def test_merge():
    a = CC(0, 0, 4, 0, 4, 25, np.full((5, 5), 255, np.uint8))
    b = CC(1, 3, 7, 3, 7, 25, np.full((5, 5), 255, np.uint8))
    merged = merge_ccs([a, b])
    assert (merged.min_x, merged.max_x) == (0, 7)
    assert merged.size == 25 + 25 - 4  # 2x2 overlap counted once


def test_bbox_candidates_match_bruteforce():
    rng = np.random.default_rng(0)
    frame_a = (rng.random((64, 64)) < 0.2).astype(np.uint8) * 255
    frame_b = (rng.random((64, 64)) < 0.2).astype(np.uint8) * 255
    ccs_a = extract_ccs(frame_a, filter_small=False)
    ccs_b = extract_ccs(frame_b, filter_small=False)

    pairs = candidate_pairs(ccs_a, ccs_b)
    expected = {(i, j) for i, a in enumerate(ccs_a) for j, b in enumerate(ccs_b)
                if a.bbox_intersects(b)}
    assert {tuple(p) for p in pairs} == expected

    matches = pairwise_overlap(ccs_a, ccs_b, pairs)
    for (i, j), match in zip(pairs, matches):
        assert match == ccs_a[i].matched_pixels(ccs_b[j])

    recalls, precisions = pairwise_recall_precision(ccs_a, ccs_b, pairs)
    for k, (i, j) in enumerate(pairs):
        r, p = ccs_a[i].overlap_recall_precision(ccs_b[j])
        assert abs(recalls[k] - r) < 1e-12
        assert abs(precisions[k] - p) < 1e-12


def test_self_pairs_upper_triangle():
    ccs = extract_ccs(make_frame())
    pairs = self_candidate_pairs(ccs)
    for i, j in pairs:
        assert i < j


def test_render_round_trip():
    frame = make_frame()
    frame[0, 0] = 0  # drop the noise pixel for exact round trip
    ccs = extract_ccs(frame)
    rendered = render_ccs(ccs, 64, 64)
    np.testing.assert_array_equal(rendered, frame)
