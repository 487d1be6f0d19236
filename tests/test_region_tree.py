"""Region tree (XY-cut), convolutional K-means, and cross-camera alignment."""

import numpy as np
import pytest

from lecturemath_tpu.data.region_tree import RegionCCs, RegionTree
from lecturemath_tpu.ops.ckmeans import ConvolutionalKMeans
from lecturemath_tpu.eval.visual_alignment import (compute_visual_alignment,
                                                   estimate_homography,
                                                   matching_points,
                                                   projection_score)


def two_column_page():
    img = np.zeros((100, 120), np.uint8)
    # left column: two short lines; right column: one block; the column gap
    # (50px) is wider than the mean CC width so the XY-cut threshold passes
    img[10:20, 5:25] = 255
    img[40:50, 5:25] = 255
    img[10:60, 75:115] = 255
    return img


def test_region_tree_segments_columns():
    tree = RegionTree.from_binary(two_column_page())
    tree.segment_recursive()  # reference default alphas

    leaves = tree.leaves()
    assert len(leaves) >= 3  # two left lines + right block at minimum

    # point lookups land in disjoint leaf regions
    left_top = tree.find_region(10, 15)
    left_bottom = tree.find_region(10, 45)
    right = tree.find_region(90, 30)
    assert left_top is not left_bottom
    assert right is not left_top
    assert right.x_limits[0] > left_top.x_limits[0]


def test_region_tree_xml_round_trip():
    img = two_column_page()
    tree = RegionTree.from_binary(img)
    tree.segment_recursive()
    xml = tree.to_xml_string()

    restored = RegionTree.from_xml_string(xml, img)
    assert len(restored.leaves()) == len(tree.leaves())
    for a, b in zip(restored.leaves(), tree.leaves()):
        assert a.x_limits == b.x_limits and a.y_limits == b.y_limits
    np.testing.assert_array_equal(restored.root.ccs.bboxes,
                                  tree.root.ccs.bboxes)


def test_region_ccs_enclosing_bbox():
    ccs = RegionCCs(np.array([[5, 10, 20, 8, 160], [40, 2, 10, 30, 300]]))
    assert ccs.enclosing_bbox(100, 100, margin=2) == (3, 0, 49, 34)
    assert len(ccs.filtered_to((0, 30), (0, 50))) == 1


def test_ckmeans_clusters_directions():
    rng = np.random.default_rng(0)
    # two well-separated direction clusters on the unit sphere
    a = rng.normal(0, 0.05, (50, 8)) + np.array([1, 0, 0, 0, 0, 0, 0, 0])
    b = rng.normal(0, 0.05, (50, 8)) + np.array([0, 1, 0, 0, 0, 0, 0, 0])
    data = np.concatenate([a, b]).astype(np.float32)

    km = ConvolutionalKMeans(data, k=2, seed=1)
    iterations, similarity = km.execute(max_iterations=50,
                                        min_similarity=0.999999)
    assert similarity > 0.999
    labels = km.assign(data)
    assert len(set(labels[:50])) == 1
    assert len(set(labels[50:])) == 1
    assert labels[0] != labels[50]


def test_visual_alignment_recovers_shift():
    import cv2

    rng = np.random.default_rng(1)
    base = np.zeros((240, 320), np.uint8)
    for _ in range(25):  # textured content so the detector finds corners
        x, y = int(rng.integers(20, 280)), int(rng.integers(20, 200))
        cv2.rectangle(base, (x, y), (x + int(rng.integers(5, 30)),
                                     y + int(rng.integers(5, 30))), 255, -1)

    shift = np.float32([[1, 0, 12], [0, 1, -7]])
    moved = cv2.warpAffine(base, shift, (320, 240))

    points_a, points_b = matching_points(moved, base)
    assert len(points_a) >= 4
    H, mask = estimate_homography(points_a, points_b)
    assert H is not None
    # recovered translation ~ (-12, +7)
    assert H[0, 2] == pytest.approx(-12, abs=1.5)
    assert H[1, 2] == pytest.approx(7, abs=1.5)

    best_h, score = compute_visual_alignment([base], [moved])
    assert best_h is not None and score > 0.9
