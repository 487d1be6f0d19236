"""Long-tail component parity: CC geometry, IntervalIndex, group split,
variance map, feature extractors, adaptive seek."""

import numpy as np
import pytest

from lecturemath_tpu.data.cc import CC, extract_ccs
from lecturemath_tpu.eval.annotation import UniqueCCGroup
from lecturemath_tpu.ops.interval_index import IntervalIndex
from lecturemath_tpu.pipeline.video import (VideoFrameSource,
                                            grayscale_variance_map)


def box(cc_id, min_x, max_x, min_y, max_y):
    img = np.full((max_y - min_y + 1, max_x - min_x + 1), 255, np.uint8)
    return CC(cc_id, min_x, max_x, min_y, max_y, img.size, img)


def test_box_distance():
    a = box(0, 0, 9, 0, 9)
    assert a.box_distance(box(1, 5, 14, 5, 14)) == 0.0       # overlap
    assert a.box_distance(box(1, 0, 9, 15, 20)) == 6.0       # y gap
    assert a.box_distance(box(1, 12, 20, 0, 9)) == 3.0       # x gap
    assert a.box_distance(box(1, 13, 20, 13, 20)) == pytest.approx(
        np.hypot(4, 4))                                      # corner
    assert a.box_distance(box(1, 5, 14, 5, 14), (20, 0)) > 0  # offset


def test_center_and_mass():
    a = box(0, 2, 5, 4, 7)
    assert a.center() == (3.5, 5.5)
    assert a.center_of_mass() == (4, 6)  # rounded centroid of full box
    assert a.center_distance(box(1, 2, 5, 14, 17)) == 10.0


def test_normalized_image():
    img = np.zeros((4, 12), np.uint8)
    img[:, :] = 255
    cc = CC(0, 0, 11, 0, 3, 48, img)
    norm = cc.normalized_image(32)
    assert norm.shape == (32, 32)
    assert set(np.unique(norm).tolist()) <= {0, 255}
    # aspect preserved: content band is ~1/3 of the height
    rows_with_ink = (norm == 255).any(axis=1).sum()
    assert 6 <= rows_with_ink <= 16


def test_contours():
    frame = np.zeros((30, 30), np.uint8)
    frame[10:20, 5:15] = 255
    cc = extract_ccs(frame)[0]
    contours = cc.contours()
    assert len(contours) >= 1
    points = np.concatenate(contours)
    assert points[:, 0].min() >= 4 and points[:, 0].max() <= 15
    assert points[:, 1].min() >= 9 and points[:, 1].max() <= 20


def test_interval_index_matches_bruteforce():
    rng = np.random.default_rng(0)
    a = IntervalIndex()
    b = IntervalIndex()
    intervals_a, intervals_b = [], []
    for k in range(40):
        s = int(rng.integers(0, 100))
        e = s + int(rng.integers(1, 20))
        a.add(s, e, f"a{k}")
        intervals_a.append((s, e, f"a{k}"))
    for k in range(40):
        s = int(rng.integers(0, 100))
        e = s + int(rng.integers(1, 20))
        b.add(s, e, f"b{k}")
        intervals_b.append((s, e, f"b{k}"))

    got = set(a.find_matches(b))
    expected = {(va, vb) for sa, ea, va in intervals_a
                for sb, eb, vb in intervals_b if sa < eb and sb < ea}
    assert got == expected

    # removal
    s, e, v = intervals_a[0]
    assert a.remove(s, e, v)
    assert not a.remove(s, e, v)
    got = set(a.find_matches(b))
    expected = {(va, vb) for sa, ea, va in intervals_a[1:]
                for sb, eb, vb in intervals_b if sa < eb and sb < ea}
    assert got == expected


def test_unique_cc_group_split():
    ccs = [box(i, 0, 5, 0, 5) for i in range(5)]
    group = UniqueCCGroup(ccs[0], 10)
    group.cc_refs = list(ccs)

    new_group = UniqueCCGroup.split(group, 12)
    assert new_group is not None
    assert group.cc_refs == ccs[:2]
    assert new_group.start_frame == 12
    assert new_group.cc_refs == ccs[2:]
    assert UniqueCCGroup.split(group, 10) is None  # at start: no split


def test_variance_map_interior():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 24), dtype=np.uint8)
    k = 3
    out = grayscale_variance_map(img, k)

    # interior parity with the reference's clipped-window definition
    for y in range(k, 20 - k):
        for x in range(k, 24 - k):
            window = img[y - k:y + k, x - k:x + k].astype(np.float64)
            assert out[y, x] == pytest.approx(window.var(), rel=1e-9)


def test_adaptive_seek_strategies(tmp_path):
    import cv2

    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                             (64, 48))
    rng = np.random.default_rng(2)
    for t in range(120):
        frame = np.full((48, 64, 3), t * 2 % 255, np.uint8)
        writer.write(frame)
    writer.release()

    by_strategy = {}
    for strategy in ("grab", "seek", "auto"):
        source = VideoFrameSource([path], 1.0, seek_strategy=strategy)
        samples = list(source.frames())
        by_strategy[strategy] = [(t, i) for t, i, _ in samples]
        assert [i for _, i in by_strategy[strategy]] == [0, 30, 60, 90]

    assert by_strategy["grab"] == by_strategy["seek"] == by_strategy["auto"]
