"""Segmentation-eval metric parity vs the reference script functions, plus
lecture-annotation XML round trip and text-detector CC-IOU matching."""

import sys

import numpy as np
import pytest

from lecturemath_tpu.eval import segments_eval as se
from lecturemath_tpu.eval.lecture_annotation import (LectureAnnotation,
                                                     ObjectLocation,
                                                     TimelineObject)
from lecturemath_tpu.eval.text_detector_eval import cc_iou_matching

from oracle import ensure_oracle, REFERENCE_DIR


@pytest.fixture(scope="module")
def ref_script():
    ensure_oracle()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import lecturenet_eval_segments as ref
    return ref


def random_case(seed):
    rng = np.random.default_rng(seed)
    bounds = np.cumsum(rng.integers(50, 400, 6)).tolist()
    gt_bounds = [0] + bounds
    pred = []
    cursor = 0
    while cursor < gt_bounds[-1] - 60:
        start = cursor + int(rng.integers(0, 30))
        end = start + int(rng.integers(40, 400))
        pred.append((start, min(end, gt_bounds[-1])))
        cursor = end + int(rng.integers(1, 20))
    return gt_bounds, pred


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_overlaps_parity(ref_script, seed):
    gt_bounds, pred = random_case(seed)
    ours = se.segment_overlaps(gt_bounds, pred)
    theirs = ref_script.get_overlaps(gt_bounds, pred)
    assert [(pytest.approx(a), b, c) for a, b, c in ours] == theirs


@pytest.mark.parametrize("seed", [0, 3])
def test_split_points_parity(ref_script, seed):
    _, pred = random_case(seed)
    assert se.split_points_from_segments(pred) == \
        ref_script.from_segments_to_split_points(pred)


@pytest.mark.parametrize("seed", [0, 5])
def test_split_matching_parity(ref_script, seed):
    rng = np.random.default_rng(seed)
    gt_splits = sorted(rng.integers(0, 3000, 8).tolist())
    pred_splits = sorted(rng.integers(0, 3000, 10).tolist())
    for gap in (90, 210):
        ours = se.match_split_points(gt_splits, pred_splits, gap)
        theirs = ref_script.match_split_points(gt_splits, pred_splits, gap)
        assert ours == theirs


def test_one_to_one_and_siou(ref_script):
    gt_bounds, pred = random_case(7)
    overlaps = se.segment_overlaps(gt_bounds, pred)

    # reference 1:1 matching (lecturenet_eval_segments.py:272-280)
    for iou_threshold in (0.5, 0.7, 0.9):
        matched_gt, matched_pred = {}, {}
        count = 0
        for iou, g, p in sorted(overlaps, reverse=True):
            if iou >= iou_threshold and g not in matched_gt and p not in matched_pred:
                matched_gt[g] = True
                matched_pred[p] = True
                count += 1
        assert se.one_to_one_matches(overlaps, iou_threshold) == count

    # reference SIoU (:307-321)
    ordered = sorted([(g, iou, p) for iou, g, p in overlaps], reverse=True)
    seen = None
    best = []
    for g, iou, p in ordered:
        if seen != g:
            best.append(iou)
            seen = g
    assert se.average_best_iou(overlaps) == pytest.approx(sum(best) / len(best))


def test_lecture_annotation_round_trip(tmp_path):
    annotation = LectureAnnotation("DB", "lec01", "out.xml", ["v1.mp4"],
                                   total_frames=9000)
    annotation.video_segments = [3000, 6000]
    annotation.video_segment_keyframes = [2900, 5900, 8900]

    speaker = TimelineObject("speaker", "speaker", TimelineObject.SHAPE_POLYGON)
    speaker.set_location_at(0, 0.0, True, [[0, 0], [50, 0], [50, 100], [0, 100]])
    speaker.set_location_at(9000, 300000.0, True,
                            [[200, 0], [250, 0], [250, 100], [200, 100]])
    annotation.video_objects["speaker"] = speaker

    path = str(tmp_path / "annotation.xml")
    annotation.save(path)
    loaded = LectureAnnotation.load(path)

    assert loaded.db_name == "DB"
    assert loaded.total_frames == 9000
    assert loaded.video_segments == [3000, 6000]
    assert loaded.video_segment_keyframes == [2900, 5900, 8900]
    assert loaded.segments_with_bounds() == [0, 3000, 6000, 9000]

    obj = loaded.video_objects["speaker"]
    assert len(obj.locations) == 2
    # interpolated location halfway
    mid = obj.get_location_at(4500, False)
    np.testing.assert_allclose(mid.polygon_points[0], [100, 0])
    # out-of-range clamping
    assert obj.get_location_at(-5, True).frame == 0
    assert obj.get_location_at(-5, False) is None


def test_cc_iou_matching():
    gt = np.zeros((60, 60), dtype=np.uint8)
    gt[5:15, 5:15] = 255      # matched exactly
    gt[30:40, 30:40] = 255    # matched partially
    gt[50:55, 50:55] = 255    # missed

    pred = np.zeros((60, 60), dtype=np.uint8)
    pred[5:15, 5:15] = 255
    pred[30:40, 30:36] = 255  # IOU = 0.6
    pred[2:4, 40:58] = 255    # false positive

    per_threshold, pixel = cc_iou_matching(pred, gt, (0.5, 0.7, 0.9))
    assert per_threshold[0.5]["matches"] == 2
    assert per_threshold[0.7]["matches"] == 1
    assert per_threshold[0.9]["matches"] == 1
    assert per_threshold[0.5]["recall"] == pytest.approx(2 / 3)
    assert per_threshold[0.5]["precision"] == pytest.approx(2 / 3)
    assert pixel["recall"] == pytest.approx((100 + 60) / 225)
