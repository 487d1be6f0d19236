"""Text-region GT export + text-detection evaluation: geometry unit tests
and a full A/B against the reference TextAnnotationExporter /
TextDetectionEvaluator running via the oracle on the SAME annotation XML
(reference: text_annotation_exporter.py, text_detection_evaluator.py)."""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from lecturemath_tpu.eval.lecture_annotation import (
    DrawingInfo, LectureAnnotation, ObjectLocation, TimelineObject,
    polygon_area, polygon_intersection_area)
from lecturemath_tpu.eval.text_export import (TextAnnotationExporter,
                                              TextDetectionEvaluator)

import oracle

WIDTH, HEIGHT = 960, 540
EXPORT_FRAMES = [0, 5, 10, 15, 20, 25, 30]


# ------------------------------------------------------------- geometry

def test_polygon_geometry_exact():
    rect_a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    rect_b = np.array([[5, 0], [15, 0], [15, 10], [5, 10]], float)
    assert polygon_area(rect_a) == pytest.approx(100.0)
    assert polygon_intersection_area(rect_a, rect_b) == pytest.approx(50.0)

    tri = np.array([[0, 0], [4, 0], [0, 3]], float)
    assert polygon_area(tri) == pytest.approx(6.0)

    disjoint = np.array([[20, 20], [30, 20], [30, 30], [20, 30]], float)
    assert polygon_intersection_area(rect_a, disjoint) == 0.0


def test_polygon_geometry_nonconvex():
    # L-shape: [0,4]x[0,2] plus [0,2]x[2,4], area 12
    ell = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], float)
    rect = np.array([[1, 1], [5, 1], [5, 5], [1, 5]], float)
    assert polygon_area(ell) == pytest.approx(12.0)
    # exact via convex clip: [1,4]x[1,2] (3) + [1,2]x[2,4] (2)
    assert polygon_intersection_area(ell, rect) == pytest.approx(5.0)
    assert polygon_intersection_area(rect, ell) == pytest.approx(5.0)

    # non-convex x non-convex falls back to point sampling: approximate.
    # Overlap of the two Ls: [1,4]x[1,2] + [1,2]x[2,3] + [1,2]x[3,4] = 5
    ell2 = ell + np.array([[1.0, 1.0]])
    approx = polygon_intersection_area(ell, ell2)
    assert approx == pytest.approx(5.0, rel=0.02)


def test_object_location_metrics():
    loc_a = ObjectLocation(True, 0, 0.0,
                           np.array([[0, 0], [10, 0], [10, 10], [0, 10]],
                                    float))
    loc_b = ObjectLocation(True, 0, 0.0,
                           np.array([[5, 0], [15, 0], [15, 10], [5, 10]],
                                    float))
    assert loc_a.area() == pytest.approx(100.0)
    assert loc_a.intersection_percentage(loc_b) == pytest.approx(0.5)
    assert loc_a.iou(loc_b) == pytest.approx(50.0 / 150.0)
    assert loc_a.get_polygon_points()[1] == (10.0, 0.0)


# ------------------------------------------------------- shared fixtures

def build_annotation(path: str) -> LectureAnnotation:
    """Canvas at (10, 20), render viewport (15, 30, 480, 270) -> projection
    offset (5, 10) and scale 2x to the 960x540 frame."""
    info = DrawingInfo((10.0, 20.0, 1000.0, 700.0),
                       (15.0, 640.0, 480.0, 40.0),
                       (15.0, 30.0, 480.0, 270.0))
    annotation = LectureAnnotation("TESTDB", "lec01", path, ["lec01.mp4"],
                                   40, info)

    text_1 = TimelineObject("text_1", "text_1",
                            TimelineObject.SHAPE_QUADRILATERAL)
    text_1.set_location_at(0, 0.0, True,
                           [[100, 100], [200, 100], [200, 150], [100, 150]])
    text_1.set_location_at(20, 2.0, True,
                           [[120, 100], [220, 100], [220, 150], [120, 150]])
    text_1.set_location_at(30, 3.0, False,
                           [[120, 100], [220, 100], [220, 150], [120, 150]])

    text_2 = TimelineObject("text_2", "text_2",
                            TimelineObject.SHAPE_QUADRILATERAL)
    text_2.set_location_at(0, 0.0, True,
                           [[300, 200], [400, 200], [400, 260], [300, 260]])
    text_2.set_location_at(20, 2.0, True,
                           [[300, 200], [400, 200], [400, 260], [300, 260]])

    # overlaps the frame-5 interpolated speaker position by ~69%
    text_3 = TimelineObject("text_3", "text_3",
                            TimelineObject.SHAPE_QUADRILATERAL)
    text_3.set_location_at(0, 0.0, True,
                           [[420, 200], [480, 200], [480, 260], [420, 260]])
    text_3.set_location_at(20, 2.0, True,
                           [[420, 200], [480, 200], [480, 260], [420, 260]])

    speaker = TimelineObject("speaker", "speaker",
                             TimelineObject.SHAPE_QUADRILATERAL)
    speaker.set_location_at(0, 0.0, True,
                            [[560, 240], [660, 240], [660, 340], [560, 340]])
    speaker.set_location_at(10, 1.0, True,  # fully covers text_2
                            [[290, 190], [410, 190], [410, 270], [290, 270]])
    speaker.set_location_at(20, 2.0, True,
                            [[560, 240], [660, 240], [660, 340], [560, 340]])

    for obj in (text_1, text_2, text_3, speaker):
        annotation.video_objects[obj.id] = obj
    annotation.video_segments = [20]
    return annotation


def make_frames(rng):
    return {idx: rng.integers(0, 256, (HEIGHT, WIDTH, 3), dtype=np.uint8)
            for idx in EXPORT_FRAMES}


def normalized_xml(path: str) -> bytes:
    """Canonical bytes with <folder> texts blanked (the only expected
    difference between the two export trees: their absolute paths)."""
    root = ET.parse(path).getroot()
    for node in root.iter("folder"):
        node.text = ""
    return ET.tostring(root)


def run_our_exporter(annotation_path, export_dir, mode, frames):
    annotation = LectureAnnotation.load(annotation_path)
    exporter = TextAnnotationExporter(annotation, ["text"], "speaker", 0.25,
                                      mode, export_dir)
    exporter.initialize(WIDTH, HEIGHT)
    for frame_idx in EXPORT_FRAMES:
        exporter.handle_frame(frames[frame_idx], frame_idx)
    exporter.finalize()
    return exporter


def run_reference_exporter(annotation_path, export_dir, mode, frames):
    ref_cls = oracle.oracle_text_annotation_exporter()
    ref_annotation_cls = oracle.oracle_lecture_annotation_class()
    annotation = ref_annotation_cls.Load(annotation_path, False)
    exporter = ref_cls(annotation, ["text"], "speaker", 0.25, mode,
                       export_dir)
    exporter.initialize(WIDTH, HEIGHT)
    for frame_idx in EXPORT_FRAMES:
        exporter.handleFrame(frames[frame_idx], None, 0, 0.0, 0.0, frame_idx)
    exporter.finalize()
    return exporter


# ------------------------------------------------------------ oracle A/B

def test_exporter_per_frame_oracle_ab(tmp_path):
    """Same annotation XML through both exporters in ALL_PER_FRAME mode:
    every per-frame GT XML (occlusion decisions, interpolation,
    projection, schema) matches the reference byte-for-byte."""
    annotation_path = str(tmp_path / "TESTDB_lec01.xml")
    build_annotation(annotation_path).save()
    frames = make_frames(np.random.default_rng(7))

    ours_dir = str(tmp_path / "ours")
    ref_dir = str(tmp_path / "ref")
    run_our_exporter(annotation_path, ours_dir,
                     TextAnnotationExporter.ALL_PER_FRAME, frames)
    run_reference_exporter(annotation_path, ref_dir,
                           TextAnnotationExporter.ALL_PER_FRAME, frames)

    for frame_idx in EXPORT_FRAMES:
        ours = normalized_xml(f"{ours_dir}/Annotations/{frame_idx}.xml")
        ref = normalized_xml(f"{ref_dir}/Annotations/{frame_idx}.xml")
        assert ours == ref, f"frame {frame_idx} GT XML differs"

    # sanity on the expected occlusion pattern (threshold 0.25):
    ids_at = {}
    for frame_idx in (0, 5, 10, 30):
        root = ET.parse(f"{ours_dir}/Annotations/{frame_idx}.xml").getroot()
        ids_at[frame_idx] = sorted(n.findtext("ID")
                                   for n in root.findall("object"))
    assert ids_at[0] == ["text_1", "text_2", "text_3"]
    assert ids_at[5] == ["text_1", "text_2"]       # text_3 under speaker
    assert ids_at[10] == ["text_1", "text_3"]      # text_2 under speaker
    assert ids_at[30] == []                        # text_1 invisible, rest out


def test_exporter_unique_boxes_oracle_ab(tmp_path):
    """UNIQUE_BOXES mode: best-instance selection (masked average + MSE),
    the exported crops, and text_objects.xml all match the reference."""
    annotation_path = str(tmp_path / "TESTDB_lec01.xml")
    build_annotation(annotation_path).save()
    frames = make_frames(np.random.default_rng(11))

    ours_dir = str(tmp_path / "ours")
    ref_dir = str(tmp_path / "ref")
    run_our_exporter(annotation_path, ours_dir,
                     TextAnnotationExporter.UNIQUE_BOXES, frames)
    run_reference_exporter(annotation_path, ref_dir,
                           TextAnnotationExporter.UNIQUE_BOXES, frames)

    ours = normalized_xml(f"{ours_dir}/Annotations/text_objects.xml")
    ref = normalized_xml(f"{ref_dir}/Annotations/text_objects.xml")
    assert ours == ref

    for name in ("text_1", "text_2", "text_3"):
        with open(f"{ours_dir}/JPEGImages/{name}.png", "rb") as f:
            ours_png = f.read()
        with open(f"{ref_dir}/JPEGImages/{name}.png", "rb") as f:
            ref_png = f.read()
        assert ours_png == ref_png, f"best-instance crop differs: {name}"


# -------------------------------------------------------------- evaluator

def build_gt_exporter(tmp_path):
    annotation_path = str(tmp_path / "TESTDB_lec01.xml")
    build_annotation(annotation_path).save()
    annotation = LectureAnnotation.load(annotation_path)
    exporter = TextAnnotationExporter(annotation, ["text"], "speaker", 0.25,
                                      TextAnnotationExporter.ALL_PER_FRAME,
                                      None)
    exporter.initialize(WIDTH, HEIGHT, prepare_dirs=False)
    return exporter


def test_evaluator_metrics_hand_computed(tmp_path):
    exporter = build_gt_exporter(tmp_path)
    gt = TextDetectionEvaluator.generate_per_frame_gt([0], exporter)
    assert gt[0]["total_visible"] == 3
    assert gt[0]["total_occluded"] == 0

    # text_1 at frame 0 projects to [190,380]x[180,280] (offset 5,10 x2)
    assert gt[0]["pixel_visible"][180:280, 190:380].all()

    # one detection covering the left half of projected text_1:
    # 95x100 px inside a 190x100 GT box plus nothing else
    det = {0: {"bboxes": [(190, 180, 285, 280)], "confidences": [0.9]}}
    gt_pixels = np.count_nonzero(gt[0]["pixel_visible"])
    metrics = TextDetectionEvaluator.get_text_det_metrics(det, gt)
    assert metrics["avg_precision"] == pytest.approx(1.0)
    assert metrics["avg_recall"] == pytest.approx(95 * 100 / gt_pixels)
    assert metrics["avg_det_count"] == 1.0

    # confidence filter drops the box -> empty detection is "precise"
    metrics = TextDetectionEvaluator.get_text_det_metrics(det, gt, 0.95)
    assert metrics["avg_det_count"] == 0.0
    assert metrics["avg_precision"] == 1.0
    assert metrics["avg_recall"] == 0.0


def test_evaluator_metrics_oracle_parity(tmp_path):
    """Our per-frame GT fed to both get_text_det_metrics implementations
    produces identical metric dicts (the reference's own generate_per_frame_gt
    has a latent tuple-unpack bug — text_detection_evaluator.py:91 — so GT
    generation itself is compared structurally in the exporter A/B)."""
    exporter = build_gt_exporter(tmp_path)
    gt = TextDetectionEvaluator.generate_per_frame_gt(EXPORT_FRAMES, exporter)

    rng = np.random.default_rng(3)
    detection = {}
    for frame_idx in EXPORT_FRAMES:
        boxes = []
        for _ in range(4):
            x1, y1 = rng.integers(0, WIDTH - 200), rng.integers(0, HEIGHT - 200)
            boxes.append((float(x1), float(y1),
                          float(x1 + rng.integers(20, 200)),
                          float(y1 + rng.integers(20, 200))))
        detection[frame_idx] = {"bboxes": boxes,
                                "confidences": list(rng.random(4))}

    ref_eval = oracle.oracle_text_detection_evaluator()(min_confidence=0.5)
    for min_conf in (None, 0.5):
        ours = TextDetectionEvaluator.get_text_det_metrics(
            detection, gt, min_conf)
        ref = ref_eval.get_text_det_metrics(detection, gt, min_conf)
        assert ours == pytest.approx(ref)


def test_threshold_sweep_and_tables(tmp_path):
    exporter = build_gt_exporter(tmp_path)
    evaluator = TextDetectionEvaluator(min_confidence=0.5)

    # detection whose precision depends on confidence: the good box has
    # conf 0.9, a spurious far-off box has conf 0.2
    det = {0: {"bboxes": [(190, 180, 380, 280), (0, 400, 100, 500)],
               "confidences": [0.9, 0.2]}}
    evaluator.evaluate_lecture_thresholds("lec01", exporter, det)
    table, best = evaluator.train_totals()
    assert best > 0.2  # dropping the spurious box wins
    assert "Best threshold" in table

    evaluator2 = TextDetectionEvaluator(min_confidence=0.5)
    results = evaluator2.evaluate_lecture("lec01", exporter, det, det)
    assert results["raw"]["avg_det_count"] == 1.0   # conf filter applied
    assert results["refined"]["avg_det_count"] == 2.0
    totals = evaluator2.totals_table()
    assert totals.splitlines()[-1].startswith("Averages")
