"""Scriptable GT authoring: export_gt_tree output is directly consumable by
the summary evaluator; LectureAnnotation authoring round-trips edits."""

import os

import numpy as np

from lecturemath_tpu.eval.gt_authoring import (add_segment_split,
                                               author_lecture_annotation,
                                               export_gt_tree,
                                               remove_segment_split,
                                               set_speaker_track)
from lecturemath_tpu.utils.synthetic import synthetic_lecture


def test_export_gt_tree_feeds_evaluator(tmp_path):
    from lecturemath_tpu.core.config import Config
    from lecturemath_tpu.core.metadata import MetaDataDB
    from lecturemath_tpu.eval.summary_eval import SummaryEvaluator
    from lecturemath_tpu.pipeline.keyframes import export_summary
    from test_summary_eval_e2e import DB_XML

    (tmp_path / "db.xml").write_text(DB_XML)
    (tmp_path / "eval.conf").write_text(
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml\n"
        f"OUTPUT_PATH = {tmp_path}/output\n")

    frames, _, _ = synthetic_lecture(seed=4, n_frames=20, height=64,
                                     width=96, n_boards=2,
                                     glyphs_per_board=4, glyph_size=(12, 14))
    indices = [270, 570]
    times = [9000.0, 19000.0]
    binaries = [255 - frames[9], 255 - frames[19]]  # ink=0 GT convention

    prefix = export_gt_tree(str(tmp_path / "output" / "annotations"),
                            "SEDB", "se01", indices, times, binaries,
                            video_paths=["se01.mp4"], write_portions=True)
    for name in ("segments.xml", "unique_ccs.xml", "portions.xml",
                 "keyframes/270.png", "binary/570.png",
                 "portions/frame_270"):
        assert os.path.exists(os.path.join(prefix, name)), name

    # a perfect summary over the authored GT scores ~1.0
    export_summary(str(tmp_path / "output" / "summaries" / "SEDB_se01"),
                   "SEDB", "se01", ["se01.mp4"], [(0, 420), (420, 600)],
                   [(0.0, 14000.0), (14000.0, 19000.0)], indices, times,
                   [np.stack([b] * 3, axis=-1) for b in binaries])
    config = Config.from_file(str(tmp_path / "eval.conf"))
    database = MetaDataDB.from_file(str(tmp_path / "db.xml"))
    metrics = SummaryEvaluator().evaluate_lecture(
        config, database, database.get_lecture("se01"))
    entry = metrics["all"][0]
    assert entry["recall_metrics"]["recall"] > 0.99
    assert entry["precision_metrics"]["precision"] > 0.99


def test_lecture_annotation_authoring_roundtrip(tmp_path):
    from lecturemath_tpu.eval.lecture_annotation import LectureAnnotation

    annotation = author_lecture_annotation(
        "SEDB", "se01", ["se01.mp4"], total_frames=600,
        segment_splits=[200], keyframes=[150, 550])
    add_segment_split(annotation, 400)
    set_speaker_track(annotation, {0: (10, 20, 40, 80),
                                   300: (200, 20, 40, 80)})

    path = str(tmp_path / "se01.xml")
    annotation.save(path)
    loaded = LectureAnnotation.load(path)

    assert loaded.video_segments == [200, 400]
    assert loaded.segments_with_bounds() == [0, 200, 400, 600]
    speaker = loaded.video_objects["speaker"]
    # interpolated speaker box at the midpoint frame
    loc = speaker.get_location_at(150, out_range=False)
    assert abs(float(loc.polygon_points[0][0]) - 105.0) < 1e-6

    remove_segment_split(loaded, 200)
    assert loaded.video_segments == [400]
