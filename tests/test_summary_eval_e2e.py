"""End-to-end summary evaluation: synthetic GT annotation tree (incl.
unique_ccs.xml) + generated summary tree -> SummaryEvaluator per-lecture
metrics + printed totals (the eval_multiple_summaries protocol)."""

import numpy as np
import pytest

from lecturemath_tpu.core.config import Config
from lecturemath_tpu.core.metadata import MetaDataDB
from lecturemath_tpu.eval.annotation import (KeyframeAnnotation,
                                             UniqueCCGroup)
from lecturemath_tpu.eval.summary_eval import SummaryEvaluator
from lecturemath_tpu.pipeline.keyframes import export_summary
from lecturemath_tpu.utils.synthetic import synthetic_lecture

DB_XML = """<AccessMath><DataBase><Name>SEDB</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Testing><LectureTitle>se01</LectureTitle></Testing></Datasets>
<Lectures><Lecture><Id>se01</Id><Title>se01</Title><Parameters></Parameters>
<Videos><Main><Video><Path>se01.mp4</Path></Video></Main></Videos>
</Lecture></Lectures></DataBase></AccessMath>
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("se")
    (root / "db.xml").write_text(DB_XML)
    (root / "eval.conf").write_text(
        f"VIDEO_DATABASE_PATH = {root}/db.xml\n"
        f"OUTPUT_PATH = {root}/output\n")

    frames, _, _ = synthetic_lecture(seed=6, n_frames=20, height=64,
                                     width=96, n_boards=2, glyphs_per_board=4,
                                     glyph_size=(12, 14))
    # two GT keyframes (one per era) at frame indices 270 / 570
    gt_indices = [270, 570]
    gt_times = [9000.0, 19000.0]
    gt_binaries = [255 - frames[9], 255 - frames[19]]  # ink=0 keyframes
    gt_segments = [(0, 300), (300, 600)]

    prefix = root / "output" / "annotations" / "SEDB_se01"
    (prefix / "keyframes").mkdir(parents=True)
    (prefix / "binary").mkdir(parents=True)

    xml = ["<Annotations>", "  <Database>SEDB</Database>",
           "  <Lecture>se01</Lecture>", "  <Filename>x</Filename>",
           "  <VideoFiles><VideoFile>se01.mp4</VideoFile></VideoFiles>",
           "  <VideoSegments>"]
    for start, end in gt_segments:
        xml += ["    <VideoSegment>", f"      <Start>{start}</Start>",
                f"      <End>{end}</End>", "    </VideoSegment>"]
    xml.append("  </VideoSegments>")
    xml.append("  <VideoKeyFrames>")
    for idx, t, binary in zip(gt_indices, gt_times, gt_binaries):
        rgb = np.stack([binary] * 3, axis=-1)
        cv2.imwrite(str(prefix / "keyframes" / f"{idx}.png"), rgb)
        cv2.imwrite(str(prefix / "binary" / f"{idx}.png"), rgb)
        xml += ["    <VideoKeyFrame>", f"       <Index>{idx}</Index>",
                f"       <AbsTime>{t}</AbsTime>",
                "       <VideoObjects></VideoObjects>",
                "    </VideoKeyFrame>"]
    xml += ["  </VideoKeyFrames>", "</Annotations>"]
    (prefix / "segments.xml").write_text("\n".join(xml))

    # unique_ccs.xml: singleton groups from the GT keyframes
    gt_kfs = KeyframeAnnotation.load_exported_keyframes(
        str(prefix / "segments.xml"), str(prefix / "keyframes") + "/", False)
    groups = []
    for kf_idx, kf in enumerate(gt_kfs):
        kf.binary_image = cv2.imread(str(prefix / "binary" / f"{kf.idx}.png"))
        kf.update_binary_cc(False)
        for cc in kf.binary_cc:
            groups.append(UniqueCCGroup(cc, kf_idx))
    (prefix / "unique_ccs.xml").write_text(
        UniqueCCGroup.groups_to_xml(gt_kfs, groups))

    # generated summary: same content slightly degraded (drop 3% of ink)
    rng = np.random.default_rng(0)
    summ_keyframes = []
    for binary in gt_binaries:
        ink = binary == 0
        drop = rng.random(ink.shape) < 0.03
        degraded = np.where(ink & ~drop, 0, 255).astype(np.uint8)
        summ_keyframes.append(np.stack([degraded] * 3, axis=-1))

    export_summary(str(root / "output" / "summaries" / "SEDB_se01"),
                   "SEDB", "se01", ["se01.mp4"], gt_segments,
                   [(0.0, 10000.0), (10000.0, 20000.0)], gt_indices,
                   gt_times, summ_keyframes)
    return root


def test_summary_evaluation(workspace, capsys):
    config = Config.from_file(str(workspace / "eval.conf"))
    database = MetaDataDB.from_file(str(workspace / "db.xml"))
    lecture = database.get_lecture("se01")

    evaluator = SummaryEvaluator()
    metrics = evaluator.evaluate_lecture(config, database, lecture)

    assert "all" in metrics
    entry = metrics["all"][0]  # min R/P = 0.5
    # near-identical summary: high recall and precision at the loosest level
    assert entry["recall_metrics"]["recall"] > 0.7
    assert entry["precision_metrics"]["precision"] > 0.7

    evaluator.print_totals()
    out = capsys.readouterr().out
    assert "se01" in out and "Averages" in out


def test_eval_consumes_generated_gt_tree(tmp_path):
    """Full circle: a GT tree PRODUCED by the GT-tooling (keyframe chain ->
    build_unique_cc_groups -> groups_to_xml) is consumed by the summary
    evaluator, with a perfect summary scoring ~1.0."""
    import cv2

    from lecturemath_tpu.eval.aligner import build_unique_cc_groups

    (tmp_path / "db.xml").write_text(DB_XML)
    (tmp_path / "eval.conf").write_text(
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml\n"
        f"OUTPUT_PATH = {tmp_path}/output\n")

    frames, _, _ = synthetic_lecture(seed=9, n_frames=24, height=64,
                                     width=96, n_boards=2,
                                     glyphs_per_board=4, glyph_size=(12, 14))
    # three keyframes; content persists within each era so groups chain
    gt_indices = [150, 330, 690]
    gt_times = [5000.0, 11000.0, 23000.0]
    gt_binaries = [255 - frames[k] for k in (5, 11, 23)]
    gt_segments = [(0, 240), (240, 480), (480, 720)]

    prefix = tmp_path / "output" / "annotations" / "SEDB_se01"
    (prefix / "keyframes").mkdir(parents=True)
    (prefix / "binary").mkdir(parents=True)

    xml = ["<Annotations>", "  <Database>SEDB</Database>",
           "  <Lecture>se01</Lecture>", "  <Filename>x</Filename>",
           "  <VideoFiles><VideoFile>se01.mp4</VideoFile></VideoFiles>",
           "  <VideoSegments>"]
    for start, end in gt_segments:
        xml += ["    <VideoSegment>", f"      <Start>{start}</Start>",
                f"      <End>{end}</End>", "    </VideoSegment>"]
    xml += ["  </VideoSegments>", "  <VideoKeyFrames>"]
    for idx, t, binary in zip(gt_indices, gt_times, gt_binaries):
        rgb = np.stack([binary] * 3, axis=-1)
        cv2.imwrite(str(prefix / "keyframes" / f"{idx}.png"), rgb)
        cv2.imwrite(str(prefix / "binary" / f"{idx}.png"), rgb)
        xml += ["    <VideoKeyFrame>", f"       <Index>{idx}</Index>",
                f"       <AbsTime>{t}</AbsTime>",
                "       <VideoObjects></VideoObjects>",
                "    </VideoKeyFrame>"]
    xml += ["  </VideoKeyFrames>", "</Annotations>"]
    (prefix / "segments.xml").write_text("\n".join(xml))

    # GT unique groups via the production tooling (chained across frames)
    gt_kfs = KeyframeAnnotation.load_exported_keyframes(
        str(prefix / "segments.xml"), str(prefix / "keyframes") + "/", False)
    for kf in gt_kfs:
        kf.binary_image = cv2.imread(str(prefix / "binary" / f"{kf.idx}.png"))
        kf.update_binary_cc(False)
    groups, _ = build_unique_cc_groups(gt_kfs, local_window=3,
                                       min_recall=0.8, min_precision=0.8)
    assert any(len(g.cc_refs) > 1 for g in groups)  # chains, not singletons
    (prefix / "unique_ccs.xml").write_text(
        UniqueCCGroup.groups_to_xml(gt_kfs, groups))

    export_summary(str(tmp_path / "output" / "summaries" / "SEDB_se01"),
                   "SEDB", "se01", ["se01.mp4"], gt_segments,
                   [(0.0, 8000.0), (8000.0, 16000.0), (16000.0, 24000.0)],
                   gt_indices, gt_times,
                   [np.stack([b] * 3, axis=-1) for b in gt_binaries])

    config = Config.from_file(str(tmp_path / "eval.conf"))
    database = MetaDataDB.from_file(str(tmp_path / "db.xml"))
    metrics = SummaryEvaluator().evaluate_lecture(
        config, database, database.get_lecture("se01"))
    entry = metrics["all"][0]
    assert entry["recall_metrics"]["recall"] > 0.95
    assert entry["precision_metrics"]["precision"] > 0.95


def test_eval_summaries_cli(workspace, capsys):
    """The eval_summaries CLI end-to-end over the GT + summary trees
    (reference equivalent: eval_multiple_summaries.py)."""
    from lecturemath_tpu.cli.eval_summaries import main

    main(["eval_summaries", str(workspace / "eval.conf")])
    out = capsys.readouterr().out
    assert "se01" in out and "Averages" in out and "Finished" in out
