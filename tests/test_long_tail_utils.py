"""Long-tail utility parity: 2D geometry helpers, IndexingInfo db block,
ContentRegion container, and the video-metrics accounting tool — each
A/B'd against the reference module via the oracle where it is runnable
(reference: AM_CommonTools/util/{geometry_helper,line_segment_2D,
polygon_2D}.py, AccessMath/data/{indexing_info,content_region}.py,
AccessMath/annotation/{video_metrics,lecture_video_metrics}.py)."""

import json
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

import oracle
from lecturemath_tpu.core.metadata import MetaDataDB
from lecturemath_tpu.data.content_region import ContentRegion
from lecturemath_tpu.data.indexing_info import IndexingInfo
from lecturemath_tpu.pipeline.video_metrics import (LectureVideosMetrics,
                                                    VideoMetrics,
                                                    header_table,
                                                    container_header_metrics)
from lecturemath_tpu.utils.geometry import (LineSegment2D, Polygon2D,
                                            boxes_bounding_box,
                                            boxes_intersect,
                                            boxes_intersect_reference,
                                            line_boundaries,
                                            line_intersects_polygon,
                                            lines_intersect)


# ------------------------------------------------------------- geometry

def ref_geometry():
    oracle.ensure_oracle()
    from AM_CommonTools.util.geometry_helper import GeometryHelper
    from AM_CommonTools.util.line_segment_2D import LineSegment2D as RefSeg
    from AM_CommonTools.util.polygon_2D import Polygon2D as RefPoly
    return GeometryHelper, RefSeg, RefPoly


def random_segments(rng, count):
    # mix of general, vertical, horizontal, and collinear segments
    segments = []
    for _ in range(count):
        kind = rng.integers(0, 4)
        p1 = rng.integers(0, 10, 2).astype(float)
        p2 = rng.integers(0, 10, 2).astype(float)
        if kind == 1:
            p2[0] = p1[0]          # vertical
        elif kind == 2:
            p2[1] = p1[1]          # horizontal
        elif kind == 3:
            p2 = p1 + rng.integers(1, 4) * np.array([1.0, 1.0])  # slope 1
        if (p1 == p2).all():
            p2[0] += 1.0
        segments.append((tuple(p1), tuple(p2)))
    return segments


def test_segment_intersection_oracle_ab():
    GeometryHelper, RefSeg, _ = ref_geometry()
    rng = np.random.default_rng(0)
    segments = random_segments(rng, 60)
    checked_hits = 0
    for i, seg_a in enumerate(segments):
        for seg_b in segments[i + 1:]:
            ours = LineSegment2D(*seg_a).intersection(LineSegment2D(*seg_b))
            ref = RefSeg(*seg_a).intersection(RefSeg(*seg_b))
            assert (ours is None) == (ref is None), (seg_a, seg_b)
            if ours is not None:
                assert ours == pytest.approx(ref)
                checked_hits += 1
            # boolean helper must agree with the reference's GeometryHelper
            assert lines_intersect(seg_a, seg_b) == \
                GeometryHelper.linesIntersect(seg_a, seg_b), (seg_a, seg_b)
    assert checked_hits > 100  # the sweep actually exercises intersections


def test_polygon_intersection_oracle_ab():
    GeometryHelper, RefSeg, RefPoly = ref_geometry()
    rng = np.random.default_rng(1)
    polygon = [(2.0, 2.0), (8.0, 1.0), (9.0, 7.0), (4.0, 9.0), (1.0, 6.0)]
    for seg in random_segments(rng, 40):
        ours = line_intersects_polygon(seg, polygon)
        assert ours == GeometryHelper.lineIntersectPolygon(seg, polygon)
        assert ours == RefPoly(polygon).lineIntersects(RefSeg(*seg))
        assert ours == Polygon2D(polygon).line_intersects(
            LineSegment2D(*seg))


def test_box_helpers():
    GeometryHelper, _, _ = ref_geometry()
    boxes = [((0.0, 4.0), (1.0, 3.0)), ((2.0, 9.0), (0.0, 2.0)),
             ((-1.0, 1.0), (5.0, 8.0))]
    assert boxes_bounding_box(boxes) == \
        GeometryHelper.boxesBoudingBox(boxes) == ((-1.0, 9.0), (0.0, 8.0))

    assert line_boundaries((3, 7), (1, 2)) == \
        GeometryHelper.getLineBoundaries((3, 7), (1, 2)) == (1, 3, 2, 7)

    a = ((0.0, 4.0), (0.0, 4.0))
    overlapping = ((3.0, 6.0), (3.0, 6.0))
    y_disjoint = ((0.0, 4.0), (10.0, 12.0))
    x_disjoint = ((10.0, 12.0), (0.0, 4.0))
    assert boxes_intersect(a, overlapping)
    assert not boxes_intersect(a, y_disjoint)
    assert not boxes_intersect(a, x_disjoint)
    # bug-compatible variant reproduces the reference's y-test typo
    for box in (overlapping, y_disjoint, x_disjoint):
        assert boxes_intersect_reference(a, box) == \
            GeometryHelper.boxesIntercept(a, box)
    assert boxes_intersect_reference(a, y_disjoint)  # the latent bug


# ------------------------------------------------------- indexing info

INDEXING_XML = """
<LectureIndexing>
  <SymbolRecognition>
    <Recognizer>rec.conf</Recognizer>
    <UseExplicitJunk>1</UseExplicitJunk>
    <ImplicitJunk>0.25</ImplicitJunk>
    <LabelCorrections>
      <SimilarShape>sim.csv</SimilarShape>
      <RecToLatex>r2l.csv</RecToLatex>
      <NotesToRec>n2r.csv</NotesToRec>
      <NotesIgnore>ignore.csv</NotesIgnore>
    </LabelCorrections>
    <PerLecture>
      <IndexHW>hw.csv</IndexHW>
      <IndexLaTeX>latex.csv</IndexLaTeX>
    </PerLecture>
  </SymbolRecognition>
  <MathInformationRetrieval>
    <Symbolic>tangent_s.conf</Symbolic>
    <ImageBased>tangent_v.conf</ImageBased>
  </MathInformationRetrieval>
  <ExportInfo>
    <ImagePathHW>img/hw</ImagePathHW>
    <ImagePathLaTeX>img/latex</ImagePathLaTeX>
    <TangentVConfigHW>tanv_hw.conf</TangentVConfigHW>
    <TangentVConfigLaTeX>tanv_latex.conf</TangentVConfigLaTeX>
    <AllowDefaultRec>1</AllowDefaultRec>
  </ExportInfo>
  <VisualizationServer>http://localhost:8000</VisualizationServer>
</LectureIndexing>
"""


def test_indexing_info_oracle_ab():
    oracle.ensure_oracle()
    from AccessMath.data.indexing_info import IndexingInfo as RefInfo

    node = ET.fromstring(INDEXING_XML)
    ours = IndexingInfo.from_xml(node)
    ref = RefInfo.from_XML_node(node)

    assert ours.recognizer_config_filename == \
        ref.recognizer_config_filename == "rec.conf"
    assert ours.use_explicit_junk == ref.use_explict_junk == 1
    assert ours.implicit_junk_threshold == \
        ref.implicit_junk_threshold == 0.25
    assert ours.mapping_sim_shape_filename == \
        ref.mapping_sim_shape_filename == "sim.csv"
    assert ours.mapping_rec_to_latex_filename == \
        ref.mapping_rec_to_latex_filename == "r2l.csv"
    assert ours.mapping_notes_to_rec_filename == \
        ref.mapping_notes_to_rec_filename == "n2r.csv"
    assert ours.mapping_to_ignore_notes_filename == \
        ref.mapping_to_ignore_notes_filename == "ignore.csv"
    assert ours.named_hw_classifiers_filename == \
        ref.named_hw_classifiers_filename == "hw.csv"
    assert ours.named_latex_classifiers_filename == \
        ref.named_latex_classifiers_filename == "latex.csv"
    assert ours.symbolic_mir_config_filename == \
        ref.symbolic_mir_config_filename == "tangent_s.conf"
    assert ours.image_mir_config_filename == \
        ref.image_mir_config_filename == "tangent_v.conf"
    assert ours.allow_default_recognizer is True
    assert ref.allow_default_recognizer is True
    assert ours.hw_image_path == ref.hw_image_path == "img/hw"
    assert ours.latex_tanv_config_path == \
        ref.latex_tanv_config_path == "tanv_latex.conf"
    assert ours.visualization_server == \
        ref.visualization_server == "http://localhost:8000"


def test_metadata_db_reads_indexing(tmp_path):
    db_xml = f"""
    <Export><DataBase>
      <Name>TESTDB</Name>
      <Lectures>
        <Lecture><Id>1</Id><Title>lect_a</Title>
          <Videos><Main><VideoFile><Path>a.mp4</Path></VideoFile></Main></Videos>
        </Lecture>
      </Lectures>
      <Datasets><Training><LectureTitle>lect_a</LectureTitle></Training></Datasets>
      {INDEXING_XML}
    </DataBase></Export>
    """
    path = tmp_path / "db.xml"
    path.write_text(db_xml)
    db = MetaDataDB.from_file(str(path))
    assert db.indexing is not None
    assert db.indexing.recognizer_config_filename == "rec.conf"

    # databases without the node still load with indexing=None
    path2 = tmp_path / "db2.xml"
    path2.write_text(db_xml.replace(INDEXING_XML, ""))
    assert MetaDataDB.from_file(str(path2)).indexing is None


# ------------------------------------------------------ content region

def test_content_region_container(tmp_path):
    image = np.full((8, 10, 3), 200, np.uint8)
    region = ContentRegion(3, 1.0, 2.0, 0.0, 0, None, None,
                           (0, 0, 10, 8), image, name="r3")
    out = str(tmp_path / "region.png")
    region.save_image(out)
    import cv2

    assert (cv2.imread(out) == image).all()
    assert region.components == [] and region.content is None


# ------------------------------------------------------- video metrics

def write_video(path, n_frames, fps=25):
    import cv2

    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                             fps, (64, 48))
    rng = np.random.default_rng(5)
    for _ in range(n_frames):
        writer.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    writer.release()


def test_video_metrics_oracle_ab(tmp_path):
    paths = [str(tmp_path / "a.avi"), str(tmp_path / "b.avi")]
    write_video(paths[0], 30)
    write_video(paths[1], 17)

    ours = VideoMetrics.from_video_files(paths)
    assert ours.per_video_frames == [30, 17]
    assert ours.total_frames == 47

    oracle.ensure_oracle()
    from AccessMath.annotation.video_metrics import VideoMetrics as RefVM

    ref = RefVM.FromVideoFiles(paths)
    ours_dict, ref_dict = ours.to_dict(), ref.to_dict()
    assert set(ours_dict) == set(ref_dict)
    for key in ref_dict:
        assert ours_dict[key] == pytest.approx(ref_dict[key]), key

    table = ours.metrics_table()
    assert table.splitlines()[1].startswith("1\t30\t30")
    assert header_table(container_header_metrics(paths)).count("\n") == 2


def test_video_metrics_cli(tmp_path, capsys):
    from lecturemath_tpu.cli.video_metrics import main

    video_dir = tmp_path / "videos"
    video_dir.mkdir()
    write_video(video_dir / "lect_a.avi", 12)
    (tmp_path / "db.xml").write_text("""
    <Export><DataBase><Name>TESTDB</Name>
      <Lectures><Lecture><Id>1</Id><Title>lect_a</Title>
        <Videos><Main><VideoFile><Path>lect_a.avi</Path></VideoFile></Main></Videos>
      </Lecture></Lectures>
      <Datasets><Training><LectureTitle>lect_a</LectureTitle></Training></Datasets>
    </DataBase></Export>""")
    (tmp_path / "run.conf").write_text(
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml\n"
        f"VIDEO_FILES_PATH = {video_dir}\n"
        f"OUTPUT_PATH = {tmp_path}/output\n")

    out_json = str(tmp_path / "metrics.json")
    main(["video_metrics", str(tmp_path / "run.conf"), "-json", out_json])
    printed = capsys.readouterr().out
    assert "Processing <lect_a>" in printed
    assert "OpenCV Property Metrics" in printed

    with open(out_json) as f:
        data = json.load(f)
    assert data["lect_a"]["per_video_frames"] == [12]
    lvm = LectureVideosMetrics()
    assert lvm.to_dict() == {}
