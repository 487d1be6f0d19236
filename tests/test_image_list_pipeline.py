"""Image-list processing mode wired into the pipeline CLIs (VERDICT r3
item 7): a lecture whose input is a pre-exported frame directory (with the
reference's index.json metadata) runs end-to-end through the same driver
surfaces as a video lecture (reference: console_ui_process.py:188
start_image_list_preprocessing; image_list_processor.py:7-81).

Two selection routes are covered:
  * OUTPUT_FRAME_EXPORT config key naming a root of <title>/ exports
    (the reference's mode selector), and
  * the lecture's main "video" path itself being a directory.
"""

import json
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from lecturemath_tpu.core.config import Config
from lecturemath_tpu.models.fcn_lecturenet import FCNConfig
from lecturemath_tpu.pipeline.driver import PipelineDriver
from lecturemath_tpu.pipeline.binarize import save_checkpoint_variables
from lecturemath_tpu.pipeline.video import ImageListSource, VideoFrameSource
from lecturemath_tpu.utils.synthetic import (synthetic_rgb_lecture,
                                             threshold_binarizer_variables)

DB_XML = """<AccessMath><DataBase><Name>ILDB</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Training><LectureTitle>il01</LectureTitle></Training></Datasets>
<Lectures><Lecture><Id>il01</Id><Title>il01</Title><Parameters></Parameters>
<Videos><Main><Video><Path>il01</Path></Video></Main></Videos>
</Lecture></Lectures></DataBase></AccessMath>
"""

NET_CONFIG = FCNConfig(
    in_channels=3, down_filters=(4, 6, 8, 10, 12), mid_filters=12,
    upsample_filters=(4, 6, 8, 10, 12), up_filters=(4, 4, 6, 8, 10),
    pixel_features=(6, 4), kernel_size=3, pixel_kernel_size=3)

NET_KEYS = {
    "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_1": 4,
    "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_2": 6,
    "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_3": 8,
    "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_4": 10,
    "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_5": 12,
    "FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE": 12,
    "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_5": 12,
    "FCN_BINARIZER_NET_UP_CONV_FILTERS_5": 10,
    "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_4": 10,
    "FCN_BINARIZER_NET_UP_CONV_FILTERS_4": 8,
    "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_3": 8,
    "FCN_BINARIZER_NET_UP_CONV_FILTERS_3": 6,
    "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_2": 6,
    "FCN_BINARIZER_NET_UP_CONV_FILTERS_2": 4,
    "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_1": 4,
    "FCN_BINARIZER_NET_UP_CONV_FILTERS_1": 4,
    "FCN_BINARIZER_NET_PIXEL_FEATURES_1": 6,
    "FCN_BINARIZER_NET_PIXEL_FEATURES_2": 4,
    "FCN_BINARIZER_NET_KERNEL_SIZE": 3,
    "FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE": 3,
}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("il")
    (root / "db.xml").write_text(DB_XML)

    rgb, _, _, erase_times = synthetic_rgb_lecture(
        seed=13, n_frames=30, height=96, width=128, n_boards=2,
        glyphs_per_board=5)

    # exported frame directory with the reference index.json shape
    # (image_list_processor.py:16-45: frame id 0 is a time origin entry
    # without an image file)
    frames_dir = root / "videos" / "il01"
    frames_dir.mkdir(parents=True)
    index = {"0": {"video_time": 0.0, "frame_idx": 0, "abs_time": 0.0,
                   "video_idx": 0}}
    for k in range(30):
        fid = 30 * (k + 1)
        cv2.imwrite(str(frames_dir / f"{fid}.png"), rgb[k][:, :, ::-1])
        index[str(fid)] = {"video_time": fid / 30.0, "frame_idx": fid,
                           "abs_time": fid / 30.0 * 1000.0, "video_idx": 0}
    (frames_dir / "index.json").write_text(json.dumps(index))

    variables = threshold_binarizer_variables(NET_CONFIG)
    (root / "models").mkdir()
    save_checkpoint_variables(variables, str(root / "models" / "tiny.msgpack"))

    lines = [f"VIDEO_DATABASE_PATH = {root}/db.xml",
             f"VIDEO_FILES_PATH = {root}/videos",
             f"OUTPUT_PATH = {root}/output",
             f"BINARIZATION_FCN_LECTURENET_DIR = {root}/models",
             "BINARIZATION_FCN_LECTURENET_FILENAME = tiny.msgpack",
             "BINARIZATION_OUTPUT = tempo_binary_",
             "CC_STABILITY_OUTPUT = tempo_stability_",
             "CC_RECONSTRUCTED_OUTPUT = tempo_bin_reconstructed_",
             "CC_CONFLICTS_OUTPUT = tempo_cc_conflicts_",
             "CC_ST3D_OUTPUT = tempo_cc_ST3D_",
             "VIDEO_SEGMENTATION_OUTPUT = tempo_intervals_",
             "SUMMARY_KEYFRAMES_OUTPUT = tempo_segments_",
             "CC_STABILITY_MIN_RECALL = 0.85",
             "CC_STABILITY_MIN_PRECISION = 0.85",
             "CC_STABILITY_MAX_GAP = 10",
             "CC_STABILITY_MIN_TIMES = 3",
             "CC_GROUPING_MIN_IMAGE_THRESHOLD = 0.5",
             "CC_GROUPING_TEMPORAL_WINDOW = 5",
             "CC_GROUPING_MIN_RECALL = 0.5",
             "VIDEO_SEGMENTATION_METHOD = 3",
             "VIDEO_SEGMENTATION_DEL_EVENT_MIN_LENGTH = 3",
             "VIDEO_SEGMENTATION_DEL_EVENT_ADD_THRESHOLD = 0.00005",
             "VIDEO_SEGMENTATION_DEL_EVENT_THRESHOLD = 0.0008",
             "SAMPLING_FPS = 1.0"]
    for key, value in NET_KEYS.items():
        lines.append(f"{key} = {value}")
    (root / "il.conf").write_text("\n".join(lines) + "\n")
    os.makedirs(root / "output" / "temporal", exist_ok=True)
    return {"root": root, "erase_times": erase_times}


def test_driver_selects_image_list_source(workspace):
    """Directory-shaped lecture input routes to ImageListSource; a plain
    video path still routes to VideoFrameSource."""
    driver = PipelineDriver.from_config_path(
        str(workspace["root"] / "il.conf"), [], None, "BINARIZATION_OUTPUT")
    lecture = driver.database.lectures[0]
    source = driver.frame_source(lecture)
    assert isinstance(source, ImageListSource)
    assert source.index is not None  # reference index.json parsed

    # OUTPUT_FRAME_EXPORT route: an export root containing <title>/
    driver.config.set("OUTPUT_FRAME_EXPORT",
                      str(workspace["root"] / "videos"))
    assert isinstance(driver.frame_source(lecture), ImageListSource)

    # non-directory video path -> video decode
    driver.config.set("OUTPUT_FRAME_EXPORT", "")
    lecture.main_videos[0]["path"] = "nonexistent.avi"
    assert isinstance(driver.frame_source(lecture), VideoFrameSource)
    lecture.main_videos[0]["path"] = "il01"


def test_image_list_pipeline_end_to_end(workspace):
    """run_pipeline over the exported frame directory: full 5 stages,
    exported summary, frame accounting from index.json."""
    import cv2

    from lecturemath_tpu.cli.run_pipeline import main

    main(["run_pipeline", str(workspace["root"] / "il.conf"), "-save", "1"])

    out = workspace["root"] / "output"
    import pickle

    with open(out / "temporal" / "tempo_binary_il01.dat", "rb") as f:
        times, indices, compressed = pickle.load(f)
    assert list(indices) == [30 * (k + 1) for k in range(30)]
    assert times[0] == 1000.0 and len(compressed) == 30

    summary_dir = out / "summaries" / "ILDB_il01"
    tree = ET.parse(summary_dir / "segments.xml")
    assert tree.getroot().tag == "Annotations"
    keyframes = sorted(os.listdir(summary_dir / "keyframes"))
    assert len(keyframes) >= 2  # the erase event split the lecture
    for name in keyframes:
        img = cv2.imread(str(summary_dir / "keyframes" / name), 0)
        assert (img == 0).sum() > 0  # ink present


def test_image_list_staged_binarize_cli(workspace):
    """The staged stage-01 CLI consumes the same image-list lecture."""
    import pickle

    from lecturemath_tpu.cli.binarize import main

    main(["binarize", str(workspace["root"] / "il.conf"),
          "-o", "tempo_binary_staged_"])
    with open(workspace["root"] / "output" / "temporal" /
              "tempo_binary_staged_il01.dat", "rb") as f:
        times, indices, compressed = pickle.load(f)
    assert len(compressed) == 30 and list(indices)[:2] == [30, 60]
