"""End-to-end keyframe-binarization evaluation (the BASELINE parity gate):
build a synthetic GT annotation tree, binarize with the tiny model, and run
the full metric protocol."""

import os

import jax
import numpy as np
import pytest

from lecturemath_tpu.core.config import Config
from lecturemath_tpu.eval.keyframe_bin import (KEYFRAME_BIN_PARAMS,
                                               evaluate_keyframe_binarization)
from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig, FCNLectureNet,
                                                   init_variables)
from lecturemath_tpu.pipeline.binarize import save_checkpoint_variables
from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

DB_XML = """<AccessMath><DataBase><Name>KBDB</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Training><LectureTitle>kb01</LectureTitle></Training></Datasets>
<Lectures><Lecture><Id>kb01</Id><Title>kb01</Title><Parameters></Parameters>
<Videos><Main><Video><Path>kb01.mp4</Path></Video></Main></Videos>
</Lecture></Lectures></DataBase></AccessMath>
"""

TINY_KEYS = """
FCN_BINARIZER_NET_DOWN_CONV_FILTERS_1 = 2
FCN_BINARIZER_NET_DOWN_CONV_FILTERS_2 = 3
FCN_BINARIZER_NET_DOWN_CONV_FILTERS_3 = 4
FCN_BINARIZER_NET_DOWN_CONV_FILTERS_4 = 5
FCN_BINARIZER_NET_DOWN_CONV_FILTERS_5 = 6
FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE = 6
FCN_BINARIZER_NET_UPSAMPLE_FILTERS_5 = 6
FCN_BINARIZER_NET_UP_CONV_FILTERS_5 = 6
FCN_BINARIZER_NET_UPSAMPLE_FILTERS_4 = 5
FCN_BINARIZER_NET_UP_CONV_FILTERS_4 = 5
FCN_BINARIZER_NET_UPSAMPLE_FILTERS_3 = 4
FCN_BINARIZER_NET_UP_CONV_FILTERS_3 = 4
FCN_BINARIZER_NET_UPSAMPLE_FILTERS_2 = 3
FCN_BINARIZER_NET_UP_CONV_FILTERS_2 = 3
FCN_BINARIZER_NET_UPSAMPLE_FILTERS_1 = 2
FCN_BINARIZER_NET_UP_CONV_FILTERS_1 = 2
FCN_BINARIZER_NET_PIXEL_FEATURES_1 = 4
FCN_BINARIZER_NET_PIXEL_FEATURES_2 = 3
FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE = 3
FCN_BINARIZER_NET_KERNEL_SIZE = 3
"""

TINY = FCNConfig(down_filters=(2, 3, 4, 5, 6), mid_filters=6,
                 upsample_filters=(2, 3, 4, 5, 6), up_filters=(2, 3, 4, 5, 6),
                 pixel_features=(4, 3), kernel_size=3, pixel_kernel_size=3)


@pytest.fixture(scope="module")
def gt_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("kb")
    (root / "db.xml").write_text(DB_XML)

    rgb, binary, _, _ = synthetic_rgb_lecture(seed=4, n_frames=3, height=64,
                                              width=96, glyphs_per_board=3,
                                              glyph_size=(12, 14))
    prefix = root / "output" / "annotations" / "KBDB_kb01"
    (prefix / "keyframes").mkdir(parents=True)
    (prefix / "binary").mkdir(parents=True)
    (prefix / "portions").mkdir(parents=True)

    xml_lines = ["<Annotations>", "  <Database>KBDB</Database>",
                 "  <Lecture>kb01</Lecture>", "  <Filename>x</Filename>",
                 "  <VideoFiles><VideoFile>kb01.mp4</VideoFile></VideoFiles>",
                 "  <VideoSegments></VideoSegments>", "  <VideoKeyFrames>"]
    portion_lines = ["<Annotations>", "    <KeyFrames>"]
    for k in range(3):
        idx = 100 * (k + 1)
        cv2.imwrite(str(prefix / "keyframes" / f"{idx}.png"),
                    rgb[k][:, :, ::-1])
        gt_bin = np.stack([255 - binary[k]] * 3, axis=-1)
        cv2.imwrite(str(prefix / "binary" / f"{idx}.png"), gt_bin)
        # one full-frame portion per keyframe
        frame_dir = prefix / "portions" / f"frame_{idx}"
        frame_dir.mkdir()
        cv2.imwrite(str(frame_dir / "0.png"),
                    np.stack([255 - binary[k]] * 3, axis=-1))
        xml_lines += ["    <VideoKeyFrame>", f"       <Index>{idx}</Index>",
                      f"       <AbsTime>{idx * 33.0}</AbsTime>",
                      "       <VideoObjects></VideoObjects>",
                      "    </VideoKeyFrame>"]
        portion_lines += ["        <KeyFrame>",
                          f"            <Index>{idx}</Index>",
                          "            <Portions>",
                          "                <KeyFramePortion>",
                          "                    <X>0</X><Y>0</Y>",
                          "                    <W>96</W><H>64</H>",
                          "                    <Dark>0</Dark>",
                          "                </KeyFramePortion>",
                          "            </Portions>",
                          "        </KeyFrame>"]
    xml_lines += ["  </VideoKeyFrames>", "</Annotations>"]
    portion_lines += ["    </KeyFrames>", "</Annotations>"]
    (prefix / "segments.xml").write_text("\n".join(xml_lines))
    (prefix / "portions.xml").write_text("\n".join(portion_lines))

    # tiny checkpoint
    model = FCNLectureNet(TINY)
    variables = init_variables(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    model_path = str(root / "tiny.msgpack")
    save_checkpoint_variables(variables, model_path)

    conf_path = root / "eval.conf"
    conf_path.write_text(
        f"VIDEO_DATABASE_PATH = {root}/db.xml\n"
        f"OUTPUT_PATH = {root}/output\n"
        "FCN_BINARIZER_SAVE_BINARY = 0\n" + TINY_KEYS)
    return str(conf_path), model_path


def test_keyframe_bin_protocol(gt_tree):
    conf_path, model_path = gt_tree
    config = Config.from_file(conf_path)

    scope_metrics, scopes, pixel_metrics = evaluate_keyframe_binarization(
        config, model_path, "training", save_binaries=False)

    assert "all" in scopes
    grid = scope_metrics["all"]
    assert len(grid) == len(KEYFRAME_BIN_PARAMS.min_cc_recall)
    for entry in grid:
        r = entry["recall_metrics"]
        p = entry["precision_metrics"]
        assert 0.0 <= r["recall"] <= 1.0
        assert 0.0 <= p["precision"] <= 1.0
    # recall can only fall as thresholds tighten
    recalls = [entry["recall_metrics"]["recall"] for entry in grid]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))

    for key in ("recall", "precision", "fmeasure", "board_precision",
                "board_fmeasure"):
        assert 0.0 <= pixel_metrics[key] <= 1.0
