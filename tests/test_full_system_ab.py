"""Full-system A/B against the reference pipeline (VERDICT r2 item 1).

Runs the reference's OWN scripts — pre_ST3D_v3.0_01_binarize .. 05 +
eval_multiple_summaries (/root/reference/ACCESS2021_release) — on a synthetic
lecture video with a tiny checkpoint exported by save_torch_checkpoint, then
runs OUR run_pipeline CLI with the same config/weights on the same video, and
asserts the end-to-end outputs are identical: stage-01 artifact, intervals,
keyframe PNGs, segments.xml, gui_export.xml, and the reference evaluator's
metrics over both summary trees.

The checkpoint keeps the full forward compute (random trunk) but pins the
head parameters so the binarization logit is a saturated luminance threshold
(utils/synthetic.threshold_binarizer_variables): stage-01 output is then
deterministic and bit-identical between torch fp32 and our bf16 lowering,
which makes the COMPOSITION comparison exact rather than statistical.
Sampling uses SAMPLING_ALIGNMENT=reference so frame/time accounting matches
the reference VideoProcessor bit-for-bit (video_processor.py:124-166).
"""

import importlib.util
import os
import pickle
import shutil
import sys
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from lecturemath_tpu.models.convert import save_torch_checkpoint
from lecturemath_tpu.models.fcn_lecturenet import FCNConfig
from lecturemath_tpu.pipeline.video import decompress_png
from lecturemath_tpu.utils.synthetic import (synthetic_rgb_lecture,
                                             threshold_binarizer_variables)

import oracle

REFERENCE_DIR = "/root/reference/ACCESS2021_release"

DB_XML = """<AccessMath>
  <DataBase>
    <Name>ABDB</Name>
    <OutputPaths>
      <Temporal>temporal</Temporal>
      <Images>images</Images>
      <Videos>videos</Videos>
      <Annotations>annotations</Annotations>
      <Summaries>summaries</Summaries>
    </OutputPaths>
    <Datasets>
      <Testing><LectureTitle>ab01</LectureTitle></Testing>
    </Datasets>
    <Lectures>
      <Lecture>
        <Id>ab01</Id>
        <Title>ab01</Title>
        <Parameters></Parameters>
        <Videos><Main><Video><Path>ab01.avi</Path></Video></Main></Videos>
      </Lecture>
    </Lectures>
  </DataBase>
</AccessMath>
"""

# tiny-but-complete net: every block present, all widths distinct
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

PIPELINE_KEYS = {
    "BINARIZATION_OUTPUT": "tempo_binary_",
    "CC_STABILITY_OUTPUT": "tempo_stability_",
    "CC_RECONSTRUCTED_OUTPUT": "tempo_bin_reconstructed_",
    "CC_CONFLICTS_OUTPUT": "tempo_cc_conflicts_",
    "CC_ST3D_OUTPUT": "tempo_cc_ST3D_",
    "VIDEO_SEGMENTATION_OUTPUT": "tempo_intervals_",
    "SUMMARY_KEYFRAMES_OUTPUT": "tempo_segments_",
    "BINARIZATION_FCN_LECTURENET_DIR": "../models",
    "BINARIZATION_FCN_LECTURENET_FILENAME": "tiny_ab.dat",
    "FCN_BINARIZER_USE_CUDA": 0,
    "BINARIZATION_DEBUG_MODE": 0,
    "SAMPLING_FPS": 1.0,
    "SAMPLING_ALIGNMENT": "reference",
    "CC_STABILITY_MIN_RECALL": 0.925,
    "CC_STABILITY_MIN_PRECISION": 0.925,
    "CC_STABILITY_MAX_GAP": 10,
    "CC_STABILITY_MIN_TIMES": 3,
    "CC_GROUPING_MIN_IMAGE_THRESHOLD": 0.5,
    "CC_GROUPING_TEMPORAL_WINDOW": 5,
    "CC_GROUPING_MIN_RECALL": 0.5,
    "VIDEO_SEGMENTATION_METHOD": 3,
    "VIDEO_SEGMENTATION_DEL_EVENT_MIN_LENGTH": 3,
    "VIDEO_SEGMENTATION_DEL_EVENT_ADD_THRESHOLD": 0.00005,
    "VIDEO_SEGMENTATION_DEL_EVENT_THRESHOLD": 0.0008,
}


def run_reference_script(script: str, config_path: str, monkeypatch=None):
    """Execute a reference root script's main() in-process against the
    compiled oracle environment (cwd = /tmp/lm_oracle, reference packages on
    sys.path, torchvision stubbed)."""
    oracle.ensure_oracle()
    oracle.stub_torchvision()
    import matplotlib

    matplotlib.use("Agg")

    path = os.path.join(REFERENCE_DIR, script)
    spec = importlib.util.spec_from_file_location(
        "ref_" + script.replace(".", "_"), path)
    module = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = [script, config_path]
    try:
        spec.loader.exec_module(module)
        module.main()
    finally:
        sys.argv = old_argv


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ab")
    (root / "db.xml").write_text(DB_XML)
    (root / "videos").mkdir()
    (root / "models").mkdir()

    # 40 content seconds, two boards, erase at t=20 -> 2 summary segments
    rgb, binary_gt, _, erase_times = synthetic_rgb_lecture(
        seed=21, n_frames=40, height=96, width=128, n_boards=2,
        glyphs_per_board=5)

    # 30 fps video: each content frame held for one second
    writer = cv2.VideoWriter(str(root / "videos" / "ab01.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (128, 96))
    for frame in rgb:
        bgr = frame[:, :, ::-1]
        for _ in range(30):
            writer.write(bgr)
    writer.release()

    # tiny checkpoint: deterministic threshold head over a live random trunk
    net_config = FCNConfig(
        in_channels=3, down_filters=(4, 6, 8, 10, 12), mid_filters=12,
        upsample_filters=(4, 6, 8, 10, 12), up_filters=(4, 4, 6, 8, 10),
        pixel_features=(6, 4), kernel_size=3, pixel_kernel_size=3)
    variables = threshold_binarizer_variables(net_config)
    save_torch_checkpoint(variables, str(root / "models" / "tiny_ab.dat"))

    def write_conf(name, output_dir):
        lines = [f"VIDEO_DATABASE_PATH = {root}/db.xml",
                 f"VIDEO_FILES_PATH = {root}/videos",
                 f"OUTPUT_PATH = {output_dir}"]
        for key, value in {**PIPELINE_KEYS, **NET_KEYS}.items():
            lines.append(f"{key} = {value}")
        (root / name).write_text("\n".join(lines) + "\n")
        for sub in ("temporal", "images", "summaries"):
            os.makedirs(os.path.join(output_dir, sub), exist_ok=True)
        return str(root / name)

    ref_conf = write_conf("ref.conf", str(root / "out_ref"))
    ours_conf = write_conf("ours.conf", str(root / "out_ours"))
    return {"root": root, "ref_conf": ref_conf, "ours_conf": ours_conf,
            "erase_times": erase_times, "net_config": net_config}


@pytest.fixture(scope="module")
def reference_outputs(workspace):
    """The reference pipeline's artifacts, produced by its own scripts."""
    for script in ("pre_ST3D_v3.0_01_binarize.py",
                   "pre_ST3D_v3.0_02_cc_analaysis.py",
                   "pre_ST3D_v3.0_03_cc_grouping.py",
                   "pre_ST3D_v3.0_04_vid_segmentation.py",
                   "pre_ST3D_v3.0_05_generate_summary.py"):
        run_reference_script(script, workspace["ref_conf"])
    return str(workspace["root"] / "out_ref")


@pytest.fixture(scope="module")
def our_outputs(workspace):
    """Our express pipeline via the run_pipeline CLI (production path:
    bf16, folded BN, s2d heads, packed downloads), saving stage artifacts."""
    from lecturemath_tpu.cli.run_pipeline import main

    main(["run_pipeline", workspace["ours_conf"], "-save", "1"])
    return str(workspace["root"] / "out_ours")


def load_artifact(output_dir, prefix):
    with open(os.path.join(output_dir, "temporal", prefix + "ab01.dat"),
              "rb") as f:
        return pickle.load(f)


def test_stage01_artifact_identical(reference_outputs, our_outputs):
    ref_times, ref_indices, ref_png = load_artifact(reference_outputs,
                                                    "tempo_binary_")
    our_times, our_indices, our_png = load_artifact(our_outputs,
                                                    "tempo_binary_")
    assert list(our_indices) == list(ref_indices)
    np.testing.assert_allclose(our_times, ref_times, atol=1e-6)

    # 40 content seconds -> 40 grab-loop samples, minus the first (consumed
    # as last_frame by the reference worker protocol) = 39
    assert list(ref_indices) == [30 * k for k in range(2, 41)]

    ref_frames = decompress_png(ref_png)
    our_frames = decompress_png(our_png)
    assert len(our_frames) == len(ref_frames) == 39
    for ours, theirs in zip(our_frames, ref_frames):
        np.testing.assert_array_equal(ours, theirs)


def test_intervals_identical(workspace, reference_outputs, our_outputs):
    ref_intervals = load_artifact(reference_outputs, "tempo_intervals_")
    our_intervals = load_artifact(our_outputs, "tempo_intervals_")
    assert [tuple(i) for i in our_intervals] == \
        [tuple(i) for i in ref_intervals]
    # the erase event at t=20 actually split the lecture
    assert len(ref_intervals) == 2
    assert abs(ref_intervals[0][1] - workspace["erase_times"][0]) <= 3


def test_keyframes_identical(reference_outputs, our_outputs):
    import cv2

    ref_dir = os.path.join(reference_outputs, "summaries", "ABDB_ab01",
                           "keyframes")
    our_dir = os.path.join(our_outputs, "summaries", "ABDB_ab01", "keyframes")
    ref_files = sorted(os.listdir(ref_dir))
    assert sorted(os.listdir(our_dir)) == ref_files and len(ref_files) == 2
    for name in ref_files:
        theirs = cv2.imread(os.path.join(ref_dir, name))
        ours = cv2.imread(os.path.join(our_dir, name))
        np.testing.assert_array_equal(ours, theirs)
        assert (theirs == 0).any()  # ink present (exported ink=0)


def normalized_xml(path, output_dir):
    text = open(path).read()
    return text.replace(output_dir, "<OUT>").replace(" ", "").replace(
        "\n", "")


def test_segments_xml_identical(reference_outputs, our_outputs):
    ref = normalized_xml(os.path.join(reference_outputs, "summaries",
                                      "ABDB_ab01", "segments.xml"),
                         reference_outputs)
    ours = normalized_xml(os.path.join(our_outputs, "summaries", "ABDB_ab01",
                                       "segments.xml"), our_outputs)
    assert ours == ref


def test_gui_export_identical(reference_outputs, our_outputs):
    ref = open(os.path.join(reference_outputs, "summaries", "ABDB_ab01",
                            "gui_export.xml")).read()
    ours = open(os.path.join(our_outputs, "summaries", "ABDB_ab01",
                             "gui_export.xml")).read()
    assert ours == ref


@pytest.fixture(scope="module")
def gt_tree(workspace, reference_outputs, our_outputs):
    """A GT annotation tree (segments + keyframes + binary + unique_ccs.xml)
    built with OUR GT tooling from the reference pipeline's own keyframes,
    installed identically under both output trees."""
    import cv2

    from lecturemath_tpu.eval.aligner import build_unique_cc_groups
    from lecturemath_tpu.eval.annotation import (KeyframeAnnotation,
                                                 UniqueCCGroup)

    src = os.path.join(reference_outputs, "summaries", "ABDB_ab01")
    prefix = os.path.join(reference_outputs, "annotations", "ABDB_ab01")
    os.makedirs(os.path.join(prefix, "binary"), exist_ok=True)
    shutil.copytree(os.path.join(src, "keyframes"),
                    os.path.join(prefix, "keyframes"), dirs_exist_ok=True)
    shutil.copy(os.path.join(src, "segments.xml"),
                os.path.join(prefix, "segments.xml"))
    for name in os.listdir(os.path.join(src, "keyframes")):
        shutil.copy(os.path.join(src, "keyframes", name),
                    os.path.join(prefix, "binary", name))

    gt_kfs = KeyframeAnnotation.load_exported_keyframes(
        os.path.join(prefix, "segments.xml"),
        os.path.join(prefix, "keyframes") + "/", False)
    for kf in gt_kfs:
        kf.binary_image = cv2.imread(
            os.path.join(prefix, "binary", f"{kf.idx}.png"))
        kf.update_binary_cc(False)
    groups, _ = build_unique_cc_groups(gt_kfs, local_window=3,
                                       min_recall=0.8, min_precision=0.8)
    with open(os.path.join(prefix, "unique_ccs.xml"), "w") as f:
        f.write(UniqueCCGroup.groups_to_xml(gt_kfs, groups))

    ours_prefix = os.path.join(our_outputs, "annotations", "ABDB_ab01")
    shutil.copytree(prefix, ours_prefix, dirs_exist_ok=True)
    return prefix


def reference_eval_metrics(config_path):
    """Run the reference SummaryEvaluator (oracle) over one output tree and
    return its per-lecture metrics dict."""
    oracle.ensure_oracle()
    from AccessMath.evaluation.summary_evaluator import SummaryEvaluator
    from AM_CommonTools.configuration.configuration import Configuration
    from AccessMath.data.meta_data_DB import MetaDataDB

    class FakeProcess:
        pass

    process = FakeProcess()
    process.configuration = Configuration.from_file(config_path)
    process.database = MetaDataDB.from_file(
        process.configuration.get_str("VIDEO_DATABASE_PATH"))
    process.current_lecture = process.database.get_lecture("ab01")
    process.params = {}

    evaluator = SummaryEvaluator()
    evaluator.process_summary(process, None)
    return evaluator.per_lecture_metrics


def test_reference_eval_identical_on_both_trees(workspace, gt_tree):
    """The reference's own evaluator scores both summary trees identically
    (the eval_multiple_summaries leg of the A/B)."""
    ref_metrics = reference_eval_metrics(workspace["ref_conf"])
    our_metrics = reference_eval_metrics(workspace["ours_conf"])
    assert ref_metrics.keys() == our_metrics.keys() and ref_metrics
    assert repr(sorted(ref_metrics.items())) == \
        repr(sorted(our_metrics.items()))


def test_our_eval_consumes_reference_tree(workspace, gt_tree):
    """Cross-consumption: OUR evaluator reads the REFERENCE pipeline's
    exported summary tree and scores it perfectly against the GT built from
    the same keyframes."""
    from lecturemath_tpu.core.config import Config
    from lecturemath_tpu.core.metadata import MetaDataDB
    from lecturemath_tpu.eval.summary_eval import SummaryEvaluator

    config = Config.from_file(workspace["ref_conf"])
    database = MetaDataDB.from_file(str(workspace["root"] / "db.xml"))
    metrics = SummaryEvaluator().evaluate_lecture(
        config, database, database.get_lecture("ab01"))
    entry = metrics["all"][0]
    assert entry["recall_metrics"]["recall"] > 0.99
    assert entry["precision_metrics"]["precision"] > 0.99


def test_method2_segmentation_ab(workspace, reference_outputs, our_outputs):
    """Composition A/B for segmentation method 2 (conflict minimization):
    re-run stage 04+05 of BOTH pipelines over the already-produced stage
    01-03 artifacts with VIDEO_SEGMENTATION_METHOD=2 and compare. Runs
    last in this module — it overwrites the summary trees."""
    import cv2

    method2_keys = {
        "VIDEO_SEGMENTATION_METHOD": 2,
        "VIDEO_SEGMENTATION_OUTPUT": "tempo_intervals_m2_",
        "VIDEO_SEGMENTATION_CONFLICTS_MIN_CONFLICTS": 1.0,
        "VIDEO_SEGMENTATION_CONFLICTS_MIN_SPLIT": 8,
        "VIDEO_SEGMENTATION_CONFLICTS_MIN_LENGTH": 5,
    }
    root = workspace["root"]
    for conf_name, out_name in (("ref.conf", "out_ref"),
                                ("ours.conf", "out_ours")):
        text = (root / conf_name).read_text()
        extra = "".join(f"{k} = {v}\n" for k, v in method2_keys.items())
        (root / f"m2_{conf_name}").write_text(text + extra)

    run_reference_script("pre_ST3D_v3.0_04_vid_segmentation.py",
                         str(root / "m2_ref.conf"))
    run_reference_script("pre_ST3D_v3.0_05_generate_summary.py",
                         str(root / "m2_ref.conf"))

    from lecturemath_tpu.cli.generate_summary import main as summary_main
    from lecturemath_tpu.cli.vid_segmentation import main as seg_main

    seg_main(["vid_segmentation", str(root / "m2_ours.conf")])
    summary_main(["generate_summary", str(root / "m2_ours.conf")])

    ref_iv = load_artifact(reference_outputs, "tempo_intervals_m2_")
    our_iv = load_artifact(our_outputs, "tempo_intervals_m2_")
    assert [tuple(i) for i in our_iv] == [tuple(i) for i in ref_iv]
    assert len(ref_iv) >= 1

    ref_dir = os.path.join(reference_outputs, "summaries", "ABDB_ab01",
                           "keyframes")
    our_dir = os.path.join(our_outputs, "summaries", "ABDB_ab01",
                           "keyframes")
    names = sorted(os.listdir(ref_dir))
    assert sorted(os.listdir(our_dir)) == names
    for name in names:
        np.testing.assert_array_equal(
            cv2.imread(os.path.join(our_dir, name)),
            cv2.imread(os.path.join(ref_dir, name)))


def test_method1_segmentation_ab(workspace, reference_outputs, our_outputs):
    """Composition A/B for segmentation method 1 (ink-sum regression tree):
    stage 04+05 of both pipelines over the shared stage 01-03 artifacts."""
    import cv2

    method1_keys = {
        "VIDEO_SEGMENTATION_METHOD": 1,
        "VIDEO_SEGMENTATION_OUTPUT": "tempo_intervals_m1_",
        "VIDEO_SEGMENTATION_SUM_MIN_SEGMENT": 5,
        "VIDEO_SEGMENTATION_SUM_MIN_ERASE_RATIO": 0.05,
    }
    root = workspace["root"]
    for conf_name in ("ref.conf", "ours.conf"):
        text = (root / conf_name).read_text()
        extra = "".join(f"{k} = {v}\n" for k, v in method1_keys.items())
        (root / f"m1_{conf_name}").write_text(text + extra)

    run_reference_script("pre_ST3D_v3.0_04_vid_segmentation.py",
                         str(root / "m1_ref.conf"))
    run_reference_script("pre_ST3D_v3.0_05_generate_summary.py",
                         str(root / "m1_ref.conf"))

    from lecturemath_tpu.cli.generate_summary import main as summary_main
    from lecturemath_tpu.cli.vid_segmentation import main as seg_main

    seg_main(["vid_segmentation", str(root / "m1_ours.conf")])
    summary_main(["generate_summary", str(root / "m1_ours.conf")])

    ref_iv = load_artifact(reference_outputs, "tempo_intervals_m1_")
    our_iv = load_artifact(our_outputs, "tempo_intervals_m1_")
    assert [tuple(i) for i in our_iv] == [tuple(i) for i in ref_iv]
    assert len(ref_iv) >= 1

    ref_dir = os.path.join(reference_outputs, "summaries", "ABDB_ab01",
                           "keyframes")
    our_dir = os.path.join(our_outputs, "summaries", "ABDB_ab01",
                           "keyframes")
    names = sorted(os.listdir(ref_dir))
    assert sorted(os.listdir(our_dir)) == names
    for name in names:
        np.testing.assert_array_equal(
            cv2.imread(os.path.join(our_dir, name)),
            cv2.imread(os.path.join(ref_dir, name)))
