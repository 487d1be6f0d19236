"""Script-level A/B of the BASELINE parity gate (VERDICT r3 item 3).

Runs the reference's OWN ``lecturenet_eval_keyframe_bin.py``
(/root/reference/ACCESS2021_release, :24-185) via the oracle on a GT
annotation tree + a shared checkpoint, runs OUR ``eval/keyframe_bin.py``
CLI on the same inputs, and asserts:

  * the printed metric tables — every minR/P row of the CC-level grid and
    every pixel-metric line — are string-identical, and
  * the binary keyframe PNGs both scripts save are bit-identical.

The checkpoint keeps a live random trunk but pins the heads to a saturated
luminance threshold (utils/synthetic.threshold_binarizer_variables), so the
two implementations' stage-01 outputs are deterministic and the A/B
isolates the SCRIPT protocol itself: LoadDatasetKeyframes ->
GenerateFakeKeyframeInfo -> compute_summary_metrics(window=1, dense minR/P
grid, globals only) -> compute_pixel_binary_metrics -> report. The GT
binaries deliberately differ from the model output (dilated / partially
erased per keyframe) so the grid rows land strictly between 0 and 100 and
exact/partial/unmatched classifications all occur.
"""

import importlib.util
import io
import os
import re
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

from lecturemath_tpu.models.convert import save_torch_checkpoint
from lecturemath_tpu.models.fcn_lecturenet import FCNConfig
from lecturemath_tpu.utils.synthetic import (synthetic_rgb_lecture,
                                             threshold_binarizer_variables)

import oracle

REFERENCE_DIR = "/root/reference/ACCESS2021_release"

DB_XML = """<AccessMath><DataBase><Name>KBAB</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Training><LectureTitle>kb01</LectureTitle></Training></Datasets>
<Lectures><Lecture><Id>kb01</Id><Title>kb01</Title><Parameters></Parameters>
<Videos><Main><Video><Path>kb01.mp4</Path></Video></Main></Videos>
</Lecture></Lectures></DataBase></AccessMath>
"""

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

NET_CONFIG = FCNConfig(
    in_channels=3, down_filters=(4, 6, 8, 10, 12), mid_filters=12,
    upsample_filters=(4, 6, 8, 10, 12), up_filters=(4, 4, 6, 8, 10),
    pixel_features=(6, 4), kernel_size=3, pixel_kernel_size=3)
# NET_KEYS up filters read bottom-up (UP_CONV_FILTERS_5 pairs with level 5)
NET_KEYS["FCN_BINARIZER_NET_UPSAMPLE_FILTERS_1"] = NET_CONFIG.upsample_filters[0]
NET_KEYS["FCN_BINARIZER_NET_UP_CONV_FILTERS_1"] = NET_CONFIG.up_filters[0]
for i in range(1, 6):
    NET_KEYS[f"FCN_BINARIZER_NET_UPSAMPLE_FILTERS_{i}"] = \
        NET_CONFIG.upsample_filters[i - 1]
    NET_KEYS[f"FCN_BINARIZER_NET_UP_CONV_FILTERS_{i}"] = \
        NET_CONFIG.up_filters[i - 1]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("kbab")
    (root / "db.xml").write_text(DB_XML)

    rgb, binary, _, _ = synthetic_rgb_lecture(seed=9, n_frames=3, height=64,
                                              width=96, glyphs_per_board=6,
                                              glyph_size=(12, 14))

    # GT binaries that DIFFER from the model's output in controlled ways so
    # the metric grid is non-degenerate:
    #   kf0: exact GT          -> exact matches
    #   kf1: dilated GT        -> partial overlaps that flip with minR
    #   kf2: left half erased  -> unmatched summary CCs (precision < 1, bg%)
    gts = [binary[0],
           cv2.dilate(binary[1], np.ones((3, 3), np.uint8)),
           binary[2].copy()]
    gts[2][:, :48] = 0

    prefix = root / "output" / "annotations" / "KBAB_kb01"
    for sub in ("keyframes", "binary", "portions"):
        (prefix / sub).mkdir(parents=True)

    xml_lines = ["<Annotations>", "  <Database>KBAB</Database>",
                 "  <Lecture>kb01</Lecture>", "  <Filename>x</Filename>",
                 "  <VideoFiles><VideoFile>kb01.mp4</VideoFile></VideoFiles>",
                 "  <VideoSegments></VideoSegments>", "  <VideoKeyFrames>"]
    portion_lines = ["<Annotations>", "    <KeyFrames>"]
    for k in range(3):
        idx = 100 * (k + 1)
        cv2.imwrite(str(prefix / "keyframes" / f"{idx}.png"),
                    rgb[k][:, :, ::-1])
        gt_bin = np.stack([255 - gts[k]] * 3, axis=-1)
        cv2.imwrite(str(prefix / "binary" / f"{idx}.png"), gt_bin)
        frame_dir = prefix / "portions" / f"frame_{idx}"
        frame_dir.mkdir()
        cv2.imwrite(str(frame_dir / "0.png"), gt_bin)
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

    variables = threshold_binarizer_variables(NET_CONFIG)
    model_path = str(root / "tiny_kb.dat")
    save_torch_checkpoint(variables, model_path)

    def write_conf(name, save_dir):
        lines = [f"VIDEO_DATABASE_PATH = {root}/db.xml",
                 f"OUTPUT_PATH = {root}/output",
                 "FCN_BINARIZER_USE_CUDA = 0",
                 "FCN_BINARIZER_SAVE_BINARY = 1",
                 f"FCN_BINARIZER_SAVE_BINARY_PATH = {save_dir}"]
        lines += [f"{key} = {value}" for key, value in NET_KEYS.items()]
        path = root / name
        path.write_text("\n".join(lines) + "\n")
        return str(path)

    return {"root": root, "model_path": model_path,
            "ref_conf": write_conf("ref.conf", str(root / "bin_ref")),
            "ours_conf": write_conf("ours.conf", str(root / "bin_ours"))}


def run_reference_eval_script(config_path, model_path):
    """Execute the reference's lecturenet_eval_keyframe_bin.py main()
    in-process (oracle env) and return its captured stdout."""
    oracle.ensure_oracle()
    oracle.stub_torchvision()
    if REFERENCE_DIR not in sys.path:
        # the script does `from lecturenet_train_02_train_binarizer import
        # FCN_LectureNet` — the root scripts live beside it
        sys.path.insert(0, REFERENCE_DIR)

    path = os.path.join(REFERENCE_DIR, "lecturenet_eval_keyframe_bin.py")
    spec = importlib.util.spec_from_file_location("ref_eval_kf_bin", path)
    module = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = ["lecturenet_eval_keyframe_bin.py", config_path, model_path,
                "0"]
    buf = io.StringIO()
    try:
        spec.loader.exec_module(module)
        with redirect_stdout(buf):
            module.main()
    finally:
        sys.argv = old_argv
    return buf.getvalue()


def run_our_eval_cli(config_path, model_path):
    from lecturemath_tpu.eval import keyframe_bin

    buf = io.StringIO()
    with redirect_stdout(buf):
        keyframe_bin.main(["eval_keyframe_bin", config_path, model_path, "0"])
    return buf.getvalue()


def extract_metric_table(text):
    """The report lines both scripts print: scope headers, the minR/P grid
    rows (10 tab-separated percentages), and the pixel-metric lines."""
    rows = []
    for line in text.splitlines():
        line = line.rstrip()
        if line.startswith("Metrics for scope:"):
            rows.append(line)
        elif re.match(r"^\d+\.\d\d\t\d+\.\d\d\t", line):
            rows.append(line)
        elif re.match(r"^[a-z_]+\t\d+\.\d\d$", line):
            rows.append(line)
    return rows


@pytest.fixture(scope="module")
def reports(workspace):
    ref_out = run_reference_eval_script(workspace["ref_conf"],
                                        workspace["model_path"])
    our_out = run_our_eval_cli(workspace["ours_conf"],
                               workspace["model_path"])
    return ref_out, our_out


def test_metric_tables_identical(reports):
    ref_rows = extract_metric_table(reports[0])
    our_rows = extract_metric_table(reports[1])
    assert ref_rows, "reference report produced no metric rows"
    assert our_rows == ref_rows

    # non-degenerate protocol: all scopes present ('all' + 4 size-percentile
    # ranges), the dense 9-row minR/P zip grid per scope, and the doctored
    # GT actually produced values strictly between 0 and 100
    scope_headers = [r for r in ref_rows if r.startswith("Metrics")]
    assert len(scope_headers) == 5
    grid_rows = [r for r in ref_rows if re.match(r"^\d", r)]
    assert len(grid_rows) == 5 * 9  # minR/P zip grid {50,55,...,95} x scopes
    values = [float(v) for row in grid_rows for v in row.split("\t")[2:]]
    assert any(0.0 < v < 100.0 for v in values)
    pixel_rows = [r for r in ref_rows if re.match(r"^[a-z_]", r)]
    assert len(pixel_rows) >= 5  # recall/precision/fmeasure + board variants


def test_saved_binaries_identical(reports, workspace):
    import cv2

    ref_dir = os.path.join(str(workspace["root"]), "bin_ref", "FCN", "kb01",
                           "binary")
    our_dir = os.path.join(str(workspace["root"]), "bin_ours", "FCN", "kb01",
                           "binary")
    names = sorted(os.listdir(ref_dir))
    assert sorted(os.listdir(our_dir)) == names and len(names) == 3
    for name in names:
        theirs = cv2.imread(os.path.join(ref_dir, name))
        ours = cv2.imread(os.path.join(our_dir, name))
        np.testing.assert_array_equal(ours, theirs)
        assert (theirs == 0).any() and (theirs == 255).any()
