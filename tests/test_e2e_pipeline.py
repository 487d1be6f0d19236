"""End-to-end pipeline integration: synthetic lecture -> stage 02 -> 03 ->
04 -> 05 -> exported summary, checked against the synthetic ground truth."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from lecturemath_tpu.core.config import Config
from lecturemath_tpu.core.metadata import MetaDataDB
from lecturemath_tpu.pipeline.driver import PipelineDriver
from lecturemath_tpu.pipeline.stages import (stage02_cc_analysis,
                                             stage03_cc_grouping,
                                             stage04_segmentation,
                                             stage04_input_keys,
                                             stage05_summary)
from lecturemath_tpu.pipeline.video import (ArraySource, VideoFrameSource,
                                            compress_png, decompress_png)
from lecturemath_tpu.utils.synthetic import synthetic_lecture

DB_XML = """<AccessMath>
  <DataBase>
    <Name>SynthDB</Name>
    <OutputPaths>
      <Temporal>temporal</Temporal>
      <Images>images</Images>
      <Videos>videos</Videos>
      <Annotations>annotations</Annotations>
      <Summaries>summaries</Summaries>
    </OutputPaths>
    <Datasets>
      <Training><LectureTitle>synth01</LectureTitle></Training>
    </Datasets>
    <Lectures>
      <Lecture>
        <Id>synth01</Id>
        <Title>synth01</Title>
        <Parameters></Parameters>
        <Videos><Main><Video><Path>synth01.avi</Path></Video></Main></Videos>
      </Lecture>
    </Lectures>
  </DataBase>
</AccessMath>
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    (root / "db.xml").write_text(DB_XML)
    conf_lines = [
        f"VIDEO_DATABASE_PATH = {root}/db.xml",
        f"VIDEO_FILES_PATH = {root}/videos",
        f"OUTPUT_PATH = {root}/output",
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
        "SAMPLING_FPS = 1.0",
    ]
    (root / "test.conf").write_text("\n".join(conf_lines))
    return root


@pytest.fixture(scope="module")
def synthetic(workspace):
    frames, glyphs, erase_times = synthetic_lecture(
        seed=11, n_frames=40, height=96, width=128, n_boards=2,
        glyphs_per_board=5, jitter=0.0)
    return frames, glyphs, erase_times


def make_driver(workspace, input_keys, output_keys, argv=()):
    return PipelineDriver.from_config_path(str(workspace / "test.conf"),
                                           list(argv), input_keys, output_keys)


def test_stage01_artifact_from_synthetic_binary(workspace, synthetic):
    """Emulate the stage-01 artifact (ink=255 binary, PNG-compressed) from
    the synthetic binary frames and store it with the driver's store."""
    frames, _, _ = synthetic
    driver = make_driver(workspace, None, "BINARIZATION_OUTPUT")
    times = [1000.0 * t for t in range(len(frames))]
    indices = [30 * t for t in range(len(frames))]
    lecture = driver.database.lectures[0]
    driver.save_outputs(lecture, (times, indices, compress_png(list(frames))))
    assert driver.store.exists("tempo_binary_", "synth01")

    # round trip through PNG must be lossless
    reloaded = driver.store.load("tempo_binary_", "synth01")
    np.testing.assert_array_equal(decompress_png(reloaded[2])[0], frames[0])


def test_stage02(workspace, synthetic):
    driver = make_driver(workspace, "BINARIZATION_OUTPUT", "CC_STABILITY_OUTPUT")
    driver.run(stage02_cc_analysis)

    _, _, tracker = driver.store.load("tempo_stability_", "synth01")
    frames, glyphs, _ = synthetic
    # every glyph is a stable unique CC; no jitter means exact re-sighting
    assert len(tracker.unique_ccs) == len(glyphs)


def test_stage03(workspace, synthetic):
    driver = make_driver(
        workspace, "CC_STABILITY_OUTPUT",
        ["CC_RECONSTRUCTED_OUTPUT", "CC_CONFLICTS_OUTPUT", "CC_ST3D_OUTPUT"])
    driver.run(stage03_cc_grouping)

    st3d = driver.store.load("tempo_cc_ST3D_", "synth01")
    frames, glyphs, _ = synthetic
    assert len(st3d.group_ages) > 0
    assert st3d.height == 96 and st3d.width == 128


def test_stage04(workspace, synthetic):
    config = Config.from_file(str(workspace / "test.conf"))
    driver = make_driver(workspace, stage04_input_keys(config),
                         "VIDEO_SEGMENTATION_OUTPUT")
    driver.run(stage04_segmentation)

    intervals = driver.store.load("tempo_intervals_", "synth01")
    frames, glyphs, erase_times = synthetic
    # the board erase at frame 20 must split the video in two
    assert len(intervals) == 2
    split_point = intervals[0][1]
    assert abs(split_point - erase_times[0]) <= 3


def test_stage05(workspace, synthetic):
    driver = make_driver(workspace,
                         ["CC_ST3D_OUTPUT", "VIDEO_SEGMENTATION_OUTPUT"],
                         "SUMMARY_KEYFRAMES_OUTPUT")
    driver.run(stage05_summary)

    frames, glyphs, _ = synthetic
    (indices, times, keyframes), = \
        driver.store.load("tempo_segments_", "synth01")
    assert len(keyframes) == 2

    # each keyframe must contain exactly its board's content:
    # compare against the last synthetic frame of each era (ink black on white)
    for keyframe, last_frame_idx in zip(keyframes, (19, 39)):
        expected = 255 - frames[last_frame_idx]
        np.testing.assert_array_equal(keyframe[:, :, 0], expected)

    # exported summary exists and parses
    summary_dir = os.path.join(str(driver.summaries_dir), "SynthDB_synth01")
    root = ET.parse(os.path.join(summary_dir, "segments.xml")).getroot()
    assert len(root.find("VideoKeyFrames")) == 2


def test_video_frame_source_sampling(tmp_path, synthetic):
    """Write a real 30fps clip and check 1-FPS sampling + accounting."""
    import cv2

    frames, _, _ = synthetic
    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                             (128, 96))
    rgb = np.stack([frames[0]] * 3, axis=-1)
    for _ in range(90):  # 3 seconds
        writer.write(rgb)
    writer.release()

    source = VideoFrameSource([path], sampling_fps=1.0)
    sampled = list(source.frames())
    assert len(sampled) == 3
    times = [t for t, _, _ in sampled]
    indices = [i for _, i, _ in sampled]
    assert indices == [0, 30, 60]
    assert times == [0.0, 1000.0, 2000.0]
    assert sampled[0][2].shape == (96, 128, 3)

    batches = list(source.batches(batch_size=2))
    assert batches[0].frames.shape == (2, 96, 128, 3)
    assert batches[1].valid == 1
    assert batches[1].frames.shape == (2, 96, 128, 3)  # padded


def test_stage02_device_labeling(workspace, synthetic):
    """Device CC labeling yields the identical tracker state."""
    driver = make_driver(workspace, "BINARIZATION_OUTPUT", None)
    driver.config.set("CC_ANALYSIS_DEVICE_LABELING", 1)
    lecture = driver.database.lectures[0]
    inputs = driver.load_inputs(lecture)

    _, _, device_tracker = stage02_cc_analysis(driver, lecture, inputs)
    driver.config.set("CC_ANALYSIS_DEVICE_LABELING", 0)
    _, _, host_tracker = stage02_cc_analysis(driver, lecture, inputs)

    assert len(device_tracker.unique_ccs) == len(host_tracker.unique_ccs)
    assert device_tracker.unique_cc_frames == host_tracker.unique_cc_frames
    for a, b in zip(device_tracker.unique_ccs, host_tracker.unique_ccs):
        assert (a.min_x, a.max_x, a.min_y, a.max_y, a.size) == \
            (b.min_x, b.max_x, b.min_y, b.max_y, b.size)
        np.testing.assert_array_equal(a.img, b.img)


def test_express_matches_staged(workspace, synthetic):
    """The single-pass express runner reproduces the staged results."""
    import jax

    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet,
                                                       init_variables)
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.pipeline.express import run_lecture
    from lecturemath_tpu.pipeline.video import ArraySource

    frames, _, _ = synthetic

    class CleanBinarizer(Binarizer):
        """Bypass the model: feed the synthetic binaries directly so express
        and staged runs share identical stage-01 output."""

        def __init__(self):
            pass

        def stream_source(self, source, frames_limit=0, invert=True):
            # two batches so express' incremental consumption is exercised
            times = [1000.0 * t for t in range(len(frames))]
            indices = [30 * t for t in range(len(frames))]
            half = len(frames) // 2
            yield times[:half], indices[:half], [f.copy() for f in frames[:half]]
            yield times[half:], indices[half:], [f.copy() for f in frames[half:]]

    driver = make_driver(workspace, None, None)
    lecture = driver.database.lectures[0]
    indices, times, keyframes = run_lecture(driver, lecture, CleanBinarizer(),
                                            export=False)

    # staged results were produced by test_stage05 over the same frames
    (staged_indices, staged_times, staged_keyframes), = \
        driver.store.load("tempo_segments_", "synth01")
    assert indices == staged_indices
    assert times == staged_times
    assert len(keyframes) == len(staged_keyframes)
    for mine, theirs in zip(keyframes, staged_keyframes):
        np.testing.assert_array_equal(mine, theirs)


def test_reference_sampling_alignment(tmp_path, synthetic):
    """'reference' alignment reproduces the reference VideoProcessor's
    accounting: content = last frame of each period, index = POS_FRAMES
    (one past content), time = POS_MSEC (the content frame), first sample
    dropped (video_processor.py:40,97,124-171)."""
    import cv2

    frames, _, _ = synthetic
    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                             (128, 96))
    for content_second in range(4):
        rgb = np.stack([frames[content_second]] * 3, axis=-1)
        for _ in range(30):
            writer.write(rgb)
    writer.release()

    source = VideoFrameSource([path], sampling_fps=1.0,
                              alignment="reference")
    sampled = list(source.frames())
    assert [i for _, i, _ in sampled] == [60, 90, 120]
    times = [t for t, _, _ in sampled]
    np.testing.assert_allclose(
        times, [59 / 30 * 1000, 89 / 30 * 1000, 119 / 30 * 1000])
    # content of sample k is the LAST frame of content second k+1 (MJPG is
    # lossy, so just bound the pixel error; exact content parity against
    # the real reference VideoProcessor is locked by test_full_system_ab)
    for (_, _, frame), content_second in zip(sampled, (1, 2, 3)):
        err = np.abs(frame[:, :, 0].astype(int)
                     - frames[content_second].astype(int)).mean()
        assert err < 8.0, err

    # default 'start' alignment keeps frame 0 and self-consistent indices
    start = list(VideoFrameSource([path], sampling_fps=1.0).frames())
    assert [i for _, i, _ in start] == [0, 30, 60, 90]


def test_express_method2_area_weights_match_staged(workspace):
    """Express method-2 segmentation with union/intersection area weighting
    must apply the same fractional-area normalization the staged CLI and
    the reference do (pre_ST3D_v3.0_04:139-147). Regression: express used
    to feed RAW pixel areas into segments_from_conflicts, splitting very
    differently from the staged run over the same artifacts."""
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.pipeline.express import run_lecture
    from lecturemath_tpu.pipeline.keyframes import (close_interval_gaps,
                                                    extract_keyframes)
    from lecturemath_tpu.pipeline.stages import stage04_segmentation

    h, w = 96, 128
    early = np.zeros((h, w), np.uint8)
    early[20:60, 20:80] = 255  # big block, frames 0-11
    late = np.zeros((h, w), np.uint8)
    late[30:70, 40:100] = 255  # overlapping block, frames 26-39
    empty = np.zeros((h, w), np.uint8)
    frames = [early] * 12 + [empty] * 14 + [late] * 14

    class CleanBinarizer(Binarizer):
        def __init__(self):
            pass

        def stream_source(self, source, frames_limit=0, invert=True):
            times = [1000.0 * t for t in range(len(frames))]
            indices = [30 * t for t in range(len(frames))]
            yield times, indices, [f.copy() for f in frames]

    driver = make_driver(workspace, None, None)
    # overlapping-but-never-coexisting blocks land in different groups
    # (temporal window 5 < the 14-frame gap) and conflict spatially
    settings = {
        "VIDEO_SEGMENTATION_METHOD": 2,
        "VIDEO_SEGMENTATION_CONFLICTS_WEIGHTS": 3,  # union areas
        "VIDEO_SEGMENTATION_CONFLICTS_MIN_SPLIT": 5,
        "VIDEO_SEGMENTATION_CONFLICTS_MIN_LENGTH": 4,
        "BINARIZATION_OUTPUT": "m2_binary_",
        "CC_RECONSTRUCTED_OUTPUT": "m2_reconstructed_",
        "CC_CONFLICTS_OUTPUT": "m2_conflicts_",
        "CC_ST3D_OUTPUT": "m2_st3d_",
    }
    for key, value in settings.items():
        driver.config.set(key, value)
    lecture = driver.database.lectures[0]

    express_indices, express_times, express_keyframes = run_lecture(
        driver, lecture, CleanBinarizer(), save_artifacts=True, export=False)

    # preconditions: a conflict exists (otherwise the weighting is vacuous)
    # and the SAVED artifact holds raw pixel areas (the staged loader and
    # the reference normalize after load; double-normalizing would diverge)
    _, conflicts = driver.store.load("m2_conflicts_", "synth01")
    flat = [conflicts[g][o] for g in conflicts for o in conflicts[g]]
    assert flat, "no conflicts generated - the weighting path is untested"
    assert all(c["area_union"] > 1.0 for c in flat)

    staged = make_driver(workspace, None, None)
    for key, value in settings.items():
        staged.config.set(key, value)
    inputs = [staged.store.load(settings["CC_RECONSTRUCTED_OUTPUT"], "synth01"),
              staged.store.load(settings["CC_CONFLICTS_OUTPUT"], "synth01")]
    staged_intervals = stage04_segmentation(staged, lecture, inputs)

    st3d = staged.store.load(settings["CC_ST3D_OUTPUT"], "synth01")
    staged_keyframes, _ = extract_keyframes(st3d, staged_intervals)
    _, _, staged_indices, staged_times = \
        close_interval_gaps(st3d, staged_intervals)

    assert express_indices == staged_indices
    assert express_times == staged_times
    assert len(express_keyframes) == len(staged_keyframes)
    for mine, theirs in zip(express_keyframes, staged_keyframes):
        np.testing.assert_array_equal(mine, theirs)

def test_bare_cli_flags_rejected(workspace):
    """A bare -l/-d (value forgotten) parses as boolean True; it must be a
    usage error, not an AttributeError deep in iter_lectures."""
    driver = make_driver(workspace, None, None, argv=["-l"])
    with pytest.raises(ValueError, match="-l requires"):
        list(driver.iter_lectures())
    driver = make_driver(workspace, None, None, argv=["-d"])
    with pytest.raises(ValueError, match="-d requires"):
        list(driver.iter_lectures())
    for flag in ("-i", "-o"):
        with pytest.raises(ValueError, match=f"{flag} requires"):
            make_driver(workspace, None, None, argv=[flag])


def test_stage04_input_keys_default_matches_stage_body():
    """With VIDEO_SEGMENTATION_METHOD absent both the input list and the
    stage body must agree on method 3 (the reference defaults them to 2 vs
    3 and crashes on inputs[2]; PARITY.md quirks)."""
    from lecturemath_tpu.pipeline.stages import stage04_input_keys

    assert stage04_input_keys(Config()) == \
        ["CC_RECONSTRUCTED_OUTPUT", "CC_CONFLICTS_OUTPUT", "CC_ST3D_OUTPUT"]


def test_express_zero_frames_is_clear_error(workspace):
    """A lecture whose source decodes no frames must raise a named error,
    not an AttributeError on a never-built tracker."""
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.pipeline.express import run_lecture

    class EmptyBinarizer(Binarizer):
        def __init__(self):
            pass

        def stream_source(self, source, frames_limit=0, invert=True):
            return iter(())

    driver = make_driver(workspace, None, None)
    lecture = driver.database.lectures[0]
    with pytest.raises(ValueError, match="no frames decoded"):
        run_lecture(driver, lecture, EmptyBinarizer(), export=False)
