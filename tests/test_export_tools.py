"""Video export interpolation, uniform-sample summaries, sequential
sampling, and visualization renderers."""

import os

import numpy as np
import pytest

from lecturemath_tpu.core.artifacts import ArtifactStore
from lecturemath_tpu.core.metadata import MetaDataDB, LectureInfo
from lecturemath_tpu.data.cc import extract_ccs
from lecturemath_tpu.pipeline.export_video import (interpolated_frames,
                                                   summary_from_uniform_sample)
from lecturemath_tpu.pipeline.video import compress_png, sample_frame_indices
from lecturemath_tpu.utils.synthetic import synthetic_lecture
from lecturemath_tpu.utils import visualizer


def test_interpolated_frames():
    frames = [np.full((4, 4), 0, np.uint8), np.full((4, 4), 100, np.uint8),
              np.full((4, 4), 200, np.uint8)]
    indices = [0, 10, 20]
    out = dict(interpolated_frames(frames, indices, 0, 25))

    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[10], frames[1])
    np.testing.assert_array_equal(out[20], frames[2])
    assert out[5][0, 0] == 50   # halfway between 0 and 100
    assert out[15][0, 0] == 150
    assert out[24][0, 0] == 200  # past the last sample: hold


def test_interp_skip_holds_frames():
    frames = [np.full((2, 2), 0, np.uint8), np.full((2, 2), 100, np.uint8)]
    out = dict(interpolated_frames(frames, [0, 10], 0, 10, interp_skip=4))
    # frames refresh every 5; in between they hold the last interpolation
    assert out[1][0, 0] == out[2][0, 0] == out[3][0, 0] == out[4][0, 0]
    assert out[5][0, 0] != out[4][0, 0]


def test_uniform_sample_summary(tmp_path):
    frames, _, _ = synthetic_lecture(seed=1, n_frames=12, height=48, width=64)
    store = ArtifactStore(str(tmp_path / "temporal"))
    times = [1000.0 * t for t in range(12)]
    indices = [30 * t for t in range(12)]
    store.save((times, indices, compress_png(list(frames))), "tempo_binary_",
               "lec01")

    database = MetaDataDB("TestDB")
    lecture = LectureInfo("lec01", "lec01",
                          main_videos=[{"path": "lec01.mp4"}])

    xml_path = summary_from_uniform_sample(store, "tempo_binary_", database,
                                           lecture, step=4,
                                           sample_name="unif",
                                           summaries_root=str(tmp_path / "sums"))
    assert os.path.exists(xml_path)
    keyframe_dir = os.path.join(os.path.dirname(xml_path), "keyframes")
    assert len(os.listdir(keyframe_dir)) == 3  # 12 frames / step 4


def test_sequential_sampler(tmp_path):
    import cv2

    frames, _, _ = synthetic_lecture(seed=2, n_frames=5, height=48, width=64)
    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                             (64, 48))
    for t in range(5):
        rgb = np.stack([frames[t]] * 3, axis=-1)
        for _ in range(10):
            writer.write(rgb)
    writer.release()

    samples = sample_frame_indices([path], [0, 15, 30, 45])
    assert [idx for idx, _ in samples] == [0, 15, 30, 45]
    assert samples[0][1].shape == (48, 64, 3)
    # frame 15 comes from synthetic frame 1 (MJPG is lossy; check majority)
    expected_fg = frames[1] > 0
    decoded_fg = samples[1][1][:, :, 0] > 128
    agreement = (expected_fg == decoded_fg).mean()
    assert agreement > 0.95


def test_visualizer_renderers(tmp_path):
    frames, _, _ = synthetic_lecture(seed=3, n_frames=4, height=48, width=64)
    overlay = visualizer.combine_binary_images(255 - frames[0], 255 - frames[1],
                                               2, 1, 0)
    assert overlay.shape == (48, 64, 3)
    assert overlay[:, :, 2].max() == 255

    ccs = extract_ccs(frames[0])
    match_img = visualizer.gt_match_image(48, 64, ccs[:1], ccs[1:2], ccs[2:])
    assert match_img[:, :, 1].max() == 255

    out = visualizer.signal_plot({"sum": np.arange(10.0)},
                                 str(tmp_path / "plot.png"),
                                 intervals=[(2, 5)], title="test")
    assert os.path.exists(out)


def test_extract_frames_at_times(tmp_path):
    import cv2

    from lecturemath_tpu.pipeline.video import (distribute_values,
                                                extract_frames_at_times)

    frames, _, _ = synthetic_lecture(seed=4, n_frames=4, height=48, width=64)
    path = str(tmp_path / "clip2.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                             (64, 48))
    for t in range(4):
        rgb = np.stack([frames[t]] * 3, axis=-1)
        for _ in range(30):
            writer.write(rgb)
    writer.release()

    out = extract_frames_at_times([path], [0.0, 1500.0, 3900.0])
    assert [t for t, _ in out] == [0.0, 1500.0, 3900.0]
    # 1500ms lands mid-second-2 -> synthetic frame 1
    agreement = ((out[1][1][:, :, 0] > 128) == (frames[1] > 0)).mean()
    assert agreement > 0.95

    assert distribute_values(5, 0, 100) == [0, 25, 50, 75, 100]
    assert distribute_values(1, 3, 9) == [3]


def test_export_binary_video(tmp_path):
    import cv2

    from lecturemath_tpu.pipeline.export_video import export_binary_video

    frames, _, _ = synthetic_lecture(seed=5, n_frames=4, height=48, width=64)
    store = ArtifactStore(str(tmp_path / "temporal"))
    times = [1000.0 * t for t in range(4)]
    indices = [10 * t for t in range(4)]
    store.save((times, indices, compress_png(list(frames))), "tempo_binary_",
               "lecv")

    lecture = LectureInfo("lecv", "lecv", main_videos=[{"path": "lecv.mp4"}])
    out_path = str(tmp_path / "out.mp4")
    export_binary_video(store, "tempo_binary_", lecture, [], out_path,
                        fps=10.0, workers=2, block_size=16,
                        tmp_dir=str(tmp_path / "frames"))
    assert os.path.exists(out_path)
    capture = cv2.VideoCapture(out_path)
    assert int(capture.get(cv2.CAP_PROP_FRAME_COUNT)) == 31  # last idx 30 + 1
    capture.release()


def test_export_video_cli(tmp_path):
    """cli.export_video drives export_binary_video from a config workspace
    (reads BINARIZATION_OUTPUT, writes the interpolated video)."""
    import cv2

    from lecturemath_tpu.cli import export_video as cli_mod

    db = """<AccessMath><DataBase><Name>EVDB</Name>
<OutputPaths><Temporal>temporal</Temporal><Images>images</Images>
<Videos>videos</Videos><Annotations>annotations</Annotations>
<Summaries>summaries</Summaries></OutputPaths>
<Datasets><Testing><LectureTitle>lev01</LectureTitle></Testing></Datasets>
<Lectures><Lecture><Id>lev01</Id><Title>lev01</Title><Parameters>
</Parameters><Videos><Main><Video><Path>lev01.mp4</Path></Video></Main>
</Videos></Lecture></Lectures></DataBase></AccessMath>"""
    (tmp_path / "db.xml").write_text(db)
    (tmp_path / "ev.conf").write_text(
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml\n"
        f"OUTPUT_PATH = {tmp_path}/output\n"
        "BINARIZATION_OUTPUT = tempo_binary_\n")

    frames, _, _ = synthetic_lecture(seed=3, n_frames=4, height=48, width=64)
    store = ArtifactStore(str(tmp_path / "output" / "temporal"))
    store.save(([1000.0 * t for t in range(4)],
                [10 * t for t in range(4)],
                compress_png(list(frames))), "tempo_binary_", "lev01")

    out_path = str(tmp_path / "binary.mp4")
    cli_mod.main(["prog", str(tmp_path / "ev.conf"),
                  "-l", "lev01", "-o", out_path, "-fps", "10"])
    assert os.path.exists(out_path)
    capture = cv2.VideoCapture(out_path)
    assert int(capture.get(cv2.CAP_PROP_FRAME_COUNT)) == 31
    capture.release()

    # missing artifact names the fix
    (tmp_path / "ev2.conf").write_text(
        f"VIDEO_DATABASE_PATH = {tmp_path}/db.xml\n"
        f"OUTPUT_PATH = {tmp_path}/empty_output\n"
        "BINARIZATION_OUTPUT = tempo_binary_\n")
    with pytest.raises(FileNotFoundError, match="cli.binarize"):
        cli_mod.main(["prog", str(tmp_path / "ev2.conf"), "-l", "lev01"])


def test_image_list_source_reference_index(tmp_path):
    import json

    import cv2

    from lecturemath_tpu.pipeline.video import ImageListSource

    frames, _, _ = synthetic_lecture(seed=6, n_frames=3, height=48, width=64)
    index = {"0": {"video_time": 0.0, "frame_idx": 0, "abs_time": 0.0,
                   "video_idx": 0}}
    for k, fid in enumerate((30, 60, 90)):
        cv2.imwrite(str(tmp_path / f"{fid}.png"),
                    np.stack([frames[k]] * 3, axis=-1))
        index[str(fid)] = {"video_time": fid / 30.0, "frame_idx": fid,
                           "abs_time": fid / 30.0 * 1000.0, "video_idx": 0}
    (tmp_path / "index.json").write_text(json.dumps(index))

    source = ImageListSource(str(tmp_path))
    out = list(source.frames())
    assert [(t, i) for t, i, _ in out] == [(1000.0, 30), (2000.0, 60),
                                           (3000.0, 90)]
    np.testing.assert_array_equal(out[0][2][:, :, 0], frames[0])


def test_artifact_store_latin1_legacy_pickle(tmp_path):
    """py2-era reference .dat artifacts pickle byte strings that need the
    latin1 fallback (reference: misc_helper.py:172-182 retries dump_load
    with encoding='latin1'); plain pickle.load raises UnicodeDecodeError."""
    store = ArtifactStore(str(tmp_path / "temporal"))
    os.makedirs(store.temporal_dir, exist_ok=True)
    # protocol-0 pickle of the py2 str '\xe9' — exactly what a py2
    # pickle.dump of a non-ascii byte string produces
    with open(store.path("tempo_legacy_", "lecture_01"), "wb") as f:
        f.write(b"S'\\xe9'\np0\n.")
    assert store.load("tempo_legacy_", "lecture_01") == "\xe9"


def test_artifact_store_corrupt_file_names_path_and_fix(tmp_path):
    """A truncated .dat must raise an error naming the file and the
    re-run fix, not a bare UnpicklingError."""
    import pytest

    store = ArtifactStore(str(tmp_path / "temporal"))
    path = store.save({"ok": True}, "tempo_binary_", "lec1")
    with open(path, "r+b") as f:   # truncate mid-pickle
        f.truncate(3)
    with pytest.raises(RuntimeError, match="tempo_binary_lec1.dat.*re-run"):
        store.load("tempo_binary_", "lec1")


def test_artifact_store_save_leaves_no_temp_droppings(tmp_path):
    import os

    store = ArtifactStore(str(tmp_path / "temporal"))
    store.save([1, 2, 3], "tempo_binary_", "lec2")
    names = os.listdir(str(tmp_path / "temporal"))
    assert names == ["tempo_binary_lec2.dat"]
    assert store.load("tempo_binary_", "lec2") == [1, 2, 3]


def test_artifact_store_corrupt_legacy_pickle_names_path(tmp_path):
    """A truncated LEGACY (latin1-retry) artifact also gets the
    actionable error, not a bare EOFError from the retry path."""
    import pytest

    store = ArtifactStore(str(tmp_path / "temporal"))
    path = store.path("tempo_binary_", "old")
    import os

    os.makedirs(str(tmp_path / "temporal"), exist_ok=True)
    # protocol-0 pickle of a byte string, truncated: first parse raises
    # UnicodeDecodeError-like paths or UnpicklingError; either way the
    # wrapper must fire
    with open(path, "wb") as f:
        f.write(b"(dp0\nS'\xe9\xe9")
    with pytest.raises(RuntimeError, match="tempo_binary_old.dat"):
        store.load("tempo_binary_", "old")
