"""Real-codec ingest matrix (VERDICT r4 item 6).

The synthetic A/B suites exercise MJPG/AVI only; real AccessMath lectures
arrive as whatever the capture rig produced (reference ingests via plain
cv2.VideoCapture, video_processor.py:100-146, so any FFmpeg-decodable
container works there). This matrix proves VideoFrameSource over every
codec this rig's OpenCV/FFmpeg can ENCODE, plus the ingest edge cases the
reference's decode loop tolerates implicitly:

* codec matrix — MJPG/AVI, MPEG-4 part 2 in .mp4 and .avi (mp4v/XVID),
  FFV1 and PNG in AVI (lossless: bit-exact decode asserted)
* H.264: this rig has NO working H.264 encoder (FFmpeg here only offers
  h264_v4l2m2m, which needs a /dev/video* device; no libx264/openh264) —
  the negative is asserted programmatically below so a future image with
  an encoder flips the test into coverage automatically
* multi-file lectures with DIFFERENT fps per file — absolute index/time
  accounting across the boundary
* a header that OVER-REPORTS the frame count (truncated recording:
  CAP_PROP_FRAME_COUNT keeps the original header value — measured on this
  rig's FFmpeg) — both seek and grab strategies must emit only real frames
  and keep the next file's absolute offsets consistent (the decode-count
  correction the annotation editor does for scrubbing,
  utils/annotation_editor.py, proven here for the pipeline source too)
"""

import os

import cv2
import numpy as np
import pytest

from lecturemath_tpu.pipeline.video import VideoFrameSource

SIZE = (96, 64)  # (width, height)


def write_clip(path, levels, fps=30.0, fourcc="MJPG", reps=None):
    """One uniform-gray frame per entry of ``levels``, repeated ``reps``
    times each (uniform frames survive lossy codecs within a few counts,
    so decoded frames are identifiable by mean level)."""
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), fps,
                             SIZE)
    assert writer.isOpened(), f"encoder unavailable for {fourcc}/{path}"
    for level in levels:
        frame = np.full((SIZE[1], SIZE[0], 3), level, np.uint8)
        for _ in range(reps or 1):
            writer.write(frame)
    writer.release()
    return path


def nearest_level(frame, levels):
    return min(levels, key=lambda lv: abs(float(frame.mean()) - lv))


CODECS = [("MJPG", ".avi", False), ("mp4v", ".mp4", False),
          ("XVID", ".avi", False), ("FFV1", ".avi", True),
          ("png ", ".avi", True)]


@pytest.mark.parametrize("fourcc,ext,lossless",
                         CODECS, ids=[c[0].strip() for c in CODECS])
def test_codec_matrix(tmp_path, fourcc, ext, lossless):
    """Sampling at 1 fps from a 30 fps clip yields the first frame of each
    second with correct indices/times under every encodable codec; the
    lossless codecs round-trip bit-exactly."""
    levels = [40, 90, 140, 190]
    path = write_clip(str(tmp_path / f"clip{ext}"), levels, fps=30.0,
                      fourcc=fourcc, reps=30)
    source = VideoFrameSource([path], sampling_fps=1.0)
    sampled = list(source.frames())
    assert len(sampled) == len(levels)
    assert [i for _, i, _ in sampled] == [0, 30, 60, 90]
    for (t_ms, idx, frame), expect in zip(sampled, levels):
        assert abs(t_ms - (idx / 30.0) * 1000.0) < 1e-6
        if lossless:
            np.testing.assert_array_equal(
                frame, np.full(frame.shape, expect, np.uint8))
        else:
            assert nearest_level(frame, levels) == expect


def test_h264_encoder_negative():
    """Documented rig negative: no H.264 encoder (decode-only coverage is
    impossible to test without one). If a future environment gains
    libx264/openh264, this starts failing — promote the codec into CODECS
    then."""
    writer = cv2.VideoWriter("/tmp/lm_h264_probe.mp4",
                             cv2.VideoWriter_fourcc(*"avc1"), 30.0, SIZE)
    opened = writer.isOpened()
    writer.release()
    if os.path.exists("/tmp/lm_h264_probe.mp4"):
        os.remove("/tmp/lm_h264_probe.mp4")
    assert not opened, ("H.264 encoding now available — add it to the "
                        "codec matrix above")


def test_multifile_variable_fps(tmp_path):
    """Two files at DIFFERENT native fps: sampling steps adapt per file
    (step = round(fps / sampling_fps)) and absolute indices/times continue
    across the boundary from the first file's true length."""
    a_levels, b_levels = [40, 90, 140], [190, 230]
    path_a = write_clip(str(tmp_path / "a.avi"), a_levels, fps=30.0,
                        reps=30)                      # 90 frames / 3 s
    path_b = write_clip(str(tmp_path / "b.avi"), b_levels, fps=24.0,
                        reps=24)                      # 48 frames / 2 s
    source = VideoFrameSource([path_a, path_b], sampling_fps=1.0)
    sampled = list(source.frames())
    assert [i for _, i, _ in sampled] == [0, 30, 60, 90, 114]
    times = [t for t, _, _ in sampled]
    np.testing.assert_allclose(times, [0.0, 1000.0, 2000.0, 3000.0,
                                       4000.0], atol=1e-6)
    got = [nearest_level(f, a_levels + b_levels) for _, _, f in sampled]
    assert got == a_levels + b_levels


def truncated_clip(tmp_path, levels, keep_frames):
    """An MJPG clip whose container claims len(levels)*30 frames but whose
    data ends after ``keep_frames`` (byte-truncated file — the header's
    frame count survives; measured: CAP_PROP_FRAME_COUNT keeps the
    original value while reads fail at the true end)."""
    full = write_clip(str(tmp_path / "full.avi"), levels, fps=30.0,
                      reps=30)
    header_frames = len(levels) * 30
    # find a byte cut that leaves exactly keep_frames decodable
    size = os.path.getsize(full)
    data = open(full, "rb").read()
    lo, hi = 0, size
    path = str(tmp_path / "trunc.avi")
    for _ in range(40):  # bisect on decodable-frame count
        mid = (lo + hi) // 2
        with open(path, "wb") as f:
            f.write(data[:mid])
        cap = cv2.VideoCapture(path)
        n = 0
        while cap.grab():
            n += 1
        cap.release()
        if n < keep_frames:
            lo = mid + 1
        else:
            hi = mid
    with open(path, "wb") as f:
        f.write(data[:hi])
    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == header_frames
    n = 0
    while cap.grab():
        n += 1
    cap.release()
    assert n == keep_frames
    return path


@pytest.mark.parametrize("strategy", ["grab", "seek"])
def test_overreported_header(tmp_path, strategy):
    """A truncated file (header claims 120 frames, 75 decodable) followed
    by a good file: only real frames are emitted and the second file's
    absolute indices/times start from the TRUE decoded count, not the
    header's claim — under both seek and grab strategies."""
    a_levels, b_levels = [40, 90, 140, 190], [230]
    trunc = truncated_clip(tmp_path, a_levels, keep_frames=75)
    path_b = write_clip(str(tmp_path / "b.avi"), b_levels, fps=30.0,
                        reps=30)
    source = VideoFrameSource([trunc, path_b], sampling_fps=1.0,
                              seek_strategy=strategy)
    sampled = list(source.frames())
    # truncated file: samples at 0/30/60 survive (90 is past the real end);
    # second file starts at absolute index 75 (true length), NOT 120
    assert [i for _, i, _ in sampled] == [0, 30, 60, 75]
    np.testing.assert_allclose(
        [t for t, _, _ in sampled],
        [0.0, 1000.0, 2000.0, 2500.0], atol=1e-6)
    got = [nearest_level(f, a_levels + b_levels) for _, _, f in sampled]
    assert got == [40, 90, 140, 230]
