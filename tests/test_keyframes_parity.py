"""Parity of keyframe extraction + export vs the reference KeyframeExtractor
(behavioral oracle), driven by the full tracked synthetic pipeline."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from lecturemath_tpu.data.space_time import SpaceTimeStruct
from lecturemath_tpu.pipeline.cc_tracking import CCTracker
from lecturemath_tpu.pipeline import segmentation as seg
from lecturemath_tpu.pipeline.keyframes import (extract_keyframes,
                                                close_interval_gaps,
                                                export_summary)
from lecturemath_tpu.utils.synthetic import synthetic_lecture

from oracle import (oracle_estimator, oracle_keyframe_extractor,
                    oracle_space_time_struct)


@pytest.fixture(scope="module")
def st3d_pair():
    frames, _, _ = synthetic_lecture(seed=3, n_frames=36, height=96, width=128,
                                     n_boards=3, glyphs_per_board=4,
                                     jitter=0.02)
    n_frames = len(frames)
    frame_times = [1000.0 * t for t in range(n_frames)]
    frame_indices = [30 * t for t in range(n_frames)]

    tracker = CCTracker(128, 96, 0.85, 0.85, 8)
    for frame in frames:
        tracker.add_frame(frame)
    tracker.split_stable_by_gaps(8, 3)
    stable = tracker.stable_cc_idxs(3)
    time_ov, _, all_ov = tracker.compute_overlapping_stable(stable, 5)
    groups, group_of = tracker.compute_groups(stable, time_ov, 0.5)
    ages, per_frame = tracker.compute_group_ages(groups)
    images, bounds = tracker.compute_group_images(groups, ages, 0.5)

    ours = SpaceTimeStruct(frame_times, frame_indices, 96, 128,
                           ages, images, bounds)
    ref = oracle_space_time_struct(frame_times, frame_indices, 96, 128,
                                   ages, images, bounds)
    segments = [(0, 11), (12, 23), (24, 35)]
    return ours, ref, segments


def test_keyframe_parity(st3d_pair):
    ours_st3d, ref_st3d, segments = st3d_pair
    kf_ext = oracle_keyframe_extractor()

    our_frames, our_times = extract_keyframes(ours_st3d, segments)
    ref_frames, ref_times = kf_ext.GenerateFromST3DForIntervals(ref_st3d,
                                                               segments,
                                                               verbose=False)
    assert len(our_frames) == len(ref_frames)
    for mine, theirs in zip(our_frames, ref_frames):
        np.testing.assert_array_equal(mine, theirs)
    assert our_times == ref_times


def test_interval_gap_closing(st3d_pair):
    ours_st3d, _, segments = st3d_pair
    idx_intervals, time_intervals, indices, times = \
        close_interval_gaps(ours_st3d, segments)
    # contiguous cover: each interval starts where the previous ended
    assert idx_intervals[0][0] == 0
    for (prev_s, prev_e), (cur_s, cur_e) in zip(idx_intervals, idx_intervals[1:]):
        assert cur_s == prev_e
    # last interval ends at the last segment's absolute frame index
    assert idx_intervals[-1][1] == ours_st3d.frame_indices[segments[-1][1]]
    assert indices == [ours_st3d.frame_indices[e] for _, e in segments]


def test_export_summary(st3d_pair, tmp_path):
    ours_st3d, _, segments = st3d_pair
    keyframes, kf_times = extract_keyframes(ours_st3d, segments)
    idx_iv, time_iv, indices, times = close_interval_gaps(ours_st3d, segments)

    out = str(tmp_path / "summary")
    xml_path = export_summary(out, "SyntheticDB", "lec01", ["lec01.mp4"],
                              idx_iv, time_iv, indices, times, keyframes,
                              kf_times)
    root = ET.parse(xml_path).getroot()
    assert root.findtext("Database") == "SyntheticDB"
    assert len(root.find("VideoSegments")) == len(segments)
    assert len(root.find("VideoKeyFrames")) == len(segments)
    for index in indices:
        assert os.path.exists(os.path.join(out, "keyframes", f"{index}.png"))
    assert os.path.exists(os.path.join(out, "gui_export.xml"))
