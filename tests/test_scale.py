"""Scale smoke: a longer synthetic lecture through tracking + grouping,
asserting correctness invariants and bounded runtime behavior."""

import time

import numpy as np

from lecturemath_tpu.pipeline.cc_tracking import CCTracker
from lecturemath_tpu.utils.synthetic import synthetic_lecture


def test_tracker_scale_300_frames():
    frames, glyphs, erase_times = synthetic_lecture(
        seed=9, n_frames=300, height=270, width=480, n_boards=5,
        glyphs_per_board=20, jitter=0.01, glyph_size=(18, 24))

    tracker = CCTracker(480, 270, 0.85, 0.85, 40)
    start = time.perf_counter()
    for frame in frames:
        tracker.add_frame(frame)
    track_elapsed = time.perf_counter() - start

    tracker.split_stable_by_gaps(40, 3)
    stable = tracker.stable_cc_idxs(3)
    start = time.perf_counter()
    time_ov, _, all_ov = tracker.compute_overlapping_stable(stable, 5)
    groups, group_of = tracker.compute_groups(stable, time_ov, 0.5)
    ages, per_frame = tracker.compute_group_ages(groups)
    group_elapsed = time.perf_counter() - start

    # every written glyph must be tracked (with 1% jitter the matcher may
    # split a glyph occasionally; bound the inflation)
    n_glyphs = len(glyphs)
    assert n_glyphs <= len(stable) <= n_glyphs * 1.5
    assert len(groups) >= 5  # at least the per-board content groups

    # tracking must stay fast enough to never bottleneck the device stage
    # (generous bound for the 1-core CI host)
    assert track_elapsed / len(frames) < 0.1, f"{track_elapsed:.2f}s tracking"
    assert group_elapsed < 20.0, f"{group_elapsed:.2f}s grouping"
