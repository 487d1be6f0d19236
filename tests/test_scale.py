"""Scale smoke: a longer synthetic lecture through tracking + grouping,
asserting correctness invariants and bounded runtime behavior.

The real-lecture regime (reference: ACCESS2021_release/README.md:16 — ~1 h
at 1 FPS, 3,000-5,500 frames, thousands of unique CCs at 1080p) is profiled
on-device by ``bench.py --long``; this suite tier keeps a 1,500-frame
streaming run (frames rendered on demand, never materialized) that guards
against superlinear per-frame cost regressions in the tracker hot path."""

import time

import numpy as np

from lecturemath_tpu.pipeline.cc_tracking import CCTracker
from lecturemath_tpu.utils.synthetic import (_plan_glyphs,
                                             render_binary_frame,
                                             synthetic_lecture)


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


def test_tracker_scale_1500_frames_streaming():
    """1,500 frames / 500 unique glyphs / 5 erase cycles at 960x540 (the
    post-model frame size of a 1080p lecture halved once): per-frame
    tracking cost must stay bounded AND flat — the last-third window may
    not exceed 3x the first-third (a superlinear active-set or unique-list
    scan would blow past that; measured headroom is ~1.3x at 3,600
    frames / 1,200 CCs, see PARITY.md scale table)."""
    n_frames, w, h = 1500, 960, 540
    rng = np.random.default_rng(11)
    glyphs, erase_times = _plan_glyphs(rng, n_frames, h, w,
                                       n_boards=5, glyphs_per_board=100,
                                       glyph_size=(20, 30))
    assert len(glyphs) == 500 and len(erase_times) == 4

    tracker = CCTracker(w, h, 0.925, 0.925, 85)
    windows = []
    start = time.perf_counter()
    for t in range(n_frames):
        tracker.add_frame(render_binary_frame(glyphs, t, h, w))
        if (t + 1) % 500 == 0:
            now = time.perf_counter()
            windows.append(now - start)
            start = now

    # every planned glyph tracked, bounded split inflation
    assert 500 <= len(tracker.unique_ccs) <= 600
    stable = tracker.stable_cc_idxs(3)
    assert len(stable) >= 500

    per_frame = sum(windows) / n_frames
    assert per_frame < 0.08, f"{per_frame * 1e3:.1f} ms/frame tracking"
    # flatness: bounded growth across the run (render cost is per-window
    # comparable since every era writes the same glyph count)
    assert windows[-1] < 3.0 * windows[0] + 0.5, \
        f"superlinear tracking: windows {[round(x, 2) for x in windows]}"

    # stage-03 grouping at 500+ stable CCs stays interactive
    start = time.perf_counter()
    tracker.split_stable_by_gaps(85, 3)
    stable = tracker.stable_cc_idxs(3)
    time_ov, _, all_ov = tracker.compute_overlapping_stable(stable, 5)
    groups, group_of = tracker.compute_groups(stable, time_ov, 0.5)
    ages, _ = tracker.compute_group_ages(groups)
    tracker.compute_conflicts(stable, all_ov, len(groups), group_of)
    tracker.compute_group_images(groups, ages, 0.5)
    group_elapsed = time.perf_counter() - start
    assert group_elapsed < 30.0, f"{group_elapsed:.2f}s grouping"
