"""Parity of our CC tracker + grouping vs the reference CCStabilityEstimator
running from /root/reference (behavioral oracle, see oracle.py)."""

import numpy as np
import pytest

from lecturemath_tpu.pipeline.cc_tracking import CCTracker
from lecturemath_tpu.utils.synthetic import synthetic_lecture

from oracle import oracle_estimator

MIN_RECALL = 0.85
MIN_PRECISION = 0.85
MAX_GAP = 8
MIN_TIMES = 3


@pytest.fixture(scope="module", params=[0, 7])
def tracked(request):
    seed = request.param
    frames, glyphs, erase_times = synthetic_lecture(
        seed=seed, n_frames=36, height=96, width=128, n_boards=2,
        glyphs_per_board=5, jitter=0.02)

    ours = CCTracker(128, 96, MIN_RECALL, MIN_PRECISION, MAX_GAP)
    ref = oracle_estimator(128, 96, MIN_RECALL, MIN_PRECISION, MAX_GAP)
    for frame in frames:
        ours.add_frame(frame)
        ref.add_frame(frame, True)
    return ours, ref, frames


def test_unique_cc_parity(tracked):
    ours, ref, _ = tracked
    assert len(ours.unique_ccs) == len(ref.unique_cc_objects)
    for mine, theirs in zip(ours.unique_ccs, ref.unique_cc_objects):
        assert (mine.min_x, mine.max_x, mine.min_y, mine.max_y) == \
            (theirs.min_x, theirs.max_x, theirs.min_y, theirs.max_y)
        assert mine.size == theirs.size
        np.testing.assert_array_equal(mine.img, theirs.img)
    assert ours.unique_cc_frames == ref.unique_cc_frames


def test_per_frame_assignment_parity(tracked):
    ours, ref, _ = tracked
    assert len(ours.cc_idx_per_frame) == len(ref.cc_idx_per_frame)
    for mine, theirs in zip(ours.cc_idx_per_frame, ref.cc_idx_per_frame):
        assert [idx for idx, _ in mine] == [idx for idx, _ in theirs]


def test_rebuilt_frames_parity(tracked):
    ours, ref, frames = tracked
    ref_frames = ref.rebuilt_binary_images()
    our_frames = ours.rebuilt_binary_frames()
    for mine, theirs in zip(our_frames, ref_frames):
        np.testing.assert_array_equal(mine, theirs)


def test_grouping_pipeline_parity(tracked):
    ours, ref, _ = tracked

    split_ours = ours.split_stable_by_gaps(MAX_GAP, MIN_TIMES)
    split_ref = ref.split_stable_cc_by_gaps(MAX_GAP, MIN_TIMES)
    assert split_ours == split_ref

    stable_ours = ours.stable_cc_idxs(MIN_TIMES)
    stable_ref = ref.get_stable_cc_idxs(MIN_TIMES)
    assert stable_ours == stable_ref

    t_window = 5
    time_ov_ours, total_ours, all_ov_ours = \
        ours.compute_overlapping_stable(stable_ours, t_window)
    time_ov_ref, total_ref, all_ov_ref = \
        ref.compute_overlapping_stable_cc(stable_ref, t_window)
    assert total_ours == total_ref
    for mine, theirs in zip(all_ov_ours, all_ov_ref):
        assert sorted(mine) == sorted(theirs)
    for mine, theirs in zip(time_ov_ours, time_ov_ref):
        assert sorted(mine) == sorted(theirs)

    groups_ours, group_of_ours = ours.compute_groups(stable_ours, time_ov_ours, 0.5)
    groups_ref, group_of_ref = ref.compute_groups(stable_ref, time_ov_ref, 0.5,
                                                  None, None)
    assert [sorted(g) for g in groups_ours] == [sorted(g) for g in groups_ref]
    assert group_of_ours == group_of_ref

    ages_ours, per_frame_ours = ours.compute_group_ages(groups_ours)
    ages_ref, per_frame_ref = ref.compute_groups_temporal_information(groups_ref)
    assert ages_ours == ages_ref
    assert per_frame_ours == per_frame_ref

    conflicts_ours = ours.compute_conflicts(stable_ours, all_ov_ours,
                                            len(groups_ours), group_of_ours)
    conflicts_ref = ref.compute_conflicting_groups(stable_ref, all_ov_ref,
                                                   len(groups_ref), group_of_ref)
    assert set(conflicts_ours.keys()) == set(conflicts_ref.keys())
    for gidx in conflicts_ref:
        assert set(conflicts_ours[gidx].keys()) == set(conflicts_ref[gidx].keys())
        for other in conflicts_ref[gidx]:
            for key in ("matched", "unmatched", "area_union", "area_intersection"):
                assert conflicts_ours[gidx][other][key] == \
                    conflicts_ref[gidx][other][key], (gidx, other, key)

    images_ours, bounds_ours = ours.compute_group_images(groups_ours, ages_ours, 0.5)
    images_ref, bounds_ref = ref.compute_group_images(groups_ref, ages_ref, 0.5)
    assert bounds_ours == bounds_ref
    assert set(images_ours.keys()) == set(images_ref.keys())
    for gidx in images_ref:
        assert len(images_ours[gidx]) == len(images_ref[gidx])
        for mine, theirs in zip(images_ours[gidx], images_ref[gidx]):
            np.testing.assert_array_equal(mine, theirs)

    clean_ours = ours.clean_frames_from_groups(groups_ours, bounds_ours,
                                               per_frame_ours, ages_ours,
                                               images_ours)
    import cv2
    clean_ref_png = ref.frames_from_groups(groups_ref, bounds_ref, per_frame_ref,
                                           ages_ref, images_ref, None,
                                           MIN_TIMES, True)
    for mine, theirs_png in zip(clean_ours, clean_ref_png):
        theirs = cv2.imdecode(theirs_png, cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(mine, theirs)


def test_gap_split_double_sighting_parity():
    """A frame where TWO current CCs matched the same unique CC gives that
    unique CC two same-frame sightings; when a gap split renumbers the run
    containing that frame, the reference renumbers one per-frame entry per
    SIGHTING (split_stable_cc_by_gaps iterates sightings, the inner break
    lands on the next un-renumbered entry each pass). Regression for a
    frame-dedup bug that renumbered only the first entry."""
    h, w = 48, 64
    blob = np.zeros((h, w), np.uint8)
    blob[10:24, 10:24] = 255  # 14x14 blob A
    twins = np.zeros((h, w), np.uint8)
    twins[10:16, 10:16] = 255  # B1: 6x6 inside A's footprint (> noise floor)
    twins[18:24, 18:24] = 255  # B2: 6x6 inside A's footprint, disjoint
    empty = np.zeros((h, w), np.uint8)

    # frames 0-2: A. 3-6: empty (gap 5 <= tracking max_gap 10, stays
    # active). 7: B1+B2 (both match unique 0 at low thresholds). 8: A.
    frames = [blob, blob, blob, empty, empty, empty, empty, twins, blob]

    ours = CCTracker(w, h, 0.1, 0.1, max_gap=10)
    ref = oracle_estimator(w, h, 0.1, 0.1, 10)
    for frame in frames:
        ours.add_frame(frame)
        ref.add_frame(frame, True)

    # precondition: the double sighting actually happened
    frame7 = [uidx for uidx, _ in ours.cc_idx_per_frame[7]]
    assert frame7 == [0, 0], frame7

    # split with a SMALLER gap than tracking used (as a stage-03 config
    # can) so the [7, 7, 8] run becomes a new unique CC
    split_ours = ours.split_stable_by_gaps(3, 3)
    split_ref = ref.split_stable_cc_by_gaps(3, 3)
    assert split_ours == split_ref == 1

    assert ours.unique_cc_frames == ref.unique_cc_frames
    for mine, theirs in zip(ours.cc_idx_per_frame, ref.cc_idx_per_frame):
        assert [idx for idx, _ in mine] == [idx for idx, _ in theirs]
    # both frame-7 entries must now point at the new unique CC
    assert [uidx for uidx, _ in ours.cc_idx_per_frame[7]] == [1, 1]


def test_add_frame_non_binary_parity():
    """add_frame(input_binary=False) classically binarizes first, matching
    the reference's default path (cc_stability_estimator.py:40-47)."""
    from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

    rgb, _, _, _ = synthetic_rgb_lecture(seed=13, n_frames=10, height=96,
                                         width=128, n_boards=1,
                                         glyphs_per_board=5)

    ours = CCTracker(128, 96, MIN_RECALL, MIN_PRECISION, MAX_GAP)
    ref = oracle_estimator(128, 96, MIN_RECALL, MIN_PRECISION, MAX_GAP)
    for frame in rgb:
        ours.add_frame(frame, input_binary=False)
        ref.add_frame(frame, False)

    assert len(ours.unique_ccs) == len(ref.unique_cc_objects)
    for mine, theirs in zip(ours.unique_ccs, ref.unique_cc_objects):
        assert (mine.min_x, mine.max_x, mine.min_y, mine.max_y, mine.size) \
            == (theirs.min_x, theirs.max_x, theirs.min_y, theirs.max_y,
                theirs.size)
        np.testing.assert_array_equal(mine.img, theirs.img)
