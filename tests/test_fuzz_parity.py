"""Shape-fuzz oracle parity: the CC tracker + grouping pipeline against
the reference CCStabilityEstimator across varied lecture shapes (sparse
boards, heavy noise, degenerate/empty inputs, odd aspect ratios) — the
fixed-seed parity suite (test_tracking_parity) covers one lecture shape;
this sweep hardens the claim across the input space where tie-breaks and
empty-set edge cases live."""

import numpy as np
import pytest

from lecturemath_tpu.pipeline.cc_tracking import CCTracker
from lecturemath_tpu.utils.synthetic import synthetic_lecture

from oracle import oracle_estimator

MIN_RECALL = 0.85
MIN_PRECISION = 0.85
MAX_GAP = 8
MIN_TIMES = 3


def assert_tracker_parity(frames, width, height):
    ours = CCTracker(width, height, MIN_RECALL, MIN_PRECISION, MAX_GAP)
    ref = oracle_estimator(width, height, MIN_RECALL, MIN_PRECISION,
                           MAX_GAP)
    for frame in frames:
        ours.add_frame(frame)
        ref.add_frame(frame, True)

    assert len(ours.unique_ccs) == len(ref.unique_cc_objects)
    for mine, theirs in zip(ours.unique_ccs, ref.unique_cc_objects):
        assert (mine.min_x, mine.max_x, mine.min_y, mine.max_y) == \
            (theirs.min_x, theirs.max_x, theirs.min_y, theirs.max_y)
        np.testing.assert_array_equal(mine.img, theirs.img)
    assert ours.unique_cc_frames == ref.unique_cc_frames
    for mine, theirs in zip(ours.cc_idx_per_frame, ref.cc_idx_per_frame):
        assert [idx for idx, _ in mine] == [idx for idx, _ in theirs]

    split_ours = ours.split_stable_by_gaps(MAX_GAP, MIN_TIMES)
    split_ref = ref.split_stable_cc_by_gaps(MAX_GAP, MIN_TIMES)
    assert split_ours == split_ref
    stable = ours.stable_cc_idxs(MIN_TIMES)
    assert stable == ref.get_stable_cc_idxs(MIN_TIMES)
    _, total_ours, all_ov_ours = ours.compute_overlapping_stable(stable, 5)
    _, total_ref, all_ov_ref = ref.compute_overlapping_stable_cc(stable, 5)
    assert total_ours == total_ref
    for mine, theirs in zip(all_ov_ours, all_ov_ref):
        assert sorted(mine) == sorted(theirs)


SHAPES = {
    "single_board_no_erase": dict(seed=3, n_frames=24, height=96,
                                  width=128, n_boards=1,
                                  glyphs_per_board=6, jitter=0.0),
    "three_boards_heavy_jitter": dict(seed=5, n_frames=45, height=96,
                                      width=128, n_boards=3,
                                      glyphs_per_board=4, jitter=0.05),
    "sparse_one_glyph": dict(seed=9, n_frames=30, height=96, width=128,
                             n_boards=2, glyphs_per_board=1, jitter=0.01),
    "tall_narrow": dict(seed=13, n_frames=28, height=240, width=64,
                        n_boards=2, glyphs_per_board=3, jitter=0.02),
    "tiny_frames": dict(seed=17, n_frames=26, height=32, width=48,
                        n_boards=2, glyphs_per_board=2, jitter=0.0,
                        glyph_size=(9, 10)),
    "crowded": dict(seed=21, n_frames=36, height=128, width=192,
                    n_boards=2, glyphs_per_board=10, jitter=0.03),
}


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_shape_fuzz_tracker_parity(shape):
    kwargs = SHAPES[shape]
    frames, _, _ = synthetic_lecture(**kwargs)
    assert_tracker_parity(frames, kwargs["width"], kwargs["height"])


def test_empty_lecture_parity():
    """All-background frames: no CCs anywhere, both sides agree on the
    empty result (the empty-set edge case of every stage)."""
    frames = np.zeros((10, 64, 96), np.uint8)
    assert_tracker_parity(list(frames), 96, 64)


def test_single_frame_lecture_parity():
    frames, _, _ = synthetic_lecture(seed=2, n_frames=1, height=96,
                                     width=128, n_boards=1,
                                     glyphs_per_board=4)
    assert_tracker_parity(frames, 128, 96)


@pytest.mark.parametrize("seed", range(20, 30))
def test_random_seed_sweep_parity(seed):
    """Ten further random lectures with randomized shape parameters —
    a broad net for tie-break and boundary divergences."""
    rng = np.random.default_rng(seed)
    kwargs = dict(
        seed=seed, n_frames=int(rng.integers(12, 50)),
        height=int(rng.integers(48, 160)),
        width=int(rng.integers(64, 200)),
        n_boards=int(rng.integers(1, 4)),
        glyphs_per_board=int(rng.integers(1, 9)),
        jitter=float(rng.uniform(0.0, 0.06)))
    frames, _, _ = synthetic_lecture(**kwargs)
    assert_tracker_parity(frames, kwargs["width"], kwargs["height"])


def assert_cascade_parity(frames, width, height):
    """Full host cascade on one lecture: groups, ages, conflicts, group
    images, rendered clean frames, and extracted keyframes — bit-exact
    vs the reference (the composition the 5-stage pipeline runs)."""
    import cv2

    from oracle import oracle_keyframe_extractor, oracle_space_time_struct

    from lecturemath_tpu.data.space_time import SpaceTimeStruct
    from lecturemath_tpu.pipeline.keyframes import extract_keyframes

    ours = CCTracker(width, height, MIN_RECALL, MIN_PRECISION, MAX_GAP)
    ref = oracle_estimator(width, height, MIN_RECALL, MIN_PRECISION,
                           MAX_GAP)
    for frame in frames:
        ours.add_frame(frame)
        ref.add_frame(frame, True)

    ours.split_stable_by_gaps(MAX_GAP, MIN_TIMES)
    ref.split_stable_cc_by_gaps(MAX_GAP, MIN_TIMES)
    stable = ours.stable_cc_idxs(MIN_TIMES)
    assert stable == ref.get_stable_cc_idxs(MIN_TIMES)
    time_ov, _, all_ov = ours.compute_overlapping_stable(stable, 5)
    time_ov_ref, _, all_ov_ref = ref.compute_overlapping_stable_cc(stable, 5)

    groups, group_of = ours.compute_groups(stable, time_ov, 0.5)
    groups_ref, group_of_ref = ref.compute_groups(stable, time_ov_ref, 0.5,
                                                  None, None)
    assert [sorted(g) for g in groups] == [sorted(g) for g in groups_ref]
    ages, per_frame = ours.compute_group_ages(groups)
    ages_ref, per_frame_ref = ref.compute_groups_temporal_information(
        groups_ref)
    assert ages == ages_ref

    conflicts = ours.compute_conflicts(stable, all_ov, len(groups),
                                       group_of)
    conflicts_ref = ref.compute_conflicting_groups(stable, all_ov_ref,
                                                   len(groups_ref),
                                                   group_of_ref)
    assert set(conflicts.keys()) == set(conflicts_ref.keys())

    images, bounds = ours.compute_group_images(groups, ages, 0.5)
    images_ref, bounds_ref = ref.compute_group_images(groups_ref, ages_ref,
                                                      0.5)
    assert bounds == bounds_ref
    for gidx in images_ref:
        for mine, theirs in zip(images[gidx], images_ref[gidx]):
            np.testing.assert_array_equal(mine, theirs)

    clean = ours.clean_frames_from_groups(groups, bounds, per_frame, ages,
                                          images)
    clean_ref = ref.frames_from_groups(groups_ref, bounds_ref,
                                       per_frame_ref, ages_ref, images_ref,
                                       None, MIN_TIMES, True)
    for mine, theirs_png in zip(clean, clean_ref):
        np.testing.assert_array_equal(
            mine, cv2.imdecode(theirs_png, cv2.IMREAD_GRAYSCALE))

    n = len(frames)
    frame_times = [1000.0 * t for t in range(n)]
    frame_indices = [30 * t for t in range(n)]
    ours_st3d = SpaceTimeStruct(frame_times, frame_indices, height, width,
                                ages, images, bounds)
    ref_st3d = oracle_space_time_struct(frame_times, frame_indices,
                                        height, width, ages_ref,
                                        images_ref, bounds_ref)
    third = max(1, n // 3)
    segments = [(s, min(s + third - 1, n - 1))
                for s in range(0, n, third)]
    our_kfs, our_times = extract_keyframes(ours_st3d, segments)
    kf_ext = oracle_keyframe_extractor()
    ref_kfs, ref_times = kf_ext.GenerateFromST3DForIntervals(
        ref_st3d, segments, verbose=False)
    assert our_times == ref_times
    for mine, theirs in zip(our_kfs, ref_kfs):
        np.testing.assert_array_equal(mine, theirs)


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_shape_fuzz_cascade_parity(shape):
    kwargs = SHAPES[shape]
    frames, _, _ = synthetic_lecture(**kwargs)
    assert_cascade_parity(frames, kwargs["width"], kwargs["height"])


def test_empty_lecture_cascade_parity():
    frames = np.zeros((10, 64, 96), np.uint8)
    assert_cascade_parity(list(frames), 96, 64)
