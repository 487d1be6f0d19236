"""Parity of the three temporal-segmentation methods vs the reference
VideoSegmenter (behavioral oracle)."""

import numpy as np
import pytest

from lecturemath_tpu.pipeline import segmentation as seg

from oracle import oracle_video_segmenter


def test_find_signal_peaks_parity():
    vs = oracle_video_segmenter()
    rng = np.random.default_rng(3)
    signal = np.round(rng.random(60) * 10)
    signal_dict = {i: signal[i] for i in range(60)}
    assert seg.find_signal_peaks(0, 59, signal) == \
        vs.find_signal_peaks(0, 59, signal_dict)
    assert seg.find_signal_peaks(10, 40, signal) == \
        vs.find_signal_peaks(10, 40, signal_dict)


def test_sums_method_parity():
    vs = oracle_video_segmenter()
    rng = np.random.default_rng(0)
    # staircase with two erase drops + noise
    sums = np.concatenate([
        np.linspace(0, 500, 25), np.full(10, 500), np.linspace(500, 100, 5),
        np.linspace(100, 700, 25), np.full(10, 700), np.linspace(700, 50, 5),
        np.linspace(50, 400, 20)])
    sums = (sums + rng.normal(0, 10, len(sums))).tolist()
    ours = seg.segments_from_sums(sums, leaf_min=10, min_erase_ratio=0.05)
    theirs = vs.video_segments_from_sums(sums, 10, 0.05)
    assert ours == theirs


def test_deletion_events_parity():
    vs = oracle_video_segmenter()
    rng = np.random.default_rng(1)
    n_frames = 80
    group_ages = {}
    group_boundaries = {}
    for g in range(12):
        first = int(rng.integers(0, 60))
        last = int(rng.integers(first + 2, n_frames))
        group_ages[g] = [first, last]
        x0, y0 = int(rng.integers(0, 100)), int(rng.integers(0, 60))
        group_boundaries[g] = (x0, x0 + int(rng.integers(5, 30)),
                               y0, y0 + int(rng.integers(5, 30)))

    frame_area = 128.0 * 96.0
    add_threshold, min_length, threshold = 0.00005, 3, 0.0008

    ours = seg.segments_from_deletion_events(group_ages, group_boundaries,
                                             n_frames, frame_area,
                                             add_threshold, min_length,
                                             threshold)

    # reference stage-04 signal build (pre_ST3D_v3.0_04:56-95)
    add_values = np.zeros(n_frames)
    del_values = np.zeros(n_frames)
    for g, ages in group_ages.items():
        mnx, mxx, mny, mxy = group_boundaries[g]
        area = (mxx - mnx + 1) * (mxy - mny + 1) / frame_area
        add_values[ages[0]] += area
        del_values[ages[-1]] += area
    accumulated = 0.0
    cumulative = np.zeros(n_frames)
    for idx in range(n_frames):
        if add_values[idx] > add_threshold:
            accumulated = 0.0
        accumulated += del_values[idx]
        cumulative[idx] = accumulated

    theirs = vs.split_video_from_group_deletes(cumulative, 0, n_frames - 1,
                                               min_length, threshold)
    assert ours == theirs


@pytest.mark.parametrize("weights", [(0, 0, 0), (3, 3, 1), (4, 1, 2), (5, 2, 0)])
def test_conflicts_method_parity(weights):
    vs = oracle_video_segmenter()
    weight_area, weight_pixels, weight_time = weights
    rng = np.random.default_rng(42)
    n_frames = 70
    group_ages = {}
    for g in range(10):
        first = int(rng.integers(0, 50))
        last = int(rng.integers(first + 3, n_frames))
        group_ages[g] = [first, last]

    conflicts = {g: {} for g in group_ages}
    for g in range(10):
        for other in range(g + 1, 10):
            if rng.random() < 0.4:
                stats = {"matched": int(rng.integers(10, 200)),
                         "unmatched": int(rng.integers(10, 200)),
                         "area_union": float(rng.integers(100, 2000)),
                         "area_intersection": float(rng.integers(10, 100))}
                conflicts[g][other] = dict(stats)
                conflicts[other][g] = dict(stats)

    ours = seg.segments_from_conflicts(n_frames, group_ages, conflicts,
                                       min_conflicts=0.5, min_split=10,
                                       min_len=4, weight_area=weight_area,
                                       weight_pixels=weight_pixels,
                                       weight_time=weight_time)
    theirs = vs.from_group_conflicts(n_frames, group_ages, conflicts, 0.5,
                                     10, 4, weight_area, weight_pixels,
                                     weight_time, None)
    assert ours == theirs


@pytest.mark.parametrize("seed", range(5))
def test_sums_method_fuzz_parity(seed):
    """Randomized ink-sum staircases (varied era counts, drop depths,
    noise) — the regression-tree segmentation matches the reference."""
    vs = oracle_video_segmenter()
    rng = np.random.default_rng(300 + seed)
    pieces = []
    level = 0.0
    for _ in range(int(rng.integers(2, 5))):
        top = level + float(rng.uniform(200, 700))
        pieces.append(np.linspace(level, top, int(rng.integers(10, 30))))
        pieces.append(np.full(int(rng.integers(3, 12)), top))
        level = top * float(rng.uniform(0.05, 0.4))
        pieces.append(np.linspace(top, level, int(rng.integers(2, 6))))
    sums = np.concatenate(pieces)
    sums = (sums + rng.normal(0, rng.uniform(2, 15), len(sums))).tolist()
    leaf_min = int(rng.integers(5, 15))
    ratio = float(rng.uniform(0.02, 0.1))
    assert seg.segments_from_sums(sums, leaf_min=leaf_min,
                                  min_erase_ratio=ratio) == \
        vs.video_segments_from_sums(sums, leaf_min, ratio)


@pytest.mark.parametrize("seed", range(5))
def test_find_signal_peaks_fuzz_parity(seed):
    vs = oracle_video_segmenter()
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(20, 120))
    signal = np.round(rng.random(n) * rng.integers(3, 30))
    signal_dict = {i: signal[i] for i in range(n)}
    lo = int(rng.integers(0, n // 2))
    hi = int(rng.integers(lo + 1, n))
    assert seg.find_signal_peaks(lo, hi, signal) == \
        vs.find_signal_peaks(lo, hi, signal_dict)
