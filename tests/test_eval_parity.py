"""Parity of the evaluation layer vs the reference Evaluator/Aligner."""

import numpy as np
import pytest

from lecturemath_tpu.eval.aligner import (translation_alignment,
                                          translation_alignment_scan)
from lecturemath_tpu.eval.annotation import KeyframeAnnotation, cc_str_id
from lecturemath_tpu.eval.evaluator import EvalParams, Evaluator
from lecturemath_tpu.utils.synthetic import synthetic_lecture

from oracle import ensure_oracle


def make_binary_pair(seed=0):
    """GT binary + noisy/shifted 'summary' binary (ink=0 on 255)."""
    frames, _, _ = synthetic_lecture(seed=seed, n_frames=10, height=96,
                                     width=128, n_boards=1,
                                     glyphs_per_board=6)
    gt_ink = frames[-1]
    summary_ink = np.zeros_like(gt_ink)
    summary_ink[2:, 3:] = gt_ink[:-2, :-3]  # shift by (2, 3)
    rng = np.random.default_rng(seed)
    drop = rng.random(summary_ink.shape) < 0.02
    summary_ink[drop] = 0
    return 255 - gt_ink, 255 - summary_ink


def test_alignment_fft_vs_scan():
    gt, summ = make_binary_pair()
    for sort_by in (0, 1):
        fft = translation_alignment(gt, summ, 10, 0, sort_by)
        scan = translation_alignment_scan(gt, summ, 10, 0, sort_by)
        assert fft == pytest.approx(scan)


def test_alignment_vs_reference():
    ensure_oracle()
    from AccessMath.preprocessing.content.aligner import Aligner

    gt, summ = make_binary_pair(3)
    for sort_by in (0, 1):
        ours = translation_alignment(gt, summ, 10, 0, sort_by)
        theirs = Aligner.computeTranslationAlignment(gt, summ, 10, 0, sort_by)
        assert ours == pytest.approx(tuple(theirs))
    # recovered displacement: summary content sits (+2, +3) down-right of
    # GT, so aligning GT onto it needs disp (-2, -3) in the reference's
    # convention (verified identical to the oracle above)
    assert translation_alignment(gt, summ, 10, 0, 1)[3:] == (-2, -3)


def _make_keyframe(binary_ink0, idx, time, objects=()):
    h, w = binary_ink0.shape
    raw = np.stack([255 - binary_ink0] * 3, axis=-1)
    kf = KeyframeAnnotation("DB", "lec", idx, time, list(objects), raw)
    kf.binary_image = np.stack([binary_ink0] * 3, axis=-1)
    kf.update_binary_cc(False)
    return kf


def _oracle_keyframe(binary_ink0, idx, time):
    from AccessMath.annotation.keyframe_annotation import KeyFrameAnnotation

    h, w = binary_ink0.shape
    raw = np.stack([255 - binary_ink0] * 3, axis=-1)
    kf = KeyFrameAnnotation("DB", "lec", idx, time, [], raw)
    kf.binary_image = np.stack([binary_ink0] * 3, axis=-1)
    kf.update_binary_cc(False)
    return kf


@pytest.fixture(scope="module")
def eval_setup():
    ensure_oracle()
    gt_bins = []
    summ_bins = []
    for seed in range(3):
        gt, summ = make_binary_pair(seed)
        gt_bins.append(gt)
        summ_bins.append(summ)

    ours_gt = [_make_keyframe(b, i, 1000.0 * i) for i, b in enumerate(gt_bins)]
    ours_summ = [_make_keyframe(b, i, 1000.0 * i) for i, b in enumerate(summ_bins)]
    ref_gt = [_oracle_keyframe(b, i, 1000.0 * i) for i, b in enumerate(gt_bins)]
    ref_summ = [_oracle_keyframe(b, i, 1000.0 * i) for i, b in enumerate(summ_bins)]
    return ours_gt, ours_summ, ref_gt, ref_summ


def test_fake_keyframe_info_parity(eval_setup):
    ours_gt, _, ref_gt, _ = eval_setup
    from AccessMath.annotation.keyframe_annotation import KeyFrameAnnotation

    ours = KeyframeAnnotation.generate_fake_keyframe_info(ours_gt)
    ref = KeyFrameAnnotation.GenerateFakeKeyframeInfo(ref_gt)

    assert ours[2] == ref[2]  # fake segments
    assert len(ours[0]) == len(ref[0])  # unique groups
    assert [sorted(d.keys()) for d in ours[1]] == \
        [sorted(d.keys()) for d in ref[1]]


def test_summary_metrics_parity(eval_setup):
    ours_gt, ours_summ, ref_gt, ref_summ = eval_setup
    from AccessMath.annotation.keyframe_annotation import KeyFrameAnnotation
    from AccessMath.evaluation.evaluator import Evaluator as RefEvaluator
    from AccessMath.evaluation.eval_parameters import EvalParameters

    our_groups, our_cc_group, our_segments = \
        KeyframeAnnotation.generate_fake_keyframe_info(ours_gt)
    ref_groups, ref_cc_group, ref_segments = \
        KeyFrameAnnotation.GenerateFakeKeyframeInfo(ref_gt)

    params = EvalParams(global_translation_window=1,
                        min_cc_recall=(0.5, 0.65, 0.8, 0.95),
                        min_cc_precision=(0.5, 0.65, 0.8, 0.95))
    EvalParameters.UniqueCC_global_tran_window = 1
    EvalParameters.UniqueCC_min_recall = [0.5, 0.65, 0.8, 0.95]
    EvalParameters.UniqueCC_min_precision = [0.5, 0.65, 0.8, 0.95]
    EvalParameters.UniqueCC_max_workers = 1
    EvalParameters.Report_Summary_Show_stats_per_size = True

    ours_metrics, ours_ranges = Evaluator(params).compute_summary_metrics(
        our_segments, ours_gt, our_groups, our_cc_group,
        our_segments, ours_summ)
    ref_metrics, ref_ranges = RefEvaluator.compute_summary_metrics(
        ref_segments, ref_gt, ref_groups, ref_cc_group,
        ref_segments, ref_summ)

    assert ours_ranges == ref_ranges
    for scope in ref_ranges:
        assert len(ours_metrics[scope]) == len(ref_metrics[scope])
        for ours_entry, ref_entry in zip(ours_metrics[scope],
                                         ref_metrics[scope]):
            for side in ("recall_metrics", "precision_metrics"):
                for key, ref_value in ref_entry[side].items():
                    our_value = ours_entry[side][key]
                    np.testing.assert_allclose(
                        np.asarray(our_value, dtype=np.float64),
                        np.asarray(ref_value, dtype=np.float64),
                        rtol=1e-9, err_msg=f"{scope}/{side}/{key}")


def test_pixel_metrics_parity(eval_setup):
    ours_gt, ours_summ, ref_gt, ref_summ = eval_setup
    from AccessMath.evaluation.evaluator import Evaluator as RefEvaluator

    ours = Evaluator.compute_pixel_binary_metrics(ours_gt, ours_summ)
    ref = RefEvaluator.compute_pixel_binary_metrics(ref_gt, ref_summ)
    for key in ref:
        assert ours[key] == pytest.approx(ref[key], rel=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_alignment_fuzz_fft_vs_scan_vs_reference(seed):
    """Random content and displacements (incl. ties from sparse/empty
    ink): the FFT alignment equals the exhaustive scan AND the
    reference's Aligner for both sort orders."""
    ensure_oracle()
    from AccessMath.preprocessing.content.aligner import Aligner

    rng = np.random.default_rng(500 + seed)
    h, w = int(rng.integers(40, 100)), int(rng.integers(50, 130))
    gt_ink = np.zeros((h, w), np.uint8)
    for _ in range(int(rng.integers(0, 6))):   # 0 strokes = empty case
        y, x = int(rng.integers(0, h - 6)), int(rng.integers(0, w - 9))
        gt_ink[y:y + int(rng.integers(2, 7)),
               x:x + int(rng.integers(3, 10))] = 255
    dy, dx = int(rng.integers(-4, 5)), int(rng.integers(-4, 5))
    summ_ink = np.roll(np.roll(gt_ink, dy, axis=0), dx, axis=1)
    drop = rng.random(summ_ink.shape) < rng.uniform(0, 0.05)
    summ_ink[drop] = 0
    gt, summ = 255 - gt_ink, 255 - summ_ink
    window = int(rng.integers(3, 9))
    for sort_by in (0, 1):
        fft = translation_alignment(gt, summ, window, 0, sort_by)
        scan = translation_alignment_scan(gt, summ, window, 0, sort_by)
        ref = tuple(Aligner.computeTranslationAlignment(gt, summ, window,
                                                        0, sort_by))
        assert fft == pytest.approx(scan), (seed, sort_by)
        assert fft == pytest.approx(ref), (seed, sort_by)
