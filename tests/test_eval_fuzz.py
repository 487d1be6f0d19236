"""Randomized eval-layer parity: full summary-metric dicts vs the
reference Evaluator across structurally varied GT/summary pairs
(mismatched keyframe counts, empty keyframes, speckle CCs, shifts beyond
the alignment window) — the fixed-fixture parity test covers one benign
shape; this sweep exercises the matching code's unmatched/empty paths."""

import numpy as np
import pytest

from lecturemath_tpu.eval.evaluator import EvalParams, Evaluator
from lecturemath_tpu.utils.synthetic import synthetic_lecture

from oracle import ensure_oracle
from test_eval_parity import _make_keyframe, _oracle_keyframe


def _ink(seed, n_glyphs=6, height=96, width=128):
    frames, _, _ = synthetic_lecture(seed=seed, n_frames=8, height=height,
                                     width=width, n_boards=1,
                                     glyphs_per_board=n_glyphs)
    return frames[-1]          # ink=255 mask


def _speckle(binary_ink255, rng, n=12):
    out = binary_ink255.copy()
    h, w = out.shape
    for _ in range(n):
        y = int(rng.integers(0, h - 3))
        x = int(rng.integers(0, w - 3))
        out[y:y + int(rng.integers(1, 4)), x:x + int(rng.integers(1, 4))] = 255
    return out


def _case(seed):
    """(gt_ink0_list, summary_ink0_list) with structure varied by seed."""
    rng = np.random.default_rng(seed)
    variant = seed % 4
    gt = [255 - _ink(seed * 10 + k) for k in range(3)]
    if variant == 0:           # fewer summary keyframes than GT
        summary = [gt[0].copy(), gt[2].copy()]
    elif variant == 1:         # an all-background summary keyframe
        summary = [gt[0].copy(), np.full_like(gt[1], 255), gt[2].copy()]
    elif variant == 2:         # speckle noise adds spurious CCs
        summary = [255 - _speckle(255 - b, rng) for b in gt]
    else:                      # shift far beyond the alignment window
        summary = []
        for b in gt:
            ink = 255 - b
            shifted = np.zeros_like(ink)
            shifted[20:, 25:] = ink[:-20, :-25]
            summary.append(255 - shifted)
    return gt, summary


@pytest.mark.parametrize("seed", range(4, 10))
def test_summary_metrics_fuzz_parity(seed):
    ensure_oracle()
    from AccessMath.annotation.keyframe_annotation import KeyFrameAnnotation
    from AccessMath.evaluation.eval_parameters import EvalParameters
    from AccessMath.evaluation.evaluator import Evaluator as RefEvaluator

    from lecturemath_tpu.eval.annotation import KeyframeAnnotation

    gt_bins, summ_bins = _case(seed)
    ours_gt = [_make_keyframe(b, i, 1000.0 * i)
               for i, b in enumerate(gt_bins)]
    ours_summ = [_make_keyframe(b, i, 1000.0 * i)
                 for i, b in enumerate(summ_bins)]
    ref_gt = [_oracle_keyframe(b, i, 1000.0 * i)
              for i, b in enumerate(gt_bins)]
    ref_summ = [_oracle_keyframe(b, i, 1000.0 * i)
                for i, b in enumerate(summ_bins)]

    our_groups, our_cc_group, our_segments = \
        KeyframeAnnotation.generate_fake_keyframe_info(ours_gt)
    ref_groups, ref_cc_group, ref_segments = \
        KeyFrameAnnotation.GenerateFakeKeyframeInfo(ref_gt)
    # the summary side brings its OWN segments (one per summary keyframe
    # — in the pipeline they come from the summary's segments.xml); with
    # fewer summary keyframes than GT segments this is what keeps the
    # pairing consistent on both sides
    _, _, our_summ_segments = \
        KeyframeAnnotation.generate_fake_keyframe_info(ours_summ)
    _, _, ref_summ_segments = \
        KeyFrameAnnotation.GenerateFakeKeyframeInfo(ref_summ)

    params = EvalParams(global_translation_window=1,
                        min_cc_recall=(0.5, 0.8, 0.95),
                        min_cc_precision=(0.5, 0.8, 0.95))
    EvalParameters.UniqueCC_global_tran_window = 1
    EvalParameters.UniqueCC_min_recall = [0.5, 0.8, 0.95]
    EvalParameters.UniqueCC_min_precision = [0.5, 0.8, 0.95]
    EvalParameters.UniqueCC_max_workers = 1
    EvalParameters.Report_Summary_Show_stats_per_size = True

    ours_metrics, ours_ranges = Evaluator(params).compute_summary_metrics(
        our_segments, ours_gt, our_groups, our_cc_group,
        our_summ_segments, ours_summ)
    ref_metrics, ref_ranges = RefEvaluator.compute_summary_metrics(
        ref_segments, ref_gt, ref_groups, ref_cc_group,
        ref_summ_segments, ref_summ)

    assert ours_ranges == ref_ranges
    for scope in ref_ranges:
        assert len(ours_metrics[scope]) == len(ref_metrics[scope])
        for ours_entry, ref_entry in zip(ours_metrics[scope],
                                         ref_metrics[scope]):
            for side in ("recall_metrics", "precision_metrics"):
                for key, ref_value in ref_entry[side].items():
                    np.testing.assert_allclose(
                        np.asarray(ours_entry[side][key], dtype=np.float64),
                        np.asarray(ref_value, dtype=np.float64),
                        rtol=1e-9, err_msg=f"seed {seed}: "
                                           f"{scope}/{side}/{key}")

    # pixel metrics pair GT/summary keyframes positionally (the
    # reference indexes summary_frames[idx] by GT index) — only defined
    # for equal-length lists
    if len(ours_gt) == len(ours_summ):
        ours_px = Evaluator.compute_pixel_binary_metrics(ours_gt,
                                                         ours_summ)
        ref_px = RefEvaluator.compute_pixel_binary_metrics(ref_gt,
                                                           ref_summ)
        for key in ref_px:
            if np.isnan(ref_px[key]):
                # conscious divergence (PARITY.md quirks): an empty
                # summary keyframe makes the reference's unguarded 0/0
                # poison the whole rollup with NaN; ours guards the
                # per-keyframe ratio to 0.0 and keeps the average finite
                assert np.isfinite(ours_px[key]), key
            else:
                assert ours_px[key] == pytest.approx(ref_px[key],
                                                     rel=1e-9), key
