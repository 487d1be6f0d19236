"""Translation alignment of binary keyframes.

The reference scans all (2w+1)^2 integer displacements, counting matching
ink pixels in the overlap region per displacement, and picks the best
f-score/recall (reference: aligner.py:28-83 — the evaluation hot loop, run
on 6 worker processes). Here the scan is one FFT cross-correlation: the
per-displacement match count of ink masks IS the cross-correlation of the
two indicator images, so all displacements come out of a single O(HW log HW)
transform instead of 441 full-image passes. Tie-breaking reproduces the
reference's stable sort (first maximum in dy-major, dx-minor scan order).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..data.cc import CC

AlignInfo = Tuple[float, float, float, int, int]  # fscore, recall, precision, dy, dx


def translation_alignment(first: np.ndarray, second: np.ndarray,
                          max_window: int, content_lum: int = 255,
                          sort_by: int = 0) -> AlignInfo:
    """Best integer-translation alignment of two equal-size binary images.

    Args:
      first, second: [H, W] uint8 binary frames.
      content_lum: gray level counted as ink (0 for GT keyframes).
      sort_by: 0 -> maximize f-score, 1 -> maximize recall.

    Returns (f_score, recall, precision, disp_y, disp_x); zeros when either
    image has no ink.
    """
    assert first.shape == second.shape and first.ndim == 2
    ink1 = (first == content_lum)
    ink2 = (second == content_lum)
    total_first = int(ink1.sum())
    total_second = int(ink2.sum())
    if total_first == 0 or total_second == 0:
        return 0.0, 0.0, 0.0, 0, 0

    matches = _window_cross_correlation(ink1, ink2, max_window)

    recall = matches / total_first
    precision = matches / total_second
    denom = recall + precision
    with np.errstate(divide="ignore", invalid="ignore"):
        fscore = np.where(denom > 0, 2.0 * recall * precision / denom, 0.0)

    score = fscore if sort_by == 0 else recall
    # first maximum in row-major (dy from -w, dx from -w) == the reference's
    # stable descending sort over its scan order
    flat_best = int(np.argmax(score))
    by, bx = np.unravel_index(flat_best, score.shape)
    return (float(fscore[by, bx]), float(recall[by, bx]),
            float(precision[by, bx]), int(by) - max_window,
            int(bx) - max_window)


def _window_cross_correlation(ink1: np.ndarray, ink2: np.ndarray,
                              window: int) -> np.ndarray:
    """match_count[dy + w, dx + w] = #pixels where ink1 shifted by (dy, dx)
    overlaps ink2 — via FFT cross-correlation, center-cropped."""
    h, w = ink1.shape
    size = (h + 2 * window, w + 2 * window)
    f1 = np.fft.rfft2(ink1.astype(np.float64), size)
    f2 = np.fft.rfft2(ink2.astype(np.float64), size)
    corr = np.fft.irfft2(f1 * np.conj(f2), size)
    # corr[dy mod, dx mod] = sum ink1[y, x] * ink2[y - dy, x - dx]
    out = np.empty((2 * window + 1, 2 * window + 1), dtype=np.int64)
    for dy in range(-window, window + 1):
        for dx in range(-window, window + 1):
            out[dy + window, dx + window] = int(round(corr[dy % size[0],
                                                          dx % size[1]]))
    return out


def translation_alignment_scan(first: np.ndarray, second: np.ndarray,
                               max_window: int, content_lum: int = 255,
                               sort_by: int = 0) -> AlignInfo:
    """Direct per-displacement scan (reference semantics verbatim); used as
    the parity oracle for the FFT path in tests."""
    assert first.shape == second.shape and first.ndim == 2
    h, w = first.shape
    total_first = int(np.count_nonzero(first == content_lum))
    total_second = int(np.count_nonzero(second == content_lum))
    if total_first == 0 or total_second == 0:
        return 0.0, 0.0, 0.0, 0, 0

    results = []
    for dy in range(-max_window, max_window + 1):
        f_y0, f_y1 = max(0, dy), h + min(0, dy)
        s_y0, s_y1 = max(0, -dy), h + min(0, -dy)
        for dx in range(-max_window, max_window + 1):
            f_x0, f_x1 = max(0, dx), w + min(0, dx)
            s_x0, s_x1 = max(0, -dx), w + min(0, -dx)
            cut_first = first[f_y0:f_y1, f_x0:f_x1]
            cut_second = second[s_y0:s_y1, s_x0:s_x1]
            matches = int(np.count_nonzero((cut_first == cut_second) &
                                           (cut_first == content_lum)))
            recall = matches / total_first
            precision = matches / total_second
            fscore = (2 * recall * precision / (recall + precision)
                      if recall + precision > 0 else 0.0)
            results.append((fscore, recall, precision, dy, dx))

    results.sort(key=lambda r: r[sort_by], reverse=True)
    return results[0]


def keyframe_chain_alignments(keyframes, window: int,
                              min_fscore: float) -> list:
    """Pairwise alignments of consecutive binary keyframes; rejected when the
    f-score is too low (content changed too much) (reference:
    keyframes_alignments, evaluator.py:148-165)."""
    alignments = []
    for idx in range(len(keyframes) - 1):
        curr = keyframes[idx].binary_image[:, :, 0]
        nxt = keyframes[idx + 1].binary_image[:, :, 0]
        align = translation_alignment(curr, nxt, window, 0)
        if align[0] < min_fscore:
            align = (0, 0, 0, 0, 0)
        alignments.append(align)
    return alignments


def check_equivalent_cc(cc1: CC, cc2: CC, global_align: AlignInfo,
                        window: int, min_recall: float,
                        min_precision: float) -> bool:
    """Whether two CCs match under the global alignment plus a small local
    displacement search (reference: check_equivalent_cc, evaluator.py:20-56).
    """
    best = None
    for loc_dy in range(-window, window + 1):
        for loc_dx in range(-window, window + 1):
            dy = global_align[3] + loc_dy
            dx = global_align[4] + loc_dx
            shifted = CC(cc1.cc_id, cc1.min_x + dx, cc1.max_x + dx,
                         cc1.min_y + dy, cc1.max_y + dy, cc1.size, cc1.img)
            # strict-inequality box gate mirrors the reference (:32-33)
            if (shifted.min_x < cc2.max_x and cc2.min_x < shifted.max_x and
                    shifted.min_y < cc2.max_y and cc2.min_y < shifted.max_y):
                recall, precision = shifted.overlap_recall_precision(cc2)
                fscore = (2.0 * recall * precision / (recall + precision)
                          if recall + precision > 0 else 0.0)
                # lexicographic max over the full tuple matches the
                # reference's descending sort tie-breaking (:51-53)
                candidate = (fscore, recall, precision, loc_dx, loc_dy)
                if best is None or candidate > best:
                    best = candidate
    if best is None:
        return False
    return best[1] >= min_recall and best[2] >= min_precision
