"""Parity + speed of the vectorized check_equivalent_cc local-window search
vs the direct scan and vs the reference Evaluator.check_equivalent_cc
(reference: evaluator.py:20-56), and the keyframes_unique_cc equivalent
(reference: evaluator.py:58-146)."""

import time

import numpy as np
import pytest

from lecturemath_tpu.data.cc import CC, extract_ccs
from lecturemath_tpu.eval.aligner import (build_unique_cc_groups,
                                          check_equivalent_cc,
                                          check_equivalent_cc_scan)
from lecturemath_tpu.utils.synthetic import synthetic_lecture

from oracle import ensure_oracle


def _cc_pairs(seed: int, n_pairs: int = 60):
    """CC pairs at assorted relative offsets: same glyph jittered, different
    glyphs, plus randomly translated copies (near/at/over the window edge)."""
    rng = np.random.default_rng(seed)
    frames, _, _ = synthetic_lecture(seed=seed, n_frames=8, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=6, jitter=0.04)
    ccs = []
    for frame in frames:
        ccs.extend(extract_ccs(frame))
    assert len(ccs) >= 8

    pairs = []
    while len(pairs) < n_pairs:
        a = ccs[rng.integers(len(ccs))]
        b = ccs[rng.integers(len(ccs))]
        if rng.random() < 0.5:
            dx, dy = int(rng.integers(-6, 7)), int(rng.integers(-6, 7))
            b = CC(b.cc_id, a.min_x + dx, a.min_x + dx + b.width - 1,
                   a.min_y + dy, a.min_y + dy + b.height - 1, b.size, b.img)
        pairs.append((a, b))
    return pairs


ALIGNS = [(0.9, 0.9, 0.9, 0, 0), (0.8, 0.8, 0.8, -2, 3), (0.5, 0.5, 0.5, 5, -4)]
THRESHOLDS = [(0.5, 0.5), (0.925, 0.925), (0.0, 0.0)]


def test_vectorized_vs_scan():
    for seed in (0, 1):
        for a, b in _cc_pairs(seed):
            for align in ALIGNS:
                for window in (1, 3):
                    for min_r, min_p in THRESHOLDS:
                        got = check_equivalent_cc(a, b, align, window,
                                                  min_r, min_p)
                        want = check_equivalent_cc_scan(a, b, align, window,
                                                        min_r, min_p)
                        assert got == want, (align, window, min_r, min_p,
                                             (a.min_x, a.min_y, b.min_x,
                                              b.min_y))


def test_vs_reference_oracle():
    ensure_oracle()
    from AccessMath.evaluation.evaluator import Evaluator as RefEvaluator
    from AM_CommonTools.data.connected_component import ConnectedComponent

    def ref_cc(cc: CC) -> ConnectedComponent:
        return ConnectedComponent(cc.cc_id, cc.min_x, cc.max_x, cc.min_y,
                                  cc.max_y, cc.size, cc.img)

    for a, b in _cc_pairs(2, n_pairs=40):
        ra, rb = ref_cc(a), ref_cc(b)
        for align in ALIGNS:
            for min_r, min_p in THRESHOLDS:
                ours = check_equivalent_cc(a, b, align, 3, min_r, min_p)
                theirs = RefEvaluator.check_equivalent_cc(ra, rb, align, 3,
                                                          min_r, min_p)
                assert ours == bool(theirs)


def test_vectorized_faster_than_scan():
    """At the production local window (EvalParams.local_translation_window=3)
    the one-shot correlation beats the reference-shaped (2w+1)^2 rescan on
    both realistic glyph CCs and large dense blobs."""
    pairs = _cc_pairs(3, n_pairs=60)
    rng = np.random.default_rng(5)
    for _ in range(8):  # large-mask regime (exercises the popcount path)
        img_a = (rng.random((200, 300)) < 0.4).astype(np.uint8) * 255
        img_b = (rng.random((200, 300)) < 0.4).astype(np.uint8) * 255
        a = CC(0, 50, 349, 40, 239, int(np.count_nonzero(img_a)), img_a)
        dx, dy = int(rng.integers(-4, 5)), int(rng.integers(-4, 5))
        b = CC(1, 50 + dx, 349 + dx, 40 + dy, 239 + dy,
               int(np.count_nonzero(img_b)), img_b)
        pairs.append((a, b))
    align = (0.9, 0.9, 0.9, 1, -1)

    check_equivalent_cc(*pairs[0], align, 3, 0.5, 0.5)  # warm imports

    def best_of(fn, reps=3):
        timings = []
        for _ in range(reps):
            start = time.perf_counter()
            for a, b in pairs:
                fn(a, b, align, 3, 0.5, 0.5)
            timings.append(time.perf_counter() - start)
        return min(timings)  # min is robust to contention on the 1-core VM

    fast = best_of(check_equivalent_cc)
    slow = best_of(check_equivalent_cc_scan)
    assert fast < slow, f"correlation path {fast:.4f}s not faster than scan {slow:.4f}s"


def test_build_unique_cc_groups_vs_reference():
    ensure_oracle()
    from AccessMath.evaluation.evaluator import Evaluator as RefEvaluator
    from AccessMath.annotation.keyframe_annotation import KeyFrameAnnotation

    from lecturemath_tpu.eval.annotation import (KeyframeAnnotation,
                                                 UniqueCCGroup)

    frames, _, _ = synthetic_lecture(seed=4, n_frames=24, height=96,
                                     width=128, n_boards=2,
                                     glyphs_per_board=5, jitter=0.03)
    # 4 keyframes with growing/changing content (ink=0 polarity)
    binaries = [255 - frames[idx] for idx in (5, 11, 17, 23)]

    ours_kfs, ref_kfs = [], []
    for idx, binary in enumerate(binaries):
        raw = np.stack([binary] * 3, axis=-1)
        kf = KeyframeAnnotation("DB", "lec", idx, 1000.0 * idx, [], raw)
        kf.binary_image = np.stack([binary] * 3, axis=-1)
        kf.update_binary_cc(False)
        ours_kfs.append(kf)
        rkf = KeyFrameAnnotation("DB", "lec", idx, 1000.0 * idx, [], raw)
        rkf.binary_image = np.stack([binary] * 3, axis=-1)
        rkf.update_binary_cc(False)
        ref_kfs.append(rkf)

    our_groups, our_cc_groups = build_unique_cc_groups(
        ours_kfs, local_window=3, min_recall=0.8, min_precision=0.8)

    ref_aligns = RefEvaluator.keyframes_alignments(ref_kfs, 10, 0.3)
    ref_groups, ref_cc_groups = RefEvaluator.keyframes_unique_cc(
        ref_kfs, ref_aligns, 3, 0.8, 0.8)

    assert len(our_groups) == len(ref_groups)
    for mine, theirs in zip(our_groups, ref_groups):
        assert mine.start_frame == theirs.start_frame
        assert len(mine.cc_refs) == len(theirs.cc_refs)
        for cc_a, cc_b in zip(mine.cc_refs, theirs.cc_refs):
            assert (cc_a.min_x, cc_a.max_x, cc_a.min_y, cc_a.max_y,
                    cc_a.size) == (cc_b.min_x, cc_b.max_x, cc_b.min_y,
                                   cc_b.max_y, cc_b.size)

    # the groups serialize to a well-formed unique_ccs.xml from scratch
    xml = UniqueCCGroup.groups_to_xml(ours_kfs, our_groups)
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)
    assert len(root.find("CCGroups").findall("CCGroup")) == len(our_groups)
