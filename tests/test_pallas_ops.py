"""Pallas postprocess kernel vs the XLA expression (interpreter mode on the
CPU test backend)."""

import jax
import numpy as np

from lecturemath_tpu.ops.pallas_postprocess import (threshold_binarize,
                                                    threshold_binarize_xla)


def test_threshold_binarize_matches_xla():
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3, (2, 64, 128)).astype(np.float32)
    ours = np.asarray(threshold_binarize(logits, interpret=True))
    ref = np.asarray(threshold_binarize_xla(logits))
    np.testing.assert_array_equal(ours, ref)
    assert set(np.unique(ours).tolist()) <= {0, 255}


def test_threshold_binarize_uneven_rows():
    rng = np.random.default_rng(1)
    logits = rng.normal(0, 3, (1, 300, 128)).astype(np.float32)  # 300 % 256 != 0
    ours = np.asarray(threshold_binarize(logits, interpret=True))
    ref = np.asarray(threshold_binarize_xla(logits))
    np.testing.assert_array_equal(ours, ref)
