"""Downscale-placement matrix for the >max-pixels halving rule.

The reference halves host-side with PIL LANCZOS while the pixel count
exceeds 2.5 MP (reference: FCN_lecturenet.py:434-437; note 1920x1080 is
2.07 MP — real lectures run the net UNHALVED there). Ours adds two
alternative placements measured in bench.py --1080p:
  * host 'area' filter (cv2 INTER_AREA — ~10x faster on a 1-core host)
  * 'device' placement (full-res upload, on-chip box halving)
Host-lanczos stays the default (reference parity). These tests pin the
semantics: every placement produces full-size output frames, the halving
count follows max_model_pixels, and the alternative filters stay within a
small pixel-disagreement bound of the parity path on a threshold-head
model (they are different resamplers, not different pipelines).
"""

import numpy as np
import pytest

from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
from lecturemath_tpu.pipeline.binarize import Binarizer, resolve_model_size
from lecturemath_tpu.pipeline.video import ArraySource
from lecturemath_tpu.utils.synthetic import (synthetic_rgb_lecture,
                                             threshold_binarizer_variables)

TINY = FCNConfig(down_filters=(4, 6, 8, 10, 12), mid_filters=12,
                 upsample_filters=(3, 4, 6, 8, 10),
                 up_filters=(4, 5, 6, 8, 10),
                 pixel_features=(5, 4), kernel_size=3, pixel_kernel_size=7)

# 256x192 = 49,152 px with a 16,384-px cap -> exactly one halving to 128x96
W, H = 256, 192
CAP = 16_384


@pytest.fixture(scope="module")
def workload():
    model = FCNLectureNet(TINY)
    variables = threshold_binarizer_variables(TINY)
    rgb, clean, _, _ = synthetic_rgb_lecture(
        seed=4, n_frames=6, height=H, width=W, n_boards=2,
        glyphs_per_board=8, glyph_size=(24, 32))
    return model, variables, rgb, clean


def _run(model, variables, rgb, **kwargs):
    kwargs.setdefault("max_model_pixels", CAP)
    binarizer = Binarizer(model, variables, batch_size=3,
                          upload_format="rgb", **kwargs)
    _, _, frames = binarizer.process_source(ArraySource(rgb), invert=False)
    return np.stack(frames)


def test_halving_count_follows_cap():
    assert resolve_model_size(W, H, CAP) == (128, 96)
    assert resolve_model_size(W, H) == (W, H)  # default 2.5MP cap: unhalved
    assert resolve_model_size(1920, 1080) == (1920, 1080)  # 2.07MP < 2.5MP


def test_placements_agree(workload):
    model, variables, rgb, _ = workload
    lanczos = _run(model, variables, rgb)  # default host/lanczos
    area = _run(model, variables, rgb, downscale_filter="area")
    device = _run(model, variables, rgb, downscale="device")

    assert lanczos.shape == area.shape == device.shape == \
        (len(rgb), H, W)  # all full-size output
    for name, other in (("area", area), ("device", device)):
        mismatch = float(np.mean(lanczos != other))
        assert mismatch < 0.03, f"{name} diverged {mismatch:.3f} from lanczos"
    # area (cv2 box mean) vs device (on-chip box mean) should be nearly
    # identical — same resampler, different placement
    assert float(np.mean(area != device)) < 0.005


def test_reused_binarizer_refreshes_halving_count(workload):
    """A reused Binarizer must rebuild its packed fn when the needed
    on-device halving count CHANGES between sources (a stale halving fn
    would shrink a below-cap lecture), and must NOT re-jit when the
    (format, halvings) key is unchanged — a fresh jit object per stream
    means a full retrace+compile per lecture."""
    model, variables, rgb, _ = workload
    small = np.ascontiguousarray(rgb[:, :96, :128])  # 12,288 px < CAP

    binarizer = Binarizer(model, variables, batch_size=3,
                          upload_format="rgb", downscale="device",
                          max_model_pixels=CAP)
    _, _, big1 = binarizer.process_source(ArraySource(rgb), invert=False)
    fn_after_big = binarizer._packed_fn
    _, _, big2 = binarizer.process_source(ArraySource(rgb), invert=False)
    assert binarizer._packed_fn is fn_after_big  # same key: no re-jit
    _, _, got_small = binarizer.process_source(ArraySource(small),
                                               invert=False)

    fresh = Binarizer(model, variables, batch_size=3, upload_format="rgb",
                      downscale="device", max_model_pixels=CAP)
    _, _, want_small = fresh.process_source(ArraySource(small), invert=False)
    assert np.array_equal(np.stack(got_small), np.stack(want_small))
    assert np.array_equal(np.stack(big2), np.stack(big1))


def test_device_placement_matches_host_box_filter_exactly_unhalved(workload):
    # below the cap no halving runs anywhere: all placements are the same
    # graph and must agree bit-for-bit
    model, variables, rgb, _ = workload
    host = _run(model, variables, rgb, max_model_pixels=10_000_000)
    device = _run(model, variables, rgb, downscale="device",
                  max_model_pixels=10_000_000)
    assert np.array_equal(host, device)
