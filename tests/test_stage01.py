"""Stage-01 smoke test: synthetic RGB frames through the (randomly
initialized) tiny model, checking artifact shape/polarity conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
from lecturemath_tpu.pipeline.binarize import (Binarizer, default_batch_size,
                                               resolve_model_size)
from lecturemath_tpu.pipeline.video import ArraySource
from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

TINY = FCNConfig(down_filters=(2, 3, 4, 5, 6), mid_filters=6,
                 upsample_filters=(2, 3, 4, 5, 6), up_filters=(2, 3, 4, 5, 6),
                 pixel_features=(4, 3), kernel_size=3, pixel_kernel_size=3)


def test_resolve_model_size():
    assert resolve_model_size(1920, 1080) == (1920, 1080)  # 2.07MP < cap
    assert resolve_model_size(2560, 1440) == (1280, 720)
    assert resolve_model_size(4000, 3000) == (1000, 750)
    assert default_batch_size(1920, 1080) >= 1


def test_process_source():
    model = FCNLectureNet(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    binarizer = Binarizer(model, variables, batch_size=2)

    rgb, binary_gt, _, _ = synthetic_rgb_lecture(seed=2, n_frames=5,
                                                 height=32, width=32,
                                                 glyphs_per_board=2,
                                                 glyph_size=(9, 9))
    source = ArraySource(rgb, fps=1.0)
    times, indices, binaries = binarizer.process_source(source)

    assert len(times) == len(indices) == len(binaries) == 5
    assert indices == list(range(5))
    assert binaries[0].shape == (32, 32)
    assert binaries[0].dtype == np.uint8
    assert set(np.unique(binaries[0]).tolist()) <= {0, 255}


def test_auto_batch_size():
    model = FCNLectureNet(TINY)
    import jax.numpy as jnp

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    binarizer = Binarizer(model, variables)  # batch_size=None -> auto

    rgb, _, _, _ = synthetic_rgb_lecture(seed=3, n_frames=3, height=32,
                                         width=32, glyphs_per_board=2,
                                         glyph_size=(9, 9))
    source = ArraySource(rgb, fps=1.0)
    times, indices, binaries = binarizer.process_source(source)
    assert len(binaries) == 3
    from lecturemath_tpu.pipeline.binarize import default_batch_size
    # capped auto batch for tiny frames (cap is link-adaptive: 96 local,
    # 32 behind a remote device tunnel)
    assert binarizer.batch_size == default_batch_size(32, 32)
    assert binarizer.batch_size in (32, 96)


def test_yuv420_upload_format():
    """YUV 4:2:0 upload: device-side I420->RGB matches cv2's own inverse
    within rounding, and the packed binarizer output over the yuv path
    matches the rgb path except for rare chroma-rounding flips."""
    import cv2
    import jax
    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig,
                                                       FCNLectureNet,
                                                       rgb_to_yuv420_host,
                                                       yuv420_to_rgb)
    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.utils.synthetic import (
        synthetic_rgb_lecture, threshold_binarizer_variables)

    rgb, _, _, _ = synthetic_rgb_lecture(seed=5, n_frames=4, height=96,
                                         width=128)
    planes = rgb_to_yuv420_host(rgb)
    assert planes.shape == (4, 144, 128)

    ours = np.asarray(yuv420_to_rgb(jnp.asarray(planes)))
    theirs = np.stack([cv2.cvtColor(p, cv2.COLOR_YUV2RGB_I420)
                       for p in planes])
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2

    config = FCNConfig(down_filters=(4, 6, 8, 10, 12), mid_filters=12,
                       upsample_filters=(3, 4, 6, 8, 10),
                       up_filters=(4, 5, 6, 8, 10), pixel_features=(5, 4),
                       kernel_size=3, pixel_kernel_size=3)
    model = FCNLectureNet(config, dtype=jnp.bfloat16)
    variables = threshold_binarizer_variables(config)

    rgb_bin = Binarizer(model, variables, batch_size=4, upload_format="rgb")
    yuv_bin = Binarizer(model, variables, batch_size=4,
                        upload_format="yuv420")
    assert yuv_bin.upload_format == "yuv420"

    from lecturemath_tpu.pipeline.video import ArraySource

    _, _, a = rgb_bin.process_source(ArraySource(rgb, fps=1.0))
    _, _, b = yuv_bin.process_source(ArraySource(rgb, fps=1.0))
    mismatch = np.mean([np.mean(x != y) for x, y in zip(a, b)])
    assert mismatch < 0.01, f"yuv path diverged: {mismatch}"


@pytest.mark.parametrize("seed", range(5))
def test_yuv420_roundtrip_fuzz(seed):
    """Random even geometries and content styles: the device-side I420
    reconstruction stays within OpenCV rounding of cv2's own YUV->RGB
    across the whole sweep (max 3 gray levels per channel; whiteboard-
    style low-chroma content is tighter)."""
    import cv2
    import jax.numpy as jnp

    from lecturemath_tpu.models.fcn_lecturenet import (rgb_to_yuv420_host,
                                                       yuv420_to_rgb)

    rng = np.random.default_rng(700 + seed)
    height = int(rng.integers(4, 60)) * 4        # I420 wants H % 4 == 0
    width = int(rng.integers(4, 80)) * 2
    if seed % 2:                                  # whiteboard-ish
        rgb = np.clip(rng.normal(220, 10, (2, height, width, 3)), 0,
                      255).astype(np.uint8)
        rgb[:, height // 4:height // 2, width // 4:width // 2] = 30
    else:                                         # saturated random color
        rgb = rng.integers(0, 256, (2, height, width, 3), np.uint8)

    planes = rgb_to_yuv420_host(rgb)
    ours = np.asarray(yuv420_to_rgb(jnp.asarray(planes)))
    theirs = np.stack([cv2.cvtColor(p, cv2.COLOR_YUV2RGB_I420)
                       for p in planes])
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 3, (seed, height, width, diff.max())
