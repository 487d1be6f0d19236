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
