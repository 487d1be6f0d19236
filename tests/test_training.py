"""Training stack: dataset augmentation outputs, phase losses, and a few
optimization steps on the tiny model per phase."""

import jax
import numpy as np
import pytest

from lecturemath_tpu.core.config import Config
from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
from lecturemath_tpu.train.dataset import LectureNetDataset
from lecturemath_tpu.train.trainer import (Trainer, reset_main_branches,
                                           init_variables_for)
from lecturemath_tpu.utils.synthetic import synthetic_rgb_lecture

TINY = FCNConfig(down_filters=(2, 3, 4, 5, 6), mid_filters=6,
                 upsample_filters=(2, 3, 4, 5, 6), up_filters=(2, 3, 4, 5, 6),
                 pixel_features=(4, 3), kernel_size=3, pixel_kernel_size=3)


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("train_data")
    rgb, binary, _, _ = synthetic_rgb_lecture(seed=0, n_frames=6, height=96,
                                              width=128)
    images, gts = [], []
    for k in range(6):
        img_path = str(root / f"img_{k}.png")
        gt_path = str(root / f"gt_{k}.png")
        cv2.imwrite(img_path, rgb[k][:, :, ::-1])
        cv2.imwrite(gt_path, np.stack([255 - binary[k]] * 3, axis=-1))
        images.append(img_path)
        gts.append(gt_path)
    return images, gts


def make_dataset(images, gts, **kwargs):
    defaults = dict(crop_size=(64, 64), crop_min_fg_prc=0.01,
                    flip_chance=0.5, color_invert_chance=0.5,
                    color_change_chance=0.5, luminosity_change_chance=0.5,
                    gaussian_noise_chance=0.5, weight_expansion=1,
                    text_mask_expansion=3, reconstruct_median=True,
                    reconstruct_median_k=5, seed=3)
    defaults.update(kwargs)
    return LectureNetDataset(images, gts, **defaults)


def test_dataset_sample_contents(image_files):
    images, gts = image_files
    dataset = make_dataset(images, gts)
    sample = dataset.sample(0)

    assert sample["image"].shape == (64, 64, 3)
    assert -1.0 <= sample["image"].min() and sample["image"].max() <= 1.0
    assert sample["target"].shape == (64, 64, 1)
    assert set(np.unique(sample["target"])) <= {0.0, 1.0}
    assert sample["text_mask"].shape == (64, 64, 1)
    assert sample["weights"].shape == (64, 64, 1)
    assert sample["weights"].min() >= 1.0
    assert sample["median"].shape == (64, 64, 3)


def test_dataset_batches(image_files):
    images, gts = image_files
    dataset = make_dataset(images, gts)
    batches = list(dataset.batches(2))
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 64, 64, 3)


def test_dataset_preload_round_trip(image_files):
    images, gts = image_files
    dataset = make_dataset(images, gts, crop_size=None, flip_chance=None,
                           color_invert_chance=None, color_change_chance=None,
                           luminosity_change_chance=None,
                           gaussian_noise_chance=None)
    direct = dataset.sample(1)["image"]
    dataset.preload()
    assert dataset.total_foreground > 0
    preloaded = dataset.sample(1)["image"]
    np.testing.assert_allclose(direct, preloaded)


@pytest.mark.parametrize("phase", ["reconstruction", "binarizer"])
def test_phase_training_reduces_loss(image_files, phase):
    images, gts = image_files
    model = FCNLectureNet(TINY, reconstruction_mode=(phase == "reconstruction"))
    trainer = Trainer(model, learning_rate=0.05, phase=phase)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))

    dataset = make_dataset(images, gts, crop_size=(32, 32), seed=0,
                           color_invert_chance=None,
                           luminosity_change_chance=None,
                           gaussian_noise_chance=None,
                           color_change_chance=None)
    batch = next(dataset.batches(4, shuffle=False))

    losses = []
    for _ in range(8):
        state, metrics = trainer.step(state, batch)
        losses.append(float(jax.device_get(metrics["total"])))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_bf16_training_tracks_fp32(image_files):
    """Mixed-precision training (bf16 compute, fp32 master params/BN/loss)
    must track the fp32 trajectory on the same batch: per-step losses within
    5% and the loss still decreasing. The bf16 model shares the fp32 init
    (param init is precision-independent)."""
    import jax.numpy as jnp

    images, gts = image_files
    dataset = make_dataset(images, gts, crop_size=(32, 32), seed=0,
                           color_invert_chance=None,
                           luminosity_change_chance=None,
                           gaussian_noise_chance=None,
                           color_change_chance=None)
    batch = next(dataset.batches(4, shuffle=False))

    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model = FCNLectureNet(TINY, dtype=dtype)
        trainer = Trainer(model, learning_rate=0.05, phase="binarizer")
        state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
        run = []
        for _ in range(8):
            state, metrics = trainer.step(state, batch)
            run.append(float(jax.device_get(metrics["total"])))
        losses[dtype.__name__] = run

    fp32, bf16 = np.asarray(losses["float32"]), np.asarray(losses["bfloat16"])
    assert np.isfinite(bf16).all()
    assert bf16[-1] < bf16[0]
    np.testing.assert_allclose(bf16, fp32, rtol=0.05)


def test_bf16_bn_training_tracks_fp32(image_files):
    """bn_dtype=bf16 (BN statistics reduced + normalized in bfloat16,
    running buffers still fp32) must track the fp32 trajectory: losses
    finite, decreasing, and within 7% per step — slightly looser than the
    plain-bf16 bound since the normalization itself is now low-precision.
    Running buffers must stay fp32 dtype."""
    import jax.numpy as jnp

    images, gts = image_files
    dataset = make_dataset(images, gts, crop_size=(32, 32), seed=0,
                           color_invert_chance=None,
                           luminosity_change_chance=None,
                           gaussian_noise_chance=None,
                           color_change_chance=None)
    batch = next(dataset.batches(4, shuffle=False))

    losses = {}
    for label, kwargs in (("fp32", {}),
                          ("bf16_bn", {"dtype": jnp.bfloat16,
                                       "bn_dtype": jnp.bfloat16}),
                          ("bf16_bn_s2d", {"dtype": jnp.bfloat16,
                                           "bn_dtype": jnp.bfloat16,
                                           "s2d_train": True})):
        model = FCNLectureNet(TINY, **kwargs)
        trainer = Trainer(model, learning_rate=0.05, phase="binarizer")
        state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
        run = []
        for _ in range(8):
            state, metrics = trainer.step(state, batch)
            run.append(float(jax.device_get(metrics["total"])))
        losses[label] = run
        final_stats = jax.device_get(state.batch_stats)
        assert all(
            leaf.dtype == np.float32
            for leaf in jax.tree_util.tree_leaves(final_stats)), label

    fp32 = np.asarray(losses["fp32"])
    for label in ("bf16_bn", "bf16_bn_s2d"):
        bf16 = np.asarray(losses[label])
        assert np.isfinite(bf16).all(), label
        # strictly decreasing every step: it learns, not just wanders
        assert (np.diff(bf16) < 0).all(), (label, bf16)
        # early steps track fp32 tightly; the low-precision normalization
        # then compounds (measured: 12% by step 8 on this tiny net), so
        # bound the tail looser rather than pretending it doesn't drift
        np.testing.assert_allclose(bf16[:4], fp32[:4], rtol=0.07,
                                   err_msg=label)
        np.testing.assert_allclose(bf16, fp32, rtol=0.2, err_msg=label)


def test_run_phase_train_precision(image_files, tmp_path):
    """TRAIN_PRECISION=bf16 selects the mixed-precision model in run_phase
    (checkpoint still saves fp32 master params); bad values raise."""
    from lecturemath_tpu.train.trainer import run_phase

    images, gts = image_files
    config = Config({
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_1": 2,
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_2": 3,
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_3": 4,
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_4": 5,
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_5": 6,
        "FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE": 6,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_5": 6,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_5": 6,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_4": 5,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_4": 5,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_3": 4,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_3": 4,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_2": 3,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_2": 3,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_1": 2,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_1": 2,
        "FCN_BINARIZER_NET_PIXEL_FEATURES_1": 4,
        "FCN_BINARIZER_NET_PIXEL_FEATURES_2": 3,
        "FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE": 3,
        "FCN_BINARIZER_NET_KERNEL_SIZE": 3,
        "FCN_BINARIZER_TRAIN_CROP_SIZE": (32, 32),
        "FCN_BINARIZER_TRAIN_LEARNING_RATE": 0.01,
        "FCN_BINARIZER_TRAIN_OUTPUT": str(tmp_path / "bin_bf16.msgpack"),
        "TRAIN_PRECISION": "bf16",
    })
    dataset = make_dataset(images, gts, crop_size=(32, 32))
    path = run_phase(config, "binarizer", dataset, epochs_override=1,
                     batch_size_override=2, verbose=False)
    from lecturemath_tpu.pipeline.binarize import load_checkpoint_variables

    variables = load_checkpoint_variables(path)
    kernel = np.asarray(variables["params"]["down_1"]["conv"]["kernel"])
    assert kernel.dtype == np.float32  # master params stay fp32

    config.set("TRAIN_PRECISION", "fp16")
    with pytest.raises(ValueError, match="TRAIN_PRECISION"):
        run_phase(config, "binarizer", dataset, epochs_override=1,
                  batch_size_override=2, verbose=False)


def test_freeze_bn_keeps_stats(image_files):
    images, gts = image_files
    model = FCNLectureNet(TINY)
    trainer = Trainer(model, learning_rate=0.01, phase="binarizer",
                      freeze_bn=True)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))

    dataset = make_dataset(images, gts, crop_size=(32, 32), seed=1)
    batch = next(dataset.batches(2, shuffle=False))
    # snapshot BEFORE stepping: the train step donates the incoming state's
    # buffers (trainer.py make_train_step), so they are unusable afterwards
    before = np.asarray(state.batch_stats["down_1"]["bn"]["mean"])
    kernel_before = np.asarray(state.params["down_1"]["conv"]["kernel"])
    new_state, _ = trainer.step(state, batch)
    after = np.asarray(new_state.batch_stats["down_1"]["bn"]["mean"])
    np.testing.assert_array_equal(before, after)
    # params still train
    assert not np.allclose(
        kernel_before,
        np.asarray(new_state.params["down_1"]["conv"]["kernel"]))


def test_reset_main_branches():
    variables = init_variables_for(TINY, jax.random.PRNGKey(0))
    reset = reset_main_branches(variables, TINY, jax.random.PRNGKey(7))

    # trunk unchanged
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["down_1"]["conv"]["kernel"]),
        np.asarray(reset["params"]["down_1"]["conv"]["kernel"]))
    # heads re-initialized
    assert not np.allclose(
        np.asarray(variables["params"]["out_conv"]["kernel"]),
        np.asarray(reset["params"]["out_conv"]["kernel"]))


def test_run_phase_curriculum(image_files, tmp_path):
    """Full curriculum through run_phase: rec pretrain -> binarizer with
    warm start + head reset, including .bak checkpoints and resume file."""
    import os

    from lecturemath_tpu.core.config import Config
    from lecturemath_tpu.train.trainer import run_phase

    images, gts = image_files
    config = Config({
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_1": 2,
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_2": 3,
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_3": 4,
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_4": 5,
        "FCN_BINARIZER_NET_DOWN_CONV_FILTERS_5": 6,
        "FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE": 6,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_5": 6,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_5": 6,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_4": 5,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_4": 5,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_3": 4,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_3": 4,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_2": 3,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_2": 3,
        "FCN_BINARIZER_NET_UPSAMPLE_FILTERS_1": 2,
        "FCN_BINARIZER_NET_UP_CONV_FILTERS_1": 2,
        "FCN_BINARIZER_NET_PIXEL_FEATURES_1": 4,
        "FCN_BINARIZER_NET_PIXEL_FEATURES_2": 3,
        "FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE": 3,
        "FCN_BINARIZER_NET_KERNEL_SIZE": 3,
        "FCN_BINARIZER_TRAIN_CROP_SIZE": (32, 32),
        "FCN_BINARIZER_PRETRAIN_REC_LEARNING_RATE": 0.01,
        "FCN_BINARIZER_TRAIN_LEARNING_RATE": 0.01,
        "FCN_BINARIZER_PRETRAIN_RECONSTRUCTION_OUTPUT":
            str(tmp_path / "rec.msgpack"),
        "FCN_BINARIZER_TRAIN_OUTPUT": str(tmp_path / "bin.msgpack"),
    })

    rec_dataset = make_dataset(images, None, crop_size=(32, 32),
                               weight_expansion=None, text_mask_expansion=None)
    rec_dataset.reconstruction_mode = True
    rec_path = run_phase(config, "reconstruction", rec_dataset,
                         epochs_override=2, batch_size_override=2,
                         verbose=False)
    assert os.path.exists(rec_path)
    assert os.path.exists(rec_path + ".epoch_2.bak")
    assert os.path.isdir(rec_path + ".resume")

    bin_dataset = make_dataset(images, gts, crop_size=(32, 32))
    bin_path = run_phase(config, "binarizer", bin_dataset,
                         warm_start_path=rec_path,
                         warm_start_is_reconstruction=True,
                         epochs_override=1, batch_size_override=2,
                         verbose=False)
    assert os.path.exists(bin_path)

    # the saved checkpoint loads back into a Binarizer
    from lecturemath_tpu.pipeline.binarize import load_checkpoint_variables

    variables = load_checkpoint_variables(bin_path)
    assert "params" in variables and "batch_stats" in variables
