"""Training-step oracle parity: our Trainer vs the reference torch trainers.

Loads IDENTICAL weights into our flax Trainer and the reference torch
FCN_LectureNet (via the tested converter), feeds an IDENTICAL batch, takes
SGD steps in both, and asserts the updated parameters AND BatchNorm running
statistics match within fp32 tolerance — for all three curriculum phases:

  * reconstruction (Med-PT): MSE vs median target, net in train mode
    (reference: lecturenet_train_00_pretrain_reconstruction.py:144-156)
  * text_detector (TD-PT): BCE(text, labels) + BCE(binary, text_region) +
    MSE(rec, median), net in train mode, from scratch
    (reference: lecturenet_train_01_pretrain_text_detector.py:171-182)
  * binarizer: BCE(binary, GT) + BCE(text, text_mask), warm-started ->
    net.eval() so BatchNorm is frozen (running stats used, not updated)
    (reference: lecturenet_train_02_train_binarizer.py:164-188,235-244)

BN momentum/epsilon mapping (documented per VERDICT r3 item 1): torch
BatchNorm2d momentum 0.1 (ra = 0.9*ra + 0.1*batch) == our TorchBatchNorm
decay momentum 0.9; epsilon 1e-5 in both. torch accumulates the UNBIASED
batch variance (n/(n-1)) into running_var while normalizing with the biased
one — TorchBatchNorm reproduces exactly that (models/fcn_lecturenet.py).

The reference trainers construct SGD(lr, momentum=0.0) and call
nn.utils.clip_grad_norm_ ONCE at setup (before any backward — a no-op on
training); our Trainer therefore uses clip_norm=None.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lecturemath_tpu.models.convert import (flax_to_torch_state_dict,
                                            torch_state_dict_to_flax)
from lecturemath_tpu.models.fcn_lecturenet import FCNConfig, FCNLectureNet
from lecturemath_tpu.train.trainer import Trainer

from oracle import oracle_lecturenet_class
from test_convert_parity import TINY

LR = 0.05
STEPS = 3
B, H, W = 2, 32, 64


def _fresh_torch_net(cfg: FCNConfig, reconstruction_mode: bool, seed: int):
    """Reference net at the given widths, UNsaturated heads (training parity
    needs live gradients everywhere, unlike the forward-parity tests that
    spread logits), with BN running stats moved off the (0, 1) init."""
    FCN_LectureNet = oracle_lecturenet_class()
    torch.manual_seed(seed)
    d, us, uc = cfg.down_filters, cfg.upsample_filters, cfg.up_filters
    net = FCN_LectureNet(cfg.in_channels, d[0], d[1], d[2], d[3], d[4],
                         cfg.mid_filters,
                         us[4], uc[4], us[3], uc[3], us[2], uc[2],
                         us[1], uc[1], us[0], uc[0], cfg.kernel_size,
                         cfg.pixel_features[0], cfg.pixel_features[1],
                         cfg.pixel_kernel_size, reconstruction_mode)
    net.train()
    with torch.no_grad():
        for _ in range(2):
            net(torch.randn(2, cfg.in_channels, 32, 32))
    return net


def _make_batch(seed: int):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32),
        "target": (rng.random((B, H, W, 1)) > 0.6).astype(np.float32),
        "text_mask": (rng.random((B, H, W, 1)) > 0.5).astype(np.float32),
        "median": rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32),
    }


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _torch_steps(net, batch, phase: str, steps: int):
    """Mirror the reference trainers' per-minibatch step exactly
    (train_00:144-156, train_01:171-182, train_02:235-244)."""
    opt = torch.optim.SGD(net.parameters(), lr=LR, momentum=0.0)
    bce = torch.nn.BCEWithLogitsLoss(reduction="mean")
    bce2 = torch.nn.BCEWithLogitsLoss(reduction="mean")
    mse = torch.nn.MSELoss(reduction="mean")
    images = _nchw(batch["image"])
    losses = []
    for _ in range(steps):
        opt.zero_grad()
        if phase == "reconstruction":
            out_rec = net(images)
            loss = mse(out_rec, _nchw(batch["median"]))
        elif phase == "text_detector":
            out_bin, out_text, out_rec = net(images)
            mask_loss = bce(out_text, _nchw(batch["target"]))
            binary_loss = bce2(out_bin, _nchw(batch["text_mask"]))
            rec_loss = mse(out_rec, _nchw(batch["median"]))
            loss = binary_loss + mask_loss + rec_loss
        elif phase == "binarizer":
            out_bin, out_text, _ = net(images)
            loss = bce(out_bin, _nchw(batch["target"])) \
                + bce2(out_text, _nchw(batch["text_mask"]))
        else:
            raise ValueError(phase)
        loss.backward()
        opt.step()
        losses.append(float(loss.item()))
    return losses


def _our_steps(variables, batch, phase: str, freeze_bn: bool, steps: int,
               **trainer_kwargs):
    model = FCNLectureNet(
        TINY, reconstruction_mode=(phase == "reconstruction"),
        dtype=jnp.float32)
    trainer = Trainer(model, LR, phase=phase, freeze_bn=freeze_bn,
                      **trainer_kwargs)
    state = trainer.init_state(jax.random.PRNGKey(0), variables=variables)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(steps):
        state, metrics = trainer.step(state, jb)
        losses.append(float(jax.device_get(metrics["total"])))
    return state, losses


def _assert_state_dicts_close(ours_sd, ref_sd, rtol, atol):
    checked = 0
    for key, ref_val in ref_sd.items():
        if key.endswith("num_batches_tracked"):
            continue  # torch-only counter; unused at momentum=0.1
        ref_np = ref_val.detach().numpy()
        np.testing.assert_allclose(
            np.asarray(ours_sd[key], np.float32), ref_np,
            rtol=rtol, atol=atol, err_msg=f"mismatch at {key}")
        checked += 1
    assert checked > 60  # every conv/deconv/BN tensor was compared


def _run_phase_parity(phase: str, freeze_bn: bool, seed: int):
    net = _fresh_torch_net(TINY, phase == "reconstruction", seed)
    if freeze_bn:
        net.eval()   # the reference warm-start flow: .eval(), never .train()
    else:
        net.train()
    variables = torch_state_dict_to_flax(net.state_dict())
    batch = _make_batch(seed + 100)

    ref_losses = _torch_steps(net, batch, phase, STEPS)
    state, our_losses = _our_steps(variables, batch, phase, freeze_bn, STEPS)

    # per-step total loss trajectory
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4, atol=1e-6)

    ours_sd = flax_to_torch_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    _assert_state_dicts_close(ours_sd, net.state_dict(), rtol=5e-4, atol=3e-6)
    return our_losses, ref_losses


def test_reconstruction_step_parity():
    """Med-PT: one+N SGD steps, BN in train mode (batch stats + unbiased
    running-var accumulation). Also exercises the reconstruction_mode
    early-return: head params must stay EXACTLY untouched in both."""
    net = _fresh_torch_net(TINY, True, seed=11)
    variables = torch_state_dict_to_flax(net.state_dict())
    batch = _make_batch(111)

    ref_losses = _torch_steps(net, batch, "reconstruction", STEPS)
    state, our_losses = _our_steps(variables, batch, "reconstruction",
                                   False, STEPS)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4, atol=1e-6)

    ours_sd = flax_to_torch_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    ref_sd = net.state_dict()
    _assert_state_dicts_close(ours_sd, ref_sd, rtol=5e-4, atol=3e-6)

    # heads not on the reconstruction path: bit-identical to pre-training
    for key in ("conv_out.0.weight", "conv_pixels_1.0.weight",
                "conv_text_mask_out.0.weight", "conv_out.1.running_mean"):
        np.testing.assert_array_equal(
            np.asarray(ours_sd[key], np.float32),
            variables_to_ref(variables)[key],
            err_msg=f"{key} should be untouched by reconstruction training")


def variables_to_ref(variables):
    return {k: np.asarray(v, np.float32)
            for k, v in flax_to_torch_state_dict(variables).items()}


def test_text_detector_step_parity():
    """TD-PT from scratch: triple loss (BCE+BCE+MSE), BN in train mode."""
    _run_phase_parity("text_detector", freeze_bn=False, seed=22)


def test_binarizer_step_parity_frozen_bn():
    """Final phase with the reference's warm-start semantics: .eval() keeps
    BN on running stats (frozen) while scale/bias still receive gradients;
    running_mean/var must come out bit-identical to pre-training."""
    net = _fresh_torch_net(TINY, False, seed=33)
    net.eval()
    variables = torch_state_dict_to_flax(net.state_dict())
    pre = variables_to_ref(variables)
    batch = _make_batch(133)

    ref_losses = _torch_steps(net, batch, "binarizer", STEPS)
    state, our_losses = _our_steps(variables, batch, "binarizer", True, STEPS)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4, atol=1e-6)

    ours_sd = flax_to_torch_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    ref_sd = net.state_dict()
    _assert_state_dicts_close(ours_sd, ref_sd, rtol=5e-4, atol=3e-6)

    for key in ref_sd:
        if key.endswith(("running_mean", "running_var")):
            np.testing.assert_array_equal(
                np.asarray(ours_sd[key], np.float32), pre[key],
                err_msg=f"{key} must stay frozen under eval()")


def test_binarizer_step_parity_train_bn():
    """Final phase trained from scratch (no warm start): BN in train mode,
    the running stats themselves must track torch's unbiased accumulation."""
    _run_phase_parity("binarizer", freeze_bn=False, seed=44)


@pytest.mark.slow
def test_binarizer_step_parity_production_widths():
    """One SGD step at the widths users actually train (48..768, pixel head
    k=7) on tiny spatial dims: toy-width step parity does not imply this —
    BN statistic magnitudes and accumulation order change with width. Wider
    accumulation means slightly looser (but still fp32-tight) tolerances."""
    prod = FCNConfig()
    net = _fresh_torch_net(prod, False, seed=55)
    net.train()
    variables = torch_state_dict_to_flax(net.state_dict())
    batch = _make_batch(155)

    ref_losses = _torch_steps(net, batch, "binarizer", 1)

    model = FCNLectureNet(prod, dtype=jnp.float32)
    trainer = Trainer(model, LR, phase="binarizer", freeze_bn=False)
    state = trainer.init_state(jax.random.PRNGKey(0), variables=variables)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = trainer.step(state, jb)
    np.testing.assert_allclose(float(jax.device_get(metrics["total"])),
                               ref_losses[0], rtol=5e-4)

    ours_sd = flax_to_torch_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    _assert_state_dicts_close(ours_sd, net.state_dict(), rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("fast_kwargs", [
    {"fold_frozen_bn": True},
    {"fold_frozen_bn": True, "s2d_heads": True},
], ids=["fold", "fold+s2d"])
def test_frozen_bn_fast_paths_match_torch(fast_kwargs):
    """The frozen-BN training fast paths — traced BN folding, and the
    s2d-domain head convs on top — are graph rewrites of the same math:
    the SGD trajectory must still match the torch reference within fp32
    tolerance (slightly looser than the plain path: the fold reassociates
    the per-channel scaling)."""
    net = _fresh_torch_net(TINY, False, seed=66)
    net.eval()
    variables = torch_state_dict_to_flax(net.state_dict())
    batch = _make_batch(166)

    ref_losses = _torch_steps(net, batch, "binarizer", STEPS)
    state, our_losses = _our_steps(variables, batch, "binarizer", True,
                                   STEPS, **fast_kwargs)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-4, atol=1e-6)

    ours_sd = flax_to_torch_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    _assert_state_dicts_close(ours_sd, net.state_dict(), rtol=2e-3, atol=1e-5)


def test_s2d_train_mode_matches_torch():
    """The s2d TRAIN-mode path (PhaseBatchNorm: live batch statistics
    reduced over the phase axis) takes the same SGD trajectory as torch —
    params AND updated running stats — within fp32 association error."""
    net = _fresh_torch_net(TINY, False, seed=77)
    net.train()
    variables = torch_state_dict_to_flax(net.state_dict())
    batch = _make_batch(177)

    ref_losses = _torch_steps(net, batch, "binarizer", STEPS)

    model = FCNLectureNet(TINY, dtype=jnp.float32, s2d_train=True)
    trainer = Trainer(model, LR, phase="binarizer")
    state = trainer.init_state(jax.random.PRNGKey(0), variables=variables)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    our_losses = []
    for _ in range(STEPS):
        state, metrics = trainer.step(state, jb)
        our_losses.append(float(jax.device_get(metrics["total"])))
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-4, atol=1e-6)

    ours_sd = flax_to_torch_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    _assert_state_dicts_close(ours_sd, net.state_dict(), rtol=2e-3, atol=1e-5)
