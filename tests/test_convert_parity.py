"""Numeric forward parity of the torch->flax checkpoint converter.

Builds the reference torch FCN_LectureNet (from /root/reference, tiny
widths), converts its randomly-initialized state_dict with models.convert,
and asserts our fp32 forward matches the torch forward — through the heads
(bin/text/rec logits) and through the full ``binarize()`` inference entry
including the >2.5MP LANCZOS halving + INTER_NEAREST resize-back path
(reference: FCN_lecturenet.py:430-505,607-659).

This is the test that would catch BatchNorm eps/momentum mistakes,
ConvTranspose layout mistakes, and SAME-padding mismatches.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lecturemath_tpu.models.convert import torch_state_dict_to_flax
from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig, FCNLectureNet,
                                                   make_binarizer)

from oracle import oracle_lecturenet_class

TINY = FCNConfig(down_filters=(4, 6, 8, 10, 12), mid_filters=12,
                 upsample_filters=(3, 4, 6, 8, 10),
                 up_filters=(4, 5, 6, 8, 10),
                 pixel_features=(5, 4), kernel_size=3, pixel_kernel_size=7)


def _build_torch_net(cfg: FCNConfig, seed: int = 0):
    """Reference net with the same widths, non-trivial BN running stats."""
    FCN_LectureNet = oracle_lecturenet_class()
    torch.manual_seed(seed)
    d = cfg.down_filters
    us = cfg.upsample_filters
    uc = cfg.up_filters
    net = FCN_LectureNet(cfg.in_channels, d[0], d[1], d[2], d[3], d[4],
                         cfg.mid_filters,
                         us[4], uc[4], us[3], uc[3], us[2], uc[2],
                         us[1], uc[1], us[0], uc[0], cfg.kernel_size,
                         cfg.pixel_features[0], cfg.pixel_features[1],
                         cfg.pixel_kernel_size, False)

    # populate BN running stats away from the (0, 1) init so the test
    # actually exercises running_mean/var conversion + inference semantics
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(torch.randn(2, cfg.in_channels, 64, 64))
    net.eval()

    # spread the binarization logits away from 0: a fresh net's sigmoid
    # output hovers at the 128/255 threshold, which would make the binary
    # comparison all near-boundary noise instead of a real parity check
    with torch.no_grad():
        net.conv_out[1].weight.fill_(25.0)
        net.conv_out[1].bias.uniform_(-3.0, 3.0)
        net.conv_text_mask_out[1].weight.fill_(25.0)
        net.conv_text_mask_out[1].bias.uniform_(-3.0, 3.0)
    return net


@pytest.fixture(scope="module")
def converted_pair():
    net = _build_torch_net(TINY)
    variables = torch_state_dict_to_flax(net.state_dict())
    model = FCNLectureNet(TINY, dtype=jnp.float32)
    return net, model, variables


def test_forward_logits_parity(converted_pair):
    """Raw 3-head forward: torch NCHW vs our NHWC, fp32, tight tolerance."""
    net, model, variables = converted_pair
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, (2, 64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        t_bin, t_text, t_rec = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_bin = t_bin.numpy().transpose(0, 2, 3, 1)
    t_text = t_text.numpy().transpose(0, 2, 3, 1)
    t_rec = t_rec.numpy().transpose(0, 2, 3, 1)

    j_bin, j_text, j_rec = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(j_rec), t_rec, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_text), t_text, atol=5e-3)
    np.testing.assert_allclose(np.asarray(j_bin), t_bin, atol=5e-3)


def _binary_mismatch_fraction(ours: np.ndarray, theirs: np.ndarray) -> float:
    assert ours.shape == theirs.shape
    return float(np.mean(ours != theirs))


def test_binarize_parity_no_halving(converted_pair):
    """Full binarize() path at <=2.5MP: exact same size reaches the net."""
    from PIL import Image

    net, model, variables = converted_pair
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (224, 320, 3), dtype=np.uint8)

    t_bin, t_text, _ = net.binarize(Image.fromarray(rgb), return_others=True,
                                    force_binary=True)

    binarize = make_binarizer(model, variables, force_binary=True)
    j_bin, j_text, _ = binarize(jnp.asarray(rgb[None]))

    assert _binary_mismatch_fraction(np.asarray(j_bin[0]), t_bin) < 0.002
    assert _binary_mismatch_fraction(np.asarray(j_text[0]), t_text) < 0.002


def test_binarize_parity_halving_path(converted_pair):
    """>2.5MP: LANCZOS halving in, INTER_NEAREST resize-back out — via the
    production Binarizer.process_source (packed bits + resize + invert)."""
    from PIL import Image

    from lecturemath_tpu.pipeline.binarize import Binarizer
    from lecturemath_tpu.pipeline.video import ArraySource

    net, model, variables = converted_pair
    rng = np.random.default_rng(2)
    # 2560x1280 = 3.3MP -> one halving -> 1280x640 (multiple of 32)
    rgb = rng.integers(0, 256, (1, 1280, 2560, 3), dtype=np.uint8)

    t_bin = net.binarize(Image.fromarray(rgb[0]), force_binary=True)
    assert t_bin.shape == (1280, 2560)

    binarizer = Binarizer(model, variables, batch_size=1)
    _, _, binaries = binarizer.process_source(ArraySource(rgb, fps=1.0),
                                              invert=False)
    assert binaries[0].shape == (1280, 2560)
    assert _binary_mismatch_fraction(binaries[0], t_bin) < 0.002


def test_flax_to_torch_roundtrip(converted_pair, tmp_path):
    """Export flax variables back to a reference-loadable state_dict: the
    reference net loads it (strict) and produces the same forward."""
    from lecturemath_tpu.models.convert import save_torch_checkpoint

    net, model, variables = converted_pair
    path = tmp_path / "exported.dat"
    save_torch_checkpoint(variables, str(path))

    reloaded = _build_torch_net(TINY, seed=99)  # different init
    state = torch.load(str(path), map_location="cpu", weights_only=True)
    reloaded.load_state_dict(state, strict=True)
    reloaded.eval()

    rng = np.random.default_rng(7)
    x = rng.uniform(-1.0, 1.0, (1, 32, 64, 3)).astype(np.float32)
    with torch.no_grad():
        a = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        b = reloaded(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for ta, tb in zip(a, b):
        np.testing.assert_allclose(tb.numpy(), ta.numpy(), atol=1e-6)


@pytest.mark.slow
def test_forward_parity_production_widths():
    """Converter parity at the widths users actually run (48..768, the
    released-model architecture): the reference torch net at production
    capacity, converted, must match our fp32 forward on a small image and
    agree through binarize(). Toy-width parity does not imply this — BN
    statistic magnitudes, padding interactions, and accumulation order all
    change with width (VERDICT r2 item 4)."""
    from PIL import Image

    prod = FCNConfig()  # production widths 48..768, pixel head k=7
    net = _build_torch_net(prod)
    variables = torch_state_dict_to_flax(net.state_dict())
    model = FCNLectureNet(prod, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    x = rng.uniform(-1.0, 1.0, (1, 128, 192, 3)).astype(np.float32)

    with torch.no_grad():
        t_bin, t_text, t_rec = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_bin = t_bin.numpy().transpose(0, 2, 3, 1)
    t_text = t_text.numpy().transpose(0, 2, 3, 1)
    t_rec = t_rec.numpy().transpose(0, 2, 3, 1)

    forward = jax.jit(lambda v, img: model.apply(v, img, train=False))
    j_bin, j_text, j_rec = forward(variables, jnp.asarray(x))

    # rec is bounded by tanh; bin/text logits are spread by the fill_(25)
    # head (magnitudes O(100) at 768-ch accumulation) -> relative tolerance
    np.testing.assert_allclose(np.asarray(j_rec), t_rec, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_text), t_text,
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(j_bin), t_bin,
                               rtol=1e-3, atol=5e-2)

    # full binarize() entry (prepare_image, sigmoid, threshold@128)
    rgb = rng.integers(0, 256, (160, 224, 3), dtype=np.uint8)
    t_binary = net.binarize(Image.fromarray(rgb), force_binary=True)
    binarize = make_binarizer(model, variables, force_binary=True)
    j_binary, _, _ = binarize(jnp.asarray(rgb[None]))
    assert _binary_mismatch_fraction(np.asarray(j_binary[0]),
                                     t_binary) < 0.002


def test_checkpoint_file_roundtrip(converted_pair, tmp_path):
    """torch.save(state_dict) -> load_torch_checkpoint == direct conversion
    (covers the file-level loader used by Binarizer.from_config)."""
    from lecturemath_tpu.models.convert import load_torch_checkpoint

    net, _, variables = converted_pair
    path = tmp_path / "LectureNet_model_BIN_tiny.dat"
    torch.save(net.state_dict(), str(path))
    loaded = load_torch_checkpoint(str(path))

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(loaded)}
    for path_key, value in flat_a:
        np.testing.assert_array_equal(np.asarray(value),
                                      np.asarray(flat_b[jax.tree_util.keystr(path_key)]))


@pytest.mark.parametrize("cfg_kwargs, hw", [
    # non-monotonic widths: catches any transposed/mis-zipped width wiring
    (dict(down_filters=(6, 4, 8, 5, 9), mid_filters=7,
          upsample_filters=(5, 3, 6, 4, 7), up_filters=(4, 6, 3, 7, 5),
          pixel_features=(4, 3), kernel_size=3, pixel_kernel_size=7),
     (64, 96)),
    # minimal widths, small pixel head
    (dict(down_filters=(2, 2, 2, 2, 2), mid_filters=2,
          upsample_filters=(2, 2, 2, 2, 2), up_filters=(2, 2, 2, 2, 2),
          pixel_features=(2, 2), kernel_size=3, pixel_kernel_size=3),
     (64, 64)),
    # odd spatial dims: SAME-padding asymmetry + resize-back rounding
    (dict(down_filters=(3, 7, 5, 9, 6), mid_filters=11,
          upsample_filters=(4, 6, 3, 8, 5), up_filters=(5, 4, 7, 3, 6),
          pixel_features=(5, 2), kernel_size=3, pixel_kernel_size=7),
     (96, 64)),
])
def test_forward_parity_config_sweep(cfg_kwargs, hw):
    """Converter + forward parity across varied (incl. non-monotonic)
    width configurations — the fixed TINY/production configs cover two
    points of the config space; this sweep catches wiring mistakes that
    only show when widths differ per layer."""
    cfg = FCNConfig(**cfg_kwargs)
    net = _build_torch_net(cfg, seed=5)
    variables = torch_state_dict_to_flax(net.state_dict())
    model = FCNLectureNet(cfg, dtype=jnp.float32)

    h, w = hw
    rng = np.random.default_rng(2)
    x = rng.uniform(-1.0, 1.0, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        t_bin, t_text, t_rec = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_bin, j_text, j_rec = model.apply(variables, jnp.asarray(x),
                                       train=False)
    np.testing.assert_allclose(np.asarray(j_rec),
                               t_rec.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_text),
                               t_text.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(j_bin),
                               t_bin.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)


def test_bitexact_roundtrip_flax_torch_flax():
    """flax -> torch state_dict -> flax is BIT-exact for every leaf
    across a non-monotonic width config (any transposition/copy slip in
    either direction shows up as an array mismatch)."""
    from lecturemath_tpu.models.convert import flax_to_torch_state_dict

    cfg = FCNConfig(down_filters=(6, 4, 8, 5, 9), mid_filters=7,
                    upsample_filters=(5, 3, 6, 4, 7),
                    up_filters=(4, 6, 3, 7, 5), pixel_features=(4, 3),
                    kernel_size=3, pixel_kernel_size=7)
    net = _build_torch_net(cfg, seed=11)
    variables = torch_state_dict_to_flax(net.state_dict())
    back = torch_state_dict_to_flax(flax_to_torch_state_dict(variables))

    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (path_a, leaf_a), (path_b, leaf_b) in zip(flat_a, flat_b):
        assert path_a == path_b
        np.testing.assert_array_equal(np.asarray(leaf_a),
                                      np.asarray(leaf_b), err_msg=str(path_a))
