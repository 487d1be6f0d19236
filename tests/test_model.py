import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lecturemath_tpu.models.fcn_lecturenet import (FCNConfig, FCNLectureNet,
                                                   make_binarizer,
                                                   prepare_images,
                                                   pad_to_multiple)
from lecturemath_tpu.models.convert import torch_state_dict_to_flax
from lecturemath_tpu.core.config import Config

TINY = FCNConfig(down_filters=(2, 3, 4, 5, 6), mid_filters=6,
                 upsample_filters=(2, 3, 4, 5, 6), up_filters=(2, 3, 4, 5, 6),
                 pixel_features=(4, 3), kernel_size=3, pixel_kernel_size=3)


@pytest.fixture(scope="module")
def tiny_model():
    model = FCNLectureNet(TINY)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_forward_shapes(tiny_model):
    model, variables = tiny_model
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    bin_logits, text_logits, rec = model.apply(variables, x, train=False)
    assert bin_logits.shape == (2, 32, 32, 1)
    assert text_logits.shape == (2, 32, 32, 1)
    assert rec.shape == (2, 32, 32, 3)
    assert np.abs(np.asarray(rec)).max() <= 1.0  # tanh range


def test_reconstruction_mode(tiny_model):
    _, variables = tiny_model
    model = FCNLectureNet(TINY, reconstruction_mode=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    rec = model.apply(variables, x, train=False)
    assert rec.shape == (1, 32, 32, 3)


def test_train_mode_updates_batch_stats(tiny_model):
    model, variables = tiny_model
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    (_, updates) = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    old = variables["batch_stats"]["down_1"]["bn"]["mean"]
    new = updates["batch_stats"]["down_1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_binarizer_wrapper(tiny_model):
    model, variables = tiny_model
    binarize = make_binarizer(model, variables, force_binary=True)
    rgb = np.random.default_rng(0).integers(0, 256, (1, 30, 33, 3), np.uint8)
    binary, text, rec = binarize(jnp.asarray(rgb))
    assert binary.shape == (1, 30, 33)  # cropped back from pad-to-32
    vals = np.unique(np.asarray(binary))
    assert set(vals.tolist()) <= {0, 255}
    assert rec.shape == (1, 30, 33, 3)


def test_prepare_images_range():
    img = jnp.array([[[[0, 127, 255]]]], jnp.uint8)
    out = np.asarray(prepare_images(img))
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert abs(out[0, 0, 0, 0] + 1.0) < 1e-6
    assert abs(out[0, 0, 0, 2] - 1.0) < 1e-6


def test_pad_to_multiple():
    x = jnp.zeros((1, 30, 45, 3))
    padded, (h, w) = pad_to_multiple(x)
    assert padded.shape == (1, 32, 64, 3)
    assert (h, w) == (30, 45)


def test_feature_extractors(tiny_model):
    from lecturemath_tpu.models.fcn_lecturenet import (
        make_diff_image_extractor, make_feature_extractor)

    model, variables = tiny_model
    rgb = np.zeros((2, 32, 32, 3), np.uint8)

    features = make_feature_extractor(model, variables)(jnp.asarray(rgb))
    assert features.shape == (2, 1, 1, TINY.mid_filters)  # 32 / 2^5 = 1

    diff = make_diff_image_extractor(model, variables)(jnp.asarray(rgb))
    assert diff.shape == (2, 32, 32, 3)

    diff_feats = make_diff_image_extractor(model, variables,
                                           concat_features=True,
                                           downsample=2)(jnp.asarray(rgb))
    assert diff_feats.shape == (2, 16, 16, 3 + TINY.up_filters[0])


def test_config_from_reference_conf():
    config = Config.from_file(
        "/root/reference/ACCESS2021_release/configs/FCN_LectureNet.conf")
    cfg = FCNConfig.from_config(config)
    assert cfg.down_filters == (48, 96, 192, 384, 768)
    assert cfg.mid_filters == 768
    assert cfg.upsample_filters == (32, 48, 96, 192, 384)
    assert cfg.pixel_kernel_size == 7


def _fake_torch_state_dict(cfg: FCNConfig):
    """Random numpy state_dict with reference checkpoint key names/shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.1, (o, i, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, o).astype(np.float32)

    def deconv(name, i, o, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.1, (i, o, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, o).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(1, 0.1, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(rng.normal(1, 0.1, c)).astype(np.float32)

    ch = cfg.in_channels
    prev = ch
    for i, f in enumerate(cfg.down_filters, 1):
        conv(f"conv_down_block_{i}.0", f, prev, cfg.kernel_size)
        bn(f"conv_down_block_{i}.1", f)
        prev = f
    conv("mid_block.0", cfg.mid_filters, prev, cfg.kernel_size)
    bn("mid_block.1", cfg.mid_filters)

    prev = cfg.mid_filters
    for i in range(5, 0, -1):
        deconv(f"transposed_conv_{i}", prev, cfg.upsample_filters[i - 1], 2)
        bn(f"upsample_block_{i}.0", cfg.upsample_filters[i - 1])
        in_feats = cfg.upsample_filters[i - 1] + cfg.down_filters[i - 1]
        conv(f"conv_up_block_{i}.0", cfg.up_filters[i - 1], in_feats, cfg.kernel_size)
        bn(f"conv_up_block_{i}.1", cfg.up_filters[i - 1])
        prev = cfg.up_filters[i - 1]

    pk = cfg.pixel_kernel_size
    conv("conv_pixels_1.0", cfg.pixel_features[0], ch + cfg.up_filters[0], pk)
    bn("conv_pixels_1.1", cfg.pixel_features[0])
    conv("conv_pixels_2.0", cfg.pixel_features[1], ch + cfg.pixel_features[0], pk)
    bn("conv_pixels_2.1", cfg.pixel_features[1])
    conv("conv_out.0", 1, ch + cfg.pixel_features[1], pk)
    bn("conv_out.1", 1)
    conv("conv_text_mask_out.0", 1, cfg.up_filters[0], pk)
    bn("conv_text_mask_out.1", 1)
    conv("conv_reconstruct.0", ch, cfg.up_filters[0], cfg.kernel_size)
    bn("conv_reconstruct.1", ch)
    return sd


def test_threshold_binarizer_variables(tiny_model):
    """The surgically-set head weights turn the full model into an exact
    per-pixel luminance threshold (bench.py's deterministic workload)."""
    from lecturemath_tpu.models.fcn_lecturenet import make_packed_binarizer, \
        unpack_bits_host
    from lecturemath_tpu.utils.synthetic import (synthetic_rgb_lecture,
                                                 threshold_binarizer_variables)

    model, _ = tiny_model
    variables = threshold_binarizer_variables(TINY, jax.random.PRNGKey(2),
                                              threshold_gray=130.0)

    rgb, clean, _, _ = synthetic_rgb_lecture(seed=3, n_frames=4, height=64,
                                             width=96, n_boards=1,
                                             glyphs_per_board=4)
    packed = make_packed_binarizer(model, variables)(jnp.asarray(rgb))
    binary = unpack_bits_host(np.asarray(packed), 96)

    # model output polarity is ink=0 / bg=255; clean frames are ink=255
    expected = np.where(rgb.mean(axis=-1) > 130.0, 255, 0).astype(np.uint8)
    np.testing.assert_array_equal(binary, expected)
    np.testing.assert_array_equal(255 - binary, clean)


def test_fold_batch_norms_parity(tiny_model):
    """Folded-BN inference == BN inference (exact affine absorption)."""
    from lecturemath_tpu.models.fcn_lecturenet import fold_batch_norms

    _, variables = tiny_model
    # non-trivial running stats so the fold actually moves numbers
    rng = np.random.default_rng(3)
    stats = jax.tree.map(
        lambda v: np.asarray(v) + rng.normal(0.1, 0.3, np.shape(v)).astype(np.float32) ** 2,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    folded_model = FCNLectureNet(TINY, fold_bn=True)
    folded_vars = fold_batch_norms(variables)

    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 3),
                           minval=-1.0, maxval=1.0)
    ref = FCNLectureNet(TINY).apply(variables, x, train=False)
    got = folded_model.apply(folded_vars, x, train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_s2d_conv_same_exact():
    """s2d_conv_same == plain SAME conv, all block/kernel/size combos."""
    from lecturemath_tpu.models.fcn_lecturenet import s2d_conv_same

    rng = np.random.default_rng(5)
    for k in (3, 7):
        for block in (2, 4):
            for h, w in ((32, 32), (16, 64)):
                x = jnp.asarray(rng.normal(0, 1, (2, h, w, 5)).astype(np.float32))
                kernel = jnp.asarray(rng.normal(0, 0.3, (k, k, 5, 3)).astype(np.float32))
                bias = jnp.asarray(rng.normal(0, 0.1, 3).astype(np.float32))
                ref = jax.lax.conv_general_dilated(
                    x, kernel, (1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
                got = s2d_conv_same(x, kernel, bias, block, jnp.float32)
                np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                           atol=5e-5,
                                           err_msg=f"k={k} b={block} {h}x{w}")


def test_s2d_heads_model_parity(tiny_model):
    """Full model with s2d_heads == plain model on identical variables,
    both per-conv (unfolded) and the full s2d-domain head path (folded)."""
    from lecturemath_tpu.models.fcn_lecturenet import fold_batch_norms

    model, variables = tiny_model
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 32, 64, 3),
                           minval=-1.0, maxval=1.0)
    ref = model.apply(variables, x, train=False)

    got = FCNLectureNet(TINY, s2d_heads=True).apply(variables, x,
                                                    train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

    folded = fold_batch_norms(variables)
    got = FCNLectureNet(TINY, fold_bn=True, s2d_heads=True).apply(
        folded, x, train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    # heads_block=4 variant (k=7 -> k'=3 remap) on the same folded params
    got = FCNLectureNet(TINY, fold_bn=True, s2d_heads=True,
                        heads_block=4).apply(folded, x, train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_torch_conversion_structure(tiny_model):
    model, init_vars = tiny_model
    sd = _fake_torch_state_dict(TINY)
    converted = torch_state_dict_to_flax(sd)

    # converted tree must match the init tree exactly (same keys, same shapes)
    flat_init = jax.tree_util.tree_leaves_with_path(init_vars)
    flat_conv = jax.tree_util.tree_leaves_with_path(converted)
    paths_init = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    paths_conv = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_conv}
    assert paths_init == paths_conv

    # and the model must run with the converted weights
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    bin_logits, _, _ = model.apply(converted, x, train=False)
    assert bin_logits.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(bin_logits)).all()
