"""FCN-LectureNet: 3-branch fully-convolutional U-Net for lecture-video
binarization, as a flax module (NHWC, bf16-friendly).

Topology matches the reference model (reference:
AccessMath/lecturenet_v1/FCN_lecturenet.py:16-427):

  * 5 down blocks: conv(k)+BatchNorm+GELU then 2x2 max-pool; the *pre-pool*
    feature map is kept for the skip connection
  * one mid block conv(k)+BN+GELU
  * 5 up blocks: ConvTranspose(2, stride 2)+BN+GELU, concat with the
    matching pre-pool skip, then conv(k)+BN+GELU
  * reconstruction head: conv(k)+BN+Tanh -> 3-channel background estimate
  * text-mask head: conv(pixel_k)+BN -> 1-channel logits
  * binarization head: diff_img = (x0 - reconstruction) * sigmoid(text_mask),
    then three stacked convs (pixel_k), each re-concatenating diff_img,
    the last one emitting 1-channel logits (no activation)

``reconstruction_mode`` switches the forward to return only the
reconstruction (used by the Med-PT pretraining phase).

GELU uses the exact (erf) form to match torch's default nn.GELU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import Config


@dataclass(frozen=True)
class FCNConfig:
    in_channels: int = 3
    down_filters: Tuple[int, ...] = (48, 96, 192, 384, 768)
    mid_filters: int = 768
    upsample_filters: Tuple[int, ...] = (32, 48, 96, 192, 384)  # up blocks 1..5
    up_filters: Tuple[int, ...] = (32, 48, 96, 192, 384)
    pixel_features: Tuple[int, int] = (32, 16)
    kernel_size: int = 3
    pixel_kernel_size: int = 7

    @classmethod
    def from_config(cls, config: Config, in_channels: int = 3) -> "FCNConfig":
        """Build from FCN_BINARIZER_NET_* keys (reference:
        FCN_lecturenet.py:620-659, configs/FCN_LectureNet.conf:109-132)."""
        g = config.get
        return cls(
            in_channels=in_channels,
            down_filters=tuple(g(f"FCN_BINARIZER_NET_DOWN_CONV_FILTERS_{i}", d)
                               for i, d in zip(range(1, 6), (16, 32, 64, 128, 256))),
            mid_filters=g("FCN_BINARIZER_NET_MIDDLE_CONV_FILTERS_MIDDLE", 512),
            upsample_filters=tuple(g(f"FCN_BINARIZER_NET_UPSAMPLE_FILTERS_{i}", d)
                                   for i, d in zip(range(1, 6), (16, 32, 64, 128, 256))),
            up_filters=tuple(g(f"FCN_BINARIZER_NET_UP_CONV_FILTERS_{i}", d)
                             for i, d in zip(range(1, 6), (16, 32, 64, 128, 256))),
            pixel_features=(g("FCN_BINARIZER_NET_PIXEL_FEATURES_1", 32),
                            g("FCN_BINARIZER_NET_PIXEL_FEATURES_2", 16)),
            kernel_size=g("FCN_BINARIZER_NET_KERNEL_SIZE", 3),
            pixel_kernel_size=g("FCN_BINARIZER_NET_PIXEL_KERNEL_SIZE", 3),
        )


_XAVIER = nn.initializers.xavier_normal()


class ConvBNAct(nn.Module):
    """conv(k, same) + BatchNorm + optional exact GELU."""
    features: int
    kernel: int
    use_gelu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                    kernel_init=_XAVIER, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        if self.use_gelu:
            x = nn.gelu(x, approximate=False)
        return x.astype(self.dtype)


class UpBlock(nn.Module):
    """ConvTranspose(2, stride 2) + BN + GELU, concat skip, conv block."""
    upsample_features: int
    conv_features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = nn.ConvTranspose(self.upsample_features, (2, 2), strides=(2, 2),
                             padding="VALID", transpose_kernel=True,
                             kernel_init=_XAVIER, dtype=self.dtype,
                             name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.gelu(x, approximate=False).astype(self.dtype)
        # crop to the skip's spatial dims (handles odd encoder sizes the way
        # the reference does via ConvTranspose2d(output_size=...))
        x = x[:, :skip.shape[1], :skip.shape[2], :]
        x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
        x = ConvBNAct(self.conv_features, self.kernel, dtype=self.dtype,
                      name="conv_block")(x, train)
        return x


class FCNLectureNet(nn.Module):
    config: FCNConfig
    reconstruction_mode: bool = False
    dtype: Any = jnp.float32  # compute dtype; bfloat16 for TPU inference

    @nn.compact
    def __call__(self, x0, train: bool = False, mode: str = "full"):
        """mode: 'full' (default), 'encode' -> mid-block features only
        (reference get_batch_mid_block_features, FCN_lecturenet.py:213-258),
        'diff' -> (diff_img, decoder features) (reference
        get_batch_diff_images, :325-352)."""
        cfg = self.config
        dt = self.dtype
        x = x0.astype(dt)

        # ---------------- encoder ----------------
        skips = []
        for level, features in enumerate(cfg.down_filters, start=1):
            pre = ConvBNAct(features, cfg.kernel_size, dtype=dt,
                            name=f"down_{level}")(x, train)
            skips.append(pre)
            x = nn.max_pool(pre, (2, 2), strides=(2, 2))

        x = ConvBNAct(cfg.mid_filters, cfg.kernel_size, dtype=dt,
                      name="mid")(x, train)

        if mode == "encode":
            return x.astype(jnp.float32)

        # ---------------- decoder ----------------
        for level in range(5, 0, -1):
            x = UpBlock(cfg.upsample_filters[level - 1], cfg.up_filters[level - 1],
                        cfg.kernel_size, dtype=dt,
                        name=f"up_{level}")(x, skips[level - 1], train)

        x_up1 = x

        # ---------------- reconstruction head ----------------
        rec = nn.Conv(cfg.in_channels, (cfg.kernel_size, cfg.kernel_size),
                      padding="SAME", kernel_init=_XAVIER, dtype=dt,
                      name="rec_conv")(x_up1)
        rec = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32, name="rec_bn")(rec)
        rec = jnp.tanh(rec).astype(dt)

        if self.reconstruction_mode and mode == "full":
            return rec

        # ---------------- text-mask head ----------------
        pk = cfg.pixel_kernel_size
        text_logits = nn.Conv(1, (pk, pk), padding="SAME", kernel_init=_XAVIER,
                              dtype=dt, name="text_conv")(x_up1)
        text_logits = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   epsilon=1e-5, dtype=jnp.float32,
                                   name="text_bn")(text_logits)

        # ---------------- binarization head ----------------
        diff = (x0.astype(dt) - rec) * jax.nn.sigmoid(text_logits).astype(dt)

        if mode == "diff":
            return diff.astype(jnp.float32), x_up1.astype(jnp.float32)

        h = jnp.concatenate([diff, x_up1], axis=-1)
        h = ConvBNAct(cfg.pixel_features[0], pk, dtype=dt, name="pixels_1")(h, train)
        h = jnp.concatenate([diff, h], axis=-1)
        h = ConvBNAct(cfg.pixel_features[1], pk, dtype=dt, name="pixels_2")(h, train)
        h = jnp.concatenate([diff, h], axis=-1)
        bin_logits = nn.Conv(1, (pk, pk), padding="SAME", kernel_init=_XAVIER,
                             dtype=dt, name="out_conv")(h)
        bin_logits = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=jnp.float32,
                                  name="out_bn")(bin_logits)

        return bin_logits, text_logits, rec


# ---------------------------------------------------------------------------
# inference helpers
# ---------------------------------------------------------------------------

def make_feature_extractor(model: FCNLectureNet, variables):
    """Jitted mid-block encoder features: uint8 RGB [B,H,W,3] -> f32
    [B, H/32, W/32, mid_filters] (reference:
    get_batch_mid_block_features, FCN_lecturenet.py:213-258)."""

    @jax.jit
    def features(rgb_uint8):
        x = prepare_images(rgb_uint8)
        x, _ = pad_to_multiple(x)
        return model.apply(variables, x, train=False, mode="encode")

    return features


def make_diff_image_extractor(model: FCNLectureNet, variables,
                              concat_features: bool = False,
                              downsample: Optional[int] = None):
    """Jitted diff-image features for downstream content analysis
    (reference: get_batch_diff_images, FCN_lecturenet.py:325-352)."""

    @jax.jit
    def diff_images(rgb_uint8):
        x = prepare_images(rgb_uint8)
        x, _ = pad_to_multiple(x)
        diff, x_up1 = model.apply(variables, x, train=False, mode="diff")
        out = jnp.concatenate([diff, x_up1], axis=-1) if concat_features else diff
        if downsample is not None:
            out = nn.max_pool(out, (downsample, downsample),
                              strides=(downsample, downsample))
        return out

    return diff_images


def init_variables(model: FCNLectureNet, rng_key, sample_shape=(1, 32, 32, 3)):
    """Initialize model variables under jit (eager init compiles every op
    separately, which is minutes of XLA time; one jitted compile is fast)."""
    sample = jnp.zeros(sample_shape, jnp.float32)

    @jax.jit
    def init(key):
        return model.init(key, sample, train=False)

    return init(rng_key)

def prepare_images(rgb_uint8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB [B,H,W,3] -> float in [-1, 1] (reference: prepare_image
    normalizes with mean 0.5 / std 0.5, FCN_lecturenet.py:607-618)."""
    return rgb_uint8.astype(jnp.float32) / 127.5 - 1.0


def pad_to_multiple(x: jnp.ndarray, multiple: int = 32):
    """Edge-pad H and W up to a multiple so five 2x pools divide evenly."""
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, (h, w)


def make_binarizer(model: FCNLectureNet, variables,
                   force_binary: bool = True, threshold: int = 128):
    """Build a jitted batch binarizer: uint8 RGB [B,H,W,3] -> uint8 binary
    [B,H,W] (plus text mask and reconstruction).

    Mirrors reference FCN_LectureNet.binarize (FCN_lecturenet.py:430-505):
    sigmoid, x255, hard threshold at 128 -> {0, 255}. The >2.5MP auto-halving
    stays host-side in the pipeline (resize parity needs PIL/cv2 semantics).
    """

    @jax.jit
    def binarize(rgb_uint8):
        x = prepare_images(rgb_uint8)
        x, (h, w) = pad_to_multiple(x)
        bin_logits, text_logits, rec = model.apply(variables, x, train=False)
        bin_prob = jax.nn.sigmoid(bin_logits[..., 0].astype(jnp.float32))
        text_prob = jax.nn.sigmoid(text_logits[..., 0].astype(jnp.float32))

        bin_u8 = (bin_prob * 255.0).astype(jnp.uint8)
        text_u8 = (text_prob * 255.0).astype(jnp.uint8)
        if force_binary:
            bin_u8 = jnp.where(bin_u8 >= threshold, 255, 0).astype(jnp.uint8)
            text_u8 = jnp.where(text_u8 >= threshold, 255, 0).astype(jnp.uint8)

        rec_u8 = ((rec.astype(jnp.float32) * 0.5 + 0.5) * 255.0)
        rec_u8 = jnp.clip(rec_u8, 0, 255).astype(jnp.uint8)

        return (bin_u8[:, :h, :w], text_u8[:, :h, :w], rec_u8[:, :h, :w])

    return binarize


def pack_bits(binary: jnp.ndarray) -> jnp.ndarray:
    """Pack a boolean/binary [B, H, W] into a uint8 bitmap [B, H, ceil(W/8)]
    (MSB-first, np.packbits layout). 8x less HBM->host traffic for binary
    frames — the tunnel/PCIe download is the inference bottleneck."""
    b, h, w = binary.shape
    pad = (-w) % 8
    bits = (binary != 0)
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, 0), (0, pad)))
    bits = bits.reshape(b, h, -1, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (bits * weights).sum(axis=-1, dtype=jnp.uint8)


def make_packed_binarizer(model: FCNLectureNet, variables,
                          threshold: int = 128):
    """Like make_binarizer(force_binary=True) but returns only the packed
    binary bitmap; unpack host-side with np.unpackbits."""

    @jax.jit
    def binarize(rgb_uint8):
        x = prepare_images(rgb_uint8)
        x, (h, w) = pad_to_multiple(x)
        bin_logits, _, _ = model.apply(variables, x, train=False)
        bin_prob = jax.nn.sigmoid(bin_logits[..., 0].astype(jnp.float32))
        binary = (bin_prob * 255.0).astype(jnp.uint8) >= threshold
        return pack_bits(binary[:, :h, :w])

    return binarize


def unpack_bits_host(packed: "np.ndarray", width: int) -> "np.ndarray":
    """uint8 bitmap [B, H, ceil(W/8)] -> uint8 binary [B, H, W] in {0, 255}."""
    import numpy as np

    unpacked = np.unpackbits(np.asarray(packed), axis=-1)[..., :width]
    return unpacked * np.uint8(255)
