"""Parity of the dy-decomposed Pallas head conv (ops/pallas_conv7.py)
against lax.conv — interpreter mode (the real-TPU smoke + timing that
retired it from production is recorded in PARITY.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lecturemath_tpu.ops.pallas_conv7 import conv7_same


@pytest.mark.parametrize("shape", [
    (2, 5, 64, 480, 4, 7),    # odd channels, k=7 (head-like)
    (1, 8, 32, 256, 3, 3),    # k=3, aligned channels
    (1, 19, 16, 384, 16, 7),  # pixels_2-like
])
def test_conv7_matches_lax(shape):
    batch, c_in, height, width, n_out, k = shape
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(size=(batch, height, c_in, width)),
                    jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(k, k, c_in, n_out)) * 0.2,
                         jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n_out,)), jnp.float32)

    got = conv7_same(x, kernel, bias, rt=8, out_dtype=jnp.float32,
                     interpret=True)

    x_nhwc = x.transpose(0, 1, 3, 2)
    ref = jax.lax.conv_general_dilated(
        x_nhwc, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref.transpose(0, 1, 3, 2)),
                               atol=1e-3)
