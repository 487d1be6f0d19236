"""Pallas k×k SAME conv for the narrow-channel full-res head layers.

The FCN head convs (k=7, 19-35 in / 4-32 out channels at 960×540) are the
inference MFU ceiling (PARITY.md roofline): XLA's s2d lowering executes
2.04× structural-zero FLOPs at ~41% MXU busy. This kernel instead uses a
**dy-decomposition in row-major (B, H, C, W) layout**: the conv becomes,
per output row r and kernel row dy, one dense 2D contraction

    out[r] (N, W)  +=  W_dy (N, k·C')  @  Z[r + dy] (k·C', W)

where ``Z[r']`` stacks the k dx-shifts of input row r' on the contraction
axis — built once per input row (k× copy, not k²×). C' is the channel
count rounded up to the 8-sublane granule (pad rows carry zero weights),
so the contraction is ~88-96% dense and the spatial width fills the MXU
output lanes: no structural-zero inflation, no 128-lane output padding.

Caller contract: input is (B, H + k - 1, C, W + k - 1) — row-major with
channels second-minor — already zero-padded by k//2 on H and W, H % rt == 0.
Output is (B, H, N, W) (same layout family, so head stages chain without
relayout). See conv7_same() for the padding wrapper.

Reference behavior mirrored: FCN_lecturenet.py:164-194 head convs (SAME,
stride 1, bias).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(x_hbm, w_ref, b_ref, out_ref, in_scratch, z_ref, sem,
            *, k: int, rt: int, width: int, c_slot: int,
            n_pad: int, kc_zero_start: int, activation: Optional[str]):
    batch_i = pl.program_id(0)
    row_i = pl.program_id(1)
    rows = rt + k - 1

    # zero the kc -> kc_pad tail BEFORE the Z build (the build's last slot
    # rewrites the aligned overlap): the tail joins the contraction against
    # zero weights, and uninitialized VMEM could hold NaNs (NaN * 0 = NaN)
    if kc_zero_start < z_ref.shape[1]:
        z_ref[:, kc_zero_start:, :] = \
            jnp.zeros_like(z_ref[:, kc_zero_start:, :])

    # DMA the halo'd input rows (rows, C_slot, W + k - 1) into VMEM
    # (channels pre-padded to c_slot by the wrapper, so all dims are full)
    dma = pltpu.make_async_copy(
        x_hbm.at[batch_i, pl.ds(row_i * rt, rows)],
        in_scratch.at[:rows], sem)
    dma.start()
    dma.wait()

    # Z[r']: dx-shifts of input row r' stacked on the contraction axis
    for r in range(rows):
        for dx in range(k):
            z_ref[r, dx * c_slot:(dx + 1) * c_slot, :] = \
                in_scratch[r, :, dx:dx + width]

    for r in range(rt):
        acc = jnp.zeros((n_pad, width), jnp.float32)
        for dy in range(k):
            acc += jax.lax.dot_general(
                w_ref[dy], z_ref[r + dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        result = acc + b_ref[0].reshape(-1, 1)
        if activation == "gelu":
            result = jax.nn.gelu(result, approximate=False)
        out_ref[0, r] = result.astype(out_ref.dtype)


def conv7_hcw(x_padded: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
              rt: int = 8, activation: Optional[str] = None,
              out_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """k×k SAME conv in (B, H, C, W) layout via the dy-decomposed kernel.

    x_padded: (B, H + k - 1, C, W + k - 1) zero-padded input, H % rt == 0.
    kernel: (k, k, C, N) HWIO. Returns (B, H, N, W).
    """
    batch, hp, c_in, wp = x_padded.shape
    k = kernel.shape[0]
    height, width = hp - (k - 1), wp - (k - 1)
    n_out = kernel.shape[3]
    assert height % rt == 0, (height, rt)

    c_slot = _round_up(c_in, 8)        # per-dx channel granule
    width_pad = _round_up(width, 128)  # lane-aligned compute width
    wp_alloc = _round_up(width_pad + k - 1, 128)
    if c_slot != c_in or wp_alloc != wp:
        x_padded = jnp.pad(x_padded,
                           ((0, 0), (0, 0), (0, c_slot - c_in),
                            (0, wp_alloc - wp)))
    kc = k * c_slot
    kc_pad = _round_up(kc, 16)
    kc_zero_start = (kc // 16) * 16  # aligned cover of the kc->kc_pad tail
    n_pad = _round_up(n_out, 8)

    # (k, N_pad, kC_pad): per-dy dense weights, contraction = dx*c_slot + c
    w_dy = np.zeros((k, n_pad, kc_pad), np.float32)
    kernel_np = np.asarray(kernel, np.float32)
    for dx in range(k):
        w_dy[:, :n_out, dx * c_slot:dx * c_slot + c_in] = \
            kernel_np[:, dx].transpose(0, 2, 1)  # (k_dy, N, C)

    rows = rt + k - 1
    rows_pad = _round_up(rows, 8)

    grid = (batch, height // rt)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, rt=rt, width=width_pad,
                          c_slot=c_slot, n_pad=n_pad,
                          kc_zero_start=kc_zero_start,
                          activation=activation),
        out_shape=jax.ShapeDtypeStruct((batch, height, n_pad, width_pad),
                                       out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM, DMA'd
            pl.BlockSpec((k, n_pad, kc_pad), lambda b, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, n_pad, width_pad),
                               lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_pad, c_slot, wp_alloc), x_padded.dtype),
            pltpu.VMEM((rows_pad, kc_pad, width_pad), x_padded.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_padded, jnp.asarray(w_dy, x_padded.dtype),
      jnp.zeros((1, n_pad), jnp.float32).at[0, :n_out].set(
          jnp.asarray(bias, jnp.float32)))
    return out[:, :, :n_out, :width]


def conv7_same(x_hcw: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
               **kwargs) -> jnp.ndarray:
    """Zero-pad + conv7_hcw. x_hcw: (B, H, C, W)."""
    k = kernel.shape[0]
    half = k // 2
    x_padded = jnp.pad(x_hcw, ((0, 0), (half, half), (0, 0), (half, half)))
    return conv7_hcw(x_padded, kernel, bias, **kwargs)
