"""Contrast-Limited Adaptive Histogram Equalization as a jittable XLA
transform.

Replaces the reference's C kernel (reference: accessmath_lib.c:113-329,
tools/adaptive_equalizer.py:273-291): per-grid-cell histograms (scatter-add),
contrast-limited CDFs (a 256-step lax.scan vectorized over all cells), and
per-pixel bilinear interpolation between the four surrounding cell CDFs
(vectorized gather). Tile-boundary and rounding semantics match the C
implementation bit-for-bit (see tests/test_clahe.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _tile_limits(extent: int, cells: int) -> Tuple[np.ndarray, np.ndarray]:
    """Cell boundaries along one axis: the remainder pixels go to the first
    cells; centers are round((start + end) / 2) (accessmath_lib.c:190-200)."""
    base = extent // cells
    remainder = extent % cells
    sizes = np.full(cells, base, dtype=np.int64)
    sizes[:remainder] += 1
    ends = np.cumsum(sizes) - 1
    starts = ends - sizes + 1
    centers = np.floor((starts + ends) / 2.0 + 0.5).astype(np.int64)
    return ends, centers


def _axis_interp(extent: int, centers: np.ndarray):
    """Per-pixel (k0, k1, weight) for interpolation between cell centers,
    with single-cell clamping at the borders (C semantics)."""
    cells = len(centers)
    pos = np.arange(extent)
    if cells == 1:
        return (np.zeros(extent, np.int64), np.zeros(extent, np.int64),
                np.zeros(extent))
    k0 = np.clip(np.searchsorted(centers, pos, side="left") - 1, 0, cells - 2)
    k1 = k0 + 1
    weight = (pos - centers[k0]) / (centers[k1] - centers[k0])
    weight = np.clip(weight, 0.0, 1.0)
    return k0, k1, weight


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "slope"))
def clahe(grayscale: jnp.ndarray, slope: float = 0.04, grid_x: int = 8,
          grid_y: int = 8) -> jnp.ndarray:
    """CLAHE of one uint8 [H, W] image -> uint8 [H, W]."""
    height, width = grayscale.shape
    y_ends, y_centers = _tile_limits(height, grid_y)
    x_ends, x_centers = _tile_limits(width, grid_x)

    # cell id per pixel
    row_cell = np.searchsorted(y_ends, np.arange(height), side="left")
    col_cell = np.searchsorted(x_ends, np.arange(width), side="left")
    cell_ids = jnp.asarray(row_cell[:, None] * grid_x + col_cell[None, :])

    tones = grayscale.astype(jnp.int32)

    # per-cell histograms via one scatter-add
    n_cells = grid_x * grid_y
    flat_ids = (cell_ids * 256 + tones).reshape(-1)
    hist = jnp.zeros(n_cells * 256, jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
    hist = hist.at[flat_ids].add(1.0).reshape(n_cells, 256)

    # normalized CDF per cell
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]

    if slope > 0.0:
        # contrast limit: sequential over bins, vectorized over cells
        # (accessmath_lib.c:152-170)
        def clip_step(dh, pair):
            prev, cur = pair
            diff = cur - prev - dh - slope
            dh = dh + jnp.maximum(diff, 0.0)
            return dh, cur - dh

        _, clipped_tail = jax.lax.scan(
            clip_step, jnp.zeros(n_cells, cdf.dtype),
            (cdf[:, :-1].T, cdf[:, 1:].T))
        cdf = jnp.concatenate([cdf[:, :1], clipped_tail.T], axis=1)
        offset = (1.0 - (cdf[:, 255] - cdf[:, 0])) / 2.0
        cdf = cdf + offset[:, None]

    cdf = cdf.reshape(grid_y, grid_x, 256)

    # bilinear interpolation between the four surrounding cell CDFs
    y0, y1, wy = _axis_interp(height, y_centers)
    x0, x1, wx = _axis_interp(width, x_centers)
    y0 = jnp.asarray(y0)[:, None]
    y1 = jnp.asarray(y1)[:, None]
    wy = jnp.asarray(wy)[:, None]
    x0 = jnp.asarray(x0)[None, :]
    x1 = jnp.asarray(x1)[None, :]
    wx = jnp.asarray(wx)[None, :]

    d00 = cdf[y0, x0, tones]
    d01 = cdf[y1, x0, tones]
    d10 = cdf[y0, x1, tones]
    d11 = cdf[y1, x1, tones]

    value = (d00 * (1 - wx) * (1 - wy) + d01 * (1 - wx) * wy +
             d10 * wx * (1 - wy) + d11 * wx * wy)

    # C uses round() = half away from zero; values are non-negative. The
    # centering offset can push the CDF slightly past 1.0, and the C kernel
    # then wraps on the unsigned-char cast (255.4 -> 256 -> 0); emulate the
    # wrap for bit parity.
    rounded = jnp.floor(value * 255.0 + 0.5).astype(jnp.int32)
    return (rounded % 256).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "slope"))
def clahe_batch(grayscale: jnp.ndarray, slope: float = 0.04, grid_x: int = 8,
                grid_y: int = 8) -> jnp.ndarray:
    return jax.vmap(lambda img: clahe(img, slope, grid_x, grid_y))(grayscale)


def clahe_host(grayscale: np.ndarray, slope: float = 0.04, grid_x: int = 8,
               grid_y: int = 8) -> np.ndarray:
    """Float64 host CLAHE, bit-exact with the reference C kernel (the
    device path above is float32 and may differ by one gray level on a few
    percent of pixels — harmless downstream, but this variant exists for
    exact-parity use)."""
    height, width = grayscale.shape
    y_ends, y_centers = _tile_limits(height, grid_y)
    x_ends, x_centers = _tile_limits(width, grid_x)

    row_cell = np.searchsorted(y_ends, np.arange(height), side="left")
    col_cell = np.searchsorted(x_ends, np.arange(width), side="left")
    cell_ids = row_cell[:, None] * grid_x + col_cell[None, :]

    tones = grayscale.astype(np.int64)
    n_cells = grid_x * grid_y
    flat = cell_ids.reshape(-1) * 256 + tones.reshape(-1)
    hist = np.bincount(flat, minlength=n_cells * 256).reshape(n_cells, 256)

    cdf = np.cumsum(hist, axis=1).astype(np.float64)
    cdf = cdf / cdf[:, -1:]

    if slope > 0.0:
        dh = np.zeros(n_cells)
        for i in range(255):
            diff = cdf[:, i + 1] - cdf[:, i] - dh - slope
            dh = dh + np.maximum(diff, 0.0)
            cdf[:, i + 1] -= dh
        cdf += ((1.0 - (cdf[:, 255] - cdf[:, 0])) / 2.0)[:, None]

    cdf = cdf.reshape(grid_y, grid_x, 256)

    y0, y1, wy = _axis_interp(height, y_centers)
    x0, x1, wx = _axis_interp(width, x_centers)
    y0 = y0[:, None]
    y1 = y1[:, None]
    wy = wy[:, None]
    x0 = x0[None, :]
    x1 = x1[None, :]
    wx = wx[None, :]

    value = (cdf[y0, x0, tones] * (1 - wx) * (1 - wy) +
             cdf[y1, x0, tones] * (1 - wx) * wy +
             cdf[y0, x1, tones] * wx * (1 - wy) +
             cdf[y1, x1, tones] * wx * wy)

    # C round() + unsigned-char wraparound past 255 (see device path note)
    return (np.floor(value * 255.0 + 0.5).astype(np.int64) % 256).astype(np.uint8)


@jax.jit
def combine_board_content(only_board: jnp.ndarray, equalized: jnp.ndarray,
                          threshold: int = 128) -> jnp.ndarray:
    """Fuse a board mask with the equalized grayscale: content is where the
    board mask is off and the equalized value is dark
    (reference: accessmath_lib.c:331-354 combine_results)."""
    content = jnp.where(equalized < threshold, 255, 0)
    return jnp.where(only_board > 128, 0, content).astype(jnp.uint8)
