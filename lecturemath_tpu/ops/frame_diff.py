"""Frame-difference motion statistics (speaker localization).

Jittable equivalent of the reference's C kernel
``speaker_detection_handle_frame`` (reference: accessmath_lib.c:7-111):
on a subsampled pixel grid, a pixel "changed" when any color channel moved
more than a threshold; outputs the changed-pixel bounding box, centroid,
per-axis standard deviation, and total count.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MotionStats(NamedTuple):
    total_changes: jnp.ndarray      # int32 scalar
    bbox: jnp.ndarray               # float [4] = min_x, max_x, min_y, max_y
    centroid: jnp.ndarray           # float [2] = mean_x, mean_y
    deviation: jnp.ndarray          # float [2] = std_x, std_y


@partial(jax.jit, static_argnames=("threshold", "jump_cells"))
def motion_stats(frame: jnp.ndarray, last_frame: jnp.ndarray,
                 threshold: int = 15, jump_cells: int = 1) -> MotionStats:
    """frame/last_frame: uint8 [H, W, C]."""
    height, width = frame.shape[:2]
    sub_f = frame[::jump_cells, ::jump_cells].astype(jnp.int32)
    sub_l = last_frame[::jump_cells, ::jump_cells].astype(jnp.int32)

    changed = jnp.any(jnp.abs(sub_l - sub_f) > threshold, axis=-1)

    rows = jax.lax.broadcasted_iota(jnp.int32, changed.shape, 0) * jump_cells
    cols = jax.lax.broadcasted_iota(jnp.int32, changed.shape, 1) * jump_cells

    total = jnp.sum(changed).astype(jnp.int32)
    any_changed = total > 0

    big = jnp.int32(10 ** 9)
    min_x = jnp.where(any_changed,
                      jnp.min(jnp.where(changed, cols, big)), width + 1)
    max_x = jnp.where(any_changed,
                      jnp.max(jnp.where(changed, cols, -big)), -1)
    min_y = jnp.where(any_changed,
                      jnp.min(jnp.where(changed, rows, big)), height + 1)
    max_y = jnp.where(any_changed,
                      jnp.max(jnp.where(changed, rows, -big)), -1)

    denom = jnp.maximum(total, 1).astype(jnp.float32)
    mean_x = jnp.sum(jnp.where(changed, cols, 0)).astype(jnp.float32) / denom
    mean_y = jnp.sum(jnp.where(changed, rows, 0)).astype(jnp.float32) / denom

    var_x = jnp.sum(jnp.where(changed,
                              jnp.square(cols.astype(jnp.float32) - mean_x),
                              0.0)) / denom
    var_y = jnp.sum(jnp.where(changed,
                              jnp.square(rows.astype(jnp.float32) - mean_y),
                              0.0)) / denom

    zero = jnp.float32(0.0)
    return MotionStats(
        total_changes=total,
        bbox=jnp.stack([min_x, max_x, min_y, max_y]).astype(jnp.float32),
        centroid=jnp.where(any_changed, jnp.stack([mean_x, mean_y]),
                           jnp.stack([zero, zero])),
        deviation=jnp.where(any_changed,
                            jnp.stack([jnp.sqrt(var_x), jnp.sqrt(var_y)]),
                            jnp.stack([zero, zero])),
    )
