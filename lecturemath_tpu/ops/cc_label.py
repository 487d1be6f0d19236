"""Connected-component labeling as a jittable XLA transform.

Replaces the reference's host-side ``scipy.ndimage.label`` + ctypes C kernel
``CC_AgeBoundaries`` (reference: labeler.py:117-190, accessmath_lib.c:357-413)
with an iterative min-label propagation that runs on TPU:

  1. every foreground pixel starts with its linear index as its label
  2. each round takes the 4-neighborhood minimum (union step) and then
     applies pointer jumping ``label <- label[label]`` twice (path
     compression), which roughly squares the propagation reach per round
  3. a ``lax.while_loop`` iterates to a fixed point

Converged labels are component *roots*: the minimum linear index inside each
component, i.e. the raster-order first pixel. Sorting roots ascending
therefore reproduces scipy.ndimage.label's 4-connectivity label order exactly
(scipy numbers components by raster-scan first encounter), which
``compact_labels`` relies on for bit-exact parity with the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BG = jnp.iinfo(jnp.int32).max


def _neighbor_min(labels: jnp.ndarray) -> jnp.ndarray:
    """Min over the 4-neighborhood (cross), keeping background at _BG."""
    up = jnp.pad(labels[:-1, :], ((1, 0), (0, 0)), constant_values=_BG)
    down = jnp.pad(labels[1:, :], ((0, 1), (0, 0)), constant_values=_BG)
    left = jnp.pad(labels[:, :-1], ((0, 0), (1, 0)), constant_values=_BG)
    right = jnp.pad(labels[:, 1:], ((0, 0), (0, 1)), constant_values=_BG)
    return jnp.minimum(jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right)),
                       labels)


@partial(jax.jit, static_argnames=("max_iters",))
def label_components(binary: jnp.ndarray, max_iters: int = 64) -> jnp.ndarray:
    """Label one binary frame.

    Args:
      binary: [H, W] array; nonzero pixels are foreground.
      max_iters: safety bound on propagation rounds (each round covers
        roughly squared distance, so 64 handles any realistic frame).

    Returns:
      int32 [H, W] label map: 0 for background, component-root linear index
      + 1 for foreground pixels.
    """
    h, w = binary.shape
    fg = binary != 0
    lin = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    labels = jnp.where(fg, lin, _BG)

    def jump(flat_labels: jnp.ndarray) -> jnp.ndarray:
        # label <- label[label]; background gathers stay background because
        # we gather from a copy where _BG maps to itself via clipping + where.
        safe = jnp.where(flat_labels == _BG, 0, flat_labels)
        jumped = flat_labels_at(flat_labels, safe)
        return jnp.where(flat_labels == _BG, _BG, jumped)

    def flat_labels_at(flat_labels: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(flat_labels, idx, axis=0)

    def body(state):
        labels, _, it = state
        new = jnp.where(fg, _neighbor_min(labels), _BG)
        flat = new.reshape(-1)
        flat = jump(jump(flat))
        new = flat.reshape(h, w)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), 0))

    return jnp.where(fg, labels + 1, 0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_iters",))
def label_components_batch(binary: jnp.ndarray, max_iters: int = 64) -> jnp.ndarray:
    """vmap of label_components over a [B, H, W] frame batch."""
    return jax.vmap(lambda img: label_components(img, max_iters))(binary)


def compact_labels(labels: np.ndarray) -> Tuple[np.ndarray, int]:
    """Host-side: map root labels to consecutive 1..N in ascending-root order.

    Ascending root order == raster order of each component's first pixel ==
    scipy.ndimage.label numbering, giving parity with the reference labeler.
    """
    labels = np.asarray(labels)
    roots = np.unique(labels)
    roots = roots[roots != 0]
    lut_size = int(labels.max()) + 1 if labels.size else 1
    lut = np.zeros(lut_size, dtype=np.int32)
    lut[roots] = np.arange(1, len(roots) + 1, dtype=np.int32)
    return lut[labels], len(roots)
