"""Two-phase connected-component labeling with a Pallas tile kernel.

This is the BASELINE-named "union-find CC labeling as an iterative
label-propagation Pallas kernel": phase 1 labels each VMEM-resident tile to
a local fixed point (min-label propagation with in-tile pointer jumping —
all reads/writes stay on-chip, one HBM read + one HBM write per tile);
phase 2 stitches tiles by unioning labels across tile boundaries (a sparse
union-find over at most O(perimeter) pairs, host-side) and relabels with
one LUT gather.

Compared to the whole-image XLA iteration (ops/cc_label.py), convergence
cost is bounded by the tile diameter instead of the frame diameter, and all
propagation traffic stays in VMEM.

Label semantics match ops/cc_label.py / scipy.ndimage.label after
``compact_labels`` (roots are each component's raster-first pixel).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BG = jnp.iinfo(jnp.int32).max


def _tile_kernel(binary_ref, out_ref, *, tile_h: int, tile_w: int,
                 width: int, max_iters: int, use_jump: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    fg = binary_ref[0] != 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    local_lin = rows * tile_w + cols
    labels = jnp.where(fg, local_lin, _BG)

    def neighbor_min(lab):
        up = jnp.pad(lab[:-1, :], ((1, 0), (0, 0)), constant_values=_BG)
        down = jnp.pad(lab[1:, :], ((0, 1), (0, 0)), constant_values=_BG)
        left = jnp.pad(lab[:, :-1], ((0, 0), (1, 0)), constant_values=_BG)
        right = jnp.pad(lab[:, 1:], ((0, 0), (0, 1)), constant_values=_BG)
        merged = jnp.minimum(jnp.minimum(up, down),
                             jnp.minimum(left, right))
        return jnp.where(fg, jnp.minimum(lab, merged), _BG)

    def jump(lab):
        # pointer jumping needs an arbitrary point gather, which Mosaic
        # does not support (axis gathers only) — so the real-TPU path runs
        # propagation-only (fixed point reached after at most the longest
        # in-tile geodesic path; the while_loop exits as soon as nothing
        # changes). Interpreter/CPU runs keep jumping for fast convergence.
        flat = lab.reshape(-1)
        safe = jnp.where(flat == _BG, 0, flat)
        jumped = jnp.take(flat, safe, axis=0)
        return jnp.where(flat == _BG, _BG, jumped).reshape(tile_h, tile_w)

    def body(state):
        lab, _, it = state
        new = neighbor_min(lab)
        if use_jump:
            new = jump(jump(new))
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    labels, _, _ = jax.lax.while_loop(cond, body,
                                      (labels, jnp.bool_(True), 0))

    # convert local roots to global linear indices
    global_rows = labels // tile_w + i * tile_h
    global_cols = labels % tile_w + j * tile_w
    global_lin = global_rows * width + global_cols
    out_ref[0] = jnp.where(fg, global_lin + 1, 0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("tile", "max_iters", "interpret"))
def _label_tiles(binary: jnp.ndarray, tile: Tuple[int, int] = (256, 256),
                 max_iters: int = 65536, interpret: bool = False) -> jnp.ndarray:
    """Phase 1: per-tile labels (global-linear-index roots + 1; 0 = bg)."""
    h, w = binary.shape
    tile_h = min(tile[0], h)
    tile_w = min(tile[1], w)
    pad_h = (-h) % tile_h
    pad_w = (-w) % tile_w
    padded = jnp.pad(binary, ((0, pad_h), (0, pad_w)))
    ph, pw = padded.shape

    out = pl.pallas_call(
        partial(_tile_kernel, tile_h=tile_h, tile_w=tile_w, width=pw,
                max_iters=max_iters, use_jump=interpret),
        out_shape=jax.ShapeDtypeStruct((1, ph, pw), jnp.int32),
        grid=(ph // tile_h, pw // tile_w),
        in_specs=[pl.BlockSpec((1, tile_h, tile_w),
                               lambda i, j: (0, i, j),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_h, tile_w), lambda i, j: (0, i, j),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(padded[None])
    return out[0], (h, w), (ph, pw)


def label_components_tiled(binary: np.ndarray,
                           tile: Tuple[int, int] = (256, 256),
                           interpret: bool = False) -> np.ndarray:
    """Full two-phase labeling. Returns int32 labels with component-root
    linear indices + 1 (same convention as ops/cc_label.label_components;
    run compact_labels for scipy numbering)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    tile_labels, (h, w), (ph, pw) = _label_tiles(np.asarray(binary), tile,
                                                 interpret=interpret)
    labels = np.asarray(tile_labels)

    tile_h = min(tile[0], h)
    tile_w = min(tile[1], w)

    # phase 2: collect cross-boundary equivalences
    pairs = []
    for boundary in range(tile_h, ph, tile_h):
        a = labels[boundary - 1, :]
        b = labels[boundary, :]
        mask = (a > 0) & (b > 0)
        if mask.any():
            pairs.append(np.stack([a[mask], b[mask]], axis=1))
    for boundary in range(tile_w, pw, tile_w):
        a = labels[:, boundary - 1]
        b = labels[:, boundary]
        mask = (a > 0) & (b > 0)
        if mask.any():
            pairs.append(np.stack([a[mask], b[mask]], axis=1))

    if not pairs:
        return labels[:h, :w]

    pairs = np.unique(np.concatenate(pairs), axis=0)
    unique_labels = np.unique(labels[labels > 0])
    row = np.searchsorted(unique_labels, pairs[:, 0])
    col = np.searchsorted(unique_labels, pairs[:, 1])
    n = len(unique_labels)
    graph = coo_matrix((np.ones(len(pairs)), (row, col)), shape=(n, n))
    n_components, component = connected_components(graph, directed=False)

    # each component's final label = min original label in the component
    # (the raster-first pixel, preserving scipy ordering after compaction)
    root_per_component = np.full(n_components, np.iinfo(np.int64).max)
    np.minimum.at(root_per_component, component, unique_labels)

    lut = np.zeros(int(unique_labels.max()) + 1, dtype=np.int32)
    lut[unique_labels] = root_per_component[component].astype(np.int32)
    out = labels[:h, :w]
    return np.where(out > 0, lut[out], 0).astype(np.int32)
